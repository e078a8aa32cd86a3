"""Tokenization — reference parity: split on ``[\\n\\r\\p{Z}\\p{P}]+``.

Reference: slimsearch ``src/constant.ts:3`` (SPACE_OR_PUNCTUATION) and
``src/defaults.ts:15-16`` (tokenize + processTerm=lowercase). Unicode
*Symbol* characters (``+ = < > | $ ~ ^``, backtick) are NOT separators —
important for source code. Empty tokens are dropped by the falsy filter
(``src/add.ts:112``, ``src/results.ts:315``).

Two Spark paths, validated equal on the parity corpora:

* ``jvm``: `F.split` + `F.lower` — Java regex supports the same one-letter
  Unicode general-category classes; stays inside whole-stage codegen.
* ``regex_udf``: vectorized pandas UDF using the Python ``regex`` module,
  whose ``\\p{Z}/\\p{P}`` semantics match JS ``/u`` exactly — the
  parity-safe path for exotic Unicode.
"""

from __future__ import annotations

from typing import List

import pandas as pd
import regex

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import TOKEN_SPLIT_PATTERN

_SPLIT_RE = regex.compile(TOKEN_SPLIT_PATTERN)


def tokenize_py(text: str) -> List[str]:
    """Pure-Python tokenizer: raw tokens, split only (no lowercase, keeps
    empty boundary tokens exactly like JS ``String.split``). Used by the
    oracle and for driver-side query tokenization."""
    if text is None:
        return []
    return _SPLIT_RE.split(text)


def analyze_py(text: str) -> List[str]:
    """tokenize → processTerm(lowercase) → drop falsy. The term stream that
    actually reaches the index / the query executor."""
    return [t.lower() for t in tokenize_py(text) if t]


def tokens_col_jvm(col: Column) -> Column:
    """JVM tokenizer: array of raw tokens (may contain '' at boundaries,
    mirroring JS split semantics)."""
    return F.split(col, TOKEN_SPLIT_PATTERN)


def terms_col_jvm(col: Column) -> Column:
    """JVM analyzed terms: lowercased, empties dropped."""
    toks = tokens_col_jvm(col)
    return F.filter(F.transform(toks, F.lower), lambda t: t != F.lit(""))


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokens_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized parity tokenizer (raw tokens incl. empties)."""
    return texts.map(lambda s: _SPLIT_RE.split(s) if s is not None else [])


@F.pandas_udf(T.ArrayType(T.StringType()))
def terms_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized parity analyzer (lowercased, empties dropped)."""

    def analyze(s):
        if s is None:
            return []
        return [t.lower() for t in _SPLIT_RE.split(s) if t]

    return texts.map(analyze)


def accepts_field_arg(fn) -> bool:
    """True if the user callable takes a second positional (field) argument
    — the reference passes (text|term, fieldName) (src/add.ts:93,106)."""
    import inspect
    try:
        params = list(inspect.signature(fn).parameters.values())
    except (TypeError, ValueError):
        return False
    positional = [p for p in params if p.kind in
                  (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD,
                   p.VAR_POSITIONAL)]
    if any(p.kind == p.VAR_POSITIONAL for p in positional):
        return True
    return len(positional) >= 2


def custom_analysis_udf(tokenize_fn, process_fn, field_name: str,
                        extract_fn=None, stringify_fn=None):
    """Arrow-vectorized index-time analysis with user callables (reference
    add-time chain src/add.ts:89-113):
    extractField(doc, field) → value (None skips the doc for this field);
    stringifyField(value, field) → text (default ``str``);
    tokenize(text[, field]) → raw tokens;
    field_len = len(set(raw tokens)); per token processTerm(term[, field])
    → str | list[str] (1→N expansion) | falsy (dropped).

    Returns a pandas UDF producing struct<terms: array<string>,
    field_len: int> so the text is tokenized exactly once per row. With
    ``extract_fn`` the input column is a struct of the full row (the
    callable sees the document dict); missing values are flagged
    field_len = -1 for the caller to filter (the reference's == null
    continue, src/add.ts:89-91)."""
    tok = tokenize_fn or tokenize_py
    proc = process_fn or (lambda t: t.lower())
    tok_2 = tokenize_fn is not None and accepts_field_arg(tokenize_fn)
    proc_2 = process_fn is not None and accepts_field_arg(process_fn)

    def analyze_text(s):
        """→ (terms, field_len) of one stringified field value."""
        raw = tok(s, field_name) if tok_2 else tok(s)
        terms = []
        for t in raw:
            p = proc(t, field_name) if proc_2 else proc(t)
            if isinstance(p, (list, tuple)):
                terms.extend(x for x in p if x)
            elif p:
                terms.append(p)
        return terms, len(set(raw))

    def stringify(val):
        if stringify_fn is not None:
            return stringify_fn(val, field_name)
        return val if isinstance(val, str) else str(val)

    if extract_fn is not None:
        @F.pandas_udf("terms array<string>, field_len int")
        def analyze_rows(rows: pd.DataFrame) -> pd.DataFrame:
            out_terms, out_len = [], []
            for rec in rows.to_dict("records"):
                val = extract_fn(rec, field_name)
                if val is None:
                    out_terms.append([])
                    out_len.append(-1)
                    continue
                terms, flen = analyze_text(stringify(val))
                out_terms.append(terms)
                out_len.append(flen)
            return pd.DataFrame({"terms": out_terms, "field_len": out_len})

        return analyze_rows

    @F.pandas_udf("terms array<string>, field_len int")
    def analyze(values: pd.Series) -> pd.DataFrame:
        out_terms, out_len = [], []
        for v in values:
            if v is None:
                out_terms.append([])
                out_len.append(0)
                continue
            terms, flen = analyze_text(stringify(v))
            out_terms.append(terms)
            out_len.append(flen)
        return pd.DataFrame({"terms": out_terms, "field_len": out_len})

    return analyze


def terms_col(col: Column, tokenizer: str = "jvm") -> Column:
    """Analyzed-term array column under the configured tokenizer path."""
    if tokenizer == "jvm":
        return terms_col_jvm(col)
    if tokenizer == "regex_udf":
        return terms_udf(col)
    raise ValueError(f"unknown tokenizer: {tokenizer}")


def raw_tokens_col(col: Column, tokenizer: str = "jvm") -> Column:
    """Raw-token array column (pre-processTerm) — field length uses
    ``size(array_distinct(raw_tokens))`` counting the '' token like the
    reference's ``new Set(tokens).size`` counts it (src/add.ts:96)."""
    if tokenizer == "jvm":
        return tokens_col_jvm(col)
    if tokenizer == "regex_udf":
        return tokens_udf(col)
    raise ValueError(f"unknown tokenizer: {tokenizer}")
