"""Tokenizer parity across the three implementations (reference split class
``[\\n\\r\\p{Z}\\p{P}]+``, src/constant.ts:3): the JVM fast path (F.split,
Java regex), the Arrow pandas-UDF path (Python ``regex`` module — the
JS-parity-safe route), and the pure-Python driver tokenizer. Unicode Symbol
characters (+ = < > | $ ~ ^ `) must stay inside tokens; Z/P classes split.
"""

import random

import pytest
import regex

from pyspark.sql import functions as F
from pyspark.sql import types as T

from slimsearch_spark.functions.tokenize import (analyze_py, terms_col_jvm,
                                                 terms_udf, tokenize_py)

EDGE_CASES = [
    "",
    "hello world",
    "a+b=c<d>e|f$g~h^i`j",              # Sm/Sk/Sc symbols: NOT separators
    "foo.bar,baz;qux:quux!corge?",       # P: separators
    "tab\tand\nnewline\rcr",             # \t is Cc (kept!), \n \r split
    "nbsp em thin ideo　end",   # Zs variants
    "line para sep",           # Zl / Zp
    "dash—en–hyphen‐soft",
    "quotes“смart”‘s’",
    "Ĉu ŝi ĝojas pri ĵaŭdo?",
    "кириллица текст здесь",
    "ελληνικά κείμενο",
    "العربية نص",
    "日本語のテキスト、句読点。含む",
    "underscore_stays_one_token",        # _ is Pc: a separator? Pc ∈ P → splits
    "mixed123numbers456",
    "trailing space ",
    " leading",
    "...only.punct...",
    "᠎Mongolian vowel sep",         # category moved across Unicode versions
    "zero​width",                   # Cf: kept
    "combining áccent",
]


def _random_strings(n=300, seed=1234):
    rng = random.Random(seed)
    pools = [
        (0x20, 0x7F), (0xA0, 0x300), (0x370, 0x400), (0x400, 0x500),
        (0x2000, 0x2070), (0x3000, 0x3040), (0x1F300, 0x1F350),
    ]
    out = []
    for _ in range(n):
        chars = []
        for _ in range(rng.randint(0, 60)):
            lo, hi = rng.choice(pools)
            chars.append(chr(rng.randint(lo, hi - 1)))
        out.append("".join(chars))
    return out


def test_python_paths_agree():
    """pure-python tokenize_py/analyze_py vs the regex module directly."""
    pat = regex.compile(r"[\n\r\p{Z}\p{P}]+")
    for s in EDGE_CASES + _random_strings():
        assert analyze_py(s) == [t.lower() for t in pat.split(s) if t]


def test_symbols_not_separators():
    assert analyze_py("a+b=c") == ["a+b=c"]
    assert analyze_py("x|y$z") == ["x|y$z"]
    assert analyze_py("a.b") == ["a", "b"]
    assert analyze_py("under_score") == ["under", "score"]  # Pc splits


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [(i, s) for i, s in enumerate(EDGE_CASES + _random_strings())]
    return spark.createDataFrame(rows, "id long, text string").cache()


def test_jvm_matches_python(corpus_df):
    """JVM F.split path == pure-Python path on every row (any divergence
    must fail loudly — the regex_udf path is the documented fallback)."""
    got = {r["id"]: r["terms"] for r in corpus_df.select(
        "id", terms_col_jvm(F.col("text")).alias("terms")).collect()}
    want = {r["id"]: analyze_py(r["text"]) for r in corpus_df.collect()}
    diffs = {i: (got[i], want[i]) for i in want if got[i] != want[i]}
    assert not diffs, f"{len(diffs)} divergent rows, e.g. {list(diffs.items())[:3]}"


def test_udf_matches_python(corpus_df):
    got = {r["id"]: r["terms"] for r in corpus_df.select(
        "id", terms_udf(F.col("text")).alias("terms")).collect()}
    want = {r["id"]: analyze_py(r["text"]) for r in corpus_df.collect()}
    assert got == want
