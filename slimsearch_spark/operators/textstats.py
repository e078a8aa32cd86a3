"""Text-analysis operators for training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.

All whole-stage-codegen column expressions over the tokenizer — zero Python
in the executor path, so these sweep 100 TB at parquet-scan speed with one
narrow projection (Catalyst prunes to the text column)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import terms_col

# tiny built-in stopword profile for the n-gram/stopword language heuristic
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def text_quality(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, n_tokens, n_unique, ttr, mean_token_len, is_quality).

    Classic quality gates: length window + type-token ratio, computed from
    one tokenize pass."""
    terms = terms_col(F.col(text_col))
    return (docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(terms).alias("n_tokens"),
        F.size(F.array_distinct(terms)).alias("n_unique"),
        terms.alias("__t"))
        .withColumn("ttr", F.round(F.col("n_unique") /
                                   F.greatest(F.col("n_tokens"), F.lit(1)), 6))
        .withColumn("mean_token_len", F.round(
            F.aggregate("__t", F.lit(0).cast("bigint"),
                        lambda acc, x: acc + F.length(x)).cast("double") /
            F.greatest(F.col("n_tokens"), F.lit(1)), 6))
        .withColumn("is_quality",
                    (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000)
                    & (F.col("ttr") > 0.1))
        .drop("__t"))


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-ratio language heuristic → (doc_id, en_ratio, predicted_lang).

    (A real pipeline plugs a fastText-style model in as a pandas UDF; the
    heuristic keeps the reference path dependency-free and deterministic.)"""
    terms = terms_col(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    en_cnt = F.size(F.filter(terms, lambda t: F.array_contains(stop_arr, t)))
    n = F.greatest(F.size(terms), F.lit(1))
    return (docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(en_cnt.cast("double") / n, 6).alias("en_ratio"))
        .withColumn("predicted_lang",
                    F.when(F.col("en_ratio") > 0.05, "en").otherwise("unknown")))


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, ws_tokens, bpe_ish_tokens): whitespace count + a BPE-ish
    regex segmentation count (runs of letters / digits / single symbols)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(F.split(F.col(text_col), r"\s+"),
                        lambda t: t != F.lit(""))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)),
                                    F.lit(BPE_ISH_PATTERN),
                                    0)).alias("bpe_ish_tokens"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, fp): md5 over the normalized token stream — canonical
    content fingerprint invariant to separator/punctuation differences."""
    terms = terms_col(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.array_join(terms, " ")).alias("fp"))


# character-trigram profiles (public linguistics: highest-frequency char
# trigrams per language) for the n-gram language-ID variant
TRIGRAM_PROFILES = {
    "en": [" th", "the", "he ", "ing", " an", "and", "ion", " of"],
    "de": ["der", "ein", "sch", "ich", "die", "und", "che", "ung"],
    "fr": [" de", "de ", "es ", "ent", "le ", "que", " le", "les"],
}


def lang_ngram_score_sql(text_sql: str) -> dict:
    """Per-language trigram-profile score as ONE SQL string each:
    occurrences of each profile trigram counted via
    (length - length(replace(...))) / 3 — no explode, no UDF, pure
    whole-stage codegen — normalized by the trigram count. The SAME
    strings parse in DuckDB, so the arithmetic is structurally identical
    cross-engine (bit-identical IEEE evaluation order)."""
    t = f"lower({text_sql})"
    out = {}
    for lang, probes in TRIGRAM_PROFILES.items():
        hits = " + ".join(
            f"(length({t}) - length(replace({t}, '{p}', ''))) / 3"
            for p in probes)
        out[lang] = (f"(({hits}) / greatest(length({t}) - 2, 1))")
    return out


def lang_id_ngram(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, en_score, de_score, fr_score, predicted_lang): char-
    trigram-profile language ID (the brief's "n-gram heuristic" proper —
    the stopword-ratio variant is ``lang_id``). Deterministic argmax with
    fixed en→de→fr tie order."""
    scores = lang_ngram_score_sql(text_col)
    pred = (f"CASE WHEN ({scores['en']}) >= ({scores['de']}) "
            f"AND ({scores['en']}) >= ({scores['fr']}) THEN 'en' "
            f"WHEN ({scores['de']}) >= ({scores['fr']}) THEN 'de' "
            f"ELSE 'fr' END")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(F.expr(scores["en"]), 6).alias("en_score"),
        F.round(F.expr(scores["de"]), 6).alias("de_score"),
        F.round(F.expr(scores["fr"]), 6).alias("fr_score"),
        F.expr(pred).alias("predicted_lang"))
