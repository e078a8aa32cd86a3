"""Deterministic synthetic source-code corpus in the BASELINE.json
``input_hint`` shape: (repo, path, commit, lang, content) + content_sha256.

Generation is pure column expressions over ``spark.range`` — fully
distributed and reproducible at any scale (content is a pure function of the
row id via xxhash64 mixing, no RNG state). The vocabulary includes shared
prefixes (parse/parser/parsing/...) and near-miss terms (edit distance 1-2)
to exercise prefix and fuzzy expansion, plus hot stopword-like terms
(the/import/license/return) to exercise skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "ts", "java", "go", "rs"]

VOCAB = [
    # hot, stopword-like (skewed df on purpose)
    "the", "import", "license", "return", "if", "def", "self", "value",
    # shared-prefix families (prefix expansion)
    "parse", "parser", "parsing", "parsed", "parseint",
    "index", "indexer", "indexing", "indexed",
    "token", "tokens", "tokenize", "tokenizer",
    "stream", "streams", "streaming",
    # near-miss pairs (fuzzy expansion, edit distance 1-2)
    "query", "quary", "merge", "merje", "shuffle", "shufle",
    "partition", "partion", "broadcast", "brodcast",
    # body
    "spark", "engine", "posting", "varint", "delta", "bm25", "score",
    "field", "document", "search", "suggest", "fuzzy", "prefix", "term",
    "weight", "boost", "filter", "wildcard", "vacuum", "discard", "batch",
    "column", "vector", "arrow", "codec", "bucket", "salt", "skew", "heap",
]


def synth_corpus(spark: SparkSession, n_files: int,
                 tokens_per_file: int = 200, seed: int = 42) -> DataFrame:
    """→ (repo, path, commit, lang, content, content_sha256), n_files rows.

    Hot terms get boosted frequency via a skew tilt: token slot t of file i
    picks vocab[h % v] where the hash is biased toward low indices for ~25%
    of slots (the hot block of the vocabulary)."""
    v = len(VOCAB)
    n_hot = 8
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])

    df = spark.range(n_files).withColumnRenamed("id", "i")
    tok_idx = F.sequence(F.lit(0), F.lit(tokens_per_file - 1))
    h = lambda t: F.abs(F.xxhash64(F.col("i"), t, F.lit(seed)))  # noqa: E731
    pick = F.transform(
        tok_idx,
        lambda t: F.element_at(
            vocab_arr,
            (F.when(h(t) % 4 == 0, h(t * 7 + 1) % n_hot)
             .otherwise(h(t * 13 + 5) % v) + 1).cast("int")))
    out = (df
           .withColumn("repo", F.concat(F.lit("org"), (F.col("i") % 20),
                                        F.lit("/proj"), (F.col("i") % 7)))
           .withColumn("path", F.concat(F.lit("src/mod"), (F.col("i") % 50),
                                        F.lit("/file"), F.col("i"),
                                        F.lit(".py")))
           .withColumn("lang", F.element_at(
               F.array(*[F.lit(x) for x in LANGS]),
               (F.abs(F.xxhash64("i", F.lit(seed + 1))) % len(LANGS) + 1)
               .cast("int")))
           .withColumn("content", F.array_join(pick, " "))
           .withColumn("commit", F.sha2(F.concat("repo", "path"), 256)
                       .substr(1, 40))
           .withColumn("content_sha256", F.sha2(F.col("content"), 256))
           .select("repo", "path", "commit", "lang", "content",
                   "content_sha256"))
    return out


def verify_sha256_invariant(docs: DataFrame,
                            content_col: str = "content",
                            sha_col: str = "content_sha256") -> int:
    """North-rule per-row invariant: sha256(content) == content_sha256.
    Returns the number of violations (0 = pass); one scan, no collect."""
    return docs.where(
        F.sha2(F.col(content_col), 256) != F.col(sha_col)).count()
