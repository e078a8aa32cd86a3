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


def read_corpus(spark: SparkSession, table_or_path: str,
                file_format: str = "parquet") -> DataFrame:
    """Load the source-code corpus from a CATALOG TABLE or a file path —
    the north star's "over Iceberg tables" source seam.

    A name without a path separator (``prod.raw.sources``, ``my_view``)
    goes through ``spark.read.table()``: with an Iceberg catalog configured
    on the session (``spark.sql.catalog.<name>=org.apache.iceberg...``)
    that is the Iceberg scan path, with all of Iceberg's partition/file
    pruning intact — and it equally resolves Hive tables or temp views, so
    the seam is testable without the Iceberg runtime (this sandbox has
    none; the gate is the same import-try pattern as the Pillow decoder).
    Anything containing ``/`` or a URI scheme loads as files
    (``file_format``, default parquet).

    The engine is agnostic to which: everything downstream consumes the
    returned DataFrame, so predicate/column pushdown reaches whichever
    DataSourceV2 implementation backs it."""
    if "/" in table_or_path or "://" in table_or_path:
        return spark.read.format(file_format).load(table_or_path)
    return spark.read.table(table_or_path)
