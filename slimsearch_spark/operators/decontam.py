"""Benchmark decontamination: flag / drop training documents that share
token n-grams with an evaluation (benchmark) set.

The standard LLM training-data hygiene step: any document containing a
shingle that also appears in a held-out eval suite is "contaminated" and
must be excluded from training, or the eval is measuring memorization.
Detection is exact n-gram overlap (the conservative industry default),
built entirely from joins + aggregations:

Scale shape (the 100 TB side is ``docs``):
  - the benchmark side is an eval suite — thousands of documents, a few
    million distinct shingles — so its distinct-shingle set BROADCASTS;
    the big side is never shuffled for the probe itself.
  - docs flow through ONE narrow projection (tokenize + shingle explode,
    reusing ``dedup.doc_shingles``'s JVM NGram path), a broadcast-hash
    semi-join, and ONE aggregation keyed on doc_id (map-side combinable).
    No self-joins, no candidate blow-up: cost is linear in corpus tokens.
  - ``broadcast_benchmark=False`` opts into a shuffle hash join for the
    rare giant-benchmark case (decontaminating against another corpus).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import doc_shingles


def benchmark_shingles(benchmark: DataFrame, n: int = 3,
                       text_col: str = "text") -> DataFrame:
    """Distinct token n-grams of the eval set → one ``term`` column.

    Computed once and reusable across decontamination runs (persist it or
    write it out when sweeping many corpora against one benchmark)."""
    bench = benchmark.select(
        F.monotonically_increasing_id().alias("__bid"),
        F.col(text_col).alias("__btext"))
    return (doc_shingles(bench, n, "__btext", "__bid")
            .select("term").distinct())


def contamination_hits(docs: DataFrame, benchmark: DataFrame, n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       bench_text_col: Optional[str] = None,
                       broadcast_benchmark: bool = True) -> DataFrame:
    """→ (doc_id, n_hits, n_shingles, hit_frac) for every document sharing
    ≥ 1 distinct token ``n``-gram with the benchmark set.

    ``n_hits`` counts DISTINCT contaminated shingles, ``n_shingles`` the
    doc's distinct shingle count, ``hit_frac`` their ratio — the knob a
    pipeline thresholds on (1 hit of a 13-gram is the strict default;
    fraction thresholds suit short-n shingles)."""
    bench_sh = (benchmark_shingles(benchmark, n, bench_text_col or text_col)
                .withColumn("__hit", F.lit(1)))
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    # ONE corpus scan: left-join marks contaminated shingles, one
    # aggregation counts hits and shingles together (an earlier draft's
    # semi-join + separate size aggregation shingled the corpus twice)
    sh = doc_shingles(docs, n, text_col, id_col)
    return (sh.join(bench_sh, "term", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shingles"),
                 F.count("__hit").alias("n_hits"))
            .where(F.col("n_hits") > 0)
            .select("doc_id", "n_hits", "n_shingles",
                    F.round(F.col("n_hits") / F.col("n_shingles"), 6)
                    .alias("hit_frac")))


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 3,
                  min_hits: int = 1, min_frac: float = 0.0,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: Optional[str] = None,
                  broadcast_benchmark: bool = True) -> DataFrame:
    """Training corpus minus contaminated documents.

    A doc is dropped when ``n_hits ≥ min_hits`` AND ``hit_frac ≥
    min_frac`` (defaults: any single shared shingle kills the doc).
    Anti-join on doc_id — the survivors stream through unchanged, so this
    composes with downstream dedup/sampling without re-materializing."""
    flagged = (contamination_hits(docs, benchmark, n, text_col, id_col,
                                  bench_text_col, broadcast_benchmark)
               .where((F.col("n_hits") >= min_hits)
                      & (F.col("hit_frac") >= min_frac))
               .select(F.col("doc_id").alias(id_col)))
    return docs.join(flagged, id_col, "left_anti")
