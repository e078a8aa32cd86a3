"""Query-side scale probe at ≥1M docs (round-3): measures the exact
single-plan top-k vs block-max WAND on the same compacted index, plus the
realized pruning (blocks decoded vs present).

The 1M-file BUILD probe exists in BASELINE.md; this adds the query side:
at 1M docs the adaptive default (adaptive_min_docs=100k) takes the real
WAND path, so `wand` here is both the forced and the adaptive behavior.

Usage: python scripts/query_scale_probe.py [n_files] [tokens_per_file]
Prints one JSON line; appended by hand to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    tpf = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .config("spark.sql.shuffle.partitions", str(cores))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")  # <32g: compressed OOPs
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from slimsearch_spark.config import IndexConfig
    from slimsearch_spark.engine import SparkSearchIndex
    from slimsearch_spark.sources.corpus import synth_corpus

    docs = synth_corpus(spark, n_files, tokens_per_file=tpf)
    docs = docs.repartition(cores * 2).cache()
    docs.count()

    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo"])
    t0 = time.time()
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["repo", "path"])
    idx.postings.count()
    idx.doc_stats.count()
    build_sec = round(time.time() - t0, 3)

    t0 = time.time()
    idx.posting_lists().count()  # one-time compaction, cached
    compact_sec = round(time.time() - t0, 3)

    def best_of(fn, n=2):
        times = []
        for _ in range(n):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 3)

    queries = ["varint delta merge", "the parse",
               "spark shuffle partition skew"]
    out_q = {}
    for q in queries:
        exact_sec = best_of(lambda: idx.search_df(q, top_k=10)
                            .select("doc_id", "score").collect())
        wand_sec = best_of(lambda: idx.search_topk_wand(q, 10).collect())
        and_exact_sec = best_of(
            lambda: idx.search_df(q, top_k=10, combineWith="AND")
            .select("doc_id", "score").collect())
        and_wand_sec = best_of(
            lambda: idx.search_topk_wand(q, 10, combineWith="AND")
            .collect())
        metrics: dict = {}
        idx.search_topk_wand(q, 10, metrics=metrics).collect()
        out_q[q] = {
            "exact_sec": exact_sec, "wand_sec": wand_sec,
            "wand_win": round(exact_sec / wand_sec, 2),
            "and_exact_sec": and_exact_sec, "and_wand_sec": and_wand_sec,
            "and_wand_win": round(and_exact_sec / and_wand_sec, 2),
            "blocks_total": metrics["blocks_total"].value,
            "blocks_decoded": metrics["blocks_decoded"].value,
            "blocks_theta0_decoded":
                metrics["blocks_theta0_decoded"].value,
        }

    print(json.dumps({
        "n_files": n_files, "tokens_per_file": tpf, "cores": cores,
        "build_sec": build_sec, "files_per_sec": round(n_files / build_sec, 1),
        "compact_sec": compact_sec, "queries": out_q,
    }))


if __name__ == "__main__":
    main()
