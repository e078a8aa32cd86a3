"""Expansion-heavy queries at ≥1M docs (round-4, round-3 VERDICT #8): the
round-3 probe covered exact-term OR/AND; this measures prefix / fuzzy /
combined expansion and autosuggest, and isolates the term-dictionary scan
(the distinct over postings + Levenshtein threshold scan) that expansion
queries pay and exact-term queries don't.

Usage: python scripts/expansion_scale_probe.py [n_files] [tokens_per_file]
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
    build_sec = round(time.time() - t0, 3)

    # the term dictionary (distinct (term, field) over live postings) is
    # built lazily by the FIRST expansion query and cached across queries —
    # time it alone so per-query numbers below are the steady-state cost
    # and the dictionary share is explicit
    t0 = time.time()
    idx.term_dictionary([0]).count()
    dict_build_sec = round(time.time() - t0, 3)

    def best_of(fn, n=2):
        times = []
        for _ in range(n):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 3)

    out = {}
    out["prefix_par_top10"] = best_of(
        lambda: idx.search_df("par", prefix=True, top_k=10)
        .select("doc_id", "score").collect())
    out["fuzzy_quary_top10"] = best_of(
        lambda: idx.search_df("quary", fuzzy=1, top_k=10)
        .select("doc_id", "score").collect())
    out["combined_spak_top10"] = best_of(
        lambda: idx.search_df("spak", prefix=True, fuzzy=0.2, top_k=10)
        .select("doc_id", "score").collect())
    # the wide-expansion DF path (no driver collect) at the same scale
    out["prefix_par_top10_df_path"] = best_of(
        lambda: idx.search_df("par", prefix=True, top_k=10,
                              expansionCollectThreshold=0)
        .select("doc_id", "score").collect())
    out["autosuggest_par"] = best_of(
        lambda: idx.auto_suggest_df("par").limit(10).collect())
    # exact-term baseline: what the same top-10 costs with no expansion
    out["exact_parse_top10"] = best_of(
        lambda: idx.search_df("parse", top_k=10)
        .select("doc_id", "score").collect())

    print(json.dumps({
        "n_files": n_files, "tokens_per_file": tpf, "cores": cores,
        "build_sec": build_sec,
        "dict_build_sec": dict_build_sec,
        "dict_share_vs_prefix": round(
            dict_build_sec / max(out["prefix_par_top10"], 1e-9), 2),
        "queries": out,
    }))


if __name__ == "__main__":
    main()
