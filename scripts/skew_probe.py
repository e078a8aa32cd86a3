"""Hot-term skew probe (round-5, round-4 VERDICT #3): WAND pruning and
compaction balance when one query term is stopword-like.

The north rule names "explicit skew handling for stopword-like hot terms";
all earlier 1M probes used near-uniform term df. Here ~40% of documents
carry the probe term ``hot`` (tf 1-3, hash-spread across the whole doc-id
space — the worst case for block-localized pruning) and ~0.02% carry the
rare term ``zqx`` (all of them also hot, so AND has overlap). The
reference analog is its ranking benchmark's high-df prefix query
(/root/reference/benchmarks/ranking.ts:7-9 — ``search("vi", prefix)``).

Reported:
* compaction shape for the hot list — df, blocks, bytes, and the
  per-(term, salt) phase-1 run balance (max/mean posting count across the
  ``hot_term_salts`` doc-id-range salts, decoded from the list itself);
* block-decode share + wall time for OR / AND / hot-only WAND top-10 vs
  the exact plan, with rank/score match checks.

Usage: python scripts/skew_probe.py [n_files] [hot_pct]
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
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .config("spark.sql.shuffle.partitions", str(cores))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from slimsearch_spark.config import IndexConfig, IndexLayout
    from slimsearch_spark.engine import SparkSearchIndex
    from slimsearch_spark.functions.codec import decode_blocked_posting_list
    from slimsearch_spark.sources.corpus import synth_corpus

    # hot term on hot_pct% of docs, hash-spread (NOT block-localized), with
    # tf 1-3 so BM25 scores vary and a top-10 threshold exists; rare term
    # on every 5000th doc, always co-occurring with hot
    docs = synth_corpus(spark, n_files, tokens_per_file=30)
    h = F.abs(F.xxhash64("path", F.lit(777)))
    overlay = (
        F.when(h % 100 >= hot_pct, F.lit(""))
        .when(h % 7 == 0, F.lit(" hot hot hot"))
        .when(h % 3 == 0, F.lit(" hot hot"))
        .otherwise(F.lit(" hot")))
    rare = F.when(h % 5000 < 1, F.lit(" zqx hot")).otherwise(F.lit(""))
    docs = docs.withColumn("content", F.concat("content", overlay, rare))
    docs = docs.repartition(cores * 2).cache()
    n_docs = docs.count()

    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo"])
    layout = IndexLayout()
    t0 = time.time()
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["repo", "path"])
    build_sec = round(time.time() - t0, 3)
    lists = idx.posting_lists()
    t0 = time.time()
    n_lists = lists.count()
    compact_sec = round(time.time() - t0, 3)

    out: dict = {"n_files": n_files, "n_docs": n_docs, "cores": cores,
                 "hot_pct": hot_pct, "build_sec": build_sec,
                 "compact_sec": compact_sec, "n_lists": n_lists,
                 "hot_term_salts": layout.hot_term_salts}

    # hot-list compaction shape + phase-1 salt balance, decoded from the
    # list itself (salt = doc_id // range, the exact phase-1 key)
    hot_row = lists.where(F.col("term") == "hot").collect()[0]
    stats = (lists.agg(F.expr("percentile_approx(df, 0.5)").alias("med_df"),
                       F.max("df").alias("max_df")).collect()[0])
    d, t, _fl = decode_blocked_posting_list(hot_row)
    max_doc = int(idx.next_id) - 1   # same value compaction salted with
    range_size = max(1, (max_doc + 1 + layout.hot_term_salts - 1)
                     // layout.hot_term_salts)
    per_salt = np.bincount((d // range_size).astype(np.int64),
                           minlength=layout.hot_term_salts)
    out.update({
        "hot_df": int(hot_row["df"]), "hot_blocks": int(hot_row["n_blocks"]),
        "hot_bytes": int(hot_row["n_bytes"]),
        "median_df": int(stats["med_df"]), "max_df": int(stats["max_df"]),
        "hot_tf_hist": {int(k): int(v) for k, v in
                        zip(*np.unique(t, return_counts=True))},
        "salt_postings_max": int(per_salt.max()),
        "salt_postings_mean": round(float(per_salt.mean()), 1),
        "salt_balance_max_over_mean": round(
            float(per_salt.max() / per_salt.mean()), 4),
    })

    def run(name, query, **kw):
        metrics: dict = {}
        t0 = time.time()
        got = idx.search_topk_wand(query, 10, metrics=metrics,
                                   adaptive_min_docs=0, **kw).collect()
        wand_sec = round(time.time() - t0, 3)
        t0 = time.time()
        want = idx.search_df(query, top_k=10, **kw).select(
            "doc_id", "score").collect()
        exact_sec = round(time.time() - t0, 3)
        match = [(r["doc_id"], round(r["score"], 9)) for r in got] == \
            [(r["doc_id"], round(r["score"], 9)) for r in want]
        total = metrics["blocks_total"].value
        decoded = metrics["blocks_decoded"].value
        out[name] = {
            "wand_sec": wand_sec, "exact_sec": exact_sec,
            "speedup": round(exact_sec / max(wand_sec, 1e-9), 2),
            "topk_matches_exact": match,
            "blocks_total": total, "blocks_decoded": decoded,
            "decoded_fraction": round(decoded / max(total, 1), 4),
        }

    run("or_hot_rare", "hot zqx")
    run("and_hot_rare", "hot zqx", combineWith="AND")
    run("hot_only", "hot")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
