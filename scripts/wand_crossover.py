"""WAND crossover evidence (round 2): at what corpus size does the
block-max WAND top-k beat the exact single-plan top-k?

Below the crossover the θ0 pre-pass + route/shard stages cost more than
they prune, so ``search_topk_wand`` defaults to an adaptive skip
(``adaptive_min_docs``). This script measures both paths on the synthetic
source-code corpus at increasing sizes and prints one JSON line per size;
the observed crossover is recorded in BASELINE.md and sets the default.

Usage: python scripts/wand_crossover.py [sizes_csv] [tokens_per_file]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["the parse", "varint merge", "the", "tokenizer stream index"]


def main() -> None:
    sizes = [int(x) for x in
             (sys.argv[1] if len(sys.argv) > 1 else "20000,60000,150000")
             .split(",")]
    tpf = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from slimsearch_spark.config import IndexConfig
    from slimsearch_spark.engine import SparkSearchIndex
    from slimsearch_spark.sources.corpus import synth_corpus

    cfg = IndexConfig(fields=["content"], id_field="path")

    for n in sizes:
        docs = synth_corpus(spark, n, tokens_per_file=tpf)
        docs = docs.repartition(int(cpus) * 2).cache()
        docs.count()
        idx = SparkSearchIndex.build(docs, cfg, order_cols=["repo", "path"])
        idx.postings.count()
        t0 = time.time()
        idx.posting_lists().count()  # compaction, once per index lifetime
        compact_sec = time.time() - t0

        def best_of(fn, reps=3):
            best = float("inf")
            for _ in range(reps):
                t = time.time()
                fn()
                best = min(best, time.time() - t)
            return best

        per_q = {}
        for q in QUERIES:
            exact = best_of(lambda: idx.search_df(q, top_k=10)
                            .select("doc_id", "score").collect())
            wand = best_of(lambda: idx.search_topk_wand(
                q, 10, adaptive_min_docs=0).collect())
            per_q[q] = {"exact_sec": round(exact, 3),
                        "wand_sec": round(wand, 3)}
        tot_e = sum(v["exact_sec"] for v in per_q.values())
        tot_w = sum(v["wand_sec"] for v in per_q.values())
        print(json.dumps({
            "n_docs": n, "tokens_per_file": tpf,
            "compact_sec": round(compact_sec, 3),
            "queries": per_q,
            "exact_total_sec": round(tot_e, 3),
            "wand_total_sec": round(tot_w, 3),
            "wand_speedup": round(tot_e / tot_w, 3),
        }), flush=True)
        docs.unpersist()
        idx.postings.unpersist()
        idx._invalidate_posting_lists()


if __name__ == "__main__":
    main()
