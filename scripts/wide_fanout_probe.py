"""Wide-expansion route/θ0 stage cost at 10⁴ derived terms (round-5,
round-4 VERDICT #4).

The route and θ0 stages of plans/wand.py iterate matched (term, field)
list rows in Python (`pdf.iterrows()`); for normal queries that is a few
rows, but a short prefix over a large vocabulary can match 10⁴⁺ lists.
This probe builds a corpus whose ENTIRE vocabulary shares the prefix
``v`` (n_terms distinct terms, df ≈ n_files·tokens/n_terms each), runs
the prefix query through the wide-expansion WAND path, and reports the
route/θ0 stages' summed in-Python wall seconds (``metrics["route_sec"]``
/ ``["theta0_sec"]`` accumulators) against end-to-end wall time — the
measurement the round-4 verdict asked for before trusting the per-row
loop at wide fan-out.

Usage: python scripts/wide_fanout_probe.py [n_files] [n_terms]
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
    n_terms = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    tpf = 30
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .config("spark.sql.shuffle.partitions", str(cores))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from slimsearch_spark.config import IndexConfig
    from slimsearch_spark.engine import SparkSearchIndex

    # every token is v<h % n_terms>: the whole vocabulary shares prefix
    # "v", so search("v", prefix=True) expands to ~n_terms derived terms
    df = spark.range(n_files).withColumnRenamed("id", "i")
    tok = F.transform(
        F.sequence(F.lit(0), F.lit(tpf - 1)),
        lambda t: F.concat(
            F.lit("v"),
            (F.abs(F.xxhash64(F.col("i"), t, F.lit(99))) % n_terms)))
    docs = (df.withColumn("path", F.concat(F.lit("f"), F.col("i")))
            .withColumn("repo", (F.col("i") % 20).cast("string"))
            .withColumn("content", F.array_join(tok, " "))
            .drop("i"))
    docs = docs.repartition(cores * 2).cache()
    docs.count()

    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo"])
    t0 = time.time()
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["repo", "path"])
    build_sec = round(time.time() - t0, 3)

    out: dict = {"n_files": n_files, "n_terms": n_terms, "cores": cores,
                 "build_sec": build_sec}

    def run(name, query, **kw):
        metrics: dict = {}
        t0 = time.time()
        got = idx.search_topk_wand(query, 10, metrics=metrics,
                                   adaptive_min_docs=0, **kw).collect()
        wand_sec = round(time.time() - t0, 3)
        out[name] = {
            "wand_sec": wand_sec,
            "route_sec_sum": round(metrics["route_sec"].value, 3),
            "theta0_sec_sum": round(metrics["theta0_sec"].value, 3),
            "route_share_of_core_budget": round(
                metrics["route_sec"].value / max(wand_sec * cores, 1e-9),
                4),
            "blocks_total": metrics["blocks_total"].value,
            "blocks_decoded": metrics["blocks_decoded"].value,
            "n_rows": len(got),
        }
        return got

    # warm the term dictionary once (cached across expansion queries),
    # timed separately so the route measurement is not dictionary-build
    t0 = time.time()
    idx.search_topk_wand("v", 10, prefix=True, adaptive_min_docs=0).collect()
    out["first_prefix_query_sec"] = round(time.time() - t0, 3)

    got = run("prefix_wide", "v", prefix=True)
    t0 = time.time()
    want = idx.search_df("v", prefix=True, top_k=10).select(
        "doc_id", "score").collect()
    out["exact_sec"] = round(time.time() - t0, 3)
    out["topk_matches_exact"] = (
        [(r["doc_id"], round(r["score"], 9)) for r in got]
        == [(r["doc_id"], round(r["score"], 9)) for r in want])
    run("exact_term", "v0")   # narrow-fan-out control, same index
    print(json.dumps(out))


if __name__ == "__main__":
    main()
