"""Incremental-compaction (segment append) probe at ≥1M docs (round 4).

Measures the cost `add_all` pays on an ALREADY-COMPACTED index under the
round-4 segment path vs the pre-round-4 behavior (invalidate + full
re-encode before top-k service resumes), plus the query-latency delta of
serving a segmented vs a merged index, with top-k equality checked
against the exact plan.

Usage: python scripts/segment_probe.py [n_files] [tokens_per_file] [batch]
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
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else n_files // 100
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .config("spark.sql.shuffle.partitions", str(cores))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")  # <32g: compressed OOPs
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from slimsearch_spark.config import IndexConfig
    from slimsearch_spark.engine import SparkSearchIndex
    from slimsearch_spark.sources.corpus import synth_corpus

    # base corpus + a disjoint ingest batch (distinct path namespace)
    docs = synth_corpus(spark, n_files, tokens_per_file=tpf)
    docs = docs.repartition(cores * 2).cache()
    docs.count()
    delta = (synth_corpus(spark, batch, tokens_per_file=tpf)
             .withColumn("path", F.concat(F.lit("ingest/"), F.col("path")))
             .repartition(max(2, cores // 4)).cache())
    delta.count()

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

    q = "varint delta merge"

    def wand_secs():
        t0 = time.time()
        rows = idx.search_topk_wand(q, 10).collect()
        return round(time.time() - t0, 3), \
            [(r["doc_id"], round(r["score"], 9)) for r in rows]

    merged_q_sec, _ = wand_secs()

    # round-4 path: append the batch as an encoded segment
    t0 = time.time()
    idx.add_all(delta)
    append_sec = round(time.time() - t0, 3)
    n_segments = idx._segment_count

    seg_q_sec, seg_top = wand_secs()
    exact_top = [(r["doc_id"], round(r["score"], 9)) for r in
                 idx.search_df(q, top_k=10)
                 .select("doc_id", "score").collect()]

    # tiered merge at the max_segments cap (round-4 session 3): stack two
    # more batches, then set the cap so the NEXT add_all tiered-merges the
    # appended segments (O(appended docs), base untouched) before
    # appending — compare with the O(index) full re-encode below
    extra = []
    for i in (2, 3, 4):
        d = (synth_corpus(spark, batch, tokens_per_file=tpf)
             .withColumn("path", F.concat(F.lit(f"ingest{i}/"),
                                          F.col("path")))
             .repartition(max(2, cores // 4)).cache())
        d.count()
        extra.append(d)
    idx.add_all(extra[0])
    idx.add_all(extra[1])
    assert idx._segment_count == 4
    idx.max_segments = 4
    base_seg = idx._segments[0]
    t0 = time.time()
    idx.add_all(extra[2])  # merge(batches 1-3) + append(batch 4)
    tiered_overflow_sec = round(time.time() - t0, 3)
    tiered_ok = (idx._segment_count == 3
                 and idx._segments[0] is base_seg)
    tiered_q_sec, tiered_top = wand_secs()
    tiered_exact = [(r["doc_id"], round(r["score"], 9)) for r in
                    idx.search_df(q, top_k=10)
                    .select("doc_id", "score").collect()]

    # pre-round-4 behavior: invalidate and re-encode the whole index
    idx._invalidate_posting_lists()
    t0 = time.time()
    idx.posting_lists().count()
    reencode_sec = round(time.time() - t0, 3)
    remerged_q_sec, merged_top = wand_secs()

    out = {
        "metric": "segment_append_probe",
        "n_files": n_files, "tokens_per_file": tpf, "batch": batch,
        "cores": cores,
        "build_sec": build_sec, "compact_sec": compact_sec,
        "append_segment_sec": append_sec,
        "tiered_overflow_sec": tiered_overflow_sec,
        "full_reencode_sec": reencode_sec,
        "append_speedup": round(reencode_sec / max(append_sec, 1e-9), 2),
        "tiered_speedup": round(
            reencode_sec / max(tiered_overflow_sec, 1e-9), 2),
        "n_segments": n_segments,
        "tiered_base_untouched": tiered_ok,
        "wand_q_sec": {"merged_before": merged_q_sec,
                       "segmented": seg_q_sec,
                       "tiered": tiered_q_sec,
                       "merged_after": remerged_q_sec},
        "topk_equal_exact": seg_top == exact_top,
        "topk_equal_tiered": tiered_top == tiered_exact,
        # the full re-encode happens after all four appends — its top-k
        # must match the tiered state's (same corpus), not seg_top's
        "topk_equal_merged": tiered_top == merged_top,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
