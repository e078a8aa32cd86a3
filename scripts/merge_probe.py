"""Sharded-build merge probe: k bounded shard builds + one merge job vs
one monolithic build, at --n synthetic source files.

    python scripts/merge_probe.py [n_files] [n_shards] [tokens_per_file]

Reports (one JSON line):
  - build_full_sec:   monolithic build + save (tokenize + compact + write)
  - build_shards_sec: k shard builds + saves, run sequentially (what k
                      INDEPENDENT bounded jobs would each pay; wall clock
                      on a real cluster is ~build_shards_sec / k)
  - merge_sec:        the merge job alone (load k saved shards → offset →
                      union → save: postings re-read + salted term-hash
                      compaction shuffle + write — NO tokenization)
  - merge_vs_rebuild: merge_sec / build_full_sec — the operational win of
                      re-merging prebuilt shards instead of rebuilding
  - topk_equal:       merged index's WAND top-10 tie-groups == monolithic
                      (rounded-score docsets, not ordered lists — ±1-ulp
                      summation-order noise flips exact-tie neighbors)

Run with cooled CPU credits and nothing else heavy (BASELINE.md
§bench variance); legs are sequential inside ONE Spark app.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tie_groups(rows):
    by_score = {}
    for r in rows:
        by_score.setdefault(round(r["score"], 6), set()).add(r["path"])
    return by_score


def _calibrate() -> float:
    """Burst-credit canary (same loop as bench.py): ~0.8 s cold-credit,
    ~3x that drained — absolute numbers at >=2 carry 2-4x inflation."""
    t0 = time.time()
    x = 0x9E3779B9
    for _ in range(20_000_000):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    assert x >= 0
    return round(time.time() - t0, 3)


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    tokens = int(sys.argv[3]) if len(sys.argv) > 3 else 80
    calibration_sec = _calibrate()

    from pyspark.sql import SparkSession, functions as F
    from slimsearch_spark.config import IndexConfig
    from slimsearch_spark.engine import SparkSearchIndex
    from slimsearch_spark.sources.corpus import synth_corpus
    from slimsearch_spark.sources.index_store import (load_index,
                                                      merge_saved_indexes,
                                                      save_index)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("merge_probe")
             .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo", "lang"])
    corpus = synth_corpus(spark, n_files, tokens_per_file=tokens).cache()
    corpus.count()

    work = tempfile.mkdtemp(prefix="merge_probe_")
    out = {"n_files": n_files, "n_shards": n_shards,
           "tokens_per_file": tokens, "cpus": int(cpus),
           "calibration_sec": calibration_sec}
    try:
        # leg 1: monolithic build + save
        t0 = time.time()
        full = SparkSearchIndex.build(corpus, cfg, order_cols=["path"],
                                      cache=False)
        save_index(full, f"{work}/full")
        out["build_full_sec"] = round(time.time() - t0, 2)

        # leg 2: k bounded shard builds + saves (sequential)
        t0 = time.time()
        shard_paths = []
        for i in range(n_shards):
            ix = SparkSearchIndex.build(
                corpus.where(F.pmod(F.xxhash64("path"),
                                    F.lit(n_shards)) == i),
                cfg, order_cols=["path"], cache=False)
            p = f"{work}/shard{i}"
            save_index(ix, p)
            shard_paths.append(p)
        out["build_shards_sec"] = round(time.time() - t0, 2)

        # leg 3: the merge job alone (no tokenization — the win)
        t0 = time.time()
        merge_saved_indexes(spark, shard_paths, f"{work}/merged",
                            check_duplicate_ids=False)
        out["merge_sec"] = round(time.time() - t0, 2)
        out["merge_vs_rebuild"] = round(
            out["merge_sec"] / out["build_full_sec"], 3)
        out["merge_files_per_sec"] = round(n_files / out["merge_sec"], 1)
        out["build_files_per_sec"] = round(
            n_files / out["build_full_sec"], 1)

        # correctness: WAND top-10 tie-groups identical
        q = "spark posting merge"
        mono = load_index(spark, f"{work}/full", cache=False)
        merged = load_index(spark, f"{work}/merged", cache=False)
        a = (mono.search_topk_wand(q, 10, adaptive_min_docs=0)
             .join(mono.docs, "doc_id").select("path", "score").collect())
        b = (merged.search_topk_wand(q, 10, adaptive_min_docs=0)
             .join(merged.docs, "doc_id").select("path", "score").collect())
        out["topk_equal"] = tie_groups(a) == tie_groups(b)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
