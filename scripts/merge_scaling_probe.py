"""Merge-job scaling probe: the north rule's N→4N criterion applied to
the sharded-build MERGE job (merge_saved_indexes over prebuilt shards).

Two phases so each timed leg is its own Spark application at a chosen
core count (cgroup burst credits: cool down ≥4 min before EACH leg,
never two apps concurrently — BASELINE.md §bench variance):

    python scripts/merge_scaling_probe.py prep  <workdir> [n_files] [n_shards]
    python scripts/merge_scaling_probe.py merge <workdir> <cpus>

`prep` synthesizes the corpus (input-hint shape), builds + saves the
shard indexes under <workdir>/shard<i>, and prints a JSON line. `merge`
runs ONE merge job at local[<cpus>] over those shards and prints
{"cpus": N, "merge_sec": s, "files_per_sec": f, "calibration_sec": c}.
Scaling efficiency 8→32 = (fps_32 / fps_8) / 4.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _calibrate() -> float:
    t0 = time.time()
    x = 0x9E3779B9
    for _ in range(20_000_000):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    assert x >= 0
    return round(time.time() - t0, 3)


def _session(cpus: int):
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master(f"local[{cpus}]")
         .appName("merge_scaling_probe")
         .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory",
                 os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    return s


def prep(workdir: str, n_files: int, n_shards: int) -> None:
    from pyspark.sql import functions as F
    from slimsearch_spark.config import IndexConfig
    from slimsearch_spark.engine import SparkSearchIndex
    from slimsearch_spark.sources.corpus import synth_corpus
    from slimsearch_spark.sources.index_store import save_index

    spark = _session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo", "lang"])
    corpus = synth_corpus(spark, n_files, tokens_per_file=80).cache()
    corpus.count()
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)
    for i in range(n_shards):
        ix = SparkSearchIndex.build(
            corpus.where(F.pmod(F.xxhash64("path"), F.lit(n_shards)) == i),
            cfg, order_cols=["path"], cache=False)
        save_index(ix, f"{workdir}/shard{i}")
    print(json.dumps({"phase": "prep", "n_files": n_files,
                      "n_shards": n_shards, "workdir": workdir}))


def merge(workdir: str, cpus: int) -> None:
    from slimsearch_spark.sources.index_store import merge_saved_indexes

    calibration_sec = _calibrate()
    spark = _session(cpus)
    shards = sorted(
        os.path.join(workdir, d) for d in os.listdir(workdir)
        if d.startswith("shard"))
    out = f"{workdir}/merged_{cpus}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    manifest = merge_saved_indexes(spark, shards, out,
                                   check_duplicate_ids=False)
    sec = round(time.time() - t0, 2)
    print(json.dumps({"phase": "merge", "cpus": cpus, "merge_sec": sec,
                      "n_files": manifest["doc_count"],
                      "files_per_sec": round(manifest["doc_count"] / sec, 1),
                      "calibration_sec": calibration_sec}))


if __name__ == "__main__":
    phase = sys.argv[1]
    workdir = sys.argv[2]
    if phase == "prep":
        prep(workdir,
             int(sys.argv[3]) if len(sys.argv) > 3 else 200_000,
             int(sys.argv[4]) if len(sys.argv) > 4 else 4)
    elif phase == "merge":
        merge(workdir, int(sys.argv[3]))
    else:
        raise SystemExit(f"unknown phase {phase!r}")
