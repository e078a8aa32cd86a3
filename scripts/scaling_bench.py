"""Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N parallelism).

No real cluster in this sandbox: runs the identical index-build job at
local[8] and local[32] on the same synthetic corpus (driver instruction) and
reports throughput at both + efficiency. Each measurement runs in a fresh
subprocess so the two JVMs can't share state.

Usage: python scripts/scaling_bench.py [n_files] [tokens_per_file]
Prints one JSON line; also appended by hand to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

cores = int(sys.argv[1]); n_files = int(sys.argv[2]); tpf = int(sys.argv[3])
spark = (SparkSession.builder.master(f"local[{{cores}}]")
         .config("spark.sql.shuffle.partitions", str(cores))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")  # <32g: keep compressed OOPs
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from slimsearch_spark.config import IndexConfig
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.sources.corpus import synth_corpus

docs = synth_corpus(spark, n_files, tokens_per_file=tpf)
docs = docs.repartition(cores * 2).cache()
docs.count()  # materialize input outside the timed section

cfg = IndexConfig(fields=["content"], id_field="path",
                  store_fields=["repo", "lang"])
t0 = time.time()
# cache=True = the production build path (eager one-pass materialization
# of postings + doc_stats from a persisted tokenized corpus)
idx = SparkSearchIndex.build(docs, cfg, order_cols=["repo", "path"])
idx.postings.count()
idx.doc_stats.count()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "build_sec": round(dt, 3),
                   "files_per_sec": round(n_files / dt, 1)}}))
"""


def run(cores: int, n_files: int, tpf: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = WORKER.format(repo=repo)
    out = subprocess.run([sys.executable, "-c", code, str(cores),
                          str(n_files), str(tpf)],
                         capture_output=True, text=True, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    tpf = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    # optional idle cooldown (s) before EACH run: this box's cgroup burst
    # credits drain during the first run and make whichever job runs
    # second measure 3-4x slower (BASELINE.md round-2 confounder) —
    # ≥240 s of idle refills them
    cooldown = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    import time
    if cooldown:
        time.sleep(cooldown)
    rn = run(n, n_files, tpf)
    if cooldown:
        time.sleep(cooldown)
    r4n = run(4 * n, n_files, tpf)
    efficiency = (r4n["files_per_sec"] / rn["files_per_sec"]) / 4.0
    print(json.dumps({
        "metric": "index_build_scaling",
        "n_files": n_files, "tokens_per_file": tpf,
        f"local{n}": rn, f"local{4 * n}": r4n,
        "speedup_n_to_4n": round(r4n["files_per_sec"] / rn["files_per_sec"], 3),
        "scaling_efficiency_n_to_4n": round(efficiency, 3),
        "target": 0.8,
    }))


if __name__ == "__main__":
    main()
