"""Query-side scaling-efficiency evidence (complement to
scripts/scaling_bench.py, which covers the BUILD half of the north rule).

Runs the identical batched query job — `search_many_df` over a compacted
index of a deterministic synthetic corpus — at two parallelism levels
(local[N] and local[4N], each a fresh pinned subprocess JVM) and reports
query throughput at both plus the scaling efficiency. The serving layout
(index build + block-max compaction) materializes untimed inside each
leg; the timed section is ONE Spark job answering the whole query batch,
so the ratio measures the scoring plan's parallel section, not job
scheduling.

Usage: python scripts/query_scaling_probe.py [n_files] [tokens_per_file]
           [n_queries] [N] [cooldown_sec] [probe_sec]
Prints one JSON line; appended by hand to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

QUERY_POOL = [
    "varint delta merge", "the parse", "spark shuffle partition",
    "token stream engine", "bm25 score field", "index bucket salt",
    "query merge broadcast", "posting codec arrow", "search suggest fuzzy",
    "document weight boost", "vacuum discard batch", "column vector heap",
    "parse tokenizer", "delta skew", "prefix term filter", "engine score",
    "import license return", "the spark merge", "stream partition value",
    "wildcard field document", "shuffle codec", "salt heap vector",
    "suggest boost", "token delta spark", "merge engine column",
    "score posting the", "filter vacuum", "arrow bucket stream",
    "fuzzy weight", "parse index token", "batch broadcast", "term varint",
]

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

cores = int(sys.argv[1]); n_files = int(sys.argv[2])
tpf = int(sys.argv[3]); n_q = int(sys.argv[4])
spark = (SparkSession.builder.master(f"local[{{cores}}]")
         .config("spark.sql.shuffle.partitions", str(cores))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from slimsearch_spark.config import IndexConfig
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.sources.corpus import synth_corpus

QUERY_POOL = {pool!r}
queries = [QUERY_POOL[i % len(QUERY_POOL)] + " " + str(i // len(QUERY_POOL))
           if i >= len(QUERY_POOL) else QUERY_POOL[i] for i in range(n_q)]

docs = synth_corpus(spark, n_files, tokens_per_file=tpf)
docs = docs.repartition(cores * 2).cache()
docs.count()
cfg = IndexConfig(fields=["content"], id_field="path",
                  store_fields=["repo"])
idx = SparkSearchIndex.build(docs, cfg, order_cols=["repo", "path"])
idx.postings.count()
idx.doc_stats.count()
idx.posting_lists().count()     # serving layout (untimed build artifact)

# one warm call so JIT/codegen for the scoring shapes is paid outside the
# timed section in BOTH legs equally
idx.search_many_df(queries[:2], top_k=10).collect()

t0 = time.time()
rows = idx.search_many_df(queries, top_k=10).collect()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "batch_sec": round(dt, 3),
                   "queries_per_sec": round(n_q / dt, 2),
                   "n_rows": len(rows)}}))
"""


def run(cores: int, n_files: int, tpf: int, n_q: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = WORKER.format(repo=repo, pool=QUERY_POOL)
    argv = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code,
            str(cores), str(n_files), str(tpf), str(n_q)]
    out = subprocess.run(argv, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    tpf = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    cooldown = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    probe_sec = int(sys.argv[6]) if len(sys.argv) > 6 else 0

    legs = []
    for cores in (n, 4 * n):
        if cooldown:
            time.sleep(cooldown)
        legs.append(run(cores, n_files, tpf, n_q))

    out = {
        "metric": "query_scaling_probe",
        "n_files": n_files, "tokens_per_file": tpf, "n_queries": n_q,
        "legs": legs,
        "speedup": round(legs[1]["queries_per_sec"]
                         / legs[0]["queries_per_sec"], 3),
        "efficiency": round(legs[1]["queries_per_sec"]
                            / legs[0]["queries_per_sec"] / 4, 3),
    }
    if probe_sec:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from scaling_bench import quota_probe
        p_n = quota_probe(n, probe_sec)
        p_4n = quota_probe(4 * n, probe_sec)
        out["achievable_speedup"] = round(p_4n / p_n, 2)
        out["fraction_of_achievable"] = round(
            out["speedup"] / (p_4n / p_n), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
