"""Per-entry profiler for the optimization rounds (guide §1).

NOT the frozen driver bench (bench.py) — this harness exists to attribute
time: per entry it records wall seconds for N draws, the Spark job count
(via job groups + the status tracker), and optionally dumps
``explain("formatted")`` to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python bench_extra.py [--entries a,b,c] [--draws 2] \
        [--explain-dir plans/r06 --explain-suffix before]

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
Prints one JSON line: {"entries": {name: {"draws": [...], "jobs": n}}}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", default=None)
    ap.add_argument("--draws", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--explain-suffix", default="before")
    ap.add_argument("--skip-fixtures", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("slimsearch_spark_bench_extra")
             .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from slimsearch_spark.config import IndexConfig
    from slimsearch_spark.engine import SparkSearchIndex

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()

    if not args.skip_fixtures:
        # same untimed fixture prep as bench.py
        cfg = IndexConfig(fields=["text"], id_field="doc_id",
                          store_fields=["lang", "source"])
        idx = SparkSearchIndex.build(docs, cfg, order_cols=["doc_id"])
        idx.postings.count()
        idx.doc_stats.count()
        E._INDEX_CACHE[("idx", sf_dir)] = idx
        cfg2 = IndexConfig(fields=["text", "source"], id_field="doc_id")
        idx2 = SparkSearchIndex.build(docs, cfg2, order_cols=["doc_id"])
        idx2.postings.count()
        idx2.doc_stats.count()
        E._INDEX_CACHE[("idx2", sf_dir)] = idx2
        E.q_ann_ivf_topk_saved(spark, sf_dir)
        idx.posting_lists().count()
        idx2.posting_lists().count()
        E.queries()["wand_topk_discarded"](spark, sf_dir).count()

    extra = {"wand_topk_adaptive": E.q_wand_topk_adaptive,
             "ann_ivf_topk": E.q_ann_ivf_topk,
             "ann_ivf_topk_saved": E.q_ann_ivf_topk_saved}
    qs = dict(E.queries(), **extra)
    names = (args.entries.split(",") if args.entries
             else [n for n in qs])

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict = {}
    for name in names:
        fn = qs[name]
        rec = {"draws": [], "jobs": None, "rows": None}
        for d in range(args.draws):
            group = f"{name}#{d}"
            sc.setJobGroup(group, group)
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            rec["draws"].append(round(time.time() - t0, 3))
            rec["rows"] = n
            jobs = tracker.getJobIdsForGroup(group)
            if d == 0:
                rec["jobs"] = len(jobs)
            if d == 0 and args.explain_dir:
                os.makedirs(args.explain_dir, exist_ok=True)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain(mode="formatted")
                p = os.path.join(args.explain_dir,
                                 f"{name}_{args.explain_suffix}.txt")
                with open(p, "w") as f:
                    f.write(buf.getvalue())
        sc.setJobGroup("idle", "idle")
        out[name] = rec
        print(f"## {name}: draws={rec['draws']} jobs={rec['jobs']} "
              f"rows={rec['rows']}", file=sys.stderr)

    print(json.dumps({"entries": out, "sf": sf_dir, "cpus": int(cpus)}))


if __name__ == "__main__":
    main()
