"""spark-submit entry point: merge saved shard indexes into one.

The merge JOB of a sharded build at 10^12-file scale: run
`build_index.py` once per corpus shard (bounded, independently
resumable jobs, each with its own dense doc-id space), then

    spark-submit --py-files slimsearch_spark.zip scripts/merge_indexes.py \
        --inputs /path/shard0,/path/shard1,... --output /path/index

Doc ids are offset per shard (stays globally dense — the WAND doc-grid
has no gaps), BM25 stats (doc_count, avg field lengths, df) recompute
over the union so scores are identical to a single full-corpus build,
and the output posting lists re-compact through the salted term-hash
shuffle with skew handling (operators/compact.py). Prints the manifest
JSON on completion.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", required=True,
                    help="comma-separated saved shard index paths")
    ap.add_argument("--output", required=True)
    ap.add_argument("--no-dup-check", action="store_true",
                    help="skip the external-id uniqueness check (use when "
                         "the sharding key already guarantees disjointness)")
    ap.add_argument("--master", default=None,
                    help="override spark.master (default: whatever "
                         "spark-submit / the cluster provides)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.appName("slimsearch_merge_indexes")
               .config("spark.sql.adaptive.enabled", "true"))
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from slimsearch_spark.sources.index_store import merge_saved_indexes

    manifest = merge_saved_indexes(
        spark, [p for p in args.inputs.split(",") if p],
        args.output, check_duplicate_ids=not args.no_dup_check)
    print(json.dumps(manifest))
    return 0


if __name__ == "__main__":
    sys.exit(main())
