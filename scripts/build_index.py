"""spark-submit entry point: distributed index build (optionally resumable).

Usage:
    spark-submit --py-files slimsearch_spark.zip scripts/build_index.py \
        --input /path/docs.parquet --output /path/index \
        [--fields content] [--id-cols repo,path] [--chunks 8] [--resume]

Enforces the content_sha256 per-row invariant before building (north rule),
prints the manifest JSON on completion.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--fields", default="content")
    ap.add_argument("--id-field", default="path")
    ap.add_argument("--id-cols", default="repo,path",
                    help="unique key columns for dense doc_id assignment")
    ap.add_argument("--store-fields", default="repo,lang")
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--no-sha-check", action="store_true")
    ap.add_argument("--master", default=None,
                    help="override master (tests); normally from spark-submit")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("slimsearch_spark_build")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from slimsearch_spark.config import IndexConfig
    from slimsearch_spark.sources.corpus import verify_sha256_invariant
    from slimsearch_spark.sources.index_store import build_resumable

    docs = spark.read.parquet(args.input)
    if not args.no_sha_check and "content_sha256" in docs.columns:
        bad = verify_sha256_invariant(docs)
        if bad:
            print(json.dumps({"error": "sha256 invariant violated",
                              "rows": bad}))
            return 2

    config = IndexConfig(fields=args.fields.split(","),
                         id_field=args.id_field,
                         store_fields=[s for s in
                                       args.store_fields.split(",") if s])
    manifest = build_resumable(docs, config, args.output,
                               order_cols=args.id_cols.split(","),
                               n_chunks=args.chunks)
    print(json.dumps(manifest))
    return 0


if __name__ == "__main__":
    sys.exit(main())
