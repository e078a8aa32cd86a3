#!/usr/bin/env bash
# End-to-end `spark-submit --py-files` demonstration (north rule: "ships
# via spark-submit --py-files"): package the library as a zip, build two
# shard indexes as independent spark-submit jobs, merge them with the
# merge job, then serve a WAND query from the merged layout — all with
# cwd OUTSIDE the repo so only the zip provides the package.
#
# Usage: bash scripts/spark_submit_demo.sh [n_files_per_shard] [workdir]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
N="${1:-50000}"
WORK="${2:-/tmp/spark_submit_demo}"
SUBMIT="${SPARK_HOME:-/opt/spark}/bin/spark-submit"
MASTER="local[${SPARK_GRAFT_CPUS:-32}]"

rm -rf "$WORK" && mkdir -p "$WORK" && cd "$WORK"

# 1. package: one zip, the only way the jobs can import the library
(cd "$REPO" && zip -qr "$WORK/slimsearch_spark.zip" slimsearch_spark -x '*__pycache__*')

# 2. two disjoint shard corpora in the BASELINE input_hint shape
cat > "$WORK/demo_corpus.py" <<'PY'
import sys
from pyspark.sql import SparkSession, functions as F
from slimsearch_spark.sources.corpus import synth_corpus
n, work = int(sys.argv[1]), sys.argv[2]
spark = SparkSession.builder.appName("demo_corpus").getOrCreate()
docs = synth_corpus(spark, 2 * n, tokens_per_file=120)
half = F.pmod(F.xxhash64("path"), F.lit(2))  # pmod: xxhash64 is signed
docs.where(half == 0).write.mode("overwrite").parquet(f"{work}/shard0.parquet")
docs.where(half == 1).write.mode("overwrite").parquet(f"{work}/shard1.parquet")
PY
"$SUBMIT" --master "$MASTER" --py-files "$WORK/slimsearch_spark.zip" \
  "$WORK/demo_corpus.py" "$N" "$WORK" 2>/dev/null

# 3. one bounded, resumable build job per shard (the 10^12-file pattern)
for s in 0 1; do
  "$SUBMIT" --master "$MASTER" \
    --py-files "$WORK/slimsearch_spark.zip" "$REPO/scripts/build_index.py" \
    --input "$WORK/shard$s.parquet" --output "$WORK/idx$s" \
    --fields content --id-field path --id-cols repo,path \
    --store-fields repo,lang --chunks 4 2>/dev/null | tail -1 \
    > "$WORK/build$s.json"
done

# 4. the merge job: salted term-hash shuffle over both shards' postings
"$SUBMIT" --master "$MASTER" \
  --py-files "$WORK/slimsearch_spark.zip" "$REPO/scripts/merge_indexes.py" \
  --inputs "$WORK/idx0,$WORK/idx1" --output "$WORK/merged" \
  --no-dup-check 2>/dev/null | tail -1 > "$WORK/merge.json"

# 5. serve a BM25 / WAND query from the merged saved layout
cat > "$WORK/demo_query.py" <<'PY'
import json, sys
from pyspark.sql import SparkSession
from slimsearch_spark.sources.index_store import load_index
spark = SparkSession.builder.appName("demo_query").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
idx = load_index(spark, f"{sys.argv[1]}/merged")
top = idx.search_topk_wand("parser merge shuffle", 10).collect()
print(json.dumps({"doc_count": idx.doc_count,
                  "top10": [[int(r["doc_id"]), round(r["score"], 6)]
                            for r in top]}))
PY
"$SUBMIT" --master "$MASTER" --py-files "$WORK/slimsearch_spark.zip" \
  "$WORK/demo_query.py" "$WORK" 2>/dev/null

echo "--- build0:"; cat "$WORK/build0.json"
echo "--- merge:";  cat "$WORK/merge.json"
