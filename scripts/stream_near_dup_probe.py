"""Throughput probe for the stateful streaming near-dup candidate
detector (streaming/near_dup.py).

Writes an N-doc synthetic corpus (input_hint text shape, ~10% of docs
mutated near-duplicates of earlier ones) as B parquet files, drains it
with maxFilesPerTrigger=1 (B micro-batches) through
``stream_near_dup_candidates``, and reports docs/sec end-to-end, per
-batch latency, and the emitted candidate count — plus the batch
``lsh_candidate_pairs`` wall time on the same corpus as the reference
point. Usage:

    python scripts/stream_near_dup_probe.py [n_docs] [n_batches] [cores]
"""

import json
import shutil
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 10
CORES = int(sys.argv[3]) if len(sys.argv) > 3 else 32

spark = (SparkSession.builder.master(f"local[{CORES}]")
         .config("spark.sql.shuffle.partitions", str(CORES))
         .config("spark.driver.memory", "16g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from slimsearch_spark.operators import dedup as dd             # noqa: E402
from slimsearch_spark.streaming.near_dup import (              # noqa: E402
    stream_near_dup_candidates)

SRC = "/tmp/stream_near_dup_src"
SINK = "/tmp/stream_near_dup_sink"
CKPT = "/tmp/stream_near_dup_ckpt"
for p in (SRC, SINK, CKPT):
    shutil.rmtree(p, ignore_errors=True)

# corpus: 32-token docs from a deterministic vocabulary; every 10th doc is
# a near-duplicate of the previous one (two tokens mutated)
base = (spark.range(N)
        .withColumn("fam", (F.col("id") - (F.col("id") % 10)))
        .withColumn("is_dup", (F.col("id") % 10) != 0)
        .withColumn("toks", F.transform(
            F.sequence(F.lit(0), F.lit(31)),
            lambda i: F.concat(
                F.lit("w"),
                F.when((F.col("is_dup")) & (i < 2),
                       F.xxhash64(F.col("id") * 100 + i) % 50_000)
                .otherwise(F.xxhash64(F.col("fam") * 1_000 + i) % 50_000))))
        .select(F.col("id").alias("doc_id"),
                F.array_join("toks", " ").alias("text")))
# B files -> B micro-batches at maxFilesPerTrigger=1; the % B salt
# interleaves families across files so buckets span batch boundaries
(base.withColumn("part", F.col("doc_id") % B)
 .repartition(B, "part").drop("part")
 .write.mode("overwrite").parquet(SRC))

docs = spark.read.parquet(SRC).select("doc_id", "text")
n_docs = docs.count()
out = {"n_docs": n_docs, "n_batches": B, "cores": CORES}

# batch reference: candidate pairs over the full corpus in one job
t0 = time.time()
sigs = dd.minhash_signatures(dd.doc_shingles(docs, 3), 8)
out["batch_pairs"] = dd.lsh_candidate_pairs(sigs).count()
out["batch_sec"] = round(time.time() - t0, 1)

# streaming: B micro-batches through the keyed-state operator
stream = (spark.readStream.schema("doc_id long, text string")
          .option("maxFilesPerTrigger", 1)
          .parquet(SRC)
          .select("doc_id", "text"))
cands = stream_near_dup_candidates(stream)
t0 = time.time()
q = (cands.writeStream.format("parquet")
     .option("path", SINK).option("checkpointLocation", CKPT)
     .trigger(availableNow=True).start())
q.awaitTermination()
out["stream_sec"] = round(time.time() - t0, 1)
out["stream_docs_per_sec"] = round(n_docs / out["stream_sec"], 1)
got = spark.read.parquet(SINK)
out["stream_pairs_distinct"] = got.select("a", "b").distinct().count()
out["stream_rows"] = got.count()
out["batch_matches_stream"] = (
    out["stream_pairs_distinct"] == out["batch_pairs"])

print(json.dumps(out))
