"""Throughput probe for the training-data pipeline operators at scale.

Runs `prepare_training_corpus` (PII scrub -> decontamination -> quality
gate -> exact+near-dup removal -> token-budget packing) over an N-file
synthetic source-code corpus (input_hint shape) and reports end-to-end
files/sec plus the per-stage-isolated numbers for the two session-10
operators (pii_scrub, contamination_hits) — the stages with no prior
scale measurement. Usage:

    python scripts/pipeline_probe.py [n_files] [cores]
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32

spark = (SparkSession.builder.master(f"local[{CORES}]")
         .config("spark.sql.shuffle.partitions", str(CORES))
         .config("spark.driver.memory", "16g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from slimsearch_spark.operators.decontam import contamination_hits  # noqa: E402
from slimsearch_spark.operators.pii import pii_scrub  # noqa: E402
from slimsearch_spark.pipeline import prepare_training_corpus  # noqa: E402
from slimsearch_spark.sources.corpus import synth_corpus  # noqa: E402

docs = (synth_corpus(spark, N, tokens_per_file=200)
        .withColumnRenamed("content", "text")
        .withColumn("doc_id", F.xxhash64("path"))  # unique, deterministic
        .select("doc_id", "repo", "lang", "text"))
docs.write.mode("overwrite").parquet("/tmp/pipeline_probe_docs")
docs = spark.read.parquet("/tmp/pipeline_probe_docs")
bench = docs.where(F.col("doc_id") % 997 == 0)  # ~0.1% "eval suite"

out = {}

t0 = time.time()
pii_scrub(docs).agg(F.sum(F.length("text"))).collect()
out["pii_scrub_sec"] = round(time.time() - t0, 1)

t0 = time.time()
contamination_hits(docs, bench, n=8).count()
out["contamination_hits_sec"] = round(time.time() - t0, 1)

t0 = time.time()
kept = prepare_training_corpus(docs, benchmark=bench, shard_budget=100_000,
                               decontam_n=8,  # industry-style wide shingle:
                               # 3-grams over the small synthetic vocab flag
                               # every doc (hot-term trigrams collide)
                               threshold=0.5, k=8, rows_per_band=2)
n_kept = kept.count()
e2e = time.time() - t0
out.update({
    "n_files": N, "cores": CORES, "n_kept": n_kept,
    "pipeline_e2e_sec": round(e2e, 1),
    "pipeline_files_per_sec": round(N / e2e, 1),
})
print(json.dumps(out))
