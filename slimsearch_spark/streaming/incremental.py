"""Incremental index maintenance as Structured Streaming.

The reference has no streaming (SURVEY.md §2.5) — its closest analog is
batch-incremental add/discard/vacuum. This module adds the Spark-native
upgrade: a ``readStream`` over a document directory that appends postings
and doc_stats to the index store continuously (or in one availableNow
sweep). foreachBatch keeps the tf aggregation per micro-batch; doc ids are
namespaced per batch window so appends never collide.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..operators.build import build_doc_stats, build_postings, tokenize_fields

BATCH_ID_STRIDE = 10_000_000_000  # doc_id namespace per micro-batch


def stream_build(spark: SparkSession, source_dir: str, out_path: str,
                 config: IndexConfig, schema, checkpoint: Optional[str] = None,
                 available_now: bool = True):
    """readStream(parquet dir) → per-batch postings/doc_stats appends.

    Each micro-batch assigns doc_ids inside its own namespace
    (batch_id * BATCH_ID_STRIDE + local row_number) — monotonic, collision-
    free, no cross-batch coordination. availableNow=True drains the backlog
    and stops (the batch-parity mode the tests use)."""
    stream = (spark.readStream.schema(schema).parquet(source_dir))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from ..operators.build import assign_doc_ids
        assigned = assign_doc_ids(batch_df, [config.id_field])
        assigned = assigned.withColumn(
            "doc_id", F.col("doc_id") + F.lit(batch_id * BATCH_ID_STRIDE))
        tokenized = tokenize_fields(assigned, config)
        build_postings(tokenized).write.mode("append").parquet(
            f"{out_path}/postings")
        build_doc_stats(tokenized).write.mode("append").parquet(
            f"{out_path}/doc_stats")
        keep = ["doc_id", config.id_field] + [
            f for f in config.store_fields if f in assigned.columns]
        assigned.select(*dict.fromkeys(keep)).write.mode("append").parquet(
            f"{out_path}/docs")

    writer = (stream.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation",
                      checkpoint or os.path.join(out_path, "_checkpoint")))
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
