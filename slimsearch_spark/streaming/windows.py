"""Watermarked tumbling-window aggregation over an event stream — the
Structured Streaming twin of ``operators/events.windowed_counts``.

readStream → withWatermark → groupBy(window, event_type) → append sink:
a window emits once the watermark passes its end (its result is final),
and events arriving later than ``watermark`` behind the max seen event
time are dropped — the standard late-data contract, tested explicitly in
tests/test_streaming_sessions.py::test_stream_windowed_drops_late_data.

Scale shape: the window bucket is epoch arithmetic on the grouping key —
one shuffle per micro-batch with map-side partial aggregation; state is
one row per open (window, event_type).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def stream_windowed_counts(spark: SparkSession, source_dir: str, schema,
                           window: str = "1 hour",
                           watermark: str = "30 minutes",
                           checkpoint: Optional[str] = None,
                           out_path: Optional[str] = None,
                           max_files_per_trigger: int = 1):
    """readStream(parquet dir) → watermarked tumbling-window counts per
    event type → parquet sink (append: only watermark-finalized windows),
    drained with availableNow. Output matches the batch operator's
    (window_start_ms, event_type, n_events, sum_value) for every window
    the watermark closed, over the events the watermark admitted."""
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(source_dir))
    # NTZ parquet instants cast to LTZ are interpreted in the session zone
    # (internal instant = wall − offset); shifting back by the session-zone
    # offset makes the window buckets and epoch-ms output equal the batch
    # operator's timezone-independent arithmetic (identity under UTC).
    # FIXED-OFFSET ASSUMPTION (round-3 ADVICE): the cast takes the offset
    # at the WALL time while from_utc_timestamp takes it at the INSTANT —
    # for DST session zones these disagree by the DST delta for events
    # inside the transition hour, shifting those events' buckets. Run
    # streaming jobs under UTC or another fixed-offset session zone
    # (spark.sql.session.timeZone=UTC), the standard cluster default.
    tz = spark.conf.get("spark.sql.session.timeZone")
    ev = (stream
          .withColumn("ts", F.from_utc_timestamp(
              F.col("ts").cast("timestamp"), tz))
          .withWatermark("ts", watermark))
    agg = (ev.groupBy(F.window(F.col("ts"), window).alias("w"),
                      F.col("event_type"))
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum("value"), 6).alias("sum_value"))
           .select(F.unix_millis(F.col("w.start")).alias("window_start_ms"),
                   "event_type", "n_events", "sum_value"))
    q = (agg.writeStream
         .outputMode("append")
         .format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
