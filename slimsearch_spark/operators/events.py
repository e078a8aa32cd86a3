"""Event-stream operators over the (event_id, ts, user_id, event_type,
value, props) table — the batch forms of the engine's streaming surface.

* windowed_counts — tumbling-window aggregation (the batch twin of the
  Structured Streaming watermark+window path in streaming/sessions.py)
* sessionize     — gap-based sessionization via a per-user window (the
  batch twin of the applyInPandasWithState stateful operator)

Timestamps are emitted as epoch milliseconds (integers): session-timezone
conversion on collect would otherwise make cross-engine comparison
environment-dependent.

At 100 TB: both shuffle once on their natural key (window bucket /
user_id); the sessionize window sorts within user partitions only —
no global sort, skew bounded by the busiest user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def epoch_ms(col_name: str):
    """Epoch milliseconds of a TIMESTAMP_NTZ column, independent of the
    session timezone (unix_millis only accepts TIMESTAMP_LTZ, and casting
    NTZ→LTZ would bake the session zone into the result)."""
    return F.expr(f"timestampdiff(MILLISECOND, "
                  f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col_name})")


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    ts_col: str = "ts",
                    type_col: str = "event_type") -> DataFrame:
    """→ (window_start_ms, event_type, n_events, sum_value): tumbling-
    window counts per event type. One hash aggregate (map-side combine);
    the window bucket is epoch arithmetic, not a UDF."""
    return (events
            .groupBy(F.window(F.col(ts_col), window).alias("w"),
                     F.col(type_col).alias("event_type"))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(epoch_ms("w.start").alias("window_start_ms"),
                    "event_type", "n_events", "sum_value"))


def sessionize(events: DataFrame, gap_minutes: float = 30.0,
               ts_col: str = "ts", user_col: str = "user_id",
               id_col: str = "event_id") -> DataFrame:
    """Gap-based sessionization → (user_id, session_id, session_start_ms,
    session_end_ms, n_events, sum_value); a new session starts when the
    gap to the previous event of the same user exceeds ``gap_minutes``.

    Classic lag+cumsum over a per-user window: partitioned by user_id
    (the shuffle key), ordered by (ts, event_id) for a deterministic
    total order. session_id is 0-based per user in time order."""
    gap_ms = int(gap_minutes * 60_000)
    ms = epoch_ms(ts_col)
    # order by (epoch-ms, event_id) — the ms-truncated key the oracle can
    # reproduce exactly (ordering by raw micros would be engine-private)
    w = Window.partitionBy(user_col).orderBy(ms, F.col(id_col))
    prev = F.lag(ms).over(w)
    new_session = F.when(prev.isNull() | ((ms - prev) > gap_ms), 1) \
        .otherwise(0)
    tagged = (events
              .withColumn("__ms", ms)
              .withColumn("__new", new_session)
              .withColumn("session_id",
                          (F.sum("__new").over(w) - 1).cast("int")))
    return (tagged
            .groupBy(F.col(user_col).alias("user_id"), "session_id")
            .agg(F.min("__ms").alias("session_start_ms"),
                 F.max("__ms").alias("session_end_ms"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value")))
