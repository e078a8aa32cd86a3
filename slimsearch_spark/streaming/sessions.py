"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the Structured Streaming twin of the batch
``operators/events.sessionize`` (validated equal in
tests/test_streaming_sessions.py).

Per user (the shuffle key), the operator keeps (next_session_id, open
session aggregate) as group state across micro-batches: a session that
spans two batches is stitched, not split. Closed sessions emit as soon as
the in-batch gap exceeds ``gap_minutes``; the open session emits when the
event-time watermark passes its timeout (last event + gap), so output is
identical to the batch operator once the watermark sweeps past the data.

Scale shape: one shuffle on user_id per micro-batch; state size is O(live
users × 1 open session); Arrow batches in/out (no per-row Python objects
beyond the in-group loop, which is bounded by the user's in-batch events).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id bigint, session_id int, session_start_ms bigint, "
              "session_end_ms bigint, n_events bigint, sum_value double")
STATE_SCHEMA = ("next_session_id int, start_ms bigint, last_ms bigint, "
                "n bigint, sum_value double")
_EMPTY = pd.DataFrame({
    "user_id": pd.Series([], dtype="int64"),
    "session_id": pd.Series([], dtype="int32"),
    "session_start_ms": pd.Series([], dtype="int64"),
    "session_end_ms": pd.Series([], dtype="int64"),
    "n_events": pd.Series([], dtype="int64"),
    "sum_value": pd.Series([], dtype="float64"),
})


def _session_fn(gap_ms: int):
    def update(key, pdfs, state: GroupState):
        user_id = int(key[0])

        if state.hasTimedOut:
            # watermark passed the open session's close point: emit it
            sid, start, last, n, sv = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user_id, "session_id": int(sid),
                "session_start_ms": int(start), "session_end_ms": int(last),
                "n_events": int(n), "sum_value": float(sv)}])
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["__ms", "event_id"])
        if state.exists:
            sid, start, last, n, sv = state.get
        else:
            sid, start, last, n, sv = 0, None, None, 0, 0.0

        closed = []
        for ms, val in zip(rows["__ms"].astype("int64"),
                           rows["value"].astype("float64")):
            ms = int(ms)
            if last is not None and ms - int(last) <= gap_ms:
                last, n, sv = ms, n + 1, sv + float(val)
            else:
                if last is not None:
                    closed.append({
                        "user_id": user_id, "session_id": int(sid),
                        "session_start_ms": int(start),
                        "session_end_ms": int(last),
                        "n_events": int(n), "sum_value": float(sv)})
                    sid += 1
                start, last, n, sv = ms, ms, 1, float(val)

        state.update((int(sid), int(start), int(last), int(n), float(sv)))
        # close the open session once event time passes last + gap
        state.setTimeoutTimestamp(int(last) + gap_ms)
        yield pd.DataFrame(closed) if closed else _EMPTY

    return update


def stream_sessionize(spark: SparkSession, source_dir: str, schema,
                      gap_minutes: float = 30.0,
                      watermark: str = "0 seconds",
                      checkpoint: Optional[str] = None,
                      max_files_per_trigger: int = 1,
                      out_path: Optional[str] = None):
    """readStream(parquet dir) → stateful sessionize → parquet/memory sink,
    drained with availableNow. ``max_files_per_trigger=1`` makes each file
    a micro-batch so cross-batch state stitching is actually exercised.

    Watermark note: timeouts fire in the micro-batch AFTER the watermark
    advances past them — a stream that just stops never flushes its last
    open sessions (standard Structured Streaming semantics); feed a late
    heartbeat event (or lower the gap) to sweep them out.
    """
    gap_ms = int(gap_minutes * 60_000)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(source_dir))
    # watermarks need TIMESTAMP_LTZ; the NTZ→LTZ cast interprets naive
    # parquet instants in the session zone, so shift back by the session-
    # zone offset (identity under UTC) — __ms and the gap boundaries then
    # equal the batch operator's timezone-independent epoch_ms (round-2
    # ADVICE). FIXED-OFFSET ASSUMPTION (round-3 ADVICE): cast and
    # from_utc_timestamp take the zone offset at the wall time vs. the
    # instant — for DST session zones events in the transition hour can
    # shift by the DST delta; run streaming under UTC or another
    # fixed-offset session zone (the standard cluster default).
    tz = spark.conf.get("spark.sql.session.timeZone")
    ev = (stream
          .withColumn("ts", F.from_utc_timestamp(
              F.col("ts").cast("timestamp"), tz))
          .withWatermark("ts", watermark)
          .withColumn("__ms", F.unix_millis(F.col("ts")))
          .select("user_id", "event_id", "__ms", "value", "ts"))
    sessions = (ev.groupBy("user_id")
                .applyInPandasWithState(
                    _session_fn(gap_ms), OUT_SCHEMA, STATE_SCHEMA,
                    "append", GroupStateTimeout.EventTimeTimeout))
    writer = (sessions.writeStream
              .format("parquet")
              .option("path", out_path)
              .option("checkpointLocation", checkpoint)
              .trigger(availableNow=True))
    q = writer.start()
    q.awaitTermination()
    return q
