"""Stateful streaming sessionization (applyInPandasWithState) must equal
the batch operator: sessions spanning micro-batch boundaries are stitched
by group state, and open sessions flush via event-time timeouts once the
watermark sweeps past them.
"""

import glob
import os
import shutil

import pytest

from pyspark.sql import functions as F


def write_flat(df, src_dir, name):
    """Write one micro-batch as a single FILE (the parquet writer emits a
    directory; the file stream source does not recurse into it)."""
    staging = f"{src_dir}/__stage_{name}"
    df.coalesce(1).write.parquet(staging)
    part = glob.glob(f"{staging}/part-*.parquet")[0]
    os.makedirs(src_dir, exist_ok=True)
    shutil.move(part, f"{src_dir}/{name}")
    shutil.rmtree(staging)

from slimsearch_spark.operators import events as ev
from slimsearch_spark.streaming.sessions import stream_sessionize

SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
          "event_type string, value double, props string")


def test_stream_sessionize_matches_batch(spark, tmp_path):
    events = (spark.read.parquet("/root/testdata/sf0.01/events.parquet")
              .orderBy("event_id").limit(2000).cache())
    events.count()

    # two time-split batches (sessions cross the boundary) + two late
    # heartbeat batches that advance the watermark and then fire the
    # pending event-time timeouts (timeouts fire one micro-batch late)
    src = str(tmp_path / "src")
    cut = events.approxQuantile("event_id", [0.5], 0.0)[0]
    write_flat(events.where(F.col("event_id") <= cut), src, "b1.parquet")
    write_flat(events.where(F.col("event_id") > cut), src, "b2.parquet")
    hb = [(10_000_000 + i, None, -1, "hb", 0.0, "{}") for i in range(2)]
    for i in range(2):
        write_flat(
            spark.createDataFrame([hb[i]], SCHEMA)
            .withColumn("ts", F.expr(
                f"TIMESTAMP_NTZ '2031-01-0{i + 1} 00:00:00'")),
            src, f"hb{i}.parquet")

    out = str(tmp_path / "out")
    stream_sessionize(spark, src, SCHEMA, gap_minutes=30.0,
                      checkpoint=str(tmp_path / "ckpt"), out_path=out)

    got = (spark.read.parquet(out)
           .where(F.col("user_id") >= 0)  # heartbeat user never flushes
           .select("user_id", "session_id", "session_start_ms",
                   "session_end_ms", "n_events",
                   F.round("sum_value", 6).alias("sum_value")))
    want = (ev.sessionize(events, gap_minutes=30.0)
            .select("user_id", "session_id", "session_start_ms",
                    "session_end_ms", "n_events",
                    F.round("sum_value", 6).alias("sum_value")))
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w
    assert len(w) > 100  # non-vacuous: many sessions, many users


def test_stream_windowed_watermark_semantics(spark, tmp_path):
    """Watermarked windowed aggregation (append mode): a window emits
    EXACTLY ONCE, only after the watermark passes its end; a straggler
    arriving within the watermark allowance (window state still live) is
    admitted into the final result; windows the watermark has not passed
    are withheld from the sink. (The hard-drop of post-eviction stragglers
    is exercised implicitly — an already-emitted window can never re-emit
    in append mode — but its batch-boundary timing is version-subtle, so
    the assertions here stick to the deterministic contract.)"""
    from slimsearch_spark.streaming.windows import stream_windowed_counts
    rows1 = [(1, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
             (2, "2024-01-01 11:45:00", 2, "click", 2.0, "{}")]
    # wm after batch 1 = 11:15; the 10:30 straggler is within the live
    # 10:00-11:00 window's state lifetime → admitted into its final emit
    rows2 = [(3, "2024-01-01 10:30:00", 3, "click", 100.0, "{}"),
             (4, "2024-01-01 13:00:00", 4, "view", 4.0, "{}")]
    rows3 = [(5, "2024-01-01 20:00:00", 5, "view", 5.0, "{}")]
    src = str(tmp_path / "wsrc")

    def write(rows, name):
        df = spark.createDataFrame(
            [(i, None, u, t, v, p) for (i, _, u, t, v, p) in rows], SCHEMA)
        expr = "CASE " + " ".join(
            f"WHEN event_id = {i} THEN TIMESTAMP_NTZ '{ts}'"
            for (i, ts, *_) in rows) + " END"
        write_flat(df.withColumn("ts", F.expr(expr)), src, name)

    write(rows1, "b1.parquet")
    write(rows2, "b2.parquet")
    write(rows3, "b3.parquet")
    out = str(tmp_path / "wout")
    stream_windowed_counts(spark, src, SCHEMA, window="1 hour",
                           watermark="30 minutes",
                           checkpoint=str(tmp_path / "wckpt"),
                           out_path=out)
    rows = spark.read.parquet(out).collect()
    got = {(r["window_start_ms"], r["event_type"]):
           (r["n_events"], r["sum_value"]) for r in rows}
    assert len(rows) == len(got)  # exactly-once per (window, type)
    h10 = 1704103200000  # 2024-01-01 10:00:00 UTC in epoch ms
    h11 = h10 + 3600_000
    h13 = h10 + 3 * 3600_000
    assert got[(h10, "click")] == (2, 101.0)   # straggler admitted
    assert got[(h11, "click")] == (1, 2.0)
    assert got[(h13, "view")] == (1, 4.0)
    # the 20:00 window is still open (watermark never passed its end)
    assert not any(ws > h13 for ws, _ in got)


def test_stream_sessionize_stitches_across_batches(spark, tmp_path):
    """A session split across two files (micro-batches) comes out as ONE
    session — the state carries the open session over the boundary."""
    rows1 = [(1, "2024-01-01 10:00:00", 7, "c", 1.0, "{}"),
             (2, "2024-01-01 10:10:00", 7, "c", 2.0, "{}")]
    rows2 = [(3, "2024-01-01 10:20:00", 7, "c", 3.0, "{}"),
             (4, "2024-01-01 14:00:00", 7, "c", 4.0, "{}")]
    hb = [(9, "2031-01-01 00:00:00", -1, "hb", 0.0, "{}"),
          (10, "2031-01-02 00:00:00", -1, "hb", 0.0, "{}")]
    src = str(tmp_path / "src")

    def write(rows, name):
        df = spark.createDataFrame(
            [(i, None, u, t, v, p) for (i, _, u, t, v, p) in rows], SCHEMA)
        ts_map = {i: ts for (i, ts, *_ ) in rows}
        expr = "CASE " + " ".join(
            f"WHEN event_id = {i} THEN TIMESTAMP_NTZ '{ts}'"
            for i, ts in ts_map.items()) + " END"
        write_flat(df.withColumn("ts", F.expr(expr)), src, name)

    write(rows1, "b1.parquet")
    write(rows2, "b2.parquet")
    write(hb[:1], "hb1.parquet")
    write(hb[1:], "hb2.parquet")

    out = str(tmp_path / "out")
    stream_sessionize(spark, src, SCHEMA, gap_minutes=30.0,
                      checkpoint=str(tmp_path / "ckpt"), out_path=out)
    got = sorted(
        tuple(r) for r in
        spark.read.parquet(out).where("user_id = 7")
        .select("session_id", "n_events", "sum_value").collect())
    # events 1-3 stitch into session 0 (10:00-10:20); event 4 is session 1
    assert got == [(0, 3, 6.0), (1, 1, 4.0)]


def test_stream_windowed_timezone_independent(spark, tmp_path):
    """Round-3 ADVICE (medium): window buckets and epoch-ms output must not
    depend on spark.sql.session.timeZone. Same stream under +05:30
    (non-hour offset — would shift both the bucket boundaries and the ms
    values without the from_utc_timestamp correction) must produce the
    UTC-identical result. stream_sessionize shares the same shift."""
    from slimsearch_spark.streaming.windows import stream_windowed_counts
    rows = [(1, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 11:45:00", 2, "click", 2.0, "{}"),
            (3, "2024-01-01 20:00:00", 5, "view", 5.0, "{}")]
    src = str(tmp_path / "tzsrc")
    for (i, ts, u, t, v, p) in rows:
        df = spark.createDataFrame([(i, None, u, t, v, p)], SCHEMA)
        write_flat(df.withColumn(
            "ts", F.expr(f"TIMESTAMP_NTZ '{ts}'")), src, f"b{i}.parquet")
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        stream_windowed_counts(spark, src, SCHEMA, window="1 hour",
                               watermark="30 minutes",
                               checkpoint=str(tmp_path / "tzckpt"),
                               out_path=str(tmp_path / "tzout"))
        got = {(r["window_start_ms"], r["event_type"]):
               (r["n_events"], r["sum_value"])
               for r in spark.read.parquet(str(tmp_path / "tzout")).collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    h10 = 1704103200000  # 2024-01-01 10:00:00 as NTZ epoch ms
    h11 = h10 + 3600_000
    assert got == {(h10, "click"): (1, 1.0), (h11, "click"): (1, 2.0)}
