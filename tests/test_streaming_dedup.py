"""Streaming exact dedup: first copy wins, across micro-batches."""

import pytest

from pyspark.sql import functions as F

from slimsearch_spark.streaming.dedup import stream_exact_dedup


def _drain(spark, src_dir, schema, sink_name, **dedup_kwargs):
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)   # force multi-batch
              .parquet(src_dir))
    out = stream_exact_dedup(stream, **dedup_kwargs)
    q = (out.writeStream.format("memory").queryName(sink_name)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(sink_name)


def test_stream_exact_dedup_within_and_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # file 1: 5 docs, one internal duplicate pair
    b1 = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "cc"), (4, "aa"), (5, "dd")],
        "doc_id long, text string")
    b1.coalesce(1).write.mode("append").parquet(src)
    # file 2: one new doc + two cross-batch duplicates
    b2 = spark.createDataFrame(
        [(6, "ee"), (7, "bb"), (8, "dd")], "doc_id long, text string")
    b2.coalesce(1).write.mode("append").parquet(src)

    got = _drain(spark, src, b1.schema, "dedup_sink")
    texts = sorted(r["text"] for r in got.collect())
    assert texts == ["aa", "bb", "cc", "dd", "ee"]
    # the hash helper column must not leak
    assert got.columns == ["doc_id", "text"]


def test_stream_exact_dedup_watermarked(spark, tmp_path):
    src = str(tmp_path / "srcw")
    rows = [(1, "aa", "2026-01-01 00:00:00"),
            (2, "aa", "2026-01-01 00:30:00"),   # dup within horizon
            (3, "bb", "2026-01-01 01:00:00")]
    df = (spark.createDataFrame(rows, "doc_id long, text string, ts string")
          .withColumn("ts", F.to_timestamp("ts")))
    df.coalesce(1).write.parquet(src)
    got = _drain(spark, src, df.schema, "dedup_sink_w",
                 event_time_col="ts", within="2 hours")
    assert sorted(r["text"] for r in got.collect()) == ["aa", "bb"]


def test_stream_exact_dedup_arg_validation(spark, tmp_path):
    df = spark.createDataFrame([(1, "aa")], "doc_id long, text string")
    with pytest.raises(ValueError):
        stream_exact_dedup(df, event_time_col="ts")
    with pytest.raises(ValueError):
        stream_exact_dedup(df, within="1 hour")
