"""Streaming ingest with exact + near-dup filtering vs the growing corpus."""

import pytest

from pyspark.sql import functions as F

from slimsearch_spark.streaming.ingest import (ingest_batch_dedup,
                                               stream_ingest_dedup)

BASE1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
BASE2 = "one two three four five six seven eight nine ten"


def test_ingest_batch_dedup_all_three_filters(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    b1 = spark.createDataFrame(
        [(1, BASE1), (2, BASE2), (3, BASE1)],   # 3 = intra-batch exact dup
        "doc_id long, text string")
    assert ingest_batch_dedup(b1, corpus) == 2
    b2 = spark.createDataFrame(
        [(10, BASE2),                    # exact corpus match -> dropped
         (11, BASE1 + " lambda"),        # near-dup of doc 1 -> dropped
         (12, "totally novel content nothing shared with anything here")],
        "doc_id long, text string")
    assert ingest_batch_dedup(b2, corpus, threshold=0.5) == 1
    kept = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 2, 12}


def test_stream_ingest_dedup_cross_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    spark.createDataFrame([(1, BASE1), (2, BASE2)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(10, BASE1),                    # exact match of batch-1 doc
         (11, BASE2 + " eleven"),        # near-dup of batch-1 doc
         (12, "fresh unrelated words entirely distinct from all others")],
        schema).coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = stream_ingest_dedup(stream, corpus, ckpt, threshold=0.5,
                            available_now=True)
    q.awaitTermination(180)
    kept = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 2, 12}


def test_ingest_intra_batch_near_dup(spark, tmp_path):
    """Two NEAR-duplicates arriving in the same batch: neither is in the
    corpus yet, so only the intra-batch near-dup pass can catch them —
    the larger id of the verified pair is dropped (ADVICE r04)."""
    corpus = str(tmp_path / "corpus")
    b = spark.createDataFrame(
        [(1, BASE1), (2, BASE1 + " lambda"), (3, BASE2)],
        "doc_id long, text string")
    assert ingest_batch_dedup(b, corpus, threshold=0.5) == 2
    kept = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 3}
    # opting out restores the old behavior (both near-dups ingested)
    corpus2 = str(tmp_path / "corpus2")
    assert ingest_batch_dedup(b, corpus2, threshold=0.5,
                              intra_batch_near_dup=False) == 3


def test_ingest_read_error_fails_batch_not_silently_skipped(spark, tmp_path):
    """A read failure on an EXISTING corpus path must raise (so the
    streaming checkpoint retries), not be treated as 'first batch' and
    silently skip the dedup checks (ADVICE r04)."""
    bad = tmp_path / "corpus"
    bad.mkdir()
    # existing path containing a corrupted parquet footer
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    b = spark.createDataFrame([(1, BASE1)], "doc_id long, text string")
    with pytest.raises(Exception):
        ingest_batch_dedup(b, str(bad))
    # the batch was NOT appended (no Spark commit marker, no new parts)
    assert not (bad / "_SUCCESS").exists()
    assert len(list(bad.glob("*.parquet"))) == 1


def test_ingest_first_batch_missing_path_ok(spark, tmp_path):
    """Genuinely-missing corpus path is the one legitimate skip."""
    corpus = str(tmp_path / "fresh_corpus")
    b = spark.createDataFrame([(1, BASE1)], "doc_id long, text string")
    assert ingest_batch_dedup(b, corpus) == 1
