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


def test_ingest_state_store_matches_default(spark, tmp_path):
    """The persisted md5+band store (round 5) must admit and drop exactly
    the same documents as the default recompute-per-batch mode, batch
    over batch, while keeping the store tables consistent with the
    corpus (one md5 per distinct text; bands only for survivors)."""
    batches = [
        [(1, BASE1), (2, BASE2), (3, BASE1)],       # intra exact dup
        [(10, BASE2),                               # exact corpus match
         (11, BASE1 + " lambda"),                   # near-dup of doc 1
         (12, "totally novel content nothing shared with anything here")],
        [(20, BASE2 + " eleven"),                   # near-dup of doc 2
         (21, "fresh unrelated words entirely distinct from all others")],
    ]
    schema = "doc_id long, text string"
    plain = str(tmp_path / "plain")
    stored = str(tmp_path / "stored")
    store = str(tmp_path / "store")
    for rows in batches:
        b = spark.createDataFrame(rows, schema)
        n_plain = ingest_batch_dedup(b, plain, threshold=0.5)
        n_store = ingest_batch_dedup(b, stored, threshold=0.5,
                                     state_store_path=store)
        assert n_plain == n_store
    want = {r["doc_id"] for r in spark.read.parquet(plain).collect()}
    got = {r["doc_id"] for r in spark.read.parquet(stored).collect()}
    assert got == want == {1, 2, 12, 21}
    md5s = spark.read.parquet(f"{store}/md5")
    assert md5s.count() == md5s.distinct().count() == 4
    band_ids = {r["doc_id"] for r in
                spark.read.parquet(f"{store}/bands")
                .select("doc_id").distinct().collect()}
    assert band_ids == want


def test_ingest_state_store_bootstrap_and_params_guard(spark, tmp_path):
    """A pre-existing corpus without a store is bootstrapped in one pass
    (both dup checks still fire on the same batch); a later call with a
    different LSH shape refuses to mix hashes."""
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    spark.createDataFrame([(1, BASE1), (2, BASE2)],
                          "doc_id long, text string") \
        .write.parquet(corpus)
    b = spark.createDataFrame(
        [(10, BASE1),                    # exact match of bootstrapped doc
         (11, BASE2 + " eleven"),        # near-dup of bootstrapped doc
         (12, "fresh unrelated words entirely distinct from all others")],
        "doc_id long, text string")
    assert ingest_batch_dedup(b, corpus, threshold=0.5,
                              state_store_path=store) == 1
    kept = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 2, 12}
    # bootstrap covered the pre-existing docs too
    assert spark.read.parquet(f"{store}/md5").count() == 3
    with pytest.raises(ValueError, match="was built with"):
        ingest_batch_dedup(b, corpus, state_store_path=store, k=4)


def test_ingest_epoch_partitions_replay_idempotent(spark, tmp_path):
    """batch_id mode: replaying the same epoch rewrites its own
    __batch partition in every table instead of appending twice — the
    crash-recovery contract the docstring pins."""
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    schema = "doc_id long, text string"
    b0 = spark.createDataFrame([(1, BASE1), (2, BASE2)], schema)
    b1 = spark.createDataFrame(
        [(10, BASE1),                    # exact corpus match -> dropped
         (12, "totally novel content nothing shared with anything here")],
        schema)
    assert ingest_batch_dedup(b0, corpus, state_store_path=store,
                              batch_id=0) == 2
    assert ingest_batch_dedup(b1, corpus, state_store_path=store,
                              batch_id=1) == 1
    # replay epoch 1 (as after a crash before the checkpoint commit):
    # the md5 store already holds the batch, so everything drops — and
    # even the partition rewrite path leaves no duplicates
    assert ingest_batch_dedup(b1, corpus, state_store_path=store,
                              batch_id=1) == 0
    rows = spark.read.parquet(corpus).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 12]
    md5s = spark.read.parquet(f"{store}/md5").select("__h")
    assert md5s.count() == md5s.distinct().count() == 3
    bands = spark.read.parquet(f"{store}/bands")
    assert bands.count() == bands.distinct().count()


def test_stream_ingest_state_store_cross_batch(spark, tmp_path):
    """The streaming wrapper with state_store_path + epoch_partitions:
    same kept set as the default-mode stream test, corpus partitioned by
    epoch."""
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "store")
    schema = "doc_id long, text string"
    spark.createDataFrame([(1, BASE1), (2, BASE2)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(10, BASE1),
         (11, BASE2 + " eleven"),
         (12, "fresh unrelated words entirely distinct from all others")],
        schema).coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = stream_ingest_dedup(stream, corpus, ckpt, threshold=0.5,
                            available_now=True, state_store_path=store,
                            epoch_partitions=True)
    q.awaitTermination(180)
    kept = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 2, 12}
    assert {r["__batch"] for r in
            spark.read.parquet(corpus).select("__batch").distinct()
            .collect()} == {0, 1}
