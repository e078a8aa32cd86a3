"""End-to-end training-corpus preparation (slimsearch_spark.pipeline)."""

import re

import pytest

from pyspark.sql import functions as F

from slimsearch_spark.operators import pii
from slimsearch_spark.pipeline import prepare_training_corpus


@pytest.fixture(scope="module")
def raw_docs(spark):
    rows = []
    for i in range(40):
        # disjoint per-doc vocabularies so only the designed pairs dup
        body = " ".join(f"w{i}x{j}" for j in range(15))
        rows.append((i, f"{body} mail{i}@x.io"))
    rows.append((100, rows[30][1] + " extra"))          # near-dup of 30
    rows.append((101, "tiny"))                          # fails min_tokens
    rows.append((102, rows[5][1]))                      # exact dup of 5
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_pipeline_end_to_end(raw_docs):
    out = prepare_training_corpus(
        raw_docs, shard_budget=60,
        threshold=0.5, k=8, rows_per_band=2).cache()
    rows = out.collect()
    assert len(rows) > 10
    ids = {r["doc_id"] for r in rows}
    # every surviving text is scrubbed (the raw corpus has one email/doc)
    for r in rows:
        assert not re.search(pii.EMAIL_RE, r["text"])
        assert "<EMAIL>" in r["text"]
    # packing columns present and budget bound holds per shard
    shard_tot = (out.groupBy("pack_bucket", "shard_id")
                 .agg(F.sum("n_tokens").alias("tot"),
                      F.max("n_tokens").alias("mx")).collect())
    for s in shard_tot:
        assert s["tot"] < 60 + s["mx"]
    # tiny doc dropped by the quality gate
    assert 101 not in ids


def test_pipeline_dedup_and_decontam_stages(spark, raw_docs):
    # benchmark disjoint from the corpus -> decontamination keeps all
    clean_bench = spark.createDataFrame(
        [(0, "zz yy xx ww vv uu tt ss")], "doc_id long, text string")
    out = prepare_training_corpus(
        raw_docs, benchmark=clean_bench,
        threshold=0.5, k=8, rows_per_band=2).cache()
    ids = {r["doc_id"] for r in out.collect()}
    assert 101 not in ids          # quality gate
    assert 102 not in ids          # exact dup of 5 collapsed
    assert 5 in ids
    assert 100 not in ids          # near-dup of 30 collapsed
    assert 30 in ids
    # n_tokens carried through for the packer
    assert "n_tokens" in out.columns


def test_pipeline_contaminated_docs_removed(spark):
    docs = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten eleven"),
         (2, "red green blue cyan magenta yellow black white gray pink "
             "teal")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(0, "two three four")], "doc_id long, text string")
    out = prepare_training_corpus(docs, benchmark=bench)
    assert {r["doc_id"] for r in out.collect()} == {2}


def test_pipeline_minimal_options_single_plan(raw_docs):
    # no benchmark / sampling / packing: scrub + quality + dedup only
    # (the default plan persists the gated intermediate — see the
    # persist_gated parity test for the fully-lazy form)
    out = prepare_training_corpus(raw_docs, threshold=0.5, k=8,
                                  rows_per_band=2)
    assert out.count() > 0
    assert "shard_id" not in out.columns


def test_pipeline_persist_gated_false_same_rows(raw_docs):
    """persist_gated only changes materialization, never rows: the lazy
    form must match the default persisted form row-for-row, and the
    release helper must drop the pinned cache (round-6 ADVICE)."""
    from slimsearch_spark.pipeline import release_gated_corpus
    kw = dict(threshold=0.5, k=8, rows_per_band=2,
              sample_fraction=0.9, shard_budget=500, hash_method="md5",
              n_buckets=1)
    persisted = prepare_training_corpus(raw_docs, **kw)
    lazy = prepare_training_corpus(raw_docs, persist_gated=False, **kw)
    rows_p = sorted(map(tuple, persisted.collect()))
    rows_l = sorted(map(tuple, lazy.collect()))
    assert rows_p == rows_l and rows_p
    gated = persisted._gated_cache
    assert gated.storageLevel.useMemory          # pinned by default
    release_gated_corpus(persisted)
    assert not gated.storageLevel.useMemory      # released
    assert not hasattr(lazy, "_gated_cache")     # lazy form pins nothing
    release_gated_corpus(lazy)                   # no-op, must not raise


def test_pipeline_benchmark_scrubbed_before_decontam(spark):
    """A doc whose benchmark-overlapping n-grams contain an email must
    still be caught: scrubbing redacts both sides to the same form
    before shingling (ADVICE r04). Without benchmark-side scrubbing the
    doc's redacted shingles no longer match the raw benchmark and the
    contamination escapes."""
    overlap = "leaked eval question mail7@x.io answer tokens here okay"
    docs = spark.createDataFrame(
        [(1, overlap + " plus more words to pass the quality gate fine"),
         (2, "red green blue cyan magenta yellow black white gray pink "
             "teal umber")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(0, overlap)], "doc_id long, text string")
    out = prepare_training_corpus(docs, benchmark=bench, scrub_pii=True)
    assert {r["doc_id"] for r in out.collect()} == {2}
