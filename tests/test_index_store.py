"""Index materialization: compaction round-trip, save/load (≈ loadJSONIndex
round-trip spec), resumable build, corpus sha256 invariant, skew salting."""

import json
import os

import pytest

from pyspark.sql import functions as F

from slimsearch_spark.config import IndexConfig, IndexLayout
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.operators.build import build_postings, tokenize_fields
from slimsearch_spark.operators.compact import (compact_posting_lists,
                                                explode_posting_lists)
from slimsearch_spark.sources.corpus import synth_corpus, verify_sha256_invariant
from slimsearch_spark.sources.index_store import (build_resumable, load_index,
                                                  save_index)


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_corpus(spark, 300, tokens_per_file=60).cache()


CFG = IndexConfig(fields=["content"], id_field="path",
                  store_fields=["repo", "lang"])


def test_corpus_shape_and_invariant(corpus):
    assert corpus.columns == ["repo", "path", "commit", "lang", "content",
                              "content_sha256"]
    assert corpus.count() == 300
    assert verify_sha256_invariant(corpus) == 0
    corrupted = corpus.withColumn(
        "content", F.concat(F.col("content"), F.lit(" x")))
    assert verify_sha256_invariant(corrupted) == 300


def test_corpus_deterministic(spark):
    a = synth_corpus(spark, 50).orderBy("path").collect()
    b = synth_corpus(spark, 50).orderBy("path").collect()
    assert a == b


def test_compaction_roundtrip(spark, corpus):
    postings = build_postings(tokenize_fields(_assigned(corpus), CFG)).cache()
    lists = compact_posting_lists(postings, IndexLayout(hot_term_salts=4))
    back = explode_posting_lists(lists)
    # the encoded payload is (term, field_id, doc_id, tf); the
    # denormalized field_len column (round 6) is scoring-side only and
    # not part of the codec roundtrip
    payload = ["term", "field_id", "doc_id", "tf"]
    a = sorted(map(tuple, postings.select(*payload).collect()))
    b = sorted(map(tuple, back.select(*payload).collect()))
    assert a == b
    # df metadata matches actual posting counts
    df_meta = {(r["term"], r["field_id"]): r["df"] for r in lists.collect()}
    df_real = {(r["term"], r["field_id"]): r["cnt"] for r in
               postings.groupBy("term", "field_id")
               .agg(F.count("*").alias("cnt")).collect()}
    assert df_meta == df_real


def _assigned(corpus):
    from slimsearch_spark.operators.build import assign_doc_ids
    return assign_doc_ids(corpus, ["repo", "path"])


def test_compression_ratio(spark, corpus):
    postings = build_postings(tokenize_fields(_assigned(corpus), CFG))
    lists = compact_posting_lists(postings)
    total_bytes = lists.agg(F.sum("n_bytes")).collect()[0][0]
    n_postings = postings.count()
    # delta+varint should be far below 12 raw bytes (8 doc_id + 4 tf) per posting
    assert total_bytes < 4 * n_postings


def test_save_load_roundtrip(spark, corpus, tmp_path):
    idx = SparkSearchIndex.build(corpus, CFG, order_cols=["repo", "path"])
    path = str(tmp_path / "index")
    manifest = save_index(idx, path)
    assert manifest["version"] == 2
    assert manifest["counters"]["bytes_compressed"] > 0
    loaded = load_index(spark, path)
    q = "parse tokenizer"
    a = idx.search(q, prefix=True, fuzzy=0.2)
    b = loaded.search(q, prefix=True, fuzzy=0.2)
    # round(9): the repo's score-equality convention (test_wand, the
    # unpersist test below). Exact float equality across DIFFERENT
    # physical layouts (cached build vs parquet load) was only ever
    # incidental — double sums merge in partition order, and the round-6
    # df fast path (cached dictionary live, per-query aggregation on a
    # loaded dict without df) legitimately shifts the last ulp.
    assert [(r["id"], round(r["score"], 9)) for r in a] == \
        [(r["id"], round(r["score"], 9)) for r in b]
    # version gate (reference: loadJSONIndex version check)
    m = json.load(open(f"{path}/manifest.json"))
    m["version"] = 1
    json.dump(m, open(f"{path}/manifest.json", "w"))
    with pytest.raises(ValueError, match="version"):
        load_index(spark, path)


def test_unpersist_releases_caches_index_stays_usable(spark, corpus,
                                                      tmp_path):
    """Round 5 (found by the 1M serving-loop probe): a session serving
    successive index generations — a cold reader reloading after every
    ingest batch — accumulates every generation's cached tables until
    the local-mode heap OOMs. ``unpersist()`` must drop this index's
    cached RDDs and leave the index fully queryable (caches rebuild
    lazily)."""
    idx = SparkSearchIndex.build(corpus, CFG, order_cols=["repo", "path"])
    path = str(tmp_path / "index")
    save_index(idx, path)
    q = "parse tokenizer"
    want = [(r["id"], round(r["score"], 9)) for r in idx.search(q)]
    sc = spark.sparkContext
    gens = []
    for _ in range(3):
        g = load_index(spark, path)
        got = [(r["id"], round(r["score"], 9)) for r in g.search(q)]
        assert got == want
        gens.append(g)
    before = len([r for r in sc._jsc.sc().getRDDStorageInfo()])
    for g in gens[:-1]:
        g.unpersist()
    after = len([r for r in sc._jsc.sc().getRDDStorageInfo()])
    assert after < before
    # superseded generations released; the last one still serves, and a
    # released index rebuilds its caches lazily rather than breaking
    assert [(r["id"], round(r["score"], 9))
            for r in gens[-1].search(q)] == want
    assert [(r["id"], round(r["score"], 9))
            for r in gens[0].search(q)] == want


def test_save_load_empty_postings_index(spark, tmp_path):
    """An index with live docs but ZERO postings (every document empty —
    legal; the reference round-trips an empty index) must save and load:
    partitionBy writes of empty tables emit no part files, so load falls
    back to the manifest-recorded schemas. Found by
    test_fuzz_store_merge.py on its first run — save_index crashed on the
    posting_lists read-back before even writing the manifest."""
    from pyspark.sql import types as T
    sdf = spark.createDataFrame(
        [(0, None, ""), (1, None, "")],
        T.StructType([T.StructField("id", T.LongType()),
                      T.StructField("title", T.StringType(), True),
                      T.StructField("text", T.StringType(), True)]))
    idx = SparkSearchIndex.build(
        sdf, IndexConfig(fields=["title", "text"], store_fields=[]),
        order_cols=["id"])
    path = str(tmp_path / "empty_idx")
    manifest = save_index(idx, path)
    assert manifest["counters"]["bytes_compressed"] == 0
    loaded = load_index(spark, path)
    assert loaded.doc_count == 2
    assert loaded.search("a") == []
    assert loaded.postings.count() == 0
    # the loaded empty index stays maintainable: add_all then search
    loaded.add_all(spark.createDataFrame(
        [(2, "spark", "spark join")], sdf.schema), order_cols=["id"])
    assert [r["id"] for r in loaded.search("spark")] == [2]


def test_save_load_over_fs_uri(spark, corpus, tmp_path):
    """A scheme-qualified index root (file://, standing in for s3a/hdfs)
    routes manifest I/O through the Hadoop FS layer instead of local
    os.* calls — the round-2 S3/HDFS-safety path."""
    idx = SparkSearchIndex.build(corpus, CFG, order_cols=["repo", "path"])
    path = "file://" + str(tmp_path / "fsidx")
    manifest = save_index(idx, path)
    assert manifest["version"] == 2
    loaded = load_index(spark, path)
    assert loaded._term_dict is not None       # optional tables probed
    assert loaded._posting_lists is not None   # via spark.read, not os.*
    q = "parse tokenizer"
    a = [(r["id"], round(r["score"], 9)) for r in idx.search(q)]
    b = [(r["id"], round(r["score"], 9)) for r in loaded.search(q)]
    assert a == b and a


def test_resumable_build_resumes(spark, corpus, tmp_path):
    path = str(tmp_path / "resume")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_resumable(corpus, CFG, path, ["repo", "path"], n_chunks=4,
                        fail_after_chunk=1)
    state = json.load(open(f"{path}/build_state.json"))
    assert sorted(state["chunks"]) == ["0", "1"]
    # resume: chunks 0-1 must be skipped, 2-3 built
    manifest = build_resumable(corpus, CFG, path, ["repo", "path"],
                               n_chunks=4)
    assert sorted(manifest["build"]["chunks"]) == ["0", "1", "2", "3"]
    assert manifest["build"]["docs_total"] == 300
    # resumed index answers identically to a one-shot build
    loaded = load_index(spark, path)
    oneshot = SparkSearchIndex.build(corpus, CFG, order_cols=["repo", "path"])
    a = loaded.search("varint delta", top_k=20)
    b = oneshot.search("varint delta", top_k=20)
    assert [(r["id"], round(r["score"], 9)) for r in a] == \
        [(r["id"], round(r["score"], 9)) for r in b]
    # counters recorded per chunk (lineage)
    for c in manifest["build"]["chunks"].values():
        assert c["docs_tokenized"] > 0 and c["postings_emitted"] > 0


def test_hot_term_salting_splits_keys(spark, corpus):
    """Skew handling: phase-1 groups for a hot term are split across salts."""
    postings = build_postings(tokenize_fields(_assigned(corpus), CFG))
    layout = IndexLayout(hot_term_salts=4)
    max_doc = postings.agg(F.max("doc_id")).collect()[0][0]
    range_size = max(1, (max_doc + 1 + 3) // 4)
    salted = postings.withColumn(
        "salt", (F.col("doc_id") / F.lit(range_size)).cast("int"))
    hot = (salted.where(F.col("term") == "the")
           .select("salt").distinct().count())
    assert hot == 4  # the hot stopword spans every salt bucket


def test_read_corpus_table_and_path(spark, corpus, tmp_path):
    """Round 4 (round-3 VERDICT #6): the source seam accepts a catalog
    table name (spark.read.table — the Iceberg scan path when an Iceberg
    catalog is configured; a temp view stands in for the catalog in this
    sandbox) or a file path (parquet). Both yield the same corpus."""
    from slimsearch_spark.sources.corpus import read_corpus
    p = str(tmp_path / "corpus_pq")
    corpus.write.parquet(p)
    by_path = read_corpus(spark, p)
    assert by_path.count() == corpus.count()
    corpus.createOrReplaceTempView("corpus_v")
    by_table = read_corpus(spark, "corpus_v")
    assert by_table.count() == corpus.count()
    assert set(by_table.columns) >= {"repo", "path", "commit", "lang",
                                     "content"}
    # identical rows either way (order-independent)
    assert by_path.exceptAll(by_table).count() == 0


def test_assign_doc_ids_deterministic_at_scale(spark):
    """Round-4 regression: the round-1..3 assign_doc_ids used
    repartitionByRange + spark_partition_id, whose sampled boundaries are
    seeded PER PLAN EVALUATION — on a 20k-doc corpus it assigned ~500
    duplicate ids (counts collected in one action, output computed in
    another with different cut points) and differed between identical
    plans. The fix cuts range classes at hash-sampled key quantiles — a
    pure function of the data — so ids are dense, unique, deterministic,
    and exactly the global (order_cols) sort rank."""
    from pyspark.sql import Window
    from slimsearch_spark.operators.build import assign_doc_ids
    docs = synth_corpus(spark, 20000, tokens_per_file=5)
    a = assign_doc_ids(docs, ["repo", "path"])
    assert a.groupBy("doc_id").count().where(F.col("count") > 1).count() == 0
    assert a.select("doc_id").distinct().count() == 20000
    assert a.agg(F.max("doc_id")).collect()[0][0] == 19999
    # identical plan → identical ids (evaluation-order independence)
    b = assign_doc_ids(docs, ["repo", "path"])
    assert a.select("doc_id", "path").exceptAll(
        b.select("doc_id", "path")).count() == 0
    # ids ARE the global sort rank
    ref = docs.select("repo", "path").withColumn(
        "rank", F.row_number().over(Window.orderBy("repo", "path")) - 1)
    assert (a.select("repo", "path", "doc_id").join(ref, ["repo", "path"])
            .where(F.col("doc_id") != F.col("rank")).count()) == 0
