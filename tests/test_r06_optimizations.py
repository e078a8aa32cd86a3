"""Focused tests for the round-6 optimization internals: each pins a
result-identity invariant that an optimization relies on, so a later
change cannot silently break the equivalence the oracle gate proved.

* ``with_stored=False`` — the skipped row-store join must not change the
  (doc_id, score) row set (engine.search_df, round-6 change 11).
* capped-explode vs uncapped-join pair generation in
  ``embedding_near_dup`` — the bounded-bucket repartition + in-row verify
  path must emit exactly the join path's pairs (changes 10/12).
* denormalized ``field_len`` — built postings carry it, saved layouts
  strip it, and the loaded index's join-fallback scores are identical to
  the built index's in-row scores (change 13).
* ``add_all`` onto a LOADED index — the mixed-column union (loaded
  postings without field_len + fresh batch with it) must align and score
  exactly like a one-shot build over the union (change 13's alignment
  guards).
"""

import pytest

from pyspark.sql import functions as F

from slimsearch_spark.config import IndexConfig
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .cache())


@pytest.fixture(scope="module")
def built(docs):
    cfg = IndexConfig(fields=["text"], id_field="doc_id",
                      store_fields=["lang"])
    return SparkSearchIndex.build(docs, cfg, order_cols=["doc_id"])


def _scores(df):
    return sorted((r["doc_id"], round(r["score"], 9))
                  for r in df.select("doc_id", "score").collect())


def test_with_stored_false_is_row_identical(built):
    full = built.search_df("spark join merge")
    slim = built.search_df("spark join merge", with_stored=False)
    assert _scores(full) == _scores(slim)
    # and the stored fields really are gone from the slim plan's output
    assert "lang" in full.columns and "lang" not in slim.columns


def test_with_stored_ignored_when_filter_needs_stored(built):
    flt = F.col("lang") == "en"
    a = built.search_df("merge", filter=flt)
    b = built.search_df("merge", filter=flt, with_stored=False)
    assert _scores(a) == _scores(b)


def test_embedding_near_dup_capped_equals_uncapped(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    capped = sorted(
        (r["a"], r["b"], r["cosine"]) for r in
        sim.embedding_near_dup(emb, threshold=0.4, n_planes=16,
                               n_bands=4, seed=42).collect())
    uncapped = sorted(
        (r["a"], r["b"], r["cosine"]) for r in
        sim.embedding_near_dup(emb, threshold=0.4, n_planes=16,
                               n_bands=4, seed=42, max_bucket=0).collect())
    assert capped == uncapped and len(capped) > 0


def test_field_len_denormalized_built_stripped_saved(built, tmp_path, spark):
    from slimsearch_spark.sources.index_store import load_index, save_index
    assert "field_len" in built.postings.columns
    path = str(tmp_path / "fl_idx")
    save_index(built, path)
    loaded = load_index(spark, path)
    # saved layout has no field_len → loaded index scores via the
    # doc_stats join fallback; results must match the in-row path
    assert "field_len" not in loaded.postings.columns
    q = "spark join merge"
    assert _scores(loaded.search_df(q, with_stored=False)) == \
        _scores(built.search_df(q, with_stored=False))


def test_add_all_onto_loaded_index_aligns_columns(docs, tmp_path, spark):
    from slimsearch_spark.sources.index_store import load_index, save_index
    cfg = IndexConfig(fields=["text"], id_field="doc_id",
                      store_fields=["lang"])
    half = SparkSearchIndex.build(docs.where(F.col("doc_id") % 2 == 0),
                                  cfg, order_cols=["doc_id"])
    path = str(tmp_path / "half_idx")
    save_index(half, path)
    loaded = load_index(spark, path)
    # fresh batch postings carry field_len; the loaded side does not —
    # the union must align (drop) rather than fill NULL lengths
    loaded.add_all(docs.where(F.col("doc_id") % 2 == 1))
    assert "field_len" not in loaded.postings.columns
    full = SparkSearchIndex.build(docs, cfg, order_cols=["doc_id"])
    assert _scores(loaded.search_df("merge", with_stored=False)) == \
        _scores(full.search_df("merge", with_stored=False))
