"""Round-4 serving-path features over the compacted index:

* incremental segment compaction — ``add_all`` on a compacted index
  appends an encoded segment for the new docs instead of invalidating
  (no full index re-encode per ingest batch; new doc_ids continue from
  next_id, so segments cover disjoint doc-id ranges and the WAND kernels
  serve them as independent slices, with per-(term, field) df totals
  re-aggregated at query time);
* ``filter`` as a Column / SQL predicate on the WAND path (reference
  semantics, src/search.ts:199: scores as if unfiltered, failing docs
  excluded via the decode-time tombstone mechanism);
* wide expansion over a tombstoned index (the round-3 corner: the live
  df recount is now a joined DataFrame, never a driver dict).

The oracle everywhere is the exact plan (search_df), itself gated
against the reference golden sets.
"""

import pytest

from pyspark.sql import functions as F

from slimsearch_spark.config import IndexConfig
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.sources.corpus import synth_corpus

CFG = IndexConfig(fields=["content"], id_field="path",
                  store_fields=["repo"], auto_vacuum=False)


def _topk(df, k=None):
    rows = [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]
    return rows[:k] if k else rows


def _split_corpus(spark, n=90, tokens=40, cut=60):
    docs = synth_corpus(spark, n, tokens_per_file=tokens)
    i = F.regexp_extract("path", r"file(\d+)\.py", 1).cast("int")
    return docs.where(i < cut), docs.where(i >= cut)


def _segmented_index(spark, n=90, cut=60, batches=1):
    first, rest = _split_corpus(spark, n=n, cut=cut)
    idx = SparkSearchIndex.build(first, CFG, order_cols=["repo", "path"])
    idx.posting_lists()  # compact BEFORE the appends
    if batches == 1:
        idx.add_all(rest)
    else:
        i = F.regexp_extract("path", r"file(\d+)\.py", 1).cast("int")
        for b in range(batches):
            idx.add_all(rest.where(i % batches == b))
    return idx


def test_add_all_appends_segment_no_reencode(spark):
    """add_all on a compacted index appends a segment: the pre-existing
    segment DataFrame is untouched (same object — batch work is O(batch),
    not O(index)) and the WAND top-k equals the exact plan over the full
    corpus, including terms whose postings span both segments (wrong df
    totalization would shift idf and break score equality)."""
    first, rest = _split_corpus(spark)
    idx = SparkSearchIndex.build(first, CFG, order_cols=["repo", "path"])
    before = idx.posting_lists()
    idx.add_all(rest)
    assert idx._segment_count == 2
    assert idx._segments[0] is before  # old segment never re-encoded
    for q in ("the", "varint delta merge", "parse tokenizer"):
        assert _topk(idx.search_topk_wand(q, 10, adaptive_min_docs=0)) == \
            _topk(idx.search_df(q, top_k=10).select("doc_id", "score")), q


def test_segmented_combinators_and_multifield(spark):
    idx = _segmented_index(spark)
    for kw in ({"combineWith": "and"}, {"combineWith": "and_not"},
               {"prefix": True}, {"fuzzy": 1}):
        got = _topk(idx.search_topk_wand("the merge", 8,
                                         adaptive_min_docs=0, **kw))
        want = _topk(idx.search_df("the merge", top_k=8, **kw)
                     .select("doc_id", "score"))
        assert got == want, kw


def test_three_segments_and_term_dict_incremental(spark):
    """Several appended batches stack segments; the term dictionary is
    maintained by a dictionary-sized union, and expansion queries (which
    read it) stay exact."""
    idx = _segmented_index(spark, n=100, cut=40, batches=3)
    assert idx._segment_count >= 2
    got = _topk(idx.search_topk_wand("pars", 10, adaptive_min_docs=0,
                                     prefix=True))
    want = _topk(idx.search_df("pars", top_k=10, prefix=True)
                 .select("doc_id", "score"))
    assert got == want


def test_segment_cap_falls_back_to_merge(spark):
    """Past max_segments with nothing tiered-mergeable (only the base
    exists) the next add_all invalidates (full merge on next use) instead
    of appending — bounded per-(term, field) row fan-out."""
    first, rest = _split_corpus(spark, n=60, cut=40)
    idx = SparkSearchIndex.build(first, CFG, order_cols=["repo", "path"])
    idx.posting_lists()
    idx.max_segments = 1
    idx.add_all(rest)
    assert getattr(idx, "_posting_lists", None) is None  # merged lazily
    got = _topk(idx.search_topk_wand("the", 5, adaptive_min_docs=0))
    assert got == _topk(idx.search_df("the", top_k=5)
                        .select("doc_id", "score"))
    assert idx._segment_count == 1


def test_segment_cap_tiered_merge(spark):
    """At the max_segments cap the appended segments merge into ONE
    re-encoded segment (O(appended docs)) while the base segment is never
    touched — the LSM tier. Four batches with cap 3: append, append,
    (merge → append), (merge → append); base object identity preserved
    throughout, results exact."""
    first, rest = _split_corpus(spark, n=100, cut=40)
    idx = SparkSearchIndex.build(first, CFG, order_cols=["repo", "path"])
    base = idx.posting_lists()
    idx.max_segments = 3
    i = F.regexp_extract("path", r"file(\d+)\.py", 1).cast("int")
    for b in range(4):
        idx.add_all(rest.where(i % 4 == b))
        assert idx._segment_count <= 3
        assert idx._segments[0] is base  # tiered: base never re-encoded
    assert idx._segment_count == 3  # [base, merged(b0,b1,b2), b3]
    for q, kw in [("the parse", {}), ("the merge", {"combineWith": "and"}),
                  ("pars", {"prefix": True})]:
        got = _topk(idx.search_topk_wand(q, 10, adaptive_min_docs=0, **kw))
        want = _topk(idx.search_df(q, top_k=10, **kw)
                     .select("doc_id", "score"))
        assert got == want and got, (q, kw)


def test_segment_interleaved_ids_disable_tiered_merge(spark):
    """Caller-provided doc_ids below the base id ceiling interleave into
    the base range: the floor predicate cannot separate appended rows, so
    the cap must take the FULL merge (correctness over speed)."""
    first, rest = _split_corpus(spark, n=60, cut=40)
    idx = SparkSearchIndex.build(
        first.withColumn(
            "doc_id",
            2 * F.regexp_extract("path", r"file(\d+)\.py", 1).cast("long")),
        CFG, order_cols=["repo", "path"])
    idx.posting_lists()
    idx.max_segments = 3
    i = F.regexp_extract("path", r"file(\d+)\.py", 1).cast("int")
    for b in range(3):
        # odd ids 1..39: interleaved between the base's even ids 0..78,
        # all below the compaction-time floor (next_id = 79)
        idx.add_all(rest.where(i % 3 == b)
                    .withColumn("doc_id", (2 * (i - 40) + 1).cast("long")))
    assert getattr(idx, "_segments_mergeable", True) is False
    assert getattr(idx, "_posting_lists", None) is None  # full merge taken
    got = _topk(idx.search_topk_wand("the parse", 5, adaptive_min_docs=0))
    assert got == _topk(idx.search_df("the parse", top_k=5)
                        .select("doc_id", "score")) and len(got) == 5


def test_segments_with_tombstones(spark):
    """Discard from the OLD segment after an append: kernels drop the
    tombstones, the df recount spans both segments."""
    idx = _segmented_index(spark)
    victims = [r["path"] for r in
               idx.docs.select("path").orderBy("path").limit(3).collect()]
    idx.discard_many(victims)
    assert idx.has_tombstones() and idx._segment_count == 2
    got = _topk(idx.search_topk_wand("the parse", 5, adaptive_min_docs=0))
    want = _topk(idx.search_df("the parse", top_k=5)
                 .select("doc_id", "score"))
    assert got == want and len(got) == 5


# --------------------------------------------- incremental persistence


def test_save_index_delta_roundtrip(spark, tmp_path):
    """save_index_delta appends only the new batch (docs/stats/postings/
    terms + a new posting_lists segment dir); the loaded index serves
    BOTH paths with results identical to the in-memory index."""
    from slimsearch_spark.sources.index_store import (load_index,
                                                      save_index,
                                                      save_index_delta)
    first, rest = _split_corpus(spark, n=90, cut=60)
    idx = SparkSearchIndex.build(first, CFG, order_cols=["repo", "path"])
    path = str(tmp_path / "ix")
    save_index(idx, path)
    idx.add_all(rest)
    man = save_index_delta(idx, path)
    assert man["doc_count"] == 90
    assert man["lineage"]["n_segments"] == 2
    loaded = load_index(spark, path)
    assert loaded.doc_count == 90 and loaded._segment_count == 2
    for q, kw in [("the parse", {}), ("varint delta merge", {}),
                  ("the merge", {"combineWith": "and"})]:
        want = _topk(idx.search_df(q, top_k=10, **kw)
                     .select("doc_id", "score"))
        got_df = _topk(loaded.search_df(q, top_k=10, **kw)
                       .select("doc_id", "score"))
        got_w = _topk(loaded.search_topk_wand(q, 10, adaptive_min_docs=0,
                                              **kw))
        assert got_df == want and got_w == want, (q, kw)
    # point lookup sees the appended rows through the bucketed row store
    some = rest.select("path").orderBy("path").limit(1).collect()[0]["path"]
    assert loaded.has(some)


def test_save_index_delta_stacks_and_appends_in_memory(spark, tmp_path):
    """Two delta saves stack persisted segments; add_all on the loaded
    (segment-columned) index appends an in-memory segment on top."""
    from slimsearch_spark.sources.index_store import (load_index,
                                                      save_index,
                                                      save_index_delta)
    docs = synth_corpus(spark, 100, tokens_per_file=30)
    i = F.regexp_extract("path", r"file(\d+)\.py", 1).cast("int")
    idx = SparkSearchIndex.build(docs.where(i < 50), CFG,
                                 order_cols=["repo", "path"])
    path = str(tmp_path / "ix2")
    save_index(idx, path)
    idx.add_all(docs.where((i >= 50) & (i < 75)))
    save_index_delta(idx, path)
    idx.add_all(docs.where(i >= 75))
    man = save_index_delta(idx, path)
    assert man["lineage"]["n_segments"] == 3
    loaded = load_index(spark, path)
    assert loaded._segment_count == 3
    more = (synth_corpus(spark, 10, tokens_per_file=30)
            .withColumn("path", F.concat(F.lit("extra/"), F.col("path"))))
    loaded.add_all(more, order_cols=["repo", "path"])
    assert loaded._segment_count == 4
    got = _topk(loaded.search_topk_wand("the parse", 10,
                                        adaptive_min_docs=0))
    want = _topk(loaded.search_df("the parse", top_k=10)
                 .select("doc_id", "score"))
    assert got == want and got


def test_save_index_delta_persists_tombstones(spark, tmp_path):
    """Discards persist as a delta too: the tombstone set + dirt_count
    ride the manifest, the loaded index excludes the discarded docs on
    both query paths, a tombstone-only delta (pure discard batch, no new
    docs) works, and a later full save compacts the tombstones away."""
    import os
    from slimsearch_spark.sources.index_store import (load_index,
                                                      save_index,
                                                      save_index_delta)
    first, rest = _split_corpus(spark, n=90, cut=60)
    idx = SparkSearchIndex.build(first, CFG, order_cols=["repo", "path"])
    path = str(tmp_path / "ixt")
    save_index(idx, path)
    idx.add_all(rest)
    paths = [r["path"] for r in
             idx.docs.select("path").orderBy("path").limit(4).collect()]
    idx.discard_many(paths[:3])
    man = save_index_delta(idx, path)
    assert man["dirt_count"] == 3 and man["doc_count"] == 87
    loaded = load_index(spark, path)
    assert loaded.doc_count == 87 and loaded.dirt_count == 3
    assert loaded.has_tombstones() and not loaded.has(paths[0])
    for q, kw in [("the parse", {}), ("the merge", {"combineWith": "and"})]:
        want = _topk(idx.search_df(q, top_k=10, **kw)
                     .select("doc_id", "score"))
        assert _topk(loaded.search_df(q, top_k=10, **kw)
                     .select("doc_id", "score")) == want, (q, kw)
        assert _topk(loaded.search_topk_wand(q, 10, adaptive_min_docs=0,
                                             **kw)) == want, (q, kw)
    # tombstone-only delta: a discard batch with no new docs
    loaded.discard(paths[3])
    man2 = save_index_delta(loaded, path)
    assert man2["dirt_count"] == 4 and man2["doc_count"] == 86
    loaded2 = load_index(spark, path)
    assert loaded2.doc_count == 86 and loaded2.dirt_count == 4
    want = _topk(loaded.search_df("the parse", top_k=10)
                 .select("doc_id", "score"))
    assert _topk(loaded2.search_df("the parse", top_k=10)
                 .select("doc_id", "score")) == want
    # a full save compacts tombstones away and removes the persisted set
    save_index(loaded2, path)
    assert not os.path.exists(os.path.join(path, "tombstones"))
    loaded3 = load_index(spark, path)
    assert loaded3.dirt_count == 0 and not loaded3.has_tombstones()
    assert _topk(loaded3.search_df("the parse", top_k=10)
                 .select("doc_id", "score")) == want


def test_save_index_delta_guards(spark, tmp_path):
    from slimsearch_spark.sources.index_store import (save_index,
                                                      save_index_delta)
    first, rest = _split_corpus(spark, n=60, cut=40)
    idx = SparkSearchIndex.build(first, CFG, order_cols=["repo", "path"])
    path = str(tmp_path / "ix3")
    save_index(idx, path)
    # no new docs → no-op, manifest unchanged
    man = save_index_delta(idx, path)
    assert man["doc_count"] == 40 and man["lineage"]["n_segments"] == 1
    victims = [r["path"] for r in
               idx.docs.select("path").orderBy("path").limit(2).collect()]
    idx.discard_many(victims)
    idx.vacuum()  # in-place rewrite: saved tables still hold the dead rows
    with pytest.raises(ValueError, match="save_index"):
        save_index_delta(idx, path)


# ------------------------------------------------------------- filter


def test_wand_filter_column_and_sql(spark):
    """Column / SQL-string stored-field predicates are served on the WAND
    path with reference semantics: same rows+scores as search_df's filter
    fast path (scores unchanged by the filter, failing docs absent)."""
    docs = synth_corpus(spark, 80, tokens_per_file=30)
    idx = SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])
    idx.posting_lists()
    col_pred = F.col("repo") != "org1/proj1"
    sql_pred = "repo <> 'org1/proj1'"
    want = _topk(idx.search_df("the merge", top_k=6, filter=col_pred)
                 .select("doc_id", "score"))
    assert want  # predicate must actually bite on this corpus
    for pred in (col_pred, sql_pred):
        got = _topk(idx.search_topk_wand("the merge", 6,
                                         adaptive_min_docs=0, filter=pred))
        assert got == want, pred
    # filtered docs excluded but scores must equal the UNFILTERED scores
    # for surviving docs (reference filter runs after scoring)
    unfiltered = dict(_topk(
        idx.search_topk_wand("the merge", 80, adaptive_min_docs=0)))
    for doc_id, score in got:
        assert unfiltered[doc_id] == score


def test_wand_filter_guards(spark):
    docs = synth_corpus(spark, 30, tokens_per_file=20)
    idx = SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])
    idx.posting_lists()
    with pytest.raises(ValueError, match="callable"):
        idx.search_topk_wand("the", 5, adaptive_min_docs=0,
                             filter=lambda r: True)
    with pytest.raises(ValueError, match="filter_collect_threshold"):
        idx.search_topk_wand("the", 5, adaptive_min_docs=0,
                             filter=F.lit(False),
                             filter_collect_threshold=10)


def test_wand_filter_composes_with_discards(spark):
    docs = synth_corpus(spark, 70, tokens_per_file=30)
    idx = SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])
    idx.posting_lists()
    victims = [r["path"] for r in
               docs.select("path").orderBy("path").limit(3).collect()]
    idx.discard_many(victims)
    pred = F.col("repo") != "org2/proj2"
    got = _topk(idx.search_topk_wand("the", 5, adaptive_min_docs=0,
                                     filter=pred))
    want = _topk(idx.search_df("the", top_k=5, filter=pred)
                 .select("doc_id", "score"))
    assert got == want and len(got) == 5


# ------------------------------------- wide expansion over tombstones


def test_wand_wide_expansion_tombstoned(spark):
    """The round-3 corner is closed: wide (DataFrame) expansions over a
    discarded, unvacuumed index serve through the pruned path — the live
    df recount is a join against the expansion's derived terms, not a
    driver dict."""
    docs = synth_corpus(spark, 60, tokens_per_file=30)
    idx = SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])
    idx.posting_lists()
    victims = [r["path"] for r in
               docs.select("path").orderBy("path").limit(4).collect()]
    idx.discard_many(victims)
    got = _topk(idx.search_topk_wand("pa", 10, adaptive_min_docs=0,
                                     prefix=True,
                                     expansionCollectThreshold=0))
    want = _topk(idx.search_df("pa", top_k=10, prefix=True)
                 .select("doc_id", "score"))
    assert got == want
