"""Maintenance / info operator parity: eager remove + removeAll (reference
src/remove.ts:139-217), getStoredFields / has (src/info.ts), getDefaultValue
(src/defaults.ts:75-79), createIndex searchOptions cascade."""

import pytest

from pyspark.sql import functions as F

from slimsearch_spark.config import (IndexConfig, SearchOptions,
                                     get_default_value)
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.sources.corpus import synth_corpus

CFG = IndexConfig(fields=["content"], id_field="path",
                  store_fields=["repo", "lang"])


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_corpus(spark, 120, tokens_per_file=40).cache()


def _build(corpus):
    return SparkSearchIndex.build(corpus, CFG, order_cols=["repo", "path"])


def test_remove_equals_never_added(spark, corpus):
    """remove(doc) leaves the index identical (same ranking AND scores) to
    one built without the doc — the reference's core remove contract
    (remove.spec.ts)."""
    victims = [r.asDict() for r in corpus.orderBy("path").limit(10).collect()]
    victim_paths = {v["path"] for v in victims}
    idx = _build(corpus)
    idx.remove_all(victims)
    fresh = _build(corpus.where(~F.col("path").isin(list(victim_paths))))
    for q in ["the parse", "varint merge"]:
        a = [(r["id"], round(r["score"], 9)) for r in idx.search(q)]
        b = [(r["id"], round(r["score"], 9)) for r in fresh.search(q)]
        assert a == b, q
    assert idx.doc_count == fresh.doc_count
    assert idx.avg_field_length[0] == pytest.approx(
        fresh.avg_field_length[0], rel=1e-12)


def test_remove_missing_raises(spark, corpus):
    idx = _build(corpus)
    with pytest.raises(ValueError, match="not in the index"):
        idx.remove({"path": "no/such/file.py", "repo": "r", "commit": "c",
                    "lang": "py", "content": "x"})


def test_remove_changed_doc_warns(spark, corpus):
    """version_conflict: removing a modified document logs a warning
    (reference src/warning.ts:4-24) but still removes by doc_id."""
    victim = corpus.orderBy("path").first().asDict()
    idx = _build(corpus)
    victim["content"] = victim["content"] + " extra token"
    with pytest.warns(UserWarning, match="version_conflict"):
        idx.remove(victim)
    assert not idx.has(victim["path"])


def test_remove_all_reset(spark, corpus):
    idx = _build(corpus)
    idx.remove_all()
    assert idx.doc_count == 0
    assert idx.search("the") == []
    # reset index accepts fresh adds (reference removeAll.spec.ts)
    idx.add_all(corpus.limit(5))
    assert idx.doc_count == 5


def test_get_stored_fields_and_has(spark, corpus):
    idx = _build(corpus)
    row = corpus.orderBy("path").first()
    assert idx.has(row["path"])
    stored = idx.get_stored_fields(row["path"])
    assert stored == {"repo": row["repo"], "lang": row["lang"]}
    assert idx.get_stored_fields("missing/file") is None


def test_get_default_value():
    assert get_default_value("maxFuzzy") == 6
    assert get_default_value("bm25") == {"k": 1.2, "b": 0.7, "d": 0.5}
    assert get_default_value("weights") == {"fuzzy": 0.45, "prefix": 0.375}
    with pytest.raises(ValueError, match="unknown option"):
        get_default_value("nope")


def _paths(corpus, n):
    return [r["path"] for r in
            corpus.select("path").orderBy("path").limit(n).collect()]


def test_auto_vacuum_triggers(spark, corpus):
    """Reference maybeAutoVacuum semantics (src/vacuum.ts:15-21, defaults
    minDirtCount=20 / minDirtFactor=0.1, exercised by discard.spec.ts):
    below either threshold the tombstones stay; once both are reached the
    discard itself compacts."""
    idx = _build(corpus)  # auto_vacuum defaults to True
    idx.discard_many(_paths(corpus, 19))
    assert idx.dirt_count == 19 and idx.has_tombstones()  # 19 < minDirtCount
    idx.discard(_paths(corpus, 20)[19])  # 20th discard: factor 20/121 > 0.1
    assert idx.dirt_count == 0 and not idx.has_tombstones()
    assert idx.postings.count() == idx.live_postings().count()

    # custom thresholds via dict
    cfg = IndexConfig(fields=["content"], id_field="path",
                      auto_vacuum={"minDirtCount": 5, "minDirtFactor": 0.0})
    idx2 = SparkSearchIndex.build(corpus, cfg, order_cols=["repo", "path"])
    idx2.discard_many(_paths(corpus, 5))
    assert idx2.dirt_count == 0 and not idx2.has_tombstones()

    # disabled: tombstones accumulate until a manual vacuum
    cfg3 = IndexConfig(fields=["content"], id_field="path",
                       auto_vacuum=False)
    idx3 = SparkSearchIndex.build(corpus, cfg3, order_cols=["repo", "path"])
    idx3.discard_many(_paths(corpus, 30))
    assert idx3.dirt_count == 30 and idx3.has_tombstones()
    idx3.vacuum()
    assert not idx3.has_tombstones()


def test_discard_where_distributed(spark, corpus):
    """Mass tombstone by predicate: no doc_id list ever reaches the driver;
    search results equal the same discard done via the driver list."""
    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo", "lang"], auto_vacuum=False)
    a = SparkSearchIndex.build(corpus, cfg, order_cols=["repo", "path"])
    b = SparkSearchIndex.build(corpus, cfg, order_cols=["repo", "path"])
    victims = [r["path"] for r in
               corpus.where(F.col("lang") == "py").select("path").collect()]
    n = a.discard_where(F.col("lang") == "py")
    b.discard_many(victims)
    assert n == len(victims) > 0
    assert not a.tombstones and a._tombstone_df is not None  # stays a table
    assert a.doc_count == b.doc_count
    assert a.avg_field_length[0] == pytest.approx(b.avg_field_length[0],
                                                  rel=1e-12)
    for q in ["the parse", "varint merge"]:
        got = [(r["id"], round(r["score"], 9)) for r in a.search(q)]
        want = [(r["id"], round(r["score"], 9)) for r in b.search(q)]
        assert got == want, q
    # second predicate discard unions into the table without double counting
    assert a.discard_where(F.col("lang") == "py") == 0
    a.vacuum()
    assert a._tombstone_df is None
    assert a.docs.count() == a.doc_count


def test_save_load_preserves_discards(spark, corpus, tmp_path):
    """Round-2 fix: save writes every table through the live view, so a
    loaded index never resurrects discarded docs (docs/doc_stats were
    previously written raw)."""
    from slimsearch_spark.sources.index_store import load_index, save_index
    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo"], auto_vacuum=False)
    idx = SparkSearchIndex.build(corpus, cfg, order_cols=["repo", "path"])
    victims = _paths(corpus, 7)
    idx.discard_many(victims)
    path = str(tmp_path / "didx")
    save_index(idx, path)
    loaded = load_index(spark, path)
    assert loaded.doc_count == idx.doc_count
    assert loaded.docs.count() == idx.doc_count
    assert not loaded.has(victims[0])
    from slimsearch_spark.config import WILDCARD
    assert loaded.search_df(WILDCARD).count() == idx.doc_count
    want = [(r["id"], round(r["score"], 9)) for r in idx.search("the parse")]
    got = [(r["id"], round(r["score"], 9))
           for r in loaded.search("the parse")]
    assert got == want


def test_add_all_rejects_in_batch_duplicates(spark, corpus):
    idx = _build(corpus)
    extra = corpus.limit(0)
    row = {"repo": "r", "path": "dup/x.py", "commit": "c", "lang": "py",
           "content": "alpha beta"}
    dup_batch = corpus.sparkSession.createDataFrame([row, row])
    with pytest.raises(ValueError, match="within"):
        idx.add_all(dup_batch)
    del extra


def test_logger_option_routes_warnings(spark, corpus):
    """Reference logger option (src/defaults.ts:22): a configured logger
    receives warnings instead of the warnings module."""
    seen = []
    cfg = IndexConfig(fields=["content"], id_field="path",
                      logger=lambda level, msg: seen.append((level, msg)))
    idx = SparkSearchIndex.build(corpus, cfg, order_cols=["repo", "path"])
    victim = corpus.orderBy("path").first().asDict()
    victim["content"] = victim["content"] + " extra token"
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # would raise if warnings.warn ran
        idx.remove(victim)
    assert seen and seen[0][0] == "warn" and "version_conflict" in seen[0][1]


def test_index_level_search_options(spark, corpus):
    """createIndex({searchOptions}) cascade: options set at index build are
    the search defaults, per-query options override (reference
    src/SearchIndex.ts:143-197)."""
    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo"],
                      search_options=SearchOptions(boost={"content": 2.0}))
    idx = SparkSearchIndex.build(corpus, cfg, order_cols=["repo", "path"])
    plain = SparkSearchIndex.build(corpus, CFG, order_cols=["repo", "path"])
    a = [(r["id"], round(r["score"], 9)) for r in idx.search("varint")]
    b = [(r["id"], round(2 * r["score"], 9)) for r in plain.search("varint")]
    assert a == b
    # per-query override wins over the index default
    c = [(r["id"], round(r["score"], 9))
         for r in idx.search("varint", boost={"content": 1.0})]
    d = [(r["id"], round(r["score"], 9)) for r in plain.search("varint")]
    assert c == d


def test_get_default_value_reference_surface():
    """getDefaultValue exposes the reference defaultOptions key set
    (src/defaults.ts:7-26,75-79), incl. the default callables (round 3)."""
    assert get_default_value("idField") == "id"
    assert get_default_value("extractField")({"a": 1}, "a") == 1
    assert get_default_value("extractField")({"a": 1}, "b") is None
    assert get_default_value("stringifyField")(7, "n") == "7"
    assert get_default_value("processTerm")("AbC") == "abc"
    assert get_default_value("tokenize")("a b") == ["a", "b"]
    assert get_default_value("storeFields") == []
    assert get_default_value("autoVacuum") is True
    assert get_default_value("fields") is None


def test_add_all_empty_batch_noop(spark, corpus):
    """Round-6 latent-bug regression: add_all of an EMPTY batch carrying a
    doc_id column aggregated min/max to NULL and raised TypeError on the
    int() cast. An empty batch must be a no-op: ids, doc_count, stats and
    search results all unchanged."""
    idx = _build(corpus)
    before = [(r["id"], round(r["score"], 9)) for r in
              idx.search("the", top_k=5)]
    next_id, doc_count = idx.next_id, idx.doc_count
    idx.add_all(corpus.limit(0)
                .withColumn("doc_id", F.lit(0).cast("long")))  # empty,
    # WITH a doc_id column — the caller-provided-ids path
    assert idx.next_id == next_id
    assert idx.doc_count == doc_count
    after = [(r["id"], round(r["score"], 9)) for r in
             idx.search("the", top_k=5)]
    assert before == after
