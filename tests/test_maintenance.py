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
