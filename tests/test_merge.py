"""Cross-index merge: k independently-built shard indexes → one index,
BM25-identical to a single full-corpus build. This is the merge JOB of a
sharded 10^12-file build (north star: per-partition inverted indexes
"merged via a salted shuffle on term-hash" — the shuffle happens in the
merged index's compaction, operators/compact.py)."""

import pytest

from pyspark.sql import functions as F

from slimsearch_spark.config import IndexConfig
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.sources.corpus import synth_corpus
from slimsearch_spark.sources.index_store import (load_index,
                                                  merge_saved_indexes)

CFG = IndexConfig(fields=["content"], id_field="path",
                  store_fields=["repo", "lang"])
N_SHARDS = 3


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_corpus(spark, 240, tokens_per_file=40).cache()


@pytest.fixture(scope="module")
def full_index(corpus):
    return SparkSearchIndex.build(corpus, CFG, order_cols=["path"])


@pytest.fixture(scope="module")
def shard_indexes(corpus):
    # each shard is an INDEPENDENT build: its own dense doc-id space,
    # its own corpus stats — exactly what k separate build jobs produce
    return [SparkSearchIndex.build(
        corpus.where(F.pmod(F.xxhash64("path"), F.lit(N_SHARDS)) == i),
        CFG, order_cols=["path"]) for i in range(N_SHARDS)]


@pytest.fixture(scope="module")
def merged(shard_indexes):
    return SparkSearchIndex.merge(shard_indexes)


def _scores(idx, query, **opts):
    return {r["path"]: round(r["score"], 9)
            for r in idx.search_df(query, **opts)
            .select("path", "score").collect()}


def test_merge_matches_full_build_exact(full_index, merged):
    q = "spark posting merge"
    full = _scores(full_index, q)
    assert full  # the query matches something
    assert _scores(merged, q) == full


def test_merge_matches_full_build_and_fuzzy(full_index, merged):
    q = "token merje"
    kw = dict(combineWith="AND", prefix=True, fuzzy=1)
    full = _scores(full_index, q, **kw)
    assert full
    assert _scores(merged, q, **kw) == full


def test_merge_wand_path(full_index, merged):
    # compacting the merged index = the salted term-hash merge shuffle;
    # the pruned top-k must score identically to the full exact plan
    q = "spark varint"
    exact = _scores(full_index, q)
    top = (merged.search_topk_wand(q, 10, adaptive_min_docs=0)
           .join(merged.docs, "doc_id").select("path", "score").collect())
    assert len(top) == 10
    kth = sorted(exact.values(), reverse=True)[9]
    for r in top:
        assert round(r["score"], 9) == exact[r["path"]]
        assert round(r["score"], 9) >= round(kth, 9)


def test_merge_doc_ids_dense_and_unique(merged, corpus):
    n = corpus.count()
    ids = sorted(r["doc_id"] for r in
                 merged.docs.select("doc_id").collect())
    assert ids == list(range(n))     # shard-dense + offsets ⇒ global-dense
    assert merged.doc_count == n
    assert merged.next_id == n


def test_merge_compacts_shard_tombstones(corpus):
    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo", "lang"], auto_vacuum=False)
    shards = [SparkSearchIndex.build(
        corpus.where(F.pmod(F.xxhash64("path"), F.lit(2)) == i),
        cfg, order_cols=["path"]) for i in range(2)]
    victims = [r["path"] for r in
               shards[0].docs.select("path").limit(5).collect()]
    for p in victims:
        shards[0].discard(p)
    merged = SparkSearchIndex.merge(shards)
    assert merged.doc_count == corpus.count() - len(victims)
    assert not merged.has_tombstones()
    assert merged.dirt_count == 0
    got = set(_scores(merged, "the"))
    assert not (got & set(victims))


def test_merge_duplicate_external_ids_raise(shard_indexes):
    with pytest.raises(ValueError, match="duplicate"):
        SparkSearchIndex.merge([shard_indexes[0], shard_indexes[0]])


def test_merge_field_mismatch_raises(corpus, shard_indexes):
    other = SparkSearchIndex.build(
        corpus.limit(10).withColumn("title", F.col("path")),
        IndexConfig(fields=["content", "title"], id_field="path",
                    store_fields=["repo", "lang"]),
        order_cols=["path"])
    with pytest.raises(ValueError, match="field lists differ"):
        SparkSearchIndex.merge([shard_indexes[0], other])


def test_merge_saved_indexes_roundtrip(spark, tmp_path, shard_indexes,
                                       full_index):
    from slimsearch_spark.sources.index_store import save_index
    paths = []
    for i, ix in enumerate(shard_indexes):
        p = str(tmp_path / f"shard{i}")
        save_index(ix, p)
        paths.append(p)
    out = str(tmp_path / "merged")
    manifest = merge_saved_indexes(spark, paths, out)
    assert manifest["merge"]["n_shards"] == N_SHARDS
    loaded = load_index(spark, out)
    q = "spark posting merge"
    assert _scores(loaded, q) == _scores(full_index, q)


# ---------------------------------------------------------------- absorb

def _split(corpus, n, i):
    return corpus.where(F.pmod(F.xxhash64("path"), F.lit(n)) == i)


def test_absorb_matches_full_build(corpus, full_index):
    base = SparkSearchIndex.build(_split(corpus, 3, 0)
                                  .unionByName(_split(corpus, 3, 1)),
                                  CFG, order_cols=["path"])
    shard = SparkSearchIndex.build(_split(corpus, 3, 2), CFG,
                                   order_cols=["path"])
    base.absorb(shard)
    q = "spark posting merge"
    assert _scores(base, q) == _scores(full_index, q)
    assert base.doc_count == corpus.count()
    ids = [r["doc_id"] for r in base.docs.select("doc_id").collect()]
    assert len(ids) == len(set(ids))


def test_absorb_into_compacted_appends_segment(corpus, full_index):
    base = SparkSearchIndex.build(_split(corpus, 3, 0)
                                  .unionByName(_split(corpus, 3, 1)),
                                  CFG, order_cols=["path"])
    base.posting_lists()             # compact → absorb must append
    base_lists = base._posting_lists
    shard = SparkSearchIndex.build(_split(corpus, 3, 2), CFG,
                                   order_cols=["path"])
    shard.posting_lists()            # shard compaction must not interfere
    base.absorb(shard)
    assert base._segment_count == 2
    # the pre-absorb encoded segment is reused object-identically
    assert base._segments[0] is base_lists
    q = "spark varint"
    exact = _scores(full_index, q)
    top = (base.search_topk_wand(q, 10, adaptive_min_docs=0)
           .join(base.docs, "doc_id").select("path", "score").collect())
    assert len(top) == 10
    for r in top:
        assert round(r["score"], 9) == exact[r["path"]]


def test_absorb_skips_shard_tombstones(corpus):
    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo", "lang"], auto_vacuum=False)
    base = SparkSearchIndex.build(_split(corpus, 2, 0), cfg,
                                  order_cols=["path"])
    shard = SparkSearchIndex.build(_split(corpus, 2, 1), cfg,
                                   order_cols=["path"])
    victims = [r["path"] for r in
               shard.docs.select("path").limit(4).collect()]
    for p in victims:
        shard.discard(p)
    n_base = base.doc_count
    base.absorb(shard)              # doc_count already excludes discards
    assert base.doc_count == n_base + shard.doc_count
    assert base.doc_count == corpus.count() - len(victims)
    got = set(_scores(base, "the"))
    assert not (got & set(victims))


def test_absorb_duplicate_id_raises(shard_indexes):
    base = SparkSearchIndex.merge(shard_indexes[:2])
    with pytest.raises(ValueError, match="duplicate"):
        base.absorb(shard_indexes[0])


def test_absorb_field_mismatch_raises(corpus, shard_indexes):
    other = SparkSearchIndex.build(
        corpus.limit(10).withColumn("title", F.col("path")),
        IndexConfig(fields=["content", "title"], id_field="path",
                    store_fields=["repo", "lang"]),
        order_cols=["path"])
    base = SparkSearchIndex.merge(shard_indexes[:2])
    with pytest.raises(ValueError, match="field lists differ"):
        base.absorb(other)
