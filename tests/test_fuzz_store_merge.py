"""Property-based fuzz: save/load round-trip and shard-merge parity.

Completes the fuzz family (engine-vs-oracle in test_fuzz_parity.py,
WAND-vs-exact in test_fuzz_wand.py) with the two remaining contracts a
production deployment exercises constantly but the fixed-corpus tests
pin only at specific shapes:

* ``save_index`` → ``load_index`` must be a search-identity: for any
  corpus (duplicate docs, missing fields, score ties) and any supported
  option set, the loaded index returns the same id→score map as the
  live one — through BOTH the exact plan and the WAND path over the
  SAVED compacted lists (load restores blobs + encode params; a codec
  or manifest bug shows up as a score delta or a missing doc).
* ``SparkSearchIndex.merge([shard_0, shard_1])`` must be BM25-identical
  to a monolithic build of the concatenated corpus: same external-id
  result sets, same scores (df/avg-field-length/doc-count recompute over
  the union; doc-id offsets must not leak into scoring).

Comparisons key on the EXTERNAL id (internal doc_ids legitimately differ
between a monolithic build and a merge), scores at rel 1e-9.
"""

import math
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from slimsearch_spark.config import IndexConfig, IndexLayout
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.sources.index_store import (load_index, save_index,
                                                  save_index_delta)

VOCAB = ["a", "ab", "abc", "abd", "b", "ba", "spark", "spa", "sparse",
         "don't", "x1", "x2"]

texts = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=8).map(" ".join)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("title", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("_ord", T.IntegerType(), False),
])


@st.composite
def docs_strategy(draw, min_n=2, max_n=10, id_start=0):
    n = draw(st.integers(min_value=min_n, max_value=max_n))
    return [{"id": id_start + i,
             "title": draw(st.one_of(st.none(), texts)),
             "text": draw(texts)} for i in range(n)]


@st.composite
def search_options(draw):
    opts = {"combineWith": draw(st.sampled_from(["OR", "AND", "AND_NOT"]))}
    fuzzy = draw(st.sampled_from([False, 1, 0.3]))
    if fuzzy:
        opts["fuzzy"] = fuzzy
    if draw(st.booleans()):
        opts["prefix"] = True
    if draw(st.booleans()):
        opts["boost"] = {"title": 2}
    return opts


queries_st = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3) \
    .map(" ".join)

query_sets = st.lists(st.tuples(queries_st, search_options()),
                      min_size=2, max_size=3)


@st.composite
def store_cases(draw):
    return draw(docs_strategy()), draw(query_sets)


@st.composite
def merge_cases(draw):
    shard_a = draw(docs_strategy(min_n=1, max_n=6))
    shard_b = draw(docs_strategy(min_n=1, max_n=6, id_start=len(shard_a)))
    return shard_a, shard_b, draw(query_sets)


def _df(spark, docs):
    return spark.createDataFrame(
        [(d["id"], d["title"], d["text"], i) for i, d in enumerate(docs)],
        SCHEMA)


def _build(spark, docs):
    return SparkSearchIndex.build(
        _df(spark, docs),
        IndexConfig(fields=["title", "text"], store_fields=[]),
        order_cols=["_ord"])


def _by_ext_id(index, q, opts):
    """id→score over EXTERNAL ids via the exact plan."""
    out = {}
    for r in index.search(q, **opts):
        assert r["id"] not in out
        out[r["id"]] = r["score"]
    return out


def assert_score_maps_equal(got, want, ctx):
    assert set(got) == set(want), \
        f"{ctx}: result sets differ: {sorted(got)} != {sorted(want)}"
    for i in got:
        assert math.isclose(got[i], want[i], rel_tol=1e-9), \
            f"{ctx}: score mismatch id {i}: {got[i]} != {want[i]}"


@pytest.mark.usefixtures("spark")
@settings(max_examples=int(os.environ.get("SLIMSEARCH_FUZZ_EXAMPLES", "4")),
          deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(case=store_cases())
def test_fuzz_save_load_roundtrip(spark, case, tmp_path_factory):
    docs, qs = case
    live = _build(spark, docs)
    path = str(tmp_path_factory.mktemp("fuzz_idx"))
    save_index(live, path, layout=IndexLayout(block_doc_range=4))
    loaded = load_index(spark, path)
    for q, opts in qs:
        want = _by_ext_id(live, q, opts)
        got = _by_ext_id(loaded, q, opts)
        assert_score_maps_equal(got, want, f"loaded q={q!r} opts={opts}")
        # WAND over the loaded compacted lists must agree with the live
        # exact plan too (doc_ids are identical across save/load)
        want_int = {r["doc_id"]: r["score"] for r in
                    live.search_df(q, **opts)
                    .select("doc_id", "score").collect()}
        wand = {r["doc_id"]: r["score"] for r in
                loaded.search_topk_wand(q, max(len(want_int), 1),
                                        adaptive_min_docs=0, **opts)
                .collect()}
        assert set(wand) == set(want_int), \
            f"wand-on-loaded q={q!r} opts={opts}: " \
            f"{sorted(wand)} != {sorted(want_int)}"
        for d in wand:
            assert math.isclose(wand[d], want_int[d], rel_tol=1e-9), \
                f"wand-on-loaded q={q!r}: score {wand[d]} != {want_int[d]}"


@st.composite
def delta_cases(draw):
    base = draw(docs_strategy(min_n=2, max_n=6))
    extra = draw(docs_strategy(min_n=1, max_n=4, id_start=len(base)))
    ids = list(range(len(base) + len(extra)))
    discard_ids = sorted(draw(st.sets(st.sampled_from(ids),
                                      max_size=len(ids) - 1)))
    return base, extra, discard_ids, draw(query_sets)


@pytest.mark.usefixtures("spark")
@settings(max_examples=int(os.environ.get("SLIMSEARCH_FUZZ_EXAMPLES", "3")),
          deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(case=delta_cases())
def test_fuzz_delta_save_roundtrip(spark, case, tmp_path_factory):
    """The O(batch) persistence path: full save → add_all a batch +
    discard a random subset → save_index_delta → load. The loaded index
    must search-match the live one (which itself matches the oracle via
    test_fuzz_parity) — tombstone restore, segment append, term-dict
    append and the (doc_count + dirt_count) invariant all under fuzz."""
    base, extra, discard_ids, qs = case
    live = _build(spark, base)
    path = str(tmp_path_factory.mktemp("fuzz_delta"))
    save_index(live, path, layout=IndexLayout(block_doc_range=4))
    live.add_all(_df(spark, extra), order_cols=["_ord"])
    for i in discard_ids:
        live.discard(i)
    save_index_delta(live, path)
    loaded = load_index(spark, path)
    assert loaded.doc_count == live.doc_count
    for q, opts in qs:
        assert_score_maps_equal(
            _by_ext_id(loaded, q, opts), _by_ext_id(live, q, opts),
            f"delta discard={discard_ids} q={q!r} opts={opts}")


@pytest.mark.usefixtures("spark")
@settings(max_examples=int(os.environ.get("SLIMSEARCH_FUZZ_EXAMPLES", "4")),
          deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(case=merge_cases())
def test_fuzz_merge_matches_monolithic(spark, case):
    shard_a, shard_b, qs = case
    merged = SparkSearchIndex.merge(
        [_build(spark, shard_a), _build(spark, shard_b)])
    mono = _build(spark, shard_a + shard_b)
    for q, opts in qs:
        assert_score_maps_equal(
            _by_ext_id(merged, q, opts), _by_ext_id(mono, q, opts),
            f"merge q={q!r} opts={opts}")
