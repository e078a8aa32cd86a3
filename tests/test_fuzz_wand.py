"""Property-based fuzz: WAND pruned top-k vs the exact full-sort plan.

test_fuzz_parity.py fuzzes the engine against the reference-semantics
oracle on the UNpruned path; this file fuzzes the other contract the
north rule cares about — ``search_topk_wand`` (block-max WAND over the
compacted layout, plans/wand.py) must return the SAME top-k docs and
scores as ``search_df(top_k=k)`` for every supported option combination,
including after maintenance (segment appends from ``add_all``, tombstones
from ``discard``). All prior WAND equivalence tests pin fixed corpora;
random corpora with duplicate docs, shared prefixes and missing fields
reach codec/kernel corners (1-doc blocks, empty expansion branches,
all-tombstoned cells, boundary score ties) the fixtures never do.

The comparison is tie-robust at the k boundary: both paths document
(score desc, doc_id asc) order, but the exact plan computes scores in
Spark SQL float64 while the kernels fold them in numpy — bit-identical
in every observed case, yet asserting raw list equality would make the
fuzz flaky-by-construction if an off-boundary tie ever differs at 1e-15.
So: scores must match per-doc at rel 1e-9, the output must be
score-descending and duplicate-free, docs strictly above the k-th score
tie-group are mandatory, and docs inside the boundary tie-group are the
only substitutes allowed.

Layout is pinned tiny (block_doc_range=4) so even 10-doc corpora span
multiple blocks/cells — otherwise everything lands in one block and the
routing/skip machinery is never exercised.
"""

import math
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from slimsearch_spark.config import IndexConfig, IndexLayout
from slimsearch_spark.engine import SparkSearchIndex

# same closed vocabulary as test_fuzz_parity: guaranteed term collisions,
# shared prefixes for prefix=True, edit-distance-1 neighbors for fuzzy
VOCAB = ["a", "ab", "abc", "abd", "b", "ba", "spark", "spa", "sparse",
         "don't", "x1", "x2"]

texts = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=8).map(" ".join)

LAYOUT = IndexLayout(block_doc_range=4)

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
def wand_options(draw):
    opts = {"combineWith": draw(st.sampled_from(["OR", "AND", "AND_NOT"]))}
    fuzzy = draw(st.sampled_from([False, 1, 0.3]))
    if fuzzy:
        opts["fuzzy"] = fuzzy
    if draw(st.booleans()):
        opts["prefix"] = True
    if draw(st.booleans()):
        opts["boost"] = {"title": 2}
    if draw(st.booleans()):
        opts["bm25"] = {"k": 1.5, "b": 0.55, "d": 0.4}
    return opts


queries_st = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3) \
    .map(" ".join)


@st.composite
def wand_cases(draw):
    docs = draw(docs_strategy())
    qs = draw(st.lists(st.tuples(queries_st, wand_options(),
                                 st.sampled_from([1, 3, 10])),
                       min_size=2, max_size=3))
    return docs, qs


@st.composite
def wand_maintenance_cases(draw):
    base = draw(docs_strategy(min_n=2, max_n=6))
    extra = draw(docs_strategy(min_n=1, max_n=4, id_start=len(base)))
    ids = list(range(len(base) + len(extra)))
    discard_ids = sorted(draw(st.sets(st.sampled_from(ids),
                                      max_size=len(ids) - 1)))
    qs = draw(st.lists(st.tuples(queries_st, wand_options(),
                                 st.sampled_from([1, 3, 10])),
                       min_size=1, max_size=2))
    return base, extra, discard_ids, qs


def _df(spark, docs):
    return spark.createDataFrame(
        [(d["id"], d["title"], d["text"], i) for i, d in enumerate(docs)],
        SCHEMA)


def _build(spark, docs):
    return SparkSearchIndex.build(
        _df(spark, docs),
        IndexConfig(fields=["title", "text"], store_fields=[]),
        order_cols=["_ord"])


def assert_wand_matches_exact(sidx, q, opts, k, ctx):
    exact = {r["doc_id"]: r["score"] for r in
             sidx.search_df(q, **opts).select("doc_id", "score").collect()}
    got = [(r["doc_id"], r["score"]) for r in
           sidx.search_topk_wand(q, k, adaptive_min_docs=0, layout=LAYOUT,
                                 **opts).collect()]
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True), \
        f"{ctx}: wand output not score-descending: {got}"
    assert len(got) == min(k, len(exact)), \
        f"{ctx}: expected {min(k, len(exact))} rows, got {len(got)}"
    seen = set()
    for d, s in got:
        assert d not in seen, f"{ctx}: duplicate doc {d}"
        seen.add(d)
        assert d in exact, f"{ctx}: doc {d} not in exact result set"
        assert math.isclose(s, exact[d], rel_tol=1e-9), \
            f"{ctx}: score mismatch doc {d}: wand {s} != exact {exact[d]}"
    if got:
        ordered = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))
        kth = ordered[len(got) - 1][1]
        mandatory = {d for d, s in ordered
                     if s > kth and not math.isclose(s, kth, rel_tol=1e-9)}
        allowed = {d for d, s in ordered
                   if s > kth or math.isclose(s, kth, rel_tol=1e-9)}
        assert mandatory <= seen, \
            f"{ctx}: wand dropped above-boundary docs {mandatory - seen}"
        assert seen <= allowed, \
            f"{ctx}: wand returned sub-boundary docs {seen - allowed}"


@pytest.mark.usefixtures("spark")
@settings(max_examples=int(os.environ.get("SLIMSEARCH_FUZZ_EXAMPLES", "5")),
          deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(case=wand_cases())
def test_fuzz_wand_vs_exact(spark, case):
    docs, qs = case
    sidx = _build(spark, docs)
    for q, opts, k in qs:
        assert_wand_matches_exact(sidx, q, opts, k,
                                  f"query={q!r} opts={opts} k={k}")


@pytest.mark.usefixtures("spark")
@settings(max_examples=int(os.environ.get("SLIMSEARCH_FUZZ_EXAMPLES", "4")),
          deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(case=wand_maintenance_cases())
def test_fuzz_wand_after_segment_and_discard(spark, case):
    """WAND over the index a real serving node holds: base compaction +
    an appended add_all segment + a tombstoned discard subset — the exact
    plan stays the oracle through every step."""
    base, extra, discard_ids, qs = case
    sidx = _build(spark, base)
    sidx.posting_lists(LAYOUT).count()  # compact the base now
    sidx.add_all(_df(spark, extra), order_cols=["_ord"])  # appends segment
    for i in discard_ids:
        sidx.discard(i)
    for q, opts, k in qs:
        assert_wand_matches_exact(
            sidx, q, opts, k,
            f"segmented discard={discard_ids} query={q!r} opts={opts} k={k}")
