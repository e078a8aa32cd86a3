"""Property-based fuzz: batched query serving vs per-query plans.

``search_many_df`` fuses N flat string queries into ONE exact plan
(plans/batch.py) and documents scores identical to running ``search_df``
per query; ``search_topk_wand_many`` overlaps per-query WAND jobs from a
thread pool and documents results exactly per-query ``search_topk_wand``.
Both are serving-path amortizations — if either drifts from the
single-query plan under any option combination, a query stream silently
gets different results than the gated per-query entries. Random corpora
with duplicate docs, shared prefixes, missing fields, and query batches
that mix empty-result and no-term queries reach corners the fixed
fixtures never do (the per-(query, branch) df window, the AND
branch-count map, thread-pool state sharing).

Comparison is tie-robust at the k boundary, like test_fuzz_wand: per-doc
scores must match at rel 1e-9 (the fused aggregation may sum partials in
a different order than the per-query plan), docs strictly above the k-th
score tie-group are mandatory, boundary-tie substitutions are the only
slack allowed.
"""

import math
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_fuzz_wand import (LAYOUT, _build, docs_strategy, queries_st,
                                  wand_options)


@st.composite
def batch_cases(draw):
    docs = draw(docs_strategy())
    qs = draw(st.lists(queries_st, min_size=2, max_size=4))
    opts = draw(wand_options())  # one option set — the batch contract
    k = draw(st.sampled_from([1, 3, 10]))
    return docs, qs, opts, k


def _by_query(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(
            (int(r["doc_id"]), float(r["score"])))
    return out


def assert_topk_matches_exact(exact, got, k, ctx):
    """``got``: [(doc_id, score)] claimed top-k; ``exact``: doc_id→score
    full result of the per-query exact plan. Same tie-robust contract as
    test_fuzz_wand.assert_wand_matches_exact."""
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True), \
        f"{ctx}: not score-descending: {got}"
    assert len(got) == min(k, len(exact)), \
        f"{ctx}: expected {min(k, len(exact))} rows, got {len(got)}"
    seen = set()
    for d, s in got:
        assert d not in seen, f"{ctx}: duplicate doc {d}"
        seen.add(d)
        assert d in exact, f"{ctx}: doc {d} not in exact result set"
        assert math.isclose(s, exact[d], rel_tol=1e-9), \
            f"{ctx}: score mismatch doc {d}: batch {s} != exact {exact[d]}"
    if got:
        ordered = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))
        kth = ordered[len(got) - 1][1]
        mandatory = {d for d, s in ordered
                     if s > kth and not math.isclose(s, kth, rel_tol=1e-9)}
        allowed = {d for d, s in ordered
                   if s > kth or math.isclose(s, kth, rel_tol=1e-9)}
        assert mandatory <= seen, \
            f"{ctx}: dropped above-boundary docs {mandatory - seen}"
        assert seen <= allowed, \
            f"{ctx}: returned sub-boundary docs {seen - allowed}"


def _exact(sidx, q, opts):
    return {int(r["doc_id"]): float(r["score"]) for r in
            sidx.search_df(q, **opts).select("doc_id", "score").collect()}


@pytest.mark.usefixtures("spark")
@settings(max_examples=int(os.environ.get("SLIMSEARCH_FUZZ_EXAMPLES", "5")),
          deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(case=batch_cases())
def test_fuzz_search_many_df_vs_per_query(spark, case):
    docs, qs, opts, k = case
    sidx = _build(spark, docs)
    by_q = _by_query(sidx.search_many_df(qs, top_k=k, **opts).collect())
    for qi, q in enumerate(qs):
        exact = _exact(sidx, q, opts)
        got = by_q.get(qi, [])
        assert_topk_matches_exact(
            exact, got, k, f"search_many_df qi={qi} query={q!r} "
            f"opts={opts} k={k}")


@pytest.mark.usefixtures("spark")
@settings(max_examples=int(os.environ.get("SLIMSEARCH_FUZZ_EXAMPLES", "4")),
          deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(case=batch_cases())
def test_fuzz_wand_many_vs_exact(spark, case):
    """The thread-pooled WAND batch must equal the exact plan per query —
    including with a non-default layout (the pool must materialize the
    REQUESTED layout before the threads start, not the default one)."""
    docs, qs, opts, k = case
    sidx = _build(spark, docs)
    by_q = _by_query(
        sidx.search_topk_wand_many(qs, k, max_concurrency=3,
                                   adaptive_min_docs=0, layout=LAYOUT,
                                   **opts).collect())
    for qi, q in enumerate(qs):
        exact = _exact(sidx, q, opts)
        got = by_q.get(qi, [])
        assert_topk_matches_exact(
            exact, got, k, f"wand_many qi={qi} query={q!r} "
            f"opts={opts} k={k}")
