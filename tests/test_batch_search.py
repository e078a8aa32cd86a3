"""search_many_df: one Spark job scoring N queries, score-identical to
per-query search_df (which is itself gated against the reference golden
sets) — the query-throughput path a distributed deployment actually
serves a query stream with."""

import pytest

from pyspark.sql import functions as F

from slimsearch_spark.config import IndexConfig
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.sources.corpus import synth_corpus

CFG = IndexConfig(fields=["content"], id_field="path",
                  store_fields=["repo"])

QUERIES = ["the parse", "varint delta merge", "spark shuffle",
           "nosuchterm whatsoever", "tokenizer"]


@pytest.fixture(scope="module")
def idx(spark):
    docs = synth_corpus(spark, 150, tokens_per_file=40)
    return SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])


def _batch(idx, queries, k=None, **opts):
    out = {}
    for r in idx.search_many_df(queries, top_k=k, **opts).collect():
        out.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9)))
    return out


def _single(idx, queries, k=None, **opts):
    out = {}
    for qi, q in enumerate(queries):
        rows = [(r["doc_id"], round(r["score"], 9)) for r in
                idx.search_df(q, top_k=k, **opts)
                .select("doc_id", "score").collect()]
        if rows:
            out[qi] = rows
    return out


def test_batch_or_topk_equals_per_query(idx):
    """OR batch: every query's top-k rows and scores equal its own
    search_df plan; a no-match query contributes no rows."""
    assert _batch(idx, QUERIES, k=10) == _single(idx, QUERIES, k=10)


def test_batch_full_results_and_combinators(idx):
    for opts in ({"combineWith": "and"}, {"combineWith": "and_not"}):
        qs = ["the merge", "parse the token"]
        assert _batch(idx, qs, k=15, **opts) == \
            _single(idx, qs, k=15, **opts), opts


def test_batch_prefix_fuzzy_and_boost(idx):
    qs = ["pars", "tok"]
    opts = {"prefix": True, "fuzzy": 0.2}
    assert _batch(idx, qs, k=8, **opts) == _single(idx, qs, k=8, **opts)
    # per-branch weights/term boosts thread through the batched expansion
    qs2 = ["the merge"]
    bopts = {"boostTerm": lambda t, i, terms: 2.0 if t == "merge" else 1.0}
    assert _batch(idx, qs2, k=8, **bopts) == _single(idx, qs2, k=8, **bopts)


def test_batch_shared_derived_term_df_isolation(idx):
    """The same derived term in two queries must compute its own df per
    query (window keyed by query_id) — identical queries in one batch
    return identical results."""
    b = _batch(idx, ["the parse", "the parse"], k=5)
    assert b[0] == b[1] and b[0]


def test_batch_respects_tombstones(spark, idx):
    docs = synth_corpus(spark, 80, tokens_per_file=30)
    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo"], auto_vacuum=False)
    i2 = SparkSearchIndex.build(docs, cfg, order_cols=["repo", "path"])
    victims = [r["path"] for r in
               docs.select("path").orderBy("path").limit(4).collect()]
    i2.discard_many(victims)
    qs = ["the parse", "varint merge"]
    assert _batch(i2, qs, k=10) == _single(i2, qs, k=10)


def test_batch_wide_expansion_df_path(idx):
    """expansionCollectThreshold=0 forces every query's expansion onto
    the DataFrame (no-driver-materialization) path; the batched union of
    per-query expansion DFs must still match per-query search_df."""
    qs = ["pars", "tok"]
    opts = {"prefix": True, "expansionCollectThreshold": 0}
    assert _batch(idx, qs, k=8, **opts) == _single(idx, qs, k=8, **opts)


def test_batch_guards(idx):
    with pytest.raises(ValueError, match="filter"):
        idx.search_many_df(["the"], filter=F.lit(True))
    with pytest.raises(ValueError, match="boostDocument"):
        idx.search_many_df(["the"], boostDocument=F.lit(1.0))
    with pytest.raises(ValueError, match="combination"):
        idx.search_many_df(["the"], combineWith="XOR")


def test_wand_many_concurrent_equals_sequential(idx):
    """search_topk_wand_many: thread-pooled pruned serving returns exactly
    the per-query WAND (== exact) results."""
    qs = ["the parse", "varint delta merge", "spark shuffle", "tokenizer"]
    got = {}
    for r in idx.search_topk_wand_many(qs, 8, max_concurrency=3,
                                       adaptive_min_docs=0).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9)))
    for qi, q in enumerate(qs):
        want = [(r["doc_id"], round(r["score"], 9)) for r in
                idx.search_df(q, top_k=8)
                .select("doc_id", "score").collect()]
        assert got.get(qi, []) == want, q


def test_batch_single_plan_one_job(idx):
    """The whole batch is ONE DataFrame whose plan contains a single
    postings-join subtree — materializing it is one job regardless of
    batch size (the point of the API)."""
    df = idx.search_many_df(QUERIES, top_k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the expansion join appears once, broadcast
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
