"""Block-max WAND top-k (plans/wand.py): blocked codec addressing, physical
block skip, and rank/score identity with the unpruned full-sort plan.

The reference has no top-k (src/search.ts returns all matches); WAND is the
north-rule scale path, so its oracle is our own exact plan (plans/scoring.py),
which is itself oracle-gated against the golden ranking sets.
"""

import numpy as np
import pytest

from pyspark.sql import functions as F

from slimsearch_spark.config import IndexConfig, IndexLayout
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.functions.codec import (decode_block_meta,
                                              decode_blocked_posting_list,
                                              decode_blocks,
                                              encode_blocked_posting_list)
from slimsearch_spark.sources.corpus import synth_corpus
from slimsearch_spark.sources.index_store import load_index, save_index

CFG = IndexConfig(fields=["content"], id_field="path", store_fields=["repo"])


# --------------------------------------------------------------- codec unit

def test_blocked_codec_roundtrip_and_slicing():
    rng = np.random.default_rng(7)
    for _ in range(50):
        docs = np.unique(rng.integers(0, 100_000,
                                      int(rng.integers(1, 1500))).astype(np.uint64))
        n = docs.size
        tfs = rng.integers(1, 300, n).astype(np.uint64)
        fls = rng.integers(1, 5000, n).astype(np.uint64)
        br = int(rng.choice([64, 512, 4096]))
        enc = encode_blocked_posting_list(docs, tfs, fls, br)
        d, t, f = decode_blocked_posting_list(enc)
        assert np.array_equal(d, docs)
        assert np.array_equal(t, tfs)
        assert np.array_equal(f, fls)

        g, bn, d_off, t_off, f_off, bmax = decode_block_meta(enc)
        assert int(bn.sum()) == n
        grid = docs // br
        # block-max metadata is exact per grid cell
        for i, gv in enumerate(g):
            assert bmax[i] == tfs[grid == gv].max()
        # physical block skip: decoding a subset slices byte ranges only
        which = np.sort(rng.choice(g.size, size=max(1, g.size // 3),
                                   replace=False)).astype(np.int64)
        d2, t2, f2 = decode_blocks(enc["doc_blob"], enc["tf_blob"],
                                   enc["fl_blob"], d_off, t_off, f_off,
                                   bn, which)
        mask = np.isin(grid, g[which])
        assert np.array_equal(d2, docs[mask])
        assert np.array_equal(t2, tfs[mask])
        assert np.array_equal(f2, fls[mask])


def test_blocked_codec_empty():
    z = np.empty(0, np.uint64)
    enc = encode_blocked_posting_list(z, z.copy(), z.copy(), 512)
    assert enc["n"] == 0 and enc["n_blocks"] == 0
    d, t, f = decode_blocked_posting_list(enc)
    assert d.size == 0 and t.size == 0 and f.size == 0


def test_blocks_never_straddle_grid():
    """Doc-grid alignment: every block's docs share one grid cell — the
    invariant that lets the WAND router shard by byte-slicing."""
    rng = np.random.default_rng(3)
    docs = np.unique(rng.integers(0, 50_000, 5000).astype(np.uint64))
    tfs = np.ones(docs.size, dtype=np.uint64)
    fls = np.ones(docs.size, dtype=np.uint64)
    enc = encode_blocked_posting_list(docs, tfs, fls, 256)
    g, bn, d_off, t_off, f_off, _ = decode_block_meta(enc)
    for i in range(g.size):
        d, _, _ = decode_blocks(enc["doc_blob"], enc["tf_blob"],
                                enc["fl_blob"], d_off, t_off, f_off, bn,
                                np.array([i], dtype=np.int64))
        assert np.all(d // 256 == g[i])


# ------------------------------------------------------------- spark parity

@pytest.fixture(scope="module")
def index(spark):
    docs = synth_corpus(spark, 1500, tokens_per_file=100).cache()
    return SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])


def _full_topk(index, query, k, **opts):
    return [(r["doc_id"], round(r["score"], 9)) for r in
            index.search_df(query, top_k=k, **opts)
            .select("doc_id", "score").collect()]


def _wand_topk(index, query, k, **kw):
    # adaptive_min_docs=0: these tests exercise the real pruned path at
    # sizes where the production default would (correctly) skip to the
    # exact plan — the skip itself is covered by test_wand_adaptive_skip.
    # theta0_min_docs=0 likewise pins the OR global-θ pre-pass on (the
    # round-6 production default skips it below 100k docs; θ0=0 is
    # result-identical, but these tests must cover the seeded path).
    kw.setdefault("adaptive_min_docs", 0)
    kw.setdefault("theta0_min_docs", 0)
    return [(r["doc_id"], round(r["score"], 9)) for r in
            index.search_topk_wand(query, k, **kw).collect()]


def test_wand_adaptive_skip(index):
    """Below the measured crossover the default delegates to the exact
    single-plan top-k — result-identical, no compaction stage run."""
    got = [(r["doc_id"], round(r["score"], 9)) for r in
           index.search_topk_wand("varint delta merge", 10).collect()]
    assert got == _full_topk(index, "varint delta merge", 10)
    forced = _wand_topk(index, "varint delta merge", 10)
    assert got == forced


def test_wand_theta0_skip_result_identical(index):
    """Round 6: below theta0_min_docs the OR path skips the global-θ
    pre-pass ACTION (θ0 stays 0 — strictly less pruning, never different
    results). The skipped and the seeded plan must return the identical
    top-k, and both must equal the exact plan."""
    q = "varint delta merge"
    skipped = [(r["doc_id"], round(r["score"], 9)) for r in
               index.search_topk_wand(q, 10, adaptive_min_docs=0,
                                      theta0_min_docs=10**9).collect()]
    seeded = [(r["doc_id"], round(r["score"], 9)) for r in
              index.search_topk_wand(q, 10, adaptive_min_docs=0,
                                     theta0_min_docs=0).collect()]
    assert skipped == seeded == _full_topk(index, q, 10)


def test_wand_equals_full_sort_prefix(index):
    layout = IndexLayout(block_doc_range=128)
    for query in ["varint delta merge", "the parse", "tokenizer",
                  "spark shuffle partition skew"]:
        assert _wand_topk(index, query, 10, layout=layout) == \
            _full_topk(index, query, 10), query


def test_wand_various_k(index):
    for k in (1, 3, 25, 200):
        assert _wand_topk(index, "varint merge", k) == \
            _full_topk(index, "varint merge", k)


def test_wand_with_prefix_and_fuzzy_expansion(index):
    """WAND consumes the same expansion rows as the full plan — prefix and
    fuzzy derived terms score identically under pruning."""
    for kw in ({"prefix": True}, {"fuzzy": 1}, {"prefix": True, "fuzzy": 0.2}):
        assert _wand_topk(index, "varint merg", 10, **kw) == \
            _full_topk(index, "varint merg", 10, **kw), kw


def test_wand_wide_expansion_df_path(index):
    """Round 4: expansions past expansionCollectThreshold take the pruned
    path too — the expansion ships as a DataFrame joined against the
    compacted lists inside wand_topk (no driver materialization of the
    derived-term set, where the old contract raised). Results must equal
    both the exact plan and the broadcast-path WAND."""
    for q, kw in [("pa", {"prefix": True}),
                  ("merg", {"prefix": True, "fuzzy": 1})]:
        wide = _wand_topk(index, q, 10, expansionCollectThreshold=0, **kw)
        assert wide == _full_topk(index, q, 10, **kw), (q, kw)
        assert wide == _wand_topk(index, q, 10, **kw), (q, kw)


def test_wand_extreme_fanout_exact_fallback(index):
    """Round 5: above ``wide_fanout_exact_threshold`` derived terms the
    pruned path is provably counterproductive (theta never clears the
    per-list bounds — 0% of blocks pruned at 20k terms x 1M docs, WAND
    3.3-3.7x slower; BASELINE.md round-5 fan-out probe) and
    search_topk_wand serves the result-identical exact plan instead.
    The fallback must fire on both expansion paths (DataFrame and
    broadcast), produce identical results, and stay OFF for metrics=
    callers (pruning probes need the real WAND path)."""
    import contextlib
    import io

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("simple")
        return buf.getvalue()

    q, kw = "pa", {"prefix": True}
    want = _full_topk(index, q, 10, **kw)
    # DF-expansion path above the width threshold -> exact plan (no
    # Arrow kernel stage in the physical plan)
    fb = index.search_topk_wand(q, 10, adaptive_min_docs=0,
                                expansionCollectThreshold=0,
                                wide_fanout_exact_threshold=1, **kw)
    assert "InPandas" not in plan_of(fb)
    assert [(r["doc_id"], round(r["score"], 9))
            for r in fb.collect()] == want
    # broadcast-expansion path above the threshold falls back too
    fb2 = index.search_topk_wand(q, 10, adaptive_min_docs=0,
                                 wide_fanout_exact_threshold=1, **kw)
    assert "InPandas" not in plan_of(fb2)
    assert [(r["doc_id"], round(r["score"], 9))
            for r in fb2.collect()] == want
    # metrics= callers keep the pruned path even above the threshold
    metrics: dict = {}
    got = [(r["doc_id"], round(r["score"], 9)) for r in
           index.search_topk_wand(q, 10, adaptive_min_docs=0,
                                  expansionCollectThreshold=0,
                                  wide_fanout_exact_threshold=1,
                                  metrics=metrics, **kw).collect()]
    assert got == want
    assert metrics["blocks_decoded"].value > 0


def test_wand_single_hot_term(index):
    # stopword-like hot term: every doc matches; pruning must still keep
    # the exact top-k
    assert _wand_topk(index, "the", 10) == _full_topk(index, "the", 10)


def test_wand_no_match(index):
    assert _wand_topk(index, "zzzzqqqq", 10) == []


def test_wand_serves_tombstoned_index(spark):
    """Round 4 (round-3 VERDICT #4): a discarded, unvacuumed index stays
    servable on the WAND path — tombstoned doc_ids are dropped at block-
    decode time in the shard kernels, no compaction rewrite needed. The
    top-k must equal search_df over the same live view, before AND after
    vacuum."""
    docs = synth_corpus(spark, 50, tokens_per_file=30)
    cfg = IndexConfig(fields=["content"], id_field="path",
                      auto_vacuum=False)
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["repo", "path"])
    # force compaction BEFORE the discard: the cached lists still hold the
    # dead doc's postings, exercising the kernel-side tombstone filter
    idx.posting_lists()
    victims = [r["path"] for r in
               docs.select("path").orderBy("path").limit(3).collect()]
    idx.discard_many(victims)
    assert idx.has_tombstones()
    got = idx.search_topk_wand("the", 5, adaptive_min_docs=0).collect()
    want = idx.search_df("the", top_k=5).select("doc_id", "score").collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
        [(r["doc_id"], round(r["score"], 9)) for r in want]
    assert len(got) == 5
    idx.vacuum()
    got2 = idx.search_topk_wand("the", 5, adaptive_min_docs=0).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got2] == \
        [(r["doc_id"], round(r["score"], 9)) for r in want]


def test_wand_tombstones_and_combinator(spark):
    """AND / AND_NOT kernels also drop tombstoned docs at decode time."""
    docs = synth_corpus(spark, 60, tokens_per_file=40)
    cfg = IndexConfig(fields=["content"], id_field="path",
                      auto_vacuum=False)
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["repo", "path"])
    idx.posting_lists()
    victims = [r["path"] for r in
               docs.select("path").orderBy("path").limit(4).collect()]
    idx.discard_many(victims)
    for cw in ("and", "and_not"):
        got = idx.search_topk_wand("the import", 5, adaptive_min_docs=0,
                                   combineWith=cw).collect()
        want = (idx.search_df("the import", top_k=5, combineWith=cw)
                .select("doc_id", "score").collect())
        assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
            [(r["doc_id"], round(r["score"], 9)) for r in want], cw


def test_wand_physically_skips_blocks(spark):
    """Pruning evidence: a hot term with a few high-tf docs — blocks holding
    only tf=1 postings have upper bound < θ and are never decoded."""
    filler = [("r", f"f/{i:05d}.py", "c", "py",
               "the " + " ".join(f"junk{i}tok{j}" for j in range(30)))
              for i in range(2000)]
    special = [("r", f"s/{i}.py", "c", "py", " ".join(["the"] * 50))
               for i in range(5)]
    docs = spark.createDataFrame(filler + special,
                                 "repo string, path string, commit string, "
                                 "lang string, content string")
    idx = SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])
    metrics = {}
    got = idx.search_topk_wand("the", 5, metrics=metrics,
                               layout=IndexLayout(block_doc_range=64)).collect()
    want = (idx.search_df("the", top_k=5)
            .select("doc_id", "score").collect())
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
        [(r["doc_id"], round(r["score"], 9)) for r in want]
    total = metrics["blocks_total"].value
    decoded = metrics["blocks_decoded"].value
    assert total > 20
    # global θ0 from the top-impact block prunes every filler block: only
    # the blocks holding the tf=50 docs (plus the θ0 probe) decode
    assert decoded <= total // 4, (decoded, total)


def test_wand_impact_bound_prunes_flat_tf_corpus(spark):
    """Round 4 (round-3 VERDICT #1): the per-block float impact bound (the
    classic block-max, stored at encode time) makes θ-pruning engage on
    FLAT-tf uniform-length corpora. Every filler doc has tf=1 at the same
    field length, so a tf=1 block's impact bound EQUALS the true tf=1
    score; θ0 (seeded from the k tf=2 docs) strictly exceeds it and the
    whole filler tail is skipped without decoding. The old max_tf/fl→0
    bound inflated tf=1 blocks above θ0 (norm missing the b·fl/avg term),
    so blocks_decoded ≈ blocks_total on exactly this corpus shape
    (BASELINE.md round-3 1M probe, recorded honestly)."""
    filler = [("r", f"f/{i:05d}.py", "c", "py",
               "aa " + " ".join(f"junk{i}tok{j}" for j in range(19)))
              for i in range(2000)]
    special = [("r", f"zz/{i}.py", "c", "py",
                "aa aa " + " ".join(f"junk{i}s{j}" for j in range(18)))
               for i in range(10)]
    docs = spark.createDataFrame(filler + special,
                                 "repo string, path string, commit string, "
                                 "lang string, content string")
    idx = SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])
    metrics = {}
    got = idx.search_topk_wand("aa", 10, metrics=metrics,
                               layout=IndexLayout(block_doc_range=16)
                               ).collect()
    want = (idx.search_df("aa", top_k=10)
            .select("doc_id", "score").collect())
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
        [(r["doc_id"], round(r["score"], 9)) for r in want]
    total = metrics["blocks_total"].value
    decoded = metrics["blocks_decoded"].value
    assert total > 100, total
    assert decoded <= total // 8, (decoded, total)


def test_route_stage_dedups_shared_derived_terms(spark):
    """Round 4 (round-3 VERDICT #3): the route stage emits ONE byte slice
    per (shard, derived term, field) with the expansion entries as array
    columns — a derived term shared by two query branches must shuffle the
    SAME bytes as a single-branch query, not twice."""
    from slimsearch_spark.config import DEFAULT_BM25
    from slimsearch_spark.plans import wand as W
    docs = synth_corpus(spark, 200, tokens_per_file=40)
    idx = SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])
    lists = idx.posting_lists()
    matched = lists.where(F.col("term") == "the")
    avg = idx.avg_field_length

    def routed_bytes(exp):
        routed = matched.mapInPandas(
            W._route_stage(exp, idx.doc_count, 4, avg, {0: 1.0},
                           DEFAULT_BM25), W.SHARD_SCHEMA)
        r = routed.agg(
            F.count("*").alias("rows"),
            F.sum(F.length("doc_blob") + F.length("tf_blob")
                  + F.length("fl_blob")).alias("bytes")).collect()[0]
        return r["rows"], r["bytes"]

    one = routed_bytes({"the": [(0, "the", 1.0)]})
    two = routed_bytes({"the": [(0, "the", 1.0), (1, "thx", 0.45)]})
    assert two == one, (one, two)

    # and the shared-derived-term query still scores exactly: 'quary query'
    # with fuzzy — branch 0 (quary) derives 'query' fuzzily while branch 1
    # matches it exactly, so one slice carries entries from both branches
    got = idx.search_topk_wand("quary query", 10, fuzzy=1,
                               adaptive_min_docs=0).collect()
    want = (idx.search_df("quary query", fuzzy=1, top_k=10)
            .select("doc_id", "score").collect())
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
        [(r["doc_id"], round(r["score"], 9)) for r in want]


def test_wand_theta0_counts_distinct_docs(spark):
    """Regression (round-2 ADVICE): the θ0 pre-pass must reduce partials to
    one value per DISTINCT doc before taking the k-th largest. A few docs
    matching every query term contribute one high partial per term; pooling
    those without doc identity made θ0 the k-th *partial* (covering < k
    docs), pruning single-term docs that belong in the true top-k."""
    multi = [("r", f"m/{i}.py", "c", "py", " ".join(["aa bb cc"] * 10))
             for i in range(5)]
    singles = [("r", f"s/{i:02d}.py", "c", "py",
                "aa " + " ".join(f"junk{i}x{j}" for j in range(8)))
               for i in range(20)]
    docs = spark.createDataFrame(multi + singles,
                                 "repo string, path string, commit string, "
                                 "lang string, content string")
    idx = SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])
    layout = IndexLayout(block_doc_range=4)
    # k=10 > the 5 all-term docs: the tail of the true top-10 is single-term
    # docs whose final score is far below the pooled multi-doc partials
    assert _wand_topk(idx, "aa bb cc", 10, layout=layout) == \
        _full_topk(idx, "aa bb cc", 10)
    assert len(_wand_topk(idx, "aa bb cc", 10, layout=layout)) == 10


def test_wand_bound_survives_float_reassociation(spark):
    """Regression (round-4 hypothesis find): the stored block-impact bound
    and the exact scorer compute the same product in different association
    order, so the raw bound could round a ULP BELOW the exact partial that
    seeds θ — with k=1 and one single-posting block per shard, every shard
    pruned its only candidate and the top-1 came back EMPTY. The corpus
    pins the falsifying example: 'a' lives in two fields of two docs that
    land in different doc-grid shards at block_doc_range=4."""
    from slimsearch_spark.engine import SparkSearchIndex as SSI
    docs = spark.createDataFrame(
        [(0, "", "ba b abd"), (1, None, "spa ba"), (2, None, ""),
         (3, "b", "sparse x1 x1 a"), (4, "x2 a", "")],
        "id long, title string, text string")
    idx = SSI.build(docs, IndexConfig(fields=["title", "text"],
                                      store_fields=[]), order_cols=["id"])
    layout = IndexLayout(block_doc_range=4)
    got = _wand_topk(idx, "a", 1, layout=layout)
    assert got == _full_topk(idx, "a", 1)
    assert len(got) == 1


def test_wand_rejects_unsupported_options(index):
    """search_topk_wand raises on unknown combinators / callable filters /
    boostDocument instead of silently mis-scoring (round-2 ADVICE; AND,
    AND_NOT and multi-field are supported since round 3; Column/SQL
    filters are SERVED since round 4 — tests/test_segments.py)."""
    with pytest.raises(ValueError, match="combineWith"):
        index.search_topk_wand("the", 5, combineWith="XOR")
    with pytest.raises(ValueError, match="filter"):
        index.search_topk_wand("the", 5, filter=lambda fields: True)
    with pytest.raises(ValueError, match="boostDocument"):
        index.search_topk_wand("the", 5, boostDocument=lambda *a: 1.0)


# ------------------------------------------------------- AND + multi-field

def test_wand_and_equals_full_sort_prefix(index):
    """Conjunctive WAND == exact AND plan top-k (src/utils.ts:108-121)."""
    for query in ["varint delta", "the parse", "varint delta merge",
                  "spark shuffle partition"]:
        assert _wand_topk(index, query, 10, combineWith="AND") == \
            _full_topk(index, query, 10, combineWith="AND"), query


def test_wand_and_various_k(index):
    for k in (1, 3, 25, 200):
        assert _wand_topk(index, "varint merge", k, combineWith="AND") == \
            _full_topk(index, "varint merge", k, combineWith="AND")


def test_wand_and_with_expansion(index):
    """AND over prefix/fuzzy expansions: a branch matches when ANY derived
    term of its query term matches (expansion slices share the branch)."""
    for kw in ({"prefix": True}, {"fuzzy": 1}, {"prefix": True, "fuzzy": 0.2}):
        assert (_wand_topk(index, "varint merg", 10, combineWith="AND", **kw)
                == _full_topk(index, "varint merg", 10,
                              combineWith="AND", **kw)), kw


def test_wand_and_no_intersection(spark):
    """Disjoint posting lists → empty AND result, and the cell-level
    intersection skips every block without decoding (doc counts are
    multiples of block_doc_range so the terms share no boundary cell)."""
    a = [("r", f"a/{i:03d}.py", "c", "py", "aaa " + f"x{i}")
         for i in range(64)]
    b = [("r", f"b/{i:03d}.py", "c", "py", "bbb " + f"y{i}")
         for i in range(64)]
    docs = spark.createDataFrame(a + b,
                                 "repo string, path string, commit string, "
                                 "lang string, content string")
    idx = SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])
    metrics = {}
    got = idx.search_topk_wand("aaa bbb", 5, combineWith="AND",
                               metrics=metrics,
                               layout=IndexLayout(block_doc_range=8)).collect()
    assert got == []
    assert metrics["blocks_total"].value > 0
    assert metrics["blocks_decoded"].value == 0


def test_wand_and_physically_skips_blocks(spark):
    """AND pruning evidence: one rare term intersected with a hot term —
    hot-term blocks in cells the rare term doesn't cover never decode."""
    filler = [("r", f"f/{i:05d}.py", "c", "py",
               "the " + " ".join(f"junk{i}tok{j}" for j in range(30)))
              for i in range(2000)]
    special = [("r", f"s/{i}.py", "c", "py", "the rareterm " + "the " * 20)
               for i in range(5)]
    docs = spark.createDataFrame(filler + special,
                                 "repo string, path string, commit string, "
                                 "lang string, content string")
    idx = SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])
    metrics = {}
    got = idx.search_topk_wand("the rareterm", 5, combineWith="AND",
                               metrics=metrics,
                               layout=IndexLayout(block_doc_range=64)).collect()
    want = (idx.search_df("the rareterm", top_k=5, combineWith="AND")
            .select("doc_id", "score").collect())
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
        [(r["doc_id"], round(r["score"], 9)) for r in want]
    total = metrics["blocks_total"].value
    decoded = metrics["blocks_decoded"].value
    assert total > 20
    # only cells containing rareterm docs survive the intersection
    assert decoded <= total // 4, (decoded, total)


def test_wand_and_not_equals_full(index):
    """AND_NOT WAND == exact plan: first term's docs minus the rest
    (src/utils.ts:129-133), first-branch scores, quality 1."""
    for query in ["varint delta", "the parse", "varint delta merge",
                  "varint"]:  # single term: nothing to subtract
        assert _wand_topk(index, query, 10, combineWith="AND_NOT") == \
            _full_topk(index, query, 10, combineWith="AND_NOT"), query


def test_wand_and_not_with_expansion(index):
    """Negative branches exclude via ALL their derived (prefix/fuzzy)
    terms, same as the exact anti-join."""
    for kw in ({"prefix": True}, {"fuzzy": 1}):
        assert (_wand_topk(index, "varint merg", 10,
                           combineWith="AND_NOT", **kw)
                == _full_topk(index, "varint merg", 10,
                              combineWith="AND_NOT", **kw)), kw


def test_wand_and_not_various_k(index):
    for k in (1, 3, 25, 200):
        assert _wand_topk(index, "the varint", k, combineWith="AND_NOT") \
            == _full_topk(index, "the varint", k, combineWith="AND_NOT")


@pytest.fixture(scope="module")
def index_mf(spark):
    docs = synth_corpus(spark, 800, tokens_per_file=60).cache()
    cfg = IndexConfig(fields=["content", "lang"], id_field="path")
    return SparkSearchIndex.build(docs, cfg, order_cols=["repo", "path"])


def test_wand_multifield_equals_full(index_mf):
    """Multi-field WAND: per-(term, field) df/idf, per-field avg length and
    boost (src/results.ts:170-189) — identical to the exact plan."""
    for kw in ({}, {"boost": {"lang": 3.0}},
               {"fields": ["content"]}, {"combineWith": "AND"}):
        assert _wand_topk(index_mf, "the py", 10, **kw) == \
            _full_topk(index_mf, "the py", 10, **kw), kw


def test_wand_multifield_single_field_subset(index_mf):
    """Explicit single-field subset on a multi-field index still works."""
    got = index_mf.search_topk_wand("the", 5, fields=["content"],
                                    adaptive_min_docs=0).collect()
    want = (index_mf.search_df("the", top_k=5, fields=["content"])
            .select("doc_id", "score").collect())
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
        [(r["doc_id"], round(r["score"], 9)) for r in want]


def test_wand_cache_invalidated_on_mutation(spark):
    """Regression: a WAND query before discard+vacuum must not serve stale
    compacted lists afterwards — df/idf must reflect the removed docs."""
    docs = synth_corpus(spark, 80, tokens_per_file=40)
    idx = SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])
    _ = idx.search_topk_wand("the parse", 5).collect()  # warm the cache
    victims = [r["path"] for r in
               docs.select("path").orderBy("path").limit(8).collect()]
    idx.discard_many(victims)
    idx.vacuum()
    assert _wand_topk(idx, "the parse", 5) == _full_topk(idx, "the parse", 5)


def test_wand_over_saved_index(spark, index, tmp_path):
    """Save → load → WAND serves from the persisted posting_lists table,
    for both combinators (round 3: AND shares the saved layout)."""
    path = str(tmp_path / "widx")
    save_index(index, path)
    loaded = load_index(spark, path)
    assert loaded._posting_lists is not None
    assert _wand_topk(loaded, "varint delta merge", 10) == \
        _full_topk(index, "varint delta merge", 10)
    assert _wand_topk(loaded, "varint delta merge", 10,
                      combineWith="AND") == \
        _full_topk(index, "varint delta merge", 10, combineWith="AND")
