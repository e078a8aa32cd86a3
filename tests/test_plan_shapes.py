"""Physical-plan regressions (PLANS.md): the shapes that make the engine
scale must survive refactors — broadcast joins on the query side, a single
scoring subtree, top-k via TakeOrderedAndProject, pushdown/pruning at scans.
"""

import io
import contextlib

import pytest

from pyspark.sql import functions as F

from slimsearch_spark.config import IndexConfig
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.sources.corpus import synth_corpus

CFG = IndexConfig(fields=["content"], id_field="path", store_fields=["repo"])


def plan_of(df, mode="simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def index(spark):
    docs = synth_corpus(spark, 200, tokens_per_file=40).cache()
    return SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])


def test_topk_uses_take_ordered(index):
    p = plan_of(index.search_df("varint merge", top_k=10))
    assert "TakeOrderedAndProject" in p


def test_no_sort_merge_join_in_search(index):
    p = plan_of(index.search_df("varint merge delta", top_k=10))
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_single_scoring_subtree(index):
    """ONE expansion join per string query — the per-branch filter+union
    regression would show N copies of the postings⋈expansion subtree.
    Round 6 also removed the df window (`count(1) over (branch,
    derived_term, field_id)`) in favor of a broadcast (term, field_id,
    df) dictionary probe: its reappearance would mean every matched
    posting row is being shuffled+sorted by the window key again."""
    p = plan_of(index.search_df("varint merge delta", top_k=10))
    njoin = sum(1 for ln in p.splitlines()
                if "Join" in ln and "derived_term#" in ln)
    assert njoin == 1                        # one expansion join
    assert p.count("Window [count(1)") == 0  # df window stays gone


def test_wide_expansion_no_single_partition_exchange(index):
    """The DF (no-collect) expansion path must not funnel the matched
    dictionary slice through one task: rank is an order surrogate (the
    class), not a global row_number window (round-2 VERDICT fix). A
    regression would show `Exchange SinglePartition` + `Window [row_number`
    in the plan."""
    p = plan_of(index.search_df("pa", prefix=True, fuzzy=1,
                                expansionCollectThreshold=0, top_k=10))
    # (assign_doc_ids' __pid-partitioned row_number in the cached build
    # lineage is fine — only an unpartitioned window forces a single task,
    # and any unpartitioned window plans as Exchange SinglePartition)
    assert "Exchange SinglePartition" not in p, p


def test_postings_build_single_shuffle(spark, index):
    from slimsearch_spark.operators.build import build_postings, tokenize_fields
    docs = synth_corpus(spark, 50, tokens_per_file=30)
    p = plan_of(build_postings(tokenize_fields(
        docs.withColumn("doc_id", F.xxhash64("path")), CFG)))
    # partial + final hash agg around exactly one exchange
    assert p.count("Exchange hashpartitioning") == 1
    assert "partial_count" in p


def test_loaded_index_partition_pruning(spark, index, tmp_path):
    """A saved index's postings are bucket-partitioned by xxhash64(term);
    queries must prune to the buckets of their derived terms — and still
    return identical results."""
    from slimsearch_spark.sources.index_store import load_index, save_index
    import re
    path = str(tmp_path / "pidx")
    save_index(index, path)
    # cache=False = the 100 TB serving mode: the bucket predicate must reach
    # the parquet scan as a PartitionFilter (directory-level pruning)
    uncached = load_index(spark, path, cache=False)
    p = plan_of(uncached.search_df("varint merge", top_k=5), "formatted")
    assert re.search(r"PartitionFilters: \[.*bucket#\d+ IN \(", p), p[-2000:]
    # cached mode still applies the bucket filter on the in-memory relation
    loaded = load_index(spark, path)
    p2 = plan_of(loaded.search_df("varint merge", top_k=5), "formatted")
    assert re.search(r"bucket#\d+ IN \(", p2)
    a = [(r["doc_id"], round(r["score"], 9)) for r in
         loaded.search_df("varint merge", top_k=5)
         .select("doc_id", "score").collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in
         index.search_df("varint merge", top_k=5)
         .select("doc_id", "score").collect()]
    assert a == b


def test_docs_point_lookup_partition_pruning(spark, index, tmp_path):
    """Round 4 (round-3 VERDICT #5): the saved docs row-store is
    partitioned by doc_bucket = pmod(xxhash64(id), n_doc_buckets); point
    maintenance lookups (has / get_stored_fields / discard) must prune to
    the ids' buckets at the parquet scan instead of scanning the table."""
    from slimsearch_spark.sources.index_store import load_index, save_index
    import re
    path = str(tmp_path / "didx")
    save_index(index, path)
    uncached = load_index(spark, path, cache=False)
    some_id = index.docs.orderBy("doc_id").first()[index.config.id_field]
    p = plan_of(uncached._point_docs([some_id]), "formatted")
    # single-id lookups fold isin → equality; either way it must be a
    # PartitionFilter (directory pruning), not a post-scan Filter
    assert re.search(r"PartitionFilters: \[.*doc_bucket#\d+ (IN \(|= )", p), \
        p[-2000:]
    # semantics unchanged by the pruning
    assert uncached.has(some_id)
    assert not uncached.has("no/such/path.py")
    assert uncached.get_stored_fields(some_id) == \
        index.get_stored_fields(some_id)
    # stored-field parity output never leaks the physical bucket column
    assert "doc_bucket" not in (uncached.get_stored_fields(some_id) or {})
    hits = uncached.search_df("the", top_k=3).collect()
    assert "doc_bucket" not in hits[0].asDict()


def test_ivf_saved_partition_pruning(spark, tmp_path):
    """save_ivf_index persists the IVF cell as a partition column; the
    probe must prune at the parquet scan (PartitionFilters) and return the
    same top-k as the live assignment plan (round-2 VERDICT #6)."""
    import re
    from slimsearch_spark.operators import similarity as sim
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    seeds = sim.seed_centroids(emb, 16)
    path = str(tmp_path / "ivf")
    sim.save_ivf_index(emb, path, seeds)
    saved = sim.ivf_topk_saved(spark, path, q, k=10, centroids=seeds,
                               n_probe=2, exclude_id=0)
    p = plan_of(saved, "formatted")
    assert re.search(r"PartitionFilters: \[.*cell#\d+ IN \(", p), p[-2000:]
    live = sim.ivf_topk(emb, q, k=10, centroids=seeds, n_probe=2,
                        exclude_id=0)
    assert [(r["vec_id"], r["cosine"]) for r in saved.collect()] == \
        [(r["vec_id"], r["cosine"]) for r in live.collect()]


def test_scan_pushdown_and_pruning(spark, tmp_path):
    path = str(tmp_path / "scan")
    synth_corpus(spark, 50, tokens_per_file=10).write.parquet(path)
    df = (spark.read.parquet(path)
          .where(F.col("lang") == "python").select("path", "lang"))
    p = plan_of(df, "formatted")
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,python)]" in p
    assert "ReadSchema: struct<path:string,lang:string>" in p
