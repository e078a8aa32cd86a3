"""Query-side scoring plans.

The reference's per-term scoring kernel (src/results.ts:84-286) becomes one
declarative plan per string query:

    broadcast(expansion) ⋈ live postings ⋈ doc_stats
        → BM25+ column math (whole-stage codegen)
        → groupBy(branch, doc_id)                 # per-term RawResult
        → combinator (union-agg / anti-join)      # OR / AND / AND_NOT
        → × quality → top-k

The expansion table (a handful of rows per query term) is always broadcast;
document frequency is computed over the matched, tombstone-filtered postings
with a window — reproducing the reference's lazy delete-on-search df
semantics (src/results.ts:109-114, parity note M7) without mutating state.
"""

from __future__ import annotations

import math
from typing import Dict, List, Mapping, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

RESULT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("qterms", T.ArrayType(T.StringType())),
    T.StructField("match", T.ArrayType(T.StructType([
        T.StructField("branch", T.IntegerType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("field_id", T.IntegerType()),
    ]))),
])

EXPANSION_SCHEMA = T.StructType([
    T.StructField("branch", T.IntegerType()),
    T.StructField("query_term", T.StringType()),
    T.StructField("derived_term", T.StringType()),
    T.StructField("rank", T.IntegerType()),
    T.StructField("weight", T.DoubleType()),
    T.StructField("term_boost", T.DoubleType()),
])


def empty_result(spark) -> DataFrame:
    return spark.createDataFrame([], RESULT_SCHEMA)


def bm25_col(tf, df, n_docs: int, field_len, avg_len, bm25: Mapping[str, float]):
    """BM25+ as pure column arithmetic (reference src/utils.ts:137-152)."""
    k = float(bm25["k"])
    b = float(bm25["b"])
    d = float(bm25["d"])
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - df + 0.5) / (df + 0.5))
    norm = tf + k * (1.0 - b + b * field_len / avg_len)
    return idf * (F.lit(d) + (tf * (k + 1.0)) / norm)


def score_expansion(spark,
                    postings: DataFrame,
                    doc_stats: DataFrame,
                    expansion_rows: List[tuple],
                    searched_field_ids: Sequence[int],
                    field_boost_by_id: Mapping[int, float],
                    avg_field_length: Mapping[int, float],
                    doc_count: int,
                    bm25: Mapping[str, float],
                    doc_boost_df: Optional[DataFrame] = None) -> DataFrame:
    """Score all branches of one string query in a single joined plan.

    ``expansion_rows``: (branch, query_term, derived_term, rank, weight,
    term_boost) rows — tiny, broadcast — OR a DataFrame in EXPANSION_SCHEMA
    shape (the scale path for wide prefix/fuzzy expansions: joined on term,
    join strategy left to AQE instead of forcing a broadcast of an
    unbounded term set). ``postings`` must already be tombstone-filtered.
    Returns one row per (branch, doc) with the per-branch RawResult fields
    (reference src/results.ts:84-168).
    ``doc_boost_df``: optional (doc_id[, derived_term], doc_boost) — rows
    with doc_boost NULL/0 are dropped (falsy ⇒ skip, src/results.ts:123-126);
    joined per derived term when the column is present (callable parity
    path), per doc otherwise (Column fast path).
    """
    m = _matched_scored(spark, postings, doc_stats, expansion_rows,
                        searched_field_ids, field_boost_by_id,
                        avg_field_length, doc_count, bm25, doc_boost_df)
    if m is None:
        return empty_result(spark)
    return (m
            .groupBy("branch", "doc_id")
            .agg(F.sum("weighted").alias("score"),
                 F.array_sort(F.collect_set(
                     F.struct(F.col("branch"), F.col("rank"),
                              F.col("derived_term").alias("term"),
                              F.col("field_id")))).alias("match"),
                 F.first("query_term").alias("qterm"))
            .select("doc_id", "score",
                    F.array("qterm").alias("qterms"), "match", "branch"))


def _matched_scored(spark,
                    postings: DataFrame,
                    doc_stats: DataFrame,
                    expansion_rows,
                    searched_field_ids: Sequence[int],
                    field_boost_by_id: Mapping[int, float],
                    avg_field_length: Mapping[int, float],
                    doc_count: int,
                    bm25: Mapping[str, float],
                    doc_boost_df: Optional[DataFrame] = None,
                    df_table: Optional[DataFrame] = None
                    ) -> Optional[DataFrame]:
    """postings ⋈ expansion ⋈ doc_stats with the per-row ``weighted`` BM25
    contribution — the shared join subtree of ``score_expansion`` and
    ``score_and_combine``. Returns None for an empty expansion.

    Document frequency (reference post-lazy-cleanup matchingFields, M7):
    on the driver-rows expansion path it comes from ``df_table`` — the
    engine's cached (term, field_id, df) dictionary probe (the inverted
    index's dictionary doing its classic job; engine._df_table) — or,
    when the caller has none (tombstoned index), from a slim map-side
    -combined aggregation over the term-pruned live postings, broadcast
    back onto the matched rows. The round-1..5 window
    (``count(*) over (partition by branch, derived_term, field_id)``)
    instead shuffled and sorted EVERY matched posting row by the window
    key before the stats join — one full extra Exchange per query
    (guide §2.3 "aggregate before you shuffle", §2.4). df values are
    identical (exact integer counts of the same live rows). The wide
    DataFrame-expansion path keeps the window: there the derived-term
    set is unbounded, a broadcast hint would be wrong, and the window
    costs one exchange either way."""
    if isinstance(expansion_rows, DataFrame):
        exp = expansion_rows
    else:
        if not expansion_rows:
            return None
        exp = F.broadcast(spark.createDataFrame(expansion_rows,
                                                EXPANSION_SCHEMA))

    base = postings.where(F.col("field_id").isin(list(searched_field_ids)))
    m = base.join(exp, base["term"] == F.col("derived_term"), "inner")

    if isinstance(expansion_rows, DataFrame):
        # wide expansion: df window partitioned by branch too — the same
        # derived term in two branches would otherwise double-count
        w = Window.partitionBy("branch", "derived_term", "field_id")
        m = m.withColumn("df", F.count("*").over(w).cast("double"))
    else:
        if df_table is None:
            derived = sorted({r[2] for r in expansion_rows})
            df_table = (base.where(F.col("term").isin(derived))
                        .groupBy("term", "field_id")
                        .agg(F.count("*").cast("double").alias("df")))
        m = m.join(F.broadcast(df_table), ["term", "field_id"], "inner")

    if "field_len" not in m.columns:
        # postings without the denormalized field_len (saved-layout loads)
        # fall back to the per-query doc_stats join; built indexes carry
        # it on the posting row (build_postings, round 6 — one join fewer
        # in every search plan)
        m = m.join(doc_stats, ["doc_id", "field_id"], "inner")

    avg_map = F.create_map(*[F.lit(x) for fid in searched_field_ids
                             for x in (fid, float(avg_field_length.get(fid, 0.0)))])
    boost_map = F.create_map(*[F.lit(x) for fid in searched_field_ids
                               for x in (fid, float(field_boost_by_id.get(fid, 1.0)))])

    raw = bm25_col(F.col("tf").cast("double"), F.col("df"), doc_count,
                   F.col("field_len").cast("double"),
                   F.element_at(avg_map, F.col("field_id")), bm25)
    weighted = (F.col("weight") * F.col("term_boost")
                * F.element_at(boost_map, F.col("field_id")) * raw)

    if doc_boost_df is not None:
        if "derived_term" in doc_boost_df.columns:
            # callable parity path: per-(doc, term) boosts, driver-built
            m = m.join(F.broadcast(doc_boost_df),
                       ["doc_id", "derived_term"], "inner")
        else:
            # Column fast path: per-doc boost table derived from the row
            # store — can be corpus-sized, so AQE picks the join strategy
            m = m.join(doc_boost_df, "doc_id", "inner")
        weighted = weighted * F.col("doc_boost")

    return m.withColumn("weighted", weighted)


def score_and_combine(spark,
                      postings: DataFrame,
                      doc_stats: DataFrame,
                      expansion_rows,
                      searched_field_ids: Sequence[int],
                      field_boost_by_id: Mapping[int, float],
                      avg_field_length: Mapping[int, float],
                      doc_count: int,
                      bm25: Mapping[str, float],
                      combine_with: str,
                      branch_ids: Sequence[int],
                      doc_boost_df: Optional[DataFrame] = None,
                      df_table: Optional[DataFrame] = None) -> DataFrame:
    """Score + combinator for ONE string query in a SINGLE aggregation.

    Produces exactly ``combine_scored(score_expansion(...), branch_ids,
    combine_with)`` — same rows, same qterms/match array ordering — but
    folds the per-(branch, doc) aggregation and the per-doc combinator
    into one groupBy(doc_id), removing a full Exchange + aggregate pass
    from every flat search plan (guide §2.4; the proven shape of
    plans/batch.py's fused combinator, which the bm25_topk_batch oracle
    entry gates against bm25_topk):

      OR      score = Σ weighted, qterms = matched query terms in branch
              order, match = sorted distinct (branch, rank, term, field)
      AND     same, kept iff count_distinct(branch) == len(branch_ids)
      AND_NOT first branch's aggregates only (other branches' rows feed
              the veto flag), dropped when any other branch matched
    """
    op = combine_with.lower()
    if op not in ("or", "and", "and_not"):
        raise ValueError(f"Invalid combination operator: {combine_with}")
    m = _matched_scored(spark, postings, doc_stats, expansion_rows,
                        searched_field_ids, field_boost_by_id,
                        avg_field_length, doc_count, bm25, doc_boost_df,
                        df_table)
    if m is None:
        return empty_result(spark)

    if op == "and_not" and len(branch_ids) > 1:
        keep = F.col("branch") == branch_ids[0]
        agg = (m.groupBy("doc_id")
               .agg(F.sum(F.when(keep, F.col("weighted"))).alias("score"),
                    F.array_sort(F.collect_set(F.when(keep, F.struct(
                        F.col("branch"), F.col("rank"),
                        F.col("derived_term").alias("term"),
                        F.col("field_id"))))).alias("match"),
                    F.first(F.when(keep, F.col("query_term")),
                            ignorenulls=True).alias("qterm"),
                    F.max((~keep).cast("int")).alias("__veto")))
        return (agg.where((F.col("__veto") == 0)
                          & F.col("score").isNotNull())
                .select("doc_id", "score",
                        F.array("qterm").alias("qterms"), "match"))

    # the AND membership count is size(collect_set(branch)) rather than
    # count_distinct: a distinct aggregate alongside other aggs plans as
    # Expand + TWO aggregation exchanges, while collect_set rides the one
    # ObjectHashAggregate the match/qterms sets already pay (round 6).
    # OR queries skip the count entirely — it was computed and discarded.
    aggs = [F.sum("weighted").alias("score"),
            F.array_sort(F.collect_set(
                F.struct(F.col("branch"), F.col("rank"),
                         F.col("derived_term").alias("term"),
                         F.col("field_id")))).alias("match"),
            F.array_distinct(F.transform(
                F.array_sort(F.collect_set(
                    F.struct(F.col("branch"), F.col("query_term")))),
                lambda s: s["query_term"])).alias("qterms")]
    if op == "and":
        aggs.append(F.size(F.collect_set("branch")).alias("__n"))
    agg = m.groupBy("doc_id").agg(*aggs)
    if op == "and":
        agg = agg.where(F.col("__n") == len(branch_ids))
    return agg.select("doc_id", "score", "qterms", "match")


def combine_scored(scored: DataFrame, branch_ids: Sequence[int],
                   combine_with: str) -> DataFrame:
    """Combine the branches of ONE string query directly from the single
    score_expansion output — semantically identical to splitting per-branch
    and running ``combine_results``, but the physical plan stays one subtree
    instead of N copies of the postings join (one per ``where(branch = i)``
    filter + union)."""
    op = combine_with.lower()
    if op not in ("or", "and", "and_not"):
        raise ValueError(f"Invalid combination operator: {combine_with}")

    if op == "and_not" and len(branch_ids) > 1:
        first = branch_ids[0]
        left = scored.where(F.col("branch") == first)
        rest = (scored.where(F.col("branch") != first)
                .select("doc_id").distinct())
        return (left.join(rest, "doc_id", "left_anti")
                .select("doc_id", "score", "qterms", "match"))

    # size(collect_set) instead of count_distinct, and only for AND —
    # see score_and_combine (a distinct agg costs an extra Exchange)
    aggs = [F.sum("score").alias("score"),
            F.array_distinct(F.flatten(
                F.sort_array(F.collect_list(
                    F.struct(F.col("branch"), F.col("qterms"))))
                .getField("qterms"))).alias("qterms"),
            F.array_sort(F.array_distinct(F.flatten(
                F.collect_list("match")))).alias("match")]
    if op == "and":
        aggs.append(F.size(F.collect_set("branch")).alias("__n"))
    agg = scored.groupBy("doc_id").agg(*aggs)
    if op == "and":
        agg = agg.where(F.col("__n") == len(branch_ids))
    return agg.select("doc_id", "score", "qterms", "match")


def combine_results(spark, branches: List[DataFrame], combine_with: str) -> DataFrame:
    """OR / AND / AND_NOT over branch result DFs (reference src/utils.ts:88-134).

    OR  = union-all then re-aggregate per doc.
    AND = same, keeping docs present in every branch.
    AND_NOT = first branch anti-joined against the union of the rest.
    """
    op = combine_with.lower()
    if op not in ("or", "and", "and_not"):
        raise ValueError(f"Invalid combination operator: {combine_with}")
    branches = [b for b in branches if b is not None]
    if not branches:
        return empty_result(spark)
    if len(branches) == 1:
        return branches[0].select("doc_id", "score", "qterms", "match")

    if op == "and_not":
        rest = branches[1].select("doc_id")
        for b in branches[2:]:
            rest = rest.unionByName(b.select("doc_id"))
        return (branches[0]
                .join(rest.distinct(), "doc_id", "left_anti")
                .select("doc_id", "score", "qterms", "match"))

    tagged = []
    for i, b in enumerate(branches):
        tagged.append(b.select("doc_id", "score", "qterms", "match",
                               F.lit(i).alias("__branch_no")))
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)

    # size(collect_set) instead of count_distinct, and only for AND —
    # see score_and_combine (a distinct agg costs an extra Exchange)
    aggs = [F.sum("score").alias("score"),
            F.array_distinct(F.flatten(
                F.sort_array(F.collect_list(
                    F.struct(F.col("__branch_no"), F.col("qterms"))))
                .getField("qterms"))).alias("qterms"),
            F.array_sort(F.array_distinct(F.flatten(
                F.collect_list("match")))).alias("match")]
    if op == "and":
        aggs.append(F.size(F.collect_set("__branch_no")).alias("__n"))
    agg = u.groupBy("doc_id").agg(*aggs)
    if op == "and":
        agg = agg.where(F.col("__n") == len(branches))
    return agg.select("doc_id", "score", "qterms", "match")
