"""Batched multi-query scoring: ONE Spark job for N string queries.

The reference is an in-memory engine answering one query in microseconds;
a distributed engine pays seconds of job overhead per query, so serving a
query STREAM query-by-query wastes almost all of its time on scheduling,
not scoring. This plan amortizes that: every query's expansion rows carry
a ``query_id`` and ship together as one (broadcast) expansion table, the
postings ⋈ expansion ⋈ doc_stats join runs once, and ONE aggregation
keyed on (query_id, doc_id) produces every query's results — the scan,
the join, the shuffle and the scheduling are shared by the whole batch.
Per-query semantics are unchanged (scores identical to ``search_df``,
reference src/results.ts:84-286): the per-(query, branch, term, field)
document frequency comes from the same window count over matched live
postings, the combinators fold inside the single aggregation (branch
presence = ``count_distinct(branch)``, AND_NOT keeps branch-0 score and
drops docs seen in any negative branch), and the quality multiplier is
the distinct matched query-term count.

Scale shape: one shuffle for the aggregation, one for the per-query
top-k window (partitioned by query_id — thousands of queries spread
across the cluster; a single query's candidate set never concentrates
beyond what its own search_df plan would). The expansion table is
queries × terms × expansion width — broadcast-sized for any sane batch.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .scoring import EXPANSION_SCHEMA, bm25_col

BATCH_EXPANSION_SCHEMA = T.StructType(
    [T.StructField("query_id", T.IntegerType())] + list(EXPANSION_SCHEMA))

BATCH_RESULT_SCHEMA = T.StructType([
    T.StructField("query_id", T.IntegerType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("score", T.DoubleType()),
])


def score_many(spark,
               postings: DataFrame,
               doc_stats: DataFrame,
               expansion: DataFrame,
               searched_field_ids: Sequence[int],
               field_boost_by_id: Mapping[int, float],
               avg_field_length: Mapping[int, float],
               doc_count: int,
               bm25: Mapping[str, float],
               combine_with: str,
               branch_counts: Mapping[int, int],
               k: Optional[int] = None,
               derived_terms: Optional[Sequence[str]] = None,
               df_table: Optional[DataFrame] = None) -> DataFrame:
    """Score a batch of flat string queries in one plan.

    ``expansion``: DataFrame in BATCH_EXPANSION_SCHEMA (already broadcast
    -hinted by the caller when driver-sized). ``postings`` must already be
    tombstone-filtered (live view — M7 lazy-delete semantics come free).
    ``branch_counts``: query_id → number of branches (query terms), used
    by AND (a doc must match every branch) — tiny, shipped as a literal
    map. Returns BATCH_RESULT_SCHEMA rows, per-query top-k when ``k``.
    """
    op = combine_with.lower()
    if op not in ("or", "and", "and_not"):
        raise ValueError(f"Invalid combination operator: {combine_with}")

    base = postings.where(F.col("field_id").isin(list(searched_field_ids)))
    m = base.join(expansion, base["term"] == F.col("derived_term"),
                  "inner")

    # df per derived (term, field): the count of live docs in the matched
    # list — the reference's post-lazy-cleanup matchingFields df
    # (src/results.ts:109-114). df is a property of the live posting list
    # itself, identical across queries/branches; when the caller knows the
    # derived-term set driver-side it ships as a slim map-side-combined
    # aggregation broadcast back onto the matched rows — the round-4/5
    # window (partitioned per query/branch only to avoid double-counting
    # joined copies) shuffled and sorted every matched posting row first
    # (guide §2.3/§2.4). Wide expansions keep the window.
    if df_table is None and derived_terms is not None:
        df_table = (base.where(F.col("term").isin(sorted(set(derived_terms))))
                    .groupBy("term", "field_id")
                    .agg(F.count("*").cast("double").alias("df")))
    if df_table is not None:
        m = m.join(F.broadcast(df_table), ["term", "field_id"], "inner")
    else:
        w = Window.partitionBy("query_id", "branch", "derived_term",
                               "field_id")
        m = m.withColumn("df", F.count("*").over(w).cast("double"))

    if "field_len" not in m.columns:
        # saved-layout loads only — built postings carry field_len
        # denormalized (build_postings, round 6)
        m = m.join(doc_stats, ["doc_id", "field_id"], "inner")

    avg_map = F.create_map(*[
        F.lit(x) for fid in searched_field_ids
        for x in (fid, float(avg_field_length.get(fid, 0.0)))])
    boost_map = F.create_map(*[
        F.lit(x) for fid in searched_field_ids
        for x in (fid, float(field_boost_by_id.get(fid, 1.0)))])

    raw = bm25_col(F.col("tf").cast("double"), F.col("df"), doc_count,
                   F.col("field_len").cast("double"),
                   F.element_at(avg_map, F.col("field_id")), bm25)
    weighted = (F.col("weight") * F.col("term_boost")
                * F.element_at(boost_map, F.col("field_id")) * raw)
    m = m.withColumn("weighted", weighted)

    # ONE aggregation folds scoring + combinator + quality:
    #   OR      score = Σ weighted            quality over all branches
    #   AND     same, kept iff every branch matched
    #   AND_NOT score = Σ weighted[branch 0]  dropped if any branch>0 hit
    if op == "and_not":
        agg = (m.groupBy("query_id", "doc_id")
               .agg(F.sum(F.when(F.col("branch") == 0, F.col("weighted")))
                    .alias("raw_score"),
                    F.max((F.col("branch") != 0).cast("int"))
                    .alias("__has_neg"),
                    F.size(F.collect_set(
                        F.when(F.col("branch") == 0, F.col("query_term"))))
                    .alias("__quality"))
               .where((F.col("__has_neg") == 0)
                      & F.col("raw_score").isNotNull()))
    else:
        # size(collect_set) not count_distinct: a distinct aggregate
        # alongside the other aggs plans as Expand + two aggregation
        # exchanges; collect_set rides the ObjectHashAggregate the
        # __quality set already pays (round 6). OR discards the count.
        aggs = [F.sum("weighted").alias("raw_score"),
                F.size(F.collect_set("query_term")).alias("__quality")]
        if op == "and":
            aggs.append(F.size(F.collect_set("branch")).alias("__nb"))
        agg = m.groupBy("query_id", "doc_id").agg(*aggs)
        if op == "and":
            need = F.create_map(*[F.lit(x) for qi, n in branch_counts.items()
                                  for x in (qi, n)])
            agg = agg.where(
                F.col("__nb") == F.element_at(need, F.col("query_id")))

    out = agg.select(
        "query_id", "doc_id",
        (F.col("raw_score")
         * F.when(F.col("__quality") > 0, F.col("__quality")).otherwise(1)
         ).alias("score"))

    if k:
        rank_w = (Window.partitionBy("query_id")
                  .orderBy(F.desc("score"), F.asc("doc_id")))
        out = (out.withColumn("__rn", F.row_number().over(rank_w))
               .where(F.col("__rn") <= int(k)).drop("__rn"))
    return out.orderBy("query_id", F.desc("score"), F.asc("doc_id"))
