"""Distributed index build — the Spark-native equivalent of slimsearch
``addAll`` (src/add.ts:71-131) re-expressed as one declarative pass.

Pipeline (SURVEY.md §3.1):

    docs ─ assign_doc_ids ─ tokenize (JVM split / Arrow UDF) ─ explode
         ─ groupBy(term, field_id, doc_id).count()            → postings
         ─ size(array_distinct(raw_tokens)) per (doc, field)  → doc_stats
         ─ doc_stats.groupBy(field_id).agg(avg, count)        → corpus stats

Everything is built-in Catalyst-optimizable DataFrame ops: the tf aggregation
is a partial+final hash aggregate (map-side combine), the scan prunes to the
indexed columns only, and no per-row Python runs in the JVM tokenizer path.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..functions.tokenize import raw_tokens_col, terms_col


def assign_doc_ids(df: DataFrame, order_cols: Sequence[str],
                   id_col: str = "doc_id",
                   samples_per_part: int = 100) -> DataFrame:
    """Dense 0-based doc ids in (order_cols) order, without a single-partition
    global window: deterministic range classes on the key, per-class
    row_number, then broadcast per-class offsets. ``order_cols`` must be a
    unique key.

    The range classes are cut at hash-sampled key quantiles — a PURE
    FUNCTION OF THE DATA. ``repartitionByRange`` + ``spark_partition_id``
    (the round-1..3 implementation) is NOT: Spark's range sampling is
    seeded per plan evaluation, so the partition counts collected in one
    action could disagree with the boundaries of the evaluation that
    computes the output (and any later re-evaluation), assigning DUPLICATE
    and nondeterministic ids on corpora big enough for the sampled cut
    points to wander (observed: 541 duplicate ids over 20k docs; found by
    the round-4 flat-tf pruning probe, latent since round 1 — the oracle
    tables carry pre-assigned doc_ids, so the driver gate never exercised
    this path at scale). Deterministic boundaries also survive task
    retries and executor loss on a real cluster, where a recomputed
    partition must reproduce the ids already shipped downstream.

    Scalable to 10^12 rows: driver state is ~samples_per_part keys per
    class plus one count per class; the per-row class expression is a
    chained comparison against n_classes-1 literals.

    Replaces the reference's insertion-order ``_nextId`` (src/add.ts:25-37)
    with a deterministic total order.
    """
    n_part = df.sparkSession.sparkContext.defaultParallelism
    keys = [F.col(c) for c in order_cols]
    # one sortable composite key: NUL separator < any UTF-8 byte, so the
    # concatenated string orders exactly like the column tuple
    key = (keys[0].cast("string") if len(keys) == 1
           else F.concat_ws("\x00", *[k.cast("string") for k in keys]))
    total = df.count()
    boundaries: List[str] = []
    if total > n_part:
        rate = max(1, total // (samples_per_part * n_part))
        sampled = sorted(
            r["k"] for r in df.select(key.alias("k"))
            .where(F.pmod(F.xxhash64(key), F.lit(rate)) == 0).collect())
        if sampled:
            step = max(1, len(sampled) // n_part)
            boundaries = sorted(set(sampled[step::step]))[:n_part - 1]
    cls = F.lit(0)
    for b in boundaries:
        cls = cls + (key >= F.lit(b)).cast("int")
    local = df.withColumn("__cls", cls)
    w = Window.partitionBy("__cls").orderBy(*keys)
    local = local.withColumn("__rn", F.row_number().over(w))
    counts = {r["__cls"]: r["cnt"] for r in
              local.groupBy("__cls").agg(F.count("*").alias("cnt")).collect()}
    offsets: Dict[int, int] = {}
    acc = 0
    for c in sorted(counts):
        offsets[c] = acc
        acc += counts[c]
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for cls_off in sorted(offsets.items())
                       for x in cls_off]),
        F.col("__cls"))
    return (local
            .withColumn(id_col, (offset_expr + F.col("__rn") - 1).cast("long"))
            .drop("__cls", "__rn"))


def tokenize_fields(docs: DataFrame, config: IndexConfig) -> DataFrame:
    """→ (doc_id, field_id, terms array<string>, field_len int).

    ``field_len`` = count of UNIQUE RAW tokens (pre-processTerm, including the
    empty boundary token, exactly like ``new Set(tokens).size`` over a JS
    split — reference src/add.ts:96, parity note P1).

    Field names may be dot-paths into struct columns (``author.name``) —
    the Spark-native form of the reference's nested extractField default
    (src/defaults.ts:10-14). Custom ``config.tokenize`` / ``process_term``
    callables run in one Arrow-batched pandas UDF per field (reference
    add-time chain src/add.ts:93-113, incl. 1→N expansion and falsy-drop),
    and the same callables are the query-side defaults."""
    extract_fn = getattr(config, "extract_field", None)
    stringify_fn = getattr(config, "stringify_field", None)
    custom = (getattr(config, "tokenize", None) is not None
              or getattr(config, "process_term", None) is not None
              or extract_fn is not None or stringify_fn is not None)
    if custom:
        # the analysis UDF closure references package functions: ship the
        # package to executor workers BEFORE any action can run it (the
        # engine constructor also ships, but build() aggregates stats first)
        from .. import ensure_workers
        ensure_workers(docs.sparkSession)
    parts = []
    for fid, fname in enumerate(config.fields):
        src = F.col(fname).cast("string")
        if custom:
            from ..functions.tokenize import custom_analysis_udf
            udf = custom_analysis_udf(config.tokenize, config.process_term,
                                      fname, extract_fn, stringify_fn)
            if extract_fn is not None:
                # the extractor sees the whole document dict; missing
                # values come back field_len = -1 (reference == null skip)
                inp = F.struct(*[F.col(c) for c in docs.columns])
                part = (docs
                        .select("doc_id", F.lit(fid).alias("field_id"),
                                udf(inp).alias("__a"))
                        .where(F.col("__a.field_len") >= 0))
            else:
                # stringify runs on the raw (uncast) value so the callable
                # sees the native type, like the reference's .toString()
                inp = F.col(fname) if stringify_fn is not None else src
                part = (docs
                        .where(F.col(fname).isNotNull())
                        .select("doc_id", F.lit(fid).alias("field_id"),
                                udf(inp).alias("__a")))
            part = part.select("doc_id", "field_id",
                               F.col("__a.terms").alias("terms"),
                               F.col("__a.field_len").alias("field_len"))
        else:
            part = (docs
                    .where(F.col(fname).isNotNull())
                    .select(
                        "doc_id",
                        F.lit(fid).alias("field_id"),
                        terms_col(src, config.tokenizer).alias("terms"),
                        F.size(F.array_distinct(
                            raw_tokens_col(src, config.tokenizer)))
                        .alias("field_len"),
                    ))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_postings(tokenized: DataFrame) -> DataFrame:
    """→ postings(term, field_id, doc_id, tf, field_len). One shuffle
    (hash agg with map-side combine); key includes doc_id so stopword
    skew does not concentrate — skew handling matters at the posting-list
    *pack* stage (operators/compact.py), not here.

    ``field_len`` rides along denormalized (round 6): the tokenized rows
    already carry it, so ``first()`` in the same aggregate is free, and
    every scoring plan can read BM25's length normalization straight off
    the matched posting row instead of paying a postings ⋈ doc_stats
    join per query (guide §2.4 — at scale that join shuffled or
    broadcast the whole doc-stats table per search). Saved layouts strip
    the column (index_store) — loaded indexes fall back to the join."""
    return (tokenized
            .select("doc_id", "field_id", "field_len",
                    F.explode("terms").alias("term"))
            .groupBy("term", "field_id", "doc_id")
            .agg(F.count("*").cast("int").alias("tf"),
                 F.first("field_len").alias("field_len")))


def build_doc_stats(tokenized: DataFrame) -> DataFrame:
    """→ doc_stats(doc_id, field_id, field_len)."""
    return tokenized.select("doc_id", "field_id", "field_len")


def corpus_stats_filling(postings: DataFrame,
                         doc_stats: DataFrame
                         ) -> Tuple[Dict[int, float], Dict[int, int]]:
    """Per-field stats collected in ONE action that also references the
    postings cache: with AQE, each cached relation in the plan gets its
    own TableCacheQueryStage, so this single job materializes BOTH the
    postings and doc_stats caches from the persisted tokenized corpus
    AND returns the stats — replacing the separate ``postings.count()``
    fill action the round-1..5 build paid first (round 6, guide §1.2:
    don't compute things you throw away — the count's only purpose was
    the cache side effect). The sentinel field_id -1 row carries the
    postings probe and is dropped."""
    stats = (doc_stats.groupBy("field_id")
             .agg(F.avg("field_len").alias("avg_len"),
                  F.count("*").alias("n")))
    probe = (postings.agg(F.count("*").alias("n"))
             .select(F.lit(-1).alias("field_id"),
                     F.lit(0.0).alias("avg_len"), "n"))
    rows = [r for r in stats.unionByName(probe).collect()
            if r["field_id"] != -1]
    return ({r["field_id"]: float(r["avg_len"]) for r in rows},
            {r["field_id"]: int(r["n"]) for r in rows})


def corpus_stats(doc_stats: DataFrame) -> Tuple[Dict[int, float], Dict[int, int]]:
    """Per-field average field length + doc-with-field counts (tiny collect).

    Batch mean == the reference's running mean whenever every doc has the
    field (parity note P3); the known order-dependent divergence when fields
    are sparse is documented in SURVEY.md §4."""
    rows = (doc_stats.groupBy("field_id")
            .agg(F.avg("field_len").alias("avg_len"),
                 F.count("*").alias("n"))
            .collect())
    return ({r["field_id"]: float(r["avg_len"]) for r in rows},
            {r["field_id"]: int(r["n"]) for r in rows})


def build_term_dict(postings: DataFrame) -> DataFrame:
    """→ terms(term, field_id, df) — the query-expansion dictionary, tiny
    relative to postings; also carries per-(term, field) document frequency
    for the no-tombstone fast path."""
    return (postings.groupBy("term", "field_id")
            .agg(F.count("*").cast("int").alias("df")))
