"""End-to-end training-data preparation: the composition of the pipeline
operators this engine ships, in the order a 100 TB run would chain them.

``prepare_training_corpus`` is one lazy DataFrame plan —

  1. PII scrub (``operators/pii.py``) — narrow regexp projections, FIRST
     so every later hash/shingle sees the redacted form (redaction must
     not split duplicate clusters).
  2. Benchmark decontamination (``operators/decontam.py``) — broadcast
     shingle probe + anti-join; optional (skipped without a benchmark).
     When PII scrubbing is on, the benchmark is scrubbed with the SAME
     rules first so both sides shingle the identical redacted form.
  3. Quality gate (``operators/textstats.py``) — codegen column filter,
     BEFORE dedup so garbage rows never pay shingling/MinHash cost.
  4. Near-duplicate removal (``operators/dedup.py``) — exact + MinHash-LSH
     clusters, one survivor per cluster.
  5. Deterministic sampling (``operators/sampling.py``) — optional
     key-hash downsample (repartition-stable, reproducible).
  6. Token-budget shard packing — (pack_bucket, shard_id) assignment for
     the training-file writer to ``partitionBy``.

Nothing here adds semantics: every stage is the gated operator, so the
composition inherits their individual oracles/tests; the pipeline test
asserts the cross-stage invariants (no PII survives, contaminated ids
gone, one survivor per duplicate cluster, shard budgets bounded).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .operators.decontam import decontaminate
from .operators.dedup import drop_near_duplicates
from .operators.pii import pii_scrub
from .operators.sampling import pack_token_budget, sample_deterministic
from .functions.tokenize import terms_col


def prepare_training_corpus(docs: DataFrame,
                            benchmark: Optional[DataFrame] = None,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            scrub_pii: bool = True,
                            decontam_n: int = 3,
                            min_tokens: int = 10,
                            max_tokens: int = 100_000,
                            min_ttr: float = 0.1,
                            sample_fraction: Optional[float] = None,
                            shard_budget: Optional[int] = None,
                            seed: int = 42,
                            hash_method: str = "xxhash64",
                            n_buckets: Optional[int] = None,
                            persist_gated: bool = True,
                            **dedup_kwargs) -> DataFrame:
    """Documents → cleaned, decontaminated, deduplicated, (optionally)
    sampled and shard-packed training corpus. Returns the surviving rows
    with original columns (text redacted in place when ``scrub_pii``),
    plus ``n_tokens`` and — when ``shard_budget`` is set —
    ``(pack_bucket, shard_id)`` for the packed writer.

    ``dedup_kwargs`` pass through to ``dedup_clusters`` (MinHash k,
    bands, jaccard threshold, or a precomputed ``pairs`` DataFrame).
    ``hash_method``/``n_buckets`` pass through to the sampling and
    packing stages (``hash_method="md5"`` makes both cross-engine
    reproducible — the form the DuckDB oracle gate verifies).

    ``persist_gated`` (default True) materializes the scrub → decontam →
    quality-gate result ONCE before the dedup stage fans out. The dedup
    stage references its input from many plan branches (exact-dup rep
    map, MinHash signatures, both band-join sides, the exact-Jaccard
    verify joins, the survivor semi-join), and Catalyst does not reuse
    common subplans across branches — measured on the composed plan:
    12 parquet scans of the corpus and 63 replicated copies of the PII
    scrub's regexp chain without the persist, i.e. ~10 redundant passes
    over corpus text per action at 100 TB. MEMORY_AND_DISK keeps the
    gated (smallest-so-far) form; partitions spill rather than OOM.

    Cache lifetime (round-6 ADVICE): Spark's SQL CacheManager holds a
    persisted DataFrame's blocks until an EXPLICIT unpersist or
    ``spark.catalog.clearCache()`` — dropping the returned plan does NOT
    release them (ContextCleaner only collects RDD/broadcast state), so
    repeated calls in a long-lived session pin one gated-corpus cache
    each. The persisted intermediate is therefore exposed: call
    ``release_gated_corpus(returned_df)`` (or unpersist the DataFrame in
    the returned frame's ``_gated_cache`` attribute) after the consuming
    action. Pass ``persist_gated=False`` to keep the plan fully lazy
    (e.g. when the caller persists a checkpoint of its own or the corpus
    is tiny) — rows are identical either way (gated by
    tests/test_pipeline.py)."""
    if scrub_pii:
        docs = pii_scrub(docs, text_col)
        if benchmark is not None:
            # Scrub the benchmark the same way: a training doc whose
            # benchmark-overlapping n-grams contain an email/IP/phone is
            # redacted before shingling, so the benchmark side must
            # shingle the same redacted form or the overlap is invisible
            # and the doc escapes decontamination.
            benchmark = pii_scrub(benchmark, text_col)
    if benchmark is not None:
        docs = decontaminate(docs, benchmark, n=decontam_n,
                             text_col=text_col, id_col=id_col)

    # quality gate as NARROW columns on the (scrubbed) corpus — the same
    # n_tokens/ttr expressions text_quality computes (the operator both
    # tests gate against), but applied in place: the earlier
    # docs ⋈ text_quality(docs) form was a self-join that re-evaluated
    # the whole PII-regex chain on both sides and paid a join exchange
    # for columns derivable per-row (round 6, guide §2.2)
    terms = terms_col(F.col(text_col))
    docs = (docs
            .withColumn("n_tokens", F.size(terms))
            .withColumn("__ttr", F.round(
                F.size(F.array_distinct(terms)) /
                F.greatest(F.col("n_tokens"), F.lit(1)), 6))
            .where((F.col("n_tokens") >= min_tokens)
                   & (F.col("n_tokens") <= max_tokens)
                   & (F.col("__ttr") > min_ttr))
            .drop("__ttr"))
    gated = None
    if persist_gated:
        docs = gated = docs.persist(StorageLevel.MEMORY_AND_DISK)

    docs = drop_near_duplicates(docs, text_col, id_col, **dedup_kwargs)

    if sample_fraction is not None:
        docs = sample_deterministic(docs, sample_fraction, [id_col],
                                    seed=seed, method=hash_method)
    if shard_budget is not None:
        docs = pack_token_budget(docs, shard_budget, "n_tokens", id_col,
                                 n_buckets=n_buckets, seed=seed,
                                 method=hash_method)
    if gated is not None:
        # release handle for the pinned intermediate (see docstring) —
        # an attribute, not a new return type, so callers that don't
        # care keep their signature
        docs._gated_cache = gated
    return docs


def release_gated_corpus(df: DataFrame) -> None:
    """Unpersist the gated-corpus intermediate ``prepare_training_corpus``
    pinned for its dedup fan-out (round-6 ADVICE: CacheManager holds it
    for the session otherwise). Safe after the caller's consuming action;
    a later re-evaluation of the returned plan just recomputes. No-op for
    frames built with ``persist_gated=False``."""
    gated = getattr(df, "_gated_cache", None)
    if gated is not None:
        gated.unpersist()
