"""Deterministic sampling + shard-packing operators for training-data
pipelines.

Both are RNG-free: selection is a pure function of row content (hash
thresholding), so a re-run — or a recomputed partition after executor
loss, the cluster hazard `assign_doc_ids` hit in round 4 — reproduces
the same sample exactly. `df.sample()` cannot promise that (its seed is
per-partition-index, which changes under repartitioning).

* sample_deterministic — keep ~fraction of rows by key-hash threshold
* sample_per_group     — per-stratum fractions (e.g. per language/repo)
* pack_token_budget    — assign docs to training shards of ~budget tokens
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# xxhash64 output spans the full signed-64 range; normalizing to [0, 1)
# with an exact power-of-two divisor keeps the threshold comparison exact
_HASH_SPAN = float(1 << 64)

# key-column separator for the md5 method: an ASCII control char that
# cannot appear in typical key values, so ("ab","c") never collides with
# ("a","bc")
_MD5_SEP = "\x1f"


def _unit_hash(cols: Sequence[str], seed: int, method: str = "xxhash64"):
    """Uniform [0, 1) value that is a pure function of the key columns —
    the portable decision variable for all deterministic sampling.

    ``method="xxhash64"`` (default) is the fast JVM path. ``method="md5"``
    is the CROSS-ENGINE form: hex chars [1, 9) of md5(concat_ws(0x1f,
    cols..., seed)) parsed base-16 then divided by 2^32 — every step
    (32-bit int < 2^53, power-of-two division) is exact in a double, so
    any engine with md5 reproduces the identical sample. DuckDB:
    ``('0x' || substring(md5(concat_ws(chr(31), k, '42')), 1, 8))
    ::UBIGINT::BIGINT / 4294967296.0``."""
    if method == "xxhash64":
        h = F.xxhash64(*[F.col(c) for c in cols], F.lit(seed))
        return (h.cast("double") / F.lit(_HASH_SPAN)) + F.lit(0.5)
    if method == "md5":
        h32 = _md5_hash32(cols, seed)
        return h32.cast("double") / F.lit(float(1 << 32))
    raise ValueError(f"unknown hash method {method!r}")


def _md5_hash32(cols: Sequence[str], seed: int):
    """Portable 32-bit key hash (same construction as
    ``dedup.term_hash32``) over the 0x1f-joined key columns + seed."""
    key = F.concat_ws(_MD5_SEP,
                      *[F.col(c).cast("string") for c in cols],
                      F.lit(str(seed)))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def sample_deterministic(df: DataFrame, fraction: float,
                         key_cols: Sequence[str],
                         seed: int = 42,
                         method: str = "xxhash64") -> DataFrame:
    """Keep ~``fraction`` of rows, decided by ``xxhash64(key_cols, seed)
    < fraction`` — deterministic, repartition-stable, and CONSISTENT
    across tables: sampling two tables by the same key keeps the same
    keys in both (the join-preserving property RNG sampling lacks).

    Scale shape: a narrow filter — no shuffle, no RNG state, pushes into
    the scan's residual filter. Distinct seeds give independent samples
    (e.g. train/validation splits via disjoint threshold bands are
    ``sample_split``-style: u < 0.9 vs u >= 0.9 on ONE seed)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    return df.where(_unit_hash(key_cols, seed, method)
                    < F.lit(float(fraction)))


def sample_per_group(df: DataFrame, group_col: str,
                     fractions: Dict[str, float],
                     key_cols: Sequence[str],
                     default_fraction: float = 0.0,
                     seed: int = 42,
                     method: str = "xxhash64") -> DataFrame:
    """Stratified deterministic sampling: per-``group_col`` keep rates
    (e.g. ``{"en": 0.1, "de": 1.0}`` over a language column), groups not
    listed fall back to ``default_fraction``. The decision variable is
    the same key hash as ``sample_deterministic``, so per-group samples
    nest: raising one group's fraction only ADDS rows, never swaps them
    — the reproducible-curriculum property.

    Scale shape: the fraction lookup is a literal CASE expression (no
    join, no broadcast); still one narrow filter."""
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError("default_fraction must be in [0, 1]")
    expr = F.lit(float(default_fraction))
    for g, f in sorted(fractions.items()):
        expr = F.when(F.col(group_col) == F.lit(g),
                      F.lit(float(f))).otherwise(expr)
    return df.where(_unit_hash(key_cols, seed, method) < expr)


def pack_token_budget(docs: DataFrame, budget: int,
                      count_col: str = "n_tokens",
                      id_col: str = "doc_id",
                      n_buckets: Optional[int] = None,
                      seed: int = 42,
                      method: str = "xxhash64") -> DataFrame:
    """→ docs + (pack_bucket, shard_id): assign documents to training
    shards of ~``budget`` tokens each — the sharding step before writing
    packed training files.

    Exact greedy packing is inherently sequential; the distributed
    approximation salts docs into ``n_buckets`` independent buckets
    (id-hash, uniform) and runs the greedy cumulative fill as ONE window
    cumsum per bucket: ``shard_id = floor((cumsum − count) / budget)``
    within (bucket, id order). Guarantees, documented rather than
    hand-waved:

    * every doc with ``count ≤ budget`` lands in a shard whose total is
      < budget + max_doc_tokens (the classic one-pass bound);
    * a doc larger than the budget closes its shard — no later doc joins
      it (its cumsum pushes every successor past the next boundary);
    * output is deterministic — same input, same shards, independent of
      partitioning (the window orders by ``id_col``).

    Scale shape: one hash-partitioned window (the shuffle is on the
    uniform bucket key — no skew, each bucket sorts independently), no
    driver state. Shards are (pack_bucket, shard_id) pairs; downstream
    writers ``partitionBy`` both. ``n_buckets`` defaults to
    ``defaultParallelism`` so every core fills shards concurrently;
    more buckets = more parallelism but more partially-filled tail
    shards (one per bucket)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = docs.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    if method == "xxhash64":
        bucket_hash = F.xxhash64(F.col(id_col), F.lit(seed))
    elif method == "md5":
        bucket_hash = _md5_hash32([id_col], seed)
    else:
        raise ValueError(f"unknown hash method {method!r}")
    bucketed = docs.withColumn(
        "pack_bucket",
        F.pmod(bucket_hash, F.lit(int(n_buckets))).cast("int"))
    w = (Window.partitionBy("pack_bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.col(count_col).cast("long")).over(w)
    return bucketed.withColumn(
        "shard_id",
        F.floor((cum - F.col(count_col)) / F.lit(int(budget))).cast("int"))
