"""Embedding similarity search: brute-force cosine top-k baseline and a
random-hyperplane LSH-bucketed variant (the scale path).

Dot products are `F.zip_with` + `F.aggregate` column expressions — JVM-side,
no Python. At 100 TB the brute-force path is a single narrow scan +
TakeOrderedAndProject (per-partition top-k heaps, driver merge); the LSH path
prunes the scan to one bucket before scoring.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(vec_col, query: Sequence[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.sqrt(np.dot(query, query)))
    return _dot(vec_col, q) / (_norm(vec_col) * F.lit(qn))


def brute_force_topk(embeddings: DataFrame, query: Sequence[float], k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     exclude_id=None) -> DataFrame:
    """Exact cosine top-k → (vec_id, cosine). One scan; per-partition heap
    via orderBy+limit (TakeOrderedAndProject)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = embeddings.select(F.col(id_col).alias("vec_id"),
                            F.round(cosine_col(v, query), 6).alias("cosine"))
    if exclude_id is not None:
        out = out.where(F.col("vec_id") != exclude_id)
    return out.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> List[List[float]]:
    """Deterministic random hyperplanes (published sign-LSH construction)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def lsh_bucket_col(vec_col, planes: List[List[float]]):
    """Sign-bit bucket id: bit j = (v · h_j >= 0)."""
    bucket = F.lit(0)
    for j, h in enumerate(planes):
        bit = F.when(_dot(vec_col, F.array(*[F.lit(float(x)) for x in h]))
                     >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def lsh_topk(embeddings: DataFrame, query: Sequence[float], k: int = 10,
             n_planes: int = 8, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id",
             exclude_id=None) -> DataFrame:
    """ANN: restrict to the query's sign-LSH bucket, exact cosine re-rank.
    → (vec_id, cosine). Recall trades off with n_planes; the bucket
    predicate prunes the scan before any arithmetic."""
    planes = hyperplanes(len(query), n_planes, seed)
    qnp = np.asarray(query, dtype=float)
    qbucket = 0
    for j, h in enumerate(planes):
        if float(np.dot(qnp, np.asarray(h))) >= 0:
            qbucket |= 1 << j
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = (embeddings
           .select(F.col(id_col).alias("vec_id"), v.alias("__v"))
           .where(lsh_bucket_col(F.col("__v"), planes) == qbucket)
           .select("vec_id",
                   F.round(cosine_col(F.col("__v"), query), 6).alias("cosine")))
    if exclude_id is not None:
        out = out.where(F.col("vec_id") != exclude_id)
    return out.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
