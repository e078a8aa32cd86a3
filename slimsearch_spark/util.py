"""Small shared execution utilities."""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame


def bounded_collect(df: DataFrame, limit: int) -> List:
    """``df.limit(limit).collect()`` in ONE Spark job.

    CollectLimitExec executes a limit incrementally — one job over 1
    partition, then ``spark.sql.limit.scaleUpFactor`` more per retry —
    which is right when the first partitions usually satisfy the limit.
    The engine's threshold GUARD probes are the opposite case: the
    common outcome is "fewer than ``limit`` rows exist", which forces
    the ramp to walk every partition anyway, serializing 3-4 jobs of
    fixed scheduler latency per probe (round 6, measured under
    cluster_pairs / the expansion probe). Raising
    ``spark.sql.limit.initialNumPartitions`` for the probe's duration
    makes the first attempt scan all partitions in parallel — one job,
    same rows. The conf is restored afterwards so genuine
    first-partition-wins limits elsewhere keep the ramp.
    """
    spark = df.sparkSession
    key = "spark.sql.limit.initialNumPartitions"
    old = spark.conf.get(key, None)
    spark.conf.set(key, str(2**31 - 1))
    try:
        return df.limit(limit).collect()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
