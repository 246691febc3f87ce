"""Partition-layout helpers.

A small parquet input arrives as ONE partition, and every map-side-heavy
pipeline stage (explode, pairwise join's streamed side, per-row hashing)
inherits that parallelism until the first shuffle. ``spread`` round-robin
repartitions such inputs up to cluster parallelism; on genuinely large
inputs (≥ target partitions already) it is a no-op, so the 100 TB plan
is unchanged while the small-file plan actually uses the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition to ``factor × defaultParallelism`` iff the input has
    fewer partitions than the cluster has slots."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
