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


from contextlib import contextmanager


@contextmanager
def scoped_shuffle_partitions(spark, n: int):
    """Temporarily size ``spark.sql.shuffle.partitions``; restores the
    session value on exit.

    For ITERATIVE operators whose loop state is dimension-scale (a
    parts catalog's ranks, a vocabulary's counts): the loop's per-round
    shuffles should be sized to the STATE, not to the session default
    that fact-scale scans want — 20 rounds x (default - needed)
    partitions is pure scheduling overhead. Callers must scope ONLY the
    loop (materialize fact-scale inputs before entering), and only when
    they can argue the state is small; results must be
    partition-count-independent (the exact-integer lanes are)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
