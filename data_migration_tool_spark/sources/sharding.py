"""Training-shard export: deterministic corpus shuffle → N shard files.

The write-side twin of ``plans/windowq.doc_training_shards``: a training
pipeline's last batch step is "globally shuffle the corpus and write N
equal-ish shards whose internal order is random but reproducible". Both
the shard assignment and the within-shard order derive from an
md5 hash of the id column, so re-running the export after a failure (or
on a different cluster) produces byte-identical shard membership and
order — no RNG state, no seed plumbing.

Scale: ``repartition(n_shards, shard)`` is the one exchange;
``sortWithinPartitions`` sorts each shard locally (no global sort);
each output task writes exactly one shard directory. n_shards should
track corpus size (64k shards at 100 TB ≈ 1.6 GB/shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"
_KEY_COL = "__shard_key"


def with_shard(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Add deterministic ``shard`` and ordering-key columns."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.md5(F.concat(F.lit("shard:"), F.col(id_col).cast("string")))
    # First 8 hex chars → int, mod n: uniform for any n_shards ≤ 2^31.
    shard = (F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % n_shards).cast(
        "int"
    )
    return df.withColumn(_KEY_COL, key).withColumn(SHARD_COL, shard)


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    fmt: str = "parquet",
) -> None:
    """Shuffle ``df`` into ``n_shards`` hash-ordered shard directories.

    Layout: ``{path}/shard=K/part-*.{fmt}`` — one directory per shard,
    rows inside each file ordered by the reproducible hash key.
    """
    keyed = with_shard(df, id_col, n_shards)
    # Sort by (shard, key): leading with the partition column satisfies
    # the dynamic-partition writer's required ordering, so it appends
    # rows as-is instead of re-sorting them by shard alone (which would
    # destroy the hash order inside each file).
    (
        keyed.repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, _KEY_COL)
        .drop(_KEY_COL)
        .write.mode("overwrite")
        .format(fmt)
        .partitionBy(SHARD_COL)
        .save(path)
    )
