"""Exactly-once APPEND to plain parquet from a stream — the write-side
twin of the CDC merge (SURVEY §2.9 ST4): CDC makes upserts replay-safe
via latest-wins; this makes plain appends replay-safe via per-batch
directories.

The problem: ``foreachBatch`` + ``mode("append")`` duplicates rows when
a batch replays after a crash (the checkpoint marks a batch complete
only AFTER the user function returns — the write can land twice). The
fix needs no transaction log: every micro-batch writes to its OWN
partition directory ``batch_id=N`` with ``mode("overwrite")``. Spark's
checkpoint guarantees batch N replays with identical content, so a
replayed write simply rewrites the same directory — the sink converges
to exactly-once output under any crash/replay interleaving.

A committed-marker file (``_manifest/N``) short-circuits replays of
already-durable batches (skip the rewrite cost); correctness never
depends on it — the overwrite alone is idempotent. The marker is
written AFTER the data (write-ahead would claim durability the data
doesn't have yet).

At 100 TB/day: each batch directory is batch-sized; the ``batch_id``
partition column doubles as ingestion lineage (which batch produced
which rows) and enables trivially parallel retention deletes. Readers
``spark.read.parquet(target)`` and get the partition column for free.
With Delta/Iceberg the same body collapses to a transactional append —
this module is the plain-filesystem fallback, exactly like the
reference's GCS-landed loads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def append_batch_idempotent(
    df: DataFrame, batch_id: int, target_dir: str
) -> bool:
    """The ``foreachBatch`` body: write ``df`` under
    ``target_dir/batch_id=N`` (overwrite → replay-idempotent), then
    mark the batch committed. Returns False when the batch was already
    committed (replay short-circuit), True when data was written."""
    marker_dir = os.path.join(target_dir, "_manifest")
    marker = os.path.join(marker_dir, str(batch_id))
    if os.path.exists(marker):
        return False
    df.write.mode("overwrite").parquet(
        os.path.join(target_dir, f"batch_id={batch_id}")
    )
    os.makedirs(marker_dir, exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("committed")
    os.replace(tmp, marker)  # atomic on POSIX — no torn markers
    return True


def exactly_once_append(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Wire a streaming DataFrame into the idempotent-append sink with
    an AvailableNow drain."""

    def _write(df: DataFrame, batch_id: int) -> None:
        append_batch_idempotent(df, batch_id, target_dir)

    return (
        stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_appended(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read the sink's committed output: the batch_id=N partition
    directories (parquet partition discovery picks up ``batch_id`` as
    a column; the non-data ``_manifest`` directory is ignored by the
    underscore convention)."""
    return spark.read.parquet(target_dir)
