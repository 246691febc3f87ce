"""Streaming CDC apply: change files land → latest-wins MERGE into a
parquet target (SURVEY §2.9 ST4 taken to its streaming conclusion —
the reference's incremental append loads become true upserts the
moment a landed file can carry updates).

Execution shape: ``foreachBatch`` gives each micro-batch a BATCH
DataFrame, so the apply step reuses the exact batch MERGE operator
(``operators/merge.upsert_latest``) — one code path, one semantics
contract, streaming or not. The checkpoint makes file ingestion
exactly-once; the merge itself is idempotent under replay (latest-wins
by the version column), so the end-to-end pipeline is safe against
both duplicate delivery and batch re-execution.

At 100 TB: the target rewrite per batch is the plain-parquet cost of
having no transactional table format; with Delta/Iceberg the same
``foreachBatch`` body becomes a metadata-only MERGE INTO. Batches are
update-sized, not table-sized, and the union-window merge shuffles
(base + updates) once on the key — bucketed targets drop that to
updates-only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def _read_target(sess: SparkSession, target_dir: str) -> DataFrame | None:
    """Read the parquet target if it exists, else None. Existence is
    probed by attempting the read and catching the analysis failure —
    this works for ANY Hadoop filesystem (hdfs://, s3a://, gs://, local),
    unlike ``os.path.exists``, which only sees the driver's local disk
    and would silently report "missing" for every remote target (each
    batch would then overwrite the table with just its own rows)."""
    from pyspark.errors import AnalysisException

    try:
        return sess.read.parquet(target_dir)
    except AnalysisException as exc:
        msg = str(exc)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        raise


def apply_cdc_stream(
    spark: SparkSession,
    changes: DataFrame,
    target_dir: str,
    keys: Sequence[str],
    version_col: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start a streaming query that MERGEs each micro-batch of change
    rows into the parquet table at ``target_dir`` (latest-wins on
    ``version_col`` per ``keys``). Returns the StreamingQuery; drain
    with ``Trigger.AvailableNow`` + ``awaitTermination`` for batch-like
    runs, or leave running for continuous apply."""
    from data_migration_tool_spark.operators.merge import upsert_latest

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sess = batch.sparkSession
        base = _read_target(sess, target_dir)
        if base is not None:
            merged = upsert_latest(base, batch, keys, version_col)
        else:
            merged = upsert_latest(
                batch.limit(0), batch, keys, version_col
            )
        # plain parquet has no transactional swap: stage then replace.
        # (with Delta/Iceberg this block is MERGE INTO and goes away)
        tmp = target_dir + ".staging"
        merged.write.mode("overwrite").parquet(tmp)
        final = sess.read.parquet(tmp)
        final.write.mode("overwrite").parquet(target_dir)

    return (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
