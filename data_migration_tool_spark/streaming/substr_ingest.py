"""Streaming exact-substring ingest: arriving document files are
span-deduped against everything ingested so far, maintaining the gram
index as streaming state — the continuous form of
``plans/textq.doc_exact_substring_incremental`` and the third
streaming-ingest front door after ``lsh_ingest`` (MinHash bands) and
the dHash image index.

The state is the DISTINCT 16-byte gram fingerprints of the accepted
corpus — no text, no positions: under the append contract (doc ids
ascend across batches) a batch occurrence of any indexed gram is
covered unconditionally, so presence is the whole contract and the
index stays vocabulary-sized. Each micro-batch appends only its
index-NOVEL grams, so the index is duplicate-free without ever being
rewritten.

Execution shape per micro-batch (``foreachBatch``):
  1. read the stored gram index (parquet state dir),
  2. ``textq.exact_substring_apply`` — windows hashed on the batch
     only; semi/anti joins against the index; batch-new grams elect
     canonicals within the batch,
  3. emit the cleaned per-doc rows (stats + clean-text md5) to the
     output sink,
  4. append the batch's novel grams to the index.
Every write goes through ``txn_sink.append_batch_idempotent``
(per-batch-directory overwrite + committed marker): a crashed and
replayed batch recomputes identical rows (the apply is deterministic
given the checkpoint's file assignment) and the appends short-circuit,
so output and state are exactly-once without a transaction log.

Because ids ascend across batches, the UNION of all emitted cleaned
rows equals the one-shot batch run (``doc_exact_substring_dedup``)
over the full corpus — pinned by
``test_substr_ingest_stream_across_batches``.

At 100 TB: per batch, only the batch is tokenized; the index side of
the joins is gram-keyed and grows with corpus VOCABULARY (sublinear in
rows); everything downstream runs at batch grain. With a transactional
table format the two appends collapse to ACID appends; this module is
the plain-filesystem fallback.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from data_migration_tool_spark.functions import text as TX
from data_migration_tool_spark.plans.textq import exact_substring_apply
from data_migration_tool_spark.streaming.txn_sink import (
    append_batch_idempotent,
)


def _read_index(sess: SparkSession, path: str) -> DataFrame:
    """Committed index grams, or an empty frame before the first batch."""
    try:
        df = sess.read.parquet(path)
    except Exception:
        return sess.createDataFrame([], "g string")
    return df.select("g")


def ingest_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    out_dir: str,
    K: int = 5,
) -> None:
    """The ``foreachBatch`` body (usable standalone for batch replays).

    Ordering note: cleaned rows are written FIRST, the index append
    second — a crash in between replays the whole batch, and both
    writes are idempotent, so no interleaving loses or duplicates a
    row or a gram."""
    if batch.isEmpty():
        return
    sess = batch.sparkSession
    index = _read_index(sess, index_dir)
    b_base = batch.select(
        "doc_id", TX.tokens("text").alias("t")
    ).persist()
    cleaned, new_grams = exact_substring_apply(b_base, index, K)
    append_batch_idempotent(cleaned, batch_id, out_dir)
    append_batch_idempotent(new_grams, batch_id, index_dir)
    b_base.unpersist()


def substr_ingest_stream(
    docs_stream: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    K: int = 5,
) -> StreamingQuery:
    """Wire a streaming documents source into the incremental
    exact-substring ingest. State lives under
    ``state_root``/{index,cleaned}."""
    index_dir = os.path.join(state_root, "index")
    out_dir = os.path.join(state_root, "cleaned")

    def _apply(batch: DataFrame, batch_id: int) -> None:
        ingest_batch(batch, batch_id, index_dir, out_dir, K)

    return (
        docs_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
