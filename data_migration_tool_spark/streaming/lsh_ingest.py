"""Streaming near-dup ingest: arriving document files are deduped
against the corpus ingested so far, maintaining the LSH band index as
streaming state — the continuous form of
``operators/dedup.minhash_lsh_incremental``.

This is the shape an LLM-ingest front door actually has: documents
land continuously; each must be checked against EVERYTHING already
accepted, without re-hashing the standing corpus per batch. The band
index (a few small rows per document — no shingles, no text) IS the
state; it grows by exactly the batch's signatures each micro-batch.

Execution shape per micro-batch (``foreachBatch``):
  1. read the stored index + standing docs (parquet state dirs),
  2. ``minhash_lsh_incremental`` — signature hashing on the batch
     only; index join keyed on (band, band_key); Jaccard verify
     re-shingles only candidate-touched documents,
  3. emit batch-touching near-dup pairs to the pairs sink,
  4. append the batch's bands and docs to the state dirs.
Every write goes through ``txn_sink.append_batch_idempotent``
(per-batch-directory overwrite + committed marker), so a crashed and
replayed batch converges: state and output are exactly-once without a
transaction log. Step 2 is deterministic given the checkpoint's file
assignment, so replays recompute identical pairs.

At 100 TB: state grows at index grain (n_bands rows/doc); the standing
corpus is scanned map-side once per batch for verify shingles of
candidate-touched docs only (broadcast semi-join prune) — the batch
size, not the corpus size, drives every shuffle. With a transactional
table format the three appends collapse to ACID appends; this module
is the plain-filesystem fallback.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from data_migration_tool_spark.operators import dedup as DD
from data_migration_tool_spark.streaming.txn_sink import (
    append_batch_idempotent,
)

_EMPTY_PAIRS = "id_a long, id_b long, jaccard double"


def _read_state(sess: SparkSession, path: str, schema: str) -> DataFrame:
    """Committed state rows, or an empty frame before the first batch."""
    try:
        df = sess.read.parquet(path)
    except Exception:
        return sess.createDataFrame([], schema)
    return df.drop("batch_id")


def ingest_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    corpus_dir: str,
    pairs_dir: str,
    threshold: float = 0.5,
) -> None:
    """The ``foreachBatch`` body (usable standalone for batch replays).

    Ordering note: pairs are computed BEFORE the state append and
    written FIRST — a crash between the pairs write and the state
    appends replays the whole batch, and every write is idempotent, so
    no interleaving loses or duplicates a pair."""
    if batch.isEmpty():
        return
    sess = batch.sparkSession
    index = _read_state(sess, index_dir, "doc_id long, band int, band_key string")
    standing = _read_state(
        sess, corpus_dir, "doc_id long, text string"
    )
    docs = batch.select("doc_id", "text").persist()
    pairs = DD.minhash_lsh_incremental(
        docs, index, standing, threshold=threshold
    )
    append_batch_idempotent(pairs, batch_id, pairs_dir)
    append_batch_idempotent(DD.lsh_index(docs), batch_id, index_dir)
    append_batch_idempotent(docs, batch_id, corpus_dir)
    docs.unpersist()


def lsh_ingest_stream(
    docs_stream: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
) -> StreamingQuery:
    """Wire a streaming documents source into the incremental-LSH
    ingest. State lives under ``state_root``/{index,corpus,pairs}."""
    index_dir = os.path.join(state_root, "index")
    corpus_dir = os.path.join(state_root, "corpus")
    pairs_dir = os.path.join(state_root, "pairs")

    def _apply(batch: DataFrame, batch_id: int) -> None:
        ingest_batch(
            batch, batch_id, index_dir, corpus_dir, pairs_dir, threshold
        )

    return (
        docs_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
