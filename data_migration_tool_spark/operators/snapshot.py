"""Corpus snapshot diff — incremental versioning between two corpus
states (yesterday's crawl vs today's): which documents were added,
removed, or changed in place.

The reference's incremental protocols diff at FILE grain (dated staging
+ audit anti-joins, ``sources/incremental.py``); this operator is the
DATA-grain twin a training pipeline needs before deciding what to
re-embed / re-dedup: a full-outer join of the two snapshots on the id,
comparing content fingerprints (``functions.text.fingerprint`` — md5 of
normalized text) where both sides exist.

Scale: each snapshot reduces to (id, 16-byte fingerprint) AT THE SCAN
(column-pruned, ~24 B/row — the same width trick as DVT row
validation); the full-outer join is one id-keyed SMJ; the per-status
counts partial-aggregate to three rows. Nothing text-width ever
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_tool_spark.functions.text import fingerprint


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document diff status: (id, status ∈ added|removed|changed|
    unchanged). Deterministic — derives solely from ids and content
    fingerprints."""
    o = old.select(F.col(id_col).alias("id"), fingerprint(text_col).alias("old_fp"))
    n = new.select(F.col(id_col).alias("id"), fingerprint(text_col).alias("new_fp"))
    joined = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col("id").alias(id_col), status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(status, n_docs) rollup of ``snapshot_diff``."""
    return (
        snapshot_diff(old, new, id_col, text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
