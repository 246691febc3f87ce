"""Multimodal plans under the correctness gate.

Media rows are derived deterministically from the ``documents`` table
(text bytes as the opaque binary payload), so the Arrow-batched decode
pipeline (``operators.multimodal``) runs for real AND a SQL oracle can
replicate the stub decoder byte-for-byte (sha256-derived features).
Swapping the stub for a real codec changes only ``_decode_bytes``; this
plumbing — hash-dedup before decode, mapInPandas batching, feature
join-back — is the part that must survive at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_migration_tool_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
)
from data_migration_tool_spark.tables import load_table

def _kind() -> F.Column:
    return (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )


def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode → feature pipeline: content hashed, distinct blobs
    decoded once (Arrow batches), features joined back. At 100 TB the
    dedup-before-decode join is the whole point — duplicate media decode
    cost collapses to one per distinct blob."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        _kind().alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
    )
    feats = extract_features(media, dim=8, feature_type="double")
    return feats.select(
        "media_id",
        "kind",
        "content_sha",
        "n_bytes",
        F.transform("features", lambda x: F.round(x, 6)).alias("features"),
    )


MEDIA_FEATURES_SQL = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       sha256(text) AS content_sha,
       octet_length(encode(text)) AS n_bytes,
       list_transform(range(1, 9),
         i -> round(CAST(concat('0x', substr(sha256(text), (i-1)*2+1, 2)) AS INT) / 255.0, 6)
       ) AS features
FROM documents
"""


def media_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp,
    duration from typed metadata (explode-by-timeline — SURVEY F12/J4
    applied to media)."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        _kind().alias("kind"),
        F.lit(None).cast("binary").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            ((F.col("n_chars") % 7 + 1) * 1000).cast("int").alias("duration_ms"),
            F.lit("x/video").alias("mime"),
        ).alias("meta"),
    )
    return frame_sample_plan(media, every_ms=1000).select(
        "media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")
    )


MEDIA_FRAMES_SQL = """
SELECT doc_id AS media_id,
       unnest(range(0, (n_chars % 7 + 1) * 1000, 1000)) AS frame_ts_ms
FROM documents
WHERE doc_id % 3 = 2
"""
