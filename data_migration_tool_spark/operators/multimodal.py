"""Multimodal column handling: images/audio/video as opaque ``binary``
columns with typed metadata structs.

The Spark-side plumbing (schemas, Arrow-batched mapInPandas transforms,
partitioning) is real and tested; the actual media decoding is stubbed
behind ``_decode_bytes`` because codec libraries are not available in
this environment — the stub is deterministic so pipelines and tests are
reproducible. Swapping in PIL/librosa/etc. changes only that function.

Scale: mapInPandas streams Arrow record batches, so executors hold one
batch of media blobs at a time; set
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (e.g. 64) for
large blobs. Feature extraction keyed by content hash enables
dedup-before-decode — decode each distinct blob once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _decode_bytes(content: bytes, kind: str, dim: int = 8) -> list[float]:
    """STUB decoder: deterministic pseudo-features from the raw bytes.

    Real deployments replace this with PIL / torchaudio / ffmpeg frame
    sampling; everything around it (batching, schema, partitioning)
    stays identical.
    """
    import hashlib

    h = hashlib.sha256(content or b"").digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(
    media: DataFrame, dim: int = 8, feature_type: str = "float"
) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    Pattern: dedup on content hash BEFORE decode (each distinct blob is
    decoded once), then the cheap features join back to all rows.

    ``feature_type``: ``float`` (storage-friendly) or ``double`` (when
    downstream compares values bit-exactly — float32 narrowing rounds).
    """
    hashed = media.withColumn("content_sha", F.sha2(F.col("content"), 256))
    distinct_blobs = hashed.select("content_sha", "kind", "content").dropDuplicates(
        ["content_sha"]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_bytes(c, k, dim)
                for c, k in zip(pdf["content"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {"content_sha": pdf["content_sha"], "features": feats}
            )

    decoded = distinct_blobs.mapInPandas(
        decode, f"content_sha string, features array<{feature_type}>"
    )
    return (
        hashed.join(decoded, "content_sha")
        .select(
            "media_id",
            "kind",
            "content_sha",
            F.length(F.col("content")).cast("long").alias("n_bytes"),
            "features",
        )
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    timestamp (duration from metadata), decode stubbed. Demonstrates the
    explode-by-timeline pattern used for frame-level pipelines."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/demos (no codec libs)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        content = bytes([(i * 7 + j) % 256 for j in range(32 + (i % 5) * 16)])
        meta = (
            64 + i % 4 * 32 if kind == "image" else None,
            48 + i % 3 * 16 if kind == "image" else None,
            (1 + i % 7) * 1000 if kind in ("audio", "video") else None,
            f"x/{kind}",
        )
        rows.append((i, kind, content, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
