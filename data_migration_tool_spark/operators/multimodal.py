"""Multimodal column handling: images/audio/video as opaque ``binary``
columns with typed metadata structs.

Image (BMP 24-bit AND baseline JPEG — the pure-numpy codec in
``operators/jpeg.py``, r9), audio (WAV PCM16), and video (uncompressed
RIFF AVI with raw BGR24 '00db' frames) decoding is REAL: the parsers
read the container headers and pixel/sample/frame payloads with
struct+numpy — no codec library needed, including the JPEG entropy
decode. Remaining compressed codecs (MP3, H.264, progressive JPEG)
stay out of scope in this environment (no ffmpeg): such blobs fall
through to null decoded fields plus content hash/byte length, and
swapping in a codec library changes only ``decode_media``'s fallback
branch.

Scale: mapInPandas streams Arrow record batches, so executors hold one
batch of media blobs at a time; set
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (e.g. 64) for
large blobs. Feature extraction keyed by content hash enables
dedup-before-decode — decode each distinct blob once.

Reference parity: the reference treats media objects as opaque blobs
moved between buckets (src/common_utils/storage_utils.py); the decode /
feature-extract stage is the LLM-pipeline extension on top.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
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
    """STUB embedding: deterministic pseudo-features from the raw bytes.

    Used by :func:`extract_features` for the fixed-width feature-vector
    path; the REAL header/payload decoders live in :func:`decode_media`.
    """
    import hashlib

    h = hashlib.sha256(content or b"").digest()
    return [b / 255.0 for b in h[:dim]]


# ---------------------------------------------------------------------------
# Real codecs: BMP (24-bit uncompressed) and WAV (PCM16) encode + decode.
# Encoder and decoder are independent code paths (writer packs headers,
# parser re-reads them), so round-trip tests genuinely exercise parsing.
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Write a 24-bit uncompressed BMP; ``pixel_fn(x, y) -> 0..255`` gray."""
    row_size = (3 * width + 3) // 4 * 4
    img_size = row_size * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):  # BMP stores rows bottom-up
        row = bytearray()
        for x in range(width):
            v = pixel_fn(x, y) & 0xFF
            row += bytes((v, v, v))  # B, G, R
        row += b"\x00" * (row_size - len(row))
        rows.append(bytes(row))
    return header + dib + b"".join(rows)


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Write a mono PCM16 WAV (canonical 44-byte RIFF header)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def encode_avi(
    width: int, height: int, n_frames: int, fps: int, pixel_fn
) -> bytes:
    """Write an uncompressed RIFF AVI: raw bottom-up BGR24 '00db' frames
    (DIB row stride padded to 4), avih/strh/strf headers.
    ``pixel_fn(x, y, f) -> 0..255`` gray."""
    stride = (3 * width + 3) // 4 * 4
    fsize = stride * height

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(data)) + data + b"\x00" * (len(data) & 1)

    frames = []
    for f in range(n_frames):
        rows = []
        for y in range(height - 1, -1, -1):  # bottom-up like BMP
            row = bytearray()
            for x in range(width):
                v = pixel_fn(x, y, f) & 0xFF
                row += bytes((v, v, v))
            row += b"\x00" * (stride - len(row))
            rows.append(bytes(row))
        frames.append(b"".join(rows))

    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I", us_per_frame, 0, 0, 0, n_frames, 0, 1, fsize, width, height,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n_frames, fsize, 0, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, fsize, 0, 0, 0, 0
    )
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) + b"strl"
    strl += chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl_body = chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_body)) + b"hdrl" + hdrl_body
    movi_body = b"".join(chunk(b"00db", fr) for fr in frames)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


_NULL_DECODE = {
    "width": None, "height": None, "n_channels": None, "mean_luma": None,
    "sample_rate": None, "n_samples": None, "duration_ms": None, "rms": None,
    "n_frames": None, "fps": None,
}


def _decode_bmp(content: bytes) -> dict | None:
    if len(content) < 54 or content[:2] != b"BM":
        return None
    offset = struct.unpack_from("<I", content, 10)[0]
    w = struct.unpack_from("<i", content, 18)[0]
    h = struct.unpack_from("<i", content, 22)[0]
    bpp = struct.unpack_from("<H", content, 28)[0]
    comp = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    n_rows = abs(h)
    row_size = (3 * w + 3) // 4 * 4
    if offset + row_size * n_rows > len(content):
        return None
    arr = np.frombuffer(
        content, np.uint8, count=row_size * n_rows, offset=offset
    ).reshape(n_rows, row_size)
    px = arr[:, : 3 * w].astype(np.float64)
    out = dict(_NULL_DECODE)
    out.update(
        width=w, height=n_rows, n_channels=3, mean_luma=float(px.mean())
    )
    return out


def _decode_wav(content: bytes) -> dict | None:
    if len(content) < 44 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    pos, rate, channels, bits, samples = 12, None, None, None, None
    while pos + 8 <= len(content):
        cid, size = struct.unpack_from("<4sI", content, pos)
        pos += 8
        if cid == b"fmt " and size >= 16:
            _, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", content, pos
            )
        elif cid == b"data":
            n = min(size, len(content) - pos) // 2
            samples = np.frombuffer(content, "<i2", count=n, offset=pos)
        pos += size + (size & 1)
    if rate is None or samples is None or bits != 16 or channels != 1:
        return None
    s = samples.astype(np.float64)
    out = dict(_NULL_DECODE)
    out.update(
        sample_rate=int(rate),
        n_samples=int(len(samples)),
        duration_ms=len(samples) * 1000.0 / rate,
        rms=float(math.sqrt(float((s * s).mean()))) if len(s) else 0.0,
    )
    return out


def _parse_avi(content: bytes) -> tuple[tuple, list[bytes]] | None:
    """RIFF walk: returns (avih fields, raw '00db'/'00dc' frame payloads)
    in stream order, or None if not an AVI."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        return None
    state = {"avih": None}
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", content, pos)
            body = pos + 8
            limit = min(body + size, end)
            if cid == b"LIST":
                walk(body + 4, limit)
            elif cid == b"avih" and size >= 56:
                state["avih"] = struct.unpack_from("<14I", content, body)
            elif cid in (b"00db", b"00dc"):
                frames.append(content[body:limit])
            pos = body + size + (size & 1)

    walk(12, min(len(content), 8 + struct.unpack_from("<I", content, 4)[0]))
    if state["avih"] is None:
        return None
    return state["avih"], frames


def _avi_frame_arrays(
    content: bytes,
) -> tuple[int, int, int, list[np.ndarray]] | None:
    """Shared AVI payload decode: (us_per_frame, width, height, cropped
    per-frame uint8 arrays) or None. The single owner of the stride /
    bounds / reshape logic for both the summary decode and the
    frame-grain sampler."""
    parsed = _parse_avi(content)
    if parsed is None:
        return None
    avih, frames = parsed
    us_per_frame, w, h = avih[0], avih[8], avih[9]
    if not frames or w <= 0 or h <= 0 or us_per_frame <= 0:
        return None
    stride = (3 * w + 3) // 4 * 4
    mats = []
    for fr in frames:
        if len(fr) < stride * h:
            return None
        mats.append(
            np.frombuffer(fr, np.uint8, count=stride * h).reshape(h, stride)[:, : 3 * w]
        )
    return int(us_per_frame), int(w), int(h), mats


def _decode_avi(content: bytes) -> dict | None:
    decoded = _avi_frame_arrays(content)
    if decoded is None:
        return None
    us_per_frame, w, h, mats = decoded
    px = np.stack(mats).astype(np.float64)
    out = dict(_NULL_DECODE)
    out.update(
        width=w,
        height=h,
        n_channels=3,
        mean_luma=float(px.mean()),
        n_frames=len(mats),
        fps=int(round(1_000_000 / us_per_frame)),
        duration_ms=len(mats) * (us_per_frame / 1000.0),
    )
    return out


def _decode_jpeg(content: bytes) -> dict | None:
    """Baseline JPEG via the pure-numpy codec (``operators/jpeg.py``,
    r9 — the first COMPRESSED container with a real decode lane).
    ``mean_luma`` is the Rec.601 luma mean of the decoded pixels (for
    the repo's grayscale BMPs, identical to the all-channel mean the
    BMP parser reports). Progressive/arithmetic/12-bit streams return
    None → the disclosed null branch below, as before."""
    if len(content) < 3 or content[:3] != b"\xff\xd8\xff":
        return None
    from data_migration_tool_spark.operators.jpeg import decode_jpeg

    px = decode_jpeg(content)
    if px is None:
        return None
    if px.ndim == 2:
        luma = px.astype(np.float64)
        nch = 1
    else:
        rgb = px.astype(np.float64)
        luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        nch = 3
    out = dict(_NULL_DECODE)
    out.update(
        width=int(px.shape[1]), height=int(px.shape[0]),
        n_channels=nch, mean_luma=float(luma.mean()),
    )
    return out


def _decode_png(content: bytes) -> dict | None:
    """PNG via the stdlib-zlib codec (``operators/png.py``, r9 — the
    lossless compressed lane). Same ``mean_luma`` convention as the
    JPEG parser: Rec.601 over decoded pixels, identical to the plain
    mean for grayscale; palette streams (r10) decode via the index→RGB
    lookup. Alpha/16-bit/interlaced return None →
    the disclosed null branch."""
    if len(content) < 8 or content[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    from data_migration_tool_spark.operators.png import decode_png

    px = decode_png(content)
    if px is None:
        return None
    if px.ndim == 2:
        luma = px.astype(np.float64)
        nch = 1
    else:
        rgb = px.astype(np.float64)
        luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        nch = 3
    out = dict(_NULL_DECODE)
    out.update(
        width=int(px.shape[1]), height=int(px.shape[0]),
        n_channels=nch, mean_luma=float(luma.mean()),
    )
    return out


def decode_media(content: bytes) -> dict:
    """Dispatch on magic bytes (BMP / WAV / uncompressed AVI / baseline
    JPEG / PNG); remaining unknown containers (MP3, H.264 — no ffmpeg
    in this env) fall through to all-null decoded fields — the
    disclosed stub branch."""
    content = content or b""
    for parser in (_decode_bmp, _decode_wav, _decode_avi, _decode_jpeg, _decode_png):
        out = parser(content)
        if out is not None:
            return out
    return dict(_NULL_DECODE)


MEDIA_DECODE_FIELDS = (
    "content_sha string, width int, height int, n_channels int, "
    "mean_luma double, sample_rate int, n_samples int, duration_ms double, "
    "rms double, n_frames int, fps int"
)


def spread_for_cpu(df: DataFrame, key: str = "content_sha") -> DataFrame:
    """Pin the partition count of a frame feeding a CPU-bound codec
    stage to the cluster's parallelism. AQE coalesces post-shuffle
    partitions by BYTE size, which misprices per-blob Python codec work
    (a kilobyte blob can cost milliseconds of decode CPU): on a small
    corpus every distinct blob lands in ONE coalesced partition and the
    Arrow stage runs single-threaded. An exchange with an explicit
    ``numPartitions`` is exempt from AQE coalescing, so one task per
    core survives at any corpus size. Placed AFTER the dedup shuffle so
    map-side partial dedup keeps shrinking the first exchange on
    dup-heavy corpora; the extra exchange moves DISTINCT blobs only,
    which the per-blob decode CPU dwarfs."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, key)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Real decode pipeline: content hashed, distinct blobs parsed ONCE
    (Arrow batches through :func:`decode_media`), scalar decoded fields
    joined back to every row. Same dedup-before-decode shape as
    :func:`extract_features` — at 100 TB duplicate media decode cost
    collapses to one per distinct blob."""
    hashed = media.withColumn("content_sha", F.sha2(F.col("content"), 256))
    distinct_blobs = spread_for_cpu(
        hashed.select("content_sha", "content").dropDuplicates(
            ["content_sha"]
        )
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [decode_media(c) for c in pdf["content"]]
            out = pd.DataFrame.from_records(recs)
            out.insert(0, "content_sha", pdf["content_sha"].values)
            yield out

    decoded = distinct_blobs.mapInPandas(decode, MEDIA_DECODE_FIELDS)
    return hashed.join(decoded, "content_sha").select(
        "media_id",
        "kind",
        "content_sha",
        F.length(F.col("content")).cast("long").alias("n_bytes"),
        "width",
        "height",
        "n_channels",
        "mean_luma",
        "sample_rate",
        "n_samples",
        "duration_ms",
        "rms",
        "n_frames",
        "fps",
    )


def sample_frames(media: DataFrame) -> DataFrame:
    """Per-frame video decode: one row per (media_id, frame) with the
    frame's timestamp and mean luma — a REAL payload parse of
    uncompressed AVI frames in Arrow batches (``mapInPandas``), the
    frame-level twin of :func:`extract_media_features`. Non-AVI video
    blobs are skipped. At scale the batch size bounds executor memory
    to one Arrow batch of blobs; the output is frame-grain rows, ready
    for downstream per-frame featurization."""

    vids = media.filter(F.col("kind") == "video").select("media_id", "content")

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts, lumas = [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                decoded = _avi_frame_arrays(bytes(c) if c is not None else b"")
                if decoded is None:
                    continue
                usf, _w, _h, mats = decoded
                for fi, arr in enumerate(mats):
                    ids.append(int(mid))
                    idxs.append(fi)
                    ts.append(fi * (usf / 1000.0))
                    lumas.append(float(arr.astype(np.float64).mean()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(ts, dtype="float64"),
                    "mean_luma": pd.Series(lumas, dtype="float64"),
                }
            )

    return vids.mapInPandas(
        dec, "media_id long, frame_idx int, frame_ts_ms double, mean_luma double"
    )


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
    distinct_blobs = spread_for_cpu(
        hashed.select("content_sha", "kind", "content").dropDuplicates(
            ["content_sha"]
        )
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
    """Deterministic media table for tests/demos: image rows are real
    BMPs, audio rows real WAVs, video rows real uncompressed AVIs — so
    every decode path is genuinely exercised."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 4 + i % 5, 3 + i % 4
            content = encode_bmp(w, h, lambda x, y, i=i: (i + x + 3 * y) % 256)
            meta = (w, h, None, "image/bmp")
        elif kind == "audio":
            samples = [((i * 131 + j * 17) % 2001) - 1000 for j in range(16 + i % 9)]
            content = encode_wav(8000, samples)
            meta = (None, None, int(len(samples) * 1000 / 8000), "audio/wav")
        else:
            w, h, nf = 4 + i % 5, 3 + i % 4, 2 + i % 3
            content = encode_avi(
                w, h, nf, 5, lambda x, y, f, i=i: (i + x + 3 * y + 5 * f) % 256
            )
            meta = (w, h, nf * 200, "video/avi")
        rows.append((i, kind, content, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def resize_images(media: DataFrame, factor: int = 2) -> DataFrame:
    """Nearest-neighbor downsample of BMP images by ``factor`` — the
    resize stage of a vision-data pipeline (thumbnailing before feature
    extraction). Real pixel work: decode the 24-bit BMP, normalize to
    logical top-down orientation (BMP stores rows bottom-up), take
    every ``factor``-th pixel from (0,0), and report the downsampled
    dims plus integer pixel sum (exact) and mean (derived sum/count, so
    no float-accumulation-order dependence).

    Same dedup-before-decode shape as ``extract_media_features``:
    distinct blobs resize once, results join back by content hash."""
    import struct as _struct

    hashed = media.withColumn("content_sha", F.sha2(F.col("content"), 256))
    distinct_blobs = spread_for_cpu(
        hashed.select("content_sha", "content").dropDuplicates(
            ["content_sha"]
        )
    )

    def _resize_one(content: bytes) -> tuple:
        if len(content) < 54 or content[:2] != b"BM":
            return (None, None, None)
        offset = _struct.unpack_from("<I", content, 10)[0]
        w = _struct.unpack_from("<i", content, 18)[0]
        h = _struct.unpack_from("<i", content, 22)[0]
        bpp = _struct.unpack_from("<H", content, 28)[0]
        comp = _struct.unpack_from("<I", content, 30)[0]
        if bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return (None, None, None)
        n_rows = abs(h)
        row_size = (3 * w + 3) // 4 * 4
        if offset + row_size * n_rows > len(content):
            return (None, None, None)
        arr = np.frombuffer(
            content, np.uint8, count=row_size * n_rows, offset=offset
        ).reshape(n_rows, row_size)
        px = arr[:, : 3 * w].reshape(n_rows, w, 3)
        logical = px[::-1] if h > 0 else px  # undo bottom-up storage
        ds = logical[::factor, ::factor, 0]  # grayscale: channels equal
        return (
            int(ds.shape[1]),
            int(ds.shape[0]),
            int(ds.astype(np.int64).sum()),
        )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [_resize_one(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "content_sha": pdf["content_sha"].values,
                    "out_w": pd.array([r[0] for r in recs], dtype="Int32"),
                    "out_h": pd.array([r[1] for r in recs], dtype="Int32"),
                    "ds_pixel_sum": pd.array(
                        [r[2] for r in recs], dtype="Int64"
                    ),
                }
            )

    resized = distinct_blobs.mapInPandas(
        dec, "content_sha string, out_w int, out_h int, ds_pixel_sum long"
    )
    return hashed.join(resized, "content_sha").select(
        "media_id",
        "out_w",
        "out_h",
        "ds_pixel_sum",
        F.round(
            F.col("ds_pixel_sum").cast("double")
            / (F.col("out_w") * F.col("out_h")).cast("double"),
            6,
        ).alias("ds_mean_luma"),
    )


def decode_image_array(content: bytes) -> np.ndarray | None:
    """Pixel array ((H, W) gray or (H, W, 3) RGB uint8, logical
    top-down orientation) from any image container this lane decodes —
    BMP 24-bit, baseline JPEG, PNG. ``None`` for everything else. The
    format-bridging primitive under :func:`transcode_images`."""
    content = content or b""
    if len(content) >= 54 and content[:2] == b"BM":
        offset = struct.unpack_from("<I", content, 10)[0]
        w = struct.unpack_from("<i", content, 18)[0]
        h = struct.unpack_from("<i", content, 22)[0]
        bpp = struct.unpack_from("<H", content, 28)[0]
        comp = struct.unpack_from("<I", content, 30)[0]
        n_rows = abs(h)
        row_size = (3 * w + 3) // 4 * 4
        if (
            bpp != 24 or comp != 0 or w <= 0 or h == 0
            or offset + row_size * n_rows > len(content)
        ):
            return None
        arr = np.frombuffer(
            content, np.uint8, count=row_size * n_rows, offset=offset
        ).reshape(n_rows, row_size)
        px = arr[:, : 3 * w].reshape(n_rows, w, 3)
        logical = px[::-1] if h > 0 else px  # undo bottom-up storage
        return logical[:, :, ::-1].copy()  # BGR → RGB
    if content[:3] == b"\xff\xd8\xff":
        from data_migration_tool_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(content)
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        from data_migration_tool_spark.operators.png import decode_png

        return decode_png(content)
    return None


def _block_mean(px: np.ndarray, factor: int) -> np.ndarray:
    """factor×factor block mean with FLOOR division (exact integer
    arithmetic — no float accumulation), edge-replicated to a multiple
    of ``factor`` first so border pixels keep their weight."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    pad_h, pad_w = -h % factor, -w % factor
    px = np.pad(px, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    hh, ww = px.shape[0] // factor, px.shape[1] // factor
    sums = (
        px.astype(np.int64)
        .reshape(hh, factor, ww, factor, c)
        .sum(axis=(1, 3))
    )
    out = (sums // (factor * factor)).astype(np.uint8)
    return out[:, :, 0] if c == 1 else out


def scene_changes(media: DataFrame, threshold: int = 1000) -> DataFrame:
    """Shot-cut detection over uncompressed AVI blobs: exact integer
    sum of absolute differences (SAD) between consecutive frames' full
    BGR payloads, flagged as a cut where ``sad > threshold`` — the
    standard pre-sampling step of a video training pipeline (sample
    densely around cuts, sparsely inside still shots). Consecutive
    frames live inside ONE blob, so the differencing happens entirely
    inside the decode's Arrow pass: frame-grain rows come out, but no
    shuffle ever carries pixels, and the operator is embarrassingly
    parallel per blob. Output (media_id, frame_idx, sad, is_cut) for
    frames 1..n_frames-1; non-AVI blobs are skipped (disclosed null
    branch, same contract as :func:`sample_frames`)."""
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "content"
    )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sads = [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                decoded = _avi_frame_arrays(bytes(c) if c is not None else b"")
                if decoded is None:
                    continue
                _usf, _w, _h, mats = decoded
                prev = None
                for fi, arr in enumerate(mats):
                    cur = arr.astype(np.int64)
                    if prev is not None:
                        ids.append(int(mid))
                        idxs.append(fi)
                        sads.append(int(np.abs(cur - prev).sum()))
                    prev = cur
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "sad": sads}
            )

    framed = vids.mapInPandas(dec, "media_id long, frame_idx int, sad long")
    return framed.withColumn("is_cut", F.col("sad") > F.lit(threshold))


def vad_segments(
    frames: DataFrame, energy_num: int = 400_000, energy_den: int = 1
) -> DataFrame:
    """Voice-activity segments from framed audio energy (the output of
    :func:`frame_audio`): a frame is ACTIVE iff its mean square power
    exceeds ``energy_num / energy_den`` — evaluated as the exact
    integer cross-multiplication ``sq_sum · energy_den > n_samples ·
    energy_num`` (no float division, engine-portable) — and runs of
    consecutive active frames collapse to one segment row via
    gaps-and-islands (frame_idx − row_number is constant within a
    run). Output per segment: (media_id, seg_start, seg_end, n_frames,
    total_sq).

    Scale shape: one media_id-keyed exchange serves the row_number
    window; the segment aggregation is partial-agg'd map-side on
    (media_id, island). State is frame-grain, never samples."""
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    active = frames.filter(
        F.col("sq_sum") * F.lit(energy_den)
        > F.col("n_samples").cast("long") * F.lit(energy_num)
    )
    islands = active.withColumn(
        "island", F.col("frame_idx") - F.row_number().over(w)
    )
    return (
        islands.groupBy("media_id", "island")
        .agg(
            F.min("frame_idx").alias("seg_start"),
            F.max("frame_idx").alias("seg_end"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum("sq_sum").cast("long").alias("total_sq"),
        )
        .drop("island")
    )


def dhash_bits(px: np.ndarray, grid_w: int = 8, grid_h: int = 8) -> int | None:
    """Difference-hash of a decoded pixel array: exact integer tile
    means down to a (grid_h, grid_w+1) grid, then one bit per
    horizontally-adjacent pair (1 iff left mean > right mean) —
    ``grid_w·grid_h`` bits, row-major, returned as a two's-complement
    int64 (bit 63 set ⇒ negative, banding uses arithmetic-shift+mask so
    the sign never matters). RGB inputs collapse to gray by exact
    floor((r+g+b)/3) BEFORE tiling; dims must tile evenly into the
    (grid_w+1)×grid_h lattice, else None (disclosed — a production lane
    resizes first; the exact gate keeps arithmetic integer-only)."""
    if px is None:
        return None
    if px.ndim == 3:
        px = px.astype(np.int64).sum(axis=2) // px.shape[2]
    h, w = px.shape
    cols, rows = grid_w + 1, grid_h
    if w % cols or h % rows:
        return None
    tw, th = w // cols, h // rows
    sums = px.astype(np.int64).reshape(rows, th, cols, tw).sum(axis=(1, 3))
    grid = sums // (tw * th)
    bits = 0
    for by in range(rows):
        for bx in range(grid_w):
            if grid[by, bx] > grid[by, bx + 1]:
                bits |= 1 << (by * grid_w + bx)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def dhash_images(
    media: DataFrame, grid_w: int = 8, grid_h: int = 8
) -> DataFrame:
    """Per-image perceptual hash (dHash) over binary image columns:
    decode any supported container (BMP/JPEG/PNG), exact integer tile
    means, adjacent-mean comparison bits — (media_id, dhash long). The
    fingerprint half of image near-dup dedup; feed the output to
    ``operators/dedup.hamming_near_dup_pairs(bits=64, bands=4)`` for
    the band-blocked pair join. Same dedup-before-decode shape as the
    rest of the lane: distinct blobs hash once, results join back by
    content hash — at 100 TB the decode+hash cost is per DISTINCT
    image and embarrassingly parallel."""
    hashed = media.withColumn("content_sha", F.sha2(F.col("content"), 256))
    distinct_blobs = spread_for_cpu(
        hashed.select("content_sha", "content").dropDuplicates(
            ["content_sha"]
        )
    )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shas, sigs = [], []
            for sha, c in zip(pdf["content_sha"], pdf["content"]):
                px = decode_image_array(bytes(c) if c is not None else b"")
                sigs.append(dhash_bits(px, grid_w, grid_h))
                shas.append(sha)
            yield pd.DataFrame(
                {
                    "content_sha": shas,
                    "dhash": pd.array(sigs, dtype="Int64"),
                }
            )

    sigs = distinct_blobs.mapInPandas(dec, "content_sha string, dhash long")
    return hashed.join(sigs, "content_sha").select("media_id", "dhash")


def transcode_images(
    media: DataFrame,
    factor: int = 2,
    out_format: str = "png",
    jpeg_quality: int = 85,
) -> DataFrame:
    """Format-bridging image preprocessing: decode ANY supported
    container (BMP/JPEG/PNG), downscale by ``factor`` with exact
    integer block means, re-encode as ``out_format`` ("png" lossless,
    or "jpeg" at ``jpeg_quality`` — quality 100 is unit quantization,
    bit-exact for constant 8×8 blocks, which is what the JPEG leg's
    gate query exploits) — the normalize-the-corpus stage of a vision
    -data pipeline (mixed crawl formats → one training format at
    thumbnail resolution). Undecodable blobs pass through with null
    outputs (disclosed, filterable) rather than failing the batch.

    Output per media row: ``content_sha``, input dims, output dims,
    ``out_bytes``, and the transcoded blob itself (binary). Same
    dedup-before-decode shape as the rest of the lane: distinct blobs
    transcode once, results broadcast-join back by content hash. At
    100 TB the recompression cost is per DISTINCT image and
    embarrassingly parallel; Arrow batches bound executor memory."""
    if out_format not in ("png", "jpeg"):
        raise ValueError(f"unsupported out_format {out_format!r}")
    if not isinstance(factor, int) or factor < 1:
        # fail fast on the driver like the out_format check — a zero
        # factor would otherwise surface as ZeroDivisionError deep in
        # the executors' mapInPandas task
        raise ValueError(f"factor must be a positive int, got {factor!r}")
    hashed = media.withColumn("content_sha", F.sha2(F.col("content"), 256))
    distinct_blobs = spread_for_cpu(
        hashed.select("content_sha", "content").dropDuplicates(
            ["content_sha"]
        )
    )

    def _one(content: bytes) -> tuple:
        px = decode_image_array(content)
        if px is None:
            return (None, None, None, None, None, None)
        down = _block_mean(px, factor)
        if out_format == "png":
            from data_migration_tool_spark.operators.png import encode_png

            blob = encode_png(down)
        else:
            from data_migration_tool_spark.operators.jpeg import encode_jpeg

            blob = encode_jpeg(down, quality=jpeg_quality)
        return (
            int(px.shape[1]), int(px.shape[0]),
            int(down.shape[1]), int(down.shape[0]),
            len(blob), blob,
        )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [_one(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "content_sha": pdf["content_sha"].values,
                    "in_w": pd.array([r[0] for r in recs], dtype="Int32"),
                    "in_h": pd.array([r[1] for r in recs], dtype="Int32"),
                    "out_w": pd.array([r[2] for r in recs], dtype="Int32"),
                    "out_h": pd.array([r[3] for r in recs], dtype="Int32"),
                    "out_bytes": pd.array([r[4] for r in recs], dtype="Int64"),
                    "out_content": [r[5] for r in recs],
                }
            )

    done = distinct_blobs.mapInPandas(
        dec,
        "content_sha string, in_w int, in_h int, out_w int, out_h int, "
        "out_bytes long, out_content binary",
    )
    # Plain (shuffled) join, like the rest of the lane: the transcoded
    # side carries blob payloads and is corpus-sized — broadcasting it
    # would ship every output image to every executor.
    return hashed.select("media_id", "content_sha").join(done, "content_sha")


def frame_audio(media: DataFrame, frame_size: int = 8) -> DataFrame:
    """Frame the PCM payload of WAV blobs into fixed-size windows and
    report per-frame energy — the framing primitive under VAD /
    silence trimming / audio feature extraction. Real decode: RIFF
    walk to the data chunk, int16 samples, per-frame integer
    sum-of-squares (exact); RMS derives as sqrt(sq_sum/n) so no float
    accumulation order is involved. Frames explode executor-side in
    the same Arrow pass as the decode; dedup-before-decode as usual."""
    import struct as _struct

    hashed = media.withColumn("content_sha", F.sha2(F.col("content"), 256))
    distinct_blobs = spread_for_cpu(
        hashed.select("content_sha", "content").dropDuplicates(
            ["content_sha"]
        )
    )

    def _frames_of(content: bytes) -> list[tuple]:
        if len(content) < 44 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
            return []
        pos = 12
        samples = None
        while pos + 8 <= len(content):
            cid, size = _struct.unpack_from("<4sI", content, pos)
            if cid == b"data":
                n = size // 2
                samples = _struct.unpack_from(f"<{n}h", content, pos + 8)
                break
            pos += 8 + size + (size & 1)
        if samples is None:
            return []
        out = []
        for f in range(0, (len(samples) + frame_size - 1) // frame_size):
            chunk = samples[f * frame_size : (f + 1) * frame_size]
            out.append((f, len(chunk), sum(int(s) * int(s) for s in chunk)))
        return out

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shas, idxs, ns, sqs = [], [], [], []
            for sha, content in zip(pdf["content_sha"], pdf["content"]):
                for f, n, sq in _frames_of(content):
                    shas.append(sha)
                    idxs.append(f)
                    ns.append(n)
                    sqs.append(sq)
            yield pd.DataFrame(
                {
                    "content_sha": pd.Series(shas, dtype="string"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "sq_sum": pd.Series(sqs, dtype="int64"),
                }
            )

    framed = distinct_blobs.mapInPandas(
        dec, "content_sha string, frame_idx int, n_samples int, sq_sum long"
    )
    return hashed.join(framed, "content_sha").select(
        "media_id",
        "frame_idx",
        "n_samples",
        "sq_sum",
        F.round(
            F.sqrt(F.col("sq_sum").cast("double") / F.col("n_samples").cast("double")),
            6,
        ).alias("rms"),
    )
