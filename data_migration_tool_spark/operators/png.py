"""PNG (ISO 15948) encoder + decoder: stdlib zlib + numpy.

The LOSSLESS sibling of the r9 JPEG lane (``operators/jpeg.py``):
where JPEG's exact gate query needs constant tiles at unit
quantization, PNG round-trips EVERY pixel bit-exactly by definition,
so the decode gate query can pin arbitrary per-pixel content. Same
independence convention as the rest of the multimodal lane: the
encoder picks per-row filters with the standard minimum-SAD heuristic
and writes chunk CRCs; the decoder re-walks the chunk stream, checks
CRCs, inflates, and reverses whichever filters the file actually used
— shared code between the two directions is zero beyond the constants
of the spec.

Scope: bit depth 8, grayscale (color type 0), truecolor RGB (2), and
indexed palette (3 — r10, the most common real-world variant after
truecolor; pure index→RGB lookup, still lossless), non-interlaced.
Alpha (incl. tRNS)/16-bit/sub-8-bit/Adam7 return ``None`` →
``decode_media``'s disclosed null branch, permanently (the codec
lane's declared endpoint — COVERAGE.md).

Scale posture: identical to JPEG — per-distinct-blob Python inside the
Arrow-batched ``mapInPandas`` decode stage; zlib does the heavy
lifting in C, so PNG decode sustains far higher throughput than the
demonstration-grade JPEG entropy decoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _residual_sad(res: np.ndarray) -> int:
    """Sum of mod-256 SIGNED residual magnitudes, min(r, 256-r) on the
    unsigned byte. An ``abs(res.astype(int8))`` shortcut overflows at
    -128 (abs(int8(-128)) == -128) and shaves 256 per occurrence off
    that candidate's SAD — output stays decodable either way (every
    filter choice is valid), but the pick can be suboptimal."""
    r = (res & 0xFF).astype(np.int32)
    return int(np.minimum(r, 256 - r).sum())


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a row (int16/int32 inputs)."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """PNG bytes from an (H, W) grayscale or (H, W, 3) RGB uint8 array.
    Per-row filter chosen by the standard minimum sum-of-absolute-
    differences heuristic over all five filter types — so real files
    routinely mix None/Sub/Up/Average/Paeth rows and the decoder's
    every unfilter path has a producer."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, nch = 0, 1
        px = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, nch = 2, 3
    else:
        raise ValueError("encode_png expects (H,W) gray or (H,W,3) RGB")
    h, w = px.shape[:2]
    raw = px.reshape(h, w * nch).astype(np.int16)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_filter_scanlines(raw, nch), level))
        + _chunk(b"IEND", b"")
    )


def _filter_scanlines(raw: np.ndarray, nch: int) -> bytes:
    """Serialize (H, stride) int16 scanlines with per-row min-SAD
    filter selection over all five PNG filter types — shared by the
    truecolor/gray and palette encoders (filters operate on BYTES, so
    index scanlines filter exactly like 1-channel samples)."""
    prev = np.zeros(raw.shape[1], dtype=np.int16)
    lines = []
    for y in range(raw.shape[0]):
        row = raw[y]
        left = np.concatenate([np.zeros(nch, np.int16), row[:-nch]])
        upleft = np.concatenate([np.zeros(nch, np.int16), prev[:-nch]])
        cands = [
            (0, row),
            (1, row - left),
            (2, row - prev),
            (3, row - ((left + prev) >> 1)),
            (4, row - _paeth(left, prev, upleft).astype(np.int16)),
        ]
        ft, best = min(cands, key=lambda c: _residual_sad(c[1]))
        lines.append(bytes([ft]) + (best & 0xFF).astype(np.uint8).tobytes())
        prev = row
    return b"".join(lines)


def encode_png_palette(
    indices: np.ndarray, palette: np.ndarray, level: int = 6
) -> bytes:
    """Indexed-color PNG (color type 3, bit depth 8): ``indices`` is
    (H, W) uint8 into ``palette`` (N×3 uint8 RGB, N ≤ 256). The
    dominant real-world PNG variant after truecolor — icons, charts,
    quantized thumbnails — and still fully lossless: the decoder's
    index→RGB lookup must reproduce every pixel bit-exactly."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("encode_png_palette expects (H,W) index array")
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError("palette must be (N,3) uint8 with 1 <= N <= 256")
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("index out of palette range")
    h, w = idx.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(
            b"IDAT",
            zlib.compress(_filter_scanlines(idx.astype(np.int16), 1), level),
        )
        + _chunk(b"IEND", b"")
    )


def decode_png(content: bytes) -> np.ndarray | None:
    """(H, W) gray or (H, W, 3) RGB uint8, or ``None`` when the stream
    is not a decodable 8-bit gray/RGB/palette non-interlaced PNG (wrong
    magic, alpha incl. tRNS, 16-bit, sub-8-bit palette, Adam7, bad CRC,
    truncated). Palette streams (color type 3, r10) return the RGB
    lookup — lossless like the other PNG forms."""
    if len(content) < 8 or content[:8] != _MAGIC:
        return None
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    try:
        while pos + 8 <= len(content):
            length, tag = struct.unpack_from(">I4s", content, pos)
            data = content[pos + 8 : pos + 8 + length]
            if len(data) < length:
                return None
            crc = struct.unpack_from(">I", content, pos + 8 + length)[0]
            if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
                return None
            if tag == b"IHDR":
                w, h, depth, color_type, comp, filt, interlace = (
                    struct.unpack(">IIBBBBB", data)
                )
                if (
                    depth != 8
                    or color_type not in (0, 2, 3)
                    or comp or filt or interlace
                ):
                    return None
                # palette scanlines carry 1 index byte per pixel; the
                # RGB expansion happens after unfiltering
                ihdr = (w, h, 1 if color_type in (0, 3) else 3, color_type)
            elif tag == b"PLTE":
                if length % 3 or not 3 <= length <= 768:
                    return None
                plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
            elif tag == b"tRNS":
                return None  # alpha (even paletted) is out of scope
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
            pos += 12 + length
        if ihdr is None or not idat:
            return None
        w, h, nch, color_type = ihdr
        if color_type == 3 and plte is None:
            return None
        raw = zlib.decompress(bytes(idat))
        stride = w * nch
        if len(raw) != h * (stride + 1):
            return None
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            ft = raw[y * (stride + 1)]
            row = np.frombuffer(
                raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
            ).astype(np.int32)
            if ft == 0:
                cur = row
            elif ft == 1:
                cur = row.copy()
                for i in range(nch, stride):
                    cur[i] = (cur[i] + cur[i - nch]) & 0xFF
            elif ft == 2:
                cur = (row + prev) & 0xFF
            elif ft == 3:
                cur = row.copy()
                up = prev.astype(np.int32)
                for i in range(stride):
                    left = cur[i - nch] if i >= nch else 0
                    cur[i] = (cur[i] + ((left + up[i]) >> 1)) & 0xFF
            elif ft == 4:
                cur = row.copy()
                up = prev.astype(np.int32)
                for i in range(stride):
                    a = cur[i - nch] if i >= nch else 0
                    b = up[i]
                    c = prev[i - nch] if i >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (cur[i] + pred) & 0xFF
            else:
                return None
            out[y] = cur.astype(np.uint8)
            prev = out[y]
        img = out.reshape(h, w, nch)
        if color_type == 3:
            if int(img.max(initial=0)) >= plte.shape[0]:
                return None  # index beyond the palette: invalid stream
            return plte[img[:, :, 0]]
        return img[:, :, 0] if nch == 1 else img
    except (struct.error, zlib.error, IndexError, ValueError):
        return None
