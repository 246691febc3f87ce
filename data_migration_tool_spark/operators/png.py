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

Scope: bit depth 8, grayscale (color type 0) and truecolor RGB (2),
non-interlaced. Palette/alpha/16-bit/Adam7 return ``None`` →
``decode_media``'s disclosed null branch.

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
    prev = np.zeros(w * nch, dtype=np.int16)
    lines = []
    for y in range(h):
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
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines), level))
        + _chunk(b"IEND", b"")
    )


def decode_png(content: bytes) -> np.ndarray | None:
    """(H, W) gray or (H, W, 3) RGB uint8, or ``None`` when the stream
    is not a decodable 8-bit gray/RGB non-interlaced PNG (wrong magic,
    palette, alpha, 16-bit, Adam7, bad CRC, truncated)."""
    if len(content) < 8 or content[:8] != _MAGIC:
        return None
    pos = 8
    ihdr = None
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
                if depth != 8 or color_type not in (0, 2) or comp or filt or interlace:
                    return None
                ihdr = (w, h, 1 if color_type == 0 else 3)
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
            pos += 12 + length
        if ihdr is None or not idat:
            return None
        w, h, nch = ihdr
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
        return img[:, :, 0] if nch == 1 else img
    except (struct.error, zlib.error, IndexError, ValueError):
        return None
