"""Baseline JPEG codec (operators/jpeg.py, r9): encoder and decoder
are independent code paths (the decoder rebuilds quant + Huffman
tables from the DQT/DHT bytes in the file, never from shared
constants), so these round trips genuinely exercise the format in
both directions. No image library exists in this environment to
cross-check against — the verification IS the round trip plus the
format-level assertions (marker layout, byte stuffing, dimensions).
"""

from __future__ import annotations

import numpy as np
import pytest

from data_migration_tool_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _gradient_rgb(h=50, w=70):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (np.sin(x / 11.0) + 1) * 127,
            (np.cos(y / 9.0) + 1) * 127,
            (x + y) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)


def _rmse(a, b):
    return float(np.sqrt(((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()))


def test_gray_round_trip_high_quality():
    y, x = np.mgrid[0:40, 0:56]
    gray = ((np.sin(x / 9.0) + np.cos(y / 7.0) + 2) / 4 * 255).astype(np.uint8)
    data = encode_jpeg(gray, quality=85)
    assert data[:3] == b"\xff\xd8\xff" and data[-2:] == b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == gray.shape and out.dtype == np.uint8
    assert _rmse(out, gray) < 2.0  # smooth content survives q85 nearly exactly


def test_rgb_444_round_trip():
    rgb = _gradient_rgb()
    out = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert out.shape == rgb.shape
    assert _rmse(out, rgb) < 3.0


def test_rgb_420_subsampled_round_trip():
    """The decoder's subsampled-MCU path against a real 4:2:0 producer:
    2x2 mean-pooled chroma, luma sampling (2,2). Chroma pooling loses
    color detail by design — bound the loss, and require the 4:2:0
    stream to be smaller than 4:4:4 of the same image."""
    rgb = _gradient_rgb()
    b444 = encode_jpeg(rgb, quality=90)
    b420 = encode_jpeg(rgb, quality=90, subsample=True)
    assert len(b420) < len(b444)
    out = decode_jpeg(b420)
    assert out.shape == rgb.shape
    assert _rmse(out, rgb) < 8.0
    # odd dimensions exercise the chroma pad/crop paths
    odd = rgb[:49, :63]
    out_odd = decode_jpeg(encode_jpeg(odd, quality=85, subsample=True))
    assert out_odd.shape == odd.shape
    assert _rmse(out_odd, odd) < 8.0


def test_restart_markers_bit_identical():
    """DRI/RSTn resync must not change a single pixel vs the same
    image encoded without restarts (predictor resets are lossless)."""
    rgb = _gradient_rgb()
    plain = decode_jpeg(encode_jpeg(rgb, quality=90, subsample=True))
    rst = decode_jpeg(
        encode_jpeg(rgb, quality=90, subsample=True, restart_interval=3)
    )
    assert np.array_equal(plain, rst)
    gray = ((np.mgrid[0:33, 0:31][0] * 7) % 256).astype(np.uint8)
    p2 = decode_jpeg(encode_jpeg(gray, quality=75))
    r2 = decode_jpeg(encode_jpeg(gray, quality=75, restart_interval=2))
    assert np.array_equal(p2, r2)


def test_byte_stuffing_and_noise():
    """Noise at low quality produces 0xFF bytes in the entropy stream;
    the writer must stuff 0x00 after each and the reader must unstuff
    — and the decode must still land within quantization error."""
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (33, 31), dtype=np.uint8)
    data = encode_jpeg(noise, quality=30)
    assert data.count(b"\xff\x00") > 0  # stuffing actually exercised
    out = decode_jpeg(data)
    assert out.shape == noise.shape
    assert _rmse(out, noise) < 60.0  # q30 destroys noise; bound sanity only


def test_rejects_non_baseline_and_garbage():
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"notajpeg") is None
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None  # SOI+EOI, no scan
    rgb = _gradient_rgb(16, 16)
    data = bytearray(encode_jpeg(rgb, quality=80))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rebrand as progressive → must refuse, not garble
    assert decode_jpeg(bytes(data)) is None
    # truncated stream must not crash (pads per spec or returns None)
    decode_jpeg(bytes(encode_jpeg(rgb))[:40])


def test_fill_bytes_and_lengthless_markers():
    """Segment walker robustness (ADVICE r9): repeated 0xFF fill bytes
    before a marker are legal padding (T.81 B.1.1.2) and must be
    skipped — reading a 2-byte length at the fill position walks to a
    wrong offset; length-less markers (TEM 0x01, stray RST/SOI) in the
    header section must refuse BY DESIGN (return None), not by luck."""
    gray = ((np.arange(16 * 16) * 7) % 256).astype(np.uint8).reshape(16, 16)
    data = encode_jpeg(gray, quality=90)
    baseline = decode_jpeg(data)
    # inject two fill bytes between SOI and the first real marker
    padded = data[:2] + b"\xff\xff" + data[2:]
    out = decode_jpeg(padded)
    assert out is not None and np.array_equal(out, baseline)
    # TEM (length-less) before the scan → clean refusal
    assert decode_jpeg(data[:2] + b"\xff\x01" + data[2:]) is None
    # stray RST0 in the header section → clean refusal
    assert decode_jpeg(data[:2] + b"\xff\xd0" + data[2:]) is None


def test_decode_media_dispatch_jpeg(spark):
    """decode_media routes JPEG magic to the codec and reports the
    Rec.601 luma mean; non-media bytes still hit the null branch."""
    from data_migration_tool_spark.operators import multimodal as MM

    gray = np.full((24, 16), 128, dtype=np.uint8)
    d = MM.decode_media(encode_jpeg(gray, quality=95))
    assert (d["width"], d["height"], d["n_channels"]) == (16, 24, 1)
    assert d["mean_luma"] == pytest.approx(128.0, abs=2.0)
    assert d["sample_rate"] is None  # image, not audio
    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    rgb[..., 0] = 255  # pure red: Rec.601 luma 76.245
    d3 = MM.decode_media(encode_jpeg(rgb, quality=95))
    assert d3["n_channels"] == 3
    assert d3["mean_luma"] == pytest.approx(76.2, abs=3.0)
    assert MM.decode_media(b"\x00\x01\x02")["width"] is None


def test_jpeg_round_trip_property():
    """Hypothesis sweep over the codec's parameter lattice: random
    dimensions (including sub-block 1..7 edges), quality, gray/color,
    4:4:4/4:2:0, restart intervals, and content classes. Invariants:
    decode never fails on our own output, shape/dtype round-trip, and
    for SMOOTH content at quality ≥ 80 the error stays within a small
    bound (lossiness is content- and quality-dependent; the property
    pins the geometry paths, the fixed tests above pin error bounds
    per class)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=40, deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        quality=st.integers(1, 100),
        color=st.booleans(),
        subsample=st.booleans(),
        restart=st.sampled_from([0, 1, 3]),
        seed=st.integers(0, 2**31 - 1),
    )
    def run(h, w, quality, color, subsample, restart, seed):
        rng = np.random.default_rng(seed)
        base = rng.integers(0, 256, (h, w), dtype=np.uint8)
        img = (
            np.stack([base, 255 - base, base // 2], axis=-1) if color else base
        )
        data = encode_jpeg(
            img, quality=quality, subsample=subsample, restart_interval=restart
        )
        assert data[:3] == b"\xff\xd8\xff" and data[-2:] == b"\xff\xd9"
        out = decode_jpeg(data)
        assert out is not None and out.shape == img.shape
        assert out.dtype == np.uint8
        # constant image (DC-only blocks): error bounded by the DC
        # quantization step at this quality — half a step of q00/8 in
        # pixel units (+1 for the final round). Exact at quality 100
        # (unit quant), up to ~±16 at quality 1 (q00 = 255) — which the
        # first draft of this property wrongly claimed was ≤1; the
        # hypothesis sweep found the q=1 counterexample immediately.
        from data_migration_tool_spark.operators.jpeg import (
            _Q_CHROMA,
            _Q_LUMA,
            _scaled_quant,
        )

        q00 = max(
            int(_scaled_quant(_Q_LUMA, quality)[0, 0]),
            int(_scaled_quant(_Q_CHROMA, quality)[0, 0]) if color else 0,
        )
        bound = q00 / 16 + 1
        flat = np.full_like(img, 137)
        oflat = decode_jpeg(
            encode_jpeg(flat, quality=quality, subsample=subsample,
                        restart_interval=restart)
        )
        assert np.abs(oflat.astype(int) - 137).max() <= bound

    run()
