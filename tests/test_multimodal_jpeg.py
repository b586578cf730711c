"""Stdlib baseline-JPEG decode + resize: these tests run SKIP-FREE
in any environment — the JPEG path needs only ``struct``/numpy, the
same guarantee the PNG/``wave``/y4m parsers give the other
modalities.

Inputs are crafted in-process via ``jpeg_encode``. Exactness is
pinned on this codec's own round-trips: block-aligned-constant
images are DC-only and decode exactly (or within the DC quant step);
everything else asserts tolerance bands, never cross-library bit
equality (the IDCT is floating-point, unlike libjpeg's fixed-point
fast paths — see the module docstring).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_macropulse_br_spark.operators.jpeg import (
    jpeg_encode,
    jpeg_luminance,
    jpeg_read,
)
from etl_macropulse_br_spark.operators.multimodal import (
    _decode_jpeg,
    _decode_stub,
    decode_media,
    fit_within,
    resize_media,
)


def _block_constant_gray(w: int, h: int, seed: int) -> np.ndarray:
    """Grayscale image constant within each 8x8 tile → every block is
    DC-only after the DCT, so round-trip error is bounded by the DC
    quant step alone."""
    rng = np.random.default_rng(seed)
    tiles = rng.integers(0, 256, size=(-(-h // 8), -(-w // 8)), dtype=np.uint8)
    return np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)[:h, :w]


def test_flat_gray_roundtrip_exact():
    w, h = 24, 16
    px = bytes([128]) * (w * h)
    enc = jpeg_encode(w, h, px, channels=1, quality=90)
    W, H, C, arr = jpeg_read(enc)
    assert (W, H, C) == (w, h, 1)
    assert arr.min() == 128 and arr.max() == 128


def test_flat_rgb_luminance_matches_itu_fold():
    w, h = 24, 16
    px = bytes([10, 200, 60]) * (w * h)
    enc = jpeg_encode(w, h, px, channels=3, quality=95)
    W, H, lum = jpeg_luminance(enc)
    ref = (10 * 19595 + 200 * 38470 + 60 * 7471 + 0x8000) >> 16
    assert (W, H) == (w, h)
    assert abs(float(lum.mean()) - ref) <= 2.0
    assert float(lum.max()) - float(lum.min()) <= 4.0


def test_gradient_roundtrip_tolerance():
    g = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (40, 1))
    enc = jpeg_encode(64, 40, g.tobytes(), channels=1, quality=95)
    W, H, C, arr = jpeg_read(enc)
    assert (W, H, C) == (64, 40, 1)
    err = np.abs(arr[:, :, 0].astype(float) - g.astype(float))
    assert err.max() <= 2.0


def test_420_subsampling_odd_dims():
    w, h = 45, 37  # odd dims exercise padding + chroma crop
    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    rgb[:, :, 0] = 180
    rgb[:, :, 1] = 90
    rgb[:, :, 2] = 30
    enc = jpeg_encode(w, h, rgb.tobytes(), channels=3, quality=90, subsampling="420")
    W, H, C, arr = jpeg_read(enc)
    assert (W, H, C) == (w, h, 3)
    _, _, lum = jpeg_luminance(enc)
    ref = (180 * 19595 + 90 * 38470 + 30 * 7471 + 0x8000) >> 16
    assert abs(float(lum.mean()) - ref) <= 3.0


def test_restart_interval_roundtrip():
    g = _block_constant_gray(64, 40, seed=3)
    enc = jpeg_encode(64, 40, g.tobytes(), channels=1, quality=95, restart_interval=3)
    assert b"\xff\xdd" in enc  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
    W, H, C, arr = jpeg_read(enc)
    err = np.abs(arr[:, :, 0].astype(float) - g.astype(float))
    assert err.max() <= 1.0


def test_decode_media_dispatches_jpeg_with_feature_contract():
    w, h = 16, 8
    px = bytes([200]) * (w * h)
    enc = jpeg_encode(w, h, px, channels=1, quality=95)
    feats = decode_media(enc, "image")
    assert feats[0] == float(w) and feats[1] == float(h)
    assert feats[2] == 200.0 and feats[3] == 0.0  # mean, std: exact (DC-only)
    assert feats[4] == 200.0 and feats[5] == 200.0
    assert feats[6] == float(len(enc)) and feats[7] == 1.0
    assert feats == _decode_jpeg(enc)


def test_progressive_sof2_stub_fallback_and_use_real_raise():
    w, h = 16, 8
    enc = bytearray(jpeg_encode(w, h, bytes([77]) * (w * h), channels=1))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    enc = bytes(enc)
    with pytest.raises(NotImplementedError):
        jpeg_read(enc)
    # decode_media: auto mode falls back to the stub; forced real raises
    assert decode_media(enc, "image") == _decode_stub(enc, "image")
    with pytest.raises(NotImplementedError):
        decode_media(enc, "image", use_real=True)


def test_malformed_jpeg_raises_value_error():
    w, h = 16, 16
    good = jpeg_encode(w, h, bytes(range(16)) * 16, channels=1, quality=90)
    # truncated entropy data
    with pytest.raises(ValueError):
        jpeg_read(good[: len(good) // 2])
    # missing SOI
    with pytest.raises(ValueError):
        jpeg_read(b"\x00\x01" + good[2:])
    # segment length overrunning the stream
    bad = bytearray(good)
    i = bad.index(b"\xff\xdb")
    struct.pack_into(">H", bad, i + 2, 0xFFFF)
    with pytest.raises(ValueError):
        jpeg_read(bytes(bad))
    # SOS with no SOF
    i = bytearray(good).index(b"\xff\xc0")
    seglen = struct.unpack(">H", good[i + 2 : i + 4])[0]
    no_sof = good[:i] + good[i + 2 + seglen :]
    with pytest.raises(ValueError):
        jpeg_read(no_sof)


def test_jpeg_resize_real_pixels():
    # 2x-downsample of a block-constant image lands nearest-neighbor
    # samples on constant tiles → output tiles match source tiles.
    g = _block_constant_gray(64, 32, seed=11)
    enc = jpeg_encode(64, 32, g.tobytes(), channels=1, quality=95)
    out, nw, nh = resize_media(enc, 32)
    assert (nw, nh) == fit_within(64, 32, 32)
    W, H, C, arr = jpeg_read(out)
    assert (W, H, C) == (nw, nh, 1)
    idx_y = (np.arange(nh) * 32) // nh
    idx_x = (np.arange(nw) * 64) // nw
    ref = g[idx_y][:, idx_x]
    err = np.abs(arr[:, :, 0].astype(float) - ref.astype(float))
    # The resized image's 8x8 tiles straddle source-tile edges, so the
    # re-encode has AC energy: bounded ringing, small mean error.
    assert err.mean() <= 2.0
    assert err.max() <= 20.0


def test_jpeg_resize_color_roundtrip_dims():
    rgb = np.zeros((40, 60, 3), dtype=np.uint8)
    rgb[:, :, 0] = 120
    rgb[:, :, 1] = 60
    rgb[:, :, 2] = 200
    enc = jpeg_encode(60, 40, rgb.tobytes(), channels=3, quality=95)
    out, nw, nh = resize_media(enc, 30)
    assert (nw, nh) == fit_within(60, 40, 30)
    W, H, C, arr = jpeg_read(out)
    assert (W, H, C) == (nw, nh, 3)
    _, _, lum = jpeg_luminance(out)
    ref = (120 * 19595 + 60 * 38470 + 200 * 7471 + 0x8000) >> 16
    assert abs(float(lum.mean()) - ref) <= 4.0


def test_extract_features_real_jpeg_in_pipeline(spark):
    from etl_macropulse_br_spark.operators.multimodal import extract_features

    rows = []
    for i, v in enumerate([0, 64, 128, 255]):
        enc = jpeg_encode(16, 8, bytes([v]) * 128, channels=1, quality=95)
        rows.append((i, "image", enc))
    rows.append((99, "image", b"\xff\xd8\xff\xe0trash"))
    df = spark.createDataFrame(rows, "media_id long, kind string, content binary")
    out = {r["media_id"]: r for r in extract_features(df).collect()}
    assert out[99]["decode_ok"] is False and out[99]["feature"] is None
    for i, v in enumerate([0, 64, 128, 255]):
        r = out[i]
        assert r["decode_ok"] is True
        assert r["feature"][0] == 16.0 and r["feature"][1] == 8.0
        assert r["feature"][2] == float(v)  # DC-only: exact mean


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_property_block_constant(w, h, seed):
    g = _block_constant_gray(w, h, seed)
    enc = jpeg_encode(w, h, g.tobytes(), channels=1, quality=95)
    W, H, C, arr = jpeg_read(enc)
    assert (W, H, C) == (w, h, 1)
    err = np.abs(arr[:, :, 0].astype(float) - g.astype(float))
    assert err.max() <= 1.0  # DC quant step only
