"""Stdlib PNG decode + real resize: these tests run SKIP-FREE in any
environment — the PNG path needs only ``zlib``/``struct``/numpy, the
same guarantee the ``wave``/y4m parsers give audio/video.

Inputs are crafted in-process: filter-0 images via
``png_encode``; multi-filter images hand-assembled chunk by chunk so
the de-filter paths (Sub/Up/Average/Paeth) are exercised against a
filter-0 encoding of the SAME pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_macropulse_br_spark.operators.multimodal import (
    _PNG_MAGIC,
    _decode_png,
    _png_read,
    _png_resize,
    decode_media,
    fit_within,
    png_encode,
    resize_media,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _manual_png(
    width: int,
    height: int,
    color_type: int,
    scanlines: list[bytes],
    plte: bytes | None = None,
) -> bytes:
    """Assemble a PNG from pre-filtered scanlines (each including its
    leading filter-type byte)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = _PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
    return out + _chunk(b"IEND", b"")


def _lum(rgb: np.ndarray) -> np.ndarray:
    """The exact integer ITU-R 601-2 fold PIL's convert("L") uses."""
    r = rgb.astype(np.uint32)
    return (r[..., 0] * 19595 + r[..., 1] * 38470 + r[..., 2] * 7471 + 0x8000) >> 16


def _expected_features(content: bytes, w: int, h: int, lum: np.ndarray):
    a = lum.astype(np.float64)
    return [
        float(w),
        float(h),
        float(a.mean()),
        float(a.std()),
        float(a.min()),
        float(a.max()),
        float(len(content)),
        1.0,
    ]


def test_gray_png_exact_features():
    rng = np.random.default_rng(7)
    w, h = 13, 9
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    content = png_encode(w, h, px.tobytes(), color_type=0)
    assert _decode_png(content) == _expected_features(
        content, w, h, px.astype(np.uint32)
    )
    # decode_media auto-routes PNG bytes to the real decoder
    assert decode_media(content, "image") == _decode_png(content)


def test_rgb_and_rgba_png_exact_features():
    rng = np.random.default_rng(11)
    w, h = 8, 5
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    content = png_encode(w, h, rgb.tobytes(), color_type=2)
    assert _decode_png(content) == _expected_features(content, w, h, _lum(rgb))

    # RGBA: alpha ignored by luminance, exactly as PIL convert("L")
    rgba = np.dstack([rgb, rng.integers(0, 256, size=(h, w), dtype=np.uint8)])
    content4 = png_encode(w, h, rgba.tobytes(), color_type=6)
    got = _decode_png(content4)
    exp = _expected_features(content4, w, h, _lum(rgb))
    assert got == exp


def test_palette_png_maps_plte_then_luminance():
    # 4-entry palette; 3x2 image of indices
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = np.array([[0, 1, 2], [3, 3, 0]], dtype=np.uint8)
    scanlines = [b"\x00" + idx[y].tobytes() for y in range(2)]
    content = _manual_png(3, 2, 3, scanlines, plte=plte)
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    assert _decode_png(content) == _expected_features(
        content, 3, 2, _lum(pal[idx])
    )


def test_filters_1_to_4_reconstruct_same_pixels():
    """A gradient image hand-encoded with Sub/Up/Average/Paeth rows
    must decode to the same features as its filter-0 encoding."""
    w, h = 6, 4
    px = np.add.outer(
        np.arange(h, dtype=np.uint16) * 40, np.arange(w, dtype=np.uint16) * 7
    ).astype(np.uint8)  # gray gradient

    def sub_row(row: np.ndarray) -> bytes:
        out = bytearray(row.tobytes())
        for i in range(len(out) - 1, 0, -1):
            out[i] = (out[i] - out[i - 1]) & 0xFF
        return b"\x01" + bytes(out)

    def up_row(row: np.ndarray, prev: np.ndarray) -> bytes:
        diff = (row.astype(int) - prev.astype(int)) % 256
        return b"\x02" + diff.astype(np.uint8).tobytes()

    def avg_row(row: np.ndarray, prev: np.ndarray) -> bytes:
        out = bytearray(len(row))
        recon = row.astype(int)
        for i in range(len(row)):
            a = recon[i - 1] if i else 0
            out[i] = (recon[i] - ((a + int(prev[i])) >> 1)) % 256
        return b"\x03" + bytes(out)

    def paeth_row(row: np.ndarray, prev: np.ndarray) -> bytes:
        out = bytearray(len(row))
        recon = row.astype(int)
        for i in range(len(row)):
            a = recon[i - 1] if i else 0
            b = int(prev[i])
            c = int(prev[i - 1]) if i else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (recon[i] - pr) % 256
        return b"\x04" + bytes(out)

    lines = [
        sub_row(px[0]),
        up_row(px[1], px[0]),
        avg_row(px[2], px[1]),
        paeth_row(px[3], px[2]),
    ]
    fancy = _manual_png(w, h, 0, lines)
    plain = png_encode(w, h, px.tobytes(), color_type=0)
    # identical pixels → identical stats (content length differs)
    assert _decode_png(fancy)[:6] == _decode_png(plain)[:6]


def test_png_reader_rejects_malformed():
    with pytest.raises(ValueError):
        _png_read(b"\x89PNGfakebytes-not-a-real-stream")
    truncated = png_encode(4, 4, bytes(16), color_type=0)[:20]
    with pytest.raises(ValueError):
        _png_read(truncated)


def _corrupt_idat_png() -> bytes:
    """Valid wrapper chunks, garbage zlib stream inside IDAT."""
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"\xde\xad\xbe\xef not zlib at all")
        + _chunk(b"IEND", b"")
    )


def test_png_reader_parse_failures_raise_value_error():
    """Every malformed-payload path must surface as ValueError (the
    type extract_features/resize_plan catch for decode_ok=False /
    pass-through) — never a bare zlib.error / struct.error /
    IndexError that would fail the Spark task (r4 ADVICE, high)."""
    # corrupt zlib stream inside a well-formed IDAT chunk
    with pytest.raises(ValueError):
        _png_read(_corrupt_idat_png())
    # short IHDR chunk (length field honest, payload too small)
    short_ihdr = (
        _PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIB", 4, 4, 8))
        + _chunk(b"IDAT", zlib.compress(bytes(4 * (1 + 4))))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        _png_read(short_ihdr)
    # palette index beyond PLTE length
    lines = [b"\x00" + bytes([9] * 4)] * 4  # index 9, palette has 2 entries
    bad_pal = _manual_png(4, 4, 3, lines, plte=bytes(6))
    with pytest.raises(ValueError):
        _decode_png(bad_pal)
    with pytest.raises(ValueError):
        _png_resize(bad_pal, 2)
    # inflated size disagreeing with IHDR (too much data = bomb shape)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(10_000_000)))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        _png_read(bomb)


def test_decompression_bomb_is_bounded():
    """A forged tiny-IHDR / huge-IDAT payload must be rejected without
    materializing the inflated stream (bounded decompressobj)."""
    import tracemalloc

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(200_000_000)))
        + _chunk(b"IEND", b"")
    )
    tracemalloc.start()
    with pytest.raises(ValueError):
        _png_read(bomb)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # compressed payload is ~200 KB; unbounded inflate would be 200 MB
    assert peak < 50_000_000


def test_extract_features_malformed_payload_yields_decode_ok_false(spark):
    """End-to-end contract: one malformed PNG in a batch must not fail
    the job; it maps to decode_ok=False while good rows decode."""
    from etl_macropulse_br_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    good = png_encode(2, 2, bytes([10, 20, 30, 40]), color_type=0)
    rows = [
        (1, "image", good, "image/png", 2, 2, None),
        (2, "image", _corrupt_idat_png(), "image/png", 4, 4, None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        r["media_id"]: r for r in extract_features(media, use_real_decoder=True).collect()
    }
    assert got[1]["decode_ok"] is True
    assert got[2]["decode_ok"] is False and got[2]["feature"] is None


def test_fit_within_dims():
    assert fit_within(100, 40, 50) == (50, 20)
    assert fit_within(40, 100, 50) == (20, 50)
    assert fit_within(30, 20, 50) == (30, 20)  # already fits
    assert fit_within(4000, 2, 50) == (50, 1)  # floor never below 1


def test_png_resize_real_pixels():
    """Nearest-neighbor resample on a gradient: exact dims, exact
    pixel mapping src = (dst * src_len) // dst_len."""
    w, h = 100, 40
    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    rgb[..., 0] = np.arange(w, dtype=np.uint8)[None, :] * 2
    rgb[..., 1] = np.arange(h, dtype=np.uint8)[:, None] * 5
    content = png_encode(w, h, rgb.tobytes(), color_type=2)

    out, nw, nh = _png_resize(content, 50)
    assert (nw, nh) == (50, 20)
    rw, rh, ct, ch, pixels, _ = _png_read(out)
    assert (rw, rh, ct, ch) == (50, 20, 2, 3)
    got = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(nh, nw, 3)
    idx_y = (np.arange(nh) * h) // nh
    idx_x = (np.arange(nw) * w) // nw
    assert np.array_equal(got, rgb[idx_y][:, idx_x])

    # resize_media routes PNG without PIL
    out2, nw2, nh2 = resize_media(content, 50)
    assert out2 == out and (nw2, nh2) == (50, 20)


def test_resize_plan_end_to_end_real(spark):
    """resize_plan over a Spark DataFrame: PNG rows really resample
    (re-decodable output, new dims), unparseable rows pass through
    unchanged — skip-free in this container."""
    from etl_macropulse_br_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_plan,
    )

    w, h = 64, 16
    gray = np.arange(w * h, dtype=np.uint32).reshape(h, w) % 256
    content = png_encode(w, h, gray.astype(np.uint8).tobytes(), color_type=0)
    rows = [
        (1, "image", content, "image/png", w, h, None),
        (2, "image", b"\x01\x02\x03\x04", "image/jpeg", 900, 900, None),
        (3, "image", content, "image/png", 8, 8, None),  # fits: filtered out
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in resize_plan(media, max_px=32).collect()}
    assert set(got) == {1, 2}
    assert (got[1]["width"], got[1]["height"]) == (32, 8)
    feats = _decode_png(got[1]["content"])
    assert feats[:2] == [32.0, 8.0]
    assert got[2]["content"] == b"\x01\x02\x03\x04"  # untouched


def test_extract_features_real_png_in_pipeline(spark):
    """The image path is REAL in this container: a PNG row decodes
    with exact features through the Arrow mapInPandas pipeline (no
    PIL present — the stdlib parser carries it)."""
    from etl_macropulse_br_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    rng = np.random.default_rng(3)
    w, h = 5, 4
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    content = png_encode(w, h, px.tobytes(), color_type=0)
    media = spark.createDataFrame(
        [(1, "image", content, "image/png", w, h, None)], MEDIA_SCHEMA
    )
    got = extract_features(media).collect()[0]
    assert got["decode_ok"]
    assert got["feature"] == pytest.approx(
        _expected_features(content, w, h, px.astype(np.uint32))
    )


def test_pil_parity_when_available():
    """Where PIL exists, both decoders must agree bit-for-bit (the
    stdlib path uses PIL's exact integer luminance). Where it does
    not (this container), pin the parity obligation the environment
    CAN check: the auto-detect path must route PNG payloads to the
    stdlib codec — bit-identical features, never the stub — so a
    broken auto-detect cannot silently degrade decode quality."""
    from etl_macropulse_br_spark.operators.multimodal import (
        HAS_PIL,
        _decode_stub,
        decode_media,
    )

    rng = np.random.default_rng(5)
    w, h = 7, 6
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    content = png_encode(w, h, rgb.tobytes(), color_type=2)
    if HAS_PIL:
        from etl_macropulse_br_spark.operators.multimodal import (
            _decode_pil,
        )

        assert _decode_pil(content, "image") == _decode_png(content)
    else:
        auto = decode_media(content, "image", None)
        assert auto == _decode_png(content)
        assert auto != _decode_stub(content, "image")


# ---- property-based: the codec holds for arbitrary images ----

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    color_type=st.sampled_from([0, 2, 4, 6]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, color_type, seed):
    """encode → decode stats equal numpy-computed luminance stats for
    arbitrary sizes, channel layouts, and pixel content."""
    from etl_macropulse_br_spark.operators.multimodal import _PNG_CHANNELS

    rng = np.random.default_rng(seed)
    ch = _PNG_CHANNELS[color_type]
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    content = png_encode(w, h, px.tobytes(), color_type)
    got = _decode_png(content)
    lum = _lum(px) if ch >= 3 else px[..., 0].astype(np.uint32)
    assert got == _expected_features(content, w, h, lum)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(2, 64),
    h=st.integers(2, 64),
    max_px=st.integers(1, 48),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_resize_property(w, h, max_px, seed):
    """resize always fits within max_px (when input exceeded it),
    preserves aspect-ratio ordering, and output pixels are the exact
    nearest-neighbor mapping of input pixels."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    content = png_encode(w, h, px.tobytes(), color_type=2)
    out, nw, nh = _png_resize(content, max_px)
    assert max(nw, nh) == min(max(w, h), max_px) or max(w, h) <= max_px
    rw, rh, _, _, pixels, _ = _png_read(out)
    assert (rw, rh) == (nw, nh)
    got = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(nh, nw, 3)
    idx_y = (np.arange(nh) * h) // nh
    idx_x = (np.arange(nw) * w) // nw
    assert np.array_equal(got, px[idx_y][:, idx_x])
