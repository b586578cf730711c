"""Perceptual image dHash + banded Hamming near-dup pairing."""

from __future__ import annotations

import random


def _gray_png(pixels: list[int], w: int, h: int) -> bytes:
    from etl_macropulse_br_spark.operators.multimodal import png_encode

    return png_encode(w, h, bytes(pixels), color_type=0)


def _py_dhash(pixels: list[int], w: int, h: int) -> int:
    """Independent reference: same 9x8 NN grid + left<right rule."""
    grid = [
        [pixels[((y * h) // 8) * w + ((x * w) // 9)] for x in range(9)]
        for y in range(8)
    ]
    v = 0
    for y in range(8):
        for x in range(8):
            if grid[y][x] < grid[y][x + 1]:
                v |= 1 << (y * 8 + x)
    return v - (1 << 64) if v >= (1 << 63) else v


def test_dhash_matches_reference_and_is_signed64():
    from etl_macropulse_br_spark.operators.multimodal import dhash64

    rng = random.Random(3)
    w, h = 32, 24
    px = [rng.randrange(256) for _ in range(w * h)]
    assert dhash64(_gray_png(px, w, h)) == _py_dhash(px, w, h)
    # force the top bit: bright->dark gradient everywhere
    px2 = [255 - (x * 255) // (w - 1) for _ in range(h) for x in range(w)]
    v = dhash64(_gray_png(px2, w, h))
    assert -(1 << 63) <= v < (1 << 63)


def test_image_near_dups_pairs_similar_images_only(spark):
    from etl_macropulse_br_spark.operators.multimodal import (
        image_dhash,
        image_near_dups,
    )

    rng = random.Random(11)
    w, h = 36, 32
    base = [rng.randrange(256) for _ in range(w * h)]
    # near-dup: +-2 brightness jitter (ordering of most neighbor
    # pairs survives -> tiny Hamming distance)
    near = [min(255, max(0, p + rng.choice((-2, -1, 0, 1, 2)))) for p in base]
    other = [rng.randrange(256) for _ in range(w * h)]
    rows = [
        (1, "image", bytearray(_gray_png(base, w, h))),
        (2, "image", bytearray(_gray_png(near, w, h))),
        (3, "image", bytearray(_gray_png(other, w, h))),
        (4, "audio", bytearray(b"not an image")),
        (5, "image", bytearray(b"corrupt png")),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )
    hashes = {r["media_id"]: r for r in image_dhash(df).collect()}
    assert hashes[1]["decode_ok"] and hashes[3]["decode_ok"]
    assert not hashes[4]["decode_ok"] and hashes[4]["dhash"] is None
    assert not hashes[5]["decode_ok"]

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dups(df, max_hamming=6).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert all({1, 2} == set(p) for p in pairs), pairs  # 3 pairs with nobody


def test_image_near_dups_exact_copy_hamming_zero(spark):
    from etl_macropulse_br_spark.operators.multimodal import image_near_dups

    rng = random.Random(5)
    w, h = 16, 16
    px = [rng.randrange(256) for _ in range(w * h)]
    payload = _gray_png(px, w, h)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload)), (2, "image", bytearray(payload))],
        "media_id long, kind string, content binary",
    )
    rows = image_near_dups(df, max_hamming=0).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in rows] == [(1, 2, 0)]


def _y4m(w: int, h: int, frames: list[bytes]) -> bytes:
    hdr = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()
    body = b"".join(
        b"FRAME\n" + y + bytes((w * h) // 2)  # Y plane + 4:2:0 chroma
        for y in frames
    )
    return hdr + body


def test_video_vhash_first_frame_and_pairing(spark):
    import random

    from etl_macropulse_br_spark.operators.multimodal import (
        vhash64,
        video_near_dups,
        video_vhash,
    )

    rng = random.Random(23)
    w, h = 32, 16
    y1 = bytes(rng.randrange(256) for _ in range(w * h))
    y2 = bytes(rng.randrange(256) for _ in range(w * h))
    # same first frame, different later frames -> identical vhash
    a = _y4m(w, h, [y1, y2])
    b = _y4m(w, h, [y1])
    c = _y4m(w, h, [y2])
    assert vhash64(a) == vhash64(b)
    assert vhash64(a) != vhash64(c)

    rows = [
        (1, "video", bytearray(a)),
        (2, "video", bytearray(b)),
        (3, "video", bytearray(c)),
        (4, "video", bytearray(b"not y4m")),
        (5, "image", bytearray(b"wrong kind")),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )
    hs = {r["media_id"]: r for r in video_vhash(df).collect()}
    assert hs[1]["decode_ok"] and not hs[4]["decode_ok"] and not hs[5]["decode_ok"]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in video_near_dups(df, max_hamming=0).collect()
    }
    assert pairs == {(1, 2): 0}
