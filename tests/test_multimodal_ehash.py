"""Audio envelope hash (ehash64) + banded Hamming near-dup pairing:
gain invariance, cross-payload discrimination, Spark pairing path."""

from __future__ import annotations

import math
import struct


def _pcm16_wav(samples: list[int], rate: int = 8000) -> bytes:
    data = b"".join(struct.pack("<h", max(-32768, min(32767, s))) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _tone_burst(n: int = 2000, seed: int = 5) -> list[int]:
    """A signal whose ENVELOPE varies: amplitude-modulated tone."""
    import random

    rng = random.Random(seed)
    out = []
    for i in range(n):
        env = 0.2 + 0.8 * abs(math.sin(2 * math.pi * i / n * 3))
        tone = math.sin(2 * math.pi * 440 * i / 8000)
        out.append(int(12000 * env * tone + rng.randrange(-150, 150)))
    return out


def test_ehash_gain_invariant_and_discriminative():
    from etl_macropulse_br_spark.operators.multimodal import ehash64

    base = _tone_burst()
    h1 = ehash64(_pcm16_wav(base))
    # uniform gain change: identical hash (comparisons can't move)
    h2 = ehash64(_pcm16_wav([s // 2 for s in base]))
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)
    # different envelope shape: many bits differ
    other = _tone_burst(seed=99)
    h3 = ehash64(
        _pcm16_wav(
            [
                int(12000 * abs(math.cos(2 * math.pi * i / 2000 * 5)) *
                    math.sin(2 * math.pi * 300 * i / 8000))
                for i in range(2000)
            ]
        )
    )
    assert bin((h1 ^ h3) & ((1 << 64) - 1)).count("1") > 8
    del other


def test_audio_near_dups_pairs_same_recording_regained(spark):
    from etl_macropulse_br_spark.operators.multimodal import (
        audio_ehash,
        audio_near_dups,
    )

    base = _tone_burst()
    rows = [
        (1, "audio", bytearray(_pcm16_wav(base))),
        (2, "audio", bytearray(_pcm16_wav([(s * 3) // 4 for s in base]))),
        (3, "audio", bytearray(_pcm16_wav(
            [int(9000 * math.sin(2 * math.pi * 120 * i / 8000)
                 * (1.0 if (i // 400) % 2 == 0 else 0.1))
             for i in range(2000)]
        ))),
        (4, "image", bytearray(b"wrong kind")),
        (5, "audio", bytearray(b"corrupt riff")),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )
    hs = {r["media_id"]: r for r in audio_ehash(df).collect()}
    assert hs[1]["decode_ok"] and hs[3]["decode_ok"]
    assert not hs[4]["decode_ok"] and not hs[5]["decode_ok"]
    assert hs[1]["ehash"] == hs[2]["ehash"]  # pure gain change

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_dups(df, max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert all({1, 2} == set(p) for p in pairs), pairs
