"""Streaming fuzz matrix in the local pytest gate (r10 — VERDICT r9
#6 "Done = fuzz_streaming green in the local gate"): one
seed-deterministic round of every slicing-fuzz check from
tools/fuzz_streaming.py. A failure reproduces standalone with
``python tools/fuzz_streaming.py 5 60 1`` (same string-seeded RNG
derivation, same row count). The heavier multi-seed / multi-round /
rocksdb runs stay tool-side."""

from __future__ import annotations

import random

import pytest

from tools.fuzz_streaming import CHECKS

SEED, N_ROWS, ROUND = 5, 60, 0


@pytest.mark.parametrize("name", sorted(CHECKS))
def test_fuzz_streaming_check(spark, name):
    rng = random.Random(f"{SEED}:{ROUND}:{name}")
    n = CHECKS[name](spark, rng, N_ROWS, f"gate_{name}_{SEED}")
    assert n >= 0
