"""Streaming fuzz matrix in the local pytest gate (r10 — VERDICT r9
#6 "Done = fuzz_streaming green in the local gate"): one
seed-deterministic round of every slicing-fuzz check from
tools/fuzz_streaming.py. A failure reproduces standalone with
``python tools/fuzz_streaming.py 5 60 1`` (same string-seeded RNG
derivation, same row count). The heavier multi-seed / multi-round
runs stay tool-side.

r12 (VERDICT r11 next #8): a three-check subset also runs under the
ROCKSDB state-store provider inside the gate — the differentials
had RocksDB rows, but the seeded gate only ever exercised the
default provider's state encoder. Standalone repro:
``python tools/fuzz_streaming.py 5 60 1 rocksdb``.

r13 (VERDICT r12 next #8): the RocksDB subset ROTATES instead of
pinning the same three shapes forever. ``ROCKS_ROTATION`` is bumped
once per build round; the subset is the contiguous window of 3
starting at ``(ROCKS_ROTATION * 3) % len(CHECKS)`` in the sorted
check list, so four successive rounds provably cover the full
10-check matrix under RocksDB without growing gate runtime (window
starts step 3 mod 10 — every check is hit within ceil(10/3)
rotations). The r12 subset (text_dedup, sessions_disorder,
quantiles — the three most distinct state shapes) was green; each
rotation's window is recorded by this constant's git history."""

from __future__ import annotations

import random

import pytest

from tools.fuzz_streaming import CHECKS

SEED, N_ROWS, ROUND = 5, 60, 0

# bump once per build round; do not reuse a value (git history is
# the coverage ledger)
ROCKS_ROTATION = 13

_ALL_CHECKS = sorted(CHECKS)
_START = (ROCKS_ROTATION * 3) % len(_ALL_CHECKS)
ROCKSDB_SUBSET = tuple(
    _ALL_CHECKS[(_START + i) % len(_ALL_CHECKS)] for i in range(3)
)


@pytest.mark.parametrize("name", sorted(CHECKS))
def test_fuzz_streaming_check(spark, name):
    rng = random.Random(f"{SEED}:{ROUND}:{name}")
    n = CHECKS[name](spark, rng, N_ROWS, f"gate_{name}_{SEED}")
    assert n >= 0


@pytest.mark.parametrize("name", ROCKSDB_SUBSET)
def test_fuzz_streaming_check_rocksdb(spark, name):
    from etl_macropulse_br_spark.streaming.state_store import (
        state_store,
    )

    # same RNG derivation = same random slicings as the default-
    # provider round; only the state backend differs — which is the
    # property under test (encoder round-trip, not new inputs)
    rng = random.Random(f"{SEED}:{ROUND}:{name}")
    with state_store(spark, "rocksdb"):
        n = CHECKS[name](spark, rng, N_ROWS, f"gate_rocks_{name}_{SEED}")
    assert n >= 0
