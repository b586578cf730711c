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
default provider's state encoder. The subset picks the three most
distinct state SHAPES: binary/long dedup state (text_dedup),
event-time list state under bounded disorder (sessions_disorder),
and register-blob state (quantiles). Standalone repro:
``python tools/fuzz_streaming.py 5 60 1 rocksdb``."""

from __future__ import annotations

import random

import pytest

from tools.fuzz_streaming import CHECKS

SEED, N_ROWS, ROUND = 5, 60, 0

ROCKSDB_SUBSET = ("text_dedup", "sessions_disorder", "quantiles")


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
