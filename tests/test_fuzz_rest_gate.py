"""REST fan-out differential fuzz in the local gate (r14): one
seed-deterministic round of tools/fuzz_rest.py's three-path
equality check (serial ≡ concurrent ≡ distributed, happy path and
skip-mode failures, adversarial payloads). A failure reproduces
standalone with ``python tools/fuzz_rest.py 7 1`` (same
string-seeded RNG derivation). The heavier multi-round runs stay
tool-side, recorded in PLANS.md."""

from __future__ import annotations

import random

from tools.fuzz_rest import run_round

SEED, ROUND = 7, 0


def test_fuzz_rest_three_paths_agree(spark):
    rng = random.Random(f"rest:{SEED}:{ROUND}")
    run_round(spark, rng, f"gate_rest_{SEED}")
