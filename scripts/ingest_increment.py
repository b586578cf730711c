"""Incremental-dedup ingest CLI — thin wrapper over
``etl_macropulse_br_spark/operators/signature_index.py`` (r11 —
ADVICE r10: the engine used to live HERE, inverting the
package/scripts layering; streaming/ingest.py importing from
scripts/ only worked with the repo root on sys.path. The engine —
:func:`run`, :func:`compact_signature_index`, the state layout, the
crash/rerun contract — now lives in the package; this file parses
arguments, builds a session, and prints the manifest. The names are
re-exported so existing callers of ``scripts.ingest_increment.run``
keep working.)

Usage:
    python scripts/ingest_increment.py --new-batch B.parquet \
        --state-dir STATE [--out OUT] [--threshold 0.8] [--compact]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_macropulse_br_spark.operators.signature_index import (  # noqa: E402,F401 (re-exported for compat)
    _DEFAULTS,
    _META,
    _run_unlocked,
    compact_signature_index,
    run,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--new-batch", default=None)
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument(
        "--compact",
        action="store_true",
        help="compact the signature index (drop crash-rerun dead "
        "rows, bound the file count); runs after the increment, or "
        "standalone when --new-batch is omitted",
    )
    ap.add_argument(
        "--profile", default="cluster", choices=["cluster", "small-input"]
    )
    args = ap.parse_args()
    if not args.new_batch and not args.compact:
        raise SystemExit("nothing to do: pass --new-batch and/or --compact")

    from etl_macropulse_br_spark.session import get_spark

    spark = get_spark(app_name="ingest_increment", profile=args.profile)
    manifest = {}
    if args.new_batch:
        out_dir = args.out or os.path.join(os.getcwd(), "ingest_out")
        manifest = run(
            spark, args.new_batch, args.state_dir, out_dir, args.threshold
        )
    if args.compact:
        manifest["compaction"] = compact_signature_index(
            spark, args.state_dir
        )
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
