"""CLI entry point — ``python -m etl_macropulse_br_spark``.

Mirrors the reference's primary entry ``python src/main.py``
(``/root/reference/src/main.py:23-95``): read ``inputs/run_config.json``
and ``inputs/bcb_series.csv``, run the full medallion pipeline, write
bronze/silver/gold + ``data/gold/summary.md``, print the summary.

Flags let a user point at other config files / data dirs without
editing code; defaults match the reference's hardwired paths.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m etl_macropulse_br_spark",
        description="Run the macropulse medallion ETL on Spark.",
    )
    parser.add_argument(
        "--run-config",
        default="inputs/run_config.json",
        help="path to run_config.json (default: inputs/run_config.json)",
    )
    parser.add_argument(
        "--series-config",
        default="inputs/bcb_series.csv",
        help="path to bcb_series.csv (default: inputs/bcb_series.csv)",
    )
    parser.add_argument(
        "--data-dir",
        default="data",
        help="output root for bronze/silver/gold (default: data)",
    )
    parser.add_argument(
        "--no-write",
        action="store_true",
        help="dry run: build every table but skip all sinks",
    )
    args = parser.parse_args(argv)

    from etl_macropulse_br_spark.plans.pipeline import run_pipeline
    from etl_macropulse_br_spark.session import get_spark

    spark = get_spark(app_name="etl-macropulse-br-spark")
    result = run_pipeline(
        spark,
        run_config_path=args.run_config,
        series_config_path=args.series_config,
        data_dir=args.data_dir,
        write_outputs=not args.no_write,
    )

    # main.py:88-90
    print("ETL concluído com sucesso.")
    print("\n--- RESUMO ---")
    print(result.summary_text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
