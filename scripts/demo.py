"""Notebook-style end-to-end demo — the Spark twin of
``/root/reference/notebooks/01_etl_macropulse.ipynb`` (cells 2-6):

1. run the medallion pipeline,
2. print the generated ``summary.md``,
3. query the produced silver/gold tables through ``spark.sql`` with
   the notebook's exact query shapes.

Runs fully offline: unless ``--online`` is passed, the two REST
extracts are served by the same deterministic fixtures the test
suite uses, so the demo works in any environment (the reference
notebook needs live BCB/IBGE endpoints).

Usage: ``python scripts/demo.py [--workspace DIR] [--online]``
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BCB_PAYLOAD = [
    {"data": "02/01/2026", "valor": "13,15"},
    {"data": "09/01/2026", "valor": "13,25"},
    {"data": "15/12/2025", "valor": "12,75"},
    {"data": "01/12/2025", "valor": "12,50"},
]

IBGE_PAYLOAD = [
    {"id": 35, "sigla": "SP", "nome": "São Paulo",
     "regiao": {"id": 3, "sigla": "SE", "nome": "Sudeste"}},
    {"id": 13, "sigla": "AM", "nome": "Amazonas",
     "regiao": {"id": 1, "sigla": "N", "nome": "Norte"}},
]

ANP_CSV = """Estado - Sigla;Produto;Data da Coleta;Valor de Venda;Município
SP;GASOLINA;09/01/2026;6,59;SAO PAULO
SP;GASOLINA;15/12/2025;6,39;SAO PAULO
AM;DIESEL S10;09/01/2026;6,10;MANAUS
AM;DIESEL S10;15/12/2025;6,00;MANAUS
"""


def offline_fetch(url: str) -> list[dict]:
    if "bcb.gov.br" in url:
        return BCB_PAYLOAD
    if "ibge.gov.br" in url:
        return IBGE_PAYLOAD
    raise RuntimeError(f"unexpected URL in offline mode: {url}")


def build_workspace(root: str) -> None:
    inputs = os.path.join(root, "inputs")
    os.makedirs(inputs, exist_ok=True)
    with open(os.path.join(inputs, "run_config.json"), "w") as f:
        json.dump(
            {
                "start_date": "2025-12-01",
                "end_date": "2026-01-10",
                "anp_bronze_file": os.path.join(inputs, "anp.csv"),
                "duckdb_path": os.path.join(root, "macropulse.duckdb"),
            },
            f,
        )
    with open(os.path.join(inputs, "anp.csv"), "w", encoding="utf-8") as f:
        f.write(ANP_CSV)
    with open(os.path.join(inputs, "bcb_series.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["series_id", "series_name", "enabled"])
        w.writerow([11, "selic_sgs_11", "true"])


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workspace", default=None)
    parser.add_argument("--online", action="store_true")
    args = parser.parse_args()

    from etl_macropulse_br_spark.plans.pipeline import run_pipeline
    from etl_macropulse_br_spark.session import get_spark

    root = args.workspace or tempfile.mkdtemp(prefix="macropulse_demo_")
    build_workspace(root)
    data_dir = os.path.join(root, "data")

    spark = get_spark(app_name="demo", profile="small-input")

    # --- cell 2: run the pipeline ---
    run_pipeline(
        spark,
        run_config_path=os.path.join(root, "inputs", "run_config.json"),
        series_config_path=os.path.join(root, "inputs", "bcb_series.csv"),
        data_dir=data_dir,
        fetch=None if args.online else offline_fetch,
    )

    # --- cell 3: read the generated summary ---
    summary_path = os.path.join(data_dir, "gold", "summary.md")
    print("--- summary.md ---")
    with open(summary_path, encoding="utf-8") as f:
        print(f.read())

    # --- cells 4-6: query the produced tables ---
    views = {
        "silver_bcb_sgs": os.path.join(data_dir, "silver", "bcb_sgs"),
        "gold_anp_monthly": os.path.join(data_dir, "gold", "gold_anp_monthly"),
    }
    for name, path in views.items():
        spark.read.parquet(path).createOrReplaceTempView(name)

    print("--- silver_bcb_sgs (notebook cell 5) ---")
    spark.sql(
        """
        SELECT series_id, series_name, date, value
        FROM silver_bcb_sgs
        ORDER BY date DESC
        LIMIT 10
        """
    ).show(truncate=False)

    print("--- gold_anp_monthly (notebook cell 6) ---")
    spark.sql(
        """
        SELECT uf_sigla, product, month, avg_price
        FROM gold_anp_monthly
        ORDER BY month DESC, uf_sigla, product
        LIMIT 10
        """
    ).show(truncate=False)
    print(f"workspace: {root}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
