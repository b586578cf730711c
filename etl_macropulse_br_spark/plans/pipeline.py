"""Config-driven pipeline orchestrator — the engine's ``main``.

Mirrors the reference lifecycle (``main.py:23-86``, SURVEY §3.1) as
one lazy DataFrame DAG per zone, materialized only at sinks:

  config → extract (BCB loop, IBGE dim, ANP CSV) → silver → join →
  gold → load (silver parquet ×3, partitioned gold ×2, catalog ×5) →
  summary text.

Unlike the reference, nothing is eagerly materialized between steps;
Catalyst sees the full plan from scan to sink. HTTP extracts accept
an injectable ``fetch`` so tests (and offline runs) never hit the
network.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from etl_macropulse_br_spark.operators.gold import build_gold_metrics
from etl_macropulse_br_spark.operators.silver import (
    enrich_with_uf_dim,
    to_silver_anp,
    to_silver_bcb,
)
from etl_macropulse_br_spark.operators.summary import build_summary_text
from etl_macropulse_br_spark.sinks.writers import (
    load_table_replace,
    save_bronze,
    save_silver,
    write_parquet_partitioned,
    write_summary,
)
from etl_macropulse_br_spark.sources.files import (
    is_enabled_flag,
    read_csv_sep_fallback,
    read_run_config,
    read_series_config,
)
from etl_macropulse_br_spark.sources.rest import (
    FetchFn,
    extract_bcb_many,
    extract_ibge_uf_dim,
)


@dataclass
class PipelineResult:
    """Handles to every produced table + the summary text."""

    tables: dict[str, DataFrame] = field(default_factory=dict)
    summary_text: str = ""


def run_pipeline(
    spark: SparkSession,
    run_config_path: str = "inputs/run_config.json",
    series_config_path: str = "inputs/bcb_series.csv",
    data_dir: str = "data",
    fetch: FetchFn | None = None,
    write_outputs: bool = True,
) -> PipelineResult:
    """Full medallion run (``main.py:23-86``)."""
    cfg = read_run_config(run_config_path)
    start_date = cfg["start_date"]
    end_date = cfg["end_date"]
    anp_path = cfg["anp_bronze_file"]

    # Control-table scan + enabled filter (main.py:32-33).
    series_rows = read_series_config(series_config_path)
    enabled = [
        (int(r["series_id"]), r["series_name"])
        for r in series_rows
        if is_enabled_flag(r.get("enabled"))
    ]

    # Extract → silver (one lazy DAG; bronze snapshots are the only
    # mid-pipeline materialization, mirroring main.py:40,46,50).
    bcb_raw = extract_bcb_many(spark, enabled, start_date, end_date, fetch)
    uf_dim = extract_ibge_uf_dim(spark, fetch)
    anp_raw = read_csv_sep_fallback(spark, anp_path)

    if write_outputs:
        save_bronze(bcb_raw, os.path.join(data_dir, "bronze", "bcb_sgs"))
        save_bronze(uf_dim, os.path.join(data_dir, "bronze", "ibge_uf"))
        save_bronze(anp_raw, os.path.join(data_dir, "bronze", "anp_raw"))

    # (long-lived sessions release these via
    # operators.util.unpersist_candidates after consuming the result)
    from etl_macropulse_br_spark.operators.util import register_persisted

    # the silver frames feed EVERY downstream action (bronze/silver/
    # gold sinks, 5+ catalog registrations, the summary collect) —
    # without materialization each action re-runs the CSV scan +
    # header mapping + locale parsing + dedup window from source
    # (~8-10 full re-parses per run, r9 review fix); persisted, the
    # parse runs once and the sinks share it
    bcb_silver = register_persisted(to_silver_bcb(bcb_raw))
    anp_silver = to_silver_anp(anp_raw)
    anp_enriched = register_persisted(
        enrich_with_uf_dim(anp_silver, uf_dim)
    )

    gold = build_gold_metrics(bcb_silver, anp_enriched)

    tables: dict[str, DataFrame] = {
        "silver_bcb_sgs": bcb_silver,
        "silver_anp_prices": anp_enriched,
        "dim_uf": uf_dim,
        **gold,
    }

    if write_outputs:
        save_silver(bcb_silver, os.path.join(data_dir, "silver", "bcb_sgs"))
        save_silver(anp_enriched, os.path.join(data_dir, "silver", "anp_prices"))
        save_silver(uf_dim, os.path.join(data_dir, "silver", "dim_uf"))
        write_parquet_partitioned(
            gold["gold_bcb_monthly"],
            os.path.join(data_dir, "gold", "gold_bcb_monthly"),
            ["series_id"],
        )
        write_parquet_partitioned(
            gold["gold_anp_monthly"],
            os.path.join(data_dir, "gold", "gold_anp_monthly"),
            ["uf_sigla"],
        )

    # Catalog registration so spark.sql over the same table names
    # works (S9/S11; scripts/query_duckdb.py parity).
    for name, df in tables.items():
        load_table_replace(spark, df, name)

    summary = build_summary_text(bcb_silver, anp_enriched)
    if write_outputs:
        write_summary(summary, os.path.join(data_dir, "gold", "summary.md"))

    return PipelineResult(tables=tables, summary_text=summary)
