"""Sinks: bronze/silver/gold parquet, catalog tables, text summary.

Spark-first rewrites of ``extract.py:91-93`` (bronze snapshots),
``main.py:63-69`` (silver + partitioned gold), ``load.py:12-28``
(partitioned writer + idempotent full-replace table load),
``main.py:80-86`` (summary text sink).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def save_bronze(df: DataFrame, out_path: str) -> None:
    """Raw snapshot sink (``extract.py:91-93``): overwrite parquet."""
    df.write.mode("overwrite").parquet(out_path)


def save_silver(df: DataFrame, out_path: str) -> None:
    """Unpartitioned silver parquet (``main.py:63-65``)."""
    df.write.mode("overwrite").parquet(out_path)


def write_parquet_partitioned(
    df: DataFrame, base_dir: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned gold sink (``load.py:12-15``,
    call sites ``main.py:68-69``).

    ``partitionBy`` gives downstream readers partition pruning for
    free; at 100 TB the partition column choice (low-cardinality
    series_id / uf_sigla) keeps file counts sane.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(base_dir)


def load_table_replace(
    spark: SparkSession, df: DataFrame, table: str
) -> None:
    """Idempotent full-replace table load (``load.py:18-28``).

    The reference creates-if-absent, deletes, and re-inserts into
    DuckDB; the Spark-native equivalent is an overwrite
    ``saveAsTable`` into the session catalog (or a temp view when no
    warehouse is configured). MERGE-by-keys remains the incremental
    path (``load.py:23`` TODO) — see plans/incremental.py.
    """
    df.createOrReplaceTempView(f"{table}__staging")
    try:
        df.write.mode("overwrite").saveAsTable(table)
    except Exception:
        # No writable warehouse (e.g. read-only FS): expose via view.
        df.createOrReplaceTempView(table)


def write_summary(text: str, out_path: str) -> None:
    """Markdown summary sink (``main.py:80-86``): tiny driver-side
    artifact, plain file write."""
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(text)


def write_sorted_layout(
    df: DataFrame,
    base_dir: str,
    sort_cols: list[str],
    partition_cols: list[str] | None = None,
    target_files: int | None = None,
) -> None:
    """Scan-pruning layout sink (extension surface): range-partition
    the data by ``sort_cols`` and sort within each output file, so
    every parquet file carries NARROW, mostly-disjoint column
    min/max footer statistics. Downstream filtered scans on those
    columns then skip whole files/row-groups (Spark's parquet reader
    prunes on footer stats once `PushedFilters` reach the scan) —
    the single highest-leverage layout choice for a 100 TB
    append-only fact table queried by time range.

    ``repartitionByRange`` gives the global ordering ACROSS files
    (a plain ``sortWithinPartitions`` after hash partitioning would
    sort inside each file but leave every file spanning the full
    value range — no pruning); the within-file sort then tightens
    row-group stats. Hive-style ``partition_cols`` compose on top
    for categorical pruning.
    """
    n = target_files or df.sparkSession.sparkContext.defaultParallelism
    out = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(base_dir)
