"""Per-group feature normalization — expression path and grouped-map
pandas path.

``zscore_expr`` computes the per-group z-score with window
aggregates over EXACT integer sums (values are finite 2-decimal
doubles → cents), deriving mean and sample variance from
(n, Σc, Σc²) with the same double arithmetic on both engines — so
the result is bit-identical in the DuckDB oracle despite involving a
variance.

``zscore_pandas`` is the same semantics via ``applyInPandas``
(grouped map) — the API of choice when per-group logic outgrows SQL
(model scoring, per-entity fits). Tests assert it matches the
expression path to float tolerance.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_expr(
    df: DataFrame, value_col: str, group_cols: list[str], out_col: str = "zscore"
) -> DataFrame:
    """z = (v - mean) / sample_std, NULL when the group has <2 rows
    or zero variance. All moments from exact integer cent-sums."""
    w = Window.partitionBy(*group_cols)
    # shift-then-truncate == round-half-away-from-zero, minus the
    # per-row BigDecimal cost of F.round (see plans.queries._scaled)
    x = F.col(value_col) * 100
    c = F.when(x < 0, x - F.lit(0.5)).otherwise(x + F.lit(0.5)).cast(
        "bigint"
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum(c).over(w)
    ssq = F.sum(c * c).over(w)
    # var in cents² with the textbook (ssq - s²/n)/(n-1) form, each
    # step the same double op on both engines
    mean_cents = s / n
    var_cents = (ssq - (s * s) / n) / (n - 1)
    z = (c - mean_cents) / F.sqrt(var_cents)
    return df.withColumn(
        out_col,
        F.when((n >= 2) & (var_cents > 0), z).otherwise(F.lit(None)),
    )


def zscore_expr_sql(
    table: str, value_col: str, group_cols: list[str], select_cols: list[str]
) -> str:
    """DuckDB twin of :func:`zscore_expr` (same ops, same order)."""
    g = ", ".join(group_cols)
    sel = ", ".join(select_cols)
    return f"""
WITH c_t AS (
  SELECT {sel}, CAST(round({value_col} * 100, 0) AS BIGINT) AS c
  FROM {table}
), m AS (
  SELECT *,
         count(*) OVER (PARTITION BY {g}) AS n,
         sum(c) OVER (PARTITION BY {g}) AS s,
         sum(c * c) OVER (PARTITION BY {g}) AS ssq
  FROM c_t
)
SELECT {sel},
       CASE WHEN n >= 2
             AND ((ssq - (s * s) / n) / (n - 1)) > 0
            THEN (c - s / n) / sqrt((ssq - (s * s) / n) / (n - 1))
            END AS zscore
FROM m
"""


def zscore_pandas(
    df: DataFrame, value_col: str, group_cols: list[str], out_col: str = "zscore"
) -> DataFrame:
    """Grouped-map (applyInPandas) implementation: one pandas frame
    per group. Same semantics as :func:`zscore_expr` up to float
    associativity."""
    schema_str = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
        + f", {out_col} double"
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        if len(pdf) >= 2 and v.std(ddof=1) > 0:
            pdf[out_col] = (v - v.mean()) / v.std(ddof=1)
        else:
            pdf[out_col] = None
        return pdf

    return df.groupBy(*group_cols).applyInPandas(norm, schema=schema_str)
