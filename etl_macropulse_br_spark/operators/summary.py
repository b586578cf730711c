"""Rules-based summary analytics (``summary.py:6-94``).

The heavy lifting (monthly aggregation, lag windows, top-k) stays
distributed; only the final <10 rows are collected to the driver for
text formatting — mirroring the reference's output contract
(``data/gold/summary.md``) without ever looping over data in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_macropulse_br_spark.functions.exprs import month_trunc

DEFAULT_TARGET_SERIES = "selic_sgs_11"  # summary.py:12


def latest_observation(bcb_silver: DataFrame, series_name: str) -> DataFrame:
    """Latest row of one series (``summary.py:15-21``): case-insensitive
    name match, then global last-by-date. ``orderBy().limit(1)`` plans
    TakeOrderedAndProject — a true distributed top-1, no full sort."""
    return (
        bcb_silver.filter(F.lower(F.col("series_name").cast("string")) == series_name.lower())
        .orderBy(F.col("date").desc())
        .limit(1)
    )


def last_per_month(bcb_silver: DataFrame, series_name: str) -> DataFrame:
    """Last observation of each month for one series
    (``summary.py:31-38``: sort + groupby(month).tail(1) →
    row_number window descending, keep rank 1)."""
    filtered = bcb_silver.filter(
        F.lower(F.col("series_name").cast("string")) == series_name.lower()
    ).withColumn("month", month_trunc("date"))
    w = Window.partitionBy("month").orderBy(F.col("date").desc())
    return (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def mom_delta_last_two(month_series: DataFrame, value_col: str = "value") -> DataFrame:
    """Delta between the final two monthly observations
    (``summary.py:40-44``): lag over month, keep latest row."""
    w = Window.orderBy(F.col("month").asc())
    with_lag = month_series.withColumn(
        "mom_change", F.col(value_col) - F.lag(value_col, 1).over(w)
    )
    return with_lag.orderBy(F.col("month").desc()).limit(1)


def top_movers(
    anp_monthly_mom: DataFrame, k: int = 3
) -> DataFrame:
    """Top-k MoM price increases in the latest month
    (``summary.py:73-77``): filter to max(month), drop null deltas,
    top-k descending. The latest-month filter is a scalar-subquery
    join (Catalyst folds it); top-k is TakeOrderedAndProject."""
    latest = anp_monthly_mom.agg(F.max("month").alias("month"))
    return (
        anp_monthly_mom.join(F.broadcast(latest), on="month", how="inner")
        .filter(F.col("mom_change").isNotNull())
        .orderBy(F.col("mom_change").desc(), "uf_sigla", "product")
        .limit(k)
    )


def build_summary_text(
    bcb_silver: DataFrame,
    anp_silver: DataFrame,
    target_series: str = DEFAULT_TARGET_SERIES,
) -> str:
    """Reproduce the reference's markdown summary (``summary.py:6-94``,
    golden example at ``data/gold/summary.md:1-6``).

    Distributed plan → collect of <10 rows → driver-side f-strings.
    """
    from etl_macropulse_br_spark.operators.gold import mom_change

    lines: list[str] = []

    latest = latest_observation(bcb_silver, target_series).collect()
    if latest:
        row = latest[0]
        lines.append(
            f"- Último valor de {target_series}: {row['value']:.2f} "
            f"em {row['date']}"
        )
        monthly = last_per_month(bcb_silver, target_series)
        delta_rows = mom_delta_last_two(monthly).collect()
        if delta_rows and delta_rows[0]["mom_change"] is not None:
            lines.append(
                f"- Variação vs mês anterior: {delta_rows[0]['mom_change']:+.2f}"
            )
    else:
        lines.append(f"- Série {target_series} sem dados.")

    anp_monthly = (
        anp_silver.withColumn("month", month_trunc("date_ref"))
        .groupBy("uf_sigla", "product", "month")
        .agg(F.avg("price").alias("avg_price"))
    )
    anp_mom = mom_change(anp_monthly, ["uf_sigla", "product"], "avg_price")
    movers = top_movers(anp_mom, k=3).collect()
    if movers:
        latest_month = movers[0]["month"]
        lines.append(f"ANP - Destaques de {latest_month}:")
        for r in movers:
            lines.append(
                f"- {r['product']} em {r['uf_sigla']}: "
                f"{r['avg_price']:.2f} ({r['mom_change']:+.2f} MoM)"
            )
    return "\n".join(lines) + "\n"
