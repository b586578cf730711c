"""Silver-zone transforms: clean, type, standardize, dedup.

Spark-first rewrites of ``transform.py:8-109``. Each function is a
pure DataFrame → DataFrame transform (lazy; no materialization).
The reference's sort-then-keep-first dedup (pandas row order) is
replaced with deterministic key-ordered dedup — SURVEY §4.2 trap #2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_macropulse_br_spark.functions.exprs import (
    dayfirst_date,
    parse_price_mixed,
)
from etl_macropulse_br_spark.functions.headers import (
    ANP_ROLE_CANDIDATES,
    resolve_columns,
)


def dedup_keep_first(
    df: DataFrame, keys: list[str], order: list[str]
) -> DataFrame:
    """Deterministic ``drop_duplicates(keys)`` keeping the first row
    under an explicit order.

    pandas keeps first-in-row-order (``transform.py:12,107``); Spark's
    ``dropDuplicates`` keeps an *arbitrary* row. The faithful
    distributed form is a ``min_by(struct(payload), struct(order))``
    hash aggregate (r6; previously a row_number window): it
    PARTIAL-COMBINES map-side, so the one shuffle carries only
    |groups| candidate rows — not every input row — and needs no
    per-partition sort. Struct ordering compares order columns
    left-to-right with nulls-first, exactly matching the window
    form's ``ORDER BY ... ASC`` (verified incl. null order keys and
    ANSI mode); ties beyond ``order`` remain partition-order-
    dependent in both forms, so pass a total order for full
    determinism.
    """
    payload = [c for c in df.columns if c not in keys]
    if not payload:
        return df.dropDuplicates(keys)

    # backtick-quote every name reference — a payload column named
    # "a.b" (raw source headers pass through here before role
    # renaming) must not be parsed as nested field access, which
    # both F.col and df[...] would do. getField() is literal.
    def q(name: str) -> F.Column:
        return F.col("`" + name.replace("`", "``") + "`")

    first = F.min_by(
        F.struct(*[q(c).alias(c) for c in payload]),
        F.struct(*[q(c) for c in order]),
    ).alias("__first")
    agg = df.groupBy(*[q(c) for c in keys]).agg(first)
    return agg.select(
        *[
            q(c) if c in keys
            else F.col("__first").getField(c).alias(c)
            for c in df.columns
        ]
    )


def to_silver_bcb(df: DataFrame) -> DataFrame:
    """BCB/SGS silver: typed long-format series observations.

    Reference ``transform.py:8-14``: drop null dates, sort by
    (series_id, date), dedup on (series_id, date), project
    ``series_id, series_name, date, value``. The sort exists only to
    make pandas' dedup deterministic — here it dissolves into the
    dedup's window order (value as final tiebreak for full
    determinism on conflicting duplicates).
    """
    cleaned = df.filter(F.col("date").isNotNull())
    deduped = dedup_keep_first(
        cleaned, keys=["series_id", "date"], order=["date", "value"]
    )
    return deduped.select("series_id", "series_name", "date", "value")


def to_silver_anp(df: DataFrame) -> DataFrame:
    """ANP silver: fuzzy header mapping → standard projection →
    locale-aware parsing → quality filters → dedup.

    Reference ``transform.py:17-109``:
    - resolve raw headers to roles (driver-side, ``transform.py:27-72``)
    - trim/upper UF, trim product (``transform.py:76-81``)
    - day-first date parse with coercion (``transform.py:84``)
    - mixed-format price parse (``transform.py:87-100``)
    - drop nulls on all four roles, keep price > 0
      (``transform.py:103-104``)
    - dedup on (date_ref, uf_sigla, product) (``transform.py:107``)

    All of it is Catalyst expressions — the parse/filter push into the
    scan, and the single shuffle is the dedup window.
    """
    mapping = resolve_columns(df.columns, ANP_ROLE_CANDIDATES)
    projected = df.select(
        F.upper(F.trim(F.col(mapping["uf_sigla"]).cast("string"))).alias("uf_sigla"),
        F.trim(F.col(mapping["product"]).cast("string")).alias("product"),
        dayfirst_date(F.col(mapping["date_ref"])).alias("date_ref"),
        parse_price_mixed(F.col(mapping["price"])).alias("price"),
    )
    cleaned = projected.na.drop(
        subset=["date_ref", "uf_sigla", "product", "price"]
    ).filter(F.col("price") > 0)
    return dedup_keep_first(
        cleaned,
        keys=["date_ref", "uf_sigla", "product"],
        order=["price"],
    )


def enrich_with_uf_dim(anp_silver: DataFrame, dim_uf: DataFrame) -> DataFrame:
    """Left-join fact with the 27-row UF dimension (``main.py:56``).

    Explicit broadcast: the dim is tiny, so the join is a broadcast
    hash join with zero shuffle regardless of fact size — the right
    plan at 100 TB as much as at 60k rows.
    """
    dim = dim_uf.select("uf_sigla", "uf_nome", "regiao_nome")
    return anp_silver.join(F.broadcast(dim), on="uf_sigla", how="left")
