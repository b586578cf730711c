"""SQL-surface twins of the expression library (functions/exprs.py):
``CREATE TEMPORARY FUNCTION`` registrations so ad-hoc ``spark.sql``
users — the audience of ``scripts/query_sql.py``, mirroring the
reference's ad-hoc DuckDB session (``scripts/query_duckdb.py``) —
get the engine's locale parsers and date coercions BY NAME in raw
SQL, with the same null-coercing semantics.

SQL scalar functions (not Python UDFs): each body is a pure
expression, so Catalyst inlines it into the calling plan — codegen,
pushdown, and constant folding all apply, identical to composing the
Column builders. The bodies use ``try_``-variants so coercion
semantics hold under ANY session, including a stock ANSI one (the
Column builders rely on the engine session's non-ANSI casts).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, return type, body). Bodies mirror
# functions/exprs.py one-to-one; keep them in sync.
SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # exprs.parse_ptbr_number
    "parse_ptbr": (
        "(s STRING)",
        "DOUBLE",
        "try_cast(replace(replace(s, '.', ''), ',', '.') AS DOUBLE)",
    ),
    # exprs.parse_price_mixed
    "parse_price_mixed": (
        "(s STRING)",
        "DOUBLE",
        "CASE WHEN contains(s, ',') THEN "
        "try_cast(replace(replace(s, '.', ''), ',', '.') AS DOUBLE) "
        "ELSE try_cast(s AS DOUBLE) END",
    ),
    # exprs.parse_date_ddmmyyyy
    "parse_date_ddmmyyyy": (
        "(s STRING)",
        "DATE",
        "CAST(try_to_timestamp(s, 'dd/MM/yyyy') AS DATE)",
    ),
    # exprs.dayfirst_date
    "dayfirst_date": (
        "(s STRING)",
        "DATE",
        "coalesce(CAST(try_to_timestamp(s, 'dd/MM/yyyy') AS DATE), "
        "CAST(try_to_timestamp(s, 'dd/MM/yy') AS DATE), "
        "CAST(try_to_timestamp(s, 'yyyy-MM-dd') AS DATE), "
        "try_cast(s AS DATE))",
    ),
    # exprs.month_trunc
    "month_floor": (
        "(d DATE)",
        "DATE",
        "trunc(d, 'MM')",
    ),
    # exprs.flag_is_enabled
    "flag_is_enabled": (
        "(s STRING)",
        "BOOLEAN",
        "lower(trim(s)) IN ('true', '1', 'yes')",
    ),
    # exprs.ptbr_format_number (2-decimal form)
    "fmt_ptbr": (
        "(v DOUBLE)",
        "STRING",
        "translate(format_number(v, 2), '.,', ',.')",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every SQL-surface function as a TEMPORARY FUNCTION on
    this session; returns the registered names. Idempotent
    (CREATE OR REPLACE)."""
    for name, (sig, ret, body) in SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(SQL_FUNCTIONS)
