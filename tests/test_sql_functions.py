"""SQL-surface functions: registered-by-name parity with the Column
builders in functions/exprs.py, plus ANSI-session robustness (the
SQL bodies use try_-variants, so coercion semantics hold even where
the Column builders rely on the engine session's non-ANSI casts)."""

from __future__ import annotations

import pytest

from etl_macropulse_br_spark.functions.sql_functions import (
    SQL_FUNCTIONS,
    register_sql_functions,
)


@pytest.fixture(scope="module")
def sql_spark(spark):
    register_sql_functions(spark)
    return spark


CASES = [
    ("parse_ptbr('1.234,56')", 1234.56),
    ("parse_ptbr('0,5')", 0.5),
    ("parse_ptbr('oops')", None),
    ("parse_price_mixed('1.234,56')", 1234.56),
    ("parse_price_mixed('1234.56')", 1234.56),
    ("parse_price_mixed(NULL)", None),
    ("parse_date_ddmmyyyy('31/01/2024')", "2024-01-31"),
    ("parse_date_ddmmyyyy('2024-01-31')", None),  # wrong format → NULL
    ("dayfirst_date('31/01/2024')", "2024-01-31"),
    ("dayfirst_date('2024-01-31')", "2024-01-31"),  # ISO fallback
    ("dayfirst_date('garbage')", None),
    ("month_floor(DATE'2024-01-31')", "2024-01-01"),
    ("flag_is_enabled(' YES ')", True),
    ("flag_is_enabled('0')", False),
    ("fmt_ptbr(1234.56)", "1.234,56"),
]


def test_sql_functions_values(sql_spark):
    exprs = ", ".join(f"{e} AS c{i}" for i, (e, _) in enumerate(CASES))
    row = sql_spark.sql(f"SELECT {exprs}").collect()[0]
    for i, (expr, want) in enumerate(CASES):
        got = row[f"c{i}"]
        if hasattr(got, "isoformat"):
            got = got.isoformat()
        assert got == want, (expr, got, want)


def test_sql_functions_match_column_builders(sql_spark):
    """The SQL registrations and the Column builders must agree on the
    same inputs — they are one library exposed two ways."""
    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.functions import exprs

    df = sql_spark.createDataFrame(
        [("1.234,56", "31/01/2024"), ("7,5", "05/12/1999"), ("bad", "nope")],
        ["num", "dt"],
    )
    df.createOrReplaceTempView("sqlfn_inputs")
    via_sql = sql_spark.sql(
        """
        SELECT parse_ptbr(num) AS v, parse_date_ddmmyyyy(dt) AS d,
               flag_is_enabled(num) AS f, fmt_ptbr(parse_ptbr(num)) AS s
        FROM sqlfn_inputs
        """
    ).collect()
    via_col = df.select(
        exprs.parse_ptbr_number("num").alias("v"),
        exprs.parse_date_ddmmyyyy("dt").alias("d"),
        exprs.flag_is_enabled("num").alias("f"),
        exprs.ptbr_format_number(exprs.parse_ptbr_number("num")).alias("s"),
    ).collect()
    assert [tuple(r) for r in via_sql] == [tuple(r) for r in via_col]


def test_sql_functions_survive_ansi_session(sql_spark):
    """try_-based bodies: a bad parse yields NULL, not an exception,
    even with ANSI behavior forced on for the statement."""
    sql_spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        register_sql_functions(sql_spark)  # re-register under ANSI
        row = sql_spark.sql(
            "SELECT parse_ptbr('oops') AS a, dayfirst_date('junk') AS b"
        ).collect()[0]
        assert row["a"] is None and row["b"] is None
    finally:
        sql_spark.conf.set("spark.sql.ansi.enabled", "false")
        register_sql_functions(sql_spark)


def test_registry_names_are_registered(sql_spark):
    for name in SQL_FUNCTIONS:
        # resolvable by name — SHOW USER FUNCTIONS lists temp functions
        fns = {
            r[0].split(".")[-1]
            for r in sql_spark.sql("SHOW USER FUNCTIONS").collect()
        }
        assert name in fns
