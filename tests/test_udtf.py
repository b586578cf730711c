"""Python UDTF surface: SeriesExplode from SQL LATERAL and the
DataFrame tvf path, including reject-row semantics."""

from __future__ import annotations

import json


GOOD = json.dumps(
    [
        {"data": "01/02/2024", "valor": "1.234,56"},
        {"data": "01/03/2024", "valor": "7,89"},
    ]
)


def test_series_explode_sql_lateral(spark):
    from etl_macropulse_br_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(101, GOOD), (102, "{not json"), (103, None)],
        "series_id long, payload string",
    ).createOrReplaceTempView("payloads")
    rows = spark.sql(
        """
        SELECT p.series_id, s.data, s.valor, s.parse_ok
        FROM payloads p, LATERAL series_explode(p.payload) s
        ORDER BY p.series_id, s.data
        """
    ).collect()
    by_series = {}
    for r in rows:
        by_series.setdefault(r["series_id"], []).append(r)
    assert [(r["data"], r["valor"]) for r in by_series[101]] == [
        ("01/02/2024", "1.234,56"),
        ("01/03/2024", "7,89"),
    ]
    assert all(r["parse_ok"] for r in by_series[101])
    # malformed and null payloads each yield exactly one reject row
    for sid in (102, 103):
        assert len(by_series[sid]) == 1
        rej = by_series[sid][0]
        assert rej["parse_ok"] is False and rej["valor"] is None


def test_series_explode_rows_feed_existing_parsers(spark):
    """The UDTF output plugs straight into the same expressions the
    REST source uses (functions/exprs.py)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.functions.exprs import (
        parse_date_ddmmyyyy,
        parse_ptbr_number,
    )
    from etl_macropulse_br_spark.functions.udtf import SeriesExplode

    out = (
        SeriesExplode(F.lit(GOOD))
        .filter("parse_ok")
        .select(
            parse_date_ddmmyyyy("data").alias("date"),
            parse_ptbr_number("valor").alias("value"),
        )
        .collect()
    )
    assert [(r["date"], r["value"]) for r in out] == [
        (dt.date(2024, 2, 1), 1234.56),
        (dt.date(2024, 3, 1), 7.89),
    ]


def test_series_explode_non_dict_entries_become_rejects(spark):
    from etl_macropulse_br_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    payload = json.dumps([{"data": "01/01/2020", "valor": "1"}, 42, "x"])
    rows = spark.sql(
        f"SELECT * FROM series_explode('{payload}')"
    ).collect()
    assert [r["parse_ok"] for r in rows] == [True, False, False]
