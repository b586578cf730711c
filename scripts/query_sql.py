"""Ad hoc SQL surface — Spark twin of the reference's
``scripts/query_duckdb.py:8-25`` (SURVEY §3.2).

Registers the produced tables (or the driver testdata) as temp views
and runs the same query shapes through ``spark.sql``. Any SQL the
reference's DuckDB session accepted over its five tables runs here
unchanged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from etl_macropulse_br_spark.functions.sql_functions import (
        register_sql_functions,
    )
    from etl_macropulse_br_spark.session import get_spark
    from etl_macropulse_br_spark.sources.files import register_testdata_views

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="query_sql")
    register_testdata_views(spark, sf_dir)
    register_sql_functions(spark)

    print("-- engine SQL functions (locale parsers by name in raw SQL)")
    spark.sql(
        """
        SELECT parse_ptbr('1.234,56')            AS parsed,
               fmt_ptbr(1234.56)                 AS formatted,
               parse_date_ddmmyyyy('31/01/2024') AS d,
               flag_is_enabled(' YES ')          AS flag
        """
    ).show(truncate=False)

    print("-- catalog")
    spark.sql("SHOW TABLES").show(truncate=False)

    print("-- recent events (ORDER BY ... DESC LIMIT 10, query_duckdb.py:12-17 shape)")
    spark.sql(
        """
        SELECT event_id, ts, event_type, value
        FROM events ORDER BY ts DESC, event_id DESC LIMIT 10
        """
    ).show(truncate=False)

    print("-- monthly aggregate with deterministic tiebreaks (notebook cell 6 shape)")
    spark.sql(
        """
        SELECT event_type, trunc(ts, 'MM') AS month,
               count(*) AS n, round(avg(value), 2) AS avg_value
        FROM events
        GROUP BY event_type, trunc(ts, 'MM')
        ORDER BY month DESC, event_type
        LIMIT 10
        """
    ).show(truncate=False)


if __name__ == "__main__":
    main()
