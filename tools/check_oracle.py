"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every declared query through Spark AND its oracle SQL through
DuckDB on the same parquet tables, then compares row count, column
names, and order-insensitive TYPED values.

Both sides are fetched through Arrow so engine type divergence is
visible instead of laundered by Python coercion: DuckDB HUGEINT
arrives as ``Decimal`` (not int), timestamps keep microsecond
precision, and every value is tagged with a type discriminator
before comparison.  Round 1 lesson: a ``sum(...) OVER`` the oracle
left as HUGEINT passed the old int-round-tripping normalizer but
failed the driver's typed hash — this gate must be at least as
strict as the driver's.

Floats are still rounded to 9dp before compare — the queries
themselves round their computed float columns, so this only absorbs
representation noise, never masks a type difference.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

sys.path.insert(0, ".")


def _norm_val(v):
    """Type-tagged normal form.  Distinct engine types that stringify
    alike (Decimal('5') vs 5, naive vs aware timestamps) must NOT
    collide, so each value carries a discriminator."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 9))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, datetime.datetime):
        # Full microsecond precision; tz-aware vs naive is an engine
        # session artifact, so compare in naive-UTC normal form.
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_norm_val(x) for x in v))
    if isinstance(v, bytes):
        return ("bin", v)
    return ("s", str(v))


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    normed = [tuple(_norm_val(r[i]) for i in order) for r in rows]
    return sorted(normed, key=lambda t: tuple((v is None, str(v)) for v in t))


def _arrow_rows(tbl) -> tuple[list[str], list[tuple]]:
    cols = tbl.column_names
    pyd = tbl.to_pydict()
    n = tbl.num_rows
    return cols, [tuple(pyd[c][i] for c in cols) for i in range(n)]


def main() -> int:
    import duckdb

    from etl_macropulse_br_spark.plans.queries import (
        AUX_ORACLES,
        AUX_QUERIES,
        ORACLES,
        QUERIES,
    )
    from etl_macropulse_br_spark.session import get_spark
    from etl_macropulse_br_spark.sources.files import TESTDATA_TABLES

    # The local gate covers the declared 50 AND the consolidated aux
    # probes — strictly more than the driver checks.
    all_queries = {**QUERIES, **AUX_QUERIES}
    all_oracles = {**ORACLES, **AUX_ORACLES}

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # Mirror the grading driver's conditions: a stock session,
        # Spark 4 defaults (ANSI mode ON, default shuffle/AQE) —
        # catches anything that silently depends on the engine's
        # session config (coercive casts, non-ANSI arithmetic).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_oracle_vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    ran = 0
    for name, fn in all_queries.items():
        if only and name not in only:
            continue
        ran += 1
        sdf = fn(spark, sf_dir)
        s_cols, s_rows = _arrow_rows(sdf.toArrow())
        if name not in all_oracles:
            print(f"{name:28s} rows-only: {len(s_rows)} rows")
            continue
        d_cols, d_rows = _arrow_rows(con.execute(all_oracles[name]).fetch_arrow_table())
        status = []
        if sorted(s_cols) != sorted(d_cols):
            status.append(f"SCHEMA spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            status.append(f"COUNT spark={len(s_rows)} duck={len(d_rows)}")
        if not status:
            ns, nd = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
            if ns != nd:
                diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                status.append(f"VALUES first-diffs={diff}")
        if status:
            failures.append(name)
            print(f"{name:28s} FAIL  {' | '.join(status)}")
        else:
            print(f"{name:28s} OK    ({len(s_rows)} rows)")

    # Count only what actually ran: invoked on a subset, the summary
    # must say e.g. "1/1", never the full-registry denominator.
    scope = (
        f"({len(QUERIES)} declared + {len(AUX_QUERIES)} aux)"
        if not only
        else f"(subset of {len(all_queries)} registered)"
    )
    print(f"\n{ran - len(failures)}/{ran} pass {scope}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
