"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every declared query through Spark AND its oracle SQL through
DuckDB on the same parquet tables, then compares row count, column
names, and order-insensitive values (floats rounded to 9dp before
compare — the queries themselves already round their computed
columns, so this only absorbs representation noise).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 9)
        if hasattr(v, "isoformat"):
            return v.isoformat()[:19].replace("T", " ")
        return v

    normed = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(normed, key=lambda t: tuple((v is None, str(v)) for v in t))


def main() -> int:
    import duckdb

    from etl_macropulse_br_spark.plans.queries import ORACLES, QUERIES
    from etl_macropulse_br_spark.session import get_spark
    from etl_macropulse_br_spark.sources.files import TESTDATA_TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        if name not in ORACLES:
            print(f"{name:28s} rows-only: {len(s_rows)} rows")
            continue
        res = con.execute(ORACLES[name])
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
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

    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
