"""Cross-engine hashing portability: the md5 family and its SQL
twins must be bit-identical in Spark and DuckDB — this is what makes
the dedup/fingerprint oracles valid."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_macropulse_br_spark.functions.hashing import (
    _MASK32,
    _lcg_constants,
    base32,
    base32_sql,
    md5_long,
    md5_long_sql,
)

SAMPLES = ["", "a", "abc", "the quick brown fox", "café açaí", "0", "x" * 100]


def test_md5_long_matches_duckdb(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["x"])
    got = [r["h"] for r in df.select(md5_long("x").alias("h")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {md5_long_sql('?::VARCHAR')}", [s]).fetchone()[0]
        for s in SAMPLES
    ]
    assert got == want


def test_md5_long_seeded_and_base32_match_duckdb(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["x"])
    got = [
        (r["h7"], r["b"])
        for r in df.select(
            md5_long("x", seed=7).alias("h7"), base32("x").alias("b")
        ).collect()
    ]
    con = duckdb.connect()
    for s, (h7, b) in zip(SAMPLES, got):
        w7 = con.execute(
            f"SELECT {md5_long_sql('?::VARCHAR', seed=7)}", [s]
        ).fetchone()[0]
        wb = con.execute(f"SELECT {base32_sql('?::VARCHAR')}", [s]).fetchone()[0]
        assert (h7, b) == (w7, wb)
        assert 0 <= b <= _MASK32


def test_lcg_constants_bounds():
    consts = _lcg_constants(64)
    assert len(set(consts)) == 64  # all distinct
    for a, b in consts:
        assert 1 <= a < 2**31 and a % 2 == 1
        assert 0 <= b < 2**31
        # no 64-bit overflow for a 32-bit base
        assert a * _MASK32 + b < 2**63
