"""Distinct-count sketching — KMV (k minimum values).

The classic KMV/bottom-k estimator (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream"; Beyer et al. 2007
SIGMOD for the unbiased variant): hash every value into [0, 1),
keep the k smallest distinct hashes; if the k-th smallest is U, the
unbiased distinct estimate is (k - 1) / U. Intuition: k uniform
points occupying a prefix of length U of the unit interval imply
~k/U points overall.

Why KMV here instead of HyperLogLog (`approx_count_distinct`):
the estimator is built ENTIRELY from the portable md5 hash family
(functions/hashing.py), so Spark and the DuckDB oracle compute
bit-identical sketches and estimates — an *oracle-gateable*
approximate operator, which HLL can never be across engines (each
engine's sketch layout and bias correction differ). Swap the hash
for ``xxhash64`` on a real cluster for raw speed; the plan shape is
identical.

Scale shape: hash projection → partial-distinct → global top-k of
the hashes via sort-limit (Spark plans ``TakeOrderedAndProject`` —
a distributed bottom-k, no global sort materialization, shuffle
carries ≤ k × partitions hashes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_macropulse_br_spark.functions.hashing import md5_long, md5_long_sql

# md5_long yields 60-bit non-negative integers (15 hex digits), so
# hash/2^60 is the uniform position in [0, 1).
_HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame, col: str | Column, k: int = 64
) -> DataFrame:
    """One-row frame ``(n_kept, kth_hash, est_distinct)``.

    ``est_distinct`` is the unbiased KMV estimate (k-1)/U with
    U = kth_hash / 2^60 — computed as the single double division
    ``(k-1) * 2^60 / kth_hash`` of two exact integers, so the result
    is bit-identical across engines. When the input has fewer than k
    distinct hashes the sketch degenerates to the EXACT distinct
    count (n_kept), and the estimate is published as that exact
    count — the standard small-cardinality short-circuit.
    """
    c = F.col(col) if isinstance(col, str) else col
    bottom = (
        df.select(md5_long(c).alias("h"))
        .distinct()
        .orderBy(F.col("h").asc())
        .limit(k)
    )
    agg = bottom.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth_hash"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("kth_hash")
    )
    return agg.select("n_kept", "kth_hash", est.alias("est_distinct"))


def kmv_distinct_sql(
    table: str, col_expr: str, k: int = 64
) -> str:
    """DuckDB twin of :func:`kmv_distinct` — same hashes, same
    bottom-k, same exact-integer division, bit-identical output."""
    return f"""
WITH bottom AS (
  SELECT DISTINCT {md5_long_sql(col_expr)} AS h
  FROM {table}
  ORDER BY h ASC
  LIMIT {k}
), agg AS (
  SELECT count(*) AS n_kept, max(h) AS kth_hash FROM bottom
)
SELECT n_kept, kth_hash,
       CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
            ELSE CAST({float(k - 1)!r} AS DOUBLE)
                 * CAST({_HASH_SPACE!r} AS DOUBLE) / kth_hash
       END AS est_distinct
FROM agg
"""
