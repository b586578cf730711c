"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure enough partitions to use the cluster for compute-heavy
    per-row work (hashing, shingling, vector math).

    Small inputs (one parquet file → one partition) would otherwise
    pin an expensive operator to a single core. No-op when the input
    already has ≥ default-parallelism partitions — so at real scale
    this never adds a shuffle; on small inputs it adds one cheap
    shuffle of the raw rows before the expensive projection.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
