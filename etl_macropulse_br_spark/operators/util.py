"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure enough partitions to use the cluster for compute-heavy
    per-row work (hashing, shingling, vector math).

    Small inputs (one parquet file → one partition) would otherwise
    pin an expensive operator to a single core. The probe is
    ``df.inputFiles()`` — plan metadata, no RDD conversion (the
    previous ``df.rdd.getNumPartitions()`` built a Python RDD wrapper
    per call at plan-build time). At real scale the input has at
    least as many files as cores, so this is a no-op and never adds
    a shuffle; on small inputs it adds one cheap shuffle of the raw
    rows before the expensive projection. (A single multi-GB file
    still repartitions — redundant with maxPartitionBytes splitting,
    but a one-file input of that size is already a layout bug, and
    the extra exchange is harmless relative to the per-row work this
    guards.)
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if len(df.inputFiles()) >= target:
        return df
    return df.repartition(target)


def small_input_profile(df: DataFrame) -> bool:
    """True when the session runs the small-input profile
    (session.get_spark(profile="small-input"): AQE off, static tiny
    shuffle partitioning)."""
    return (
        df.sparkSession.conf.get("spark.sql.adaptive.enabled", "true")
        == "false"
    )


# Frames persisted by operators whose DAG consumes an expensive
# intermediate from multiple branches (LSH candidate sets, BM25
# term-frequency tables), registered for explicit release. Lives in
# this NEUTRAL module — consumers of text.bm25_topk should not need
# to know the release hook sits in the dedup module (it used to).
_PERSISTED_CANDIDATES: list[DataFrame] = []


def register_persisted(df: DataFrame) -> DataFrame:
    """Persist ``df`` MEMORY_AND_DISK and register it for release by
    :func:`unpersist_candidates`. Callers that persist on every
    invocation (bm25_topk, minhash_near_dups with their persist
    flags on) accumulate cached frames until released — a long-lived
    session looping over query sets must call
    :func:`unpersist_candidates` between iterations, or pass the
    operators' ``persist*=False`` escape hatch to stay fully lazy."""
    from pyspark.storagelevel import StorageLevel

    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED_CANDIDATES.append(out)
    return out


def unpersist_candidates() -> None:
    """Release every intermediate cache registered via
    :func:`register_persisted` so far (safe to call any time; lazy
    plans that still reference a released frame simply recompute)."""
    while _PERSISTED_CANDIDATES:
        _PERSISTED_CANDIDATES.pop().unpersist()


def persisted_count() -> int:
    """Number of currently-registered persisted frames — the public
    probe for harnesses that must know whether a plan build
    registered a cache (bench.py snapshots it around each build
    instead of reading the private list)."""
    return len(_PERSISTED_CANDIDATES)


def broadcast_small(df: DataFrame) -> DataFrame:
    """Broadcast hint for a build side that is small at bench scale
    but UNBOUNDED at the 100 TB target (orders/customer-derived join
    intermediates — never true dimension tables, which can take a
    plain ``F.broadcast``).

    Under the cluster profile (AQE on) the hint is omitted: AQE's
    runtime statistics choose broadcast vs shuffle join per run, so
    a fact-sized side can never be pinned into a driver OOM by a
    compile-time hint. Under the small-input profile (AQE off — the
    local bench, notebook samples) the hint stands in for exactly
    that runtime decision on inputs declared tiny; without it the
    static planner's default size estimates force sort-merge joins
    that cost more than the stages themselves.
    """
    if small_input_profile(df):
        return F.broadcast(df)
    return df
