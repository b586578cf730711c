"""Streaming running quantiles via HDR log-bucket counts in state —
bounded-memory percentiles over an unbounded stream: an exact
streaming quantile needs every value ever seen (unbounded state),
while the HDR state is <= (64-s)*2^s + 2^s integer bucket counts
per group, forever, with the bracket/error guarantees of the batch
sketch (operators/sketches.py:hdr_quantiles_by).

The batch twin computes the SAME buckets (Python ``int.bit_length``
here is exactly the batch side's ``length(bin(v)) - 1``), and bucket
counts merge by ADDITION — associative and commutative — so
micro-batch slicing cannot change the final sketch: after consuming
the whole input, each group's latest rows EQUAL the batch
``hdr_quantiles_by`` rows bit-for-bit (rank, bracket, and midpoint
estimate). Pinned by the stream-vs-batch differential test.

Emits one (group, q) row per requested quantile per group per
micro-batch — a running latency/price dashboard feed ("p50/p95 per
event type so far"). Values must be non-negative (negatives raise,
matching the batch guard — a corrupt feed should kill the query,
not silently alias a positive bucket); nulls are skipped on both
sides. No watermark/timeout — lifetime quantiles are monotone
state by design (window upstream for "p95 per hour").

r9 adds :func:`running_signed_quantiles_stream` — the signed/
double-domain twin (fixed-point floor gateway + mirrored buckets,
batch twin ``hdr_signed_quantiles_by``) for running model-score /
loss / delta percentiles; NaN and fixed-point overflow kill the
query loudly via the batch family's plan guards.

Reference scope: the reference is strictly batch (SURVEY.md §2.11);
streaming extension surface.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("q", T.DoubleType()),
        T.StructField("rank", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("lo", T.LongType()),
        T.StructField("hi", T.LongType()),
        T.StructField("est", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
    ]
)


def _keyed_schema(stream: DataFrame, group_col: str) -> T.StructType:
    """OUT_SCHEMA with group_key taking the INPUT group column's
    actual type (r9 review fix, mirrored from streaming/distinct):
    a hard-coded StringType group_key crashes the Arrow conversion
    for numeric group columns, which the batch twins accept."""
    gtype = stream.schema[group_col].dataType
    return T.StructType(
        [T.StructField("group_key", gtype), *OUT_SCHEMA.fields[1:]]
    )


def _bucket_of(v: int, s: int) -> int:
    """Python twin of the batch bucketing: exact-integer HDR index
    (``bit_length() - 1`` == ``length(bin(v)) - 1``)."""
    if v < (1 << s):
        return v
    e = v.bit_length() - 1
    return ((e - s) << s) + (v >> (e - s))


def _bracket_of(bucket: int, s: int) -> tuple[int, int]:
    """Invert a bucket index to its [lo, hi] bracket (buckets below
    2^s are exact single values; above, bucket >> s == e - s + 1)."""
    if bucket < (1 << s):
        return bucket, bucket
    e = (bucket >> s) + s - 1
    t = bucket - ((e - s) << s)
    lo = t << (e - s)
    return lo, lo + (1 << (e - s)) - 1


def _bucket_signed_of(a: int, s: int) -> int:
    """Python twin of the batch SIGNED bucketing
    (operators/sketches.py:hdr_signed_histogram): mirror the
    unsigned bucket below zero."""
    if a >= 0:
        return _bucket_of(a, s)
    return -1 - _bucket_of(-a, s)


def _bracket_signed_of(bucket: int, s: int) -> tuple[int, int]:
    if bucket >= 0:
        return _bracket_of(bucket, s)
    lo_m, hi_m = _bracket_of(-1 - bucket, s)
    return -hi_m, -lo_m


def _quantile_rows(
    group_key: str,
    counts: dict[int, int],
    qs: tuple[float, ...],
    s: int,
    bracket_fn=None,
    scale: float = 1.0,
) -> pd.DataFrame:
    """The batch selection, replayed over the in-state sketch: rank
    = max(1, ceil(q*n)); first bucket whose cumsum reaches it; same
    float product/ceil/midpoint sequence as the Spark/DuckDB twins.
    ``bracket_fn``/``scale`` switch between the unsigned family
    (midpoint estimate) and the signed fixed-point family
    (((lo + hi) / 2) / scale — the exact batch op order)."""
    bracket_fn = bracket_fn or _bracket_of
    n = sum(counts.values())
    out = {k: [] for k in ("group_key", "q", "rank", "n", "lo", "hi", "est")}
    ordered = sorted(counts)
    for q in qs:
        rank = max(1, math.ceil(q * n))
        cum = 0
        for b in ordered:
            cum += counts[b]
            if cum >= rank:
                lo, hi = bracket_fn(b, s)
                out["group_key"].append(group_key)
                out["q"].append(float(q))
                out["rank"].append(rank)
                out["n"].append(n)
                out["lo"].append(lo)
                out["hi"].append(hi)
                out["est"].append((lo + hi) / 2.0 / scale)
                break
    return pd.DataFrame(out)


def _update_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    value_col: str,
    qs: tuple[float, ...],
    s: int,
    signed: bool = False,
    scale: float = 1.0,
) -> Iterator[pd.DataFrame]:
    (group_key,) = key
    if state.exists:
        buckets, cnts = state.get
        counts = dict(zip(buckets, cnts))
    else:
        counts = {}
    for pdf in pdfs:
        for v in pdf[value_col]:
            if v is None or pd.isna(v):
                continue
            v = int(v)
            if not signed and v < 0:
                raise ValueError(
                    f"running_quantiles_stream: negative value {v} "
                    "(the batch twin's guard raises too)"
                )
            b = _bucket_signed_of(v, s) if signed else _bucket_of(v, s)
            counts[b] = counts.get(b, 0) + 1
    items = sorted(counts.items())
    state.update(([b for b, _ in items], [c for _, c in items]))
    if counts:
        yield _quantile_rows(
            group_key,
            counts,
            qs,
            s,
            _bracket_signed_of if signed else _bracket_of,
            scale if signed else 1.0,
        )


def running_quantiles_stream(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    s: int = 6,
    state_store: str | None = None,
) -> DataFrame:
    """stream(group_col, value_col, ...) → one running row per
    (group, q) per micro-batch. After the full input, each group's
    latest rows (max n) equal the batch
    ``hdr_quantiles_by(df, value_col, [group_col], qs, s)`` rows.

    The value column is cast to bigint AND null-filtered IN THE
    SPARK PLAN: the cast keeps the Arrow transfer integer-typed, and
    the null drop (r9, ADVICE r8 #2) keeps it int64 — pandas turns a
    nullable int64 chunk into float64, where ``int(v)`` loses
    precision for values >= 2^53 and the bucket could diverge from
    the batch ``hdr_quantiles_by`` twin. Nulls are skipped on both
    sides anyway (batch twin filters them too), so dropping them
    upstream changes no semantics.

    ``state_store="rocksdb"`` selects the production state backend
    (r10): session-scoped, captured when the query starts — see
    streaming/state_store.py; the stream≡batch differential is
    pinned under BOTH providers."""
    from pyspark.sql import functions as F

    if state_store is not None:
        from etl_macropulse_br_spark.streaming.state_store import (
            set_state_store,
        )

        set_state_store(stream.sparkSession, state_store)
    out_schema = _keyed_schema(stream, group_col)
    stream = stream.withColumn(
        value_col, F.col(value_col).cast("bigint")
    ).filter(F.col(value_col).isNotNull())
    return (
        stream.groupBy(group_col)
        .applyInPandasWithState(
            lambda key, pdfs, state: _update_group(
                key, pdfs, state, value_col, qs, s
            ),
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_signed_quantiles_stream(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    scale: float = 1e6,
    s: int = 6,
    state_store: str | None = None,
) -> DataFrame:
    """SIGNED/double-domain running quantiles (r9) — the streaming
    twin of ``operators/sketches.hdr_signed_quantiles_by``: model
    scores / losses / deltas over an unbounded stream with bounded
    state (<= 2*((64-s)*2^s + 2^s) + 1 bucket counts per group).
    The fixed-point floor gateway and both fail-fast guards (NaN,
    |v*scale| >= 2^62) run IN THE SPARK PLAN with the exact batch
    expressions, so Python only ever sees valid int64 fixed-point
    values (and nulls are dropped upstream, keeping the Arrow chunk
    int64 — the r9 precision rule). After consuming the whole
    input, each group's latest rows equal the batch twin's
    bit-for-bit (rank, fixed-point bracket, and value-domain
    midpoint estimate). Pinned by the stream-vs-batch
    differential. ``state_store``: as in
    :func:`running_quantiles_stream`."""
    from etl_macropulse_br_spark.operators.sketches import (
        _signed_fixed_point_gateway,
    )

    if scale is None:
        raise ValueError(
            "running_signed_quantiles_stream: scale=None (auto-"
            "derive) is batch-only — an unbounded stream has no "
            "max-|v| to peek; pass an explicit scale (the batch "
            "family's derive_signed_scale on a sample is a good "
            "source)"
        )

    if state_store is not None:
        from etl_macropulse_br_spark.streaming.state_store import (
            set_state_store,
        )

        set_state_store(stream.sparkSession, state_store)
    out_schema = _keyed_schema(stream, group_col)
    stream = _signed_fixed_point_gateway(
        stream,
        value_col,
        scale,
        "running_signed_quantiles_stream",
        [group_col],
    )
    return (
        stream.groupBy(group_col)
        .applyInPandasWithState(
            lambda key, pdfs, state: _update_group(
                key, pdfs, state, "a", qs, s, signed=True, scale=scale
            ),
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
