"""Streaming running distinct-count via HyperLogLog registers in
state — bounded-memory distinct counting over an unbounded stream,
which is exactly the problem HLL exists for: an exact streaming
``countDistinct`` needs state proportional to the number of distinct
values ever seen (unbounded), while the HLL state is a FIXED
``2^b``-byte register array per group, forever.

The batch twin is ``operators/sketches.hll_distinct_by``; this
operator carries the SAME sketch (identical md5-derived register
index and leading-zero rank, identical estimator fold) through
``applyInPandasWithState``, so after consuming the whole input the
per-group running estimate EQUALS the batch operator's — pinned by
the stream-vs-batch differential test, micro-batch boundaries
included (registers merge by elementwise max, which is associative
and commutative, so batch slicing cannot change the final sketch).

Emits one (group, n_rows, estimate) row per group per micro-batch —
a running dashboard feed ("distinct users per event type so far").
State: ``2^b`` register bytes + one count per ACTIVE GROUP; the only
shuffle is the per-key stateful hash partition every keyed stateful
op needs. No watermark/timeout — lifetime distinct is monotone state
by design (bound the horizon upstream with a windowed groupBy if
"distinct per day" is wanted instead).

Reference scope: the reference is strictly batch (SURVEY.md §2.11);
streaming extension surface.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_present_registers", T.LongType()),
        T.StructField("n_zero_registers", T.LongType()),
        T.StructField("est_distinct", T.DoubleType()),
    ]
)


def _keyed_schema(stream: DataFrame, group_col: str) -> T.StructType:
    """OUT_SCHEMA with group_key taking the INPUT group column's
    actual type (r9 review fix): the hard-coded StringType crashed
    the Arrow conversion for any numeric group column — the batch
    twin (hll_distinct_by) groups by any type."""
    gtype = stream.schema[group_col].dataType
    return T.StructType(
        [T.StructField("group_key", gtype), *OUT_SCHEMA.fields[1:]]
    )

STATE_SCHEMA = T.StructType(
    [
        T.StructField("regs", T.BinaryType()),
        T.StructField("n_rows", T.LongType()),
    ]
)


def _hash60(value: str) -> int:
    """Python twin of functions/hashing.md5_long (no seed): first 15
    hex digits of md5 as an integer — 60 bits."""
    return int(hashlib.md5(value.encode()).hexdigest()[:15], 16)


def _estimate(regs: bytes, b: int) -> tuple[int, int, float]:
    """(n_present, n_zero, est) — the batch estimator's exact float
    sequence: j-ascending left-associated fold of 1.0/(1 << M) over
    PRESENT registers, one exact add for the missing ones, shared
    alpha literal, linear-counting branch rounded to 6 dp."""
    from etl_macropulse_br_spark.operators.sketches import _hll_alpha

    m = 1 << b
    s_present = 0.0
    n_present = 0
    for M in regs:  # j-ascending by construction
        if M > 0:
            n_present += 1
            s_present = s_present + 1.0 / (1 << M)
    z = s_present + float(m - n_present)
    raw = (_hll_alpha(m) * m * m) / z
    v = float(m - n_present)
    if raw <= 2.5 * m and v > 0:
        est = float(m) * math.log(float(m) / v)
    else:
        est = raw
    return n_present, m - n_present, round(est, 6)


def _update_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    value_col: str,
    b: int,
) -> Iterator[pd.DataFrame]:
    (group_key,) = key
    m = 1 << b
    width = 60 - b
    if state.exists:
        regs_bytes, n_rows = state.get
        regs = bytearray(regs_bytes)
    else:
        regs, n_rows = bytearray(m), 0
    for pdf in pdfs:
        # values arrive pre-cast to Spark-string (see
        # running_distinct_stream) so the rendering matches the batch
        # twin's md5_long(cast('string')); nulls are skipped — the
        # batch op ignores them too (sketches.hll_registers, r8)
        for v in pdf[value_col]:
            if v is None:
                continue
            h = _hash60(v)
            j = h & (m - 1)
            rest = h >> b
            rho = width + 1 if rest == 0 else width - rest.bit_length() + 1
            if rho > regs[j]:
                regs[j] = rho
            n_rows += 1
    state.update((bytes(regs), n_rows))
    # a group that has seen ONLY nulls so far emits no row — the
    # batch twin (hll_distinct_by) filters nulls before grouping, so
    # it has no row for such a group, and the pinned batch equality
    # must not invent a phantom (group, est=0) on the stream side
    if n_rows == 0:
        return
    n_present, n_zero, est = _estimate(bytes(regs), b)
    yield pd.DataFrame(
        {
            "group_key": [group_key],
            "n_rows": [n_rows],
            "n_present_registers": [n_present],
            "n_zero_registers": [n_zero],
            "est_distinct": [est],
        }
    )


def running_distinct_stream(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    b: int = 8,
    state_store: str | None = None,
) -> DataFrame:
    """stream(group_col, value_col, ...) → one running-estimate row
    per group per micro-batch. After the full input, each group's
    latest row (max n_rows) equals the batch
    ``hll_distinct_by(df, value_col, [group_col], b)`` estimate.

    The value column is cast to string IN THE SPARK PLAN (below), so
    non-string types render exactly as the batch twin's
    ``md5_long(cast('string'))`` does — Python ``str()`` renders
    doubles/booleans differently (``1e-07`` vs Spark's ``1.0E-7``,
    ``True`` vs ``true``), which would silently break the pinned
    batch equality. Null values are ignored on both sides.
    ``state_store="rocksdb"`` selects the production state backend
    (session-scoped — streaming/state_store.py)."""
    from pyspark.sql import functions as F

    if state_store is not None:
        from etl_macropulse_br_spark.streaming.state_store import (
            set_state_store,
        )

        set_state_store(stream.sparkSession, state_store)
    out_schema = _keyed_schema(stream, group_col)
    stream = stream.withColumn(
        value_col, F.col(value_col).cast("string")
    )
    return (
        stream.groupBy(group_col)
        .applyInPandasWithState(
            lambda key, pdfs, state: _update_group(
                key, pdfs, state, value_col, b
            ),
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
