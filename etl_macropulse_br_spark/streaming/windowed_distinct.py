"""Windowed streaming distinct-count: HLL registers per
(group, tumbling event-time window) with watermark-driven FINAL
emission — the "distinct users per hour per event type" feed, in
bounded state.

Complements the other two streaming sketch/filter ops:
``streaming/distinct.py`` keeps LIFETIME registers (NoTimeout,
running updates); this one keys state by (group, window_start) and
uses ``EventTimeTimeout`` so each window's registers are emitted
EXACTLY ONCE as a final row when the watermark passes the window end
(plus slack), then the state row is removed — state is
O(active windows x groups) x 2^b bytes, evicted by event time, and
late events inside the watermark still merge (register max is
associative/commutative, so arrival order and micro-batch slicing
cannot change a final sketch).

The per-window estimate is the SAME register construction and
estimator float sequence as the batch ``hll_distinct_by`` grouped by
(group, window_start) — pinned by the stream-vs-batch differential.

The tumbling window is computed map-side as
``timestamp_micros(floor(us / win_us) * win_us)`` — a plain column,
so the stateful groupBy key is (group, window_start) and no window
struct plumbing is needed.

Reference scope: the reference is strictly batch (SURVEY.md §2.11);
streaming extension surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("window_start", T.TimestampType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_present_registers", T.LongType()),
        T.StructField("n_zero_registers", T.LongType()),
        T.StructField("est_distinct", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("regs", T.BinaryType()),
        T.StructField("n_rows", T.LongType()),
    ]
)


def _update_window(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    value_col: str,
    b: int,
) -> Iterator[pd.DataFrame]:
    from etl_macropulse_br_spark.streaming.distinct import (
        _estimate,
        _hash60,
    )

    # window_end_ms rides the grouping key (a function of
    # window_start, so grouping granularity is unchanged): the
    # timeout must be epoch-UTC millis, and deriving it from the
    # Arrow-converted tz-NAIVE pandas timestamp via .timestamp()
    # silently assumed a UTC session — under any other session
    # timezone finals would fire early/late by the tz offset (r8)
    group_key, window_start, window_end_ms = key
    # Arrow hands the long key element over as numpy int64; the state
    # protocol JSON-serializes the timeout, so plain int is required
    window_end_ms = int(window_end_ms)
    m = 1 << b
    width = 60 - b

    if state.hasTimedOut:
        regs_bytes, n_rows = state.get
        state.remove()
        if n_rows == 0:
            # all-null window: the batch twin filters nulls before
            # grouping, so it has no row for this (group, window) —
            # don't invent a phantom final (same rule as
            # running_distinct_stream, r8)
            return
        n_present, n_zero, est = _estimate(regs_bytes, b)
        yield pd.DataFrame(
            {
                "group_key": [group_key],
                "window_start": [window_start],
                "n_rows": [n_rows],
                "n_present_registers": [n_present],
                "n_zero_registers": [n_zero],
                "est_distinct": [est],
            }
        )
        return

    if state.exists:
        regs_bytes, n_rows = state.get
        regs = bytearray(regs_bytes)
    else:
        regs, n_rows = bytearray(m), 0
    for pdf in pdfs:
        # values pre-cast to Spark-string in the plan (rendering
        # parity with the batch twin); nulls skipped on both sides
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
    # final fires when the EVENT-TIME watermark passes window end +
    # slack; late rows inside the watermark keep merging until then.
    # Clamped above the current watermark: a late-but-admitted row
    # for a window already behind the watermark would otherwise set
    # a timeout in the past, which the engine rejects.
    state.setTimeoutTimestamp(
        max(window_end_ms, state.getCurrentWatermarkMs() + 1)
    )


def windowed_distinct_stream(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str = "ts",
    window_s: int = 3600,
    watermark: str = "2 hours",
    slack_s: int = 0,
    b: int = 8,
    state_store: str | None = None,
) -> DataFrame:
    """stream(group_col, value_col, ts_col, ...) → one FINAL row per
    (group, tumbling window) once the watermark passes the window
    end. Finals equal the batch
    ``hll_distinct_by(df, value_col, [group_col, window_start], b)``
    on the same rows (pinned).

    The value column is cast to string in the plan (rendering parity
    with the batch twin's ``md5_long(cast('string'))`` — see
    ``running_distinct_stream``); nulls are ignored on both sides.

    NULL ``ts`` rows are dropped IN THE PLAN (r10, extending the
    ADVICE r9 sessions fix to this operator): an undated event
    belongs to no window — pre-fix it produced a NULL grouping key
    whose ``int(window_end_ms)`` killed the query with an opaque
    pandas TypeError. The batch twin groups such rows under a NULL
    window_start, so dropping them also keeps the
    finals-equal-batch differential meaningful (the batch side is
    compared on ts-non-null rows).

    ``state_store="rocksdb"`` selects the production state backend
    (session-scoped — streaming/state_store.py)."""
    if state_store is not None:
        from etl_macropulse_br_spark.streaming.state_store import (
            set_state_store,
        )

        set_state_store(stream.sparkSession, state_store)
    # group_key takes the input column's actual type (r9 review fix —
    # hard-coded StringType crashed numeric group columns at
    # final-emission time, after state had accumulated)
    out_schema = T.StructType(
        [
            T.StructField(
                "group_key", stream.schema[group_col].dataType
            ),
            *OUT_SCHEMA.fields[1:],
        ]
    )
    stream = stream.filter(F.col(ts_col).isNotNull()).withColumn(
        value_col, F.col(value_col).cast("string")
    )
    win_us = window_s * 1_000_000
    floor_us = (
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(win_us))
        * F.lit(win_us)
    ).cast("long")
    wstart = F.timestamp_micros(floor_us)
    # epoch-UTC window end (+ slack) in millis, computed from the
    # SAME floor as window_start so adding it to the grouping key
    # does not change grouping granularity — this is what the
    # timeout uses; unix_micros is timezone-independent, unlike
    # deriving the end from the Arrow-converted naive timestamp
    wend_ms = (
        (floor_us + F.lit(win_us)) / F.lit(1000)
        + F.lit(slack_s * 1000)
    ).cast("long")
    keyed = (
        stream.withColumn("window_start", wstart)
        .withColumn("window_end_ms", wend_ms)
        .withWatermark(ts_col, watermark)
    )
    return keyed.groupBy(
        group_col, "window_start", "window_end_ms"
    ).applyInPandasWithState(
        lambda key, pdfs, state: _update_window(
            key, pdfs, state, value_col, b
        ),
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
