"""As-of join — "temporally closest right-side row, per key".

Spark has no native as-of join (pandas has ``merge_asof``;
time-series stores treat it as a primitive). The distributed
implementation here is the union-sentinel trick, which needs ONE
shuffle and no range join:

1. tag left rows (probe) and right rows (build) and union them;
2. per key, order by (ts, build-before-probe);
3. ``last_value(ignoreNulls)`` of the build payload over the
   unbounded-preceding frame gives every probe row the most recent
   build row at-or-before it;
4. filter back to probe rows.

``forward`` is the mirror image (descending ts ordering → closest
at-or-after); ``nearest`` evaluates both frames over the same
shuffled partition and picks the closer match per row (ties →
backward, matching ``merge_asof``).

At 100 TB this beats the naive range-join formulation (which
explodes to O(probe × build) within key groups before picking the
max) — the window pass is linear in rows after one hash partition
by key, and all directions share that single exchange. Skewed keys
fall out of AQE skew handling like any window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RTS = "__rts"  # right-ts field carried inside the match struct


def _ts_num(c: Column, dtype: str) -> Column:
    """Order-preserving numeric view of a ts column for distance
    comparison (timestamps/dates → epoch seconds)."""
    if dtype == "date" or dtype.startswith("timestamp"):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row + the temporally closest right
    row's payload columns (as ``asof_<col>``).

    ``direction``: ``backward`` (closest at-or-before, the
    ``merge_asof`` default), ``forward`` (closest at-or-after), or
    ``nearest`` (whichever is closer; ties prefer backward). Exact
    ts matches always match (``allow_exact_matches=True``).

    NULL timestamps (r9 review fix): right rows with a NULL
    ``right_ts`` are DROPPED from the build side — under Spark's
    NULLS-FIRST ascending sort they would otherwise become
    fabricated "most recent" matches for early probes (pandas
    ``merge_asof`` refuses NaT keys outright). Left rows with a
    NULL ``left_ts`` are kept and match NOTHING (their asof_*
    columns are NULL) in every direction — the desc window orders
    nulls FIRST explicitly so a forward probe with no timestamp
    cannot swallow the temporally-last build row.

    Duplicate (key, ts) build rows (r9): the window adds the
    payload struct as a deterministic final sort key, so the match
    is stable across partitionings/retries (the greatest payload
    wins). Note the DuckDB ASOF JOIN oracle makes its OWN arbitrary
    choice among such duplicates — truly ambiguous inputs are not
    oracle-gateable on either engine; payload columns must be of
    orderable types.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction!r}")

    ts_dtype = dict(right.dtypes)[right_ts]

    probe = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_probe"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    right = right.filter(F.col(right_ts).isNotNull())
    build = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_probe"),
        F.struct(
            *[F.col(c) for c in right_payload],
            F.col(right_ts).alias(_RTS),
        ).alias("__right"),
    )
    probe = probe.withColumn(
        "__right", F.lit(None).cast(build.schema["__right"].dataType)
    )
    build = build.withColumn(
        "__left", F.lit(None).cast(probe.schema["__left"].dataType)
    )

    cols = ["__k", "__ts", "__is_probe", "__left", "__right"]
    unioned = probe.select(*cols).unionByName(build.select(*cols))

    # build rows sort BEFORE probe rows at equal ts (in either
    # direction) so exact matches are visible to the probe's frame;
    # null probe ts sorts FIRST in both directions (no match), and
    # the payload struct is the deterministic tiebreak among equal
    # (key, ts) build rows
    def matched(ascending: bool) -> Column:
        order = (
            F.col("__ts").asc_nulls_first()
            if ascending
            else F.col("__ts").desc_nulls_first()
        )
        w = (
            Window.partitionBy("__k")
            .orderBy(order, F.col("__is_probe").asc(), F.col("__right").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last("__right", ignorenulls=True).over(w)

    if direction == "backward":
        withm = unioned.withColumn("__match", matched(True))
    elif direction == "forward":
        withm = unioned.withColumn("__match", matched(False))
    else:  # nearest: both frames over the SAME exchange, pick closer
        # project the window results first so each window expression
        # appears exactly once (no re-inlining into the when-chain)
        both = unioned.select(
            *cols, matched(True).alias("__mb"), matched(False).alias("__mf")
        )
        t = _ts_num(F.col("__ts"), ts_dtype)
        dist_b = F.abs(t - _ts_num(F.col("__mb").getField(_RTS), ts_dtype))
        dist_f = F.abs(_ts_num(F.col("__mf").getField(_RTS), ts_dtype) - t)
        withm = both.withColumn(
            "__match",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(dist_b <= dist_f, F.col("__mb"))
            .otherwise(F.col("__mf")),
        )

    matched_probe = withm.filter(F.col("__is_probe") == 1)
    return matched_probe.select(
        "__left.*",
        *[
            F.col("__match").getField(c).alias(f"asof_{c}")
            for c in right_payload
        ],
    )
