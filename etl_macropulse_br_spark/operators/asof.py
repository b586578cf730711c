"""As-of join — "latest right-side row at or before each left
timestamp, per key".

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

At 100 TB this beats the naive range-join formulation (which
explodes to O(probe × build) within key groups before picking the
max) — the window pass is linear in rows after one hash partition
by key. Skewed keys fall out of AQE skew handling like any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row + the temporally closest
    preceding (``backward``) right row's payload columns.

    Ties (right_ts == left_ts) match, like ``merge_asof``'s
    default ``allow_exact_matches=True``.
    """
    if direction != "backward":
        raise NotImplementedError("forward as-of: flip the sort order")

    probe = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_probe"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    build = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_probe"),
        F.struct(*[F.col(c) for c in right_payload]).alias("__right"),
    )
    probe = probe.withColumn(
        "__right", F.lit(None).cast(build.schema["__right"].dataType)
    )
    build = build.withColumn(
        "__left", F.lit(None).cast(probe.schema["__left"].dataType)
    )

    unioned = probe.select("__k", "__ts", "__is_probe", "__left", "__right").unionByName(
        build.select("__k", "__ts", "__is_probe", "__left", "__right")
    )
    # build rows sort BEFORE probe rows at equal ts so exact matches
    # are visible to the probe row's frame
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn(
        "__match", F.last("__right", ignorenulls=True).over(w)
    ).filter(F.col("__is_probe") == 1)
    out = matched.select("__left.*", *[
        F.col("__match").getField(c).alias(f"asof_{c}") for c in right_payload
    ])
    return out
