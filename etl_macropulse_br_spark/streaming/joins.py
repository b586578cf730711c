"""Stream-stream joins and watermarked stream dedup.

The reference is batch-only; these are the Structured Streaming
twins of the batch join/dedup operators, built on Spark's native
stream-stream join state machine:

- ``interval_join_streams``: inner/left join of two event streams
  where the right event falls inside a time interval around the
  left event (the streaming analogue of the batch range/as-of
  family). Both sides carry watermarks, so the join state store
  holds only rows inside ``watermark + interval`` — bounded state
  regardless of stream length, shuffled once on the join key.
- ``dedup_stream``: exactly-once row dedup within the lateness
  horizon via ``dropDuplicatesWithinWatermark`` (state = one entry
  per key seen inside the watermark, evicted automatically).

At 100 TB/day the state size is the design constraint, not
throughput: both operators' state is O(arrival rate × horizon), and
the horizon is an explicit argument. Skewed join keys are the same
problem as batch; pre-salt with ``operators.skew.salted_join``'s
scheme if one key dominates (AQE skew-splitting does not apply to
streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    before_s: int = 0,
    after_s: int = 3600,
    watermark_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``on`` where
    ``left_ts - before_s <= right_ts <= left_ts + after_s``.

    Column collisions are avoided by prefixing the right side's
    non-key columns with ``r_``. Outer flavors additionally require
    BOTH watermarks (Spark must know when an unmatched row can be
    emitted) — enforced here by always watermarking both sides.
    """
    lw = left.withWatermark(left_ts, f"{watermark_s} seconds")
    rw = right.withWatermark(right_ts, f"{watermark_s} seconds")
    rw = rw.select(
        F.col(on).alias("__rk"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c != on
        ],
    )
    r_ts = f"r_{right_ts}"
    cond = (
        (F.col(on) == F.col("__rk"))
        & (F.col(r_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {before_s} SECONDS"))
        & (F.col(r_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {after_s} SECONDS"))
    )
    return lw.join(rw, cond, how).drop("__rk")


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark_s: int = 3600,
) -> DataFrame:
    """Drop duplicate rows (same ``keys``) arriving within the
    watermark horizon. State holds one entry per distinct key within
    the horizon and is evicted by the engine — the streaming twin of
    the batch A7 dedup-keep-first."""
    return df.withWatermark(ts_col, f"{watermark_s} seconds").dropDuplicatesWithinWatermark(keys)
