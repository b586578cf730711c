"""Windowed streaming HLL vs the batch per-(group, window) sketch:
watermark-driven finals must equal hll_distinct_by grouped by
(group, window_start) over the same rows — exactly one final per
closed window, late-but-admitted rows merged, state evicted."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

BASE = dt.datetime(2026, 5, 1, 10, 0, 0)


def test_windowed_stream_finals_match_batch(spark, tmp_path):
    from etl_macropulse_br_spark.operators.sketches import hll_distinct_by
    from etl_macropulse_br_spark.streaming.windowed_distinct import (
        windowed_distinct_stream,
    )

    src = str(tmp_path / "ev_stream")
    h = dt.timedelta(hours=1)
    # window A (10:00): clicks from 2 users, views from 1
    spark.createDataFrame(
        [
            ("click", 1, BASE),
            ("click", 2, BASE + dt.timedelta(minutes=5)),
            ("click", 1, BASE + dt.timedelta(minutes=20)),  # repeat
            ("view", 9, BASE + dt.timedelta(minutes=40)),
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(src)
    # window B (11:00) + a LATE window-A click inside the watermark
    spark.createDataFrame(
        [
            ("click", 3, BASE + h),
            ("click", 4, BASE + h + dt.timedelta(minutes=10)),
            ("click", 5, BASE + dt.timedelta(minutes=50)),  # late, window A
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    # sentinel far in the future: pushes the watermark past window
    # A and B ends so their finals fire before availableNow stops
    # (its own window never closes and must not appear)
    sentinel_ts = BASE + dt.timedelta(days=7)
    spark.createDataFrame(
        [("sentinel", 0, sentinel_ts)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_distinct_stream(
            stream, "event_type", "user_id",
            window_s=3600, watermark="30 minutes", b=8,
        )
        .writeStream.format("memory")
        .queryName("win_distinct_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from win_distinct_out").collect()
    finals = {(r["group_key"], r["window_start"]): r for r in rows}

    # exactly one final per CLOSED (group, window); sentinel absent
    assert len(rows) == len(finals)
    assert not any(g == "sentinel" for g, _ in finals)

    real = spark.read.parquet(src).filter(
        F.col("event_type") != "sentinel"
    )
    win_us = 3600 * 1_000_000
    wstart = F.timestamp_micros(
        (F.floor(F.unix_micros("ts") / F.lit(win_us)) * F.lit(win_us))
        .cast("long")
    )
    batch = {
        (r["event_type"], r["window_start"]): r
        for r in hll_distinct_by(
            real.withColumn("window_start", wstart),
            "user_id",
            ["event_type", "window_start"],
            b=8,
        ).collect()
    }
    assert set(finals) == set(batch)
    for k, fr in finals.items():
        br = batch[k]
        assert fr["est_distinct"] == br["est_distinct"], k
        assert fr["n_present_registers"] == br["n_present_registers"], k
    # the late window-A click (user 5) must be inside window A's final
    a_click = finals[("click", BASE)]
    assert a_click["n_rows"] == 4  # 3 from batch 1 + 1 late
    assert abs(a_click["est_distinct"] - 3) < 2  # users {1, 2, 5}


def test_windowed_stream_drops_null_ts(spark, tmp_path):
    """r10 (extending the ADVICE r9 sessions null-ts fix): a NULL ts
    row produced a NULL grouping key whose int(window_end_ms) killed
    the query with an opaque pandas TypeError — now dropped in the
    plan (an undated event belongs to no window)."""
    from etl_macropulse_br_spark.streaming.windowed_distinct import (
        windowed_distinct_stream,
    )

    src = str(tmp_path / "null_ts_win")
    spark.createDataFrame(
        [
            ("click", 1, BASE),
            ("click", 2, None),  # must be dropped, not crash
            ("click", 3, BASE + dt.timedelta(minutes=9)),
            ("view", 4, None),   # null-only group: nothing emitted
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [("sentinel", 0, BASE + dt.timedelta(days=7))], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    q = (
        windowed_distinct_stream(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            "event_type",
            "user_id",
            window_s=3600,
            watermark="30 minutes",
            b=8,
        )
        .writeStream.format("memory")
        .queryName("win_null_ts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_null"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        r
        for r in spark.sql("select * from win_null_ts").collect()
        if r["group_key"] != "sentinel"
    ]
    assert len(rows) == 1
    assert rows[0]["group_key"] == "click"
    assert rows[0]["n_rows"] == 2  # users 1, 3; null-ts row dropped
