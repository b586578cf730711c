"""Stream-stream interval join + watermarked stream dedup."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _write_stream_src(spark, path, rows):
    spark.createDataFrame(rows, _SCHEMA).write.parquet(str(path))
    return spark.readStream.schema(_SCHEMA).parquet(str(path))


def test_interval_join_streams_matches_within_window(spark, tmp_path):
    from etl_macropulse_br_spark.streaming.joins import interval_join_streams

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    clicks = _write_stream_src(
        spark,
        tmp_path / "clicks",
        [
            (1, 100, base),
            (1, 101, base + dt.timedelta(minutes=30)),
            (2, 200, base),
        ],
    )
    views = _write_stream_src(
        spark,
        tmp_path / "views",
        [
            (1, 900, base + dt.timedelta(minutes=5)),   # joins click 100
            (1, 901, base + dt.timedelta(minutes=50)),  # joins click 101 only
            (2, 902, base + dt.timedelta(hours=2)),     # outside window
        ],
    )
    joined = interval_join_streams(
        clicks,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        before_s=0,
        after_s=1800,
        watermark_s=3600,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ij")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ij"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM ij").collect()
    }
    assert got == {(100, 900), (101, 901)}


def test_dedup_stream_drops_watermark_duplicates(spark, tmp_path):
    from etl_macropulse_br_spark.streaming.joins import dedup_stream

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    src = _write_stream_src(
        spark,
        tmp_path / "dups",
        [
            (1, 100, base),
            (1, 100, base + dt.timedelta(seconds=10)),  # dup within horizon
            (1, 101, base + dt.timedelta(seconds=20)),
            (2, 100, base),  # different user -> kept
        ],
    )
    deduped = dedup_stream(src, keys=["user_id", "event_id"], ts_col="ts")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dd")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["event_id"])
        for r in spark.sql("SELECT * FROM dd").collect()
    )
    assert got == [(1, 100), (1, 101), (2, 100)]
