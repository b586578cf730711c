"""Stateful streaming sessionization (applyInPandasWithState)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T


def test_sessionize_stream_closes_gapped_sessions(spark, tmp_path):
    from etl_macropulse_br_spark.streaming.sessions import sessionize_stream

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        # user 1: two sessions separated by a 2h gap
        (1, base),
        (1, base + dt.timedelta(minutes=5)),
        (1, base + dt.timedelta(minutes=10)),
        (1, base + dt.timedelta(hours=3)),
        (1, base + dt.timedelta(hours=3, minutes=2)),
        # user 2: one session (never closed within the batch)
        (2, base),
    ]
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = str(tmp_path / "events_stream")
    spark.createDataFrame(rows, schema).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    sessions = sessionize_stream(stream, gap_s=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["n_events"]): (r["session_start"], r["session_end"])
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    # only user 1's first session closed (a later event arrived past
    # the gap); the open sessions stay in state awaiting timeout
    assert (1, 3) in got
    start, end = got[(1, 3)]
    assert start == base and end == base + dt.timedelta(minutes=10)
    assert len(got) == 1
