"""Streaming exact dedup (dropDuplicatesWithinWatermark) vs the
batch distinct — set-differential, plus the cross-micro-batch state
property that makes it a real streaming operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

BASE = dt.datetime(2026, 2, 1, 9, 0, 0)


def _run_stream(spark, src, ckpt, name):
    from etl_macropulse_br_spark.streaming.dedup import text_dedup_stream

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(src)
    )
    q = (
        text_dedup_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").collect()


def test_stream_dedup_matches_batch_distinct(spark, tmp_path):
    """The emitted text_hash multiset equals the batch DISTINCT set —
    exactly one row per distinct normalized text, duplicates
    suppressed both within and ACROSS micro-batches."""
    from etl_macropulse_br_spark.functions.hashing import md5_long
    from etl_macropulse_br_spark.operators.dedup import _norm_text

    src = str(tmp_path / "docs_stream")
    # file 1 / micro-batch 1: a, b, and an in-batch dup of a
    spark.createDataFrame(
        [
            (1, "alpha text", BASE),
            (2, "beta text", BASE + dt.timedelta(minutes=1)),
            (3, "Alpha   TEXT", BASE + dt.timedelta(minutes=2)),
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(src)
    # file 2 / micro-batch 2: cross-batch dup of b (inside the
    # watermark horizon) and a new doc c
    spark.createDataFrame(
        [
            (4, "BETA text", BASE + dt.timedelta(minutes=3)),
            (5, "gamma text", BASE + dt.timedelta(minutes=4)),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    rows = _run_stream(
        spark, src, str(tmp_path / "ckpt"), "dedup_stream_out"
    )

    batch = spark.read.parquet(src)
    expected = {
        r["h"]
        for r in batch.select(
            md5_long(_norm_text("text")).alias("h")
        ).distinct().collect()
    }
    got = [r["text_hash"] for r in rows]
    assert sorted(got) == sorted(expected)  # one row per distinct text
    assert len(got) == 3


def test_stream_dedup_first_arrival_wins_across_batches(spark, tmp_path):
    """With one row per micro-batch, arrival order is deterministic:
    the surviving doc_id for a duplicated text is the EARLIER
    micro-batch's row."""
    src = str(tmp_path / "docs_stream2")
    spark.createDataFrame(
        [(10, "same words here", BASE)], SCHEMA
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(11, "same  WORDS here", BASE + dt.timedelta(minutes=1))], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    rows = _run_stream(
        spark, src, str(tmp_path / "ckpt2"), "dedup_stream_first"
    )
    assert [r["doc_id"] for r in rows] == [10]
