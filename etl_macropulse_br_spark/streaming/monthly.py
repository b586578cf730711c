"""Structured Streaming variant of the medallion gold aggregation.

The reference is strictly batch (SURVEY §2.11) but declares
incremental intent (``state/state.json``, ``load.py:23`` MERGE
comment). This module honors that intent the Spark-native way:
file-arrival streaming source → watermarked dedup → windowed monthly
aggregation → checkpointed sink. Parity is batch; this is the scale
extension for continuously-arriving data.

Semantics notes:
- ``dropDuplicatesWithinWatermark`` bounds dedup state (A7's
  streaming twin) — exact within the lateness horizon.
- The monthly aggregate uses ``window(date, "30 days")``-free month
  truncation (calendar months, not fixed windows) via groupBy on
  ``trunc(date, 'MM')`` — run in COMPLETE output mode (r9 doc fix:
  this header previously claimed append-mode, contradicting the
  implementation; a non-window time grouping cannot emit
  append-mode finals, and the gold mart is a full-replace table,
  so complete mode is the design, as ``start_gold_stream``
  documents).
- ``last_value`` uses ``max_by(value, date)`` exactly like batch, so
  a replay of the stream converges to the batch gold table
  (stream-batch consistency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_macropulse_br_spark.functions.exprs import last_by, stable_mean
from etl_macropulse_br_spark.sources.rest import BCB_SILVER_SCHEMA


def read_bcb_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-arrival source over silver-shaped parquet drops."""
    return (
        spark.readStream.schema(BCB_SILVER_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def streaming_gold_bcb_monthly(
    stream: DataFrame, watermark: str = "35 days"
) -> DataFrame:
    """Watermarked dedup + calendar-month aggregation of a silver
    BCB stream.

    Calendar months are not a streaming time window (``window()``
    only does fixed durations), so the aggregate runs in **complete**
    output mode — correct here because the monthly mart's cardinality
    is tiny (series × months), so rewriting it per micro-batch is
    cheap at any input scale. For high-cardinality aggregates the
    append-mode alternative is a fixed-window daily partial with a
    batch rollup at read time.

    The 35-day watermark bounds ``dropDuplicatesWithinWatermark``
    state (A7's streaming twin): one full month of lateness + buffer.
    """
    with_ts = stream.withColumn("date_ts", F.col("date").cast("timestamp"))
    deduped = with_ts.withWatermark(
        "date_ts", watermark
    ).dropDuplicatesWithinWatermark(["series_id", "date"])
    return (
        deduped.withColumn("month", F.date_trunc("month", "date_ts"))
        .groupBy("series_id", "series_name", F.col("month"))
        .agg(
            stable_mean("value").alias("avg_value"),
            # dropDuplicatesWithinWatermark only collapses ties inside
            # the watermark; value tiebreak keeps the aggregate
            # deterministic for (series_id, date) dupes that survive.
            last_by("value", "date", "value").alias("last_value"),
        )
    )


def start_gold_stream(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Wire source → aggregate → sink with checkpointing.

    Complete-mode aggregates can't stream straight to parquet files;
    ``foreachBatch`` overwrites the (tiny) gold parquet per
    micro-batch — an idempotent full-replace exactly mirroring the
    batch loader's semantics (``load.py:18-28``), with exactly-once
    progress in the checkpoint (replacing the reference's
    never-implemented ``state.json``).

    ``trigger_once`` (availableNow) runs one incremental pass and
    stops — the streaming twin of the reference's run-once pipeline.
    """
    gold = streaming_gold_bcb_monthly(read_bcb_stream(spark, source_dir))

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(sink_dir)

    writer = (
        gold.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
