"""Streaming HLL running distinct vs the batch per-group sketch:
after consuming every micro-batch, each group's final estimate must
EQUAL operators/sketches.hll_distinct_by on the same rows — register
merging is associative/commutative, so micro-batch slicing cannot
change the sketch."""

from __future__ import annotations

from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def test_stream_running_distinct_matches_batch_hll(spark, tmp_path):
    from etl_macropulse_br_spark.operators.sketches import hll_distinct_by
    from etl_macropulse_br_spark.streaming.distinct import (
        running_distinct_stream,
    )

    src = str(tmp_path / "ev_stream")
    # micro-batch 1: overlapping users across types, repeats inside
    spark.createDataFrame(
        [("click", i % 40) for i in range(100)]
        + [("view", i % 25) for i in range(50)],
        SCHEMA,
    ).coalesce(1).write.parquet(src)
    # micro-batch 2: some NEW users, some repeats of batch 1 (state
    # must carry: a repeat may not bump the estimate's inputs)
    spark.createDataFrame(
        [("click", 30 + i) for i in range(30)]
        + [("view", i % 25) for i in range(25)]
        + [("purchase", i) for i in range(7)],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_distinct_stream(stream, "event_type", "user_id", b=8)
        .writeStream.format("memory")
        .queryName("run_distinct_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from run_distinct_out").collect()

    # at least one group must have emitted a running row in BOTH
    # micro-batches (the running-dashboard contract)
    assert sum(1 for r in rows if r["group_key"] == "click") >= 2
    final = {}
    for r in rows:  # last row per group = max n_rows
        cur = final.get(r["group_key"])
        if cur is None or r["n_rows"] > cur["n_rows"]:
            final[r["group_key"]] = r

    batch = {
        r["event_type"]: r
        for r in hll_distinct_by(
            spark.read.parquet(src), "user_id", ["event_type"], b=8
        ).collect()
    }
    assert set(final) == set(batch) == {"click", "view", "purchase"}
    for g, fr in final.items():
        br = batch[g]
        assert fr["est_distinct"] == br["est_distinct"], g
        assert fr["n_present_registers"] == br["n_present_registers"], g
        assert fr["n_zero_registers"] == br["n_zero_registers"], g
    # and the sketch tracks reality: small-cardinality groups are
    # near-exact under linear counting
    assert abs(final["purchase"]["est_distinct"] - 7) < 2
    assert abs(final["view"]["est_distinct"] - 25) < 6
    assert abs(final["click"]["est_distinct"] - 60) < 15


def test_stream_running_distinct_numeric_group_column(spark, tmp_path):
    """r9 review fix: a NUMERIC group column must work — the output
    schema takes the input group column's type (the hard-coded
    StringType group_key crashed the Arrow conversion; the batch
    twin groups by any type). Covers the same fix in
    windowed_distinct and both quantile streams (shared pattern)."""
    from etl_macropulse_br_spark.operators.sketches import hll_distinct_by
    from etl_macropulse_br_spark.streaming.distinct import (
        running_distinct_stream,
    )

    schema = T.StructType(
        [
            T.StructField("tenant_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    src = str(tmp_path / "num_group_stream")
    spark.createDataFrame(
        [(1, i % 13) for i in range(40)] + [(2, i % 5) for i in range(20)],
        schema,
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        running_distinct_stream(stream, "tenant_id", "user_id", b=8)
        .writeStream.format("memory")
        .queryName("num_group_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ng_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from num_group_out").collect()
    got = {r["group_key"]: r["est_distinct"] for r in rows}
    assert set(got) == {1, 2}  # longs, not strings
    batch = {
        r["tenant_id"]: r["est_distinct"]
        for r in hll_distinct_by(
            spark.read.parquet(src), "user_id", ["tenant_id"], b=8
        ).collect()
    }
    assert got == batch


def test_stream_running_distinct_all_null_group_emits_no_row(
    spark, tmp_path
):
    """A group whose values are all NULL must emit NO row (the batch
    twin filters nulls before grouping, so it has no row for the
    group — a phantom (group, est=0) row would break the pinned
    batch equality; r8)."""
    from etl_macropulse_br_spark.streaming.distinct import (
        running_distinct_stream,
    )

    src = str(tmp_path / "null_stream")
    spark.createDataFrame(
        [("real", 1), ("real", 2)] + [("ghost", None)] * 4, SCHEMA
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        running_distinct_stream(stream, "event_type", "user_id", b=8)
        .writeStream.format("memory")
        .queryName("null_grp_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from null_grp_out").collect()
    assert {r["group_key"] for r in rows} == {"real"}
