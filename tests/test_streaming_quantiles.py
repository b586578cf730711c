"""Streaming HDR running quantiles vs the batch per-group sketch:
bucket counts merge by addition (associative/commutative), so after
consuming every micro-batch each group's final rows must EQUAL
operators/sketches.hdr_quantiles_by on the same rows — rank,
bracket, and midpoint, bit-for-bit."""

from __future__ import annotations

import random

from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def test_stream_running_quantiles_matches_batch_hdr(spark, tmp_path):
    from etl_macropulse_br_spark.operators.sketches import (
        hdr_quantiles_by,
    )
    from etl_macropulse_br_spark.streaming.quantiles import (
        running_quantiles_stream,
    )

    rng = random.Random(31)
    qs, s = (0.5, 0.95), 6
    src = str(tmp_path / "q_stream")
    # micro-batch 1: two groups, heavy-tailed values; nulls skipped
    spark.createDataFrame(
        [("click", int(rng.lognormvariate(7, 2))) for _ in range(400)]
        + [("view", rng.randrange(0, 50)) for _ in range(200)]
        + [("view", None)] * 3,
        SCHEMA,
    ).coalesce(1).write.parquet(src)
    # micro-batch 2: shifts click's distribution (state must carry —
    # the final sketch reflects BOTH batches), adds a new group
    spark.createDataFrame(
        [("click", int(rng.lognormvariate(11, 1))) for _ in range(300)]
        + [("purchase", rng.randrange(1, 10)) for _ in range(40)],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_quantiles_stream(stream, "event_type", "v", qs, s)
        .writeStream.format("memory")
        .queryName("run_quant_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from run_quant_out").collect()

    # running contract: click emitted rows in both micro-batches
    click_ns = {r["n"] for r in rows if r["group_key"] == "click"}
    assert len(click_ns) == 2
    final = {}
    for r in rows:  # latest row per (group, q) = max n
        k = (r["group_key"], r["q"])
        if k not in final or r["n"] > final[k]["n"]:
            final[k] = r

    batch = {
        (r["event_type"], r["q"]): r
        for r in hdr_quantiles_by(
            spark.read.parquet(src), "v", ["event_type"], qs, s
        ).collect()
    }
    assert set(final) == set(batch)
    for k, fr in final.items():
        br = batch[k]
        for c in ("rank", "n", "lo", "hi", "est"):
            assert fr[c] == br[c], (k, c, fr[c], br[c])
