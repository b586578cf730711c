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


def _bucket(v: int, s: int) -> int:
    from etl_macropulse_br_spark.streaming.quantiles import _bucket_of

    return _bucket_of(v, s)


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


def test_stream_quantiles_large_values_with_nulls_stay_exact(spark, tmp_path):
    """r9 pin (ADVICE r8 #2): a micro-batch chunk mixing NULLs with
    values >= 2^53 must still bucket exactly — pre-fix, pandas turned
    the nullable int64 Arrow column into float64 and int(v) lost the
    low bits, diverging from the batch twin. The null drop now lives
    in the Spark plan, so the Arrow column stays int64."""
    from etl_macropulse_br_spark.operators.sketches import (
        hdr_quantiles_by,
    )
    from etl_macropulse_br_spark.streaming.quantiles import (
        running_quantiles_stream,
    )

    qs, s = (0.5,), 6
    # values ONE BELOW an HDR bucket boundary at magnitude 2^60:
    # float64 rounds them UP across the boundary (int(float(v)) lands
    # in the next bucket), so a lossy int64→float64 Arrow chunk
    # shifts lo/hi — the planted divergence this pin watches
    big = [(1 << 60) + j * (1 << 54) - 1 for j in range(1, 9)]
    assert all(int(float(v)) != v for v in big)
    assert all(
        _bucket(int(float(v)), s) != _bucket(v, s) for v in big
    )
    src = str(tmp_path / "big_stream")
    spark.createDataFrame(
        [("g", v) for v in big] + [("g", None)] * 3,
        SCHEMA,
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        running_quantiles_stream(stream, "event_type", "v", qs, s)
        .writeStream.format("memory")
        .queryName("big_quant_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_big"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from big_quant_out").collect()
    assert len(rows) == 1
    batch = hdr_quantiles_by(
        spark.read.parquet(src), "v", ["event_type"], qs, s
    ).collect()
    assert len(batch) == 1
    for c in ("rank", "n", "lo", "hi", "est"):
        assert rows[0][c] == batch[0][c], (c, rows[0][c], batch[0][c])


def test_stream_signed_running_quantiles_matches_batch(spark, tmp_path):
    """r9: the SIGNED streaming twin — running percentiles of a
    signed double column across micro-batches must converge to the
    batch hdr_signed_quantiles_by rows bit-for-bit (rank,
    fixed-point bracket, value-domain midpoint), including a group
    whose distribution straddles zero."""
    import random

    from pyspark.sql import types as T

    from etl_macropulse_br_spark.operators.sketches import (
        hdr_signed_quantiles_by,
    )
    from etl_macropulse_br_spark.streaming.quantiles import (
        running_signed_quantiles_stream,
    )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    rng = random.Random(37)
    qs, scale, s = (0.1, 0.5, 0.9), 1000.0, 6
    src = str(tmp_path / "sq_stream")
    spark.createDataFrame(
        [("score", rng.gauss(0, 2)) for _ in range(400)]
        + [("loss", abs(rng.gauss(5, 3))) for _ in range(200)]
        + [("score", None)] * 3,
        schema,
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [("score", rng.gauss(-3, 1)) for _ in range(300)]
        + [("delta", rng.uniform(-1e4, 1e4)) for _ in range(50)],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_signed_quantiles_stream(
            stream, "event_type", "v", qs, scale, s
        )
        .writeStream.format("memory")
        .queryName("signed_quant_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "sq_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from signed_quant_out").collect()
    final = {}
    for r in rows:
        k = (r["group_key"], r["q"])
        if k not in final or r["n"] > final[k]["n"]:
            final[k] = r
    batch = {
        (r["event_type"], r["q"]): r
        for r in hdr_signed_quantiles_by(
            spark.read.parquet(src), "v", ["event_type"], qs, scale, s
        ).collect()
    }
    assert set(final) == set(batch)
    # the straddling group must exercise both sides of zero
    score_lo = [final[k]["lo"] for k in final if k[0] == "score"]
    assert min(score_lo) < 0
    for k, fr in final.items():
        br = batch[k]
        for c in ("rank", "n", "lo", "hi", "est"):
            assert fr[c] == br[c], (k, c, fr[c], br[c])


def test_stream_quantiles_differential_under_rocksdb(spark, tmp_path):
    """r10 (VERDICT r9 #3): the stream≡batch differential re-run
    under the PRODUCTION RocksDB state-store provider, selected via
    the builder's ``state_store=`` knob — pins that the bucket-count
    state round-trips the RocksDB encoder exactly."""
    import random

    from etl_macropulse_br_spark.operators.sketches import (
        hdr_quantiles_by,
    )
    from etl_macropulse_br_spark.streaming.quantiles import (
        running_quantiles_stream,
    )
    from etl_macropulse_br_spark.streaming.state_store import (
        _CONF,
        PROVIDERS,
    )

    rng = random.Random(41)
    qs, s = (0.5, 0.9), 6
    src = str(tmp_path / "q_rocks_stream")
    spark.createDataFrame(
        [("click", int(rng.lognormvariate(7, 2))) for _ in range(200)]
        + [("view", rng.randrange(0, 50)) for _ in range(100)],
        SCHEMA,
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [("click", int(rng.lognormvariate(10, 1))) for _ in range(150)],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    prev = spark.conf.get(_CONF, None)
    try:
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = running_quantiles_stream(
            stream, "event_type", "v", qs, s, state_store="rocksdb"
        )
        # the knob wired the provider onto the session
        assert spark.conf.get(_CONF) == PROVIDERS["rocksdb"]
        q = (
            out.writeStream.format("memory")
            .queryName("run_quant_rocks")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_rocks"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset(_CONF)
        else:
            spark.conf.set(_CONF, prev)

    rows = spark.sql("select * from run_quant_rocks").collect()
    final = {}
    for r in rows:
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
        for c in ("rank", "n", "lo", "hi", "est"):
            assert fr[c] == batch[k][c], (k, c)
