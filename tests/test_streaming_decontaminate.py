"""Streaming Bloom decontamination vs the batch operator: the
per-doc flags must be IDENTICAL over the same files, across
micro-batch boundaries (map-only — no state to carry, but the
literal-bitset plan must score both batches with the same filter)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

BASE = dt.datetime(2026, 4, 1, 12, 0, 0)


def _run_stream(spark, src, ckpt, name, eval_df=None, bitset=None):
    from etl_macropulse_br_spark.streaming.decontaminate import (
        decontaminate_bloom_stream,
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(src)
    )
    q = (
        decontaminate_bloom_stream(stream, eval_df, bitset=bitset)
        .select("doc_id", "contaminated")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").collect()


def test_stream_flags_match_batch_operator(spark, tmp_path):
    from etl_macropulse_br_spark.operators.dedup import (
        decontaminate_bloom,
    )

    eval_df = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "benchmark question about prime factorization today"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "train_stream")
    # micro-batch 1: one contaminated (shares a >=3-gram with eval),
    # one clean
    spark.createDataFrame(
        [
            (1, "He said the quick brown fox appeared", BASE),
            (2, "completely unrelated training prose here", BASE),
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(src)
    # micro-batch 2: contamination must still be caught AFTER the
    # first trigger (the literal bitset persists in the plan), plus
    # a clean doc and a case/whitespace-variant contamination
    spark.createDataFrame(
        [
            (3, "notes: prime   Factorization TODAY is fun", BASE),
            (4, "another clean document entirely", BASE),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    rows = _run_stream(
        spark, src, str(tmp_path / "ckpt"), "deconta_stream", eval_df
    )
    got = {r["doc_id"]: r["contaminated"] for r in rows}

    batch = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate_bloom(
            spark.read.parquet(src), eval_df
        ).collect()
    }
    assert got == batch
    # and the seed corpus must exercise both outcomes
    assert got[1] is True and got[2] is False
    assert got[3] is True and got[4] is False


def test_stream_accepts_precomputed_bitset_and_guards(spark, tmp_path):
    """bitset= skips the plan-build collect (action-free
    construction); wrong-size bitsets and ambiguous args fail
    loudly."""
    from etl_macropulse_br_spark.operators.dedup import bloom_bitset
    from etl_macropulse_br_spark.streaming.decontaminate import (
        decontaminate_bloom_stream,
    )

    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    words = list(bloom_bitset(eval_df).first()["bf"])

    src = str(tmp_path / "train_stream2")
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon", BASE),
            (2, "nothing shared at all", BASE),
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(src)

    rows = _run_stream(
        spark,
        src,
        str(tmp_path / "ckpt2"),
        "deconta_stream2",
        bitset=words,
    )
    got = {r["doc_id"]: r["contaminated"] for r in rows}
    assert got == {1: True, 2: False}

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    with pytest.raises(ValueError, match="exactly one"):
        decontaminate_bloom_stream(stream)
    with pytest.raises(ValueError, match="exactly one"):
        decontaminate_bloom_stream(stream, eval_df, bitset=words)
    with pytest.raises(ValueError, match="words"):
        decontaminate_bloom_stream(stream, bitset=[0, 1, 2])

    # r9: the param-carrying stored bitset — save/load round-trip,
    # with the STORED params authoritative: a bitset built under a
    # NON-default n_bits served through the dict path must flag
    # correctly even though the caller passed no n_bits (a bare-list
    # bitset with a same-word-count n_bits mismatch is undetectable,
    # which is why the sidecar exists)
    from etl_macropulse_br_spark.operators.dedup import (
        load_bloom_bitset,
        save_bloom_bitset,
    )

    bpath = str(tmp_path / "eval_bloom.json")
    saved = save_bloom_bitset(eval_df, bpath, n_bits=(1 << 16) - 6)
    loaded = load_bloom_bitset(bpath)
    assert loaded == saved and loaded["n_bits"] == (1 << 16) - 6
    rows2 = _run_stream(
        spark,
        src,
        str(tmp_path / "ckpt3"),
        "deconta_stream3",
        bitset=loaded,
    )
    assert {r["doc_id"]: r["contaminated"] for r in rows2} == {
        1: True,
        2: False,
    }
    with pytest.raises(ValueError, match="save_bloom_bitset"):
        import json

        broken = str(tmp_path / "broken.json")
        with open(broken, "w") as f:
            json.dump({"words": []}, f)
        load_bloom_bitset(broken)
