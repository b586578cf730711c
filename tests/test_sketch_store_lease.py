"""r11 (VERDICT r10 What's missing #1 / Next round #3): the three
sketch stores — KMV, HDR histogram, Bloom bitset — get the same
single-writer + loud-crash-window guarantees the persisted indexes
got in r10. Per family: an interleaved second writer is REFUSED
loudly while the survivor's artifact loads with matching params, and
a save that crashes between the data write and the sidecar write
leaves an artifact the loader REFUSES — never a plausible-but-wrong
sketch (the r10 torn-interleave shape, B's rows under A's sidecar,
is unreachable under the lease)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_macropulse_br_spark.operators.statelock import (
    WriterLockHeld,
    artifact_lock,
)


def _kmv(spark, n=200, k=16):
    from etl_macropulse_br_spark.operators.sketches import kmv_sketch

    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    return kmv_sketch(df, "v", k=k)


def _hdr(spark, n=500, s=8):
    from etl_macropulse_br_spark.operators.sketches import hdr_histogram

    df = spark.range(1, n).select((F.col("id") * 3).alias("x"))
    return hdr_histogram(df, "x", s=s)


def test_kmv_save_interleave_refused_survivor_intact(spark, tmp_path):
    from etl_macropulse_br_spark.operators.sketches import (
        load_kmv_sketch,
        save_kmv_sketch,
    )

    path = str(tmp_path / "kmv_store")
    sk = _kmv(spark, k=16)
    save_kmv_sketch(sk, path, k=16)

    # writer A is mid-save (holds the artifact lease); writer B's
    # save must be refused loudly, not interleaved
    with artifact_lock(path, owner="in-flight-save"):
        with pytest.raises(WriterLockHeld, match="single-writer"):
            save_kmv_sketch(_kmv(spark, n=50, k=8), path, k=8)
    # the survivor still loads with ITS params (k=16, 16 rows)
    frame, k = load_kmv_sketch(spark, path)
    assert k == 16 and frame.count() == 16
    # lease released: a later legitimate save works
    save_kmv_sketch(_kmv(spark, n=50, k=8), path, k=8)
    assert load_kmv_sketch(spark, path)[1] == 8


def test_kmv_crash_between_data_and_sidecar_is_loud(
    spark, tmp_path, monkeypatch
):
    from etl_macropulse_br_spark.operators.sketches import (
        load_kmv_sketch,
        save_kmv_sketch,
    )

    path = str(tmp_path / "kmv_crash")
    save_kmv_sketch(_kmv(spark, k=16), path, k=16)

    def crash(*a, **kw):
        raise RuntimeError("injected crash before sidecar write")

    # the sidecar write is the json.dump after the parquet overwrite
    monkeypatch.setattr(json, "dump", crash)
    with pytest.raises(RuntimeError, match="injected"):
        save_kmv_sketch(_kmv(spark, n=50, k=8), path, k=8)
    monkeypatch.undo()
    # the overwrite deleted the OLD sidecar with the directory and
    # the new one never landed: the load is LOUD — crucially NOT the
    # old k=16 params over the new k=8 rows
    with pytest.raises(FileNotFoundError, match="_kmv_meta"):
        load_kmv_sketch(spark, path)
    # the lease was released by the crashed writer's finally: a
    # rebuild succeeds and serves consistently
    save_kmv_sketch(_kmv(spark, k=16), path, k=16)
    assert load_kmv_sketch(spark, path)[1] == 16


def test_hdr_save_interleave_refused_survivor_intact(spark, tmp_path):
    from etl_macropulse_br_spark.operators.sketches import (
        load_hdr_histogram,
        save_hdr_histogram,
    )

    path = str(tmp_path / "hdr_store")
    save_hdr_histogram(_hdr(spark, s=8), path, s=8)

    with artifact_lock(path, owner="in-flight-save"):
        with pytest.raises(WriterLockHeld, match="single-writer"):
            save_hdr_histogram(_hdr(spark, s=4), path, s=4)
    frame, meta = load_hdr_histogram(spark, path)
    assert meta["s"] == 8 and frame.count() > 0
    save_hdr_histogram(_hdr(spark, s=4), path, s=4)
    assert load_hdr_histogram(spark, path)[1]["s"] == 4


def test_hdr_crash_between_data_and_sidecar_is_loud(
    spark, tmp_path, monkeypatch
):
    from etl_macropulse_br_spark.operators.sketches import (
        load_hdr_histogram,
        save_hdr_histogram,
    )

    path = str(tmp_path / "hdr_crash")
    save_hdr_histogram(_hdr(spark, s=8), path, s=8)

    def crash(*a, **kw):
        raise RuntimeError("injected crash before sidecar write")

    monkeypatch.setattr(json, "dump", crash)
    with pytest.raises(RuntimeError, match="injected"):
        # same s: pre-lease, this tear was UNDETECTABLE (params
        # match), which is why detection must come from ordering,
        # not sidecar comparison
        save_hdr_histogram(_hdr(spark, n=50, s=8), path, s=8)
    monkeypatch.undo()
    with pytest.raises(FileNotFoundError, match="_hdr_meta"):
        load_hdr_histogram(spark, path)
    save_hdr_histogram(_hdr(spark, s=8), path, s=8)
    assert load_hdr_histogram(spark, path)[1]["s"] == 8


def _docs(spark, n=30):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta "),
                 F.col("id").cast("string")).alias("text"),
    )


def test_bloom_save_interleave_refused_and_replace_atomic(
    spark, tmp_path, monkeypatch
):
    from etl_macropulse_br_spark.operators.dedup import (
        load_bloom_bitset,
        save_bloom_bitset,
    )

    path = str(tmp_path / "bloom.json")
    s1 = save_bloom_bitset(_docs(spark), path, n_bits=1 << 12)
    assert load_bloom_bitset(path) == s1

    # interleave: refused loudly while a writer holds the lease
    with artifact_lock(path, owner="in-flight-save"):
        with pytest.raises(WriterLockHeld, match="single-writer"):
            save_bloom_bitset(_docs(spark, 5), path, n_bits=1 << 10)
    assert load_bloom_bitset(path) == s1  # survivor intact

    # crash at the commit point (os.replace): the OLD bitset stays
    # complete — a single-file replace is atomic, never truncated
    def crash(src, dst):
        raise RuntimeError("injected crash at replace")

    monkeypatch.setattr(os, "replace", crash)
    with pytest.raises(RuntimeError, match="injected"):
        save_bloom_bitset(_docs(spark, 5), path, n_bits=1 << 10)
    monkeypatch.undo()
    assert load_bloom_bitset(path) == s1
    # and a clean retry wins
    s2 = save_bloom_bitset(_docs(spark, 5), path, n_bits=1 << 10)
    assert load_bloom_bitset(path) == s2
