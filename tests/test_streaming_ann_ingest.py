"""Streaming ANN-index maintenance (streaming/ann_ingest.py):
stream-appended index must equal the bulk batch append bit-for-bit,
redelivery of a committed micro-batch must be an idempotent no-op,
partial id overlap must stay loud, and a crash before the manifest
commit must leave a cleanly retryable batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _emb(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter("embedding is not null")
    )


def test_ann_ingest_stream_equals_bulk_append(spark, tmp_path):
    from etl_macropulse_br_spark.operators.ann_index import (
        append_ann_index,
        load_ann_index,
        save_ann_index,
    )
    from etl_macropulse_br_spark.streaming.ann_ingest import (
        append_new_embeddings,
        start_ann_ingest_stream,
    )

    emb = _emb(spark)
    base = emb.filter("vec_id < 120")
    s1 = emb.filter("vec_id >= 120 and vec_id < 200")
    s2 = emb.filter("vec_id >= 200 and vec_id < 280")

    stream_dir = str(tmp_path / "ann_stream_idx")
    bulk_dir = str(tmp_path / "ann_bulk_idx")
    kw = dict(k=4, rounds=1, m=8, ks=8, pq_rounds=1, sub=8)
    save_ann_index(base, stream_dir, **kw)
    save_ann_index(base, bulk_dir, **kw)
    append_ann_index(s1.unionByName(s2), bulk_dir)

    # stream the two increments as two micro-batches
    src = str(tmp_path / "new_emb_stream")
    s1.coalesce(1).write.parquet(src)
    s2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(s1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_ann_ingest_stream(
        stream, stream_dir, str(tmp_path / "ann_ckpt")
    )
    q.awaitTermination(180)

    six = load_ann_index(spark, stream_dir)
    bix = load_ann_index(spark, bulk_dir)
    # same rows, bit-for-bit (append is a deterministic map-only
    # fold over the frozen index, so slicing cannot change it)
    for kind in ("assign", "codes"):
        a = getattr(six, kind).orderBy(*getattr(six, kind).columns)
        b = getattr(bix, kind).orderBy(*getattr(bix, kind).columns)
        assert a.collect() == b.collect(), kind

    # the stream recorded each micro-batch id atomically with its
    # segment commit (r11) — the O(1) redelivery ledger
    assert six.manifest.get("committed_batches") == ["0", "1"]

    # redelivery of a COMMITTED batch: idempotent no-op — without a
    # batch id, via the legacy full-overlap join classification
    n_before = six.assign.count()
    assert append_new_embeddings(s1, stream_dir) == "skipped"
    assert load_ann_index(spark, stream_dir).assign.count() == n_before

    # partial id overlap (producer bug, not redelivery): loud — both
    # for the ad-hoc (no batch id) classification join...
    mixed = s1.limit(10).unionByName(
        s1.select((F.col("vec_id") + 5_000_000).alias("vec_id"),
                  "embedding").limit(10)
    )
    with pytest.raises(ValueError, match="id collision"):
        append_new_embeddings(mixed, stream_dir)
    # ...and under a NEW batch id (the O(1) ledger misses it, so
    # append_ann_index's duplicate-id guard must catch it)
    with pytest.raises(ValueError, match="already exist in the index"):
        append_new_embeddings(mixed, stream_dir, batch_id=99)
    # the failed append committed nothing: id 99 is not in the ledger
    assert "99" not in load_ann_index(spark, stream_dir).manifest[
        "committed_batches"
    ]

    # empty batch: no-op
    assert append_new_embeddings(s1.limit(0), stream_dir) == "empty"


def test_ann_ingest_redelivery_skip_is_driver_side_o1(
    spark, tmp_path, monkeypatch
):
    """r11 pin (VERDICT r10 What's wrong #2 / Next round #1): the
    redelivery skip of a committed micro-batch runs ZERO Spark jobs
    over the index — it never loads the index, never joins assign,
    never touches batch_df. Pinned by poisoning every index-reading
    entry point: the skip path must return without tripping any."""
    from etl_macropulse_br_spark.operators import ann_index as AIX
    from etl_macropulse_br_spark.streaming import ann_ingest as AI

    emb = _emb(spark)
    base = emb.filter("vec_id < 100")
    batch = emb.filter("vec_id >= 100 and vec_id < 140")
    path = str(tmp_path / "o1_skip_idx")
    AIX.save_ann_index(base, path, k=2, rounds=1, m=4, ks=4,
                       pq_rounds=1, sub=16)
    assert AI.append_new_embeddings(batch, path, batch_id=7) == "appended"

    def poison(*a, **k):
        raise AssertionError(
            "skip path touched the index with a Spark-side read"
        )

    monkeypatch.setattr(AIX, "load_ann_index", poison)
    monkeypatch.setattr(AIX, "append_ann_index", poison)
    # batch_df poisoned too: the decision must not run a job on it
    class _Poisoned:
        def __getattr__(self, name):
            raise AssertionError(f"skip path touched batch_df.{name}")

    assert (
        AI.append_new_embeddings(_Poisoned(), path, batch_id=7)
        == "skipped"
    )
    # a batch id the ledger does NOT hold falls through to the real
    # path (here: the first poisoned touch — proving the ledger,
    # and only the ledger, decided the skip)
    with pytest.raises(AssertionError, match="skip path touched"):
        AI.append_new_embeddings(_Poisoned(), path, batch_id=8)


def test_ann_ingest_ledger_is_bounded_and_trim_is_loud(
    spark, tmp_path, monkeypatch
):
    """r11: the committed_batches ledger keeps a bounded tail (Spark
    only ever redelivers the newest uncommitted batch), and an id
    trimmed out of the tail — reachable only by restarting from an
    ancient checkpoint — hits the duplicate-id guard LOUDLY instead
    of silently double-appending."""
    from etl_macropulse_br_spark.operators import ann_index as AIX
    from etl_macropulse_br_spark.streaming.ann_ingest import (
        append_new_embeddings,
    )

    monkeypatch.setattr(AIX, "_LEDGER_KEEP", 3)
    emb = _emb(spark)
    base = emb.filter("vec_id < 60")
    path = str(tmp_path / "bounded_ledger_idx")
    AIX.save_ann_index(base, path, k=2, rounds=1, m=4, ks=4,
                       pq_rounds=1, sub=16)
    for bid in range(5):
        lo, hi = 60 + bid * 20, 80 + bid * 20
        b = emb.filter(f"vec_id >= {lo} and vec_id < {hi}")
        assert append_new_embeddings(b, path, batch_id=bid) == "appended"
    ledger = AIX.load_ann_index(spark, path).manifest["committed_batches"]
    assert ledger == ["2", "3", "4"]  # bounded tail, oldest trimmed
    # recent tail still skips O(1)
    b4 = emb.filter("vec_id >= 140 and vec_id < 160")
    assert append_new_embeddings(b4, path, batch_id=4) == "skipped"
    # a trimmed-out batch id redelivers its (committed) ids: LOUD
    b0 = emb.filter("vec_id >= 60 and vec_id < 80")
    with pytest.raises(ValueError, match="already exist in the index"):
        append_new_embeddings(b0, path, batch_id=0)


def test_ann_ingest_compaction_preserves_batch_ledger(spark, tmp_path):
    """Compaction swaps the segment listing but must carry
    committed_batches across (it describes batches, not segments) —
    otherwise every committed batch would be re-appended after the
    first compaction, duplicating its vectors."""
    from etl_macropulse_br_spark.operators import ann_index as AIX
    from etl_macropulse_br_spark.streaming.ann_ingest import (
        append_new_embeddings,
    )

    emb = _emb(spark)
    base = emb.filter("vec_id < 100")
    batch = emb.filter("vec_id >= 100 and vec_id < 140")
    path = str(tmp_path / "ledger_compact_idx")
    AIX.save_ann_index(base, path, k=2, rounds=1, m=4, ks=4,
                       pq_rounds=1, sub=16)
    assert append_new_embeddings(batch, path, batch_id=3) == "appended"
    ix = AIX.compact_ann_index(spark, path)
    assert ix.manifest.get("committed_batches") == ["3"]
    assert append_new_embeddings(batch, path, batch_id=3) == "skipped"


def test_ann_ingest_crash_before_commit_is_retryable(
    spark, tmp_path, monkeypatch
):
    from etl_macropulse_br_spark.operators import ann_index as AIX
    from etl_macropulse_br_spark.streaming.ann_ingest import (
        append_new_embeddings,
    )

    emb = _emb(spark)
    base = emb.filter("vec_id < 100")
    batch = emb.filter("vec_id >= 100 and vec_id < 160")
    path = str(tmp_path / "crash_ingest_idx")
    AIX.save_ann_index(base, path, k=2, rounds=1, m=4, ks=4,
                       pq_rounds=1, sub=16)

    real_commit = AIX._commit_manifest

    def crash_commit(p, manifest):
        raise RuntimeError("injected crash before manifest replace")

    monkeypatch.setattr(AIX, "_commit_manifest", crash_commit)
    with pytest.raises(RuntimeError, match="injected"):
        append_new_embeddings(batch, path, batch_id=5)
    # the crashed batch never entered the committed index, and its
    # batch id was never recorded (the ledger write IS the commit)...
    idx_after = AIX.load_ann_index(spark, path)
    assert idx_after.assign.count() == base.count()
    assert "5" not in idx_after.manifest.get("committed_batches", [])
    # ...so the streaming redelivery (same stable batch id) retries
    # as a clean append and records the id this time
    monkeypatch.setattr(AIX, "_commit_manifest", real_commit)
    assert append_new_embeddings(batch, path, batch_id=5) == "appended"
    idx_done = AIX.load_ann_index(spark, path)
    assert idx_done.assign.count() == base.count() + batch.count()
    assert idx_done.manifest["committed_batches"] == ["5"]


def test_ann_ingest_stream_with_inline_compaction(spark, tmp_path):
    """compact_every folds the per-batch segments inside the stream
    (same lease, bit-identical): after two batches with
    compact_every=1 the live manifest lists ONE segment and the
    index still equals the bulk append."""
    import json
    import os

    from etl_macropulse_br_spark.operators.ann_index import (
        append_ann_index,
        load_ann_index,
        save_ann_index,
    )
    from etl_macropulse_br_spark.streaming.ann_ingest import (
        start_ann_ingest_stream,
    )

    emb = _emb(spark)
    base = emb.filter("vec_id < 100")
    s1 = emb.filter("vec_id >= 100 and vec_id < 150")
    s2 = emb.filter("vec_id >= 150 and vec_id < 200")
    path = str(tmp_path / "compacting_idx")
    bulk = str(tmp_path / "compacting_bulk")
    kw = dict(k=2, rounds=1, m=4, ks=4, pq_rounds=1, sub=16)
    save_ann_index(base, path, **kw)
    save_ann_index(base, bulk, **kw)
    append_ann_index(s1.unionByName(s2), bulk)

    src = str(tmp_path / "compacting_src")
    s1.coalesce(1).write.parquet(src)
    s2.coalesce(1).write.mode("append").parquet(src)
    q = start_ann_ingest_stream(
        spark.readStream.schema(s1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        path,
        str(tmp_path / "compacting_ckpt"),
        compact_every=1,
    )
    q.awaitTermination(180)

    with open(os.path.join(path, "MANIFEST.json")) as f:
        manifest = json.load(f)
    assert len(manifest["segments"]) == 1
    six, bix = load_ann_index(spark, path), load_ann_index(spark, bulk)
    a = six.assign.orderBy("vec_id", "cluster_id").collect()
    b = bix.assign.orderBy("vec_id", "cluster_id").collect()
    assert a == b


def test_adc_drift_ratio_scalar(spark, tmp_path):
    """r10: the scalar drift signal — ~1.0 for an in-distribution
    append, way above 1 for a planted distribution shift, None
    before any append."""
    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.operators.ann_index import (
        append_ann_index,
        save_ann_index,
    )

    emb = _emb(spark).filter("vec_id < 120")
    path = str(tmp_path / "drift_idx")
    ix = save_ann_index(emb, path, k=2, rounds=1, m=4, ks=4,
                        pq_rounds=1, sub=16)
    assert ix.adc_drift_ratio() is None  # training batch only

    same = emb.select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                      "embedding")
    ix = append_ann_index(same, path)
    assert abs(ix.adc_drift_ratio() - 1.0) < 1e-9  # identical vectors

    shifted = emb.select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"),
        F.transform("embedding",
                    lambda x: x * F.lit(3.0) + F.lit(8.0)).alias("embedding"),
    )
    ix = append_ann_index(shifted, path)
    assert ix.adc_drift_ratio() > 5.0  # the planted shift is loud
