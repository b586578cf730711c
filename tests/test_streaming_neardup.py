"""Streaming MinHash near-dup vs the batch operators: for ANY
micro-batch slicing, the deduped stream output must equal (a) the
union of batch ``incremental_near_dups`` runs replaying the same
slicing, and (b) the full-corpus ``minhash_near_dups`` pass
normalized to (larger/later, earlier) orientation — banding, k-min
signatures, and the exact-Jaccard verify are bit-identical
constructions on both sides."""

from __future__ import annotations

from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BATCH1 = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "completely unrelated text about macro economics here"),
    (3, "another distinct base document with its own words"),
    (4, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
]
BATCH2 = [
    (11, "the quick brown fox jumps over the lazy dog today"),  # dup of 1,4
    (12, "fresh unique content that matches nothing at all"),
    (13, "fresh unique content that matches nothing at all"),  # dup of 12
    (14, "completely unrelated text about macro economics here"),  # dup of 2
]


def _run_stream(spark, tmp_path, tag, batches):
    from etl_macropulse_br_spark.streaming.neardup import neardup_stream

    src = str(tmp_path / f"docs_{tag}")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        neardup_stream(stream, threshold=0.5)
        .writeStream.format("memory")
        .queryName(f"neardup_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # per-colliding-band multiplicity folded at the read side, as the
    # operator documents
    return {
        (r["new_id"], r["match_id"]): r["jaccard"]
        for r in spark.sql(
            f"select distinct * from neardup_out_{tag}"
        ).collect()
    }


def test_stream_neardup_matches_batch_across_slicings(spark, tmp_path):
    from etl_macropulse_br_spark.operators.dedup import (
        incremental_near_dups,
        minhash_near_dups,
    )

    two_slices = _run_stream(spark, tmp_path, "two", [BATCH1, BATCH2])
    one_slice = _run_stream(spark, tmp_path, "one", [BATCH1 + BATCH2])
    assert two_slices == one_slice  # slicing-invariant

    all_docs = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    full = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"])): r["jaccard"]
        for r in minhash_near_dups(
            all_docs, threshold=0.5, persist_candidates=False
        ).collect()
    }
    assert full  # planted dups must be found
    assert two_slices == full

    # and equals the batch incremental replay of the same slicing
    b1 = spark.createDataFrame(BATCH1, SCHEMA)
    b2 = spark.createDataFrame(BATCH2, SCHEMA)
    empty = spark.createDataFrame([], SCHEMA)
    inc = {}
    for r in incremental_near_dups(b1, empty, threshold=0.5).collect():
        inc[(r["new_id"], r["match_id"])] = r["jaccard"]
    for r in incremental_near_dups(b2, b1, threshold=0.5).collect():
        inc[(r["new_id"], r["match_id"])] = r["jaccard"]
    assert two_slices == inc
