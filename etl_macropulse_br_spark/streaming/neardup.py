"""Streaming incremental NEAR-duplicate detection — the streaming
twin of ``operators/dedup.incremental_near_dups`` (r8): MinHash
banding state in the state store, keyed by (band, band_hash); each
arriving doc emits verified matches against everything that arrived
BEFORE it (earlier micro-batches via state, smaller ids within the
same micro-batch), then merges into state. The daily-crawl batch
loop (`scripts/ingest_increment.py`) and this stream compute the
SAME relation: one (new_id, match_id, jaccard) row per verified
duplicate, with new_id the later/larger doc — pinned equal to the
batch operator across micro-batch slicings by the differential test.

Everything hash-shaped is computed IN THE SPARK PLAN with the exact
batch expressions — ``token_shingle_hashes`` (affine token-hash
combine, distinct), the Carter-Wegman k-min signature over the
32-bit folded hashes, and the per-band md5 of the comma-joined
signature slice (identical rendering to ``_minhash_banded``'s
concat_ws over m-columns) — so Python touches only integers: the
stateful function stores (id, shingle-hash set) per bucket member
and computes exact Jaccard as int-set intersection/union, the same
|A∩B|/|A∪B| double the batch verify produces. Text NEVER reaches
the state store or the shuffle — the text-never-shuffles rule every
batch dedup path follows.

A pair colliding in multiple bands is emitted once per colliding
band (the buckets are independent state groups and cannot see each
other); consumers take ``dropDuplicates`` — the batch op's
candidate ``distinct()`` folded to the read side. Rows stay exact
duplicates, so this changes no semantics.

State: per bucket, the (id, shingle-set) of every member — int-only,
O(docs-in-bucket × shingles/doc) longs. NoTimeout (lifetime corpus)
matches the batch operator's contract; bound the horizon with an
event-time column + eviction (as ``streaming/windowed_distinct``
does) when the dedup window is finite — at 100 TB the production
variant also replaces the in-state shingle sets with a pointer +
side lookup, which this local twin keeps inline for exactness.

Reference scope: the reference is strictly batch (SURVEY.md §2.11);
streaming extension surface.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("new_id", T.LongType()),
        T.StructField("match_id", T.LongType()),
        T.StructField("jaccard", T.DoubleType()),
    ]
)

# members: pickled list[(id, set[int])] — int-only by construction
STATE_SCHEMA = T.StructType([T.StructField("members", T.BinaryType())])


def _signature_cols(sh: Column, k: int) -> list[Column]:
    """Per-row k-min signature over a shingle-hash ARRAY — the exact
    construction minhash_signature_table applies to shingle ROWS
    (mask to 32 bits, min of the affine family); distinctness of the
    array is irrelevant to a min."""
    from etl_macropulse_br_spark.functions.hashing import (
        _MASK32,
        _lcg_constants,
    )

    bases = F.transform(sh, lambda h: h.bitwiseAND(F.lit(_MASK32)))

    def affine(a: int, b: int):
        # single-arg lambda: a two-arg lambda would be invoked by
        # Spark as (element, index)
        return lambda h: h * F.lit(a) + F.lit(b)

    return [
        F.array_min(F.transform(bases, affine(a, b)))
        for a, b in _lcg_constants(k)
    ]


def _update_bucket(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    threshold: float,
) -> Iterator[pd.DataFrame]:
    members: list[tuple[int, set]] = (
        pickle.loads(state.get[0]) if state.exists else []
    )
    rows: list[tuple[int, set]] = []
    for pdf in pdfs:
        for i in range(len(pdf)):
            rows.append(
                (int(pdf["id"].iloc[i]), set(map(int, pdf["sh"].iloc[i])))
            )
    # id-ascending within the micro-batch: "earlier" = state members
    # (prior batches) plus smaller ids of this batch — the batch
    # operator's keep-first orientation
    rows.sort(key=lambda r: r[0])
    out_new, out_match, out_j = [], [], []
    for doc_id, sh in rows:
        for other_id, other_sh in members:
            if other_id == doc_id:
                continue  # replay/duplicate delivery of the same doc
            inter = len(sh & other_sh)
            if not inter:
                continue
            j = inter / len(sh | other_sh)
            if j >= threshold:
                out_new.append(doc_id)
                out_match.append(other_id)
                out_j.append(j)
        members.append((doc_id, sh))
    state.update((pickle.dumps(members),))
    if out_new:
        yield pd.DataFrame(
            {"new_id": out_new, "match_id": out_match, "jaccard": out_j}
        )


def neardup_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_shingle: int = 3,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """stream(id_col, text_col, ...) → (new_id, match_id, jaccard)
    rows as docs arrive. ``dropDuplicates`` the sink for the
    per-colliding-band multiplicity (module docstring); the deduped
    relation equals the batch ``incremental_near_dups`` /
    full-corpus ``minhash_near_dups`` result on the same docs, for
    ANY micro-batch slicing (pinned)."""
    from etl_macropulse_br_spark.functions.hashing import md5_long
    from etl_macropulse_br_spark.operators.dedup import (
        token_shingle_hashes,
    )

    band_w = k // bands
    # materialize the shingle-hash array in ITS OWN projection and
    # build the k signature mins from the column REFERENCE: inlining
    # token_shingle_hashes into each signature expression would make
    # Catalyst re-evaluate the per-token md5 transform k+1 times per
    # row (the repo-documented re-inlining trap — see
    # shingle_hash_rows / simhash); as a non-cheap alias referenced
    # k+1 times it survives CollapseProject, so the md5 runs once
    hashed = stream.select(
        F.col(id_col).alias("id"),
        token_shingle_hashes(text_col, n_shingle).alias("sh"),
    )
    sigs = _signature_cols(F.col("sh"), k)
    banded = hashed.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        md5_long(
                            F.concat_ws(
                                ",",
                                *sigs[b * band_w : (b + 1) * band_w],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("id", "sh", "bh.band", "bh.band_hash")
    return banded.groupBy("band", "band_hash").applyInPandasWithState(
        lambda key, pdfs, state: _update_bucket(
            key, pdfs, state, threshold
        ),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
