"""Streaming Bloom-filter decontamination: flag (or drop) training
documents that overlap a benchmark/eval suite AS THEY ARRIVE — the
ingestion-time complement of the batch ``decontaminate_bloom``
(operators/dedup.py). A training-data pipeline that tails a crawl
feed wants contaminated docs filtered before they ever land in the
corpus, not in a nightly batch sweep.

Design: the eval suite compresses to the shared fixed-size Bloom
bitset (``operators/dedup.bloom_bitset`` — ~1 KB per 2^16 bits,
independent of eval-suite size), which is COLLECTED ONCE at plan
construction and embedded as a literal array — a broadcast model
parameter, exactly like the SRP hyperplanes and the hashed-linear
model weights. That makes the stream side entirely MAP-ONLY:

- per-row shingle-hash ARRAY (the same normalize → token-md5 →
  affine n-gram combine as ``shingle_hash_rows``'s array form, kept
  pre-explode so no Generate and no aggregate),
- ``exists(shingles, s -> all k probed bits set)`` evaluates the k
  Bloom probes per shingle inside codegen against the literal
  bitset (``_bloom_hit`` — the identical expression the batch probe
  uses),

so there is NO state store, NO watermark, and NO stream-static join
(a static-side plan would re-execute every micro-batch; the literal
executes zero times). Same guarantees as batch: structurally no
false negatives, false positives at the sized rate only cost
over-removal (``bloom_bits_for`` sizes the filter to a target rate).

The one driver action (building + collecting the <= n_bits/60-word
bitset at plan-build time) is deliberate and documented, like the
dim peek in ``embedding_near_dups`` and SemDeDup's auto-k count —
pass a precomputed ``bitset`` to keep construction action-free
(e.g. reuse one bitset across many streams, or rebuild it on a
schedule outside the query).

Cross-batch correctness is pinned by
tests/test_streaming_decontaminate.py: the streamed flags equal the
batch operator's over the same files, across micro-batch
boundaries, for both contaminated and clean docs.

Reference scope: the reference is strictly batch (SURVEY.md §2.11);
this is part of the streaming extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decontaminate_bloom_stream(
    stream: DataFrame,
    eval_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shingle: int = 3,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    bitset: list[int] | dict | None = None,
) -> DataFrame:
    """Append a ``contaminated`` flag to every arriving doc — true
    iff ANY of its ``n_shingle``-gram shingles probes fully set in
    the eval Bloom bitset. Map-only; the caller drops or routes
    flagged rows. Exactly one of ``eval_df`` / ``bitset`` must be
    given; ``bitset`` skips the plan-build collect.

    ``bitset`` accepts either the param-carrying dict from
    ``operators/dedup.load_bloom_bitset`` — in which case the STORED
    n_bits/n_shingle/n_hashes are authoritative (r9: a bitset probed
    under different params silently yields FALSE NEGATIVES, and a
    same-word-count n_bits mismatch passes the length check) — or a
    raw word list, where the caller owns param consistency (legacy;
    only the word count is verifiable from a bare list)."""
    from etl_macropulse_br_spark.functions.hashing import base32
    from etl_macropulse_br_spark.operators.dedup import (
        _WS,
        _bloom_hit,
        _norm_text,
        bloom_bitset,
        shingle_combine_over_th,
    )

    if (eval_df is None) == (bitset is None):
        raise ValueError(
            "decontaminate_bloom_stream: pass exactly one of eval_df "
            "(bitset built and collected at plan construction) or "
            "bitset (precomputed words)"
        )
    if isinstance(bitset, dict):
        n_bits = int(bitset["n_bits"])
        n_shingle = int(bitset["n_shingle"])
        n_hashes = int(bitset["n_hashes"])
        bitset = list(bitset["words"])
    if bitset is None:
        row = bloom_bitset(
            eval_df, text_col, id_col, n_shingle, n_bits, n_hashes
        ).first()
        bitset = list(row["bf"]) if row is not None else []
    n_words = (n_bits + 59) // 60
    if len(bitset) != n_words:
        raise ValueError(
            f"decontaminate_bloom_stream: bitset has {len(bitset)} "
            f"words, expected {n_words} for n_bits={n_bits}"
        )
    bf = F.array(*[F.lit(int(w)).cast("long") for w in bitset])

    # per-row shingle-hash ARRAY — shingle_hash_rows' array form,
    # kept pre-explode (same normalize / token md5 / affine combine,
    # so the flags are bit-compatible with the batch operator). The
    # token-hash array is materialized as its OWN column first —
    # inlined into the transform lambda it would recompute every
    # token's md5 once per shingle index (the same CollapseProject
    # trap shingle_hash_rows documents).
    toks = F.split(_norm_text(text_col), _WS)
    with_th = stream.withColumn(
        "__th", F.transform(toks, lambda t: base32(t))
    )
    sh_arr = shingle_combine_over_th(F.col("__th"), n_shingle)
    contaminated = F.exists(
        sh_arr, lambda sh: _bloom_hit(sh, bf, n_bits, n_hashes)
    )
    return with_th.withColumn("contaminated", contaminated).drop("__th")
