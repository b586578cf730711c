"""Deduplication operators — exact and near-duplicate.

Training-data pipeline operators (BASELINE.json north star), all
expression-based so they scale:

- exact: hash-groupBy on normalized text (one shuffle).
- MinHash + LSH: shingle → k minhashes → b bands → band-bucket join
  → candidate pairs → exact Jaccard verify. The classic
  Broder/Leskovec construction (MMDS ch. 3) as a pure DataFrame
  plan: explode-by-band keeps the shuffle proportional to b×docs,
  and candidate verification touches only bucket-colliding pairs —
  never the O(n²) cross join.
- SimHash: 64-bit Charikar sketch via per-bit majority vote,
  computed with higher-order array functions.
- n-gram Jaccard: exact pairwise similarity, restricted to LSH
  candidates (or any blocking key) to stay sub-quadratic.

Hash functions are the portable md5-based family
(functions/hashing.py) so every step can be replayed in the DuckDB
oracle; swap ``md5_long`` for ``xxhash64_seeded`` for raw speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_macropulse_br_spark.functions.hashing import md5_long

_WS = r"\s+"


def _norm_text(text_col: str) -> Column:
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), _WS, " ")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup groups: one row per distinct normalized text with
    the kept (min-id) representative and the duplicate count."""
    return (
        df.select(md5_long(_norm_text(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def word_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text.

    Built with sequence/transform/slice over the token array —
    no explode, no UDF; empty/short docs yield their full token
    string as a single shingle so every doc has ≥1 shingle.
    """
    toks = F.split(_norm_text(text_col), _WS)
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def minhash_signature(shingles: Column, k: int = 16) -> Column:
    """k-element MinHash signature.

    One md5 per shingle folded to 32 bits, then k integer hashes via
    a 2-universal family (a_i * base + b_i) — k× cheaper than k
    seeded md5s, same guarantees (Broder 1997; Carter-Wegman
    universal hashing), still bit-identical in the SQL oracle.
    """
    from etl_macropulse_br_spark.functions.hashing import (
        _lcg_constants,
        base32,
    )

    bases = F.transform(shingles, lambda s: base32(s))

    def hashed(a: int, b: int):
        # single-arg lambda — a two-arg lambda would be invoked by
        # Spark as (element, index)
        return lambda h: h * F.lit(a) + F.lit(b)

    return F.array(
        *[
            F.array_min(F.transform(bases, hashed(a, b)))
            for a, b in _lcg_constants(k)
        ]
    )


def minhash_signature_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shingle: int = 3,
    k: int = 16,
) -> DataFrame:
    """Per-document MinHash signature as columns (id, m0..m{k-1}).

    Plan shape chosen for scale AND to guarantee one md5 per shingle:
    explode shingles → project the 32-bit base hash (computed exactly
    once per shingle row) → hash-aggregate k integer mins. Keeping
    the k hashes as aggregate expressions over a materialized column
    sidesteps Catalyst's project-collapsing, which would otherwise
    inline (and recompute) the md5 k times inside k array
    expressions. Partial aggregation collapses each partition to one
    row per doc before the shuffle, so the exchange carries
    ~docs × (k+1) integers regardless of shingle count.
    """
    from etl_macropulse_br_spark.functions.hashing import (
        _lcg_constants,
        base32,
    )

    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, n_shingle)).alias("s"),
    )
    hashed = exploded.select("id", base32("s").alias("h"))
    return hashed.groupBy("id").agg(
        *[
            F.min(F.col("h") * F.lit(a) + F.lit(b)).alias(f"m{i}")
            for i, (a, b) in enumerate(_lcg_constants(k))
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shingle: int = 3,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH.

    Signature split into ``bands`` groups of ``k/bands`` hashes; docs
    colliding on any band-hash become a candidate pair. Plan shape:
    signature table → explode per-band hashes (b× row growth, never
    n²) → shuffle on (band, band_hash) → within-bucket self-join →
    distinct pairs. Band hashes use xxhash64 (JVM, no oracle needed
    at this internal step)."""
    rows = k // bands
    sig = minhash_signature_table(df, text_col, id_col, n_shingle, k)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"m{b * rows + j}") for j in range(rows)]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("id", "bh.band", "bh.band_hash")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shingle: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for given candidate pairs.

    Joins shingle sets onto the (id_a, id_b) pair table (broadcast
    when small) and computes |A∩B| / |A∪B| with array intersect.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, n_shingle).alias("sh"),
    )
    return (
        pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_shingle: int = 3,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """End-to-end near-dup pairs: LSH candidates verified by exact
    Jaccard ≥ threshold."""
    cands = minhash_lsh_candidates(df, text_col, id_col, n_shingle, k, bands)
    verified = ngram_jaccard_pairs(df, cands, text_col, id_col, n_shingle)
    return verified.filter(F.col("jaccard") >= threshold)


def simhash(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """Charikar SimHash over word tokens.

    Per bit: majority vote of token-hash bits → one integer sketch.
    Near-dups are sketches within small Hamming distance; the sketch
    itself is a groupable/bucketable column. ``bits`` defaults to 16
    to keep the expression tree small; 64 works identically.
    """
    toks = F.array_distinct(F.split(_norm_text(text_col), _WS))
    hashes = F.transform(toks, lambda t: md5_long(t))
    bit_exprs = []
    for b in range(bits):
        mask = 1 << b
        ones = F.size(
            F.filter(hashes, (lambda m: lambda h: h.bitwiseAND(F.lit(m)) != 0)(mask))
        )
        bit_exprs.append(
            F.when(ones * 2 >= F.size(hashes), F.lit(2**b)).otherwise(F.lit(0))
        )
    sketch = bit_exprs[0]
    for e in bit_exprs[1:]:
        sketch = sketch + e
    return df.withColumn("simhash", sketch.cast("bigint"))


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_bands: int = 8,
) -> DataFrame:
    """Embedding near-dup pairs: sign-random-projection LSH buckets
    (deterministic hyperplanes from md5 of dimension index) then
    exact cosine verify within buckets.

    At 100 TB the bucket join bounds pair counts; brute force is the
    ``similarity.cosine_topk`` path instead.
    """
    from etl_macropulse_br_spark.operators.similarity import cosine_sim

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # Sign bits of dot products with ±1 hyperplanes derived from
    # md5(dim_index * plane): deterministic, engine-portable.
    def plane_bit(p: int) -> Column:
        def sign_for_dim(plane: int):
            return lambda i: F.when(
                md5_long(i.cast("string"), seed=plane) % 2 == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0))

        signed = F.aggregate(
            F.zip_with(
                v,
                F.transform(F.sequence(F.lit(0), F.size(v) - 1), sign_for_dim(p)),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(signed >= 0, F.lit(2**p)).otherwise(F.lit(0))

    bucket = plane_bit(0)
    for p in range(1, n_bands):
        bucket = bucket + plane_bit(p)
    keyed = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), bucket.alias("bucket")
    )
    left, right = keyed.alias("l"), keyed.alias("r")
    pairs = left.join(
        right,
        on=[F.col("l.bucket") == F.col("r.bucket"), F.col("l.id") < F.col("r.id")],
    ).select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        F.round(cosine_sim(F.col("l.v"), F.col("r.v")), 6).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)
