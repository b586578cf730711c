"""Measured banded-LSH recall curve vs the analytic 1-(1-J^r)^b
(r10 — VERDICT r9 "Next round #2" / "What's wrong #3").

Why this artifact exists: the r9 round found a degenerate MinHash
family that had shipped oracle-green for seven rounds — the DuckDB
oracle replays the SAME hash expressions, so quality collapse in an
approximate operator is invisible to exact-replay gates. The r9 fix
added a statistical anti-degeneration pin on the hash family itself
(tests/test_hashing.py); this module measures the END-TO-END banding
property the family exists for: candidate recall as a function of
true Jaccard, compared pointwise to the analytic S-curve
``p(J) = 1 - (1 - J^r)^b`` (r = k/bands rows per band; Broder 1997 /
Leskovec-Rajaraman-Ullman ch. 3). A future family regression — or a
banding bug that silently degrades recall toward plain ``J`` — now
fails a measured pin, not a code-reading exercise.

Construction: pairs with EXACT planted Jaccard. With ``n_shingle=1``
the shingle set IS the distinct-token set, so a pair built from
``m`` shared + ``a`` + ``b`` unique tokens has true
``J = m / (m + a + b)`` by construction. Tokens are namespaced per
pair (``p<i>t<j>``), so cross-pair token collisions cannot distort
the planted truth. The measured statistic is BANDING recall: the
fraction of planted pairs that survive ``minhash_lsh_candidates``
(the verify stage would then score them exactly — its correctness is
oracle-gated separately).

Statistics: each J point is ``pairs_per_point`` independent
Bernoulli trials (disjoint token namespaces -> independent
signatures), so measured recall has std err sqrt(p(1-p)/N); the
callers assert |measured - analytic| within a few sigma plus a small
allowance for the Carter-Wegman family's measured bias (~0.01).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def planted_pair_docs(
    spark: SparkSession, j_grid: list[float], pairs_per_point: int,
    union_size: int = 40
):
    """(docs_df, truth) — docs with ``pairs_per_point`` planted pairs
    per J point; truth maps (id_lo, id_hi) -> exact planted J. Pair
    p gets ids (2p, 2p+1)."""
    rows, truth = [], {}
    pair_no = 0
    for j in j_grid:
        m = round(j * union_size)
        uniq = union_size - m
        a = uniq // 2
        b = uniq - a
        exact_j = m / union_size
        for _ in range(pairs_per_point):
            shared = [f"p{pair_no}s{t}" for t in range(m)]
            ta = shared + [f"p{pair_no}a{t}" for t in range(a)]
            tb = shared + [f"p{pair_no}b{t}" for t in range(b)]
            ia, ib = 2 * pair_no, 2 * pair_no + 1
            rows.append((ia, " ".join(ta)))
            rows.append((ib, " ".join(tb)))
            truth[(ia, ib)] = exact_j
            pair_no += 1
    return spark.createDataFrame(rows, "doc_id long, text string"), truth


def measure_banded_recall(
    spark: SparkSession,
    j_grid: list[float] | None = None,
    pairs_per_point: int = 200,
    k: int = 16,
    bands: int = 4,
    union_size: int = 40,
) -> list[dict]:
    """One row per J point: planted J, measured banding recall,
    analytic 1-(1-J^r)^b, binomial std err, and the plain-J collapse
    value the r2-r8 degeneracy would have produced."""
    from etl_macropulse_br_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    if j_grid is None:
        j_grid = [0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95]
    docs, truth = planted_pair_docs(
        spark, j_grid, pairs_per_point, union_size
    )
    cands = minhash_lsh_candidates(
        docs, n_shingle=1, k=k, bands=bands
    )
    got = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in cands.select("id_a", "id_b").collect()
    }
    r = k // bands
    out = []
    for j in sorted(set(truth.values())):
        pairs = [p for p, tj in truth.items() if tj == j]
        hit = sum(1 for p in pairs if p in got)
        n = len(pairs)
        recall = hit / n
        analytic = 1.0 - (1.0 - j**r) ** bands
        out.append(
            {
                "j": round(j, 4),
                "n_pairs": n,
                "measured_recall": round(recall, 4),
                "analytic_recall": round(analytic, 4),
                "plain_j_collapse": round(j, 4),
                "stderr": round(
                    (analytic * (1 - analytic) / n) ** 0.5, 4
                ),
            }
        )
    return out


def planted_cosine_pairs(
    spark: SparkSession,
    cos_grid: list[float],
    pairs_per_point: int,
    dim: int = 64,
):
    """(vectors_df, truth) — pairs with EXACT planted cosine: pair i
    lives in its own deterministic 2D subspace (two string-seeded
    Gaussian directions, Gram-Schmidt-orthonormalized, so the
    subspace is DENSE across all ``dim`` coordinates — a coordinate
    plane would collapse the ±1 hyperplane projections to 4
    diagonals and wreck the per-plane independence the analytic
    curve assumes); u at phase φ_i, w at φ_i + θ, so
    cos(u, w) = cos θ exactly. Phases spread by the golden ratio.
    Pair p gets ids (2p, 2p+1)."""
    import math
    import random

    rows, truth = [], {}
    pair_no = 0
    golden = (5**0.5 - 1) / 2
    for c in cos_grid:
        theta = math.acos(c)
        for _ in range(pairs_per_point):
            rng = random.Random(f"srp-pair:{pair_no}")
            g1 = [rng.gauss(0, 1) for _ in range(dim)]
            g2 = [rng.gauss(0, 1) for _ in range(dim)]
            n1 = sum(x * x for x in g1) ** 0.5
            e1 = [x / n1 for x in g1]
            d12 = sum(a * b for a, b in zip(g2, e1))
            o2 = [b - d12 * a for a, b in zip(e1, g2)]
            n2 = sum(x * x for x in o2) ** 0.5
            e2 = [x / n2 for x in o2]
            phi = 2 * math.pi * ((pair_no * golden) % 1.0)
            u = [
                math.cos(phi) * a + math.sin(phi) * b
                for a, b in zip(e1, e2)
            ]
            w = [
                math.cos(phi + theta) * a + math.sin(phi + theta) * b
                for a, b in zip(e1, e2)
            ]
            ia, ib = 2 * pair_no, 2 * pair_no + 1
            rows.append((ia, [float(x) for x in u]))
            rows.append((ib, [float(x) for x in w]))
            truth[(ia, ib)] = c
            pair_no += 1
    return (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ),
        truth,
    )


def measure_srp_banded_recall(
    spark: SparkSession,
    cos_grid: list[float] | None = None,
    pairs_per_point: int = 200,
    n_bands: int = 3,
    n_planes: int = 8,
    dim: int = 64,
) -> list[dict]:
    """SRP analog of :func:`measure_banded_recall`: banding recall
    of planted exact-cosine pairs vs the analytic
    ``1 - (1 - (1 - θ/π)^p)^b`` (Charikar 2002 per-hyperplane
    agreement, OR-of-ANDs banding) at the shipped
    ``embedding_near_dups`` defaults (p=8 planes/band, b=3
    bands)."""
    import math

    from etl_macropulse_br_spark.operators.dedup import srp_banded

    if cos_grid is None:
        cos_grid = [0.5, 0.7, 0.8, 0.9, 0.95, 0.99]
    vecs, truth = planted_cosine_pairs(
        spark, cos_grid, pairs_per_point, dim
    )
    buckets: dict[int, set] = {}
    for r in srp_banded(
        vecs, "embedding", "vec_id", n_bands, n_planes, dim
    ).collect():
        buckets.setdefault(r["id"], set()).add((r["band"], r["bucket"]))
    out = []
    for c in cos_grid:
        pairs = [p for p, pc in truth.items() if pc == c]
        hit = sum(
            1
            for (a, b) in pairs
            if buckets.get(a, set()) & buckets.get(b, set())
        )
        n = len(pairs)
        recall = hit / n
        p_plane = 1.0 - math.acos(c) / math.pi
        analytic = 1.0 - (1.0 - p_plane**n_planes) ** n_bands
        out.append(
            {
                "cos": round(c, 4),
                "n_pairs": n,
                "measured_recall": round(recall, 4),
                "analytic_recall": round(analytic, 4),
                "stderr": round(
                    (analytic * (1 - analytic) / n) ** 0.5, 4
                ),
            }
        )
    return out


def main() -> None:
    from etl_macropulse_br_spark.session import get_spark

    spark = get_spark(app_name="recall_curve", profile="cluster")
    rows = measure_banded_recall(spark)
    print(f"{'J':>6s} {'measured':>9s} {'analytic':>9s} {'stderr':>7s}")
    for r in rows:
        print(
            f"{r['j']:6.2f} {r['measured_recall']:9.4f}"
            f" {r['analytic_recall']:9.4f} {r['stderr']:7.4f}"
        )
    srp = measure_srp_banded_recall(spark)
    print(f"{'cos':>6s} {'measured':>9s} {'analytic':>9s} {'stderr':>7s}")
    for r in srp:
        print(
            f"{r['cos']:6.2f} {r['measured_recall']:9.4f}"
            f" {r['analytic_recall']:9.4f} {r['stderr']:7.4f}"
        )
    print(
        json.dumps(
            {"banded_recall_curve": rows, "srp_recall_curve": srp}
        )
    )


if __name__ == "__main__":
    main()
