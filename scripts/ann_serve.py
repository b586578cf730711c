"""Batch ANN serving CLI: answer a query SET against the embedding
corpus in one pass — train/index/probe/score/re-rank composed as one
lazy plan per batch (operators/clustering.py:ivf_pq_batch_topk /
ivf_kmeans_batch_topk), with optional metadata filtering. The
serving-side counterpart of scripts/select_data.py: parquet results
out, one JSON manifest line to stdout.

Usage:
    python scripts/ann_serve.py [--sf-dir DIR] [--out DIR]
        [--query-ids 0,1,2,3] [--topk 10]
        [--mode pq|ivfadc|ivf] [--filter "label % 2 = 0"]

Modes: pq = flat IVF-PQ-ADC re-ranking (default), ivfadc =
residual-encoded IVFADC, ivf = coarse-only IVF with exact cosine.
--filter applies PRE-filter semantics (exact top-k among matching
docs; the index stays full-corpus).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None, help="output parquet dir")
    ap.add_argument("--query-ids", default="0,1,2,3")
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--mode", default="pq", choices=["pq", "ivfadc", "ivf"])
    ap.add_argument("--filter", default=None, help="SQL predicate over the embeddings table")
    ap.add_argument(
        "--profile", default="cluster", choices=["cluster", "small-input"]
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.operators.clustering import (
        ivf_kmeans_batch_topk,
        ivf_pq_batch_topk,
    )
    from etl_macropulse_br_spark.plans.queries import _t
    from etl_macropulse_br_spark.session import get_spark

    spark = get_spark(app_name="ann_serve", profile=args.profile)
    emb = _t(spark, args.sf_dir, "embeddings")
    qids = [int(x) for x in args.query_ids.split(",") if x]
    queries = emb.filter(F.col("vec_id").isin(qids))
    flt = F.expr(args.filter) if args.filter else None

    if args.mode == "ivf":
        if flt is not None:
            raise SystemExit("--filter is a pq/ivfadc feature")
        res = ivf_kmeans_batch_topk(emb, queries, topk=args.topk)
    else:
        res = ivf_pq_batch_topk(
            emb,
            queries,
            topk=args.topk,
            residual=(args.mode == "ivfadc"),
            filter_expr=flt,
        )

    out_dir = args.out or os.path.join(os.getcwd(), "ann_results")
    res.write.mode("overwrite").parquet(out_dir)

    back = spark.read.parquet(out_dir)
    top1 = {
        str(r["query_id"]): [r["vec_id"], round(r["cosine"], 6)]
        for r in back.filter(F.col("rank") == 1).collect()
    }
    n = back.count()
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "out": out_dir,
                "mode": args.mode,
                "filter": args.filter,
                "n_queries": len(qids),
                "n_result_rows": n,
                "top1": dict(sorted(top1.items())),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
