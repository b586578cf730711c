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
        [--save-index DIR | --index-dir DIR]

Modes: pq = flat IVF-PQ-ADC re-ranking (default), ivfadc =
residual-encoded IVFADC, ivf = coarse-only IVF with exact cosine.
--filter applies PRE-filter semantics (exact top-k among matching
docs; the index stays full-corpus).

Persisted-index serving (r8): ``--save-index DIR`` trains the index
ONCE, persists it (operators/ann_index.py parquet layout), and
serves from the just-written artifacts; ``--index-dir DIR`` loads a
previously saved index and serves WITHOUT retraining — the daily
train-once/serve-many loop. With an index, --mode must agree with
how the index was built (flat vs residual vs coarse-only); the
serve-time knobs (--query-ids/--topk/--filter) stay free.

``--append-batch B.parquet`` (with --index-dir) closes the
embeddings side of the daily-ingest loop: the batch's vectors are
encoded against the FROZEN centroids/codebooks
(operators/ann_index.py:append_ann_index — map-only, no retrain,
one atomically-committed segment), then the batch joins the served
corpus; batch vec_ids must be new to the index.

``--compact`` (r9, with --index-dir) rewrites the accumulated
append segments into one bounded-file-count segment before serving
(operators/ann_index.py:compact_ann_index) — run it every N daily
appends to keep the small-files count down. The manifest JSON also
reports ``adc_history`` (per-batch mean ADC residual): a rising
value on appends is the retrain-on-drift signal.
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
    ap.add_argument(
        "--save-index",
        default=None,
        help="train + persist the index here, then serve from it",
    )
    ap.add_argument(
        "--index-dir",
        default=None,
        help="serve from a previously saved index (no retraining)",
    )
    ap.add_argument(
        "--append-batch",
        default=None,
        help="parquet of NEW embeddings: encode against the frozen "
        "--index-dir index, append to it, serve over the union "
        "(ids must be new to the index)",
    )
    ap.add_argument(
        "--compact",
        action="store_true",
        help="compact accumulated append segments into one before "
        "serving (requires --index-dir)",
    )
    args = ap.parse_args()
    if args.compact and not args.index_dir:
        raise SystemExit("--compact requires --index-dir")
    if args.save_index and args.index_dir:
        raise SystemExit("--save-index and --index-dir are exclusive")
    if args.append_batch and not args.index_dir:
        raise SystemExit("--append-batch requires --index-dir")

    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.operators.ann_index import (
        append_ann_index,
        compact_ann_index,
        load_ann_index,
        save_ann_index,
    )
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

    index = None
    n_appended = 0
    if args.save_index:
        index = save_ann_index(
            emb,
            args.save_index,
            residual=(args.mode == "ivfadc"),
            with_pq=(args.mode != "ivf"),
        )
    elif args.index_dir:
        index = load_ann_index(spark, args.index_dir)
        # an index serves only in the mode it was built — fail loudly
        # rather than silently serving the wrong encoding; checked
        # BEFORE any append so a doomed invocation never mutates the
        # persisted state
        built = (
            "ivf"
            if not index.params.get("with_pq", True)
            else ("ivfadc" if index.residual else "pq")
        )
        if built != args.mode:
            raise SystemExit(
                f"--mode {args.mode} but index was built as {built}"
            )
        if args.append_batch:
            batch = spark.read.parquet(args.append_batch)
            index = append_ann_index(batch, args.index_dir)
            n_appended = batch.count()
            emb = emb.unionByName(batch, allowMissingColumns=True)
            queries = emb.filter(F.col("vec_id").isin(qids))
        if args.compact:
            index = compact_ann_index(spark, args.index_dir)

    if args.mode == "ivf":
        if flt is not None:
            raise SystemExit("--filter is a pq/ivfadc feature")
        res = ivf_kmeans_batch_topk(
            emb, queries, topk=args.topk, index=index
        )
    else:
        res = ivf_pq_batch_topk(
            emb,
            queries,
            topk=args.topk,
            residual=(args.mode == "ivfadc"),
            filter_expr=flt,
            index=index,
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
                "index_dir": args.index_dir or args.save_index,
                "index_trained": args.index_dir is None,
                "n_appended": n_appended,
                "n_queries": len(qids),
                "n_result_rows": n,
                "n_segments": (
                    len(index.manifest.get("segments", []))
                    if index is not None
                    else None
                ),
                "adc_history": (
                    index.adc_history if index is not None else None
                ),
                "top1": dict(sorted(top1.items())),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
