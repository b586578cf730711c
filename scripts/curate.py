"""Corpus-curation CLI: run the full training-data pipeline
(``plans/queries.docs_curated_full`` — quality gates, boilerplate
coverage, exact dedup, CC near-dup survivors, benchmark
decontamination, model-score gate, train/val split, sliding
span-removal) over a documents table and write the curated corpus.

One lazy plan end-to-end: the output parquet write is the only
action, so Catalyst shares the token/shingle scans across gates
exactly as the oracle-gated query does.

Usage:
    python scripts/curate.py [--sf-dir DIR] [--out DIR]

Prints one JSON line: input/output doc counts, split sizes, span
tokens removed — the run manifest a pipeline scheduler would log.
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
    ap.add_argument(
        "--profile", default="cluster", choices=["cluster", "small-input"]
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.plans.queries import _t, docs_curated_full
    from etl_macropulse_br_spark.session import get_spark

    spark = get_spark(app_name="curate", profile=args.profile)
    curated = docs_curated_full(spark, args.sf_dir)

    out_dir = args.out or os.path.join(os.getcwd(), "curated_corpus")
    curated.write.mode("overwrite").parquet(out_dir)

    back = spark.read.parquet(out_dir)
    stats = back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
            "n_train"
        ),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("n_val"),
        F.sum("n_span_tokens_dropped").alias("span_tokens_removed"),
    ).collect()[0]
    n_input = _t(spark, args.sf_dir, "documents").count()
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "out": out_dir,
                "n_input_docs": n_input,
                "n_curated_docs": stats["n_docs"],
                "n_train": stats["n_train"],
                "n_val": stats["n_val"],
                "span_tokens_removed": int(stats["span_tokens_removed"] or 0),
            }
        )
    )
    from etl_macropulse_br_spark.operators.util import (
        unpersist_candidates,
    )

    unpersist_candidates()
    spark.stop()


if __name__ == "__main__":
    main()
