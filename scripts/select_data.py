"""Data-selection CLI: score every document against a target domain
with DSIR importance weights (Xie et al. 2023), importance-resample
k docs without replacement (Efraimidis-Spirakis, deterministic
md5-derived uniforms), and write the selected corpus — the
"tilt a web corpus toward a target domain" stage of a training-data
pipeline, composed from the oracle-gated operators.

One lazy plan end-to-end: the output parquet write is the only
action.

Usage:
    python scripts/select_data.py [--sf-dir DIR] [--out DIR]
        [--target-lang en] [--k 100]

Prints one JSON line: input/selected doc counts, weight range of
the selected set — the run manifest a scheduler would log.
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
    ap.add_argument("--target-lang", default="en")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument(
        "--profile", default="cluster", choices=["cluster", "small-input"]
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.operators.features import (
        weighted_sample_log2,
    )
    from etl_macropulse_br_spark.operators.text import dsir_log_weights
    from etl_macropulse_br_spark.plans.queries import _t
    from etl_macropulse_br_spark.session import get_spark

    spark = get_spark(app_name="select_data", profile=args.profile)
    docs = _t(spark, args.sf_dir, "documents")
    target = docs.filter(F.col("lang") == args.target_lang)
    # the weight stays in the log2 domain through selection — a long
    # strongly-out-of-domain doc (log2_weight < -1074) would underflow
    # pow(2, .) to 0.0 and fail the linear-domain sampler's guard
    weights = dsir_log_weights(docs, target).select(
        "doc_id", "log2_weight"
    )
    selected = (
        weighted_sample_log2(weights, "log2_weight", k=args.k)
        .join(docs, "doc_id")
        .select("doc_id", "lang", "source", "log2_weight", "text")
    )

    out_dir = args.out or os.path.join(os.getcwd(), "selected_corpus")
    selected.write.mode("overwrite").parquet(out_dir)

    back = spark.read.parquet(out_dir)
    stats = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("log2_weight").alias("w_min"),
        F.max("log2_weight").alias("w_max"),
        F.sum(
            F.when(F.col("lang") == args.target_lang, 1).otherwise(0)
        ).alias("n_target_lang"),
    ).collect()[0]
    n_input = docs.count()
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "out": out_dir,
                "target_lang": args.target_lang,
                "n_input_docs": n_input,
                "n_selected": stats["n"],
                "n_target_lang_selected": stats["n_target_lang"],
                # None-safe: an empty selection (k=0 / empty input)
                # reports nulls instead of crashing after the write
                "log2_weight_min": (
                    round(stats["w_min"], 4)
                    if stats["w_min"] is not None
                    else None
                ),
                "log2_weight_max": (
                    round(stats["w_max"], 4)
                    if stats["w_max"] is not None
                    else None
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
