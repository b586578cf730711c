"""Corpus health report CLI: the one-page JSON a training-data
pipeline logs per corpus snapshot before spending GPU-hours on it —
composed entirely from the repo's oracle-gated operators, evaluated
as a handful of tiny-result aggregates over (at scale) one or two
corpus passes:

- volume: doc/token/char totals,
- duplication: exact-distinct-text estimate via the portable
  HyperLogLog sketch (operators/sketches.hll_distinct — 2^b
  registers however big the corpus) → estimated dup rate,
- language mix: per-lang shares (operators/text.language_id marker heuristic),
- quality: corpus means of the Gopher-style quality features
  (quality_features),
- probe-token frequencies via the Count-Min sketch
  (cms_point_estimates — d*w counters, not a vocabulary groupBy),
- doc-length (whitespace-token) percentiles via the HDR quantile
  sketch (r8: one-pass mergeable bucket counts, never a sort),
- vocabulary overlap between the two largest sources via KMV set
  algebra (r8: estimated vocab sizes, shared-vocab count, Jaccard
  — the corpus-drift / source-redundancy signal, from two bottom-k
  sketches instead of a vocabulary-sized join).

Usage:
    python scripts/corpus_report.py [--sf-dir DIR]
        [--probe-tokens spark,table,merge]

Prints ONE JSON line.
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
    ap.add_argument(
        "--probe-tokens", default="spark,table,merge,the"
    )
    ap.add_argument(
        "--profile", default="cluster", choices=["cluster", "small-input"]
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.operators.sketches import (
        cms_point_estimates,
        hdr_quantiles,
        hll_distinct,
        kmv_set_ops,
    )
    from etl_macropulse_br_spark.operators.text import (
        language_id,
        quality_features,
        token_count,
    )
    from etl_macropulse_br_spark.plans.queries import _t
    from etl_macropulse_br_spark.session import get_spark

    spark = get_spark(app_name="corpus_report", profile=args.profile)
    # the report runs ~8 independent actions over the corpus (volume,
    # HLL, lang mix, quality, CMS, HDR, top-sources, KMV overlap) —
    # persist the one input so they share a single corpus scan
    # instead of re-reading + re-projecting per action (r9 review
    # fix; the docstring's "one or two corpus passes" claim)
    docs = _t(spark, args.sf_dir, "documents").persist()

    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")

    vol = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        # r9 review fix: the dup-rate denominator counts docs WITH
        # text — hll_distinct drops nulls, so dividing by the
        # all-docs count reported every null-text doc as a duplicate
        F.count("text").alias("n_text_docs"),
        F.sum(token_count("text")).alias("n_tokens_ws"),
        F.sum(F.length("text")).alias("n_chars"),
    ).collect()[0]

    hll = hll_distinct(docs.select(norm.alias("t")), "t", b=10).collect()[0]
    est_distinct = hll["est_distinct"]
    dup_rate = (
        max(0.0, 1.0 - est_distinct / vol["n_text_docs"])
        if vol["n_text_docs"]
        else 0.0
    )

    langs = {
        r["pred_lang"]: r["n"]
        for r in language_id(docs)
        .groupBy("pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    q = (
        quality_features(docs)
        .agg(
            F.round(F.avg("word_count"), 2).alias("avg_words"),
            F.round(F.avg("uniq_word_ratio"), 4).alias("avg_uniq_ratio"),
            F.round(F.avg("punct_ratio"), 4).alias("avg_punct_ratio"),
            F.round(F.avg("stopword_ratio"), 4).alias("avg_stop_ratio"),
        )
        .collect()[0]
    )

    # probes normalized exactly like the corpus token stream (r9
    # review fix: 'Spark' would otherwise silently probe as 0 —
    # corpus tokens are lower(trim())-normalized)
    probes = [
        t.strip().lower() for t in args.probe_tokens.split(",") if t.strip()
    ]
    # the exploded token stream feeds CMS and the three KMV vocab
    # sketches — persist so the norm/split/explode runs once
    toks = docs.select(
        "source", F.explode(F.split(norm, r"\s+")).alias("tok")
    ).persist()
    freqs = {
        r["item"]: r["est_count"]
        for r in cms_point_estimates(toks, "tok", probes).collect()
    }

    # doc-length distribution: HDR quantile sketch over per-doc
    # whitespace-token counts (one pass, bucket-table state)
    len_q = {
        f"p{int(r['q'] * 100)}": {
            "lo": r["lo"], "hi": r["hi"], "est": r["est"]
        }
        for r in hdr_quantiles(
            docs.select(token_count("text").alias("n")),
            "n",
            (0.25, 0.5, 0.9, 0.99),
            s=6,
        ).collect()
    }

    # vocabulary overlap between the two largest sources: KMV set
    # algebra over their token streams — estimated vocab sizes,
    # shared-vocab estimate, Jaccard (source-redundancy / drift)
    top_sources = [
        r["source"]
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("source").asc())
        .limit(2)
        .collect()
    ]
    vocab_overlap = None
    if len(top_sources) == 2:
        sa, sb = top_sources
        ov = kmv_set_ops(
            toks.filter(F.col("source") == sa),
            toks.filter(F.col("source") == sb),
            "tok",
            k=256,
        ).collect()[0]
        vocab_overlap = {
            "source_a": sa,
            "source_b": sb,
            "est_vocab_a": round(ov["est_distinct_a"], 1),
            "est_vocab_b": round(ov["est_distinct_b"], 1),
            "est_shared_vocab": round(ov["est_intersection"], 1),
            "jaccard": round(ov["jaccard_kmv"], 4),
        }

    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "n_docs": vol["n_docs"],
                "n_tokens_ws": vol["n_tokens_ws"],
                "n_chars": vol["n_chars"],
                "est_distinct_texts": est_distinct,
                "est_dup_rate": round(dup_rate, 4),
                "lang_mix": dict(sorted(langs.items())),
                "quality_means": {
                    "avg_words": q["avg_words"],
                    "avg_uniq_ratio": q["avg_uniq_ratio"],
                    "avg_punct_ratio": q["avg_punct_ratio"],
                    "avg_stop_ratio": q["avg_stop_ratio"],
                },
                "probe_token_counts": freqs,
                "token_len_percentiles": len_q,
                "source_vocab_overlap": vocab_overlap,
            }
        )
    )
    toks.unpersist()
    docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
