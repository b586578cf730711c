"""Seeded fuzz differential for the STREAMING surface (r10 — VERDICT
r9 "Next round #6").

``tools/fuzz_oracle.py`` walks the batch registry over adversarial
data; this tool points the same philosophy at the dimension where
streaming bugs hide: the MICRO-BATCH SLICING. Each check generates a
seed-deterministic corpus (documents with edge-case text, value
streams mixing nulls / zeros / float64-lossy 2^60-magnitude longs /
heavy tails, signed doubles straddling zero), splits it into a
RANDOM number of micro-batches at RANDOM cut points with RANDOM row
order, replays it through a stateful streaming twin, and pins the
result equal to the batch operator on the identical rows:

- ``sig_neardup_stream``  ≡ ``dedup.minhash_sig_near_dups``
- ``running_quantiles_stream`` ≡ ``sketches.hdr_quantiles_by``
- ``running_signed_quantiles_stream`` ≡ ``hdr_signed_quantiles_by``
- ``windowed_distinct_stream`` ≡ ``sketches.hll_distinct_by``
  (finals per closed window; a far-future sentinel closes every
  window, and the data span stays inside the watermark so no row
  can be legally dropped — any drop is a real bug)
- ``sessionize_stream`` ≡ batch ``F.session_window`` aggregation
  (random TIME-ORDERED slicings — arrival order inside the
  contract, cut points fuzzed; see ``_slices(keep_order=True)``)
- ``sessionize_stream`` under BOUNDED DISORDER (r11): per-row
  arrival jitter within the declared ``lateness`` knob, inside the
  provable stream≡batch regime (``check_sessions_disorder``
  docstring) — fuzzes backward merges + the lateness wiring
- ``text_dedup_stream`` ≡ batch keep-first (min_by (ts, id)) per
  distinct normalized text (r11; time-ordered slicings — the
  first-ARRIVAL contract)
- ``interval_join_streams`` ≡ the batch join with the identical
  interval predicate (r11; BOTH sides sliced and shuffled
  independently — an inner join inside the watermark is
  arrival-order-free)

Every operator CONTRACTS slicing-invariance (associative state
merges, orientation-normalized emissions), so exact equality is the
assertion — no tolerances. One round of each check also runs inside
the pytest gate (tests/test_fuzz_streaming_gate.py). Everything derives from the seed: a
failure reproduces with ``python tools/fuzz_streaming.py <seed>``
(the same seed-repro contract as fuzz_oracle).

Usage:
    python tools/fuzz_streaming.py [seed] [n_rows] [rounds] [provider]

``provider`` (e.g. ``rocksdb``) re-runs the whole matrix under that
state-store backend — the slicing fuzz then also exercises the
provider's state encoder.

Prints per-check OK/FAIL + one JSON summary line; exit 1 on FAIL.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tools.fuzz_oracle import gen_documents

BASE_TS = dt.datetime(2026, 6, 1, 8, 0, 0)


def _slices(
    rng: random.Random,
    rows: list,
    max_slices: int = 6,
    keep_order: bool = False,
) -> list[list]:
    """Random row order, random number of micro-batches, random cut
    points — the slicing dimension under test. ``keep_order`` skips
    the shuffle for operators whose stream≡batch contract assumes
    time-ordered arrival (sessionize: a late event predating an
    already-EMITTED session is the documented inherent limit of any
    emit-on-close stream, not a bug)."""
    rows = list(rows)
    if not keep_order:
        rng.shuffle(rows)
    n = len(rows)
    k = rng.randint(1, min(max_slices, n))
    cuts = sorted(rng.sample(range(1, n), k - 1)) if k > 1 else []
    parts, prev = [], 0
    for c in cuts + [n]:
        if rows[prev:c]:
            parts.append(rows[prev:c])
        prev = c
    return parts


def _run_stream(spark, schema, slices, build, tag: str,
                output_mode: str = "append"):
    """Write each slice as one parquet file, replay with
    maxFilesPerTrigger=1, collect the memory sink."""
    d = tempfile.mkdtemp(prefix=f"fuzz_stream_{tag}_")
    src = os.path.join(d, "src")
    for i, rows in enumerate(slices):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(f"fuzz_{tag}")
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(d, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"select * from fuzz_{tag}").collect()


def check_sig_neardup(spark, rng: random.Random, n_rows: int, tag: str):
    from etl_macropulse_br_spark.operators.dedup import (
        minhash_sig_near_dups,
    )
    from etl_macropulse_br_spark.streaming.neardup import (
        sig_neardup_stream,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    docs = [
        (i, t) for (i, t, *_rest) in gen_documents(rng.randrange(1 << 30), n_rows)
    ]
    rows = _run_stream(
        spark,
        schema,
        _slices(rng, docs),
        lambda s: sig_neardup_stream(s, threshold=0.5),
        tag,
    )
    got = {
        (r["new_id"], r["match_id"]): r["jaccard"]
        for r in rows
        if r["match_id"] is not None
    }
    flags = [r for r in rows if r["match_id"] is None]
    batch = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_sig_near_dups(
            spark.createDataFrame(docs, schema), threshold=0.5
        ).collect()
    }
    assert not flags, f"lateness flags without horizon mode: {flags[:3]}"
    assert got == batch, (
        f"stream != batch: only-stream={set(got) - set(batch)} "
        f"only-batch={set(batch) - set(got)} "
        f"diff={[k for k in got if k in batch and got[k] != batch[k]][:5]}"
    )
    return len(batch)


def _gen_values(rng: random.Random, n: int):
    groups = ["click", "view", "purchase"]
    rows = []
    for i in range(n):
        g = groups[i % 3]
        r = rng.random()
        if r < 0.05:
            v = None
        elif r < 0.15:
            v = rng.choice(
                [
                    0,
                    1,
                    (1 << 60) + rng.randint(1, 8) * (1 << 54) - 1,
                    (1 << 53) + rng.randint(0, 100),
                ]
            )
        else:
            v = int(rng.lognormvariate(8, 2))
        rows.append((g, v))
    return rows


def check_quantiles(spark, rng: random.Random, n_rows: int, tag: str):
    from etl_macropulse_br_spark.operators.sketches import (
        hdr_quantiles_by,
    )
    from etl_macropulse_br_spark.streaming.quantiles import (
        running_quantiles_stream,
    )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    qs, s = (0.5, 0.9, 0.99), 6
    data = _gen_values(rng, n_rows)
    rows = _run_stream(
        spark,
        schema,
        _slices(rng, data),
        lambda st: running_quantiles_stream(st, "event_type", "v", qs, s),
        tag,
        output_mode="update",
    )
    final = {}
    for r in rows:
        k = (r["group_key"], r["q"])
        if k not in final or r["n"] > final[k]["n"]:
            final[k] = r
    batch = {
        (r["event_type"], r["q"]): r
        for r in hdr_quantiles_by(
            spark.createDataFrame(data, schema), "v", ["event_type"], qs, s
        ).collect()
    }
    assert set(final) == set(batch), (set(final) ^ set(batch))
    for k, fr in final.items():
        for c in ("rank", "n", "lo", "hi", "est"):
            assert fr[c] == batch[k][c], (k, c, fr[c], batch[k][c])
    return len(batch)


def check_signed_quantiles(spark, rng: random.Random, n_rows: int, tag: str):
    from etl_macropulse_br_spark.operators.sketches import (
        hdr_signed_quantiles_by,
    )
    from etl_macropulse_br_spark.streaming.quantiles import (
        running_signed_quantiles_stream,
    )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    qs, scale, s = (0.1, 0.5, 0.9), 1000.0, 6
    groups = ["score", "loss", "delta"]
    data = []
    for i in range(n_rows):
        g = groups[i % 3]
        r = rng.random()
        if r < 0.05:
            v = None
        elif r < 0.1:
            v = rng.choice([0.0, -0.001, 0.001, -123456.789])
        else:
            v = rng.gauss(0, 1000.0)
        data.append((g, v))
    rows = _run_stream(
        spark,
        schema,
        _slices(rng, data),
        lambda st: running_signed_quantiles_stream(
            st, "event_type", "v", qs, scale, s
        ),
        tag,
        output_mode="update",
    )
    final = {}
    for r in rows:
        k = (r["group_key"], r["q"])
        if k not in final or r["n"] > final[k]["n"]:
            final[k] = r
    batch = {
        (r["event_type"], r["q"]): r
        for r in hdr_signed_quantiles_by(
            spark.createDataFrame(data, schema),
            "v",
            ["event_type"],
            qs,
            scale,
            s,
        ).collect()
    }
    assert set(final) == set(batch), (set(final) ^ set(batch))
    for k, fr in final.items():
        for c in ("rank", "n", "lo", "hi", "est"):
            assert fr[c] == batch[k][c], (k, c, fr[c], batch[k][c])
    return len(batch)


def check_windowed_distinct(spark, rng: random.Random, n_rows: int, tag: str):
    from etl_macropulse_br_spark.operators.sketches import hll_distinct_by
    from etl_macropulse_br_spark.streaming.windowed_distinct import (
        windowed_distinct_stream,
    )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    groups = ["click", "view"]
    # data span (4 h) << watermark (12 h): no arrival order can make
    # a row watermark-late, so the batch twin is the exact truth;
    # ~5% NULL ts rows exercise the r10 in-plan drop (an undated
    # event belongs to no window) — excluded from the batch truth
    data = [
        (
            groups[i % 2],
            rng.randrange(0, max(2, n_rows // 4)),
            None
            if rng.random() < 0.05
            else BASE_TS + dt.timedelta(minutes=rng.randrange(0, 240)),
        )
        for i in range(n_rows)
    ]
    slices = _slices(rng, data)
    # far-future sentinel strictly LAST: pushes the watermark past
    # every real window end so all finals fire under availableNow
    slices.append([("zzz_sentinel", 0, BASE_TS + dt.timedelta(days=30))])
    rows = _run_stream(
        spark,
        schema,
        slices,
        lambda st: windowed_distinct_stream(
            st, "event_type", "user_id",
            window_s=3600, watermark="12 hours", b=8,
        ),
        tag,
    )
    finals = {
        (r["group_key"], r["window_start"]): r
        for r in rows
        if r["group_key"] != "zzz_sentinel"
    }
    assert len(finals) == sum(
        1 for r in rows if r["group_key"] != "zzz_sentinel"
    ), "duplicate finals for a (group, window)"
    win_us = 3600 * 1_000_000
    wstart = F.timestamp_micros(
        (F.floor(F.unix_micros("ts") / F.lit(win_us)) * F.lit(win_us))
        .cast("long")
    )
    batch = {
        (r["event_type"], r["window_start"]): r
        for r in hll_distinct_by(
            spark.createDataFrame(data, schema)
            .filter(F.col("ts").isNotNull())
            .withColumn("window_start", wstart),
            "user_id",
            ["event_type", "window_start"],
            b=8,
        ).collect()
    }
    assert set(finals) == set(batch), (set(finals) ^ set(batch))
    for k, fr in finals.items():
        br = batch[k]
        assert fr["est_distinct"] == br["est_distinct"], k
        assert fr["n_present_registers"] == br["n_present_registers"], k
    return len(batch)


def check_sessions(spark, rng: random.Random, n_rows: int, tag: str):
    """Sessionize under random TIME-ORDERED slicings: per-user event
    walks mixing sub-gap / super-gap / exact-boundary deltas (the
    merge rule's hard cases), split at random cut points with order
    preserved; per-user far-future sentinels (strictly last) close
    every real session. Streamed closed sessions must equal the
    batch F.session_window aggregation row-for-row."""
    from etl_macropulse_br_spark.streaming.sessions import (
        sessionize_stream,
    )

    gap_s = 1800
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    n_users = 6
    rows = []
    for user in range(1, n_users + 1):
        t = BASE_TS + dt.timedelta(minutes=rng.randint(0, 120))
        for _ in range(max(4, n_rows // n_users)):
            delta = rng.choice([1, 60, 600, 1799, 1800, 1801, 4000])
            t = t + dt.timedelta(seconds=delta)
            rows.append((user, t))
    real = sorted(rows, key=lambda r: r[1])
    sentinel = real[-1][1] + dt.timedelta(days=30)
    slices = _slices(rng, real, keep_order=True)
    slices.append([(u, sentinel) for u in range(1, n_users + 1)])
    out = _run_stream(
        spark,
        schema,
        slices,
        lambda s: sessionize_stream(s, gap_s=gap_s),
        tag,
    )
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in out
    }
    batch = {
        (r["user_id"], r["start"], r["last_ts"], r["n_events"])
        for r in spark.createDataFrame(real, schema)
        .groupBy("user_id", F.session_window("ts", f"{gap_s} seconds"))
        .agg(
            F.min("ts").alias("start"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert streamed == batch, (
        f"only-stream={sorted(streamed - batch)[:3]} "
        f"only-batch={sorted(batch - streamed)[:3]}"
    )
    return len(batch)


def check_sessions_disorder(
    spark, rng: random.Random, n_rows: int, tag: str
):
    """r11 (VERDICT r10 Next round #5): sessionize under BOUNDED
    OUT-OF-ORDER arrival within the declared ``lateness`` knob —
    the dimension the time-ordered check cannot see (backward
    merges, late extends, bridging merges, the lateness-vs-gap
    interaction), on top of the random cut points.

    Disorder model: arrival order = event time + per-row jitter
    drawn from [0, lateness). Stream ≡ batch here because no event
    is ever watermark-dropped: when t arrives, every earlier arrival
    t_a has t_a < t + lateness, so the watermark (max seen −
    lateness) stays strictly below t — and the r12 operator emits
    only WATERMARK-FINAL sessions, so every admissible event reaches
    the interval it belongs to before that interval can emit. The
    r11 emit-on-close operator FAILED this check on seed 31 (its
    claimed proof missed the intra-session leapfrog: consecutive
    deltas d1 + d2 > gap with the d2 event arriving first force-
    closed the left session before the bridging d1 event landed);
    the seed-31 shape is now also pinned deterministically in
    tests/test_streaming_sessions.py."""
    from etl_macropulse_br_spark.streaming.sessions import (
        sessionize_stream,
    )

    gap_s = 1800
    late_s = 1800  # = gap: the widest provable-equality lateness
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    n_users = 6
    rows = []
    for user in range(1, n_users + 1):
        t = BASE_TS + dt.timedelta(minutes=rng.randint(0, 120))
        for _ in range(max(4, n_rows // n_users)):
            # <= gap continues (incl. the exact 1800 boundary);
            # > gap + lateness (3600) starts a new session
            delta = rng.choice([1, 60, 600, 1799, 1800, 3700, 7200])
            t = t + dt.timedelta(seconds=delta)
            rows.append((user, t))
    arrival = sorted(
        rows,
        key=lambda r: r[1]
        + dt.timedelta(seconds=rng.uniform(0, late_s * 0.999)),
    )
    sentinel = max(r[1] for r in rows) + dt.timedelta(days=30)
    slices = _slices(rng, arrival, keep_order=True)
    slices.append([(u, sentinel) for u in range(1, n_users + 1)])
    out = _run_stream(
        spark,
        schema,
        slices,
        lambda s: sessionize_stream(
            s, gap_s=gap_s, lateness=f"{late_s} seconds"
        ),
        tag,
    )
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in out
    }
    batch = {
        (r["user_id"], r["start"], r["last_ts"], r["n_events"])
        for r in spark.createDataFrame(rows, schema)
        .groupBy("user_id", F.session_window("ts", f"{gap_s} seconds"))
        .agg(
            F.min("ts").alias("start"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert streamed == batch, (
        f"only-stream={sorted(streamed - batch)[:3]} "
        f"only-batch={sorted(batch - streamed)[:3]}"
    )
    return len(batch)


def check_running_distinct(spark, rng: random.Random, n_rows: int, tag: str):
    """Running per-group HLL distinct under random slicings: the
    register OR-merge is order-free, so each group's final row (max
    n_rows) must equal the batch ``hll_distinct_by`` bit-for-bit —
    including est, register counts, and the string rendering of
    mixed-type values (nulls skipped on both sides)."""
    from etl_macropulse_br_spark.operators.sketches import hll_distinct_by
    from etl_macropulse_br_spark.streaming.distinct import (
        running_distinct_stream,
    )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    groups = ["click", "view", "purchase"]
    data = [
        (
            groups[i % 3],
            None
            if rng.random() < 0.05
            else rng.randrange(0, max(2, n_rows // 2)),
        )
        for i in range(n_rows)
    ]
    rows = _run_stream(
        spark,
        schema,
        _slices(rng, data),
        lambda st: running_distinct_stream(st, "event_type", "user_id"),
        tag,
        output_mode="update",
    )
    final = {}
    for r in rows:
        k = r["group_key"]
        if k not in final or r["n_rows"] > final[k]["n_rows"]:
            final[k] = r
    batch = {
        r["event_type"]: r
        for r in hll_distinct_by(
            spark.createDataFrame(data, schema),
            "user_id",
            ["event_type"],
            b=8,
        ).collect()
    }
    assert set(final) == set(batch), (set(final) ^ set(batch))
    for k, fr in final.items():
        br = batch[k]
        assert fr["est_distinct"] == br["est_distinct"], k
        assert fr["n_present_registers"] == br["n_present_registers"], k
    return len(batch)


def check_text_dedup(spark, rng: random.Random, n_rows: int, tag: str):
    """r11: watermarked exact-text dedup under random TIME-ORDERED
    slicings — first arrival per distinct normalized text wins
    (dropDuplicatesWithinWatermark state). Every ts is unique and
    the corpus span stays far inside the watermark horizon, so the
    batch truth is exact: per text_hash, the row with the minimum
    (ts, id). gen_documents plants real duplicate/near-duplicate
    texts, so collisions are guaranteed."""
    from etl_macropulse_br_spark.functions.hashing import md5_long
    from etl_macropulse_br_spark.operators.dedup import _norm_text
    from etl_macropulse_br_spark.streaming.dedup import (
        text_dedup_stream,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    docs = [
        (i, t, BASE_TS + dt.timedelta(seconds=i))
        for (i, t, *_r) in gen_documents(rng.randrange(1 << 30), n_rows)
    ]
    # arrival = ts order (the keep-first contract); cut points fuzzed
    rows = _run_stream(
        spark,
        schema,
        _slices(rng, docs, keep_order=True),
        lambda s: text_dedup_stream(s, delay_s=7 * 86400),
        tag,
    )
    got = {(r["text_hash"], r["doc_id"]) for r in rows}
    assert len(got) == len(rows), "duplicate emissions per text_hash"
    batch = {
        (r["text_hash"], r["doc_id"])
        for r in spark.createDataFrame(docs, schema)
        .select(md5_long(_norm_text("text")).alias("text_hash"),
                "doc_id", "ts")
        .groupBy("text_hash")
        .agg(F.min_by("doc_id", F.struct("ts", "doc_id")).alias("doc_id"))
        .collect()
    }
    assert got == batch, (
        f"only-stream={sorted(got - batch)[:3]} "
        f"only-batch={sorted(batch - got)[:3]}"
    )
    return len(batch)


def check_interval_join(spark, rng: random.Random, n_rows: int, tag: str):
    """r11: stream-stream interval join under INDEPENDENT random
    slicings of both sides (arrival order fully shuffled on each —
    an inner join's state holds every row within watermark+interval,
    and the corpus span stays far inside the watermark, so NO
    arrival order can lose a pair). Truth = the batch join with the
    identical interval predicate."""
    import tempfile

    from etl_macropulse_br_spark.streaming.joins import (
        interval_join_streams,
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
        ]
    )
    n_users = 5
    span_min = 120  # << the 1-day watermark below
    left = [
        (
            rng.randrange(1, n_users + 1),
            BASE_TS + dt.timedelta(minutes=rng.randrange(0, span_min)),
            i,
        )
        for i in range(n_rows // 2)
    ]
    right = [
        (
            rng.randrange(1, n_users + 1),
            BASE_TS + dt.timedelta(minutes=rng.randrange(0, span_min)),
            1000 + i,
        )
        for i in range(n_rows // 2)
    ]
    before_s, after_s = 300, 600

    d = tempfile.mkdtemp(prefix=f"fuzz_stream_{tag}_")
    srcs = {}
    for name, rows in (("l", left), ("r", right)):
        src = os.path.join(d, name)
        for i, sl in enumerate(_slices(rng, rows)):
            spark.createDataFrame(sl, schema).coalesce(1).write.mode(
                "append" if i else "overwrite"
            ).parquet(src)
        srcs[name] = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
    q = (
        interval_join_streams(
            srcs["l"], srcs["r"], on="user_id", left_ts="ts",
            right_ts="ts", before_s=before_s, after_s=after_s,
            watermark_s=86400,
        )
        .writeStream.format("memory")
        .queryName(f"fuzz_{tag}")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(d, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["v"], r["r_v"])
        for r in spark.sql(f"select * from fuzz_{tag}").collect()
    }
    ldf = spark.createDataFrame(left, schema)
    rdf = spark.createDataFrame(right, schema).select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("v").alias("r_v"),
    )
    batch = {
        (r["user_id"], r["v"], r["r_v"])
        for r in ldf.join(
            rdf,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("r_ts")
               >= F.col("ts") - F.expr(f"INTERVAL {before_s} SECONDS"))
            & (F.col("r_ts")
               <= F.col("ts") + F.expr(f"INTERVAL {after_s} SECONDS")),
        ).collect()
    }
    assert got == batch, (
        f"only-stream={sorted(got - batch)[:3]} "
        f"only-batch={sorted(batch - got)[:3]} "
        f"n_stream={len(got)} n_batch={len(batch)}"
    )
    return len(batch)


def check_monthly_gold(spark, rng: random.Random, n_rows: int, tag: str):
    """r11: the medallion gold stream (watermarked dedup +
    calendar-month aggregate, COMPLETE mode) under fully shuffled
    random slicings. Exactness regime: planted duplicates are
    IDENTICAL rows (the true-redelivery shape — a differing-value
    dupe's survivor is arrival-order-dependent by design), and the
    date span (30 days) stays inside the 35-day watermark so no row
    is ever watermark-late. Truth = the batch gold (stable_mean +
    last_by) over the DISTINCT silver rows; complete mode means the
    memory sink holds exactly the latest full table."""
    from etl_macropulse_br_spark.functions.exprs import (
        last_by,
        stable_mean,
    )
    from etl_macropulse_br_spark.sources.rest import BCB_SILVER_SCHEMA
    from etl_macropulse_br_spark.streaming.monthly import (
        streaming_gold_bcb_monthly,
    )

    base_day = dt.date(2026, 6, 15)  # span crosses a month boundary
    rows = []
    for i in range(n_rows):
        sid = 11 + (i % 3)
        day = rng.randrange(0, 30)
        # value is a FUNCTION of the dedup key (series_id, date), so
        # any two rows sharing the key are bit-identical — the
        # streaming dedup (one survivor) and the batch .distinct()
        # (also one row) then agree by construction; independent
        # values on a colliding key would make the two sides keep
        # different multiplicities and the fuzz would test the
        # GENERATOR, not the operator
        v = round(((sid * 31 + day * 7) % 199) / 3.0 - 30.0, 2)
        rows.append(
            (sid, f"serie_{sid}", base_day + dt.timedelta(days=day), v)
        )
    # ~20% exact duplicate rows: redeliveries the dedup must collapse
    rows += [rows[rng.randrange(len(rows))] for _ in range(n_rows // 5)]

    out = _run_stream(
        spark,
        BCB_SILVER_SCHEMA,
        _slices(rng, rows),
        streaming_gold_bcb_monthly,
        tag,
        output_mode="complete",
    )
    got = {
        (r["series_id"], r["series_name"], r["month"]):
            (r["avg_value"], r["last_value"])
        for r in out
    }
    assert len(got) == len(out), "complete snapshot has dup groups"
    batch = {
        (r["series_id"], r["series_name"], r["month"]):
            (r["avg_value"], r["last_value"])
        for r in spark.createDataFrame(rows, BCB_SILVER_SCHEMA)
        .distinct()
        .withColumn("month", F.date_trunc("month", F.col("date").cast("timestamp")))
        .groupBy("series_id", "series_name", "month")
        .agg(
            stable_mean("value").alias("avg_value"),
            last_by("value", "date", "value").alias("last_value"),
        )
        .collect()
    }
    assert got == batch, (
        f"only-stream={sorted(set(got) - set(batch))[:3]} "
        f"only-batch={sorted(set(batch) - set(got))[:3]} "
        f"diff={[k for k in got if k in batch and got[k] != batch[k]][:3]}"
    )
    return len(batch)


CHECKS = {
    "sig_neardup": check_sig_neardup,
    "quantiles": check_quantiles,
    "quantiles_signed": check_signed_quantiles,
    "windowed_distinct": check_windowed_distinct,
    "sessions": check_sessions,
    "sessions_disorder": check_sessions_disorder,
    "running_distinct": check_running_distinct,
    "text_dedup": check_text_dedup,
    "interval_join": check_interval_join,
    "monthly_gold": check_monthly_gold,
}


def run(seed: int, n_rows: int, rounds: int, provider: str | None = None):
    """``provider`` (e.g. "rocksdb") runs every check under that
    state-store backend via the scoped context manager — the same
    random slicings then fuzz the RocksDB state ENCODER too (long
    arrays, nullable longs, binary register blobs)."""
    from contextlib import nullcontext

    from etl_macropulse_br_spark.session import get_spark
    from etl_macropulse_br_spark.streaming.state_store import state_store

    spark = get_spark(app_name=f"fuzz_streaming_{seed}")
    scope = (
        (lambda: state_store(spark, provider))
        if provider
        else nullcontext
    )
    passed, failed = [], []
    for rnd in range(rounds):
        for name, fn in CHECKS.items():
            tag = f"{name}_{seed}_{rnd}" + (f"_{provider}" if provider else "")
            # string seeding hashes via sha512 — deterministic
            # across processes (tuple hashing is NOT, under str
            # hash randomization), preserving the seed-repro contract
            rng = random.Random(f"{seed}:{rnd}:{name}")
            try:
                with scope():
                    n = fn(spark, rng, n_rows, tag)
                passed.append(tag)
                print(f"{tag:40s} OK    ({n} batch rows)")
            except Exception as e:  # engine errors are failures too
                failed.append(tag)
                print(f"{tag:40s} FAIL  {type(e).__name__}: {str(e)[:200]}")
    return passed, failed


def main() -> None:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    provider = sys.argv[4] if len(sys.argv) > 4 else None
    passed, failed = run(seed, n_rows, rounds, provider)
    print(
        json.dumps(
            {
                "seed": seed,
                "n_rows": n_rows,
                "rounds": rounds,
                "provider": provider,
                "passed": len(passed),
                "failed": failed,
            }
        )
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
