"""Stateful streaming sessionization (applyInPandasWithState)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T


def test_sessionize_stream_closes_gapped_sessions(spark, tmp_path):
    from etl_macropulse_br_spark.streaming.sessions import sessionize_stream

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        # user 1: two sessions separated by a 2h gap
        (1, base),
        (1, base + dt.timedelta(minutes=5)),
        (1, base + dt.timedelta(minutes=10)),
        (1, base + dt.timedelta(hours=3)),
        (1, base + dt.timedelta(hours=3, minutes=2)),
        # user 2: one session (never closed within the batch)
        (2, base),
    ]
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = str(tmp_path / "events_stream")
    spark.createDataFrame(rows, schema).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    sessions = sessionize_stream(stream, gap_s=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["n_events"]): (r["session_start"], r["session_end"])
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    # user 1's first session closed by the gap; user 2's closed by
    # the EVENT-TIME timeout (r9: the watermark — max event minus
    # 1 h = base+2h02 — passed its last_ts + gap = base+30min, so
    # the availableNow run's final batch emits it, exactly as the
    # batch twin would); user 1's second session stays open (its
    # timeout base+3h32 is still ahead of the watermark)
    assert (1, 3) in got
    start, end = got[(1, 3)]
    assert start == base and end == base + dt.timedelta(minutes=10)
    assert got.get((2, 1)) == (base, base)
    assert len(got) == 2


def test_stream_matches_batch_session_window(spark, tmp_path):
    """Differential gate (r4 VERDICT #2): the streaming sessionizer
    must be row-identical to the batch F.session_window aggregation
    on the same input — including events landing EXACTLY on the gap
    boundary (strict rule: boundary starts a NEW session). A
    far-future sentinel per user force-closes every real session so
    the availableNow run emits them all; the sentinel's own
    (still-open) session is excluded from the comparison."""
    import random

    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.streaming.sessions import sessionize_stream

    gap_s = 1800
    rng = random.Random(7)
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    for user in range(1, 9):
        t = base + dt.timedelta(minutes=rng.randint(0, 120))
        for _ in range(40):
            # mix sub-gap, super-gap, and EXACT-boundary deltas
            delta = rng.choice([1, 60, 600, 1799, 1800, 1801, 4000])
            t = t + dt.timedelta(seconds=delta)
            rows.append((user, t))
    sentinel = max(ts for _, ts in rows) + dt.timedelta(days=30)
    real = list(rows)
    for user in range(1, 9):
        rows.append((user, sentinel))

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    # one file → one availableNow micro-batch: the differential is
    # about the gap/merge rule (incl. exact-boundary events); a
    # multi-file source would replay files in arbitrary order, i.e.
    # time-travel no real stream exhibits (cross-batch state carry
    # is covered by the closed-sessions test above)
    src = str(tmp_path / "diff_stream")
    spark.createDataFrame(sorted(rows, key=lambda r: r[1]), schema).coalesce(
        1
    ).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_s=gap_s)
        .writeStream.format("memory")
        .queryName("diff_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "diff_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM diff_sessions").collect()
    }

    batch = {
        (
            r["user_id"],
            r["start"],
            r["last_ts"],
            r["n_events"],
        )
        for r in (
            spark.createDataFrame(real, schema)
            .groupBy("user_id", F.session_window("ts", f"{gap_s} seconds"))
            .agg(
                F.min("ts").alias("start"),
                F.max("ts").alias("last_ts"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .collect()
        )
    }
    assert streamed == batch
    # sanity: the generator actually produced boundary-exact deltas
    assert any(
        (b - a) == dt.timedelta(seconds=1800)
        for (u1, a), (u2, b) in zip(real, real[1:])
        if u1 == u2
    )


def test_session_oracle_matches_native_on_boundary_events(spark, tmp_path):
    """The gaps-and-islands DuckDB oracle must replay session_window
    EXACTLY at the gap boundary (ts == prev + gap merges). The
    driver's testdata has continuous timestamps, so only this test
    exercises the boundary case the r5 differential surfaced."""
    import duckdb

    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.plans.queries import (
        SESSION_WINDOW_STATS_SQL,
    )

    base = dt.datetime(2026, 3, 1, 9, 0, 0)
    deltas = [0, 1800, 3600, 5401, 7201, 9001, 9002, 10803]
    rows = [
        (1, i + 1, base + dt.timedelta(seconds=s))
        for i, s in enumerate(deltas)
    ]
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "boundary_events.parquet")
    df.coalesce(1).write.parquet(src)

    native = {
        (r["user_id"], r["session_start"], r["session_end_gap"], r["n_events"])
        for r in df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end_gap"),
            "n_events",
        )
        .collect()
    }

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{src}/*.parquet'")
    oracle = {
        (u, s, e, n)
        for u, s, e, n in con.execute(SESSION_WINDOW_STATS_SQL).fetchall()
    }
    assert native == oracle
    # the chain 0,1800,3600 merges through two exact boundaries
    assert any(n >= 3 and s == base for _, s, _, n in native)


def test_sessionize_late_events_extend_not_split(spark, tmp_path):
    """r9 review fix: a watermark-legal late event landing INSIDE
    (or within gap before) the open session must extend it, not
    regress session_end — pre-fix, last_us was overwritten backwards
    and the next on-time event measured its gap from the regressed
    end, splitting a session batch semantics keeps whole."""
    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.streaming.sessions import (
        sessionize_stream,
    )

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = str(tmp_path / "late_stream")
    # batch 1: events at t=0 and t=20min
    spark.createDataFrame(
        [(1, base), (1, base + dt.timedelta(minutes=20))], schema
    ).coalesce(1).write.parquet(src)
    # batch 2: a LATE event at t=5min (inside the open session, well
    # within the 1h watermark) + an on-time event at t=40min, then a
    # far-future sentinel to force-close via the gap
    spark.createDataFrame(
        [
            (1, base + dt.timedelta(minutes=5)),
            (1, base + dt.timedelta(minutes=40)),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(1, base + dt.timedelta(days=2))], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_s=1800)
        .writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        r
        for r in spark.sql("select * from late_sessions").collect()
        if r["n_events"] > 1  # drop the sentinel's own session if any
    ]
    # ONE session [0, 40min] with all 4 events — pre-fix this came
    # out as [0, 5min] n=3 plus a second session at 40min
    assert len(rows) == 1, rows
    r = rows[0]
    assert r["session_start"] == base
    assert r["session_end"] == base + dt.timedelta(minutes=40)
    assert r["n_events"] == 4

    # and it matches the batch session_window on the same rows
    batch = (
        spark.read.parquet(src)
        .filter(F.col("ts") < base + dt.timedelta(days=1))
        .groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(batch) == 1 and batch[0]["n"] == 4


def test_sessionize_leapfrog_bridge_not_split(spark, tmp_path):
    """r12 regression pin (found by fuzz seed 31): consecutive
    intra-session deltas d1 + d2 > gap, with the d2 event arriving
    BEFORE the bridging d1 event (watermark-legal leapfrog). The r11
    emit-on-close operator force-closed the left session the moment
    the d2 event arrived (t − last > gap), and the late d1 event
    could only backward-merge into the right session — splitting one
    batch session into two, e.g. (A,A,1) + (B..C,6) where batch has
    (A..C,7). Watermark-final emission holds the left session in
    state until the watermark proves nothing can bridge it, so the
    late event merges all three into one."""
    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.streaming.sessions import (
        sessionize_stream,
    )

    base = dt.datetime(2026, 6, 1, 10, 59, 42)
    gap = dt.timedelta(seconds=1800)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    e_a = base  # session anchor
    e_b = base + gap  # bridging event, EXACTLY at the gap boundary
    e_c = e_b + dt.timedelta(seconds=60)  # d1 + d2 = 1860 > gap
    src = str(tmp_path / "leapfrog_stream")
    # arrival order: A, then C (leapfrogs B), then late B — all
    # within the default 1h lateness — then a sentinel to finalize
    spark.createDataFrame([(1, e_a)], schema).coalesce(1).write.parquet(src)
    spark.createDataFrame([(1, e_c)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame([(1, e_b)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(
        [(1, e_c + dt.timedelta(days=2))], schema
    ).coalesce(1).write.mode("append").parquet(src)

    q = (
        sessionize_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            gap_s=1800,
        )
        .writeStream.format("memory")
        .queryName("leapfrog_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "leapfrog_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from leapfrog_sessions").collect()
    }
    # one session A..C with all 3 events — identical to batch
    batch = {
        (r["user_id"], r["s"], r["e"], r["n"])
        for r in spark.createDataFrame(
            [(1, e_a), (1, e_b), (1, e_c)], schema
        )
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("s"),
            F.max("ts").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got == batch == {(1, e_a, e_c, 3)}


def test_sessionize_stream_drops_null_ts(spark, tmp_path):
    """r10 (ADVICE r9 #2): a NULL ts became pandas NaT, whose
    int64-min value the late-arrival branch emitted as a garbage
    singleton session near year 1677 — nulls are now dropped in the
    plan, so output equals the same stream without them."""
    import datetime as dt

    from etl_macropulse_br_spark.streaming.sessions import sessionize_stream

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        (1, base),
        (1, None),  # must not pollute user 1's open session
        (1, base + dt.timedelta(minutes=5)),
        (1, base + dt.timedelta(hours=3)),
        (9, None),  # null-only user: no session at all
    ]
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = str(tmp_path / "null_ts_stream")
    spark.createDataFrame(rows, schema).write.parquet(src)
    q = (
        sessionize_stream(
            spark.readStream.schema(schema).parquet(src), gap_s=1800
        )
        .writeStream.format("memory")
        .queryName("null_ts_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_null_ts"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["n_events"], r["session_start"], r["session_end"])
        for r in spark.sql("SELECT * FROM null_ts_sessions").collect()
    }
    # exactly user 1's first session (closed by the 3h gap); no
    # year-1677 garbage, nothing for user 9
    assert got == {
        (1, 2, base, base + dt.timedelta(minutes=5))
    }


def test_sessionize_drops_events_below_watermark(spark, tmp_path):
    """r12: applyInPandasWithState does NOT pre-filter late input
    rows (verified empirically), so the operator enforces the
    standard watermark contract itself. An event arriving far below
    the watermark — whose session may already be emitted as final —
    must be DROPPED, not merged (merging extended an already-final
    session; arriving later still, it would have emitted an
    overlapping singleton)."""
    from etl_macropulse_br_spark.streaming.sessions import (
        sessionize_stream,
    )

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = str(tmp_path / "below_wm_stream")
    # batch 1: user 1 at t=0; user 2 at +10h drives the watermark to
    # +9h under the default 1h lateness
    spark.createDataFrame(
        [(1, base), (2, base + dt.timedelta(hours=10))], schema
    ).coalesce(1).write.parquet(src)
    # batch 2: user 1 event at +1min — 9h below the watermark
    spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=1))], schema
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 3: sentinel finalizes everything real
    spark.createDataFrame(
        [(1, base + dt.timedelta(days=9))], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q = (
        sessionize_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            gap_s=1800,
        )
        .writeStream.format("memory")
        .queryName("below_wm_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "below_wm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from below_wm_sessions").collect()
    }
    # user 1's session is the UNEXTENDED singleton; the below-
    # watermark event left no trace anywhere
    assert got == {
        (1, base, base, 1),
        (2, base + dt.timedelta(hours=10), base + dt.timedelta(hours=10), 1),
    }


def test_merge_event_equals_batch_scan_any_order():
    """Pure-Python property pin for the r12 interval kernel: feeding
    events to _merge_event in ANY order yields exactly the intervals
    a sort-and-scan (batch session_window) produces — starts, ends,
    and counts. Randomized insertion orders over clustered event
    sets, including exact-boundary deltas and duplicate timestamps."""
    import random

    from etl_macropulse_br_spark.streaming.sessions import _merge_event

    rng = random.Random(1207)
    gap = 1800
    for _ in range(300):
        # clustered times: a few anchors, offsets mixing sub-gap,
        # exact-gap, and super-gap steps, plus duplicates
        times = []
        t = rng.randrange(0, 10_000)
        for _ in range(rng.randint(1, 25)):
            t += rng.choice([0, 1, 60, 1799, 1800, 1801, 3700, 9000])
            times.append(t)
        # batch truth: sort, scan with the inclusive gap rule
        expected = []
        for x in sorted(times):
            if expected and x - expected[-1][1] <= gap:
                expected[-1][1] = x
                expected[-1][2] += 1
            else:
                expected.append([x, x, 1])
        # stream kernel: random insertion order
        order = list(times)
        rng.shuffle(order)
        intervals: list[list[int]] = []
        for x in order:
            _merge_event(intervals, x, gap)
        assert intervals == expected, (times, order)


def test_sessionize_lateness_knob_validated(spark, tmp_path):
    """r11 (VERDICT r10 What's missing #5): the watermark delay is a
    parameter with the family's interval grammar — garbage and
    negative specs are rejected loudly at build time, before any
    query starts."""
    import pytest

    from etl_macropulse_br_spark.streaming.sessions import (
        sessionize_stream,
    )

    src = tmp_path / "empty_src"
    src.mkdir()
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(
        str(src)
    )
    with pytest.raises(ValueError, match="interval spec"):
        sessionize_stream(stream, lateness="-1 hours")
    with pytest.raises(ValueError, match="interval spec"):
        sessionize_stream(stream, lateness="soonish")


def test_sessionize_restart_on_r11_state_schema_is_loud(
    spark, tmp_path
):
    """r13 (VERDICT r12 What's missing #2): r12 changed the
    sessionizer's per-key state from THREE LONGS (one pending
    session: start_us, last_us, n) to three LONG-ARRAYS (the pending
    interval set — streaming/sessions.py STATE_SCHEMA). The module
    docstring promises the pinned checkpoint contract (new state
    schema ⇒ new checkpoint dir, loud failure otherwise), but until
    now only the neardup operator had a pin of its own. This builds
    a checkpoint with the r11 3-long schema via a legacy updater on
    the SAME pipeline shape (watermark, groupBy user_id, event-time
    timeout, append), then restarts the r12 operator on it: Spark's
    state-schema compatibility check must refuse LOUDLY, never
    reinterpret committed state bytes. Parquet sink — the memory
    sink refuses all checkpoint recovery, which would mask the
    check."""
    import glob

    import pandas as pd
    import pytest
    from pyspark.errors.exceptions.captured import (
        AnalysisException,
        StreamingQueryException,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from etl_macropulse_br_spark.streaming import sessions as S

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    src = str(tmp_path / "legacy_src")
    ckpt = str(tmp_path / "legacy_ckpt")
    out = str(tmp_path / "legacy_out")
    spark.createDataFrame(
        [(1, base), (1, base + dt.timedelta(minutes=5)), (2, base)],
        schema,
    ).coalesce(1).write.parquet(src)

    legacy_state = T.StructType(
        [
            T.StructField("session_start_us", T.LongType()),
            T.StructField("last_ts_us", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    assert len(S.STATE_SCHEMA.fields) == 3  # arrays since r12
    assert all(
        isinstance(f.dataType, T.ArrayType)
        for f in S.STATE_SCHEMA.fields
    )

    def legacy_update(key, pdfs, state):
        # the r11-era updater: ONE pending session as 3 scalar longs
        (user_id,) = key
        start = last = None
        n = 0
        if state.exists:
            start, last, n = state.get
        if not state.hasTimedOut:
            for pdf in pdfs:
                for t in pd.to_datetime(pdf["ts"]):
                    us = int(t.value // 1000)
                    start = us if start is None else min(start, us)
                    last = us if last is None else max(last, us)
                    n += 1
        if start is not None:
            state.update((int(start), int(last), int(n)))
        return iter(())

    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .filter(F.col("ts").isNotNull())
        .withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            legacy_update,
            outputStructType=S.SESSION_SCHEMA,
            stateStructType=legacy_state,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    n_out_before = len(glob.glob(f"{out}/*.parquet"))

    # new events arrive; the r12 operator restarts on the SAME
    # checkpoint — the long-array schema vs the committed 3-long
    # state must be refused loudly
    spark.createDataFrame(
        [(1, base + dt.timedelta(hours=3))], schema
    ).coalesce(1).write.mode("append").parquet(src)

    def restart():
        q2 = (
            S.sessionize_stream(
                spark.readStream.schema(schema).parquet(src),
                gap_s=1800,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(180)
        if q2.exception() is not None:
            raise q2.exception()

    with pytest.raises(
        (StreamingQueryException, AnalysisException)
    ) as exc:
        restart()
    msg = str(exc.value).lower()
    assert "state" in msg and "schema" in msg, msg
    # no silent output was produced from reinterpreted state
    assert len(glob.glob(f"{out}/*.parquet")) == n_out_before
