"""As-of join semantics (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from etl_macropulse_br_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_with_exact_and_missing(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2026-01-01T10:00:00"), 100.0),
            ("A", _ts("2026-01-01T10:00:05"), 101.0),
            ("A", _ts("2026-01-01T10:00:10"), 102.0),
            ("B", _ts("2026-01-01T10:00:07"), 50.0),
        ],
        ["sym", "qts", "price"],
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2026-01-01T10:00:05"), 1),  # exact match -> 101
            ("A", _ts("2026-01-01T10:00:09"), 2),  # between -> 101
            ("A", _ts("2026-01-01T10:00:30"), 3),  # after all -> 102
            ("B", _ts("2026-01-01T10:00:00"), 4),  # before any -> null
            ("C", _ts("2026-01-01T10:00:00"), 5),  # key absent -> null
        ],
        ["sym", "tts", "trade_id"],
    )
    out = asof_join(
        trades,
        quotes,
        on="sym",
        left_ts="tts",
        right_ts="qts",
        right_payload=["price", "qts"],
    )
    got = {r["trade_id"]: r["asof_price"] for r in out.collect()}
    assert got == {1: 101.0, 2: 101.0, 3: 102.0, 4: None, 5: None}
    assert out.count() == 5  # left semantics: every probe row kept


def test_asof_forward_with_exact_and_missing(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2026-01-01T10:00:00"), 100.0),
            ("A", _ts("2026-01-01T10:00:05"), 101.0),
            ("A", _ts("2026-01-01T10:00:10"), 102.0),
            ("B", _ts("2026-01-01T10:00:07"), 50.0),
        ],
        ["sym", "qts", "price"],
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2026-01-01T10:00:05"), 1),  # exact match -> 101
            ("A", _ts("2026-01-01T10:00:06"), 2),  # between -> next = 102
            ("A", _ts("2026-01-01T10:00:30"), 3),  # after all -> null
            ("B", _ts("2026-01-01T10:00:00"), 4),  # before any -> 50
            ("C", _ts("2026-01-01T10:00:00"), 5),  # key absent -> null
        ],
        ["sym", "tts", "trade_id"],
    )
    out = asof_join(
        trades,
        quotes,
        on="sym",
        left_ts="tts",
        right_ts="qts",
        right_payload=["price", "qts"],
        direction="forward",
    )
    got = {r["trade_id"]: r["asof_price"] for r in out.collect()}
    assert got == {1: 101.0, 2: 102.0, 3: None, 4: 50.0, 5: None}
    assert out.count() == 5


def test_asof_nearest_prefers_backward_on_tie(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2026-01-01T10:00:00"), 100.0),
            ("A", _ts("2026-01-01T10:00:10"), 102.0),
        ],
        ["sym", "qts", "price"],
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2026-01-01T10:00:04"), 1),  # closer to 00 -> 100
            ("A", _ts("2026-01-01T10:00:05"), 2),  # tie -> backward 100
            ("A", _ts("2026-01-01T10:00:06"), 3),  # closer to 10 -> 102
            ("A", _ts("2026-01-01T09:00:00"), 4),  # only forward -> 100
            ("A", _ts("2026-01-01T11:00:00"), 5),  # only backward -> 102
        ],
        ["sym", "tts", "trade_id"],
    )
    out = asof_join(
        trades,
        quotes,
        on="sym",
        left_ts="tts",
        right_ts="qts",
        right_payload=["price"],
        direction="nearest",
    )
    got = {r["trade_id"]: r["asof_price"] for r in out.collect()}
    assert got == {1: 100.0, 2: 100.0, 3: 102.0, 4: 100.0, 5: 102.0}


def test_asof_all_directions_match_pandas_merge_asof(spark):
    """Seeded-random differential test: every direction must agree
    with pandas.merge_asof (the semantics the operator documents),
    including exact-match ties and missing keys."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    left_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_l),
            "lts": pd.to_datetime(
                rng.integers(0, 10_000, n_l), unit="s", origin="2026-01-01"
            ),
            "lid": np.arange(n_l),
        }
    ).sort_values("lts", kind="stable", ignore_index=True)
    right_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 10, n_r),  # some keys never match
            "rts": pd.to_datetime(
                rng.integers(0, 10_000, n_r), unit="s", origin="2026-01-01"
            ),
            "payload": rng.normal(size=n_r).round(6),
        }
    ).sort_values("rts", kind="stable", ignore_index=True)
    # merge_asof requires unique (k, rts) on the right for a clean
    # expectation; drop dups deterministically
    right_pd = right_pd.drop_duplicates(["k", "rts"], keep="first")

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)

    for direction in ("backward", "forward", "nearest"):
        expected = pd.merge_asof(
            left_pd,
            right_pd.rename(columns={"rts": "lts"}),
            on="lts",
            by="k",
            direction=direction,
        )
        got = asof_join(
            left,
            right,
            on="k",
            left_ts="lts",
            right_ts="rts",
            right_payload=["payload"],
            direction=direction,
        ).toPandas()
        exp_map = dict(zip(expected["lid"], expected["payload"]))
        got_map = dict(zip(got["lid"], got["asof_payload"]))
        assert set(got_map) == set(exp_map)
        mismatches = {
            lid: (exp_map[lid], got_map[lid])
            for lid in exp_map
            if not (
                (pd.isna(exp_map[lid]) and pd.isna(got_map[lid]))
                or exp_map[lid] == got_map[lid]
            )
        }
        assert not mismatches, (direction, dict(list(mismatches.items())[:5]))


def test_asof_null_timestamps_never_fabricate_matches(spark):
    """r9 review fixes: (a) a build row with NULL ts must never be
    anyone's match (it sorted NULLS-FIRST and became the 'most
    recent' row for early probes); (b) a probe with NULL ts matches
    nothing in any direction (under desc ordering it sorted last and
    swallowed the temporally-last build row); (c) duplicate
    (key, ts) build rows resolve deterministically (greatest
    payload), stable across repartitionings."""
    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 5, "p5"), (1, None, "pnull")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, None, "fabricated"), (1, 100, "late")],
        "k long, ts long, payload string",
    )
    for direction in ("backward", "forward", "nearest"):
        got = {
            r["tag"]: r["asof_payload"]
            for r in asof_join(
                left, right, "k", "ts", "ts", ["payload"], direction
            ).collect()
        }
        # probe ts=5: backward -> no build at-or-before (null build
        # row must NOT match); forward/nearest -> 'late'
        if direction == "backward":
            assert got["p5"] is None, direction
        else:
            assert got["p5"] == "late", direction
        assert got["pnull"] is None, direction

    # (c) duplicate (k, ts): deterministic greatest-payload match,
    # identical across partitionings
    left2 = spark.createDataFrame([(1, 10, "probe")], "k long, ts long, tag string")
    right2 = spark.createDataFrame(
        [(1, 10, "aaa"), (1, 10, "zzz")], "k long, ts long, payload string"
    )
    picks = set()
    for parts in (1, 7):
        r = asof_join(
            left2,
            right2.repartition(parts, F.col("payload")),
            "k",
            "ts",
            "ts",
            ["payload"],
            "backward",
        ).collect()
        picks.add(r[0]["asof_payload"])
    assert picks == {"zzz"}
