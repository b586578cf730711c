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
