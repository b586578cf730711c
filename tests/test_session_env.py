"""Pin for the session factory's env-knob validation (r17 — ADVICE
r16 #4): a malformed SPARK_GRAFT_SMALL_SHUFFLE_PARTITIONS must fail
naming the knob, not with a bare int() ValueError pointing at
nothing. Pure-validation tests — the raise happens before any
session builder is touched, so no Spark session is created."""

from __future__ import annotations

import pytest

from etl_macropulse_br_spark.session import get_spark


def test_small_shuffle_partitions_env_names_the_knob(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SMALL_SHUFFLE_PARTITIONS", "four")
    with pytest.raises(
        ValueError, match="SPARK_GRAFT_SMALL_SHUFFLE_PARTITIONS"
    ):
        get_spark(profile="small-input")


def test_small_shuffle_partitions_env_rejects_non_positive(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SMALL_SHUFFLE_PARTITIONS", "0")
    with pytest.raises(ValueError, match=">= 1"):
        get_spark(profile="small-input")


def test_small_shuffle_partitions_env_rejects_empty(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SMALL_SHUFFLE_PARTITIONS", "")
    with pytest.raises(
        ValueError, match="SPARK_GRAFT_SMALL_SHUFFLE_PARTITIONS"
    ):
        get_spark(profile="small-input")