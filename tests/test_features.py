"""Per-group normalization: grouped-map pandas path vs expression
path."""

from __future__ import annotations

import pytest

from etl_macropulse_br_spark.operators.features import (
    zscore_expr,
    zscore_pandas,
)


@pytest.fixture()
def groups(spark):
    rows = [
        ("a", 1, 10.0),
        ("a", 2, 20.0),
        ("a", 3, 30.0),
        ("b", 4, 5.0),
        ("b", 5, 5.0),   # zero variance group -> null zscores
        ("c", 6, 42.0),  # singleton group -> null zscore
    ]
    return spark.createDataFrame(rows, ["g", "id", "v"])


def test_zscore_expr_semantics(groups):
    out = {r["id"]: r["zscore"] for r in zscore_expr(groups, "v", ["g"]).collect()}
    assert out[1] == pytest.approx(-1.0)
    assert out[2] == pytest.approx(0.0)
    assert out[3] == pytest.approx(1.0)
    assert out[4] is None and out[5] is None  # zero variance
    assert out[6] is None                     # n < 2


def test_zscore_pandas_matches_expr(groups):
    e = {r["id"]: r["zscore"] for r in zscore_expr(groups, "v", ["g"]).collect()}
    p = {r["id"]: r["zscore"] for r in zscore_pandas(groups, "v", ["g"]).collect()}
    assert set(e) == set(p)
    for k in e:
        if e[k] is None:
            assert p[k] is None
        else:
            assert p[k] == pytest.approx(e[k], abs=1e-9)
