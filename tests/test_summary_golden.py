"""Golden-file test: the summary builder must reproduce the
reference's committed artifact byte-for-byte.

The reference commits ``data/gold/summary.md`` as its
reproducibility anchor (format strings at ``src/summary.py:25-27,
43,78-81``). The fixture here is synthetic data chosen to land on
exactly the golden's numbers; the expected text is embedded verbatim
and, when the reference checkout is present, additionally compared
against the golden file's raw bytes so the embedded copy can't
drift.
"""

from __future__ import annotations

import datetime
import os

from etl_macropulse_br_spark.operators.summary import build_summary_text

REFERENCE_GOLDEN = "/root/reference/data/gold/summary.md"

GOLDEN_TEXT = (
    "BCB/SGS (série 11) - selic_sgs_11: último valor em 2026-01-09 = 55131.00.\n"
    "Variação vs mês anterior: +0.00 (variação absoluta).\n"
    "ANP - Destaques de 2025-12-01:\n"
    "- AM / DIESEL S10: variação média +0.34 (vs mês anterior).\n"
    "- AM / GASOLINA ADITIVADA: variação média +0.24 (vs mês anterior).\n"
    "- AM / GASOLINA: variação média +0.23 (vs mês anterior)."
)

BCB_SCHEMA = "series_id long, series_name string, date date, value double"
ANP_SCHEMA = "uf_sigla string, product string, date_ref date, price double"


def _bcb(spark):
    d = datetime.date
    return spark.createDataFrame(
        [
            (11, "selic_sgs_11", d(2025, 12, 1), 55100.0),
            (11, "selic_sgs_11", d(2025, 12, 15), 55131.0),
            (11, "selic_sgs_11", d(2026, 1, 9), 55131.0),
        ],
        BCB_SCHEMA,
    )


def _anp(spark):
    d = datetime.date
    return spark.createDataFrame(
        [
            ("AM", "DIESEL S10", d(2025, 11, 10), 6.00),
            ("AM", "DIESEL S10", d(2025, 12, 10), 6.34),
            ("AM", "GASOLINA ADITIVADA", d(2025, 11, 10), 6.00),
            ("AM", "GASOLINA ADITIVADA", d(2025, 12, 10), 6.24),
            ("AM", "GASOLINA", d(2025, 11, 10), 6.00),
            ("AM", "GASOLINA", d(2025, 12, 10), 6.23),
        ],
        ANP_SCHEMA,
    )


def test_summary_matches_reference_golden_bytes(spark):
    text = build_summary_text(_bcb(spark), _anp(spark))
    assert text == GOLDEN_TEXT
    if os.path.exists(REFERENCE_GOLDEN):
        with open(REFERENCE_GOLDEN, encoding="utf-8") as f:
            assert text == f.read()


def test_summary_fallback_lines_match_reference(spark):
    # Reference summary.py:46-47,89-90: engine-empty inputs
    empty_bcb = spark.createDataFrame([], BCB_SCHEMA)
    empty_anp = spark.createDataFrame([], ANP_SCHEMA)
    text = build_summary_text(empty_bcb, empty_anp)
    assert text == (
        "BCB/SGS - sem dados para o período.\n"
        "ANP - sem dados para o período."
    )

    # summary.py:44-45: data present but target series absent
    d = datetime.date
    other = spark.createDataFrame(
        [(433, "ipca_sgs_433", d(2026, 1, 9), 1.0)], BCB_SCHEMA
    )
    text = build_summary_text(other, empty_anp)
    assert (
        "BCB/SGS - série 'selic_sgs_11' não encontrada no período." in text
    )

    # summary.py:83-84: only one month → no MoM to highlight
    single_month = spark.createDataFrame(
        [("AM", "GASOLINA", d(2025, 12, 10), 6.23)], ANP_SCHEMA
    )
    text = build_summary_text(empty_bcb, single_month)
    assert (
        "ANP - Sem variação mensal suficiente para destacar no período."
        in text
    )
