"""Python UDTF surface (Spark 4): table-valued functions usable
from both the DataFrame API (``lateralJoin``/``tvf``) and raw SQL
(``LATERAL series_explode(payload)``).

The reference has NO user-registered functions (SURVEY.md §2.12) —
this is extension surface, and it deliberately lives at the INGEST
EDGE, not the hot path: REST payloads arrive as a handful of JSON
strings per series (reference ``extract.py:15-47``), so a
row-at-a-time Python UDTF costs nothing here, while the bulk
operators stay pure Catalyst expressions (the repo's standing
no-Python-in-the-hot-path rule, pinned by tests/test_plan_audit).

``SeriesExplode`` turns one BCB-SGS-style payload string —
``[{"data": "dd/mm/YYYY", "valor": "pt-BR number"}, ...]`` — into
typed-ready rows. Malformed payloads yield ONE (null, null, false)
row instead of failing the task or silently vanishing, so ingest
jobs can route rejects; well-formed entries yield
(data, valor, true) rows ready for the same
``parse_date_ddmmyyyy`` / ``parse_ptbr_number`` expressions the
REST source applies.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="data: string, valor: string, parse_ok: boolean")
class SeriesExplode:
    """One row per series observation; one reject row per
    malformed/non-list payload."""

    def eval(self, payload: str):  # noqa: D102
        if payload is None:
            yield None, None, False
            return
        try:
            records = json.loads(payload)
            if not isinstance(records, list):
                raise ValueError("payload is not a JSON list")
        except (ValueError, TypeError):
            yield None, None, False
            return
        for rec in records:
            if not isinstance(rec, dict):
                yield None, None, False
                continue
            data, valor = rec.get("data"), rec.get("valor")
            yield (
                None if data is None else str(data),
                None if valor is None else str(valor),
                True,
            )


def register_udtfs(spark) -> None:
    """Make the table functions callable from raw SQL."""
    spark.udtf.register("series_explode", SeriesExplode)
