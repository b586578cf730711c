"""REST/JSON sources — BCB SGS series and IBGE UF dimension.

Spark-first rewrites of ``extract.py:15-68``. HTTP happens on the
driver (the payloads are control-plane sized: one series ≈ hundreds
of rows, the UF dim is 27 rows); rows land in executors via
``spark.createDataFrame`` with explicit schemas. The fetch function
is injectable so tests run fully offline (SURVEY §7.1 step 4).

``extract_bcb_many`` unions many series into one lazy DAG; its HTTP
calls run SEQUENTIALLY on the driver (r9 doc fix — this header
previously claimed a mapInPandas executor fan-out that was never
implemented). That is the right shape for the reference's O(10)
control-plane series; an O(1000)-series ingest would move the fetch
into ``mapInPandas`` over a series-id frame (one task per series),
which remains future extension surface.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable
from datetime import datetime
from urllib.request import urlopen

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_macropulse_br_spark.functions.exprs import (
    parse_date_ddmmyyyy,
    parse_ptbr_number,
)

BCB_URL = (
    "https://api.bcb.gov.br/dados/serie/bcdata.sgs.{sid}/dados"
    "?formato=json&dataInicial={start}&dataFinal={end}"
)
IBGE_URL = "https://servicodados.ibge.gov.br/api/v1/localidades/estados"
HTTP_TIMEOUT_S = 30  # extract.py:28,56

FetchFn = Callable[[str], list[dict]]

BCB_RAW_SCHEMA = T.StructType(
    [
        T.StructField("data", T.StringType()),
        T.StructField("valor", T.StringType()),
    ]
)

BCB_SILVER_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.LongType()),
        T.StructField("series_name", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("value", T.DoubleType()),
    ]
)

UF_DIM_SCHEMA = T.StructType(
    [
        T.StructField("uf_id", T.LongType()),
        T.StructField("uf_sigla", T.StringType()),
        T.StructField("uf_nome", T.StringType()),
        T.StructField("regiao_nome", T.StringType()),
    ]
)


def _default_fetch(url: str) -> list[dict]:
    with urlopen(url, timeout=HTTP_TIMEOUT_S) as resp:  # noqa: S310
        if resp.status >= 400:
            raise RuntimeError(f"HTTP {resp.status} for {url}")
        return json.loads(resp.read().decode("utf-8"))


def _ddmmyyyy(iso_date: str) -> str:
    """ISO → dd/mm/YYYY request param (``extract.py:23-24``)."""
    return datetime.fromisoformat(iso_date).strftime("%d/%m/%Y")


def extract_bcb_sgs_series(
    spark: SparkSession,
    series_id: int,
    series_name: str,
    start_date: str,
    end_date: str,
    fetch: FetchFn | None = None,
) -> DataFrame:
    """One SGS series → typed silver-shaped DataFrame.

    Reference ``extract.py:15-47``: GET JSON list of
    ``{"data": "dd/mm/YYYY", "valor": "pt-BR number"}``, type it,
    short-circuit empty results to a typed empty frame.
    """
    fetch = fetch or _default_fetch
    url = BCB_URL.format(
        sid=series_id, start=_ddmmyyyy(start_date), end=_ddmmyyyy(end_date)
    )
    records = fetch(url)
    if not records:
        return spark.createDataFrame([], BCB_SILVER_SCHEMA)
    raw = spark.createDataFrame(
        [(str(r.get("data", "")), str(r.get("valor", ""))) for r in records],
        BCB_RAW_SCHEMA,
    )
    return raw.select(
        F.lit(series_id).cast("long").alias("series_id"),
        F.lit(series_name).alias("series_name"),
        parse_date_ddmmyyyy("data").alias("date"),
        parse_ptbr_number("valor").alias("value"),
    )


def extract_ibge_uf_dim(
    spark: SparkSession, fetch: FetchFn | None = None
) -> DataFrame:
    """IBGE states → 27-row dimension (``extract.py:50-68``).

    The reference flattens nested JSON with ``pd.json_normalize``;
    Spark reads the nested struct natively and projects
    ``regiao.nome`` directly.
    """
    fetch = fetch or _default_fetch
    records = fetch(IBGE_URL)
    if not records:
        return spark.createDataFrame([], UF_DIM_SCHEMA)
    raw = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in records], 1)
    )
    return raw.select(
        F.col("id").cast("long").alias("uf_id"),
        F.col("sigla").cast("string").alias("uf_sigla"),
        F.col("nome").cast("string").alias("uf_nome"),
        F.col("regiao.nome").cast("string").alias("regiao_nome"),
    )


def extract_bcb_many(
    spark: SparkSession,
    series: Iterable[tuple[int, str]],
    start_date: str,
    end_date: str,
    fetch: FetchFn | None = None,
) -> DataFrame:
    """Fan-out extraction of many series, unioned (``main.py:35-43``).

    Driver loop is fine up to O(100) series; each series frame is
    lazily unioned by name so the whole ingest is still one DAG.
    """
    from functools import reduce

    frames = [
        extract_bcb_sgs_series(spark, sid, name, start_date, end_date, fetch)
        for sid, name in series
    ]
    if not frames:
        return spark.createDataFrame([], BCB_SILVER_SCHEMA)
    return reduce(DataFrame.unionByName, frames)
