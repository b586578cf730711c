"""Streaming exact TEXT dedup: emit only the first arrival of each
normalized document text, with watermark-bounded state.

The batch twin is ``operators/dedup.exact_dedup`` (hash-groupBy);
the stateful machinery is the generic keyed
``streaming/joins.dedup_stream`` (``dropDuplicatesWithinWatermark``
— one state row per distinct key inside the watermark horizon,
engine-evicted). This module contributes the corpus-dedup
specifics: the md5 text hash is computed MAP-SIDE before the
stateful exchange, so the dedup shuffles a 64-bit int key (plus the
carried id/ts), never the document text — the same
text-never-shuffles rule as every batch dedup path.

The horizon bounds both state size and the late-duplicate
guarantee: a duplicate arriving later than ``delay`` after the
original may be re-emitted (the standard streaming-dedup contract).

Reference scope: the reference is strictly batch (SURVEY.md §2.11);
this is part of the streaming extension surface. Cross-batch
correctness is pinned by tests/test_streaming_dedup.py's
multi-micro-batch differential against the batch DISTINCT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def text_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    delay_s: int = 3600,
    state_store: str | None = None,
) -> DataFrame:
    """First arrival per distinct normalized text within the
    watermark horizon. Returns (text_hash, id, ts) rows.
    ``state_store="rocksdb"`` selects the production state backend
    (session-scoped — streaming/state_store.py)."""
    if state_store is not None:
        from etl_macropulse_br_spark.streaming.state_store import (
            set_state_store,
        )

        set_state_store(stream.sparkSession, state_store)
    from etl_macropulse_br_spark.functions.hashing import md5_long
    from etl_macropulse_br_spark.operators.dedup import _norm_text
    from etl_macropulse_br_spark.streaming.joins import dedup_stream

    hashed = stream.select(
        md5_long(_norm_text(text_col)).alias("text_hash"),
        F.col(id_col),
        F.col(ts_col),
    )
    return dedup_stream(
        hashed, keys=["text_hash"], ts_col=ts_col, watermark_s=delay_s
    )
