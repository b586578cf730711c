"""Streaming exact dedup: emit only the first arrival of each
normalized text, with watermark-bounded state.

The batch twin is ``operators/dedup.exact_dedup`` (hash-groupBy).
In streaming, "have I seen this text before" is per-key state that
must survive micro-batches — exactly what Spark's
``dropDuplicatesWithinWatermark`` operator maintains: one state row
per distinct key seen inside the watermark horizon, evicted as the
event-time watermark passes, so state is O(distinct keys per
horizon) rather than O(stream).

Scale shape: the md5 text hash is computed MAP-SIDE before the
dedup, so the stateful exchange shuffles a 64-bit int key (plus the
carried id/ts), never the document text; the horizon bounds both
state size and the late-duplicate guarantee (a duplicate arriving
later than ``delay`` after the original may be re-emitted — the
standard streaming-dedup contract).

Reference scope: the reference is strictly batch (SURVEY.md §2.11);
this is part of the streaming extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """First arrival per distinct normalized text within the
    watermark horizon. Returns (text_hash, id, ts) rows."""
    from etl_macropulse_br_spark.functions.hashing import md5_long
    from etl_macropulse_br_spark.operators.dedup import _norm_text

    hashed = stream.select(
        md5_long(_norm_text(text_col)).alias("text_hash"),
        F.col(id_col),
        F.col(ts_col),
    ).withWatermark(ts_col, delay)
    return hashed.dropDuplicatesWithinWatermark(["text_hash"])
