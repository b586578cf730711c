"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, partition-aware batch iteration,
Arrow-vectorized UDF signatures, frame sampling plans) is real and
tested; the codec step itself is stubbed behind
``NotImplementedError`` / a deterministic fake because media
libraries (PIL/ffmpeg/torchaudio) are not in this container. On a
real cluster, replace ``_decode_stub`` with the library call — the
plan shape, batch sizes, and schemas do not change.

Scale notes:
- media bytes stay in executors end-to-end (``mapInPandas`` streams
  Arrow batches; nothing collects to the driver);
- decode parallelism == input partitions: repartition by file-count
  before decoding so 1000 executors each chew their own slice;
- metadata (width/height/duration) lives in plain columns so
  filters on it prune parquet row groups WITHOUT touching bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


try:  # feature flag: real image codec when the library exists
    import PIL.Image  # noqa: F401

    HAS_PIL = True
except ImportError:  # container without media libs → stub path
    HAS_PIL = False


def _decode_pil(content: bytes | None, kind: str) -> list[float]:
    """Real image decoder (PIL), same 8-dim feature contract as the
    stub: deterministic per input bytes, so tests can assert exact
    values in either mode."""
    if content is None:
        raise NotImplementedError("missing media bytes; real decoder required")
    if kind != "image":
        raise NotImplementedError(f"PIL path only decodes images, got {kind!r}")
    import io

    import numpy as np
    from PIL import Image

    img = Image.open(io.BytesIO(content))
    img.load()
    w, h = img.size
    a = np.asarray(img.convert("L"), dtype=np.float64)
    return [
        float(w),
        float(h),
        float(a.mean()),
        float(a.std()),
        float(a.min()),
        float(a.max()),
        float(len(content)),
        1.0,
    ]


def decode_media(
    content: bytes | None, kind: str, use_real: bool | None = None
) -> list[float]:
    """Decode one media payload to a feature vector.

    ``use_real=None`` auto-selects: PIL when importable (images),
    the deterministic stub otherwise — so the same pipeline code
    runs end-to-end in both environments.
    """
    use_real = HAS_PIL if use_real is None else use_real
    if use_real and kind == "image":
        return _decode_pil(content, kind)
    return _decode_stub(content, kind)


def _decode_stub(content: bytes | None, kind: str) -> list[float]:
    """Deterministic fake decoder.

    STUB: replace with PIL/ffmpeg/torchaudio in production. Produces
    an 8-dim feature derived from byte statistics so tests can assert
    exact values and partitioning behavior without media libs.
    """
    if content is None:
        raise NotImplementedError("missing media bytes; real decoder required")
    n = len(content)
    if n == 0:
        return [0.0] * 8
    head = content[:64]
    return [
        float(n),
        float(sum(head) % 997),
        float(head[0]),
        float(head[-1]),
        float(min(head)),
        float(max(head)),
        float(n % 251),
        1.0 if kind == "image" else 0.0,
    ]


def extract_features(
    df: DataFrame,
    batch_size: int = 256,
    use_real_decoder: bool | None = None,
) -> DataFrame:
    """Decode + featurize media via mapInPandas (Arrow batches).

    ``use_real_decoder``: None auto-detects PIL on the EXECUTORS
    (resolved inside the UDF so heterogenous clusters behave);
    True forces the real codec, False forces the stub.

    Column pruning matters: only (media_id, kind, content) reach the
    UDF; metadata columns are re-joined afterward if needed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for content, kind in zip(pdf["content"], pdf["kind"]):
                try:
                    feats.append(decode_media(content, kind, use_real_decoder))
                    oks.append(True)
                except (NotImplementedError, ValueError, OSError):
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    pruned = df.select("media_id", "kind", "content")
    return pruned.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_plan(df: DataFrame, max_px: int = 512) -> DataFrame:
    """Plan a resize pass: rows needing work are selected by metadata
    only (no byte reads — predicate prunes on plain columns), then the
    binary transform runs per-batch.

    STUB: the pixel resample inside is the fake decoder; the
    partition/batch shape is the production one.
    """
    needs = df.filter(
        (F.col("kind") == "image")
        & ((F.col("width") > max_px) | (F.col("height") > max_px))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # deterministic fake: truncate bytes proportionally
            out = pdf.copy()
            out["content"] = [
                (c[: max(1, len(c) // 2)] if c is not None else None)
                for c in pdf["content"]
            ]
            out["width"] = pdf["width"].clip(upper=max_px)
            out["height"] = pdf["height"].clip(upper=max_px)
            yield out

    return needs.mapInPandas(run, schema=df.schema)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plan for video rows: explode planned frame
    timestamps from duration metadata (pure expressions — the decode
    of each frame is the stubbed step, one row per planned frame)."""
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.slice(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                ),
                1,
                max_frames,
            )
        ).alias("frame_ts_ms"),
    )
    return frames
