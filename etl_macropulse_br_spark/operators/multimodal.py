"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, partition-aware batch iteration,
Arrow-vectorized UDF signatures, frame sampling plans) is real and
tested. Codecs are feature-flagged per modality:

- image: real PIL decode when importable (``HAS_PIL``);
- audio: real decode — soundfile/torchaudio when importable, else a
  stdlib ``wave`` PCM parser for RIFF/WAV payloads (always
  available, so the audio path is real and tested in ANY
  environment);
- video: real frame decode when ``av`` (PyAV) is importable
  (``HAS_AV``); raw YUV4MPEG2 (y4m) streams parse on pure stdlib —
  always available, so the video path is real for uncompressed
  interchange payloads in ANY environment; deterministic stub for
  compressed containers without PyAV.

The stub keeps the same 8-dim feature contract so the plan shape,
batch sizes, and schemas are identical in every mode.

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

try:  # preferred audio codec (any container that ships it)
    import soundfile  # noqa: F401

    HAS_SOUNDFILE = True
except ImportError:
    HAS_SOUNDFILE = False

try:  # video codec probe (PyAV); stub when absent
    import av  # noqa: F401

    HAS_AV = True
except ImportError:
    HAS_AV = False


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


def _decode_wav(content: bytes) -> list[float]:
    """Real PCM/WAV audio decoder on the stdlib ``wave`` module (no
    external codec needed): parses the RIFF container, reads the
    sample frames and emits the 8-dim feature contract as
    [duration_ms, sample_rate, n_channels, rms, peak, n_samples,
    n_bytes, 1.0]. Deterministic per input bytes."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(content)) as w:
            nch = w.getnchannels()
            sw = w.getsampwidth()
            rate = w.getframerate()
            nframes = w.getnframes()
            raw = w.readframes(nframes)
    except (wave.Error, EOFError) as e:  # malformed RIFF → contract error
        raise ValueError(f"undecodable WAV payload: {e}") from e
    if sw == 2:
        a = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif sw == 1:  # 8-bit WAV is unsigned, centered at 128
        a = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    elif sw == 4:
        a = np.frombuffer(raw, dtype="<i4").astype(np.float64)
    else:
        raise NotImplementedError(f"unsupported WAV sample width {sw}")
    dur_ms = 1000.0 * nframes / rate if rate else 0.0
    rms = float(np.sqrt((a * a).mean())) if a.size else 0.0
    peak = float(np.abs(a).max()) if a.size else 0.0
    return [
        dur_ms,
        float(rate),
        float(nch),
        rms,
        peak,
        float(a.size),
        float(len(content)),
        1.0,
    ]


def _decode_audio_soundfile(content: bytes) -> list[float]:
    """Audio decode via soundfile (flac/ogg/wav...), same contract as
    :func:`_decode_wav`. Only reachable when ``HAS_SOUNDFILE``."""
    import io

    import numpy as np
    import soundfile as sf

    data, rate = sf.read(io.BytesIO(content), dtype="float64")
    a = np.atleast_2d(data)
    n_samples = data.size
    nch = 1 if data.ndim == 1 else data.shape[1]
    nframes = data.shape[0]
    dur_ms = 1000.0 * nframes / rate if rate else 0.0
    flat = a.ravel()
    rms = float(np.sqrt((flat * flat).mean())) if flat.size else 0.0
    peak = float(np.abs(flat).max()) if flat.size else 0.0
    return [
        dur_ms,
        float(rate),
        float(nch),
        rms,
        peak,
        float(n_samples),
        float(len(content)),
        1.0,
    ]


def _decode_y4m(content: bytes) -> list[float]:
    """Real raw-video decoder for YUV4MPEG2 (y4m) payloads on pure
    stdlib: parse the text header (width/height/framerate), count
    FRAME records, emit [duration_ms, width, height, n_frames, fps,
    0, n_bytes, 1.0]. Deterministic per input bytes. y4m is the
    standard uncompressed interchange format (mjpegtools/ffmpeg
    `-f yuv4mpegpipe`), so the video path is real without a codec
    library — compressed containers need PyAV (probed above)."""
    header_end = content.find(b"\x0a")
    if not content.startswith(b"YUV4MPEG2") or header_end < 0:
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = 0
    fps_num, fps_den = 0, 1
    for tok in content[:header_end].split(b" ")[1:]:
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps_num, fps_den = int(num), int(den)
    if width <= 0 or height <= 0:
        raise ValueError("y4m header missing W/H")
    # count FRAME markers (each frame = b"FRAME...\n" + planes)
    n_frames = content.count(b"FRAME", header_end)
    fps = fps_num / fps_den if fps_den and fps_num else 0.0
    dur_ms = 1000.0 * n_frames / fps if fps else 0.0
    return [
        dur_ms,
        float(width),
        float(height),
        float(n_frames),
        fps,
        0.0,
        float(len(content)),
        1.0,
    ]


def _decode_video_av(content: bytes) -> list[float]:
    """Video decode via PyAV when importable: container duration,
    stream count, first-frame dims, frame count of the first second.
    Only reachable when ``HAS_AV``."""
    import io

    import av as _av

    with _av.open(io.BytesIO(content)) as c:
        stream = c.streams.video[0]
        w = float(stream.codec_context.width or 0)
        h = float(stream.codec_context.height or 0)
        dur_ms = float((c.duration or 0) / 1000.0)
        n = 0.0
        for frame in c.decode(stream):
            n += 1.0
            if frame.time is not None and frame.time > 1.0:
                break
    return [dur_ms, w, h, n, float(len(c.streams)), 0.0, float(len(content)), 1.0]


def decode_media(
    content: bytes | None, kind: str, use_real: bool | None = None
) -> list[float]:
    """Decode one media payload to a feature vector.

    ``use_real=None`` auto-selects per modality: PIL for images when
    importable; soundfile → stdlib-``wave`` (RIFF payloads) for
    audio; PyAV for video when importable; the deterministic stub
    otherwise — so the same pipeline code runs end-to-end in every
    environment. ``use_real=False`` forces the stub for all kinds.
    """
    if use_real is False:
        return _decode_stub(content, kind)
    if kind == "image" and (HAS_PIL or use_real):
        return _decode_pil(content, kind)
    if kind == "audio":
        if content is None:
            raise NotImplementedError(
                "missing media bytes; real decoder required"
            )
        if HAS_SOUNDFILE:
            return _decode_audio_soundfile(content)
        if content[:4] == b"RIFF":
            return _decode_wav(content)
        if use_real:
            raise NotImplementedError(
                "non-WAV audio needs soundfile/torchaudio"
            )
    if kind == "video":
        if content is None:
            raise NotImplementedError(
                "missing media bytes; real decoder required"
            )
        if HAS_AV:
            return _decode_video_av(content)  # pragma: no cover (no av here)
        if content[:9] == b"YUV4MPEG2":
            return _decode_y4m(content)
        if use_real:
            raise NotImplementedError(
                "compressed video needs PyAV (av); raw y4m decodes "
                "without it"
            )
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
