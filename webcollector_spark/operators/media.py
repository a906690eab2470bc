"""Audio/video multimodal plumbing.

The container has no media codecs (no PIL/ffmpeg/librosa — verified),
so per the build contract the DECODE KERNELS are stubs — a clearly
marked deterministic fake plus a NotImplementedError production seam —
while everything Spark-side is real and tested: typed metadata schemas,
opaque BinaryType payloads, iterator-of-Arrow-batches UDF signatures,
batch shapes, and the frame-sample/feature-extract dataflow.

Swap `_decode_video_stub` / `_decode_audio_stub` for ffmpeg/librosa
bindings in production; every call site routes through this module.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# input_hint generalized: opaque payload + typed metadata
VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("fps", T.DoubleType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
    ]
)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_sec", T.DoubleType(), False),
        T.StructField("frame_mean", T.DoubleType(), False),
        T.StructField("frame_hash", T.LongType(), False),
    ]
)

AUDIO_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("duration_sec", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def _decode_video_stub(video_id: str, data: bytes, n_frames: int, w: int, h: int):
    """DETERMINISTIC FAKE video decoder (no codecs in sandbox).

    Yields (frame_idx, HxWx3 uint8) frames derived from a seeded RNG so
    tests can recompute ground truth. Production: replace with ffmpeg.
    """
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "big") ^ len(data)
    for i in range(n_frames):
        rng = np.random.default_rng((seed + i) & 0xFFFFFFFF)
        yield i, rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _decode_audio_stub(audio_id: str, data: bytes, n_samples: int) -> np.ndarray:
    """DETERMINISTIC FAKE audio decoder -> float32 waveform in [-1, 1].
    Production: replace with librosa/soundfile."""
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "big") ^ n_samples
    rng = np.random.default_rng(seed & 0xFFFFFFFF)
    return (rng.random(n_samples, dtype=np.float32) * 2.0 - 1.0)


def decode_video_real(*a, **k):  # pragma: no cover - production seam
    raise NotImplementedError(
        "real video decode requires ffmpeg bindings; swap the stub in "
        "webcollector_spark/operators/media.py"
    )


def make_video_corpus(spark: SparkSession, n: int = 20, seed: int = 42) -> DataFrame:
    """Deterministic opaque-payload video table (metadata real, payload
    a seeded blob the stub decoder interprets)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        nf = int(rng.integers(8, 33))
        rows.append(
            (
                f"vid{i:06d}",
                rng.integers(0, 256, size=64, dtype=np.uint8).tobytes(),
                nf,
                float(rng.choice([12.0, 24.0, 30.0])),
                32,
                24,
                "fakevid",
                f"caption of vid{i:06d}",
            )
        )
    return spark.createDataFrame(rows, schema=VIDEO_SCHEMA)


def make_audio_corpus(spark: SparkSession, n: int = 20, seed: int = 43) -> DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        sr = int(rng.choice([8000, 16000]))
        rows.append(
            (
                f"aud{i:06d}",
                rng.integers(0, 256, size=64, dtype=np.uint8).tobytes(),
                sr,
                int(rng.integers(sr // 2, sr * 2)),
                "fakeaud",
            )
        )
    return spark.createDataFrame(rows, schema=AUDIO_SCHEMA)


def sample_frames(videos: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sample operator: decode inside Arrow batches, keep every
    n-th frame, emit per-frame features. One row in -> n_frames/every_n
    rows out (the UDTF shape); partitioning is inherited — a pure map
    stage, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FRAME_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                for idx, frame in _decode_video_stub(
                    r["video_id"], bytes(r["bytes"]), r["n_frames"], r["w"], r["h"]
                ):
                    if idx % every_n:
                        continue
                    mean = float(frame.mean())
                    rows.append(
                        {
                            "video_id": r["video_id"],
                            "frame_idx": idx,
                            "ts_sec": idx / r["fps"],
                            "frame_mean": round(mean, 4),
                            "frame_hash": int(
                                np.int64(
                                    int.from_bytes(
                                        frame.tobytes()[:8], "big", signed=False
                                    )
                                    >> 1
                                )
                            ),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                columns=cols
            )

    return videos.mapInPandas(run, schema=FRAME_SCHEMA)


def audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip features over the stub-decoded waveform (rms, zero
    crossings) — the librosa-shaped pipeline with a fake kernel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_FEAT_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                wave = _decode_audio_stub(
                    r["audio_id"], bytes(r["bytes"]), r["n_samples"]
                )
                rows.append(
                    {
                        "audio_id": r["audio_id"],
                        "duration_sec": round(r["n_samples"] / r["sample_rate"], 4),
                        "rms": round(float(np.sqrt(np.mean(wave**2))), 6),
                        "zero_crossings": int(np.sum(np.diff(np.sign(wave)) != 0)),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return audio.mapInPandas(run, schema=AUDIO_FEAT_SCHEMA)


def scene_cuts(frames: DataFrame, threshold: float = 30.0) -> DataFrame:
    """Detect mean-luminance jumps between consecutive SAMPLED frames —
    a window over (video_id, frame_idx), pure Catalyst."""
    from pyspark.sql import Window

    w = Window.partitionBy("video_id").orderBy("frame_idx")
    delta = F.abs(F.col("frame_mean") - F.lag("frame_mean").over(w))
    return (
        frames.withColumn("delta", delta)
        .filter(F.col("delta") >= threshold)
        .select("video_id", "frame_idx", F.round("delta", 4).alias("delta"))
    )
