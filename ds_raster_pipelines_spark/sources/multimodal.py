"""Multimodal columns: opaque binary payloads + typed metadata.

Image decode is real (codecs.py). Audio/video decode need codec libraries
absent from this container, so the DECODE STEP is stubbed behind
NotImplementedError — but the Spark-side plumbing (schema, partitioning,
Arrow batch shape, UDF signatures) is real and tested, with a
deterministic fake feature extractor standing in for the codec so the
pipeline shape executes end-to-end.

Schema convention (one table per modality, or a union table with `mod`):
    media(media_id string, bytes binary, mod string, meta struct<...>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_FEATURES_SCHEMA = "media_id string, n_samples bigint, rms double, peak double"
FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, frame_bytes binary"


def decode_audio(blob: bytes, codec: str) -> np.ndarray:
    """Stub: real audio decode requires an audio library (not in this
    container). The plumbing around this call is real."""
    raise NotImplementedError(f"audio codec {codec!r} not available in this environment")


def decode_video_frames(blob: bytes, codec: str, every_n: int) -> list[bytes]:
    """Stub: real video decode requires a video library (not in this
    container)."""
    raise NotImplementedError(f"video codec {codec!r} not available in this environment")


def _fake_pcm(blob: bytes) -> np.ndarray:
    """Deterministic stand-in decode: interpret bytes as int16 PCM —
    keeps batch shapes and numerics real for plumbing tests."""
    arr = np.frombuffer(blob[: len(blob) // 2 * 2], dtype="<i2")
    return arr.astype(np.float64) / 32768.0


def audio_features(media: DataFrame, use_fake_codec: bool = False) -> DataFrame:
    """Arrow-batched audio feature extraction (RMS / peak / length).
    With ``use_fake_codec`` the deterministic PCM stand-in runs instead of
    the (unavailable) real codec, exercising identical plumbing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_samples": [], "rms": [], "peak": []}
            for _, row in pdf.iterrows():
                pcm = (
                    _fake_pcm(row["bytes"])
                    if use_fake_codec
                    else decode_audio(row["bytes"], row.get("mod", "wav"))
                )
                out["media_id"].append(row["media_id"])
                out["n_samples"].append(len(pcm))
                out["rms"].append(float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0)
                out["peak"].append(float(np.abs(pcm).max()) if len(pcm) else 0.0)
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, use_fake_codec: bool = False) -> DataFrame:
    """Frame sampling (1-in-N) as a flatMap-shaped Arrow kernel: one input
    row → 0..k output rows, the batch shape video pipelines need."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                if use_fake_codec:
                    blob = row["bytes"]
                    step = max(1, every_n)
                    chunks = [blob[k : k + 64] for k in range(0, len(blob), 64)]
                    sampled = chunks[::step]
                else:
                    sampled = decode_video_frames(row["bytes"], row.get("mod", "mp4"), every_n)
                for j, fr in enumerate(sampled):
                    ids.append(row["media_id"])
                    idxs.append(j)
                    frames.append(fr)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_bytes": frames})

    return media.mapInPandas(kernel, schema=FRAME_SAMPLE_SCHEMA)
