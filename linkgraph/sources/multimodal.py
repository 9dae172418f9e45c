"""Multimodal column handling (task brief): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas UDFs over ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested; the actual codecs (PIL/ffmpeg/librosa)
are NOT in this container, so the decode kernels are deterministic
fakes behind ``decoder=`` seams (clearly marked). Swapping in a real
decoder changes only the inner numpy function, not the Spark plan.

Design for 100 TB: media bytes never shuffle — every op here is a
narrow map over the storage partitioning; only extracted features
(small fixed-size vectors) flow into joins downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURES_SCHEMA = "media_id long, kind string, feature array<float>, feat_dim int"
THUMB_SCHEMA = "media_id long, thumb binary, thumb_w int, thumb_h int"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """STUB decoder: deterministic feature from the bytes' sha256 —
    replace with a real image/audio decode when codecs are available.
    Raises on empty payload like a real decoder would."""
    if not payload:
        raise ValueError("empty media payload")
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * (out_dim * 4 // len(h) + 1))[: out_dim * 4], dtype=np.uint32)
    return (raw.astype(np.float32) / np.float32(2**32)).astype(np.float32)


def extract_features(
    media: DataFrame,
    out_dim: int = 16,
    decoder: Callable[[bytes, int], np.ndarray] = _fake_decode,
) -> DataFrame:
    """binary payload -> fixed-size float feature vector, one Arrow
    batch at a time (the real decode would be PIL/librosa here)."""

    def run(batches):
        for pdf in batches:
            feats = [
                decoder(bytes(p) if p is not None else b"\x00", out_dim).tolist()
                if p
                else [0.0] * out_dim
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "feat_dim": out_dim,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def resize_thumbnail(media: DataFrame, max_px: int = 64) -> DataFrame:
    """Image resize plumbing. STUB: emits a deterministic payload slice
    + clamped dimensions (a real impl decodes + resamples per batch)."""

    def run(batches):
        for pdf in batches:
            w = pdf["width"].fillna(0).astype(int).clip(upper=max_px)
            h = pdf["height"].fillna(0).astype(int).clip(upper=max_px)
            thumbs = [
                bytes(p)[: max_px * max_px] if p is not None else b""
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb": thumbs,
                    "thumb_w": w,
                    "thumb_h": h,
                }
            )

    return media.filter("kind = 'image'").select(
        "media_id", "payload", "width", "height"
    ).mapInPandas(run, schema=THUMB_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index. STUB: frame payload = deterministic slice of the container
    bytes (a real impl seeks/decodes per batch)."""

    def run(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"].fillna(0).astype(int)
            ):
                b = bytes(payload) if payload is not None else b""
                for k, fi in enumerate(range(0, int(n_frames), every_n)):
                    if k >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(b[fi : fi + 16])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.filter("kind = 'video'").select(
        "media_id", "payload", "n_frames"
    ).mapInPandas(run, schema=FRAMES_SCHEMA)


def generate_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (counter-based payload bytes)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8
                rows.append(
                    (
                        i,
                        kind,
                        payload,
                        {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        64 if kind == "image" else None,
                        48 if kind == "image" else None,
                        16000 if kind == "audio" else None,
                        120 if kind == "video" else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "mime",
                    "width", "height", "sample_rate", "n_frames",
                ],
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
