"""Multimodal column handling (task brief): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas UDFs over ``mapInPandas``.

Round 2: image and audio decode are REAL — P6 PPM parsing is pure
numpy and WAV/PCM parsing is stdlib ``wave``, so no external codec is
needed; the synthetic media generator emits valid PPM/WAV payloads and
the tests roundtrip actual pixels/samples through the Spark plan.
Video frame EXTRACTION remains a clearly-marked deterministic stub
(real containers genuinely need ffmpeg, which is not in this image);
its Spark-side plumbing (schema, per-frame row explosion, batch shape)
is real. Compressed formats (PNG/JPEG/MP3) raise ValueError at the
decoder seam — swapping in PIL/librosa changes only the inner numpy
function, not the Spark plan.

Design for 100 TB: media bytes never shuffle — every op here is a
narrow map over the storage partitioning; only extracted features
(small fixed-size vectors) flow into joins downstream.
"""

from __future__ import annotations

import hashlib
import io
import wave
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


# ---------------------------------------------------------------------
# real decoders (no external codecs required)
# ---------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 PPM."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(arr, np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM -> (h, w, 3) uint8. Pure numpy, handles comments
    and arbitrary whitespace per the PPM spec."""
    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.ascontiguousarray(samples, np.int16).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV/PCM16 bytes -> (int16 mono samples, sample_rate)."""
    if not payload or not payload.startswith(b"RIFF"):
        raise ValueError("not a RIFF/WAV payload")
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only PCM16 supported")
        raw = f.readframes(f.getnframes())
        samples = np.frombuffer(raw, dtype=np.int16)
        if f.getnchannels() > 1:
            samples = samples.reshape(-1, f.getnchannels()).mean(axis=1).astype(np.int16)
        return samples, f.getframerate()


def image_feature(payload: bytes, out_dim: int = 16) -> np.ndarray:
    """Real image feature: per-channel mean/std + 10-bin gray histogram
    (padded/truncated to out_dim)."""
    arr = decode_ppm(payload).astype(np.float32)
    gray = arr.mean(axis=2)
    hist, _ = np.histogram(gray, bins=10, range=(0.0, 256.0))
    hist = hist.astype(np.float32) / np.float32(max(gray.size, 1))
    feat = np.concatenate(
        [arr.mean(axis=(0, 1)) / 255.0, arr.std(axis=(0, 1)) / 255.0, hist]
    ).astype(np.float32)
    return np.resize(feat, out_dim)


def audio_feature(payload: bytes, out_dim: int = 16) -> np.ndarray:
    """Real audio feature: RMS + zero-crossing rate + fixed log-spaced
    FFT band magnitudes (padded/truncated to out_dim)."""
    samples, _sr = decode_wav(payload)
    x = samples.astype(np.float32) / 32768.0
    if x.size == 0:
        return np.zeros(out_dim, dtype=np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, max(out_dim - 2, 1))
    bandmag = np.array([b.mean() if b.size else 0.0 for b in bands], dtype=np.float32)
    denom = float(bandmag.max()) or 1.0
    feat = np.concatenate([[rms, zcr], bandmag / denom]).astype(np.float32)
    return np.resize(feat, out_dim)


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """STUB decoder for formats with no in-image codec (video
    containers): deterministic feature from the bytes' sha256."""
    if not payload:
        raise ValueError("empty media payload")
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * (out_dim * 4 // len(h) + 1))[: out_dim * 4], dtype=np.uint32)
    return (raw.astype(np.float32) / np.float32(2**32)).astype(np.float32)


def _dispatch_decode(kind: str, payload: bytes, out_dim: int) -> np.ndarray:
    if kind == "image":
        return image_feature(payload, out_dim)
    if kind == "audio":
        return audio_feature(payload, out_dim)
    return _fake_decode(payload, out_dim)  # video: documented stub


# ---------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------

def extract_features(
    media: DataFrame,
    out_dim: int = 16,
    decoder: Callable[[str, bytes, int], np.ndarray] | None = None,
) -> DataFrame:
    """binary payload -> fixed-size float feature vector, one Arrow
    batch at a time. Default decoder: REAL PPM/WAV parsing for
    image/audio, sha256 stub for video. Custom ``decoder(kind, payload,
    out_dim)`` overrides the whole dispatch (codec swap seam)."""
    dec = decoder or _dispatch_decode

    def run(batches):
        for pdf in batches:
            feats = [
                dec(k, bytes(p), out_dim).tolist() if p else [0.0] * out_dim
                for k, p in zip(pdf["kind"], pdf["payload"])
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
    """REAL image resize for PPM payloads: decode, stride-resample so
    max(h, w) <= max_px, re-encode PPM. One narrow Arrow-batched map;
    pixels never shuffle."""

    def run(batches):
        for pdf in batches:
            ids, thumbs, ws, hs = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_ppm(bytes(p)) if p else np.zeros((1, 1, 3), np.uint8)
                step = max(1, -(-max(arr.shape[0], arr.shape[1]) // max_px))
                small = arr[::step, ::step]
                ids.append(mid)
                thumbs.append(encode_ppm(small))
                hs.append(small.shape[0])
                ws.append(small.shape[1])
            yield pd.DataFrame(
                {"media_id": ids, "thumb": thumbs, "thumb_w": ws, "thumb_h": hs}
            )

    return media.filter("kind = 'image'").select("media_id", "payload").mapInPandas(
        run, schema=THUMB_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index. STUB: frame payload = deterministic slice of the container
    bytes (a real impl seeks/decodes per batch — ffmpeg not in image)."""

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


def synth_image(i: int, w: int = 64, h: int = 48) -> np.ndarray:
    """Deterministic test pattern for media_id i."""
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 3 + i) % 256
    g = (y * 5 + 2 * i) % 256
    b = (x + y + 7 * i) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def synth_audio(i: int, sr: int = 16000, n: int = 2048) -> np.ndarray:
    """Deterministic sine burst, frequency keyed by media_id."""
    t = np.arange(n, dtype=np.float64) / sr
    freq = 220.0 + 55.0 * (i % 16)
    return (np.sin(2 * np.pi * freq * t) * 12000.0).astype(np.int16)


def generate_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: REAL P6 PPM images and
    PCM16 WAV audio (decodable by this module's pure-numpy/stdlib
    decoders), opaque counter-based bytes for video."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                if kind == "image":
                    payload = encode_ppm(synth_image(i))
                    mime, w, h, sr, nf = "image/x-portable-pixmap", 64, 48, None, None
                elif kind == "audio":
                    payload = encode_wav(synth_audio(i), 16000)
                    mime, w, h, sr, nf = "audio/wav", None, None, 16000, None
                else:
                    payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8
                    mime, w, h, sr, nf = "video/mp4", None, None, None, 120
                rows.append((i, kind, payload, mime, w, h, sr, nf))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "mime",
                    "width", "height", "sample_rate", "n_frames",
                ],
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
