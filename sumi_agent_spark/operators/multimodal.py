"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video assets are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so payload bytes stream through in
columnar batches without ever landing driver-side.

Decode is REAL for the three pure-stdlib formats in ``operators/codecs.py``
-- PNG (all five scanline filters), WAV (RIFF/PCM16), Y4M (YUV4MPEG2) --
and the deterministic fixture generator emits genuine payloads in those
formats, so decode -> features -> resize -> frame-sample is a true
end-to-end media pipeline.  ``decode_mode``:

* ``'real'``  (default) -- parse the payload; unsupported formats raise,
  the honest boundary of a container with no codec libraries (JPEG/MP3/MP4
  would slot in behind the same interface where those libs exist).
* ``'fake'``  -- digest-derived pseudo-metadata for plumbing tests on
  arbitrary bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from .codecs import (
    decode_png, decode_wav, decode_y4m, encode_png, encode_wav, encode_y4m,
    resize_nearest, y4m_fps,
)

ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("payload", BinaryType(), True),
    StructField("mime", StringType(), True),
    StructField("source_doc_id", LongType(), True),
])

DECODED_SCHEMA = StructType(ASSET_SCHEMA.fields + [
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_DIM = 32
FEATURED_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("feature", ArrayType(FloatType()), True),
])

_MIME = {"image": "image/png", "audio": "audio/wav",
         "video": "video/x-yuv4mpeg"}


def generate_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fixture of REAL media payloads: PNG gradients+noise,
    WAV sine bursts, Y4M moving-bar clips.

    Built from a pandas frame so the local fixture ships to the JVM as one
    Arrow batch (plain-row createDataFrame would round-trip every payload
    through pickled-RDD Python workers -- seconds of overhead for a tiny
    table); coalesced so downstream Python stages don't pay worker startup
    for dozens of one-row partitions."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {"asset_id": [], "kind": [], "payload": [], "mime": [],
            "source_doc_id": []}
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = int(rng.randint(8, 49)), int(rng.randint(8, 49))
            grad = (np.add.outer(np.arange(h), np.arange(w)) * 255
                    // max(h + w - 2, 1)).astype(np.uint8)
            img = np.stack([grad,
                            rng.randint(0, 256, (h, w)).astype(np.uint8),
                            255 - grad], axis=-1)
            payload = encode_png(img)
        elif kind == "audio":
            rate = 8000
            n_samp = int(rng.randint(400, 4000))
            t = np.arange(n_samp) / rate
            freq = float(rng.randint(100, 1200))
            payload = encode_wav(
                (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16), rate)
        else:
            w, h, nf = 16, 12, int(rng.randint(2, 9))
            frames = np.zeros((nf, h, w), dtype=np.uint8)
            for f in range(nf):
                frames[f, :, (f * 2) % w] = 255  # moving vertical bar
            payload = encode_y4m(frames, fps=25)
        rows["asset_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(_MIME[kind])
        rows["source_doc_id"].append(i % 16)
    pdf = pd.DataFrame(rows)
    return spark.createDataFrame(pdf, ASSET_SCHEMA).coalesce(8)


def _fake_meta(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic pseudo-metadata from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    w = 64 + d[0] * 8
    h = 64 + d[1] * 8
    frames = 1 + d[2] % 64
    dur = 100 + int.from_bytes(d[3:5], "big") % 60000
    return w, h, frames, dur


def _real_meta(kind: str, payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, duration_ms) parsed from a real payload."""
    if kind == "image":
        img = decode_png(payload)
        return img.shape[1], img.shape[0], 1, 0
    if kind == "audio":
        samples, rate = decode_wav(payload)
        return 0, 0, 0, int(len(samples) * 1000 / rate)
    if kind == "video":
        frames, w, h = decode_y4m(payload)
        fps = y4m_fps(payload)
        return w, h, len(frames), int(len(frames) * 1000 / fps)
    raise ValueError(f"unknown asset kind {kind!r}")


def decode_assets(df: DataFrame, decode_mode: str = "real") -> DataFrame:
    """mapInPandas decode stage: payload -> typed media metadata."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "fake":
                metas = [_fake_meta(p if p is not None else b"")
                         for p in pdf["payload"]]
            else:
                metas = [_real_meta(k, bytes(p))
                         for k, p in zip(pdf["kind"], pdf["payload"])]
            pdf = pdf.copy()
            pdf["width"] = pd.array([m[0] for m in metas], dtype="int32")
            pdf["height"] = pd.array([m[1] for m in metas], dtype="int32")
            pdf["n_frames"] = pd.array([m[2] for m in metas], dtype="int32")
            pdf["duration_ms"] = pd.array([m[3] for m in metas], dtype="int32")
            yield pdf

    return df.mapInPandas(run, DECODED_SCHEMA)


def _luma(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return img.astype(np.float64)
    return img[..., :3].astype(np.float64).mean(axis=-1)


def _image_feature(img: np.ndarray) -> np.ndarray:
    """16-dim 4x4 mean-luma thumbnail + shape/stat dims, padded to 32."""
    luma = _luma(img)
    thumb = resize_nearest(luma, 4, 4).reshape(-1) / 255.0
    h, w = luma.shape
    extra = np.array([w / 4096.0, h / 4096.0, luma.mean() / 255.0,
                      luma.std() / 255.0])
    return np.concatenate([thumb, extra, np.zeros(FEATURE_DIM - 20)])


def _audio_feature(samples: np.ndarray, rate: int) -> np.ndarray:
    """16 windowed RMS dims + zero-crossing rate + duration, padded."""
    x = samples.reshape(-1).astype(np.float64) / 32768.0
    if len(x) == 0:
        return np.zeros(FEATURE_DIM)
    bounds = np.linspace(0, len(x), 17).astype(int)
    rms = np.array([np.sqrt(np.mean(x[a:b] ** 2)) if b > a else 0.0
                    for a, b in zip(bounds[:-1], bounds[1:])])
    zcr = np.mean(np.abs(np.diff(np.signbit(x)))) if len(x) > 1 else 0.0
    extra = np.array([zcr, len(x) / (rate * 10.0)])
    return np.concatenate([rms, extra, np.zeros(FEATURE_DIM - 18)])


def _video_feature(frames: np.ndarray) -> np.ndarray:
    """First-frame thumbnail + motion energy between frames, padded."""
    if len(frames) == 0:
        return np.zeros(FEATURE_DIM)
    thumb = resize_nearest(frames[0].astype(np.float64), 4, 4).reshape(-1) / 255.0
    motion = (np.abs(np.diff(frames.astype(np.float64), axis=0)).mean() / 255.0
              if len(frames) > 1 else 0.0)
    extra = np.array([motion, len(frames) / 64.0])
    return np.concatenate([thumb, extra, np.zeros(FEATURE_DIM - 18)])


def extract_features(df: DataFrame, decode_mode: str = "real") -> DataFrame:
    """mapInPandas feature stage: payload -> FEATURE_DIM unit vector.

    Real mode decodes and featurizes (thumbnail / windowed RMS / motion
    energy); fake mode keeps the digest-derived vector for plumbing tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for kind, p in zip(pdf["kind"], pdf["payload"]):
                if decode_mode == "fake":
                    d = hashlib.sha256(p if p is not None else b"").digest()
                    v = np.frombuffer(d, dtype=np.uint8).astype(np.float64)
                    v = np.resize(v, FEATURE_DIM)
                else:
                    b = bytes(p)
                    if kind == "image":
                        v = _image_feature(decode_png(b))
                    elif kind == "audio":
                        v = _audio_feature(*decode_wav(b))
                    elif kind == "video":
                        v = _video_feature(decode_y4m(b)[0])
                    else:
                        raise ValueError(f"unknown asset kind {kind!r}")
                v = v / (np.linalg.norm(v) or 1.0)
                feats.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "feature": feats,
            })

    return df.mapInPandas(run, FEATURED_SCHEMA)


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """mapInPandas resize stage: PNG payload -> re-encoded PNG at target
    size (nearest-neighbor)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            resized = []
            for kind, p in zip(pdf["kind"], pdf["payload"]):
                if kind != "image":
                    resized.append(bytes(p))
                    continue
                img = decode_png(bytes(p))
                resized.append(encode_png(resize_nearest(img, target_w,
                                                         target_h)))
            out["payload"] = resized
            yield out

    return df.mapInPandas(run, ASSET_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for videos: explode decoded frame indices
    (0, every_n, 2*every_n, ...) -- pure native ops over the decoded
    metadata; decoding each sampled frame's pixels is ``decode_y4m`` in
    another mapInPandas stage."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return (df.filter(F.col("kind") == "video")
            .withColumn("frame_idx", F.explode(frames))
            .select("asset_id", "frame_idx", "width", "height"))
