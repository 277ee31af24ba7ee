"""Multimodal column operators: decode / resize / feature-extract /
frame-sample over opaque ``binary`` payload columns.

Design (task mandate): image/audio/video travel as ``binary`` columns
with typed metadata; every transform is an Arrow-batched ``mapInPandas``
so the Python work is numpy over whole record batches — never per-row
Python objects crossing the boundary one at a time.

What is REAL here: all Spark plumbing (schemas, batching, partition
pinning), and the full numeric path for the engine's own raw formats —
the ``payload.py`` image codec, ``VID0`` frame containers, and float32
PCM audio. What is STUBBED: decoding *external* codecs (JPEG/MP4/FLAC),
which needs image/av libraries this container doesn't ship — those
raise ``NotImplementedError`` with the exact swap-in point documented,
matching the reference's scoping of external services.

Like every expansion/compute-heavy UDF stage in this engine, operators
pin parallelism with a round-robin ``repartition`` (AQE would coalesce
on tiny input bytes and serialize the stage — see PLANS.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from crawler_tjce_spark import payload as P

# ---------------------------------------------------------------------------
# image resize
# ---------------------------------------------------------------------------


def resize_pixels(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-style resize via index-mapped block mean (pure numpy).
    Deterministic; good enough for thumbnailing/feature prep — a real
    deployment swaps in cv2/PIL inside the same batch loop."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ys][:, xs]


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
) -> DataFrame:
    """(image_id, bytes, …) → (image_id, bytes, w, h, fmt) resized.

    Decode → resize → re-encode per Arrow batch. External formats
    (JPEG/PNG wire bytes) raise in ``payload.decode_image`` — the stub
    boundary; the engine's own codec path is exercised end-to-end.
    """
    schema = f"{id_col} string, bytes binary, w int, h int, fmt string"
    n_parts = df.sparkSession.sparkContext.defaultParallelism

    def _resize(batches):
        for pdf in batches:
            out = []
            for iid, data in zip(pdf[id_col], pdf[bytes_col]):
                px, fmt = P.decode_image(bytes(data))
                rs = resize_pixels(px, out_w, out_h)
                out.append(
                    {id_col: iid, "bytes": P.encode_image(rs, fmt),
                     "w": out_w, "h": out_h, "fmt": fmt}
                )
            yield pd.DataFrame(out, columns=[id_col, "bytes", "w", "h", "fmt"])

    return df.select(id_col, bytes_col).repartition(n_parts).mapInPandas(
        _resize, schema=schema
    )


# ---------------------------------------------------------------------------
# image feature extraction
# ---------------------------------------------------------------------------

FEATURE_DIM = 20  # 16-bin gray histogram + mean/std/edge-energy/aspect


def image_features(px: np.ndarray) -> list[float]:
    """Deterministic 20-dim feature vector: normalized 16-bin grayscale
    histogram, mean, std, mean |gradient| (edge energy), aspect ratio."""
    gray = px.mean(axis=2) if px.ndim == 3 else px.astype(np.float64)
    hist, _ = np.histogram(gray, bins=16, range=(0, 255))
    hist = hist / max(1, gray.size)
    gx = np.abs(np.diff(gray, axis=1)).mean() if gray.shape[1] > 1 else 0.0
    gy = np.abs(np.diff(gray, axis=0)).mean() if gray.shape[0] > 1 else 0.0
    return [
        *[float(x) for x in hist],
        float(gray.mean()),
        float(gray.std()),
        float(gx + gy),
        float(gray.shape[1]) / float(gray.shape[0]),
    ]


def extract_image_features(
    df: DataFrame, bytes_col: str = "bytes", id_col: str = "image_id"
) -> DataFrame:
    """(image_id, bytes) → (image_id, features array<float>) — the input
    shape for the ANN/near-dup operators in ``similarity.py``/``dedup.py``
    (decode→featurize→embed is the standard multimodal pipeline head)."""
    schema = f"{id_col} string, features array<float>"
    n_parts = df.sparkSession.sparkContext.defaultParallelism

    def _feat(batches):
        for pdf in batches:
            ids, feats = [], []
            for iid, data in zip(pdf[id_col], pdf[bytes_col]):
                px, _ = P.decode_image(bytes(data))
                ids.append(iid)
                feats.append(image_features(px))
            yield pd.DataFrame({id_col: ids, "features": feats})

    return df.select(id_col, bytes_col).repartition(n_parts).mapInPandas(
        _feat, schema=schema
    )


# ---------------------------------------------------------------------------
# video frame sampling (VID0 container)
# ---------------------------------------------------------------------------


def encode_video(frames: list[np.ndarray], fmt: str = "rgb8") -> bytes:
    """``VID0`` container: magic + frame count + length-prefixed encoded
    frames. The engine's synthetic stand-in for a video codec."""
    parts = [b"VID0", np.uint32(len(frames)).tobytes()]
    for fr in frames:
        enc = P.encode_image(fr, fmt)
        parts.append(np.uint32(len(enc)).tobytes())
        parts.append(enc)
    return b"".join(parts)


def decode_video(data: bytes) -> list[np.ndarray]:
    if data[:4] != b"VID0":
        # external containers (mp4/webm) need an av library — the
        # documented swap-in point (pyav/ffmpeg inside the same batch fn)
        raise NotImplementedError("external video codecs not available; expected VID0")
    n = int(np.frombuffer(data[4:8], np.uint32)[0])
    off, frames = 8, []
    for _ in range(n):
        ln = int(np.frombuffer(data[off:off + 4], np.uint32)[0])
        off += 4
        px, _ = P.decode_image(data[off:off + ln])
        frames.append(px)
        off += ln
    return frames


def sample_frames(
    df: DataFrame,
    every_k: int = 2,
    video_col: str = "video",
    id_col: str = "video_id",
) -> DataFrame:
    """(video_id, video binary) → one row per sampled frame
    (video_id, frame_idx, bytes, w, h) — frames idx ≡ 0 (mod every_k).
    The explode direction (1 row in, many out) is why the stage pins its
    own parallelism before the UDF."""
    schema = f"{id_col} string, frame_idx int, bytes binary, w int, h int"
    n_parts = df.sparkSession.sparkContext.defaultParallelism

    def _sample(batches):
        for pdf in batches:
            out = []
            for vid, data in zip(pdf[id_col], pdf[video_col]):
                for i, px in enumerate(decode_video(bytes(data))):
                    if i % every_k == 0:
                        out.append(
                            {id_col: vid, "frame_idx": i,
                             "bytes": P.encode_image(px, "rgb8"),
                             "w": px.shape[1], "h": px.shape[0]}
                        )
            yield pd.DataFrame(out, columns=[id_col, "frame_idx", "bytes", "w", "h"])

    return df.select(id_col, video_col).repartition(n_parts).mapInPandas(
        _sample, schema=schema
    )


# ---------------------------------------------------------------------------
# audio features (float32 PCM)
# ---------------------------------------------------------------------------


def audio_features(pcm: np.ndarray, n_windows: int = 8) -> list[float]:
    """Windowed RMS + zero-crossing rate over mono float32 PCM —
    2·n_windows dims, deterministic."""
    n = len(pcm)
    feats: list[float] = []
    for w in range(n_windows):
        seg = pcm[w * n // n_windows:(w + 1) * n // n_windows]
        if len(seg) == 0:
            feats.extend([0.0, 0.0])
            continue
        rms = float(np.sqrt((seg.astype(np.float64) ** 2).mean()))
        zc = float((np.diff(np.signbit(seg)) != 0).mean()) if len(seg) > 1 else 0.0
        feats.extend([rms, zc])
    return feats


def extract_audio_features(
    df: DataFrame, audio_col: str = "audio", id_col: str = "audio_id", n_windows: int = 8
) -> DataFrame:
    """(audio_id, audio binary = float32 PCM) → (audio_id, features).
    Compressed formats (FLAC/MP3) are the stub boundary: bytes that are
    not a whole number of float32 samples raise, documenting where a
    real decoder plugs in."""
    schema = f"{id_col} string, features array<float>"
    n_parts = df.sparkSession.sparkContext.defaultParallelism

    def _feat(batches):
        for pdf in batches:
            ids, feats = [], []
            for aid, data in zip(pdf[id_col], pdf[audio_col]):
                raw = bytes(data)
                if len(raw) % 4 != 0:
                    raise NotImplementedError(
                        "compressed audio codecs not available; expected float32 PCM"
                    )
                ids.append(aid)
                feats.append(audio_features(np.frombuffer(raw, np.float32), n_windows))
            yield pd.DataFrame({id_col: ids, "features": feats})

    return df.select(id_col, audio_col).repartition(n_parts).mapInPandas(
        _feat, schema=schema
    )
