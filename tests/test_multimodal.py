"""Multimodal operators: resize / feature-extract / frame-sample / audio
over binary columns (Arrow-batched mapInPandas; engine-native raw
formats real, external codecs stubbed)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_tjce_spark import payload as P
from crawler_tjce_spark.operators import multimodal as M


def _images_df(spark, n=12, w=48, h=32):
    rows = []
    for i in range(n):
        px = P.synthesize_pixels(f"img-{i}", w=w, h=h)
        rows.append((f"img-{i}", P.encode_image(px, "rgb8")))
    return spark.createDataFrame(rows, "image_id string, bytes binary")


def test_resize_roundtrip_dims_and_determinism(spark):
    df = _images_df(spark)
    out = M.resize_images(df, 16, 8).collect()
    assert len(out) == 12
    for r in out:
        px, fmt = P.decode_image(bytes(r["bytes"]))
        assert px.shape[:2] == (8, 16) and (r["w"], r["h"]) == (16, 8)
    # deterministic: same input → same bytes
    again = {r["image_id"]: bytes(r["bytes"]) for r in M.resize_images(df, 16, 8).collect()}
    assert {r["image_id"]: bytes(r["bytes"]) for r in out} == again
    # numpy reference parity for one image
    px0 = P.synthesize_pixels("img-0", w=48, h=32)
    expect = M.resize_pixels(px0, 16, 8)
    got, _ = P.decode_image(again["img-0"])
    assert np.array_equal(got, expect)


def test_image_features_shape_and_parity(spark):
    df = _images_df(spark, n=6)
    out = {r["image_id"]: r["features"] for r in M.extract_image_features(df).collect()}
    assert len(out) == 6
    for iid, feats in out.items():
        assert len(feats) == M.FEATURE_DIM
        px = P.synthesize_pixels(iid, w=48, h=32)
        np.testing.assert_allclose(feats, M.image_features(px), rtol=1e-6)
    # histogram part is a distribution
    assert abs(sum(out["img-0"][:16]) - 1.0) < 1e-6


def test_frame_sampling_counts_and_content(spark):
    vids = []
    for v in range(4):
        frames = [P.synthesize_pixels(f"v{v}-f{i}", w=24, h=16) for i in range(7)]
        vids.append((f"vid-{v}", M.encode_video(frames)))
    df = spark.createDataFrame(vids, "video_id string, video binary")
    out = M.sample_frames(df, every_k=3).collect()
    # frames 0,3,6 of each of 4 videos
    assert len(out) == 12
    by_vid = {}
    for r in out:
        by_vid.setdefault(r["video_id"], []).append(r["frame_idx"])
        px, _ = P.decode_image(bytes(r["bytes"]))
        assert px.shape == (16, 24, 3)
    assert all(sorted(v) == [0, 3, 6] for v in by_vid.values())
    # content parity: sampled frame 3 == synthesized frame 3
    r3 = next(r for r in out if r["video_id"] == "vid-1" and r["frame_idx"] == 3)
    got, _ = P.decode_image(bytes(r3["bytes"]))
    assert np.array_equal(got, P.synthesize_pixels("v1-f3", w=24, h=16))


def test_external_video_codec_is_stubbed():
    with pytest.raises(NotImplementedError, match="VID0"):
        M.decode_video(b"\x00\x00\x00\x1cftypmp42 not a real mp4")


def test_audio_features_and_stub(spark):
    rng = np.random.default_rng(7)
    rows = [
        (f"aud-{i}", (np.sin(np.linspace(0, 20 * (i + 1), 4000)) * 0.5
                      + rng.normal(0, 0.01, 4000)).astype(np.float32).tobytes())
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "audio_id string, audio binary")
    out = {r["audio_id"]: r["features"] for r in M.extract_audio_features(df).collect()}
    assert len(out) == 3 and all(len(v) == 16 for v in out.values())
    # python parity
    pcm = np.frombuffer(rows[0][1], np.float32)
    np.testing.assert_allclose(out["aud-0"], M.audio_features(pcm), rtol=1e-6)
    # non-PCM bytes hit the stub boundary inside the UDF
    bad = spark.createDataFrame([("x", b"\x01\x02\x03")], "audio_id string, audio binary")
    with pytest.raises(Exception, match="float32 PCM"):
        M.extract_audio_features(bad).collect()
