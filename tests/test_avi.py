"""MJPEG-AVI container codec (pipeline/avi.py) + the T.81 Annex K.3
default-table path in pipeline/jpeg.py that real (DHT-less) MJPEG frames
rely on, and the sample_video_frames dispatch through mapInPandas."""

import numpy as np
import pytest

from incubator_druid_spark.pipeline.avi import (avi_info, decode_avi_frames,
                                                encode_mjpeg_avi,
                                                iter_avi_frames)


def _frames(n, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = []
    for i in range(n):
        f = base.copy()
        f[:, :, 0] = (f[:, :, 0].astype(int) + 11 * i) % 256
        out.append(f)
    return out


def test_header_roundtrip():
    frames = _frames(7)
    data = encode_mjpeg_avi(frames, fps=25.0)
    info = avi_info(data)
    assert (info["width"], info["height"]) == (32, 24)
    assert info["n_frames"] == 7
    assert info["fps"] == 25.0
    assert info["handler"] == "MJPG"


def test_frames_decode_near_lossless():
    frames = _frames(5)
    data = encode_mjpeg_avi(frames, quant=1)
    decoded = dict(decode_avi_frames(data))
    assert sorted(decoded) == [0, 1, 2, 3, 4]
    for i, f in enumerate(frames):
        err = np.abs(decoded[i].astype(int) - f.astype(int)).max()
        assert err <= 3, (i, err)


def test_sampling_skips_decode():
    """every_n sampling must yield only the sampled indices — and never
    JPEG-decode the rest (intra-only frames)."""
    frames = _frames(12)
    data = encode_mjpeg_avi(frames)
    got = [i for i, _ in decode_avi_frames(data, every_n=5, max_frames=2)]
    assert got == [0, 5]
    # iter_avi_frames exposes raw (undecoded) JPEG bytes per frame
    raw = list(iter_avi_frames(data))
    assert len(raw) == 12 and all(j[:2] == b"\xFF\xD8" for _, j in raw)


def test_dhtless_frames_use_k3_defaults():
    """The writer emits DHT-less frames (MJPEG convention); a frame pulled
    out of the container alone must decode via the injected K.3 tables."""
    from incubator_druid_spark.pipeline.jpeg import decode_baseline_jpeg
    frames = _frames(1)
    data = encode_mjpeg_avi(frames)
    _, jpg = next(iter_avi_frames(data))
    assert b"\xFF\xC4" not in jpg[:jpg.find(b"\xFF\xDA")]  # no DHT
    dec = decode_baseline_jpeg(jpg)
    assert np.abs(dec.astype(int) - frames[0].astype(int)).max() <= 3


def test_not_avi_raises():
    with pytest.raises(ValueError, match="AVI"):
        avi_info(b"RIFF\x00\x00\x00\x00WAVE")


def test_sample_video_frames_dispatch(spark):
    from pyspark.sql import functions as F

    from incubator_druid_spark.pipeline.multimodal import (
        attach_media_metadata, sample_video_frames)
    frames = _frames(9, h=16, w=16)
    data = encode_mjpeg_avi(frames)
    df = spark.createDataFrame([(1, bytearray(data))],
                               "id long, content binary")
    out = sample_video_frames(df, every_n=4, max_frames=3,
                              fake=False).collect()
    assert [r["frame_idx"] for r in out] == [0, 4, 8]
    assert all(len(r["frame_feat"]) == 8 for r in out)
    mime = attach_media_metadata(df).select(
        F.col("media.mime")).collect()[0][0]
    assert mime == "video/x-msvideo"
