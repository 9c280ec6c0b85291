"""Pure-Python baseline JPEG codec (pipeline/jpeg.py): round-trip error
bounds, subsampling, gray exactness, spec-feature coverage, and an
independent-DCT cross-check so an encoder/decoder transform bug can't
cancel itself out."""

import numpy as np
import pytest

from incubator_druid_spark.pipeline.jpeg import (_A, decode_baseline_jpeg,
                                                 encode_baseline_jpeg)


def _img(h, w, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // max(w - 1, 1),
                    yy * 255 // max(h - 1, 1),
                    (xx + yy) * 255 // (h + w - 2)], axis=-1)
    img = img + rng.integers(-12, 12, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_dct_matrix_matches_direct_formula():
    # the shared basis must be DCT-II per T.81 — computed here from the
    # textbook double loop, independent of the vectorized construction
    ref = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
        for x in range(8):
            ref[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    assert np.allclose(_A, ref, atol=1e-15)
    # orthonormality: A @ A.T = I (inverse is the transpose)
    assert np.allclose(_A @ _A.T, np.eye(8), atol=1e-12)


def test_roundtrip_444_near_lossless():
    img = _img(21, 37)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=1))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    # quant=1: only YCbCr forward/inverse rounding + DCT round-off
    assert err.max() <= 3, err.max()


def test_roundtrip_420_subsampled():
    img = _img(32, 48, seed=9)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=1,
                                                    subsample=True))
    assert dec.shape == img.shape
    # chroma is box-averaged 2x2: luma stays tight, chroma off by the
    # local color gradient only
    y = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    yd = 0.299 * dec[..., 0] + 0.587 * dec[..., 1] + 0.114 * dec[..., 2]
    assert np.abs(y - yd).max() <= 6
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 8


def test_solid_gray_exact():
    for v in (0, 1, 77, 128, 200, 255):
        img = np.full((12, 20, 3), v, np.uint8)
        dec = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=1))
        assert (dec == v).all(), v


def test_coarse_quant_still_close():
    img = _img(24, 24, seed=5)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=8))
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 10


def test_byte_stuffing_exercised():
    # an image whose entropy stream contains 0xFF bytes must round-trip;
    # scan many seeds so at least one stream holds a stuffed byte
    hit = False
    for seed in range(12):
        img = _img(16, 16, seed=seed)
        data = encode_baseline_jpeg(img, quant=1)
        scan = data[data.find(b"\xFF\xDA") + 14:-2]
        if b"\xFF\x00" in scan:
            hit = True
        dec = decode_baseline_jpeg(data)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3
    assert hit, "no stream exercised stuffing — widen the seed range"


def test_progressive_matches_baseline_exactly():
    """Progressive (SOF2) decode must be coefficient-identical to the
    baseline decode of the same image: every band reaches Al=0, so the
    accumulated successive-approximation stream carries the same
    quantized coefficients (T.81 G)."""
    from incubator_druid_spark.pipeline.jpeg import encode_progressive_jpeg
    for shape, seed in (((8, 8), 1), ((17, 23), 2), ((40, 56), 3)):
        for sub in (False, True):
            img = _img(*shape, seed=seed)
            base = decode_baseline_jpeg(
                encode_baseline_jpeg(img, quant=1, subsample=sub))
            prog = decode_baseline_jpeg(
                encode_progressive_jpeg(img, quant=1, subsample=sub))
            assert np.array_equal(base, prog), (shape, sub)


def test_progressive_deep_approximation_ladder():
    """A 3-level successive-approximation script (Al=2 -> 1 -> 0 for DC
    and every AC band) exercises EOB runs, ZRL-in-refinement, and
    correction-bit interleaving; still bit-exact vs baseline."""
    from incubator_druid_spark.pipeline.jpeg import encode_progressive_jpeg
    deep = (
        ((0, 1, 2), 0, 0, 0, 2),
        ((0,), 1, 2, 0, 2), ((0,), 3, 63, 0, 2),
        ((1,), 1, 63, 0, 2), ((2,), 1, 63, 0, 2),
        ((0, 1, 2), 0, 0, 2, 1),
        ((0,), 1, 2, 2, 1), ((0,), 3, 63, 2, 1),
        ((1,), 1, 63, 2, 1), ((2,), 1, 63, 2, 1),
        ((0, 1, 2), 0, 0, 1, 0),
        ((0,), 1, 2, 1, 0), ((0,), 3, 63, 1, 0),
        ((1,), 1, 63, 1, 0), ((2,), 1, 63, 1, 0),
    )
    rng = np.random.default_rng(11)
    imgs = [
        _img(33, 41, seed=4),
        np.full((24, 24, 3), 130, np.uint8),  # all-EOB AC scans
        np.kron(rng.integers(0, 256, (4, 5, 3), dtype=np.uint8),
                np.ones((8, 8, 1), np.uint8)),  # hard edges, long runs
    ]
    for img in imgs:
        for q in (1, 4):
            base = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=q))
            prog = decode_baseline_jpeg(encode_progressive_jpeg(
                img, quant=q, scans=deep))
            assert np.array_equal(base, prog)


def test_arithmetic_coding_raises_by_name():
    img = _img(8, 8)
    data = bytearray(encode_baseline_jpeg(img))
    i = data.find(b"\xFF\xC0")
    data[i + 1] = 0xC9  # SOF9: arithmetic sequential
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_baseline_jpeg(bytes(data))


def test_truncated_and_non_jpeg_raise():
    with pytest.raises(ValueError, match="SOI"):
        decode_baseline_jpeg(b"\x00\x01\x02")


def test_multimodal_dispatch_decodes_jpeg(spark):
    """decode_image_features(fake=False) routes FFD8 magic through the
    baseline decoder inside the Arrow kernel."""
    import pandas as pd

    from incubator_druid_spark.pipeline.multimodal import \
        decode_image_features
    img = np.full((10, 14, 3), 99, np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "content": [encode_baseline_jpeg(img)]}))
    out = decode_image_features(df, fake=False).first()
    assert (out["width"], out["height"]) == (14, 10)
    assert round(out["feat"][0] * 255) == 99
