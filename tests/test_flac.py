"""Pure-Python FLAC codec (pipeline/flac.py): FLAC is lossless over
integers, so every round-trip asserts EXACT sample equality — across
subframe types (verbatim / fixed / LPC), mono/stereo, mid/side
decorrelation, multiple blocks, and 8/16/24-bit depths."""

import numpy as np
import pytest

from incubator_druid_spark.pipeline.flac import decode_flac, encode_flac


def _sig(n, ch=1, seed=0, amp=20000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    base = (amp * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int64)
    out = np.stack([base + rng.integers(-500, 500, n) for _ in range(ch)],
                   axis=1)
    return np.clip(out, -32768, 32767)


@pytest.mark.parametrize("subframe", ["verbatim", "fixed", "lpc"])
@pytest.mark.parametrize("ch", [1, 2])
def test_roundtrip_exact(subframe, ch):
    x = _sig(5000, ch=ch, seed=ch)
    data = encode_flac(x, sample_rate=16000, bps=16, blocksize=1024,
                       subframe=subframe)
    y, sr, bps = decode_flac(data)
    assert (sr, bps) == (16000, 16)
    assert y.shape == x.shape
    assert np.array_equal(y, x), subframe


def test_mid_side_exact():
    x = _sig(3000, ch=2, seed=9)
    x[:, 1] = -x[:, 1] // 3  # decorrelated channels
    data = encode_flac(x, blocksize=512, subframe="fixed", mid_side=True)
    y, _, _ = decode_flac(data)
    assert np.array_equal(y, x)


def test_constant_and_silence():
    x = np.zeros((2000, 1), np.int64)
    y, _, _ = decode_flac(encode_flac(x, subframe="fixed"))
    assert np.array_equal(y, x)
    x = np.full((1500, 2), -12345, np.int64)
    y, _, _ = decode_flac(encode_flac(x, subframe="fixed", blocksize=600))
    assert np.array_equal(y, x)


def test_partial_last_block_and_odd_sizes():
    for n in (1, 7, 1023, 1025, 4097):
        x = _sig(n, seed=n)
        y, _, _ = decode_flac(encode_flac(x, blocksize=1024,
                                          subframe="fixed"))
        assert y.shape == x.shape and np.array_equal(y, x), n


def test_other_bit_depths():
    rng = np.random.default_rng(3)
    for bps in (8, 24):
        lim = 1 << (bps - 1)
        x = rng.integers(-lim, lim, (2500, 1))
        y, _, got = decode_flac(encode_flac(x, bps=bps, subframe="fixed"))
        assert got == bps and np.array_equal(y, x), bps


def test_extreme_residuals_escape_path():
    # alternating full-scale values make rice useless; the encoder escapes
    # to raw residuals and decode must still be exact
    x = np.tile(np.array([[32767], [-32768]], np.int64), (800, 1))
    rng = np.random.default_rng(5)
    x[rng.integers(0, len(x), 100), 0] = 0
    y, _, _ = decode_flac(encode_flac(x, subframe="fixed"))
    assert np.array_equal(y, x)


def test_not_flac_raises():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFF....WAVE")


def test_multimodal_audio_dispatch():
    from incubator_druid_spark.pipeline.multimodal import _decode_audio
    x = np.full((1600, 1), 8000, np.int64)  # constant amplitude, 0.1 s
    dur, sr, loud = _decode_audio(encode_flac(x, sample_rate=16000,
                                              subframe="fixed"))
    assert (dur, sr) == (100, 16000)
    assert loud == pytest.approx(8000 / 32768.0, abs=1e-6)
