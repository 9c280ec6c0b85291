"""GIF codec tests (pipeline/gif.py).  Round-trips pin the encoder; the
hand-assembled fixtures pin the decoder independently (a 2×2 image whose
LZW stream is written out bit-by-bit from the GIF89a spec's Appendix F
walkthrough conventions)."""

import numpy as np
import pytest

from incubator_druid_spark.pipeline.gif import (decode_gif, encode_gif,
                                                gif_frame_count)


def _rng(seed=7):
    return np.random.RandomState(seed)


def test_roundtrip_random_palettes():
    r = _rng()
    for (h, w, ncolors) in [(9, 13, 7), (16, 16, 256), (1, 1, 1),
                            (23, 5, 61)]:
        palette = r.randint(0, 256, size=(ncolors, 3)).astype(np.uint8)
        idx = r.randint(0, ncolors, size=(h, w))
        img = palette[idx]
        out = decode_gif(encode_gif(img))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, img)


def test_roundtrip_interlaced():
    r = _rng(5)
    img = r.randint(0, 4, size=(11, 6, 3)).astype(np.uint8) * 80
    out = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(out, img)


def test_roundtrip_forces_code_width_growth():
    """>2^8 dictionary entries → the LZW code width must widen in sync
    between encoder and decoder."""
    r = _rng(11)
    img = r.randint(0, 256, size=(64, 64, 1)).astype(np.uint8)
    img = np.repeat(img, 3, axis=2)  # grey → ≤256 distinct colors
    out = decode_gif(encode_gif(img))
    assert np.array_equal(out, img)


def test_hand_assembled_minimal_gif():
    """2×2 two-color GIF assembled byte-by-byte (no encoder involved):
    white/black checker, min LZW code size 2, codes CLEAR,0,1,1,0,EOI."""
    white, black = (255, 255, 255), (0, 0, 0)
    data = bytearray()
    data += b"GIF89a"
    data += (2).to_bytes(2, "little") * 2        # 2×2 screen
    data += bytes([0x80, 0, 0])                  # GCT of 2, bg 0
    data += bytes(white) + bytes(black)          # palette 0=white 1=black
    data += b"\x2C" + b"\x00" * 4
    data += (2).to_bytes(2, "little") * 2
    data += b"\x00"                              # no LCT, no interlace
    data += bytes([2])                           # min LZW code size
    # LSB-first codes: CLEAR(4),0,1,1 at 3 bits; after the third data
    # code the decoder's table reaches 8 entries and the width grows, so
    # the final 0 and EOI(5) are 4-bit codes
    codes = [(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)]
    acc = nbits = 0
    payload = bytearray()
    for c, sz in codes:
        acc |= c << nbits
        nbits += sz
        while nbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        payload.append(acc & 0xFF)
    data += bytes([len(payload)]) + bytes(payload) + b"\x00\x3B"
    out = decode_gif(bytes(data))
    assert out.tolist() == [[list(white), list(black)],
                            [list(black), list(white)]]


def test_transparency_and_frame_count():
    """A GCE transparent index renders as the DECLARED background color
    (the same color an uncovered canvas border shows — compositing
    transparent pixels to black while the border gets the background
    would skew decoded values inconsistently); frame counting sees both
    descriptors of an animation."""
    img = np.full((3, 3, 3), 200, np.uint8)
    img[1, 1] = (10, 20, 30)
    base = bytearray(encode_gif(img))
    # splice a graphic-control extension marking palette index of (10,20,30)
    # as transparent, just before the image descriptor
    desc = base.index(0x2C)
    palette, _ = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
    t_idx = int(np.where((palette == (10, 20, 30)).all(axis=1))[0][0])
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, t_idx, 0])
    data = bytes(base[:desc]) + gce + bytes(base[desc:])
    out = decode_gif(data)
    # background = gct[bg_index]; bg_index is byte 11 of the header and the
    # global color table starts at byte 13
    bg_index = data[11]
    bg = tuple(data[13 + 3 * bg_index:13 + 3 * bg_index + 3])
    assert tuple(out[1, 1]) == bg
    assert tuple(out[0, 0]) == (200, 200, 200)
    assert gif_frame_count(data) == 1

    # two frames back-to-back
    frame = bytes(base[desc:-1])  # descriptor..before trailer
    two = bytes(base[:desc]) + frame + frame + b"\x3B"
    assert gif_frame_count(two) == 2
    assert np.array_equal(decode_gif(two), img)


def test_gif_through_multimodal_dispatch():
    from incubator_druid_spark.pipeline.multimodal import _decode_image
    img = _rng(3).randint(0, 5, size=(4, 4, 3)).astype(np.uint8) * 50
    out = _decode_image(encode_gif(img))
    assert np.array_equal(out, img)


def test_too_many_colors_raises():
    r = _rng(13)
    img = r.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    with pytest.raises(ValueError):
        encode_gif(img)
