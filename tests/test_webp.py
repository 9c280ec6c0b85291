"""VP8L (lossless WebP) decoder tests — RFC 9649 §3.

Round-trips against the module's test-vector encoder (literal pixels,
subtract-green, color-indexing with every bundling width), plus
hand-crafted bitstreams for the paths the encoder doesn't emit: LZ77
backward references (2D distance map + direct distances) and the color
cache.  The lossy-VP8 refusal and the multimodal dispatch are asserted
at the container level."""

import numpy as np
import pytest

from incubator_druid_spark.pipeline import webp as W


def _rand(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3),
                                                dtype=np.uint8)


def test_literal_roundtrip():
    img = _rand(9, 13, 7)
    assert np.array_equal(W.decode_vp8l(W.encode_vp8l(img)), img)


def test_single_pixel_and_row():
    one = _rand(1, 1, 1)
    assert np.array_equal(W.decode_vp8l(W.encode_vp8l(one)), one)
    row = _rand(1, 17, 2)
    assert np.array_equal(W.decode_vp8l(W.encode_vp8l(row)), row)


def test_subtract_green_roundtrip():
    img = _rand(6, 8, 3)
    data = W.encode_vp8l(img, subtract_green=True)
    assert np.array_equal(W.decode_vp8l(data), img)


@pytest.mark.parametrize("ncolors", [2, 4, 16, 40])
def test_palette_roundtrip_all_bundlings(ncolors):
    """Color-indexing inverse at every packing width: 2 colors → 8
    pixels/byte, 4 → 4, 16 → 2, >16 → plain index."""
    rng = np.random.RandomState(ncolors)
    palette = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.randint(0, ncolors, (7, 11))
    img = palette[idx]
    assert np.array_equal(W.decode_vp8l(W._encode_palette(img)), img)


def _header(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms


def test_lz77_backward_reference():
    """Hand-crafted stream: literal green-10 pixel, literal green-20,
    then a length-2 distance-1 copy (plane code 1 → (1,0)) — decodes to
    [A, B, B, B]."""
    bw = W._BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    codes = W._canonical_codes({10: 2, 20: 2, 257: 1})
    W._write_sparse_code(bw, {10: 2, 20: 2, 257: 1}, 256 + 24)
    for _ in range(3):  # red, blue, alpha: constant 0
        W._write_simple_single(bw, 0)
    W._write_simple_single(bw, 1)  # distance code: symbol 1 → v=2 → pc=1
    def emit(sym):
        ln, code = codes[sym]
        W._write_code_msb(bw, code, ln)
    emit(10)   # literal A (green 10)
    emit(20)   # literal B (green 20)
    emit(257)  # length code 1 → length 2; distance symbol read: 0 bits
    data = W._riff_wrap(bytes([0x2F]) + bytes(bw.out))
    out = W.decode_vp8l(data)
    assert out[0, :, 1].tolist() == [10, 20, 20, 20]


def test_color_cache_hit():
    """Hand-crafted stream with a 4-bit color cache: a literal pixel then
    a cache reference to it."""
    cache_bits = 4
    px = (0xFF << 24) | (7 << 16) | (10 << 8) | 200
    h = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    alphabet = 256 + 24 + (1 << cache_bits)
    bw = W._BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)               # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)               # no meta prefix
    glens = {10: 1, 256 + 24 + h: 1}
    codes = W._canonical_codes(glens)
    W._write_sparse_code(bw, glens, alphabet)
    W._write_simple_single(bw, 7)    # red
    W._write_simple_single(bw, 200)  # blue
    W._write_simple_single(bw, 0xFF)  # alpha
    W._write_simple_single(bw, 0)    # distance (unused)
    ln, code = codes[10]
    W._write_code_msb(bw, code, ln)        # literal → fills cache slot h
    ln, code = codes[256 + 24 + h]
    W._write_code_msb(bw, code, ln)        # cache hit
    out = W.decode_vp8l(W._riff_wrap(bytes([0x2F]) + bytes(bw.out)))
    assert out[0, 0].tolist() == [7, 10, 200]
    assert out[0, 1].tolist() == [7, 10, 200]


def test_lossy_vp8_dispatches_to_keyframe_decoder():
    """Round 8: a 'VP8 ' chunk routes to the RFC 6386 intra decoder
    (pipeline/vp8.py) instead of the former named refusal; an EMPTY
    chunk fails cleanly as a truncated frame."""
    data = (b"RIFF" + (12).to_bytes(4, "little") + b"WEBP"
            + b"VP8 " + (0).to_bytes(4, "little"))
    with pytest.raises(ValueError, match="truncated"):
        W.decode_vp8l(data)
    import incubator_druid_spark.pipeline.vp8 as V
    frame = V.encode_vp8_keyframe(
        16, 16, [{"ymode": V.DC_PRED, "uvmode": V.DC_PRED, "skip": True}])
    chunk = b"VP8 " + len(frame).to_bytes(4, "little") + frame
    if len(frame) & 1:
        chunk += b"\x00"
    riff = (b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP"
            + chunk)
    assert W.decode_vp8l(riff).shape == (16, 16, 3)


def test_multimodal_dispatch(spark):
    """The image feature kernel decodes VP8L WEBP blobs end-to-end."""
    from incubator_druid_spark.pipeline.multimodal import (
        decode_image_features)
    img = _rand(8, 8, 5)
    df = spark.createDataFrame(
        [(1, bytearray(W.encode_vp8l(img)))], "id long, content binary")
    out = decode_image_features(df, fake=False).collect()
    assert len(out) == 1
    assert out[0]["width"] == 8 and out[0]["height"] == 8


def test_probe_reads_vp8l_dimensions():
    """The header probe tier reports VP8L dimensions without decode."""
    from incubator_druid_spark.pipeline.probe import probe_media
    img = _rand(23, 41, 9)
    meta = probe_media(W.encode_vp8l(img))
    assert meta.get("mime") == "image/webp"
    assert (meta.get("width"), meta.get("height")) == (41, 23)


def test_select_tie_prefers_top():
    """RFC 9649 Select: on a Manhattan-distance tie the prediction is T,
    not L (review fix)."""
    l = 0xFF020000  # noqa: E741
    t = 0xFF000002
    tl = 0xFF000000
    assert W._select(l, t, tl) == t


def test_cas_half_truncates_toward_zero():
    """ClampAddSubtractHalf uses C division (toward zero): ave 10, TL 13
    per channel → 10 + (-3)/2 = 9, not Python floor's 8."""
    ave = 0xFF0A0A0A
    tl = 0xFF0D0D0D
    out = W._cas_half(ave, tl)
    assert [(out >> s) & 0xFF for s in (16, 8, 0)] == [9, 9, 9]


def test_simple_two_symbol_descending_order():
    """A simple 2-symbol prefix code assigns bit 0 to the FIRST
    transmitted symbol even when symbols arrive descending."""
    bw = W._BitWriter()
    bw.write(1, 1)   # simple
    bw.write(1, 1)   # two symbols
    bw.write(1, 1)   # 8-bit first
    bw.write(200, 8)
    bw.write(3, 8)
    code = W._read_prefix_code(W._BitReader(bytes(bw.out)), 256)
    r = W._BitReader(bytes([0b10]))  # bits: 0 then 1
    assert code.read(r) == 200
    assert code.read(r) == 3


def test_predictor_transform_end_to_end():
    """Hand-built stream with a predictor transform (all blocks mode 2 =
    T): residuals forward-computed per spec edge rules, decode restores
    the original."""
    img = _rand(5, 6, 11)
    h, w = img.shape[:2]
    pixels = [(0xFF << 24) | (int(img[y, x, 0]) << 16)
              | (int(img[y, x, 1]) << 8) | int(img[y, x, 2])
              for y in range(h) for x in range(w)]
    # forward: residual = pixel - predicted (mod 256 per channel)
    res = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[i - 1]
            elif x == 0:
                pred = pixels[i - w]
            else:
                pred = pixels[i - w]  # mode 2 = T
            res.append(W._sub_px(pixels[i], pred))
    bw = W._BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # a transform
    bw.write(0, 2)  # predictor
    bw.write(2, 3)  # size_bits = 4 → one 16x16 block covers the image
    # mode subimage (1x1): mode 2 carried in the green channel
    bw.write(0, 1)  # no color cache (subimage)
    W._write_simple_single(bw, 2)     # green = mode 2
    for _ in range(3):
        W._write_simple_single(bw, 0)  # red, blue, alpha
    W._write_simple_single(bw, 0)      # distance
    bw.write(0, 1)  # end of transforms
    W._emit_literal_stream(bw, res, level0=True)
    out = W.decode_vp8l(W._riff_wrap(bytes([0x2F]) + bytes(bw.out)))
    assert np.array_equal(out, img)
