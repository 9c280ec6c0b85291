"""PNG codec tests (pipeline/png.py): independent chunk assembly here so
decoder bugs can't hide behind the encoder; round-trips pin the encoder."""

import struct
import zlib

import numpy as np
import pytest

from incubator_druid_spark.pipeline.png import (decode_png, decode_png_rgb,
                                                encode_png)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _png(w, h, depth, color, idat, extra=b"", interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + extra
            + _chunk(b"IDAT", zlib.compress(idat)) + _chunk(b"IEND", b""))


def _rng(seed=3):
    return np.random.RandomState(seed)


def test_roundtrip_rgb_grey_rgba():
    r = _rng()
    for shape in [(13, 7, 3), (5, 9, 1), (8, 8, 4)]:
        img = r.randint(0, 256, size=shape).astype(np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == shape
        assert np.array_equal(out, img)


def test_all_five_filters_decode():
    """One row per filter type, filtered by an independent reference
    implementation of the spec's definitions."""
    r = _rng(11)
    img = r.randint(0, 256, size=(5, 6, 3)).astype(np.uint8)
    h, w, ch = img.shape
    raw = bytearray()
    for y in range(h):
        ft = y % 5
        row = img[y].reshape(-1).astype(int)
        prev = img[y - 1].reshape(-1).astype(int) if y else np.zeros(w * ch, int)
        filt = []
        for i in range(w * ch):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] - a
            elif ft == 2:
                v = row[i] - b
            elif ft == 3:
                v = row[i] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = row[i] - pred
            filt.append(v & 0xFF)
        raw.append(ft)
        raw.extend(filt)
    out = decode_png(_png(w, h, 8, 2, bytes(raw)))
    assert np.array_equal(out, img)


def test_palette_depths_and_trns():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    # depth 8: 2x3 indexed image
    idx = np.array([[0, 1, 2], [3, 2, 1]], np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    out = decode_png(_png(3, 2, 8, 3, raw, extra=_chunk(b"PLTE", pal)))
    assert out.shape == (2, 3, 3)
    assert tuple(out[0, 0]) == (255, 0, 0) and tuple(out[1, 0]) == (9, 9, 9)
    # depth 4: two pixels per byte, high nibble first
    raw4 = b"\x00" + bytes([0x01, 0x20]) + b"\x00" + bytes([0x33, 0x10])
    out4 = decode_png(_png(3, 2, 4, 3, raw4, extra=_chunk(b"PLTE", pal)))
    assert [tuple(p) for p in out4[0]] == [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    # tRNS adds an alpha channel (entry 0 transparent, others opaque)
    outa = decode_png(_png(3, 2, 8, 3, raw,
                           extra=_chunk(b"PLTE", pal) + _chunk(b"tRNS", b"\x00")))
    assert outa.shape == (2, 3, 4)
    assert outa[0, 0, 3] == 0 and outa[0, 1, 3] == 255


def test_bit_depth_1_greyscale():
    # 10px wide: 2 bytes per row, MSB first; value 1 scales to 255
    rows = [0b10110000_01 << 6, 0b01001111_10 << 6]
    raw = b"".join(b"\x00" + v.to_bytes(2, "big") for v in rows)
    out = decode_png(_png(10, 2, 1, 0, raw))
    assert out.shape == (2, 10, 1)
    assert list(out[0, :, 0] // 255) == [1, 0, 1, 1, 0, 0, 0, 0, 0, 1]


def test_adam7_interlaced():
    """Pass extraction here follows the spec table independently of the
    decoder's reassembly loop."""
    r = _rng(5)
    img = r.randint(0, 256, size=(9, 10, 3)).astype(np.uint8)
    h, w = img.shape[:2]
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)
            raw.extend(row.reshape(-1).tobytes())
    out = decode_png(_png(w, h, 8, 2, bytes(raw), interlace=1))
    assert np.array_equal(out, img)


def test_rgb_normalization_contract():
    grey = np.full((4, 4, 1), 77, np.uint8)
    assert decode_png_rgb(encode_png(grey)).shape == (4, 4, 3)
    rgba = _rng(9).randint(0, 256, size=(3, 3, 4)).astype(np.uint8)
    out = decode_png_rgb(encode_png(rgba))
    assert out.shape == (3, 3, 3)
    assert np.array_equal(out, rgba[..., :3])


def test_error_paths():
    img = np.zeros((2, 2, 3), np.uint8)
    good = bytearray(encode_png(img))
    good[20] ^= 0xFF  # corrupt IHDR body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" * 4)
    deep = _png(1, 1, 16, 2, b"\x00" + b"\x00" * 6)
    with pytest.raises(NotImplementedError, match="bit depth 16"):
        decode_png(deep)


def test_multimodal_dispatch_decodes_png():
    from incubator_druid_spark.pipeline.multimodal import _decode_image
    img = _rng(2).randint(0, 256, size=(6, 5, 3)).astype(np.uint8)
    assert np.array_equal(_decode_image(encode_png(img)), img)
