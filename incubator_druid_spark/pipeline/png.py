"""Pure-Python PNG codec (ISO/IEC 15948 / RFC 2083) on stdlib zlib.

Decoder: 8-bit greyscale / RGB / greyscale+alpha / RGBA and 1/2/4/8-bit
palette images, all five scanline filters, non-interlaced and Adam7.
16-bit channels and private bit depths raise by name.  Encoder: 8-bit
grey / RGB / RGBA, non-interlaced, per-row filter heuristic (None or Sub).

Written from the specification for the multimodal pipeline
(pipeline/multimodal.py) — the second-dominant web-corpus image format
after baseline JPEG (pipeline/jpeg.py).  The reference has no image code
at all; this exists for the LLM-training-data brief, not SURVEY §2."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# (color type -> samples per pixel)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7: (x offset, y offset, x step, y step) per pass
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytearray:
    """Undo the per-scanline filter; raw is h*(1+stride) filtered bytes."""
    out = bytearray(h * stride)
    pos = 0
    prev_off = -stride
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = raw[pos:pos + stride]
        pos += stride
        off = y * stride
        if ft == 0:
            out[off:off + stride] = line
        elif ft == 1:  # Sub
            for i in range(stride):
                a = out[off + i - bpp] if i >= bpp else 0
                out[off + i] = (line[i] + a) & 0xFF
        elif ft == 2:  # Up
            if y == 0:
                out[off:off + stride] = line
            else:
                for i in range(stride):
                    out[off + i] = (line[i] + out[prev_off + off + i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = out[off + i - bpp] if i >= bpp else 0
                b = out[prev_off + off + i] if y else 0
                out[off + i] = (line[i] + ((a + b) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = out[off + i - bpp] if i >= bpp else 0
                b = out[prev_off + off + i] if y else 0
                c = out[prev_off + off + i - bpp] if (y and i >= bpp) else 0
                out[off + i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ft} on row {y}")
    return out


def _unpack_bits(row: bytes, depth: int, w: int) -> list[int]:
    """Expand sub-byte sample packing (palette/grey depths 1/2/4)."""
    if depth == 8:
        return list(row[:w])
    per = 8 // depth
    mask = (1 << depth) - 1
    out = []
    for byte in row:
        for k in range(per - 1, -1, -1):
            out.append((byte >> (k * depth)) & mask)
            if len(out) == w:
                return out
    return out[:w]


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 array (grey → 1, RGB → 3,
    grey+alpha → 2, RGBA → 4; palette expands to its sample count)."""
    data = bytes(data)
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, plte, trns, idat = 8, None, None, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if ctype in (b"IHDR", b"PLTE", b"IDAT") \
                and zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: bad CRC on {ctype.decode()} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR or IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"PNG: compression={comp} filter={filt} unsupported")
    if color not in _CHANNELS:
        raise ValueError(f"PNG: unknown color type {color}")
    if depth == 16 or (color != 3 and color != 0 and depth != 8) \
            or (color in (0, 3) and depth not in (1, 2, 4, 8)):
        raise NotImplementedError(
            f"PNG bit depth {depth} for color type {color}; 8-bit channels "
            "and 1/2/4/8-bit palette/greyscale supported")
    raw = zlib.decompress(b"".join(idat))
    ch = _CHANNELS[color]

    def read_subimage(buf, sw, sh):
        """Unfilter one (sub)image of sw x sh pixels → (sh, sw, ch) samples."""
        if sw == 0 or sh == 0:
            return np.zeros((sh, sw, ch), np.uint8), 0
        bits = depth * ch
        stride = (sw * bits + 7) // 8
        bpp = max(1, bits // 8)
        need = sh * (1 + stride)
        pixels = _unfilter(buf[:need], sh, stride, bpp)
        if depth == 8:
            arr = np.frombuffer(bytes(pixels), np.uint8).reshape(sh, sw * ch)
            arr = arr.reshape(sh, sw, ch)
        else:
            rows = [_unpack_bits(pixels[y * stride:(y + 1) * stride],
                                 depth, sw) for y in range(sh)]
            arr = np.array(rows, np.uint8).reshape(sh, sw, 1)
            if color == 0:  # scale sub-byte greys to 8-bit range
                arr = (arr * (255 // ((1 << depth) - 1))).astype(np.uint8)
        return arr, need

    if interlace == 0:
        img, _ = read_subimage(raw, w, h)
    elif interlace == 1:  # Adam7
        img = np.zeros((h, w, ch), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            sw = (w - x0 + dx - 1) // dx
            sh = (h - y0 + dy - 1) // dy
            sub, used = read_subimage(raw[off:], sw, sh)
            off += used
            if sw and sh:
                img[y0::dy, x0::dx] = sub
    else:
        raise ValueError(f"PNG: unknown interlace method {interlace}")

    if color == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        out = pal[img[..., 0]]
        if trns is not None:
            alpha = np.full(len(pal), 255, np.uint8)
            alpha[:len(trns)] = np.frombuffer(trns, np.uint8)
            out = np.dstack([out, alpha[img[..., 0]]])
        return out.copy()
    return img.copy()


def decode_png_rgb(data: bytes) -> np.ndarray:
    """decode_png + normalize to (h, w, 3) RGB — the multimodal pipeline's
    image contract (greys replicate, alpha drops; matches PPM/BMP/JPEG)."""
    arr = decode_png(data)
    ch = arr.shape[2]
    if ch == 1:
        return np.repeat(arr, 3, axis=2)
    if ch == 2:  # grey + alpha
        return np.repeat(arr[..., :1], 3, axis=2)
    return arr[..., :3].copy() if ch == 4 else arr


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """(h, w[, channels]) uint8 → non-interlaced 8-bit PNG.  1/3/4 channels
    map to grey/RGB/RGBA.  Per row, picks filter None or Sub by the
    smaller sum of absolute filtered bytes (the spec's cheap heuristic)."""
    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"encode_png: {ch}-channel input unsupported")
    lines = []
    for y in range(h):
        row = a[y].reshape(-1)
        sub = row.astype(np.int16)
        sub[ch:] -= row[:-ch]
        sub = (sub & 0xFF).astype(np.uint8)
        # widen BEFORE abs: np.abs(int8 -128) overflows back to -128,
        # driving costs negative on mid-grey-heavy rows
        none_cost = int(np.abs(row.astype(np.int8).astype(np.int64)).sum())
        sub_cost = int(np.abs(sub.astype(np.int8).astype(np.int64)).sum())
        if sub_cost < none_cost:
            lines.append(b"\x01" + sub.tobytes())
        else:
            lines.append(b"\x00" + row.tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines), level))
            + _chunk(b"IEND", b""))
