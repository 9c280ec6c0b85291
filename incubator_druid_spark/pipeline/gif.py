"""Pure-Python GIF codec (GIF87a/89a, first frame) — no external libs.

Decoder: logical screen descriptor, global/local color tables, extension
blocks (graphic-control transparency honored), interlaced frames, and the
variable-width LSB-first LZW image data (GIF89a spec Appendix F).  Returns
the FIRST image frame composited onto the logical screen as an
(h, w, 3) uint8 RGB array — animation beyond frame 1 is out of scope for
feature extraction (the n_frames metadata counts descriptors).

Encoder: a real growing-dictionary LZW encoder over a ≤256-color palette
(raises for richer images) — exists so the decoder can be round-trip
tested without fixture binaries.

Reference parity note: the reference repo contains no image code at all;
this implements the GIF89a specification directly (the multimodal
pipeline brief), like pipeline/jpeg.py and pipeline/png.py."""

from __future__ import annotations

import numpy as np


def _u16(data: bytes, pos: int) -> int:
    return data[pos] | (data[pos + 1] << 8)


def _lzw_decode(data: bytes, min_code_size: int, npix: int) -> bytearray:
    """GIF LZW: LSB-first bit packing, CLEAR/EOI codes, 12-bit cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    bitpos, total = 0, len(data) * 8
    while len(out) < npix and bitpos + code_size <= total:
        byte = bitpos >> 3
        code = (int.from_bytes(data[byte:byte + 3], "little")
                >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = table[:clear] + [b"", b""]
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return out


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = np.empty(h, dtype=np.int64)
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    rows[np.asarray(order, dtype=np.int64)] = np.arange(h)
    return idx.reshape(h, w)[rows].reshape(-1)


def decode_gif(data: bytes) -> np.ndarray:
    """First frame → (h, w, 3) uint8 RGB over the logical screen."""
    if bytes(data[:6]) not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = _u16(data, 6), _u16(data, 8)
    packed, bg_index = data[10], data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    transparent: int | None = None
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4 and data[pos + 1] & 1:
                transparent = data[pos + 4]
            while data[pos] != 0:
                pos += data[pos] + 1
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            left, top = _u16(data, pos + 1), _u16(data, pos + 3)
            iw, ih = _u16(data, pos + 5), _u16(data, pos + 7)
            flags = data[pos + 9]
            pos += 10
            lct = None
            if flags & 0x80:
                n = 2 << (flags & 7)
                lct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            min_code_size = data[pos]
            pos += 1
            chunks = []
            while data[pos] != 0:
                n = data[pos]
                chunks.append(data[pos + 1:pos + 1 + n])
                pos += n + 1
            pos += 1
            idx = np.frombuffer(
                bytes(_lzw_decode(b"".join(chunks), min_code_size,
                                  iw * ih)), np.uint8)
            if len(idx) < iw * ih:
                raise ValueError("truncated GIF image data")
            idx = idx[:iw * ih].astype(np.int64)
            if flags & 0x40:
                idx = _deinterlace(idx, iw, ih)
            table = lct if lct is not None else gct
            if table is None:
                raise ValueError("GIF frame without a color table")
            frame = table[np.minimum(idx, len(table) - 1)].reshape(ih, iw, 3)
            canvas_color = (gct[bg_index] if gct is not None
                            and bg_index < len(gct) else np.zeros(3, np.uint8))
            if transparent is not None:
                # transparent pixels show the canvas — compositing them to
                # black while the uncovered border renders the background
                # color would skew the decoded values inconsistently
                mask = (idx == transparent).reshape(ih, iw)
                frame = frame.copy()
                frame[mask] = canvas_color.astype(np.uint8)
            canvas = np.broadcast_to(
                canvas_color.astype(np.uint8), (sh, sw, 3)).copy()
            canvas[top:top + ih, left:left + iw] = frame[
                :max(0, min(ih, sh - top)), :max(0, min(iw, sw - left))]
            return canvas
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image data")


def gif_frame_count(data: bytes) -> int:
    """Count image descriptors (animation frames) without decoding."""
    if bytes(data[:6]) not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    packed = data[10]
    pos = 13 + ((2 << (packed & 7)) * 3 if packed & 0x80 else 0)
    frames = 0
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:
            pos += 2
            while data[pos] != 0:
                pos += data[pos] + 1
            pos += 1
        elif b0 == 0x2C:
            frames += 1
            flags = data[pos + 9]
            pos += 10 + ((2 << (flags & 7)) * 3 if flags & 0x80 else 0)
            pos += 1  # min code size
            while data[pos] != 0:
                pos += data[pos] + 1
            pos += 1
        else:
            break
    return frames


# ---------------------------------------------------------------------------
# Encoder (round-trip testing)
# ---------------------------------------------------------------------------

def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, code_size)
    prev = b""
    for v in indices.tolist():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], code_size)
        # grow the decoder-synchronized table; the decoder widens when ITS
        # table reaches 2^code_size, i.e. after registering next_code
        table[cur] = next_code
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        next_code += 1
        if next_code == 4096:
            emit(clear, code_size)
            code_size = min_code_size + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
        prev = bytes([v])
    if prev:
        emit(table[prev], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → single-frame GIF89a (≤256 distinct colors)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors; GIF allows 256")
    bits = max(2, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << bits, 3), np.uint8)
    table[:len(palette)] = palette
    idx = idx.astype(np.uint8)
    if interlace:
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        idx = idx.reshape(h, w)[np.asarray(order)].reshape(-1)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag+size, bg 0, ratio 0
    out += table.tobytes()
    out += b"\x2C" + b"\x00" * 4
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0])
    out += bytes([bits])
    payload = _lzw_encode(idx, bits)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)