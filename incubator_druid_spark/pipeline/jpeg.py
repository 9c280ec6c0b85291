"""Pure-Python baseline JPEG codec (stdlib + numpy only).

Decoder: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components, any
h/v subsampling factors in {1, 2}, DQT (8/16-bit), multiple DHT segments,
DRI/RSTn restart markers, APPn/COM skip.  This covers the dominant
real-corpus image format for the multimodal pipeline
(pipeline/multimodal.py) without a codec library in the environment.
Progressive (SOF2), arithmetic coding, and 12-bit precision raise
NotImplementedError naming the feature.

Encoder: minimal baseline writer (4:4:4 or 4:2:0, custom flat Huffman
tables embedded in the stream, configurable quant tables) — used by tests
and fixture generators; decode(encode(x)) round-trips bound the whole
pipeline (Huffman, stuffing, zigzag, dequant, IDCT, upsample, color
transform) without a reference library.

Reference semantics: ITU-T T.81 (the JPEG spec); the fake-decode fallback
and feature pooling live in pipeline/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index -> raster index (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II basis: F = A @ f @ A.T, f = A.T @ F @ A."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(1.0 / 8) if u == 0 else np.sqrt(2.0 / 8)
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _dct_matrix()


# ---------------------------------------------------------------------------
# bit I/O over the entropy-coded segment
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader with 0xFF00 unstuffing; RSTn markers end the
    current run (consumed by the MCU loop via `restart`)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartHit()
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self):
        """Byte-align, consume the RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        m = self.data[self.pos + 1]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError(f"expected RST marker, got 0xFF{m:02X}")
        self.pos += 2


class _RestartHit(Exception):
    pass


def _huff_table(counts: list[int], symbols: bytes) -> dict:
    """Canonical Huffman: {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map the s-bit magnitude to its signed value."""
    if s == 0:
        return 0
    return v - ((1 << s) - 1) if v < (1 << (s - 1)) else v


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, 3) uint8 RGB (grayscale replicates)."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or corrupt JPEG stream: {e}") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                o += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, o).astype(np.int32)
                    o += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, o).astype(np.int32)
                    o += 128
                q = np.zeros(64, np.int32)
                q[ZIGZAG] = tbl
                qt[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                counts = list(seg[o + 1:o + 17])
                n = sum(counts)
                symbols = seg[o + 17:o + 17 + n]
                (dc_tables if tc == 0 else ac_tables)[th] = \
                    _huff_table(counts, symbols)
                o += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (progressive/arithmetic/"
                "hierarchical) — only baseline sequential (SOF0/1) supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"id": cs, "dc": tables >> 4, "ac": tables & 0x0F})
            return _decode_scan(data, pos + seglen, frame, scan, qt,
                                dc_tables, ac_tables, restart_interval)
        # APPn / COM / others: skip
        pos += seglen


def _decode_scan(data, pos, frame, scan, qt, dc_tables, ac_tables,
                 restart_interval) -> np.ndarray:
    if frame is None:
        raise ValueError("SOS before SOF")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] for s in scan]
    for c, s in zip(order, scan):
        c["dct"] = dc_tables[s["dc"]]
        c["act"] = ac_tables[s["ac"]]
        c["q"] = qt[c["tq"]]
        cw, ch = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        c["plane"] = np.zeros((ch, cw), np.float64)
        c["pred"] = 0

    br = _BitReader(data, pos)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.restart()
                for c in order:
                    c["pred"] = 0
            for c in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(br, c)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0:y0 + 8, x0:x0 + 8] = blk
            mcu += 1

    planes = []
    for c in order:
        p = c["plane"]
        # upsample to full MCU-grid resolution, then crop to (h, w)
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(br: _BitReader, c) -> np.ndarray:
    coef = np.zeros(64, np.float64)
    s = _huff_decode(br, c["dct"])
    diff = _extend(br.read_bits(s), s)
    c["pred"] += diff
    coef[0] = c["pred"]
    k = 1
    while k < 64:
        rs = _huff_decode(br, c["act"])
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[ZIGZAG[k]] = _extend(br.read_bits(size), size)
        k += 1
    blk = coef.reshape(8, 8) * c["q"]
    return _A.T @ blk @ _A + 128.0


# ---------------------------------------------------------------------------
# encoder (tests / fixture generation)
# ---------------------------------------------------------------------------

# flat canonical tables: 12 DC symbols at 4 bits, 162 AC symbols at 8 bits
# (Kraft-satisfying, never the all-ones code); written into the stream, so
# ANY spec-compliant decoder reads them back
_DC_SYMS = bytes(range(12))
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_AC_SYMS = bytes([0x00, 0xF0] + [(r << 4) | s
                                 for r in range(16) for s in range(1, 11)])
_AC_COUNTS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8


def _enc_table(counts, symbols):
    """symbol -> (code, length) canonical assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _enc_table(_DC_COUNTS, _DC_SYMS)
_AC_ENC = _enc_table(_AC_COUNTS, _AC_SYMS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # stuffing
        # keep only the undrained low bits — an ever-growing accumulator
        # makes each shift O(total bits written) (quadratic encode)
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


def _mag_bits(v: int) -> tuple[int, int]:
    """signed value -> (size category, magnitude bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_plane_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                        pred: int) -> int:
    coef = np.round((_A @ (block - 128.0) @ _A.T) / q).astype(np.int64)
    zz = coef.flatten()[ZIGZAG]
    s, bits = _mag_bits(int(zz[0]) - pred)
    code, ln = _DC_ENC[s]
    bw.put(code, ln)
    if s:
        bw.put(bits, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_ENC[0xF0]
            bw.put(code, ln)
            run -= 16
        s, bits = _mag_bits(v)
        code, ln = _AC_ENC[(run << 4) | s]
        bw.put(code, ln)
        bw.put(bits, s)
        run = 0
    if run:
        code, ln = _AC_ENC[0x00]
        bw.put(code, ln)
    return int(zz[0])


def encode_baseline_jpeg(rgb: np.ndarray, quant: int = 1,
                         subsample: bool = False) -> bytes:
    """(h, w, 3) uint8 → baseline JFIF bytes.  quant = uniform quant value
    for every coefficient (1 = near-lossless); subsample=True emits 4:2:0
    with box-averaged chroma."""
    h, w = rgb.shape[:2]
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
    cb = np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
    cr = np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
    y, cb, cr = (np.clip(p, 0, 255) for p in (y, cb, cr))

    sh, sv = (2, 2) if subsample else (1, 1)
    qtbl = np.full((8, 8), quant, np.int32)

    def pad(p, mult):
        ph = -(-p.shape[0] // mult) * mult
        pw = -(-p.shape[1] // mult) * mult
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    ymcu = 8 * sv
    yp = pad(y, ymcu)
    if subsample:
        che = pad(cb, 16), pad(cr, 16)
        cbp = che[0].reshape(che[0].shape[0] // 2, 2, -1, 2).mean((1, 3))
        crp = che[1].reshape(che[1].shape[0] // 2, 2, -1, 2).mean((1, 3))
        cbp, crp = np.round(cbp), np.round(crp)
    else:
        cbp, crp = pad(cb, 8), pad(cr, 8)

    out = bytearray(b"\xFF\xD8")  # SOI
    # DQT (table 0, 8-bit)
    zz = qtbl.flatten()[ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + zz
    # SOF0: 3 components, y uses (sh, sv)
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, (sh << 4) | sv, 0, 2, 0x11, 0, 3, 0x11, 0])
    # DHT: DC class 0 id 0, AC class 1 id 0 (shared by all components)
    for tc, counts, syms in ((0, _DC_COUNTS, _DC_SYMS),
                             (1, _AC_COUNTS, _AC_SYMS)):
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(syms))
        out += bytes([tc << 4]) + bytes(counts[:16]) + syms
    # SOS
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])

    bw = _BitWriter()
    mcus_y = yp.shape[0] // ymcu
    mcus_x = yp.shape[1] // (8 * sh)
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(sv):
                for bx in range(sh):
                    y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                    preds[0] = _encode_plane_block(
                        bw, yp[y0:y0 + 8, x0:x0 + 8], qtbl, preds[0])
            for ci, p in ((1, cbp), (2, crp)):
                y0, x0 = my * 8, mx * 8
                preds[ci] = _encode_plane_block(
                    bw, p[y0:y0 + 8, x0:x0 + 8], qtbl, preds[ci])
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)
