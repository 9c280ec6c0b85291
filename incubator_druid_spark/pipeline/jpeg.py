"""Pure-Python JPEG codec (stdlib + numpy only).

Decoder: baseline sequential (SOF0/1) AND progressive (SOF2) DCT, 8-bit,
1 or 3 components, any h/v subsampling factors in {1, 2}, DQT (8/16-bit),
multiple DHT segments, DRI/RSTn restart markers, APPn/COM skip.
Progressive covers the full T.81 surface: spectral selection (multi-band
AC scans with EOB runs), successive approximation (DC/AC first +
refinement scans, G.1.2.2-3), interleaved DC and non-interleaved AC
block orders.  Every scan accumulates into per-component coefficient
arrays; dequant + IDCT run once at EOI as one batched einsum.  Baseline +
progressive together cover essentially the whole real-world JPEG corpus;
arithmetic coding, hierarchical mode, and 12-bit precision raise
NotImplementedError naming the feature.

Encoder: baseline writer (4:4:4 or 4:2:0) plus a progressive writer with
a parameterizable scan script (default mirrors libjpeg's: approximated DC
first, per-component banded AC at Al>=1, then refinement scans to Al=0).
Flat Huffman tables are embedded in the stream, so ANY spec-compliant
decoder reads them back; decode(encode(x)) round-trips bound the whole
pipeline without a reference library, and progressive-vs-baseline decode
equality pins the scan machinery coefficient-exactly.

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
# ITU-T T.81 Annex K.3 "typical" Huffman tables.  MJPEG frames inside AVI
# containers conventionally OMIT their DHT segments and assume these; the
# decoder installs them when a scan references an undefined table
# (pipeline/avi.py).  The encoder can also emit streams coded with them
# (tables="standard") to generate DHT-less test vectors.
# ---------------------------------------------------------------------------

_STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                bytes(range(12)))
_STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  bytes(range(12)))
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]))
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]))


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
    """JPEG (baseline or progressive) → (h, w, 3) uint8 RGB (grayscale
    replicates).  The name predates progressive support; kept for callers."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or corrupt JPEG stream: {e}") from e


decode_jpeg = decode_baseline_jpeg


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scanned = False
    while True:
        if pos + 1 >= len(data):
            if scanned:
                break  # EOI-less but complete-enough stream
            raise ValueError("truncated JPEG stream: no scan data")
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if not scanned:
                raise ValueError("EOI before SOS")
            break
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = _init_frame(h, w, comps, progressive=(marker == 0xC2))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (arithmetic/hierarchical/"
                "lossless) — baseline (SOF0/1) and progressive (SOF2) "
                "supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"id": cs, "dc": tables >> 4,
                             "ac": tables & 0x0F})
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _run_scan(data, pos + seglen, frame, scan, ss, se,
                            ahal >> 4, ahal & 0x0F, dc_tables, ac_tables,
                            restart_interval)
            scanned = True
            if not frame["progressive"] and _scan_complete(frame):
                break  # sequential single/multi-scan done; tolerate no EOI
            continue
        # APPn / COM / others: skip
        pos += seglen
    return _reconstruct(frame, qt)


def _init_frame(h, w, comps, progressive):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        c["coef"] = np.zeros((bh, bw, 64), np.int32)
        # non-interleaved (single-component scan) block grid: the
        # component's own dimensions, NOT MCU-padded (T.81 A.2.2)
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        c["nbw"] = -(-cw // 8)
        c["nbh"] = -(-ch // 8)
        c["done"] = False
    return {"h": h, "w": w, "comps": comps, "hmax": hmax, "vmax": vmax,
            "mcus_x": mcus_x, "mcus_y": mcus_y, "progressive": progressive}


def _scan_complete(frame):
    return all(c["done"] for c in frame["comps"])


def _run_scan(data, pos, frame, scan, ss, se, ah, al, dc_tables, ac_tables,
              restart_interval) -> int:
    """Decode one entropy-coded scan into the frame's coefficient arrays;
    returns the position of the next marker."""
    by_id = {c["id"]: c for c in frame["comps"]}
    order = [by_id[s["id"]] for s in scan]
    prog = frame["progressive"]
    for c, s in zip(order, scan):
        c["dct"] = dc_tables.get(s["dc"])
        c["act"] = ac_tables.get(s["ac"])
        if c["dct"] is None:
            # DHT-less stream (MJPEG convention): fall back to the T.81
            # Annex K.3 typical tables — id 0 luma, id 1 chroma
            cnts, syms = _STD_DC_LUMA if s["dc"] == 0 else _STD_DC_CHROMA
            c["dct"] = dc_tables.setdefault(s["dc"],
                                            _huff_table(cnts, syms))
        if c["act"] is None:
            cnts, syms = _STD_AC_LUMA if s["ac"] == 0 else _STD_AC_CHROMA
            c["act"] = ac_tables.setdefault(s["ac"],
                                            _huff_table(cnts, syms))
        c["pred"] = 0
        if not prog:
            c["done"] = True
    br = _BitReader(data, pos)
    state = {"eobrun": 0}

    def restart():
        br.restart()
        state["eobrun"] = 0
        for c in order:
            c["pred"] = 0

    if len(order) == 1:
        c = order[0]
        n = c["nbw"] * c["nbh"]
        for i in range(n):
            if restart_interval and i and i % restart_interval == 0:
                restart()
            by, bx = divmod(i, c["nbw"])
            _decode_unit(br, c, by, bx, ss, se, ah, al, prog, state)
    else:
        mcu = 0
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    restart()
                for c in order:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            _decode_unit(br, c, my * c["v"] + by,
                                         mx * c["h"] + bx, ss, se, ah, al,
                                         prog, state)
                mcu += 1
    p = br.pos
    while p + 1 < len(data) and not (data[p] == 0xFF
                                     and data[p + 1] != 0x00):
        p += 1
    return p


def _decode_unit(br, c, by, bx, ss, se, ah, al, prog, state):
    coef = c["coef"][by, bx]
    if not prog:
        # sequential: full DC + AC block
        s = _huff_decode(br, c["dct"])
        c["pred"] += _extend(br.read_bits(s), s)
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
        return
    if ss == 0:  # DC band (progressive DC scans carry only coefficient 0)
        if ah == 0:
            s = _huff_decode(br, c["dct"])
            c["pred"] += _extend(br.read_bits(s), s)
            coef[0] = c["pred"] << al
        elif br.read_bit():
            coef[0] |= 1 << al
        return
    if ah == 0:  # AC first scan for this band (G.1.2.2)
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(br, c["act"])
            r, size = rs >> 4, rs & 0x0F
            if size == 0:
                if r < 15:  # EOBn: run of (1<<r)+bits blocks incl. this one
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += br.read_bits(r)
                    break
                k += 16  # ZRL
            else:
                k += r
                if k > se:
                    raise ValueError("AC run past end of band")
                coef[ZIGZAG[k]] = _extend(br.read_bits(size), size) << al
                k += 1
        return
    # AC refinement scan (G.1.2.3): newly-significant coefficients arrive
    # as ±1<<al; already-nonzero coefficients crossed by any run consume
    # one correction bit each (1 -> add 1<<al toward larger magnitude)
    p1 = 1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(br, c["act"])
            r, size = rs >> 4, rs & 0x0F
            val = 0
            if size == 0:
                if r < 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.read_bits(r)
                    break
                # ZRL: cross 16 zero-history positions
            else:  # size must be 1 in a refinement scan
                val = p1 if br.read_bit() else -p1
            while k <= se:
                z = ZIGZAG[k]
                if coef[z] != 0:
                    if br.read_bit() and (abs(int(coef[z])) & p1) == 0:
                        coef[z] += p1 if coef[z] > 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[ZIGZAG[k]] = val
            k += 1
    if state["eobrun"] > 0:
        # inside an EOB run the block's remaining nonzero coefficients
        # still receive correction bits
        while k <= se:
            z = ZIGZAG[k]
            if coef[z] != 0:
                if br.read_bit() and (abs(int(coef[z])) & p1) == 0:
                    coef[z] += p1 if coef[z] > 0 else -p1
            k += 1
        state["eobrun"] -= 1


def _reconstruct(frame, qt) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in frame["comps"]:
        q = qt[c["tq"]].reshape(64).astype(np.float64)
        bh, bw = c["coef"].shape[:2]
        blk = (c["coef"].astype(np.float64) * q).reshape(bh, bw, 8, 8)
        # batched IDCT: A.T @ B @ A over every block at once
        spat = np.einsum("ux,mnuv,vy->mxny", _A, blk, _A,
                         optimize=True) + 128.0
        p = spat.reshape(bh * 8, bw * 8)
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
_STD_ENC_CACHE: list = []


def _std_enc_tables():
    """K.3 encoder tables, built once — encode_mjpeg_avi codes every frame
    with tables="standard", so per-call construction is per-frame cost."""
    if not _STD_ENC_CACHE:
        _STD_ENC_CACHE.append(tuple(
            _enc_table(*t) for t in (_STD_DC_LUMA, _STD_AC_LUMA,
                                     _STD_DC_CHROMA, _STD_AC_CHROMA)))
    return _STD_ENC_CACHE[0]


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
                        pred: int, dc_enc=None, ac_enc=None) -> int:
    dc_enc = dc_enc or _DC_ENC
    ac_enc = ac_enc or _AC_ENC
    coef = np.round((_A @ (block - 128.0) @ _A.T) / q).astype(np.int64)
    zz = coef.flatten()[ZIGZAG]
    s, bits = _mag_bits(int(zz[0]) - pred)
    code, ln = dc_enc[s]
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
            code, ln = ac_enc[0xF0]
            bw.put(code, ln)
            run -= 16
        s, bits = _mag_bits(v)
        code, ln = ac_enc[(run << 4) | s]
        bw.put(code, ln)
        bw.put(bits, s)
        run = 0
    if run:
        code, ln = ac_enc[0x00]
        bw.put(code, ln)
    return int(zz[0])


def _rgb_to_planes(rgb: np.ndarray, subsample: bool):
    """RGB → padded (Y, Cb, Cr) planes + sampling factors."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
    cb = np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
    cr = np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
    y, cb, cr = (np.clip(p, 0, 255) for p in (y, cb, cr))

    sh, sv = (2, 2) if subsample else (1, 1)

    def pad(p, mult):
        ph = -(-p.shape[0] // mult) * mult
        pw = -(-p.shape[1] // mult) * mult
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    yp = pad(y, 8 * sv)
    if subsample:
        che = pad(cb, 16), pad(cr, 16)
        cbp = che[0].reshape(che[0].shape[0] // 2, 2, -1, 2).mean((1, 3))
        crp = che[1].reshape(che[1].shape[0] // 2, 2, -1, 2).mean((1, 3))
        cbp, crp = np.round(cbp), np.round(crp)
    else:
        cbp, crp = pad(cb, 8), pad(cr, 8)
    return yp, cbp, crp, sh, sv


def encode_baseline_jpeg(rgb: np.ndarray, quant: int = 1,
                         subsample: bool = False,
                         tables: str = "flat",
                         omit_dht: bool = False) -> bytes:
    """(h, w, 3) uint8 → baseline JFIF bytes.  quant = uniform quant value
    for every coefficient (1 = near-lossless); subsample=True emits 4:2:0
    with box-averaged chroma.  tables="standard" codes with the T.81
    Annex K.3 typical tables (luma id 0, chroma id 1); omit_dht then drops
    the DHT segments entirely — the MJPEG-in-AVI convention, decodable
    only by decoders that install the K.3 defaults."""
    h, w = rgb.shape[:2]
    qtbl = np.full((8, 8), quant, np.int32)
    yp, cbp, crp, sh, sv = _rgb_to_planes(rgb, subsample)
    ymcu = 8 * sv

    if tables == "standard":
        dc0, ac0, dc1, ac1 = _std_enc_tables()
        dhts = ((0x00, *_STD_DC_LUMA), (0x10, *_STD_AC_LUMA),
                (0x01, *_STD_DC_CHROMA), (0x11, *_STD_AC_CHROMA))
        sos_tbl = [0x00, 0x11, 0x11]
    else:
        if omit_dht:
            raise ValueError("omit_dht needs tables='standard' — only the "
                             "K.3 tables are implied by convention")
        dc0 = dc1 = _DC_ENC
        ac0 = ac1 = _AC_ENC
        dhts = ((0x00, _DC_COUNTS, _DC_SYMS), (0x10, _AC_COUNTS, _AC_SYMS))
        sos_tbl = [0x00, 0x00, 0x00]

    out = bytearray(b"\xFF\xD8")  # SOI
    # DQT (table 0, 8-bit)
    zz = qtbl.flatten()[ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + zz
    # SOF0: 3 components, y uses (sh, sv)
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, (sh << 4) | sv, 0, 2, 0x11, 0, 3, 0x11, 0])
    if not omit_dht:
        for tcth, counts, syms in dhts:
            out += b"\xFF\xC4" + struct.pack(">H", 19 + len(syms))
            out += bytes([tcth]) + bytes(counts[:16]) + syms
    # SOS
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    out += bytes([1, sos_tbl[0], 2, sos_tbl[1], 3, sos_tbl[2], 0, 63, 0])

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
                        bw, yp[y0:y0 + 8, x0:x0 + 8], qtbl, preds[0],
                        dc0, ac0)
            for ci, p in ((1, cbp), (2, crp)):
                y0, x0 = my * 8, mx * 8
                preds[ci] = _encode_plane_block(
                    bw, p[y0:y0 + 8, x0:x0 + 8], qtbl, preds[ci],
                    dc1, ac1)
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (tests / fixture generation)
# ---------------------------------------------------------------------------

# progressive AC alphabet adds the EOBn symbols (r<<4, r = 0..14) to the
# baseline run/size set; flat 8-bit canonical (176 of 256 codes)
_ACP_SYMS = bytes([r << 4 for r in range(15)] + [0xF0]
                  + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_ACP_COUNTS = [0] * 7 + [len(_ACP_SYMS)] + [0] * 8
_ACP_ENC = _enc_table(_ACP_COUNTS, _ACP_SYMS)

# default scan script (libjpeg-shaped): approximated DC for all components,
# banded luma AC + full chroma AC at Al=1, then refinement scans to Al=0
_DEFAULT_SCANS = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 1),
    ((0,), 6, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
)


def _plane_coefs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Padded plane → (bh, bw, 64) quantized DCT coefficients (raster)."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    b4 = plane.reshape(bh, 8, bw, 8)
    f = np.einsum("ux,mxny,vy->mnuv", _A, b4 - 128.0, _A, optimize=True)
    return np.round(f / q).astype(np.int64).reshape(bh, bw, 64)


def encode_progressive_jpeg(rgb: np.ndarray, quant: int = 1,
                            subsample: bool = False,
                            scans=_DEFAULT_SCANS) -> bytes:
    """(h, w, 3) uint8 → progressive (SOF2) JFIF bytes.  `scans` is a
    T.81 scan script of (component_indices, Ss, Se, Ah, Al) tuples; the
    default mirrors libjpeg's successive-approximation script.  Every
    band must reach Al=0 for a lossless-to-baseline coefficient stream."""
    h, w = rgb.shape[:2]
    qtbl = np.full((8, 8), quant, np.int32)
    yp, cbp, crp, sh, sv = _rgb_to_planes(rgb, subsample)
    comps = []
    for plane, (ch_, cv) in zip((yp, cbp, crp), ((sh, sv), (1, 1), (1, 1))):
        coefs = _plane_coefs(plane, qtbl)
        comps.append({"h": ch_, "v": cv, "coef": coefs})
    mcus_x = comps[0]["coef"].shape[1] // sh
    mcus_y = comps[0]["coef"].shape[0] // sv
    for c in comps:
        cw = -(-w * c["h"] // sh)
        ch2 = -(-h * c["v"] // sv)
        c["nbw"] = -(-cw // 8)
        c["nbh"] = -(-ch2 // 8)

    out = bytearray(b"\xFF\xD8")
    zz = qtbl.flatten()[ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + zz
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF2
    out += bytes([1, (sh << 4) | sv, 0, 2, 0x11, 0, 3, 0x11, 0])
    for tc, counts, syms in ((0, _DC_COUNTS, _DC_SYMS),
                             (1, _ACP_COUNTS, _ACP_SYMS)):
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(syms))
        out += bytes([tc << 4]) + bytes(counts[:16]) + syms

    for members, ss, se, ah, al in scans:
        out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * len(members),
                                         len(members))
        for ci in members:
            out += bytes([ci + 1, 0x00])
        out += bytes([ss, se, (ah << 4) | al])
        bw = _BitWriter()
        if ss == 0:
            _enc_dc_scan(bw, comps, members, ah, al, mcus_x, mcus_y)
        elif ah == 0:
            _enc_ac_first(bw, comps[members[0]], ss, se, al)
        else:
            _enc_ac_refine(bw, comps[members[0]], ss, se, al)
        bw.flush()
        out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)


def _scan_blocks(comps, members, mcus_x, mcus_y):
    """Yield (comp, by, bx) in scan order: MCU-interleaved for multi-
    component scans, the component's own raster grid otherwise."""
    if len(members) == 1:
        c = comps[members[0]]
        for i in range(c["nbh"] * c["nbw"]):
            yield c, *divmod(i, c["nbw"])
        return
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in members:
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        yield c, my * c["v"] + by, mx * c["h"] + bx


def _enc_dc_scan(bw, comps, members, ah, al, mcus_x, mcus_y):
    preds = {id(comps[ci]): 0 for ci in members}
    for c, by, bx in _scan_blocks(comps, members, mcus_x, mcus_y):
        v = int(c["coef"][by, bx, 0]) >> al  # arithmetic shift (T.81 A.4.1)
        if ah == 0:
            s, bits = _mag_bits(v - preds[id(c)])
            preds[id(c)] = v
            code, ln = _DC_ENC[s]
            bw.put(code, ln)
            if s:
                bw.put(bits, s)
        else:
            bw.put(v & 1, 1)


def _pt(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (T.81 A.4.1)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _enc_ac_first(bw, c, ss, se, al):
    band = ZIGZAG[ss:se + 1]
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        code, ln = _ACP_ENC[r << 4]
        bw.put(code, ln)
        if r:
            bw.put(eobrun - (1 << r), r)
        eobrun = 0

    for i in range(c["nbh"] * c["nbw"]):
        by, bx = divmod(i, c["nbw"])
        vals = [_pt(int(c["coef"][by, bx, z]), al) for z in band]
        nz = [j for j, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for j in range(nz[-1] + 1):
            v = vals[j]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = _ACP_ENC[0xF0]
                bw.put(code, ln)
                run -= 16
            s, bits = _mag_bits(v)
            code, ln = _ACP_ENC[(run << 4) | s]
            bw.put(code, ln)
            bw.put(bits, s)
            run = 0
        if nz[-1] < len(vals) - 1:
            eobrun += 1
    flush_eob()


def _enc_ac_refine(bw, c, ss, se, al):
    """G.1.2.3 encode: newly-significant coefficients as (run, 1) symbols
    with sign bits; correction bits for already-significant coefficients
    interleave exactly where the decoder's walk reads them."""
    band = ZIGZAG[ss:se + 1]
    eobrun = 0
    eob_bits: list[int] = []

    def flush_eob():
        nonlocal eobrun
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        code, ln = _ACP_ENC[r << 4]
        bw.put(code, ln)
        if r:
            bw.put(eobrun - (1 << r), r)
        for bit in eob_bits:
            bw.put(bit, 1)
        eob_bits.clear()
        eobrun = 0

    for i in range(c["nbh"] * c["nbw"]):
        by, bx = divmod(i, c["nbw"])
        raw = [int(c["coef"][by, bx, z]) for z in band]
        absnow = [abs(v) >> al for v in raw]
        newpos = [j for j, a in enumerate(absnow) if a == 1]
        if not newpos:
            eobrun += 1
            eob_bits.extend(a & 1 for a in absnow if a >= 2)
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        pending: list[int] = []
        k = 0
        for kn in newpos:
            run = sum(1 for j in range(k, kn) if absnow[j] == 0)
            while run > 15:
                code, ln = _ACP_ENC[0xF0]
                bw.put(code, ln)
                cnt = 0  # decoder's ZRL walk: cross exactly 16 zeros
                while cnt < 16:
                    a = absnow[k]
                    if a == 0:
                        cnt += 1
                    elif a >= 2:
                        pending.append(a & 1)
                    k += 1
                for bit in pending:
                    bw.put(bit, 1)
                pending.clear()
                run -= 16
            code, ln = _ACP_ENC[(run << 4) | 1]
            bw.put(code, ln)
            bw.put(1 if raw[kn] > 0 else 0, 1)
            while k < kn:
                a = absnow[k]
                if a >= 2:
                    pending.append(a & 1)
                k += 1
            k = kn + 1
            for bit in pending:
                bw.put(bit, 1)
            pending.clear()
        if k < len(band):
            eobrun += 1
            eob_bits.extend(absnow[j] & 1 for j in range(k, len(band))
                            if absnow[j] >= 2)
    flush_eob()
