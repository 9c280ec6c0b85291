"""Pure-Python FLAC codec (stdlib + numpy only).

Decoder: the full frame surface of the format spec (RFC 9639 / the
xiph.org format document) — STREAMINFO parsing, fixed and variable
blocking, all four channel assignments (independent, left/side,
right/side, mid/side), constant / verbatim / fixed-order / LPC subframes,
wasted bits, 4- and 5-bit rice residual partitions with the escape code.
FLAC is lossless over integers, so decode is EXACT — no tolerance
anywhere.  CRCs are parsed but not verified (a corrupt stream surfaces as
a sync/structure error instead).

Encoder (tests / fixture generation): verbatim, fixed-order (0-4) and
quantized-LPC subframes with single-partition rice residuals, independent
or mid/side stereo, correct CRC-8/CRC-16 so any spec-compliant decoder
reads the output.  Residual coding makes round-trips sample-exact no
matter how poor the prediction is, which is what the tests pin.

This is the audio analogue of pipeline/jpeg.py / png.py: FLAC carries the
dominant open speech corpora (LibriSpeech, Common Voice exports), so the
multimodal pipeline (pipeline/multimodal.py) decodes it natively instead
of raising for a codec library the environment doesn't have.
"""

from __future__ import annotations

import struct

import numpy as np


class _BitReader:
    """MSB-first bit reader (no byte stuffing, unlike JPEG's)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= nbits
        v = self.acc >> self.n
        self.acc &= (1 << self.n) - 1
        return v

    def sread(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        self.n = 0
        self.acc = 0


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, nbits: int):
        self.acc = (self.acc << nbits) | (v & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_like(br: _BitReader) -> int:
    """FLAC's UTF-8-style coded frame/sample number (up to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


def _utf8_like_bytes(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    for _ in range(nbytes - 1):
        out.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = (0xFF << (8 - nbytes)) & 0xFF | v
    return bytes([lead] + out[::-1])


# fixed-prediction coefficients per order (format spec §9.2.1)
_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}

_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODES.items()}


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_flac(data: bytes):
    """FLAC bytes → (samples (n, channels) int32, sample_rate, bps)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    while True:  # metadata blocks
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16), br.read(16)  # min/max blocksize
            br.read(24), br.read(24)  # min/max framesize
            sr = br.read(20)
            ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = {"sr": sr, "ch": ch, "bps": bps, "total": total}
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream without STREAMINFO")
    chans = [[] for _ in range(info["ch"])]
    n_read = 0
    while pos < len(data) and (info["total"] == 0
                               or n_read < info["total"]):
        pos, block = _decode_frame(data, pos, info)
        for c, arr in enumerate(block):
            chans[c].append(arr)
        n_read += len(block[0])
    samples = np.stack([np.concatenate(c) for c in chans], axis=1)
    if info["total"]:
        samples = samples[:info["total"]]
    return samples, info["sr"], info["bps"]


_BLOCKSIZE_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_SR_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
             7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


def _decode_frame(data: bytes, pos: int, info):
    br = _BitReader(data, pos)
    sync = br.read(14)
    if sync != 0x3FFE:
        raise ValueError(f"bad frame sync at {pos}: {sync:#x}")
    br.read(1)  # reserved
    br.read(1)  # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    bps_code = br.read(3)
    br.read(1)  # reserved
    _utf8_like(br)  # frame/sample number
    if bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_TABLE[bs_code]
    if sr_code == 12:
        br.read(8)
    elif sr_code in (13, 14):
        br.read(16)
    bps = info["bps"] if bps_code == 0 else _BPS_FROM_CODE[bps_code]
    br.read(8)  # header CRC-8 (unverified)

    if ch_code < 8:
        nch = ch_code + 1
        kinds = ["indep"] * nch
    elif ch_code == 8:
        kinds = ["left", "side"]
    elif ch_code == 9:
        kinds = ["side", "right"]
    elif ch_code == 10:
        kinds = ["mid", "side"]
    else:
        raise ValueError(f"reserved channel assignment {ch_code}")

    subs = []
    for kind in kinds:
        sub_bps = bps + (1 if kind == "side" else 0)
        subs.append(_decode_subframe(br, blocksize, sub_bps))
    br.align()
    br.read(16)  # frame CRC-16 (unverified)

    if len(kinds) == 2 and kinds != ["indep", "indep"]:
        a, b = subs
        if kinds == ["left", "side"]:
            left, right = a, a - b
        elif kinds == ["side", "right"]:
            left, right = a + b, b
        else:  # mid/side
            side = b
            mid = (a << 1) | (side & 1)
            left, right = (mid + side) >> 1, (mid - side) >> 1
        subs = [left, right]
    return br.pos, [s.astype(np.int32) for s in subs]


def _decode_subframe(br: _BitReader, n: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
        bps -= wasted
    if t == 0:  # constant
        out = np.full(n, br.sread(bps), np.int64)
    elif t == 1:  # verbatim
        out = np.array([br.sread(bps) for _ in range(n)], np.int64)
    elif 8 <= t <= 12:  # fixed, order t-8
        order = t - 8
        warm = np.array([br.sread(bps) for _ in range(order)], np.int64)
        resid = _decode_residual(br, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        # order-k fixed prediction residual IS the k-th difference, so the
        # inverse is k cumulative sums seeded from the warmup's own
        # difference pyramid — vectorized, no per-sample Python loop
        cur = resid
        for j in range(order - 1, -1, -1):
            seed = np.diff(warm, j)[-1]  # Δ^j x at the last warmup slot
            cur = seed + np.cumsum(cur)
        out[order:] = cur
    elif t >= 32:  # LPC, order t-31
        order = t - 31
        warm = [br.sread(bps) for _ in range(order)]
        prec = br.read(4) + 1
        shift = br.sread(5)
        coefs = [br.sread(prec) for _ in range(order)]
        resid = _decode_residual(br, n, order)
        # true IIR — but over Python ints in a list, not per-element numpy
        # indexing (~4x faster); resid.tolist() avoids np scalar boxing
        hist = list(warm)
        rs = resid.tolist()
        for r in rs:
            acc = 0
            for j in range(order):
                acc += coefs[j] * hist[-1 - j]
            hist.append(r + (acc >> shift))
        out = np.array(hist, np.int64)
    else:
        raise ValueError(f"reserved subframe type {t}")
    return out << wasted if wasted else out


def _decode_residual(br: _BitReader, n: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    out = np.empty(n - order, np.int64)
    o = 0
    for p in range(nparts):
        cnt = (n >> porder) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(cnt):
                out[o + i] = br.sread(raw) if raw else 0
        else:
            for i in range(cnt):
                q = br.unary()
                r = br.read(param) if param else 0
                u = (q << param) | r
                out[o + i] = (u >> 1) ^ -(u & 1)  # zigzag → signed
        o += cnt
    return out


# ---------------------------------------------------------------------------
# encoder (tests / fixture generation)
# ---------------------------------------------------------------------------

def encode_flac(samples: np.ndarray, sample_rate: int = 16000,
                bps: int = 16, blocksize: int = 4096,
                subframe: str = "fixed", mid_side: bool = False) -> bytes:
    """(n,) or (n, ch) int samples → FLAC bytes.  subframe selects the
    per-block coding: 'verbatim', 'fixed' (best of orders 0-4) or 'lpc'
    (order-8 quantized Levinson-Durbin).  Residual coding is exact, so
    decode(encode(x)) == x for any choice."""
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if mid_side and ch != 2:
        raise ValueError("mid_side needs exactly 2 channels")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.put(blocksize, 16)
    si.put(blocksize, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(sample_rate, 20)
    si.put(ch - 1, 3)
    si.put(bps - 1, 5)
    si.put(n, 36)
    si.out += b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(si.out).to_bytes(3, "big") + si.out

    for fi, start in enumerate(range(0, n, blocksize)):
        blk = x[start:start + blocksize]
        out += _encode_frame(blk, fi, sample_rate, bps, subframe, mid_side)
    return bytes(out)


def _encode_frame(blk: np.ndarray, fi: int, sr: int, bps: int,
                  subframe: str, mid_side: bool) -> bytes:
    nb, ch = blk.shape
    hdr = _BitWriter()
    hdr.put(0x3FFE, 14)
    hdr.put(0, 1)
    hdr.put(0, 1)  # fixed blocksize strategy
    hdr.put(7, 4)  # blocksize: 16-bit at end of header
    hdr.put(0, 4)  # sample rate: from STREAMINFO
    if mid_side:
        hdr.put(10, 4)  # mid/side
    else:
        hdr.put(ch - 1, 4)
    hdr.put(_BPS_CODES[bps], 3)
    hdr.put(0, 1)
    hdr.align()
    hdr.out += _utf8_like_bytes(fi)
    hdr.out += struct.pack(">H", nb - 1)
    hdr.out.append(_crc8(bytes(hdr.out)))

    body = _BitWriter()
    body.out += hdr.out
    if mid_side:
        left, right = blk[:, 0], blk[:, 1]
        mid = (left + right) >> 1
        side = left - right
        _encode_subframe(body, mid, bps, subframe)
        _encode_subframe(body, side, bps + 1, subframe)
    else:
        for c in range(ch):
            _encode_subframe(body, blk[:, c], bps, subframe)
    body.align()
    crc = _crc16(bytes(body.out))
    body.out += struct.pack(">H", crc)
    return bytes(body.out)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int,
                     subframe: str):
    n = len(x)
    bw.put(0, 1)  # padding
    if subframe == "verbatim":
        bw.put(1, 6)
        bw.put(0, 1)  # no wasted bits
        for v in x:
            bw.put(int(v), bps)
        return
    if subframe == "lpc" and n > 16:
        order = 8
        coefs, shift = _quantize_lpc(x, order)
        bw.put(32 + order - 1, 6)
        bw.put(0, 1)
        for v in x[:order]:
            bw.put(int(v), bps)
        bw.put(15 - 1, 4)  # precision 15
        bw.put(shift, 5)
        for c in coefs:
            bw.put(int(c), 15)
        pred = np.zeros(n - order, np.int64)
        for j, c in enumerate(coefs):
            pred += int(c) * x[order - 1 - j:n - 1 - j]
        resid = x[order:] - (pred >> shift)
        _encode_residual(bw, resid, n, order)
        return
    # fixed: pick the order with the smallest residual magnitude
    best, best_resid = 0, x.astype(np.int64)
    r = x.astype(np.int64)
    for order in range(1, min(5, n)):
        r = np.diff(r)
        if np.abs(r).sum() < np.abs(best_resid[order:] if best == 0
                                    else best_resid).sum():
            best, best_resid = order, r
    resid = best_resid[best:] if best == 0 else best_resid
    bw.put(8 + best, 6)
    bw.put(0, 1)
    for v in x[:best]:
        bw.put(int(v), bps)
    _encode_residual(bw, resid, n, best)


def _quantize_lpc(x: np.ndarray, order: int):
    """Autocorrelation → Levinson-Durbin → 15-bit quantized coefficients.
    Coefficient quality only affects compression, never correctness: the
    residual is exact by construction."""
    f = x.astype(np.float64)
    ac = [float((f[:len(f) - k] * f[k:]).sum()) for k in range(order + 1)]
    if ac[0] == 0:
        return [0] * order, 0
    err = ac[0]
    a = [0.0] * order
    for i in range(order):
        acc = ac[i + 1] - sum(a[j] * ac[i - j] for j in range(i))
        k = acc / err if err else 0.0
        new = a[:]
        new[i] = k
        for j in range(i):
            new[j] = a[j] - k * a[i - 1 - j]
        a = new
        err *= (1 - k * k)
        if err <= 0:
            break
    shift = 12
    q = [int(round(c * (1 << shift))) for c in a]
    lim = (1 << 14) - 1
    q = [max(-lim - 1, min(lim, c)) for c in q]
    return q, shift


def _encode_residual(bw: _BitWriter, resid: np.ndarray, n: int, order: int):
    """Single-partition 4-bit rice (or escaped raw if values are huge)."""
    bw.put(0, 2)   # method: 4-bit rice
    bw.put(0, 4)   # partition order 0
    u = (resid << 1) ^ (resid >> 63)  # signed → zigzag
    mean = int(u.mean()) if len(u) else 0
    param = max(0, min(14, mean.bit_length() - 1))
    maxq = int(u.max() >> param) if len(u) else 0
    if maxq > 1 << 16:  # pathological: escape to raw
        raw = int(np.abs(resid).max()).bit_length() + 1
        bw.put(15, 4)
        bw.put(raw, 5)
        for v in resid:
            bw.put(int(v), raw)
        return
    bw.put(param, 4)
    for v in u:
        q = int(v) >> param
        bw.put(1, q + 1)  # q zeros then a 1
        if param:
            bw.put(int(v) & ((1 << param) - 1), param)
