"""Pure-Python VP8L (lossless WebP) decoder → RGB numpy array.

Implements the public WebP Lossless Bitstream Specification (RFC 9649
§3, the VP8L chunk): LSB-first bit reading, simple and normal
(canonical) prefix codes with code-length-code transport, meta prefix
groups, the color cache, LZ77 backward references with the 2D distance
map, and all four inverse transforms (predictor with its 14 modes,
color transform, subtract-green, color indexing incl. sub-byte pixel
bundling).

Lossy VP8 (the 'VP8 ' chunk) remains a named refusal — it is a full
video-intra codec; the header probe tier (pipeline/probe.py) covers its
metadata.  ``encode_vp8l`` writes a valid uncompressed-literal VP8L
stream (complete 8-bit prefix codes; optional subtract-green, with the
color-indexing path in _encode_palette) used by the round-trip tests;
it is a test vector generator, not a compressor.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# bit io
# ---------------------------------------------------------------------------


class _BitReader:
    """LSB-first bit reader (VP8L convention)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            idx = self.pos >> 3
            if idx >= len(self.data):
                # truncated stream: surface a clean decode error, not a
                # raw IndexError from deep inside the entropy loop
                raise ValueError("VP8L: bitstream truncated")
            v |= ((self.data[idx] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.bit = 0

    def write(self, v: int, n: int):
        for i in range(n):
            if self.bit == 0:
                self.out.append(0)
            if (v >> i) & 1:
                self.out[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7


# ---------------------------------------------------------------------------
# prefix codes
# ---------------------------------------------------------------------------

_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                      11, 12, 13, 14, 15]


class _PrefixCode:
    """Canonical prefix code decoded bit-by-bit (codes are read MSB of the
    codeword first; fine for feature-extraction workloads)."""

    def __init__(self, lengths: list[int]):
        nonzero = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not nonzero:
            raise ValueError("prefix code with no symbols")
        if len(nonzero) == 1:
            self.single = nonzero[0][1]
            self.table = {}
            return
        self.single = None
        # canonical assignment: by length then symbol
        max_len = max(ln for ln, _ in nonzero)
        bl_count = [0] * (max_len + 1)
        for ln, _ in nonzero:
            bl_count[ln] += 1
        next_code = [0] * (max_len + 2)
        code = 0
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        self.table = {}
        for ln, sym in sorted(nonzero):
            self.table[(ln, next_code[ln])] = sym
            next_code[ln] += 1

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
            if ln > 15:
                raise ValueError("invalid VP8L prefix code")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        symbols = [first]
        if num_symbols == 2:
            symbols.append(br.read(8))
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[symbols[0]] = 1  # 0-bit read via `single`
            return _PrefixCode(lengths)
        # TRANSMISSION order assigns the codewords (bit 0 -> first symbol),
        # not canonical symbol order — a stream may send them descending
        code = _PrefixCode.__new__(_PrefixCode)
        code.single = None
        code.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return code
    # normal: code lengths transported through a code-length code
    num_code_lengths = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    # optional symbol-count limit
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s != 0:
                prev = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------

_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _lz77_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix value: codes 0-3 are 1-4; above that the
    value carries extra bits (spec §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _plane_to_distance(code: int, xsize: int) -> int:
    if code > 119:
        return code - 119
    dx, dy = _DIST_MAP[code]
    d = dy * xsize + dx
    return d if d >= 1 else 1


# ---------------------------------------------------------------------------
# image stream decode
# ---------------------------------------------------------------------------


def _decode_image_stream(br: _BitReader, xsize: int, ysize: int,
                         is_level0: bool):
    """Decode one spatially-coded ARGB image (list of 32-bit ints).
    Subimages (transform data, entropy image, palette) call this with
    is_level0=False (no meta prefix)."""
    # order per the spec's DecodeImageStream: color-cache info FIRST,
    # then the meta-prefix bit inside the prefix-code section
    cache_bits = br.read(4) if br.read(1) else 0
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta_codes = None
    meta_bits = 0
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (ysize + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_image_stream(br, mw, mh, False)
        meta_codes = [((p >> 8) & 0xFFFF) for p in meta_img]
        num_groups = max(meta_codes) + 1
    else:
        num_groups = 1

    alphabets = [256 + 24 + cache_size, 256, 256, 256, 40]
    groups = []
    for _ in range(num_groups):
        groups.append([_read_prefix_code(br, a) for a in alphabets])

    n = xsize * ysize
    pixels = [0] * n
    pos = 0
    while pos < n:
        if meta_codes is not None:
            x, y = pos % xsize, pos // xsize
            mi = (y >> meta_bits) * ((xsize + (1 << meta_bits) - 1)
                                     >> meta_bits) + (x >> meta_bits)
            g = groups[meta_codes[mi]]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            pixels[pos] = px
            pos += 1
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 256 + 24:
            length = _lz77_value(s - 256, br)
            dist_code = g[4].read(br)
            dist = _plane_to_distance(_lz77_value(dist_code, br) - 1, xsize)
            if dist > pos or dist < 1:
                # a corrupt/malicious stream must fail cleanly, not read
                # garbage via Python negative indexing
                raise ValueError(
                    f"VP8L: LZ77 distance {dist} exceeds decoded prefix "
                    f"{pos}")
            for _ in range(length):
                if pos >= n:
                    break
                px = pixels[pos - dist]
                pixels[pos] = px
                pos += 1
                if cache_size:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
        else:
            px = cache[s - 256 - 24]
            pixels[pos] = px
            pos += 1
    return pixels


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a, b):
    return (((a >> 24) + (b >> 24)) // 2 << 24 |
            (((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) // 2 << 16 |
            (((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) // 2 << 8 |
            ((a & 0xFF) + (b & 0xFF)) // 2)


def _clamp(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def _select(l, t, tl):  # noqa: E741
    p_a = abs(((t >> 24) - (tl >> 24))) + \
        abs((((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF))) + \
        abs((((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF))) + \
        abs(((t & 0xFF) - (tl & 0xFF)))
    p_b = abs(((l >> 24) - (tl >> 24))) + \
        abs((((l >> 16) & 0xFF) - ((tl >> 16) & 0xFF))) + \
        abs((((l >> 8) & 0xFF) - ((tl >> 8) & 0xFF))) + \
        abs(((l & 0xFF) - (tl & 0xFF)))
    # RFC 9649 Select: L wins only when STRICTLY closer; ties take T
    return l if p_a < p_b else t


def _cas_full(l, t, tl):  # noqa: E741
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF)
                      - ((tl >> sh) & 0xFF)) << sh
    return out


def _cas_half(ave, tl):
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        d = a - ((tl >> sh) & 0xFF)
        half = -((-d) // 2) if d < 0 else d // 2  # C division: toward zero
        out |= _clamp(a + half) << sh
    return out


def _predict(mode, l, t, tr, tl):  # noqa: E741
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _cas_full(l, t, tl)
    if mode == 13:
        return _cas_half(_avg2(l, t), tl)
    raise ValueError(f"bad predictor mode {mode}")


def _add_px(a, b):
    return ((((a >> 24) + (b >> 24)) & 0xFF) << 24 |
            ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16 |
            ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8 |
            (((a & 0xFF) + (b & 0xFF)) & 0xFF))


def _inv_predictor(pixels, xsize, ysize, bits, modes, mw):
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[i - 1]          # L
            elif x == 0:
                pred = pixels[i - xsize]      # T
            else:
                mode = (modes[(y >> bits) * mw + (x >> bits)] >> 8) & 0xFF
                l = pixels[i - 1]             # noqa: E741
                t = pixels[i - xsize]
                tl = pixels[i - xsize - 1]
                # TR of the last column wraps to the CURRENT row's first
                # pixel — in flat scan order that is exactly i - xsize + 1,
                # the same expression as the in-bounds case (spec §4.4.1)
                tr = pixels[i - xsize + 1]
                pred = _predict(mode, l, t, tr, tl)
            pixels[i] = _add_px(pixels[i], pred)


def _s8(v):
    return v - 256 if v >= 128 else v


def _inv_color_transform(pixels, xsize, ysize, bits, elems, mw):
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            cte = elems[(y >> bits) * mw + (x >> bits)]
            g2r = _s8(cte & 0xFF)
            g2b = _s8((cte >> 8) & 0xFF)
            r2b = _s8((cte >> 16) & 0xFF)
            px = pixels[i]
            a = px >> 24
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            r = (r + ((g2r * _s8(g)) >> 5)) & 0xFF
            b = (b + ((g2b * _s8(g)) >> 5)) & 0xFF
            b = (b + ((r2b * _s8(r)) >> 5)) & 0xFF
            pixels[i] = (a << 24) | (r << 16) | (g << 8) | b


def _inv_subtract_green(pixels):
    for i, px in enumerate(pixels):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pixels[i] = (px & 0xFF00FF00) | (r << 16) | b


def _inv_color_index(pixels, xsize, ysize, palette, width_bits):
    if width_bits == 0:
        return [palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < len(palette)
                else 0 for p in pixels], xsize
    bits_pp = 8 >> width_bits
    per = 1 << width_bits
    packed_w = (xsize + per - 1) >> width_bits
    out = [0] * (xsize * ysize)
    mask = (1 << bits_pp) - 1
    for y in range(ysize):
        for x in range(xsize):
            g = (pixels[y * packed_w + (x >> width_bits)] >> 8) & 0xFF
            idx = (g >> ((x % per) * bits_pp)) & mask
            out[y * xsize + x] = palette[idx] if idx < len(palette) else 0
    return out, xsize


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------


def decode_vp8l(data: bytes):
    """RIFF WEBP container with a VP8L chunk → HxWx3 uint8 RGB array."""
    import numpy as np
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WEBP RIFF container")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = data[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            payload = body
            break
        if fourcc == b"VP8 ":
            # lossy VP8 KEY FRAME (RFC 6386 intra) — pipeline/vp8.py;
            # see its module docstring for the deblocking/table caveats
            from incubator_druid_spark.pipeline.vp8 import decode_vp8
            return decode_vp8(body)
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk in WEBP container")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    xsize = br.read(14) + 1
    ysize = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")

    transforms = []  # applied inverse in reverse order of appearance
    cur_w = xsize
    while br.read(1):
        ttype = br.read(2)
        if ttype == 0:  # predictor
            bits = br.read(3) + 2
            mw = (cur_w + (1 << bits) - 1) >> bits
            mh = (ysize + (1 << bits) - 1) >> bits
            modes = _decode_image_stream(br, mw, mh, False)
            # record the width CURRENT AT DECLARATION: a transform declared
            # after a bundling color-indexing transform operates on the
            # packed-width image during the reversed inverse pass
            transforms.append(("predictor", bits, modes, mw, cur_w))
        elif ttype == 1:  # color transform
            bits = br.read(3) + 2
            mw = (cur_w + (1 << bits) - 1) >> bits
            mh = (ysize + (1 << bits) - 1) >> bits
            elems = _decode_image_stream(br, mw, mh, False)
            transforms.append(("color", bits, elems, mw, cur_w))
        elif ttype == 2:  # subtract green
            transforms.append(("subtract_green",))
        else:  # color indexing
            ncolors = br.read(8) + 1
            pal_deltas = _decode_image_stream(br, ncolors, 1, False)
            palette, acc = [], 0
            for d in pal_deltas:
                acc = _add_px(acc, d)
                palette.append(acc)
            width_bits = (3 if ncolors <= 2 else 2 if ncolors <= 4
                          else 1 if ncolors <= 16 else 0)
            transforms.append(("palette", palette, width_bits))
            if width_bits:
                cur_w = (cur_w + (1 << width_bits) - 1) >> width_bits

    pixels = _decode_image_stream(br, cur_w, ysize, True)

    for tr in reversed(transforms):
        if tr[0] == "palette":
            pixels, cur_w = _inv_color_index(pixels, xsize, ysize,
                                             tr[1], tr[2])
        elif tr[0] == "subtract_green":
            _inv_subtract_green(pixels)
        elif tr[0] == "color":
            _inv_color_transform(pixels, tr[4], ysize, tr[1], tr[2], tr[3])
        else:
            _inv_predictor(pixels, tr[4], ysize, tr[1], tr[2], tr[3])

    a = np.array(pixels, dtype=np.uint32).reshape(ysize, xsize)
    return np.stack([(a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF],
                    axis=-1).astype(np.uint8)


# ---------------------------------------------------------------------------
# test-vector encoder (literals with complete 8-bit codes — no compression)
# ---------------------------------------------------------------------------


def _write_complete_8bit_code(bw: _BitWriter, alphabet_size: int):
    """Normal prefix code: 256 literals all length 8 (a complete tree —
    canonical code of symbol s is s itself), any trailing length/cache
    symbols zero via the 17/18 zero-run code-length symbols."""
    bw.write(0, 1)  # normal code
    # code-length code: symbols {8, 17, 18} present.  num_code_lengths
    # must cover index of 18 in the order (position 1) and 8 (position 13)
    bw.write(15 - 4, 4)  # num_code_lengths = 15 (covers up to symbol 10)
    # order: 17,18,0,1,2,3,4,5,16,6,7,8,9,10,...
    lens = {17: 2, 18: 2, 8: 1}
    for i in range(15):
        sym = _CODE_LENGTH_ORDER[i]
        bw.write(lens.get(sym, 0), 3)
    # canonical over {8:1, 17:2, 18:2}: 8 -> '0', 17 -> '10', 18 -> '11'
    def cl(sym):
        if sym == 8:
            bw.write(0, 1)
        elif sym == 17:
            bw.write(0b01, 2)  # LSB-first write of MSB-first code '10'
        else:
            bw.write(0b11, 2)  # '11'
    bw.write(0, 1)  # no max_symbol override
    for _ in range(256):
        cl(8)
    rest = alphabet_size - 256
    while rest > 0:
        if rest >= 11:
            run = min(rest, 11 + 127)
            cl(18)
            bw.write(run - 11, 7)
        else:
            run = min(rest, 3 + 7)
            if run < 3:
                run = rest  # 1-2 zeros: emit explicit 0s
                for _ in range(run):
                    # '0' symbol has length 0 here — unreachable; pad with
                    # a 3-zero run instead (alphabets here always leave
                    # >= 3 trailing zeros, asserted by callers)
                    raise ValueError("alphabet tail too short")
            else:
                cl(17)
                bw.write(run - 3, 3)
        rest -= run


def _write_simple_single(bw: _BitWriter, symbol: int):
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # num_symbols - 1 = 0
    bw.write(1, 1)  # 8-bit first symbol
    bw.write(symbol & 0xFF, 8)


def encode_vp8l(arr, subtract_green: bool = False) -> bytes:
    """HxWx3 uint8 → VP8L test vector.  Literal pixels under complete
    8-bit prefix codes; optional subtract-green transform.  The palette
    path lives in _encode_palette (color-indexing + bundling)."""
    h, w = arr.shape[:2]
    pixels = [(0xFF << 24) | (int(arr[y, x, 0]) << 16)
              | (int(arr[y, x, 1]) << 8) | int(arr[y, x, 2])
              for y in range(h) for x in range(w)]
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # subtract green
        pixels = [_fwd_subtract_green(px) for px in pixels]
    bw.write(0, 1)  # end of transforms
    _emit_literal_stream(bw, pixels, level0=True)
    return _riff_wrap(bytes([0x2F]) + bytes(bw.out))


def _encode_palette(arr) -> bytes:
    """Separate palette-path test vector (color-indexing transform with
    bundling when the palette allows)."""
    h, w = arr.shape[:2]
    pixels = [(0xFF << 24) | (int(arr[y, x, 0]) << 16)
              | (int(arr[y, x, 1]) << 8) | int(arr[y, x, 2])
              for y in range(h) for x in range(w)]
    colors, index = [], {}
    for px in pixels:
        if px not in index:
            index[px] = len(colors)
            colors.append(px)
    n = len(colors)
    if n > 256:
        raise ValueError("palette encoder needs <= 256 colors")
    width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)   # a transform
    bw.write(3, 2)   # color indexing
    bw.write(n - 1, 8)
    # palette subimage (n x 1), delta coded, literal 8-bit codes
    deltas, prev = [], 0
    for c in colors:
        deltas.append(_sub_px(c, prev))
        prev = c
    _emit_literal_stream(bw, deltas)
    bw.write(0, 1)   # end of transforms
    # packed index image
    if width_bits:
        per = 1 << width_bits
        bits_pp = 8 >> width_bits
        packed_w = (w + per - 1) >> width_bits
        packed = []
        for y in range(h):
            for bx in range(packed_w):
                g = 0
                for k in range(per):
                    x = bx * per + k
                    if x < w:
                        g |= index[pixels[y * w + x]] << (k * bits_pp)
                packed.append((0xFF << 24) | (g << 8))
        _emit_literal_stream(bw, packed, level0=True)
    else:
        _emit_literal_stream(
            bw, [(0xFF << 24) | (index[px] << 8) for px in pixels],
            level0=True)
    return _riff_wrap(bytes([0x2F]) + bytes(bw.out))


def _emit_literal_stream(bw: _BitWriter, px_list, level0: bool = False):
    bw.write(0, 1)  # no color cache
    if level0:
        bw.write(0, 1)  # no meta prefix image
    _write_complete_8bit_code(bw, 256 + 24)
    for _ in range(3):
        _write_complete_8bit_code(bw, 256)
    _write_simple_single(bw, 0)
    for px in px_list:
        bw.write(_rev8((px >> 8) & 0xFF), 8)
        bw.write(_rev8((px >> 16) & 0xFF), 8)
        bw.write(_rev8(px & 0xFF), 8)
        bw.write(_rev8((px >> 24) & 0xFF), 8)


def _rev8(v: int) -> int:
    """Prefix codewords are read MSB-first while the writer is LSB-first —
    reverse the 8 bits so the reader sees the canonical code."""
    out = 0
    for _ in range(8):
        out = (out << 1) | (v & 1)
        v >>= 1
    return out


def _fwd_subtract_green(px: int) -> int:
    g = (px >> 8) & 0xFF
    r = (((px >> 16) & 0xFF) - g) & 0xFF
    b = ((px & 0xFF) - g) & 0xFF
    return (px & 0xFF00FF00) | (r << 16) | b


def _sub_px(a: int, b: int) -> int:
    return ((((a >> 24) - (b >> 24)) & 0xFF) << 24 |
            ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16 |
            ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8 |
            (((a & 0xFF) - (b & 0xFF)) & 0xFF))


def _riff_wrap(payload: bytes) -> bytes:
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, canonical code), same assignment as _PrefixCode."""
    items = sorted((ln, s) for s, ln in lengths.items() if ln > 0)
    max_len = max(ln for ln, _ in items)
    bl = [0] * (max_len + 1)
    for ln, _ in items:
        bl[ln] += 1
    nxt = [0] * (max_len + 2)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl[ln - 1]) << 1
        nxt[ln] = code
    out = {}
    for ln, s in items:
        out[s] = (ln, nxt[ln])
        nxt[ln] += 1
    return out


def _write_code_msb(bw: _BitWriter, code: int, ln: int):
    for i in range(ln - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _write_sparse_code(bw: _BitWriter, lengths: dict[int, int],
                       alphabet_size: int):
    """Normal prefix-code transport for an arbitrary sparse {symbol:
    length} map (test-vector writer for codes whose symbols exceed the
    simple-code 8-bit limit — LZ77 length codes, color-cache indices).
    The code-length code may be incomplete; this module's decoder only
    does exact (length, code) lookups."""
    import math
    used = sorted({ln for ln in lengths.values() if ln > 0})
    cl_syms = [0, 18] + used
    b = max(1, math.ceil(math.log2(len(cl_syms))))
    cl_lengths = {s: b for s in cl_syms}
    cl_codes = _canonical_codes(cl_lengths)
    bw.write(0, 1)  # normal code
    max_idx = max(_CODE_LENGTH_ORDER.index(s) for s in cl_syms)
    bw.write(max_idx + 1 - 4, 4)
    for i in range(max_idx + 1):
        bw.write(cl_lengths.get(_CODE_LENGTH_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max_symbol override
    i = 0
    nz = sorted(s for s, ln in lengths.items() if ln > 0)
    for s in nz:
        gap = s - i
        while gap >= 11:
            run = min(gap, 138)
            _write_code_msb(bw, *reversed(cl_codes[18]))
            bw.write(run - 11, 7)
            gap -= run
        for _ in range(gap):
            _write_code_msb(bw, *reversed(cl_codes[0]))
        ln = lengths[s]
        _write_code_msb(bw, *reversed(cl_codes[ln]))
        i = s + 1
    gap = alphabet_size - i
    while gap >= 11:
        run = min(gap, 138)
        _write_code_msb(bw, *reversed(cl_codes[18]))
        bw.write(run - 11, 7)
        gap -= run
    for _ in range(gap):
        _write_code_msb(bw, *reversed(cl_codes[0]))
