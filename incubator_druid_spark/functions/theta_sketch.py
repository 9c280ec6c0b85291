"""Compact theta sketch (Apache DataSketches) binary reader.

Supports `thetaSketchConstant` post-aggregators
(extensions-core/datasketches/.../theta/SketchConstantPostAggregator.java):
a base64 serialized compact theta sketch appearing as a literal operand in
estimate / set-op post-aggregations.

Format: the public DataSketches theta serialization, serial version 3
(documented in the datasketches-java memory layout):

  byte 0      preamble longs (1 = empty/single-item, 2 = exact, 3 = estimation)
  byte 1      serial version (3)
  byte 2      family id (3 = COMPACT)
  byte 3..4   lgNomLongs / lgArrLongs (unused in compact form)
  byte 5      flags: bit0 BIG_ENDIAN, bit1 READ_ONLY, bit2 EMPTY,
              bit3 COMPACT, bit4 ORDERED
  bytes 6..7  seed hash
  [preLongs>=2] bytes 8..11 retained-entry count, 12..15 sampling p
  [preLongs==3] bytes 16..23 thetaLong
  then the retained 63-bit hash values as little-endian longs

Semantics notes:
- theta = thetaLong / MAX_LONG; estimate = count / theta.
- Set ops follow the standard theta union/intersection/a-not-b rules:
  operate on hash sets, cut at the minimum theta of the operands.
- This engine computes its own theta aggregations exactly (count-distinct
  rewrite), so a constant sketch can combine with other *constants* but not
  with a column-derived exact set: the constant holds murmur hashes of the
  original values, the exact set holds the values themselves — there is no
  common domain to intersect.  That case raises with a rewrite hint.
"""

from __future__ import annotations

import base64
import struct

_MAX_LONG = (1 << 63) - 1


class ConstantThetaSketch:
    """Parsed compact theta sketch: retained hashes + theta fraction."""

    __slots__ = ("hashes", "theta")

    def __init__(self, hashes: frozenset[int], theta: float):
        self.hashes = hashes
        self.theta = theta

    @property
    def estimate(self) -> float:
        return len(self.hashes) / self.theta if self.theta > 0 else 0.0


def parse_compact_theta(value: str | bytes) -> ConstantThetaSketch:
    """Parse a base64 (or raw bytes) serialized compact theta sketch."""
    data = base64.b64decode(value) if isinstance(value, str) else bytes(value)
    if len(data) < 8:
        raise ValueError(f"theta sketch too short: {len(data)} bytes")
    pre_longs, ser_ver, family = data[0] & 0x3F, data[1], data[2]
    flags = data[5]
    if ser_ver != 3:
        raise ValueError(f"unsupported theta sketch serVer {ser_ver} (expect 3)")
    if family not in (3,):  # COMPACT
        raise ValueError(f"unsupported theta sketch family {family} (expect "
                         "3=COMPACT; rebuild with .compact() before serializing)")
    empty = bool(flags & 0x04)
    if empty:
        return ConstantThetaSketch(frozenset(), 1.0)
    if pre_longs == 1:
        # serVer-3 single-item form: one hash follows the preamble long
        if len(data) < 16:
            raise ValueError("single-item theta sketch missing its hash")
        (h,) = struct.unpack_from("<q", data, 8)
        return ConstantThetaSketch(frozenset((h,)), 1.0)
    (count,) = struct.unpack_from("<i", data, 8)
    theta_long = _MAX_LONG
    offset = 16
    if pre_longs >= 3:
        (theta_long,) = struct.unpack_from("<q", data, 16)
        offset = 24
    need = offset + 8 * count
    if len(data) < need:
        raise ValueError(f"theta sketch truncated: {len(data)} < {need} bytes")
    hashes = frozenset(struct.unpack_from(f"<{count}q", data, offset))
    return ConstantThetaSketch(hashes, theta_long / _MAX_LONG)


# DataSketches ThetaUtil.computeSeedHash(DEFAULT_UPDATE_SEED=9001) — the
# murmur-derived short written at bytes 6-7.  Sketch.wrap validates the
# stored seed hash against this (and rejects a zero seed hash outright), so
# exported sketches must carry it to load in Druid/datasketches-java.
_DEFAULT_SEED_HASH = 37836  # == (short) -27700 as unsigned


def serialize_compact_theta(hashes, theta: float = 1.0) -> bytes:
    """Serialize a hash set as a compact ordered theta sketch (serVer 3) —
    the inverse of parse_compact_theta, used by tests and by exporters."""
    hs = sorted(set(hashes))
    sh = _DEFAULT_SEED_HASH
    flags = 0x02 | 0x08 | 0x10  # READ_ONLY | COMPACT | ORDERED
    if not hs:
        return struct.pack("<BBBBBBH", 1, 3, 3, 0, 0, flags | 0x04, sh)
    if theta >= 1.0 and len(hs) == 1:
        # datasketches marks the 16-byte single-item form with flag bit
        # 0x20 (SINGLEITEM) — required for byte-parity with
        # CompactSketch.toByteArray() (pinned in
        # tests/test_theta_fixture_bytes.py); readers detect the form by
        # preLongs==1 + non-EMPTY either way.
        return struct.pack("<BBBBBBHq", 1, 3, 3, 0, 0, flags | 0x20, sh, hs[0])
    if theta >= 1.0:
        head = struct.pack("<BBBBBBHif", 2, 3, 3, 0, 0, flags, sh, len(hs), 1.0)
    else:
        head = struct.pack("<BBBBBBHifq", 3, 3, 3, 0, 0, flags, sh, len(hs),
                           1.0, int(theta * _MAX_LONG))
    return head + struct.pack(f"<{len(hs)}q", *hs)


# ---------------------------------------------------------------------------
# Update-side hashing (MurmurHash3 x64-128, the public Austin Appleby
# algorithm datasketches-java ships verbatim).  `theta_string_hash63`
# reproduces UpdateSketch.update(String): murmur128(utf8 bytes, seed
# 9001)[0] >>> 1.  Byte-for-byte agreement of a sketch built from these
# hashes + serialize_compact_theta with the JVM's
# UpdateSketch.update(...).compact().toByteArray() is pinned by
# tests/test_theta_fixture_bytes.py — this is what lets fixture builders
# hash tens of thousands of values WITHOUT one py4j round trip per value
# (measured: the theta segment fixture spent ~30 s in its driver update
# loop at sf0.1).

_M64 = (1 << 64) - 1
_MC1 = 0x87C37B91114253D5
_MC2 = 0x4CF5AD432745937F
DEFAULT_UPDATE_SEED = 9001


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _M64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _M64
    h ^= h >> 33
    return h


def murmur128_x64(data: bytes, seed: int = DEFAULT_UPDATE_SEED) -> tuple[int, int]:
    """MurmurHash3 x64-128 (two-accumulator variant) of ``data``; returns
    (h1, h2) as unsigned 64-bit ints — identical to datasketches-java
    ``MurmurHash3.hash(byte[], seed)``."""
    h1 = h2 = seed & _M64
    ln = len(data)
    nblocks = ln >> 4
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i << 4)
        k1 = _rotl((k1 * _MC1) & _M64, 31)
        h1 ^= (k1 * _MC2) & _M64
        h1 = ((_rotl(h1, 27) + h2) * 5 + 0x52DCE729) & _M64
        k2 = _rotl((k2 * _MC2) & _M64, 33)
        h2 ^= (k2 * _MC1) & _M64
        h2 = ((_rotl(h2, 31) + h1) * 5 + 0x38495AB5) & _M64
    tail = data[nblocks << 4:]
    t = len(tail)
    if t > 8:
        k2 = 0
        for i in range(t - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = _rotl((k2 * _MC2) & _M64, 33)
        h2 ^= (k2 * _MC1) & _M64
    if t > 0:
        k1 = 0
        for i in range(min(t, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = _rotl((k1 * _MC1) & _M64, 31)
        h1 ^= (k1 * _MC2) & _M64
    h1 ^= ln
    h2 ^= ln
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def theta_string_hash63(value: str, seed: int = DEFAULT_UPDATE_SEED) -> int:
    """The 63-bit retained hash ``UpdateSketch.update(String)`` stores:
    murmur128 of the UTF-8 bytes, first long, unsigned-shifted right 1."""
    return murmur128_x64(value.encode("utf-8"), seed)[0] >> 1


def theta_merge_udf(read, return_type):
    """pandas UDF factory over a ``collect_list(<binary col>)`` aggregate:
    parse + UNION the group's stored compact theta sketches
    (SketchHolder.java union path: cut at min theta, union hash sets), then
    apply ``read(sketch)``.  Arrow-batched — one merged read per GROUP,
    never per input row; sketch bytes are bounded (k-capped), so the
    collected list is small regardless of raw-row scale."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    def run(col):
        out = []
        for lst in col:
            if lst is None or len(lst) == 0:
                out.append(None)
                continue
            views = [parse_compact_theta(b) for b in lst if b is not None]
            if not views:
                out.append(None)
                continue
            out.append(read(theta_set_op("UNION", views)))
        return pd.Series(out, dtype=object)

    run.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(run, return_type)


def theta_set_op(func: str, operands: list[ConstantThetaSketch]) -> ConstantThetaSketch:
    """UNION / INTERSECT / NOT over constant sketches (SketchSetPostAggregator
    semantics): cut every operand at the minimum theta, then set-combine."""
    if not operands:
        raise ValueError("theta set op needs at least one operand")
    theta = min(s.theta for s in operands)
    cut = int(theta * _MAX_LONG)
    sets = [frozenset(h for h in s.hashes if h < cut) if s.theta > theta
            else s.hashes for s in operands]
    f = func.upper()
    if f == "UNION":
        out = frozenset().union(*sets)
    elif f == "INTERSECT":
        out = sets[0]
        for s in sets[1:]:
            out = out & s
    elif f == "NOT":
        out = sets[0]
        for s in sets[1:]:
            out = out - s
    else:
        raise ValueError(f"unknown theta set op {func!r}")
    return ConstantThetaSketch(out, theta)
