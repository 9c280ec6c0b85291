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
        return struct.pack("<BBBBBBHq", 1, 3, 3, 0, 0, flags, sh, hs[0])
    if theta >= 1.0:
        head = struct.pack("<BBBBBBHif", 2, 3, 3, 0, 0, flags, sh, len(hs), 1.0)
    else:
        head = struct.pack("<BBBBBBHifq", 3, 3, 3, 0, 0, flags, sh, len(hs),
                           1.0, int(theta * _MAX_LONG))
    return head + struct.pack(f"<{len(hs)}q", *hs)


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
