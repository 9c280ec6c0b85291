"""Druid/Hive BloomKFilter binary interop.

BloomDimFilter carries a base64 serialized BloomKFilter
(extensions-core/druid-bloom-filter/.../query/filter/BloomKFilter.java,
format documented at :135-149: 1 byte numHashFunctions, 1 big-endian int
bitset-long-count, big-endian longs).  The hash family is Hive's
Murmur3.hash64 (seed 104729, NULL_HASHCODE for nulls), with the
block-structured probe of BloomKFilter.addHash/:392-425: the first hash
picks an 8-long block, each of the k combined hashes sets one bit inside it
(LSB 3 bits → long within block, next 6 bits → bit within long).

This module is the *interop* path: filters serialized by a Druid cluster
test correctly here, and filters built here load in Druid.  The engine's
fast JVM-side path (sparse position sets over xxhash64 — functions/bloom.py)
remains the native format; probing a BloomKFilter runs as an Arrow-batched
pandas UDF because Spark has no murmur3-64 expression.
"""

from __future__ import annotations

import base64
import struct

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_R1, _R2 = 31, 27
_M, _N1 = 5, 0x52DCE729
_MASK64 = (1 << 64) - 1
DEFAULT_SEED = 104729
NULL_HASHCODE = 2862933555777941757


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _MASK64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _MASK64
    h ^= h >> 33
    return h


def murmur3_64(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """Hive Murmur3.hash64 (the 64-bit single-accumulator variant used by
    BloomKFilter) — returns a SIGNED 64-bit value like the Java original."""
    h = seed & _MASK64
    length = len(data)
    nblocks = length >> 3
    for i in range(nblocks):
        (k,) = struct.unpack_from("<Q", data, i << 3)
        k = (k * _C1) & _MASK64
        k = _rotl64(k, _R1)
        k = (k * _C2) & _MASK64
        h ^= k
        h = (_rotl64(h, _R2) * _M + _N1) & _MASK64
    tail = data[nblocks << 3:]
    if tail:
        k1 = 0
        for i in range(len(tail) - 1, -1, -1):
            k1 ^= tail[i] << (8 * i)
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, _R1)
        k1 = (k1 * _C2) & _MASK64
        h ^= k1
    h ^= length
    h = _fmix64(h)
    return h - (1 << 64) if h >= (1 << 63) else h


class BloomKFilter:
    """Parsed BloomKFilter: k hash functions over a block-aligned bitset."""

    BLOCK = 8  # longs per block (DEFAULT_BLOCK_SIZE)

    def __init__(self, bits: list[int], k: int):
        if len(bits) % self.BLOCK:
            raise ValueError("BloomKFilter bitset must be block-aligned")
        self.bits = bits  # unsigned 64-bit ints
        self.k = k
        self.total_blocks = len(bits) // self.BLOCK

    # -- construction ------------------------------------------------------
    @classmethod
    def for_entries(cls, max_entries: int, fpp: float = 0.05) -> "BloomKFilter":
        import math
        num_bits = int(-max_entries * math.log(fpp) / (math.log(2) ** 2))
        k = max(1, round(num_bits / max_entries * math.log(2)))
        n_longs = -(-num_bits // 64)
        n_longs += cls.BLOCK - n_longs % cls.BLOCK  # pad to block
        return cls([0] * n_longs, k)

    @classmethod
    def deserialize(cls, data: str | bytes) -> "BloomKFilter":
        raw = base64.b64decode(data) if isinstance(data, str) else bytes(data)
        k = raw[0]
        (n,) = struct.unpack_from(">i", raw, 1)
        bits = list(struct.unpack_from(f">{n}Q", raw, 5))
        return cls(bits, k)

    def serialize(self) -> bytes:
        return (struct.pack(">bi", self.k, len(self.bits))
                + struct.pack(f">{len(self.bits)}Q", *self.bits))

    # -- probe math (BloomKFilter.addHash/testHash) ------------------------
    def _probes(self, hash64: int):
        h1 = (hash64 & 0xFFFFFFFF)
        h1 = h1 - (1 << 32) if h1 >= (1 << 31) else h1          # signed int
        h2 = ((hash64 >> 32) & 0xFFFFFFFF)
        h2 = h2 - (1 << 32) if h2 >= (1 << 31) else h2
        first = (h1 + h2) & 0xFFFFFFFF
        first = first - (1 << 32) if first >= (1 << 31) else first
        if first < 0:
            first = ~first
        block_base = (first % self.total_blocks) << 3
        for i in range(1, self.k + 1):
            c = (h1 + (i + 1) * h2) & 0xFFFFFFFF
            c = c - (1 << 32) if c >= (1 << 31) else c
            if c < 0:
                c = ~c
            yield block_base + (c & 7), (c >> 3) & 63

    def add_bytes(self, val: bytes | None) -> None:
        h = NULL_HASHCODE if val is None else murmur3_64(val)
        for off, bit in self._probes(h):
            self.bits[off] |= (1 << bit)

    def test_bytes(self, val: bytes | None) -> bool:
        h = NULL_HASHCODE if val is None else murmur3_64(val)
        return all(self.bits[off] & (1 << bit) for off, bit in self._probes(h))

    def add_string(self, s: str | None) -> None:
        self.add_bytes(None if s is None else s.encode("utf-8"))

    def test_string(self, s: str | None) -> bool:
        return self.test_bytes(None if s is None else s.encode("utf-8"))

    # -- numeric paths (BloomKFilter.addLong/addFloat/addDouble) -----------
    # Hive's Murmur3.hash64(long) equals hash64 of the value's BIG-endian 8
    # bytes (verified against hive-storage-api ground truth); addInt goes
    # through the byte path with LITTLE-endian 4 bytes.
    def _long_hash(self, v: int) -> int:
        import struct
        return murmur3_64(struct.pack(">q", v))

    def add_long(self, v: int) -> None:
        for off, bit in self._probes(self._long_hash(v)):
            self.bits[off] |= (1 << bit)

    def test_long(self, v: int) -> bool:
        return all(self.bits[off] & (1 << bit)
                   for off, bit in self._probes(self._long_hash(v)))

    @staticmethod
    def _float_bits(v: float) -> int:
        import math
        import struct
        if math.isnan(v):
            return 0x7FC00000  # Float.floatToIntBits canonical NaN
        return struct.unpack(">i", struct.pack(">f", v))[0]

    @staticmethod
    def _double_bits(v: float) -> int:
        import math
        import struct
        if math.isnan(v):
            return 0x7FF8000000000000  # Double.doubleToLongBits canonical NaN
        return struct.unpack(">q", struct.pack(">d", v))[0]

    def add_float(self, v: float) -> None:
        import struct
        self.add_bytes(struct.pack("<i", self._float_bits(v)))

    def test_float(self, v: float) -> bool:
        import struct
        return self.test_bytes(struct.pack("<i", self._float_bits(v)))

    def add_double(self, v: float) -> None:
        self.add_long(self._double_bits(v))

    def test_double(self, v: float) -> bool:
        return self.test_long(self._double_bits(v))


def bloomk_might_contain(serialized: str | bytes, kind: str = "string"):
    """→ pandas UDF Column factory: membership of a column in a serialized
    BloomKFilter.  Arrow-batched; the parsed filter is built once per
    executor (closure capture), rows test in a tight loop.

    ``kind`` selects the Druid add-path the filter was built with —
    BloomKFilter.addLong/addFloat/addDouble hash the NUMERIC representation
    (Hive hash64(long) / floatToIntBits LE bytes), not the decimal string,
    so a Druid filter over a LONG/FLOAT/DOUBLE column needs the matching
    probe.  Feed the udf the column CAST TO STRING (exact for all types —
    Java to-string round-trips, and it keeps nullable longs out of pandas'
    lossy float64 fallback); values are re-parsed per kind here.  A null
    value probes the NULL_HASHCODE slot, matching addBytes(null)."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    bf = BloomKFilter.deserialize(serialized)
    tester = {
        "string": bf.test_string,
        "long": lambda v: bf.test_long(int(v)),
        "float": lambda v: bf.test_float(float(v)),
        "double": lambda v: bf.test_double(float(v)),
    }[kind]

    def probe(col):
        return col.map(
            lambda v: bf.test_bytes(None) if v is None else tester(v),
            na_action=None)

    # annotations set explicitly: this module uses postponed annotation
    # evaluation, which pandas_udf's hint inspection can't resolve
    probe.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(probe, "boolean")
