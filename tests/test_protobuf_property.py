"""Property-based round-trip for the protobuf wire codec (no Spark needed):
random messages encoded with an independent hand-written encoder must decode
to the same values via sources/protobuf.py.  Mirrors the reference's
protobuf-extensions serde tests, but with generated rather than fixed data."""

import struct as S

from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_druid_spark.sources.protobuf import (decode_message,
                                                    parse_descriptor_set,
                                                    spark_schema,
                                                    split_delimited)


def _varint(n: int) -> bytes:
    n &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def _tag(f, w):
    return _varint((f << 3) | w)


def _ld(f, p):
    return _tag(f, 2) + _varint(len(p)) + p


def _vi(f, n):
    return _tag(f, 0) + _varint(n)


def _field(name, num, ftype, label=1, type_name=None):
    b = _ld(1, name.encode()) + _vi(3, num) + _vi(4, label) + _vi(5, ftype)
    if type_name:
        b += _ld(6, type_name.encode())
    return b


def _registry():
    msg = (_ld(1, b"M")
           + _ld(2, _field("i64", 1, 3))          # int64
           + _ld(2, _field("txt", 2, 9))          # string
           + _ld(2, _field("dbl", 3, 1))          # double
           + _ld(2, _field("flags", 4, 5, label=3))   # repeated int32
           + _ld(2, _field("raw", 5, 12))         # bytes
           + _ld(2, _field("z", 6, 18)))          # sint64 (zigzag)
    fdp = _ld(1, b"p.proto") + _ld(2, b"p") + _ld(4, msg)
    return parse_descriptor_set(_ld(1, fdp))


REG = _registry()
FIELDS = REG["p.M"]


def _encode(i64, txt, dbl, flags, raw, z):
    zz = (z << 1) ^ (z >> 63)
    return (_vi(1, i64) + _ld(2, txt.encode()) + _tag(3, 1) + S.pack("<d", dbl)
            + _ld(4, b"".join(_varint(f) for f in flags))
            + _ld(5, raw) + _vi(6, zz))


@settings(max_examples=200, deadline=None)
@given(i64=st.integers(-(1 << 62), 1 << 62),
       txt=st.text(max_size=40),
       dbl=st.floats(allow_nan=False, allow_infinity=False),
       flags=st.lists(st.integers(-(1 << 31), (1 << 31) - 1), max_size=6),
       raw=st.binary(max_size=20),
       z=st.integers(-(1 << 62), 1 << 62))
def test_roundtrip(i64, txt, dbl, flags, raw, z):
    out = decode_message(_encode(i64, txt, dbl, flags, raw, z), FIELDS, REG)
    assert out["i64"] == i64
    assert out["txt"] == txt
    assert out["dbl"] == dbl
    assert out["flags"] == flags
    assert out["raw"] == raw
    assert out["z"] == z


@settings(max_examples=50, deadline=None)
@given(msgs=st.lists(st.tuples(st.integers(0, 1 << 40), st.text(max_size=10)),
                     max_size=8))
def test_delimited_stream(msgs):
    blob = b"".join(
        _varint(len(m)) + m
        for m in (_encode(i, t, 0.0, [], b"", 0) for i, t in msgs))
    parts = split_delimited(blob)
    assert len(parts) == len(msgs)
    for part, (i, t) in zip(parts, msgs):
        out = decode_message(part, FIELDS, REG)
        assert (out["i64"], out["txt"]) == (i, t)


def test_schema_mapping():
    s = spark_schema(FIELDS, REG)
    kinds = {f.name: f.dataType.simpleString() for f in s.fields}
    assert kinds == {"i64": "bigint", "txt": "string", "dbl": "double",
                     "flags": "array<bigint>", "raw": "binary", "z": "bigint"}
