"""Byte-parity pin for the Python theta-sketch builder (r9).

The theta segment fixture (`theta_sketch_column_estimate`) historically
built its Druid-serialized bytes with one py4j ``UpdateSketch.update``
round trip per value (~80k crossings at sf0.1).  It now hashes in-process
(theta_string_hash63) and serializes with serialize_compact_theta; these
tests pin that path byte-for-byte against datasketches-java so the
fixture's binary-interop claim is ASSERTED, not assumed:

* murmur128_x64 == org.apache.datasketches.hash.MurmurHash3.hash
* serialize_compact_theta([theta_string_hash63(v) ...]) ==
  UpdateSketch.update(v...).compact().toByteArray() for empty / single /
  exact-mode multi-entry sketches, including the 0x20 SINGLEITEM flag.
"""

from __future__ import annotations

import pytest

from incubator_druid_spark.functions.theta_sketch import (
    murmur128_x64, parse_compact_theta, serialize_compact_theta,
    theta_string_hash63)


@pytest.fixture(scope="module")
def jvm(spark):
    return spark.sparkContext._jvm


def _jvm_sketch_bytes(jvm, values):
    sk = jvm.org.apache.datasketches.theta.UpdateSketch.builder().build()
    for v in values:
        sk.update(v)
    return bytes(sk.compact().toByteArray())


def test_murmur128_matches_datasketches(jvm):
    MH = jvm.org.apache.datasketches.hash.MurmurHash3
    cases = [(b"a", 9001), (b"hello world", 9001), (b"user_12345", 9001),
             (b"0123456789abcdef", 9001), (b"0123456789abcdefX", 9001),
             (b"x" * 31, 9001), (b"y" * 16, 1), (b"z" * 9, 9001),
             (b"q" * 8, 9001), ("héllo wörld".encode(), 9001)]
    for data, seed in cases:
        jr = MH.hash(bytes(data), seed)
        assert (jr[0] & (2**64 - 1), jr[1] & (2**64 - 1)) == \
            murmur128_x64(data, seed), data


@pytest.mark.parametrize("values", [
    ["42"],
    ["1", "2", "3"],
    [f"user_{i}" for i in range(541)],
    [str(i) for i in range(97)],
])
def test_sketch_bytes_match_datasketches(jvm, values):
    py = serialize_compact_theta([theta_string_hash63(v) for v in values])
    assert py == _jvm_sketch_bytes(jvm, values)
    # and the engine's own reader agrees on the estimate
    assert parse_compact_theta(py).estimate == len(values)


def test_single_item_flag_bit(jvm):
    py = serialize_compact_theta([theta_string_hash63("only")])
    assert py[0] == 1  # preamble longs: single-item form
    assert py[5] & 0x20  # SINGLEITEM flag, as datasketches writes it
    assert py == _jvm_sketch_bytes(jvm, ["only"])
