"""Tests for pipeline/phash.py — perceptual image hashing + banded
Hamming near-dup pairs (the image modality of the dedup family)."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.dedup import banded_hamming_pairs
from incubator_druid_spark.pipeline.phash import (
    dct_table, dhash64, gray_int, image_hash_rows, phash64,
    phash_near_dup_pairs)


def _gradient(w, h, phase=0):
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            arr[y, x] = [(x * 3 + y * 5 + phase) % 256,
                         (x * 7 + y * 2 + phase) % 256,
                         (x * 4 + y * 9 + phase) % 256]
    return arr


def test_gray_int_is_integer_bt601():
    arr = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255],
                     [10, 20, 30]]], dtype=np.uint8)
    g = gray_int(arr)
    assert g.tolist()[0] == [255 * 299 // 1000, 587 * 255 // 1000,
                             114 * 255 // 1000,
                             (299 * 10 + 587 * 20 + 114 * 30) // 1000]


def test_hashes_are_64_bit_strings_and_deterministic():
    g = gray_int(_gradient(50, 40))
    d1, d2 = dhash64(g), dhash64(g)
    p1, p2 = phash64(g), phash64(g)
    assert d1 == d2 and p1 == p2
    assert len(d1) == 64 and set(d1) <= {"0", "1"}
    assert len(p1) == 64 and set(p1) <= {"0", "1"}


def test_phash_invariant_to_uniform_brightness():
    # adding a constant only moves the DC coefficient and the median by
    # the same rank position, so the AC bits stay put — the property
    # that makes pHash a *perceptual* hash
    g = gray_int(_gradient(64, 64))
    g2 = np.minimum(g + 7, 255)
    p1, p2 = phash64(g), phash64(g2)
    ham = sum(a != b for a, b in zip(p1, p2))
    assert ham <= 2


def test_dhash_detects_similarity_and_difference():
    base = gray_int(_gradient(64, 64))
    near = base.copy()
    near[8:12, 8:12] += 30
    far = gray_int(_gradient(64, 64, phase=97))
    d0, dn, df = dhash64(base), dhash64(near), dhash64(far)
    assert sum(a != b for a, b in zip(d0, dn)) <= 6
    assert sum(a != b for a, b in zip(d0, df)) > 10


def test_phash_lower_median_threshold():
    # constant image: the DC coefficient towers over the (tiny, rounding
    # -residue) AC coefficients, so its bit is set; 'coeff > lower
    # median' can mark at most 32 of the 64 coefficients
    g = np.full((32, 32), 100, dtype=np.int64)
    p = phash64(g)
    assert p[0] == "1"
    assert p.count("1") <= 32


def test_dct_table_shape_and_dc_row():
    t = dct_table()
    assert len(t) == 8 and all(len(r) == 32 for r in t)
    assert all(v == 16384 for v in t[0])  # u=0: cos(0) row


def test_banded_hamming_pairs_complete_vs_brute_force(spark):
    rng = random.Random(7)
    base = "".join(rng.choice("01") for _ in range(64))

    def flip(s, k):
        pos = rng.sample(range(64), k)
        return "".join(("1" if c == "0" else "0") if i in pos else c
                       for i, c in enumerate(s))

    sigs = [(i, flip(base, rng.randint(0, 12))) for i in range(30)]
    df = spark.createDataFrame(sigs, ["doc_id", "sig"])
    for max_h in (0, 3, 7):
        got = {(r["id_a"], r["id_b"], r["hamming"])
               for r in banded_hamming_pairs(df, "doc_id", "sig",
                                             max_h).collect()}
        want = set()
        for i, (ia, sa) in enumerate(sigs):
            for ib, sb in sigs[i + 1:]:
                h = sum(a != b for a, b in zip(sa, sb))
                if h <= max_h:
                    want.add((ia, ib, h))
        assert got == want, max_h


def test_banded_hamming_rejects_bad_threshold(spark):
    df = spark.createDataFrame([(1, "0" * 64)], ["doc_id", "sig"])
    with pytest.raises(ValueError):
        banded_hamming_pairs(df, "doc_id", "sig", max_hamming=64)


def _ppm(arr):
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _bmp(arr):
    import struct as st
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    out = b"BM" + st.pack("<IHHI", 54 + stride * h, 0, 0, 54)
    out += st.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                   2835, 2835, 0, 0)
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            r, g, b = arr[y, x]
            row += bytes((b, g, r))
        row += bytes(stride - w * 3)
        out += bytes(row)
    return out


def test_image_hash_rows_ppm_bmp_agree(spark):
    """The same pixels through the PPM and BMP decode paths must produce
    identical hashes — any disagreement means a decoder bug."""
    arr = _gradient(52, 44)
    df = spark.createDataFrame(
        [(1, bytearray(_ppm(arr))), (2, bytearray(_bmp(arr))),
         (3, bytearray(b"not an image"))],
        "doc_id long, content binary")
    rows = {r["doc_id"]: r for r in image_hash_rows(df).collect()}
    assert set(rows) == {1, 2}  # undecodable blob yields no row
    assert rows[1]["dhash64"] == rows[2]["dhash64"]
    assert rows[1]["phash64"] == rows[2]["phash64"]
    assert rows[1]["width"] == 52 and rows[1]["height"] == 44
    g = gray_int(arr)
    assert rows[1]["dhash64"] == dhash64(g)
    assert rows[1]["phash64"] == phash64(g)


def test_phash_near_dup_pairs_groups_members(spark):
    arrs = {}
    for gid in range(3):
        base = _gradient(48, 48, phase=gid * 83)
        for mem in range(2):
            a = base.copy().astype(np.int64)
            a = np.minimum(a + mem * 4, 255).astype(np.uint8)
            arrs[gid * 2 + mem] = a
    df = spark.createDataFrame(
        [(i, bytearray(_ppm(a))) for i, a in arrs.items()],
        "doc_id long, content binary")
    hashes = image_hash_rows(df)
    pairs = {(r["id_a"], r["id_b"])
             for r in phash_near_dup_pairs(hashes,
                                           max_hamming=7).collect()}
    # members of the same group pair up
    for gid in range(3):
        assert (gid * 2, gid * 2 + 1) in pairs
