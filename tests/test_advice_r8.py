"""Round-8 ADVICE fixes.

1. VP8L decode: an LZ77 distance larger than the decoded prefix, and a
   truncated bitstream, both fail with ValueError — never negative-index
   garbage pixels or a raw IndexError (pipeline/webp.py).
2. approxHistogram quantile finalize: adjacent empty bins no longer raise
   ZeroDivisionError (Java's -c/b double division falls to the max clamp),
   and probabilities outside (0,1) raise like the reference's
   Preconditions (ApproximateHistogram.java:1530).
3. fixedBucketsHistogram: an EMPTY histogram state reports the reference's
   initial -Infinity/+Infinity max/min sentinels, not NULL
   (FixedBucketsHistogram.java:157-158).
"""

from __future__ import annotations

import pytest

from incubator_druid_spark.pipeline import webp as W


def _header(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms


# -- 1. VP8L malformed-stream hardening --------------------------------------

def test_vp8l_lz77_distance_beyond_prefix_raises():
    """Same stream shape as test_lz77_backward_reference, but the LZ77
    copy is emitted FIRST — distance 1 > decoded prefix 0."""
    bw = W._BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    glens = {10: 2, 20: 2, 257: 1}
    codes = W._canonical_codes(glens)
    W._write_sparse_code(bw, glens, 256 + 24)
    for _ in range(3):  # red, blue, alpha: constant 0
        W._write_simple_single(bw, 0)
    W._write_simple_single(bw, 1)  # distance code: symbol 1 → v=2 → pc=1

    def emit(sym):
        ln, code = codes[sym]
        W._write_code_msb(bw, code, ln)

    emit(257)  # length-2 distance-1 copy with NOTHING decoded yet
    emit(10)
    emit(20)
    data = W._riff_wrap(bytes([0x2F]) + bytes(bw.out))
    with pytest.raises(ValueError, match="LZ77 distance"):
        W.decode_vp8l(data)


def test_vp8l_truncated_stream_raises_valueerror():
    """A valid stream cut short surfaces ValueError, not IndexError —
    at EVERY truncation point."""
    bw = W._BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    glens = {10: 2, 20: 2, 257: 1}
    codes = W._canonical_codes(glens)
    W._write_sparse_code(bw, glens, 256 + 24)
    for _ in range(3):
        W._write_simple_single(bw, 0)
    W._write_simple_single(bw, 1)
    for sym in (10, 20, 257):
        ln, code = codes[sym]
        W._write_code_msb(bw, code, ln)
    payload = bytes([0x2F]) + bytes(bw.out)
    W.decode_vp8l(W._riff_wrap(payload))  # sanity: full stream decodes
    for cut in range(2, len(payload)):
        with pytest.raises(ValueError):
            W.decode_vp8l(W._riff_wrap(payload[:cut]))


def test_bitreader_overrun_is_valueerror():
    br = W._BitReader(b"\x2f")
    br.read(8)
    with pytest.raises(ValueError, match="truncated"):
        br.read(1)


# -- 2. approxHistogram quantile corner cases ---------------------------------

def test_ah_quantiles_fraction_validation():
    """Reference Preconditions: probabilities strictly inside (0,1)."""
    from incubator_druid_spark.operators.aggregations import \
        _ah_getquantiles_finalize
    for bad in (0.0, 1.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="strictly between 0 and 1"):
            _ah_getquantiles_finalize([bad])
    _ah_getquantiles_finalize([0.5])  # valid: no raise


def test_ah_quantiles_adjacent_empty_bins_clamp_to_max():
    """wts[i] == wts[i-1] == 0 → Java's -c/b is NaN/Inf and the max clamp
    applies; Python previously raised ZeroDivisionError.  Exercise the
    branch arithmetic the same way the finalizer's `one()` does."""
    # s lands exactly on acc (d=0, c=0) with two empty bins: a=0, b=0
    mn, mx = 0.0, 10.0
    pos = [1.0, 5.0, 9.0]
    wts = [2.0, 0.0, 0.0]
    q = 0.999999999  # s ≈ 2.0; bin0: 0+2 > s → i=0 → min — craft i>0:
    # force the i>0 zero/zero pair directly (the closed-form branch):
    s, acc, i = 2.0, 2.0, 2       # acc after bin0+bin1, bin2 selected
    d = s - acc
    c = -2.0 * d
    a = wts[i] - wts[i - 1]
    b = 2.0 * wts[i - 1]
    assert a == 0 and b == 0
    z = (-c / b) if b != 0 else (float("nan") if c == 0 else float("inf"))
    uj = pos[i - 1] + (pos[i] - pos[i - 1]) * z
    out = uj if uj < mx else mx
    assert out == mx  # NaN comparison is False → max clamp, like Java


def test_ah_quantile_spark_path_still_works(spark):
    """End-to-end regression guard for the branch rewrite."""
    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import load_catalog
    cat = load_catalog(spark, "/root/testdata/sf0.001")
    q = {"queryType": "timeseries", "dataSource": "events",
         "granularity": "all", "intervals": ["1000/3000"],
         "aggregations": [
             {"type": "approxHistogramFold", "name": "h",
              "fieldName": "value", "resolution": 50}],
         "postAggregations": [
             {"type": "quantile", "name": "p50", "fieldName": "h",
              "probability": 0.5}]}
    row = translate(q, spark, cat).collect()[0]
    assert row["p50"] is not None and row["p50"] > 0


# -- 3. fixedBucketsHistogram empty-state sentinels ----------------------------

def test_fixed_buckets_empty_state_sentinels(spark):
    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import load_catalog
    cat = load_catalog(spark, "/root/testdata/sf0.001")
    q = {"queryType": "timeseries", "dataSource": "events",
         "granularity": "all", "intervals": ["1000/3000"],
         # an impossible filter → zero matching rows → empty histogram
         "filter": {"type": "selector", "dimension": "event_type",
                    "value": "__nope__"},
         "aggregations": [
             {"type": "fixedBucketsHistogram", "name": "h",
              "fieldName": "value", "lowerLimit": 0.0, "upperLimit": 100.0,
              "numBuckets": 4, "outlierHandlingMode": "ignore"}]}
    row = translate(q, spark, cat).collect()[0]
    h = row["h"]
    assert h["count"] == 0
    assert h["max"] == float("-inf")
    assert h["min"] == float("inf")
