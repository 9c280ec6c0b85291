"""FixedBucketsHistogramTest golden port (round 7) — the behavioral
families driven through the QUERY surface: percentilesFloat via the
histogram extension's quantile/quantiles post-aggs, outlier handling per
mode (getCount/getMin/getMax/outlier counters), missing-value counting,
and the min/max post-aggs over both histogram kinds
(extensions-core/histogram/src/test/java/org/apache/druid/query/
aggregation/histogram/FixedBucketsHistogramTest.java).

Not ported, with reasons:
  * testSerdeFullHistogram / testSerdeSparseHistogram /
    testCombineBase64 — the byte-level base64 wire format is the
    reference's segment serde; this engine's histogram state is a typed
    struct column.
  * testMerge* (12) — combineHistogram interpolation across DIFFERENT
    bucket ranges merges two pre-built sketches; the engine always
    aggregates from rows with one bucket spec per aggregator, so
    cross-spec merging has no query surface.  Same-bucket merging IS
    what the distributed aggregation performs (covered below by
    multi-partition inputs).
  * testOfferRandoms / testNormalDistribution — statistical smoke tests
    of the same percentile path asserted exactly by testOffer* here.
"""

import datetime as _dt

import pytest
from pyspark.sql import types as T

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog

FULL = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]
VALUES2 = [23, 19, 10, 16, 36, 2, 1, 9, 32, 30, 45, 46]
VALUES5 = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
VALUES7 = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 12, 12, 15, 20, 25, 25, 25]
OUTLIER_VALUES = [900, 300, -275, 500, -1000, 10, 199]


@pytest.fixture(scope="module")
def fb_catalog(spark, tmp_path_factory):
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("v2", T.DoubleType()),
        T.StructField("v5", T.DoubleType()),
        T.StructField("v7", T.DoubleType()),
        T.StructField("vo", T.DoubleType()),
    ])
    t = _dt.datetime(2000, 1, 1)
    n = max(len(VALUES2), len(VALUES5), len(VALUES7), len(OUTLIER_VALUES))
    rows = []
    for i in range(n):
        rows.append((t,
                     float(VALUES2[i]) if i < len(VALUES2) else None,
                     float(VALUES5[i]) if i < len(VALUES5) else None,
                     float(VALUES7[i]) if i < len(VALUES7) else None,
                     float(OUTLIER_VALUES[i])
                     if i < len(OUTLIER_VALUES) else None))
    path = str(tmp_path_factory.mktemp("fb_ds") / "fb.parquet")
    # several partitions so the distributed same-bucket merge is exercised
    spark.createDataFrame(rows, schema).repartition(4) \
        .write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("fb", path)
    return cat


def run(spark, cat, aggs, posts):
    q = {"queryType": "timeseries", "dataSource": "fb",
         "granularity": "all", "intervals": FULL,
         "aggregations": aggs, "postAggregations": posts}
    return translate(q, spark, cat).collect()[0]


def fbh(field, lo, hi, n, mode="overflow"):
    return {"type": "fixedBucketsHistogram", "name": "h",
            "fieldName": field, "lowerLimit": lo, "upperLimit": hi,
            "numBuckets": n, "outlierHandlingMode": mode}


def test_offer(spark, fb_catalog):
    """testOffer — VALUES2 in [0,200)×200, percentiles 12.5/50/98."""
    r = run(spark, fb_catalog, [fbh("v2", 0, 200, 200)],
            [{"type": "quantiles", "name": "q", "fieldName": "h",
              "probabilities": [0.125, 0.50, 0.98]}])
    assert r["q"] == pytest.approx([2.5, 20.0, 46.76], abs=0.01)


def test_offer_with_negatives(spark, fb_catalog):
    """testOfferWithNegatives — [-100,100)×100 shifts the interpolation
    lattice."""
    r = run(spark, fb_catalog, [fbh("v2", -100, 100, 100)],
            [{"type": "quantiles", "name": "q", "fieldName": "h",
              "probabilities": [0.125, 0.50, 0.98]}])
    assert r["q"] == pytest.approx([3.0, 20.0, 47.52], abs=0.01)


def test_offer_values5(spark, fb_catalog):
    """testOfferValues5 / testOfferValues6 — 1..10 in [0,10)×10."""
    r = run(spark, fb_catalog, [fbh("v5", 0, 10, 10)],
            [{"type": "quantiles", "name": "q", "fieldName": "h",
              "probabilities": [0.125, 0.50, 0.98]}])
    assert r["q"] == pytest.approx([2.125, 5.5, 9.82], abs=0.01)


def test_offer_values7(spark, fb_catalog):
    """testOfferValues7 — repeated values in [0,50)×50; also the
    single-probability quantile post-agg form."""
    r = run(spark, fb_catalog, [fbh("v7", 0, 50, 50)],
            [{"type": "quantiles", "name": "q", "fieldName": "h",
              "probabilities": [0.125, 0.50, 0.98]},
             {"type": "quantile", "name": "q50", "fieldName": "h",
              "probability": 0.50}])
    assert r["q"] == pytest.approx([3.25, 10.0, 25.88], abs=0.01)
    assert r["q50"] == pytest.approx(10.0, abs=0.01)


def test_outlier_ignore(spark, fb_catalog):
    """testOutlierIgnore — outliers dropped entirely: count 2, min 10,
    max 199, zero outlier counters."""
    r = run(spark, fb_catalog, [fbh("vo", 0, 200, 200, "ignore")],
            [{"type": "min", "name": "mn", "fieldName": "h"},
             {"type": "max", "name": "mx", "fieldName": "h"}])
    h = r["h"]
    assert (h["upperOutlierCount"], h["lowerOutlierCount"]) == (0, 0)
    assert h["count"] == 2
    assert (r["mn"], r["mx"]) == (10.0, 199.0)


def test_outlier_overflow(spark, fb_catalog):
    """testOutlierOverflow — outliers counted in the side counters only:
    3 above (300, 500, 900), 2 below (-275, -1000)."""
    r = run(spark, fb_catalog, [fbh("vo", 0, 200, 200, "overflow")], [])
    h = r["h"]
    assert (h["upperOutlierCount"], h["lowerOutlierCount"]) == (3, 2)
    assert h["count"] == 2
    assert (h["min"], h["max"]) == (10.0, 199.0)


def test_outlier_clip(spark, fb_catalog):
    """testOutlierClip — outliers clip into the edge buckets and into
    count/min/max at the limits: count 7, min 0, max 200."""
    r = run(spark, fb_catalog, [fbh("vo", 0, 200, 200, "clip")], [])
    h = r["h"]
    assert (h["upperOutlierCount"], h["lowerOutlierCount"]) == (0, 0)
    assert h["count"] == 7
    assert (h["min"], h["max"]) == (0.0, 200.0)


def test_missing(spark, fb_catalog):
    """testMissing — null inputs increment missingValueCount, and the
    distributed merge sums the counters (the fixture's v5 column is null
    on 8 of 18 rows spread over 4 partitions)."""
    r = run(spark, fb_catalog, [fbh("v5", 0, 10, 10, "ignore")], [])
    assert r["h"]["missingValueCount"] == 8
    assert r["h"]["count"] == 9  # 1..9 in range; 10 >= upper is ignored


def test_approx_histogram_min_max_quantile_posts(spark, fb_catalog):
    """Min/Max/QuantilePostAggregator over an approxHistogram base —
    exact min/max (ApproximateHistogram tracks them exactly) and a
    percentile read."""
    r = run(spark, fb_catalog,
            [{"type": "approxHistogram", "name": "ah", "fieldName": "v5",
              "resolution": 50, "numBuckets": 7}],
            [{"type": "min", "name": "mn", "fieldName": "ah"},
             {"type": "max", "name": "mx", "fieldName": "ah"},
             {"type": "quantile", "name": "q50", "fieldName": "ah",
              "probability": 0.50}])
    assert (r["mn"], r["mx"]) == (1.0, 10.0)
    assert r["q50"] == pytest.approx(5.5, abs=1.0)


def test_approx_histogram_equal_buckets_post(spark, fb_catalog):
    """EqualBucketsPostAggregator — re-finalizes the centroid sketch with
    the post-agg's bucket count (toHistogram(numBuckets) breaks shape:
    size+1 breaks from min-delta to max)."""
    r = run(spark, fb_catalog,
            [{"type": "approxHistogram", "name": "ah", "fieldName": "v5",
              "resolution": 50, "numBuckets": 7}],
            [{"type": "equalBuckets", "name": "eb", "fieldName": "ah",
              "numBuckets": 3}])
    eb = r["eb"]
    assert len(eb["breaks"]) == 4 and len(eb["counts"]) == 3
    assert sum(eb["counts"]) == pytest.approx(10.0, abs=0.01)


def test_approx_histogram_custom_buckets_post(spark, fb_catalog):
    """CustomBucketsPostAggregator — CDF diffs at caller breakpoints."""
    r = run(spark, fb_catalog,
            [{"type": "approxHistogram", "name": "ah", "fieldName": "v5",
              "resolution": 50, "numBuckets": 7}],
            [{"type": "customBuckets", "name": "cb", "fieldName": "ah",
              "breaks": [0.0, 5.0, 11.0]}])
    cb = r["cb"]
    assert cb["breaks"] == [0.0, 5.0, 11.0]
    assert sum(cb["counts"]) == pytest.approx(10.0, abs=0.01)
    # ~4-5 of the 10 values sit below 5 (1,2,3,4 exactly; centroid
    # interpolation may attribute part of the 5)
    assert 3.0 <= cb["counts"][0] <= 6.0


def test_approx_histogram_buckets_post(spark, fb_catalog):
    """BucketsPostAggregator — offset-aligned bucketSize breaks with
    near-empty edge trimming (toHistogram(bucketSize, offset))."""
    r = run(spark, fb_catalog,
            [{"type": "approxHistogram", "name": "ah", "fieldName": "v5",
              "resolution": 50, "numBuckets": 7}],
            [{"type": "buckets", "name": "b", "fieldName": "ah",
              "bucketSize": 5.0, "offset": 0.0}])
    b = r["b"]
    assert len(b["breaks"]) == len(b["counts"]) + 1
    assert all(br % 5.0 == 0.0 for br in b["breaks"])
    assert sum(b["counts"]) == pytest.approx(10.0, abs=0.5)
