"""ApproximateHistogramTest golden port (round 7) — the deterministic
subset driven through the QUERY surface: quantile interpolation over
uncompressed centroids and the toHistogram(bucketSize, offset) bucket
enumeration (extensions-core/histogram/src/test/java/org/apache/druid/
query/aggregation/histogram/ApproximateHistogramTest.java).

Only cases where resolution ≥ distinct-value count are ported: there the
centroid set is EXACT and the reads are deterministic.  Cases exercising
the reference's specific centroid-merge order under compression
(testOffer/testFold*/testQuantileSmaller/Bigger*, testSerialize*) assert
implementation-private centroid positions; this engine's sketch is
Spark's histogram_numeric (the same Ben-Haim/Tom-Tov family, different
merge order), so those integrals agree only approximately — the
approx_histogram oracle entry covers that contract end-to-end.

Adaptation: an EMPTY histogram's quantiles are null here (the reference
returns Float.NaN)."""

import datetime as _dt

import pytest
from pyspark.sql import types as T

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog

FULL = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]
VALUES5 = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
VALUES7 = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 12, 12, 15, 20, 25, 25, 25]


def _write(spark, tmp, name, values):
    schema = T.StructType([T.StructField("__time", T.TimestampType()),
                           T.StructField("v", T.DoubleType())])
    t = _dt.datetime(2000, 1, 1)
    df = spark.createDataFrame([(t, float(x)) for x in values], schema)
    path = str(tmp / f"{name}.parquet")
    df.write.parquet(path)
    return path


@pytest.fixture(scope="module")
def ah_catalog(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ah_ds")
    cat = Catalog(spark)
    cat.register("v5", _write(spark, tmp, "v5", VALUES5))
    cat.register("v7", _write(spark, tmp, "v7", VALUES7))
    cat.register("b1", _write(spark, tmp, "b1",
                              [-5, .01, .02, .06, .12, 1, 2]))
    cat.register("b2", _write(spark, tmp, "b2",
                              [-5, .01, .02, .06, .12, .94, 1, 2]))
    cat.register("b3", _write(spark, tmp, "b3", [0, 0, .02, .06, .12, .94]))
    cat.register("b4", _write(spark, tmp, "b4", [0, 0, .01, .51, .6, .8]))
    cat.register("b5", _write(spark, tmp, "b5", [.1, .5, .6]))
    return cat


def run(spark, cat, table, agg_extra, posts):
    agg = {"type": "approxHistogram", "name": "ah", "fieldName": "v",
           "resolution": 50}
    agg.update(agg_extra)
    q = {"queryType": "timeseries", "dataSource": table,
         "granularity": "all", "intervals": FULL,
         "aggregations": [agg], "postAggregations": posts}
    return translate(q, spark, cat).collect()[0]


def test_quantile_equal_size(spark, ah_catalog):
    """testQuantileEqualSize — 1..10 at resolution ≥ 10: interpolated
    quantiles (.333 → 3.33, .25 → 2.5 — NOT snapped to data values)."""
    r = run(spark, ah_catalog, "v5", {},
            [{"type": "quantiles", "name": "q2", "fieldName": "ah",
              "probabilities": [0.333, 0.666]},
             {"type": "quantiles", "name": "q3", "fieldName": "ah",
              "probabilities": [0.25, 0.5, 0.75]},
             {"type": "quantiles", "name": "q9", "fieldName": "ah",
              "probabilities": [.1, .2, .3, .4, .5, .6, .7, .8, .9]},
             {"type": "quantile", "name": "q50", "fieldName": "ah",
              "probability": 0.5}])
    assert r["q50"] == pytest.approx(5.0, abs=0.1)
    assert r["q2"] == pytest.approx([3.33, 6.67], abs=0.1)
    assert r["q3"] == pytest.approx([2.5, 5.0, 7.5], abs=0.1)
    assert r["q9"] == pytest.approx([1, 2, 3, 4, 5, 6, 7, 8, 9], abs=0.1)


def test_quantile_between_min_max(spark, ah_catalog):
    """testQuantileBetweenMinMax — quantile reads clamp to the exact
    [min, max] (the .05/.95 outlier probes)."""
    r = run(spark, ah_catalog, "v7", {},
            [{"type": "min", "name": "mn", "fieldName": "ah"},
             {"type": "max", "name": "mx", "fieldName": "ah"},
             {"type": "quantiles", "name": "q9", "fieldName": "ah",
              "probabilities": [.1, .2, .3, .4, .5, .6, .7, .8, .9]},
             {"type": "quantiles", "name": "qout", "fieldName": "ah",
              "probabilities": [0.05, 0.95]}])
    assert (r["mn"], r["mx"]) == (1.0, 25.0)
    assert r["q9"] == pytest.approx(
        [1.8, 3.6, 5.4, 7.2, 9.0, 11.05, 12.37, 17.0, 23.5], abs=0.1)
    assert r["qout"] == pytest.approx([1.0, 25.0], abs=0.1)


def _buckets(spark, cat, table, bucket_size, offset, lo, hi):
    r = run(spark, cat, table,
            {"lowerLimit": lo, "upperLimit": hi},
            [{"type": "buckets", "name": "b", "fieldName": "ah",
              "bucketSize": bucket_size, "offset": offset}])
    return list(r["b"]["breaks"]), list(r["b"]["counts"])


def test_buckets(spark, ah_catalog):
    """testBuckets — offset-aligned .05 buckets over [0,1) limits with
    outliers on both sides; near-empty mid-range buckets collapse into
    one (0-count) span."""
    breaks, counts = _buckets(spark, ah_catalog, "b1", 0.05, 0.0, 0.0, 1.0)
    assert breaks == pytest.approx(
        [-5.05, 0, .05, .1, .15, .95, 1, 2], abs=0.1)
    assert counts == pytest.approx([1, 2, 1, 1, 0, 1, 1], abs=0.1)


def test_buckets2(spark, ah_catalog):
    """testBuckets2 — an in-range value near the upper limit (0.94)
    keeps its own bucket."""
    breaks, counts = _buckets(spark, ah_catalog, "b2", 0.05, 0.0, 0.0, 1.0)
    assert breaks == pytest.approx(
        [-5.05, 0, .05, .1, .15, .9, .95, 1, 2.05], abs=0.1)
    assert counts == pytest.approx([1, 2, 1, 1, 0, 1, 1, 1], abs=0.1)


def test_buckets3(spark, ah_catalog):
    """testBuckets3 — bucketSize 1 over sub-unit values: the exact-zero
    mass lands in the bucket BELOW zero (left-inclusive bottom break)."""
    breaks, counts = _buckets(spark, ah_catalog, "b3", 1.0, 0.0, 0.0, 1.0)
    assert breaks == pytest.approx([-1, 0, 1], abs=0.1)
    assert counts == pytest.approx([2, 4], abs=0.1)


def test_buckets4(spark, ah_catalog):
    """testBuckets4 — lowerLimit 0.5 floors the first break to the
    offset lattice below the limit."""
    breaks, counts = _buckets(spark, ah_catalog, "b4", 0.2, 0.0, 0.5, 1.0)
    assert breaks == pytest.approx([-0.2, 0.5, 0.7, 0.9], abs=0.1)
    assert counts == pytest.approx([3, 2, 1], abs=0.1)


def test_buckets5(spark, ah_catalog):
    """testBuckets5 — everything in range: plain offset lattice."""
    breaks, counts = _buckets(spark, ah_catalog, "b5", 0.5, 0.0, 0.0, 1.0)
    assert breaks == pytest.approx([0, 0.5, 1], abs=0.1)
    assert counts == pytest.approx([2, 1], abs=0.1)


def test_empty_histogram_quantiles_null(spark, ah_catalog):
    """testEmptyHistogram — quantiles of an empty (all rows filtered)
    histogram are null here (reference: Float.NaN)."""
    q = {"queryType": "timeseries", "dataSource": "v5",
         "granularity": "all", "intervals": FULL,
         "context": {"skipEmptyBuckets": False},
         "aggregations": [
             {"type": "filtered",
              "filter": {"type": "selector", "dimension": "v",
                         "value": "999"},
              "aggregator": {"type": "approxHistogram", "name": "ah",
                             "fieldName": "v", "resolution": 50}}],
         "postAggregations": [
             {"type": "quantiles", "name": "q", "fieldName": "ah",
              "probabilities": [0.8, 0.9]}]}
    r = translate(q, spark, ah_catalog).collect()[0]
    assert r["q"] is None or all(x is None for x in r["q"])
