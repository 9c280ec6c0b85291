"""SpatialFilterTest golden port (round 6) — spatial filters (radius /
rectangular bounds) over joined 'lat,long' coordinate dimensions, driven
through timeseries queries
(processing/src/test/java/org/apache/druid/segment/filter/
SpatialFilterTest.java:145-265 fixture, :531-719 queries).

The reference names the joined dimension 'dim.geo'; the dot is a
spatial-schema naming convention with no semantics, so the fixture uses
'dim_geo'.  The fixed random tail (reference: 4992 points at lat/long in
[10, 20)) is represented by five deterministic out-of-bounds points —
the queries only assert they are excluded."""

import datetime

import pytest
from pyspark.sql import types as T

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog


@pytest.fixture(scope="module")
def spatial_catalog(spark, tmp_path_factory):
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim", T.StringType()),
        T.StructField("dim_geo", T.StringType()),
        T.StructField("spatialIsRad", T.StringType()),
        T.StructField("val", T.LongType()),
    ])
    d = lambda day: datetime.datetime(2013, 1, day)
    rows = [
        (d(1), "foo", "0.0,0.0", None, 17),
        (d(2), "foo", "1.0,3.0", None, 29),
        (d(3), "foo", "4.0,2.0", None, 13),
        (d(4), "foo", "7.0,3.0", None, 91),
        (d(5), "foo", "8.0,6.0", None, 47),
        (d(5), "foo", "_mmx.unknown,_mmx.unknown", None, 101),
        (d(5), "foo", "_mmx.unknown", None, 501),
        (d(5), None, None, "0.0,0.0", 13),
        # the deterministic stand-ins for the random out-of-bounds tail
        (d(1), "boo", "12.5,15.2", None, 1000),
        (d(1), "boo", "10.1,19.9", None, 1001),
        (d(1), "boo", "17.0,11.0", None, 1002),
        (d(1), "boo", "19.3,14.6", None, 1003),
        (d(1), "boo", "15.5,18.8", None, 1004),
    ]
    path = str(tmp_path_factory.mktemp("spatial") / "spatial.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("spatial_ds", path)
    return cat


def run_ts(spark, cat, granularity, flt):
    q = {"queryType": "timeseries", "dataSource": "spatial_ds",
         "granularity": granularity,
         "intervals": ["2013-01-01/2013-01-07"],
         "filter": flt,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "val", "fieldName": "val"}]}
    rows = translate(q, spark, cat).collect()
    if granularity == "all":
        # ALL-granularity results carry no __time column in this engine
        return [(r["rows"], r["val"]) for r in rows]
    return [((r["__time"].month, r["__time"].day), r["rows"], r["val"])
            for r in rows]


def test_spatial_query(spark, spatial_catalog):
    """testSpatialQuery — radius bound, ALL granularity."""
    out = run_ts(spark, spatial_catalog, "all",
                 {"type": "spatial", "dimension": "dim_geo",
                  "bound": {"type": "radius", "coords": [0.0, 0.0],
                            "radius": 5}})
    assert out == [(3, 59)]


def test_spatial_query_other_spatial_dim(spark, spatial_catalog):
    """testSpatialQueryWithOtherSpatialDim — the second spatial
    dimension only has the one row."""
    out = run_ts(spark, spatial_catalog, "all",
                 {"type": "spatial", "dimension": "spatialIsRad",
                  "bound": {"type": "radius", "coords": [0.0, 0.0],
                            "radius": 5}})
    assert out == [(1, 13)]


def test_spatial_query_more_points(spark, spatial_catalog):
    """testSpatialQueryMorePoints — rectangular bound, DAY granularity;
    unparseable/null coordinate rows and the out-of-bounds tail never
    match, and the timeline ends at the last data day (no 01-06 row)."""
    out = run_ts(spark, spatial_catalog, "day",
                 {"type": "spatial", "dimension": "dim_geo",
                  "bound": {"type": "rectangular",
                            "minCoords": [0.0, 0.0],
                            "maxCoords": [9.0, 9.0]}})
    assert out == [((1, 1), 1, 17), ((1, 2), 1, 29), ((1, 3), 1, 13),
                   ((1, 4), 1, 91), ((1, 5), 1, 47)]
