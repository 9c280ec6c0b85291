"""TimeFilteringTest golden port (round 6) — value filters over __time
(served as epoch millis), extraction fns over __time, and the interval
filter on time AND non-time columns
(processing/src/test/java/org/apache/druid/segment/filter/
TimeFilteringTest.java:83-90 ROWS).

The javascript variants are not portable (javascript raises by design)."""

import datetime

import pytest
from pyspark.sql import types as T

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog

FULL = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]


@pytest.fixture(scope="module")
def time_catalog(spark, tmp_path_factory):
    """ROWS — ts millis 0..5, dim0 '0'..'5', dim1 strings."""
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim0", T.StringType()),
        T.StructField("dim1", T.StringType()),
        T.StructField("dim2", T.ArrayType(T.StringType())),
    ])
    epoch = datetime.datetime(1970, 1, 1)
    ms = lambda n: epoch + datetime.timedelta(milliseconds=n)
    rows = [
        (ms(0), "0", "", ["a", "b"]),
        (ms(1), "1", "10", []),
        (ms(2), "2", "2", [""]),
        (ms(3), "3", "1", ["a"]),
        (ms(4), "4", "def", ["c"]),
        (ms(5), "5", "abc", None),
    ]
    path = str(tmp_path_factory.mktemp("timef") / "timef.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("timef", path)
    return cat


def matches(spark, cat, flt):
    q = {"queryType": "scan", "dataSource": "timef", "intervals": FULL,
         "filter": flt, "columns": ["dim0"]}
    return sorted(r["dim0"] for r in translate(q, spark, cat).collect())


ALL6 = list("012345")


def test_time_filter_as_long(spark, time_catalog):
    """testTimeFilterAsLong — __time's value selector serves the epoch
    millis rendering."""
    m = lambda f: matches(spark, time_catalog, f)
    assert m({"type": "selector", "dimension": "__time",
              "value": "0"}) == ["0"]
    assert m({"type": "selector", "dimension": "__time",
              "value": "9000"}) == []
    assert m({"type": "bound", "dimension": "__time", "lower": "0",
              "upper": "4", "ordering": "numeric"}) == \
        ["0", "1", "2", "3", "4"]
    assert m({"type": "bound", "dimension": "__time", "lower": "0",
              "upper": "4", "lowerStrict": True, "upperStrict": True,
              "ordering": "numeric"}) == ["1", "2", "3"]
    assert m({"type": "in", "dimension": "__time",
              "values": ["2", "4", "8"]}) == ["2", "4"]
    assert m({"type": "in", "dimension": "__time",
              "values": [str(i * 2) for i in range(32)]}) == \
        ["0", "2", "4"]
    assert m({"type": "regex", "dimension": "__time",
              "pattern": "4"}) == ["4"]
    assert m({"type": "search", "dimension": "__time",
              "query": {"type": "contains", "value": "2",
                        "caseSensitive": True}}) == ["2"]


def test_time_filter_with_lookup_extraction(spark, time_catalog):
    """testTimeFilterWithExtractionFn — the lookup keys are the millis
    renderings '0'..'5'."""
    exfn = {"type": "lookup",
            "lookup": {"type": "map",
                       "map": {"0": "Monday", "1": "Tuesday",
                               "2": "Wednesday", "3": "Thursday",
                               "4": "Friday", "5": "Saturday"}},
            "retainMissingValue": False,
            "replaceMissingValueWith": "UNKNOWN", "injective": False}
    m = lambda f: matches(spark, time_catalog, f)
    assert m({"type": "selector", "dimension": "__time",
              "value": "Monday", "extractionFn": exfn}) == ["0"]
    assert m({"type": "selector", "dimension": "__time",
              "value": "Notaday", "extractionFn": exfn}) == []
    assert m({"type": "bound", "dimension": "__time", "lower": "Fridax",
              "upper": "Fridaz", "ordering": "alphanumeric",
              "extractionFn": exfn}) == ["4"]
    assert m({"type": "bound", "dimension": "__time", "lower": "Friday",
              "upper": "Friday", "lowerStrict": True, "upperStrict": True,
              "ordering": "alphanumeric", "extractionFn": exfn}) == []
    assert m({"type": "in", "dimension": "__time",
              "values": ["Caturday", "Saturday", "Tuesday"],
              "extractionFn": exfn}) == ["1", "5"]
    big = ["Saturday", "Tuesday", "Caturday", "Xanaday", "Vojuday",
           "Gribaday", "Kipoday", "Dheferday", "Fakeday", "Qeearaday",
           "Hello", "World", "1", "2", "3", "4", "5", "6", "7"]
    assert m({"type": "in", "dimension": "__time", "values": big,
              "extractionFn": exfn}) == ["1", "5"]
    assert m({"type": "regex", "dimension": "__time", "pattern": ".*day",
              "extractionFn": exfn}) == ALL6
    assert m({"type": "search", "dimension": "__time",
              "query": {"type": "contains", "value": "s",
                        "caseSensitive": True},
              "extractionFn": exfn}) == ["1", "2", "3"]


def test_time_filter_with_time_format_extraction(spark, time_catalog):
    """testTimeFilterWithTimeFormatExtractionFn — every row sits in the
    same America/New_York day (1969-12-31, a Wednesday)."""
    exfn = {"type": "timeFormat", "format": "EEEE",
            "timeZone": "America/New_York", "locale": "en"}
    assert matches(spark, time_catalog,
                   {"type": "selector", "dimension": "__time",
                    "value": "Wednesday", "extractionFn": exfn}) == ALL6


def test_interval_filter_on_time(spark, time_catalog):
    """testIntervalFilter (the non-extraction cases)."""
    m = lambda f: matches(spark, time_catalog, f)
    assert m({"type": "interval", "dimension": "__time", "intervals":
              ["1970-01-01T00:00:00.001Z/1970-01-01T00:00:00.005Z"]}) == \
        ["1", "2", "3", "4"]
    assert m({"type": "interval", "dimension": "__time", "intervals": [
        "1970-01-01T00:00:00.000Z/1970-01-01T00:00:00.003Z",
        "1970-01-01T00:00:00.004Z/1970-01-01T00:00:00.006Z"]}) == \
        ["0", "1", "2", "4", "5"]
    assert m({"type": "interval", "dimension": "__time", "intervals": [
        "1970-01-01T00:00:00.000Z/1970-01-01T00:00:00.001Z",
        "1970-01-01T00:00:00.003Z/1970-01-01T00:00:00.006Z",
        "1970-01-01T00:00:00.002Z/1970-01-01T00:00:00.005Z"]}) == \
        ["0", "2", "3", "4", "5"]


def test_interval_filter_on_string_dimension(spark, time_catalog):
    """testIntervalFilterOnStringDimension — the dimension VALUE parses
    as epoch millis; unparseable values never match."""
    m = lambda f: matches(spark, time_catalog, f)
    assert m({"type": "interval", "dimension": "dim0", "intervals":
              ["1970-01-01T00:00:00.001Z/1970-01-01T00:00:00.005Z"]}) == \
        ["1", "2", "3", "4"]
    assert m({"type": "interval", "dimension": "dim0", "intervals": [
        "1970-01-01T00:00:00.000Z/1970-01-01T00:00:00.003Z",
        "1970-01-01T00:00:00.004Z/1970-01-01T00:00:00.006Z"]}) == \
        ["0", "1", "2", "4", "5"]
    assert m({"type": "interval", "dimension": "dim0", "intervals": [
        "1970-01-01T00:00:00.000Z/1970-01-01T00:00:00.001Z",
        "1970-01-01T00:00:00.003Z/1970-01-01T00:00:00.006Z",
        "1970-01-01T00:00:00.002Z/1970-01-01T00:00:00.005Z"]}) == \
        ["0", "2", "3", "4", "5"]
    assert m({"type": "interval", "dimension": "dim1", "intervals":
              ["1970-01-01T00:00:00.002Z/1970-01-01T00:00:00.011Z"]}) == \
        ["1", "2"]
