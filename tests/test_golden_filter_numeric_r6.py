"""LongFilteringTest / FloatAndDoubleFilteringTest golden ports (round 6)
— typed value predicates over LONG/FLOAT/DOUBLE columns
(processing/src/test/java/org/apache/druid/segment/filter/
LongFilteringTest.java:89-100, FloatAndDoubleFilteringTest.java:95-102).

Key semantics: filter values parse into the column type — '3.0' matches
3L but '3.00000000000000000000001' and out-of-long-range decimals match
nothing; NUMERIC-ordering bounds treat unparseable bound values as
before-all-numbers; LEXICOGRAPHIC bounds compare the column's string
rendering (longs render without a decimal point, floats with one).
The javascript variants are not portable (javascript raises by design)."""

import datetime

import pytest
from pyspark.sql import types as T

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog

FULL = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]


@pytest.fixture(scope="module")
def long_catalog(spark, tmp_path_factory):
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim0", T.StringType()),
        T.StructField("lng", T.LongType()),
    ])
    t = datetime.datetime(2000, 1, 1)
    rows = [(t, "1", 1), (t, "2", 2), (t, "3", 3), (t, "4", 4),
            (t, "5", 5), (t, "6", 6), (t, "7", 100000000),
            (t, "8", 100000001), (t, "9", -25), (t, "10", -100000001)]
    path = str(tmp_path_factory.mktemp("lngf") / "lngf.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("lngf", path)
    return cat


@pytest.fixture(scope="module")
def float_catalog(spark, tmp_path_factory):
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim0", T.StringType()),
        T.StructField("flt", T.FloatType()),
        T.StructField("dbl", T.DoubleType()),
    ])
    t = datetime.datetime(2000, 1, 1)
    rows = [(t, str(i), float(i), float(i)) for i in range(1, 7)]
    path = str(tmp_path_factory.mktemp("fltf") / "fltf.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("fltf", path)
    return cat


def matches(spark, cat, table, flt):
    q = {"queryType": "scan", "dataSource": table, "intervals": FULL,
         "filter": flt, "columns": ["dim0"]}
    return sorted((r["dim0"] for r in translate(q, spark, cat).collect()),
                  key=lambda s: (len(s), s))


def sel(dim, value, fn=None):
    f = {"type": "selector", "dimension": dim, "value": value}
    if fn:
        f["extractionFn"] = fn
    return f


def in_f(dim, values, fn=None):
    f = {"type": "in", "dimension": dim, "values": values}
    if fn:
        f["extractionFn"] = fn
    return f


def bound(dim, lower, upper, lower_strict=False, upper_strict=False,
          ordering="lexicographic", fn=None):
    f = {"type": "bound", "dimension": dim, "ordering": ordering}
    if lower is not None:
        f["lower"] = lower
    if upper is not None:
        f["upper"] = upper
    if lower_strict:
        f["lowerStrict"] = True
    if upper_strict:
        f["upperStrict"] = True
    if fn:
        f["extractionFn"] = fn
    return f


def lookup_fn(mapping, retain=False, replace=None):
    f = {"type": "lookup", "lookup": {"type": "map", "map": mapping},
         "retainMissingValue": retain, "injective": False}
    if replace is not None:
        f["replaceMissingValueWith"] = replace
    return f


# ---------------------------------------------------------------- long


def test_long_selector(spark, long_catalog):
    """testLongColumnFiltering selector block."""
    m = lambda f: matches(spark, long_catalog, "lngf", f)
    assert m(sel("lng", "0")) == []
    assert m(sel("lng", "3")) == ["3"]
    assert m(sel("lng", "3.0")) == ["3"]
    assert m(sel("lng", "3.00000000000000000000001")) == []
    assert m(sel("lng", "100000001.0")) == ["8"]
    assert m(sel("lng", "-100000001.0")) == ["10"]
    assert m(sel("lng", "111119223372036854775807.674398674398")) == []


def test_long_bounds(spark, long_catalog):
    """testLongColumnFiltering numeric-bound block."""
    m = lambda f: matches(spark, long_catalog, "lngf", f)
    n = dict(ordering="numeric")
    assert m(bound("lng", "2", "5", **n)) == ["2", "3", "4", "5"]
    assert m(bound("lng", "1", "4", True, True, **n)) == ["2", "3"]
    assert m(bound("lng", "2.0", "5.0", **n)) == ["2", "3", "4", "5"]
    assert m(bound("lng", "2.0", "5.0", True, True, **n)) == ["3", "4"]
    assert m(bound("lng", "1.9", "5.9", True, True, **n)) == \
        ["2", "3", "4", "5"]
    assert m(bound("lng", "2.1", "5.9", **n)) == ["3", "4", "5"]
    assert m(bound("lng", "111119223372036854775807.67", "5.9", **n)) == []
    assert m(bound("lng", "-111119223372036854775807.67", "5.9", **n)) == \
        ["1", "2", "3", "4", "5", "9", "10"]
    assert m(bound("lng", "2.1", "111119223372036854775807.67", **n)) == \
        ["3", "4", "5", "6", "7", "8"]
    assert m(bound("lng", "2.1", "-111119223372036854775807.67", **n)) == []
    assert m(bound("lng", "100000000.0", "100000001.0", True, True,
                   **n)) == []
    assert m(bound("lng", "100000000.0", "100000001.0", **n)) == ["7", "8"]


def test_long_in(spark, long_catalog):
    """testLongColumnFiltering in block (incl. the 32-value list)."""
    m = lambda f: matches(spark, long_catalog, "lngf", f)
    assert m(in_f("lng", ["2", "4", "8"])) == ["2", "4"]
    assert m(in_f("lng", ["1.999999999999999999",
                          "4.00000000000000000000001"])) == []
    assert m(in_f("lng", ["100000001.0", "99999999.999999999"])) == ["8"]
    assert m(in_f("lng", ["-25.0", "-99999999.999999999"])) == ["9"]
    assert m(in_f("lng", [str(i * 2) for i in range(32)])) == \
        ["2", "4", "6"]


def test_long_regex_and_search(spark, long_catalog):
    """testLongColumnFiltering regex/search block — longs render without
    a decimal point."""
    assert matches(spark, long_catalog, "lngf",
                   {"type": "regex", "dimension": "lng",
                    "pattern": "4"}) == ["4"]
    assert matches(spark, long_catalog, "lngf",
                   {"type": "search", "dimension": "lng",
                    "query": {"type": "contains", "value": "2",
                              "caseSensitive": True}}) == ["2", "9"]


def test_long_non_numbers(spark, long_catalog):
    """testLongColumnFilteringWithNonNumbers — unparseable selector
    values match nothing; NUMERIC bounds sort unparseables before all
    numbers; LEXICOGRAPHIC compares the string rendering."""
    m = lambda f: matches(spark, long_catalog, "lngf", f)
    assert m(sel("lng", "")) == []
    assert m(sel("lng", None)) == []
    assert m(sel("lng", "abc")) == []
    assert m(bound("lng", "a", "b", ordering="numeric")) == []
    assert m(bound("lng", " ", "4", ordering="numeric")) == \
        ["1", "2", "3", "4", "9", "10"]
    assert m(bound("lng", " ", "4", ordering="lexicographic")) == \
        ["1", "2", "3", "4", "7", "8", "9", "10"]
    assert m(bound("lng", " ", "A", ordering="numeric")) == []
    assert m(bound("lng", " ", "A", ordering="lexicographic")) == \
        [str(i) for i in range(1, 11)]


def test_long_with_extraction_fn(spark, long_catalog):
    """testLongFilterWithExtractionFn — the extraction sees the long's
    string rendering ('1'), then string predicates apply."""
    exfn = lookup_fn({"1": "Monday", "2": "Tuesday", "3": "Wednesday",
                      "4": "Thursday", "5": "Friday", "6": "Saturday"},
                     replace="UNKNOWN")
    m = lambda f: matches(spark, long_catalog, "lngf", f)
    assert m(sel("lng", "Monday", exfn)) == ["1"]
    assert m(sel("lng", "Notaday", exfn)) == []
    assert m(bound("lng", "Fridax", "Fridaz", ordering="alphanumeric",
                   fn=exfn)) == ["5"]
    assert m(bound("lng", "Friday", "Friday", True, True,
                   ordering="alphanumeric", fn=exfn)) == []
    assert m(in_f("lng", ["Caturday", "Saturday", "Tuesday"], exfn)) == \
        ["2", "6"]
    big = ["Saturday", "Tuesday", "Caturday", "Xanaday", "Vojuday",
           "Gribaday", "Kipoday", "Dheferday", "Fakeday", "Qeearaday",
           "Hello", "World", "1", "2", "3", "4", "5", "6", "7"]
    assert m(in_f("lng", big, exfn)) == ["2", "6"]
    assert m({"type": "regex", "dimension": "lng", "pattern": ".*day",
              "extractionFn": exfn}) == ["1", "2", "3", "4", "5", "6"]
    assert m({"type": "search", "dimension": "lng",
              "query": {"type": "contains", "value": "s",
                        "caseSensitive": True},
              "extractionFn": exfn}) == ["2", "3", "4"]


# ---------------------------------------------------------------- float


@pytest.mark.parametrize("col", ["flt", "dbl"])
def test_float_double_filtering(spark, float_catalog, col):
    """doTestFloatColumnFiltering over both FLOAT and DOUBLE."""
    m = lambda f: matches(spark, float_catalog, "fltf", f)
    assert m(sel(col, "3")) == ["3"]
    assert m(sel(col, "3.0")) == ["3"]
    assert m(bound(col, "2", "5", ordering="numeric")) == \
        ["2", "3", "4", "5"]
    assert m(bound(col, "2.0", "5.0", ordering="numeric")) == \
        ["2", "3", "4", "5"]
    assert m(bound(col, "1", "4", True, True, ordering="numeric")) == \
        ["2", "3"]
    assert m(bound(col, "1.0", "4.0", True, True, ordering="numeric")) == \
        ["2", "3"]
    assert m(in_f(col, ["2", "4", "8"])) == ["2", "4"]
    assert m(in_f(col, ["2.0", "4.0", "8.0"])) == ["2", "4"]
    assert m(in_f(col, [str(i * 2) for i in range(32)])) == \
        ["2", "4", "6"]
    assert m({"type": "regex", "dimension": col, "pattern": "4"}) == ["4"]
    assert m({"type": "regex", "dimension": col, "pattern": "4.0"}) == ["4"]
    assert m({"type": "search", "dimension": col,
              "query": {"type": "contains", "value": "2",
                        "caseSensitive": True}}) == ["2"]


@pytest.mark.parametrize("col", ["flt", "dbl"])
def test_float_double_non_numbers(spark, float_catalog, col):
    """doTestFloatColumnFilteringWithNonNumbers — floats render WITH a
    decimal point, so the lexicographic '4' upper excludes '4.0'."""
    m = lambda f: matches(spark, float_catalog, "fltf", f)
    assert m(sel(col, "")) == []
    assert m(sel(col, None)) == []
    assert m(sel(col, "abc")) == []
    assert m(bound(col, "a", "b", ordering="numeric")) == []
    assert m(bound(col, " ", "4", ordering="numeric")) == \
        ["1", "2", "3", "4"]
    assert m(bound(col, " ", "4", ordering="lexicographic")) == \
        ["1", "2", "3"]
    assert m(bound(col, " ", "4.0", ordering="lexicographic")) == \
        ["1", "2", "3", "4"]
    assert m(bound(col, " ", "A", ordering="numeric")) == []


@pytest.mark.parametrize("col", ["flt", "dbl"])
def test_float_double_with_extraction_fn(spark, float_catalog, col):
    """doTestFloatFilterWithExtractionFn — the extraction sees '1.0'."""
    exfn = lookup_fn({"1.0": "Monday", "2.0": "Tuesday",
                      "3.0": "Wednesday", "4.0": "Thursday",
                      "5.0": "Friday", "6.0": "Saturday"},
                     replace="UNKNOWN")
    m = lambda f: matches(spark, float_catalog, "fltf", f)
    assert m(sel(col, "Monday", exfn)) == ["1"]
    assert m(sel(col, "Notaday", exfn)) == []
    assert m(bound(col, "Fridax", "Fridaz", ordering="alphanumeric",
                   fn=exfn)) == ["5"]
    assert m(bound(col, "Friday", "Friday", True, True,
                   ordering="alphanumeric", fn=exfn)) == []
    assert m(in_f(col, ["Caturday", "Saturday", "Tuesday"], exfn)) == \
        ["2", "6"]
    assert m({"type": "regex", "dimension": col, "pattern": ".*day",
              "extractionFn": exfn}) == ["1", "2", "3", "4", "5", "6"]
    assert m({"type": "search", "dimension": col,
              "query": {"type": "contains", "value": "s",
                        "caseSensitive": True},
              "extractionFn": exfn}) == ["2", "3", "4"]
