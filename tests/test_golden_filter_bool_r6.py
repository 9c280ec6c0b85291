"""AndFilterTest / OrFilterTest / NotFilterEvaluateTest golden ports
(round 6) — boolean composition over two-valued matcher semantics
(processing/src/test/java/org/apache/druid/segment/filter/
AndFilterTest.java:60-67, OrFilterTest.java:64-71,
NotFilterEvaluateTest.java:59-66)."""

import datetime

import pytest
from pyspark.sql import types as T

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog

FULL = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]


@pytest.fixture(scope="module")
def bool_catalog(spark, tmp_path_factory):
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim0", T.StringType()),
        T.StructField("dim1", T.StringType()),
    ])
    t = datetime.datetime(2000, 1, 1)
    rows = [(t, str(i), "0") for i in range(6)]
    path = str(tmp_path_factory.mktemp("boolf") / "boolf.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("boolf", path)
    return cat


def matches(spark, cat, flt):
    q = {"queryType": "scan", "dataSource": "boolf", "intervals": FULL,
         "filter": flt, "columns": ["dim0"]}
    return sorted(r["dim0"] for r in translate(q, spark, cat).collect())


def sel(dim, value):
    return {"type": "selector", "dimension": dim, "value": value}


def f_and(*fields):
    return {"type": "and", "fields": list(fields)}


def f_or(*fields):
    return {"type": "or", "fields": list(fields)}


def f_not(field):
    return {"type": "not", "field": field}


TRUE = {"type": "true"}
ALL6 = list("012345")


def test_and(spark, bool_catalog):
    """AndFilterTest.testAnd."""
    m = lambda f: matches(spark, bool_catalog, f)
    assert m(f_and(sel("dim0", "0"), sel("dim1", "0"))) == ["0"]
    assert m(f_and(sel("dim0", "0"), sel("dim1", "1"))) == []
    assert m(f_and(sel("dim0", "1"), sel("dim1", "0"))) == ["1"]
    assert m(f_and(sel("dim0", "1"), sel("dim1", "1"))) == []
    assert m(f_and(f_not(sel("dim0", "1")), f_not(sel("dim1", "1")))) == \
        ["0", "2", "3", "4", "5"]
    assert m(f_and(f_not(sel("dim0", "0")), f_not(sel("dim1", "0")))) == []


def test_not_and(spark, bool_catalog):
    """AndFilterTest.testNotAnd."""
    m = lambda f: matches(spark, bool_catalog, f)
    assert m(f_not(f_and(sel("dim0", "0"), sel("dim1", "0")))) == \
        ["1", "2", "3", "4", "5"]
    assert m(f_not(f_and(sel("dim0", "0"), sel("dim1", "1")))) == ALL6
    assert m(f_not(f_and(sel("dim0", "1"), sel("dim1", "0")))) == \
        ["0", "2", "3", "4", "5"]
    assert m(f_not(f_and(sel("dim0", "1"), sel("dim1", "1")))) == ALL6
    assert m(f_not(f_and(f_not(sel("dim0", "1")),
                         f_not(sel("dim1", "1"))))) == ["1"]
    assert m(f_not(f_and(f_not(sel("dim0", "0")),
                         f_not(sel("dim1", "0"))))) == ALL6


def test_or(spark, bool_catalog):
    """OrFilterTest — the single/two/three-operand matrix incl. literal
    TRUE operands."""
    m = lambda f: matches(spark, bool_catalog, f)
    assert m(f_or(sel("dim0", "1"))) == ["1"]
    assert m(f_or(sel("dim1", "0"))) == ALL6
    assert m(f_or(sel("dim1", "7"))) == []
    assert m(f_or(sel("dim1", "0"), sel("dim0", "7"))) == ALL6
    assert m(f_or(sel("dim0", "7"), sel("dim1", "0"))) == ALL6
    assert m(f_or(sel("dim0", "7"), TRUE)) == ALL6
    assert m(f_or(sel("dim1", "0"), f_not(sel("dim0", "7")))) == ALL6
    assert m(f_or(TRUE, f_not(sel("dim0", "7")))) == ALL6
    assert m(f_or(sel("dim0", "3"), sel("dim1", "7"))) == ["3"]
    assert m(f_or(sel("dim1", "7"), sel("dim0", "3"))) == ["3"]
    assert m(f_or(sel("dim1", "7"), sel("dim0", "7"))) == []
    assert m(f_and(
        {"type": "in", "dimension": "dim0",
         "values": ["0", "1", "2", "4", "5"]},
        f_or(sel("dim0", "4"), TRUE, sel("dim0", "7")))) == \
        ["0", "1", "2", "4", "5"]


def test_not_selector(spark, bool_catalog):
    """NotFilterEvaluateTest.testNotSelector — NOT of a null/''-selector
    over a never-null column matches everything (two-valued negation)."""
    m = lambda f: matches(spark, bool_catalog, f)
    assert m(f_not(sel("dim0", None))) == ALL6
    assert m(f_not(sel("dim0", ""))) == ALL6
    assert m(f_not(sel("dim0", "0"))) == ["1", "2", "3", "4", "5"]
    assert m(f_not(sel("dim0", "1"))) == ["0", "2", "3", "4", "5"]
