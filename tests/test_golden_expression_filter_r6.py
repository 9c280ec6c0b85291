"""ExpressionFilterTest golden port (round 6) — the `expression` filter
over typed columns, MVD auto-mapping, implicit numeric coercion, and
missing columns; sql-compatible-mode branches
(processing/src/test/java/org/apache/druid/segment/filter/
ExpressionFilterTest.java:81-95 ROWS).

Java-object tests (getRequiredColumns/equals/rewrite) have no engine
surface."""

import datetime

import pytest
from pyspark.sql import types as T

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog

FULL = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]


@pytest.fixture(scope="module")
def expr_catalog(spark, tmp_path_factory):
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim0", T.StringType()),
        T.StructField("dim1", T.LongType()),
        T.StructField("dim2", T.FloatType()),
        T.StructField("dim3", T.StringType()),
        T.StructField("dim4", T.ArrayType(T.StringType())),
    ])
    t = datetime.datetime(2000, 1, 1)
    rows = [
        (t, "0", 0, 0.0, "", ["1", "2"]),
        (t, "1", 1, 1.0, "10", []),
        (t, "2", 2, 2.0, "2", [""]),
        (t, "3", 3, 3.0, "1", ["3"]),
        (t, "4", 4, 4.0, "1", ["4", "5"]),
        (t, "5", 5, 5.0, "5", ["4", "5"]),
        (t, "6", 6, 6.0, "1", None),
        (t, "7", 7, 7.0, "a", None),
        (t, "8", 8, 8.0, "8", None),
        (t, "9", 9, 9.0, "1.234", ["1.234"]),
    ]
    path = str(tmp_path_factory.mktemp("exprf") / "exprf.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("exprf", path)
    return cat


def matches(spark, cat, expression):
    q = {"queryType": "scan", "dataSource": "exprf", "intervals": FULL,
         "filter": {"type": "expression", "expression": expression},
         "columns": ["dim0"]}
    return sorted(r["dim0"] for r in translate(q, spark, cat).collect())


ALL10 = [str(i) for i in range(10)]


def test_one_single_valued_string_column(spark, expr_catalog):
    """testOneSingleValuedStringColumn sql branches."""
    m = lambda e: matches(spark, expr_catalog, e)
    assert m("dim3 == ''") == ["0"]
    assert m("dim3 == '1'") == ["3", "4", "6"]
    assert m("dim3 == 'a'") == ["7"]
    assert m("dim3 == 1") == ["3", "4", "6"]
    assert m("dim3 == 1.0") == ["3", "4", "6"]
    assert m("dim3 == 1.234") == ["9"]
    assert m("dim3 < '2'") == ["0", "1", "3", "4", "6", "9"]
    assert m("dim3 < 2") == ["3", "4", "6", "9"]
    assert m("dim3 < 2.0") == ["3", "4", "6", "9"]
    assert m("like(dim3, '1%')") == ["1", "3", "4", "6", "9"]
    assert m("array_contains(dim3, '1')") == ["3", "4", "6"]


def test_one_multi_valued_string_column(spark, expr_catalog):
    """testOneMultiValuedStringColumn sql branches — scalar expressions
    map across MVD elements; any truthy element matches."""
    m = lambda e: matches(spark, expr_catalog, e)
    assert m("dim4 == ''") == ["2"]
    assert m("dim4 == null") == []
    assert m("dim4 == '1'") == ["0"]
    assert m("dim4 == '3'") == ["3"]
    assert m("dim4 == '4'") == ["4", "5"]
    assert m("concat(dim4, dim4) == '33'") == ["3"]
    assert m("like(dim4, '4%')") == ["4", "5"]
    assert m("array_contains(dim4, '5')") == ["4", "5"]
    assert m("array_to_string(dim4, ':') == '4:5'") == ["4", "5"]


def test_single_and_multi_valued_string_column(spark, expr_catalog):
    """testSingleAndMultiValuedStringColumn."""
    assert matches(spark, expr_catalog,
                   "array_contains(dim4, dim3)") == ["5", "9"]


def test_one_long_column(spark, expr_catalog):
    """testOneLongColumn sql branches."""
    m = lambda e: matches(spark, expr_catalog, e)
    assert m("dim1 == ''") == []
    assert m("dim1 == '1'") == ["1"]
    assert m("dim1 == 2") == ["2"]
    assert m("dim1 < '2'") == ["0", "1"]
    assert m("dim1 < 2") == ["0", "1"]
    assert m("dim1 < 2.0") == ["0", "1"]
    assert m("like(dim1, '1%')") == ["1"]


def test_one_float_column(spark, expr_catalog):
    """testOneFloatColumn sql branches."""
    m = lambda e: matches(spark, expr_catalog, e)
    assert m("dim2 == ''") == []
    assert m("dim2 == '1'") == ["1"]
    assert m("dim2 == 2") == ["2"]
    assert m("dim2 < '2'") == ["0", "1"]
    assert m("dim2 < 2") == ["0", "1"]
    assert m("dim2 < 2.0") == ["0", "1"]
    assert m("like(dim2, '1%')") == ["1"]


def test_constant_expression(spark, expr_catalog):
    """testConstantExpression."""
    m = lambda e: matches(spark, expr_catalog, e)
    assert m("1 + 1") == ALL10
    assert m("'true'") == ALL10
    assert m("0 + 0") == []
    assert m("'false'") == []


def test_compare_columns(spark, expr_catalog):
    """testCompareColumns sql branches."""
    m = lambda e: matches(spark, expr_catalog, e)
    assert m("dim0 == dim3") == ["2", "5", "8"]
    assert m("dim1 == dim3") == ["2", "5", "8"]
    assert m("dim2 == dim3") == ["2", "5", "8"]
    assert m("dim0 == dim4") == ["3", "4", "5"]


def test_missing_column(spark, expr_catalog):
    """testMissingColumn sql branches — null == null is false (SQL
    standard), comparisons against null match nothing."""
    m = lambda e: matches(spark, expr_catalog, e)
    assert m("missing == null") == []
    assert m("missing == otherMissing") == []
    assert m("missing == '1'") == []
    assert m("missing == 2") == []
    assert m("missing < '2'") == []
    assert m("missing < 2") == []
    assert m("missing < 2.0") == []
    assert m("missing > '2'") == []
    assert m("missing > 2") == []
    assert m("missing > 2.0") == []
    assert m("like(missing, '1%')") == []
