"""RegexFilterTest / SearchQueryFilterTest / ColumnComparisonFilterTest
golden ports (round 6) — sql-compatible-mode branches
(processing/src/test/java/org/apache/druid/segment/filter/
RegexFilterTest.java, SearchQueryFilterTest.java,
ColumnComparisonFilterTest.java:69-80).

The javascript extraction-fn variants are not portable (javascript raises
by design); Java-object tests (equals/required-column-rewrite) have no
engine surface."""

import datetime

import pytest
from pyspark.sql import types as T

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog

FULL = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]


@pytest.fixture(scope="module")
def default_catalog(spark, tmp_path_factory):
    """BaseFilterTest.DEFAULT_ROWS."""
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim0", T.StringType()),
        T.StructField("dim1", T.StringType()),
        T.StructField("dim2", T.ArrayType(T.StringType())),
        T.StructField("timeDim", T.StringType()),
        T.StructField("d0", T.DoubleType()),
        T.StructField("f0", T.FloatType()),
        T.StructField("l0", T.LongType()),
    ])
    t = datetime.datetime(2000, 1, 1)
    rows = [
        (t, "0", "", ["a", "b"], "2017-07-25", 0.0, 0.0, 0),
        (t, "1", "10", [], "2017-07-25", 10.1, 10.1, 100),
        (t, "2", "2", [""], "2017-05-25", None, 5.5, 40),
        (t, "3", "1", ["a"], "2020-01-25", 120.0245, 110.0, None),
        (t, "4", "abdef", ["c"], None, 60.0, None, 9001),
        (t, "5", "abc", None, "2020-01-25", 765.432, 123.45, 12345),
    ]
    path = str(tmp_path_factory.mktemp("deftb") / "deftb.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("deftb", path)
    return cat


@pytest.fixture(scope="module")
def cc_catalog(spark, tmp_path_factory):
    """ColumnComparisonFilterTest.ROWS — dim1 holds the stringified long
    8 and float 1.234 (rows 8/9); row 9's scalar dim2 reads as a 1-element
    MVD."""
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim0", T.StringType()),
        T.StructField("dim1", T.StringType()),
        T.StructField("dim2", T.ArrayType(T.StringType())),
    ])
    t = datetime.datetime(2000, 1, 1)
    rows = [
        (t, "0", "", ["1", "2"]),
        (t, "1", "10", []),
        (t, "2", "2", [""]),
        (t, "3", "1", ["3"]),
        (t, "4", "1", ["4", "5"]),
        (t, "5", "5", ["4", "5"]),
        (t, "6", "1", None),
        (t, "7", "a", None),
        (t, "8", "8", None),
        (t, "9", "1.234", ["1.234"]),
    ]
    path = str(tmp_path_factory.mktemp("ccf") / "ccf.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("ccf", path)
    return cat


def matches(spark, cat, table, flt):
    q = {"queryType": "scan", "dataSource": table, "intervals": FULL,
         "filter": flt, "columns": ["dim0"]}
    return sorted(r["dim0"] for r in translate(q, spark, cat).collect())


def regex(dim, pattern):
    return {"type": "regex", "dimension": dim, "pattern": pattern}


def contains(dim, value):
    return {"type": "search", "dimension": dim,
            "query": {"type": "contains", "value": value,
                      "caseSensitive": True}}


def col_cmp(*dims):
    return {"type": "columnComparison", "dimensions": list(dims)}


ALL6 = list("012345")
ALL10 = list("0123456789")


# ------------------------------------------------------------------ regex


def test_regex_single_value_without_nulls(spark, default_catalog):
    """testSingleValueStringColumnWithoutNulls."""
    assert matches(spark, default_catalog, "deftb",
                   regex("dim0", ".*")) == ALL6
    assert matches(spark, default_catalog, "deftb",
                   regex("dim0", "0")) == ["0"]
    assert matches(spark, default_catalog, "deftb",
                   regex("dim0", "5")) == ["5"]


def test_regex_single_value_with_nulls(spark, default_catalog):
    """testSingleValueStringColumnWithNulls sql branch — '' matches .*,
    null rows never match; java find() (substring) semantics."""
    assert matches(spark, default_catalog, "deftb",
                   regex("dim1", ".*")) == ALL6
    assert matches(spark, default_catalog, "deftb",
                   regex("dim1", "10")) == ["1"]
    assert matches(spark, default_catalog, "deftb",
                   regex("dim1", "2")) == ["2"]
    assert matches(spark, default_catalog, "deftb",
                   regex("dim1", "1")) == ["1", "3"]
    assert matches(spark, default_catalog, "deftb",
                   regex("dim1", ".*def")) == ["4"]
    assert matches(spark, default_catalog, "deftb",
                   regex("dim1", "abc")) == ["5"]
    assert matches(spark, default_catalog, "deftb",
                   regex("dim1", "ab.*")) == ["4", "5"]


def test_regex_multi_value(spark, default_catalog):
    """testMultiValueStringColumn sql branch — null/empty MVD rows never
    match, [''] does."""
    assert matches(spark, default_catalog, "deftb",
                   regex("dim2", ".*")) == ["0", "2", "3", "4"]
    assert matches(spark, default_catalog, "deftb",
                   regex("dim2", "a")) == ["0", "3"]
    assert matches(spark, default_catalog, "deftb",
                   regex("dim2", "b")) == ["0"]
    assert matches(spark, default_catalog, "deftb",
                   regex("dim2", "c")) == ["4"]
    assert matches(spark, default_catalog, "deftb", regex("dim2", "d")) == []


def test_regex_missing_column(spark, default_catalog):
    """testMissingColumnSpecifiedInDimensionList / NotSpecified."""
    for dim in ("dim3", "dim4"):
        assert matches(spark, default_catalog, "deftb", regex(dim, "")) == []
        assert matches(spark, default_catalog, "deftb", regex(dim, "a")) == []
        assert matches(spark, default_catalog, "deftb", regex(dim, "b")) == []
        assert matches(spark, default_catalog, "deftb", regex(dim, "c")) == []


# ------------------------------------------------------------------ search


def test_search_single_value_without_nulls(spark, default_catalog):
    """testSingleValueStringColumnWithoutNulls."""
    assert matches(spark, default_catalog, "deftb",
                   contains("dim0", "")) == ALL6
    assert matches(spark, default_catalog, "deftb",
                   contains("dim0", "0")) == ["0"]
    assert matches(spark, default_catalog, "deftb",
                   contains("dim0", "5")) == ["5"]


def test_search_single_value_with_nulls(spark, default_catalog):
    """testSingleValueStringColumnWithNulls sql branch."""
    assert matches(spark, default_catalog, "deftb",
                   contains("dim1", "")) == ALL6
    assert matches(spark, default_catalog, "deftb",
                   contains("dim1", "10")) == ["1"]
    assert matches(spark, default_catalog, "deftb",
                   contains("dim1", "2")) == ["2"]
    assert matches(spark, default_catalog, "deftb",
                   contains("dim1", "1")) == ["1", "3"]
    assert matches(spark, default_catalog, "deftb",
                   contains("dim1", "def")) == ["4"]
    assert matches(spark, default_catalog, "deftb",
                   contains("dim1", "abc")) == ["5"]
    assert matches(spark, default_catalog, "deftb",
                   contains("dim1", "ab")) == ["4", "5"]


def test_search_multi_value(spark, default_catalog):
    """testMultiValueStringColumn sql branch."""
    assert matches(spark, default_catalog, "deftb",
                   contains("dim2", "")) == ["0", "2", "3", "4"]
    assert matches(spark, default_catalog, "deftb",
                   contains("dim2", "a")) == ["0", "3"]
    assert matches(spark, default_catalog, "deftb",
                   contains("dim2", "b")) == ["0"]
    assert matches(spark, default_catalog, "deftb",
                   contains("dim2", "c")) == ["4"]
    assert matches(spark, default_catalog, "deftb",
                   contains("dim2", "d")) == []


def test_search_missing_column(spark, default_catalog):
    """testMissingColumnSpecifiedInDimensionList / NotSpecified."""
    for dim in ("dim3", "dim4"):
        assert matches(spark, default_catalog, "deftb",
                       contains(dim, "")) == []
        assert matches(spark, default_catalog, "deftb",
                       contains(dim, "a")) == []
        assert matches(spark, default_catalog, "deftb",
                       contains(dim, "b")) == []
        assert matches(spark, default_catalog, "deftb",
                       contains(dim, "c")) == []


# ------------------------------------------------------ columnComparison


def test_column_comparison_without_nulls(spark, cc_catalog):
    """testColumnsWithoutNulls — MVD sides match on ANY common element;
    the 3-way case needs every pair to overlap."""
    assert matches(spark, cc_catalog, "ccf",
                   col_cmp("dim0", "dim1")) == ["2", "5", "8"]
    assert matches(spark, cc_catalog, "ccf",
                   col_cmp("dim0", "dim2")) == ["3", "4", "5"]
    assert matches(spark, cc_catalog, "ccf",
                   col_cmp("dim1", "dim2")) == ["5", "9"]
    assert matches(spark, cc_catalog, "ccf",
                   col_cmp("dim0", "dim1", "dim2")) == ["5"]


def test_column_comparison_missing_columns(spark, cc_catalog):
    """testMissingColumnNotSpecifiedInDimensionList sql branch — two
    missing columns read {null} and match everywhere; '' does not equal
    null."""
    assert matches(spark, cc_catalog, "ccf",
                   col_cmp("dim6", "dim7")) == ALL10
    assert matches(spark, cc_catalog, "ccf",
                   col_cmp("dim1", "dim6")) == []
    assert matches(spark, cc_catalog, "ccf",
                   col_cmp("dim2", "dim6")) == ["1", "6", "7", "8"]


def test_column_comparison_with_lookup_extraction(spark, cc_catalog):
    """testSelectorWithLookupExtractionFn — extraction dimension specs
    apply per side ('a' → '7' with retain, so row 7 joins the equals
    set)."""
    fn = {"type": "lookup", "lookup": {"type": "map", "map": {"a": "7"}},
          "retainMissingValue": True, "injective": False}
    assert matches(spark, cc_catalog, "ccf", col_cmp(
        {"type": "extraction", "dimension": "dim0", "outputName": "dim0",
         "extractionFn": fn},
        {"type": "extraction", "dimension": "dim1", "outputName": "dim1",
         "extractionFn": fn})) == ["2", "5", "7", "8"]
