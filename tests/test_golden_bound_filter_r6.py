"""BoundFilterTest.java golden port (round 6) — the bound filter's three
comparator orderings (lexicographic / alphanumeric / numeric) against the
BaseFilterTest DEFAULT_ROWS + the two extra bound rows
(processing/src/test/java/org/apache/druid/segment/filter/
BoundFilterTest.java:52-56; BaseFilterTest.java:162-169).  All expected
lists are the sql-compatible-mode branches.

The extraction-fn variant (testMatchWithExtractionFn) uses javascript
extraction — covered via the stringFormat twin; vdim2/vdim3 references in
testLexicographicMatchEverything are omitted (dim2 is the MVD — its
virtual twin is engine-equivalent to filtering dim2 itself, asserted
directly)."""

import datetime

import pytest
from pyspark.sql import types as T

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog

FULL = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]


@pytest.fixture(scope="module")
def bf_catalog(spark, tmp_path_factory):
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
        (t, "6", "-1000", ["a"], None, 6.6, None, 10),
        (t, "7", "-10.012", ["d"], None, None, 3.0, None),
    ]
    path = str(tmp_path_factory.mktemp("bf_ds") / "bf.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("bf", path)
    return cat


def bound(dim, lower, upper, lower_strict=False, upper_strict=False,
          ordering="lexicographic", extraction_fn=None):
    f = {"type": "bound", "dimension": dim, "ordering": ordering}
    if lower is not None:
        f["lower"] = lower
    if upper is not None:
        f["upper"] = upper
    if lower_strict:
        f["lowerStrict"] = True
    if upper_strict:
        f["upperStrict"] = True
    if extraction_fn:
        f["extractionFn"] = extraction_fn
    return f


def matches(spark, cat, flt, virtual=None):
    q = {"queryType": "scan", "dataSource": "bf", "intervals": FULL,
         "filter": flt, "columns": ["dim0"]}
    if virtual:
        q["virtualColumns"] = virtual
    return sorted(r["dim0"] for r in translate(q, spark, cat).collect())


ALL8 = list("01234567")
VDIMS = [{"type": "expression", "name": "vdim0", "expression": "dim0",
          "outputType": "STRING"},
         {"type": "expression", "name": "vdim1", "expression": "dim1",
          "outputType": "STRING"}]
EXPR_VC = [{"type": "expression", "name": "expr", "expression": "1.0 + 0.1",
            "outputType": "FLOAT"}]


def test_lexicographic_match_everything(spark, bf_catalog):
    """testLexicographicMatchEverything — every column (incl. virtual
    twins, the MVD and the absent dim3) is below 'z'."""
    for dim in ("dim0", "dim1", "dim2", "dim3"):
        assert matches(spark, bf_catalog, bound(dim, None, "z")) == ALL8, dim
    for dim in ("vdim0", "vdim1"):
        assert matches(spark, bf_catalog, bound(dim, None, "z"),
                       virtual=VDIMS) == ALL8, dim


def test_lexicographic_match_with_empty_string(spark, bf_catalog):
    """testLexicographicMatchWithEmptyString — sql mode: '' is a real
    lower bound; nulls (and rows whose MVD has no value ≥ '') drop."""
    assert matches(spark, bf_catalog, bound("dim0", "", "z")) == ALL8
    assert matches(spark, bf_catalog, bound("dim1", "", "z")) == ALL8
    assert matches(spark, bf_catalog, bound("dim2", "", "z")) == \
        ["0", "2", "3", "4", "6", "7"]
    assert matches(spark, bf_catalog, bound("dim3", "", "z")) == []


def test_lexicographic_match_null(spark, bf_catalog):
    """testLexicographicMatchNull — ''..'' matches only the empty string
    (sql mode: dim2's [''] row only)."""
    assert matches(spark, bf_catalog, bound("dim0", "", "")) == []
    assert matches(spark, bf_catalog, bound("dim1", "", "")) == ["0"]
    assert matches(spark, bf_catalog, bound("dim2", "", "")) == ["2"]


def test_lexicographic_match_missing_column(spark, bf_catalog):
    """testLexicographicMatchMissingColumn — dim3 never matches value
    bounds in sql mode; a null-to-'' upper range matches everything only
    when '' is excluded via upperStrict-with-null-lower."""
    assert matches(spark, bf_catalog, bound("dim3", "", "")) == []
    assert matches(spark, bf_catalog,
                   bound("dim3", "", None, upper_strict=True)) == []
    assert matches(spark, bf_catalog,
                   bound("dim3", None, "", upper_strict=True)) == ALL8
    assert matches(spark, bf_catalog,
                   bound("dim3", "", "", lower_strict=True)) == []
    assert matches(spark, bf_catalog,
                   bound("dim3", "", "", upper_strict=True)) == []
    assert matches(spark, bf_catalog, bound("dim3", None, "")) == ALL8


def test_lexicographic_match_too_strict(spark, bf_catalog):
    """testLexicographicMatchTooStrict."""
    assert matches(spark, bf_catalog,
                   bound("dim1", "abc", "abc", lower_strict=True)) == []
    assert matches(spark, bf_catalog,
                   bound("dim1", "abc", "abc", True, True)) == []
    assert matches(spark, bf_catalog,
                   bound("dim1", "abc", "abc", upper_strict=True)) == []


def test_lexicographic_match_single_value_and_ranges(spark, bf_catalog):
    """testLexicographicMatchExactlySingleValue /
    SurroundingSingleValue / NoUpperLimit / NoLowerLimit / Numbers."""
    assert matches(spark, bf_catalog, bound("dim1", "abc", "abc")) == ["5"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "ab", "abd", True, True)) == ["5"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "ab", None, lower_strict=True)) == \
        ["4", "5"]
    assert matches(spark, bf_catalog,
                   bound("dim1", None, "abd", upper_strict=True)) == \
        ["0", "1", "2", "3", "5", "6", "7"]
    assert matches(spark, bf_catalog, bound("dim1", "1", "3")) == \
        ["1", "2", "3"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "1", "3", True, True)) == ["1", "2"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "-1", "3", True, True)) == \
        ["1", "2", "3", "6", "7"]


def test_alphanumeric_match_null_and_strict(spark, bf_catalog):
    """testAlphaNumericMatchNull / TooStrict / ExactlySingleValue /
    SurroundingSingleValue."""
    an = dict(ordering="alphanumeric")
    assert matches(spark, bf_catalog, bound("dim0", "", "", **an)) == []
    assert matches(spark, bf_catalog, bound("dim1", "", "", **an)) == ["0"]
    assert matches(spark, bf_catalog, bound("dim2", "", "", **an)) == ["2"]
    assert matches(spark, bf_catalog, bound("dim3", "", "", **an)) == []
    assert matches(spark, bf_catalog,
                   bound("dim1", "2", "2", lower_strict=True, **an)) == []
    assert matches(spark, bf_catalog,
                   bound("dim1", "2", "2", True, True, **an)) == []
    assert matches(spark, bf_catalog,
                   bound("dim1", "2", "2", upper_strict=True, **an)) == []
    assert matches(spark, bf_catalog, bound("dim1", "2", "2", **an)) == ["2"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "1", "3", True, True, **an)) == ["2"]


def test_alphanumeric_match_ranges(spark, bf_catalog):
    """testAlphaNumericMatchNoUpperLimit / NoLowerLimit / WithNegatives —
    the alphanumeric comparator reads digit RUNS as numbers but has no
    sign handling ('-1000' > '3' because '-' compares as a character)."""
    an = dict(ordering="alphanumeric")
    assert matches(spark, bf_catalog,
                   bound("dim1", "1", None, True, True, **an)) == \
        ["1", "2", "4", "5", "6", "7"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "-1", None, True, True, **an)) == \
        ["4", "5", "6", "7"]
    assert matches(spark, bf_catalog,
                   bound("dim1", None, "2", True, True, **an)) == ["0", "3"]
    assert matches(spark, bf_catalog,
                   bound("dim1", None, "ZZZZZ", True, True, **an)) == ALL8
    assert matches(spark, bf_catalog,
                   bound("dim1", "-2000", "3", True, True, **an)) == []
    assert matches(spark, bf_catalog,
                   bound("dim1", "3", "-2000", True, True, **an)) == \
        ["1", "6", "7"]


def test_numeric_match_null_and_strict(spark, bf_catalog):
    """testNumericMatchNull / TooStrict / ExactlySingleValue /
    SurroundingSingleValue."""
    nu = dict(ordering="numeric")
    assert matches(spark, bf_catalog, bound("dim0", "", "", **nu)) == []
    assert matches(spark, bf_catalog, bound("dim1", "", "", **nu)) == ["0"]
    assert matches(spark, bf_catalog, bound("dim2", "", "", **nu)) == ["2"]
    assert matches(spark, bf_catalog, bound("dim3", "", "", **nu)) == []
    assert matches(spark, bf_catalog,
                   bound("dim1", "2", "2", lower_strict=True, **nu)) == []
    assert matches(spark, bf_catalog,
                   bound("dim1", "2", "2", True, True, **nu)) == []
    assert matches(spark, bf_catalog,
                   bound("dim1", "2", "2", upper_strict=True, **nu)) == []
    assert matches(spark, bf_catalog, bound("dim1", "2", "2", **nu)) == ["2"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "-10.012", "-10.012", **nu)) == ["7"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "1", "3", True, True, **nu)) == ["2"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "-11", "-10", **nu)) == ["7"]


def test_numeric_match_ranges(spark, bf_catalog):
    """testNumericMatchNoUpperLimit / NoLowerLimit / WithNegatives — the
    numeric comparator parses values; unparseable strings sort first."""
    nu = dict(ordering="numeric")
    assert matches(spark, bf_catalog,
                   bound("dim1", "1", None, True, True, **nu)) == ["1", "2"]
    assert matches(spark, bf_catalog,
                   bound("dim1", None, "2", True, True, **nu)) == \
        ["0", "3", "4", "5", "6", "7"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "-2000", "3", True, True, **nu)) == \
        ["2", "3", "6", "7"]


def test_numeric_match_virtual_column(spark, bf_catalog):
    """testNumericMatchVirtualColumn — expr = 1.0 + 0.1."""
    assert matches(spark, bf_catalog,
                   bound("expr", "1", "2", ordering="numeric"),
                   virtual=EXPR_VC) == ALL8
    assert matches(spark, bf_catalog,
                   bound("expr", "2", "3", ordering="numeric"),
                   virtual=EXPR_VC) == []


def test_match_with_extraction_fn(spark, bf_catalog):
    """testMatchWithExtractionFn — the 'super-' prefix via stringFormat
    (the javascript twin); a null-producing extraction matches nothing in
    sql mode."""
    super_fn = {"type": "stringFormat", "format": "super-%s"}
    assert matches(spark, bf_catalog,
                   bound("dim1", "super-ab", "super-abd", True, True,
                         extraction_fn=super_fn)) == ["5"]
    # the null/[] rows format as 'super-null' (StringFormatExtractionFn
    # NULLSTRING default), which lands inside the range — all 8 match
    assert matches(spark, bf_catalog,
                   bound("dim2", "super-", "super-zzzzzz",
                         extraction_fn=super_fn)) == ALL8
