"""SelectorFilterTest / InFilterTest / LikeFilterTest golden ports
(round 6) — the leaf value-matcher filters over the BaseFilterTest
DEFAULT_ROWS and each test's own fixture
(processing/src/test/java/org/apache/druid/segment/filter/
SelectorFilterTest.java, InFilterTest.java:72-79, LikeFilterTest.java:66-74;
BaseFilterTest.java:164-171 DEFAULT_ROWS, :118-130 VIRTUAL_COLUMNS).

All expected lists are the sql-compatible-mode branches.  The javascript
extraction-fn variants (InFilterTest.testMatchWithExtractionFn) are not
portable — javascript raises by design; the lookup-extraction twins cover
the same null-replacement matrix.  Java-object tests (equals/cache-key/
required-column-rewrite/optimize identity) have no engine surface here."""

import datetime

import pytest
from pyspark.sql import types as T

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog

FULL = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]

VIRTUAL_COLUMNS = [
    {"type": "expression", "name": "expr", "expression": "1.0 + 0.1",
     "outputType": "FLOAT"},
    {"type": "expression", "name": "exprDouble", "expression": "1.0 + 1.1",
     "outputType": "DOUBLE"},
    {"type": "expression", "name": "exprLong", "expression": "1 + 2",
     "outputType": "LONG"},
    {"type": "expression", "name": "vdim0", "expression": "dim0",
     "outputType": "STRING"},
    {"type": "expression", "name": "vdim1", "expression": "dim1",
     "outputType": "STRING"},
    {"type": "expression", "name": "vd0", "expression": "d0",
     "outputType": "DOUBLE"},
    {"type": "expression", "name": "vf0", "expression": "f0",
     "outputType": "FLOAT"},
    {"type": "expression", "name": "vl0", "expression": "l0",
     "outputType": "LONG"},
]


def _write(spark, tmp_path_factory, name, schema, rows):
    path = str(tmp_path_factory.mktemp(name) / f"{name}.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register(name, path)
    return cat


@pytest.fixture(scope="module")
def default_catalog(spark, tmp_path_factory):
    """BaseFilterTest.DEFAULT_ROWS (rows dim0 0..5)."""
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
    return _write(spark, tmp_path_factory, "deft", schema, rows)


@pytest.fixture(scope="module")
def in_catalog(spark, tmp_path_factory):
    """InFilterTest.ROWS (dim0 a..f; row f has no dim2)."""
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim0", T.StringType()),
        T.StructField("dim1", T.StringType()),
        T.StructField("dim2", T.ArrayType(T.StringType())),
    ])
    t = datetime.datetime(2000, 1, 1)
    rows = [
        (t, "a", "", ["a", "b"]),
        (t, "b", "10", []),
        (t, "c", "2", [""]),
        (t, "d", "1", ["a"]),
        (t, "e", "def", ["c"]),
        (t, "f", "abc", None),
    ]
    return _write(spark, tmp_path_factory, "inf", schema, rows)


@pytest.fixture(scope="module")
def like_catalog(spark, tmp_path_factory):
    """LikeFilterTest.ROWS (dim0 0..6, incl. the newline row)."""
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim0", T.StringType()),
        T.StructField("dim1", T.StringType()),
    ])
    t = datetime.datetime(2000, 1, 1)
    rows = [
        (t, "0", ""),
        (t, "1", "foo"),
        (t, "2", "foobar"),
        (t, "3", "bar"),
        (t, "4", "foobarbaz"),
        (t, "5", "foo%bar"),
        (t, "6", "new\nline"),
    ]
    return _write(spark, tmp_path_factory, "likef", schema, rows)


def matches(spark, cat, table, flt, virtual=None):
    q = {"queryType": "scan", "dataSource": table, "intervals": FULL,
         "filter": flt, "columns": ["dim0"]}
    if virtual:
        q["virtualColumns"] = virtual
    return sorted(r["dim0"] for r in translate(q, spark, cat).collect())


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


def like(dim, pattern, escape=None, fn=None):
    f = {"type": "like", "dimension": dim, "pattern": pattern}
    if escape is not None:
        f["escape"] = escape
    if fn:
        f["extractionFn"] = fn
    return f


def substring(index, length=None):
    f = {"type": "substring", "index": index}
    if length is not None:
        f["length"] = length
    return f


def lookup_fn(mapping, retain=False, replace=None, injective=False):
    f = {"type": "lookup", "lookup": {"type": "map", "map": mapping},
         "retainMissingValue": retain, "injective": injective}
    if replace is not None:
        f["replaceMissingValueWith"] = replace
    return f


ALL6 = list("012345")
ALL_AF = list("abcdef")


# ---------------------------------------------------------------- selector


def test_selector_with_time_extraction_fn_null(spark, default_catalog):
    """testWithTimeExtractionFnNull — TimeDimExtractionFn passes
    unparseable values through unchanged; null stays null."""
    fn = {"type": "time", "timeFormat": "yyyy-MM-dd", "resultFormat":
          "yyyy-MM", "joda": True}
    assert matches(spark, default_catalog, "deft", sel("dim0", None, fn)) == []
    assert matches(spark, default_catalog, "deft",
                   sel("vdim0", None, fn), VIRTUAL_COLUMNS) == []
    assert matches(spark, default_catalog, "deft",
                   sel("timeDim", None, fn)) == ["4"]
    assert matches(spark, default_catalog, "deft",
                   sel("timeDim", "2017-07", fn)) == ["0", "1"]
    assert matches(spark, default_catalog, "deft",
                   sel("timeDim", "2017-05", fn)) == ["2"]
    assert matches(spark, default_catalog, "deft",
                   sel("timeDim", "2020-01", fn)) == ["3", "5"]


def test_selector_single_value_string_without_nulls(spark, default_catalog):
    """testSingleValueStringColumnWithoutNulls (+ the virtual twin)."""
    for dim, virtual in (("dim0", None), ("vdim0", VIRTUAL_COLUMNS)):
        assert matches(spark, default_catalog, "deft",
                       sel(dim, None), virtual) == []
        assert matches(spark, default_catalog, "deft",
                       sel(dim, ""), virtual) == []
        assert matches(spark, default_catalog, "deft",
                       sel(dim, "0"), virtual) == ["0"]
        assert matches(spark, default_catalog, "deft",
                       sel(dim, "1"), virtual) == ["1"]


def test_selector_single_value_string_with_nulls(spark, default_catalog):
    """testSingleValueStringColumnWithNulls sql branch (+ virtual twin)."""
    for dim, virtual in (("dim1", None), ("vdim1", VIRTUAL_COLUMNS)):
        assert matches(spark, default_catalog, "deft",
                       sel(dim, None), virtual) == []
        assert matches(spark, default_catalog, "deft",
                       sel(dim, ""), virtual) == ["0"]
        assert matches(spark, default_catalog, "deft",
                       sel(dim, "10"), virtual) == ["1"]
        assert matches(spark, default_catalog, "deft",
                       sel(dim, "2"), virtual) == ["2"]
        assert matches(spark, default_catalog, "deft",
                       sel(dim, "1"), virtual) == ["3"]
        assert matches(spark, default_catalog, "deft",
                       sel(dim, "abdef"), virtual) == ["4"]
        assert matches(spark, default_catalog, "deft",
                       sel(dim, "abc"), virtual) == ["5"]
        assert matches(spark, default_catalog, "deft",
                       sel(dim, "ab"), virtual) == []


def test_selector_multi_value_string(spark, default_catalog):
    """testMultiValueStringColumn sql branch."""
    assert matches(spark, default_catalog, "deft",
                   sel("dim2", None)) == ["1", "5"]
    assert matches(spark, default_catalog, "deft", sel("dim2", "")) == ["2"]
    assert matches(spark, default_catalog, "deft",
                   sel("dim2", "a")) == ["0", "3"]
    assert matches(spark, default_catalog, "deft", sel("dim2", "b")) == ["0"]
    assert matches(spark, default_catalog, "deft", sel("dim2", "c")) == ["4"]
    assert matches(spark, default_catalog, "deft", sel("dim2", "d")) == []


def test_selector_missing_column(spark, default_catalog):
    """testMissingColumnSpecifiedInDimensionList / NotSpecified — both are
    absent columns here."""
    for dim in ("dim3", "dim4"):
        assert matches(spark, default_catalog, "deft",
                       sel(dim, None)) == ALL6
        assert matches(spark, default_catalog, "deft", sel(dim, "")) == []
        assert matches(spark, default_catalog, "deft", sel(dim, "a")) == []
        assert matches(spark, default_catalog, "deft", sel(dim, "b")) == []
        assert matches(spark, default_catalog, "deft", sel(dim, "c")) == []


def test_selector_expression_virtual_column(spark, default_catalog):
    """testExpressionVirtualColumn."""
    assert matches(spark, default_catalog, "deft",
                   sel("expr", "1.1"), VIRTUAL_COLUMNS) == ALL6
    assert matches(spark, default_catalog, "deft",
                   sel("expr", "1.2"), VIRTUAL_COLUMNS) == []


def test_selector_with_lookup_extraction_fn(spark, default_catalog):
    """testSelectorWithLookupExtractionFn sql branches."""
    fn = lookup_fn({"1": "HELLO", "a": "HELLO", "abdef": "HELLO",
                    "abc": "UNKNOWN"}, replace="UNKNOWN")
    assert matches(spark, default_catalog, "deft",
                   sel("dim0", "HELLO", fn)) == ["1"]
    assert matches(spark, default_catalog, "deft",
                   sel("dim0", "UNKNOWN", fn)) == ["0", "2", "3", "4", "5"]
    assert matches(spark, default_catalog, "deft",
                   sel("dim1", "HELLO", fn)) == ["3", "4"]
    assert matches(spark, default_catalog, "deft",
                   sel("dim1", "UNKNOWN", fn)) == ["0", "1", "2", "5"]
    assert matches(spark, default_catalog, "deft",
                   sel("dim2", "HELLO", fn)) == ["0", "3"]
    assert matches(spark, default_catalog, "deft",
                   sel("dim2", "UNKNOWN", fn)) == ["0", "1", "2", "4", "5"]
    for dim in ("dim3", "dim4"):
        assert matches(spark, default_catalog, "deft",
                       sel(dim, "HELLO", fn)) == []
        assert matches(spark, default_catalog, "deft",
                       sel(dim, "UNKNOWN", fn)) == ALL6

    fn2 = lookup_fn({"2": "5"}, retain=True)
    assert matches(spark, default_catalog, "deft",
                   sel("dim0", "5", fn2)) == ["2", "5"]

    fn3 = lookup_fn({"1": ""})
    assert matches(spark, default_catalog, "deft",
                   sel("dim0", None, fn3)) == ["0", "2", "3", "4", "5"]
    assert matches(spark, default_catalog, "deft",
                   sel("dim0", "", fn3)) == ["1"]

    # optimize()-path twins (optFilter4/5/6) — match results only
    assert matches(spark, default_catalog, "deft",
                   sel("dim0", "5", lookup_fn({"9": "4"}, retain=True))) == \
        ["5"]
    assert matches(spark, default_catalog, "deft",
                   sel("dim0", "5", lookup_fn({"5": "44"}, retain=True))) == []
    assert matches(spark, default_catalog, "deft",
                   sel("dim0", "5", lookup_fn({"5": "5"}, retain=True))) == \
        ["5"]


def test_extraction_dim_filter_with_lookup(spark, default_catalog):
    """The deprecated ExtractionDimFilter twins at the end of
    testSelectorWithLookupExtractionFn."""
    fn = lookup_fn({"1": "HELLO", "a": "HELLO", "abdef": "HELLO",
                    "abc": "UNKNOWN"}, replace="UNKNOWN")
    assert matches(spark, default_catalog, "deft",
                   {"type": "extraction", "dimension": "dim1",
                    "value": "UNKNOWN", "extractionFn": fn}) == \
        ["0", "1", "2", "5"]
    fn2 = lookup_fn({"2": "5"}, retain=True)
    assert matches(spark, default_catalog, "deft",
                   {"type": "extraction", "dimension": "dim0", "value": "5",
                    "extractionFn": fn2}) == ["2", "5"]
    fn3 = lookup_fn({"1": ""})
    assert matches(spark, default_catalog, "deft",
                   {"type": "extraction", "dimension": "dim0", "value": None,
                    "extractionFn": fn3}) == ["0", "2", "3", "4", "5"]
    assert matches(spark, default_catalog, "deft",
                   {"type": "extraction", "dimension": "dim0", "value": "",
                    "extractionFn": fn3}) == ["1"]


def test_selector_numeric_nulls(spark, default_catalog):
    """testNumericColumnNullsAndDefaults sql branch (+ virtual twins) —
    '0' parses into the column type, so it matches 0.0f/0.0/0L."""
    cases = [("f0", "vf0", "4"), ("d0", "vd0", "2"), ("l0", "vl0", "3")]
    for real, virt, null_row in cases:
        for dim, virtual in ((real, None), (virt, VIRTUAL_COLUMNS)):
            assert matches(spark, default_catalog, "deft",
                           sel(dim, "0"), virtual) == ["0"], dim
            assert matches(spark, default_catalog, "deft",
                           sel(dim, None), virtual) == [null_row], dim


# ---------------------------------------------------------------- in


def test_in_single_value_string_without_nulls(spark, in_catalog):
    """testSingleValueStringColumnWithoutNulls."""
    assert matches(spark, in_catalog, "inf", in_f("dim0", [])) == []
    assert matches(spark, in_catalog, "inf", in_f("dim0", [None])) == []
    assert matches(spark, in_catalog, "inf", in_f("dim0", ["", ""])) == []
    assert matches(spark, in_catalog, "inf",
                   in_f("dim0", ["a", "c"])) == ["a", "c"]
    assert matches(spark, in_catalog, "inf",
                   in_f("dim0", ["e", "x"])) == ["e"]


def test_in_single_value_string_with_nulls(spark, in_catalog):
    """testSingleValueStringColumnWithNulls sql branch."""
    assert matches(spark, in_catalog, "inf",
                   in_f("dim1", [None, ""])) == ["a"]
    assert matches(spark, in_catalog, "inf", in_f("dim1", [""])) == ["a"]
    assert matches(spark, in_catalog, "inf",
                   in_f("dim1", [None, "10", "abc"])) == ["b", "f"]
    assert matches(spark, in_catalog, "inf",
                   in_f("dim1", ["-1", "ab", "de"])) == []


def test_in_multi_value_string(spark, in_catalog):
    """testMultiValueStringColumn sql branch."""
    assert matches(spark, in_catalog, "inf",
                   in_f("dim2", [None])) == ["b", "f"]
    assert matches(spark, in_catalog, "inf",
                   in_f("dim2", [None, "a"])) == ["a", "b", "d", "f"]
    assert matches(spark, in_catalog, "inf",
                   in_f("dim2", [None, "b"])) == ["a", "b", "f"]
    assert matches(spark, in_catalog, "inf", in_f("dim2", [""])) == ["c"]
    assert matches(spark, in_catalog, "inf",
                   in_f("dim2", ["", None])) == ["b", "c", "f"]
    assert matches(spark, in_catalog, "inf", in_f("dim2", ["c"])) == ["e"]
    assert matches(spark, in_catalog, "inf", in_f("dim2", ["d"])) == []


def test_in_missing_column(spark, in_catalog):
    """testMissingColumn."""
    assert matches(spark, in_catalog, "inf",
                   in_f("dim3", [None, None])) == ALL_AF
    assert matches(spark, in_catalog, "inf", in_f("dim3", [""])) == []
    assert matches(spark, in_catalog, "inf",
                   in_f("dim3", [None, "a"])) == ALL_AF
    assert matches(spark, in_catalog, "inf", in_f("dim3", ["a"])) == []
    assert matches(spark, in_catalog, "inf", in_f("dim3", ["b"])) == []
    assert matches(spark, in_catalog, "inf", in_f("dim3", ["c"])) == []


def test_in_with_lookup_extraction_fn(spark, in_catalog):
    """testMatchWithLookupExtractionFn (sql-mode rows)."""
    fn = lookup_fn({"a": "HELLO", "10": "HELLO", "def": "HELLO",
                    "c": "BYE"}, replace="UNKNOWN")
    assert matches(spark, in_catalog, "inf",
                   in_f("dim0", [None, "HELLO"], fn)) == ["a"]
    assert matches(spark, in_catalog, "inf",
                   in_f("dim0", ["HELLO", "BYE"], fn)) == ["a", "c"]
    assert matches(spark, in_catalog, "inf",
                   in_f("dim0", ["UNKNOWN"], fn)) == ["b", "d", "e", "f"]
    assert matches(spark, in_catalog, "inf",
                   in_f("dim1", ["HELLO"], fn)) == ["b", "e"]
    assert matches(spark, in_catalog, "inf",
                   in_f("dim1", ["N/A"], fn)) == []
    assert matches(spark, in_catalog, "inf",
                   in_f("dim2", ["a"], fn)) == []
    assert matches(spark, in_catalog, "inf",
                   in_f("dim2", ["HELLO"], fn)) == ["a", "d"]
    assert matches(spark, in_catalog, "inf",
                   in_f("dim2", ["HELLO", "BYE", "UNKNOWN"], fn)) == ALL_AF

    fn2 = lookup_fn({"a": "e"}, retain=True)
    assert matches(spark, in_catalog, "inf",
                   in_f("dim0", [None, "e"], fn2)) == ["a", "e"]
    assert matches(spark, in_catalog, "inf", in_f("dim0", ["a"], fn2)) == []

    fn3 = lookup_fn({"c": "500", "100": "e"})
    assert matches(spark, in_catalog, "inf",
                   in_f("dim0", [None, "c"], fn3)) == \
        ["a", "b", "d", "e", "f"]
    assert matches(spark, in_catalog, "inf", in_f("dim0", ["e"], fn3)) == []


# ---------------------------------------------------------------- like


def test_like_exact_and_escape(spark, like_catalog):
    """testExactMatch / testExactMatchWithEscape /
    testEscapeEscapingItself."""
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "bar")) == ["3"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "@bar", "@")) == ["3"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "foooo", "o")) == ["1"]


def test_like_with_substring_extraction(spark, like_catalog):
    """testExactMatchWithExtractionFn / testPrefixMatchWithExtractionFn /
    testSuffixMatchWithExtractionFn / testMatchEmptyStringWithExtractionFn
    (sql branch)."""
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "bar", fn=substring(3, 3))) == ["2", "4"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "a%", fn=substring(1))) == ["3"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "%ar", fn=substring(3, 3))) == ["2", "4"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "", fn=substring(100, 1))) == []


def test_like_prefix_wildcard_underscore(spark, like_catalog):
    """testPrefixMatch / testPrefixMatchWithEscape / testWildcardMatch /
    testWildcardMatchWithEscape / testWildcardMatchEverything /
    testPrefixAndSuffixMatch / testUnderscoreMatch."""
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "foo%")) == ["1", "2", "4", "5"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "foo@%%", "@")) == ["5"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "%oba%")) == ["2", "4"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "%@%ba%", "@")) == ["5"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "%", "@")) == list("0123456")
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "f%r")) == ["2", "5"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "f_o")) == ["1"]


def test_like_empty_string(spark, like_catalog):
    """testMatchEmptyString."""
    assert matches(spark, like_catalog, "likef", like("dim1", "")) == ["0"]


def test_like_newline(spark, like_catalog):
    """testNewlineMatch / testNewlineMatchWithExtractionFn — % and _ must
    cross newlines (LikeMatcher compiles with DOTALL)."""
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "ne%")) == ["6"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "%ine")) == ["6"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "new_line")) == ["6"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "e%", fn=substring(1, 100))) == ["6"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "%ine", fn=substring(1, 100))) == ["6"]
    assert matches(spark, like_catalog, "likef",
                   like("dim1", "ew_line", fn=substring(1, 100))) == ["6"]
