"""ExpressionVirtualColumnTest golden port (round 7) — selector-type
semantics of expression virtual columns
(processing/src/test/java/org/apache/druid/segment/virtual/
ExpressionVirtualColumnTest.java: ROW0-3 + ROWMULTI1-3, X_PLUS_Y /
Z_CONCAT_X / TIME_FLOOR / SCALE_* / CONSTANT_* definitions).

The reference's rows are schemaless (x is 4L in one row, 2.1d in the
next); parquet segments are typed, so the binding set splits into a
long-x table (rows 0, 1, 3, m1-m3) and a double-x table (row 2) — the
per-row expectations are identical.

Not ported, with reasons:
  * testCapabilities / testRequiredColumns — ColumnCapabilities /
    analysis plumbing of the reference's selector factory; Catalyst
    resolves schema and column deps itself.
  * testMultiObjectSelectorMakesRightSelector — asserts which internal
    DimensionSelector subclass is instantiated; no engine analogue.
"""

import datetime as _dt

import pytest
from pyspark.sql import types as T

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog

FULL = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]
T0 = _dt.datetime(2000, 1, 1, tzinfo=_dt.timezone.utc)
T2 = _dt.datetime(2000, 1, 1, 2, tzinfo=_dt.timezone.utc)
T3 = _dt.datetime(2000, 1, 2, 1, tzinfo=_dt.timezone.utc)


@pytest.fixture(scope="module")
def vc_catalog(spark, tmp_path_factory):
    long_schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("id", T.StringType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("z", T.StringType()),
        T.StructField("b", T.ArrayType(T.StringType())),
    ])
    long_rows = [
        (T0, "0", None, None, None, None),
        (T0, "1", 4, None, None, None),
        (T3, "3", 2, 3, "foobar", None),
        (T3, "m1", 2, 3, None, ["1", "2", "3"]),
        (T3, "m2", 3, 4, None, ["3", "4", "5"]),
        (T3, "m3", 3, 4, None, ["3", None, "5"]),
    ]
    dbl_schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("id", T.StringType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.LongType()),
        T.StructField("z", T.StringType()),
    ])
    dbl_rows = [(T2, "2", 2.1, 3, "foobar")]
    base = tmp_path_factory.mktemp("vc_ds")
    pl = str(base / "vcl.parquet")
    pd_ = str(base / "vcd.parquet")
    spark.createDataFrame(long_rows, long_schema).write.parquet(pl)
    spark.createDataFrame(dbl_rows, dbl_schema).write.parquet(pd_)
    cat = Catalog(spark)
    cat.register("vc_long", pl)
    cat.register("vc_dbl", pd_)
    return cat


def vc_values(spark, cat, table, expression, output_type=None,
              dimension=False):
    """{id: expr-value} via a scan (object selector) or a groupBy
    dimension read (dimension selector rendering)."""
    vc = {"type": "expression", "name": "expr", "expression": expression}
    if output_type:
        vc["outputType"] = output_type
    if dimension:
        q = {"queryType": "groupBy", "dataSource": table,
             "granularity": "all", "intervals": FULL,
             "virtualColumns": [vc],
             "dimensions": ["id", {"type": "default", "dimension": "expr",
                                   "outputType": "STRING"}],
             "aggregations": [{"type": "count", "name": "rows"}]}
        out = translate(q, spark, cat).collect()
        return {r["id"]: r["expr"] for r in out}
    q = {"queryType": "scan", "dataSource": table, "intervals": FULL,
         "virtualColumns": [vc], "columns": ["id", "expr"]}
    out = translate(q, spark, cat).collect()
    return {r["id"]: r["expr"] for r in out}


def test_object_selector(spark, vc_catalog):
    """testObjectSelector — x + y: null propagates (row0, row1's null y),
    long+long stays exact, double+long widens."""
    got = vc_values(spark, vc_catalog, "vc_long", "x + y")
    assert got["0"] is None
    assert got["1"] is None
    assert got["3"] == 5
    got2 = vc_values(spark, vc_catalog, "vc_dbl", "x + y")
    assert got2["2"] == pytest.approx(5.1)


def test_long_selector(spark, vc_catalog):
    """testLongSelector — outputType LONG truncates the double read
    (5.1 → 5) and keeps nulls null in SQL mode."""
    got = vc_values(spark, vc_catalog, "vc_long", "x + y",
                    output_type="LONG")
    assert (got["0"], got["1"], got["3"]) == (None, None, 5)
    got2 = vc_values(spark, vc_catalog, "vc_dbl", "x + y",
                     output_type="LONG")
    assert got2["2"] == 5


def test_float_selector(spark, vc_catalog):
    """testFloatSelector — outputType FLOAT."""
    got = vc_values(spark, vc_catalog, "vc_long", "x + y",
                    output_type="FLOAT")
    assert (got["0"], got["1"]) == (None, None)
    assert got["3"] == pytest.approx(5.0)
    got2 = vc_values(spark, vc_catalog, "vc_dbl", "x + y",
                     output_type="FLOAT")
    assert got2["2"] == pytest.approx(5.1, abs=1e-6)


def test_dimension_selector(spark, vc_catalog):
    """testDimensionSelector — the dimension read renders the natural
    type: long 5 is '5' (no decimal point), double is '5.1', nulls stay
    the null group."""
    got = vc_values(spark, vc_catalog, "vc_long", "x + y", dimension=True)
    assert (got["0"], got["1"], got["3"]) == (None, None, "5")
    got2 = vc_values(spark, vc_catalog, "vc_dbl", "x + y", dimension=True)
    assert got2["2"] == "5.1"


def test_dimension_selector_with_extraction(spark, vc_catalog):
    """testDimensionSelectorWithExtraction — substring(0,1) over the
    rendered value maps both '5' and '5.1' to '5'."""
    vc = {"type": "expression", "name": "expr", "expression": "x + y"}
    for table, rid in [("vc_long", "3"), ("vc_dbl", "2")]:
        q = {"queryType": "groupBy", "dataSource": table,
             "granularity": "all", "intervals": FULL,
             "virtualColumns": [vc],
             "dimensions": ["id",
                            {"type": "extraction", "dimension": "expr",
                             "outputName": "e",
                             "extractionFn": {"type": "substring",
                                              "index": 0, "length": 1}}],
             "aggregations": [{"type": "count", "name": "rows"}]}
        out = {r["id"]: r["e"]
               for r in translate(q, spark, vc_catalog).collect()}
        assert out[rid] == "5", table


def test_dimension_selector_using_string_function(spark, vc_catalog):
    """testDimensionSelectorUsingStringFunction — z + cast(x, 'string')
    concatenates; null z nulls the concat (SQL mode); the long x renders
    without a decimal point, the double with one."""
    got = vc_values(spark, vc_catalog, "vc_long",
                    "z + cast(x, 'string')", dimension=True)
    assert (got["0"], got["1"], got["3"]) == (None, None, "foobar2")
    got2 = vc_values(spark, vc_catalog, "vc_dbl",
                     "z + cast(x, 'string')", dimension=True)
    assert got2["2"] == "foobar2.1"


def test_dimension_selector_using_nonexistent_column(spark, vc_catalog):
    """testDimensionSelectorUsingNonexistentColumn — a missing column
    reads null, so concat(z, nonexistent) is null on every row."""
    got = vc_values(spark, vc_catalog, "vc_long",
                    "concat(z, nonexistent)", dimension=True)
    assert all(v is None for v in got.values())


def test_null_dimension_selector(spark, vc_catalog):
    """testNullDimensionSelector — the all-null row never matches a
    non-null matcher (filter on the VC drops it)."""
    q = {"queryType": "scan", "dataSource": "vc_long", "intervals": FULL,
         "virtualColumns": [{"type": "expression", "name": "expr",
                             "expression": "x + y"}],
         "filter": {"type": "not",
                    "field": {"type": "selector", "dimension": "expr",
                              "value": None}},
         "columns": ["id"]}
    ids = sorted(r["id"] for r in translate(q, spark, vc_catalog).collect())
    assert "0" not in ids and "3" in ids


def test_long_selector_of_time_column(spark, vc_catalog):
    """testLongSelectorOfTimeColumn — timestamp_floor(__time,'P1D') with
    outputType LONG is epoch MILLIS of the local midnight."""
    got = vc_values(spark, vc_catalog, "vc_long",
                    "timestamp_floor(__time, 'P1D')", output_type="LONG")
    day0 = int(_dt.datetime(2000, 1, 1,
                            tzinfo=_dt.timezone.utc).timestamp() * 1000)
    day1 = int(_dt.datetime(2000, 1, 2,
                            tzinfo=_dt.timezone.utc).timestamp() * 1000)
    assert got["0"] == day0 and got["3"] == day1


def test_long_selector_with_constant_like_expr_macro(spark, vc_catalog):
    """testLongSelectorWithConstantLikeExprMacro — like('foo','f%') is
    constant 1 on every row."""
    got = vc_values(spark, vc_catalog, "vc_long", "like('foo', 'f%')",
                    output_type="LONG")
    assert all(v == 1 for v in got.values())


def test_long_selector_with_z_like_expr_macro(spark, vc_catalog):
    """testLongSelectorWithZLikeExprMacro — like(z,'f%') is 0 (not null)
    for null z rows and 1 where z matches (LikeMatcher.matches(null) is
    false)."""
    got = vc_values(spark, vc_catalog, "vc_long", "like(z, 'f%')",
                    output_type="LONG")
    assert (got["0"], got["1"], got["3"]) == (0, 0, 1)


def test_constant_null_arithmetic_selectors(spark, vc_catalog):
    """testLongSelectorWithConstantNullArithmetic /
    testFloatSelectorWithConstantNullArithmetic /
    testExprEvalSelectorWithConstantNullArithmetic — 2.1 + null is null
    in SQL mode at every output type."""
    for ot in ("LONG", "FLOAT", "DOUBLE"):
        got = vc_values(spark, vc_catalog, "vc_long", "2.1 + null",
                        output_type=ot)
        assert all(v is None for v in got.values()), ot


def test_long_selector_using_string_function(spark, vc_catalog):
    """testLongSelectorUsingStringFunction — the concat result never
    parses as a long: null at LONG output type on every row."""
    got = vc_values(spark, vc_catalog, "vc_long",
                    "z + cast(x, 'string')", output_type="LONG")
    assert all(v is None for v in got.values())


def test_scale_long_and_float(spark, vc_catalog):
    """testExprEvalSelectorWithLongsAndNulls / WithFloatAndNulls /
    WithDoublesAndNulls — x * 2 through LONG and FLOAT output types:
    values scale, nulls stay null."""
    got = vc_values(spark, vc_catalog, "vc_long", "x * 2",
                    output_type="LONG")
    assert (got["0"], got["1"], got["3"]) == (None, 8, 4)
    gotf = vc_values(spark, vc_catalog, "vc_dbl", "x * 2",
                     output_type="FLOAT")
    assert gotf["2"] == pytest.approx(4.2, abs=1e-6)


def test_multi_object_selector(spark, vc_catalog):
    """testMultiObjectSelector — a scalar expression over one MVD maps
    per element, implicit (b * 2) and explicit (map(b -> b * 2, b)); the
    string elements read as doubles so render with decimal points, and a
    null element stays null (SQL mode)."""
    for expr in ("b * 2", "map(b -> b * 2, b)"):
        got = vc_values(spark, vc_catalog, "vc_long", expr,
                        output_type="STRING")
        assert got["m1"] == ["2.0", "4.0", "6.0"], expr
        assert got["m2"] == ["6.0", "8.0", "10.0"], expr
        assert got["m3"] == ["6.0", None, "10.0"], expr


def test_multi_object_selector_self_product(spark, vc_catalog):
    """SCALE_LIST_SELF_IMPLICIT / EXPLICIT — b * b maps the SAME MVD on
    both sides (element-wise square, not a cartesian)."""
    for expr in ("b * b", "map(b -> b * b, b)"):
        got = vc_values(spark, vc_catalog, "vc_long", expr,
                        output_type="STRING")
        assert got["m1"] == ["1.0", "4.0", "9.0"], expr
        assert got["m3"] == ["9.0", None, "25.0"], expr
