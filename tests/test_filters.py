"""DimFilter tree tests, incl. the MVD any-match rule and bound orderings.
Modeled on processing/src/test/.../query/filter tests +
CalciteMultiValueStringQueryTest behaviors."""

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.filters.filters import FilterContext, compile_filter
from tests.conftest import rows


def apply(df, spec):
    return df.filter(compile_filter(spec, FilterContext(df)))


def test_selector(foo):
    assert apply(foo, {"type": "selector", "dimension": "dim1", "value": "abc"}).count() == 1
    # empty string is a real value in SQL-compatible null mode
    assert apply(foo, {"type": "selector", "dimension": "dim1", "value": ""}).count() == 1
    # null matches the null row AND the empty-array row (Druid: [] ≡ null)
    assert apply(foo, {"type": "selector", "dimension": "dim2", "value": None}).count() == 2


def test_selector_on_mvd_matches_any(foo):
    out = apply(foo, {"type": "selector", "dimension": "dim2", "value": "a"})
    assert rows(out, "dim1") == [("",), ("1",)]
    # value inside a multi-element array
    out2 = apply(foo, {"type": "selector", "dimension": "dim3", "value": "b"})
    assert rows(out2, "dim1") == [("",), ("10.1",)]


def test_in_and_bound(foo):
    assert apply(foo, {"type": "in", "dimension": "dim1",
                       "values": ["abc", "def", "zzz"]}).count() == 2
    # numeric ordering: "10.1" > "2" numerically
    out = apply(foo, {"type": "bound", "dimension": "dim1", "lower": "2",
                      "ordering": "numeric"})
    assert rows(out, "dim1") == [("10.1",), ("2",)]
    # lexicographic: "10.1" < "2"
    out2 = apply(foo, {"type": "bound", "dimension": "dim1", "lower": "2",
                       "lowerStrict": False, "ordering": "lexicographic"})
    assert ("10.1",) not in rows(out2, "dim1")
    # strlen ordering: by length then lexicographic — 1-char dims "1","2" < "4",
    # longer dims sort above any 1-char value
    out3 = apply(foo, {"type": "bound", "dimension": "dim1", "lower": "4",
                       "ordering": "strlen"})
    assert rows(out3, "dim1") == [("10.1",), ("abc",), ("def",)]


def test_alphanumeric_bound(spark):
    df = spark.createDataFrame([("x9",), ("x10",), ("x100",)], "v string")
    ctx = FilterContext(df)
    pred = compile_filter({"type": "bound", "dimension": "v", "lower": "x10",
                           "upper": "x100", "ordering": "alphanumeric"}, ctx)
    assert rows(df.filter(pred), "v") == [("x10",), ("x100",)]


def test_like_regex_search(foo):
    assert apply(foo, {"type": "like", "dimension": "dim1", "pattern": "a%"}).count() == 1
    assert apply(foo, {"type": "regex", "dimension": "dim1",
                       "pattern": "^[0-9]+"}).count() == 3
    assert apply(foo, {"type": "search", "dimension": "dim1",
                       "query": {"type": "contains", "value": "0."}}).count() == 1
    assert apply(foo, {"type": "search", "dimension": "dim1",
                       "query": {"type": "fragment",
                                 "values": ["a", "c"]}}).count() == 1


def test_search_all_spec_accepts_null(spark):
    """AllSearchQuerySpec.accept(@Nullable dimVal) returns true even for
    null — rows whose dimension is null must survive a search filter with
    the 'all' spec."""
    df = spark.createDataFrame([("a",), (None,), ("b",)], "v string")
    ctx = FilterContext(df)
    pred = compile_filter({"type": "search", "dimension": "v",
                           "query": {"type": "all"}}, ctx)
    assert df.filter(pred).count() == 3


def test_boolean_algebra(foo):
    spec = {"type": "and", "fields": [
        {"type": "not", "field": {"type": "selector", "dimension": "dim1", "value": ""}},
        {"type": "or", "fields": [
            {"type": "selector", "dimension": "dim1", "value": "abc"},
            {"type": "selector", "dimension": "dim1", "value": "def"}]}]}
    assert apply(foo, spec).count() == 2
    assert apply(foo, {"type": "true"}).count() == 6
    assert apply(foo, {"type": "false"}).count() == 0


def test_expression_filter(foo):
    assert apply(foo, {"type": "expression", "expression": "m1 > 3 && m2 < 6"}).count() == 2
    assert apply(foo, {"type": "expression",
                       "expression": "strlen(dim1) == 3"}).count() == 2


def test_interval_filter(foo):
    out = apply(foo, {"type": "interval", "dimension": "__time",
                      "intervals": ["2000-01-01T00:00:00Z/2001-01-01T00:00:00Z"]})
    assert out.count() == 3


def test_column_comparison(spark):
    df = spark.createDataFrame([("a", "a"), ("a", "b")], "x string, y string")
    ctx = FilterContext(df)
    pred = compile_filter({"type": "columnComparison", "dimensions": ["x", "y"]}, ctx)
    assert df.filter(pred).count() == 1


def test_extraction_fn_in_filter(foo):
    spec = {"type": "selector", "dimension": "dim1", "value": "AB",
            "extractionFn": {"type": "cascade", "extractionFns": [
                {"type": "upper"}, {"type": "substring", "index": 0, "length": 2}]}}
    assert apply(foo, spec).count() == 1  # 'abc' → 'ABC' → 'AB'


def test_spatial_filter(spark):
    df = spark.createDataFrame([("1.0,1.0",), ("5.0,5.0",), ("2.5,2.5",)],
                               "loc string")
    ctx = FilterContext(df)
    rect = compile_filter({"type": "spatial", "dimension": "loc",
                           "bound": {"type": "rectangular",
                                     "minCoords": [0, 0], "maxCoords": [3, 3]}}, ctx)
    assert df.filter(rect).count() == 2
    radius = compile_filter({"type": "spatial", "dimension": "loc",
                             "bound": {"type": "radius", "coords": [1, 1],
                                       "radius": 1.0}}, ctx)
    assert df.filter(radius).count() == 1


def test_unknown_filter_raises(foo):
    with pytest.raises(ValueError):
        apply(foo, {"type": "frobnicate", "dimension": "dim1"})


def test_bloomk_filter_binary_interop(spark, catalog):
    """BloomDimFilter with Druid's own serialized BloomKFilter (base64 of
    the Hive murmur3-64 block format, BloomKFilter.java:135-149 wire layout,
    :392-425 probe math): build → serialize → filter a query with it."""
    import base64

    from incubator_druid_spark import translate
    from incubator_druid_spark.functions.bloomk import BloomKFilter, murmur3_64

    # murmur3-64: deterministic, distinct, and matches the documented
    # signed-64 domain; empty input hashes differently from null
    h1, h2 = murmur3_64(b"purchase"), murmur3_64(b"view")
    assert h1 != h2 and -(1 << 63) <= h1 < (1 << 63)

    bf = BloomKFilter.for_entries(100)
    for v in ("purchase", "error"):
        bf.add_string(v)
    # self-consistency + serialization round-trip
    rt = BloomKFilter.deserialize(bf.serialize())
    assert rt.k == bf.k and rt.bits == bf.bits
    assert rt.test_string("purchase") and rt.test_string("error")
    assert not rt.test_string("view")  # 5% fpp, 2 entries → reliably absent

    b64 = base64.b64encode(bf.serialize()).decode()
    q = {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
         "dimensions": ["event_type"],
         "filter": {"type": "bloom", "dimension": "event_type",
                    "bloomKFilter": b64},
         "aggregations": [{"type": "count", "name": "cnt"}]}
    out = translate(q, spark, catalog).collect()
    assert {r["event_type"] for r in out} == {"purchase", "error"}


def test_bloomk_numeric_interop_golden(spark, catalog):
    """Druid builds filters over numeric columns via addLong/addFloat/
    addDouble (BloomKFilter.java:544-557 — Hive hash64(long) and
    floatToIntBits LE-byte hashing, NOT string hashing; ADVICE r1).  Golden
    filter generated by the real hive-storage-api BloomKFilter with
    addLong(42), addLong(-7), addFloat(1.5f), addDouble(2.75)."""
    from incubator_druid_spark import translate
    from incubator_druid_spark.filters.filters import (FilterContext,
                                                       compile_filter)
    from incubator_druid_spark.functions.bloomk import BloomKFilter

    # note: hive-storage-api >= 2.8 changed addInt to hash the int directly;
    # Druid's vendored copy keeps the LE-byte path (the comment at :544), so
    # the float golden emulates Druid via addBytes(intToByteArrayLE(bits))
    golden = ("BAAAABAAAEAAAAAAAAAAAAAAAgAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
              "AAAAAAAACAAAAAAAAAAAAAAAAAAAAAQAAAAAAAAAAAAAAAAAACABAAAAAAFA"
              "AgAAAAAkAAAAAAAAAAAAAAAAAAAABAAAQAAAAACAAAAAAAAAAAAABAgAAA==")
    bf = BloomKFilter.deserialize(golden)
    assert bf.test_long(42) and bf.test_long(-7) and not bf.test_long(43)
    assert bf.test_float(1.5) and not bf.test_float(1.6)
    assert bf.test_double(2.75) and not bf.test_double(2.76)
    # float/double paths hash DIFFERENT representations of the same number
    assert not bf.test_double(1.5) and not bf.test_float(2.75)

    # through the filter surface on a LONG column: the probe must dispatch
    # on the column type (string hashing would match nothing)
    df = spark.createDataFrame([(42,), (43,), (-7,)], "user_id long")
    ctx = FilterContext(df)
    pred = compile_filter({"type": "bloom", "dimension": "user_id",
                           "bloomKFilter": golden}, ctx)
    got = {r["user_id"] for r in df.filter(pred).collect()}
    assert got == {42, -7}
