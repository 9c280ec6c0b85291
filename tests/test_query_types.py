"""End-to-end native query tests over the `foo` golden fixture and sf0.001
parquet — the CalciteQueryTest-style layer (SURVEY §5.1)."""

import datetime

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark import translate
from tests.conftest import rows


def ts(s):
    return datetime.datetime.fromisoformat(s)


# -- timeseries --------------------------------------------------------------

def test_timeseries_zero_fill(spark, foo_catalog):
    """Zero-fill follows the SEGMENT timeline: hours inside a covered day
    fill (rows at 00:00 only → 23 empty hour buckets), but days with no
    segment at all — 2000-01-04/05 here — produce NO buckets, matching the
    broker's interval-to-timeline condensation."""
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": "hour",
         "intervals": ["2000-01-02T00:00:00Z/2000-01-03T00:00:00Z"],
         "aggregations": [{"type": "longSum", "name": "cnt", "fieldName": "cnt"},
                          {"type": "doubleMax", "name": "m", "fieldName": "m2"}]}
    out = rows(translate(q, spark, foo_catalog))
    assert len(out) == 24  # 1 data hour + 23 empty buckets in the day segment
    by_time = {r[0]: r for r in out}
    # sums over an empty bucket are NULL in SQL-compatible mode
    # (TimeseriesQueryRunnerTest testTimeseriesWithNonExistentFilter —
    # defaultDoubleValue); legacy mode fills 0 (tested below)
    assert by_time[ts("2000-01-02 03:00:00")][1] is None
    assert by_time[ts("2000-01-02 03:00:00")][2] is None  # max: no identity
    assert by_time[ts("2000-01-02")][1] == 1
    legacy = translate({**q, "context": {"useDefaultValueForNull": True}},
                       spark, foo_catalog)
    by_time_l = {r[0]: r for r in rows(legacy)}
    assert by_time_l[ts("2000-01-02 03:00:00")][1] == 0
    # no-segment days yield no buckets
    day_q = {**q, "granularity": "day",
             "intervals": ["2000-01-01T00:00:00Z/2000-01-06T00:00:00Z"]}
    assert len(rows(translate(day_q, spark, foo_catalog))) == 3


def test_timeseries_all_with_post_agg(spark, foo_catalog):
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": "all",
         "aggregations": [{"type": "doubleSum", "name": "sm", "fieldName": "m2"},
                          {"type": "count", "name": "cnt"}],
         "postAggregations": [{"type": "arithmetic", "name": "mean", "fn": "/",
                               "fields": [{"type": "fieldAccess", "fieldName": "sm"},
                                          {"type": "fieldAccess", "fieldName": "cnt"}]}]}
    r = translate(q, spark, foo_catalog).first()
    assert r["sm"] == 21.0 and r["cnt"] == 6 and r["mean"] == 3.5


def test_timeseries_descending_limit(spark, foo_catalog):
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": "year",
         "descending": True, "limit": 1,
         "intervals": ["2000-01-01T00:00:00Z/2002-01-01T00:00:00Z"],
         "aggregations": [{"type": "longSum", "name": "cnt", "fieldName": "cnt"}]}
    r = translate(q, spark, foo_catalog).collect()
    assert len(r) == 1 and r[0]["__time"] == ts("2001-01-01")


# -- groupBy -----------------------------------------------------------------

def test_groupby_mvd_explodes(spark, foo_catalog):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": ["dim2"],
         "aggregations": [{"type": "longSum", "name": "cnt", "fieldName": "cnt"}]}
    out = rows(translate(q, spark, foo_catalog), "dim2", "cnt")
    # 'a' appears in two rows; [] and null both group as null
    assert (("a", 2)) in out
    assert (("abc", 1)) in out
    assert (("", 1)) in out
    assert ((None, 2)) in out


def test_groupby_extraction_dimension(spark, foo_catalog):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": [{"type": "extraction", "dimension": "dim1",
                         "outputName": "d", "extractionFn": {"type": "strlen"}}],
         "aggregations": [{"type": "count", "name": "cnt"}]}
    out = dict(rows(translate(q, spark, foo_catalog), "d", "cnt"))
    assert out == {"0": 1, "1": 2, "3": 2, "4": 1}


def test_groupby_filtered_dimension_spec(spark, foo_catalog):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": [{"type": "listFiltered",
                         "delegate": {"type": "default", "dimension": "dim3",
                                      "outputName": "d3"},
                         "values": ["b", "d"]}],
         "aggregations": [{"type": "count", "name": "cnt"}]}
    out = dict(rows(translate(q, spark, foo_catalog), "d3", "cnt"))
    assert out["b"] == 2 and out["d"] == 1


def test_groupby_having_and_limit(spark, foo_catalog):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": ["dim1"],
         "aggregations": [{"type": "doubleSum", "name": "sm", "fieldName": "m2"}],
         "having": {"type": "greaterThan", "aggregation": "sm", "value": 2.0},
         "limitSpec": {"type": "default",
                       "columns": [{"dimension": "sm", "direction": "descending"}],
                       "limit": 2}}
    out = translate(q, spark, foo_catalog).collect()
    assert [r["dim1"] for r in out] == ["abc", "def"]


def test_groupby_subtotals_grouping_sets(spark, foo_catalog):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": ["dim1", "dim2"],
         "subtotalsSpec": [["dim1"], []],
         "aggregations": [{"type": "longSum", "name": "cnt", "fieldName": "cnt"}]}
    out = rows(translate(q, spark, foo_catalog), "dim1", "dim2", "cnt")
    assert (None, None, 6) in out       # grand total
    assert ("abc", None, 1) in out      # per-dim1 subtotal


def test_groupby_time_bucket(spark, foo_catalog):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "year",
         "dimensions": [],
         "aggregations": [{"type": "longSum", "name": "cnt", "fieldName": "cnt"}]}
    out = rows(translate(q, spark, foo_catalog), "__time", "cnt")
    assert out == [(ts("2000-01-01"), 3), (ts("2001-01-01"), 3)]


# -- topN --------------------------------------------------------------------

def test_topn_numeric_and_inverted(spark, foo_catalog):
    base = {"queryType": "topN", "dataSource": "foo", "granularity": "all",
            "dimension": "dim1", "threshold": 2,
            "aggregations": [{"type": "doubleSum", "name": "sm", "fieldName": "m2"}]}
    out = translate({**base, "metric": "sm"}, spark, foo_catalog).collect()
    assert [r["dim1"] for r in out] == ["abc", "def"]
    inv = translate({**base, "metric": {"type": "inverted", "metric": "sm"}},
                    spark, foo_catalog).collect()
    assert [r["dim1"] for r in inv] == ["", "10.1"]


def test_topn_dimension_ordering(spark, foo_catalog):
    q = {"queryType": "topN", "dataSource": "foo", "granularity": "all",
         "dimension": "dim1", "threshold": 3,
         "metric": {"type": "dimension", "ordering": "lexicographic"},
         "aggregations": [{"type": "count", "name": "cnt"}]}
    out = translate(q, spark, foo_catalog).collect()
    assert [r["dim1"] for r in out] == ["", "1", "10.1"]


def test_topn_per_time_bucket(spark, foo_catalog):
    q = {"queryType": "topN", "dataSource": "foo", "granularity": "year",
         "dimension": "dim1", "threshold": 1, "metric": "sm",
         "intervals": ["2000-01-01T00:00:00Z/2002-01-01T00:00:00Z"],
         "aggregations": [{"type": "doubleSum", "name": "sm", "fieldName": "m2"}]}
    out = rows(translate(q, spark, foo_catalog), "__time", "dim1")
    assert out == [(ts("2000-01-01"), "2"), (ts("2001-01-01"), "abc")]


# -- scan / search / metadata ------------------------------------------------

def test_scan_order_offset_limit(spark, foo_catalog):
    q = {"queryType": "scan", "dataSource": "foo", "columns": ["__time", "dim1"],
         "order": "descending", "offset": 1, "limit": 2}
    out = translate(q, spark, foo_catalog).collect()
    assert [r["dim1"] for r in out] == ["def", "1"]


def test_search_query(spark, foo_catalog):
    q = {"queryType": "search", "dataSource": "foo",
         "searchDimensions": ["dim1", "dim2"],
         "query": {"type": "insensitive_contains", "value": "ab"}}
    out = rows(translate(q, spark, foo_catalog), "dimension", "value", "count")
    assert ("dim1", "abc", 1) in out
    assert ("dim2", "abc", 1) in out  # MVD values searched element-wise


def test_time_boundary(spark, foo_catalog):
    r = translate({"queryType": "timeBoundary", "dataSource": "foo"},
                  spark, foo_catalog).first()
    assert r["minTime"] == ts("2000-01-01") and r["maxTime"] == ts("2001-01-03")
    r2 = translate({"queryType": "timeBoundary", "dataSource": "foo",
                    "bound": "maxTime"}, spark, foo_catalog).first()
    assert r2["maxTime"] == ts("2001-01-03")


def test_segment_metadata(spark, foo_catalog):
    out = translate({"queryType": "segmentMetadata", "dataSource": "foo"},
                    spark, foo_catalog)
    m = {r["column"]: r for r in out.collect()}
    assert m["dim2"]["hasMultipleValues"] is True
    assert m["dim2"]["type"] == "STRING_ARRAY"
    assert m["m2"]["type"] == "DOUBLE"
    assert m["dim1"]["cardinality"] == 6
    assert m["cnt"]["numRows"] == 6


# -- datasources -------------------------------------------------------------

def test_join_lookup_datasource(spark, foo_catalog):
    q = {"queryType": "groupBy", "granularity": "all",
         "dataSource": {"type": "join", "left": "foo",
                        "right": {"type": "lookup", "lookup": "lookyloo"},
                        "rightPrefix": "j0.",
                        "condition": "dim1 == \"j0.k\"", "joinType": "INNER"},
         "dimensions": [{"type": "default", "dimension": "j0.v",
                         "outputName": "v"}],
         "aggregations": [{"type": "count", "name": "cnt"}]}
    out = dict(rows(translate(q, spark, foo_catalog), "v", "cnt"))
    assert out == {"xabc": 1}


def test_join_left_filter(spark, foo_catalog):
    """JoinDataSource.leftFilter — applied to the left base table BEFORE the
    join (broker-side pushdown in the reference)."""
    q = {"queryType": "groupBy", "granularity": "all",
         "dataSource": {"type": "join", "left": "foo",
                        "right": {"type": "lookup", "lookup": "lookyloo"},
                        "rightPrefix": "j0.",
                        "condition": "dim1 == \"j0.k\"", "joinType": "LEFT",
                        "leftFilter": {"type": "bound", "dimension": "m2",
                                       "lower": "5", "ordering": "numeric"}},
         "dimensions": ["dim1"],
         "aggregations": [{"type": "count", "name": "cnt"}]}
    out = dict(rows(translate(q, spark, foo_catalog), "dim1", "cnt"))
    assert out == {"def": 1, "abc": 1}  # m2 >= 5 rows only, left-join kept


def test_inline_datasource(spark, foo_catalog):
    q = {"queryType": "scan",
         "dataSource": {"type": "inline",
                        "columnNames": ["k", "n"],
                        "rows": [["a", 1], ["b", 2]]},
         "columns": ["k", "n"]}
    assert translate(q, spark, foo_catalog).count() == 2


def test_error_surfaces_are_clean(spark, foo_catalog):
    """Malformed queries raise ValueError/KeyError with a pointed message,
    never a raw Spark stack — the QueryResource 400-vs-500 contract."""
    cases = [
        {"queryType": "nope", "dataSource": "foo"},
        {"queryType": "select", "dataSource": "foo"},
        {"queryType": "scan", "dataSource": "no_such_table"},
        {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": [], "aggregations": [{"type": "mystery", "name": "x"}]},
        {"queryType": "timeseries", "dataSource": "foo", "granularity": "all",
         "filter": {"type": "wat", "dimension": "dim1"},
         "aggregations": [{"type": "count", "name": "c"}]},
        {"queryType": "timeseries", "dataSource": {"type": "bogus"},
         "granularity": "all",
         "aggregations": [{"type": "count", "name": "c"}]},
    ]
    for q in cases:
        with pytest.raises((ValueError, KeyError)) as ei:
            translate(q, spark, foo_catalog)
        assert len(str(ei.value)) < 500  # a message, not a stack dump


def test_legacy_null_mode(spark, foo_catalog):
    """NullHandling.java:67-118 — context.useDefaultValueForNull=true reads
    null strings as '' and null numerics as 0 (replaceWithDefault)."""
    ds = {"type": "inline", "columnNames": ["k", "n"],
          "rows": [["a", 1.0], [None, None], ["b", 3.0]]}
    base = {"queryType": "groupBy", "dataSource": ds, "granularity": "all",
            "dimensions": ["k"],
            "aggregations": [{"type": "doubleSum", "name": "s", "fieldName": "n"}]}
    got = dict(rows(translate(base, spark, foo_catalog), "k", "s"))
    assert None in got and got[None] is None      # SQL-compatible default
    legacy = {**base, "context": {"useDefaultValueForNull": True}}
    got2 = dict(rows(translate(legacy, spark, foo_catalog), "k", "s"))
    assert got2[""] == 0.0 and None not in got2   # '' group, 0-sum


def test_query_datasource_nesting(spark, foo_catalog):
    inner = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
             "dimensions": ["dim1"],
             "aggregations": [{"type": "doubleSum", "name": "sm", "fieldName": "m2"}]}
    outer = {"queryType": "timeseries", "granularity": "all",
             "dataSource": {"type": "query", "query": inner},
             "aggregations": [{"type": "doubleMax", "name": "mx", "fieldName": "sm"},
                              {"type": "count", "name": "groups"}]}
    r = translate(outer, spark, foo_catalog).first()
    assert r["mx"] == 6.0 and r["groups"] == 6


def test_subtotals_with_grouping_aggregator(spark, foo_catalog):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": ["dim1"],
         "subtotalsSpec": [["dim1"], []],
         "aggregations": [{"type": "count", "name": "cnt"},
                          {"type": "grouping", "name": "g",
                           "groupings": ["dim1"]}]}
    out = rows(translate(q, spark, foo_catalog), "dim1", "cnt", "g")
    assert (None, 6, 1) in out          # grand-total branch: dim1 missing → bit set
    assert ("abc", 1, 0) in out         # per-dim branch


def test_timeseries_grand_total(spark, foo_catalog):
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": "year",
         "intervals": ["2000-01-01T00:00:00Z/2002-01-01T00:00:00Z"],
         "context": {"grandTotal": True},
         "aggregations": [{"type": "doubleSum", "name": "s", "fieldName": "m2"}]}
    out = translate(q, spark, foo_catalog).collect()
    totals = [r for r in out if r["__time"] is None]
    assert len(totals) == 1 and totals[0]["s"] == 21.0
    assert len(out) == 3


def test_topn_previous_stop_pagination(spark, foo_catalog):
    q = {"queryType": "topN", "dataSource": "foo", "granularity": "all",
         "dimension": "dim1", "threshold": 2,
         "metric": {"type": "dimension", "ordering": "lexicographic",
                    "previousStop": "1"},
         "aggregations": [{"type": "count", "name": "cnt"}]}
    out = translate(q, spark, foo_catalog).collect()
    assert [r["dim1"] for r in out] == ["10.1", "2"]


# -- lookup dimension spec ---------------------------------------------------

def test_lookup_dimension_spec_inline(spark, foo_catalog):
    """LookupDimensionSpec.java:140-159 — inline LookupExtractor, the three
    missing-value modes (drop → null group, retain, replace)."""
    base = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
            "intervals": ["2000-01-01T00:00:00Z/2002-01-01T00:00:00Z"],
            "aggregations": [{"type": "longSum", "name": "cnt",
                              "fieldName": "cnt"}]}
    lk = {"type": "map", "map": {"abc": "xabc", "def": "xdef"}}
    # drop: misses → null
    q = {**base, "dimensions": [{"type": "lookup", "dimension": "dim1",
                                 "outputName": "v", "lookup": lk}]}
    out = {r["v"]: r["cnt"] for r in translate(q, spark, foo_catalog).collect()}
    assert out == {None: 4, "xabc": 1, "xdef": 1}
    # retainMissingValue: misses keep the source value
    q = {**base, "dimensions": [{"type": "lookup", "dimension": "dim1",
                                 "outputName": "v", "lookup": lk,
                                 "retainMissingValue": True}]}
    out = {r["v"]: r["cnt"] for r in translate(q, spark, foo_catalog).collect()}
    assert out == {"": 1, "10.1": 1, "2": 1, "1": 1, "xabc": 1, "xdef": 1}
    # replaceMissingValueWith
    q = {**base, "dimensions": [{"type": "lookup", "dimension": "dim1",
                                 "outputName": "v", "lookup": lk,
                                 "replaceMissingValueWith": "MISSING"}]}
    out = {r["v"]: r["cnt"] for r in translate(q, spark, foo_catalog).collect()}
    assert out == {"MISSING": 4, "xabc": 1, "xdef": 1}


def test_lookup_dimension_spec_registered_and_mvd(spark, foo_catalog):
    """Registered-name form (`name` ↔ `lookup` mutually exclusive,
    LookupDimensionSpec.java:90-93) + per-element application over an MVD."""
    base = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
            "intervals": ["2000-01-01T00:00:00Z/2002-01-01T00:00:00Z"],
            "aggregations": [{"type": "count", "name": "rows"}]}
    q = {**base, "dimensions": [{"type": "lookup", "dimension": "dim1",
                                 "outputName": "v", "name": "lookyloo"}]}
    out = {r["v"]: r["rows"] for r in translate(q, spark, foo_catalog).collect()}
    assert out == {None: 5, "xabc": 1}
    # MVD: dim2 explodes, lookup applied per element with retain
    q = {**base, "dimensions": [{"type": "lookup", "dimension": "dim2",
                                 "outputName": "v", "name": "lookyloo",
                                 "retainMissingValue": True}]}
    out = {r["v"]: r["rows"] for r in translate(q, spark, foo_catalog).collect()}
    # dim2 rows: [a], [], [''], [a], [abc], NULL → xa×2, ''×1, xabc×1,
    # empty-array row → null group, source-NULL row → null group
    assert out == {"xa": 2, "": 1, "xabc": 1, None: 2}
    # topN through the same spec type
    q2 = {"queryType": "topN", "dataSource": "foo", "granularity": "all",
          "intervals": ["2000-01-01T00:00:00Z/2002-01-01T00:00:00Z"],
          "dimension": {"type": "lookup", "dimension": "dim1",
                        "outputName": "v", "name": "lookyloo",
                        "replaceMissingValueWith": "other"},
          "metric": "rows", "threshold": 2,
          "aggregations": [{"type": "count", "name": "rows"}]}
    out2 = [(r["v"], r["rows"])
            for r in translate(q2, spark, foo_catalog).collect()]
    assert out2 == [("other", 5), ("xabc", 1)]
    # name and lookup are mutually exclusive
    bad = {**base, "dimensions": [{"type": "lookup", "dimension": "dim1",
                                   "outputName": "v", "name": "lookyloo",
                                   "lookup": {"type": "map", "map": {}}}]}
    with pytest.raises(ValueError, match="mutually exclusive|exactly one"):
        translate(bad, spark, foo_catalog)
