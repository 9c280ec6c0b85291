"""Round-4 GroupByQueryRunnerTest tranche — nullable numeric dimensions,
expression virtual columns, lookup-rename extraction variants, order-limit
comparators, having-spec families, first/last over month granularity
(processing/src/test/java/org/apache/druid/query/groupby/
GroupByQueryRunnerTest.java; SQL-compatible null mode expectations).
Doubles compare at 1e-6 relative."""

import pytest

from incubator_druid_spark import translate

F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]
A2_TO_A4 = ["2011-04-02T00:00:00.000Z/2011-04-04T00:00:00.000Z"]
FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]


def gb(spark, cat, dims, aggs=None, granularity="day", intervals=None,
       **extra):
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": granularity, "intervals": intervals or F2T,
         "dimensions": dims,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"},
         ] if aggs is None else aggs}
    q.update(extra)
    return translate(q, spark, cat)


NULLABLE_EXPECT = [(None, 6), (10, 2), (20, 2), (40, 2), (50, 6)]


def test_group_by_on_nullable_long(spark, wiki_catalog):
    """testGroupByOnNullableLong:11007 — LONG dim with nulls, default
    (time, dims) ordering + bare limit: null sorts FIRST (sql mode)."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "longNumericNull",
               "outputName": "nullable", "outputType": "LONG"}],
             aggs=[{"type": "count", "name": "rows"}],
             granularity="all",
             limitSpec={"type": "default", "limit": 5}).collect()
    assert [(r["nullable"], r["rows"]) for r in out] == NULLABLE_EXPECT


def test_group_by_on_nullable_double(spark, wiki_catalog):
    """testGroupByOnNullableDouble:11048."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "doubleNumericNull",
               "outputName": "nullable", "outputType": "DOUBLE"}],
             aggs=[{"type": "count", "name": "rows"}],
             granularity="all",
             limitSpec={"type": "default", "limit": 5}).collect()
    assert [(r["nullable"], r["rows"]) for r in out] == [
        (None, 6), (10.0, 2), (20.0, 2), (40.0, 2), (50.0, 6)]


def test_group_by_on_nullable_float(spark, wiki_catalog):
    """testGroupByOnNullableFloat:11131."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "floatNumericNull",
               "outputName": "nullable", "outputType": "FLOAT"}],
             aggs=[{"type": "count", "name": "rows"}],
             granularity="all",
             limitSpec={"type": "default", "limit": 5}).collect()
    assert [(r["nullable"], r["rows"]) for r in out] == [
        (None, 6), (10.0, 2), (20.0, 2), (40.0, 2), (50.0, 6)]


def test_group_by_on_nullable_double_no_limit_pushdown(spark, wiki_catalog):
    """testGroupByOnNullableDoubleNoLimitPushdown:11090 — explicit asc
    limitSpec over the nullable dim; limit pushdown is a physical knob
    (Catalyst's business), the ordering contract is what's asserted."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "doubleNumericNull",
               "outputName": "nullable", "outputType": "DOUBLE"}],
             aggs=[{"type": "count", "name": "rows"}],
             granularity="all",
             limitSpec={"type": "default", "limit": 5, "columns": [
                 {"dimension": "nullable",
                  "direction": "ascending"}]}).collect()
    assert [(r["nullable"], r["rows"]) for r in out] == [
        (None, 6), (10.0, 2), (20.0, 2), (40.0, 2), (50.0, 6)]


def test_group_by_on_virtual_column(spark, wiki_catalog):
    """testGroupByOnVirtualColumn:11172 — LONG expression virtual column as
    the dim + a longSum over an expression referencing ANOTHER virtual
    column ('1 + two')."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "v", "outputName": "v",
               "outputType": "LONG"}],
             aggs=[{"type": "count", "name": "rows"},
                   {"type": "longSum", "name": "twosum",
                    "expression": "1 + two"}],
             granularity="all",
             limitSpec={"type": "default", "limit": 5},
             virtualColumns=[
                 {"type": "expression", "name": "v",
                  "expression": "qualityDouble * qualityLong",
                  "outputType": "LONG"},
                 {"type": "expression", "name": "two", "expression": "2"}],
             ).collect()
    assert [(r["v"], r["rows"], r["twosum"]) for r in out] == [
        (10000000, 2, 6), (12100000, 2, 6), (14400000, 2, 6),
        (16900000, 2, 6), (19600000, 6, 18)]


RENAME_MAP = {q: q + "0" for q in
              ["automotive", "business", "entertainment", "health",
               "mezzanine", "news", "premium", "technology", "travel"]}
RENAME_EXPECT = [
    ("2011-04-01", "automotive0", 1, 135), ("2011-04-01", "business0", 1, 118),
    ("2011-04-01", "entertainment0", 1, 158), ("2011-04-01", "health0", 1, 120),
    ("2011-04-01", "mezzanine0", 3, 2870), ("2011-04-01", "news0", 1, 121),
    ("2011-04-01", "premium0", 3, 2900), ("2011-04-01", "technology0", 1, 78),
    ("2011-04-01", "travel0", 1, 119),
    ("2011-04-02", "automotive0", 1, 147), ("2011-04-02", "business0", 1, 112),
    ("2011-04-02", "entertainment0", 1, 166), ("2011-04-02", "health0", 1, 113),
    ("2011-04-02", "mezzanine0", 3, 2447), ("2011-04-02", "news0", 1, 114),
    ("2011-04-02", "premium0", 3, 2505), ("2011-04-02", "technology0", 1, 97),
    ("2011-04-02", "travel0", 1, 126)]


@pytest.mark.parametrize("retain,injective,replace", [
    (False, True, None),     # testGroupByWithSimpleRename
    (True, False, None),     # testGroupByWithSimpleRenameRetainMissingNonInjective
    (True, True, None),      # testGroupByWithSimpleRenameRetainMissing
    (False, False, "MISSING"),  # testGroupByWithSimpleRenameAndMissingString
])
def test_group_by_with_simple_rename(spark, wiki_catalog, retain, injective,
                                     replace):
    """testGroupByWithSimpleRename* family — a full inline-map lookup
    extraction renames every quality; retain/replace/injective flags don't
    change the output when every key is present."""
    fn = {"type": "lookup",
          "lookup": {"type": "map", "map": RENAME_MAP,
                     "isOneToOne": injective},
          "retainMissingValue": retain}
    if replace is not None:
        fn["replaceMissingValueWith"] = replace
    out = gb(spark, wiki_catalog,
             [{"type": "extraction", "dimension": "quality",
               "outputName": "alias", "extractionFn": fn}]).collect()
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
                 for r in out)
    assert got == RENAME_EXPECT


def test_group_by_with_order_limit2(spark, wiki_catalog):
    """testGroupByWithOrderLimit2 — rows desc then alias desc under P1M
    granularity; re-run with limit 5 is the same head."""
    spec = {"type": "default", "columns": [
        {"dimension": "rows", "direction": "descending"},
        {"dimension": "alias", "direction": "descending"}]}
    expect = [("premium", 6, 4416), ("mezzanine", 6, 4420),
              ("travel", 2, 243), ("technology", 2, 177), ("news", 2, 221),
              ("health", 2, 216), ("entertainment", 2, 319),
              ("business", 2, 217), ("automotive", 2, 269)]

    def run(ls):
        return [(r["alias"], r["rows"], r["idx"]) for r in gb(
            spark, wiki_catalog,
            [{"type": "default", "dimension": "quality",
              "outputName": "alias"}],
            granularity={"type": "period", "period": "P1M"},
            intervals=A2_TO_A4, limitSpec=ls).collect()]

    assert run(spec) == expect
    assert run({**spec, "limit": 5}) == expect[:5]


def test_group_by_with_order_limit3(spark, wiki_catalog):
    """testGroupByWithOrderLimit3 — doubleSum metric ordering."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "alias"}],
             aggs=[{"type": "count", "name": "rows"},
                   {"type": "doubleSum", "name": "idx", "fieldName": "index"}],
             granularity={"type": "period", "period": "P1M"},
             intervals=A2_TO_A4,
             limitSpec={"type": "default", "columns": [
                 {"dimension": "idx", "direction": "descending"},
                 {"dimension": "alias", "direction": "descending"}]}).collect()
    got = [(r["alias"], r["rows"], r["idx"]) for r in out]
    expect = [("mezzanine", 6, 4423.6533203125),
              ("premium", 6, 4418.61865234375),
              ("entertainment", 2, 319.94403076171875),
              ("automotive", 2, 270.3977966308594),
              ("travel", 2, 243.65843200683594),
              ("news", 2, 222.20980834960938),
              ("business", 2, 218.7224884033203),
              ("health", 2, 216.97836303710938),
              ("technology", 2, 178.24917602539062)]
    assert [(a, r) for a, r, _ in got] == [(a, r) for a, r, _ in expect]
    for (_, _, g), (_, _, e) in zip(got, expect):
        assert g == pytest.approx(e, rel=1e-6)


def test_group_by_order_limit_numeric(spark, wiki_catalog):
    """testGroupByOrderLimitNumeric — NUMERIC comparator on both the metric
    and the (non-numeric) dimension; non-parsing strings fall back to
    lexicographic within the numeric comparator."""
    spec = {"type": "default", "columns": [
        {"dimension": "rows", "direction": "descending",
         "dimensionOrder": "numeric"},
        {"dimension": "alias", "direction": "ascending",
         "dimensionOrder": "numeric"}]}
    expect = [("mezzanine", 6, 4420), ("premium", 6, 4416),
              ("automotive", 2, 269), ("business", 2, 217),
              ("entertainment", 2, 319), ("health", 2, 216),
              ("news", 2, 221), ("technology", 2, 177), ("travel", 2, 243)]

    def run(ls):
        return [(r["alias"], r["rows"], r["idx"]) for r in gb(
            spark, wiki_catalog,
            [{"type": "default", "dimension": "quality",
              "outputName": "alias"}],
            granularity={"type": "period", "period": "P1M"},
            intervals=A2_TO_A4, limitSpec=ls).collect()]

    assert run(spec) == expect
    assert run({**spec, "limit": 5}) == expect[:5]


def test_having_spec(spark, wiki_catalog):
    """testHavingSpec — or(greaterThan rows 2, equalTo idx 217)."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "alias"}],
             granularity={"type": "period", "period": "P1M"},
             intervals=A2_TO_A4,
             having={"type": "or", "havingSpecs": [
                 {"type": "greaterThan", "aggregation": "rows", "value": 2},
                 {"type": "equalTo", "aggregation": "idx", "value": 217}]},
             ).collect()
    got = sorted((r["alias"], r["rows"], r["idx"]) for r in out)
    assert got == [("business", 2, 217), ("mezzanine", 6, 4420),
                   ("premium", 6, 4416)]


def test_dim_filter_having_spec(spark, wiki_catalog):
    """testDimFilterHavingSpec — a filter-type having over aggregate ALIASES
    (numeric bound on 'rows', selector on 'idx', selector on __time millis)
    with the full min/max agg family along for the ride."""
    millis_2011_04_01 = 1301616000000
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "alias"}],
             aggs=[{"type": "count", "name": "rows"},
                   {"type": "longSum", "name": "idx", "fieldName": "index"},
                   {"type": "longMin", "name": "longMinIndex", "fieldName": "index"},
                   {"type": "longMax", "name": "longMaxIndex", "fieldName": "index"},
                   {"type": "doubleMin", "name": "doubleMinIndex", "fieldName": "index"},
                   {"type": "doubleMax", "name": "doubleMaxIndex", "fieldName": "index"},
                   {"type": "floatMin", "name": "floatMinIndex", "fieldName": "index"},
                   {"type": "floatMax", "name": "floatMaxIndex", "fieldName": "index"}],
             granularity={"type": "period", "period": "P1M"},
             intervals=A2_TO_A4,
             having={"type": "filter", "filter": {"type": "and", "fields": [
                 {"type": "or", "fields": [
                     {"type": "bound", "dimension": "rows", "lower": "2",
                      "lowerStrict": True, "ordering": "numeric"},
                     {"type": "selector", "dimension": "idx", "value": "217"}]},
                 {"type": "selector", "dimension": "__time",
                  "value": str(millis_2011_04_01)}]}},
             ).collect()
    got = sorted((r["alias"], r["rows"], r["idx"], r["longMinIndex"],
                  r["longMaxIndex"]) for r in out)
    assert got == [("business", 2, 217, 105, 112),
                   ("mezzanine", 6, 4420, 107, 1193),
                   ("premium", 6, 4416, 122, 1321)]
    dmins = {r["alias"]: r["doubleMinIndex"] for r in out}
    assert dmins["business"] == pytest.approx(105.735462, rel=1e-6)
    assert dmins["mezzanine"] == pytest.approx(107.047773, rel=1e-6)
    assert dmins["premium"] == pytest.approx(122.141707, rel=1e-6)


def test_merged_post_agg_having_spec(spark, wiki_catalog):
    """testMergedPostAggHavingSpec — having over a POST-AGG name, both as
    arithmetic and expression post-aggs."""
    for post in (
        [{"type": "arithmetic", "name": "rows_times_10", "fn": "*",
          "fields": [{"type": "fieldAccess", "name": "rows", "fieldName": "rows"},
                     {"type": "constant", "name": "const", "value": 10}]}],
        [{"type": "expression", "name": "rows_times_10",
          "expression": "rows * 10.0"}],
    ):
        out = gb(spark, wiki_catalog,
                 [{"type": "default", "dimension": "quality",
                   "outputName": "alias"}],
                 granularity={"type": "period", "period": "P1M"},
                 intervals=A2_TO_A4,
                 postAggregations=post,
                 having={"type": "or", "havingSpecs": [
                     {"type": "greaterThan", "aggregation": "rows_times_10",
                      "value": 20},
                     {"type": "equalTo", "aggregation": "idx", "value": 217}]},
                 ).collect()
        got = sorted((r["alias"], r["rows"], r["idx"],
                      float(r["rows_times_10"])) for r in out)
        assert got == [("business", 2, 217, 20.0),
                       ("mezzanine", 6, 4420, 60.0),
                       ("premium", 6, 4416, 60.0)]


def test_group_by_with_first_last(spark, wiki_catalog):
    """testGroupByWithFirstLast — longFirst/longLast over index at MONTH
    granularity across the full interval."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "market",
               "outputName": "market"}],
             aggs=[{"type": "longFirst", "name": "first", "fieldName": "index"},
                   {"type": "longLast", "name": "last", "fieldName": "index"}],
             granularity="month", intervals=FULL).collect()
    got = sorted((str(r["__time"])[:10], r["market"], r["first"], r["last"])
                 for r in out)
    assert got == [
        ("2011-01-01", "spot", 100, 155),
        ("2011-01-01", "total_market", 1000, 1127),
        ("2011-01-01", "upfront", 800, 943),
        ("2011-02-01", "spot", 132, 114),
        ("2011-02-01", "total_market", 1203, 1292),
        ("2011-02-01", "upfront", 1667, 1101),
        ("2011-03-01", "spot", 153, 125),
        ("2011-03-01", "total_market", 1124, 1366),
        ("2011-03-01", "upfront", 1166, 1063),
        ("2011-04-01", "spot", 135, 120),
        ("2011-04-01", "total_market", 1314, 1029),
        ("2011-04-01", "upfront", 1447, 780)]


def test_group_by_with_no_result(spark, wiki_catalog):
    """testGroupByWithNoResult — an interval with no data yields ZERO rows
    (not null-group rows), even with first/last/cardinality aggs."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "market",
               "outputName": "market"}],
             aggs=[{"type": "count", "name": "rows"},
                   {"type": "longSum", "name": "idx", "fieldName": "index"},
                   {"type": "cardinality", "name": "card",
                    "fields": ["quality"], "byRow": False},
                   {"type": "longFirst", "name": "first", "fieldName": "index"},
                   {"type": "longLast", "name": "last", "fieldName": "index"}],
             intervals=["2020-04-02T00:00:00.000Z/2020-04-03T00:00:00.000Z"],
             ).collect()
    assert out == []


def test_group_by_with_sort_dims_first(spark, wiki_catalog):
    """testGroupByWithSortDimsFirst — context sortByDimsFirst reorders the
    default row ordering to (dims, time)."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "alias"}],
             context={"sortByDimsFirst": True}).collect()
    got = [(str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
           for r in out]
    assert got == [
        ("2011-04-01", "automotive", 1, 135), ("2011-04-02", "automotive", 1, 147),
        ("2011-04-01", "business", 1, 118), ("2011-04-02", "business", 1, 112),
        ("2011-04-01", "entertainment", 1, 158), ("2011-04-02", "entertainment", 1, 166),
        ("2011-04-01", "health", 1, 120), ("2011-04-02", "health", 1, 113),
        ("2011-04-01", "mezzanine", 3, 2870), ("2011-04-02", "mezzanine", 3, 2447),
        ("2011-04-01", "news", 1, 121), ("2011-04-02", "news", 1, 114),
        ("2011-04-01", "premium", 3, 2900), ("2011-04-02", "premium", 3, 2505),
        ("2011-04-01", "technology", 1, 78), ("2011-04-02", "technology", 1, 97),
        ("2011-04-01", "travel", 1, 119), ("2011-04-02", "travel", 1, 126)]
