"""Round-4 GroupByQueryRunnerTest tranche D — cross-day limit/orderBy merge
ordering (time-first compound comparator), limit-pushdown equivalents,
subtotals with order/limit/offset, LONG-dimension and renamed-dimension
subtotals, custom having over a double sum, first/last re-aggregated
through a subquery, virtual-column dims and inner-query virtual filters
(processing/src/test/java/org/apache/druid/query/groupby/
GroupByQueryRunnerTest.java).

Where the reference gates a case on engine internals (forceLimitPushDown
context, simulated two-segment merges) the RESULT contract is identical to
the plain query, which is what these ports assert."""

import pytest

from incubator_druid_spark import translate

F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]
FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]

ROWS_COUNT = {"type": "count", "name": "rows"}


def gb(spark, cat, **extra):
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": F2T,
         "aggregations": [ROWS_COUNT, {"type": "longSum", "name": "idx",
                                       "fieldName": "index"}]}
    q.update(extra)
    return translate(q, spark, cat).collect()


DAY1 = [("premium", 3, 2900), ("mezzanine", 3, 2870), ("entertainment", 1, 158),
        ("automotive", 1, 135), ("news", 1, 121), ("health", 1, 120),
        ("travel", 1, 119), ("business", 1, 118), ("technology", 1, 78)]
DAY2 = [("premium", 3, 2505), ("mezzanine", 3, 2447), ("entertainment", 1, 166),
        ("automotive", 1, 147), ("travel", 1, 126), ("news", 1, 114),
        ("health", 1, 113), ("business", 1, 112), ("technology", 1, 97)]


def test_merge_results_across_multiple_days_with_limit_and_order_by(
        spark, wiki_catalog):
    """testMergeResultsAcrossMultipleDaysWithLimitAndOrderBy — orderBy idx
    DESC with DAY granularity sorts time-first (DefaultLimitSpec
    .makeComparator), so day 1's 9 groups precede day 2's."""
    out = gb(spark, wiki_catalog,
             dimensions=[{"type": "default", "dimension": "quality",
                          "outputName": "alias"}],
             limitSpec={"type": "default", "limit": 14,
                        "columns": [{"dimension": "idx",
                                     "direction": "descending"}]})
    exp = ([("2011-04-01", a, r, i) for a, r, i in DAY1]
           + [("2011-04-02", a, r, i) for a, r, i in DAY2[:5]])
    assert [(str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
            for r in out] == exp


def test_merge_results_with_limit_push_down_sort_by_agg(spark, wiki_catalog):
    """testMergeResultsWithLimitPushDownSortByAgg — ALL granularity over two
    days, idx DESC limit 5; forceLimitPushDown yields the same merged
    result as the plain query."""
    out = gb(spark, wiki_catalog, granularity="all",
             intervals=["2011-04-02T00:00:00.000Z/2011-04-04T00:00:00.000Z"],
             dimensions=[{"type": "default", "dimension": "quality",
                          "outputName": "alias"}],
             limitSpec={"type": "default", "limit": 5,
                        "columns": [{"dimension": "idx",
                                     "direction": "descending"}]})
    assert [(r["alias"], r["rows"], r["idx"]) for r in out] == [
        ("mezzanine", 6, 4420), ("premium", 6, 4416),
        ("entertainment", 2, 319), ("automotive", 2, 269),
        ("travel", 2, 243)]


SUBTOTAL_DIMS = [{"type": "default", "dimension": "quality",
                  "outputName": "alias"},
                 {"type": "default", "dimension": "market",
                  "outputName": "market"}]


def test_groupby_subtotals_with_order_limit(spark, wiki_catalog):
    """testGroupByWithSubtotalsSpecWithOrderLimit — limit 3 ordered by
    (idx, alias, market) across all three subtotal groupings."""
    out = gb(spark, wiki_catalog, dimensions=SUBTOTAL_DIMS,
             subtotalsSpec=[["alias"], ["market"], []],
             limitSpec={"type": "default", "limit": 3,
                        "columns": ["idx", "alias", "market"]})
    assert [(str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
            for r in out] == [("2011-04-01", "technology", 1, 78),
                              ("2011-04-01", "business", 1, 118),
                              ("2011-04-01", "travel", 1, 119)]


def test_groupby_subtotals_with_order_limit_and_offset(spark, wiki_catalog):
    """testGroupByWithSubtotalsSpecWithOrderLimitAndOffset — offset 1
    limit 2 over the same ordering."""
    out = gb(spark, wiki_catalog, dimensions=SUBTOTAL_DIMS,
             subtotalsSpec=[["alias"], ["market"], []],
             limitSpec={"type": "default", "limit": 2, "offset": 1,
                        "columns": ["idx", "alias", "market"]})
    assert [(str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
            for r in out] == [("2011-04-01", "business", 1, 118),
                              ("2011-04-01", "travel", 1, 119)]


def test_groupby_subtotals_with_long_dimension_column(spark, wiki_catalog):
    """testGroupByWithSubtotalsSpecWithLongDimensionColumn — a LONG-typed
    dimension through subtotals [[ql],[market2],[]] keeps its type; value
    set asserted order-insensitively."""
    out = gb(spark, wiki_catalog,
             dimensions=[{"type": "default", "dimension": "qualityLong",
                          "outputName": "ql", "outputType": "LONG"},
                         {"type": "default", "dimension": "market",
                          "outputName": "market2"}],
             subtotalsSpec=[["ql"], ["market2"], []])
    got = [(str(r["__time"])[:10], r["ql"], r["market2"], r["rows"],
            r["idx"]) for r in out]
    ql_day1 = [(1000, 135), (1100, 118), (1200, 158), (1300, 120),
               (1400, 2870), (1500, 121), (1600, 2900), (1700, 78),
               (1800, 119)]
    ql_day2 = [(1000, 147), (1100, 112), (1200, 166), (1300, 113),
               (1400, 2447), (1500, 114), (1600, 2505), (1700, 97),
               (1800, 126)]
    mk_day1 = [("spot", 9, 1102), ("total_market", 2, 2836),
               ("upfront", 2, 2681)]
    mk_day2 = [("spot", 9, 1120), ("total_market", 2, 2514),
               ("upfront", 2, 2193)]
    exp = sorted(
        [("2011-04-01", ql, None, 3 if ql in (1400, 1600) else 1, idx)
         for ql, idx in ql_day1]
        + [("2011-04-02", ql, None, 3 if ql in (1400, 1600) else 1, idx)
           for ql, idx in ql_day2]
        + [("2011-04-01", None, mk, r_, idx) for mk, r_, idx in mk_day1]
        + [("2011-04-02", None, mk, r_, idx) for mk, r_, idx in mk_day2]
        + [("2011-04-01", None, None, 13, 6619),
           ("2011-04-02", None, None, 13, 5827)],
        key=lambda t: tuple((x is None, x) for x in t))
    got = sorted(got, key=lambda t: tuple((x is None, x) for x in t))
    assert got == exp


def test_groupby_subtotals_renamed_dimension_and_filter(spark, wiki_catalog):
    """testGroupByWithSubtotalsSpecWithRenamedDimensionAndFilter — a
    virtual column aliasing quality, filtered to automotive, subtotaled on
    the RENAMED output name.  (The reference's idxFloat reads its
    indexFloat metric column; this fixture carries index only, so floatSum
    reads index — same single-row values.)"""
    out = gb(spark, wiki_catalog,
             virtualColumns=[{"type": "expression", "name": "alias",
                              "expression": "quality",
                              "outputType": "STRING"}],
             dimensions=[{"type": "default", "dimension": "quality",
                          "outputName": "quality"},
                         {"type": "default", "dimension": "market",
                          "outputName": "market"},
                         {"type": "default", "dimension": "alias",
                          "outputName": "alias_renamed"}],
             filter={"type": "selector", "dimension": "alias",
                     "value": "automotive"},
             aggregations=[ROWS_COUNT,
                           {"type": "longSum", "name": "idx",
                            "fieldName": "index"},
                           {"type": "floatSum", "name": "idxFloat",
                            "fieldName": "index"},
                           {"type": "doubleSum", "name": "idxDouble",
                            "fieldName": "index"}],
             subtotalsSpec=[["alias_renamed"], []])
    got = sorted(((str(r["__time"])[:10], r["alias_renamed"], r["rows"],
                   r["idx"], round(r["idxDouble"], 4)) for r in out),
                 key=lambda t: tuple((x is None, x) for x in t))
    exp = sorted([
        ("2011-04-01", "automotive", 1, 135, round(135.88510131835938, 4)),
        ("2011-04-02", "automotive", 1, 147, round(147.42593, 4)),
        ("2011-04-01", None, 1, 135, round(135.88510131835938, 4)),
        ("2011-04-02", None, 1, 147, round(147.42593, 4)),
    ], key=lambda t: tuple((x is None, x) for x in t))
    assert got == exp
    for r in out:
        assert r["idxFloat"] == pytest.approx(r["idxDouble"], rel=1e-6)


def test_custom_aggregator_having_spec(spark, wiki_catalog):
    """testCustomAggregatorHavingSpec — OR(rows == 3, idxDouble > 135) over
    an exact double sum."""
    out = gb(spark, wiki_catalog,
             dimensions=[{"type": "default", "dimension": "quality",
                          "outputName": "alias"}],
             aggregations=[ROWS_COUNT, {"type": "doubleSum",
                                        "name": "idxDouble",
                                        "fieldName": "index"}],
             having={"type": "or", "havingSpecs": [
                 {"type": "equalTo", "aggregation": "rows", "value": 3},
                 {"type": "greaterThan", "aggregation": "idxDouble",
                  "value": 135.00}]})
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"],
                  round(r["idxDouble"], 6)) for r in out)
    assert got == [
        ("2011-04-01", "automotive", 1, 135.885094),
        ("2011-04-01", "entertainment", 1, 158.747224),
        ("2011-04-01", "mezzanine", 3, 2871.88669),
        ("2011-04-01", "premium", 3, 2900.798647),
        ("2011-04-02", "automotive", 1, 147.425935),
        ("2011-04-02", "entertainment", 1, 166.016049),
        ("2011-04-02", "mezzanine", 3, 2448.830613),
        ("2011-04-02", "premium", 3, 2506.415148)]


def test_subquery_with_first_last(spark, wiki_catalog):
    """testSubqueryWithFirstLast — longFirst/longLast per (day, market)
    re-aggregated to per-month first/last through a query datasource."""
    out = translate(
        {"queryType": "groupBy", "granularity": "month", "intervals": FULL,
         "dataSource": {"type": "query", "query": {
             "queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": FULL,
             "dimensions": [{"type": "default", "dimension": "market",
                             "outputName": "market"}],
             "aggregations": [
                 ROWS_COUNT,
                 {"type": "longFirst", "name": "innerfirst",
                  "fieldName": "index"},
                 {"type": "longLast", "name": "innerlast",
                  "fieldName": "index"}],
             "context": {"finalize": True}}},
         "dimensions": [],
         "aggregations": [
             {"type": "longFirst", "name": "first",
              "fieldName": "innerfirst"},
             {"type": "longLast", "name": "last", "fieldName": "innerlast"}]},
        spark, wiki_catalog).collect()
    assert [(str(r["__time"])[:10], r["first"], r["last"]) for r in out] == [
        ("2011-01-01", 100, 943), ("2011-02-01", 132, 1101),
        ("2011-03-01", 153, 1063), ("2011-04-01", 135, 780)]


def test_virtual_column_filter_on_inner_query(spark, wiki_catalog):
    """testVirtualColumnFilterOnInnerQuery — outer virtual column
    case_searched(idx > 1000, 1, 0) with a numeric bound v > 0 over an
    inner limited subquery; outer interval clips day 1 at 23:58."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": F2T,
             "dimensions": [{"type": "default", "dimension": "quality",
                             "outputName": "alias"}],
             "limitSpec": {"type": "default", "limit": 12,
                           "columns": [{"dimension": "alias",
                                        "direction": "descending"}]},
             "aggregations": [ROWS_COUNT, {"type": "longSum", "name": "idx",
                                           "fieldName": "index"}]}
    out = translate(
        {"queryType": "groupBy", "granularity": "day",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-01T23:58:00.000Z",
                       "2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "dataSource": {"type": "query", "query": inner},
         "dimensions": [{"type": "default", "dimension": "alias",
                         "outputName": "alias"}],
         "virtualColumns": [{"type": "expression", "name": "v",
                             "expression": "case_searched(idx > 1000, 1, 0)",
                             "outputType": "LONG"}],
         "filter": {"type": "bound", "dimension": "v", "lower": "0",
                    "lowerStrict": True, "ordering": "numeric"},
         "limitSpec": {"type": "default", "limit": 15,
                       "columns": [{"dimension": "alias",
                                    "direction": "descending"}]},
         "aggregations": [
             {"type": "longSum", "name": "rows", "fieldName": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "idx"}]},
        spark, wiki_catalog).collect()
    assert [(str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
            for r in out] == [("2011-04-01", "premium", 3, 2900),
                              ("2011-04-01", "mezzanine", 3, 2870),
                              ("2011-04-02", "premium", 3, 2505)]


def test_groupby_with_string_virtual_column(spark, wiki_catalog):
    """testGroupByWithStringVirtualColumnVectorizable — cast(quality,
    'STRING') as the grouping dimension."""
    out = gb(spark, wiki_catalog,
             virtualColumns=[{"type": "expression", "name": "vc",
                              "expression": "cast(quality, 'STRING')",
                              "outputType": "STRING"}],
             dimensions=[{"type": "default", "dimension": "vc",
                          "outputName": "alias"}])
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
                 for r in out)
    exp = sorted([("2011-04-01", a, r_, i) for a, r_, i in DAY1]
                 + [("2011-04-02", a, r_, i) for a, r_, i in DAY2])
    assert got == exp


def test_subquery_with_post_aggregators_and_having(spark, wiki_catalog):
    """testSubqueryWithPostAggregatorsAndHaving — inner post-agg
    (idx + 1000) gated by a having < 3800 (the reference uses a custom Java
    HavingSpec with exactly this predicate), re-aggregated outside with a
    second post-agg (+10000)."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": F2T,
             "dimensions": [{"type": "default", "dimension": "quality",
                             "outputName": "alias"}],
             "aggregations": [ROWS_COUNT,
                              {"type": "longSum", "name": "idx_subagg",
                               "fieldName": "index"}],
             "postAggregations": [
                 {"type": "arithmetic", "name": "idx_subpostagg", "fn": "+",
                  "fields": [{"type": "fieldAccess",
                              "fieldName": "idx_subagg"},
                             {"type": "constant", "value": 1000}]}],
             "having": {"type": "lessThan", "aggregation": "idx_subpostagg",
                        "value": 3800},
             "limitSpec": {"type": "default", "columns": ["alias"]}}
    out = translate(
        {"queryType": "groupBy", "granularity": "day", "intervals": F2T,
         "dataSource": {"type": "query", "query": inner},
         "dimensions": [{"type": "default", "dimension": "alias",
                         "outputName": "alias"}],
         "aggregations": [
             {"type": "longSum", "name": "rows", "fieldName": "rows"},
             {"type": "longSum", "name": "idx",
              "fieldName": "idx_subpostagg"}],
         "postAggregations": [
             {"type": "arithmetic", "name": "idx_post", "fn": "+",
              "fields": [{"type": "fieldAccess", "fieldName": "idx"},
                         {"type": "constant", "value": 10000}]}]},
        spark, wiki_catalog).collect()
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"],
                  r["idx_post"]) for r in out)
    d1 = [("automotive", 1135), ("business", 1118), ("entertainment", 1158),
          ("health", 1120), ("news", 1121), ("technology", 1078),
          ("travel", 1119)]
    d2 = [("automotive", 1147), ("business", 1112), ("entertainment", 1166),
          ("health", 1113), ("mezzanine", 3447), ("news", 1114),
          ("premium", 3505), ("technology", 1097), ("travel", 1126)]
    exp = sorted([("2011-04-01", a, 3 if i > 3000 else 1, i, i + 10000.0)
                  for a, i in d1]
                 + [("2011-04-02", a, 3 if i > 3000 else 1, i, i + 10000.0)
                    for a, i in d2])
    assert got == exp


def test_subquery_multiple_intervals_outer_limit_pushdown(spark,
                                                          wiki_catalog):
    """testSubqueryWithMultipleIntervalsInOuterQueryWithLimitPushDown —
    inner limit 12 under (time, alias DESC) compound ordering keeps all of
    day 1 plus day 2's top three; the outer multi-interval spec and its own
    DESC limit reproduce exactly that set.  (The reference's always-true
    javascript filter is the built-in `true` filter here; javascript is a
    deliberate non-goal.)"""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": F2T,
             "dimensions": [{"type": "default", "dimension": "quality",
                             "outputName": "alias"}],
             "filter": {"type": "true"},
             "limitSpec": {"type": "default", "limit": 12,
                           "columns": [{"dimension": "alias",
                                        "direction": "descending"}]},
             "aggregations": [ROWS_COUNT,
                              {"type": "longSum", "name": "idx",
                               "fieldName": "index"},
                              {"type": "longSum", "name": "indexMaxPlusTen",
                               "fieldName": "indexMaxPlusTen"}]}
    out = translate(
        {"queryType": "groupBy", "granularity": "day",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-01T23:58:00.000Z",
                       "2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "dataSource": {"type": "query", "query": inner},
         "dimensions": [{"type": "default", "dimension": "alias",
                         "outputName": "alias"}],
         "limitSpec": {"type": "default", "limit": 15,
                       "columns": [{"dimension": "alias",
                                    "direction": "descending"}]},
         "aggregations": [
             {"type": "longSum", "name": "rows", "fieldName": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "idx"}]},
        spark, wiki_catalog).collect()
    assert [(str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
            for r in out] == [
        ("2011-04-01", "travel", 1, 119),
        ("2011-04-01", "technology", 1, 78),
        ("2011-04-01", "premium", 3, 2900),
        ("2011-04-01", "news", 1, 121),
        ("2011-04-01", "mezzanine", 3, 2870),
        ("2011-04-01", "health", 1, 120),
        ("2011-04-01", "entertainment", 1, 158),
        ("2011-04-01", "business", 1, 118),
        ("2011-04-01", "automotive", 1, 135),
        ("2011-04-02", "travel", 1, 126),
        ("2011-04-02", "technology", 1, 97),
        ("2011-04-02", "premium", 3, 2505)]
