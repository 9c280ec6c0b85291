"""Round-6 GroupByQueryRunnerTest tranche — grouping/filtering COMPLEX
columns, overall-limit semantics, the limit-pushdown sort families, and
hyperUnique re-aggregation through a subquery
(processing/src/test/java/org/apache/druid/query/groupby/
GroupByQueryRunnerTest.java).

Not ported, with reasons:
  * testBySegmentResults* (4) — the per-segment response envelope is a
    broker↔historical protocol detail (see the topN tranche note).
  * testGroupByMaxOnDiskStorage/MaxRows/Timeout/NotEnoughDictionarySpace/
    NotEnoughDiskSpace ContextOverride (6) — spill/dictionary budget knobs
    of the reference's off-heap engine; Tungsten manages its own spill and
    has no equivalent ceiling to trip.
  * testSubqueryWithOuter(Dim)JavascriptAggregators — the engine's
    documented javascript refusal (expressionLambda hint).
"""

import pytest

from incubator_druid_spark import translate

F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]
FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]


def gb(spark, cat, **extra):
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": "all", "intervals": F2T,
         "aggregations": [{"type": "count", "name": "rows"},
                          {"type": "longSum", "name": "idx",
                           "fieldName": "index"}]}
    q.update(extra)
    return translate(q, spark, cat).collect()


def test_group_by_complex_column(spark, wiki_rollup_catalog):
    """testGroupByComplexColumn — grouping AND filtering on a COMPLEX
    column both read the null selector: one null group holding every row."""
    out = translate(
        {"queryType": "groupBy", "dataSource": "wiki_rollup",
         "granularity": "all", "intervals": F2T,
         "dimensions": ["quality_uniques"],
         "filter": {"type": "selector", "dimension": "quality_uniques",
                    "value": None},
         "aggregations": [
             {"type": "longSum", "name": "rows", "fieldName": "rows_rolled"},
             {"type": "longSum", "name": "idx", "fieldName": "index"}]},
        spark, wiki_rollup_catalog).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["quality_uniques"], r["rows"], r["idx"]) == (None, 26, 12446)


def test_group_by_cardinality_agg_on_hyper_unique(spark, wiki_rollup_catalog):
    """testGroupByCardinalityAggOnHyperUnique — cardinality over the
    COMPLEX column is 0.0; hyperUnique merges the stored state (exact
    upgrade vs the 9.0198 estimate)."""
    out = translate(
        {"queryType": "groupBy", "dataSource": "wiki_rollup",
         "granularity": "all", "intervals": F2T,
         "aggregations": [
             {"type": "longSum", "name": "rows", "fieldName": "rows_rolled"},
             {"type": "cardinality", "name": "cardinality",
              "fields": ["quality_uniques"], "byRow": False},
             {"type": "hyperUnique", "name": "hyperUnique",
              "fieldName": "quality_uniques"}]},
        spark, wiki_rollup_catalog).collect()
    r = out[0]
    assert (r["rows"], r["cardinality"], round(r["hyperUnique"])) \
        == (26, 0.0, 9)


def test_limit_per_grouping_is_overall(spark, wiki_catalog):
    """testLimitPerGrouping — a limitSpec limit applies to the OVERALL
    result, not per granularity bucket: the reference asserts row 1 is
    (day1, spot, 9) and row 2 is NOT (day2, spot, 9) — with a granular
    query the row timestamp orders first (DefaultLimitSpec.makeComparator
    timeOrdering.compound), so day1's total_market follows."""
    out = gb(spark, wiki_catalog, granularity="day",
             dimensions=["market"],
             aggregations=[{"type": "count", "name": "rows"}],
             limitSpec={"type": "default", "limit": 2,
                        "columns": [{"dimension": "rows",
                                     "direction": "descending"}]})
    got = [(str(r["__time"])[:10], r["market"], r["rows"]) for r in out]
    assert got[0] == ("2011-04-01", "spot", 9)
    assert got[1] != ("2011-04-02", "spot", 9)
    assert got[1] == ("2011-04-01", "total_market", 2)


def test_force_limit_push_down_with_having_superset(spark, wiki_catalog):
    """testRejectForceLimitPushDownWithHaving — the reference REFUSES
    (cannot force limit push down with a having spec); Catalyst plans the
    having filter before TakeOrderedAndProject, so the combination just
    works (documented superset)."""
    out = gb(spark, wiki_catalog, intervals=FULL,
             dimensions=[{"type": "default", "dimension": "market",
                          "outputName": "marketalias"}],
             aggregations=[{"type": "count", "name": "rows"}],
             having={"type": "greaterThan", "aggregation": "rows",
                     "value": 10},
             context={"forceLimitPushDown": True},
             limitSpec={"type": "default", "limit": 2,
                        "columns": [{"dimension": "marketalias",
                                     "direction": "descending"}]})
    assert [(r["marketalias"], r["rows"]) for r in out] == [
        ("upfront", 186), ("total_market", 186)]


def test_limit_push_down_sort_by_post_agg_superset(spark, wiki_catalog):
    """testGroupByLimitPushDownPostAggNotSupported — the reference REFUSES
    limit pushdown when sorting by a post-aggregator; sorting by a
    post-agg column is a plain orderBy here (documented superset)."""
    out = gb(spark, wiki_catalog, intervals=FULL,
             dimensions=[{"type": "default", "dimension": "market",
                          "outputName": "marketalias"}],
             aggregations=[{"type": "count", "name": "rows"}],
             postAggregations=[{"type": "arithmetic", "name": "rows x 2",
                                "fn": "*",
                                "fields": [
                                    {"type": "fieldAccess",
                                     "fieldName": "rows"},
                                    {"type": "constant", "value": 2}]}],
             context={"forceLimitPushDown": True},
             limitSpec={"type": "default", "limit": 1,
                        "columns": [{"dimension": "rows x 2",
                                     "direction": "descending"}]})
    assert [(r["marketalias"], r["rows"], r["rows x 2"]) for r in out] == [
        ("spot", 837, 1674)]


def test_merge_results_limit_push_down_sort_by_dim_dim(spark, wiki_catalog):
    """testMergeResultsWithLimitPushDownSortByDimDim — two descending
    dimension sorts, limit 5."""
    out = gb(spark, wiki_catalog,
             intervals=["2011-04-02T00:00:00.000Z/2011-04-04T00:00:00.000Z"],
             dimensions=[{"type": "default", "dimension": "quality",
                          "outputName": "alias"}, "market"],
             limitSpec={"type": "default", "limit": 5,
                        "columns": [
                            {"dimension": "alias",
                             "direction": "descending"},
                            {"dimension": "market",
                             "direction": "descending"}]})
    got = [(r["alias"], r["market"], r["rows"], r["idx"]) for r in out]
    assert got == [("travel", "spot", 2, 243),
                   ("technology", "spot", 2, 177),
                   ("premium", "upfront", 2, 1817),
                   ("premium", "total_market", 2, 2342),
                   ("premium", "spot", 2, 257)]


def test_merge_results_limit_push_down_sort_by_dim_agg_dim(spark, wiki_catalog):
    """testMergeResultsWithLimitPushDownSortByDimAggDim — dim desc, agg
    desc, dim desc, limit 5."""
    out = gb(spark, wiki_catalog,
             intervals=["2011-04-02T00:00:00.000Z/2011-04-04T00:00:00.000Z"],
             dimensions=[{"type": "default", "dimension": "quality",
                          "outputName": "alias"}, "market"],
             limitSpec={"type": "default", "limit": 5,
                        "columns": [
                            {"dimension": "alias",
                             "direction": "descending"},
                            {"dimension": "idx",
                             "direction": "descending"},
                            {"dimension": "market",
                             "direction": "descending"}]})
    got = [(r["alias"], r["market"], r["rows"], r["idx"]) for r in out]
    assert got == [("travel", "spot", 2, 243),
                   ("technology", "spot", 2, 177),
                   ("premium", "total_market", 2, 2342),
                   ("premium", "upfront", 2, 1817),
                   ("premium", "spot", 2, 257)]


def test_merge_results_limit_push_down_sort_by_agg_with_offset(spark,
                                                               wiki_catalog):
    """testMergeResultsWithLimitPushDownSortByAggWithOffset — idx desc,
    offset 2 limit 3, merged across the two days."""
    out = gb(spark, wiki_catalog,
             intervals=["2011-04-02T00:00:00.000Z/2011-04-04T00:00:00.000Z"],
             dimensions=[{"type": "default", "dimension": "quality",
                          "outputName": "alias"}],
             limitSpec={"type": "default", "limit": 3, "offset": 2,
                        "columns": [{"dimension": "idx",
                                     "direction": "descending"}]})
    got = [(r["alias"], r["rows"], r["idx"]) for r in out]
    assert got == [("entertainment", 2, 319), ("automotive", 2, 269),
                   ("travel", 2, 243)]


def test_subquery_with_hyper_uniques_post_aggregator(spark,
                                                     wiki_rollup_catalog):
    """testSubqueryWithHyperUniquesPostAggregator — an inner global
    aggregate emits hyperUnique STATE through a fieldAccess post-agg
    (finalize=false storage contract); the outer query re-aggregates it
    and finalizes (exact upgrade: 9 vs 9.0198)."""
    out = translate(
        {"queryType": "groupBy", "granularity": "all", "intervals": F2T,
         "dataSource": {"type": "query", "query": {
             "queryType": "groupBy", "dataSource": "wiki_rollup",
             "granularity": "all", "intervals": F2T,
             "context": {"finalize": False},
             "aggregations": [
                 {"type": "longSum", "name": "rows",
                  "fieldName": "rows_rolled"},
                 {"type": "longSum", "name": "idx", "fieldName": "index"},
                 {"type": "hyperUnique", "name": "quality_uniques_inner",
                  "fieldName": "quality_uniques"}]}},
         "aggregations": [
             {"type": "longSum", "name": "rows", "fieldName": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "idx"},
             {"type": "hyperUnique", "name": "quality_uniques_outer",
              "fieldName": "quality_uniques_inner"}]},
        spark, wiki_rollup_catalog).collect()
    r = out[0]
    assert (r["rows"], r["idx"], round(r["quality_uniques_outer"])) \
        == (26, 12446, 9)


def test_group_by_subtotals_prefixes_with_virtual_dim(spark, wiki_catalog):
    """testGroupByWithSubtotalsSpecOfDimensionsPrefixes — subtotal lists
    that are prefixes of the dimension list, one dimension being a virtual
    column, day granularity."""
    out = translate(
        {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": F2T,
         "virtualColumns": [{"type": "expression", "name": "alias",
                             "expression": "quality",
                             "outputType": "STRING"}],
         "dimensions": [
             {"type": "default", "dimension": "market",
              "outputName": "market2"},
             {"type": "default", "dimension": "alias",
              "outputName": "alias2"}],
         "subtotalsSpec": [["market2"], []],
         "aggregations": [{"type": "count", "name": "rows"},
                          {"type": "longSum", "name": "idx",
                           "fieldName": "index"}]},
        spark, wiki_catalog).collect()
    got = {(str(r["__time"])[:10], r["market2"], r["alias2"],
            r["rows"], r["idx"]) for r in out}
    assert got == {
        ("2011-04-01", "spot", None, 9, 1102),
        ("2011-04-01", "total_market", None, 2, 2836),
        ("2011-04-01", "upfront", None, 2, 2681),
        ("2011-04-02", "spot", None, 9, 1120),
        ("2011-04-02", "total_market", None, 2, 2514),
        ("2011-04-02", "upfront", None, 2, 2193),
        ("2011-04-01", None, None, 13, 6619),
        ("2011-04-02", None, None, 13, 5827)}


def test_group_by_subtotals_with_order_limit_force_pushdown(spark,
                                                            wiki_catalog):
    """testGroupByWithSubtotalsSpecWithOrderLimitForcePushdown — subtotal
    lists under an ordered limit; the empty list contributes the per-day
    grand totals."""
    out = translate(
        {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": F2T,
         "dimensions": ["placement", "market"],
         "subtotalsSpec": [["placement"], ["market"], []],
         "aggregations": [{"type": "count", "name": "rows"},
                          {"type": "longSum", "name": "idx",
                           "fieldName": "index"}],
         "context": {"forceLimitPushDown": True},
         "limitSpec": {"type": "default", "limit": 25,
                       "columns": ["placement", "market"]}},
        spark, wiki_catalog).collect()
    got = {(str(r["__time"])[:10], r["placement"], r["market"],
            r["rows"], r["idx"]) for r in out}
    assert got == {
        ("2011-04-01", "preferred", None, 13, 6619),
        ("2011-04-02", "preferred", None, 13, 5827),
        ("2011-04-01", None, "spot", 9, 1102),
        ("2011-04-01", None, "total_market", 2, 2836),
        ("2011-04-01", None, "upfront", 2, 2681),
        ("2011-04-02", None, "spot", 9, 1120),
        ("2011-04-02", None, "total_market", 2, 2514),
        ("2011-04-02", None, "upfront", 2, 2193),
        ("2011-04-01", None, None, 13, 6619),
        ("2011-04-02", None, None, 13, 5827)}


def test_limit_push_down_long_dimension_not_in_limit_spec(spark,
                                                          wiki_catalog):
    """testGroupByLimitPushDownWithLongDimensionNotInLimitSpec — a LONG
    strlen-extraction dimension, empty ordering columns, limit 6: default
    ordering is the dimension ascending."""
    out = translate(
        {"queryType": "groupBy", "dataSource": "wiki", "granularity": "all",
         "intervals": FULL,
         "dimensions": [{"type": "extraction", "dimension": "quality",
                         "outputName": "qualityLen", "outputType": "LONG",
                         "extractionFn": {"type": "strlen"}}],
         "aggregations": [{"type": "count", "name": "rows"}],
         "context": {"forceLimitPushDown": True},
         "limitSpec": {"type": "default", "limit": 6, "columns": []}},
        spark, wiki_catalog).collect()
    got = [(r["qualityLen"], r["rows"]) for r in out]
    assert got == [(4, 93), (6, 186), (7, 279), (8, 93), (9, 279),
                   (10, 186)]


def test_merge_results_with_limit_push_down(spark, wiki_catalog):
    """testMergeResultsWithLimitPushDown — alias descending, limit 5,
    merged across two days at ALL granularity."""
    out = gb(spark, wiki_catalog,
             intervals=["2011-04-02T00:00:00.000Z/2011-04-04T00:00:00.000Z"],
             dimensions=[{"type": "default", "dimension": "quality",
                          "outputName": "alias"}],
             limitSpec={"type": "default", "limit": 5,
                        "columns": [{"dimension": "alias",
                                     "direction": "descending"}]})
    got = [(r["alias"], r["rows"], r["idx"]) for r in out]
    assert got == [("travel", 2, 243), ("technology", 2, 177),
                   ("premium", 6, 4416), ("news", 2, 221),
                   ("mezzanine", 6, 4420)]


def test_merge_results_across_days_order_by_math_expression(spark,
                                                            wiki_catalog):
    """testMergeResultsAcrossMultipleDaysWithLimitAndOrderByUsingMath
    Expressions — longSum over an expression virtual column, idx desc with
    the granular time-first ordering, limit 14.  The reference's
    expression reads indexMin, which equals index in its non-rolled test
    segment, so index substitutes here."""
    out = translate(
        {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": F2T,
         "virtualColumns": [{"type": "expression", "name": "expr",
                             "expression": "index * 2 + index / 10",
                             "outputType": "FLOAT"}],
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "alias"}],
         "aggregations": [{"type": "count", "name": "rows"},
                          {"type": "longSum", "name": "idx",
                           "fieldName": "expr"}],
         "limitSpec": {"type": "default", "limit": 14,
                       "columns": [{"dimension": "idx",
                                    "direction": "descending"}]}},
        spark, wiki_catalog).collect()
    got = [(str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
           for r in out]
    assert got == [
        ("2011-04-01", "premium", 3, 6090),
        ("2011-04-01", "mezzanine", 3, 6030),
        ("2011-04-01", "entertainment", 1, 333),
        ("2011-04-01", "automotive", 1, 285),
        ("2011-04-01", "news", 1, 255),
        ("2011-04-01", "health", 1, 252),
        ("2011-04-01", "travel", 1, 251),
        ("2011-04-01", "business", 1, 248),
        ("2011-04-01", "technology", 1, 165),
        ("2011-04-02", "premium", 3, 5262),
        ("2011-04-02", "mezzanine", 3, 5141),
        ("2011-04-02", "entertainment", 1, 348),
        ("2011-04-02", "automotive", 1, 309),
        ("2011-04-02", "travel", 1, 265)]


def test_group_by_subtotals_spec_general(spark, wiki_catalog):
    """testGroupByWithSubtotalsSpecGeneral — subtotal lists over a 3-dim
    query (one a virtual alias of quality) that are NOT prefixes, plus a
    fieldAccess post-agg carried into every subtotal row; day granularity.
    Expected values are the reference's per-day quality/market totals."""
    out = translate(
        {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": F2T,
         "virtualColumns": [{"type": "expression", "name": "alias",
                             "expression": "quality",
                             "outputType": "STRING"}],
         "dimensions": [
             {"type": "default", "dimension": "quality",
              "outputName": "quality2"},
             {"type": "default", "dimension": "market",
              "outputName": "market2"},
             {"type": "default", "dimension": "alias",
              "outputName": "alias2"}],
         "subtotalsSpec": [["alias2"], ["market2"], []],
         "aggregations": [{"type": "count", "name": "rows"},
                          {"type": "longSum", "name": "idx",
                           "fieldName": "index"}],
         "postAggregations": [{"type": "fieldAccess", "name": "idxPostAgg",
                               "fieldName": "idx"}]},
        spark, wiki_catalog).collect()
    got = {(str(r["__time"])[:10], r["quality2"], r["market2"], r["alias2"],
            r["rows"], r["idx"]) for r in out}
    day1 = {"automotive": (1, 135), "business": (1, 118),
            "entertainment": (1, 158), "health": (1, 120),
            "mezzanine": (3, 2870), "news": (1, 121),
            "premium": (3, 2900), "technology": (1, 78),
            "travel": (1, 119)}
    day2 = {"automotive": (1, 147), "business": (1, 112),
            "entertainment": (1, 166), "health": (1, 113),
            "mezzanine": (3, 2447), "news": (1, 114),
            "premium": (3, 2505), "technology": (1, 97),
            "travel": (1, 126)}
    exp = set()
    for d, vals in (("2011-04-01", day1), ("2011-04-02", day2)):
        for q, (rows_, idx) in vals.items():
            exp.add((d, None, None, q, rows_, idx))
    exp |= {("2011-04-01", None, "spot", None, 9, 1102),
            ("2011-04-01", None, "total_market", None, 2, 2836),
            ("2011-04-01", None, "upfront", None, 2, 2681),
            ("2011-04-02", None, "spot", None, 9, 1120),
            ("2011-04-02", None, "total_market", None, 2, 2514),
            ("2011-04-02", None, "upfront", None, 2, 2193),
            ("2011-04-01", None, None, None, 13, 6619),
            ("2011-04-02", None, None, None, 13, 5827)}
    assert got == exp
    # the post-agg mirrors idx on every subtotal row
    assert all(r["idxPostAgg"] == r["idx"] for r in out)


# -- resource-limit context overrides (QueryContexts / GroupByQueryConfig) --

def _quality_day_query(**ctx):
    return {"queryType": "groupBy", "dataSource": "wiki",
            "granularity": "day", "intervals": F2T,
            "dimensions": [{"type": "default", "dimension": "quality",
                            "outputName": "alias"}],
            "aggregations": [{"type": "count", "name": "rows"},
                             {"type": "longSum", "name": "idx",
                              "fieldName": "index"}],
            "context": ctx}


# Not ported, with reasons: testBySegmentResults,
# testBySegmentResultsUnOptimizedDimextraction,
# testBySegmentResultsOptimizedDimextraction and
# testBySegmentResultsWithAllFiltersWithExtractionFns assert the
# broker<->historical per-segment response envelope (bySegment context) — a
# protocol wrapper with no analogue over a Catalyst plan; the inner result
# rows are identical to the non-bySegment twins already ported.
# testSubqueryWithOuterJavascriptAggregators /
# testSubqueryWithOuterDimJavascriptAggregators hit the deliberate
# javascript refusal (operators/aggregations.py).
# testSubqueryWithOuterMaxOnDiskStorageContextOverride's expected failure
# is an artifact of the reference's v2 harness (it trips on an order-clause
# ISE before the storage limit); the storage guard itself is covered below.


def test_group_by_max_results_context_override(spark, wiki_catalog):
    """testGroupByMaxRowsLimitContextOverride — maxResults=1 with 18
    result groups raises ResourceLimitExceededException (runtime guard;
    the limit only enters the plan when the context sets it)."""
    with pytest.raises(Exception, match="maxResults"):
        translate(_quality_day_query(maxResults=1),
                  spark, wiki_catalog).collect()


def test_group_by_timeout_context_override(spark, wiki_catalog):
    """testGroupByTimeoutContextOverride — a generous timeout changes
    nothing; full expected day-1/day-2 quality rows."""
    out = translate(_quality_day_query(timeout=60000),
                    spark, wiki_catalog).collect()
    got = {(str(r["__time"])[:10], r["alias"]): (r["rows"], r["idx"])
           for r in out}
    assert len(got) == 18
    assert got[("2011-04-01", "automotive")] == (1, 135)
    assert got[("2011-04-02", "mezzanine")] == (3, 2447)


def test_group_by_max_on_disk_storage_context_override(spark, wiki_catalog):
    """testGroupByMaxOnDiskStorageContextOverride — spill disabled
    (maxOnDiskStorage=0) with a 1-entry buffer grouper: 'Not enough
    aggregation buffer space to execute this query'."""
    with pytest.raises(Exception,
                       match="Not enough aggregation buffer space"):
        translate(_quality_day_query(maxOnDiskStorage=0,
                                     bufferGrouperMaxSize=1),
                  spark, wiki_catalog).collect()


def test_not_enough_dictionary_space_context_override(spark, wiki_catalog):
    """testNotEnoughDictionarySpaceThroughContextOverride — the merge
    dictionary (grouping-key strings) capped at 1 byte with spill
    disabled: 'Not enough dictionary space to execute this query'."""
    with pytest.raises(Exception, match="Not enough dictionary space"):
        translate(_quality_day_query(maxOnDiskStorage=0,
                                     maxMergingDictionarySize=1),
                  spark, wiki_catalog).collect()


def test_not_enough_disk_space_context_override(spark, wiki_catalog):
    """testNotEnoughDiskSpaceThroughContextOverride — dictionary overflow
    spills, but maxOnDiskStorage=1 byte can't hold it: 'Not enough disk
    space to execute this query'."""
    with pytest.raises(Exception, match="Not enough disk space"):
        translate(_quality_day_query(maxOnDiskStorage=1,
                                     maxMergingDictionarySize=1),
                  spark, wiki_catalog).collect()


def test_group_by_generous_limits_pass(spark, wiki_catalog):
    """The same knobs at realistic values are honored without tripping
    (GroupByQueryConfig defaults: 100MB dictionary, 1G disk)."""
    out = translate(
        _quality_day_query(maxOnDiskStorage=1 << 30,
                           maxMergingDictionarySize=100_000_000,
                           maxResults=500_000, bufferGrouperMaxSize=100_000),
        spark, wiki_catalog).collect()
    assert len(out) == 18


def test_group_by_join_as_native_query_with_unoptimized_filter(
        spark, foo_catalog):
    """CalciteQueryTest.testGroupByJoinAsNativeQueryWithUnoptimizedFilter —
    a native groupBy over a join of two query datasources, with the
    selector rewritten as a 1-element IN (the unoptimized form) and a
    constant virtual dimension: one row, 'def'."""
    scan = {"queryType": "scan", "dataSource": "foo",
            "intervals": ["2001-01-02T00:00:00.000Z/3000-01-01T00:00:00Z"]}
    q = {"queryType": "groupBy",
         "dataSource": {
             "type": "join",
             "left": {"type": "query",
                      "query": {**scan, "columns": ["dim1"]}},
             "right": {"type": "query",
                       "query": {**scan, "columns": ["dim1", "m2"]}},
             "rightPrefix": "j0.",
             "condition": '"dim1" == "j0.dim1"',
             "joinType": "INNER"},
         "granularity": "all",
         "filter": {"type": "in", "dimension": "dim1", "values": ["def"]},
         "virtualColumns": [{"type": "expression", "name": "v0",
                             "expression": "'def'",
                             "outputType": "STRING"}],
         "dimensions": [{"type": "default", "dimension": "v0",
                         "outputName": "d0"}]}
    out = translate(q, spark, foo_catalog).collect()
    assert [r["d0"] for r in out] == ["def"]
