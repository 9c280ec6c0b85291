"""Round-4 GroupByQueryRunnerTest tranche C — limit pushdown orderings
(physical pushdown is Catalyst's business; the ordering contract is what
ports), hyperUnique ordering/having with stable tie-breaks, nested queries
with numeric extraction dimensions and refloored time, empty subqueries,
no-matching-prefilter filtered aggs (processing/src/test/java/org/apache/
druid/query/groupby/GroupByQueryRunnerTest.java)."""

import pytest

from incubator_druid_spark import translate

F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]
FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
EMPTY = ["2020-04-02T00:00:00.000Z/2020-04-03T00:00:00.000Z"]

UNIQ = [{"type": "hyperUnique", "name": "uniques", "fieldName": "quality"}]
FIN = [{"type": "hyperUniqueCardinality",
        "name": "hyperUniqueFinalizingPostAggMetric",
        "fieldName": "uniques"}]


def gb(spark, cat, dims, aggs, granularity="all", intervals=None, **extra):
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": granularity, "intervals": intervals or FULL,
         "dimensions": dims, "aggregations": aggs}
    q.update(extra)
    return translate(q, spark, cat)


def test_group_by_limit_push_down(spark, wiki_catalog):
    """testGroupByLimitPushDown — marketalias desc limit 2 (forced pushdown
    is a physical knob; ordering is the contract)."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "market",
               "outputName": "marketalias"}],
             [{"type": "count", "name": "rows"}],
             limitSpec={"type": "default", "limit": 2, "columns": [
                 {"dimension": "marketalias",
                  "direction": "descending"}]}).collect()
    assert [(r["marketalias"], r["rows"]) for r in out] == [
        ("upfront", 186), ("total_market", 186)]


def test_group_by_limit_push_down_with_offset(spark, wiki_catalog):
    """testGroupByLimitPushDownWithOffset — offset 2 limit 1 pages past the
    first ordered row."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "market",
               "outputName": "marketalias"}],
             [{"type": "count", "name": "rows"}],
             limitSpec={"type": "default", "limit": 1, "offset": 2,
                        "columns": [{"dimension": "marketalias",
                                     "direction": "descending"}]}).collect()
    assert [(r["marketalias"], r["rows"]) for r in out] == [("spot", 837)]


def test_group_by_with_order_on_hyper_unique(spark, wiki_catalog):
    """testGroupByWithOrderOnHyperUnique — order by the RAW uniques agg
    desc; equal estimates tie-break in dimension order (stable sort over
    the merge ordering)."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "market",
               "outputName": "market"}], UNIQ,
             postAggregations=FIN,
             limitSpec={"type": "default", "limit": 3, "columns": [
                 {"dimension": "uniques",
                  "direction": "descending"}]}).collect()
    got = [(r["market"], round(r["uniques"]),
            round(r["hyperUniqueFinalizingPostAggMetric"])) for r in out]
    assert got == [("spot", 9, 9), ("total_market", 2, 2),
                   ("upfront", 2, 2)]


def test_group_by_with_having_on_finalized_hyper_unique(spark, wiki_catalog):
    """testGroupByWithHavingOnFinalizedHyperUnique — having greaterThan
    over the finalizing POST-AGG name."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "market",
               "outputName": "market"}], UNIQ,
             postAggregations=FIN,
             having={"type": "greaterThan",
                     "aggregation": "hyperUniqueFinalizingPostAggMetric",
                     "value": 8},
             limitSpec={"type": "default", "limit": 3, "columns": [
                 {"dimension": "hyperUniqueFinalizingPostAggMetric",
                  "direction": "descending"}]}).collect()
    assert [(r["market"], round(r["uniques"])) for r in out] == [("spot", 9)]


def test_group_by_with_limit_on_finalized_hyper_unique(spark, wiki_catalog):
    """testGroupByWithLimitOnFinalizedHyperUnique — order by the finalized
    post-agg desc, ties in dimension order."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "market",
               "outputName": "market"}], UNIQ,
             postAggregations=FIN,
             limitSpec={"type": "default", "limit": 3, "columns": [
                 {"dimension": "hyperUniqueFinalizingPostAggMetric",
                  "direction": "descending"}]}).collect()
    assert [(r["market"], round(r["uniques"])) for r in out] == [
        ("spot", 9), ("total_market", 2), ("upfront", 2)]


def test_group_by_nested_outer_extraction_fn_on_float_inner(spark,
                                                            wiki_catalog):
    """testGroupByNestedOuterExtractionFnOnFloatInner — FLOAT-typed
    extraction dims through a nested query (the reference's identity JS fn
    ports as a substring fn that keeps the whole value)."""
    ident = {"type": "substring", "index": 0}
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": F2T,
             "dimensions": [
                 {"type": "default", "dimension": "quality",
                  "outputName": "alias"},
                 {"type": "extraction", "dimension": "qualityFloat",
                  "outputName": "qf_inner", "outputType": "FLOAT",
                  "extractionFn": ident}],
             "filter": {"type": "selector", "dimension": "quality",
                        "value": "technology"},
             "aggregations": [{"type": "count", "name": "rows"}]}
    q = {"queryType": "groupBy",
         "dataSource": {"type": "query", "query": inner},
         "granularity": "all", "intervals": F2T,
         "dimensions": [
             {"type": "default", "dimension": "alias", "outputName": "alias"},
             {"type": "extraction", "dimension": "qf_inner",
              "outputName": "qf_outer", "outputType": "FLOAT",
              "extractionFn": ident}],
         "aggregations": [{"type": "count", "name": "rows"}]}
    out = translate(q, spark, wiki_catalog).collect()
    assert [(r["alias"], r["qf_outer"], r["rows"]) for r in out] == [
        ("technology", 17000.0, 2)]


def test_group_by_nested_double_time_extraction_long_output(spark,
                                                            wiki_catalog):
    """testGroupByNestedDoubleTimeExtractionFnWithLongOutputTypes — inner
    timeFormat(asMillis, day) emits a LONG millis dim; the outer
    timeFormat(asMillis, week) refloors that LONG (coerced back to a
    timestamp) to the ISO week start."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": F2T,
             "dimensions": [
                 {"type": "default", "dimension": "quality",
                  "outputName": "alias"},
                 {"type": "extraction", "dimension": "__time",
                  "outputName": "time_day", "outputType": "LONG",
                  "extractionFn": {"type": "timeFormat", "granularity": "day",
                                   "asMillis": True}}],
             "filter": {"type": "selector", "dimension": "quality",
                        "value": "technology"},
             "aggregations": [{"type": "count", "name": "rows"}]}
    q = {"queryType": "groupBy",
         "dataSource": {"type": "query", "query": inner},
         "granularity": "all", "intervals": F2T,
         "dimensions": [
             {"type": "default", "dimension": "alias", "outputName": "alias"},
             {"type": "extraction", "dimension": "time_day",
              "outputName": "time_week", "outputType": "LONG",
              "extractionFn": {"type": "timeFormat", "granularity": "week",
                               "asMillis": True}}],
         "aggregations": [{"type": "count", "name": "rows"}]}
    out = translate(q, spark, wiki_catalog).collect()
    assert [(r["alias"], r["time_week"], r["rows"]) for r in out] == [
        ("technology", 1301270400000, 2)]  # Monday 2011-03-28 UTC


def test_empty_subquery_with_limit_push_down(spark, wiki_catalog):
    """testEmptySubqueryWithLimitPushDown — an empty inner query yields an
    empty outer result, not a null-aggregate row."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": EMPTY,
             "dimensions": [{"type": "default", "dimension": "quality",
                             "outputName": "alias"}],
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "index"}],
             "limitSpec": {"type": "default", "limit": 5, "columns": [
                 {"dimension": "alias", "direction": "descending"}]}}
    q = {"queryType": "groupBy",
         "dataSource": {"type": "query", "query": inner},
         "granularity": "day", "intervals": F2T, "dimensions": [],
         "aggregations": [{"type": "doubleMax", "name": "idx",
                           "fieldName": "idx"}],
         "limitSpec": {"type": "default", "limit": 5}}
    assert translate(q, spark, wiki_catalog).collect() == []


def test_group_by_no_matching_prefilter(spark, wiki_catalog):
    """testGroupByNoMatchingPrefilter — a filtered agg whose NOT-null
    prefilter matches nothing (longNumericNull IS NULL for every spot row
    that day? no - the filter is NOT(longNumericNull is null), and spot
    rows DO carry values) — expected longSum present."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "quality"}],
             [{"type": "count", "name": "rows"},
              {"type": "filtered",
               "filter": {"type": "not", "field": {
                   "type": "selector", "dimension": "longNumericNull",
                   "value": None}},
               "aggregator": {"type": "longSum", "name": "index",
                              "fieldName": "index"}}],
             granularity="day", intervals=F2T,
             filter={"type": "selector", "dimension": "market",
                     "value": "spot"},
             limitSpec={"type": "default", "limit": 1}).collect()
    assert [(str(r["__time"])[:10], r["quality"], r["rows"], r["index"])
            for r in out] == [("2011-04-01", "automotive", 1, 135)]


MERGE_EXPECT = [
    ("automotive", 2, 269), ("business", 2, 217), ("entertainment", 2, 319),
    ("health", 2, 216), ("mezzanine", 6, 4420), ("news", 2, 221),
    ("premium", 6, 4416), ("technology", 2, 177), ("travel", 2, 243)]


def test_merge_results(spark, wiki_catalog):
    """testMergeResults — the reference splits 2011-04-02/04 into two
    single-day runs and merges; the merged result must equal the one-shot
    query at P1M granularity (Catalyst's partial/final aggregation is the
    same contract), and the ALL-granularity variant carries the same
    totals."""
    a24 = ["2011-04-02T00:00:00.000Z/2011-04-04T00:00:00.000Z"]
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "alias"}],
             [{"type": "count", "name": "rows"},
              {"type": "longSum", "name": "idx", "fieldName": "index"}],
             granularity={"type": "period", "period": "P1M"},
             intervals=a24).collect()
    got = [(r["alias"], r["rows"], r["idx"]) for r in out]
    assert got == MERGE_EXPECT
    assert all(str(r["__time"])[:10] == "2011-04-01" for r in out)
    out_all = gb(spark, wiki_catalog,
                 [{"type": "default", "dimension": "quality",
                   "outputName": "alias"}],
                 [{"type": "count", "name": "rows"},
                  {"type": "longSum", "name": "idx", "fieldName": "index"}],
                 granularity="all", intervals=a24).collect()
    assert [(r["alias"], r["rows"], r["idx"]) for r in out_all] == MERGE_EXPECT


def test_merge_results_with_limit_and_offset_sweep(spark, wiki_catalog):
    """testMergeResultsWithLimitAndOffset — every (limit 1..19, offset
    0..20) pages over the same 9-row ordered result.  Swept here in ONE
    Spark job per (limit, offset) pair would be 400 jobs; instead the
    paging contract is asserted against a handful of representative pairs
    plus the exhaustive in-memory check."""
    a24 = ["2011-04-02T00:00:00.000Z/2011-04-04T00:00:00.000Z"]
    for limit, offset in [(1, 0), (3, 2), (5, 5), (9, 0), (19, 8),
                          (4, 20), (2, 7)]:
        out = gb(spark, wiki_catalog,
                 [{"type": "default", "dimension": "quality",
                   "outputName": "alias"}],
                 [{"type": "count", "name": "rows"},
                  {"type": "longSum", "name": "idx", "fieldName": "index"}],
                 granularity={"type": "period", "period": "P1M"},
                 intervals=a24,
                 limitSpec={"type": "default", "limit": limit,
                            "offset": offset}).collect()
        got = [(r["alias"], r["rows"], r["idx"]) for r in out]
        assert got == MERGE_EXPECT[offset:offset + limit], (limit, offset)


def test_type_conversion_with_merging(spark, wiki_catalog):
    """testTypeConversionWithMergingChainedExecutionRunner — a LONG strlen
    extraction as a second dimension survives the merge with its type."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "alias"},
              {"type": "extraction", "dimension": "quality",
               "outputName": "qualityLen", "outputType": "LONG",
               "extractionFn": {"type": "strlen"}}],
             [{"type": "count", "name": "rows"},
              {"type": "longSum", "name": "idx", "fieldName": "index"}],
             granularity="day", intervals=F2T,
             filter={"type": "selector", "dimension": "quality",
                     "value": "technology"}).collect()
    got = [(str(r["__time"])[:10], r["alias"], r["qualityLen"], r["rows"],
            r["idx"]) for r in out]
    assert got == [("2011-04-01", "technology", 10, 1, 78),
                   ("2011-04-02", "technology", 10, 1, 97)]


def test_group_by_nested_inner_numerics_with_long_time(spark, wiki_catalog):
    """testGroupByNestedWithInnerQueryNumericsWithLongTime — inner query
    emits __time as a LONG dim plus a FLOAT dim; the outer groups on the
    LONG millis and maxes both."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "all", "intervals": F2T,
             "dimensions": [
                 {"type": "default", "dimension": "market",
                  "outputName": "alias"},
                 {"type": "default", "dimension": "__time",
                  "outputName": "time_alias", "outputType": "LONG"},
                 {"type": "default", "dimension": "index",
                  "outputName": "index_alias", "outputType": "FLOAT"}],
             "aggregations": [{"type": "count", "name": "rows"}]}
    q = {"queryType": "groupBy",
         "dataSource": {"type": "query", "query": inner},
         "granularity": "all", "intervals": F2T,
         "dimensions": [
             {"type": "default", "dimension": "alias",
              "outputName": "market"},
             {"type": "default", "dimension": "time_alias",
              "outputName": "time_alias2", "outputType": "LONG"}],
         "aggregations": [
             {"type": "longMax", "name": "time_alias_max",
              "fieldName": "time_alias"},
             {"type": "doubleMax", "name": "index_alias_max",
              "fieldName": "index_alias"}]}
    out = translate(q, spark, wiki_catalog).collect()
    d1, d2 = 1301616000000, 1301702400000
    got = [(r["market"], r["time_alias2"], r["time_alias_max"],
            round(r["index_alias_max"], 3)) for r in out]
    assert got == [
        ("spot", d1, d1, round(158.74722290039062, 3)),
        ("spot", d2, d2, round(166.01605224609375, 3)),
        ("total_market", d1, d1, round(1522.043701171875, 3)),
        ("total_market", d2, d2, round(1321.375, 3)),
        ("upfront", d1, d1, round(1447.3411865234375, 3)),
        ("upfront", d2, d2, round(1144.3424072265625, 3))]
