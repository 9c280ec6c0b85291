"""The LAST two uncited reference runner-test methods (an exhaustive
method-name diff against the 0.22 test classes found only these):

- GroupByQueryRunnerTest
  .testMergeResultsAcrossMultipleDaysWithLimitAndOrderByUsingMathExpressions
  — a FLOAT expression virtual column (index * 2 + indexMin / 10), longSum
  over it, day buckets, limit 14 ordered by the sum descending across days.
- TopNQueryRunnerTest.testTopNLexicographicDimExtractionOptimalNamespaceWithRunner
  — map-lookup extraction renaming markets to '1upfront'/'2spot'/
  '3total_market', lexicographic metric (the 'OptimalNamespace' suffix is
  the reference's internal extraction-optimization harness; the query
  semantics are the plain lookup-extraction topN).
"""

import pytest

from incubator_druid_spark import translate

F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]

UNIQUES_9 = 9.019833517963864
UNIQUES_2 = 2.000977198748901


def test_merge_results_limit_order_by_math_expression(spark, wiki_catalog):
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": "day", "intervals": F2T,
         "virtualColumns": [{"type": "expression", "name": "expr",
                             "expression": "index * 2 + indexMin / 10",
                             "outputType": "FLOAT"}],
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "alias"}],
         "aggregations": [{"type": "count", "name": "rows"},
                          {"type": "longSum", "name": "idx",
                           "fieldName": "expr"}],
         "limitSpec": {"type": "default", "limit": 14,
                       "columns": [{"dimension": "idx",
                                    "direction": "descending"}]}}
    out = [(r["__time"].strftime("%Y-%m-%d"), r["alias"], r["rows"],
            r["idx"]) for r in translate(q, spark, wiki_catalog).collect()]
    assert out == [
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
        ("2011-04-02", "travel", 1, 265),
    ]


def test_topn_lexicographic_lookup_extraction_optimal_namespace(
        spark, wiki_catalog):
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "dimension": {
             "type": "extraction", "dimension": "market",
             "outputName": "market",
             "extractionFn": {
                 "type": "lookup",
                 "lookup": {"type": "map",
                            "map": {"spot": "2spot",
                                    "total_market": "3total_market",
                                    "upfront": "1upfront"}},
                 "retainMissingValue": True, "injective": True,
                 "optimize": False}},
         "metric": {"type": "dimension",
                    "ordering": "lexicographic"},
         "threshold": 4, "intervals": F2T,
         # the quality_uniques HLL sidecar isn't in the TSV fixture (same
         # carve-out as the rest of the topN tranche): rows/index/post-agg
         # are the asserted values
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "doubleSum", "name": "index", "fieldName": "index"}],
         "postAggregations": [
             {"type": "arithmetic", "name": "addRowsIndexConstant",
              "fn": "+", "fields": [
                  {"type": "constant", "value": 1},
                  {"type": "arithmetic", "fn": "+", "fields": [
                      {"type": "fieldAccess", "fieldName": "rows"},
                      {"type": "fieldAccess", "fieldName": "index"}]}]}]}
    out = [(r["market"], r["rows"], round(r["index"], 6),
            round(r["addRowsIndexConstant"], 6))
           for r in translate(q, spark, wiki_catalog).collect()]
    assert out == [
        ("1upfront", 4, 4875.669692, 4880.669692),
        ("2spot", 18, 2231.876812, 2250.876812),
        ("3total_market", 4, 5351.814783, 5356.814783)]
