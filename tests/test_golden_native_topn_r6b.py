"""Round-6b TopNQueryRunnerTest tranche — the last portable remainders:
inverted-lexicographic previousStop over an extraction, float-column
first/last aggregators, and the numeric-metric-with-nulls descending
family (processing/src/test/java/org/apache/druid/query/topn/
TopNQueryRunnerTest.java).

Not ported, deliberately: testTopNLexicographicDimExtractionOptimal-
NamespaceWithRunner (identical query+expectation to the Optimal/UnOptimal
namespace pair already parametrized in test_golden_native_topn_r4d.py —
the WithRunner variant only swaps the Java execution harness)."""

import pytest

from incubator_druid_spark import translate

F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]
SECOND_ONLY = ["2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"]
FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
AGGS = [
    {"type": "count", "name": "rows"},
    {"type": "doubleSum", "name": "index", "fieldName": "index"},
]


def topn(spark, cat, **extra):
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "dimension": "market", "metric": "index", "threshold": 4,
         "intervals": F2T, "aggregations": AGGS}
    q.update(extra)
    return translate(q, spark, cat).collect()


def test_inverted_lexicographic_dim_extraction_previous_stop2(
        spark, wiki_catalog):
    """testInvertedTopNLexicographicDimExtractionWithPreviousStop2 —
    third-char regex extraction ('..(.)' → t/o/f), inverted lexicographic
    resuming BELOW previousStop 'p': o then f."""
    out = topn(spark, wiki_catalog,
               metric={"type": "inverted",
                       "metric": {"type": "dimension",
                                  "previousStop": "p",
                                  "ordering": "lexicographic"}},
               dimension={"type": "extraction", "dimension": "market",
                          "outputName": "market",
                          "extractionFn": {"type": "regex",
                                           "expr": "..(.)"}})
    assert [(r["market"], r["rows"], round(r["index"], 6)) for r in out] \
        == [("o", 18, 2231.876812), ("f", 4, 4875.669692)]


def test_topn_over_first_last_float_aggregator_using_float_column(
        spark, wiki_catalog):
    """testTopNOverFirstLastFloatAggregatorUsingFloatColumn — floatFirst/
    floatLast read a FLOAT column (indexFloat = float32(index), supplied
    here as a FLOAT virtual column); month buckets, metric=last.  The
    reference's expected values ARE the float32 renderings."""
    out = translate(
        {"queryType": "topN", "dataSource": "wiki",
         "granularity": "month", "dimension": "market", "metric": "last",
         "threshold": 3, "intervals": FULL,
         "virtualColumns": [{"type": "expression", "name": "indexFloat",
                             "expression": "index",
                             "outputType": "FLOAT"}],
         "aggregations": [
             {"type": "floatFirst", "name": "first",
              "fieldName": "indexFloat"},
             {"type": "floatLast", "name": "last",
              "fieldName": "indexFloat"}]},
        spark, wiki_catalog).collect()
    jan = [(r["market"], r["first"], r["last"]) for r in out
           if str(r["__time"])[:7] == "2011-01"]
    assert jan == [
        ("total_market", pytest.approx(1000.0),
         pytest.approx(1127.23095703125)),
        ("upfront", pytest.approx(800.0), pytest.approx(943.4971923828125)),
        ("spot", pytest.approx(100.0), pytest.approx(155.7449493408203)),
    ]
    feb = [(r["market"], r["first"], r["last"]) for r in out
           if str(r["__time"])[:7] == "2011-02"]
    assert feb == [
        ("total_market", pytest.approx(1203.4656),
         pytest.approx(1292.5428466796875)),
        ("upfront", pytest.approx(1667.497802734375),
         pytest.approx(1101.918212890625)),
        ("spot", pytest.approx(132.123779296875),
         pytest.approx(114.2845687866211)),
    ]


_NULLS_EXPECT = [
    (97, 80), (135, 70), (1049, 70), (1321, 70), (110, 50), (1144, 50),
    (1193, 50), (113, 40), (112, 20), (147, 10), (114, None), (126, None),
    (166, None),
]


@pytest.mark.parametrize("agg_type,col", [
    ("longSum", "longNumericNull"),
    ("floatSum", "floatNumericNull"),
    ("doubleSum", "doubleNumericNull"),
])
def test_topn_order_by_numeric_column_with_nulls_descending(
        spark, wiki_catalog, agg_type, col):
    """test_topN_orderByLongNumericColumnWithNulls_returnsDescendingResults,
    test_topN_orderByFloatNumericColumnWithNulls_returnsDescendingResults,
    test_topN_orderByDoubleNumericColumnWithNulls_returnsDescendingResults
    — a LONG-typed index dimension ordered by a nullable
    numeric metric named after its source column: descending values, ties
    broken by ascending dimension, null metrics last (sql null mode)."""
    out = translate(
        {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "dimension": {"type": "default", "dimension": "index",
                       "outputName": "index_alias", "outputType": "LONG"},
         "metric": col, "threshold": 10000,
         "intervals": SECOND_ONLY,
         "aggregations": [{"type": agg_type, "name": col,
                           "fieldName": col}]},
        spark, wiki_catalog).collect()
    got = [(r["index_alias"], (None if r[col] is None else int(r[col])))
           for r in out]
    assert got == _NULLS_EXPECT


def test_full_on_topn_numeric_string_with_decoration(spark, wiki_catalog):
    """testFullOnTopNNumericStringColumnWithDecoration — listFiltered
    whitelist over the numeric-string column retyped LONG; the excluded
    values' rows fold into a null group that maxIndex ordering drops
    below the whitelist (threshold 4 returns the 3 whitelisted + null
    group in the reference; the reference keeps only non-null rows in
    its expectation)."""
    out = translate(
        {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "dimension": {"type": "listFiltered",
                       "delegate": {"type": "default",
                                    "dimension": "qualityNumericString",
                                    "outputName": "qns_alias",
                                    "outputType": "LONG"},
                       "values": ["120000", "140000", "160000"],
                       "isWhitelist": True},
         "metric": "maxIndex", "threshold": 4, "intervals": FULL,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "doubleSum", "name": "index", "fieldName": "index"},
             {"type": "hyperUnique", "name": "uniques",
              "fieldName": "quality"},
             {"type": "doubleMax", "name": "maxIndex",
              "fieldName": "index"},
             {"type": "doubleMin", "name": "minIndex",
              "fieldName": "index"}],
         "postAggregations": [
             {"type": "arithmetic", "name": "addRowsIndexConstant",
              "fn": "+", "fields": [
                  {"type": "fieldAccess", "fieldName": "index"},
                  {"type": "arithmetic", "fn": "+", "fields": [
                      {"type": "fieldAccess", "fieldName": "rows"},
                      {"type": "constant", "value": 1}]}]}]},
        spark, wiki_catalog).collect()
    got = [(r["qns_alias"], r["rows"], round(r["index"], 5),
            round(r["addRowsIndexConstant"], 5), int(r["uniques"]),
            round(r["maxIndex"], 6), round(r["minIndex"], 6))
           for r in out if r["qns_alias"] is not None]
    assert got == [
        (140000, 279, round(217725.41940800005, 5),
         round(218005.41940800005, 5), 1, 1870.061029, 91.270553),
        (160000, 279, round(210865.67977600006, 5),
         round(211145.67977600006, 5), 1, 1862.737933, 99.284525),
        (120000, 93, 12086.47279, 12180.47279, 1, 193.787574, 84.710523),
    ]
