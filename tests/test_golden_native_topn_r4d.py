"""Round-4 TopNQueryRunnerTest tranche D — lexicographic previousStop over
non-existing values (plain + inverted), extraction-fn dimensions (regex,
stringFormat-over-absent, empty-string-producing and ordering-preserving
lookups, fast-topN lookup shapes), and the extraction filter + filtered-agg
null-column case (processing/src/test/java/org/apache/druid/query/topn/
TopNQueryRunnerTest.java)."""

import pytest

from incubator_druid_spark import translate

FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]

COMMON = [
    {"type": "count", "name": "rows"},
    {"type": "doubleSum", "name": "index", "fieldName": "index"},
    {"type": "hyperUnique", "name": "uniques", "fieldName": "quality"},
]
ARIC = [{"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
         "fields": [{"type": "fieldAccess", "fieldName": "rows"},
                    {"type": "fieldAccess", "fieldName": "index"},
                    {"type": "constant", "value": 1}]}]

UNIQUES_9 = 9.019833517963864
UNIQUES_2 = 2.000977198748901

TOTAL_MARKET = ("total_market", 4, 5351.814783, 5356.814783, UNIQUES_2)
UPFRONT = ("upfront", 4, 4875.669692, 4880.669692, UNIQUES_2)
SPOT = ("spot", 18, 2231.876812, 2250.876812, UNIQUES_9)


def topn(spark, cat, **extra):
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": F2T, "threshold": 4, "dimension": "market",
         "metric": "index", "aggregations": COMMON,
         "postAggregations": ARIC}
    q.update(extra)
    return translate(q, spark, cat).collect()


def check(out, exp, dim="market"):
    assert len(out) == len(exp)
    for r, (d, rows_, idx, aric, uq) in zip(out, exp):
        assert r[dim] == d and r["rows"] == rows_
        assert r["index"] == pytest.approx(idx, rel=2e-6)
        assert r["addRowsIndexConstant"] == pytest.approx(aric, rel=2e-6)
        assert r["uniques"] == pytest.approx(uq, abs=0.02)


def test_topn_lexicographic_with_non_existing_previous_stop(spark,
                                                            wiki_catalog):
    """testTopNLexicographicWithNonExistingPreviousStop — previousStop 't'
    is not a dimension value; paging resumes strictly after it."""
    out = topn(spark, wiki_catalog,
               metric={"type": "dimension", "previousStop": "t",
                       "ordering": "lexicographic"})
    check(out, [TOTAL_MARKET, UPFRONT])


def test_topn_inverted_lexicographic_non_existing_previous_stop(
        spark, wiki_catalog):
    """testTopNInvertedLexicographicWithNonExistingPreviousStop — inverted
    ordering resumes strictly BELOW the non-existing stop 'u'."""
    out = topn(spark, wiki_catalog,
               metric={"type": "inverted",
                       "metric": {"type": "dimension", "previousStop": "u",
                                  "ordering": "lexicographic"}})
    check(out, [TOTAL_MARKET, SPOT])


def test_topn_dim_extraction_no_aggregators(spark, wiki_catalog):
    """testTopNDimExtractionNoAggregators — regex first-char extraction
    with a lexicographic spec and NO aggregators: distinct values only."""
    out = topn(spark, wiki_catalog,
               dimension={"type": "extraction", "dimension": "market",
                          "outputName": "market",
                          "extractionFn": {"type": "regex", "expr": "(.)"}},
               metric={"type": "dimension", "ordering": "lexicographic"},
               aggregations=[], postAggregations=[])
    assert [r["market"] for r in out] == ["s", "t", "u"]


def test_topn_on_missing_column_with_extraction_fn(spark, wiki_catalog):
    """testTopNOnMissingColumnWithExtractionFn — a constant stringFormat
    over an absent column maps every row to one group."""
    out = topn(spark, wiki_catalog, intervals=FULL,
               dimension={"type": "extraction",
                          "dimension": "nonexistentColumn",
                          "outputName": "alias",
                          "extractionFn": {"type": "stringFormat",
                                           "format": "theValue"}},
               metric="rows",
               aggregations=[{"type": "count", "name": "rows"}],
               postAggregations=[])
    assert [(r["alias"], r["rows"]) for r in out] == [("theValue", 1209)]


def test_topn_with_empty_string_producing_dim_extraction_fn(spark,
                                                            wiki_catalog):
    """testTopNWithEmptyStringProducingDimExtractionFn — an extraction that
    maps total_market to '' (others retained); the empty string is a real
    group ranking between spot and upfront on the rows metric."""
    out = topn(spark, wiki_catalog, metric="rows",
               dimension={"type": "extraction", "dimension": "market",
                          "outputName": "market",
                          "extractionFn": {
                              "type": "lookup",
                              "lookup": {"type": "map",
                                         "map": {"total_market": ""}},
                              "retainMissingValue": True}})
    check(out, [SPOT,
                ("", 4, 5351.814783, 5356.814783, UNIQUES_2),
                UPFRONT])


@pytest.mark.parametrize("retain,replace,injective", [
    (True, None, True),      # testTopNDimExtractionFastTopNOptimal
    (False, "MISSING", True),   # testTopNDimExtractionFastTopNOptimalWithReplaceMissing
    (True, None, False),     # testTopNDimExtractionFastTopNUnOptimal
    (False, "MISSING", False),  # testTopNDimExtractionFastTopNUnOptimalWithReplaceMissing
])
def test_topn_dim_extraction_fast_topn(spark, wiki_catalog, retain, replace,
                                       injective):
    """testTopNDimExtractionFastTopN{Optimal,UnOptimal}[WithReplaceMissing]
    — a total lookup over every market value ranks by rows under all four
    retain/replace × injective shapes with identical results."""
    fn = {"type": "lookup",
          "lookup": {"type": "map", "map": {"spot": "2spot0",
                                            "total_market": "1total_market0",
                                            "upfront": "3upfront0"}},
          "retainMissingValue": retain, "injective": injective}
    if replace is not None:
        fn["replaceMissingValueWith"] = replace
    out = topn(spark, wiki_catalog, metric="rows",
               dimension={"type": "extraction", "dimension": "market",
                          "outputName": "market", "extractionFn": fn})
    check(out, [("2spot0", 18, 2231.876812, 2250.876812, UNIQUES_9),
                ("1total_market0", 4, 5351.814783, 5356.814783, UNIQUES_2),
                ("3upfront0", 4, 4875.669692, 4880.669692, UNIQUES_2)])


@pytest.mark.parametrize("injective", [True, False])
def test_topn_lexicographic_dim_extraction_namespace(spark, wiki_catalog,
                                                     injective):
    """testTopNLexicographicDimExtractionOptimalNamespace /
    testTopNLexicographicDimExtractionUnOptimalNamespace — a
    re-prefixing lookup under a bare lexicographic DimensionTopNMetricSpec
    sorts by the EXTRACTED value."""
    out = topn(spark, wiki_catalog,
               metric={"type": "dimension", "ordering": "lexicographic"},
               dimension={"type": "extraction", "dimension": "market",
                          "outputName": "market",
                          "extractionFn": {
                              "type": "lookup",
                              "lookup": {"type": "map",
                                         "map": {"spot": "2spot",
                                                 "total_market":
                                                     "3total_market",
                                                 "upfront": "1upfront"}},
                              "retainMissingValue": True,
                              "injective": injective}})
    check(out, [("1upfront", 4, 4875.669692, 4880.669692, UNIQUES_2),
                ("2spot", 18, 2231.876812, 2250.876812, UNIQUES_9),
                ("3total_market", 4, 5351.814783, 5356.814783, UNIQUES_2)])


def test_topn_lexicographic_extraction_sorting_preserved_previous_stop(
        spark, wiki_catalog):
    """testTopNLexicographicDimExtractionWithSortingPreservedAndPreviousStop
    — first-char substring extraction with previousStop 's' resumes at
    't'/'u'."""
    out = topn(spark, wiki_catalog,
               metric={"type": "dimension", "previousStop": "s",
                       "ordering": "lexicographic"},
               dimension={"type": "extraction", "dimension": "market",
                          "outputName": "market",
                          "extractionFn": {"type": "substring", "index": 0,
                                           "length": 1}})
    check(out, [("t", 4, 5351.814783, 5356.814783, UNIQUES_2),
                ("u", 4, 4875.669692, 4880.669692, UNIQUES_2)])


def test_topn_extraction_filter_filtered_agg_no_existing_value(
        spark, wiki_catalog):
    """testTopNWithExtractionFilterAndFilteredAggregatorCaseNoExistingValue
    — sql null mode: an EMPTY lookup with replaceMissingValueWith='NULL'
    maps the absent null_column to 'NULL' on every row, so the extraction
    filter keeps everything; the same filter gates a filtered doubleMax."""
    extraction_fn = {"type": "lookup",
                     "lookup": {"type": "map", "map": {}},
                     "retainMissingValue": False,
                     "replaceMissingValueWith": "NULL"}
    extraction_filter = {"type": "extraction", "dimension": "null_column",
                         "value": "NULL", "extractionFn": extraction_fn}
    out = topn(spark, wiki_catalog, intervals=FULL,
               dimension="null_column", filter=extraction_filter,
               aggregations=COMMON + [
                   {"type": "filtered", "filter": extraction_filter,
                    "aggregator": {"type": "doubleMax", "name": "maxIndex",
                                   "fieldName": "index"}},
                   {"type": "doubleMin", "name": "minIndex",
                    "fieldName": "index"}])
    assert len(out) == 1
    r = out[0]
    assert r["null_column"] is None and r["rows"] == 1209
    assert r["index"] == pytest.approx(503332.5071372986, rel=2e-6)
    assert r["addRowsIndexConstant"] == pytest.approx(504542.5071372986,
                                                      rel=2e-6)
    assert r["uniques"] == pytest.approx(UNIQUES_9, abs=0.02)
    assert r["maxIndex"] == pytest.approx(1870.061029, rel=2e-6)
    assert r["minIndex"] == pytest.approx(59.02102279663086, rel=2e-6)
