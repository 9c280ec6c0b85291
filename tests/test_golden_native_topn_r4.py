"""Round-4 TopNQueryRunnerTest tranche — nullable numeric dimensions under
the numeric DimensionTopNMetricSpec, empty/missing-column results,
partial-null dimension filters, first/last as topN metrics, nonexistent
dimensions, inverted numeric metric (processing/src/test/java/org/apache/
druid/query/topn/TopNQueryRunnerTest.java).  Doubles assert at 2e-6
relative (reference stores index as FLOAT); hyperUnique estimates are
exact at this cardinality (9 / 2)."""

import pytest

from incubator_druid_spark import translate

FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]
EMPTY = ["2020-04-02T00:00:00.000Z/2020-04-03T00:00:00.000Z"]

COMMON = [
    {"type": "count", "name": "rows"},
    {"type": "doubleSum", "name": "index", "fieldName": "index"},
    {"type": "hyperUnique", "name": "uniques", "fieldName": "quality"},
]
ARIC = [{"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
         "fields": [{"type": "fieldAccess", "fieldName": "rows"},
                    {"type": "fieldAccess", "fieldName": "index"},
                    {"type": "constant", "value": 1}]}]


def topn(spark, cat, **extra):
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": FULL, "threshold": 4, "aggregations": COMMON}
    q.update(extra)
    return translate(q, spark, cat).collect()


def test_aggregate_on_double_numeric_null(spark, wiki_catalog):
    """testAggregateOnDoubleNumericNull — DOUBLE dim, numeric dimension
    ordering, null first."""
    out = topn(spark, wiki_catalog,
               dimension={"type": "default", "dimension": "doubleNumericNull",
                          "outputName": "dim", "outputType": "DOUBLE"},
               metric={"type": "dimension", "ordering": "numeric"},
               threshold=10000,
               aggregations=[{"type": "count", "name": "count"}])
    assert [(r["dim"], r["count"]) for r in out] == [
        (None, 279), (10.0, 93), (20.0, 93), (40.0, 93),
        (50.0, 279), (70.0, 279), (80.0, 93)]


def test_aggregate_on_float_numeric_null(spark, wiki_catalog):
    """testAggregateOnFloatNumericNull — same shape, FLOAT dim."""
    out = topn(spark, wiki_catalog,
               dimension={"type": "default", "dimension": "floatNumericNull",
                          "outputName": "dim", "outputType": "FLOAT"},
               metric={"type": "dimension", "ordering": "numeric"},
               threshold=10000,
               aggregations=[{"type": "count", "name": "count"}])
    assert [(r["dim"], r["count"]) for r in out] == [
        (None, 279), (10.0, 93), (20.0, 93), (40.0, 93),
        (50.0, 279), (70.0, 279), (80.0, 93)]


def test_empty_topn(spark, wiki_catalog):
    """testEmptyTopN — an empty interval yields ZERO topN rows."""
    out = topn(spark, wiki_catalog, dimension="market", metric="index",
               intervals=EMPTY,
               aggregations=COMMON + [
                   {"type": "doubleMax", "name": "maxIndex",
                    "fieldName": "index"},
                   {"type": "doubleMin", "name": "minIndex",
                    "fieldName": "index"},
                   {"type": "doubleFirst", "name": "first",
                    "fieldName": "index"}],
               postAggregations=ARIC)
    assert out == []


def test_topn_on_missing_column(spark, wiki_catalog):
    """testTopNOnMissingColumn — a nonexistent dimension reads as one null
    group holding every row."""
    out = topn(spark, wiki_catalog,
               dimension={"type": "default", "dimension": "nonexistentColumn",
                          "outputName": "alias"},
               metric="rows",
               aggregations=[{"type": "count", "name": "rows"}])
    assert [(r["alias"], r["rows"]) for r in out] == [(None, 1209)]


def test_topn_partial_null_dim_filter_on_null(spark, wiki_catalog):
    """testTopNOverPartialNullDimensionWithFilterOnNullValue — selector
    null over a partially-null dimension keeps only the null rows."""
    out = topn(spark, wiki_catalog, dimension="partial_null_column",
               metric="uniques", threshold=1000, intervals=F2T,
               filter={"type": "selector", "dimension": "partial_null_column",
                       "value": None})
    assert len(out) == 1
    r = out[0]
    assert r["partial_null_column"] is None and r["rows"] == 22
    assert r["index"] == pytest.approx(7583.691513061523, rel=2e-6)
    assert round(r["uniques"]) == 9


def test_topn_partial_null_dim_filter_on_not_null(spark, wiki_catalog):
    """testTopNOverPartialNullDimensionWithFilterOnNOTNullValue."""
    out = topn(spark, wiki_catalog, dimension="partial_null_column",
               metric="uniques", threshold=1000, intervals=F2T,
               filter={"type": "selector", "dimension": "partial_null_column",
                       "value": "value"})
    assert len(out) == 1
    r = out[0]
    assert r["partial_null_column"] == "value" and r["rows"] == 4
    assert r["index"] == pytest.approx(4875.669692, rel=2e-6)
    assert round(r["uniques"]) == 2


def test_topn_over_first_last_aggregator(spark, wiki_catalog):
    """testTopNOverFirstLastAggregator — longFirst/longLast as the topN
    metric at MONTH granularity; ties broken by segment row order."""
    out = topn(spark, wiki_catalog, granularity="month", dimension="market",
               metric="last", threshold=3,
               aggregations=[
                   {"type": "longFirst", "name": "first", "fieldName": "index"},
                   {"type": "longLast", "name": "last", "fieldName": "index"}])
    got = [(str(r["__time"])[:10], r["market"], r["first"], r["last"])
           for r in out]
    assert got == [
        ("2011-01-01", "total_market", 1000, 1127),
        ("2011-01-01", "upfront", 800, 943),
        ("2011-01-01", "spot", 100, 155),
        ("2011-02-01", "total_market", 1203, 1292),
        ("2011-02-01", "upfront", 1667, 1101),
        ("2011-02-01", "spot", 132, 114),
        ("2011-03-01", "total_market", 1124, 1366),
        ("2011-03-01", "upfront", 1166, 1063),
        ("2011-03-01", "spot", 153, 125),
        ("2011-04-01", "total_market", 1314, 1029),
        ("2011-04-01", "upfront", 1447, 780),
        ("2011-04-01", "spot", 135, 120)]


def test_topn_with_non_existent_dimension(spark, wiki_catalog):
    """testTopNWithNonExistentDimension — null group, full-row aggregates,
    post-agg applies."""
    out = topn(spark, wiki_catalog,
               dimension={"type": "default", "dimension": "doesn't exist",
                          "outputName": "doesnt"},
               metric="index", threshold=1, intervals=F2T,
               postAggregations=ARIC)
    assert len(out) == 1
    r = out[0]
    assert r["doesnt"] is None and r["rows"] == 26
    assert r["index"] == pytest.approx(12459.361190795898, rel=2e-6)
    assert r["addRowsIndexConstant"] == pytest.approx(12486.361190795898,
                                                      rel=2e-6)
    assert round(r["uniques"]) == 9


def test_topn_with_non_existent_dimension_and_actual_filter(spark,
                                                            wiki_catalog):
    """testTopNWithNonExistentDimensionAndActualFilter — a REAL filter still
    applies under the null dimension group."""
    out = topn(spark, wiki_catalog,
               dimension={"type": "default", "dimension": "doesn't exist",
                          "outputName": "doesnt"},
               metric="index", intervals=F2T,
               filter={"type": "selector", "dimension": "market",
                       "value": "upfront"},
               postAggregations=ARIC)
    assert len(out) == 1
    r = out[0]
    assert r["doesnt"] is None and r["rows"] == 4
    assert r["index"] == pytest.approx(4875.669692, rel=2e-6)
    assert round(r["uniques"]) == 2


def test_inverted_topn_query(spark, wiki_catalog):
    """testInvertedTopNQuery — inverted numeric metric = BOTTOM-N by
    index."""
    out = topn(spark, wiki_catalog, dimension="market",
               metric={"type": "inverted",
                       "metric": {"type": "numeric", "metric": "index"}},
               threshold=3, intervals=F2T,
               postAggregations=ARIC)
    got = [(r["market"], r["rows"]) for r in out]
    assert got == [("spot", 18), ("upfront", 4), ("total_market", 4)]
    assert out[0]["index"] == pytest.approx(2231.876812, rel=2e-6)
    assert out[1]["index"] == pytest.approx(4875.669692, rel=2e-6)
    assert out[2]["index"] == pytest.approx(5351.814783, rel=2e-6)
