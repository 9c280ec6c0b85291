"""Round-4 TopNQueryRunnerTest tranche E — extraction over LONG and __time
columns, floatFirst/floatLast as a per-month topN metric over a double
column, and descending numeric-metric ordering with null aggregates
sorting last (processing/src/test/java/org/apache/druid/query/topn/
TopNQueryRunnerTest.java).

The reference's two *WithExFn cases use a JavaScript extraction
`'super-' + str`; javascript is a deliberate non-goal here (same stance as
Druid's default-disabled javascript), so the identical many-to-one string
mapping is expressed with the stringFormat extractionFn — the semantics
under test (string extraction over LONG / __time-millis inputs) are
unchanged."""

import pytest

from incubator_druid_spark import translate

FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
SECOND_ONLY = ["2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"]

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
UNIQUES_1 = 1.0002442201269182


def topn(spark, cat, **extra):
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": FULL, "threshold": 4, "dimension": "market",
         "metric": "index", "aggregations": COMMON,
         "postAggregations": ARIC}
    q.update(extra)
    return translate(q, spark, cat).collect()


MAXMIN = [{"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
          {"type": "doubleMin", "name": "minIndex", "fieldName": "index"}]


def test_full_on_topn_long_column_with_ex_fn(spark, wiki_catalog):
    """testFullOnTopNLongColumnWithExFn — string extraction over the LONG
    qualityLong column, ranked by a doubleMax aggregate."""
    out = topn(spark, wiki_catalog, metric="maxIndex",
               dimension={"type": "extraction", "dimension": "qualityLong",
                          "outputName": "ql_alias",
                          "extractionFn": {"type": "stringFormat",
                                           "format": "super-%s"}},
               aggregations=COMMON + MAXMIN)
    exp = [("super-1400", 279, 217725.41940800005, 218005.41940800005,
            UNIQUES_1, 1870.061029, 91.270553),
           ("super-1600", 279, 210865.67977600006, 211145.67977600006,
            UNIQUES_1, 1862.737933, 99.284525),
           ("super-1000", 93, 12270.807093, 12364.807093, UNIQUES_1,
            277.273533, 71.315931),
           ("super-1200", 93, 12086.472791, 12180.472791, UNIQUES_1,
            193.787574, 84.710523)]
    assert len(out) == 4
    for r, (d, rows_, idx, aric, uq, mx, mn) in zip(out, exp):
        assert r["ql_alias"] == d and r["rows"] == rows_
        assert r["index"] == pytest.approx(idx, rel=2e-6)
        assert r["addRowsIndexConstant"] == pytest.approx(aric, rel=2e-6)
        assert r["uniques"] == pytest.approx(uq, abs=0.02)
        assert r["maxIndex"] == pytest.approx(mx, rel=2e-6)
        assert r["minIndex"] == pytest.approx(mn, rel=2e-6)


def test_full_on_topn_long_time_column_with_ex_fn(spark, wiki_catalog):
    """testFullOnTopNLongTimeColumnWithExFn — __time's extraction input is
    its epoch-millis LONG rendering."""
    out = topn(spark, wiki_catalog, metric="maxIndex",
               dimension={"type": "extraction", "dimension": "__time",
                          "outputName": "time_alias",
                          "extractionFn": {"type": "stringFormat",
                                           "format": "super-%s"}},
               aggregations=COMMON + MAXMIN)
    exp = [("super-1296345600000", 5497.331253051758, 1870.061029,
            97.02391052246094),
           ("super-1298678400000", 6541.463027954102, 1862.737933,
            83.099365234375),
           ("super-1301529600000", 6814.467971801758, 1734.27490234375,
            93.39083862304688),
           ("super-1294876800000", 6077.949111938477, 1689.0128173828125,
            94.87471008300781)]
    assert len(out) == 4
    for r, (d, idx, mx, mn) in zip(out, exp):
        assert r["time_alias"] == d and r["rows"] == 13
        assert r["index"] == pytest.approx(idx, rel=2e-6)
        assert r["uniques"] == pytest.approx(UNIQUES_9, abs=0.02)
        assert r["maxIndex"] == pytest.approx(mx, rel=2e-6)
        assert r["minIndex"] == pytest.approx(mn, rel=2e-6)


def test_topn_over_first_last_float_aggregator_using_double_column(
        spark, wiki_catalog):
    """testTopNOverFirstLastFloatAggregatorUsingDoubleColumn — floatFirst /
    floatLast over the double index column, per MONTH, ranked by `last`."""
    out = translate(
        {"queryType": "topN", "dataSource": "wiki", "granularity": "month",
         "intervals": FULL, "threshold": 3, "dimension": "market",
         "metric": "last",
         "aggregations": [
             {"type": "floatFirst", "name": "first", "fieldName": "index"},
             {"type": "floatLast", "name": "last", "fieldName": "index"}]},
        spark, wiki_catalog).collect()
    exp = {
        "2011-01-01": [("total_market", 1000.0, 1127.23095703125),
                       ("upfront", 800.0, 943.4971923828125),
                       ("spot", 100.0, 155.7449493408203)],
        "2011-02-01": [("total_market", 1203.4656, 1292.5428466796875),
                       ("upfront", 1667.497802734375, 1101.918212890625),
                       ("spot", 132.123779296875, 114.2845687866211)],
        "2011-03-01": [("total_market", 1124.2014, 1366.4476),
                       ("upfront", 1166.1411, 1063.2012),
                       ("spot", 153.05994, 125.83968)],
        "2011-04-01": [("total_market", 1314.8397, 1029.057),
                       ("upfront", 1447.3412, 780.272),
                       ("spot", 135.8851, 120.290344)],
    }
    by_month: dict = {}
    for r in out:
        by_month.setdefault(str(r["__time"])[:10], []).append(r)
    assert sorted(by_month) == sorted(exp)
    for month, rows_ in exp.items():
        got = by_month[month]
        assert len(got) == 3
        for r, (mk, first, last) in zip(got, rows_):
            assert r["market"] == mk
            assert r["first"] == pytest.approx(first, rel=1e-6)
            assert r["last"] == pytest.approx(last, rel=1e-6)


@pytest.mark.parametrize("col,agg_type", [
    ("longNumericNull", "longSum"),    # test_topN_orderByLongNumericColumn…
    ("doubleNumericNull", "longSum"),  # …DoubleNumericColumn…
    ("floatNumericNull", "longSum"),   # …FloatNumericColumn…
])
def test_topn_order_by_numeric_column_with_nulls_descending(
        spark, wiki_catalog, col, agg_type):
    """test_topN_orderBy{Long,Double,Float}NumericColumnWithNulls_returns-
    DescendingResults — null metric values rank smallest (nullsFirst
    aggregator comparator), landing LAST in descending order; ties break
    by the LONG-typed dimension ascending."""
    out = translate(
        {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": SECOND_ONLY, "threshold": 10000,
         "dimension": {"type": "default", "dimension": "index",
                       "outputName": "index_alias", "outputType": "LONG"},
         "metric": {"type": "numeric", "metric": col},
         "aggregations": [{"type": agg_type, "name": col,
                           "fieldName": col}]},
        spark, wiki_catalog).collect()
    exp = [(97, 80), (135, 70), (1049, 70), (1321, 70), (110, 50),
           (1144, 50), (1193, 50), (113, 40), (112, 20), (147, 10),
           (114, None), (126, None), (166, None)]
    assert [(r["index_alias"],
             (None if r[col] is None else int(r[col])))
            for r in out] == exp
