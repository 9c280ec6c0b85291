"""Round-3 native-runner tranche: TopNQueryRunnerTest +
TimeseriesQueryRunnerTest ports over the reference's numeric-TSV wiki fixture
(processing/src/test/java/org/apache/druid/query/{topn,timeseries}/...),
prioritizing extractionFn-on-numeric-dims, dimension-ordering sorts, typed
dimension casts, and null-column semantics (VERDICT r2 #7).

The reference compares doubles at 1e-6 relative tolerance and stores `index`
as FLOAT (its expected sums carry float-read noise like 59.02102279663086);
this engine reads the TSV as DOUBLE, so doubles assert at 2e-6 relative.
The reference's JavaScript extraction fns ('super-'+str) are ported through
the equivalent stringFormat extraction fn — the javascript surface is a
deliberate raise (README compat table).
"""

import pytest

from incubator_druid_spark import translate

FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]
SECOND = ["2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"]

COMMON_MAXMIN = [
    {"type": "count", "name": "rows"},
    {"type": "doubleSum", "name": "index", "fieldName": "index"},
    {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
    {"type": "doubleMin", "name": "minIndex", "fieldName": "index"},
]
ARIC = [{"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
         "fields": [{"type": "fieldAccess", "fieldName": "rows"},
                    {"type": "fieldAccess", "fieldName": "index"},
                    {"type": "constant", "value": 1}]}]


def topn(spark, cat, dim, metric, aggs=None, post=None, threshold=4,
         intervals=None, granularity="all", **extra):
    q = {"queryType": "topN", "dataSource": "wiki",
         "granularity": granularity, "intervals": intervals or FULL,
         "dimension": dim, "metric": metric, "threshold": threshold,
         "aggregations": COMMON_MAXMIN if aggs is None else aggs}
    if post is not None:
        q["postAggregations"] = post
    q.update(extra)
    return translate(q, spark, cat).collect()


def check(out, expected, rel=2e-6):
    """expected: ordered list of dicts; floats compared approximately."""
    assert len(out) == len(expected), [tuple(r) for r in out]
    for got, exp in zip(out, expected):
        for k, v in exp.items():
            g = got[k]
            if isinstance(v, float):
                assert g == pytest.approx(v, rel=rel), (k, g, v)
            else:
                assert g == v, (k, g, v)


# the 4 standard expected rows for "metric maxIndex over a retyped
# qualityLong-family dimension" — shared by 5 reference tests that differ
# only in how the dimension is produced
def _ql_family_rows(alias, vals):
    idx = [217725.41940800005, 210865.67977600006, 12270.807093,
           12086.472791]
    rows_ = [279, 279, 93, 93]
    mx = [1870.061029, 1862.737933, 277.273533, 193.787574]
    mn = [91.270553, 99.284525, 71.315931, 84.710523]
    return [{alias: v, "rows": r, "index": i,
             "addRowsIndexConstant": i + r + 1, "maxIndex": a, "minIndex": b}
            for v, r, i, a, b in zip(vals, rows_, idx, mx, mn)]


def test_full_on_topn_float_column(spark, wiki_catalog):
    """testFullOnTopNFloatColumn — the double `index` column grouped as a
    FLOAT-typed dimension, top-4 by summed index."""
    out = topn(spark, wiki_catalog,
               {"type": "default", "dimension": "index",
                "outputName": "index_alias", "outputType": "FLOAT"},
               "index", post=ARIC)
    check(out, [
        {"index_alias": pytest.approx(1000.0), "rows": 2, "index": 2000.0,
         "addRowsIndexConstant": 2003.0, "maxIndex": 1000.0,
         "minIndex": 1000.0},
        {"index_alias": pytest.approx(1870.061029, rel=1e-6), "rows": 1,
         "index": 1870.061029, "addRowsIndexConstant": 1872.06103515625,
         "maxIndex": 1870.061029, "minIndex": 1870.061029},
        {"index_alias": pytest.approx(1862.737933, rel=1e-6), "rows": 1,
         "index": 1862.737933, "addRowsIndexConstant": 1864.7379150390625,
         "maxIndex": 1862.737933, "minIndex": 1862.737933},
        {"index_alias": pytest.approx(1743.92175, rel=1e-6), "rows": 1,
         "index": 1743.92175, "addRowsIndexConstant": 1745.9217529296875,
         "maxIndex": 1743.92175, "minIndex": 1743.92175},
    ])


def test_full_on_topn_float_column_as_string(spark, wiki_catalog):
    """testFullOnTopNFloatColumnAsString — a native FLOAT column grouped
    with default (STRING) output renders Java-style ('14000.0')."""
    out = topn(spark, wiki_catalog,
               {"type": "default", "dimension": "qualityFloat",
                "outputName": "qf_alias"},
               "maxIndex", post=ARIC)
    check(out, _ql_family_rows(
        "qf_alias", ["14000.0", "16000.0", "10000.0", "12000.0"]))


def test_full_on_topn_long_column(spark, wiki_catalog):
    """testFullOnTopNLongColumn — native LONG dimension, top-4 by
    maxIndex."""
    out = topn(spark, wiki_catalog,
               {"type": "default", "dimension": "qualityLong",
                "outputName": "ql_alias", "outputType": "LONG"},
               "maxIndex", post=ARIC)
    check(out, _ql_family_rows("ql_alias", [1400, 1600, 1000, 1200]))


def test_full_on_topn_long_virtual_column(spark, wiki_catalog):
    """testFullOnTopNLongVirtualColumn — same rows through an expression
    virtual column."""
    out = topn(spark, wiki_catalog,
               {"type": "default", "dimension": "ql_expr",
                "outputName": "ql_alias", "outputType": "LONG"},
               "maxIndex", post=ARIC,
               virtualColumns=[{"type": "expression", "name": "ql_expr",
                                "expression": "qualityLong",
                                "outputType": "LONG"}])
    check(out, _ql_family_rows("ql_alias", [1400, 1600, 1000, 1200]))


def test_topn_string_virtual_column(spark, wiki_catalog):
    """testTopNStringVirtualColumn — string-concat virtual column dimension
    (market + ' ' + market), top by rows."""
    out = topn(spark, wiki_catalog, "vc", "rows", intervals=F2T,
               aggs=[{"type": "count", "name": "rows"},
                     {"type": "doubleSum", "name": "index",
                      "fieldName": "index"}],
               post=ARIC,
               virtualColumns=[{"type": "expression", "name": "vc",
                                "expression": "market + ' ' + market",
                                "outputType": "STRING"}])
    check(out, [
        {"vc": "spot spot", "rows": 18, "index": 2231.876812,
         "addRowsIndexConstant": 2250.876812},
        {"vc": "total_market total_market", "rows": 4, "index": 5351.814783,
         "addRowsIndexConstant": 5356.814783},
        {"vc": "upfront upfront", "rows": 4, "index": 4875.669692,
         "addRowsIndexConstant": 4880.669692},
    ])


def test_full_on_topn_numeric_string_as_long(spark, wiki_catalog):
    """testFullOnTopNNumericStringColumnAsLong."""
    out = topn(spark, wiki_catalog,
               {"type": "default", "dimension": "qualityNumericString",
                "outputName": "qns_alias", "outputType": "LONG"},
               "maxIndex", post=ARIC)
    check(out, _ql_family_rows(
        "qns_alias", [140000, 160000, 100000, 120000]))


def test_full_on_topn_numeric_string_as_float(spark, wiki_catalog):
    """testFullOnTopNNumericStringColumnAsFloat."""
    out = topn(spark, wiki_catalog,
               {"type": "default", "dimension": "qualityNumericString",
                "outputName": "qns_alias", "outputType": "FLOAT"},
               "maxIndex", post=ARIC)
    check(out, _ql_family_rows(
        "qns_alias", [140000.0, 160000.0, 100000.0, 120000.0]))


def test_full_on_topn_long_time_column(spark, wiki_catalog):
    """testFullOnTopNLongTimeColumn — __time retyped LONG groups by epoch
    millis; top-4 days by maxIndex."""
    out = topn(spark, wiki_catalog,
               {"type": "default", "dimension": "__time",
                "outputName": "time_alias", "outputType": "LONG"},
               "maxIndex", post=ARIC)
    check(out, [
        {"time_alias": 1296345600000, "rows": 13, "index": 5497.331253051758,
         "maxIndex": 1870.061029, "minIndex": 97.02391052246094},
        {"time_alias": 1298678400000, "rows": 13, "index": 6541.463027954102,
         "maxIndex": 1862.737933, "minIndex": 83.099365234375},
        {"time_alias": 1301529600000, "rows": 13, "index": 6814.467971801758,
         "maxIndex": 1734.27490234375, "minIndex": 93.39083862304688},
        {"time_alias": 1294876800000, "rows": 13, "index": 6077.949111938477,
         "maxIndex": 1689.0128173828125, "minIndex": 94.87471008300781},
    ], rel=2e-5)


def test_sort_on_double_as_long(spark, wiki_catalog):
    """testSortOnDoubleAsLong — the double index column retyped LONG
    (truncation collapses 59.021022/59.266595 into one 59 group), dimension
    NUMERIC ascending sort, no aggregators."""
    out = topn(spark, wiki_catalog,
               {"type": "default", "dimension": "index",
                "outputName": "index_alias", "outputType": "LONG"},
               {"type": "dimension", "ordering": "numeric"}, aggs=[])
    assert [r["index_alias"] for r in out] == [59, 67, 68, 69]


def test_sort_on_time_as_long(spark, wiki_catalog):
    """testSortOnTimeAsLong — __time as LONG, numeric dimension sort."""
    out = topn(spark, wiki_catalog,
               {"type": "default", "dimension": "__time",
                "outputName": "__time_alias", "outputType": "LONG"},
               {"type": "dimension", "ordering": "numeric"}, aggs=[])
    assert [r["__time_alias"] for r in out] == [
        1294790400000, 1294876800000, 1294963200000, 1295049600000]


def test_sort_on_string_as_double(spark, wiki_catalog):
    """testSortOnStringAsDouble — a non-numeric string dim cast DOUBLE is
    all-null → a single null row survives the dimension sort."""
    out = topn(spark, wiki_catalog,
               {"type": "default", "dimension": "market",
                "outputName": "alias", "outputType": "DOUBLE"},
               {"type": "dimension", "ordering": "numeric"}, aggs=[])
    assert len(out) == 1 and out[0]["alias"] is None


def test_sort_on_double_as_double(spark, wiki_catalog):
    """testSortOnDoubleAsDouble — no truncation: 59.021022 and 59.266595
    stay distinct groups."""
    out = topn(spark, wiki_catalog,
               {"type": "default", "dimension": "index",
                "outputName": "index_alias", "outputType": "DOUBLE"},
               {"type": "dimension", "ordering": "numeric"}, aggs=[])
    assert [r["index_alias"] for r in out] == pytest.approx(
        [59.021022, 59.266595, 67.73117, 68.573162], rel=1e-6)


def test_full_on_topn_string_output_as_long(spark, wiki_catalog):
    """testFullOnTopNStringOutputAsLong — strlen extraction fn with LONG
    outputType over `quality` ('mezzanine'→9, 'premium'→7, ...)."""
    out = topn(spark, wiki_catalog,
               {"type": "extraction", "dimension": "quality",
                "outputName": "alias", "outputType": "LONG",
                "extractionFn": {"type": "strlen"}},
               "maxIndex", post=ARIC)
    check(out, [
        {"alias": 9, "rows": 279, "index": 217725.41940800005,
         "maxIndex": 1870.061029, "minIndex": 91.270553},
        {"alias": 7, "rows": 279, "index": 210865.67977600006,
         "maxIndex": 1862.737933, "minIndex": 99.284525},
        {"alias": 10, "rows": 186, "index": 20479.497562408447,
         "maxIndex": 277.273533, "minIndex": 59.02102279663086},
        {"alias": 13, "rows": 93, "index": 12086.472791,
         "maxIndex": 193.787574, "minIndex": 84.710523},
    ])


def test_full_on_topn_string_format_extraction(spark, wiki_catalog):
    """testFullOnTopNFloatColumnWithExFn's shape via stringFormat (the
    reference uses a JavaScript 'super-'+str fn; stringFormat produces the
    same rendering for the non-float rows asserted here)."""
    out = topn(spark, wiki_catalog,
               {"type": "extraction", "dimension": "qualityLong",
                "outputName": "ql_alias",
                "extractionFn": {"type": "stringFormat",
                                 "format": "super-%s"}},
               "maxIndex", post=ARIC)
    check(out, _ql_family_rows(
        "ql_alias",
        ["super-1400", "super-1600", "super-1000", "super-1200"]))


def test_full_on_topn_decoration_on_numeric(spark, wiki_catalog):
    """testFullOnTopNDecorationOnNumeric — listFiltered whitelist over the
    native LONG column; in topN the pruned rows are SKIPPED (3 rows out,
    no null group — unlike groupBy)."""
    out = topn(spark, wiki_catalog,
               {"type": "listFiltered",
                "delegate": {"type": "default", "dimension": "qualityLong",
                             "outputName": "ql_alias", "outputType": "LONG"},
                "values": ["1200", "1400", "1600"], "isWhitelist": True},
               "maxIndex", post=ARIC)
    exp = _ql_family_rows("ql_alias", [1400, 1600, 1000, 1200])
    check(out, [exp[0], exp[1], exp[3]])


def test_full_on_topn_with_aggs_on_numeric_dims(spark, wiki_catalog):
    """testFullOnTopNWithAggsOnNumericDims (full combination) — longSum and
    doubleSum over the native numeric dimension columns, top by index."""
    out = topn(spark, wiki_catalog, "market", "index", post=ARIC,
               aggs=COMMON_MAXMIN + [
                   {"type": "longSum", "name": "qlLong",
                    "fieldName": "qualityLong"},
                   {"type": "doubleSum", "name": "qlFloat",
                    "fieldName": "qualityLong"},
                   {"type": "doubleSum", "name": "qfFloat",
                    "fieldName": "qualityFloat"},
                   {"type": "longSum", "name": "qfLong",
                    "fieldName": "qualityFloat"}])
    check(out, [
        {"market": "total_market", "rows": 186, "index": 215679.82879638672,
         "addRowsIndexConstant": 215866.82879638672, "maxIndex": 1743.92175,
         "minIndex": 792.3260498046875, "qlLong": 279000,
         "qlFloat": 279000.0, "qfFloat": 2790000.0, "qfLong": 2790000},
        {"market": "upfront", "rows": 186, "index": 192046.1060180664,
         "addRowsIndexConstant": 192233.1060180664, "maxIndex": 1870.061029,
         "minIndex": 545.9906005859375, "qlLong": 279000,
         "qlFloat": 279000.0, "qfFloat": 2790000.0, "qfLong": 2790000},
        {"market": "spot", "rows": 837, "index": 95606.57232284546,
         "addRowsIndexConstant": 96444.57232284546, "maxIndex": 277.273533,
         "minIndex": 59.02102279663086, "qlLong": 1171800,
         "qlFloat": 1171800.0, "qfFloat": 11718000.0, "qfLong": 11718000},
    ])


def test_full_on_topn_bound_filter_empty(spark, wiki_catalog):
    """testFullOnTopNBoundFilterAndLongSumMetric — an impossible numeric
    bound (0 < index < 46.6, both exclusive, below the min) returns an
    EMPTY result, not an error (apache/druid#4628 regression)."""
    out = topn(spark, wiki_catalog, {"type": "default",
                                     "dimension": "market",
                                     "outputName": "Market"},
               "Count",
               aggs=[{"type": "longSum", "name": "Count",
                      "fieldName": "qualityLong"}],
               threshold=5,
               filter={"type": "bound", "dimension": "index",
                       "lower": "0", "upper": "46.64980229268867",
                       "lowerStrict": True, "upperStrict": True,
                       "ordering": "numeric"})
    assert out == []


def test_topn_with_non_bitmap_filter(spark, wiki_catalog):
    """testTopNWithNonBitmapFilter — numeric bound on __time completes
    (apache/druid#5132 regression)."""
    out = topn(spark, wiki_catalog, "market", "count", intervals=F2T,
               aggs=[{"type": "doubleSum", "name": "count",
                      "fieldName": "qualityDouble"}],
               filter={"type": "bound", "dimension": "__time",
                       "lower": "0", "upper": str(2**63 - 1),
                       "lowerStrict": True, "upperStrict": True,
                       "ordering": "numeric"})
    assert len(out) == 3


@pytest.mark.parametrize("col", ["longNumericNull", "floatNumericNull",
                                 "doubleNumericNull"])
def test_topn_order_by_numeric_column_with_nulls(col, spark, wiki_catalog):
    """test_topN_orderBy{Long,Float,Double}NumericColumnWithNulls_returns-
    DescendingResults — null metric values rank smallest (the aggregator
    factory's nullsFirst comparator), so descending order puts day 2's 3
    null-metric index groups LAST of 13; ties keep dimension order."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": SECOND,
         "dimension": {"type": "default", "dimension": "index",
                       "outputName": "index_alias", "outputType": "LONG"},
         "metric": col, "threshold": 10000,
         "aggregations": [{"type": "longSum", "name": col,
                           "fieldName": col}]}
    out = [(r["index_alias"], r[col])
           for r in translate(q, spark, wiki_catalog).collect()]
    exp = [(97, 80), (135, 70), (1049, 70), (1321, 70), (110, 50),
           (1144, 50), (1193, 50), (113, 40), (112, 20), (147, 10),
           (114, None), (126, None), (166, None)]
    assert out == exp


def test_topn_aggregate_on_numeric_null_columns(spark, wiki_catalog):
    """testAggregateOnLongNumericNull / Double / Float — grouping on a
    nullable numeric column keeps the null group; numeric dimension sort
    puts null FIRST."""
    for col, typ in [("longNumericNull", "LONG"),
                     ("doubleNumericNull", "DOUBLE"),
                     ("floatNumericNull", "FLOAT")]:
        out = topn(spark, wiki_catalog,
                   {"type": "default", "dimension": col,
                    "outputName": "dim", "outputType": typ},
                   {"type": "dimension", "ordering": "numeric"},
                   aggs=[{"type": "count", "name": "count"}],
                   threshold=10000)
        got = [(r["dim"], r["count"]) for r in out]
        vals = [None, 10, 20, 40, 50, 70, 80]
        counts = [279, 93, 93, 93, 279, 279, 93]
        exp = [(None if v is None else (float(v) if typ != "LONG" else v), c)
               for v, c in zip(vals, counts)]
        assert got == exp, (col, got)


def test_topn_expression_aggregator(spark, wiki_catalog):
    """testExpressionAggregator — expressionLambda aggregators: a zero-field
    count, a sum, a decomposed sum (array combine + fold finalize), and a
    distinct-set array agg."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": FULL, "dimension": "market",
         "metric": "diy_count", "threshold": 4,
         "aggregations": [
             {"type": "expression", "name": "diy_count", "fields": [],
              "initialValue": "0", "fold": "__acc + 1",
              "combine": "__acc + diy_count"},
             {"type": "expression", "name": "diy_sum", "fields": ["index"],
              "initialValue": "0.0", "fold": "__acc + index"},
             {"type": "expression", "name": "diy_decomposed_sum",
              "fields": ["index"], "initialValue": "0.0",
              "initialCombineValue": "<DOUBLE>[]",
              "fold": "__acc + index",
              "combine": "array_concat(__acc, diy_decomposed_sum)",
              "finalize": "fold((x, acc) -> x + acc, o, 0.0)"},
             {"type": "expression", "name": "array_agg_distinct",
              "fields": ["quality"], "accumulatorIdentifier": "acc",
              "initialValue": "[]",
              "fold": "array_set_add(acc, quality)",
              "combine": "array_set_add_all(acc, array_agg_distinct)"}]}
    out = {r["market"]: r for r in translate(q, spark, wiki_catalog).collect()}
    assert set(out) == {"spot", "total_market", "upfront"}
    assert out["spot"]["diy_count"] == 837
    assert out["spot"]["diy_sum"] == pytest.approx(95606.57232284546,
                                                   rel=2e-6)
    assert out["spot"]["diy_decomposed_sum"] == pytest.approx(
        95606.57232284546, rel=2e-6)
    assert sorted(out["spot"]["array_agg_distinct"]) == [
        "automotive", "business", "entertainment", "health", "mezzanine",
        "news", "premium", "technology", "travel"]
    for mk, cnt, s in [("total_market", 186, 215679.82879638672),
                       ("upfront", 186, 192046.1060180664)]:
        assert out[mk]["diy_count"] == cnt
        assert out[mk]["diy_sum"] == pytest.approx(s, rel=2e-6)
        assert sorted(out[mk]["array_agg_distinct"]) == ["mezzanine",
                                                         "premium"]


def test_alphanumeric_topn_with_null_previous_stop(spark, wiki_catalog):
    """testAlphaNumericTopNWithNullPreviousStop — dimension spec with the
    ALPHANUMERIC comparator and no previousStop."""
    out = topn(spark, wiki_catalog, "market",
               {"type": "dimension", "ordering": "alphanumeric"},
               aggs=[{"type": "count", "name": "rows"}],
               threshold=2, intervals=SECOND)
    assert [(r["market"], r["rows"]) for r in out] == [
        ("spot", 9), ("total_market", 2)]


def test_numeric_dimension_topn_with_null_previous_stop(spark, wiki_catalog):
    """testNumericDimensionTopNWithNullPreviousStop — NUMERIC comparator
    over non-numeric strings: all parse to null → sort-key ties, stable
    outcome matches the reference (spot, total_market)."""
    out = topn(spark, wiki_catalog, "market",
               {"type": "dimension", "ordering": "numeric"},
               aggs=[{"type": "count", "name": "rows"}],
               threshold=2, intervals=SECOND)
    assert [(r["market"], r["rows"]) for r in out] == [
        ("spot", 9), ("total_market", 2)]


def test_topn_over_null_dimension(spark, wiki_catalog):
    """testTopNOverNullDimension — a nonexistent dimension reads as one
    all-null group over every row."""
    out = topn(spark, wiki_catalog, "null_column", "index", post=ARIC)
    check(out, [{"null_column": None, "rows": 1209,
                 "index": 503332.5071372986,
                 "addRowsIndexConstant": 504542.5071372986,
                 "maxIndex": 1870.061029,
                 "minIndex": 59.02102279663086}])


def test_topn_over_null_dimension_with_filter(spark, wiki_catalog):
    """testTopNOverNullDimensionWithFilter — selector(null) on the
    nonexistent column matches everything."""
    out = topn(spark, wiki_catalog, "null_column", "index", post=ARIC,
               filter={"type": "selector", "dimension": "null_column",
                       "value": None})
    check(out, [{"null_column": None, "rows": 1209,
                 "index": 503332.5071372986,
                 "maxIndex": 1870.061029, "minIndex": 59.02102279663086}])


def test_topn_over_partial_null_dimension(spark, wiki_catalog):
    """testTopNOverPartialNullDimension (+ the two filtered variants) —
    a column null for most rows groups into (null, 'value')."""
    base = dict(aggs=[{"type": "count", "name": "rows"},
                      {"type": "doubleSum", "name": "index",
                       "fieldName": "index"}],
                threshold=1000, intervals=F2T)
    out = topn(spark, wiki_catalog, "partial_null_column", "rows", **base)
    got = {r["partial_null_column"]: (r["rows"], r["index"]) for r in out}
    assert got[None][0] == 22
    assert got[None][1] == pytest.approx(7583.691513061523, rel=2e-5)
    assert got["value"][0] == 4
    assert got["value"][1] == pytest.approx(4875.669692, rel=2e-6)
    # filter on the null value keeps only the null group
    out = topn(spark, wiki_catalog, "partial_null_column", "rows",
               filter={"type": "selector",
                       "dimension": "partial_null_column", "value": None},
               **base)
    assert len(out) == 1 and out[0]["partial_null_column"] is None
    assert out[0]["rows"] == 22
    # filter on the not-null value keeps only 'value'
    out = topn(spark, wiki_catalog, "partial_null_column", "rows",
               filter={"type": "selector",
                       "dimension": "partial_null_column",
                       "value": "value"},
               **base)
    assert len(out) == 1 and out[0]["partial_null_column"] == "value"
    assert out[0]["rows"] == 4


# --------------------------------------------------------------------------
# TimeseriesQueryRunnerTest tranche
# --------------------------------------------------------------------------

TS_COMMON = [
    {"type": "count", "name": "rows"},
    {"type": "doubleSum", "name": "index", "fieldName": "index"},
]


def ts(spark, cat, aggs, intervals=None, granularity="all", post=None,
       **extra):
    q = {"queryType": "timeseries", "dataSource": "wiki",
         "granularity": granularity, "intervals": intervals or F2T,
         "aggregations": aggs}
    if post is not None:
        q["postAggregations"] = post
    q.update(extra)
    return translate(q, spark, cat).collect()


def test_ts_filtered_agg(spark, wiki_catalog):
    """testTimeSeriesWithFilteredAgg — filtered count vs unfiltered sums in
    one pass."""
    out = ts(spark, wiki_catalog,
             TS_COMMON + [{"type": "filtered",
                           "filter": {"type": "selector",
                                      "dimension": "market",
                                      "value": "spot"},
                           "aggregator": {"type": "count",
                                          "name": "filteredAgg"}}],
             post=ARIC)
    assert len(out) == 1
    r = out[0]
    assert r["filteredAgg"] == 18 and r["rows"] == 26
    assert r["index"] == pytest.approx(12459.361190795898, rel=2e-6)
    assert r["addRowsIndexConstant"] == pytest.approx(12486.361190795898,
                                                      rel=2e-6)


def test_ts_filtered_and_expression_filtered_agg(spark, wiki_catalog):
    """testTimeSeriesWithFilteredAggAndExpressionFilteredAgg — the same
    count expressed as long/double/float sums over an if() expression."""
    out = ts(spark, wiki_catalog,
             TS_COMMON + [
                 {"type": "filtered",
                  "filter": {"type": "selector", "dimension": "market",
                             "value": "spot"},
                  "aggregator": {"type": "count", "name": "filteredAgg"}},
                 {"type": "longSum", "name": "altLongCount",
                  "expression": "if (market == 'spot', 1, 0)"},
                 {"type": "doubleSum", "name": "altDoubleCount",
                  "expression": "if (market == 'spot', 1, 0)"},
                 {"type": "floatSum", "name": "altFloatCount",
                  "expression": "if (market == 'spot', 1, 0)"}])
    r = out[0]
    assert (r["filteredAgg"], r["altLongCount"], r["altDoubleCount"],
            r["altFloatCount"]) == (18, 18, 18.0, 18.0)


def test_ts_filtered_agg_nonexistent_dimension(spark, wiki_catalog):
    """testTimeSeriesWithFilteredAggDimensionNotPresent{Not,}NullValue —
    a filter on a nonexistent column matches nothing for a value, and
    everything for null."""
    out = ts(spark, wiki_catalog,
             TS_COMMON + [{"type": "filtered",
                           "filter": {"type": "selector",
                                      "dimension": "abraKaDabra",
                                      "value": "Lol"},
                           "aggregator": {"type": "count",
                                          "name": "filteredAgg"}}])
    assert out[0]["filteredAgg"] == 0
    out = ts(spark, wiki_catalog,
             TS_COMMON + [{"type": "filtered",
                           "filter": {"type": "selector",
                                      "dimension": "abraKaDabra",
                                      "value": None},
                           "aggregator": {"type": "count",
                                          "name": "filteredAgg"}}])
    assert out[0]["filteredAgg"] == 26


def test_ts_filtered_agg_not_filters(spark, wiki_catalog):
    """testTimeSeriesWithFilteredAggValueNotPresent +
    InvertedNullValue — NOT of a never-matching selector counts all rows;
    NOT null on a never-null column too."""
    for val in ("LolLol", None):
        out = ts(spark, wiki_catalog,
                 TS_COMMON + [{"type": "filtered",
                               "filter": {"type": "not",
                                          "field": {"type": "selector",
                                                    "dimension": "market",
                                                    "value": val}},
                               "aggregator": {"type": "count",
                                              "name": "filteredAgg"}}])
        assert out[0]["filteredAgg"] == 26, val


def test_ts_time_column_long_sum(spark, wiki_catalog):
    """testTimeseriesWithTimeColumn — longSum over __time sums epoch
    millis (the JS aggregator branch is the deliberate raise)."""
    out = ts(spark, wiki_catalog,
             [{"type": "count", "name": "rows"},
              {"type": "longSum", "name": "sumtime",
               "fieldName": "__time"}])
    assert out[0]["rows"] == 26 and out[0]["sumtime"] == 33843139200000


def test_ts_bound_filter_and(spark, wiki_catalog):
    """testTimeseriesWithBoundFilter1 — three ANDed lexicographic bounds
    pin market == 'spot' exactly."""
    out = ts(spark, wiki_catalog,
             [{"type": "count", "name": "rows"},
              {"type": "longSum", "name": "index", "fieldName": "index"}],
             granularity="day",
             filter={"type": "and", "fields": [
                 {"type": "bound", "dimension": "market", "lower": "spa",
                  "upper": "spot", "lowerStrict": True},
                 {"type": "bound", "dimension": "market", "lower": "spot",
                  "upper": "spotify", "upperStrict": True},
                 {"type": "bound", "dimension": "market", "lower": "SPOT",
                  "upper": "spot"}]})
    got = [(str(r["__time"])[:10], r["rows"], r["index"]) for r in out]
    assert got == [("2011-04-01", 9, 1102), ("2011-04-02", 9, 1120)]


def test_ts_selector_with_lookup_extraction_fn(spark, wiki_catalog):
    """testTimeSeriesWithSelectionFilterLookupExtractionFn — selector
    value 'upfront' matched AFTER a lookup maps spot→upfront with
    retainMissingValue, so spot+upfront rows both match."""
    out = ts(spark, wiki_catalog,
             [{"type": "count", "name": "rows"},
              {"type": "longSum", "name": "index", "fieldName": "index"}],
             granularity="day",
             filter={"type": "selector", "dimension": "market",
                     "value": "upfront",
                     "extractionFn": {
                         "type": "lookup",
                         "lookup": {"type": "map",
                                    "map": {"spot": "upfront"}},
                         "retainMissingValue": True}})
    got = [(str(r["__time"])[:10], r["rows"], r["index"]) for r in out]
    assert got == [("2011-04-01", 11, 3783), ("2011-04-02", 11, 3313)]


def test_ts_with_limit(spark, wiki_catalog):
    """testTimeseriesWithLimit — day series over the full interval capped
    at 10 buckets."""
    out = ts(spark, wiki_catalog,
             [{"type": "count", "name": "rows"}],
             intervals=FULL, granularity="day", limit=10)
    assert len(out) == 10


def test_ts_cardinality_on_expression_virtual_column(spark, wiki_catalog):
    """testTimeseriesCardinalityAggOnMultiStringExpression — cardinality
    over a concat virtual column; 13 distinct (quality,market) combos (the
    reference asserts its HLL estimate 13.04; this engine is exact)."""
    out = ts(spark, wiki_catalog,
             [{"type": "count", "name": "rows"},
              {"type": "cardinality", "name": "numVals",
               "fields": ["v0"], "byRow": False}],
             virtualColumns=[{"type": "expression", "name": "v0",
                              "expression": "concat(quality,market)",
                              "outputType": "STRING"}])
    assert out[0]["rows"] == 26
    assert round(float(out[0]["numVals"])) == 13


def test_filter_extraction_fn_over_time_sees_millis(spark, wiki_catalog):
    """A string-shaped extraction fn inside a FILTER over __time sees the
    millis rendering — selector on substring(0,13) of '1301616000000'
    matches exactly the 2011-04-01 rows (same rule as dimension specs)."""
    q = {"queryType": "timeseries", "dataSource": "wiki",
         "granularity": "all", "intervals": F2T,
         "filter": {"type": "selector", "dimension": "__time",
                    "value": "1301616000000",
                    "extractionFn": {"type": "substring", "index": 0,
                                     "length": 13}},
         "aggregations": [{"type": "count", "name": "rows"}]}
    out = translate(q, spark, wiki_catalog).collect()
    assert out[0]["rows"] == 13


# --------------------------------------------------------------------------
# SearchQueryRunnerTest tranche
# --------------------------------------------------------------------------

def search(spark, cat, q=None, dims=None, intervals=None, sort=None,
           **extra):
    qry = {"queryType": "search", "dataSource": "wiki",
           "granularity": "all", "intervals": intervals or FULL}
    if q is not None:
        qry["query"] = q
    if dims is not None:
        qry["searchDimensions"] = dims
    if sort is not None:
        qry["sort"] = {"type": sort}
    qry.update(extra)
    return [(r["dimension"], r["value"], r["count"])
            for r in translate(qry, spark, wiki_cat_holder[0]).collect()]


wiki_cat_holder = [None]


@pytest.fixture(autouse=True)
def _hold_wiki(wiki_catalog):
    wiki_cat_holder[0] = wiki_catalog


def test_search_default_dimensions_include_mvd(spark, wiki_catalog):
    """testSearch — no searchDimensions searches every string dim INCLUDING
    the multi-value placementish and the partial-null column."""
    got = set(search(spark, wiki_catalog,
                     q={"type": "insensitive_contains", "value": "a"}))
    assert got == {
        ("quality", "automotive", 93), ("quality", "mezzanine", 279),
        ("quality", "travel", 93), ("quality", "health", 93),
        ("quality", "entertainment", 93),
        ("market", "total_market", 186),
        ("placementish", "a", 93),
        ("partial_null_column", "value", 186)}


def test_search_same_value_in_multi_dims(spark, wiki_catalog):
    """testSearchSameValueInMultiDims / testSearchSameValueInMultiDims2 —
    'preferred' appears in both placement and placementish; the second
    method's strlen sort puts 'e' first (and placement before placementish
    on the tie)."""
    got = set(search(spark, wiki_catalog,
                     q={"type": "insensitive_contains", "value": "e"},
                     dims=["placement", "placementish"]))
    assert got == {("placement", "preferred", 1209),
                   ("placementish", "e", 93),
                   ("placementish", "preferred", 1209)}
    ordered = search(spark, wiki_catalog,
                     q={"type": "insensitive_contains", "value": "e"},
                     dims=["placement", "placementish"], sort="strlen")
    assert ordered == [("placementish", "e", 93),
                       ("placement", "preferred", 1209),
                       ("placementish", "preferred", 1209)]


def test_search_with_filters(spark, wiki_catalog):
    """testSearchWithSingleFilter1/2 + MultiAndFilter + WithMultiOrFilter +
    WithFilterEmptyResults."""
    and_f = {"type": "and", "fields": [
        {"type": "selector", "dimension": "market",
         "value": "total_market"},
        {"type": "selector", "dimension": "quality", "value": "mezzanine"}]}
    assert search(spark, wiki_catalog,
                  q={"type": "insensitive_contains", "value": "a"},
                  dims=["quality"], filter=and_f) == [
        ("quality", "mezzanine", 93)]
    assert search(spark, wiki_catalog,
                  q={"type": "insensitive_contains", "value": "a"},
                  dims=["market"],
                  filter={"type": "selector", "dimension": "market",
                          "value": "total_market"}) == [
        ("market", "total_market", 186)]
    spot_auto = {"type": "and", "fields": [
        {"type": "selector", "dimension": "market", "value": "spot"},
        {"type": "selector", "dimension": "quality",
         "value": "automotive"}]}
    assert search(spark, wiki_catalog,
                  q={"type": "insensitive_contains", "value": "a"},
                  dims=["quality"], filter=spot_auto) == [
        ("quality", "automotive", 93)]
    or_f = {"type": "or", "fields": [
        {"type": "selector", "dimension": "quality",
         "value": "total_market"},
        {"type": "selector", "dimension": "quality",
         "value": "automotive"}]}
    assert search(spark, wiki_catalog,
                  q={"type": "insensitive_contains", "value": "a"},
                  dims=["quality"], filter=or_f) == [
        ("quality", "automotive", 93)]
    # total_market + automotive can't coexist → empty
    tm_auto = {"type": "and", "fields": [
        {"type": "selector", "dimension": "market",
         "value": "total_market"},
        {"type": "selector", "dimension": "quality",
         "value": "automotive"}]}
    assert search(spark, wiki_catalog,
                  q={"type": "insensitive_contains", "value": "a"},
                  filter=tm_auto) == []


def test_search_empty_and_nonexistent(spark, wiki_catalog):
    """testSearchWithEmptyResults + testSearchNonExistingDimension."""
    assert search(spark, wiki_catalog,
                  q={"type": "insensitive_contains",
                     "value": "abcd123"}) == []
    assert search(spark, wiki_catalog,
                  q={"type": "insensitive_contains", "value": "a"},
                  dims=["does_not_exist"]) == []


def test_search_all_values(spark, wiki_catalog):
    """testSearchAll — an empty query string AND a missing query both match
    every value."""
    exp = [("market", "spot", 837), ("market", "total_market", 186),
           ("market", "upfront", 186)]
    assert search(spark, wiki_catalog, q="", dims=["market"]) == exp
    assert search(spark, wiki_catalog, dims=["market"]) == exp


def test_search_with_numeric_sort(spark, wiki_catalog):
    """testSearchWithNumericSort — non-numeric values tie under the NUMERIC
    comparator and fall back to lexicographic."""
    got = search(spark, wiki_catalog,
                 q={"type": "insensitive_contains", "value": "a"},
                 sort="numeric")
    assert got == [
        ("placementish", "a", 93), ("quality", "automotive", 93),
        ("quality", "entertainment", 93), ("quality", "health", 93),
        ("quality", "mezzanine", 279), ("market", "total_market", 186),
        ("quality", "travel", 93), ("partial_null_column", "value", 186)]


# --------------------------------------------------------------------------
# ScanQueryRunnerTest tranche
# --------------------------------------------------------------------------

I2D = ["2011-01-12T00:00:00.000Z/2011-01-14T00:00:00.000Z"]


def test_scan_with_filter_lookup_extraction_fn(spark, wiki_catalog):
    """testSelectWithFilterLookupExtractionFn — scan filtered through a
    lookup extraction (total_market→replaced), two columns projected."""
    q = {"queryType": "scan", "dataSource": "wiki", "intervals": I2D,
         "filter": {"type": "selector", "dimension": "market",
                    "value": "replaced",
                    "extractionFn": {
                        "type": "lookup",
                        "lookup": {"type": "map",
                                   "map": {"total_market": "replaced"}},
                        "injective": True}},
         "columns": ["quality", "index"]}
    out = sorted((r["quality"], r["index"])
                 for r in translate(q, spark, wiki_catalog).collect())
    assert out == [("mezzanine", 1000.0),
                   ("mezzanine", pytest.approx(1040.945505, rel=1e-6)),
                   ("premium", 1000.0),
                   ("premium", pytest.approx(1689.012875, rel=1e-6))]


def test_scan_no_results_and_unknown_columns(spark, wiki_catalog):
    """testFullSelectNoResults (contradictory AND → empty) +
    testFullSelectNoDimensionAndMetric (unknown columns project as NULL for
    every interval row)."""
    q = {"queryType": "scan", "dataSource": "wiki", "intervals": I2D,
         "filter": {"type": "and", "fields": [
             {"type": "selector", "dimension": "market", "value": "spot"},
             {"type": "selector", "dimension": "market", "value": "foo"}]}}
    assert translate(q, spark, wiki_catalog).count() == 0
    q2 = {"queryType": "scan", "dataSource": "wiki", "intervals": I2D,
          "columns": ["foo", "foo2"]}
    out = translate(q2, spark, wiki_catalog).collect()
    assert len(out) == 26
    assert all(r["foo"] is None and r["foo2"] is None for r in out)


def test_scan_time_ordering_with_limit(spark, wiki_catalog):
    """testFullOnSelectWithFilterLimitAnd{Asc,Desc}endingTimeOrdering — the
    spot rows ordered by __time asc/desc under varying limits."""
    for order, cmp_key in [("ascending", lambda ts: ts),
                          ("descending", lambda ts: -ts)]:
        for limit in (3, 1, 5, 7):
            q = {"queryType": "scan", "dataSource": "wiki",
                 "intervals": I2D, "order": order, "limit": limit,
                 "filter": {"type": "selector", "dimension": "market",
                            "value": "spot"},
                 "columns": ["__time", "quality", "index"]}
            out = translate(q, spark, wiki_catalog).collect()
            assert len(out) == min(limit, 18)
            stamps = [r["__time"].timestamp() for r in out]
            assert stamps == sorted(stamps, reverse=(order == "descending"))


def test_topn_collapsing_dim_extraction(spark, wiki_catalog):
    """testTopNCollapsingDimExtraction — regex '.(.)' (second character)
    collapses the 9 qualities into letter groups; both the doubleSum and the
    negative-expression aggregator phases."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": FULL,
         "dimension": {"type": "extraction", "dimension": "quality",
                       "outputName": "quality",
                       "extractionFn": {"type": "regex", "expr": ".(.)"}},
         "metric": "index", "threshold": 2,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "doubleSum", "name": "index", "fieldName": "index"}],
         "postAggregations": ARIC}
    out = [(r["quality"], r["rows"], r["index"], r["addRowsIndexConstant"])
           for r in translate(q, spark, wiki_catalog).collect()]
    assert len(out) == 2
    assert out[0][0] == "e" and out[0][1] == 558
    assert out[0][2] == pytest.approx(246645.1204032898, rel=2e-6)
    assert out[1][0] == "r" and out[1][1] == 372
    assert out[1][2] == pytest.approx(222051.08961486816, rel=2e-6)
    q2 = dict(q, aggregations=[
        {"type": "count", "name": "rows"},
        {"type": "doubleSum", "name": "index",
         "expression": "-index + 100"}])
    out2 = [(r["quality"], r["rows"], r["index"])
            for r in translate(q2, spark, wiki_catalog).collect()]
    assert out2[0][0] == "n" and out2[0][1] == 93
    assert out2[0][2] == pytest.approx(-2786.4727909999997, rel=2e-6)
    assert out2[1][0] == "u" and out2[1][1] == 186
    assert out2[1][2] == pytest.approx(-3949.824348000002, rel=2e-6)


def test_topn_dim_extraction_first_char(spark, wiki_catalog):
    """testTopNDimExtraction — regex '(.)' first character of market; tie
    at 4 rows breaks by dimension ascending (t before u)."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": F2T,
         "dimension": {"type": "extraction", "dimension": "market",
                       "outputName": "market",
                       "extractionFn": {"type": "regex", "expr": "(.)"}},
         "metric": "rows", "threshold": 4,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "doubleSum", "name": "index", "fieldName": "index"}],
         "postAggregations": ARIC}
    out = [(r["market"], r["rows"], r["index"])
           for r in translate(q, spark, wiki_catalog).collect()]
    assert out[0][0] == "s" and out[0][1] == 18
    assert out[0][2] == pytest.approx(2231.876812, rel=2e-6)
    assert {(o[0], o[1]) for o in out[1:]} == {("t", 4), ("u", 4)}
    assert out[1][2] + out[2][2] == pytest.approx(5351.814783 + 4875.669692,
                                                  rel=2e-6)


def test_topn_with_extraction_filter(spark, wiki_catalog):
    """testTopNWithExtractionFilter — extraction filter (spot→spot0) keeps
    only spot rows; top by rows."""
    out = topn(spark, wiki_catalog, "market", "rows", threshold=3,
               intervals=F2T,
               aggs=[{"type": "count", "name": "rows"},
                     {"type": "doubleSum", "name": "index",
                      "fieldName": "index"}],
               post=ARIC,
               filter={"type": "extraction", "dimension": "market",
                       "value": "spot0",
                       "extractionFn": {
                           "type": "lookup",
                           "lookup": {"type": "map",
                                      "map": {"spot": "spot0"}}}})
    assert len(out) == 1
    r = out[0]
    assert (r["market"], r["rows"]) == ("spot", 18)
    assert r["index"] == pytest.approx(2231.876812, rel=2e-6)
    assert r["addRowsIndexConstant"] == pytest.approx(2250.876812, rel=2e-6)


def test_topn_with_null_producing_dim_extraction_fn(spark, wiki_catalog):
    """testTopNWithNullProducingDimExtractionFn — an extraction that nulls
    one value (lookup miss) keeps the NULL group as a regular topN row
    (unlike filtered dimension specs, which skip)."""
    out = topn(spark, wiki_catalog,
               {"type": "extraction", "dimension": "market",
                "outputName": "market",
                "extractionFn": {"type": "lookup",
                                 "lookup": {"type": "map",
                                            "map": {"spot": "spot",
                                                    "upfront": "upfront"}}}},
               "rows", threshold=4, intervals=F2T,
               aggs=[{"type": "count", "name": "rows"},
                     {"type": "doubleSum", "name": "index",
                      "fieldName": "index"}],
               post=ARIC)
    assert len(out) == 3
    assert (out[0]["market"], out[0]["rows"]) == ("spot", 18)
    tail = {r["market"]: (r["rows"], round(r["index"], 4)) for r in out[1:]}
    assert tail == {None: (4, 5351.8148), "upfront": (4, 4875.6697)}


def test_full_on_topn_over_post_aggs(spark, wiki_catalog):
    """testFullOnTopNOverPostAggs — the topN METRIC is a post-aggregated
    column (addRowsIndexConstant)."""
    out = topn(spark, wiki_catalog, "market", "addRowsIndexConstant",
               post=ARIC)
    check(out, [
        {"market": "total_market", "rows": 186,
         "index": 215679.82879638672,
         "addRowsIndexConstant": 215866.82879638672,
         "maxIndex": 1743.92175, "minIndex": 792.3260498046875},
        {"market": "upfront", "rows": 186, "index": 192046.1060180664,
         "addRowsIndexConstant": 192233.1060180664,
         "maxIndex": 1870.061029, "minIndex": 545.9906005859375},
        {"market": "spot", "rows": 837, "index": 95606.57232284546,
         "addRowsIndexConstant": 96444.57232284546,
         "maxIndex": 277.273533, "minIndex": 59.02102279663086},
    ])


def test_topn_dependent_post_agg(spark, wiki_catalog):
    """testTopNDependentPostAgg — a post-agg REFERENCING another post-agg
    (dependent = addRowsIndexConstant + rows + 1) used as the topN metric,
    plus a hyperUniqueCardinality-based post-agg (+1)."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": FULL, "dimension": "market",
         "metric": "dependentPostAgg", "threshold": 4,
         "aggregations": COMMON_MAXMIN + [
             {"type": "hyperUnique", "name": "uniques",
              "fieldName": "quality"}],
         "postAggregations": ARIC + [
             {"type": "arithmetic", "name": "dependentPostAgg", "fn": "+",
              "fields": [{"type": "fieldAccess",
                          "fieldName": "addRowsIndexConstant"},
                         {"type": "fieldAccess", "fieldName": "rows"},
                         {"type": "constant", "value": 1}]},
             {"type": "arithmetic", "name": "hyperUniqueFinalizingPostAggMetric",
              "fn": "+",
              "fields": [{"type": "hyperUniqueCardinality",
                          "fieldName": "uniques"},
                         {"type": "constant", "value": 1}]}]}
    out = translate(q, spark, wiki_catalog).collect()
    exp = [("total_market", 186, 215679.82879638672, 216053.82879638672, 2),
           ("upfront", 186, 192046.1060180664, 192420.1060180664, 2),
           ("spot", 837, 95606.57232284546, 97282.57232284546, 9)]
    assert len(out) == 3
    for r, (mk, rows_, idx, dep, uq) in zip(out, exp):
        assert r["market"] == mk and r["rows"] == rows_
        assert r["index"] == pytest.approx(idx, rel=2e-6)
        assert r["dependentPostAgg"] == pytest.approx(dep, rel=2e-6)
        assert r["hyperUniqueFinalizingPostAggMetric"] == pytest.approx(
            uq + 1, abs=0.25)


def test_topn_with_time_column_sum(spark, wiki_catalog):
    """testTopNWithTimeColumn's shape — longSum over __time as a topN
    metric column sums epoch millis per market."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": F2T, "dimension": "market",
         "metric": "rows", "threshold": 3,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "sumtime", "fieldName": "__time"}]}
    out = [(r["market"], r["rows"], r["sumtime"])
           for r in translate(q, spark, wiki_catalog).collect()]
    assert out[0] == ("spot", 18, 23429865600000)
    assert {(o[0], o[1], o[2]) for o in out[1:]} == {
        ("total_market", 4, 5206636800000), ("upfront", 4, 5206636800000)}


def test_topn_time_extraction_day_name(spark, wiki_catalog):
    """testTopNTimeExtraction — timeFormat('EEEE') day-name dimension, top-2
    by summed index."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": FULL,
         "dimension": {"type": "extraction", "dimension": "__time",
                       "outputName": "dayOfWeek",
                       "extractionFn": {"type": "timeFormat",
                                        "format": "EEEE"}},
         "metric": "index", "threshold": 2,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "doubleSum", "name": "index", "fieldName": "index"}],
         "postAggregations": ARIC}
    out = [(r["dayOfWeek"], r["rows"], r["index"])
           for r in translate(q, spark, wiki_catalog).collect()]
    assert out[0][0] == "Wednesday" and out[0][1] == 182
    assert out[0][2] == pytest.approx(76010.28100585938, rel=2e-6)
    assert out[1][0] == "Thursday" and out[1][1] == 182
    assert out[1][2] == pytest.approx(75203.26300811768, rel=2e-6)


def test_topn_query_by_complex_metric(spark, wiki_catalog):
    """testTopNQueryByComplexMetric — the topN METRIC is a cardinality
    aggregate (exact here; ordering matches the reference's estimates)."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": F2T, "dimension": "market",
         "metric": {"type": "numeric", "metric": "numVals"},
         "threshold": 10,
         "aggregations": [{"type": "cardinality", "name": "numVals",
                           "fields": ["quality"], "byRow": False}]}
    out = [(r["market"], round(float(r["numVals"])))
           for r in translate(q, spark, wiki_catalog).collect()]
    assert out[0] == ("spot", 9)
    assert {o for o in out[1:]} == {("total_market", 2), ("upfront", 2)}


def test_topn_over_hyper_unique_finalizing_post_aggregator(spark,
                                                           wiki_catalog):
    """testTopNOverHyperUniqueFinalizingPostAggregator — the metric is a
    hyperUniqueCardinality POST-AGG over the uniques aggregate."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": FULL, "dimension": "market",
         "metric": "hyperUniqueFinalizingPostAggMetric", "threshold": 3,
         "aggregations": [{"type": "hyperUnique", "name": "uniques",
                           "fieldName": "quality"}],
         "postAggregations": [
             {"type": "hyperUniqueCardinality",
              "name": "hyperUniqueFinalizingPostAggMetric",
              "fieldName": "uniques"}]}
    out = [(r["market"],
            round(float(r["hyperUniqueFinalizingPostAggMetric"])))
           for r in translate(q, spark, wiki_catalog).collect()]
    assert out[0] == ("spot", 9)
    assert {o for o in out[1:]} == {("total_market", 2), ("upfront", 2)}


def test_topn_over_missing_uniques(spark, wiki_catalog):
    """testTopNOverMissingUniques — hyperUnique over a NONEXISTENT column
    gives 0 for every group (and all three markets survive)."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": FULL, "dimension": "market",
         "metric": "uniques", "threshold": 3,
         "aggregations": [{"type": "hyperUnique", "name": "uniques",
                           "fieldName": "missingUniques"}]}
    out = [(r["market"], int(r["uniques"]))
           for r in translate(q, spark, wiki_catalog).collect()]
    assert sorted(out) == [("spot", 0), ("total_market", 0),
                           ("upfront", 0)]


def test_topn_lexicographic_no_aggregators(spark, wiki_catalog):
    """testTopNLexicographicNoAggregators — a dimension metric spec with an
    empty previousStop and no aggregators lists the distinct values."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": F2T, "dimension": "market",
         "metric": {"type": "dimension", "previousStop": "",
                    "ordering": "lexicographic"},
         "threshold": 4, "aggregations": []}
    out = [r["market"] for r in translate(q, spark, wiki_catalog).collect()]
    assert out == ["spot", "total_market", "upfront"]
