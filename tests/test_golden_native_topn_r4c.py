"""Round-4 TopNQueryRunnerTest tranche C — selector/or filters incl.
non-existent values and dimensions, MVD filters over placementish (incl.
implicit-unpivot grouping), uniques as the topN metric, hyperUnique
expression post-aggs and rounding (processing/src/test/java/org/apache/
druid/query/topn/TopNQueryRunnerTest.java)."""

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
UNIQUES_1 = 1.0002442201269182


def topn(spark, cat, **extra):
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": F2T, "threshold": 4, "dimension": "market",
         "metric": "index", "aggregations": COMMON,
         "postAggregations": ARIC}
    q.update(extra)
    return translate(q, spark, cat).collect()


def check(out, exp):
    """exp: list of (dim, rows, index, aric, uniques)."""
    assert len(out) == len(exp)
    dim_col = out[0].__fields__[0] if out else None
    for r, (d, rows_, idx, aric, uq) in zip(out, exp):
        assert r[dim_col] == d and r["rows"] == rows_
        assert r["index"] == pytest.approx(idx, rel=2e-6)
        assert r["addRowsIndexConstant"] == pytest.approx(aric, rel=2e-6)
        assert r["uniques"] == pytest.approx(uq, abs=0.02)


def test_topn_with_filter1(spark, wiki_catalog):
    """testTopNWithFilter1 — market selector equal to the topN dimension
    leaves one group."""
    out = topn(spark, wiki_catalog,
               filter={"type": "selector", "dimension": "market",
                       "value": "upfront"})
    check(out, [("upfront", 4, 4875.669692, 4880.669692, UNIQUES_2)])


def test_topn_with_filter2(spark, wiki_catalog):
    """testTopNWithFilter2 — quality=mezzanine filter under a market topN."""
    out = topn(spark, wiki_catalog,
               filter={"type": "selector", "dimension": "quality",
                       "value": "mezzanine"})
    check(out, [("upfront", 2, 2591.68359375, 2594.68359375, UNIQUES_1),
                ("total_market", 2, 2508.39599609375, 2511.39599609375,
                 UNIQUES_1),
                ("spot", 2, 220.63774871826172, 223.63774871826172,
                 UNIQUES_1)])


def test_topn_with_filter2_one_day(spark, wiki_catalog):
    """testTopNWithFilter2OneDay — same filter restricted to one day."""
    out = topn(spark, wiki_catalog,
               intervals=["2011-04-01T00:00:00.000Z/2011-04-02T00:00:00.000Z"],
               filter={"type": "selector", "dimension": "quality",
                       "value": "mezzanine"})
    check(out, [("upfront", 1, 1447.34116, 1449.34116, UNIQUES_1),
                ("total_market", 1, 1314.839715, 1316.839715, UNIQUES_1),
                ("spot", 1, 109.705815, 111.705815, UNIQUES_1)])


def test_topn_with_non_existent_filter_in_or(spark, wiki_catalog):
    """testTopNWithNonExistentFilterInOr — IN list with a dead value."""
    out = topn(spark, wiki_catalog,
               filter={"type": "in", "dimension": "market",
                       "values": ["total_market", "upfront", "billyblank"]})
    check(out, [("total_market", 4, 5351.814783, 5356.814783, UNIQUES_2),
                ("upfront", 4, 4875.669692, 4880.669692, UNIQUES_2)])


def test_topn_with_or_filter2(spark, wiki_catalog):
    """testTopNWithOrFilter2 — two-market IN."""
    out = topn(spark, wiki_catalog,
               filter={"type": "in", "dimension": "market",
                       "values": ["total_market", "upfront"]})
    check(out, [("total_market", 4, 5351.814783, 5356.814783, UNIQUES_2),
                ("upfront", 4, 4875.669692, 4880.669692, UNIQUES_2)])


def test_topn_with_non_existent_filter(spark, wiki_catalog):
    """testTopNWithNonExistentFilter — selector matching nothing yields an
    EMPTY result list."""
    assert topn(spark, wiki_catalog,
                filter={"type": "selector", "dimension": "market",
                        "value": "billyblank"}) == []


def test_topn_with_non_existent_filter_multi_dim(spark, wiki_catalog):
    """testTopNWithNonExistentFilterMultiDim — AND with a dead selector."""
    assert topn(spark, wiki_catalog,
                filter={"type": "and", "fields": [
                    {"type": "selector", "dimension": "market",
                     "value": "billyblank"},
                    {"type": "selector", "dimension": "quality",
                     "value": "mezzanine"}]}) == []


def test_topn_non_existent_dimension_and_filter(spark, wiki_catalog):
    """testTopNWithNonExistentDimensionAndNonExistentFilter — a null
    selector over an absent column matches every row; grouping by the
    absent column returns the single null group."""
    out = topn(spark, wiki_catalog, threshold=1,
               dimension="doesn't exist",
               filter={"type": "selector", "dimension": "doesn't exist",
                       "value": None})
    assert len(out) == 1
    r = out[0]
    assert r["doesn't exist"] is None and r["rows"] == 26
    assert r["index"] == pytest.approx(12459.361190795898, rel=2e-6)
    assert r["addRowsIndexConstant"] == pytest.approx(12486.361190795898,
                                                      rel=2e-6)
    assert r["uniques"] == pytest.approx(UNIQUES_9, abs=0.02)


def test_topn_with_multi_value_dim_filter2(spark, wiki_catalog):
    """testTopNWithMultiValueDimFilter2 — placementish IN (m,a,b) over the
    quality dimension equals quality IN (mezzanine,automotive,business)."""
    mv = topn(spark, wiki_catalog, dimension="quality",
              filter={"type": "in", "dimension": "placementish",
                      "values": ["m", "a", "b"]})
    sv = topn(spark, wiki_catalog, dimension="quality",
              filter={"type": "in", "dimension": "quality",
                      "values": ["mezzanine", "automotive", "business"]})
    assert mv and [tuple(r) for r in mv] == [tuple(r) for r in sv]


def test_topn_with_multi_value_dim_filter3(spark, wiki_catalog):
    """testTopNWithMultiValueDimFilter3 — filter AND group on the MVD:
    matching ROWS unpivot into per-element groups ('a' rows also carry
    'preferred')."""
    out = topn(spark, wiki_catalog, dimension="placementish",
               filter={"type": "selector", "dimension": "placementish",
                       "value": "a"})
    check(out, [("a", 2, 283.31103515625, 286.31103515625, UNIQUES_1),
                ("preferred", 2, 283.31103515625, 286.31103515625,
                 UNIQUES_1)])


def test_topn_with_multi_value_dim_filter4(spark, wiki_catalog):
    """testTopNWithMultiValueDimFilter4 — IN (a,b) over the MVD; 'preferred'
    accumulates both matched row sets."""
    out = topn(spark, wiki_catalog, dimension="placementish",
               filter={"type": "in", "dimension": "placementish",
                       "values": ["a", "b"]})
    check(out, [("preferred", 4, 514.868408203125, 519.868408203125,
                 UNIQUES_2),
                ("a", 2, 283.31103515625, 286.31103515625, UNIQUES_1),
                ("b", 2, 231.557373046875, 234.557373046875, UNIQUES_1)])


def test_topn_with_multi_value_dim_filter5(spark, wiki_catalog):
    """testTopNWithMultiValueDimFilter5 — filter on the common element
    keeps all rows; element groups rank below it."""
    out = topn(spark, wiki_catalog, dimension="placementish",
               filter={"type": "selector", "dimension": "placementish",
                       "value": "preferred"})
    check(out, [("preferred", 26, 12459.361190795898, 12486.361190795898,
                 UNIQUES_9),
                ("p", 6, 5407.213653564453, 5414.213653564453, UNIQUES_1),
                ("m", 6, 5320.717338562012, 5327.717338562012, UNIQUES_1),
                ("t", 4, 422.3440856933594, 427.3440856933594, UNIQUES_2)])


def test_full_on_topn_over_uniques(spark, wiki_catalog):
    """testFullOnTopNOverUniques — uniques as the ranking metric with the
    min/max family; spot (9 uniques) leads."""
    out = topn(spark, wiki_catalog, intervals=FULL, threshold=3,
               metric="uniques",
               aggregations=COMMON + [
                   {"type": "doubleMax", "name": "maxIndex",
                    "fieldName": "index"},
                   {"type": "doubleMin", "name": "minIndex",
                    "fieldName": "index"}])
    exp = [("spot", 837, 95606.57232284546, 96444.57232284546, UNIQUES_9,
            277.273533, 59.02102279663086),
           ("total_market", 186, 215679.82879638672, 215866.82879638672,
            UNIQUES_2, 1743.92175, 792.3260498046875),
           ("upfront", 186, 192046.1060180664, 192233.1060180664, UNIQUES_2,
            1870.061029, 545.9906005859375)]
    assert len(out) == 3
    for r, (mk, rows_, idx, aric, uq, mx, mn) in zip(out, exp):
        assert r["market"] == mk and r["rows"] == rows_
        assert r["index"] == pytest.approx(idx, rel=2e-6)
        assert r["addRowsIndexConstant"] == pytest.approx(aric, rel=2e-6)
        assert r["uniques"] == pytest.approx(uq, abs=0.02)
        assert r["maxIndex"] == pytest.approx(mx, rel=2e-6)
        assert r["minIndex"] == pytest.approx(mn, rel=2e-6)


def test_topn_by_uniques(spark, wiki_catalog):
    """testTopNByUniques — NumericTopNMetricSpec('uniques') over
    FIRST_TO_THIRD; tie between total_market/upfront breaks by dimension."""
    out = topn(spark, wiki_catalog, metric={"type": "numeric",
                                            "metric": "uniques"})
    check(out, [("spot", 18, 2231.876812, 2250.876812, UNIQUES_9),
                ("total_market", 4, 5351.814783, 5356.814783, UNIQUES_2),
                ("upfront", 4, 4875.669692, 4880.669692, UNIQUES_2)])


def test_topn_over_hyper_unique_expression(spark, wiki_catalog):
    """testTopNOverHyperUniqueExpression — an expression post-agg
    (uniques + 1) as the ranking metric."""
    out = topn(spark, wiki_catalog, intervals=FULL, threshold=3,
               metric="hyperUniqueFinalizingPostAggMetric",
               aggregations=[{"type": "hyperUnique", "name": "uniques",
                              "fieldName": "quality"}],
               postAggregations=[
                   {"type": "expression",
                    "name": "hyperUniqueFinalizingPostAggMetric",
                    "expression": "uniques + 1"}])
    exp = [("spot", UNIQUES_9), ("total_market", UNIQUES_2),
           ("upfront", UNIQUES_2)]
    assert len(out) == 3
    for r, (mk, uq) in zip(out, exp):
        assert r["market"] == mk
        assert r["uniques"] == pytest.approx(uq, abs=0.02)
        assert r["hyperUniqueFinalizingPostAggMetric"] == pytest.approx(
            uq + 1, abs=0.02)


def test_topn_over_hyper_unique_expression_rounded(spark, wiki_catalog):
    """testTopNOverHyperUniqueExpressionRounded — round:true makes the
    estimate a LONG before the expression applies."""
    out = topn(spark, wiki_catalog, intervals=FULL, threshold=3,
               metric="hyperUniqueFinalizingPostAggMetric",
               aggregations=[{"type": "hyperUnique", "name": "uniques",
                              "fieldName": "quality", "round": True}],
               postAggregations=[
                   {"type": "expression",
                    "name": "hyperUniqueFinalizingPostAggMetric",
                    "expression": "uniques + 1"}])
    got = [(r["market"], r["uniques"],
            r["hyperUniqueFinalizingPostAggMetric"]) for r in out]
    assert got == [("spot", 9, 10), ("total_market", 2, 3),
                   ("upfront", 2, 3)]
