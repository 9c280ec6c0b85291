"""Round-6 TopNQueryRunnerTest tranche — the base numeric/lexicographic
family, previousStop pagination, full-interval rollups, null-metric
ordering, and the javascript-extraction refusal
(processing/src/test/java/org/apache/druid/query/topn/
TopNQueryRunnerTest.java).

testTopNBySegment/testTopNBySegmentResults are not ported: bySegment is
the broker↔historical per-segment response envelope — a protocol detail
with no analogue over a Catalyst plan (results are identical, the wrapper
differs)."""

import pytest

from incubator_druid_spark import translate

F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]
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


def _mkt(out):
    return [(r["market"], r["rows"], round(r["index"], 6)) for r in out]


_BY_INDEX = [("total_market", 4, 5351.814783),
             ("upfront", 4, 4875.669692),
             ("spot", 18, 2231.876812)]


def test_topn_numeric(spark, wiki_catalog):
    """testTopN — numeric metric ordering over market."""
    assert _mkt(topn(spark, wiki_catalog)) == _BY_INDEX


def test_topn_with_or_filter(spark, wiki_catalog):
    """testTopNWithOrFilter1 — an OR (in) filter covering all markets
    changes nothing."""
    out = topn(spark, wiki_catalog,
               filter={"type": "in", "dimension": "market",
                       "values": ["total_market", "upfront", "spot"]})
    assert _mkt(out) == _BY_INDEX


def test_topn_lexicographic(spark, wiki_catalog):
    """testTopNLexicographic — empty previousStop, ascending dimension."""
    out = topn(spark, wiki_catalog,
               metric={"type": "dimension", "ordering": "lexicographic",
                       "previousStop": ""})
    assert _mkt(out) == [("spot", 18, 2231.876812),
                         ("total_market", 4, 5351.814783),
                         ("upfront", 4, 4875.669692)]


def test_topn_lexicographic_previous_stop(spark, wiki_catalog):
    """testTopNLexicographicWithPreviousStop — resumes strictly after
    'spot'."""
    out = topn(spark, wiki_catalog,
               metric={"type": "dimension", "ordering": "lexicographic",
                       "previousStop": "spot"})
    assert _mkt(out) == [("total_market", 4, 5351.814783),
                         ("upfront", 4, 4875.669692)]


def test_topn_inverted_lexicographic_previous_stop(spark, wiki_catalog):
    """testTopNInvertedLexicographicWithPreviousStop — descending, resumes
    strictly below 'upfront'."""
    out = topn(spark, wiki_catalog,
               metric={"type": "inverted",
                       "metric": {"type": "dimension",
                                  "ordering": "lexicographic",
                                  "previousStop": "upfront"}})
    assert _mkt(out) == [("total_market", 4, 5351.814783),
                         ("spot", 18, 2231.876812)]


def test_full_on_topn(spark, wiki_catalog):
    """testFullOnTopN — full-interval market rollup with min/max (the
    quality_uniques HLL sidecar is not in the TSV fixture; rows/index/
    max/min carry the golden values)."""
    out = topn(spark, wiki_catalog, intervals=FULL,
               aggregations=AGGS + [
                   {"type": "doubleMax", "name": "maxIndex",
                    "fieldName": "index"},
                   {"type": "doubleMin", "name": "minIndex",
                    "fieldName": "index"}])
    exp = [("total_market", 186, 215679.82879638672, 1743.92175,
            792.3260498046875),
           ("upfront", 186, 192046.1060180664, 1870.061029,
            545.9906005859375),
           ("spot", 837, 95606.57232284546, 277.273533,
            59.02102279663086)]
    assert [(r["market"], r["rows"]) for r in out] == \
        [(m, n) for m, n, *_ in exp]
    for r, (_, _, idx, mx, mn) in zip(out, exp):
        assert r["index"] == pytest.approx(idx, rel=1e-6)
        assert r["maxIndex"] == pytest.approx(mx, rel=1e-6)
        assert r["minIndex"] == pytest.approx(mn, rel=1e-6)


def test_topn_dim_extraction_to_one(spark, wiki_catalog):
    """testTopNDimExtractionToOne — the reference collapses every market
    through a javascript extraction fn; javascript raises here
    (deliberate), and the documented rewrite (an expression virtual
    column) yields the same single-group rollup."""
    with pytest.raises(Exception, match="(?i)javascript"):
        topn(spark, wiki_catalog, intervals=FULL, metric="rows",
             threshold=10,
             dimension={"type": "extraction", "dimension": "market",
                        "outputName": "market",
                        "extractionFn": {
                            "type": "javascript",
                            "function": "function(f){return 'POTATO';}"}})
    out = topn(spark, wiki_catalog, intervals=FULL, metric="rows",
               threshold=10,
               virtualColumns=[{"type": "expression", "name": "one",
                                "expression": "'POTATO'"}],
               dimension="one")
    assert len(out) == 1
    assert (out[0]["one"], out[0]["rows"]) == ("POTATO", 1209)
    assert out[0]["index"] == pytest.approx(503332.5071372986, rel=1e-6)


# test_topN_orderBy{Long,Float,Double}NumericColumnWithNulls live in
# test_golden_native_topn.py / _r4e.py / _r6b.py — the reference's 13-row
# expected lists: null metrics rank smallest (nullsFirst comparator) and
# land last in descending order, not omitted.
