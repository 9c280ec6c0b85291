"""Round-4 TopNQueryRunnerTest tranche B — lexicographic dimension-spec
ordering over extraction fns (plain / inverted / previousStop), constant
extraction to LONG, long-column-as-string dims, post-agg-on-dimension as
the topN metric, cardinality with extraction specs, extraction filters
over absent columns (processing/src/test/java/org/apache/druid/query/topn/
TopNQueryRunnerTest.java)."""

import pytest

from incubator_druid_spark import translate

FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]

COMMON = [
    {"type": "count", "name": "rows"},
    {"type": "doubleSum", "name": "index", "fieldName": "index"},
]


def topn(spark, cat, **extra):
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": F2T, "threshold": 4, "aggregations": COMMON}
    q.update(extra)
    return translate(q, spark, cat).collect()


FIRST_CHAR = {"type": "extraction", "dimension": "market",
              "outputName": "market",
              "extractionFn": {"type": "regex", "expr": "(.)"}}


def test_topn_lexicographic_dim_extraction(spark, wiki_catalog):
    """testTopNLexicographicDimExtraction — first-char extraction, plain
    lexicographic dimension ordering."""
    out = topn(spark, wiki_catalog, dimension=FIRST_CHAR,
               metric={"type": "dimension", "ordering": "lexicographic"})
    got = [(r["market"], r["rows"], round(r["index"], 4)) for r in out]
    assert got == [("s", 18, round(2231.876812, 4)),
                   ("t", 4, round(5351.814783, 4)),
                   ("u", 4, round(4875.669692, 4))]


def test_inverted_topn_lexicographic_dim_extraction2(spark, wiki_catalog):
    """testInvertedTopNLexicographicDimExtraction2 — third-char extraction,
    inverted lexicographic: t (total_market), o (spot), f (upfront)."""
    out = topn(spark, wiki_catalog,
               dimension={"type": "extraction", "dimension": "market",
                          "outputName": "market",
                          "extractionFn": {"type": "regex",
                                           "expr": "..(.)"}},
               metric={"type": "inverted",
                       "metric": {"type": "dimension",
                                  "ordering": "lexicographic"}})
    assert [(r["market"], r["rows"]) for r in out] == [
        ("t", 4), ("o", 18), ("f", 4)]


def test_topn_lexicographic_dim_extraction_previous_stop(spark,
                                                         wiki_catalog):
    """testTopNLexicographicDimExtractionWithPreviousStop — values strictly
    AFTER 's'."""
    out = topn(spark, wiki_catalog, dimension=FIRST_CHAR,
               metric={"type": "dimension", "ordering": "lexicographic",
                       "previousStop": "s"})
    assert [(r["market"], r["rows"]) for r in out] == [("t", 4), ("u", 4)]


def test_inverted_topn_lexicographic_extraction_previous_stop(spark,
                                                              wiki_catalog):
    """testInvertedTopNLexicographicDimExtractionWithPreviousStop — values
    strictly BEFORE 'u', descending."""
    out = topn(spark, wiki_catalog, dimension=FIRST_CHAR,
               metric={"type": "inverted",
                       "metric": {"type": "dimension",
                                  "ordering": "lexicographic",
                                  "previousStop": "u"}})
    assert [(r["market"], r["rows"]) for r in out] == [("t", 4), ("s", 18)]


def test_topn_dim_extraction_time_to_one_long(spark, wiki_catalog):
    """testTopNDimExtractionTimeToOneLong — a constant extraction over
    __time, retyped LONG (the reference's JS '42' fn ports as a constant
    stringFormat)."""
    out = topn(spark, wiki_catalog,
               dimension={"type": "extraction", "dimension": "__time",
                          "outputName": "t", "outputType": "LONG",
                          "extractionFn": {"type": "stringFormat",
                                           "format": "42"}},
               metric="rows", intervals=FULL,
               aggregations=[{"type": "count", "name": "rows"}])
    assert [(r["t"], r["rows"]) for r in out] == [(42, 1209)]


def test_full_on_topn_long_column_as_string(spark, wiki_catalog):
    """testFullOnTopNLongColumnAsString — a LONG column under the default
    STRING dimension spec renders as strings; maxIndex ordering."""
    out = topn(spark, wiki_catalog,
               dimension={"type": "default", "dimension": "qualityLong",
                          "outputName": "ql_alias"},
               metric="maxIndex", intervals=FULL,
               aggregations=COMMON + [
                   {"type": "doubleMax", "name": "maxIndex",
                    "fieldName": "index"},
                   {"type": "doubleMin", "name": "minIndex",
                    "fieldName": "index"}])
    got = [(r["ql_alias"], r["rows"], round(r["maxIndex"], 4)) for r in out]
    assert got == [("1400", 279, round(1870.061029, 4)),
                   ("1600", 279, round(1862.737933, 4)),
                   ("1000", 93, round(277.273533, 4)),
                   ("1200", 93, round(193.787574, 4))]
    assert all(isinstance(r["ql_alias"], str) for r in out)


def test_full_on_topn_over_post_aggs_on_dimension(spark, wiki_catalog):
    """testFullOnTopNOverPostAggsOnDimension — an expression POST-AGG over
    the dimension value as the topN metric (string ordering desc)."""
    out = topn(spark, wiki_catalog, dimension="market",
               metric="dimPostAgg", intervals=FULL,
               postAggregations=[{"type": "expression", "name": "dimPostAgg",
                                  "expression": "market + 'x'"}])
    got = [(r["market"], r["dimPostAgg"], r["rows"]) for r in out]
    assert got == [("upfront", "upfrontx", 186),
                   ("total_market", "total_marketx", 186),
                   ("spot", "spotx", 837)]


def test_topn_cardinality_aggregator_with_extraction_fn(spark, wiki_catalog):
    """testTopNQueryCardinalityAggregatorWithExtractionFn — constant
    extraction collapses both the dimension and the cardinality input to
    one value."""
    hello = {"type": "stringFormat", "format": "hello"}
    out = topn(spark, wiki_catalog,
               dimension={"type": "extraction", "dimension": "market",
                          "outputName": "market", "extractionFn": hello},
               metric={"type": "numeric", "metric": "numVals"},
               threshold=10,
               aggregations=[
                   {"type": "cardinality", "name": "numVals", "byRow": False,
                    "fields": [{"type": "extraction", "dimension": "quality",
                                "outputName": "quality",
                                "extractionFn": hello}]}])
    assert [(r["market"], round(r["numVals"])) for r in out] == [("hello", 1)]


def test_topn_with_extraction_filter_no_existing_value(spark, wiki_catalog):
    """testTopNWithExtractionFilterNoExistingValue — an extraction filter
    over an ABSENT column: the empty-map lookup misses every (null) value,
    replaceMissingValueWith 'NULL' makes the filter match all rows; the
    filtered maxIndex therefore equals the global max."""
    lookup_fn = {"type": "lookup",
                 "lookup": {"type": "map", "map": {"": "NOT_USED"}},
                 "retainMissingValue": False,
                 "replaceMissingValueWith": "NULL", "injective": True}
    flt = {"type": "extraction", "dimension": "null_column", "value": "NULL",
           "extractionFn": lookup_fn}
    out = topn(spark, wiki_catalog, dimension="null_column",
               metric="index", intervals=FULL,
               aggregations=COMMON + [
                   {"type": "filtered", "filter": flt,
                    "aggregator": {"type": "doubleMax", "name": "maxIndex",
                                   "fieldName": "index"}},
                   {"type": "doubleMin", "name": "minIndex",
                    "fieldName": "index"}])
    assert len(out) == 1
    r = out[0]
    assert r["null_column"] is None and r["rows"] == 1209
    assert r["maxIndex"] == pytest.approx(1870.061029, rel=1e-6)
    assert r["minIndex"] == pytest.approx(59.021022, rel=1e-6)


def test_full_on_topn_dim_extraction_all_nulls(spark, wiki_catalog):
    """testFullOnTopNDimExtractionAllNulls — an extraction producing null
    for EVERY value (null-match partial regex) yields one null group with
    full-table aggregates."""
    out = topn(spark, wiki_catalog,
               dimension={"type": "extraction", "dimension": "market",
                          "outputName": "market",
                          "extractionFn": {"type": "partial",
                                           "expr": "^\\u0000never$"}},
               metric="index", intervals=FULL,
               aggregations=COMMON + [
                   {"type": "doubleMax", "name": "maxIndex",
                    "fieldName": "index"},
                   {"type": "doubleMin", "name": "minIndex",
                    "fieldName": "index"}])
    assert len(out) == 1
    r = out[0]
    assert r["market"] is None and r["rows"] == 1209
    assert r["index"] == pytest.approx(503332.5071372986, rel=1e-6)
    assert r["maxIndex"] == pytest.approx(1870.061029, rel=1e-6)
    assert r["minIndex"] == pytest.approx(59.02102279663086, rel=1e-6)


FAST_LOOKUP = {"spot": "2spot0", "total_market": "1total_market0",
               "upfront": "3upfront0"}
FAST_EXPECT = [("2spot0", 18), ("1total_market0", 4), ("3upfront0", 4)]


@pytest.mark.parametrize("retain,injective,replace", [
    (True, True, None),     # FastTopNOptimal
    (True, False, None),    # FastTopNUnOptimal
    (False, True, "MISSING"),   # FastTopNOptimalWithReplaceMissing
    (False, False, "MISSING"),  # FastTopNUnOptimalWithReplaceMissing
])
def test_topn_dim_extraction_fast_topn_variants(spark, wiki_catalog, retain,
                                                injective, replace):
    """testTopNDimExtractionFastTopN{Optimal,UnOptimal}[WithReplaceMissing]
    — the injective/retain/replace flags pick different execution paths in
    the reference; the OUTPUT contract is identical (full rename map)."""
    fn = {"type": "lookup",
          "lookup": {"type": "map", "map": FAST_LOOKUP,
                     "isOneToOne": injective},
          "retainMissingValue": retain}
    if replace is not None:
        fn["replaceMissingValueWith"] = replace
    out = topn(spark, wiki_catalog,
               dimension={"type": "extraction", "dimension": "market",
                          "outputName": "market", "extractionFn": fn},
               metric={"type": "numeric", "metric": "rows"},
               aggregations=[{"type": "count", "name": "rows"}])
    assert [(r["market"], r["rows"]) for r in out] == FAST_EXPECT


def test_topn_with_multi_value_dim_filter_equivalences(spark, wiki_catalog):
    """testTopNWithMultiValueDimFilter1/5 — a selector over the MVD equals
    the scalar-quality filter; 'preferred' covers every row."""
    def run(flt):
        return [(r["market"], r["rows"], round(r["index"], 4)) for r in
                topn(spark, wiki_catalog, dimension="market", metric="index",
                     filter=flt)]

    assert run({"type": "selector", "dimension": "placementish",
                "value": "m"}) == \
        run({"type": "selector", "dimension": "quality",
             "value": "mezzanine"})
    all_rows = run({"type": "selector", "dimension": "placementish",
                    "value": "preferred"})
    assert sum(r[1] for r in all_rows) == 26  # every row matches
