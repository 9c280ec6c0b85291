"""Round-6 Search/Scan/TimeBoundary runner tranche — the remaining
portable methods of SearchQueryRunnerTest, ScanQueryRunnerTest and
TimeBoundaryQueryRunnerTest (processing/src/test/java/org/apache/druid/
query/{search,scan,timeboundary}/).

Not ported, with reasons:
  * testSearchHitSerDe — Jackson serde of the wire object, no analogue.
  * testSearchWithCardinality — exercises the broker's partial-segment
    merge with fractional-segment counts (91/273), a merge-infrastructure
    shape; full-segment counts are covered by the dimension tests here.
  * testScanQueryTimeout — the engine's timeout lives at the API layer
    (laning/priority pools), covered by tests/test_api.py.
  * testMergeResultsEmptyResults (timeboundary) — broker merge plumbing.
"""

import pytest

from incubator_druid_spark import translate

FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]


def search(spark, cat, **extra):
    q = {"queryType": "search", "dataSource": "wiki", "granularity": "all",
         "intervals": FULL}
    q.update(extra)
    out = translate(q, spark, cat).collect()
    return {(r["dimension"], r["value"]): r["count"] for r in out}


# ---------------------------------------------------------------------------
# search
# ---------------------------------------------------------------------------

def test_search_fragment(spark, wiki_catalog):
    """SearchQueryRunnerTest.testFragmentSearch — all fragments must
    match ('auto' AND 've' → automotive only)."""
    assert search(spark, wiki_catalog,
                  searchDimensions=["quality", "market"],
                  query={"type": "fragment",
                         "values": ["auto", "ve"]}) == {
        ("quality", "automotive"): 93}


def test_search_with_dimension_quality(spark, wiki_catalog):
    """SearchQueryRunnerTest.testSearchWithDimensionQuality."""
    assert search(spark, wiki_catalog, searchDimensions=["quality"],
                  query={"type": "insensitive_contains", "value": "a"}) == {
        ("quality", "automotive"): 93, ("quality", "mezzanine"): 279,
        ("quality", "travel"): 93, ("quality", "health"): 93,
        ("quality", "entertainment"): 93}


def test_search_with_dimension_provider(spark, wiki_catalog):
    """SearchQueryRunnerTest.testSearchWithDimensionProvider."""
    assert search(spark, wiki_catalog, searchDimensions=["market"],
                  query={"type": "insensitive_contains", "value": "a"}) == {
        ("market", "total_market"): 186}


def test_search_with_dimensions_quality_and_provider(spark, wiki_catalog):
    """SearchQueryRunnerTest.testSearchWithDimensionsQualityAndProvider."""
    assert search(spark, wiki_catalog,
                  searchDimensions=["quality", "market"],
                  query={"type": "insensitive_contains", "value": "a"}) == {
        ("quality", "automotive"): 93, ("quality", "mezzanine"): 279,
        ("quality", "travel"): 93, ("quality", "health"): 93,
        ("quality", "entertainment"): 93,
        ("market", "total_market"): 186}


def test_search_with_dimensions_placement_and_provider(spark, wiki_catalog):
    """SearchQueryRunnerTest.testSearchWithDimensionsPlacementAndProvider —
    'mark' hits only the market dimension."""
    assert search(spark, wiki_catalog,
                  searchDimensions=["placementish", "market"],
                  query={"type": "insensitive_contains",
                         "value": "mark"}) == {
        ("market", "total_market"): 186}


def test_search_with_single_filter2(spark, wiki_catalog):
    """SearchQueryRunnerTest.testSearchWithSingleFilter2."""
    assert search(spark, wiki_catalog,
                  searchDimensions=["market"],
                  filter={"type": "selector", "dimension": "market",
                          "value": "total_market"},
                  query={"type": "insensitive_contains", "value": "a"}) == {
        ("market", "total_market"): 186}


def test_search_with_extraction_filter(spark, wiki_catalog):
    """SearchQueryRunnerTest.testSearchWithExtractionFilter1 — a lookup
    extraction fn ({automotive → automotive☃}, retainMissingValue) applied
    in both the filter and the searched dimension."""
    exfn = {"type": "lookup",
            "lookup": {"type": "map", "map": {"automotive": "automotive☃"}},
            "retainMissingValue": True}
    assert search(spark, wiki_catalog,
                  searchDimensions=[{"type": "extraction",
                                     "dimension": "quality",
                                     "outputName": "quality",
                                     "extractionFn": exfn}],
                  filter={"type": "selector", "dimension": "quality",
                          "value": "automotive☃", "extractionFn": exfn},
                  query={"type": "insensitive_contains",
                         "value": "☃"}) == {
        ("quality", "automotive☃"): 93}


def test_search_on_numeric_column_with_js_exfn_refuses(spark, wiki_catalog):
    """SearchQueryRunnerTest.testSearchOn{Float,Long}ColumnWithExFn —
    javascript extraction fns raise (the engine's documented refusal)."""
    with pytest.raises(Exception, match="(?i)javascript"):
        search(spark, wiki_catalog,
               searchDimensions=[{"type": "extraction",
                                  "dimension": "index",
                                  "outputName": "index",
                                  "extractionFn": {
                                      "type": "javascript",
                                      "function":
                                          "function(n){return 'super-'+n;}"}}],
               query={"type": "contains", "value": "100.7"})


def test_search_with_null_value_in_dimension(spark, tmp_path):
    """SearchQueryRunnerTest.testSearchWithNullValueInDimension — an all
    search over a dimension that is null on some rows reports the null
    value as a hit."""
    import datetime

    from incubator_druid_spark.catalog import Catalog
    df = spark.createDataFrame(
        [(datetime.datetime(2016, 12, 16, 7, 0, 0), "name1", "host", None),
         (datetime.datetime(2016, 12, 16, 7, 1, 10), "name2", None, "table")],
        "__time timestamp, name string, host string, table string")
    p = str(tmp_path / "nulldim.parquet")
    df.write.mode("overwrite").parquet(p)
    cat = Catalog(spark)
    cat.register("nulldim", p)
    out = translate(
        {"queryType": "search", "dataSource": "nulldim",
         "granularity": "all", "intervals": FULL,
         "searchDimensions": ["table"]},
        spark, cat).collect()
    got = {(r["dimension"], r["value"]): r["count"] for r in out}
    assert got == {("table", "table"): 1, ("table", None): 1}


# ---------------------------------------------------------------------------
# scan (the select-shaped family)
# ---------------------------------------------------------------------------

# day-1 spot rows appear in the TSV's file order per day
_SPOT_QUALITY_ORDER = ["automotive", "business", "entertainment", "health",
                       "mezzanine", "news", "premium", "technology",
                       "travel"]


def test_full_on_select_with_filter_and_limit(spark, wiki_catalog):
    """ScanQueryRunnerTest.testFullOnSelectWithFilterAndLimit — spot rows
    in time order under each limit; the reference sweeps limits the same
    way."""
    for limit in (3, 1, 5, 7):
        out = translate(
            {"queryType": "scan", "dataSource": "wiki", "limit": limit,
             "intervals": FULL, "order": "ascending",
             "filter": {"type": "selector", "dimension": "market",
                        "value": "spot"},
             "columns": ["__time", "quality", "index"]},
            spark, wiki_catalog).collect()
        assert len(out) == limit
        assert [r["quality"] for r in out] == _SPOT_QUALITY_ORDER[:limit]
        assert all(str(r["__time"])[:10] == "2011-01-12" for r in out)


def test_select_with_dims_and_mets(spark, wiki_catalog):
    """ScanQueryRunnerTest.testSelectWithDimsAndMets(AsCompactedList) —
    projected dimension + metric columns only."""
    out = translate(
        {"queryType": "scan", "dataSource": "wiki", "limit": 3,
         "intervals": ["2011-01-12T00:00:00.000Z/2011-01-14T00:00:00.000Z"],
         "order": "ascending",
         "columns": ["market", "index"]},
        spark, wiki_catalog)
    assert out.columns == ["market", "index"]
    rows_ = out.collect()
    assert len(rows_) == 3
    assert all(r["market"] in ("spot", "total_market", "upfront")
               for r in rows_)


def test_select_with_underscore_underscore_time(spark, wiki_catalog):
    """ScanQueryRunnerTest.testSelectWithUnderscoreUnderscoreTime — __time
    is an explicitly selectable column."""
    out = translate(
        {"queryType": "scan", "dataSource": "wiki", "limit": 4,
         "intervals": ["2011-01-12T00:00:00.000Z/2011-01-14T00:00:00.000Z"],
         "order": "ascending",
         "columns": ["__time", "market"]},
        spark, wiki_catalog).collect()
    assert [str(r["__time"])[:10] for r in out] == ["2011-01-12"] * 4


def test_full_on_select_descending_time_order(spark, wiki_catalog):
    """ScanQueryRunnerTest.testFullOnSelectWithFilterLimitAndDescending-
    TimeOrdering{List,CompactedList}Format — last day first."""
    out = translate(
        {"queryType": "scan", "dataSource": "wiki", "limit": 3,
         "intervals": FULL, "order": "descending",
         "filter": {"type": "selector", "dimension": "market",
                    "value": "spot"},
         "columns": ["__time", "quality"]},
        spark, wiki_catalog).collect()
    assert len(out) == 3
    assert all(str(r["__time"])[:10] == "2011-04-15" for r in out)


# ---------------------------------------------------------------------------
# timeBoundary
# ---------------------------------------------------------------------------

def test_filtered_time_boundary_no_matches(spark, wiki_catalog):
    """TimeBoundaryQueryRunnerTest.testFilteredTimeBoundaryQueryNoMatches —
    a filter matching nothing yields an empty result, not null bounds."""
    out = translate(
        {"queryType": "timeBoundary", "dataSource": "wiki",
         "filter": {"type": "selector", "dimension": "quality",
                    "value": "foobar"}},
        spark, wiki_catalog).collect()
    assert out == []


# ---------------------------------------------------------------------------
# segmentMetadata (SegmentMetadataQueryTest — the analysis-shape family;
# serde/cache-key/broker-merge methods have no analogue here)
# ---------------------------------------------------------------------------

def test_segment_metadata_nullable_numeric_columns(spark, wiki_catalog):
    """SegmentMetadataQueryTest testLongNullableColumn /
    testFloatNullableColumn / testDoubleNullableColumn — typed
    numeric columns report their Druid type and non-zero null counts in
    SQL-compatible mode."""
    out = translate(
        {"queryType": "segmentMetadata", "dataSource": "wiki",
         "analysisTypes": ["cardinality", "minmax"]},
        spark, wiki_catalog).collect()
    cols = {r["column"]: r for r in out}
    for name, typ in [("longNumericNull", "LONG"),
                      ("floatNumericNull", "FLOAT"),
                      ("doubleNumericNull", "DOUBLE")]:
        r = cols[name]
        assert r["type"] == typ
        assert r["nullCount"] > 0
        assert r["numRows"] == 1209


def test_segment_metadata_basic_shape(spark, wiki_catalog):
    """SegmentMetadataQueryTest.testSegmentMetadataQuery(+DefaultAnalysis
    Merge) — the standard column analyses: STRING dims with exact
    cardinality, the MVD flagged hasMultipleValues, __time/metrics typed."""
    out = translate(
        {"queryType": "segmentMetadata", "dataSource": "wiki",
         "analysisTypes": ["cardinality", "minmax"]},
        spark, wiki_catalog).collect()
    cols = {r["column"]: r for r in out}
    assert cols["__time"]["type"] == "LONG"
    # the TSV fixture stores index as DOUBLE (the reference's segment keeps
    # the ingest FLOAT type; the analysis contract — typed numerics with
    # exact min/max — is what this asserts)
    assert cols["index"]["type"] == "DOUBLE"
    assert cols["market"]["type"] == "STRING"
    assert cols["market"]["cardinality"] == 3
    assert cols["quality"]["cardinality"] == 9
    assert cols["placementish"]["hasMultipleValues"] is True
    assert cols["market"]["minValue"] == "spot"
    assert cols["market"]["maxValue"] == "upfront"


def test_segment_metadata_no_analysis_types(spark, wiki_catalog):
    """SegmentMetadataQueryTest.testSegmentMetadataQueryWithNoAnalysisTypes
    Merge — an empty analysisTypes list still reports column types, with
    the per-analysis fields absent (null)."""
    out = translate(
        {"queryType": "segmentMetadata", "dataSource": "wiki",
         "analysisTypes": []},
        spark, wiki_catalog).collect()
    cols = {r["column"]: r for r in out}
    assert cols["placement"]["type"] == "STRING"
    assert cols["placement"]["cardinality"] is None
    assert cols["placement"]["minValue"] is None


def test_full_on_select_all_columns(spark, wiki_catalog):
    """ScanQueryRunnerTest.testFullOnSelect — a scan with NO columns list
    returns every segment column plus the virtual column (EXPR_COLUMN =
    index * 2, LONG); 26 rows over 2011-01-12/14 (V_0112_0114)."""
    q = {"queryType": "scan", "dataSource": "wiki",
         "intervals": ["2011-01-12T00:00:00.000Z/2011-01-14T00:00:00.000Z"],
         "virtualColumns": [{"type": "expression", "name": "expr",
                             "expression": "index * 2",
                             "outputType": "LONG"}]}
    out = translate(q, spark, wiki_catalog)
    for c in ("__time", "expr", "market", "quality", "qualityLong",
              "placement", "placementish", "index", "partial_null_column"):
        assert c in out.columns, c
    rows_ = out.collect()
    assert len(rows_) == 26
    for r in rows_:
        assert r["expr"] == int(r["index"] * 2)


def test_full_on_select_as_compacted_list(spark, wiki_catalog):
    """ScanQueryRunnerTest.testFullOnSelectAsCompactedList — the
    compactedList result format carries the same rows as value arrays in
    column order (and testSelectWithDimsAndMetsAsCompactedList: a projected
    scan compacts the same way)."""
    from incubator_druid_spark.api import native_query
    base = {"queryType": "scan", "dataSource": "wiki",
            "intervals":
                ["2011-01-12T00:00:00.000Z/2011-01-14T00:00:00.000Z"],
            "virtualColumns": [{"type": "expression", "name": "expr",
                                "expression": "index * 2",
                                "outputType": "LONG"}]}
    listed = native_query(base, spark, wiki_catalog)
    compacted = native_query({**base, "resultFormat": "compactedList"},
                             spark, wiki_catalog)
    cols = listed[0]["columns"]
    assert compacted[0]["columns"] == cols
    assert len(compacted[0]["events"]) == len(listed[0]["events"]) == 26
    for ev_list, ev_arr in zip(listed[0]["events"], compacted[0]["events"]):
        assert [ev_list.get(c) for c in cols] == ev_arr
    # the projected variant (testSelectWithDimsAndMetsAsCompactedList)
    proj = native_query(
        {"queryType": "scan", "dataSource": "wiki", "limit": 3,
         "order": "ascending",
         "intervals":
             ["2011-01-12T00:00:00.000Z/2011-01-14T00:00:00.000Z"],
         "columns": ["market", "index"],
         "resultFormat": "compactedList"},
        spark, wiki_catalog)
    assert proj[0]["columns"] == ["market", "index"]
    assert len(proj[0]["events"]) == 3
    assert all(len(ev) == 2 for ev in proj[0]["events"])


def test_full_on_select_asc_desc_list_and_compacted_parity(
        spark, wiki_catalog):
    """testFullOnSelectWithFilterLimitAndAscendingTimeOrderingListFormat,
    testFullOnSelectWithFilterLimitAndAscendingTimeOrderingCompactedListFormat,
    testFullOnSelectWithFilterLimitAndDescendingTimeOrderingListFormat,
    testFullOnSelectWithFilterLimitAndDescendingTimeOrderingCompactedListFormat
    — both formats return identical rows for
    both time orders (the reference runs the same query through each
    format and verifies the same expected rows)."""
    from incubator_druid_spark.api import native_query
    for order, day in (("ascending", "2011-01-12"),
                       ("descending", "2011-04-15")):
        base = {"queryType": "scan", "dataSource": "wiki", "limit": 3,
                "order": order,
                "intervals":
                    ["2011-01-12T00:00:00.000Z/2011-04-16T00:00:00.000Z"],
                "filter": {"type": "selector", "dimension": "market",
                           "value": "spot"},
                "columns": ["__time", "quality", "index"]}
        listed = native_query(base, spark, wiki_catalog)
        compacted = native_query({**base, "resultFormat": "compactedList"},
                                 spark, wiki_catalog)
        cols = listed[0]["columns"]
        assert [str(ev["__time"])[:10] for ev in listed[0]["events"]] \
            == [day] * 3
        assert [[ev.get(c) for c in cols] for ev in listed[0]["events"]] \
            == compacted[0]["events"]


def test_search_on_long_column_with_extraction(spark, wiki_catalog):
    """SearchQueryRunnerTest.testSearchOnLongColumnWithExFn — the reference
    prefixes the millis rendering with 'super-' via a javascript
    extraction; this engine refuses javascript (JavaScriptConfig-disabled
    stance) and the stringFormat extraction fn is the supported twin with
    the identical expected hit (super-1297123200000, 13 rows)."""
    base = {"queryType": "search", "dataSource": "wiki",
            "granularity": "all",
            "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
            "query": {"type": "contains", "value": "1297123200000"}}
    with pytest.raises(Exception, match="(?i)javascript"):
        translate({**base, "searchDimensions": [
            {"type": "extraction", "dimension": "__time",
             "outputName": "__time",
             "extractionFn": {"type": "javascript",
                              "function":
                                  "function(str){return 'super-'+str;}"}}]},
                  spark, wiki_catalog).collect()
    out = {(r["dimension"], r["value"]): r["count"] for r in translate(
        {**base, "searchDimensions": [
            {"type": "extraction", "dimension": "__time",
             "outputName": "__time",
             "extractionFn": {"type": "stringFormat",
                              "format": "super-%s"}}]},
        spark, wiki_catalog).collect()}
    assert out == {("__time", "super-1297123200000"): 13}


def test_search_on_float_column_with_extraction(spark, wiki_catalog):
    """SearchQueryRunnerTest.testSearchOnFloatColumnWithExFn — same
    stringFormat twin over the DOUBLE index column: two distinct 100.7*
    renderings, one row each."""
    out = {r["value"]: r["count"] for r in translate(
        {"queryType": "search", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "searchDimensions": [
             {"type": "extraction", "dimension": "index",
              "outputName": "index",
              "extractionFn": {"type": "stringFormat",
                               "format": "super-%s"}}],
         "query": {"type": "contains", "value": "100.7"}},
        spark, wiki_catalog).collect()}
    assert len(out) == 2
    assert all(v.startswith("super-100.7") for v in out)
    assert all(c == 1 for c in out.values())
