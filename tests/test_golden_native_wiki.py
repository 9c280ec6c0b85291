"""Native-query golden tests over the reference's Wikipedia-like fixture —
ports of *QueryRunnerTest expectations (processing/src/test/java/org/apache/
druid/query/...), run through the native JSON translator against the raw
druid.sample.numeric.tsv rows.

The reference compares numeric results at 1e-6 RELATIVE tolerance
(TestHelper.assertRow), so its double literals are approximate — asserts
here use the same tolerance.  The reference queries its ROLLED-UP test
index; with queryGranularity NONE
and every dimension in the key no rows combine, so query-time aggregation
over the raw rows produces identical values (TestIndex.java:145-151).
`uniques` is the one approximation: the reference asserts its HyperLogLog
ESTIMATES (9.0198…, 2.0009…), this engine's hyperUnique is exact at these
cardinalities — asserted within the sketch's error instead.
"""

import pytest

from incubator_druid_spark import translate


def test_group_by_quality_day(spark, wiki_catalog):
    """GroupByQueryRunnerTest.java:465 testGroupBy — the canonical 18-row
    expected list (9 qualities × 2 days; longSum truncates per row)."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "alias"}],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"},
             {"type": "floatSum", "name": "idxFloat", "fieldName": "index"},
             {"type": "doubleSum", "name": "idxDouble", "fieldName": "index"}]}
    out = {(str(r["__time"])[:10], r["alias"]):
           (r["rows"], r["idx"], r["idxFloat"], r["idxDouble"])
           for r in translate(q, spark, wiki_catalog).collect()}
    expected = {
        ("2011-04-01", "automotive"): (1, 135, 135.88510131835938),
        ("2011-04-01", "business"): (1, 118, 118.57034),
        ("2011-04-01", "entertainment"): (1, 158, 158.747224),
        ("2011-04-01", "health"): (1, 120, 120.134704),
        ("2011-04-01", "mezzanine"): (3, 2870, 2871.8866900000003),
        ("2011-04-01", "news"): (1, 121, 121.58358),
        ("2011-04-01", "premium"): (3, 2900, 2900.798647),
        ("2011-04-01", "technology"): (1, 78, 78.622547),
        ("2011-04-01", "travel"): (1, 119, 119.922742),
        ("2011-04-02", "automotive"): (1, 147, 147.42593),
        ("2011-04-02", "business"): (1, 112, 112.987027),
        ("2011-04-02", "entertainment"): (1, 166, 166.016049),
        ("2011-04-02", "health"): (1, 113, 113.446008),
        ("2011-04-02", "mezzanine"): (3, 2447, 2448.830613),
        ("2011-04-02", "news"): (1, 114, 114.290141),
        ("2011-04-02", "premium"): (3, 2505, 2506.415148),
        ("2011-04-02", "technology"): (1, 97, 97.387433),
        ("2011-04-02", "travel"): (1, 126, 126.411364),
    }
    assert set(out) == set(expected)
    for k, (rows_, idx, idx_d) in expected.items():
        got = out[k]
        assert got[0] == rows_ and got[1] == idx, (k, got)
        assert got[2] == pytest.approx(idx_d, rel=2e-6)
        assert got[3] == pytest.approx(idx_d, rel=2e-6)


def test_full_on_topn_market(spark, wiki_catalog):
    """TopNQueryRunnerTest.java testFullOnTopN — market top-4 by summed
    index with max/min + addRowsIndexConstant post-agg."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "dimension": "market", "metric": "index", "threshold": 4,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "doubleSum", "name": "index", "fieldName": "index"},
             {"type": "hyperUnique", "name": "uniques",
              "fieldName": "quality"},
             {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
             {"type": "doubleMin", "name": "minIndex", "fieldName": "index"}],
         "postAggregations": [
             {"type": "arithmetic", "name": "addRowsIndexConstant",
              "fn": "+",
              "fields": [{"type": "fieldAccess", "fieldName": "rows"},
                         {"type": "fieldAccess", "fieldName": "index"},
                         {"type": "constant", "value": 1}]}]}
    out = [tuple(r) for r in
           translate(q, spark, wiki_catalog)
           .select("market", "rows", "index", "addRowsIndexConstant",
                   "uniques", "maxIndex", "minIndex").collect()]
    exp = [
        ("total_market", 186, 215679.82879638672, 215866.82879638672,
         2, 1743.92175, 792.3260498046875),
        ("upfront", 186, 192046.1060180664, 192233.1060180664,
         2, 1870.061029, 545.9906005859375),
        ("spot", 837, 95606.57232284546, 96444.57232284546,
         9, 277.273533, 59.02102279663086),
    ]
    assert len(out) == 3
    for got, (mk, rows_, idx, aric, uq, mx, mn) in zip(out, exp):
        assert got[0] == mk and got[1] == rows_
        assert got[2] == pytest.approx(idx, rel=2e-6)
        assert got[3] == pytest.approx(aric, rel=2e-6)
        assert got[4] == pytest.approx(uq, abs=0.25)  # ref asserts HLL est
        assert got[5] == pytest.approx(mx, rel=2e-6)
        assert got[6] == pytest.approx(mn, rel=2e-6)


def test_full_on_timeseries_max_min(spark, wiki_catalog):
    """TimeseriesQueryRunnerTest testFullOnTimeseriesMaxMin — global
    doubleMax/doubleMin over the whole dataset."""
    q = {"queryType": "timeseries", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "aggregations": [
             {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
             {"type": "doubleMin", "name": "minIndex", "fieldName": "index"}]}
    r = translate(q, spark, wiki_catalog).first()
    assert r["maxIndex"] == pytest.approx(1870.061029, rel=2e-6)
    assert r["minIndex"] == pytest.approx(59.02102279663086, rel=2e-6)


def test_time_boundary_wiki(spark, wiki_catalog):
    """TimeBoundaryQueryRunnerTest — min/max timestamps of the fixture."""
    q = {"queryType": "timeBoundary", "dataSource": "wiki"}
    r = translate(q, spark, wiki_catalog).first()
    assert str(r["minTime"])[:10] == "2011-01-12"
    assert str(r["maxTime"])[:10] == "2011-04-15"


def test_search_quality_fragment(spark, wiki_catalog):
    """SearchQueryRunnerTest shape — insensitive contains over quality +
    market; counts are input-row counts (93 days per quality value in spot,
    …)."""
    q = {"queryType": "search", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "searchDimensions": ["quality", "market"],
         "query": {"type": "insensitive_contains", "value": "mezz"}}
    out = {(r["dimension"], r["value"]): r["count"]
           for r in translate(q, spark, wiki_catalog).collect()}
    assert out == {("quality", "mezzanine"): 279}


def test_group_by_mvd_placementish(spark, wiki_catalog):
    """MVD groupBy over placementish (explode semantics): 'preferred'
    appears in every row; single-letter values count their quality rows."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "all",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "dimensions": ["placementish"],
         "aggregations": [{"type": "count", "name": "rows"}]}
    out = {r["placementish"]: r["rows"]
           for r in translate(q, spark, wiki_catalog).collect()}
    assert out["preferred"] == 26            # all rows of the 2 days
    assert out["a"] == 2 and out["m"] == 6   # automotive / mezzanine rows


def test_topn_lexicographic(spark, wiki_catalog):
    """TopNQueryRunnerTest testTopNLexicographic — dimension metric spec,
    lexicographic order, previousStop ''."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "dimension": "market", "threshold": 4,
         "metric": {"type": "dimension", "previousStop": "",
                    "ordering": "lexicographic"},
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "doubleSum", "name": "index", "fieldName": "index"}],
         "postAggregations": [
             {"type": "arithmetic", "name": "addRowsIndexConstant",
              "fn": "+",
              "fields": [{"type": "fieldAccess", "fieldName": "rows"},
                         {"type": "fieldAccess", "fieldName": "index"},
                         {"type": "constant", "value": 1}]}]}
    out = [(r["market"], r["rows"], r["index"], r["addRowsIndexConstant"])
           for r in translate(q, spark, wiki_catalog).collect()]
    exp = [("spot", 18, 2231.876812, 2250.876812),
           ("total_market", 4, 5351.814783, 5356.814783),
           ("upfront", 4, 4875.669692, 4880.669692)]
    assert [o[0] for o in out] == [e[0] for e in exp]
    for o, e in zip(out, exp):
        assert o[1] == e[1]
        assert o[2] == pytest.approx(e[2], rel=2e-6)
        assert o[3] == pytest.approx(e[3], rel=2e-6)


def test_timeseries_with_timezone(spark, wiki_catalog):
    """TimeseriesQueryRunnerTest testTimeseriesWithTimeZone — LA-day
    granularity buckets (rows=13 each, idx 6619/5827)."""
    q = {"queryType": "timeseries", "dataSource": "wiki",
         "granularity": {"type": "period", "period": "P1D",
                         "timeZone": "America/Los_Angeles"},
         "intervals": ["2011-03-31T00:00:00-07:00/2011-04-02T00:00:00-07:00"],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"}],
         "context": {"skipEmptyBuckets": True}}
    out = [(str(r["__time"]), r["rows"], r["idx"])
           for r in translate(q, spark, wiki_catalog).collect()]
    # bucket instants: LA midnights = 07:00 UTC
    assert out == [("2011-03-31 07:00:00", 13, 6619),
                   ("2011-04-01 07:00:00", 13, 5827)]


def test_timeseries_grand_total(spark, wiki_catalog):
    """TimeseriesQueryRunnerTest testTimeseriesGrandTotal — per-day rows
    plus the grandTotal row (rows=26, index=12446)."""
    q = {"queryType": "timeseries", "dataSource": "wiki", "granularity": "day",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "index", "fieldName": "index"}],
         "context": {"grandTotal": True}}
    out = [(None if r["__time"] is None else str(r["__time"])[:10],
            r["rows"], r["index"])
           for r in translate(q, spark, wiki_catalog).collect()]
    assert ("2011-04-01", 13, 6619) in out
    assert ("2011-04-02", 13, 5827) in out
    assert (None, 26, 12446) in out


def test_ingest_wiki_tsv_rollup_then_query(spark, tmp_path):
    """End-to-end ingest parity: the reference's TSV ingested through the
    engine's own ingest() with the TestIndex-style spec (delimited format,
    \\x01 listDelimiter MVD, rollup with doubleSum index at queryGranularity
    none) — then the canonical GroupByQueryRunnerTest.testGroupBy expected
    values must come back from the ROLLED table."""
    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.sources.ingest import ingest

    spec = {
        "dataSchema": {
            "dataSource": "wiki_ingested",
            "timestampSpec": {"column": "ts", "format": "iso"},
            "granularitySpec": {"segmentGranularity": "month",
                                "queryGranularity": "none", "rollup": True},
            "dimensionsSpec": {"dimensions": [
                "market", "quality", "placement", "placementish"]},
            "metricsSpec": [
                {"type": "count", "name": "cnt"},
                {"type": "doubleSum", "name": "index", "fieldName": "index"}],
        },
        "ioConfig": {
            "inputSource": {
                "type": "local",
                "files": ["/root/reference/processing/src/test/resources/"
                          "druid.sample.numeric.tsv"]},
            "inputFormat": {
                "type": "tsv",
                "columns": ["ts", "market", "quality", "qualityLong",
                            "qualityFloat", "qualityDouble",
                            "qualityNumericString", "longNumericNull",
                            "floatNumericNull", "doubleNumericNull",
                            "placement", "placementish", "index"],
                "listDelimiter": "\x01",
                "multiValueColumns": ["placementish"]},
        },
    }
    cat = Catalog(spark)
    ingest(spark, spec, cat, str(tmp_path / "wh"))
    q = {"queryType": "groupBy", "dataSource": "wiki_ingested",
         "granularity": "day",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "alias"}],
         "aggregations": [
             {"type": "longSum", "name": "rows", "fieldName": "cnt"},
             {"type": "doubleSum", "name": "idxDouble", "fieldName": "index"}]}
    out = {(str(r["__time"])[:10], r["alias"]): (r["rows"], r["idxDouble"])
           for r in translate(q, spark, cat).collect()}
    assert out[("2011-04-01", "automotive")] == (
        1, pytest.approx(135.88510131835938, rel=2e-6))
    assert out[("2011-04-01", "mezzanine")] == (
        3, pytest.approx(2871.8866900000003, rel=2e-6))
    assert out[("2011-04-02", "premium")] == (
        3, pytest.approx(2506.415148, rel=2e-6))
    assert len(out) == 18
    # the rolled table's MVD column survived the ingest as an array
    mvd = {tuple(r["placementish"]) for r in
           cat.table("wiki_ingested").select("placementish").limit(5).collect()}
    assert all(len(t) == 2 and t[1] == "preferred" for t in mvd)


def test_merge_results_with_limit_and_offset(spark, wiki_catalog):
    """GroupByQueryRunnerTest doTestMergeResultsWithValidLimit — the 9
    known month-bucket rows sliced by every (limit, offset) combination
    (trimmed sweep of the reference's 19x21 grid; default limitSpec order
    = dimension lexicographic)."""
    base = [("automotive", 2, 269), ("business", 2, 217),
            ("entertainment", 2, 319), ("health", 2, 216),
            ("mezzanine", 6, 4420), ("news", 2, 221),
            ("premium", 6, 4416), ("technology", 2, 177),
            ("travel", 2, 243)]
    for limit in (1, 3, 5, 9, 12):
        for offset in (0, 1, 4, 8, 10):
            q = {"queryType": "groupBy", "dataSource": "wiki",
                 "granularity": {"type": "period", "period": "P1M"},
                 "intervals": ["2011-04-02T00:00:00Z/2011-04-04T00:00:00Z"],
                 "dimensions": [{"type": "default", "dimension": "quality",
                                 "outputName": "alias"}],
                 "aggregations": [
                     {"type": "count", "name": "rows"},
                     {"type": "longSum", "name": "idx",
                      "fieldName": "index"}],
                 "limitSpec": {"type": "default", "limit": limit,
                               "offset": offset,
                               "columns": [{"dimension": "alias",
                                            "direction": "ascending"}]}}
            out = [(r["alias"], r["rows"], r["idx"]) for r in
                   translate(q, spark, wiki_catalog).collect()]
            assert out == base[offset:offset + limit], (limit, offset)


def test_group_by_with_regex_filter(spark, wiki_catalog):
    """GroupByQueryRunnerTest.java:4618 testGroupByWithRegEx."""
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": {"type": "period", "period": "P1M"},
         "intervals": ["2011-04-02T00:00:00Z/2011-04-04T00:00:00Z"],
         "filter": {"type": "regex", "dimension": "quality",
                    "pattern": "auto.*"},
         "dimensions": ["quality"],
         "aggregations": [{"type": "count", "name": "rows"}]}
    out = [(r["quality"], r["rows"]) for r in
           translate(q, spark, wiki_catalog).collect()]
    assert out == [("automotive", 2)]


def test_group_by_regex_extraction_dim(spark, wiki_catalog):
    """GroupByQueryRunnerTest regex-extraction dimension ('(\\w{1})' — the
    quality first letter), day granularity over the canonical 2 days."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "dimensions": [{"type": "extraction", "dimension": "quality",
                         "outputName": "alias",
                         "extractionFn": {"type": "regex",
                                          "expr": "(\\w{1})"}}],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"}]}
    out = {(str(r["__time"])[:10], r["alias"]): (r["rows"], r["idx"])
           for r in translate(q, spark, wiki_catalog).collect()}
    assert out[("2011-04-01", "m")] == (3, 2870)
    assert out[("2011-04-01", "p")] == (3, 2900)
    assert out[("2011-04-01", "t")] == (2, 197)   # technology + travel
    assert out[("2011-04-02", "t")] == (2, 223)
    assert len(out) == 16                          # 8 letters × 2 days


def test_group_by_nonexistent_dimension(spark, wiki_catalog):
    """GroupByQueryRunnerTest testGroupByWithNonexistentDimension — a
    missing column reads as NULL, not an error."""
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": {"type": "period", "period": "P1M"},
         "intervals": ["2011-04-02T00:00:00Z/2011-04-04T00:00:00Z"],
         "dimensions": ["billy", "quality"],
         "aggregations": [{"type": "count", "name": "rows"}]}
    out = {(r["billy"], r["quality"]): r["rows"]
           for r in translate(q, spark, wiki_catalog).collect()}
    assert out[(None, "automotive")] == 2
    assert out[(None, "mezzanine")] == 6
    assert len(out) == 9


def test_scan_with_filter_limit_time_ordering(spark, wiki_catalog):
    """ScanQueryRunnerTest testFullOnSelectWithFilterLimitAnd*TimeOrdering —
    spot-filtered scans, ascending and descending time order, limit 3."""
    base = {"queryType": "scan", "dataSource": "wiki",
            "intervals": ["2011-01-12T00:00:00.000Z/2011-01-14T00:00:00.000Z"],
            "filter": {"type": "selector", "dimension": "market",
                       "value": "spot"},
            "columns": ["__time", "quality", "index"], "limit": 3}
    asc = translate({**base, "order": "ascending"},
                    spark, wiki_catalog).collect()
    assert [str(r["__time"])[:10] for r in asc] == ["2011-01-12"] * 3
    desc = translate({**base, "order": "descending"},
                     spark, wiki_catalog).collect()
    assert [str(r["__time"])[:10] for r in desc] == ["2011-01-13"] * 3
    # all spot rows of the 2 days, no limit
    full = translate({k: v for k, v in base.items() if k != "limit"},
                     spark, wiki_catalog)
    assert full.count() == 18
    assert set(full.columns) == {"__time", "quality", "index"}


def test_scan_nonexistent_column_is_null(spark, wiki_catalog):
    """ScanQueryRunnerTest testFullSelectNoDimensionAndMetric shape — scans
    naming absent columns return null columns, not errors."""
    q = {"queryType": "scan", "dataSource": "wiki",
         "intervals": ["2011-01-12T00:00:00.000Z/2011-01-13T00:00:00.000Z"],
         "columns": ["__time", "nosuchdim", "nosuchmet"], "limit": 3}
    out = translate(q, spark, wiki_catalog).collect()
    assert len(out) == 3
    assert all(r["nosuchdim"] is None and r["nosuchmet"] is None for r in out)


def _topn_base(metric, extra=None):
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "dimension": "market", "metric": metric, "threshold": 4,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "doubleSum", "name": "index", "fieldName": "index"}]}
    if extra:
        q.update(extra)
    return q


_TOPN_ROWS = {"total_market": (4, 5351.814783), "upfront": (4, 4875.669692),
              "spot": (18, 2231.876812)}


def _assert_topn(out, expected_order):
    assert [r["market"] for r in out] == expected_order
    for r in out:
        rows_, idx = _TOPN_ROWS[r["market"]]
        assert r["rows"] == rows_
        assert r["index"] == pytest.approx(idx, rel=2e-6)


def test_topn_numeric_metric(spark, wiki_catalog):
    """TopNQueryRunnerTest testTopN — numeric metric ordering."""
    out = translate(_topn_base("index"), spark, wiki_catalog).collect()
    _assert_topn(out, ["total_market", "upfront", "spot"])


def test_topn_with_or_filter(spark, wiki_catalog):
    """testTopNWithOrFilter1 — an `in`-style OR over the dimension leaves
    the result unchanged."""
    q = _topn_base("index", {"filter": {
        "type": "or", "fields": [
            {"type": "selector", "dimension": "market", "value": v}
            for v in ("total_market", "upfront", "spot")]}})
    out = translate(q, spark, wiki_catalog).collect()
    _assert_topn(out, ["total_market", "upfront", "spot"])


def test_topn_lexicographic_previous_stop(spark, wiki_catalog):
    """testTopNLexicographicWithPreviousStop — values after 'spot'."""
    q = _topn_base({"type": "dimension", "previousStop": "spot",
                    "ordering": "lexicographic"})
    out = translate(q, spark, wiki_catalog).collect()
    _assert_topn(out, ["total_market", "upfront"])


def test_topn_inverted_lexicographic_previous_stop(spark, wiki_catalog):
    """testTopNInvertedLexicographicWithPreviousStop — inverted order,
    values before 'upfront'."""
    q = _topn_base({"type": "inverted",
                    "metric": {"type": "dimension", "previousStop": "upfront",
                               "ordering": "lexicographic"}})
    out = translate(q, spark, wiki_catalog).collect()
    _assert_topn(out, ["total_market", "spot"])


def test_timeseries_unmatched_filters_zero_fill(spark, wiki_catalog):
    """TimeseriesQueryRunnerTest testTimeseriesWithNonExistentFilter +
    testTimeseriesWithFilterOnNonExistentDimension — filters matching
    nothing (unknown value, or a filter on an absent column) still emit the
    zero-filled day buckets: rows=0, summed index NULL (sql mode)."""
    for flt in ({"type": "selector", "dimension": "market", "value": "billy"},
                {"type": "selector", "dimension": "bobby", "value": "billy"}):
        q = {"queryType": "timeseries", "dataSource": "wiki",
             "granularity": "day",
             "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
             "filter": flt,
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "doubleSum", "name": "index",
                  "fieldName": "index"}]}
        out = translate(q, spark, wiki_catalog).collect()
        assert [(str(r["__time"])[:10], r["rows"], r["index"])
                for r in out] == [("2011-04-01", 0, None),
                                  ("2011-04-02", 0, None)], flt


def test_timeseries_null_filter_on_nonexistent_dim_matches_all(spark, wiki_catalog):
    """testTimeseriesWithNullFilterOnNonExistentDimension — selector(bobby,
    null) matches every row (the absent column reads as null)."""
    q = {"queryType": "timeseries", "dataSource": "wiki", "granularity": "day",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "filter": {"type": "selector", "dimension": "bobby", "value": None},
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"}]}
    out = translate(q, spark, wiki_catalog).collect()
    assert [(str(r["__time"])[:10], r["rows"], r["idx"]) for r in out] == [
        ("2011-04-01", 13, 6619), ("2011-04-02", 13, 5827)]


def test_search_default_all_dimensions(spark, wiki_catalog):
    """SearchQueryRunnerTest.testSearch — query 'a' over every dimension,
    incl. the MVD placementish (per-element hits) and the 186-row
    partial_null_column."""
    q = {"queryType": "search", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "searchDimensions": ["market", "quality", "placement",
                              "placementish", "partial_null_column"],
         "query": {"type": "insensitive_contains", "value": "a"}}
    out = {(r["dimension"], r["value"]): r["count"]
           for r in translate(q, spark, wiki_catalog).collect()}
    assert out == {
        ("quality", "automotive"): 93, ("quality", "mezzanine"): 279,
        ("quality", "travel"): 93, ("quality", "health"): 93,
        ("quality", "entertainment"): 93,
        ("market", "total_market"): 186,
        ("placementish", "a"): 93,
        ("partial_null_column", "value"): 186,
    }


def test_search_same_value_in_multi_dims(spark, wiki_catalog):
    """SearchQueryRunnerTest.testSearchSameValueInMultiDims — the same hit
    value reported per dimension, incl. the MVD's 'preferred' element."""
    q = {"queryType": "search", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "searchDimensions": ["placement", "placementish"],
         "query": {"type": "insensitive_contains", "value": "e"}}
    out = {(r["dimension"], r["value"]): r["count"]
           for r in translate(q, spark, wiki_catalog).collect()}
    assert out == {
        ("placement", "preferred"): 1209,
        ("placementish", "e"): 93,
        ("placementish", "preferred"): 1209,
    }


def test_group_by_long_and_float_typed_dims(spark, wiki_catalog):
    """GroupByQueryRunnerTest testGroupByLongColumn / testGroupByFloatColumn
    — typed (LONG/FLOAT outputType) dimension specs with numeric-comparator
    ordering."""
    base = {"queryType": "groupBy", "dataSource": "wiki",
            "granularity": "day",
            "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
            "filter": {"type": "selector", "dimension": "quality",
                       "value": "entertainment"},
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "longSum", "name": "idx", "fieldName": "index"}]}
    ql = translate({**base, "dimensions": [
        {"type": "default", "dimension": "qualityLong",
         "outputName": "ql_alias", "outputType": "LONG"}],
        "limitSpec": {"type": "default", "columns": [
            {"dimension": "ql_alias", "direction": "ascending",
             "dimensionOrder": "numeric"}]}}, spark, wiki_catalog).collect()
    assert [(str(r["__time"])[:10], r["ql_alias"], r["rows"], r["idx"])
            for r in ql] == [("2011-04-01", 1200, 1, 158),
                             ("2011-04-02", 1200, 1, 166)]
    fl = translate({**base, "dimensions": [
        {"type": "default", "dimension": "index",
         "outputName": "index_alias", "outputType": "FLOAT"}]},
        spark, wiki_catalog).collect()
    got = sorted((str(r["__time"])[:10], r["index_alias"], r["idx"])
                 for r in fl)
    assert got[0][0] == "2011-04-01" and got[0][1] == pytest.approx(
        158.747224, rel=1e-6) and got[0][2] == 158
    assert got[1][0] == "2011-04-02" and got[1][1] == pytest.approx(
        166.016049, rel=1e-6) and got[1][2] == 166


def test_merged_having_spec(spark, wiki_catalog):
    """GroupByQueryRunnerTest testMergedHavingSpec — OR of greaterThan and
    equalTo having specs over the month bucket."""
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": {"type": "period", "period": "P1M"},
         "intervals": ["2011-04-02T00:00:00Z/2011-04-04T00:00:00Z"],
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "alias"}],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"}],
         "having": {"type": "or", "havingSpecs": [
             {"type": "greaterThan", "aggregation": "rows", "value": 2},
             {"type": "equalTo", "aggregation": "idx", "value": 217}]}}
    out = sorted((r["alias"], r["rows"], r["idx"]) for r in
                 translate(q, spark, wiki_catalog).collect())
    assert out == [("business", 2, 217), ("mezzanine", 6, 4420),
                   ("premium", 6, 4416)]


def test_group_by_having_on_hyper_unique(spark, wiki_catalog):
    """GroupByQueryRunnerTest testGroupByWithHavingOnHyperUnique — having
    over the approximate-distinct metric with a finalizing post-agg."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "dimensions": ["market"],
         "aggregations": [{"type": "hyperUnique", "name": "uniques",
                           "fieldName": "quality"}],
         "postAggregations": [
             {"type": "hyperUniqueCardinality", "name": "auto_finalized",
              "fieldName": "uniques"}],
         "having": {"type": "greaterThan", "aggregation": "uniques",
                    "value": 8},
         "limitSpec": {"type": "default", "limit": 3, "columns": [
             {"dimension": "uniques", "direction": "descending"}]}}
    out = translate(q, spark, wiki_catalog).collect()
    assert len(out) == 1
    r = out[0]
    assert r["market"] == "spot"
    assert r["uniques"] == pytest.approx(9.0198, abs=0.25)
    assert r["auto_finalized"] == pytest.approx(9.0198, abs=0.25)


def test_group_by_with_cardinality_and_subquery(spark, wiki_catalog):
    """GroupByQueryRunnerTest testGroupByWithCardinality (26 rows,
    cardinality ≈ UNIQUES_9) + testSubqueryWithOuterCardinalityAggregator
    (cardinality over a nested groupBy's quality output = 9)."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "all",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "dimensions": [],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "cardinality", "name": "cardinality",
              "fields": ["quality"], "byRow": False}]}
    r = translate(q, spark, wiki_catalog).first()
    assert r["rows"] == 26
    assert r["cardinality"] == pytest.approx(9.0198, abs=0.25)
    nested = {"queryType": "groupBy",
              "dataSource": {"type": "query", "query": {
                  "queryType": "groupBy", "dataSource": "wiki",
                  "granularity": "all",
                  "dimensions": ["market", "quality"],
                  "aggregations": [
                      {"type": "count", "name": "rows"},
                      {"type": "longSum", "name": "index",
                       "fieldName": "index"}]}},
              "granularity": "all", "dimensions": [],
              "aggregations": [{"type": "cardinality", "name": "car",
                                "fields": ["quality"], "byRow": False}]}
    assert translate(nested, spark, wiki_catalog).first()["car"] == \
        pytest.approx(9.0198, abs=0.25)


def test_group_by_expression_aggregator_native(spark, wiki_catalog):
    """GroupByQueryRunnerTest testGroupByWithExpressionAggregator — the
    expressionLambda pair (hand-rolled row count + double sum) matches the
    canonical rows/idx values."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "alias"}],
         "aggregations": [
             {"type": "expressionLambda", "name": "rows", "fields": [],
              "initialValue": "0", "fold": "__acc + 1"},
             {"type": "expressionLambda", "name": "idx",
              "fields": ["index"], "initialValue": "0.0",
              "fold": "__acc + index"}]}
    out = {(str(r["__time"])[:10], r["alias"]): (r["rows"], r["idx"])
           for r in translate(q, spark, wiki_catalog).collect()}
    assert out[("2011-04-01", "mezzanine")][0] == 3
    assert out[("2011-04-01", "mezzanine")][1] == pytest.approx(
        2871.8866900000003, rel=2e-6)
    assert out[("2011-04-02", "premium")][0] == 3
    assert out[("2011-04-02", "premium")][1] == pytest.approx(
        2506.415148, rel=2e-6)


def test_timeseries_hour_zero_filling(spark, wiki_catalog):
    """TimeseriesQueryRunnerTest testTimeseriesQueryZeroFilling — hour
    buckets across two days: data rows at day boundaries, 23 zero-filled
    hours between them (rows=0, longSum NULL); the timeline condenses to
    the data's true extent (parquet footer stats), so nothing fills past
    the 2011-04-15T00 bucket — the reference's exact 25 rows."""
    q = {"queryType": "timeseries", "dataSource": "wiki",
         "granularity": "hour",
         "intervals": ["2011-04-14T00:00:00.000Z/2011-04-16T00:00:00.000Z"],
         "filter": {"type": "in", "dimension": "market",
                    "values": ["spot", "upfront", "total_market"]},
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"}]}
    out = [(str(r["__time"]), r["rows"], r["idx"]) for r in
           translate(q, spark, wiki_catalog).collect()]
    assert len(out) == 25
    assert out[0] == ("2011-04-14 00:00:00", 13, 4907)
    assert out[-1] == ("2011-04-15 00:00:00", 13, 4717)
    for t, rows_, idx in out[1:-1]:
        assert rows_ == 0 and idx is None, t


def test_information_schema_columns(spark, wiki_catalog, foo_catalog):
    """CalciteQueryTest testInformationSchemaColumnsOnTable shape — the
    column catalog reports Druid type names for foo's scalar columns."""
    from incubator_druid_spark.sql.functions import druid_sql
    out = {r["COLUMN_NAME"]: r["DATA_TYPE"] for r in druid_sql(
        spark, """
        SELECT COLUMN_NAME, DATA_TYPE FROM INFORMATION_SCHEMA.COLUMNS
        WHERE TABLE_NAME = 'foo'""", foo_catalog).collect()}
    assert out["__time"] == "TIMESTAMP"
    assert out["cnt"] == "BIGINT"
    assert out["dim1"] == "VARCHAR"
    assert out["m1"] == "FLOAT" and out["m2"] == "DOUBLE"


def test_filter_on_current_timestamp(spark, foo_catalog):
    """CalciteQueryTest testFilterOnCurrentTimestampWithIntervalArithmetic
    shape — all foo rows precede now; none follow."""
    from incubator_druid_spark.sql.functions import druid_sql
    assert druid_sql(spark, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE __time <= CURRENT_TIMESTAMP + INTERVAL '1' DAY""",
        foo_catalog).first()["c"] == 6
    assert druid_sql(spark, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE __time >= CURRENT_TIMESTAMP""", foo_catalog).first()["c"] == 0


def test_timeseries_origin_offset_granularity(spark, wiki_catalog):
    """TimeseriesQueryRunnerTest
    testTimeseriesQueryGranularityNotAlignedWithRollupGranularity — PT1H
    buckets anchored at origin epoch+60000ms: the 2011-04-15 00:00 rows land
    in the bucket starting 2011-04-14T23:01Z."""
    q = {"queryType": "timeseries", "dataSource": "wiki",
         "granularity": {"type": "period", "period": "PT1H",
                         "origin": "1970-01-01T00:01:00Z"},
         "intervals": ["2011-04-15T00:00:00.000Z/2012-01-01T00:00:00Z"],
         "filter": {"type": "in", "dimension": "market",
                    "values": ["spot", "upfront", "total_market"]},
         "context": {"skipEmptyBuckets": True},
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"}]}
    out = [(str(r["__time"]), r["rows"], r["idx"]) for r in
           translate(q, spark, wiki_catalog).collect()]
    assert out == [("2011-04-14 23:01:00", 13, 4717)]


def test_topn_dim_extraction_to_one(spark, wiki_catalog):
    """TopNQueryRunnerTest testTopNDimExtractionToOne — an extractionFn
    collapsing every dimension value to one group (stringFormat constant
    standing in for the reference's JS fn): full-dataset totals 1209 rows /
    503332.5071372986 summed index."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "dimension": {"type": "extraction", "dimension": "market",
                       "outputName": "market",
                       "extractionFn": {"type": "stringFormat",
                                        "format": "POTATO"}},
         "metric": "rows", "threshold": 10,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "doubleSum", "name": "index", "fieldName": "index"}],
         "postAggregations": [
             {"type": "arithmetic", "name": "addRowsIndexConstant",
              "fn": "+",
              "fields": [{"type": "fieldAccess", "fieldName": "rows"},
                         {"type": "fieldAccess", "fieldName": "index"},
                         {"type": "constant", "value": 1}]}]}
    out = translate(q, spark, wiki_catalog).collect()
    assert len(out) == 1
    r = out[0]
    assert r["market"] == "POTATO" and r["rows"] == 1209
    assert r["index"] == pytest.approx(503332.5071372986, rel=2e-6)
    assert r["addRowsIndexConstant"] == pytest.approx(504542.5071372986,
                                                      rel=2e-6)


def test_search_on_time_column_as_long(spark, wiki_catalog):
    """SearchQueryRunnerTest testSearchOnLongColumn — search matches the
    millis rendering of __time (1297123200000 = 2011-02-08, 13 rows)."""
    q = {"queryType": "search", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "searchDimensions": [{"type": "default", "dimension": "__time",
                               "outputName": "__time", "outputType": "LONG"}],
         "query": {"type": "contains", "value": "1297123200000"}}
    out = {(r["dimension"], r["value"]): r["count"]
           for r in translate(q, spark, wiki_catalog).collect()}
    assert out == {("__time", "1297123200000"): 13}


def test_search_on_time_extraction(spark, wiki_catalog):
    """testSearchOnTime — timeFormat extraction (day name) searched for
    'Friday': 169 rows."""
    q = {"queryType": "search", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "searchDimensions": [{"type": "extraction", "dimension": "__time",
                               "outputName": "__time2",
                               "extractionFn": {"type": "timeFormat",
                                                "format": "EEEE"}}],
         "query": {"type": "contains", "value": "Friday"}}
    out = {(r["dimension"], r["value"]): r["count"]
           for r in translate(q, spark, wiki_catalog).collect()}
    assert out == {("__time2", "Friday"): 169}


def test_search_with_numeric_sort(spark, wiki_catalog):
    """SearchQueryRunnerTest testSearchWithNumericSort — non-numeric values
    under the numeric comparator order lexicographically (StringComparators
    .NUMERIC falls back for unparseable strings); same 8 hits as testSearch."""
    q = {"queryType": "search", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "searchDimensions": ["market", "quality", "placement",
                              "placementish", "partial_null_column"],
         "query": {"type": "insensitive_contains", "value": "a"},
         "sort": {"type": "numeric"}}
    out = [(r["dimension"], r["value"], r["count"]) for r in
           translate(q, spark, wiki_catalog).collect()]
    assert out == [
        ("placementish", "a", 93),
        ("quality", "automotive", 93),
        ("quality", "entertainment", 93),
        ("quality", "health", 93),
        ("quality", "mezzanine", 279),
        ("market", "total_market", 186),
        ("quality", "travel", 93),
        ("partial_null_column", "value", 186),
    ]


def test_group_by_string_virtual_column(spark, wiki_catalog):
    """GroupByQueryRunnerTest testGroupByWithStringVirtualColumn —
    expression virtual column `quality + 'x'` (string `+` concatenates,
    BinPlusExpr.evalString) grouped per day, canonical 18-row values."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "virtualColumns": [{"type": "expression", "name": "vc",
                             "expression": "quality + 'x'",
                             "outputType": "STRING"}],
         "dimensions": [{"type": "default", "dimension": "vc",
                         "outputName": "alias"}],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"}]}
    out = {(str(r["__time"])[:10], r["alias"]): (r["rows"], r["idx"])
           for r in translate(q, spark, wiki_catalog).collect()}
    assert len(out) == 18
    assert out[("2011-04-01", "mezzaninex")] == (3, 2870)
    assert out[("2011-04-01", "technologyx")] == (1, 78)
    assert out[("2011-04-02", "premiumx")] == (3, 2505)
    assert out[("2011-04-02", "travelx")] == (1, 126)


def test_group_by_numeric_strings_as_numeric(spark, wiki_catalog):
    """GroupByQueryRunnerTest testGroupByNumericStringsAsNumeric — a nested
    groupBy whose outer dims retype the inner outputs (time as LONG millis,
    long re-read as FLOAT)."""
    sub = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
           "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
           "filter": {"type": "selector", "dimension": "quality",
                      "value": "entertainment"},
           "dimensions": [
               {"type": "default", "dimension": "qualityLong",
                "outputName": "ql_alias"},
               {"type": "default", "dimension": "qualityFloat",
                "outputName": "qf_alias"},
               {"type": "default", "dimension": "__time",
                "outputName": "time_alias"}],
           "aggregations": [
               {"type": "count", "name": "rows"},
               {"type": "longSum", "name": "idx", "fieldName": "index"}]}
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": sub},
             "granularity": "all",
             "dimensions": [
                 {"type": "default", "dimension": "time_alias",
                  "outputName": "time_alias2", "outputType": "LONG"},
                 {"type": "default", "dimension": "ql_alias",
                  "outputName": "ql_alias_long", "outputType": "LONG"},
                 {"type": "default", "dimension": "qf_alias",
                  "outputName": "qf_alias_float", "outputType": "FLOAT"},
                 {"type": "default", "dimension": "ql_alias",
                  "outputName": "ql_alias_float", "outputType": "FLOAT"}],
             "aggregations": [{"type": "count", "name": "count"}]}
    out = sorted(tuple(r) for r in
                 translate(outer, spark, wiki_catalog).collect())
    assert out == [
        (1301616000000, 1200, 12000.0, 1200.0, 1),
        (1301702400000, 1200, 12000.0, 1200.0, 1)]


def test_topn_list_filtered_numeric_string(spark, wiki_catalog):
    """TopNQueryRunnerTest testFullOnTopNNumericStringColumnWithDecoration —
    listFiltered whitelist over the LONG-typed numeric-string dim, top-3 by
    maxIndex."""
    q = {"queryType": "topN", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "dimension": {"type": "listFiltered",
                       "delegate": {"type": "default",
                                    "dimension": "qualityNumericString",
                                    "outputName": "qns_alias",
                                    "outputType": "LONG"},
                       "values": ["120000", "140000", "160000"],
                       "isWhitelist": True},
         "metric": "maxIndex", "threshold": 4,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "doubleSum", "name": "index", "fieldName": "index"},
             {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
             {"type": "doubleMin", "name": "minIndex", "fieldName": "index"}]}
    out = [(r["qns_alias"], r["rows"], r["index"], r["maxIndex"],
            r["minIndex"]) for r in translate(q, spark, wiki_catalog).collect()]
    exp = [(140000, 279, 217725.41940800005, 1870.061029, 91.270553),
           (160000, 279, 210865.67977600006, 1862.737933, 99.284525),
           (120000, 93, 12086.472791, 193.787574, 84.710523)]
    assert len(out) == 3
    for got, (qns, rows_, idx, mx, mn) in zip(out, exp):
        assert got[0] == qns and got[1] == rows_
        assert got[2] == pytest.approx(idx, rel=2e-6)
        assert got[3] == pytest.approx(mx, rel=2e-6)
        assert got[4] == pytest.approx(mn, rel=2e-6)


def test_group_by_numeric_strings_as_numeric_with_decoration(spark, wiki_catalog):
    """GroupByQueryRunnerTest testGroupByNumericStringsAsNumericWithDecoration
    — filtered dimension specs over a typed dim in GROUPBY: the all-pruned
    'entertainment' rows aggregate under a NULL group
    (GroupByQueryEngineV2.java:864-867 GROUP_BY_MISSING_VALUE), unlike topN
    where empty selector rows are skipped."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "all",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "filter": {"type": "in", "dimension": "quality",
                    "values": ["entertainment", "technology"]},
         "dimensions": [
             {"type": "regexFiltered",
              "delegate": {"type": "default",
                           "dimension": "qualityNumericString",
                           "outputName": "ql", "outputType": "LONG"},
              "pattern": "170000"},
             {"type": "listFiltered",
              "delegate": {"type": "default",
                           "dimension": "qualityNumericString",
                           "outputName": "qf", "outputType": "FLOAT"},
              "values": ["170000"], "isWhitelist": True}],
         "aggregations": [{"type": "count", "name": "count"}],
         "limitSpec": {"type": "default",
                       "columns": [{"dimension": "ql"}]}}
    out = [(r["ql"], r["qf"], r["count"])
           for r in translate(q, spark, wiki_catalog).collect()]
    assert out == [(None, None, 2), (170000, 170000.0, 2)]


def test_group_by_decoration_on_numerics(spark, wiki_catalog):
    """GroupByQueryRunnerTest testGroupByDecorationOnNumerics — regexFiltered
    over a native LONG dim (full-match semantics of
    RegexFilteredDimensionSpec.java:81 Matcher.matches()) + listFiltered over
    a native FLOAT dim whose whitelist matches the STRING rendering
    '17000.0'; all-pruned rows → null group."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "all",
         "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
         "filter": {"type": "in", "dimension": "quality",
                    "values": ["entertainment", "technology"]},
         "dimensions": [
             {"type": "regexFiltered",
              "delegate": {"type": "default", "dimension": "qualityLong",
                           "outputName": "ql", "outputType": "LONG"},
              "pattern": "1700"},
             {"type": "listFiltered",
              "delegate": {"type": "default", "dimension": "qualityFloat",
                           "outputName": "qf", "outputType": "FLOAT"},
              "values": ["17000.0"], "isWhitelist": True}],
         "aggregations": [{"type": "count", "name": "count"}]}
    out = sorted(((r["ql"], r["qf"], r["count"])
                  for r in translate(q, spark, wiki_catalog).collect()),
                 key=lambda t: (t[0] is not None, t[0] or 0))
    assert out == [(None, None, 2), (1700, 17000.0, 2)]


def test_search_on_float_column(spark, wiki_catalog):
    """SearchQueryRunnerTest.testSearchOnFloatColumn — searching a DOUBLE
    dimension spec matches against the numeric rendering."""
    q = {"queryType": "search", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "searchDimensions": [{"type": "default", "dimension": "index",
                               "outputName": "index",
                               "outputType": "DOUBLE"}],
         "query": {"type": "contains", "value": "100.7"}}
    out = {r["value"]: r["count"]
           for r in translate(q, spark, wiki_catalog).collect()}
    assert len(out) == 2
    assert all(v.startswith("100.7") for v in out)
    assert all(c == 1 for c in out.values())


def test_search_multi_and_filter(spark, wiki_catalog):
    """testSearchMultiAndFilter — AND filter narrows hits to one value."""
    q = {"queryType": "search", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "searchDimensions": ["quality"],
         "filter": {"type": "and", "fields": [
             {"type": "selector", "dimension": "market", "value": "spot"},
             {"type": "selector", "dimension": "quality",
              "value": "automotive"}]},
         "query": {"type": "insensitive_contains", "value": "a"}}
    out = [(r["dimension"], r["value"], r["count"])
           for r in translate(q, spark, wiki_catalog).collect()]
    assert out == [("quality", "automotive", 93)]


def test_search_with_multi_or_filter(spark, wiki_catalog):
    """testSearchWithMultiOrFilter — OR of two quality selectors; only
    automotive contains 'a'."""
    q = {"queryType": "search", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "searchDimensions": ["quality"],
         "filter": {"type": "or", "fields": [
             {"type": "selector", "dimension": "quality",
              "value": "total_market"},
             {"type": "selector", "dimension": "quality",
              "value": "automotive"}]},
         "query": {"type": "insensitive_contains", "value": "a"}}
    out = [(r["value"], r["count"])
           for r in translate(q, spark, wiki_catalog).collect()]
    assert out == [("automotive", 93)]


def test_search_with_filter_empty_results(spark, wiki_catalog):
    """testSearchWithFilterEmptyResults — contradictory AND yields zero
    hits."""
    q = {"queryType": "search", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "searchDimensions": ["quality"],
         "filter": {"type": "and", "fields": [
             {"type": "selector", "dimension": "market",
              "value": "total_market"},
             {"type": "selector", "dimension": "quality",
              "value": "automotive"}]},
         "query": {"type": "insensitive_contains", "value": "a"}}
    assert translate(q, spark, wiki_catalog).collect() == []


def test_search_with_not_existed_dimension(spark, wiki_catalog):
    """testSearchWithNotExistedDimension — a nonexistent search dimension
    yields no hits (reads as null, null is never a search hit)."""
    q = {"queryType": "search", "dataSource": "wiki", "granularity": "all",
         "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
         "searchDimensions": ["asdf"],
         "query": {"type": "insensitive_contains", "value": "a"}}
    assert translate(q, spark, wiki_catalog).collect() == []
