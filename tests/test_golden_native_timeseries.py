"""Round-3 TimeseriesQueryRunnerTest tranche — virtual columns, unaligned
period buckets with timezones, multi-dim and IN filters, and MVD-filter
equivalences (processing/src/test/java/org/apache/druid/query/timeseries/
TimeseriesQueryRunnerTest.java)."""

import pytest

from incubator_druid_spark import translate

F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]

AGGS = [
    {"type": "count", "name": "rows"},
    {"type": "doubleSum", "name": "index", "fieldName": "index"},
]
ARIC = [{"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
         "fields": [{"type": "fieldAccess", "fieldName": "rows"},
                    {"type": "fieldAccess", "fieldName": "index"},
                    {"type": "constant", "value": 1}]}]


def ts(spark, cat, **extra):
    q = {"queryType": "timeseries", "dataSource": "wiki",
         "granularity": "day", "intervals": F2T, "aggregations": AGGS}
    q.update(extra)
    return translate(q, spark, cat).collect()


def test_ts_with_virtual_column(spark, wiki_catalog):
    """testTimeseriesWithVirtualColumn — longSum over a FLOAT identity
    expression equals longSum over the source."""
    out = ts(spark, wiki_catalog,
             aggregations=[{"type": "count", "name": "rows"},
                           {"type": "longSum", "name": "idx",
                            "fieldName": "expr"}],
             virtualColumns=[{"type": "expression", "name": "expr",
                              "expression": "index",
                              "outputType": "FLOAT"}])
    got = [(str(r["__time"])[:10], r["rows"], r["idx"]) for r in out]
    assert sorted(got) == [("2011-04-01", 13, 6619),
                           ("2011-04-02", 13, 5827)]


def test_ts_period_buckets_not_aligned_with_tz(spark, wiki_catalog):
    """testTimeseriesGranularityNotAlignedOnSegmentBoundariesWithFilter —
    P7D buckets in America/Los_Angeles: the first bucket starts BEFORE the
    interval (2011-01-06 LA), the second on 2011-01-13 LA."""
    out = ts(spark, wiki_catalog,
             granularity={"type": "period", "period": "P7D",
                          "timeZone": "America/Los_Angeles"},
             intervals=["2011-01-12T00:00:00.000-08:00/"
                        "2011-01-20T00:00:00.000-08:00"],
             filter={"type": "in", "dimension": "market",
                     "values": ["spot", "upfront", "total_market"]},
             aggregations=[{"type": "count", "name": "rows"},
                           {"type": "longSum", "name": "idx",
                            "fieldName": "index"}])
    got = sorted((r["rows"], r["idx"]) for r in out)
    assert got == [(13, 6071), (91, 33382)]


def test_ts_multi_dim_filters(spark, wiki_catalog):
    """testTimeseriesWithMultiDimFilter + testTimeseriesWithOtherMultiDim-
    Filter — ANDed selectors down to one row per day."""
    for quality, v1, v2 in [("automotive", 135.885094, 147.425935),
                            ("business", 118.570340, 112.987027)]:
        out = ts(spark, wiki_catalog,
                 filter={"type": "and", "fields": [
                     {"type": "selector", "dimension": "market",
                      "value": "spot"},
                     {"type": "selector", "dimension": "quality",
                      "value": quality}]},
                 postAggregations=ARIC)
        got = sorted((str(r["__time"])[:10], r["rows"], r["index"],
                      r["addRowsIndexConstant"]) for r in out)
        assert got[0][0] == "2011-04-01" and got[0][1] == 1
        assert got[0][2] == pytest.approx(v1, rel=2e-6)
        assert got[0][3] == pytest.approx(v1 + 2, rel=2e-6)
        assert got[1][0] == "2011-04-02" and got[1][1] == 1
        assert got[1][2] == pytest.approx(v2, rel=2e-6)


def test_ts_in_filter_with_unknown_value(spark, wiki_catalog):
    """testTimeseriesWithInFilter — an IN list containing an unmatched
    value ('billyblank') changes nothing."""
    out = ts(spark, wiki_catalog,
             filter={"type": "in", "dimension": "market",
                     "values": ["spot", "upfront", "total_market",
                                "billyblank"]},
             aggregations=[{"type": "count", "name": "rows"},
                           {"type": "longSum", "name": "index",
                            "fieldName": "index"}],
             postAggregations=ARIC)
    got = sorted((str(r["__time"])[:10], r["rows"], r["index"],
                  r["addRowsIndexConstant"]) for r in out)
    assert got == [("2011-04-01", 13, 6619, 6633.0),
                   ("2011-04-02", 13, 5827, 5841.0)]


def _rows(out):
    return sorted((str(r["__time"])[:10], r["rows"],
                   round(float(r["index"]), 4)) for r in out)


def test_ts_multi_value_dim_filter_equivalences(spark, wiki_catalog):
    """testTimeseriesWithMultiValueDimFilter1/2 + AndOr1 — an MVD selector
    is ANY-element-match: placementish='preferred' ≡ unfiltered;
    placementish='a' ≡ quality='automotive' (alone and under AND spot)."""
    unfiltered = ts(spark, wiki_catalog)
    preferred = ts(spark, wiki_catalog,
                   filter={"type": "selector", "dimension": "placementish",
                           "value": "preferred"})
    assert _rows(preferred) == _rows(unfiltered)
    a_mvd = ts(spark, wiki_catalog,
               filter={"type": "selector", "dimension": "placementish",
                       "value": "a"})
    auto_ = ts(spark, wiki_catalog,
               filter={"type": "selector", "dimension": "quality",
                       "value": "automotive"})
    assert _rows(a_mvd) == _rows(auto_)
    and_mvd = ts(spark, wiki_catalog,
                 filter={"type": "and", "fields": [
                     {"type": "selector", "dimension": "market",
                      "value": "spot"},
                     {"type": "selector", "dimension": "placementish",
                      "value": "a"}]})
    and_scalar = ts(spark, wiki_catalog,
                    filter={"type": "and", "fields": [
                        {"type": "selector", "dimension": "market",
                         "value": "spot"},
                        {"type": "selector", "dimension": "quality",
                         "value": "automotive"}]})
    assert _rows(and_mvd) == _rows(and_scalar)


def test_ts_interval_out_of_range(spark, wiki_catalog):
    """testTimeseriesQueryBeyondTimeRangeOfData — an interval past the data
    with skipEmptyBuckets returns nothing."""
    out = ts(spark, wiki_catalog,
             intervals=["2015-01-01T00:00:00Z/2015-01-02T00:00:00Z"],
             context={"skipEmptyBuckets": True})
    assert out == []


# --------------------------------------------------------------------------
# TimeBoundaryQueryRunnerTest tranche (over the wiki fixture)
# --------------------------------------------------------------------------

def test_time_boundary_full_and_bounds(spark, wiki_catalog):
    """testTimeBoundary / Max / Min — min 2011-01-12, max 2011-04-15."""
    both = translate({"queryType": "timeBoundary", "dataSource": "wiki"},
                     spark, wiki_catalog).collect()[0]
    assert str(both["minTime"])[:10] == "2011-01-12"
    assert str(both["maxTime"])[:10] == "2011-04-15"
    mx = translate({"queryType": "timeBoundary", "dataSource": "wiki",
                    "bound": "maxTime"}, spark, wiki_catalog).collect()[0]
    assert str(mx["maxTime"])[:10] == "2011-04-15"
    assert "minTime" not in mx.asDict()
    mn = translate({"queryType": "timeBoundary", "dataSource": "wiki",
                    "bound": "minTime"}, spark, wiki_catalog).collect()[0]
    assert str(mn["minTime"])[:10] == "2011-01-12"
    assert "maxTime" not in mn.asDict()


def test_filtered_time_boundary(spark, wiki_catalog):
    """testFilteredTimeBoundaryQuery (+NoMatches) — the filter narrows the
    bounds; an unmatched filter yields no row."""
    r = translate({"queryType": "timeBoundary", "dataSource": "wiki",
                   "filter": {"type": "selector", "dimension": "market",
                              "value": "spot"}},
                  spark, wiki_catalog).collect()
    assert len(r) == 1
    assert str(r[0]["minTime"])[:10] == "2011-01-12"
    r2 = translate({"queryType": "timeBoundary", "dataSource": "wiki",
                    "filter": {"type": "selector", "dimension": "market",
                               "value": "nonexistent"}},
                   spark, wiki_catalog).collect()
    assert r2 == [] or all(v is None for v in r2[0].asDict().values())


def test_ts_with_varying_gran(spark, wiki_catalog):
    """testTimeseriesWithVaryingGran — the same single-day interval bucketed
    at P1M (bucket start BEFORE the interval: 2011-04-01) vs DAY
    (2011-04-02)."""
    aggs = [{"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx", "fieldName": "index"}]
    out1 = ts(spark, wiki_catalog,
              granularity={"type": "period", "period": "P1M"},
              intervals=["2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
              aggregations=aggs)
    assert [(str(r["__time"])[:10], r["rows"], r["idx"]) for r in out1] == [
        ("2011-04-01", 13, 5827)]
    out2 = ts(spark, wiki_catalog, granularity="day",
              intervals=["2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
              aggregations=aggs)
    assert [(str(r["__time"])[:10], r["rows"], r["idx"]) for r in out2] == [
        ("2011-04-02", 13, 5827)]


def test_ts_hour_granularity_with_origin(spark, wiki_catalog):
    """testTimeseriesQueryGranularityNotAlignedWithRollupGranularity — PT1H
    buckets with origin 1970-01-01T00:01Z: the 2011-04-15 rows land in the
    bucket starting 2011-04-14T23:01Z."""
    out = ts(spark, wiki_catalog,
             granularity={"type": "period", "period": "PT1H",
                          "origin": "1970-01-01T00:01:00Z",
                          "timeZone": "UTC"},
             intervals=["2011-04-15T00:00:00.000Z/2012-01-01T00:00:00Z"],
             filter={"type": "in", "dimension": "market",
                     "values": ["spot", "upfront", "total_market"]},
             aggregations=[{"type": "count", "name": "rows"},
                           {"type": "longSum", "name": "idx",
                            "fieldName": "index"}],
             context={"skipEmptyBuckets": True})
    got = [(str(r["__time"]), r["rows"], r["idx"]) for r in out]
    assert got == [("2011-04-14 23:01:00", 13, 4717)]


def test_ts_nonexistent_value_in_or_filter(spark, wiki_catalog):
    """testTimeseriesWithNonExistentFilterAndMultiDimAndOr — an OR listing
    an unmatched value ('billyblank') under AND spot."""
    out = ts(spark, wiki_catalog,
             filter={"type": "and", "fields": [
                 {"type": "selector", "dimension": "market",
                  "value": "spot"},
                 {"type": "or", "fields": [
                     {"type": "selector", "dimension": "quality",
                      "value": v}
                     for v in ["automotive", "business", "billyblank"]]}]},
             postAggregations=ARIC)
    got = sorted((str(r["__time"])[:10], r["rows"], r["index"],
                  r["addRowsIndexConstant"]) for r in out)
    assert got[0][0] == "2011-04-01" and got[0][1] == 2
    assert got[0][2] == pytest.approx(254.4554443359375, rel=2e-6)
    assert got[0][3] == pytest.approx(257.4554443359375, rel=2e-6)
    assert got[1][0] == "2011-04-02" and got[1][1] == 2
    assert got[1][2] == pytest.approx(260.4129638671875, rel=2e-6)
