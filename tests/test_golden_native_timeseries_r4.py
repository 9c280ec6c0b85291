"""Round-4 TimeseriesQueryRunnerTest tranche — full-interval min/max,
first/last with segment-order ties, grand total, empty/out-of-range
intervals, or/regex/multi-dim/MVD filters, filtered aggs over absent
dimensions, timestampResultField context (processing/src/test/java/org/
apache/druid/query/timeseries/TimeseriesQueryRunnerTest.java)."""

import pytest

from incubator_druid_spark import translate

F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]
FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
EMPTY = ["2020-04-02T00:00:00.000Z/2020-04-03T00:00:00.000Z"]

LONG_AGGS = [
    {"type": "count", "name": "rows"},
    {"type": "longSum", "name": "index", "fieldName": "index"},
]
ARIC = [{"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
         "fields": [{"type": "fieldAccess", "fieldName": "rows"},
                    {"type": "fieldAccess", "fieldName": "index"},
                    {"type": "constant", "value": 1}]}]


def ts(spark, cat, **extra):
    q = {"queryType": "timeseries", "dataSource": "wiki",
         "granularity": "day", "intervals": F2T, "aggregations": LONG_AGGS}
    q.update(extra)
    return translate(q, spark, cat).collect()


def test_full_on_timeseries_max_min(spark, wiki_catalog):
    """testFullOnTimeseriesMaxMin — global double max/min of index."""
    out = ts(spark, wiki_catalog, granularity="all", intervals=FULL,
             aggregations=[
                 {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
                 {"type": "doubleMin", "name": "minIndex", "fieldName": "index"}])
    assert len(out) == 1
    assert out[0]["maxIndex"] == pytest.approx(1870.061029, rel=1e-6)
    assert out[0]["minIndex"] == pytest.approx(59.021022, rel=1e-6)


def test_timeseries_with_first_last_aggregator(spark, wiki_catalog):
    """testTimeseriesWithFirstLastAggregator — doubleFirst/doubleLast at
    MONTH granularity; every day's rows share one timestamp, so the
    ascending expectations encode SEGMENT ROW ORDER tie-breaks (first = the
    first stored row of the month, last = the last stored row)."""
    out = ts(spark, wiki_catalog, granularity="month", intervals=FULL,
             aggregations=[
                 {"type": "doubleFirst", "name": "first", "fieldName": "index"},
                 {"type": "doubleLast", "name": "last", "fieldName": "index"}])
    got = [(str(r["__time"])[:10], r["first"], r["last"]) for r in out]
    expect = [("2011-01-01", 100.000000, 943.497198),
              ("2011-02-01", 132.123776, 1101.918270),
              ("2011-03-01", 153.059937, 1063.201156),
              ("2011-04-01", 135.885094, 780.271977)]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for g, e in zip(got, expect):
        assert g[1] == pytest.approx(e[1], rel=1e-6)
        assert g[2] == pytest.approx(e[2], rel=1e-6)


def test_timeseries_grand_total(spark, wiki_catalog):
    """testTimeseriesGrandTotal — day rows plus a null-timestamp total row
    with min/max aggs and the addRowsIndexConstant post-agg."""
    out = ts(spark, wiki_catalog,
             aggregations=LONG_AGGS + [
                 {"type": "longMin", "name": "longMinIndex",
                  "fieldName": "index"},
                 {"type": "doubleMax", "name": "doubleMaxIndex",
                  "fieldName": "index"},
                 {"type": "floatMin", "name": "floatMinIndex",
                  "fieldName": "index"}],
             postAggregations=ARIC,
             context={"grandTotal": True})
    rows = {(str(r["__time"])[:10] if r["__time"] is not None else None): r
            for r in out}
    d1, d2, tot = rows["2011-04-01"], rows["2011-04-02"], rows[None]
    assert (d1["rows"], d1["index"], d1["addRowsIndexConstant"],
            d1["longMinIndex"]) == (13, 6619, 6633.0, 78)
    assert d1["doubleMaxIndex"] == pytest.approx(1522.043733, rel=1e-6)
    assert d1["floatMinIndex"] == pytest.approx(78.6225433, rel=1e-6)
    assert (d2["rows"], d2["index"], d2["addRowsIndexConstant"],
            d2["longMinIndex"]) == (13, 5827, 5841.0, 97)
    assert (tot["rows"], tot["index"], tot["addRowsIndexConstant"],
            tot["longMinIndex"]) == (26, 12446, 12473.0, 78)
    assert tot["doubleMaxIndex"] == pytest.approx(1522.043733, rel=1e-6)


def test_empty_timeseries(spark, wiki_catalog):
    """testEmptyTimeseries — ALL granularity over an empty interval yields
    ONE row: rows=0, null sums, null first (sql null mode)."""
    out = ts(spark, wiki_catalog, granularity="all", intervals=EMPTY,
             aggregations=[
                 {"type": "count", "name": "rows"},
                 {"type": "doubleSum", "name": "index", "fieldName": "index"},
                 {"type": "doubleFirst", "name": "first",
                  "fieldName": "index"}])
    assert len(out) == 1
    r = out[0]
    assert r["rows"] == 0 and r["index"] is None and r["first"] is None


def test_timeseries_interval_out_of_ranges(spark, wiki_catalog):
    """testTimeseriesIntervalOutOfRanges — same shape with the full min/max
    family: every agg null, count 0, post-agg null (sql mode)."""
    out = ts(spark, wiki_catalog, granularity="all", intervals=EMPTY,
             aggregations=LONG_AGGS + [
                 {"type": "longMin", "name": "longMinIndex", "fieldName": "index"},
                 {"type": "longMax", "name": "longMaxIndex", "fieldName": "index"},
                 {"type": "doubleMin", "name": "doubleMinIndex", "fieldName": "index"},
                 {"type": "doubleMax", "name": "doubleMaxIndex", "fieldName": "index"}],
             postAggregations=ARIC,
             context={"skipEmptyBuckets": False})
    assert len(out) == 1
    r = out[0]
    assert r["rows"] == 0
    for c in ("index", "longMinIndex", "longMaxIndex", "doubleMinIndex",
              "doubleMaxIndex", "addRowsIndexConstant"):
        assert r[c] is None, c


def test_timeseries_with_or_filter(spark, wiki_catalog):
    """testTimeseriesWithOrFilter — 3-value IN covers every market."""
    out = ts(spark, wiki_catalog,
             filter={"type": "in", "dimension": "market",
                     "values": ["spot", "upfront", "total_market"]},
             postAggregations=ARIC)
    got = [(str(r["__time"])[:10], r["rows"], r["index"],
            r["addRowsIndexConstant"]) for r in out]
    assert got == [("2011-04-01", 13, 6619, 6633.0),
                   ("2011-04-02", 13, 5827, 5841.0)]


def test_timeseries_with_regex_filter(spark, wiki_catalog):
    """testTimeseriesWithRegexFilter — ^.p.*$ matches spot + upfront."""
    out = ts(spark, wiki_catalog,
             filter={"type": "regex", "dimension": "market",
                     "pattern": "^.p.*$"},
             postAggregations=ARIC)
    got = [(str(r["__time"])[:10], r["rows"], r["index"],
            r["addRowsIndexConstant"]) for r in out]
    assert got == [("2011-04-01", 11, 3783, 3795.0),
                   ("2011-04-02", 11, 3313, 3325.0)]


def test_timeseries_with_multi_dim_filter_and_or(spark, wiki_catalog):
    """testTimeseriesWithMultiDimFilterAndOr — spot AND (automotive OR
    business), doubleSum index."""
    out = ts(spark, wiki_catalog,
             aggregations=[{"type": "count", "name": "rows"},
                           {"type": "doubleSum", "name": "index",
                            "fieldName": "index"}],
             filter={"type": "and", "fields": [
                 {"type": "selector", "dimension": "market", "value": "spot"},
                 {"type": "or", "fields": [
                     {"type": "selector", "dimension": "quality",
                      "value": "automotive"},
                     {"type": "selector", "dimension": "quality",
                      "value": "business"}]}]})
    got = [(str(r["__time"])[:10], r["rows"], r["index"]) for r in out]
    assert [g[:2] for g in got] == [("2011-04-01", 2), ("2011-04-02", 2)]
    assert got[0][2] == pytest.approx(254.4554443359375, rel=1e-6)
    assert got[1][2] == pytest.approx(260.4129638671875, rel=1e-6)


def test_timeseries_mvd_filter_equivalences(spark, wiki_catalog):
    """testTimeseriesWithMultiValueDimFilterAndOr1/2 — a selector (or OR of
    selectors) over the MVD placementish equals the same filter over the
    scalar quality column."""
    def run(flt):
        return [(str(r["__time"])[:10], r["rows"], round(r["index"], 6))
                for r in ts(spark, wiki_catalog,
                            aggregations=[
                                {"type": "count", "name": "rows"},
                                {"type": "doubleSum", "name": "index",
                                 "fieldName": "index"}],
                            filter=flt)]

    spot = {"type": "selector", "dimension": "market", "value": "spot"}
    mvd1 = run({"type": "and", "fields": [
        spot, {"type": "selector", "dimension": "placementish", "value": "a"}]})
    sca1 = run({"type": "and", "fields": [
        spot, {"type": "selector", "dimension": "quality",
               "value": "automotive"}]})
    assert mvd1 == sca1 and mvd1[0][1] == 1

    mvd2 = run({"type": "and", "fields": [
        spot, {"type": "in", "dimension": "placementish",
               "values": ["a", "b"]}]})
    sca2 = run({"type": "and", "fields": [
        spot, {"type": "in", "dimension": "quality",
               "values": ["automotive", "business"]}]})
    assert mvd2 == sca2 and mvd2[0][1] == 2


def test_timeseries_filtered_agg_absent_dimension(spark, wiki_catalog):
    """testTimeSeriesWithFilteredAgg{DimensionNotPresentNotNullValue,
    DimensionNotPresentNullValue,InvertedNullValue} — a filtered agg over a
    nonexistent column: selector('Lol') matches nothing, selector(null)
    matches everything (the column reads as null), and NOT(market is null)
    matches everything."""
    def run(flt):
        out = ts(spark, wiki_catalog, granularity="all",
                 aggregations=[
                     {"type": "filtered", "filter": flt,
                      "aggregator": {"type": "count", "name": "filteredAgg"}},
                     {"type": "doubleSum", "name": "index",
                      "fieldName": "index"},
                     {"type": "count", "name": "rows"}])
        assert len(out) == 1
        r = out[0]
        assert r["rows"] == 26
        assert r["index"] == pytest.approx(12459.361190795898, rel=1e-6)
        return r["filteredAgg"]

    assert run({"type": "selector", "dimension": "abraKaDabra",
                "value": "Lol"}) == 0
    assert run({"type": "selector", "dimension": "abraKaDabra",
                "value": None}) == 26
    assert run({"type": "not", "field": {
        "type": "selector", "dimension": "market", "value": None}}) == 26


def test_timeseries_with_timestamp_result_field(spark, wiki_catalog):
    """testTimeseriesWithPostAggregatorReferencingTimestampResultField —
    context timestampResultField materializes the bucket millis as a result
    column a post-agg can reference."""
    out = ts(spark, wiki_catalog,
             filter={"type": "selector", "dimension": "market",
                     "value": "spot"},
             aggregations=[],
             postAggregations=[{"type": "fieldAccess",
                                "name": "timestampInPostAgg",
                                "fieldName": "myTimestamp"}],
             context={"timestampResultField": "myTimestamp"})
    got = [(str(r["__time"])[:10], r["myTimestamp"], r["timestampInPostAgg"])
           for r in out]
    april1, april2 = 1301616000000, 1301702400000
    assert got == [("2011-04-01", april1, april1),
                   ("2011-04-02", april2, april2)]


def test_timeseries_with_varying_gran_with_filter(spark, wiki_catalog):
    """testTimeseriesWithVaryingGranWithFilter — P1M over one filtered day
    buckets to the month start; DAY over the same day buckets to the day."""
    flt = {"type": "in", "dimension": "market",
           "values": ["spot", "upfront", "total_market"]}
    day2 = ["2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"]
    out1 = ts(spark, wiki_catalog,
              granularity={"type": "period", "period": "P1M"},
              intervals=day2, filter=flt,
              aggregations=[{"type": "count", "name": "rows"},
                            {"type": "longSum", "name": "idx",
                             "fieldName": "index"}])
    assert [(str(r["__time"])[:10], r["rows"], r["idx"]) for r in out1] == [
        ("2011-04-01", 13, 5827)]
    out2 = ts(spark, wiki_catalog, granularity="day", intervals=day2,
              filter=flt,
              aggregations=[{"type": "count", "name": "rows"},
                            {"type": "longSum", "name": "idx",
                             "fieldName": "index"}])
    assert [(str(r["__time"])[:10], r["rows"], r["idx"]) for r in out2] == [
        ("2011-04-02", 13, 5827)]


def test_timeseries_with_time_zone(spark, wiki_catalog):
    """testTimeseriesWithTimeZone — LA-day buckets; starts land at 07:00
    UTC."""
    out = ts(spark, wiki_catalog,
             granularity={"type": "period", "period": "P1D",
                          "timeZone": "America/Los_Angeles"},
             intervals=["2011-03-31T07:00:00.000Z/2011-04-02T07:00:00.000Z"],
             aggregations=[{"type": "count", "name": "rows"},
                           {"type": "longSum", "name": "idx",
                            "fieldName": "index"}])
    assert [(str(r["__time"]), r["rows"], r["idx"]) for r in out] == [
        ("2011-03-31 07:00:00", 13, 6619),
        ("2011-04-01 07:00:00", 13, 5827)]


def test_timeseries_no_aggregators(spark, wiki_catalog):
    """testTimeseriesNoAggregators — day buckets with NO aggregators: one
    empty-payload row per covered day, first = 2011-01-12, last =
    2011-04-15, and descending reverses."""
    out = ts(spark, wiki_catalog, intervals=FULL, aggregations=[])
    assert str(out[0]["__time"])[:10] == "2011-01-12"
    assert str(out[-1]["__time"])[:10] == "2011-04-15"
    out_desc = ts(spark, wiki_catalog, intervals=FULL, aggregations=[],
                  descending=True)
    assert str(out_desc[0]["__time"])[:10] == "2011-04-15"
    assert [r["__time"] for r in out_desc] == \
        [r["__time"] for r in reversed(out)]


def test_full_on_timeseries_with_filter(spark, wiki_catalog):
    """testFullOnTimeseriesWithFilter — upfront-only day series: 2 rows per
    covered day, zero-filled gaps stay inside segment coverage."""
    out = ts(spark, wiki_catalog, intervals=FULL,
             filter={"type": "selector", "dimension": "market",
                     "value": "upfront"},
             aggregations=[{"type": "count", "name": "rows"}])
    assert str(out[0]["__time"])[:10] == "2011-01-12"
    assert str(out[-1]["__time"])[:10] == "2011-04-15"
    assert {r["rows"] for r in out} <= {0, 2}
    assert sum(r["rows"] for r in out) == 186
