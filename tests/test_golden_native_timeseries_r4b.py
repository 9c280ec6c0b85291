"""Round-4 TimeseriesQueryRunnerTest tranche B — the full-on day series
with the complete 94-value expected-index array, selector/and/or filters
incl. non-existent dimensions, MVD-filter equivalences, filtered aggs over
absent dimensions, expressionLambda aggregators, full-on min/max family and
the timestampResultField response shape (processing/src/test/java/org/
apache/druid/query/timeseries/TimeseriesQueryRunnerTest.java)."""

import datetime

import pytest

from incubator_druid_spark import translate

F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]
FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]

ROWS_COUNT = {"type": "count", "name": "rows"}
INDEX_DOUBLE_SUM = {"type": "doubleSum", "name": "index", "fieldName": "index"}
INDEX_LONG_SUM = {"type": "longSum", "name": "index", "fieldName": "index"}
QUALITY_UNIQUES = {"type": "hyperUnique", "name": "uniques",
                   "fieldName": "quality"}
#: COMMON_DOUBLE_AGGREGATORS (QueryRunnerTestHelper.java:214-218)
COMMON = [ROWS_COUNT, INDEX_DOUBLE_SUM, QUALITY_UNIQUES]
ARIC = [{"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
         "fields": [{"type": "fieldAccess", "fieldName": "rows"},
                    {"type": "fieldAccess", "fieldName": "index"},
                    {"type": "constant", "value": 1}]}]

UNIQUES_9 = 9.019833517963864
UNIQUES_2 = 2.000977198748901
UNIQUES_1 = 1.0002442201269182

#: QueryRunnerTestHelper.EXPECTED_FULL_ON_INDEX_VALUES (:233-254) — one
#: doubleSum(index) per day from 2011-01-12 to 2011-04-15; the "0.0" slot is
#: the SKIPPED_DAY (2011-01-21, no rows).
EXPECTED_FULL_ON_INDEX = [
    4500.0, 6077.949111938477, 4922.488838195801, 5726.140853881836,
    4698.468170166016, 4651.030891418457, 4398.145851135254,
    4596.068244934082, 4434.630561828613, 0.0, 6162.801361083984,
    5590.292701721191, 4994.298484802246, 5179.679672241211,
    6288.556800842285, 6025.663551330566, 5772.855537414551,
    5346.517524719238, 5497.331253051758, 5909.684387207031,
    5862.711364746094, 5958.373008728027, 5224.882194519043,
    5456.789611816406, 5456.095397949219, 4642.481948852539,
    5023.572692871094, 5155.821723937988, 5350.3723220825195,
    5236.997489929199, 4910.097717285156, 4507.608840942383,
    4659.80500793457, 5354.878845214844, 4945.796455383301,
    6459.080368041992, 4390.493583679199, 6545.758262634277,
    6922.801231384277, 6023.452911376953, 6812.107475280762,
    6368.713348388672, 6381.748748779297, 5631.245086669922,
    4976.192253112793, 6541.463027954102, 5983.8513107299805,
    5967.189498901367, 5567.139289855957, 4863.5944747924805,
    4681.164360046387, 6122.321441650391, 5410.308860778809,
    4846.676376342773, 5333.872688293457, 5013.053741455078,
    4836.85563659668, 5264.486434936523, 4581.821243286133,
    4680.233596801758, 4771.363662719727, 5038.354717254639,
    4816.808464050293, 4684.095504760742, 5023.663467407227,
    5889.72257232666, 4984.973915100098, 5664.220512390137,
    5572.653915405273, 5537.123138427734, 5980.422874450684,
    6243.834693908691, 5372.147285461426, 5690.728981018066,
    5827.796455383301, 6141.0769119262695, 6082.3237228393555,
    5678.771339416504, 6814.467971801758, 6626.151596069336,
    5833.2095947265625, 4679.222328186035, 5367.9403076171875,
    5410.445640563965, 5689.197135925293, 5240.5018310546875,
    4790.912239074707, 4992.670921325684, 4796.888023376465,
    5479.439590454102, 5506.567192077637, 4743.144546508789,
    4913.282669067383, 4723.869743347168,
]


def ts(spark, cat, **extra):
    q = {"queryType": "timeseries", "dataSource": "wiki",
         "granularity": "day", "intervals": F2T, "aggregations": COMMON}
    q.update(extra)
    return translate(q, spark, cat)


def test_timeseries(spark, wiki_catalog):
    """testTimeseries — day buckets with longSum + hyperUnique + longMin +
    floatMax over FIRST_TO_THIRD."""
    out = ts(spark, wiki_catalog, aggregations=[
        ROWS_COUNT,
        {"type": "longSum", "name": "idx", "fieldName": "index"},
        QUALITY_UNIQUES,
        {"type": "longMin", "name": "longMinIndex", "fieldName": "index"},
        {"type": "floatMax", "name": "floatMaxIndex", "fieldName": "index"},
    ]).collect()
    exp = [("2011-04-01", 13, 6619, 78, 1522.043701171875),
           ("2011-04-02", 13, 5827, 97, 1321.375)]
    assert len(out) == 2
    for r, (d, rows_, idx, lmin, fmax) in zip(out, exp):
        assert str(r["__time"])[:10] == d
        assert (r["rows"], r["idx"], r["longMinIndex"]) == (rows_, idx, lmin)
        assert r["floatMaxIndex"] == pytest.approx(fmax, rel=1e-6)
        assert r["uniques"] == pytest.approx(UNIQUES_9, abs=0.02)


def test_full_on_timeseries(spark, wiki_catalog):
    """testFullOnTimeseries — every day from 2011-01-12 to 2011-04-15 at
    rows=13 with the golden per-day doubleSum(index) array and uniques≈9.

    Deviation from the single-segment reference runner: the reference's one
    segment spans the whole data interval, so the empty interior day
    2011-01-21 zero-fills to rows=0; this engine's timeline is day-grain
    segments (an empty day has no segment → no bucket), so that day is
    absent and the remaining 93 days must match exactly."""
    out = ts(spark, wiki_catalog, intervals=FULL, postAggregations=ARIC).collect()
    d0 = datetime.date(2011, 1, 12)
    exp = [(str(d0 + datetime.timedelta(days=i)), v)
           for i, v in enumerate(EXPECTED_FULL_ON_INDEX) if v != 0.0]
    assert len(out) == len(exp) == 93
    for r, (d, v) in zip(out, exp):
        assert str(r["__time"])[:10] == d
        assert r["rows"] == 13
        assert r["index"] == pytest.approx(v, rel=1e-6)
        assert r["addRowsIndexConstant"] == pytest.approx(v + 14.0, rel=1e-6)
        assert r["uniques"] == pytest.approx(UNIQUES_9, abs=0.02)


def test_full_on_timeseries_min_max_aggregators(spark, wiki_catalog):
    """testFullOnTimeseriesMinMaxAggregators — the whole long/double/float
    min-max family in one ALL-granularity pass."""
    out = ts(spark, wiki_catalog, granularity="all", intervals=FULL,
             aggregations=[
                 {"type": "longMin", "name": "longMinIndex", "fieldName": "index"},
                 {"type": "longMax", "name": "longMaxIndex", "fieldName": "index"},
                 {"type": "doubleMin", "name": "doubleMinIndex", "fieldName": "index"},
                 {"type": "doubleMax", "name": "doubleMaxIndex", "fieldName": "index"},
                 {"type": "floatMin", "name": "floatMinIndex", "fieldName": "index"},
                 {"type": "floatMax", "name": "floatMaxIndex", "fieldName": "index"},
             ]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["longMinIndex"], r["longMaxIndex"]) == (59, 1870)
    assert r["doubleMinIndex"] == pytest.approx(59.021022, abs=1e-6)
    assert r["doubleMaxIndex"] == pytest.approx(1870.061029, abs=1e-6)
    assert r["floatMinIndex"] == pytest.approx(59.021023, rel=1e-6)
    assert r["floatMaxIndex"] == pytest.approx(1870.061, rel=1e-6)


@pytest.mark.parametrize("market,rows_,idx,aric,uq", [
    ("spot", 9, 1102, 1112.0, UNIQUES_9),          # testTimeseriesWithFilter1
    ("upfront", 2, 2681, 2684.0, UNIQUES_2),       # testTimeseriesWithFilter2
    ("total_market", 2, 2836, 2839.0, UNIQUES_2),  # testTimeseriesWithFilter3
])
def test_timeseries_with_filter(spark, wiki_catalog, market, rows_, idx,
                                aric, uq):
    """testTimeseriesWithFilter1/2/3 — market selector over FIRST_TO_THIRD
    with longSum + the addRowsIndexConstant post-agg (day 1 expectations;
    day 2 asserted on the spot branch)."""
    out = ts(spark, wiki_catalog,
             filter={"type": "selector", "dimension": "market",
                     "value": market},
             aggregations=[ROWS_COUNT, INDEX_LONG_SUM, QUALITY_UNIQUES],
             postAggregations=ARIC).collect()
    assert len(out) == 2
    r = out[0]
    assert str(r["__time"])[:10] == "2011-04-01"
    assert (r["rows"], r["index"]) == (rows_, idx)
    assert r["addRowsIndexConstant"] == pytest.approx(aric, rel=1e-6)
    assert r["uniques"] == pytest.approx(uq, abs=0.02)
    if market == "spot":
        r2 = out[1]
        assert (r2["rows"], r2["index"]) == (9, 1120)
        assert r2["addRowsIndexConstant"] == pytest.approx(1130.0, rel=1e-6)


def test_timeseries_with_other_multi_dim_filter(spark, wiki_catalog):
    """testTimeseriesWithOtherMultiDimFilter — market=spot AND
    quality=business hits exactly one row per day."""
    out = ts(spark, wiki_catalog,
             filter={"type": "and", "fields": [
                 {"type": "selector", "dimension": "market", "value": "spot"},
                 {"type": "selector", "dimension": "quality",
                  "value": "business"}]},
             postAggregations=ARIC).collect()
    exp = [("2011-04-01", 118.57034), ("2011-04-02", 112.987027)]
    assert len(out) == 2
    for r, (d, idx) in zip(out, exp):
        assert str(r["__time"])[:10] == d and r["rows"] == 1
        assert r["index"] == pytest.approx(idx, rel=1e-6)
        assert r["addRowsIndexConstant"] == pytest.approx(idx + 2.0, rel=1e-6)
        assert r["uniques"] == pytest.approx(UNIQUES_1, abs=0.02)


def test_timeseries_with_non_existent_filter_in_or(spark, wiki_catalog):
    """testTimeseriesWithNonExistentFilterInOr — an IN list with one value
    matching nothing is a no-op over the full market set."""
    out = ts(spark, wiki_catalog,
             filter={"type": "in", "dimension": "market",
                     "values": ["spot", "upfront", "total_market",
                                "billyblank"]},
             aggregations=[ROWS_COUNT, INDEX_LONG_SUM, QUALITY_UNIQUES],
             postAggregations=ARIC).collect()
    exp = [("2011-04-01", 13, 6619, 6633.0), ("2011-04-02", 13, 5827, 5841.0)]
    for r, (d, rows_, idx, aric) in zip(out, exp):
        assert str(r["__time"])[:10] == d
        assert (r["rows"], r["index"]) == (rows_, idx)
        assert r["addRowsIndexConstant"] == pytest.approx(aric, rel=1e-6)
        assert r["uniques"] == pytest.approx(UNIQUES_9, abs=0.02)


def test_timeseries_with_non_existent_filter_and_multi_dim(spark, wiki_catalog):
    """testTimeseriesWithNonExistentFilterAndMultiDim — market=billy AND
    quality=business matches nothing: both day buckets zero-fill with
    rows=0, null sums/post-agg (sql mode) and uniques=0."""
    out = ts(spark, wiki_catalog,
             filter={"type": "and", "fields": [
                 {"type": "selector", "dimension": "market", "value": "billy"},
                 {"type": "selector", "dimension": "quality",
                  "value": "business"}]},
             postAggregations=ARIC).collect()
    assert len(out) == 2
    for r, d in zip(out, ["2011-04-01", "2011-04-02"]):
        assert str(r["__time"])[:10] == d
        assert r["rows"] == 0 and r["index"] is None
        assert r["addRowsIndexConstant"] is None
        assert r["uniques"] == pytest.approx(0.0, abs=0.02)


def test_timeseries_with_inverted_filter_on_non_existent_dimension(
        spark, wiki_catalog):
    """testTimeseriesWithInvertedFilterOnNonExistentDimension —
    NOT(bobby='sally') over an absent column keeps every row (absent value
    is null, null != 'sally')."""
    out = ts(spark, wiki_catalog,
             filter={"type": "not", "field": {
                 "type": "selector", "dimension": "bobby", "value": "sally"}},
             postAggregations=ARIC).collect()
    exp = [("2011-04-01", 6626.151596069336), ("2011-04-02", 5833.2095947265625)]
    assert len(out) == 2
    for r, (d, idx) in zip(out, exp):
        assert str(r["__time"])[:10] == d and r["rows"] == 13
        assert r["index"] == pytest.approx(idx, rel=1e-6)
        assert r["addRowsIndexConstant"] == pytest.approx(idx + 14.0, rel=1e-6)


def test_timeseries_filter_on_non_existent_dimension_skip_buckets(
        spark, wiki_catalog):
    """testTimeseriesWithFilterOnNonExistentDimensionSkipBuckets — a filter
    on an absent column matches nothing; skipEmptyBuckets drops the
    zero-filled days leaving an empty result."""
    out = ts(spark, wiki_catalog,
             filter={"type": "selector", "dimension": "bobby",
                     "value": "billy"},
             postAggregations=ARIC,
             context={"skipEmptyBuckets": "true"}).collect()
    assert out == []


def test_timeseries_with_multi_value_dim_filter2(spark, wiki_catalog):
    """testTimeseriesWithMultiValueDimFilter2 — placementish='a' (MVD
    any-match) selects exactly the quality='automotive' rows."""
    base = dict(aggregations=COMMON, postAggregations=ARIC)
    mv = ts(spark, wiki_catalog,
            filter={"type": "selector", "dimension": "placementish",
                    "value": "a"}, **base).collect()
    sv = ts(spark, wiki_catalog,
            filter={"type": "selector", "dimension": "quality",
                    "value": "automotive"}, **base).collect()
    assert len(mv) == 2 and [tuple(r) for r in mv] == [tuple(r) for r in sv]


def test_timeseries_with_multi_value_dim_filter_and_or2(spark, wiki_catalog):
    """testTimeseriesWithMultiValueDimFilterAndOr2 — spot AND
    placementish∈{a,b} equals spot AND quality∈{automotive,business}."""
    base = dict(aggregations=COMMON, postAggregations=ARIC)
    mv = ts(spark, wiki_catalog,
            filter={"type": "and", "fields": [
                {"type": "selector", "dimension": "market", "value": "spot"},
                {"type": "or", "fields": [
                    {"type": "selector", "dimension": "placementish",
                     "value": "a"},
                    {"type": "selector", "dimension": "placementish",
                     "value": "b"}]}]}, **base).collect()
    sv = ts(spark, wiki_catalog,
            filter={"type": "and", "fields": [
                {"type": "selector", "dimension": "market", "value": "spot"},
                {"type": "or", "fields": [
                    {"type": "selector", "dimension": "quality",
                     "value": "automotive"},
                    {"type": "selector", "dimension": "quality",
                     "value": "business"}]}]}, **base).collect()
    assert len(mv) == 2 and [tuple(r) for r in mv] == [tuple(r) for r in sv]


@pytest.mark.parametrize("filt,expected_count", [
    # testTimeSeriesWithFilteredAggDimensionNotPresentNotNullValue
    ({"type": "selector", "dimension": "abraKaDabra", "value": "Lol"}, 0),
    # testTimeSeriesWithFilteredAggDimensionNotPresentNullValue
    ({"type": "selector", "dimension": "abraKaDabra", "value": None}, 26),
    # testTimeSeriesWithFilteredAggInvertedNullValue
    ({"type": "not", "field": {"type": "selector", "dimension": "market",
                               "value": None}}, 26),
])
def test_timeseries_filtered_agg_absent_dimension(spark, wiki_catalog, filt,
                                                  expected_count):
    """Filtered-count over an ABSENT dimension: =value matches nothing,
    =null matches every row, NOT(present=null) matches every row — alongside
    the untouched base aggregates."""
    out = ts(spark, wiki_catalog, granularity="all",
             aggregations=COMMON + [
                 {"type": "filtered", "filter": filt,
                  "aggregator": {"type": "count", "name": "filteredAgg"}}],
             postAggregations=ARIC).collect()
    assert len(out) == 1
    r = out[0]
    assert r["filteredAgg"] == expected_count
    assert r["rows"] == 26
    assert r["index"] == pytest.approx(12459.361190795898, rel=1e-6)
    assert r["addRowsIndexConstant"] == pytest.approx(12486.361190795898,
                                                      rel=1e-6)
    assert r["uniques"] == pytest.approx(UNIQUES_9, abs=0.02)


def test_timeseries_with_expression_aggregator(spark, wiki_catalog):
    """testTimeseriesWithExpressionAggregator — four expressionLambda aggs:
    a DIY count, a plain fold sum, an array-accumulator decomposed sum with
    a fold finalizer, and a distinct-set string accumulator."""
    out = ts(spark, wiki_catalog, aggregations=[
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
         "fields": ["market"], "accumulatorIdentifier": "acc",
         "initialValue": "[]", "fold": "array_set_add(acc, market)",
         "combine": "array_set_add_all(acc, array_agg_distinct)"},
    ]).collect()
    exp = [("2011-04-01", 6626.151569), ("2011-04-02", 5833.209718)]
    assert len(out) == 2
    for r, (d, s) in zip(out, exp):
        assert str(r["__time"])[:10] == d
        assert r["diy_count"] == 13
        assert r["diy_sum"] == pytest.approx(s, rel=1e-6)
        assert r["diy_decomposed_sum"] == pytest.approx(s, rel=1e-6)
        assert sorted(r["array_agg_distinct"]) == ["spot", "total_market",
                                                   "upfront"]


def test_timeseries_timestamp_result_field_response(spark, wiki_catalog):
    """testTimeseriesWithTimestampResultFieldContextForArrayResponse /
    testTimeseriesWithTimestampResultFieldContextForMapResponse — the
    timestampResultField context materializes the
    bucket time as a LONG millis column placed right after __time in the
    result signature, equal to the __time value on every row."""
    import pyspark.sql.functions as F
    df = ts(spark, wiki_catalog, intervals=FULL,
            context={"timestampResultField": "timestamp",
                     "skipEmptyBuckets": True})
    assert df.columns[:2] == ["__time", "timestamp"]
    assert set(df.columns) == {"__time", "timestamp", "rows", "index",
                               "uniques"}
    out = df.withColumn("__ms", F.unix_millis("__time")).collect()
    assert len(out) == 93
    for r in out:
        assert r["timestamp"] == r["__ms"]
        assert r["rows"] == 13
