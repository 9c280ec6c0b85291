"""Aggregator + post-aggregator library tests (per-aggregator semantics per
processing/.../query/aggregation/ unit tests)."""

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark import translate
from tests.conftest import rows


def agg_one(spark, foo_catalog, *specs, post=None):
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": "all",
         "aggregations": list(specs)}
    if post:
        q["postAggregations"] = post
    return translate(q, spark, foo_catalog).first()


def test_sums_mins_maxes(spark, foo_catalog):
    r = agg_one(spark, foo_catalog,
                {"type": "longSum", "name": "ls", "fieldName": "cnt"},
                {"type": "doubleSum", "name": "ds", "fieldName": "m2"},
                {"type": "floatSum", "name": "fs", "fieldName": "m1"},
                {"type": "longMin", "name": "mn", "fieldName": "cnt"},
                {"type": "doubleMax", "name": "mx", "fieldName": "m2"},
                {"type": "doubleMean", "name": "avg", "fieldName": "m2"})
    assert (r["ls"], r["ds"], r["fs"], r["mn"], r["mx"], r["avg"]) == \
        (6, 21.0, 21.0, 1, 6.0, 3.5)


def test_first_last_any(spark, foo_catalog):
    r = agg_one(spark, foo_catalog,
                {"type": "doubleFirst", "name": "f", "fieldName": "m2"},
                {"type": "doubleLast", "name": "l", "fieldName": "m2"},
                {"type": "stringFirst", "name": "sf", "fieldName": "dim1"},
                {"type": "stringLast", "name": "sl", "fieldName": "dim1"},
                {"type": "longAny", "name": "a", "fieldName": "cnt"})
    assert r["f"] == 1.0 and r["l"] == 6.0
    assert r["sf"] == "" and r["sl"] == "abc"
    assert r["a"] == 1


def test_first_last_any_over_time_column(spark, foo_catalog):
    """first/last/any over a timestamp-typed field read its LONG storage —
    epoch MILLIS — same rationale as longSum-over-__time (first/
    LongFirstAggregatorFactory reads the long column); stringFirst renders
    that long as a string."""
    r = agg_one(spark, foo_catalog,
                {"type": "longFirst", "name": "lf", "fieldName": "__time"},
                {"type": "longLast", "name": "ll", "fieldName": "__time"},
                {"type": "longAny", "name": "la", "fieldName": "__time"},
                {"type": "stringFirst", "name": "sf", "fieldName": "__time"})
    t0 = 946_684_800_000      # 2000-01-01T00:00:00Z
    t1 = 978_480_000_000      # 2001-01-03T00:00:00Z
    assert r["lf"] == t0 and isinstance(r["lf"], int)
    assert r["ll"] == t1
    assert isinstance(r["la"], int)
    assert r["sf"] == str(t0)


def test_filtered_aggregator(spark, foo_catalog):
    r = agg_one(spark, foo_catalog,
                {"type": "filtered",
                 "filter": {"type": "bound", "dimension": "m2", "lower": "3",
                            "ordering": "numeric"},
                 "aggregator": {"type": "doubleSum", "name": "big",
                                "fieldName": "m2"}},
                {"type": "filtered",
                 "filter": {"type": "selector", "dimension": "dim2", "value": "a"},
                 "aggregator": {"type": "count", "name": "mvd_cnt"}})
    assert r["big"] == 18.0  # 3+4+5+6
    assert r["mvd_cnt"] == 2  # MVD any-match inside filtered agg


def test_cardinality_and_hyperunique(spark, foo_catalog):
    r = agg_one(spark, foo_catalog,
                {"type": "cardinality", "name": "c", "fields": ["dim1"],
                 "byRow": True},
                {"type": "hyperUnique", "name": "h", "fieldName": "dim1"})
    assert r["c"] == 6 and r["h"] == 6


def test_cardinality_by_value_multi_field(spark, foo_catalog):
    # byRow=false over several fields = distinct count of the UNION of the
    # dimensions' value sets (one shared HLL in the reference); dim1 has 6
    # distinct strings, m1-as-string 6 more, no overlap -> 12
    r = agg_one(spark, foo_catalog,
                {"type": "cardinality", "name": "c",
                 "fields": ["dim1", "m1"], "byRow": False})
    assert r["c"] == 12


def test_variance_stddev(spark, foo_catalog):
    r = agg_one(spark, foo_catalog,
                {"type": "variance", "name": "v", "fieldName": "m2"},
                {"type": "stddev", "name": "s", "fieldName": "m2",
                 "estimator": "population"})
    assert abs(r["v"] - 3.5) < 1e-9          # sample variance of 1..6
    assert abs(r["s"] - 1.707825) < 1e-5     # population stddev


def test_histogram_fixed_buckets(spark, foo_catalog):
    r = agg_one(spark, foo_catalog,
                {"type": "fixedBucketsHistogram", "name": "h",
                 "fieldName": "m2", "lowerLimit": 0, "upperLimit": 6,
                 "numBuckets": 3})
    assert list(r["h"]["histogram"]) == [1, 2, 2]  # [0,2):1  [2,4):2,3  [4,6):4,5


def test_approx_histogram_breaks_counts(spark, foo_catalog):
    # ApproximateHistogram.toHistogram(numBuckets): equal-width breaks
    # [min-delta .. max] with delta=(max-min)/(size-1); counts from the
    # centroid CDF and summing to the row count (cdf(max)-cdf(breaks[0]))
    r = agg_one(spark, foo_catalog,
                {"type": "approxHistogram", "name": "h", "fieldName": "m2",
                 "numBuckets": 5})
    h = r["h"]
    delta = (6.0 - 1.0) / 4
    assert h["breaks"][0] == pytest.approx(1.0 - delta)
    assert h["breaks"][-1] == pytest.approx(6.0)
    assert len(h["breaks"]) == 6 and len(h["counts"]) == 5
    assert sum(h["counts"]) == pytest.approx(6.0)  # 6 rows in foo


def test_expression_lambda_aggregator(spark, foo_catalog):
    r = agg_one(spark, foo_catalog,
                {"type": "expressionLambda", "name": "prod",
                 "fields": ["cnt"], "accumulatorIdentifier": "acc",
                 "initialValue": "1", "fold": "acc * (cnt + 1)"})
    assert r["prod"] == 64  # (1+1)^6


def test_expression_lambda_multi_field(spark, foo_catalog):
    """ExpressionLambdaAggregatorFactory with several input columns — the
    fold sees the whole row image (weighted sum m1*m2 + a guard on cnt)."""
    r = agg_one(spark, foo_catalog,
                {"type": "expressionLambda", "name": "wsum",
                 "fields": ["m1", "m2", "cnt"],
                 "accumulatorIdentifier": "acc", "initialValue": "0.0",
                 "fold": "acc + if(cnt > 0, m1 * m2, 0.0)"})
    assert r["wsum"] == pytest.approx(sum(v * v for v in
                                          [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]))


def test_expression_lambda_zero_fields(spark, foo_catalog):
    """Pure-accumulator fold (fields=[]) — a hand-rolled row count."""
    r = agg_one(spark, foo_catalog,
                {"type": "expressionLambda", "name": "n",
                 "fields": [], "accumulatorIdentifier": "acc",
                 "initialValue": "0", "fold": "acc + 1"})
    assert r["n"] == 6


def test_grouping_aggregator(spark, foo_catalog):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": ["dim1"],
         "subtotalsSpec": [["dim1"], []],
         "aggregations": [{"type": "count", "name": "cnt"}]}
    out = rows(translate(q, spark, foo_catalog), "dim1", "cnt")
    assert (None, 6) in out


def test_post_agg_division_semantics(spark, foo_catalog):
    r = agg_one(spark, foo_catalog,
                {"type": "doubleSum", "name": "sm", "fieldName": "m2"},
                post=[
                    {"type": "arithmetic", "name": "div0", "fn": "/",
                     "fields": [{"type": "fieldAccess", "fieldName": "sm"},
                                {"type": "constant", "value": 0}]},
                    {"type": "arithmetic", "name": "quot0", "fn": "quotient",
                     "fields": [{"type": "fieldAccess", "fieldName": "sm"},
                                {"type": "constant", "value": 0}]},
                    {"type": "doubleGreatest", "name": "g",
                     "fields": [{"type": "fieldAccess", "fieldName": "sm"},
                                {"type": "constant", "value": 100}]},
                    {"type": "expression", "name": "e",
                     "expression": "sm * 2"}])
    assert r["div0"] == 0.0                   # Druid "/" → x/0 = 0
    assert r["quot0"] == float("inf")         # quotient → IEEE
    assert r["g"] == 100.0
    assert r["e"] == 42.0


def test_count_counts_rows_not_values(spark, foo_catalog):
    # dim2 is null in one row; Druid `count` counts rows
    r = agg_one(spark, foo_catalog, {"type": "count", "name": "c"})
    assert r["c"] == 6


def test_context_finalize_false_returns_state(spark, foo_catalog):
    """QueryContexts.isFinalize — context.finalize=false returns MERGEABLE
    sketch state (the AggregatorFactory partial/combine contract) instead of
    estimates: the hyperUnique column comes back as the HLL sketch binary,
    which re-queries as a COMPLEX column to the same estimate."""
    import pyspark.sql.functions as F
    from incubator_druid_spark import translate
    q_state = {"queryType": "groupBy", "dataSource": "foo",
               "granularity": "all", "dimensions": ["dim1"],
               "context": {"finalize": False},
               "aggregations": [{"type": "hyperUnique", "name": "uq",
                                 "fieldName": "dim2"}]}
    state = translate(q_state, spark, foo_catalog)
    assert dict(state.dtypes)["uq"] == "binary"
    # merge the per-dim1 states back down to one estimate == direct query
    merged = state.agg(
        F.hll_sketch_estimate(F.hll_union_agg("uq")).alias("est")).first()
    direct = translate({**q_state, "dimensions": [],
                        "context": {}}, spark, foo_catalog).first()
    assert merged["est"] == direct["uq"]


def test_finalize_false_with_zero_filled_timeseries(spark, foo_catalog):
    """finalize=false over a zero-filled timeseries: empty buckets carry
    NULL sketch state (not a 0 coalesced into a binary column)."""
    from incubator_druid_spark import translate
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": "hour",
         "intervals": ["2000-01-02T00:00:00Z/2000-01-03T00:00:00Z"],
         "context": {"finalize": False},
         "aggregations": [{"type": "hyperUnique", "name": "uq",
                           "fieldName": "dim1"}]}
    out = translate(q, spark, foo_catalog).collect()
    assert len(out) == 24  # hour buckets inside the day segment zero-fill
    by_hour = {str(r["__time"])[11:13]: r["uq"] for r in out}
    assert by_hour["03"] is None
    assert isinstance(by_hour["00"], (bytes, bytearray))
