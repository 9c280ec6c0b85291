"""Golden SQL tests — round-6 tranche A: time-zone context
(QUERY_CONTEXT_LOS_ANGELES via the /druid/v2/sql context surface),
epoch/timestamp-literal filters, TIMESTAMPADD zero periods, outer-limit
context, and the exact-count-distinct-on-sketch refusal, from
CalciteQueryTest.java (reference sql/src/test/.../calcite/).

Context-carrying cases run through api.sql_query (the engine's
POST /druid/v2/sql twin) because sqlTimeZone / sqlCurrentTimestamp /
sqlOuterLimit are PlannerContext knobs, not SQL syntax."""

import datetime

import pytest

from incubator_druid_spark.sql.functions import druid_sql
from tests.conftest import rows


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def _sql_ctx(spark, cat, sql, ctx):
    from incubator_druid_spark.api import sql_query
    out = sql_query({"query": sql, "resultFormat": "array", "context": ctx},
                    spark, cat)
    return [tuple(r) for r in out]


_LA = {"sqlTimeZone": "America/Los_Angeles",
       "sqlCurrentTimestamp": "2000-01-01T00:00:00Z"}


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# TIMESTAMPADD zero periods — identity over __time
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("unit", ["DAY", "MONTH", "YEAR"])
def test_timestampadd_zero_period(spark, foo_catalog, unit):
    """CalciteQueryTest.java testTimeStampAddZero{Day,Month,Year}Period —
    adding zero of any unit returns every row's own timestamp."""
    out = rows(q(spark, foo_catalog,
                 f"SELECT TIMESTAMPADD({unit}, 0, \"__time\") AS t "
                 "FROM druid.foo ORDER BY 1"))
    assert [r[0] for r in out] == [
        _ts("2000-01-01"), _ts("2000-01-02"), _ts("2000-01-03"),
        _ts("2001-01-01"), _ts("2001-01-02"), _ts("2001-01-03")]


# ---------------------------------------------------------------------------
# time filters over the long cnt column
# ---------------------------------------------------------------------------

def test_count_star_time_filter_extract_epoch_from_date(spark, foo_catalog):
    """CalciteQueryTest.java
    testCountStarWithTimeFilterOnLongColumnUsingExtractEpochFromDate."""
    assert q(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo WHERE
        cnt >= EXTRACT(EPOCH FROM DATE '1970-01-01') * 1000
        AND cnt < EXTRACT(EPOCH FROM DATE '1970-01-02') * 1000
        """).first()["c"] == 6


def test_count_star_time_filter_timestamp_to_millis(spark, foo_catalog):
    """CalciteQueryTest.java
    testCountStarWithTimeFilterOnLongColumnUsingTimestampToMillis."""
    assert q(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo WHERE
        cnt >= TIMESTAMP_TO_MILLIS(TIMESTAMP '1970-01-01 00:00:00')
        AND cnt < TIMESTAMP_TO_MILLIS(TIMESTAMP '1970-01-02 00:00:00')
        """).first()["c"] == 6


# ---------------------------------------------------------------------------
# empty buckets via SQL vs the native timeseries
# ---------------------------------------------------------------------------

def test_timeseries_dont_skip_empty_buckets(spark, foo, foo_catalog,
                                            tmp_path_factory):
    """CalciteQueryTest.java testTimeseriesDontSkipEmptyBuckets — Druid
    zero-fills 24 hour buckets because the SQL plans to a native timeseries
    with skipEmptyBuckets unset.  Plain SQL grouping here keeps only
    PRESENT buckets (standard GROUP BY semantics, documented stance); the
    zero-filling path is the native timeseries operator, asserted as the
    second half of this test."""
    out = rows(q(spark, foo_catalog, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT floor(__time TO HOUR) AS gran, cnt FROM druid.foo
          WHERE __time >= TIMESTAMP '2000-01-01 00:00:00'
            AND __time < TIMESTAMP '2000-01-02 00:00:00') AS x
        GROUP BY gran ORDER BY gran"""))
    assert out == [(1, _ts("2000-01-01"))]
    # native twin: hour-granularity timeseries zero-fills all 24 buckets
    from incubator_druid_spark import translate
    native = translate(
        {"queryType": "timeseries", "dataSource": "foo",
         "granularity": "hour",
         "intervals": ["2000-01-01T00:00:00/2000-01-02T00:00:00"],
         "aggregations": [{"type": "longSum", "name": "s",
                           "fieldName": "cnt"}]},
        spark, foo_catalog).collect()
    assert len(native) == 24
    assert native[0]["s"] == 1 and all(r["s"] is None for r in native[1:])


# ---------------------------------------------------------------------------
# Los Angeles sqlTimeZone context family
# ---------------------------------------------------------------------------

def test_select_current_time_and_date_los_angeles(spark, full_catalog):
    """CalciteQueryTest.java testSelectCurrentTimeAndDateLosAngeles — the
    pinned 2000-01-01T00Z instant reads as 1999-12-31 16:00 LA wall clock;
    CURRENT_DATE is the LA calendar date."""
    out = _sql_ctx(spark, full_catalog, """
        SELECT CAST(CURRENT_TIMESTAMP AS VARCHAR) AS t,
               CAST(CURRENT_DATE AS VARCHAR) AS d,
               CAST(CURRENT_DATE + INTERVAL '1' DAY AS VARCHAR) AS d1
        """, _LA)
    t, d, d1 = out[0]
    assert t.startswith("1999-12-31 16:00:00")
    assert (d, d1) == ("1999-12-31", "2000-01-01")


def test_filter_on_current_timestamp_los_angeles(spark, full_catalog):
    """CalciteQueryTest.java testFilterOnCurrentTimestampLosAngeles — now+1d
    in LA wall clock is 2000-01-02T00Z, keeping 5 of foo's 6 rows."""
    out = _sql_ctx(spark, full_catalog, """
        SELECT COUNT(*) FROM druid.foo
        WHERE __time >= CURRENT_TIMESTAMP + INTERVAL '1' DAY
          AND __time < TIMESTAMP '2002-01-01 00:00:00'""", _LA)
    assert out == [(5,)]


def test_group_by_extract_floor_time_los_angeles(spark, full_catalog):
    """CalciteQueryTest.java testGroupByExtractFloorTimeLosAngeles — UTC
    midnights shift a day back in LA, splitting the years 1999/2000/2001."""
    out = _sql_ctx(spark, full_catalog, """
        SELECT EXTRACT(YEAR FROM FLOOR(__time TO YEAR)) AS "year",
               SUM(cnt) AS s
        FROM druid.foo
        GROUP BY EXTRACT(YEAR FROM FLOOR(__time TO YEAR)) ORDER BY 1""", _LA)
    assert out == [(1999, 1), (2000, 3), (2001, 2)]


def test_timeseries_la_time_floor_connection_la(spark, full_catalog):
    """CalciteQueryTest.java
    testTimeseriesLosAngelesUsingTimeFloorConnectionLosAngeles."""
    out = _sql_ctx(spark, full_catalog, """
        SELECT SUM(cnt) AS s, CAST(gran AS VARCHAR) AS g FROM (
          SELECT TIME_FLOOR(__time, 'P1M') AS gran, cnt FROM druid.foo) AS x
        GROUP BY gran ORDER BY gran""", _LA)
    assert out == [(1, "1999-12-01 00:00:00"), (2, "2000-01-01 00:00:00"),
                   (1, "2000-12-01 00:00:00"), (2, "2001-01-01 00:00:00")]


def test_timeseries_la_time_floor_connection_utc(spark, foo_catalog):
    """CalciteQueryTest.java
    testTimeseriesLosAngelesUsingTimeFloorConnectionUtc — explicit LA tz in
    TIME_FLOOR under a UTC session: buckets land at 08:00 UTC."""
    out = rows(q(spark, foo_catalog, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT TIME_FLOOR(__time, 'P1M', CAST(NULL AS TIMESTAMP),
                            'America/Los_Angeles') AS gran, cnt
          FROM druid.foo) AS x
        GROUP BY gran ORDER BY gran"""))
    assert out == [(1, _ts("1999-12-01 08:00:00")),
                   (1, _ts("2000-12-01 08:00:00")),
                   (2, _ts("2000-01-01 08:00:00")),
                   (2, _ts("2001-01-01 08:00:00"))]  # rows() sorts by tuple


def test_timeseries_la_via_planner_config(spark, full_catalog):
    """CalciteQueryTest.java testTimeseriesLosAngelesViaPlannerConfig — the
    planner-level default tz behaves exactly like the sqlTimeZone context
    (both set PlannerContext's effective zone)."""
    out = _sql_ctx(spark, full_catalog, """
        SELECT SUM(cnt) AS s, CAST(gran AS VARCHAR) AS g FROM (
          SELECT FLOOR(__time TO MONTH) AS gran, cnt FROM druid.foo
          WHERE __time >= TIME_PARSE('1999-12-01 00:00:00')
            AND __time < TIME_PARSE('2002-01-01 00:00:00')) AS x
        GROUP BY gran ORDER BY gran""", _LA)
    assert out == [(1, "1999-12-01 00:00:00"), (2, "2000-01-01 00:00:00"),
                   (1, "2000-12-01 00:00:00"), (2, "2001-01-01 00:00:00")]


def test_group_and_filter_on_time_floor_with_time_zone(spark, foo_catalog):
    """CalciteQueryTest.java testGroupAndFilterOnTimeFloorWithTimeZone —
    explicit-tz TIME_FLOOR equality against TIME_PARSE in the same zone."""
    out = rows(q(spark, foo_catalog, """
        SELECT TIME_FLOOR(__time, 'P1M', NULL, 'America/Los_Angeles') AS g,
               COUNT(*) AS c
        FROM druid.foo
        WHERE TIME_FLOOR(__time, 'P1M', NULL, 'America/Los_Angeles') =
                TIME_PARSE('2000-01-01 00:00:00', NULL, 'America/Los_Angeles')
           OR TIME_FLOOR(__time, 'P1M', NULL, 'America/Los_Angeles') =
                TIME_PARSE('2000-02-01 00:00:00', NULL, 'America/Los_Angeles')
        GROUP BY 1 ORDER BY 1"""))
    # LA January 2000 bucket = 2000-01-01T08Z, holding the Jan-02 and
    # Jan-03 UTC-midnight rows (Jan-01T00Z is still LA December)
    assert out == [(_ts("2000-01-01 08:00:00"), 2)]


# ---------------------------------------------------------------------------
# sqlOuterLimit context
# ---------------------------------------------------------------------------

def test_query_context_outer_limit(spark, full_catalog):
    """CalciteQueryTest.java testQueryContextOuterLimit — the context limit
    wraps the whole result, inside any query-level LIMIT."""
    base = "SELECT dim1 FROM druid.foo GROUP BY dim1 ORDER BY dim1 DESC"
    ctx = {"sqlOuterLimit": 4}
    assert _sql_ctx(spark, full_catalog, base, ctx) == [
        ("def",), ("abc",), ("2",), ("10.1",)]
    assert _sql_ctx(spark, full_catalog, base + " LIMIT 9", ctx) == [
        ("def",), ("abc",), ("2",), ("10.1",)]
    assert _sql_ctx(spark, full_catalog, base + " LIMIT 2", ctx) == [
        ("def",), ("abc",)]


# ---------------------------------------------------------------------------
# misc scalar / aggregate remainders
# ---------------------------------------------------------------------------

def test_select_constant_expression_equivalent_to_nan(spark, foo_catalog):
    """CalciteQueryTest.java testSelectConstantExpressionEquivalentToNaN —
    Druid evaluates log10(0) to -Infinity and the difference to NaN; Spark
    math returns NULL for non-positive log inputs, so the expression is
    NULL here (documented numeric-semantics divergence)."""
    r = q(spark, foo_catalog,
          "SELECT log10(0) - log10(0) AS x, dim1 FROM foo LIMIT 1").first()
    assert r["x"] is None


def test_validation_wrong_type_literal_is_coerced(spark, foo_catalog):
    """CalciteQueryTest.java testValidationErrorWrongTypeLiteral — Calcite
    REFUSES REGEXP_LIKE('x', 1); Spark coerces the integer pattern to the
    string '1' and evaluates (documented laxer-validation superset)."""
    assert q(spark, foo_catalog,
             "SELECT REGEXP_LIKE('x', 1) AS r FROM foo LIMIT 1"
             ).first()["r"] is False


def test_group_by_force_limit_push_down(spark, foo_catalog):
    """CalciteQueryTest.java testGroupByWithForceLimitPushDown — LIMIT 1
    over (dim1, dim2) groups; without an ORDER BY any single valid group
    satisfies the query (Druid's native groupBy default ordering picks
    ('', 'a'); Spark's pick is plan-dependent)."""
    out = rows(q(spark, foo_catalog,
                 "SELECT dim1, dim2[0] AS d2, COUNT(*) AS c FROM druid.foo "
                 "GROUP BY dim1, dim2 limit 1"))
    assert len(out) == 1
    valid = {("", "a"), ("10.1", None), ("2", ""), ("1", "a"),
             ("def", "abc"), ("abc", None)}
    assert (out[0][0], out[0][1]) in valid and out[0][2] == 1


def test_group_by_post_agg_referencing_time_floor(spark, foo_catalog):
    """CalciteQueryTest.java
    testGroupByWithPostAggregatorReferencingTimeFloorColumnOnTimeseries."""
    out = rows(q(spark, foo_catalog, """
        SELECT TIME_FORMAT("date", 'yyyy-MM') AS m, SUM(x) AS s FROM (
            SELECT FLOOR(__time to hour) as "date", COUNT(*) as x
            FROM foo GROUP BY 1)
        GROUP BY 1 ORDER BY 1"""))
    assert out == [("2000-01", 3), ("2001-01", 3)]


def test_group_by_sort_on_post_aggregation(spark, foo_catalog):
    """CalciteQueryTest.java testGroupByWithSortOnPostAggregationNoTopN
    {Config,Context} — the sort-by-expression shape regardless of the
    reference's topN-vs-groupBy strategy split."""
    out = rows(q(spark, foo_catalog, """
        SELECT dim1, MIN(m1) + MAX(m1) AS x FROM druid.foo
        GROUP BY dim1 ORDER BY x LIMIT 3"""))
    assert out == [("", 2.0), ("10.1", 4.0), ("2", 6.0)]


def test_any_value_numeric_nulls_group_by(spark, numfoo_catalog):
    """CalciteQueryTest.java testAnyAggregatorsOffHeapNumericNulls —
    ANY_VALUE over nullable numerics grouped by dim2.  Honest-array dim2
    keeps [] and [''] apart (5 groups vs Druid's 4); the all-null rows
    yield null ANYs, the single-row groups are deterministic."""
    out = q(spark, numfoo_catalog, """
        SELECT dim2[0] AS d, ANY_VALUE(l1) AS l, ANY_VALUE(d1) AS dd,
               ANY_VALUE(f1) AS f
        FROM druid.numfoo GROUP BY dim2""").collect()
    got = {r["d"]: (r["l"], r["dd"], r["f"]) for r in out}
    assert len(out) == 5
    assert got[None] == (325323, 1.7, pytest.approx(0.1)) \
        or got[None] == (None, None, None)  # [] vs null-dim2 group
    assert got[""] == (0, 0.0, 0.0)
    assert got["abc"] == (None, None, None)
    # group ['a'] holds rows 1 (7, 1.0, 1.0) and 4 (nulls): ANY takes the
    # first seen, nulls included (testAnyAggregatorsDoesNotSkipNulls)
    assert got["a"] in {(7, 1.0, 1.0), (None, None, None)}


def test_approx_count_distinct_on_string_expression(spark, foo_catalog):
    """CalciteQueryTest.java
    testApproxCountDistinctOnVectorizableSingleStringExpression."""
    assert q(spark, foo_catalog,
             "SELECT APPROX_COUNT_DISTINCT(dim1 || 'hello') AS c "
             "FROM druid.foo").first()["c"] == 6


def test_unplannable_exact_count_distinct_on_sketch(spark, foo, tmp_path_factory):
    """CalciteQueryTest.java testUnplannableExactCountDistinctOnSketch —
    exact COUNT(DISTINCT) over a COMPLEX sketch column refuses with a
    rewrite hint (counting distinct serialized blobs would be silently
    wrong); APPROX_COUNT_DISTINCT merges the stored state instead."""
    from pyspark.sql import functions as F

    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.operators.aggregations import _hll_input
    base = tmp_path_factory.mktemp("sketch_ds")
    # rollup-stored HLL state, marker-prefixed like the engine's ingest
    # path (_hll_input keeps '' countable — the raw sketch would skip it)
    rolled = (foo.groupBy("__time", "cnt")
                 .agg(F.hll_sketch_agg(_hll_input(F.col("dim1")))
                       .alias("unique_dim1")))
    rolled.write.mode("overwrite").parquet(str(base / "foo_rollup.parquet"))
    cat = Catalog(spark)
    cat.register("foo_rollup", str(base / "foo_rollup.parquet"))
    with pytest.raises(ValueError, match="APPROX_COUNT_DISTINCT"):
        q(spark, cat,
          "SELECT COUNT(distinct unique_dim1) FROM druid.foo_rollup")
    assert q(spark, cat,
             "SELECT APPROX_COUNT_DISTINCT(unique_dim1) AS c "
             "FROM druid.foo_rollup").first()["c"] == 6
