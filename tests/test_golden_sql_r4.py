"""Round-4 CalciteQueryTest tranche — count-star time filters, time-floor/
extract predicates, nullable counts, expression filtering/grouping,
any/earliest with expression args, bitwise aggregates, count-distinct
variants, alias ordering (sql/src/test/java/org/apache/druid/sql/calcite/
CalciteQueryTest.java; SQL-compatible null mode expectations)."""

import pytest

from incubator_druid_spark.sql.functions import druid_sql


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def one(spark, cat, sql):
    return tuple(q(spark, cat, sql).first())


def test_count_star_with_time_filter(spark, foo_catalog):
    """testCountStarWithTimeFilter."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE __time >= TIMESTAMP '2000-01-01 00:00:00'
          AND __time < TIMESTAMP '2001-01-01 00:00:00'""") == (3,)


def test_count_star_with_single_and_two_points_in_time(spark, foo_catalog):
    """testCountStarWithSinglePointInTime / TwoPointsInTime."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE __time = TIMESTAMP '2000-01-01 00:00:00'""") == (1,)
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE __time = TIMESTAMP '2000-01-01 00:00:00'
           OR __time = TIMESTAMP '2000-01-01 00:00:00' + INTERVAL '1' DAY
        """) == (2,)


def test_count_star_with_long_column_filters(spark, foo_catalog):
    """testCountStarWithLongColumnFilters."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM foo WHERE cnt >= 3 OR cnt = 1"
               ) == (6,)


def test_filter_on_time_floor(spark, foo_catalog):
    """testFilterOnTimeFloor — FLOOR(__time TO MONTH) equality."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE FLOOR(__time TO MONTH) = TIMESTAMP '2000-01-01 00:00:00'
           OR FLOOR(__time TO MONTH) = TIMESTAMP '2000-02-01 00:00:00'
        """) == (3,)


def test_filter_on_not_time_floor(spark, foo_catalog):
    """testFilterOnNotTimeFloor."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE FLOOR(__time TO MONTH) <> TIMESTAMP '2001-01-01 00:00:00'
        """) == (3,)


def test_filter_on_time_floor_misaligned(spark, foo_catalog):
    """testFilterOnTimeFloorMisaligned — equality against a non-bucket
    timestamp matches nothing."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE FLOOR(__time TO MONTH) = TIMESTAMP '2000-01-01 00:00:01'
        """) == (0,)


def test_filter_on_time_extract_with_multiple_days(spark, foo_catalog):
    """testFilterOnTimeExtractWithMultipleDays."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE EXTRACT(YEAR FROM __time) = 2000
          AND EXTRACT(DAY FROM __time) IN (2, 3, 5)""") == (2,)


def test_count_non_null_and_nullable_expression(spark, foo_catalog):
    """testCountNonNullColumn + testCountNullableExpression."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(cnt) AS c FROM foo") == (6,)
    assert one(spark, foo_catalog, """
        SELECT COUNT(CASE WHEN dim1 = 'abc' THEN 'yes'
                          WHEN dim1 = 'def' THEN 'yes' END) AS c
        FROM foo""") == (2,)


def test_empty_string_equality(spark, foo_catalog):
    """testEmptyStringEquality — sql mode: = '' matches only the true empty
    string, <> '' excludes it and nulls don't match either way."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM foo WHERE dim1 = ''") == (1,)
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM foo WHERE dim1 <> ''") == (5,)


def test_column_comparison(spark, foo_catalog):
    """testColumnComparison — m1 - 1 = dim1 with Druid's numeric string
    coercion."""
    out = q(spark, foo_catalog, """
        SELECT dim1, m1, COUNT(*) AS c FROM foo
        WHERE m1 - 1 = CAST(dim1 AS DOUBLE) GROUP BY dim1, m1
        ORDER BY dim1""").collect()
    got = [(r["dim1"], r["m1"], r["c"]) for r in out]
    assert got == [("2", 3.0, 1)]


def test_expression_filtering_and_grouping(spark, foo_catalog):
    """testExpressionFilteringAndGrouping — group by a FLOOR expression,
    order desc."""
    out = q(spark, foo_catalog, """
        SELECT FLOOR(m1 / 2) * 2 AS e, COUNT(*) AS c FROM foo
        WHERE FLOOR(m1 / 2) * 2 > -1
        GROUP BY FLOOR(m1 / 2) * 2 ORDER BY 1 DESC""").collect()
    assert [(r["e"], r["c"]) for r in out] == [
        (6.0, 1), (4.0, 2), (2.0, 2), (0.0, 1)]


def test_exact_count_distinct_mvd(spark, foo_catalog):
    """testExactCountDistinct — COUNT(DISTINCT dim2) over the MVD counts
    distinct VALUES ('a', '', 'abc'), nulls excluded (sql mode → 3)."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(DISTINCT dim2) AS c FROM foo") == (3,)


def test_count_distinct_of_substring(spark, foo_catalog):
    """testCountDistinctOfSubstring."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(DISTINCT SUBSTRING(dim1, 1, 1)) AS c
        FROM foo WHERE dim1 <> ''""") == (4,)


def test_any_aggregator(spark, foo_catalog):
    """testAnyAggregator — ANY_VALUE over columns and expressions.  Druid's
    ANY contract is 'any value, no guarantee which' (the reference test's
    first-row expectation is an artifact of its single-threaded segment
    scan), so this port asserts membership in the column's domain."""
    r = q(spark, foo_catalog, """
        SELECT ANY_VALUE(cnt) AS a1, ANY_VALUE(m1) AS a2, ANY_VALUE(m2) AS a3,
               ANY_VALUE(cnt + 1) AS a4, ANY_VALUE(m1 + 1) AS a5
        FROM foo""").first()
    assert r["a1"] == 1 and r["a4"] == 2  # cnt is constant 1
    assert r["a2"] in {1.0, 2.0, 3.0, 4.0, 5.0, 6.0}
    assert r["a3"] in {1.0, 2.0, 3.0, 4.0, 5.0, 6.0}
    assert r["a5"] in {2.0, 3.0, 4.0, 5.0, 6.0, 7.0}


def test_earliest_aggregators_with_expressions(spark, foo_catalog):
    """testEarliestAggregators — EARLIEST over columns AND expressions."""
    r = q(spark, foo_catalog, """
        SELECT EARLIEST(cnt) AS e1, EARLIEST(m1) AS e2,
               EARLIEST(dim1, 10) AS e3, EARLIEST(cnt + 1) AS e4,
               EARLIEST(m1 + 1) AS e5,
               EARLIEST(dim1 || CAST(cnt AS VARCHAR), 10) AS e6
        FROM foo""").first()
    assert (r["e1"], r["e2"], r["e3"], r["e4"], r["e5"], r["e6"]) == \
        (1, 1.0, "", 2, 2.0, "1")


def test_group_by_and_order_by_alias(spark, foo_catalog):
    """testGroupByAndOrderByAlias — grouping and ordering by a SELECT
    alias."""
    out = q(spark, foo_catalog, """
        SELECT cnt AS theCnt, COUNT(*) AS c FROM foo
        GROUP BY theCnt ORDER BY theCnt ASC""").collect()
    assert [(r["theCnt"], r["c"]) for r in out] == [(1, 6)]


def test_bitwise_aggregators(spark, numfoo_catalog):
    """testBitwiseAggregatorsTimeseries — BIT_AND/BIT_OR/BIT_XOR over l1
    (7, 325323, 0; nulls skipped)."""
    spark_ = spark
    r = druid_sql(spark_, """
        SELECT BIT_AND(l1) AS a, BIT_OR(l1) AS o, BIT_XOR(l1) AS x
        FROM numfoo""", numfoo_catalog).first()
    assert (r["a"], r["o"], r["x"]) == (0, 325327, 325324)


def test_filtered_aggregations(spark, foo_catalog):
    """testFilteredAggregations — the full FILTER/CASE aggregation matrix;
    SQL-compatible expectations (COUNT(dim2) over the MVD counts rows with
    at least one value; the last filtered sum with no matching rows is
    null)."""
    r = q(spark, foo_catalog, """
        SELECT
          SUM(CASE dim1 WHEN 'abc' THEN cnt END) AS a,
          SUM(CASE dim1 WHEN 'abc' THEN NULL ELSE cnt END) AS b,
          SUM(CASE SUBSTRING(dim1, 1, 1) WHEN 'a' THEN cnt END) AS c,
          COUNT(dim2) FILTER(WHERE dim1 <> '1') AS d,
          COUNT(CASE WHEN dim1 <> '1' THEN 'dummy' END) AS e,
          SUM(CASE WHEN dim1 <> '1' THEN 1 ELSE 0 END) AS f,
          SUM(cnt) FILTER(WHERE MV_CONTAINS(dim2, 'a')) AS g,
          SUM(CASE WHEN dim1 <> '1' THEN cnt END)
              FILTER(WHERE MV_CONTAINS(dim2, 'a')) AS h,
          SUM(CASE WHEN dim1 <> '1' THEN cnt ELSE 0 END) AS i,
          MAX(CASE WHEN dim1 <> '1' THEN cnt END) AS j,
          COUNT(DISTINCT CASE WHEN dim1 <> '1' THEN m1 END) AS k
        FROM foo""").first()
    assert tuple(r) == (1, 5, 1, 3, 5, 5, 2, 1, 5, 1, 5)


def test_filtered_time_aggregators(spark, foo_catalog):
    """testFilteredTimeAggregators — FILTER clauses over __time ranges."""
    r = q(spark, foo_catalog, """
        SELECT
          SUM(cnt) FILTER(WHERE __time >= TIMESTAMP '2000-01-01 00:00:00'
                            AND __time <  TIMESTAMP '2000-02-01 00:00:00') AS a,
          SUM(cnt) FILTER(WHERE __time >= TIMESTAMP '2000-01-01 00:00:01'
                            AND __time <  TIMESTAMP '2000-02-01 00:00:00') AS b,
          SUM(cnt) FILTER(WHERE __time >= TIMESTAMP '2001-01-01 00:00:00'
                            AND __time <  TIMESTAMP '2001-02-01 00:00:00') AS c
        FROM foo
        WHERE __time >= TIMESTAMP '2000-01-01 00:00:00'
          AND __time < TIMESTAMP '2001-02-01 00:00:00'""").first()
    assert tuple(r) == (3, 2, 3)


def test_avg_daily_count_distinct(spark, foo_catalog):
    """testAvgDailyCountDistinct — outer AVG over an inner per-day
    APPROX_COUNT_DISTINCT."""
    assert one(spark, foo_catalog, """
        SELECT CAST(AVG(u) AS BIGINT) AS a
        FROM (SELECT FLOOR(__time TO DAY) AS d,
                     APPROX_COUNT_DISTINCT(cnt) AS u
              FROM foo GROUP BY 1)""") == (1,)


def test_double_nested_group_by2(spark, foo_catalog):
    """testDoubleNestedGroupBy2 — three levels of grouping."""
    assert one(spark, foo_catalog, """
        SELECT MAX(cnt) AS m FROM (
          SELECT dim1, MAX(t1.cnt) AS cnt FROM (
            SELECT dim1, COUNT(*) AS cnt FROM foo GROUP BY dim1
          ) t1 GROUP BY dim1
        ) t2""") == (1,)


def test_count_star_on_common_table_expression(spark, foo_catalog):
    """testCountStarOnCommonTableExpression — CTE with an MVD scalar
    filter."""
    assert one(spark, foo_catalog, """
        WITH beep (dim1_firstchar) AS
          (SELECT SUBSTRING(dim1, 1, 1) FROM foo WHERE MV_CONTAINS(dim2, 'a'))
        SELECT COUNT(*) AS c FROM beep WHERE dim1_firstchar <> 'z'""") == (2,)


def test_count_star_on_view(spark, foo_catalog):
    """testCountStarOnView — a registered view with the same shape."""
    from incubator_druid_spark.sql.functions import (drop_sql_view,
                                                     register_sql_view)
    register_sql_view("aview", """
        SELECT SUBSTRING(dim1, 1, 1) AS dim1_firstchar FROM foo
        WHERE MV_CONTAINS(dim2, 'a')""")
    try:
        assert one(spark, foo_catalog, """
            SELECT COUNT(*) AS c FROM view.aview
            WHERE dim1_firstchar <> 'z'""") == (2,)
    finally:
        drop_sql_view("aview")


def test_group_by_case_when_of_triple_and(spark, foo_catalog):
    """testGroupByCaseWhenOfTripleAnd."""
    out = q(spark, foo_catalog, """
        SELECT CASE WHEN m1 > 1 AND m1 < 5 AND cnt = 1 THEN 'x' END AS v,
               COUNT(*) AS c
        FROM foo GROUP BY 1 ORDER BY 1""").collect()
    got = sorted(((r["v"], r["c"]) for r in out),
                 key=lambda t: (t[0] is None, t))
    assert got == [("x", 3), (None, 3)]


def test_group_by_cube(spark, foo_catalog):
    """testGroupByCube — CUBE over (dim2, month) with COALESCE'd MVD
    flattening; the MVD explodes one row per value first."""
    out = q(spark, foo_catalog, """
        SELECT dim2, gran, SUM(cnt) AS s
        FROM (SELECT FLOOR(__time TO MONTH) AS gran,
                     COALESCE(element_at(dim2, 1), '@null') AS dim2, cnt
              FROM foo) AS x
        GROUP BY CUBE (dim2, gran)""").collect()
    # spot-check the full-rollup and per-dim2 totals
    got = {(r["dim2"], str(r["gran"])[:10] if r["gran"] else None): r["s"]
           for r in out}
    assert got[("@null", None)] == 2      # [] and null rows
    assert got[("a", None)] == 2
    assert got[("abc", None)] == 1
    assert got[(None, None)] == 6         # grand total


def test_numeric_predicate_filter_nulls(spark, numfoo_catalog):
    """testDoublePredicateFilterNulls / testFloatPredicateFilterNulls —
    null numeric rows never match a > predicate (sql mode)."""
    assert druid_sql(spark, "SELECT COUNT(*) AS c FROM numfoo WHERE d1 > 0",
                     numfoo_catalog).first()["c"] == 2
    assert druid_sql(spark, "SELECT COUNT(*) AS c FROM numfoo WHERE f1 > 0",
                     numfoo_catalog).first()["c"] == 2


def test_filter_on_metric_equality(spark, foo_catalog):
    """testFilterOnDouble / testFilterOnFloat."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM foo WHERE m2 = 1.0") == (1,)
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM foo WHERE m1 = 1.0") == (1,)


def test_filter_typed_dimensions(spark, numfoo_catalog):
    """testFilterLongDimension / DoubleDimension / FloatDimension."""
    assert druid_sql(spark, "SELECT dim1 FROM numfoo WHERE l1 = 7 LIMIT 1",
                     numfoo_catalog).first()["dim1"] == ""
    assert druid_sql(spark, "SELECT dim1 FROM numfoo WHERE d1 = 1.7 LIMIT 1",
                     numfoo_catalog).first()["dim1"] == "10.1"
    assert druid_sql(spark,
                     "SELECT dim1 FROM numfoo WHERE f1 = CAST(0.1 AS FLOAT) "
                     "LIMIT 1",
                     numfoo_catalog).first()["dim1"] == "10.1"


def test_group_by_aggregator_default_values(spark, numfoo_catalog):
    """testGroupByAggregatorDefaultValuesNonVectorized — every FILTER
    matches nothing: string/numeric first/last/any/bitwise all come back
    NULL in sql mode (the reference's ''/0 row is its legacy-mode
    expectation)."""
    r = druid_sql(spark, """
        SELECT dim4,
               EARLIEST(dim1, 1024) FILTER(WHERE dim1 = 'nonexistent') AS e1,
               EARLIEST(l1) FILTER(WHERE dim1 = 'nonexistent') AS e2,
               LATEST(dim1, 1024) FILTER(WHERE dim1 = 'nonexistent') AS l1_,
               LATEST(l1) FILTER(WHERE dim1 = 'nonexistent') AS l2_,
               BIT_AND(l1) FILTER(WHERE dim1 = 'nonexistent') AS b1,
               BIT_OR(l1) FILTER(WHERE dim1 = 'nonexistent') AS b2,
               BIT_XOR(l1) FILTER(WHERE dim1 = 'nonexistent') AS b3
        FROM numfoo WHERE dim4 = 'a' GROUP BY dim4""",
        numfoo_catalog).first()
    assert r["dim4"] == "a"
    for c in ("e1", "e2", "l1_", "l2_", "b1", "b2", "b3"):
        assert r[c] is None, c


def test_filter_and_group_by_lookup(spark, foo_catalog):
    """testFilterAndGroupByLookup — LOOKUP in the filter, GROUP BY, and
    projection; misses group under null (sql mode)."""
    out = q(spark, foo_catalog, """
        SELECT LOOKUP(dim1, 'lookyloo') AS lk, COUNT(*) AS c FROM foo
        WHERE LOOKUP(dim1, 'lookyloo') <> 'xxx'
           OR LOOKUP(dim1, 'lookyloo') IS NULL
        GROUP BY LOOKUP(dim1, 'lookyloo')""").collect()
    got = sorted(((r["lk"], r["c"]) for r in out),
                 key=lambda t: (t[0] is None, t))
    assert got == [("xabc", 1), (None, 5)]


def test_count_distinct_of_lookup(spark, foo_catalog):
    """testCountDistinctOfLookup — only 'abc' hits the lookyloo map among
    foo's dim1 values (sql mode → 1 distinct non-null)."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(DISTINCT LOOKUP(dim1, 'lookyloo')) AS c FROM foo
        """) == (1,)


def test_group_by_with_literal_in_subquery_grouping(spark, numfoo_catalog):
    """testGroupByWithLiteralInSubqueryGrouping — a constant and a CASE'd
    dim through a nested grouping."""
    out = druid_sql(spark, """
        SELECT t1, t2 FROM
          (SELECT 'dummy' AS t1,
                  CASE WHEN dim4 = 'b' THEN dim4 END AS t2
           FROM numfoo GROUP BY dim4)
        GROUP BY t1, t2""", numfoo_catalog).collect()
    got = sorted(((r["t1"], r["t2"]) for r in out),
                 key=lambda t: (t[1] is None, t))
    assert got == [("dummy", "b"), ("dummy", None)]


def test_timeseries_with_limit_no_topn(spark, foo_catalog):
    """testTimeseriesWithLimitNoTopN — ordered month buckets, LIMIT 1."""
    out = q(spark, foo_catalog, """
        SELECT gran, SUM(cnt) AS s
        FROM (SELECT FLOOR(__time TO MONTH) AS gran, cnt FROM foo) AS x
        GROUP BY gran ORDER BY gran LIMIT 1""").collect()
    assert [(str(r["gran"])[:10], r["s"]) for r in out] == [
        ("2000-01-01", 3)]


def test_timeseries_los_angeles_time_floor(spark, foo_catalog):
    """testTimeseriesLosAngelesViaQueryContext — month buckets in LA wall
    time via the 4-arg TIME_FLOOR (the context-flag spelling routes to the
    same granularity); UTC-midnight rows land in the PREVIOUS LA month."""
    out = q(spark, foo_catalog, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT TIME_FLOOR(__time, 'P1M', NULL, 'America/Los_Angeles')
                   AS gran, cnt
          FROM foo) AS x
        GROUP BY gran ORDER BY gran""").collect()
    got = [(r["s"], str(r["gran"])) for r in out]
    # bucket STARTS rendered as UTC instants: LA months begin at 08:00 UTC
    assert got == [(1, "1999-12-01 08:00:00"), (2, "2000-01-01 08:00:00"),
                   (1, "2000-12-01 08:00:00"), (2, "2001-01-01 08:00:00")]


def test_concat_group(spark, foo_catalog):
    """testConcatGroup — grouping by a multi-reference CONCAT."""
    out = q(spark, foo_catalog, """
        SELECT CONCAT(dim1, '-', dim1, '_', dim1) AS dimX
        FROM foo GROUP BY 1 ORDER BY 1""").collect()
    assert [r["dimX"] for r in out] == [
        "-_", "1-1_1", "10.1-10.1_10.1", "2-2_2", "abc-abc_abc",
        "def-def_def"]


def test_count_distinct_arithmetic(spark, foo_catalog):
    """testCountDistinctArithmetic — distinct counts inside arithmetic;
    integer division floors."""
    r = q(spark, foo_catalog, """
        SELECT SUM(cnt) AS a, COUNT(DISTINCT dim2) AS b,
               CAST(COUNT(DISTINCT dim2) AS FLOAT) AS c,
               SUM(cnt) / COUNT(DISTINCT dim2) AS d,
               SUM(cnt) / COUNT(DISTINCT dim2) + 3 AS e,
               CAST(SUM(cnt) AS FLOAT) / CAST(COUNT(DISTINCT dim2) AS FLOAT)
                 + 3 AS f
        FROM foo""").first()
    assert (r["a"], r["b"], r["c"], r["d"], r["e"], r["f"]) == \
        (6, 3, 3.0, 2, 5, 5.0)


def test_compare_exact_and_approx_count_distinct_subquery(spark,
                                                          foo_catalog):
    """testCompareExactAndApproximateCountDistinctUsingSubquery — both
    counts agree over a DISTINCT subquery."""
    r = q(spark, foo_catalog, """
        SELECT COUNT(*) AS exact_count,
               COUNT(DISTINCT dim1) AS approx_count,
               (CAST(1 AS FLOAT) - COUNT(DISTINCT dim1) / COUNT(*)) * 100
                 AS error_pct
        FROM (SELECT DISTINCT dim1 FROM foo WHERE dim1 <> '')""").first()
    assert (r["exact_count"], r["approx_count"], r["error_pct"]) == \
        (5, 5, 0.0)
