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
