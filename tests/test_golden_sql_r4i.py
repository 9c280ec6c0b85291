"""Round-4 CalciteQueryTest tranche I — TIMESTAMPDIFF unit matrix,
TIMESTAMPADD conversions and zero periods, timestamp CEIL, quarter
arithmetic, trigonometry/radians/degrees over empty and filtered inputs,
ROUND over nullable floats, REGEXP_EXTRACT/REGEXP_LIKE filters, NULLIF/NVL
null algebra, descending numeric grouping over nullable longs
(sql/src/test/java/org/apache/druid/sql/calcite/CalciteQueryTest.java;
SQL-compatible null mode).

MVD note: this SQL surface keeps MVDs as honest arrays (README compat
table); ports use dim2[0] where the reference types dim2 VARCHAR."""

import datetime
import math

import pytest

from incubator_druid_spark.sql.functions import druid_sql


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def one(spark, cat, sql):
    return tuple(q(spark, cat, sql).first())


def rows(df):
    return [tuple(r) for r in df.collect()]


def srows(df):
    return sorted(rows(df), key=lambda t: tuple((x is not None, x)
                                                for x in t))


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_timestamp_diff(spark, foo_catalog):
    """testTimestampDiff — the full unit matrix (DAY/HOUR/MINUTE/SECOND/
    MONTH/YEAR/QUARTER/WEEK) over foo's first two rows."""
    assert rows(q(spark, foo_catalog, """
        SELECT TIMESTAMPDIFF(DAY, TIMESTAMP '1999-01-01 00:00:00', __time) AS a,
        TIMESTAMPDIFF(DAY, __time, DATE '2001-01-01') AS b,
        TIMESTAMPDIFF(HOUR, TIMESTAMP '1999-12-31 01:00:00', __time) AS c,
        TIMESTAMPDIFF(MINUTE, TIMESTAMP '1999-12-31 23:58:03', __time) AS d,
        TIMESTAMPDIFF(SECOND, TIMESTAMP '1999-12-31 23:59:03', __time) AS e,
        TIMESTAMPDIFF(MONTH, TIMESTAMP '1999-11-01 00:00:00', __time) AS f,
        TIMESTAMPDIFF(YEAR, TIMESTAMP '1996-11-01 00:00:00', __time) AS g,
        TIMESTAMPDIFF(QUARTER, TIMESTAMP '1996-10-01 00:00:00', __time) AS h,
        TIMESTAMPDIFF(WEEK, TIMESTAMP '1998-10-01 00:00:00', __time) AS i
        FROM druid.foo ORDER BY __time LIMIT 2""")) == [
        (365, 366, 23, 1, 57, 2, 3, 13, 65),
        (366, 365, 47, 1441, 86457, 2, 3, 13, 65)]


def test_timestamp_ceil(spark, foo_catalog):
    """testTimestampCeil — aligned input stays put; misaligned rounds up."""
    assert one(spark, foo_catalog, """
        SELECT CEIL(TIMESTAMP '2000-01-01 00:00:00' TO DAY) AS a,
               CEIL(TIMESTAMP '2000-01-01 01:00:00' TO DAY) AS b
        FROM druid.foo LIMIT 1""") == (_ts("2000-01-01"), _ts("2000-01-02"))


def test_timestamp_add_conversion(spark, foo_catalog):
    """testTimeStampAddConversion — dynamic month shift (P1M per cnt)."""
    assert srows(q(spark, foo_catalog,
                   "SELECT TIMESTAMPADD(MONTH, 1, __time) AS t "
                   "FROM druid.foo")) == [
        (_ts("2000-02-01"),), (_ts("2000-02-02"),), (_ts("2000-02-03"),),
        (_ts("2001-02-01"),), (_ts("2001-02-02"),), (_ts("2001-02-03"),)]


@pytest.mark.parametrize("unit", ["DAY", "MONTH", "YEAR"])
def test_timestamp_add_zero_period(spark, foo_catalog, unit):
    """testTimeStampAddZero{Day,Month,Year}Period — adding zero units is
    the identity."""
    assert srows(q(spark, foo_catalog,
                   f"SELECT TIMESTAMPADD({unit}, 0, __time) AS t "
                   "FROM druid.foo")) == [
        (_ts("2000-01-01"),), (_ts("2000-01-02"),), (_ts("2000-01-03"),),
        (_ts("2001-01-01"),), (_ts("2001-01-02"),), (_ts("2001-01-03"),)]


def test_silly_quarters(spark, foo_catalog):
    """testSillyQuarters — quarter arithmetic with integer division; all
    six rows are January."""
    assert rows(q(spark, foo_catalog, """
        SELECT CAST((EXTRACT(MONTH FROM __time) - 1 ) / 3 + 1 AS INTEGER)
                 AS quarter, COUNT(*) AS n
        FROM foo
        GROUP BY CAST((EXTRACT(MONTH FROM __time) - 1 ) / 3 + 1 AS INTEGER)
        """)) == [(1, 6)]


def test_radians_and_degrees(spark, numfoo_catalog):
    """testRadiansAndDegrees — toRadians(60)/toDegrees(4) on the dim1='1'
    row (m1=4, m2=4)."""
    got = one(spark, numfoo_catalog,
              "SELECT RADIANS(m1 * 15)/DEGREES(m2) AS r "
              "FROM numfoo WHERE dim1 = '1'")
    assert got[0] == pytest.approx(math.radians(60) / math.degrees(4))


def test_trigonometric_function(spark, foo_catalog):
    """testTrigonometricFunction — empty-match filter leaves count 0;
    exp(0)+10 = 11 and the constant trig family folds."""
    r = q(spark, foo_catalog, """
        SELECT exp(count(*)) + 10 AS a, sin(pi() / 6) AS b,
               cos(pi() / 6) AS c, tan(pi() / 6) AS d, cot(pi() / 6) AS e,
               asin(exp(count(*)) / 2) AS f, acos(exp(count(*)) / 2) AS g,
               atan(exp(count(*)) / 2) AS h, atan2(exp(count(*)), 1) AS i
        FROM druid.foo WHERE dim2[0] = '0'""").first()
    assert r["a"] == 11.0
    assert r["b"] == pytest.approx(math.sin(math.pi / 6))
    assert r["c"] == pytest.approx(math.cos(math.pi / 6))
    assert r["d"] == pytest.approx(math.tan(math.pi / 6))
    assert r["e"] == pytest.approx(math.cos(math.pi / 6)
                                   / math.sin(math.pi / 6))
    assert r["f"] == pytest.approx(math.asin(0.5))
    assert r["g"] == pytest.approx(math.acos(0.5))
    assert r["h"] == pytest.approx(math.atan(0.5))
    assert r["i"] == pytest.approx(math.atan2(1, 1))


def test_round_func(spark, numfoo_catalog):
    """testRoundFuc — ROUND over nullable floats keeps null (sql mode)."""
    got = srows(q(spark, numfoo_catalog,
                  "SELECT f1, round(f1) AS r FROM druid.numfoo"))
    assert got == [(None, None), (None, None), (None, None),
                   (0.0, 0.0), (pytest.approx(0.1), 0.0), (1.0, 1.0)]


def test_regexp_extract_filter_via_not_null_check(spark, foo_catalog):
    """testRegexpExtractFilterViaNotNullCheck — regex-match-exists OR
    prefixed variant: '10.1', '1', '2' (via Z2) → 3."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE REGEXP_EXTRACT(dim1, '^1') IS NOT NULL
           OR REGEXP_EXTRACT('Z' || dim1, '^Z2') IS NOT NULL""") == (3,)


def test_regexp_like_filter(spark, foo_catalog):
    """testRegexpLikeFilter — same predicate through REGEXP_LIKE."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE REGEXP_LIKE(dim1, '^1') OR REGEXP_LIKE('Z' || dim1, '^Z2')
        """) == (3,)


def test_null_string_equality(spark, foo_catalog):
    """testNullStringEquality — `= null` is never true (three-valued)."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM druid.foo "
               "WHERE NULLIF(dim2[0], 'a') = null") == (0,)


def test_null_long_topn(spark, numfoo_catalog):
    """testNullLongTopN — descending numeric grouping over nullable longs.
    DEVIATION on null placement only: the reference's inverted-TopN
    comparator emits the null group FIRST; Spark DESC places nulls last.
    Values and the descending non-null order match."""
    got = rows(q(spark, numfoo_catalog,
                 "SELECT l1, COUNT(*) AS c FROM druid.numfoo "
                 "GROUP BY l1 ORDER BY l1 DESC LIMIT 10"))
    assert got == [(325323, 1), (7, 1), (0, 1), (None, 3)]


def test_nvl_columns(spark, foo_catalog):
    """testNvlColumns — NVL(dim2, dim1) grouping; sql mode keeps '' as its
    own group."""
    assert srows(q(spark, foo_catalog, """
        SELECT NVL(dim2[0], dim1) AS v, COUNT(*) AS c FROM druid.foo
        GROUP BY NVL(dim2[0], dim1)""")) == [
        ("", 1), ("10.1", 1), ("a", 2), ("abc", 2)]
