"""Golden SQL tests — time-filter / TIME_FLOOR / EXTRACT / CAST tranche of
CalciteQueryTest.java, SQL-compatible null mode, over foo.

foo rows at 2000-01-01..03 and 2001-01-01..03 midnight UTC, cnt=1 each.
"""

import datetime

import pytest

from incubator_druid_spark.sql.functions import druid_sql
from tests.conftest import rows


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def _c(spark, cat, sql):
    return q(spark, cat, sql).first()["c"]


def test_count_star_time_filters(spark, foo_catalog):
    """CalciteQueryTest.java:6922/6971/7052/7072/7179 — the time-filter
    family: range, millisecond bounds, point(s) in time, NOT of ranges."""
    assert _c(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE __time >= TIMESTAMP '2000-01-01 00:00:00'
          AND __time < TIMESTAMP '2001-01-01 00:00:00'""") == 3
    assert _c(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE __time = TIMESTAMP '2000-01-01 00:00:00.111'
        OR (__time >= TIMESTAMP '2000-01-01 00:00:00.888'
            AND __time < TIMESTAMP '2000-01-02 00:00:00.222')""") == 1
    assert _c(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE __time = TIMESTAMP '2000-01-01 00:00:00'""") == 1
    assert _c(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE __time = TIMESTAMP '2000-01-01 00:00:00'
           OR __time = TIMESTAMP '2000-01-01 00:00:00' + INTERVAL '1' DAY
        """) == 2
    assert _c(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo WHERE dim1 <> 'xxx' and not (
            (__time >= TIMESTAMP '2000-01-01 00:00:00'
             AND __time < TIMESTAMP '2001-01-01 00:00:00')
            OR (__time >= TIMESTAMP '2003-01-01 00:00:00'
                AND __time < TIMESTAMP '2004-01-01 00:00:00'))""") == 3


def test_filter_on_time_floor_family(spark, foo_catalog):
    """CalciteQueryTest.java:9555/9748/9773/9957 — FLOOR(__time TO MONTH)
    equality, inequality, comparison, and misaligned literal → 0."""
    assert _c(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE FLOOR(__time TO MONTH) = TIMESTAMP '2000-01-01 00:00:00'
           OR FLOOR(__time TO MONTH) = TIMESTAMP '2000-02-01 00:00:00'""") == 3
    assert _c(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE FLOOR(__time TO MONTH) <> TIMESTAMP '2001-01-01 00:00:00'""") == 3
    assert _c(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE FLOOR(__time TO MONTH) < TIMESTAMP '2000-02-01 00:00:00'""") == 3
    assert _c(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE floor(__time TO month) = TIMESTAMP '2000-01-01 00:00:01'""") == 0


def test_filter_on_time_extract(spark, foo_catalog):
    """CalciteQueryTest.java:9817/9852 testFilterOnTimeExtract[+MultipleDays]."""
    assert _c(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE EXTRACT(YEAR FROM __time) = 2000
          AND EXTRACT(MONTH FROM __time) = 1""") == 3
    assert _c(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE EXTRACT(YEAR FROM __time) = 2000
          AND EXTRACT(DAY FROM __time) IN (2, 3, 5)""") == 2


def test_group_by_impossible_time_filter(spark, foo_catalog):
    """CalciteQueryTest.java:5499 testGroupByWithImpossibleTimeFilter —
    misaligned FLOOR literals match nothing: zero rows."""
    out = q(spark, foo_catalog, """
        SELECT dim1, COUNT(*) FROM druid.foo
        WHERE FLOOR(__time TO DAY) = TIMESTAMP '2000-01-02 01:00:00'
           OR FLOOR(__time TO DAY) = TIMESTAMP '2000-01-02 02:00:00'
        GROUP BY 1""")
    assert out.count() == 0


def test_group_by_floor_cast_float(spark, foo_catalog):
    """CalciteQueryTest.java:9976 testGroupByFloor (sql branch: unparseable
    dim1 → NULL group)."""
    out = q(spark, foo_catalog, """
        SELECT floor(CAST(dim1 AS float)) AS f, COUNT(*) AS c
        FROM druid.foo GROUP BY floor(CAST(dim1 AS float))""")
    assert rows(out, "f", "c") == [
        (1.0, 1), (2.0, 1), (10.0, 1), (None, 3)]


def test_timeseries_using_time_floor(spark, foo_catalog):
    """CalciteQueryTest.java:12219 testTimeseriesUsingTimeFloor."""
    out = q(spark, foo_catalog, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT TIME_FLOOR(__time, 'P1M') AS gran,
          cnt FROM druid.foo
        ) AS x
        GROUP BY gran
        ORDER BY gran""").collect()
    assert [(r["s"], str(r["gran"])[:10]) for r in out] == [
        (3, "2000-01-01"), (3, "2001-01-01")]


def test_timeseries_time_floor_with_time_shift(spark, foo_catalog):
    """CalciteQueryTest.java:12245 testTimeseriesUsingTimeFloorWithTimeShift
    (negative step) and :12296 the TIMESTAMPADD equivalent."""
    for shift in ("TIME_SHIFT(__time, 'P1D', -1)",
                  "TIMESTAMPADD(DAY, -1, __time)"):
        out = q(spark, foo_catalog, f"""
            SELECT SUM(cnt) AS s, gran FROM (
              SELECT TIME_FLOOR({shift}, 'P1M') AS gran,
              cnt FROM druid.foo
            ) AS x
            GROUP BY gran
            ORDER BY gran""").collect()
        assert [(r["s"], str(r["gran"])[:10]) for r in out] == [
            (1, "1999-12-01"), (2, "2000-01-01"),
            (1, "2000-12-01"), (2, "2001-01-01")]


def test_timeseries_time_floor_with_origin(spark, foo_catalog):
    """CalciteQueryTest.java:12344 testTimeseriesUsingTimeFloorWithOrigin —
    month buckets anchored at the origin's 01:02:03 offset."""
    out = q(spark, foo_catalog, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT TIME_FLOOR(__time, 'P1M', TIMESTAMP '1970-01-01 01:02:03')
              AS gran,
          cnt FROM druid.foo
        ) AS x
        GROUP BY gran
        ORDER BY gran""").collect()
    assert [(r["s"], str(r["gran"])) for r in out] == [
        (1, "1999-12-01 01:02:03"), (2, "2000-01-01 01:02:03"),
        (1, "2000-12-01 01:02:03"), (2, "2001-01-01 01:02:03")]


def test_timeseries_using_cast_as_date(spark, foo_catalog):
    """CalciteQueryTest.java:12490 testTimeseriesUsingCastAsDate."""
    out = q(spark, foo_catalog, """
        SELECT SUM(cnt) AS s, dt FROM (
          SELECT CAST(__time AS DATE) AS dt,
          cnt FROM druid.foo
        ) AS x
        GROUP BY dt
        ORDER BY dt""").collect()
    assert [(r["s"], str(r["dt"])) for r in out] == [
        (1, "2000-01-01"), (1, "2000-01-02"), (1, "2000-01-03"),
        (1, "2001-01-01"), (1, "2001-01-02"), (1, "2001-01-03")]


def test_regexp_extract_distinct(spark, foo_catalog):
    """CalciteQueryTest.java:9303 testRegexpExtract (sql branch: '' gives a
    NULL extraction, kept as a distinct row by the <> filter? no — dropped
    by it in Druid too; NULL <> 'x' is not true)."""
    out = q(spark, foo_catalog, """
        SELECT DISTINCT
          REGEXP_EXTRACT(dim1, '^.') AS a,
          REGEXP_EXTRACT(dim1, '^(.)', 1) AS b
        FROM foo
        WHERE REGEXP_EXTRACT(dim1, '^(.)', 1) <> 'x'""")
    assert rows(out, "a", "b") == [
        ("1", "1"), ("2", "2"), ("a", "a"), ("d", "d")]


def test_sum_of_extraction_fn_cast(spark, foo_catalog):
    """CalciteQueryTest.java:7394 testSumOfExtractionFn — integer CAST uses
    the reference's string coercion ('10.1' → 10 via the double branch,
    ExprEval.computeNumber), so the sum is 13, not 3."""
    assert q(spark, foo_catalog, """
        SELECT SUM(CAST(SUBSTRING(dim1, 1, 10) AS INTEGER)) AS s
        FROM druid.foo""").first()["s"] == 13


def test_time_extract_all_units(spark, foo_catalog):
    """TimestampExtractExprMacro.java:116-155 — the full unit set, incl.
    the reference's faithful oddities (MICROSECOND = epoch/1000, CENTURY/
    MILLENNIUM ceil per the PostgreSQL definitions)."""
    r = q(spark, foo_catalog, """
        SELECT TIME_EXTRACT(__time, 'EPOCH') AS epoch,
               TIME_EXTRACT(__time, 'MILLISECOND') AS ms,
               TIME_EXTRACT(__time, 'DOW') AS dow,
               TIME_EXTRACT(__time, 'ISODOW') AS isodow,
               TIME_EXTRACT(__time, 'ISOYEAR') AS isoyear,
               TIME_EXTRACT(__time, 'DECADE') AS dec,
               TIME_EXTRACT(__time, 'CENTURY') AS cent,
               TIME_EXTRACT(__time, 'MILLENNIUM') AS mil
        FROM foo ORDER BY __time LIMIT 1""").first()
    # 2000-01-01 00:00:00 UTC is a Saturday
    assert r["epoch"] == 946684800 and r["ms"] == 0
    assert r["dow"] == 6 and r["isodow"] == 6
    assert (r["isoyear"], r["dec"], r["cent"], r["mil"]) == (
        2000, 200, 20, 2)
