"""Round-5 CalciteQueryTest tranche P — INFORMATION_SCHEMA surface
(SCHEMATA, COLUMNS with JDBC_TYPE, view columns), SQL views (aview/bview/
cview/dview incl. the confusingly-aliased one), pinned CURRENT_TIMESTAMP
(sqlCurrentTimestamp context, always 2000-01-01T00Z in the reference
fixture), interval arithmetic on it, and requireTimeCondition positives
(sql/src/test/java/org/apache/druid/sql/calcite/CalciteQueryTest.java and
BaseCalciteQueryTest.java view definitions; SQL-compatible null mode).

Type note: this engine types MVDs as honest arrays, so dim2/dim3 surface
as ARRAY<VARCHAR> (JDBC 2003) where the reference says VARCHAR — the
compat table in the README documents the divergence; the unique_dim1
sketch column does not exist in the fixture."""

import datetime

import pytest

from incubator_druid_spark.sql.functions import (drop_sql_view, druid_sql,
                                                 register_sql_view)


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def rows(df):
    return [tuple(r) for r in df.collect()]


def srows(df):
    return sorted(rows(df), key=lambda t: tuple((x is not None, x)
                                                for x in t))


def sql_ctx(spark, cat, sql, ctx):
    from incubator_druid_spark.api import sql_query
    out = sql_query({"query": sql, "resultFormat": "array", "context": ctx},
                    spark, cat)
    return [tuple(r) for r in out]


PIN = {"sqlCurrentTimestamp": "2000-01-01T00:00:00Z"}


@pytest.fixture(scope="module")
def views(spark, full_catalog):
    """BaseCalciteQueryTest.java:833-856 view registry."""
    register_sql_view(
        "aview",
        "SELECT SUBSTRING(dim1, 1, 1) AS dim1_firstchar FROM foo "
        "WHERE dim2[0] = 'a'")
    register_sql_view(
        "bview",
        "SELECT COUNT(*) AS cnt FROM druid.foo WHERE __time >= "
        "CURRENT_TIMESTAMP + INTERVAL '1' DAY "
        "AND __time < TIMESTAMP '2002-01-01 00:00:00'")
    register_sql_view(
        "cview",
        "SELECT SUBSTRING(bar.dim1, 1, 1) AS dim1_firstchar, "
        "bar.dim2[0] AS dim2, dnf.l2 AS l2 "
        "FROM (SELECT * FROM foo WHERE dim2[0] = 'a') AS bar "
        "INNER JOIN druid.numfoo dnf ON bar.dim2[0] = dnf.dim2[0]")
    register_sql_view(
        "dview",
        "SELECT SUBSTRING(dim1, 1, 1) AS numfoo FROM foo "
        "WHERE dim2[0] = 'a'")
    yield full_catalog
    for v in ("aview", "bview", "cview", "dview"):
        drop_sql_view(v)


def test_information_schema_schemata(spark, full_catalog):
    """testInformationSchemaSchemata."""
    got = {r[0] for r in rows(q(spark, full_catalog,
        "SELECT DISTINCT SCHEMA_NAME FROM INFORMATION_SCHEMA.SCHEMATA"))}
    assert got == {"lookup", "view", "druid", "sys", "INFORMATION_SCHEMA"}


def test_information_schema_columns_on_table(spark, full_catalog):
    """testInformationSchemaColumnsOnTable — foo's column signature (MVDs
    as ARRAY<VARCHAR>, no sketch column in the fixture)."""
    got = rows(q(spark, full_catalog, """
        SELECT COLUMN_NAME, DATA_TYPE, IS_NULLABLE
        FROM INFORMATION_SCHEMA.COLUMNS
        WHERE TABLE_SCHEMA = 'druid' AND TABLE_NAME = 'foo'
        ORDER BY ORDINAL_POSITION"""))
    assert got == [
        ("__time", "TIMESTAMP", "YES"),
        ("dim1", "VARCHAR", "YES"),
        ("dim2", "ARRAY<VARCHAR>", "YES"),
        ("dim3", "ARRAY<VARCHAR>", "YES"),
        ("cnt", "BIGINT", "YES"),
        ("m1", "FLOAT", "YES"),
        ("m2", "DOUBLE", "YES")]


def test_information_schema_columns_on_view(spark, views):
    """testInformationSchemaColumnsOnView — the view's resolved schema."""
    got = rows(q(spark, views, """
        SELECT COLUMN_NAME, DATA_TYPE, IS_NULLABLE
        FROM INFORMATION_SCHEMA.COLUMNS
        WHERE TABLE_SCHEMA = 'view' AND TABLE_NAME = 'aview'"""))
    assert got == [("dim1_firstchar", "VARCHAR", "YES")]


def test_information_schema_columns_on_another_view(spark, views):
    """testInformationSchemaColumnsOnAnotherView — cview's 3 columns."""
    got = rows(q(spark, views, """
        SELECT COLUMN_NAME, DATA_TYPE, IS_NULLABLE
        FROM INFORMATION_SCHEMA.COLUMNS
        WHERE TABLE_SCHEMA = 'view' AND TABLE_NAME = 'cview'
        ORDER BY ORDINAL_POSITION"""))
    assert got == [("dim1_firstchar", "VARCHAR", "YES"),
                   ("dim2", "VARCHAR", "YES"),
                   ("l2", "BIGINT", "YES")]


def test_aggregators_on_information_schema_columns(spark, full_catalog):
    """testAggregatorsOnInformationSchemaColumns — aggregating JDBC_TYPE
    over foo's columns; values follow THIS engine's signature
    (93 + 12 + 2003 + 2003 - 5 + 6 + 8 = 4120 over 7 columns)."""
    got = tuple(q(spark, full_catalog, """
        SELECT COUNT(JDBC_TYPE) AS c, SUM(JDBC_TYPE) AS s,
               CAST(AVG(JDBC_TYPE) AS BIGINT) AS a,
               MIN(JDBC_TYPE) AS mn, MAX(JDBC_TYPE) AS mx
        FROM INFORMATION_SCHEMA.COLUMNS
        WHERE TABLE_SCHEMA = 'druid' AND TABLE_NAME = 'foo'""").first())
    assert got == (7, 4120, 588, -5, 2003)


def test_count_star_on_view_and_explain(spark, views):
    """testCountStarOnView + testExplainCountStarOnView — the view filters
    dim2='a' (2 rows) and the <> matcher keeps the substring-null row;
    EXPLAIN still plans through the view."""
    assert tuple(q(spark, views, """
        SELECT COUNT(*) AS c FROM view.aview
        WHERE dim1_firstchar <> 'z'""").first()) == (2,)
    plan, res = q(spark, views,
                  "EXPLAIN PLAN FOR SELECT COUNT(*) FROM view.aview "
                  "WHERE dim1_firstchar <> 'z'").first()
    assert "Aggregate" in plan or "aggregate" in plan.lower()


def test_confused_view(spark, views):
    """testConfusedView — the view aliased AS druid, its column named
    `numfoo`: name resolution must bind druid.numfoo to the view column."""
    assert tuple(q(spark, views, """
        SELECT COUNT(*) AS c FROM view.dview as druid
        WHERE druid.numfoo <> 'z'""").first()) == (2,)


def test_view_with_current_timestamp_pinned(spark, views):
    """testFilterOnCurrentTimestampOnView — bview counts rows at least one
    day past the pinned now (2000-01-01): 5 of 6 rows."""
    got = sql_ctx(spark, views, "SELECT * FROM view.bview", PIN)
    assert got == [(5,)]


def test_filter_on_current_timestamp_interval_arithmetic(spark, views):
    """testFilterOnCurrentTimestampWithIntervalArithmetic — HOUR TO MINUTE,
    DAY TO HOUR and YEAR TO MONTH interval literals against the pinned
    now."""
    got = sql_ctx(spark, views, """
        SELECT COUNT(*) FROM druid.foo
        WHERE __time >= CURRENT_TIMESTAMP + INTERVAL '01:02' HOUR TO MINUTE
          AND __time < TIMESTAMP '2003-02-02 01:00:00'
              - INTERVAL '1 1' DAY TO HOUR - INTERVAL '1-1' YEAR TO MONTH""",
        PIN)
    assert got == [(5,)]


def test_select_current_time_and_date_pinned(spark, full_catalog):
    """testSelectCurrentTimeAndDate... — the pinned instant surfaces
    verbatim."""
    got = sql_ctx(spark, full_catalog,
                  "SELECT CURRENT_TIMESTAMP AS t, CURRENT_DATE AS d", PIN)
    # the SQL endpoint serializes instants with exactly 3 fractional
    # digits and DATEs as the midnight instant (round 8, matching
    # SqlResourceTest testTimestampsInResponse)
    assert [tuple(str(x) for x in r) for r in got] \
        == [("2000-01-01T00:00:00.000Z", "2000-01-01T00:00:00.000Z")]


def test_require_time_condition_positive(spark, full_catalog):
    """testRequireTimeConditionPositive — with an explicit time condition
    both shapes plan and answer."""
    got = rows(q(spark, full_catalog, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT __time as t, floor(__time TO month) AS gran, cnt
          FROM druid.foo) AS x
        WHERE t >= '2000-01-01' and t < '2002-01-01'
        GROUP BY gran ORDER BY gran"""))
    assert got == [(3, datetime.datetime(2000, 1, 1)),
                   (3, datetime.datetime(2001, 1, 1))]
    got2 = tuple(q(spark, full_catalog, """
        SELECT SUM(cnt) AS s, COUNT(*) AS c
        FROM (SELECT dim2[0] AS dim2, SUM(cnt) AS cnt FROM druid.foo
              WHERE __time >= '2000-01-01' GROUP BY dim2[0])""").first())
    assert got2 == (6, 4)


def test_filter_on_current_timestamp_los_angeles_on_view(spark, views):
    """testFilterOnCurrentTimestampLosAngelesOnView — the query context
    (sqlTimeZone) applies to view SQL too: the pinned now renders in LA
    wall clock and the view's naive 2002 literal re-reads as 08:00Z, the
    interval shifts but the count is still 5."""
    got = sql_ctx(spark, views, "SELECT * FROM view.bview",
                  {**PIN, "sqlTimeZone": "America/Los_Angeles"})
    assert got == [(5,)]
