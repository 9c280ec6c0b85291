"""Round-4 CalciteQueryTest tranche J — the explicit-join family: CTE
self-joins over inline datasources, left joins with empty right sides,
lookup-to-lookup and three-way lookup chains, join conditions containing
functions of either side, semi+anti joins in one query, removable left
joins, joins on __time, and join-then-outer-groupBy shapes
(sql/src/test/java/org/apache/druid/sql/calcite/CalciteQueryTest.java;
SQL-compatible null mode).

MVD note: this SQL surface keeps MVDs as honest arrays (README compat
table); ports use dim2[0] where the reference types dim2 VARCHAR."""

import datetime

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


# ---------------------------------------------------------------------------
# Inline-datasource (CTE) self-joins
# ---------------------------------------------------------------------------

def test_inner_join_on_two_inline_data_sources(spark, foo_catalog):
    """testInnerJoinOnTwoInlineDataSources."""
    assert rows(q(spark, foo_catalog, """
        with abc as (SELECT dim1, __time, m1 from foo WHERE dim1 = '10.1')
        SELECT t1.dim1, t1.__time from abc as t1
        INNER JOIN abc as t2 on t1.dim1 = t2.dim1""")) \
        == [("10.1", _ts("2000-01-02"))]


def test_inner_join_on_two_inline_data_sources_with_outer_where(
        spark, foo_catalog):
    """testInnerJoinOnTwoInlineDataSourcesWithOuterWhere."""
    assert rows(q(spark, foo_catalog, """
        with abc as (SELECT dim1, __time, m1 from foo WHERE dim1 = '10.1')
        SELECT t1.dim1, t1.__time from abc as t1
        INNER JOIN abc as t2 on t1.dim1 = t2.dim1
        WHERE t1.dim1 = '10.1'""")) == [("10.1", _ts("2000-01-02"))]


def test_left_join_on_two_inline_data_sources(spark, foo_catalog):
    """testLeftJoinOnTwoInlineDataSources."""
    assert rows(q(spark, foo_catalog, """
        with abc as (SELECT dim1, __time, m1 from foo WHERE dim1 = '10.1')
        SELECT t1.dim1, t1.__time from abc as t1
        LEFT JOIN abc as t2 on t1.dim1 = t2.dim1""")) \
        == [("10.1", _ts("2000-01-02"))]


def test_left_join_on_two_inline_data_sources_with_time_filter(
        spark, foo_catalog):
    """testLeftJoinOnTwoInlineDataSourcesWithTimeFilter — the string
    '1999' coerces to a timestamp bound."""
    assert rows(q(spark, foo_catalog, """
        with abc as (SELECT dim1, __time, m1 from foo
                     WHERE dim1 = '10.1' AND __time >= '1999')
        SELECT t1.dim1, t1.__time from abc as t1
        LEFT JOIN abc as t2 on t1.dim1 = t2.dim1
        WHERE t1.dim1 = '10.1'""")) == [("10.1", _ts("2000-01-02"))]


def test_left_join_right_table_can_be_empty(spark, foo_catalog):
    """testLeftJoinRightTableCanBeEmpty — every left row survives with no
    match (m2 is never null)."""
    assert srows(q(spark, foo_catalog, """
        SELECT v1.d2 AS dim2, count(1) AS c
        FROM (SELECT __time, dim1, dim2[0] AS d2, m1, m2 FROM foo
              where m1 > 2) v1
        LEFT OUTER JOIN (select d2 from (
            select dim2[0] AS d2, m2 from foo where m2 is null)) sm
        ON v1.d2 = sm.d2
        group by 1""")) == [(None, 1), ("", 1), ("a", 1), ("abc", 1)]


# ---------------------------------------------------------------------------
# Lookup joins
# ---------------------------------------------------------------------------

def test_inner_join_query_of_lookup_removable(spark, foo_catalog):
    """testInnerJoinQueryOfLookupRemovable — subquery over the lookup with
    a projection, joined on the raw key."""
    assert srows(q(spark, foo_catalog, """
        SELECT dim1, dim2[0] AS d2, t1.sk AS sk
        FROM foo
        INNER JOIN (SELECT k, SUBSTRING(v, 1, 3) sk FROM lookup.lookyloo) t1
        ON foo.dim2[0] = t1.k""")) == [
        ("", "a", "xa"), ("1", "a", "xa"), ("def", "abc", "xab")]


def test_left_join_two_lookups_using_join_operator(spark, foo_catalog):
    """testLeftJoinTwoLookupsUsingJoinOperator — dim1 and dim2 each probe
    the lookup."""
    assert srows(q(spark, foo_catalog, """
        SELECT dim1, dim2[0] AS d2, l1.v AS v1, l2.v AS v2
        FROM foo
        LEFT JOIN lookup.lookyloo l1 ON foo.dim1 = l1.k
        LEFT JOIN lookup.lookyloo l2 ON foo.dim2[0] = l2.k""")) == [
        ("", "a", None, "xa"),
        ("1", "a", None, "xa"),
        ("10.1", None, None, None),
        ("2", "", None, None),
        ("abc", None, "xabc", None),
        ("def", "abc", None, "xabc")]


def test_left_join_three_lookups_using_join_operator(spark, foo_catalog):
    """testLeftJoinThreeLookupsUsingJoinOperator — the third probes the
    second's key."""
    assert srows(q(spark, foo_catalog, """
        SELECT dim1, dim2[0] AS d2, l1.v AS v1, l2.v AS v2, l3.v AS v3
        FROM foo
        LEFT JOIN lookup.lookyloo l1 ON foo.dim1 = l1.k
        LEFT JOIN lookup.lookyloo l2 ON foo.dim2[0] = l2.k
        LEFT JOIN lookup.lookyloo l3 ON l2.k = l3.k""")) == [
        ("", "a", None, "xa", "xa"),
        ("1", "a", None, "xa", "xa"),
        ("10.1", None, None, None, None),
        ("2", "", None, None, None),
        ("abc", None, "xabc", None, None),
        ("def", "abc", None, "xabc", "xabc")]


def test_left_join_lookup_onto_lookup_using_join_operator(
        spark, foo_catalog):
    """testLeftJoinLookupOntoLookupUsingJoinOperator."""
    assert srows(q(spark, foo_catalog, """
        SELECT dim2[0] AS d2, l1.v AS v1, l2.v AS v2
        FROM foo
        LEFT JOIN lookup.lookyloo l1 ON foo.dim2[0] = l1.k
        LEFT JOIN lookup.lookyloo l2 ON l1.k = l2.k""")) == [
        (None, None, None), (None, None, None), ("", None, None),
        ("a", "xa", "xa"), ("a", "xa", "xa"), ("abc", "xabc", "xabc")]


def test_select_on_lookup_using_inner_join_operator(spark, foo_catalog):
    """testSelectOnLookupUsingInnerJoinOperator — lookyloo.* expands to
    (k, v)."""
    assert srows(q(spark, foo_catalog, """
        SELECT dim2[0] AS d2, lookyloo.*
        FROM foo INNER JOIN lookup.lookyloo ON foo.dim2[0] = lookyloo.k
        """)) == [("a", "a", "xa"), ("a", "a", "xa"), ("abc", "abc", "xabc")]


def test_inner_join_two_lookups_to_table_using_numeric_column_in_reverse(
        spark, foo_catalog):
    """testInnerJoinTwoLookupsToTableUsingNumericColumnInReverse — the
    string key '6' matches m1 = 6.0 numerically."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c
        FROM lookup.lookyloo l1
        INNER JOIN lookup.lookyloo l2 ON l1.k = l2.k
        INNER JOIN foo on l2.k = foo.m1""") == (1,)


def test_where_in_select_null_from_lookup(spark, foo_catalog):
    """testWhereInSelectNullFromLookup — IN over all-null subquery matches
    nothing."""
    assert q(spark, foo_catalog,
             "SELECT * FROM foo where dim1 IN "
             "(SELECT NULL FROM lookup.lookyloo)").count() == 0


def test_inner_join_left_function(spark, foo_catalog):
    """testInnerJoinLeftFunction — SUBSTRING of the left side in the join
    condition."""
    assert srows(q(spark, foo_catalog, """
        SELECT foo.dim1, foo.dim2[0] AS d2, l.k, l.v
        FROM foo
        INNER JOIN lookup.lookyloo l ON SUBSTRING(foo.dim2[0], 1, 1) = l.k
        """)) == [("", "a", "a", "xa"), ("1", "a", "a", "xa"),
                  ("def", "abc", "a", "xa")]


def test_inner_join_right_function(spark, foo_catalog):
    """testInnerJoinRightFunction — SUBSTRING of the right side; 'ab'
    never equals a full key."""
    assert srows(q(spark, foo_catalog, """
        SELECT foo.dim1, foo.dim2[0] AS d2, l.k, l.v
        FROM foo
        INNER JOIN lookup.lookyloo l ON foo.dim2[0] = SUBSTRING(l.k, 1, 2)
        """)) == [("", "a", "a", "xa"), ("1", "a", "a", "xa")]


def test_inner_join_with_is_null_filter(spark, foo_catalog):
    """testInnerJoinWithIsNullFilter."""
    assert rows(q(spark, foo_catalog, """
        SELECT dim1, l.v FROM druid.foo f
        inner join lookup.lookyloo l on f.dim1 = l.k
        where f.dim2[0] is null""")) == [("abc", "xabc")]


# ---------------------------------------------------------------------------
# Semi+anti / removable / time-dimension joins
# ---------------------------------------------------------------------------

def test_semi_and_anti_join_simultaneously_using_explicit_joins(
        spark, foo_catalog):
    """testSemiAndAntiJoinSimultaneouslyUsingExplicitJoins — INNER on
    MAX(__time), LEFT-anti on MIN(__time)."""
    assert rows(q(spark, foo_catalog, """
        SELECT dim1, COUNT(*) AS c FROM foo
        INNER JOIN (SELECT MAX(__time) t FROM foo) t0 on t0.t = foo.__time
        LEFT JOIN (SELECT MIN(__time) t FROM foo) t1 on t1.t = foo.__time
        WHERE dim1 IN ('abc', 'def') AND t1.t is null
        GROUP BY 1""")) == [("abc", 1)]


def test_removable_left_join(spark, foo_catalog):
    """testRemovableLeftJoin — the unreferenced right side drops out; per-
    dim1 sums are unchanged."""
    assert rows(q(spark, foo_catalog, """
        SELECT t1.dim1, SUM(t1.cnt) AS s
        FROM druid.foo t1
          LEFT JOIN (
          SELECT SUM(cnt) AS sum_cnt, dim2[0] AS d2 FROM druid.foo
          GROUP BY dim2[0] ORDER BY 1 DESC LIMIT 2
        ) t2 ON (t1.dim2[0] = t2.d2)
        GROUP BY t1.dim1
        ORDER BY 1""")) == [("", 1), ("1", 1), ("10.1", 1),
                            ("2", 1), ("abc", 1), ("def", 1)]


def test_join_with_time_dimension(spark, foo_catalog):
    """testJoinWithTimeDimension — equi-join on __time."""
    assert one(spark, foo_catalog,
               "SELECT count(*) AS c FROM druid.foo t1 "
               "inner join druid.foo t2 on t1.__time = t2.__time") == (6,)


def test_join_outer_group_by_and_subquery_no_limit(spark, foo_catalog):
    """testJoinOuterGroupByAndSubqueryNoLimit — AVG over the join result
    per dim2 (sql mode keeps null and '' separate)."""
    assert srows(q(spark, foo_catalog, """
        SELECT d2 AS dim2, AVG(m2) AS a
        FROM (SELECT t1.dim2[0] AS d2, t1.m2 AS m2
              FROM foo AS t1 INNER JOIN foo AS t2 ON t1.m1 = t2.m1) AS t3
        GROUP BY d2""")) == [(None, 4.0), ("", 3.0),
                             ("a", 2.5), ("abc", 5.0)]
