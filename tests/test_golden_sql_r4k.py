"""Round-4 CalciteQueryTest tranche K — GROUPING SETS / ROLLUP / CUBE
family: the GROUPING() bitmask in both argument orders, a post-aggregation
CASE over GROUPING(), numeric grouping-set dimensions, dummy-literal set
lists, no-superset lists, ORDER BY dimension/aggregator with and without
limit, and NULL-literal IN filters
(sql/src/test/java/org/apache/druid/sql/calcite/CalciteQueryTest.java;
SQL-compatible null mode).

The reference pre-merges '' and null via COALESCE(dim2, '') in the inner
query; these ports COALESCE(dim2[0], '') identically."""

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


GS_INNER = ("(SELECT FLOOR(__time TO MONTH) AS gran, "
            "COALESCE(dim2[0], '') d2, cnt FROM druid.foo) AS x")

T2000 = _ts("2000-01-01")
T2001 = _ts("2001-01-01")


def test_grouping_sets(spark, foo_catalog):
    """testGroupingSets — 4 set lists with the GROUPING(d2, gran) mask."""
    got = srows(q(spark, foo_catalog, f"""
        SELECT d2, gran, SUM(cnt) AS s, GROUPING(d2, gran) AS g
        FROM {GS_INNER}
        GROUP BY GROUPING SETS ( (d2, gran), (d2), (gran), () )"""))
    assert got == [
        (None, None, 6, 3),
        (None, T2000, 3, 2), (None, T2001, 3, 2),
        ("", None, 3, 1), ("", T2000, 2, 0), ("", T2001, 1, 0),
        ("a", None, 2, 1), ("a", T2000, 1, 0), ("a", T2001, 1, 0),
        ("abc", None, 1, 1), ("abc", T2001, 1, 0)]


def test_grouping_aggregator_different_order(spark, foo_catalog):
    """testGroupingAggregatorDifferentOrder — GROUPING(gran, d2) swaps the
    bit positions."""
    got = srows(q(spark, foo_catalog, f"""
        SELECT d2, gran, SUM(cnt) AS s, GROUPING(gran, d2) AS g
        FROM {GS_INNER}
        GROUP BY GROUPING SETS ( (d2, gran), (d2), (gran), () )"""))
    assert got == [
        (None, None, 6, 3),
        (None, T2000, 3, 1), (None, T2001, 3, 1),
        ("", None, 3, 2), ("", T2000, 2, 0), ("", T2001, 1, 0),
        ("a", None, 2, 2), ("a", T2000, 1, 0), ("a", T2001, 1, 0),
        ("abc", None, 1, 2), ("abc", T2001, 1, 0)]


def test_grouping_aggregator_with_post_aggregator(spark, foo_catalog):
    """testGroupingAggregatorWithPostAggregator — CASE over GROUPING()
    labels the total row 'ALL' (sql mode keeps null and '' distinct)."""
    got = srows(q(spark, foo_catalog, """
        SELECT dim2[0] AS d2, SUM(cnt) AS s, GROUPING(dim2[0]) AS g,
          CASE WHEN GROUPING(dim2[0]) = 1 THEN 'ALL' ELSE dim2[0] END AS v
        FROM druid.foo
        GROUP BY GROUPING SETS ( (dim2[0]), () )"""))
    assert got == [(None, 2, 0, None), (None, 6, 1, "ALL"),
                   ("", 1, 0, ""), ("a", 2, 0, "a"), ("abc", 1, 0, "abc")]


def test_grouping_sets_with_numeric_dimension(spark, foo_catalog):
    """testGroupingSetsWithNumericDimension."""
    assert srows(q(spark, foo_catalog, """
        SELECT cnt, COUNT(*) AS c FROM foo
        GROUP BY GROUPING SETS ( (cnt), () )""")) == [(None, 6), (1, 6)]


def test_group_by_rollup(spark, foo_catalog):
    """testGroupByRollup — prefixes only: no (gran)-only rows."""
    got = srows(q(spark, foo_catalog, f"""
        SELECT d2, gran, SUM(cnt) AS s FROM {GS_INNER}
        GROUP BY ROLLUP (d2, gran)"""))
    assert got == [
        (None, None, 6),
        ("", None, 3), ("", T2000, 2), ("", T2001, 1),
        ("a", None, 2), ("a", T2000, 1), ("a", T2001, 1),
        ("abc", None, 1), ("abc", T2001, 1)]


def test_group_by_rollup_different_order(spark, foo_catalog):
    """testGroupByRollupDifferentOrder — ROLLUP (gran, d2) keeps
    (gran)-only rows instead."""
    got = srows(q(spark, foo_catalog, f"""
        SELECT d2, gran, SUM(cnt) AS s FROM {GS_INNER}
        GROUP BY ROLLUP (gran, d2)"""))
    assert got == [
        (None, None, 6), (None, T2000, 3), (None, T2001, 3),
        ("", T2000, 2), ("", T2001, 1),
        ("a", T2000, 1), ("a", T2001, 1),
        ("abc", T2001, 1)]


def test_group_by_cube(spark, foo_catalog):
    """testGroupByCube — same sets as the explicit 4-list GROUPING SETS."""
    got = srows(q(spark, foo_catalog, f"""
        SELECT d2, gran, SUM(cnt) AS s FROM {GS_INNER}
        GROUP BY CUBE (d2, gran)"""))
    assert got == [
        (None, None, 6), (None, T2000, 3), (None, T2001, 3),
        ("", None, 3), ("", T2000, 2), ("", T2001, 1),
        ("a", None, 2), ("a", T2000, 1), ("a", T2001, 1),
        ("abc", None, 1), ("abc", T2001, 1)]


def test_grouping_sets_with_limit(spark, foo_catalog):
    """testGroupingSetsWithLimit — LIMIT above the row count keeps all."""
    got = srows(q(spark, foo_catalog, f"""
        SELECT d2, gran, SUM(cnt) AS s FROM {GS_INNER}
        GROUP BY GROUPING SETS ( (d2, gran), (d2), (gran), () )
        LIMIT 100"""))
    assert len(got) == 11 and (None, None, 6) in got


def test_grouping_sets_with_dummy_dimension(spark, foo_catalog):
    """testGroupingSetsWithDummyDimension — a literal in a set list is
    constant and adds no grouping."""
    got = srows(q(spark, foo_catalog, f"""
        SELECT d2, gran, SUM(cnt) AS s FROM {GS_INNER}
        GROUP BY GROUPING SETS ( (d2, 'dummy', gran), (d2), (gran),
                                 ('dummy') )"""))
    assert got == [
        (None, None, 6), (None, T2000, 3), (None, T2001, 3),
        ("", None, 3), ("", T2000, 2), ("", T2001, 1),
        ("a", None, 2), ("a", T2000, 1), ("a", T2001, 1),
        ("abc", None, 1), ("abc", T2001, 1)]


def test_grouping_sets_no_superset(spark, foo_catalog):
    """testGroupingSetsNoSuperset — (), (d2), (gran) without the full
    cross set."""
    got = srows(q(spark, foo_catalog, f"""
        SELECT d2, gran, SUM(cnt) AS s FROM {GS_INNER}
        GROUP BY GROUPING SETS ( (), (d2), (gran) )"""))
    assert got == [
        (None, None, 6), (None, T2000, 3), (None, T2001, 3),
        ("", None, 3), ("a", None, 2), ("abc", None, 1)]


def test_grouping_sets_with_order_by_dimension(spark, foo_catalog):
    """testGroupingSetsWithOrderByDimension — gran ASC nulls first, d2
    DESC nulls last: exact reference sequence."""
    assert rows(q(spark, foo_catalog, f"""
        SELECT d2, gran, SUM(cnt) AS s FROM {GS_INNER}
        GROUP BY GROUPING SETS ( (), (d2), (gran) )
        ORDER BY gran, d2 DESC""")) == [
        ("abc", None, 1), ("a", None, 2), ("", None, 3), (None, None, 6),
        (None, T2000, 3), (None, T2001, 3)]


def test_grouping_sets_with_order_by_aggregator(spark, foo_catalog):
    """testGroupingSetsWithOrderByAggregator — ascending sums; ties are
    order-unspecified so assert the sum sequence + multiset."""
    got = rows(q(spark, foo_catalog, f"""
        SELECT d2, gran, SUM(cnt) AS s FROM {GS_INNER}
        GROUP BY GROUPING SETS ( (), (d2), (gran) )
        ORDER BY SUM(cnt)"""))
    assert [t[2] for t in got] == [1, 2, 3, 3, 3, 6]
    assert sorted(got, key=str) == sorted([
        (None, None, 6), (None, T2000, 3), (None, T2001, 3),
        ("", None, 3), ("a", None, 2), ("abc", None, 1)], key=str)


def test_grouping_sets_with_order_by_aggregator_with_limit(
        spark, foo_catalog):
    """testGroupingSetsWithOrderByAggregatorWithLimit — the single
    smallest-sum row."""
    assert rows(q(spark, foo_catalog, f"""
        SELECT d2, gran, SUM(cnt) AS s FROM {GS_INNER}
        GROUP BY GROUPING SETS ( (), (d2), (gran) )
        ORDER BY SUM(cnt) LIMIT 1""")) == [("abc", None, 1)]


def test_grouping_with_null_in_filter(spark, foo_catalog):
    """testGroupingWithNullInFilter — IN (NULL) matches nothing."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM foo WHERE dim1 IN (NULL)") == (0,)
