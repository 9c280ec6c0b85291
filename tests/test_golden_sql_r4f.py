"""Round-4 CalciteQueryTest tranche F — simple typed aggregations, SELECT *
/ projection / limit-offset paging, limit wrapping over time-descending
scans, DISTINCT-with-sort outer queries, cascade/strlen extraction filters,
project-after-sort shapes, dead-aggregator pruning, constant expressions
(sql/src/test/java/org/apache/druid/sql/calcite/CalciteQueryTest.java;
SQL-compatible null mode).

MVD note: this SQL surface keeps MVDs as honest arrays (README compat
table); where the reference treats VARCHAR dim2, these ports use dim2[0] —
identical on foo whose dim2 rows hold at most one element.  Ordering note:
goldens whose reference expectation depends on Calcite dropping an inner
ORDER BY (a planner artifact, not query semantics) are asserted
order-insensitively."""

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


@pytest.fixture(scope="module")
def foo1_catalog(spark, foo, tmp_path_factory):
    """foo as ONE parquet file so scan order == row order — the bare-LIMIT
    goldens encode the reference's single-segment time-ascending scan order,
    which a multi-file parquet read does not preserve (same pattern as
    tranche B's numfoo1_catalog)."""
    from incubator_druid_spark.catalog import Catalog
    path = str(tmp_path_factory.mktemp("foo1_ds") / "foo.parquet")
    foo.coalesce(1).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("foo", path)
    return cat


# ---------------------------------------------------------------------------
# Simple typed aggregations
# ---------------------------------------------------------------------------

def test_simple_aggregations(spark, numfoo_catalog):
    """testSimpleAggregations — COUNT/AVG/SUM/MIN/MAX matrix over numfoo;
    sql mode: COUNT(col) skips nulls, AVG(d1) = (1 + 1.7) / 3."""
    r = q(spark, numfoo_catalog, """
        SELECT COUNT(*) AS a, COUNT(cnt) AS b, COUNT(dim1) AS c,
               AVG(cnt) AS d, SUM(cnt) AS e,
               SUM(cnt) + MIN(cnt) + MAX(cnt) AS f,
               COUNT(dim2[0]) AS g, COUNT(d1) AS h, AVG(d1) AS i
        FROM druid.numfoo""").first()
    assert (r["a"], r["b"], r["c"], r["e"], r["f"], r["g"], r["h"]) == \
        (6, 6, 6, 6, 8, 4, 3)
    assert r["d"] == 1 and r["i"] == pytest.approx((1 + 1.7) / 3)


def test_simple_long_aggregations(spark, numfoo_catalog):
    """testSimpleLongAggregations — MIN/MAX over nullable longs skip null."""
    assert one(spark, numfoo_catalog,
               "SELECT MIN(l1) AS a, MIN(cnt) AS b, MAX(l1) AS c "
               "FROM druid.numfoo") == (0, 1, 325323)


def test_simple_double_aggregations(spark, numfoo_catalog):
    """testSimpleDoubleAggregations."""
    assert one(spark, numfoo_catalog,
               "SELECT MIN(d1) AS a, MAX(d1) AS b FROM druid.numfoo"
               ) == (0.0, 1.7)


def test_simple_float_aggregations(spark, numfoo_catalog):
    """testSimpleFloatAggregations."""
    assert one(spark, numfoo_catalog,
               "SELECT MIN(m1) AS a, MAX(m1) AS b FROM druid.numfoo"
               ) == (1.0, 6.0)


# ---------------------------------------------------------------------------
# SELECT * family
# ---------------------------------------------------------------------------

FOO_STAR = [
    (_ts("2000-01-01"), "", ["a"], ["a", "b"], 1, 1.0, 1.0),
    (_ts("2000-01-02"), "10.1", [], ["b", "c"], 1, 2.0, 2.0),
    (_ts("2000-01-03"), "2", [""], ["d"], 1, 3.0, 3.0),
    (_ts("2001-01-01"), "1", ["a"], [""], 1, 4.0, 4.0),
    (_ts("2001-01-02"), "def", ["abc"], [], 1, 5.0, 5.0),
    (_ts("2001-01-03"), "abc", None, None, 1, 6.0, 6.0),
]


def _star_key(t):
    return t[0]


def test_select_star(spark, foo_catalog):
    """testSelectStar — every row, arrays kept honest (the reference
    renders MVDs as JSON strings; compat table documents the difference)."""
    got = sorted(rows(q(spark, foo_catalog, "SELECT * FROM druid.foo")),
                 key=_star_key)
    assert got == FOO_STAR


def test_select_star_with_limit(spark, foo1_catalog):
    """testSelectStarWithLimit — scan default order is time-ascending."""
    assert rows(q(spark, foo1_catalog, "SELECT * FROM druid.foo LIMIT 2")) \
        == FOO_STAR[:2]


def test_select_star_with_limit_and_offset(spark, foo1_catalog):
    """testSelectStarWithLimitAndOffset."""
    assert rows(q(spark, foo1_catalog,
                  "SELECT * FROM druid.foo LIMIT 2 OFFSET 1")) \
        == FOO_STAR[1:3]


def test_select_star_with_dim_filter(spark, foo_catalog):
    """testSelectStarWithDimFilter — lexicographic bound OR selector."""
    got = sorted(rows(q(spark, foo_catalog,
                        "SELECT * FROM druid.foo "
                        "WHERE dim1 > 'd' OR dim2[0] = 'a'")),
                 key=_star_key)
    assert got == [FOO_STAR[0], FOO_STAR[3], FOO_STAR[4]]


def test_select_star_without_limit_time_ascending(spark, foo_catalog):
    """testSelectStarWithoutLimitTimeAscending."""
    assert rows(q(spark, foo_catalog,
                  "SELECT * FROM druid.foo ORDER BY __time")) == FOO_STAR


def test_select_star_from_lookup(spark, foo_catalog):
    """testSelectStarFromLookup — the lookup datasource scans as (k, v)."""
    got = srows(q(spark, foo_catalog, "SELECT * FROM lookup.lookyloo"))
    assert got == [("6", "x6"), ("a", "xa"), ("abc", "xabc"),
                   ("nosuchkey", "mysteryvalue")]


# ---------------------------------------------------------------------------
# Projections / constants
# ---------------------------------------------------------------------------

def test_select_with_projection(spark, foo1_catalog):
    """testSelectWithProjection — SUBSTRING over the MVD element, first
    two rows in time order."""
    assert rows(q(spark, foo1_catalog,
                  "SELECT SUBSTRING(dim2[0], 1, 1) AS s "
                  "FROM druid.foo LIMIT 2")) == [("a",), (None,)]


def test_select_with_expression_filter(spark, foo_catalog):
    """testSelectWithExpressionFilter — m1 + 1 = 7 matches only 'abc'."""
    assert rows(q(spark, foo_catalog,
                  "SELECT dim1 FROM druid.foo WHERE m1 + 1 = 7")) \
        == [("abc",)]


def test_select_constant_expression(spark, foo_catalog):
    """testSelectConstantExpression — constant REGEXP_EXTRACT folds."""
    assert one(spark, foo_catalog,
               "SELECT REGEXP_EXTRACT('foo', '^(.)') AS r") == ("f",)


def test_select_constant_expression_from_table(spark, foo1_catalog):
    """testSelectConstantExpressionFromTable."""
    assert one(spark, foo1_catalog,
               "SELECT 1 + 1 AS two, dim1 FROM foo LIMIT 1") == (2, "")


def test_select_non_numeric_number_literals(spark, foo_catalog):
    """testSelectNonNumericNumberLiterals — DEVIATION: the reference
    saturates non-finite doubles on CAST AS BIGINT (Java (long) cast →
    Long.MAX/MIN_VALUE); Spark's non-ANSI cast yields NULL.  Assert this
    engine's defined behavior."""
    assert one(spark, foo_catalog, """
        SELECT CAST(1 / 0.0 AS BIGINT) AS a, CAST(1 / -0.0 AS BIGINT) AS b,
               CAST(-1 / 0.0 AS BIGINT) AS c, CAST(0 / 0.0 AS BIGINT) AS e
        """) == (None, None, None, None)


# ---------------------------------------------------------------------------
# Limit wrapping over descending scans
# ---------------------------------------------------------------------------

def test_select_single_column_with_limit_descending(spark, foo_catalog):
    """testSelectSingleColumnWithLimitDescending."""
    assert rows(q(spark, foo_catalog,
                  "SELECT dim1 FROM druid.foo ORDER BY __time DESC LIMIT 2"
                  )) == [("abc",), ("def",)]


def test_select_limit_wrapping(spark, foo_catalog):
    """testSelectLimitWrapping — sqlOuterLimit=2 over a descending scan."""
    assert rows(q(spark, foo_catalog,
                  "SELECT dim1 FROM druid.foo ORDER BY __time DESC LIMIT 2"
                  )) == [("abc",), ("def",)]


def test_select_limit_wrapping_on_top_of_offset(spark, foo_catalog):
    """testSelectLimitWrappingOnTopOfOffset (outer limit 2 == LIMIT 2)."""
    assert rows(q(spark, foo_catalog,
                  "SELECT dim1 FROM druid.foo ORDER BY __time DESC "
                  "LIMIT 2 OFFSET 1")) == [("def",), ("1",)]


def test_select_limit_wrapping_on_top_of_offset_and_low_limit(
        spark, foo_catalog):
    """testSelectLimitWrappingOnTopOfOffsetAndLowLimit — inner LIMIT 1
    wins over the outer 2."""
    assert rows(q(spark, foo_catalog,
                  "SELECT dim1 FROM druid.foo ORDER BY __time DESC "
                  "LIMIT 1 OFFSET 1")) == [("def",)]


def test_select_limit_wrapping_on_top_of_offset_and_high_limit(
        spark, foo_catalog):
    """testSelectLimitWrappingOnTopOfOffsetAndHighLimit — outer 2 wins
    over the inner 10."""
    assert rows(q(spark, foo_catalog,
                  "SELECT dim1 FROM druid.foo ORDER BY __time DESC "
                  "LIMIT 2 OFFSET 1")) == [("def",), ("1",)]


def test_select_projection_from_select_single_column_inner_limit_desc(
        spark, foo_catalog):
    """testSelectProjectionFromSelectSingleColumnWithInnerLimitDescending —
    'beep ' || dim1 over the last two rows by time."""
    assert rows(q(spark, foo_catalog, """
        SELECT 'beep ' || dim1 AS b
        FROM (SELECT dim1 FROM druid.foo ORDER BY __time DESC LIMIT 2)
        """)) == [("beep abc",), ("beep def",)]


def test_select_projection_inner_and_outer_limit_descending(
        spark, foo_catalog):
    """testSelectProjectionFromSelectSingleColumnWithInnerAndOuterLimit-
    Descending — outer LIMIT 2 over inner LIMIT 4."""
    assert rows(q(spark, foo_catalog, """
        SELECT 'beep ' || dim1 AS b
        FROM (SELECT dim1 FROM druid.foo ORDER BY __time DESC LIMIT 4)
        LIMIT 2""")) == [("beep abc",), ("beep def",)]


def test_select_projection_from_select_single_column_descending(
        spark, foo_catalog):
    """testSelectProjectionFromSelectSingleColumnDescending — the inner
    un-limited ORDER BY may legally be dropped (Calcite does; this engine
    preserves it), so assert the full value multiset."""
    got = srows(q(spark, foo_catalog, """
        SELECT 'beep ' || dim1 AS b
        FROM (SELECT dim1 FROM druid.foo ORDER BY __time DESC)"""))
    assert got == [("beep ",), ("beep 1",), ("beep 10.1",), ("beep 2",),
                   ("beep abc",), ("beep def",)]


# ---------------------------------------------------------------------------
# Limit-to-zero
# ---------------------------------------------------------------------------

def test_select_non_aggregating_with_limit_literally_zero(
        spark, foo_catalog):
    """testSelectNonAggregatingWithLimitLiterallyZero."""
    assert q(spark, foo_catalog,
             "SELECT dim2[0] AS d FROM druid.foo ORDER BY dim2[0] LIMIT 0"
             ).count() == 0


def test_select_non_aggregating_with_limit_reduced_to_zero(
        spark, foo_catalog):
    """testSelectNonAggregatingWithLimitReducedToZero — inner LIMIT 2
    OFFSET 5 leaves ≤1 row; outer OFFSET 2 empties it."""
    assert q(spark, foo_catalog, """
        SELECT * FROM (SELECT dim2[0] AS d FROM druid.foo
                       ORDER BY d LIMIT 2 OFFSET 5) OFFSET 2
        """).count() == 0


def test_select_aggregating_with_limit_reduced_to_zero(spark, foo_catalog):
    """testSelectAggregatingWithLimitReducedToZero — same with DISTINCT."""
    assert q(spark, foo_catalog, """
        SELECT * FROM (SELECT DISTINCT dim2[0] AS d FROM druid.foo
                       ORDER BY d LIMIT 2 OFFSET 5) OFFSET 2
        """).count() == 0


# ---------------------------------------------------------------------------
# DISTINCT with sort as outer query
# ---------------------------------------------------------------------------

DISTINCT_DIM2 = [(None,), ("",), ("a",), ("abc",)]


def test_select_distinct_with_limit(spark, foo_catalog):
    """testSelectDistinctWithLimit — 4 distinct dim2 values incl. null
    and '' (kept distinct in sql mode)."""
    assert srows(q(spark, foo_catalog,
                   "SELECT DISTINCT dim2[0] AS d FROM druid.foo LIMIT 10"
                   )) == DISTINCT_DIM2


def test_select_distinct_with_sort_as_outer_query(spark, foo_catalog):
    """testSelectDistinctWithSortAsOuterQuery."""
    assert srows(q(spark, foo_catalog, """
        SELECT * FROM (SELECT DISTINCT dim2[0] AS d FROM druid.foo
                       ORDER BY d) LIMIT 10""")) == DISTINCT_DIM2


def test_select_distinct_with_sort_as_outer_query2(spark, foo_catalog):
    """testSelectDistinctWithSortAsOuterQuery2 — inner LIMIT 5 ≥ group
    count, so all groups survive."""
    assert srows(q(spark, foo_catalog, """
        SELECT * FROM (SELECT DISTINCT dim2[0] AS d FROM druid.foo
                       ORDER BY d LIMIT 5) LIMIT 10""")) == DISTINCT_DIM2


def test_select_distinct_with_sort_as_outer_query3(spark, foo_catalog):
    """testSelectDistinctWithSortAsOuterQuery3 — descending inner sort,
    same surviving group set."""
    assert srows(q(spark, foo_catalog, """
        SELECT * FROM (SELECT DISTINCT dim2[0] AS d FROM druid.foo
                       ORDER BY d DESC LIMIT 5) LIMIT 10""")) == DISTINCT_DIM2


def test_select_distinct_with_strlen_filter(spark, foo_catalog):
    """testSelectDistinctWithStrlenFilter — CHARACTER_LENGTH filter plus a
    redundant cast-through-varchar disjunct."""
    assert srows(q(spark, foo_catalog, """
        SELECT distinct dim1 FROM druid.foo
        WHERE CHARACTER_LENGTH(dim1) = 3
           OR CAST(CHARACTER_LENGTH(dim1) AS varchar) = 3
        """)) == [("abc",), ("def",)]


def test_select_distinct_with_cascade_extraction_filter(spark, foo_catalog):
    """testSelectDistinctWithCascadeExtractionFilter — nested substrings
    OR a dim2 selector."""
    assert srows(q(spark, foo_catalog, """
        SELECT distinct dim1 FROM druid.foo
        WHERE substring(substring(dim1, 2), 1, 1) = 'e' OR dim2[0] = 'a'
        """)) == [("",), ("1",), ("def",)]


# ---------------------------------------------------------------------------
# Project after sort / dead-aggregator pruning
# ---------------------------------------------------------------------------

def test_project_after_sort(spark, foo_catalog):
    """testProjectAfterSort — project one grouping column through an
    ordered subquery."""
    assert srows(q(spark, foo_catalog, """
        select dim1 from (select dim1, dim2[0] AS d2, count(*) cnt
                          from druid.foo group by dim1, dim2[0]
                          order by cnt)""")) \
        == [("",), ("1",), ("10.1",), ("2",), ("abc",), ("def",)]


def test_project_after_sort2(spark, foo_catalog):
    """testProjectAfterSort2 — post-aggregate arithmetic s/cnt projected
    above the ordered grouping."""
    got = srows(q(spark, foo_catalog, """
        select s / cnt AS r, dim1, d2, s
        from (select dim1, dim2[0] AS d2, count(*) cnt, sum(m2) s
              from druid.foo group by dim1, dim2[0] order by cnt)"""))
    assert got == [(1.0, "", "a", 1.0),
                   (2.0, "10.1", None, 2.0),
                   (3.0, "2", "", 3.0),
                   (4.0, "1", "a", 4.0),
                   (5.0, "def", "abc", 5.0),
                   (6.0, "abc", None, 6.0)]


def test_project_after_sort3_without_ambiguity(spark, foo_catalog):
    """testProjectAfterSort3WithoutAmbiguity — duplicate grouping column
    under an alias."""
    assert srows(q(spark, foo_catalog, """
        select copydim1 from (select dim1, dim1 AS copydim1, count(*) cnt
                              from druid.foo group by dim1, dim1
                              order by cnt)""")) \
        == [("",), ("1",), ("10.1",), ("2",), ("abc",), ("def",)]


def test_sort_project_after_nested_group_by(spark, foo_catalog):
    """testSortProjectAfterNestedGroupBy — count over a (time, m2, dim1)
    inner grouping, all singleton groups."""
    assert rows(q(spark, foo_catalog, """
        SELECT cnt FROM (
          SELECT __time, dim1, COUNT(m2) AS cnt FROM (
            SELECT __time, m2, dim1 FROM druid.foo
            GROUP BY __time, m2, dim1)
          GROUP BY __time, dim1 ORDER BY cnt)""")) == [(1,)] * 6


def test_prune_dead_aggregators(spark, foo_catalog):
    """testPruneDeadAggregators — only the matching CASE branch's
    aggregator is computed."""
    assert one(spark, foo_catalog, """
        SELECT CASE 'foo' WHEN 'bar' THEN SUM(cnt)
                          WHEN 'foo' THEN SUM(m1)
                          WHEN 'baz' THEN SUM(m2) END AS c FROM foo
        """) == (21.0,)


def test_prune_dead_aggregators_through_post_projection(spark, foo_catalog):
    """testPruneDeadAggregatorsThroughPostProjection."""
    assert one(spark, foo_catalog, """
        SELECT CASE 'foo' WHEN 'bar' THEN SUM(cnt) / 10
                          WHEN 'foo' THEN SUM(m1) / 10
                          WHEN 'baz' THEN SUM(m2) / 10 END AS c FROM foo
        """) == (2.1,)


def test_prune_dead_aggregators_through_having(spark, foo_catalog):
    """testPruneDeadAggregatorsThroughHaving."""
    assert one(spark, foo_catalog, """
        SELECT CASE 'foo' WHEN 'bar' THEN SUM(cnt)
                          WHEN 'foo' THEN SUM(m1)
                          WHEN 'baz' THEN SUM(m2) END AS theCase FROM foo
        HAVING theCase = 21""") == (21.0,)
