"""Round-4 CalciteQueryTest tranche G — ORDER BY EARLIEST/LATEST/ANY over
nullable numerics, primitive and string first/last/any re-aggregated through
subqueries, post-aggregations over timeseries/topN shapes, IN/NOT-IN
aggregate subqueries, subquery-as-filter compositions, exact-count-distinct
subqueries with where pushdown, histogram-over-subquery
(sql/src/test/java/org/apache/druid/sql/calcite/CalciteQueryTest.java;
SQL-compatible null mode).

MVD note: this SQL surface keeps MVDs as honest arrays (README compat
table); where the reference treats VARCHAR dim2, these ports use dim2[0] —
identical on foo whose dim2 rows hold at most one element."""

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
    """foo as ONE parquet file so scan order == row order — the ANY_VALUE
    and bare-LIMIT goldens encode the reference's single-segment scan order
    (same pattern as tranche B's numfoo1_catalog)."""
    from incubator_druid_spark.catalog import Catalog
    path = str(tmp_path_factory.mktemp("foo1g_ds") / "foo.parquet")
    foo.coalesce(1).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("foo", path)
    return cat


# ---------------------------------------------------------------------------
# ORDER BY EARLIEST / LATEST / ANY — nullable numerics
# ---------------------------------------------------------------------------
# Reference sql-mode expectations put EARLIEST/LATEST nulls FIRST ascending.
# Row ties within equal sort keys are unspecified, so assert the sort-key
# sequence plus the full (dim1, value) multiset.

EARLIEST_F1 = [("", 1.0), ("10.1", pytest.approx(0.1)), ("2", 0.0),
               ("1", None), ("def", None), ("abc", None)]


def _assert_orderby_agg(df, pairs, nulls_first=True):
    got = rows(df)
    vals = [v for _, v in got]
    nn = [v for v in vals if v is not None]
    assert nn == sorted(nn)
    if nulls_first:
        assert vals[:vals.count(None)] == [None] * vals.count(None)
    exp = sorted(pairs, key=lambda t: t[0])
    assert sorted(got, key=lambda t: t[0]) == exp


def test_order_by_earliest_float(spark, numfoo_catalog):
    """testOrderByEarliestFloat — nulls first, then 0.0, 0.1, 1.0."""
    _assert_orderby_agg(
        q(spark, numfoo_catalog,
          "SELECT dim1, EARLIEST(f1) AS e FROM druid.numfoo "
          "GROUP BY 1 ORDER BY 2 LIMIT 10"), EARLIEST_F1)


def test_order_by_earliest_double(spark, numfoo_catalog):
    """testOrderByEarliestDouble."""
    _assert_orderby_agg(
        q(spark, numfoo_catalog,
          "SELECT dim1, EARLIEST(d1) AS e FROM druid.numfoo "
          "GROUP BY 1 ORDER BY 2 LIMIT 10"),
        [("", 1.0), ("10.1", 1.7), ("2", 0.0),
         ("1", None), ("def", None), ("abc", None)])


def test_order_by_earliest_long(spark, numfoo_catalog):
    """testOrderByEarliestLong."""
    _assert_orderby_agg(
        q(spark, numfoo_catalog,
          "SELECT dim1, EARLIEST(l1) AS e FROM druid.numfoo "
          "GROUP BY 1 ORDER BY 2 LIMIT 10"),
        [("", 7), ("10.1", 325323), ("2", 0),
         ("1", None), ("def", None), ("abc", None)])


def test_order_by_latest_float(spark, numfoo_catalog):
    """testOrderByLatestFloat — single-row groups make LATEST == the
    row's value."""
    _assert_orderby_agg(
        q(spark, numfoo_catalog,
          "SELECT dim1, LATEST(f1) AS e FROM druid.numfoo "
          "GROUP BY 1 ORDER BY 2 LIMIT 10"), EARLIEST_F1)


def test_order_by_latest_double(spark, numfoo_catalog):
    """testOrderByLatestDouble."""
    _assert_orderby_agg(
        q(spark, numfoo_catalog,
          "SELECT dim1, LATEST(d1) AS e FROM druid.numfoo "
          "GROUP BY 1 ORDER BY 2 LIMIT 10"),
        [("", 1.0), ("10.1", 1.7), ("2", 0.0),
         ("1", None), ("def", None), ("abc", None)])


def test_order_by_latest_long(spark, numfoo_catalog):
    """testOrderByLatestLong."""
    _assert_orderby_agg(
        q(spark, numfoo_catalog,
          "SELECT dim1, LATEST(l1) AS e FROM druid.numfoo "
          "GROUP BY 1 ORDER BY 2 LIMIT 10"),
        [("", 7), ("10.1", 325323), ("2", 0),
         ("1", None), ("def", None), ("abc", None)])


def test_order_by_any_float(spark, numfoo_catalog):
    """testOrderByAnyFloat — DEVIATION on null placement only: the
    reference's InvertedTopNMetricSpec puts ANY nulls last; Spark ascending
    sort puts them first.  Values match (single-row groups)."""
    _assert_orderby_agg(
        q(spark, numfoo_catalog,
          "SELECT dim1, ANY_VALUE(f1) AS e FROM druid.numfoo "
          "GROUP BY 1 ORDER BY 2 LIMIT 10"), EARLIEST_F1)


def test_order_by_any_double(spark, numfoo_catalog):
    """testOrderByAnyDouble — same null-placement deviation note."""
    _assert_orderby_agg(
        q(spark, numfoo_catalog,
          "SELECT dim1, ANY_VALUE(d1) AS e FROM druid.numfoo "
          "GROUP BY 1 ORDER BY 2 LIMIT 10"),
        [("", 1.0), ("10.1", 1.7), ("2", 0.0),
         ("1", None), ("def", None), ("abc", None)])


def test_order_by_any_long(spark, numfoo_catalog):
    """testOrderByAnyLong — same null-placement deviation note."""
    _assert_orderby_agg(
        q(spark, numfoo_catalog,
          "SELECT dim1, ANY_VALUE(l1) AS e FROM druid.numfoo "
          "GROUP BY 1 ORDER BY 2 LIMIT 10"),
        [("", 7), ("10.1", 325323), ("2", 0),
         ("1", None), ("def", None), ("abc", None)])


# ---------------------------------------------------------------------------
# first/last/any re-aggregated through subqueries
# ---------------------------------------------------------------------------

def test_primitive_earliest_in_subquery(spark, foo_catalog):
    """testPrimitiveEarliestInSubquery — sql mode keeps 4 dim2 groups
    (null and '' distinct): 1+2+3+5 = 11, count 4."""
    assert one(spark, foo_catalog, """
        SELECT SUM(val1) AS a, SUM(val2) AS b, SUM(val3) AS c
        FROM (SELECT dim2[0] AS d2, EARLIEST(m1) AS val1,
                     EARLIEST(cnt) AS val2, EARLIEST(m2) AS val3
              FROM foo GROUP BY dim2[0])""") == (11.0, 4, 11.0)


def test_primitive_latest_in_subquery(spark, foo_catalog):
    """testPrimitiveLatestInSubquery — 4+6+3+5 = 18, count 4."""
    assert one(spark, foo_catalog, """
        SELECT SUM(val1) AS a, SUM(val2) AS b, SUM(val3) AS c
        FROM (SELECT dim2[0] AS d2, LATEST(m1) AS val1,
                     LATEST(cnt) AS val2, LATEST(m2) AS val3
              FROM foo GROUP BY dim2[0])""") == (18.0, 4, 18.0)


def test_primitive_any_in_subquery(spark, foo1_catalog):
    """testPrimitiveAnyInSubquery — ANY over single-candidate groups
    equals EARLIEST here (sql mode: 11, 4, 11)."""
    assert one(spark, foo1_catalog, """
        SELECT SUM(val1) AS a, SUM(val2) AS b, SUM(val3) AS c
        FROM (SELECT dim2[0] AS d2, ANY_VALUE(m1) AS val1,
                     ANY_VALUE(cnt) AS val2, ANY_VALUE(m2) AS val3
              FROM foo GROUP BY dim2[0])""") == (11.0, 4, 11.0)


def test_string_earliest_in_subquery(spark, foo_catalog):
    """testStringEarliestInSubquery — SUM over string-typed firsts casts;
    sql mode: 10.1 (null group) + 2 ('' group) = 12.1."""
    assert one(spark, foo_catalog, """
        SELECT SUM(val) AS s
        FROM (SELECT dim2[0] AS d2, EARLIEST(dim1, 10) AS val
              FROM foo GROUP BY dim2[0])""") == (pytest.approx(12.1),)


def test_string_any_in_subquery(spark, foo1_catalog):
    """testStringAnyInSubquery — same groups, same observed values."""
    assert one(spark, foo1_catalog, """
        SELECT SUM(val) AS s
        FROM (SELECT dim2[0] AS d2, ANY_VALUE(dim1, 10) AS val
              FROM foo GROUP BY dim2[0])""") == (pytest.approx(12.1),)


# ---------------------------------------------------------------------------
# Post-aggregations over timeseries / topN shapes
# ---------------------------------------------------------------------------

def test_post_agg_with_timeseries(spark, foo_catalog):
    """testPostAggWithTimeseries — yearly buckets descending with a
    SUM+SUM post-aggregation."""
    assert rows(q(spark, foo_catalog, """
        SELECT FLOOR(__time TO YEAR) AS t, SUM(m1) AS a,
               SUM(m1) + SUM(m2) AS b
        FROM druid.foo WHERE dim2[0] = 'a'
        GROUP BY FLOOR(__time TO YEAR)
        ORDER BY FLOOR(__time TO YEAR) desc""")) == [
        (_ts("2001-01-01"), 4.0, 8.0),
        (_ts("2000-01-01"), 1.0, 2.0)]


def test_post_agg_with_topn(spark, foo_catalog):
    """testPostAggWithTopN — AVG post-agg over an m1-ordered topN."""
    assert rows(q(spark, foo_catalog, """
        SELECT AVG(m2) AS a, SUM(m1) + SUM(m2) AS b
        FROM druid.foo WHERE dim2[0] = 'a'
        GROUP BY m1 ORDER BY m1 LIMIT 5""")) == [(1.0, 2.0), (4.0, 8.0)]


# ---------------------------------------------------------------------------
# Exact count-distinct / subquery filters
# ---------------------------------------------------------------------------

def test_two_exact_count_distincts(spark, foo_catalog):
    """testTwoExactCountDistincts — sql mode: 6 dim1 values ('' counts),
    3 dim2 values (null does not)."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(distinct dim1) AS a, "
               "COUNT(distinct dim2[0]) AS b FROM druid.foo") == (6, 3)


def test_multiple_exact_count_distinct_with_grouping_and_other_aggs(
        spark, visits_catalog):
    """testMultipleExactCountDistinctWithGroupingAndOtherAggregators —
    two exact distincts beside a day grouping over visits."""
    assert srows(q(spark, visits_catalog, """
        SELECT FLOOR(__time to day) AS d, COUNT(distinct city) AS c,
               COUNT(distinct user) AS u
        FROM druid.visits GROUP BY 1""")) == [
        (_ts("2021-01-01"), 3, 2),
        (_ts("2021-01-02"), 3, 4),
        (_ts("2021-01-03"), 1, 1)]


def test_exact_count_distinct_using_subquery_with_where_push_down(
        spark, foo_catalog):
    """testExactCountDistinctUsingSubqueryWithWherePushDown — the outer
    `dim2 <> ''` binds to the subquery ALIAS (a scalar), and Druid's
    two-valued not-selector keeps the null group: 2+2+1 = 5 over 3
    groups.  The IS NOT NULL variant keeps 'a','','abc': 2+1+1 = 4."""
    assert one(spark, foo_catalog, """
        SELECT SUM(cnt) AS s, COUNT(*) AS c
        FROM (SELECT dim2[0] AS dim2, SUM(cnt) AS cnt FROM druid.foo
              GROUP BY dim2[0])
        WHERE dim2 <> ''""") == (5, 3)
    assert one(spark, foo_catalog, """
        SELECT SUM(cnt) AS s, COUNT(*) AS c
        FROM (SELECT dim2[0] AS dim2, SUM(cnt) AS cnt FROM druid.foo
              GROUP BY dim2[0])
        WHERE dim2 IS NOT NULL""") == (4, 3)


def test_exact_count_distinct_using_subquery_with_where_to_outer_filter(
        spark, foo1_catalog):
    """testExactCountDistinctUsingSubqueryWithWhereToOuterFilter — inner
    LIMIT 1 takes the first group in Druid's default dimension ordering
    (null first, cnt 2); outer cnt > 0 keeps it."""
    assert one(spark, foo1_catalog, """
        SELECT SUM(cnt) AS s, COUNT(*) AS c
        FROM (SELECT dim2[0] AS d2, SUM(cnt) AS cnt FROM druid.foo
              GROUP BY dim2[0] LIMIT 1)
        WHERE cnt > 0""") == (2, 1)


def test_using_subquery_as_part_of_and_filter(spark, foo_catalog):
    """testUsingSubqueryAsPartOfAndFilter — IN-subquery AND <> filter."""
    assert rows(q(spark, foo_catalog, """
        SELECT dim1, dim2[0] AS d2, COUNT(*) AS c FROM druid.foo
        WHERE dim2[0] IN (SELECT dim1 FROM druid.foo WHERE dim1 <> '')
        AND dim1 <> 'xxx'
        group by dim1, dim2[0] ORDER BY d2""")) == [("def", "abc", 1)]


def test_using_subquery_as_part_of_or_filter(spark, foo_catalog):
    """testUsingSubqueryAsPartOfOrFilter — selector OR IN-subquery with
    LIKE inside."""
    assert rows(q(spark, foo_catalog, """
        SELECT dim1, dim2[0] AS d2, COUNT(*) AS c FROM druid.foo
        WHERE dim1 = 'xxx'
           OR dim2[0] IN (SELECT dim1 FROM druid.foo WHERE dim1 LIKE '%bc')
        group by dim1, dim2[0] ORDER BY d2""")) == [("def", "abc", 1)]


def test_using_subquery_with_extraction_fns(spark, foo_catalog):
    """testUsingSubqueryWithExtractionFns — substring-IN-substring
    semi-join."""
    assert srows(q(spark, foo_catalog, """
        SELECT dim2[0] AS d2, COUNT(*) AS c FROM druid.foo
        WHERE substring(dim2[0], 1, 1) IN
          (SELECT substring(dim1, 1, 1) FROM druid.foo WHERE dim1 <> '')
        group by dim2[0]""")) == [("a", 2), ("abc", 1)]


def test_max_subquery_rows_unrestricted(spark, foo_catalog):
    """testMaxSubqueryRows — the unrestricted run of the same query
    counts 3 (the context-limited variant raises in the reference; this
    engine has no subquery row cap by design — Spark spills instead)."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE SUBSTRING(dim2[0], 1, 1) IN (
          SELECT SUBSTRING(dim1, 1, 1) FROM druid.foo WHERE dim1 <> '')
        """) == (3,)


def test_using_subquery_with_limit(spark, foo_catalog):
    """testUsingSubqueryWithLimit."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS cnt FROM "
               "( SELECT * FROM druid.foo LIMIT 10 ) tmpA") == (6,)


def test_using_subquery_without_limit(spark, foo_catalog):
    """testUsingSubqueryWithoutLimit."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS cnt FROM ( SELECT * FROM druid.foo ) tmpA"
               ) == (6,)


def test_in_aggregation_subquery(spark, foo_catalog):
    """testInAggregationSubquery — __time IN (SELECT MAX(__time) ...)."""
    assert rows(q(spark, foo_catalog, """
        SELECT DISTINCT __time FROM druid.foo
        WHERE __time IN (SELECT MAX(__time) FROM druid.foo)""")) \
        == [(_ts("2001-01-03"),)]


def test_not_in_aggregation_subquery(spark, foo_catalog):
    """testNotInAggregationSubquery — every other timestamp survives."""
    assert srows(q(spark, foo_catalog, """
        SELECT DISTINCT __time FROM druid.foo
        WHERE __time NOT IN (SELECT MAX(__time) FROM druid.foo)""")) == [
        (_ts("2000-01-01"),), (_ts("2000-01-02"),), (_ts("2000-01-03"),),
        (_ts("2001-01-01"),), (_ts("2001-01-02"),)]


def test_histogram_using_subquery(spark, foo_catalog):
    """testHistogramUsingSubquery — count of groups per summed-cnt
    rendered as VARCHAR."""
    assert srows(q(spark, foo_catalog, """
        SELECT CAST(thecnt AS VARCHAR) AS h, COUNT(*) AS c
        FROM (SELECT dim2[0] AS d2, SUM(cnt) AS thecnt FROM druid.foo
              GROUP BY dim2[0])
        GROUP BY CAST(thecnt AS VARCHAR)""")) == [("1", 2), ("2", 2)]


def test_histogram_using_subquery_with_sort(spark, foo_catalog):
    """testHistogramUsingSubqueryWithSort — same histogram, ordered and
    limited."""
    assert rows(q(spark, foo_catalog, """
        SELECT CAST(thecnt AS VARCHAR) AS h, COUNT(*) AS c
        FROM (SELECT dim2[0] AS d2, SUM(cnt) AS thecnt FROM druid.foo
              GROUP BY dim2[0])
        GROUP BY CAST(thecnt AS VARCHAR)
        ORDER BY CAST(thecnt AS VARCHAR) LIMIT 2""")) == [("1", 2), ("2", 2)]
