"""Round-5 CalciteQueryTest tranche M — limit wrapping (sqlOuterLimit
context through the SQL endpoint), topN-shaped grouped selects with
projections, project-after-sort, broadcast-join topNs, and inner-limit
descending subqueries
(sql/src/test/java/org/apache/druid/sql/calcite/CalciteQueryTest.java;
SQL-compatible null mode)."""

import pytest

from incubator_druid_spark.sql.functions import druid_sql


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def rows(df):
    return [tuple(r) for r in df.collect()]


def sql_ctx(spark, cat, sql, ctx):
    """Through the SQL endpoint (api.sql_query) so query context options
    apply — PlannerContext.CTX_SQL_OUTER_LIMIT lives there."""
    from incubator_druid_spark.api import sql_query
    out = sql_query({"query": sql, "resultFormat": "array", "context": ctx},
                    spark, cat)
    return [tuple(r) for r in out]


@pytest.fixture(scope="module")
def broadcast_catalog(spark, numfoo, tmp_path_factory):
    """numfoo + `broadcast` (CalciteTests.BROADCAST_DATASOURCE — the same
    numeric-dims rows registered as a global table)."""
    from incubator_druid_spark.catalog import Catalog
    path = str(tmp_path_factory.mktemp("bcast_ds") / "numfoo.parquet")
    numfoo.write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("numfoo", path)
    cat.register("broadcast", path)
    return cat


def test_topn_limit_wrapping(spark, foo_catalog):
    """testTopNLimitWrapping — sqlOuterLimit=2 around a DESC dim sort
    (sql mode: null/'' stay distinct; 'def' and 'abc' lead descending)."""
    got = sql_ctx(spark, foo_catalog,
                  "SELECT dim1, COUNT(*) AS c FROM druid.foo "
                  "GROUP BY dim1 ORDER BY dim1 DESC",
                  {"sqlOuterLimit": 2})
    assert got == [("def", 1), ("abc", 1)]


def test_topn_limit_wrapping_order_by_agg(spark, foo_catalog):
    """testTopNLimitWrappingOrderByAgg — every count ties at 1, and the
    reference's topN breaks ties lexicographically on the dimension; the
    port spells that tiebreak out (Spark's sort is not stable across
    equal keys)."""
    got = sql_ctx(spark, foo_catalog,
                  "SELECT dim1, COUNT(*) AS c FROM druid.foo "
                  "GROUP BY 1 ORDER BY 2 DESC, 1",
                  {"sqlOuterLimit": 2})
    assert got == [("", 1), ("1", 1)]


def test_topn_on_broadcast_join(spark, broadcast_catalog):
    """testTopNOnStringWithNonSortedOrUniqueDictionary — INNER JOIN against
    the broadcast global table, grouped topN (3x3 rows per dim4 value)."""
    got = rows(q(spark, broadcast_catalog, """
        SELECT broadcast.dim4 AS d4, COUNT(*) AS c
        FROM druid.numfoo
        INNER JOIN druid.broadcast ON numfoo.dim4 = broadcast.dim4
        GROUP BY 1 ORDER BY 2, 1 LIMIT 4"""))
    assert got == [("a", 9), ("b", 9)]


def test_topn_on_broadcast_join_order_by_dim(spark, broadcast_catalog):
    """testTopNOnStringWithNonSortedOrUniqueDictionaryOrderByDim."""
    got = rows(q(spark, broadcast_catalog, """
        SELECT broadcast.dim4 AS d4, COUNT(*) AS c
        FROM druid.numfoo
        INNER JOIN druid.broadcast ON numfoo.dim4 = broadcast.dim4
        GROUP BY 1 ORDER BY 1 DESC LIMIT 4"""))
    assert got == [("b", 9), ("a", 9)]


def test_topn_with_select_projections(spark, foo_catalog):
    """testTopNWithSelectProjections — SUBSTRING(dim1, 2) is NULL (not '')
    when empty in sql mode."""
    got = rows(q(spark, foo_catalog, """
        SELECT dim1, SUBSTRING(dim1, 2) AS s
        FROM druid.foo GROUP BY dim1 ORDER BY dim1 LIMIT 10"""))
    assert got == [("", None), ("1", None), ("10.1", "0.1"),
                   ("2", None), ("abc", "bc"), ("def", "ef")]


def test_topn_with_select_and_order_by_projections(spark, foo_catalog):
    """testTopNWithSelectAndOrderByProjections — ORDER BY strlen DESC
    (ties broken by the dimension to keep the port deterministic — the
    reference's topN uses the dimension's lexicographic order)."""
    got = rows(q(spark, foo_catalog, """
        SELECT dim1, SUBSTRING(dim1, 2) AS s
        FROM druid.foo GROUP BY dim1
        ORDER BY CHARACTER_LENGTH(dim1) DESC, dim1 LIMIT 10"""))
    assert got == [("10.1", "0.1"), ("abc", "bc"), ("def", "ef"),
                   ("1", None), ("2", None), ("", None)]


def test_project_after_sort3(spark, foo_catalog):
    """testProjectAfterSort3 — duplicate grouping column collapsed."""
    got = sorted(rows(q(spark, foo_catalog, """
        select dim1 from (
          select dim1, dim1, count(*) cnt from druid.foo
          group by dim1, dim1 order by cnt)""")))
    assert got == [("",), ("1",), ("10.1",), ("2",), ("abc",), ("def",)]


def test_select_star_from_select_single_column_with_limit_desc(
        spark, foo_catalog):
    """testSelectStarFromSelectSingleColumnWithLimitDescending — the
    reference's Calcite DROPS the un-limited inner ORDER BY (its comment:
    subquery results are an unordered set, so either answer is valid) and
    returns scan order; Spark honors the sort, so the outer LIMIT takes the
    latest-first rows.  Both satisfy the standard; the port pins Spark's
    deterministic answer."""
    got = rows(q(spark, foo_catalog, """
        SELECT * FROM (SELECT dim1 FROM druid.foo ORDER BY __time DESC)
        LIMIT 2"""))
    assert got == [("abc",), ("def",)]


def test_select_projection_inner_and_outer_limit_descending(
        spark, foo_catalog):
    """testSelectProjectionFromSelectSingleColumnWithInnerAndOuterLimit
    Descending — the inner ORDER BY survives because of its LIMIT."""
    got = rows(q(spark, foo_catalog, """
        SELECT 'beep ' || dim1 AS b FROM (
          SELECT dim1 FROM druid.foo ORDER BY __time DESC LIMIT 4)
        LIMIT 2"""))
    assert got == [("beep abc",), ("beep def",)]
