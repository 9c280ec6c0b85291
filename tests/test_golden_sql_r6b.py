"""Golden SQL tests — round-6 tranche B: the remaining CalciteQueryTest
join/inline/union/EXPLAIN methods (reference sql/src/test/.../calcite/
CalciteQueryTest.java), SQL-compatible null mode, adaptations per
test_golden_joins.py's header.

The reference's *_withLeftDirectAccess variants
(testInnerJoinOnTwoInlineDataSources_withLeftDirectAccess,
testInnerJoinOnTwoInlineDataSourcesWithOuterWhere_withLeftDirectAccess,
testLeftJoinOnTwoInlineDataSources_withLeftDirectAccess,
testLeftJoinOnTwoInlineDataSourcesWithOuterWhere_withLeftDirectAccess,
testLeftJoinOnTwoInlineDataSourcesWithTimeFilter_withLeftDirectAccess)
re-run identical SQL under a different physical access flag; each port
covers the pair (the result contract, which is what this engine can
assert, is the same).

Deliberately NOT ported, with reasons:
  * testSelectStarOnForbiddenTable/View, testSelectStarOnRestrictedView,
    testInformationSchemaColumnsOnForbiddenTable — the authorizer
    extension (basic-security) is ops plumbing outside SURVEY §2 scope;
    this engine has no ACL model to enforce.
  * testRequireTimeCondition*Negative — PlannerConfig.requireTimeCondition
    is a planner guard-rail config with no engine equivalent yet.
  * testSelectLimitWrappingAgainAkaIDontReallyQuiteUnderstandCalciteQueryPlanning
    — needs the lotsocolumns benchmark fixture, which no tranche has
    materialized (testSelectStarOnForbiddenView is in the authorizer
    group above).
"""

import datetime

import pytest

from incubator_druid_spark.sql.functions import druid_sql
from tests.conftest import rows


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# inline (CTE) datasource joins
# ---------------------------------------------------------------------------

def test_left_join_two_inline_datasources_with_outer_where(spark, foo_catalog):
    """CalciteQueryTest.java testLeftJoinOnTwoInlineDataSourcesWithOuterWhere
    (and _withLeftDirectAccess — same SQL, same row)."""
    out = rows(q(spark, foo_catalog, '''
        WITH abc AS (
          SELECT dim1, "__time", m1 from foo WHERE "dim1" = '10.1')
        SELECT t1.dim1, t1."__time" from abc as t1
        LEFT JOIN abc as t2 on t1.dim1 = t2.dim1
        WHERE t1.dim1 = '10.1' '''))
    assert out == [("10.1", _ts("2000-01-02"))]


def test_left_join_two_inline_datasources(spark, foo_catalog):
    """CalciteQueryTest.java testLeftJoinOnTwoInlineDataSources
    _withLeftDirectAccess + WithTimeFilter variant — the time filter keeps
    the same single row."""
    out = rows(q(spark, foo_catalog, '''
        WITH abc AS (
          SELECT dim1, "__time", m1 from foo
          WHERE "dim1" = '10.1' AND "__time" >= '1999-01-01')
        SELECT t1.dim1, t1."__time" from abc as t1
        LEFT JOIN abc as t2 on t1.dim1 = t2.dim1'''))
    assert out == [("10.1", _ts("2000-01-02"))]


def test_inner_join_two_inline_datasources(spark, foo_catalog):
    """CalciteQueryTest.java testInnerJoinOnTwoInlineDataSources
    (+ _withLeftDirectAccess)."""
    out = rows(q(spark, foo_catalog, '''
        WITH abc AS (
          SELECT dim1, "__time", m1 from foo WHERE "dim1" = '10.1')
        SELECT t1.dim1, t1."__time" from abc as t1
        INNER JOIN abc as t2 on t1.dim1 = t2.dim1'''))
    assert out == [("10.1", _ts("2000-01-02"))]


def test_nested_group_by_on_inline_datasource_with_filter(spark, foo_catalog):
    """CalciteQueryTest.java testNestedGroupByOnInlineDataSourceWithFilter."""
    assert q(spark, foo_catalog, '''
        WITH abc as (
          SELECT dim1, m2 from druid.foo where "__time" >= '2001-01-02'),
        def as (
          SELECT t1.dim1, SUM(t2.m2) as "metricSum"
          from abc as t1 inner join abc as t2 on t1.dim1 = t2.dim1
          where t1.dim1='def' group by 1)
        SELECT count(*) AS c from def''').first()["c"] == 1


# ---------------------------------------------------------------------------
# join shapes over subqueries / lookups
# ---------------------------------------------------------------------------

def test_join_on_group_by_instead_of_timeseries_with_floor(spark, foo_catalog):
    """CalciteQueryTest.java
    testJoinOnGroupByInsteadOfTimeseriesWithFloorOnTime — tuple-IN against
    a floored-time grouped subquery.  CAST(__time AS BIGINT) is written as
    TIMESTAMP_TO_MILLIS, dim3='b' as MV_CONTAINS (header adaptations);
    ANY_VALUE's maxBytes arg drops (honest arrays need no byte cap)."""
    out = q(spark, foo_catalog, """
        SELECT TIMESTAMP_TO_MILLIS(__time) AS tm, m1, ANY_VALUE(dim3) AS a
        FROM foo WHERE (TIMESTAMP_TO_MILLIS(TIME_FLOOR(__time, 'PT1H')), m1)
        IN (
          SELECT TIMESTAMP_TO_MILLIS(TIME_FLOOR(__time, 'PT1H')) + 0 AS t1,
                 MIN(m1) AS t2
          FROM foo WHERE MV_CONTAINS(dim3, 'b')
            AND __time BETWEEN '1994-04-29 00:00:00' AND '2020-01-11 00:00:00'
          GROUP BY 1)
        GROUP BY 1, 2 ORDER BY 1""").collect()
    got = [(r["tm"], r["m1"], list(r["a"])) for r in out]
    assert got == [(946684800000, 1.0, ["a", "b"]),
                   (946771200000, 2.0, ["b", "c"])]


def test_join_outer_group_by_and_subquery_has_limit(spark, foo_catalog):
    """CalciteQueryTest.java testJoinOuterGroupByAndSubqueryHasLimit — the
    LIMIT 10 exceeds the 6 matching self-join rows, so the aggregate is
    deterministic.  Honest-array dim2 keeps 5 groups (Druid's MVD view
    merges [] into null and scalarizes ['a']).  The reference's SELECT *
    relies on Druid auto-prefixing right-side columns ('j0.'); Spark needs
    the unambiguous projection spelled out, binding dim2/m2 to the left
    side like Druid's resolution does."""
    out = q(spark, foo_catalog, """
        SELECT dim2, AVG(m2) AS a FROM (
          SELECT t1.dim2, t1.m2 FROM foo AS t1
          INNER JOIN foo AS t2 ON t1.m1 = t2.m1
          LIMIT 10) AS t3
        GROUP BY dim2""").collect()
    got = {(tuple(r["dim2"]) if r["dim2"] is not None else None): r["a"]
           for r in out}
    assert got == {("a",): 2.5, (): 2.0, ("",): 3.0, ("abc",): 5.0,
                   None: 6.0}


def test_topn_filter_join(spark, foo_catalog):
    """CalciteQueryTest.java testTopNFilterJoin /
    testTopNFilterJoinWithProjection — rows
    whose dim2 lands in the top-SUM(cnt) groups.  LIMIT 1 instead of the
    reference's 2: with honest arrays the second slot is a four-way
    sum=1 tie, and the reference's own pick (its null group) relies on MVD
    collapsing [] into null."""
    out = rows(q(spark, foo_catalog, """
        SELECT t1.dim1, SUM(t1.cnt) AS s FROM druid.foo t1
        INNER JOIN (
          SELECT SUM(cnt) AS sum_cnt, dim2 FROM druid.foo
          GROUP BY dim2 ORDER BY 1 DESC LIMIT 1) t2
        ON (t1.dim2 = t2.dim2)
        GROUP BY t1.dim1 ORDER BY 1"""))
    assert out == [("", 1), ("1", 1)]


def test_inner_join_lookup_twice_with_filter_all_columns(spark, full_catalog):
    """CalciteQueryTest.java
    testInnerJoinTableLookupLookupWithFilterWithOuterLimitWithAllColumns —
    adapted: the fixture has no unique_dim1 HLL sidecar column, so the
    projection lists the physical columns."""
    out = q(spark, full_catalog, """
        SELECT __time, cnt, dim1, dim2, dim3, m1, m2
        FROM foo
        INNER JOIN lookup.lookyloo l ON foo.dim2[0] = l.k
        INNER JOIN lookup.lookyloo l2 ON foo.dim2[0] = l2.k
        WHERE l.v = 'xa'
        LIMIT 100""").collect()
    got = sorted((r["__time"], r["cnt"], r["dim1"]) for r in out)
    assert got == [(_ts("2000-01-01"), 1, ""), (_ts("2001-01-01"), 1, "1")]


def test_join_lookup_table_mismatched_types(spark, full_catalog):
    """CalciteQueryTest.java
    testJoinTableLookupTableMismatchedTypesWithoutComma — a long join key
    against string lookup keys matches nothing."""
    assert q(spark, full_catalog, """
        SELECT COUNT(*) AS c FROM foo
        INNER JOIN lookup.lookyloo l ON foo.cnt = l.k
        INNER JOIN numfoo ON l.k = numfoo.cnt""").first()["c"] == 0


def test_filter_group_by_lookup_value_filter_matches_nothing(spark, foo_catalog):
    """CalciteQueryTest.java
    testFilterAndGroupByLookupUsingJoinOperatorWithValueFilterPushdownMatchesNothig."""
    out = q(spark, foo_catalog, """
        SELECT lookyloo.k AS k, COUNT(*) AS c
        FROM foo LEFT JOIN lookup.lookyloo ON foo.dim2[0] = lookyloo.k
        WHERE lookyloo.v = '123'
        GROUP BY lookyloo.k""").collect()
    assert out == []


def test_inner_join_on_multi_value_column_refuses(spark, full_catalog):
    """CalciteQueryTest.java testInnerJoinOnMultiValueColumn — @Ignore'd in
    the reference (apache/druid#9924: the join silently matches only the
    FIRST element).  Honest arrays refuse the array-to-scalar equi-join
    with a type error instead of a silently-wrong result."""
    with pytest.raises(Exception, match="(?i)data type mismatch|cannot"):
        q(spark, full_catalog,
          "SELECT dim3, l.v, count(*) from druid.foo f "
          "inner join lookup.lookyloo l on f.dim3 = l.k "
          "group by 1, 2").collect()


# ---------------------------------------------------------------------------
# UNION ALL column-count mismatches — errors, like the reference
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("tables", [
    ("numfoo", "foo", "foo"),   # testUnionAllThreeTablesColumnCountMismatch1
    ("foo", "numfoo", "foo"),   # testUnionAllThreeTablesColumnCountMismatch2
    ("foo", "foo", "numfoo"),   # testUnionAllThreeTablesColumnCountMismatch3
])
def test_union_all_three_tables_column_count_mismatch(spark, full_catalog,
                                                      tables):
    """CalciteQueryTest.java testUnionAllThreeTablesColumnCountMismatch1-3 —
    SELECT * branches with different column counts cannot union."""
    a, b, c = tables
    with pytest.raises(Exception,
                       match="(?i)number of columns|union|incompatible"):
        q(spark, full_catalog, f"""
            SELECT dim1, dim2[0], SUM(m1), COUNT(*) FROM (
              SELECT * FROM {a} UNION ALL SELECT * FROM {b}
              UNION ALL SELECT * from {c})
            WHERE dim2[0] = 'a' OR dim2[0] = 'def'
            GROUP BY 1, 2""").collect()


# ---------------------------------------------------------------------------
# projections over limited subqueries
# ---------------------------------------------------------------------------

def test_select_projection_inner_and_outer_limit_descending(spark, foo_catalog):
    """CalciteQueryTest.java
    testSelectProjectionFromSelectSingleColumnWithInnerAndOuterLimitDescending."""
    out = q(spark, foo_catalog,
            "SELECT 'beep ' || dim1 AS b FROM "
            "(SELECT dim1 FROM druid.foo ORDER BY __time DESC LIMIT 4) "
            "LIMIT 2").collect()
    assert [r["b"] for r in out] == ["beep abc", "beep def"]


# ---------------------------------------------------------------------------
# EXPLAIN PLAN FOR — PLAN + RESOURCES contract
# ---------------------------------------------------------------------------

def _explain(spark, cat, sql):
    r = q(spark, cat, "EXPLAIN PLAN FOR " + sql).first()
    import json
    return r["PLAN"], json.loads(r["RESOURCES"])


def test_explain_select_constant_expression(spark, foo_catalog):
    """CalciteQueryTest.java testExplainSelectConstantExpression — a
    constant query touches no datasource."""
    plan, res = _explain(spark, foo_catalog, "SELECT 1 + 1")
    assert res == [] and plan


def test_explain_select_star(spark, foo_catalog):
    """CalciteQueryTest.java testExplainSelectStar."""
    plan, res = _explain(spark, foo_catalog, "SELECT * FROM druid.foo")
    assert res == [{"name": "foo", "type": "DATASOURCE"}]
    assert "Scan" in plan or "Relation" in plan


def test_explain_exact_count_distinct_of_semijoin(spark, foo_catalog):
    """CalciteQueryTest.java testExplainExactCountDistinctOfSemiJoinResult."""
    plan, res = _explain(spark, foo_catalog, """
        SELECT COUNT(*) FROM (
          SELECT DISTINCT dim2[0] FROM druid.foo
          WHERE SUBSTRING(dim2[0], 1, 1) IN (
            SELECT SUBSTRING(dim1, 1, 1) FROM druid.foo WHERE dim1 <> ''))""")
    assert res == [{"name": "foo", "type": "DATASOURCE"}]
    assert plan


def test_explain_information_schema_columns(spark, foo_catalog):
    """CalciteQueryTest.java testExplainInformationSchemaColumns — metadata
    tables are not datasources, so RESOURCES stays empty."""
    plan, res = _explain(spark, foo_catalog, """
        SELECT COLUMN_NAME, DATA_TYPE FROM INFORMATION_SCHEMA.COLUMNS
        WHERE TABLE_SCHEMA = 'druid' AND TABLE_NAME = 'foo'""")
    assert plan and res == []


# ---------------------------------------------------------------------------
# requireTimeCondition (PlannerConfig) — implemented round 6 as an
# optimized-plan guard in api._require_time_condition
# ---------------------------------------------------------------------------

def _rq(spark, cat, sql):
    from incubator_druid_spark.api import sql_query
    return sql_query({"query": sql,
                      "context": {"requireTimeCondition": True}},
                     spark, cat)


def test_require_time_condition_simple_query_negative(spark, foo_catalog):
    """CalciteQueryTest.testRequireTimeConditionSimpleQueryNegative — no
    __time filter anywhere: CannotBuildQueryException mentioning the
    __time column."""
    with pytest.raises(ValueError, match="__time column"):
        _rq(spark, foo_catalog, """
            SELECT SUM(cnt), gran FROM (
              SELECT __time as t, floor(__time TO month) AS gran, cnt
              FROM druid.foo) AS x
            GROUP BY gran ORDER BY gran""")


def test_require_time_condition_subquery_negative(spark, foo_catalog):
    """testRequireTimeConditionSubQueryNegative — the grouped subquery has
    no time filter either."""
    with pytest.raises(ValueError, match="__time column"):
        _rq(spark, foo_catalog, """
            SELECT SUM(cnt) AS s, COUNT(*) AS c
            FROM (SELECT dim2[0] AS d2, SUM(cnt) AS cnt FROM druid.foo
                  GROUP BY dim2[0])""")


def test_require_time_condition_semi_join_negative(spark, foo_catalog):
    """testRequireTimeConditionSemiJoinNegative — the inner IN-subquery
    has a __time bound but the OUTER scan does not; still refused."""
    with pytest.raises(ValueError, match="__time column"):
        _rq(spark, foo_catalog, """
            SELECT COUNT(*) AS c FROM druid.foo
            WHERE SUBSTRING(dim2[0], 1, 1) IN (
              SELECT SUBSTRING(dim1, 1, 1) FROM druid.foo
              WHERE dim1 <> '' AND __time >= '2000-01-01')""")


def test_require_time_condition_positive_still_answers(spark, foo_catalog):
    """testRequireTimeConditionPositive under the flag — an aliased __time
    bound (t >= …) survives the optimizer's alias resolution and planning
    proceeds."""
    out = _rq(spark, foo_catalog, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT __time as t, floor(__time TO month) AS gran, cnt
          FROM druid.foo) AS x
        WHERE t >= '2000-01-01' and t < '2002-01-01'
        GROUP BY gran ORDER BY gran""")
    assert [(r["s"], str(r["gran"])[:10]) for r in out] == \
        [(3, "2000-01-01"), (3, "2001-01-01")]


def test_group_by_sort_on_post_aggregation_no_topn(spark, foo_catalog):
    """CalciteQueryTest testGroupByWithSortOnPostAggregationNoTopNConfig /
    testGroupByWithSortOnPostAggregationNoTopNContext — with approximate
    topN disabled the query plans as a
    grouped aggregate + ordered limit; identical results either way.  In
    this engine Catalyst always picks the physical strategy
    (TakeOrderedAndProject), so the config/context pair is one contract;
    useApproximateTopN=false is accepted as a no-op context key."""
    from incubator_druid_spark.api import sql_query
    sql = ("SELECT dim1, MIN(m1) + MAX(m1) AS x FROM druid.foo "
           "GROUP BY dim1 ORDER BY x LIMIT 3")
    for ctx in ({}, {"useApproximateTopN": False}):
        out = sql_query({"query": sql, "resultFormat": "array",
                         "context": ctx}, spark, foo_catalog)
        assert [tuple(r) for r in out] == \
            [("", 2.0), ("10.1", 4.0), ("2", 6.0)]


def test_timestampadd_zero_periods(spark, foo_catalog):
    """CalciteQueryTest testTimeStampAddZeroDayPeriod /
    testTimeStampAddZeroMonthPeriod / testTimeStampAddZeroYearPeriod —
    adding a zero period of any unit returns the original timestamps."""
    expected = sorted([
        "2000-01-01 00:00:00", "2000-01-02 00:00:00",
        "2000-01-03 00:00:00", "2001-01-01 00:00:00",
        "2001-01-02 00:00:00", "2001-01-03 00:00:00"])
    for unit in ("DAY", "MONTH", "YEAR"):
        out = rows(q(spark, foo_catalog,
                     f'SELECT TIMESTAMPADD({unit}, 0, "__time") '
                     f"FROM druid.foo"))
        assert sorted(str(r[0]) for r in out) == expected
