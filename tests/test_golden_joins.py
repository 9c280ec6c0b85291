"""Golden SQL tests — the join-heavy and correlated-subquery tranche of
CalciteQueryTest.java / CalciteCorrelatedQueryTest.java (reference
sql/src/test/java/org/apache/druid/sql/calcite/), SQL-compatible null mode.

Adaptations, consistent with test_golden_sql.py's MVD note:
  * `dim2` is honestly an ARRAY column here; Druid's single-valued view of it
    is `dim2[0]` ('' stays '', [] reads as NULL) — golden cases whose SQL
    touches dim2 as a scalar use that projection.
  * `dim3 = 'b'` (MVD any-element match) is written with the explicit Druid
    SQL form MV_CONTAINS(dim3, 'b') (MultiValueStringOperatorConversions).
  * `CAST(__time AS BIGINT)` (millis in Druid, seconds in Spark) is written
    as the dialect-neutral Druid function TIMESTAMP_TO_MILLIS(__time).
  * `lookup.lookyloo` referenced column-wise as `lookyloo.*` gets an explicit
    alias (the lookup-schema rewrite renames the view).
Expected rows are the reference's own expected lists (sql-compatible
branches), cited per test.
"""

import pytest

from incubator_druid_spark.sql.functions import druid_sql
from tests.conftest import rows


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


# ---------------------------------------------------------------------------
# correlated subqueries (CalciteCorrelatedQueryTest.java)
# ---------------------------------------------------------------------------

def test_correlated_subquery_avg_dau(spark, visits_catalog):
    """CalciteCorrelatedQueryTest.java:62 testCorrelatedSubquery —
    per-country ANY_VALUE of avg daily distinct users."""
    out = q(spark, visits_catalog, '''
        select country, ANY_VALUE(
            (select avg("users") from (
                select floor(__time to day), count(distinct user) "users"
                from visits f where f.country = visits.country group by 1))
        ) as "DAU"
        from visits group by 1''').collect()
    assert sorted((r[0], float(r[1])) for r in out) == [
        ("India", 2.0), ("USA", 1.0), ("canada", 3.0)]


def test_correlated_subquery_with_left_filter(spark, visits_catalog):
    """CalciteCorrelatedQueryTest.java:174 testCorrelatedSubqueryWithLeftFilter
    (and :263 leftDirectAccessDisabled — same SQL, same rows)."""
    out = q(spark, visits_catalog, '''
        select country, ANY_VALUE(
            (select max("users") from (
                select floor(__time to day), count(*) "users"
                from visits f where f.country = visits.country group by 1))
        ) as "dailyVisits"
        from visits
        where city = 'B' and __time between '2021-01-01 01:00:00'
                                        AND '2021-01-02 23:59:59'
        group by 1''').collect()
    assert [(r[0], r[1]) for r in out] == [("canada", 4)]


def test_correlated_subquery_with_correlated_query_filter(spark, visits_catalog):
    """CalciteCorrelatedQueryTest.java:354
    testCorrelatedSubqueryWithCorrelatedQueryFilter (and :448 _Scan)."""
    out = q(spark, visits_catalog, '''
        select country, ANY_VALUE(
            (select max("users") from (
                select floor(__time to day), count(user) "users"
                from visits f
                where f.country = visits.country and f.city = 'A'
                group by 1))
        ) as "dailyVisits"
        from visits where city = 'B' group by 1''').collect()
    assert [(r[0], r[1]) for r in out] == [("canada", 2)]


# ---------------------------------------------------------------------------
# semi / anti joins (CalciteQueryTest.java)
# ---------------------------------------------------------------------------

def test_self_join(spark, foo_catalog):
    """CalciteQueryTest.java:5212 testSelfJoin."""
    assert q(spark, foo_catalog,
             "SELECT COUNT(*) AS c FROM druid.foo x, druid.foo y"
             ).first()["c"] == 36


def test_two_semi_joins_simultaneously(spark, foo_catalog):
    """CalciteQueryTest.java:14583 testTwoSemiJoinsSimultaneously."""
    out = q(spark, foo_catalog, '''
        SELECT dim1, COUNT(*) FROM foo
        WHERE dim1 IN ('abc', 'def')
        AND __time IN (SELECT MAX(__time) FROM foo WHERE cnt = 1)
        AND __time IN (SELECT MAX(__time) FROM foo WHERE cnt <> 2)
        GROUP BY 1''').collect()
    assert [tuple(r) for r in out] == [("abc", 1)]


def test_semi_and_anti_join_where_in_subquery(spark, foo_catalog):
    """CalciteQueryTest.java:14646
    testSemiAndAntiJoinSimultaneouslyUsingWhereInSubquery."""
    out = q(spark, foo_catalog, '''
        SELECT dim1, COUNT(*) FROM foo
        WHERE dim1 IN ('abc', 'def')
        AND __time IN (SELECT MAX(__time) FROM foo)
        AND __time NOT IN (SELECT MIN(__time) FROM foo)
        GROUP BY 1''').collect()
    assert [tuple(r) for r in out] == [("abc", 1)]


def test_semi_join_with_outer_time_extract_scan(spark, foo_catalog):
    """CalciteQueryTest.java:14537 testSemiJoinWithOuterTimeExtractScan —
    dim2 IN (subquery) compares whole MVD values (array equality here)."""
    out = q(spark, foo_catalog, '''
        SELECT dim1, EXTRACT(MONTH FROM __time) FROM druid.foo
        WHERE dim2 IN (
            SELECT dim2 FROM druid.foo WHERE dim1 = 'def'
        ) AND dim1 <> \'\'''').collect()
    assert [tuple(r) for r in out] == [("def", 1)]


def test_semi_join_outer_time_extract_aggregate_order_by(spark, foo_catalog):
    """CalciteQueryTest.java:14810
    testSemiJoinWithOuterTimeExtractAggregateWithOrderBy."""
    out = q(spark, foo_catalog, '''
        SELECT COUNT(DISTINCT dim1), EXTRACT(MONTH FROM __time) FROM druid.foo
        WHERE dim2 IN (
            SELECT dim2 FROM druid.foo WHERE dim1 = 'def'
        ) AND dim1 <> ''
        GROUP BY EXTRACT(MONTH FROM __time)
        ORDER BY EXTRACT(MONTH FROM __time)''').collect()
    assert [tuple(r) for r in out] == [(1, 1)]


def test_exact_count_distinct_of_semi_join_result(spark, foo_catalog):
    """CalciteQueryTest.java:8754 testExactCountDistinctOfSemiJoinResult
    (dim2 scalar view = dim2[0])."""
    out = q(spark, foo_catalog, '''
        SELECT COUNT(*) AS c FROM (
            SELECT DISTINCT dim2[0]
            FROM druid.foo
            WHERE SUBSTRING(dim2[0], 1, 1) IN (
                SELECT SUBSTRING(dim1, 1, 1) FROM druid.foo WHERE dim1 <> ''
            ) AND __time >= '2000-01-01' AND __time < '2002-01-01'
        )''').first()
    assert out["c"] == 2


def test_join_on_timeseries_with_floor_on_time(spark, foo_catalog):
    """CalciteQueryTest.java:612 testJoinOnTimeseriesWithFloorOnTime —
    tuple (TIME_FLOOR, m1) IN grouped subquery."""
    out = q(spark, foo_catalog, '''
        SELECT TIMESTAMP_TO_MILLIS(__time) AS t, m1, ANY_VALUE(dim3) AS d3
        FROM foo WHERE (TIME_FLOOR(__time, 'PT1H'), m1) IN
        (
            SELECT TIME_FLOOR(__time, 'PT1H') AS t1, MIN(m1) AS t2 FROM foo
            WHERE MV_CONTAINS(dim3, 'b')
              AND __time BETWEEN '1994-04-29 00:00:00' AND '2020-01-11 00:00:00'
            GROUP BY 1
        )
        GROUP BY 1, 2''').collect()
    assert sorted((r["t"], r["m1"], list(r["d3"])) for r in out) == [
        (946684800000, 1.0, ["a", "b"]),
        (946771200000, 2.0, ["b", "c"]),
    ]


def test_join_with_limit_before_joining(spark, foo_catalog):
    """CalciteQueryTest.java:526 testJoinWithLimitBeforeJoining
    (GROUP BY the scalar view of dim2)."""
    out = q(spark, foo_catalog, '''
        SELECT t1.dim2[0] AS d, AVG(t1.m2) AS a
        FROM (SELECT * FROM foo LIMIT 10) AS t1
        INNER JOIN foo AS t2 ON t1.m1 = t2.m1
        GROUP BY t1.dim2[0]''')
    assert rows(out, "d", "a") == [
        ("", 3.0), ("a", 2.5), ("abc", 5.0), (None, 4.0)]


# ---------------------------------------------------------------------------
# lookup joins (CalciteQueryTest.java)
# ---------------------------------------------------------------------------

def test_inner_join_cast_left(spark, foo_catalog):
    """CalciteQueryTest.java:11519 testInnerJoinCastLeft — CAST(m1 AS
    VARCHAR) renders '6.0', not '6': zero matching rows, like the ref."""
    out = q(spark, foo_catalog, '''
        SELECT foo.m1, l.k, l.v
        FROM foo
        INNER JOIN lookup.lookyloo l ON CAST(foo.m1 AS VARCHAR) = l.k''')
    assert out.count() == 0


def test_inner_join_cast_right(spark, foo_catalog):
    """CalciteQueryTest.java:11553 testInnerJoinCastRight."""
    out = q(spark, foo_catalog, '''
        SELECT foo.m1, l.k, l.v
        FROM foo
        INNER JOIN lookup.lookyloo l ON foo.m1 = CAST(l.k AS FLOAT)''')
    assert rows(out, "m1", "k", "v") == [(6.0, "6", "x6")]


def test_inner_join_mismatched_types(spark, foo_catalog):
    """CalciteQueryTest.java:11597 testInnerJoinMismatchedTypes — implicit
    numeric coercion of the lookup key."""
    out = q(spark, foo_catalog, '''
        SELECT foo.m1, l.k, l.v
        FROM foo
        INNER JOIN lookup.lookyloo l ON foo.m1 = l.k''')
    assert rows(out, "m1", "k", "v") == [(6.0, "6", "x6")]


def test_union_all_two_queries_left_query_is_join(spark, foo_catalog):
    """CalciteQueryTest.java:4405 testUnionAllTwoQueriesLeftQueryIsJoin."""
    out = q(spark, foo_catalog, '''
        (SELECT COUNT(*) FROM foo INNER JOIN lookup.lookyloo
            ON foo.dim1 = lookyloo.k)
        UNION ALL SELECT SUM(cnt) FROM foo''').collect()
    assert sorted(r[0] for r in out) == [1, 6]


def test_union_all_two_queries_right_query_is_join(spark, foo_catalog):
    """CalciteQueryTest.java:4446 testUnionAllTwoQueriesRightQueryIsJoin."""
    out = q(spark, foo_catalog, '''
        (SELECT SUM(cnt) FROM foo UNION ALL
         SELECT COUNT(*) FROM foo INNER JOIN lookup.lookyloo
            ON foo.dim1 = lookyloo.k)''').collect()
    assert sorted(r[0] for r in out) == [1, 6]


def test_union_all_two_queries_both_queries_are_join(spark, foo_catalog):
    """CalciteQueryTest.java:4486 testUnionAllTwoQueriesBothQueriesAreJoin."""
    out = q(spark, foo_catalog, '''
        (SELECT COUNT(*) FROM foo LEFT JOIN lookup.lookyloo
            ON foo.dim1 = lookyloo.k
         UNION ALL
         SELECT COUNT(*) FROM foo INNER JOIN lookup.lookyloo
            ON foo.dim1 = lookyloo.k)''').collect()
    assert sorted(r[0] for r in out) == [1, 6]


def test_select_on_lookup_using_left_join_operator(spark, foo_catalog):
    """CalciteQueryTest.java:11813 testSelectOnLookupUsingLeftJoinOperator."""
    out = q(spark, foo_catalog, '''
        SELECT dim1, lookyloo.*
        FROM foo LEFT JOIN lookup.lookyloo lookyloo ON foo.dim1 = lookyloo.k
        WHERE lookyloo.v <> 'xxx' OR lookyloo.v IS NULL''')
    assert rows(out, "dim1", "k", "v") == [
        ("", None, None), ("1", None, None), ("10.1", None, None),
        ("2", None, None), ("abc", "abc", "xabc"), ("def", None, None)]


def test_select_on_lookup_using_right_join_operator(spark, foo_catalog):
    """CalciteQueryTest.java:11850 testSelectOnLookupUsingRightJoinOperator."""
    out = q(spark, foo_catalog, '''
        SELECT dim1, lookyloo.*
        FROM foo RIGHT JOIN lookup.lookyloo lookyloo ON foo.dim1 = lookyloo.k
        WHERE lookyloo.v <> 'xxx' OR lookyloo.v IS NULL''')
    assert rows(out, "dim1", "k", "v") == [
        ("abc", "abc", "xabc"), (None, "6", "x6"), (None, "a", "xa"),
        (None, "nosuchkey", "mysteryvalue")]


def test_select_on_lookup_using_full_join_operator(spark, foo_catalog):
    """CalciteQueryTest.java:11885 testSelectOnLookupUsingFullJoinOperator."""
    out = q(spark, foo_catalog, '''
        SELECT dim1, m1, cnt, lookyloo.*
        FROM foo FULL JOIN lookup.lookyloo lookyloo ON foo.dim1 = lookyloo.k
        WHERE lookyloo.v <> 'xxx' OR lookyloo.v IS NULL''')
    assert rows(out, "dim1", "m1", "cnt", "k", "v") == [
        ("", 1.0, 1, None, None), ("1", 4.0, 1, None, None),
        ("10.1", 2.0, 1, None, None), ("2", 3.0, 1, None, None),
        ("abc", 6.0, 1, "abc", "xabc"), ("def", 5.0, 1, None, None),
        (None, None, None, "6", "x6"), (None, None, None, "a", "xa"),
        (None, None, None, "nosuchkey", "mysteryvalue")]


def test_count_distinct_of_lookup_using_join_operator(spark, foo_catalog):
    """CalciteQueryTest.java:11965 testCountDistinctOfLookupUsingJoinOperator
    (SQL-compatible branch: NULL doesn't count → 1)."""
    out = q(spark, foo_catalog, '''
        SELECT COUNT(DISTINCT lookyloo.v) AS c
        FROM foo LEFT JOIN lookup.lookyloo lookyloo
            ON foo.dim1 = lookyloo.k''').first()
    assert out["c"] == 1


def test_inner_join_two_lookups_to_table_using_numeric_column(spark, foo_catalog):
    """CalciteQueryTest.java:11039
    testInnerJoinTwoLookupsToTableUsingNumericColumn."""
    out = q(spark, foo_catalog, '''
        SELECT COUNT(*) AS c
        FROM foo
        INNER JOIN lookup.lookyloo l1 ON l1.k = foo.m1
        INNER JOIN lookup.lookyloo l2 ON l2.k = l1.k''').first()
    assert out["c"] == 1


def test_inner_join_table_lookup_lookup_with_filter_outer_limit(spark, foo_catalog):
    """CalciteQueryTest.java:10621
    testInnerJoinTableLookupLookupWithFilterWithOuterLimit (dim2[0])."""
    out = q(spark, foo_catalog, '''
        SELECT dim1
        FROM foo
        INNER JOIN lookup.lookyloo l ON foo.dim2[0] = l.k
        INNER JOIN lookup.lookyloo l2 ON foo.dim2[0] = l2.k
        WHERE l.v = 'xa'
        LIMIT 100''')
    assert rows(out, "dim1") == [("",), ("1",)]


def test_many_many_inner_join_on_many_many_lookup(spark, foo_catalog):
    """CalciteQueryTest.java:10789 testManyManyInnerJoinOnManyManyLookup —
    a 12-deep broadcast-join chain on the same lookup."""
    joins = "\n".join(
        f"INNER JOIN lookup.lookyloo l{i} ON foo.dim2[0] = l{i}.k"
        for i in range(1, 13))
    out = q(spark, foo_catalog, f'''
        SELECT dim1
        FROM foo
        {joins}
        WHERE l1.v = 'xa' ''')
    assert rows(out, "dim1") == [("",), ("1",)]


def test_filter_and_group_by_lookup_using_join_operator(spark, foo_catalog):
    """CalciteQueryTest.java:10422
    testFilterAndGroupByLookupUsingJoinOperator (dim2[0])."""
    out = q(spark, foo_catalog, '''
        SELECT lookyloo.k, COUNT(*) AS c
        FROM foo LEFT JOIN lookup.lookyloo lookyloo ON foo.dim2[0] = lookyloo.k
        WHERE lookyloo.v = 'xa'
        GROUP BY lookyloo.k''')
    assert rows(out, "k", "c") == [("a", 2)]


def test_group_by_inner_join_on_lookup_using_join_operator(spark, foo_catalog):
    """CalciteQueryTest.java:10510
    testGroupByInnerJoinOnLookupUsingJoinOperator."""
    out = q(spark, foo_catalog, '''
        SELECT lookyloo.v, COUNT(*) AS c
        FROM foo INNER JOIN lookup.lookyloo lookyloo ON foo.dim1 = lookyloo.k
        GROUP BY lookyloo.v''')
    assert rows(out, "v", "c") == [("xabc", 1)]


def test_filter_and_group_by_lookup_using_post_aggregation_join(spark, foo_catalog):
    """CalciteQueryTest.java:10460
    testFilterAndGroupByLookupUsingPostAggregationJoinOperator (dim2[0])."""
    out = q(spark, foo_catalog, '''
        SELECT base.d2, lookyloo.v, base.cnt FROM (
            SELECT dim2[0] AS d2, COUNT(*) cnt FROM foo GROUP BY dim2[0]
        ) base
        LEFT JOIN lookup.lookyloo lookyloo ON base.d2 = lookyloo.k
        WHERE lookyloo.v <> 'xa' OR lookyloo.v IS NULL''')
    assert rows(out, "d2", "v", "cnt") == [
        ("", None, 1), ("abc", "xabc", 1), (None, None, 2)]


# ---------------------------------------------------------------------------
# cross-table joins: foo + numfoo + lookyloo (CalciteQueryTest.java)
# ---------------------------------------------------------------------------

def test_inner_join_lookup_table_table(spark, full_catalog):
    """CalciteQueryTest.java:11156 testInnerJoinLookupTableTable."""
    out = q(spark, full_catalog, '''
        SELECT l.k, l.v, SUM(f.m1) AS sf, SUM(nf.m1) AS snf
        FROM lookup.lookyloo l
        INNER JOIN druid.foo f on f.dim1 = l.k
        INNER JOIN druid.numfoo nf on nf.dim1 = l.k
        GROUP BY 1, 2 ORDER BY 2''')
    assert rows(out, "k", "v", "sf", "snf") == [("abc", "xabc", 6.0, 6.0)]


def test_inner_join_lookup_table_table_chained(spark, full_catalog):
    """CalciteQueryTest.java:11238 testInnerJoinLookupTableTableChained."""
    out = q(spark, full_catalog, '''
        SELECT l.k, l.v, SUM(f.m1) AS sf, SUM(nf.m1) AS snf
        FROM lookup.lookyloo l
        INNER JOIN druid.foo f on f.dim1 = l.k
        INNER JOIN druid.numfoo nf on nf.dim1 = f.dim1
        GROUP BY 1, 2 ORDER BY 2''')
    assert rows(out, "k", "v", "sf", "snf") == [("abc", "xabc", 6.0, 6.0)]


def test_join_union_all_different_tables_with_mapping(spark, full_catalog):
    """CalciteQueryTest.java:3993 testJoinUnionAllDifferentTablesWithMapping
    (dim2[0])."""
    out = q(spark, full_catalog, '''
        SELECT
        dim1, dim2[0] AS d2, SUM(m1) AS s, COUNT(*) AS c
        FROM (SELECT dim1, dim2, m1 FROM foo
              UNION ALL SELECT dim1, dim2, m1 FROM numfoo)
        WHERE dim2[0] = 'a' OR dim2[0] = 'def'
        GROUP BY 1, 2''')
    assert rows(out, "dim1", "d2", "s", "c") == [
        ("", "a", 2.0, 2), ("1", "a", 8.0, 2)]


# ---------------------------------------------------------------------------
# SQL views (ViewManager / ViewSchema)
# ---------------------------------------------------------------------------

def test_view_select_and_join(spark, full_catalog):
    """BaseCalciteQueryTest.java:833-857 view registry + CalciteQueryTest
    testViewAndJoin — aview select and the cview join counted against foo
    (dim2[0] scalar view per the MVD note): 2 foo×2 numfoo cview rows × 2
    matching foo rows = 8, the reference's 8L."""
    from incubator_druid_spark.sql.functions import (drop_sql_view,
                                                     register_sql_view)
    register_sql_view(
        "aview",
        "SELECT SUBSTRING(dim1, 1, 1) AS dim1_firstchar FROM foo "
        "WHERE dim2[0] = 'a'")
    register_sql_view(
        "cview",
        "SELECT SUBSTRING(bar.dim1, 1, 1) AS dim1_firstchar, "
        "bar.dim2[0] as dim2, dnf.l2 as l2\n"
        "FROM (SELECT * from foo WHERE dim2[0] = 'a') as bar "
        "INNER JOIN druid.numfoo dnf ON bar.dim2[0] = dnf.dim2[0]")
    try:
        out = q(spark, full_catalog,
                "SELECT dim1_firstchar, COUNT(*) AS c FROM view.aview "
                "GROUP BY 1")
        # SQL-compatible mode: SUBSTRING('', 1, 1) is null, not '' —
        # SubstringDimExtractionFn.apply returns null when index >= length
        assert rows(out, "dim1_firstchar", "c") == [("1", 1), (None, 1)]
        assert q(spark, full_catalog, """
            SELECT COUNT(*) AS c FROM view.cview as a
            INNER JOIN druid.foo d on d.dim2[0] = a.dim2
            WHERE a.dim1_firstchar <> 'z'""").first()["c"] == 8
    finally:
        drop_sql_view("aview")
        drop_sql_view("cview")
