"""Round-5 CalciteQueryTest tranche N — join/lookup family: lookup joins
with grouped-subquery right sides, double lookup joins with value filters,
allow-nulls lookup grouping, pushdown-matches-nothing, comma joins with
mismatched key types, union-tables-on-lookup, and LOOKUP() over null input
(sql/src/test/java/org/apache/druid/sql/calcite/CalciteQueryTest.java;
SQL-compatible null mode; lookyloo = {a: xa, abc: xabc, nosuchkey:
mysteryvalue, 6: x6}).

MVD note: the reference types dim2 VARCHAR; these ports join/filter on the
element dim2[0] (identical on foo, max one element per row)."""

import pytest

from incubator_druid_spark.sql.functions import druid_sql


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def rows(df):
    return [tuple(r) for r in df.collect()]


def srows(df):
    return sorted(rows(df), key=lambda t: tuple((x is not None, x)
                                                for x in t))


def test_inner_join_query_of_lookup(spark, full_catalog):
    """testInnerJoinQueryOfLookup — grouped lookup subquery with
    SUBSTRING(k, 1, 1) keys and LATEST(v, 10): 'a'→'xabc' (last of
    xa/xabc in key order), joined against dim2."""
    got = srows(q(spark, full_catalog, """
        SELECT dim1, dim2[0] AS d2, t1.v AS v1, t1.v AS v2
        FROM foo
        INNER JOIN
          (SELECT SUBSTRING(k, 1, 1) k, LATEST(v, 10) v
           FROM lookup.lookyloo GROUP BY 1) t1
          ON foo.dim2[0] = t1.k"""))
    assert got == [("", "a", "xabc", "xabc"), ("1", "a", "xabc", "xabc")]


def test_inner_join_table_lookup_lookup_with_filter_without_limit(
        spark, full_catalog):
    """testInnerJoinTableLookupLookupWithFilterWithoutLimit — two lookup
    joins on the same key, filter on the first join's value."""
    got = srows(q(spark, full_catalog, """
        SELECT dim1 FROM foo
        INNER JOIN lookup.lookyloo l ON foo.dim2[0] = l.k
        INNER JOIN lookup.lookyloo l2 ON foo.dim2[0] = l2.k
        WHERE l.v = 'xa'"""))
    assert got == [("",), ("1",)]


def test_inner_join_table_lookup_lookup_all_columns(spark, full_catalog):
    """testInnerJoinTableLookupLookupWithFilterWithoutLimitWithAllColumns —
    same shape, full row projection (m1/m2/cnt carried through)."""
    got = srows(q(spark, full_catalog, """
        SELECT __time, cnt, dim1, dim2[0] AS d2, m1, m2 FROM foo
        INNER JOIN lookup.lookyloo l ON foo.dim2[0] = l.k
        INNER JOIN lookup.lookyloo l2 ON foo.dim2[0] = l2.k
        WHERE l.v = 'xa'""").select("cnt", "dim1", "d2", "m1", "m2"))
    assert got == [(1, "", "a", 1.0, 1.0), (1, "1", "a", 4.0, 4.0)]


def test_filter_and_group_by_lookup_join_allow_nulls(spark, full_catalog):
    """testFilterAndGroupByLookupUsingJoinOperatorAllowNulls — <> with an
    explicit IS NULL escape keeps the unmatched rows."""
    got = srows(q(spark, full_catalog, """
        SELECT lookyloo.v AS v, COUNT(*) AS c
        FROM foo LEFT JOIN lookup.lookyloo ON foo.dim2[0] = lookyloo.k
        WHERE lookyloo.v <> 'xa' OR lookyloo.v IS NULL
        GROUP BY lookyloo.v"""))
    assert got == [(None, 3), ("xabc", 1)]


def test_filter_lookup_join_value_filter_matches_nothing(
        spark, full_catalog):
    """testFilterAndGroupByLookupUsingJoinOperatorWithValueFilterPushdown
    MatchesNothig [sic] — no lookup value is '123'."""
    assert rows(q(spark, full_catalog, """
        SELECT lookyloo.k AS k, COUNT(*) AS c
        FROM foo LEFT JOIN lookup.lookyloo ON foo.dim2[0] = lookyloo.k
        WHERE lookyloo.v = '123' GROUP BY lookyloo.k""")) == []


def test_lookup_with_null(spark, full_catalog):
    """testLookupWithNull — LOOKUP(NULL) is NULL; two foo rows have null
    dim2 in sql mode (the [] row and the NULL row read as no value)."""
    got = rows(q(spark, full_catalog, """
        SELECT dim2[0] AS d2, lookup(dim2[0], 'lookyloo') AS lk
        FROM foo WHERE dim2[0] IS NULL"""))
    assert got == [(None, None), (None, None)]


def test_comma_join_table_lookup_table_mismatched_types(
        spark, full_catalog):
    """testCommaJoinTableLookupTableMismatchedTypes (apache/druid#9646) —
    numeric cnt (always 1) never equals any lookup key castable to long,
    so the three-way comma join yields zero rows; COUNT is 0."""
    # lookyloo has key '6' — CAST('6' AS LONG) = 6 != cnt 1 → empty
    got = q(spark, full_catalog, """
        SELECT COUNT(*) AS c
        FROM foo, lookup.lookyloo l, numfoo
        WHERE foo.cnt = l.k AND l.k = numfoo.cnt""").first()
    assert got["c"] == 0


def test_join_union_tables_on_lookup(spark, full_catalog):
    """testJoinUnionTablesOnLookup — UNION ALL of foo+numfoo dim2 (12
    rows), left-joined to the lookup, v <> 'xa' keeps only xabc matches;
    sql-mode matcher keeps the filter two-valued (nulls drop because the
    JOIN value is null, and Druid's WHERE v <> 'xa' on the joined column
    drops nulls — expected xabc rows only, plus the null group from
    unmatched rows is EXCLUDED by the <> matcher on a null v... the
    reference expects (null, 6), (xabc, 2): its <> matcher MATCHES null
    v rows (not(selector) semantics)."""
    got = srows(q(spark, full_catalog, """
        SELECT lookyloo.v AS v, COUNT(*) AS c
        FROM (SELECT dim2[0] AS dim2 FROM foo
              UNION ALL SELECT dim2[0] AS dim2 FROM numfoo) u
        LEFT JOIN lookup.lookyloo ON u.dim2 = lookyloo.k
        WHERE lookyloo.v <> 'xa'
        GROUP BY lookyloo.v"""))
    assert got == [(None, 6), ("xabc", 2)]
