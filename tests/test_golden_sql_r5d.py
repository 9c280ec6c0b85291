"""Round-5 CalciteQueryTest tranche O — planner-refusal and validation
family.  The reference REFUSES these queries (assertQueryIsUnplannable /
SqlPlanningException); this engine's documented stance (tranche-H
precedent) is to COMPUTE the well-defined ones as SQL supersets and to
raise a clear error where the query is genuinely ill-typed
(sql/src/test/java/org/apache/druid/sql/calcite/CalciteQueryTest.java;
SQL-compatible null mode; lookyloo = {a: xa, abc: xabc, nosuchkey:
mysteryvalue, 6: x6})."""

import pytest

from incubator_druid_spark.sql.functions import druid_sql


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def rows(df):
    return [tuple(r) for r in df.collect()]


def srows(df):
    return sorted(rows(df), key=lambda t: tuple((x is not None, x)
                                                for x in t))


def test_unplannable_order_scan_by_dimension(spark, full_catalog):
    """testUnplannableQueries #1 — Druid cannot ORDER a scan by a
    dimension; superset: computed."""
    got = rows(q(spark, full_catalog,
                 "SELECT dim1 FROM druid.foo ORDER BY dim1"))
    assert got == [("",), ("1",), ("10.1",), ("2",), ("abc",), ("def",)]


def test_unplannable_non_equi_lookup_join(spark, full_catalog):
    """testUnplannableQueries #2 — non-equi (<>) lookup join; superset:
    computed with three-valued <> (null dim2 rows drop).  'a'x2 → 3 keys
    each, '' → 4 keys, 'abc' → 3 keys = 13 rows."""
    got = q(spark, full_catalog, """
        SELECT foo.dim1, foo.dim2[0] AS d2, l.k, l.v
        FROM foo INNER JOIN lookup.lookyloo l ON foo.dim2[0] <> l.k""")
    assert got.count() == 13
    ks = {r["k"] for r in got.collect() if r["d2"] == "abc"}
    assert ks == {"a", "nosuchkey", "6"}


def test_unplannable_function_condition_lookup_join(spark, full_catalog):
    """testUnplannableQueries #3 — CHARACTER_LENGTH(dim2 || k) > 3 join
    condition; superset: computed (concat with null drops the row)."""
    got = q(spark, full_catalog, """
        SELECT foo.dim1, foo.dim2[0] AS d2, l.k, l.v
        FROM foo INNER JOIN lookup.lookyloo l
          ON CHARACTER_LENGTH(foo.dim2[0] || l.k) > 3""")
    assert got.count() == 9


def test_unplannable_two_exact_count_distincts(spark, foo_catalog):
    """testUnplannableTwoExactCountDistincts — Druid (HLL disabled) cannot
    plan two exact distincts in one grouped query; superset: computed
    (sql mode keeps null and '' apart)."""
    got = srows(q(spark, foo_catalog, """
        SELECT dim2[0] AS d2, COUNT(distinct dim1) AS c1,
               COUNT(distinct dim2[0]) AS c2
        FROM druid.foo GROUP BY dim2[0]"""))
    assert got == [(None, 2, 0), ("", 1, 1), ("a", 2, 1), ("abc", 1, 1)]


def test_validation_regexp_like_non_literal_pattern(spark, foo_catalog):
    """testValidationErrorNonLiteralIllegal — the reference demands a
    literal pattern; superset: Spark evaluates per-row patterns (the ''
    pattern matches anything, no other dim1 value matches 'x')."""
    got = rows(q(spark, foo_catalog, """
        SELECT dim1, REGEXP_LIKE('x', dim1) AS m FROM foo ORDER BY dim1"""))
    assert got == [("", True), ("1", False), ("10.1", False),
                   ("2", False), ("abc", False), ("def", False)]


def test_validation_regexp_like_null_literal(spark, foo_catalog):
    """testValidationErrorNullLiteralIllegal — reference: 'Illegal use of
    NULL'; superset: NULL pattern yields NULL."""
    assert rows(q(spark, foo_catalog,
                  "SELECT REGEXP_LIKE('x', NULL) AS m FROM foo LIMIT 1")) \
        == [(None,)]


def test_count_star_with_invalid_time_string_literal(spark, foo_catalog):
    """testCountStarWithTimeFilterUsingStringLiteralsInvalid — the
    reference raises 'Illegal TIMESTAMP constant'; this engine's
    non-literal cast path yields an un-castable timestamp → empty filter
    (count 0) rather than a refusal."""
    got = q(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE __time >= 'z2000-01-01 00:00:00'
          AND __time < '2001-01-01 00:00:00'""").first()
    assert got["c"] == 0


def test_time_extract_with_too_few_arguments(spark, foo_catalog):
    """testTimeExtractWithTooFewArguments — both engines refuse: the
    reference with a validation error, this engine with Spark's
    wrong-argument-count analysis error."""
    with pytest.raises(Exception, match="(?i)TIME_EXTRACT|argument"):
        q(spark, foo_catalog,
          "SELECT TIME_EXTRACT(__time) FROM druid.foo").collect()


def test_join_on_constant_should_fail(spark, foo_catalog):
    """testJoinOnConstantShouldFail — Druid refuses a constant-only join
    condition; superset: computed as the standard SQL left join (the
    '10.1' row matches all 6 right rows, other rows null-extend)."""
    got = q(spark, foo_catalog, """
        SELECT t1.dim1 from foo as t1
        LEFT JOIN foo as t2 on t1.dim1 = '10.1'""")
    vals = [r["dim1"] for r in got.collect()]
    assert len(vals) == 11 and vals.count("10.1") == 6


def test_join_on_multi_valued_column_raises(spark, full_catalog):
    """testJoinOnMultiValuedColumnShouldThrowException — joining on an MVD
    is refused by both engines (here: honest array type cannot equi-join a
    string key)."""
    with pytest.raises(Exception):
        q(spark, full_catalog, """
            SELECT dim3, l.v from druid.foo f
            inner join lookup.lookyloo l on f.dim3 = l.k""").collect()


def test_union_all_tables_column_count_mismatch(spark, full_catalog):
    """testUnionAllTablesColumnCountMismatch — both engines refuse: SELECT *
    over tables with different column counts cannot UNION ALL."""
    with pytest.raises(Exception, match="(?i)column|union"):
        q(spark, full_catalog, """
            SELECT dim1, dim2, SUM(m1), COUNT(*)
            FROM (SELECT * FROM foo UNION ALL SELECT * FROM numfoo)
            WHERE dim2 = 'a' OR dim2 = 'def' GROUP BY 1, 2""").collect()


def test_approx_count_distinct_when_hll_disabled(spark, foo_catalog):
    """testApproxCountDistinctWhenHllDisabled — the cardinality fallback
    counts dim2's VALUE universe: {a, '', abc} = 3."""
    assert q(spark, foo_catalog,
             "SELECT APPROX_COUNT_DISTINCT(dim2) AS c FROM druid.foo") \
        .first()["c"] == 3


def test_exact_count_distinct_subquery_on_union_all_tables(
        spark, foo_catalog):
    """testExactCountDistinctUsingSubqueryOnUnionAllTables — doubled foo,
    grouped by dim2 (4 groups in sql mode: null, '', a, abc)."""
    assert tuple(q(spark, foo_catalog, """
        SELECT SUM(cnt) AS s, COUNT(*) AS c FROM (
          SELECT dim2[0] AS dim2, SUM(cnt) AS cnt
          FROM (SELECT * FROM druid.foo UNION ALL SELECT * FROM druid.foo)
          GROUP BY dim2[0])""").first()) == (12, 4)
