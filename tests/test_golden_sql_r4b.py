"""Round-4 CalciteQueryTest tranche B — count-star time/dim filter algebra
(complex disjoint intervals, NOT pushdown, degenerate bounds, string/
millisecond literals), nullable and filtered counts, exact count-distinct
through subqueries, expression aggregations, ANY_VALUE null semantics,
bitwise aggregates under grouping, numeric-dimension filters (sql/src/test/
java/org/apache/druid/sql/calcite/CalciteQueryTest.java; SQL-compatible
null mode)."""

import pytest

from incubator_druid_spark.sql.functions import druid_sql


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


@pytest.fixture(scope="module")
def numfoo1_catalog(spark, numfoo, tmp_path_factory):
    """numfoo as ONE parquet file so scan order == row order — the ANY_VALUE
    goldens encode the reference's single-segment row order, which a
    multi-file parquet read does not preserve (Spark packs files by size)."""
    from incubator_druid_spark.catalog import Catalog
    path = str(tmp_path_factory.mktemp("numfoo1_ds") / "numfoo.parquet")
    numfoo.coalesce(1).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("numfoo", path)
    return cat


def one(spark, cat, sql):
    return tuple(q(spark, cat, sql).first())


def test_count_star(spark, foo_catalog):
    """testCountStar."""
    assert one(spark, foo_catalog, "SELECT COUNT(*) AS c FROM foo") == (6,)


def test_count_star_with_not_time_filter(spark, foo_catalog):
    """testCountStarWithNotTimeFilter — NOT over a union of intervals."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE dim1 <> 'xxx' and not (
            (__time >= TIMESTAMP '2000-01-01 00:00:00'
             AND __time < TIMESTAMP '2001-01-01 00:00:00')
            OR (__time >= TIMESTAMP '2003-01-01 00:00:00'
                AND __time < TIMESTAMP '2004-01-01 00:00:00'))""") == (3,)


def test_count_star_with_time_and_dim_filter(spark, foo_catalog):
    """testCountStarWithTimeAndDimFilter."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE dim2 <> 'a'
          AND __time BETWEEN TIMESTAMP '2000-01-01 00:00:00'
                         AND TIMESTAMP '2000-12-31 23:59:59.999'""") == (2,)


def test_count_star_with_time_or_dim_filter(spark, foo_catalog):
    """testCountStarWithTimeOrDimFilter."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE dim2 <> 'a'
           OR __time BETWEEN TIMESTAMP '2000-01-01 00:00:00'
                         AND TIMESTAMP '2000-12-31 23:59:59.999'""") == (5,)


def test_count_star_with_complex_disjoint_time_filter(spark, foo_catalog):
    """testCountStarWithComplexDisjointTimeFilter — overlapping AND'd
    ranges reduce to their intersection inside an OR."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE dim2 = 'a' and (
          (__time >= TIMESTAMP '2000-01-01 00:00:00'
           AND __time < TIMESTAMP '2001-01-01 00:00:00')
          OR (
            (__time >= TIMESTAMP '2002-01-01 00:00:00'
             AND __time < TIMESTAMP '2003-05-01 00:00:00')
            and (__time >= TIMESTAMP '2002-05-01 00:00:00'
                 AND __time < TIMESTAMP '2004-01-01 00:00:00')
            and dim1 = 'abc'))""") == (1,)


def test_count_star_with_not_of_complex_disjoint_time_filter(spark,
                                                             foo_catalog):
    """testCountStarWithNotOfComplexDisjointTimeFilter."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE not (dim2 = 'a' and (
            (__time >= TIMESTAMP '2000-01-01 00:00:00'
             AND __time < TIMESTAMP '2001-01-01 00:00:00')
            OR (
              (__time >= TIMESTAMP '2002-01-01 00:00:00'
               AND __time < TIMESTAMP '2004-01-01 00:00:00')
              and (__time >= TIMESTAMP '2002-05-01 00:00:00'
                   AND __time < TIMESTAMP '2003-05-01 00:00:00')
              and dim1 = 'abc')))""") == (5,)


def test_count_star_with_not_of_degenerate_filter(spark, foo_catalog):
    """testCountStarWithNotOfDegenerateFilter — NOT(x > 'a' OR x < 'b')
    is unsatisfiable; the planner collapses it to an empty source."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE dim2 = 'a' and not (dim1 > 'a' OR dim1 < 'b')""") == (0,)


def test_count_star_with_bound_filter_simplify_on_metric(spark, foo_catalog):
    """testCountStarWithBoundFilterSimplifyOnMetric."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM foo WHERE 2.5 < m1 AND m1 < 3.5"
               ) == (1,)


def test_count_star_with_time_filter_using_string_literals(spark,
                                                           foo_catalog):
    """testCountStarWithTimeFilterUsingStringLiterals — strings implicitly
    cast to timestamps in several spellings."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE __time >= '2000-01-01 00:00:00' AND __time < '2001-01-01T00:00:00'
        OR __time >= '2001-02-01' AND __time < '2001-02-02'
        OR __time BETWEEN '2001-03-01' AND '2001-03-02'""") == (3,)


def test_count_star_with_time_millisecond_filters(spark, foo_catalog):
    """testCountStarWithTimeMillisecondFilters."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE __time = TIMESTAMP '2000-01-01 00:00:00.111'
        OR (__time >= TIMESTAMP '2000-01-01 00:00:00.888'
            AND __time < TIMESTAMP '2000-01-02 00:00:00.222')""") == (1,)


def test_count_star_with_long_column_filters_on_float_literals(spark,
                                                               foo_catalog):
    """testCountStarWithLongColumnFiltersOnFloatLiterals — float literal
    bounds over a LONG column."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM foo WHERE cnt > 1.1 and cnt < 100000001.0"
               ) == (0,)
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM foo WHERE cnt = 1.0") == (6,)
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM foo WHERE cnt = 100000001.0") == (0,)
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM foo WHERE cnt = 1.0 or cnt = 100000001.0"
               ) == (6,)


def test_count_star_extract_epoch_on_long_column(spark, foo_catalog):
    """testCountStarWithTimeFilterOnLongColumnUsingExtractEpoch — EXTRACT
    EPOCH over timestamp literals folds to constants compared against the
    LONG cnt column."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo WHERE
        cnt >= EXTRACT(EPOCH FROM TIMESTAMP '1970-01-01 00:00:00') * 1000
        AND cnt < EXTRACT(EPOCH FROM TIMESTAMP '1970-01-02 00:00:00') * 1000
        """) == (6,)


def test_count_nullable_column(spark, foo_catalog):
    """testCountNullableColumn — COUNT(dim2) skips the null MVD row and
    counts '' (sql mode: 4)."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(dim2) AS c FROM foo") == (4,)


def test_filtered_aggregation_with_not_in(spark, foo_catalog):
    """testFilteredAggregationWithNotIn — NOT IN inside FILTER; the dim2
    count also drops nulls (sql mode: 5, 3)."""
    assert one(spark, foo_catalog, """
        SELECT
        COUNT(*) filter(WHERE dim1 NOT IN ('1')) AS c1,
        COUNT(dim2) filter(WHERE dim1 NOT IN ('1')) AS c2
        FROM foo""") == (5, 3)


def test_count_distinct(spark, foo_catalog):
    """testCountDistinct (the unique_dim1 COMPLEX column term is covered by
    the hyperUnique interop goldens)."""
    assert one(spark, foo_catalog, """
        SELECT SUM(cnt) AS s, COUNT(distinct dim2) AS cd FROM foo
        """) == (6, 3)


def test_count_distinct_of_case_when(spark, foo_catalog):
    """testCountDistinctOfCaseWhen — filtered distinct via CASE."""
    assert one(spark, foo_catalog, """
        SELECT
        COUNT(DISTINCT CASE WHEN m1 >= 4 THEN m1 END) AS c1,
        COUNT(DISTINCT CASE WHEN m1 >= 4 THEN dim1 END) AS c2
        FROM foo""") == (3, 3)


def test_count_distinct_of_trim(spark, foo_catalog):
    """testCountDistinctOfTrim — TRIM BOTH syntax under distinct + filter
    ('' trims to '' which is excluded)."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(DISTINCT TRIM(BOTH ' ' FROM dim1)) AS c FROM foo
        WHERE TRIM(dim1) <> ''""") == (5,)


def test_exact_count_distinct_using_subquery(spark, foo_catalog):
    """testExactCountDistinctUsingSubquery — sql mode counts the null dim2
    group: (6, 4).  This SQL surface keeps MVDs as honest arrays (README
    compat table; unpivot grouping lives in the native layer), so the
    reference's VARCHAR-typed dim2 grouping is the element dim2[0] —
    identical here because every foo dim2 row has ≤1 element."""
    assert one(spark, foo_catalog, """
        SELECT SUM(cnt) AS s, COUNT(*) AS c
        FROM (SELECT dim2[0] AS d, SUM(cnt) AS cnt FROM foo
              GROUP BY dim2[0]) t
        """) == (6, 4)


def test_exact_count_distinct_with_grouping_and_other_aggregators(
        spark, foo_catalog):
    """testExactCountDistinctWithGroupingAndOtherAggregators — nested-query
    exact distinct; sql mode keeps null and '' groups apart.  (dim2[0]
    replaces the reference's VARCHAR-typed MVD grouping — see
    test_exact_count_distinct_using_subquery.)"""
    out = q(spark, foo_catalog, """
        SELECT dim2[0] AS dim2, SUM(cnt) AS s, COUNT(distinct dim1) AS cd
        FROM foo GROUP BY dim2[0] ORDER BY 1""").collect()
    got = sorted(((r["dim2"], r["s"], r["cd"]) for r in out),
                 key=lambda t: (t[0] is not None, t[0]))
    assert got == [(None, 2, 2), ("", 1, 1), ("a", 2, 2), ("abc", 1, 1)]


def test_expression_aggregations(spark, foo_catalog):
    """testExpressionAggregations — sums/max over expressions with log and
    modulo post-arithmetic."""
    import math
    r = one(spark, foo_catalog, """
        SELECT
          SUM(cnt * 3) AS a,
          LN(SUM(cnt) + SUM(m1)) AS b,
          MOD(SUM(cnt), 4) AS c,
          SUM(CHARACTER_LENGTH(CAST(cnt * 10 AS VARCHAR))) AS d,
          MAX(CHARACTER_LENGTH(dim2[0]) + LN(m1)) AS e
        FROM foo""")
    assert r[0] == 18
    assert r[1] == pytest.approx(3.295836866004329, rel=1e-12)
    assert r[2] == 2
    assert r[3] == 12
    assert r[4] == pytest.approx(3 + math.log(5.0), rel=1e-12)


def test_expression_counts(spark, numfoo_catalog):
    """testExpressionCounts — COUNT over string expressions drops nulls
    only (sql mode: 4, 4, 4; dim2[0] stands in for the reference's
    VARCHAR-typed MVD — honest-array SQL surface)."""
    assert one(spark, numfoo_catalog, """
        SELECT
         COUNT(reverse(dim2[0])) AS a,
         COUNT(left(dim2[0], 5)) AS b,
         COUNT(strpos(dim2[0], 'a')) AS c
        FROM numfoo""") == (4, 4, 4)


def test_expression_filtering_and_grouping_using_cast_to_long(spark,
                                                              foo_catalog):
    """testExpressionFilteringAndGroupingUsingCastToLong — integer division
    floors before re-multiplying.  (Calcite's integer `/` IS integer
    division; this SQL surface keeps Spark's true division for `/` and
    spells integer division DIV, Druid's own native-expression name.)"""
    out = q(spark, foo_catalog, """
        SELECT CAST(m1 AS BIGINT) DIV 2 * 2 AS d, COUNT(*) AS c
        FROM foo
        WHERE CAST(m1 AS BIGINT) DIV 2 * 2 > -1
        GROUP BY CAST(m1 AS BIGINT) DIV 2 * 2
        ORDER BY 1 DESC""").collect()
    assert [(r["d"], r["c"]) for r in out] == [(6, 1), (4, 2), (2, 2),
                                               (0, 1)]


def test_count_and_average_by_constant_virtual_column(spark, numfoo_catalog):
    """testCountAndAverageByConstantVirtualColumn — the filters pin dim1/l1
    to constants, so the planner substitutes constant virtual columns."""
    out = q(spark, numfoo_catalog, """
        SELECT dim5, COUNT(dim1) AS c, AVG(l1) AS a FROM numfoo
        WHERE dim1 = '10.1' AND l1 = 325323 GROUP BY dim5""").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["dim5"], r["c"]) == ("ab", 1) and r["a"] == 325323


def test_bitwise_aggregators_group_by(spark, numfoo_catalog):
    """testBitwiseAggregatorsGroupBy — BIT_AND/OR/XOR per dim2[0] (sql
    mode; the all-null l1 group aggregates to null).  Deviation: Druid
    0.22's BIT_AND folds from initial value 0, so every non-empty group
    ANDs to 0 (fixed in later Druid releases); this engine implements the
    fixed semantics — BIT_AND of {7} is 7, of {325323} is 325323."""
    out = q(spark, numfoo_catalog, """
        SELECT dim2[0] AS d, BIT_AND(l1) AS a, BIT_OR(l1) AS o,
               BIT_XOR(l1) AS x
        FROM numfoo GROUP BY 1""").collect()
    got = sorted(((r["d"], r["a"], r["o"], r["x"]) for r in out),
                 key=lambda t: (t[0] is not None, t[0]))
    assert got == [(None, 325323, 325323, 325323), ("", 0, 0, 0),
                   ("a", 7, 7, 7), ("abc", None, None, None)]


def test_any_aggregators_does_not_skip_nulls(spark, numfoo1_catalog):
    """testAnyAggregatorsDoesNotSkipNulls — ANY_VALUE returns the FIRST
    value seen including null (row 1 has null l2/d2/f2, dim1='')."""
    assert one(spark, numfoo1_catalog, """
        SELECT ANY_VALUE(dim1) AS a, ANY_VALUE(l2) AS b, ANY_VALUE(d2) AS c,
               ANY_VALUE(f2) AS d FROM numfoo""") == ("", None, None, None)


def test_any_aggregators_skip_nulls_with_filter(spark, numfoo1_catalog):
    """testAnyAggregatorsSkipNullsWithFilter — IS NOT NULL filters leave
    row 2 as the first candidate."""
    r = one(spark, numfoo1_catalog, """
        SELECT ANY_VALUE(dim1) AS a, ANY_VALUE(l2) AS b, ANY_VALUE(d2) AS c,
               ANY_VALUE(f2) AS d
        FROM numfoo
        WHERE dim1 IS NOT NULL AND l2 IS NOT NULL AND d2 IS NOT NULL
          AND f2 IS NOT NULL""")
    assert r[0] == "10.1" and r[1] == 325323
    assert r[2] == pytest.approx(1.7) and r[3] == pytest.approx(0.1)


def test_filter_double_dimension(spark, numfoo_catalog):
    """testFilterDoubleDimension."""
    assert one(spark, numfoo_catalog,
               "SELECT dim1 FROM numfoo WHERE d1 = 1.7 LIMIT 1") == ("10.1",)


def test_filter_float_dimension(spark, numfoo_catalog):
    """testFilterFloatDimension — float literal equality against a FLOAT
    column (exact at this value)."""
    assert one(spark, numfoo_catalog,
               "SELECT dim1 FROM numfoo WHERE f1 = CAST(0.1 AS FLOAT) LIMIT 1"
               ) == ("10.1",)


def test_filter_on_time_floor_comparison(spark, foo_catalog):
    """testFilterOnTimeFloorComparison — FLOOR TO MONTH inequality becomes
    an open-ended interval."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE FLOOR(__time TO MONTH) < TIMESTAMP '2000-02-01 00:00:00'
        """) == (3,)
