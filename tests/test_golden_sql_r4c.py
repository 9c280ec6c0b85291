"""Round-4 CalciteQueryTest tranche C — typed single-column grouping,
string-length/extract/format grouping, floor-time orderings, select
projections with SUBSTRING null semantics, having on sums/ratios/exact
distinct, null numeric filters, empty/false-filter groups, LATEST families,
limit+offset paging (sql/src/test/java/org/apache/druid/sql/calcite/
CalciteQueryTest.java; SQL-compatible null mode).

MVD note: this SQL surface keeps MVDs as honest arrays (README compat
table); where the reference groups the VARCHAR-typed dim2, these ports
group the element dim2[0] — identical on foo/numfoo whose dim2 rows hold
at most one element."""

import pytest

from incubator_druid_spark.sql.functions import druid_sql


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def one(spark, cat, sql):
    return tuple(q(spark, cat, sql).first())


def nsort(rows_, idx=0):
    return sorted(rows_, key=lambda t: (t[idx] is not None, t[idx]))


def test_group_by_long(spark, foo_catalog):
    """testGroupByLong."""
    assert [tuple(r) for r in q(spark, foo_catalog,
            "SELECT cnt AS c, COUNT(*) AS n FROM foo GROUP BY cnt"
            ).collect()] == [(1, 6)]


def test_group_by_float(spark, foo_catalog):
    """testGroupByFloat / testGroupByDouble — typed numeric grouping."""
    got = sorted(tuple(r) for r in q(spark, foo_catalog,
                 "SELECT m1 AS m, COUNT(*) AS n FROM foo GROUP BY m1"
                 ).collect())
    assert got == [(float(i), 1) for i in range(1, 7)]
    got2 = sorted(tuple(r) for r in q(spark, foo_catalog,
                  "SELECT m2 AS m, COUNT(*) AS n FROM foo GROUP BY m2"
                  ).collect())
    assert got2 == [(float(i), 1) for i in range(1, 7)]


def test_group_by_string_length(spark, foo_catalog):
    """testGroupByStringLength."""
    got = sorted(tuple(r) for r in q(spark, foo_catalog, """
        SELECT CHARACTER_LENGTH(dim1) AS l, COUNT(*) AS n
        FROM foo GROUP BY CHARACTER_LENGTH(dim1)""").collect())
    assert got == [(0, 1), (1, 2), (3, 2), (4, 1)]


def test_group_by_extract_year(spark, foo_catalog):
    """testGroupByExtractYear."""
    out = q(spark, foo_catalog, """
        SELECT EXTRACT(YEAR FROM __time) AS y, SUM(cnt) AS s
        FROM foo GROUP BY EXTRACT(YEAR FROM __time) ORDER BY 1""").collect()
    assert [tuple(r) for r in out] == [(2000, 3), (2001, 3)]


def test_group_by_format_year_and_month(spark, foo_catalog):
    """testGroupByFormatYearAndMonth — TIME_FORMAT in mixed case."""
    out = q(spark, foo_catalog, """
        SELECT TIME_FORMAt(__time, 'yyyy MM') AS ym, SUM(cnt) AS s
        FROM foo GROUP BY TIME_FORMAt(__time, 'yyyy MM') ORDER BY 1
        """).collect()
    assert [tuple(r) for r in out] == [("2000 01", 3), ("2001 01", 3)]


def test_group_by_floor_with_order_by(spark, foo_catalog):
    """testGroupByFloorWithOrderBy — floor of a cast; nulls last under
    DESC."""
    out = q(spark, foo_catalog, """
        SELECT floor(CAST(dim1 AS float)) AS fl, COUNT(*) AS n
        FROM foo GROUP BY floor(CAST(dim1 AS float)) ORDER BY fl DESC
        """).collect()
    assert [tuple(r) for r in out] == [(10.0, 1), (2.0, 1), (1.0, 1),
                                       (None, 3)]


def test_group_by_floor_time_and_other_dimension_with_order_by(
        spark, foo_catalog):
    """testGroupByFloorTimeAndOneOtherDimensionWithOrderBy — sql mode keeps
    the null and '' dim2 groups distinct; nulls first under ASC."""
    out = q(spark, foo_catalog, """
        SELECT floor(__time TO year) AS t, dim2[0] AS d, COUNT(*) AS n
        FROM foo GROUP BY floor(__time TO year), dim2[0]
        ORDER BY floor(__time TO year), dim2[0], COUNT(*) DESC""").collect()
    assert [(str(r["t"])[:4], r["d"], r["n"]) for r in out] == [
        ("2000", None, 1), ("2000", "", 1), ("2000", "a", 1),
        ("2001", None, 1), ("2001", "a", 1), ("2001", "abc", 1)]


def test_group_by_time_and_other_dimension(spark, foo_catalog):
    """testGroupByTimeAndOtherDimension — grouping over a subquery's
    time-floor projection."""
    out = q(spark, foo_catalog, """
        SELECT dim2[0] AS d, gran, SUM(cnt) AS s
        FROM (SELECT FLOOR(__time TO MONTH) AS gran, dim2, cnt FROM foo) x
        GROUP BY dim2[0], gran ORDER BY dim2[0], gran""").collect()
    assert [(r["d"], str(r["gran"])[:7], r["s"]) for r in out] == [
        (None, "2000-01", 1), (None, "2001-01", 1), ("", "2000-01", 1),
        ("a", "2000-01", 1), ("a", "2001-01", 1), ("abc", "2001-01", 1)]


def test_group_by_single_column_descending(spark, foo_catalog):
    """testGroupBySingleColumnDescendingNoTopN."""
    out = q(spark, foo_catalog,
            "SELECT dim1 FROM foo GROUP BY dim1 ORDER BY dim1 DESC"
            ).collect()
    assert [r["dim1"] for r in out] == ["def", "abc", "2", "10.1", "1", ""]


def test_group_by_limit_wrapping_order_by_agg(spark, foo_catalog):
    """testGroupByLimitWrappingOrderByAgg — ORDER BY an aggregate ordinal
    (all groups count 1; the full set is returned)."""
    out = q(spark, foo_catalog, """
        SELECT dim1, dim2[0] AS d2, COUNT(*) AS n FROM foo
        GROUP BY 1, 2 ORDER BY 3 DESC""").collect()
    assert len(out) == 6 and all(r["n"] == 1 for r in out)


def test_group_by_with_select_projections(spark, foo_catalog):
    """testGroupByWithSelectProjections — SUBSTRING beyond the string's
    length is NULL in sql mode, not ''."""
    out = q(spark, foo_catalog, """
        SELECT dim1, SUBSTRING(dim1, 2) AS s FROM foo GROUP BY dim1
        ORDER BY dim1""").collect()
    assert [tuple(r) for r in out] == [
        ("", None), ("1", None), ("10.1", "0.1"), ("2", None),
        ("abc", "bc"), ("def", "ef")]


def test_group_by_with_select_and_order_by_projections(spark, foo_catalog):
    """testGroupByWithSelectAndOrderByProjections — ordering on an
    expression not in the select list."""
    out = q(spark, foo_catalog, """
        SELECT dim1, SUBSTRING(dim1, 2) AS s FROM foo GROUP BY dim1
        ORDER BY CHARACTER_LENGTH(dim1) DESC, dim1""").collect()
    assert [tuple(r) for r in out] == [
        ("10.1", "0.1"), ("abc", "bc"), ("def", "ef"), ("1", None),
        ("2", None), ("", None)]


def test_left_right_string_operators(spark, foo_catalog):
    """testLeftRightStringOperators — LEFT/RIGHT keep '' (unlike
    SUBSTRING)."""
    out = q(spark, foo_catalog, """
        SELECT dim1, LEFT(dim1, 2) AS l, RIGHT(dim1, 2) AS r
        FROM foo GROUP BY dim1 ORDER BY dim1""").collect()
    assert [tuple(r) for r in out] == [
        ("", "", ""), ("1", "1", "1"), ("10.1", "10", ".1"),
        ("2", "2", "2"), ("abc", "ab", "bc"), ("def", "de", "ef")]


def test_having_on_float_sum(spark, foo_catalog):
    """testHavingOnFloatSum."""
    out = q(spark, foo_catalog, """
        SELECT dim1, CAST(SUM(m1) AS FLOAT) AS m1_sum FROM foo
        GROUP BY dim1 HAVING CAST(SUM(m1) AS FLOAT) > 1
        ORDER BY dim1""").collect()
    assert [tuple(r) for r in out] == [
        ("1", 4.0), ("10.1", 2.0), ("2", 3.0), ("abc", 6.0), ("def", 5.0)]


def test_having_on_ratio(spark, foo_catalog):
    """testHavingOnRatio — a filtered-count ratio in HAVING; dim2 <> 'a'
    is the native selector's negation, so the [] and null rows match."""
    out = q(spark, foo_catalog, """
        SELECT dim1, COUNT(*) FILTER(WHERE dim2 <> 'a')/COUNT(*) AS ratio
        FROM foo GROUP BY dim1
        HAVING COUNT(*) FILTER(WHERE dim2 <> 'a')/COUNT(*) = 1
        ORDER BY dim1""").collect()
    assert [(r["dim1"], r["ratio"]) for r in out] == [
        ("10.1", 1), ("2", 1), ("abc", 1), ("def", 1)]


def test_having_on_exact_count_distinct(spark, foo_catalog):
    """testHavingOnExactCountDistinct — sql mode: the groups with more
    than one distinct m1 are null (rows 2 and 6) and 'a' (rows 1 and 4)."""
    out = q(spark, foo_catalog, """
        SELECT dim2[0] AS d, COUNT(DISTINCT m1) AS cd FROM foo
        GROUP BY dim2[0] HAVING COUNT(DISTINCT m1) > 1""").collect()
    assert nsort([tuple(r) for r in out]) == [(None, 2), ("a", 2)]


def test_group_by_nothing_with_literally_false_filter(spark, foo_catalog):
    """testGroupByNothingWithLiterallyFalseFilter — global aggregate over
    nothing: count 0, null max."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c, MAX(cnt) AS m FROM foo WHERE 1 = 0"
               ) == (0, None)


def test_group_by_one_column_with_literally_false_filter(spark, foo_catalog):
    """testGroupByOneColumnWithLiterallyFalseFilter — WITH grouping the
    result is empty."""
    assert q(spark, foo_catalog, """
        SELECT COUNT(*) AS c, MAX(cnt) AS m FROM foo WHERE 1 = 0
        GROUP BY dim1""").collect() == []


def test_group_by_with_filter_matching_nothing(spark, foo_catalog):
    """testGroupByWithFilterMatchingNothing."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c, MAX(cnt) AS m FROM foo WHERE dim1 = 'foobar'
        """) == (0, None)


def test_group_by_with_group_by_empty(spark, foo_catalog):
    """testGroupByWithGroupByEmpty — GROUP BY () is the global group."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c, SUM(cnt) AS s, MIN(cnt) AS m FROM foo
        GROUP BY ()""") == (6, 6, 1)


def test_group_by_expression_aliased_as_original_column_name(spark,
                                                             foo_catalog):
    """testGroupByExpressionAliasedAsOriginalColumnName — an alias shadowing
    __time."""
    out = q(spark, foo_catalog, """
        SELECT FLOOR(__time TO MONTH) AS __time, COUNT(*) AS c
        FROM foo GROUP BY FLOOR(__time TO MONTH) ORDER BY 1""").collect()
    assert [(str(r["__time"])[:7], r["c"]) for r in out] == [
        ("2000-01", 3), ("2001-01", 3)]


def test_group_by_and_order_by_ordinal_of_alias(spark, foo_catalog):
    """testGroupByAndOrderByOrdinalOfAlias / testGroupByAndOrderByAlias."""
    assert [tuple(r) for r in q(spark, foo_catalog, """
        SELECT cnt AS theCnt, COUNT(*) AS c FROM foo
        GROUP BY 1 ORDER BY 1 ASC""").collect()] == [(1, 6)]
    assert [tuple(r) for r in q(spark, foo_catalog, """
        SELECT cnt AS theCnt, COUNT(*) AS c FROM foo
        GROUP BY theCnt ORDER BY theCnt ASC""").collect()] == [(1, 6)]


@pytest.mark.parametrize("col", ["l1", "d1", "f1"])
def test_null_numeric_filter(spark, numfoo_catalog, col):
    """testNullLongFilter / testNullDoubleFilter / testNullFloatFilter —
    sql mode: 3 null rows each."""
    assert one(spark, numfoo_catalog,
               f"SELECT COUNT(*) AS c FROM numfoo WHERE {col} IS NULL"
               ) == (3,)


def test_long_predicate_filter_nulls(spark, numfoo_catalog):
    """testLongPredicateFilterNulls — nulls never match a numeric bound."""
    assert one(spark, numfoo_catalog,
               "SELECT COUNT(*) AS c FROM numfoo WHERE l1 > 3") == (2,)


def test_null_float_top_n(spark, numfoo_catalog):
    """testNullFloatTopN — DESC numeric grouping puts the null group
    last."""
    out = q(spark, numfoo_catalog, """
        SELECT f1, COUNT(*) AS c FROM numfoo GROUP BY f1
        ORDER BY f1 DESC LIMIT 10""").collect()
    assert [tuple(r) for r in out] == [(1.0, 1),
                                       (pytest.approx(0.1), 1),
                                       (0.0, 1), (None, 3)]


def test_min_max_avg_daily_count_with_limit(spark, foo_catalog):
    """testMinMaxAvgDailyCountWithLimit — aggregate over a daily-count
    subquery with TIME_EXTRACT EPOCH of the max bucket."""
    r = one(spark, foo_catalog, """
        SELECT * FROM (
          SELECT max(cnt) AS mx, min(cnt) AS mn, avg(cnt) AS av,
                 TIME_EXTRACT(max(t), 'EPOCH') AS last_time,
                 count(1) AS num_days FROM (
              SELECT TIME_FLOOR(__time, 'P1D') AS t, count(1) AS cnt
              FROM foo GROUP BY 1
          ) tt
        ) ttt LIMIT 1""")
    assert (r[0], r[1], r[3], r[4]) == (1, 1, 978480000, 6)
    assert r[2] == 1


def test_latest_aggregators(spark, foo_catalog):
    """testLatestAggregators — LATEST over columns and expressions (foo's
    timestamps are distinct, so the max-__time row is row 6)."""
    r = one(spark, foo_catalog, """
        SELECT LATEST(cnt) AS a, LATEST(m1) AS b, LATEST(dim1, 10) AS c,
               LATEST(cnt + 1) AS d, LATEST(m1 + 1) AS e,
               LATEST(dim1 || CAST(cnt AS VARCHAR), 10) AS f
        FROM foo""")
    assert r == (1, 6.0, "abc", 2, 7.0, "abc1")


def test_timeseries_with_limit_and_offset(spark, foo_catalog):
    """testTimeseriesWithLimitAndOffset — paging over month buckets."""
    out = q(spark, foo_catalog, """
        SELECT gran, SUM(cnt) AS s
        FROM (SELECT floor(__time TO month) AS gran, cnt FROM foo) x
        GROUP BY gran ORDER BY gran LIMIT 2 OFFSET 1""").collect()
    assert [(str(r["gran"])[:7], r["s"]) for r in out] == [("2001-01", 3)]
