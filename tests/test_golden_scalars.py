"""Golden SQL tests — scalar-function / null-numeric / HAVING / CASE tranche
of CalciteQueryTest.java, SQL-compatible null mode, over foo/numfoo.

numfoo nullable numerics (rows 4-6 null): l1 = 7, 325323, 0;
d1 = 1.0, 1.7, 0.0; f1 = 1.0, 0.1, 0.0.  dim2 scalar view = dim2[0]
(per the MVD note in test_golden_sql.py).
"""

import pytest

from incubator_druid_spark.sql.functions import druid_sql
from tests.conftest import rows


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def test_bitwise_expressions(spark, numfoo_catalog):
    """CalciteQueryTest.java:903 testBitwiseExpressions — incl. the IEEE-754
    bit reinterpretation pair (BitwiseOperatorConversions)."""
    out = q(spark, numfoo_catalog, """
        SELECT
        BITWISE_AND(l1, l2) AS a, BITWISE_OR(l1, l2) AS o,
        BITWISE_XOR(l1, l2) AS x, BITWISE_COMPLEMENT(l1) AS c,
        BITWISE_SHIFT_LEFT(l1, 2) AS sl, BITWISE_SHIFT_RIGHT(l1, 2) AS sr,
        BITWISE_CONVERT_DOUBLE_TO_LONG_BITS(d1) AS d2l,
        BITWISE_CONVERT_LONG_BITS_TO_DOUBLE(l1) AS l2d
        FROM numfoo ORDER BY __time""").collect()
    got = [tuple(r) for r in out]
    assert got[0] == (None, None, None, -8, 28, 1, 4607182418800017408,
                      3.5e-323)
    assert got[1] == (325323, 325323, 0, -325324, 1301292, 81330,
                      4610334938539176755, 1.60731e-318)
    assert got[2] == (0, 0, 0, -1, 0, 0, 0, 0.0)
    assert got[3] == got[4] == got[5] == (None,) * 8


def test_earliest_aggregators_numeric_nulls(spark, numfoo_catalog):
    """CalciteQueryTest.java:2607 testEarliestAggregatorsNumericNulls."""
    r = q(spark, numfoo_catalog, """
        SELECT EARLIEST(l1) AS l, EARLIEST(d1) AS d, EARLIEST(f1) AS f
        FROM druid.numfoo""").first()
    assert (r["l"], r["d"], r["f"]) == (7, 1.0, 1.0)


def test_latest_aggregators_numeric_null(spark, numfoo_catalog):
    """CalciteQueryTest.java:2636 testLatestAggregatorsNumericNull — the last
    row's numerics are null; LATEST returns them (no null-skipping)."""
    r = q(spark, numfoo_catalog, """
        SELECT LATEST(l1) AS l, LATEST(d1) AS d, LATEST(f1) AS f
        FROM druid.numfoo""").first()
    assert (r["l"], r["d"], r["f"]) == (None, None, None)


def test_first_latest_aggregators_skip_nulls(spark, numfoo_catalog):
    """CalciteQueryTest.java:2665 testFirstLatestAggregatorsSkipNulls —
    EARLIEST(dim1, maxBytes): the sizing hint is dropped."""
    r = q(spark, numfoo_catalog, """
        SELECT EARLIEST(dim1, 32) AS e, LATEST(l1) AS l, LATEST(d1) AS d,
               LATEST(f1) AS f
        FROM druid.numfoo
        WHERE dim1 IS NOT NULL AND l1 IS NOT NULL AND d1 IS NOT NULL
          AND f1 is NOT NULL""").first()
    assert (r["e"], r["l"], r["d"], r["f"]) == ("", 0, 0.0, 0.0)


def test_having_on_grand_total(spark, foo_catalog):
    """CalciteQueryTest.java:3450 testHavingOnGrandTotal."""
    out = q(spark, foo_catalog,
            "SELECT SUM(m1) AS m1_sum FROM foo HAVING m1_sum = 21").collect()
    assert [r["m1_sum"] for r in out] == [21.0]


def test_having_on_double_sum(spark, foo_catalog):
    """CalciteQueryTest.java:3471 testHavingOnDoubleSum."""
    out = q(spark, foo_catalog, """
        SELECT dim1, SUM(m1) AS m1_sum FROM druid.foo
        GROUP BY dim1 HAVING SUM(m1) > 1""")
    assert rows(out, "dim1", "m1_sum") == [
        ("1", 4.0), ("10.1", 2.0), ("2", 3.0), ("abc", 6.0), ("def", 5.0)]


def test_having_on_ratio(spark, foo_catalog):
    """CalciteQueryTest.java:3697 testHavingOnRatio (dim2[0]; SQL null mode:
    a NULL dim2 fails the <> filter, so only '2' and 'def' survive — the
    reference's 4-row expected is its replaceWithDefault branch)."""
    out = q(spark, foo_catalog, """
        SELECT
          dim1,
          COUNT(*) FILTER(WHERE dim2[0] <> 'a')/COUNT(*) as ratio
        FROM druid.foo
        GROUP BY dim1
        HAVING COUNT(*) FILTER(WHERE dim2[0] <> 'a')/COUNT(*) = 1""")
    assert rows(out, "dim1", "ratio") == [("2", 1.0), ("def", 1.0)]


def test_group_by_case_when(spark, foo_catalog):
    """CalciteQueryTest.java:4613 testGroupByCaseWhen."""
    out = q(spark, foo_catalog, """
        SELECT
          CASE EXTRACT(DAY FROM __time)
            WHEN m1 THEN 'match-m1'
            WHEN cnt THEN 'match-cnt'
            WHEN 0 THEN 'zero'    END AS c,  COUNT(*) AS n
        FROM druid.foo
        GROUP BY  CASE EXTRACT(DAY FROM __time)
            WHEN m1 THEN 'match-m1'
            WHEN cnt THEN 'match-cnt'
            WHEN 0 THEN 'zero'    END""")
    assert rows(out, "c", "n") == [
        ("match-cnt", 1), ("match-m1", 3), (None, 2)]


def test_null_empty_string_equality(spark, foo_catalog):
    """CalciteQueryTest.java:4702 testNullEmptyStringEquality (sql branch)."""
    assert q(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE NULLIF(dim2[0], 'a') IS NULL""").first()["c"] == 4


def test_null_numeric_filters(spark, numfoo_catalog):
    """CalciteQueryTest.java:4739/4777/4816 testNull{Long,Double,Float}Filter."""
    for col in ("l1", "d1", "f1"):
        assert q(spark, numfoo_catalog,
                 f"SELECT COUNT(*) AS c FROM druid.numfoo WHERE {col} IS NULL"
                 ).first()["c"] == 3


def test_null_double_topn(spark, numfoo_catalog):
    """CalciteQueryTest.java:4854 testNullDoubleTopN — DESC puts nulls last
    (sql branch)."""
    out = q(spark, numfoo_catalog, """
        SELECT d1, COUNT(*) AS c FROM druid.numfoo
        GROUP BY d1 ORDER BY d1 DESC LIMIT 10""").collect()
    assert [(r["d1"], r["c"]) for r in out] == [
        (1.7, 1), (1.0, 1), (0.0, 1), (None, 3)]


def test_long_predicate_is_null(spark, numfoo_catalog):
    """CalciteQueryTest.java:4974 testLongPredicateIsNull."""
    out = q(spark, numfoo_catalog,
            "SELECT l1 is null AS n FROM druid.numfoo").collect()
    assert sorted(r["n"] for r in out) == [False] * 3 + [True] * 3


def test_coalesce_columns(spark, foo_catalog):
    """CalciteQueryTest.java:5144 testCoalesceColumns (sql branch)."""
    out = q(spark, foo_catalog, """
        SELECT COALESCE(dim2[0], dim1) AS c, COUNT(*) AS n
        FROM druid.foo GROUP BY COALESCE(dim2[0], dim1)""")
    assert rows(out, "c", "n") == [
        ("", 1), ("10.1", 1), ("a", 2), ("abc", 2)]


def test_column_is_null(spark, foo_catalog):
    """CalciteQueryTest.java:5188 testColumnIsNull (sql branch: 2)."""
    assert q(spark, foo_catalog,
             "SELECT COUNT(*) AS c FROM druid.foo WHERE dim2[0] IS NULL"
             ).first()["c"] == 2


def test_count_nullable_columns(spark, foo_catalog):
    """CalciteQueryTest.java:5615/5644/5673 testCount{NonNull,Nullable}Column
    + NullableExpression."""
    r = q(spark, foo_catalog, """
        SELECT COUNT(cnt) AS a, COUNT(dim2[0]) AS b,
               COUNT(CASE WHEN dim2[0] = 'abc' THEN 'yes'
                          WHEN dim2[0] = 'def' THEN 'yes' END) AS c
        FROM druid.foo""").first()
    assert (r["a"], r["b"], r["c"]) == (6, 4, 1)


def test_case_filtered_aggregation_with_group_by(spark, foo_catalog):
    """CalciteQueryTest.java:6456 testCaseFilteredAggregationWithGroupBy."""
    out = q(spark, foo_catalog, """
        SELECT
          cnt,
          SUM(CASE WHEN dim1 <> '1' THEN 1 ELSE 0 END) + SUM(cnt) AS s
        FROM druid.foo
        GROUP BY cnt""").collect()
    assert [(r["cnt"], r["s"]) for r in out] == [(1, 11)]


def test_remove_useless_case_when(spark, foo_catalog):
    """CalciteQueryTest.java:6943 testRemoveUselessCaseWhen — patterned
    TIME_PARSE inside a constant-foldable CASE."""
    assert q(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE
          CASE
            WHEN __time >= TIME_PARSE('2000-01-01 00:00:00', 'yyyy-MM-dd HH:mm:ss')
                 AND __time < TIMESTAMP '2001-01-01 00:00:00'
            THEN true
            ELSE false
          END
        OR
          __time >= TIMESTAMP '2010-01-01 00:00:00'
          AND __time < TIMESTAMP '2011-01-01 00:00:00'""").first()["c"] == 3


def test_filter_on_string_as_number(spark, foo_catalog):
    """CalciteQueryTest.java:6027 testFilterOnStringAsNumber."""
    out = q(spark, foo_catalog, """
        SELECT distinct dim1 FROM druid.foo
        WHERE dim1 = 10 OR (floor(CAST(dim1 AS float)) = 10.00
              and CAST(dim1 AS float) > 9 and CAST(dim1 AS float) <= 10.5)""")
    assert rows(out, "dim1") == [("10.1",)]


def test_expression_containing_null(spark, foo_catalog):
    """CalciteQueryTest.java:189 testExpressionContainingNull — array
    constructor keeps the null element."""
    r = q(spark, foo_catalog,
          "SELECT ARRAY['Hello', NULL] AS a FROM foo LIMIT 1").first()
    assert list(r["a"]) == ["Hello", None]


# ---------------------------------------------------------------------------
# parameterized queries (CalciteParameterQueryTest.java) through sql_query
# ---------------------------------------------------------------------------

def _pq(spark, cat, sql, params):
    from incubator_druid_spark.api import sql_query
    return sql_query({"query": sql, "parameters": params}, spark, cat)


def test_params_in_select_expression_and_limit(spark, foo_catalog):
    """CalciteParameterQueryTest.java testParamsInSelectExpressionAndLimit
    (dim2[0] scalar view)."""
    out = _pq(spark, foo_catalog,
              "SELECT SUBSTRING(dim2[0], ?, ?) AS s FROM druid.foo "
              "ORDER BY __time LIMIT ?",
              [{"type": "INTEGER", "value": 1},
               {"type": "INTEGER", "value": 1},
               {"type": "INTEGER", "value": 2}])
    assert [r["s"] for r in out] == ["a", None]


def test_params_tucked_in_a_cast(spark, foo_catalog):
    """testParamsTuckedInACast — m1 - CAST(? AS INT) = dim1."""
    out = _pq(spark, foo_catalog, """
        SELECT dim1, m1, COUNT(*) AS c FROM druid.foo
        WHERE m1 - CAST(? as INT) = dim1 GROUP BY dim1, m1""",
              [{"type": "INTEGER", "value": 1}])
    got = sorted((r["dim1"], r["m1"], r["c"]) for r in out)
    # sql null mode: '' casts to NULL, so only the genuinely numeric dim1
    # matches (the reference's "" row is its replaceWithDefault branch)
    assert got == [("2", 3.0, 1)]


def test_wrong_type_parameter_matches_nothing(spark, numfoo_catalog):
    """testWrongTypeParameter — a fractional double against a long column:
    zero matches, no error."""
    out = _pq(spark, numfoo_catalog, """
        SELECT COUNT(*) AS c FROM druid.numfoo WHERE l1 > ? AND f1 = ?""",
              [{"type": "DOUBLE", "value": 3.0},
               {"type": "DOUBLE", "value": 3.25}])
    assert out == [{"c": 0}]


def test_null_parameter_in_coalesce(spark, foo_catalog):
    """testNullParameter — NULL first parameter falls through to the second
    (sql branch: '' groups separately from the parameter default)."""
    out = _pq(spark, foo_catalog, """
        SELECT COALESCE(dim2[0], ?, ?) AS c, COUNT(*) AS n
        FROM druid.foo GROUP BY 1""",
              [{"type": "VARCHAR", "value": None},
               {"type": "VARCHAR", "value": "parameter"}])
    got = sorted((r["c"], r["n"]) for r in out)
    assert got == [("", 1), ("a", 2), ("abc", 1), ("parameter", 2)]


def test_earliest_latest_nested_call_args(spark, foo_catalog):
    """EARLIEST/LATEST/APPROX_QUANTILE with nested call arguments — the
    rewrites are paren-aware, not word-regexes."""
    r = q(spark, foo_catalog, """
        SELECT EARLIEST(LOWER(SUBSTRING(dim1, 1, 2))) AS e,
               LATEST(CONCAT(dim1, '!'), 64) AS l,
               APPROX_QUANTILE(m1 + LEAST(m2, 100), 0.5) AS m
        FROM druid.foo""").first()
    # SUBSTRING('', 1, 2) is NULL in Druid sql mode (SubstringDimExtractionFn
    # returns null for empty results), so row 1's value is null and EARLIEST
    # carries it (first/last do not skip nulls)
    assert r["e"] is None and r["l"] == "abc!" and r["m"] == pytest.approx(6.0)


def test_select_pad_family(spark, foo_catalog):
    """CalciteQueryTest.java:867 testSelectPadFamily (2-arg pad = spaces)."""
    r = q(spark, foo_catalog, """
        SELECT
        LPAD('foo', 5, 'x') AS a, LPAD('foo', 2, 'x') AS b,
        LPAD('foo', 5) AS c,
        RPAD('foo', 5, 'x') AS d, RPAD('foo', 2, 'x') AS e,
        RPAD('foo', 5) AS f,
        COUNT(*) AS n
        FROM foo""").first()
    assert tuple(r) == ("xxfoo", "fo", "  foo", "fooxx", "fo", "foo  ", 6)


def test_sum_and_filter_on_casted_string(spark, foo_catalog):
    """CalciteQueryTest.java:7367 testSumOfString + :6901
    testCountStarWithFilterOnCastedString — string CAST coercion."""
    assert q(spark, foo_catalog,
             "SELECT SUM(CAST(dim1 AS INTEGER)) AS s FROM druid.foo"
             ).first()["s"] == 13
    assert q(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE CAST(dim1 AS bigint) = 2""").first()["c"] == 1


def test_expression_filter_group_on_string_cast(spark, foo_catalog):
    """CalciteQueryTest.java:6664
    testExpressionFilteringAndGroupingOnStringCastToNumber (sql branch:
    unparseable dim1 → NULL, excluded by > -1)."""
    out = q(spark, foo_catalog, """
        SELECT
          FLOOR(CAST(dim1 AS FLOAT) / 2) * 2 AS g,
          COUNT(*) AS c
        FROM druid.foo
        WHERE FLOOR(CAST(dim1 AS FLOAT) / 2) * 2 > -1
        GROUP BY FLOOR(CAST(dim1 AS FLOAT) / 2) * 2
        ORDER BY 1 DESC""").collect()
    assert [(r["g"], r["c"]) for r in out] == [(10.0, 1), (2.0, 1), (0.0, 1)]


def test_string_latest_in_subquery(spark, foo_catalog):
    """CalciteQueryTest.java:2437 testStringLatestInSubquery (sql branch:
    non-numeric latest values coerce to NULL under SUM → 3)."""
    assert q(spark, foo_catalog, """
        SELECT SUM(CAST(val AS BIGINT)) AS s FROM (
            SELECT dim2[0] AS d2, LATEST(dim1, 10) AS val
            FROM foo GROUP BY dim2[0])""").first()["s"] == 3


def test_empty_and_null_string_equality(spark, foo_catalog):
    """CalciteQueryTest.java:5073/5119 — NULLIF(dim2,'a') = '' matches only
    the real empty string (sql branch); = null matches nothing."""
    assert q(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE NULLIF(dim2[0], 'a') = ''""").first()["c"] == 1
    assert q(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE NULLIF(dim2[0], 'a') = null""").first()["c"] == 0


def test_function_names_inside_string_literals_are_data(spark, foo_catalog):
    """Rewriter literal-safety: function-like text inside string literals
    must pass through verbatim (every rewriter skips matches that start
    inside a quoted literal)."""
    r = q(spark, foo_catalog, """
        SELECT 'CAST(1 AS INT)' AS a, 'ARRAY_AGG(x)' AS b,
               'TIME_FLOOR(t, ''P1D'')' AS c, 'ARRAY[1,2]' AS d,
               'FLOOR(__time TO DAY)' AS e, 'EARLIEST_BY(x, t)' AS f,
               'STRING_FORMAT(%s)' AS g,
               FLOOR(TIME_PARSE('2000-01-05 00:00:00', 'yyyy-MM-dd HH:mm:ss')
                     TO MONTH) AS real_floor
        FROM foo LIMIT 1""").first()
    assert (r["a"], r["b"], r["c"], r["d"], r["e"], r["f"], r["g"]) == (
        "CAST(1 AS INT)", "ARRAY_AGG(x)", "TIME_FLOOR(t, 'P1D')",
        "ARRAY[1,2]", "FLOOR(__time TO DAY)", "EARLIEST_BY(x, t)",
        "STRING_FORMAT(%s)")
    assert str(r["real_floor"])[:10] == "2000-01-01"


def test_operator_table_sweep(spark, foo_catalog):
    """DruidOperatorTable completeness sweep — one probe per operator family
    not covered elsewhere: TRUNCATE/TRUNC (default digits), PARSE_LONG with
    radix, DATE_TRUNC, POSITION..IN, BIT_AND/OR/XOR aggregates, REPEAT/
    REVERSE/LEFT/RIGHT/BTRIM, time arithmetic with intervals."""
    r = q(spark, foo_catalog, """
        SELECT TRUNCATE(3.79) AS t0, TRUNC(-3.79) AS t1,
               TRUNCATE(3.14159, 2) AS t2,
               PARSE_LONG('ff', 16) AS pl,
               DATE_TRUNC('day', TIMESTAMP '2000-01-05 10:20:30') AS dt,
               POSITION('c' IN 'abcd') AS pos,
               REPEAT('ab', 2) AS rep, REVERSE('abc') AS rev,
               LEFT('abcd', 2) AS l2, RIGHT('abcd', 2) AS r2,
               BTRIM('xxabxx', 'x') AS bt,
               TIMESTAMP '2000-01-01 00:00:00' + INTERVAL '2' DAY AS plus2,
               BIT_AND(cnt) AS ba, BIT_OR(m1_int) AS bo
        FROM (SELECT cnt, CAST(m1 AS BIGINT) AS m1_int FROM druid.foo)""").first()
    assert (r["t0"], r["t1"], r["t2"]) == (3.0, -3.0, 3.14)
    assert r["pl"] == 255
    assert str(r["dt"]) == "2000-01-05 00:00:00"
    assert r["pos"] == 3
    assert (r["rep"], r["rev"], r["l2"], r["r2"], r["bt"]) == (
        "abab", "cba", "ab", "cd", "ab")
    assert str(r["plus2"])[:10] == "2000-01-03"
    assert r["ba"] == 1 and r["bo"] == 7  # 1..6 OR-folded


def test_bound_filter_simplify_and_not(spark, foo_catalog):
    """testCountStarWithBoundFilterSimplifyAnd + NotOfDegenerateFilter
    (dim2[0] scalar view)."""
    assert q(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE (dim1 >= 'a' and dim1 < 'b') and dim1 = 'abc'""").first()["c"] == 1
    assert q(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE dim2[0] = 'a' and not (dim1 > 'a' OR dim1 < 'b')
        """).first()["c"] == 0


def test_group_by_limit_pushdown_extraction(spark, numfoo_catalog):
    """testGroupByLimitPushdownExtraction — substring dim + limit."""
    out = q(spark, numfoo_catalog, """
        SELECT dim4, substring(dim5, 1, 1) AS s, count(*) AS c
        FROM druid.numfoo WHERE dim4 = 'a'
        GROUP BY 1,2 ORDER BY 1,2 LIMIT 2""").collect()
    assert [(r["dim4"], r["s"], r["c"]) for r in out] == [
        ("a", "a", 2), ("a", "b", 1)]


def test_filter_time_floor_comparison_misaligned_lt(spark, foo_catalog):
    """testFilterOnTimeFloorComparisonMisaligned — < against a misaligned
    literal still catches the whole earlier month."""
    assert q(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE FLOOR(__time TO MONTH) < TIMESTAMP '2000-02-01 00:00:01'
        """).first()["c"] == 3


def test_select_trim_family(spark, foo_catalog):
    """CalciteQueryTest testSelectTrimFamily — every TRIM/BTRIM/LTRIM/RTRIM
    form."""
    r = q(spark, foo_catalog, """
        SELECT
        TRIM(BOTH 'x' FROM 'xfoox') AS a,
        TRIM(TRAILING 'x' FROM 'xfoox') AS b,
        TRIM(' ' FROM ' foo ') AS c,
        TRIM(TRAILING FROM ' foo ') AS d,
        TRIM(' foo ') AS e,
        BTRIM(' foo ') AS f,
        BTRIM('xfoox', 'x') AS g,
        LTRIM(' foo ') AS h,
        LTRIM('xfoox', 'x') AS i,
        RTRIM(' foo ') AS j,
        RTRIM('xfoox', 'x') AS k,
        COUNT(*) AS n
        FROM foo""").first()
    assert tuple(r) == ("foo", "xfoo", "foo", " foo", "foo", "foo", "foo",
                        "foo ", "foox", " foo", "xfoo", 6)


def test_position_with_from(spark, foo_catalog):
    """PositionOperatorConversion — POSITION(needle IN haystack FROM start),
    a Calcite form Spark's parser lacks; a string literal containing the
    same text stays data."""
    r = q(spark, foo_catalog, """
        SELECT POSITION('b' IN 'abcb' FROM 3) AS p,
               'POSITION(x IN y FROM 1)' AS lit
        FROM foo LIMIT 1""").first()
    assert r["p"] == 4 and r["lit"] == "POSITION(x IN y FROM 1)"
