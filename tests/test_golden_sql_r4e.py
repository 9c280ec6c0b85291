"""Round-4 CalciteQueryTest tranche E — bitwise expression projections,
coalesce/null-predicate semantics, CASE grouping, limit wrapping, impossible
time filters, point-in-time filters, numeric first/last/any over null
columns, string-as-number filtering, and the lookup-join operator family
(sql/src/test/java/org/apache/druid/sql/calcite/CalciteQueryTest.java;
SQL-compatible null mode).

MVD note: this SQL surface keeps MVDs as honest arrays (README compat
table); where the reference filters/joins the VARCHAR-typed dim2, these
ports use the element dim2[0] — identical on foo whose dim2 rows hold at
most one element."""

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


@pytest.fixture(scope="module")
def foo4_catalog(spark, tmp_path_factory):
    """`foo4` — CalciteTests.java:596-615 RAW_ROWS1_WITH_FULL_TIMESTAMP:
    two rows with sub-second timestamps for the EXTRACT-unit matrix."""
    from pyspark.sql import types as T

    from incubator_druid_spark.catalog import Catalog
    import datetime as dt
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim1", T.StringType()),
        T.StructField("dim2", T.ArrayType(T.StringType())),
        T.StructField("m1", T.FloatType()),
        T.StructField("m2", T.DoubleType()),
    ])
    rows_ = [
        (dt.datetime(2000, 1, 1, 10, 51, 45, 695000), "", ["a"], 1.0, 1.0),
        (dt.datetime(2000, 1, 18, 10, 51, 45, 695000), "10.1", [], 2.0, 2.0),
    ]
    df = spark.createDataFrame(rows_, schema)
    path = str(tmp_path_factory.mktemp("foo4_ds") / "foo4.parquet")
    df.write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("foo4", path)
    return cat


def test_bitwise_expressions(spark, numfoo_catalog):
    """testBitwiseExpressions — the full BITWISE_* projection matrix over
    numfoo's nullable longs/doubles (sql mode branch)."""
    out = rows(q(spark, numfoo_catalog, """
        SELECT
        BITWISE_AND(l1, l2) AS b_and,
        BITWISE_OR(l1, l2) AS b_or,
        BITWISE_XOR(l1, l2) AS b_xor,
        BITWISE_COMPLEMENT(l1) AS b_not,
        BITWISE_SHIFT_LEFT(l1, 2) AS b_shl,
        BITWISE_SHIFT_RIGHT(l1, 2) AS b_shr,
        BITWISE_CONVERT_DOUBLE_TO_LONG_BITS(d1) AS d2l,
        BITWISE_CONVERT_LONG_BITS_TO_DOUBLE(l1) AS l2d
        FROM numfoo"""))
    assert sorted(out, key=str) == sorted([
        (None, None, None, -8, 28, 1, 4607182418800017408, 3.5e-323),
        (325323, 325323, 0, -325324, 1301292, 81330,
         4610334938539176755, 1.60731e-318),
        (0, 0, 0, -1, 0, 0, 0, 0.0),
        (None, None, None, None, None, None, None, None),
        (None, None, None, None, None, None, None, None),
        (None, None, None, None, None, None, None, None),
    ], key=str)


def test_coalesce_columns(spark, foo_catalog):
    """testCoalesceColumns — COALESCE(dim2, dim1) grouping (the sql.md doc
    example); sql mode keeps the '' group distinct."""
    out = srows(q(spark, foo_catalog, """
        SELECT COALESCE(dim2[0], dim1) AS d, COUNT(*) AS n
        FROM druid.foo GROUP BY COALESCE(dim2[0], dim1)"""))
    assert out == [("", 1), ("10.1", 1), ("a", 2), ("abc", 2)]


def test_column_is_null(spark, foo_catalog):
    """testColumnIsNull — sql mode counts only real nulls (the empty-array
    row and the missing row), not the [''] row."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM druid.foo WHERE dim2[0] IS NULL"
               ) == (2,)


def test_group_by_case_when_simple_form(spark, foo_catalog):
    """testGroupByCaseWhen — CASE <expr> WHEN <col> matching against m1 and
    cnt per-row; unmatched rows group under null."""
    out = srows(q(spark, foo_catalog, """
        SELECT
          CASE EXTRACT(DAY FROM __time)
            WHEN m1 THEN 'match-m1'
            WHEN cnt THEN 'match-cnt'
            WHEN 0 THEN 'zero'
            END AS v,
          COUNT(*) AS n
        FROM druid.foo
        GROUP BY
          CASE EXTRACT(DAY FROM __time)
            WHEN m1 THEN 'match-m1'
            WHEN cnt THEN 'match-cnt'
            WHEN 0 THEN 'zero'
            END"""))
    assert out == [(None, 2), ("match-cnt", 1), ("match-m1", 3)]


def test_group_by_floor(spark, foo_catalog):
    """testGroupByFloor — floor of a string cast to float; non-numeric
    strings group under null in sql mode."""
    out = srows(q(spark, foo_catalog, """
        SELECT floor(CAST(dim1 AS float)) AS f, COUNT(*) AS n
        FROM druid.foo GROUP BY floor(CAST(dim1 AS float))"""))
    assert out == [(None, 3), (1.0, 1), (2.0, 1), (10.0, 1)]


def test_group_by_limit_wrapping(spark, foo_catalog):
    """testGroupByLimitWrapping — outer limit applied over a dim1 DESC
    ordering (OUTER_LIMIT_CONTEXT sqlOuterLimit=2 == ... LIMIT 2)."""
    out = rows(q(spark, foo_catalog, """
        SELECT dim1, dim2[0] AS d2, COUNT(*) AS n FROM druid.foo
        GROUP BY dim1, dim2[0] ORDER BY dim1 DESC LIMIT 2"""))
    assert out == [("def", "abc", 1), ("abc", None, 1)]


def test_group_by_nothing_with_impossible_time_filter(spark, foo_catalog):
    """testGroupByNothingWithImpossibleTimeFilter — FLOOR(__time TO DAY)
    compared to non-day-aligned timestamps matches nothing (Druid issue
    #7671 regression)."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE FLOOR(__time TO DAY) = TIMESTAMP '2000-01-02 01:00:00'
        OR FLOOR(__time TO DAY) = TIMESTAMP '2000-01-02 02:00:00'""") == (0,)


def test_empty_group_with_offset_doesnt_infinite_loop(spark, foo_catalog):
    """testEmptyGroupWithOffsetDoesntInfiniteLoop — GROUP BY () OFFSET 1
    empties the single global-aggregate row; the join result is empty."""
    out = q(spark, foo_catalog, """
        SELECT r0.c AS c0, r1.c AS c1
        FROM (
          SELECT COUNT(*) AS c FROM foo GROUP BY () OFFSET 1
        ) AS r0
        LEFT JOIN (
          SELECT COUNT(*) AS c FROM foo GROUP BY ()
        ) AS r1 ON TRUE LIMIT 10""")
    assert out.count() == 0


def test_count_star_with_two_points_in_time(spark, foo_catalog):
    """testCountStarWithTwoPointsInTime — OR of two __time point equalities
    becomes two millisecond intervals."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo WHERE
        __time = TIMESTAMP '2000-01-01 00:00:00'
        OR __time = TIMESTAMP '2000-01-01 00:00:00' + INTERVAL '1' DAY
        """) == (2,)


def test_count_star_with_long_column_filters_on_two_points(
        spark, foo_catalog):
    """testCountStarWithLongColumnFiltersOnTwoPoints — OR of two numeric
    point filters compiles to IN; every foo row has cnt = 1."""
    assert one(spark, foo_catalog,
               "SELECT COUNT(*) AS c FROM druid.foo WHERE cnt = 1 OR cnt = 2"
               ) == (6,)


def test_filter_on_time_extract(spark, foo_catalog):
    """testFilterOnTimeExtract — conjunction of EXTRACT(YEAR)/EXTRACT(MONTH)
    equalities."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE EXTRACT(YEAR FROM __time) = 2000
        AND EXTRACT(MONTH FROM __time) = 1""") == (3,)


def test_filter_on_time_extract_with_various_time_units(spark, foo4_catalog):
    """testFilterOnTimeExtractWithVariousTimeUnits — the full
    timestamp_extract unit matrix (TimeExtractOperatorConversion unit set;
    MICROSECOND mirrors Druid's epoch-seconds DIV 1000 behavior) over foo4's
    sub-second timestamps."""
    assert one(spark, foo4_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo4
        WHERE EXTRACT(YEAR FROM __time) = 2000
        AND EXTRACT(MICROSECOND FROM __time) = 946723
        AND EXTRACT(MILLISECOND FROM __time) = 695
        AND EXTRACT(ISODOW FROM __time) = 6
        AND EXTRACT(ISOYEAR FROM __time) = 2000
        AND EXTRACT(DECADE FROM __time) = 200
        AND EXTRACT(CENTURY FROM __time) = 20
        AND EXTRACT(MILLENNIUM FROM __time) = 2""") == (1,)


def test_filter_on_time_floor_comparison_misaligned(spark, foo_catalog):
    """testFilterOnTimeFloorComparisonMisaligned — < against a
    non-month-aligned timestamp rounds the bound up to the next month."""
    assert one(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM druid.foo
        WHERE FLOOR(__time TO MONTH) < TIMESTAMP '2000-02-01 00:00:01'
        """) == (3,)


def test_earliest_aggregators_numeric_nulls(spark, numfoo_catalog):
    """testEarliestAggregatorsNumericNulls — EARLIEST over nullable numeric
    columns takes the first row's value (all non-null on row 1)."""
    assert one(spark, numfoo_catalog,
               "SELECT EARLIEST(l1) AS l, EARLIEST(d1) AS d, "
               "EARLIEST(f1) AS f FROM druid.numfoo") == (7, 1.0, 1.0)


@pytest.fixture(scope="module")
def numfoo1e_catalog(spark, numfoo, tmp_path_factory):
    """numfoo as ONE parquet file so scan order == row order — the ANY_VALUE
    goldens encode the reference's single-segment row order (same pattern as
    tranche B's numfoo1_catalog)."""
    from incubator_druid_spark.catalog import Catalog
    path = str(tmp_path_factory.mktemp("numfoo1e_ds") / "numfoo.parquet")
    numfoo.coalesce(1).write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("numfoo", path)
    return cat


def test_any_aggregators_on_heap_numeric_nulls(spark, numfoo1e_catalog):
    """testAnyAggregatorsOnHeapNumericNulls — ANY_VALUE takes the FIRST row's
    values in scan order (row 1: l1=7, d1=1.0, f1=1.0)."""
    assert one(spark, numfoo1e_catalog,
               "SELECT ANY_VALUE(l1) AS l, ANY_VALUE(d1) AS d, "
               "ANY_VALUE(f1) AS f FROM druid.numfoo") == (7, 1.0, 1.0)


def test_first_latest_aggregators_skip_nulls(spark, numfoo_catalog):
    """testFirstLatestAggregatorsSkipNulls — with null rows filtered out,
    EARLIEST(dim1) is '' (sql mode) and LATEST numerics come from the last
    surviving row (all zeros)."""
    assert one(spark, numfoo_catalog, """
        SELECT EARLIEST(dim1, 32) AS e, LATEST(l1) AS l,
               LATEST(d1) AS d, LATEST(f1) AS f
        FROM druid.numfoo
        WHERE dim1 IS NOT NULL AND l1 IS NOT NULL
          AND d1 IS NOT NULL AND f1 IS NOT NULL""") == ("", 0, 0.0, 0.0)


def test_expression_containing_null(spark, foo_catalog):
    """testExpressionContainingNull — a null literal inside an ARRAY
    constructor survives (kept as a real array, not Druid's JSON string
    rendering)."""
    got = q(spark, foo_catalog,
            "SELECT ARRAY['Hello', NULL] AS a FROM foo LIMIT 1"
            ).first()["a"]
    assert list(got) == ["Hello", None]


def test_filter_on_string_as_number(spark, foo_catalog):
    """testFilterOnStringAsNumber — numeric comparison casts the string
    dim; only '10.1' survives the floor/range conjunction."""
    out = rows(q(spark, foo_catalog, """
        SELECT distinct dim1 FROM druid.foo WHERE
        dim1 = 10 OR
        (floor(CAST(dim1 AS float)) = 10.00
         AND CAST(dim1 AS float) > 9 AND CAST(dim1 AS float) <= 10.5)"""))
    assert out == [("10.1",)]


def test_expression_filtering_and_grouping_on_string_cast_to_number(
        spark, foo_catalog):
    """testExpressionFilteringAndGroupingOnStringCastToNumber — sql mode
    drops the non-numeric rows (null > -1 is not true)."""
    out = rows(q(spark, foo_catalog, """
        SELECT FLOOR(CAST(dim1 AS FLOAT) / 2) * 2 AS f, COUNT(*) AS n
        FROM druid.foo
        WHERE FLOOR(CAST(dim1 AS FLOAT) / 2) * 2 > -1
        GROUP BY FLOOR(CAST(dim1 AS FLOAT) / 2) * 2
        ORDER BY 1 DESC"""))
    assert out == [(10.0, 1), (2.0, 1), (0.0, 1)]


def test_case_filtered_aggregation_with_group_by(spark, foo_catalog):
    """testCaseFilteredAggregationWithGroupBy — CASE-as-filtered-count plus
    SUM(cnt) per cnt group."""
    assert rows(q(spark, foo_catalog, """
        SELECT cnt,
          SUM(CASE WHEN dim1 <> '1' THEN 1 ELSE 0 END) + SUM(cnt) AS s
        FROM druid.foo GROUP BY cnt""")) == [(1, 11)]


# ---------------------------------------------------------------------------
# Lookup-join operator family
# ---------------------------------------------------------------------------

def test_filter_and_group_by_lookup_using_join_operator(spark, full_catalog):
    """testFilterAndGroupByLookupUsingJoinOperator — LEFT JOIN the lookup
    table, filter on v, group on k."""
    assert rows(q(spark, full_catalog, """
        SELECT lookyloo.k AS k, COUNT(*) AS n
        FROM foo LEFT JOIN lookup.lookyloo ON foo.dim2[0] = lookyloo.k
        WHERE lookyloo.v = 'xa'
        GROUP BY lookyloo.k""")) == [("a", 2)]


def test_filter_and_group_by_lookup_join_operator_backwards(
        spark, full_catalog):
    """testFilterAndGroupByLookupUsingJoinOperatorBackwards — RIGHT JOIN
    with the lookup on the left; <> is a two-valued matcher so the
    unmatched (null-v) rows survive."""
    out = srows(q(spark, full_catalog, """
        SELECT lookyloo.v AS v, COUNT(*) AS n
        FROM lookup.lookyloo RIGHT JOIN foo ON foo.dim2[0] = lookyloo.k
        WHERE lookyloo.v <> 'xa'
        GROUP BY lookyloo.v"""))
    assert out == [(None, 3), ("xabc", 1)]


def test_filter_and_group_by_lookup_join_operator_with_not_filter(
        spark, full_catalog):
    """testFilterAndGroupByLookupUsingJoinOperatorWithNotFilter — same
    two-valued <> semantics through a LEFT JOIN."""
    out = srows(q(spark, full_catalog, """
        SELECT lookyloo.v AS v, COUNT(*) AS n
        FROM foo LEFT JOIN lookup.lookyloo ON foo.dim2[0] = lookyloo.k
        WHERE lookyloo.v <> 'xa'
        GROUP BY lookyloo.v"""))
    assert out == [(None, 3), ("xabc", 1)]


def test_group_by_inner_join_on_lookup_using_join_operator(
        spark, full_catalog):
    """testGroupByInnerJoinOnLookupUsingJoinOperator — INNER JOIN on dim1
    keeps only the 'abc' match."""
    assert rows(q(spark, full_catalog, """
        SELECT lookyloo.v AS v, COUNT(*) AS n
        FROM foo INNER JOIN lookup.lookyloo ON foo.dim1 = lookyloo.k
        GROUP BY lookyloo.v""")) == [("xabc", 1)]


def test_count_distinct_of_lookup_using_join_operator(spark, full_catalog):
    """testCountDistinctOfLookupUsingJoinOperator — exact distinct of the
    joined lookup value; sql mode does not count null."""
    assert one(spark, full_catalog, """
        SELECT COUNT(DISTINCT lookyloo.v) AS c
        FROM foo LEFT JOIN lookup.lookyloo ON foo.dim1 = lookyloo.k
        """) == (1,)


def test_count_on_semi_join_single_column(spark, foo_catalog):
    """testCountOnSemiJoinSingleColumn — IN subquery on the same table."""
    assert rows(q(spark, foo_catalog, """
        SELECT dim1 FROM foo WHERE dim1 IN (
          SELECT dim1 FROM foo WHERE dim1 = '10.1')""")) == [("10.1",)]


def test_comma_join_left_function(spark, full_catalog):
    """testCommaJoinLeftFunction — comma join with a function-of-left-side
    equality against the lookup key."""
    out = srows(q(spark, full_catalog, """
        SELECT foo.dim1 AS d1, foo.dim2[0] AS d2, l.k AS k, l.v AS v
        FROM foo, lookup.lookyloo l
        WHERE SUBSTRING(foo.dim2[0], 1, 1) = l.k"""))
    assert out == [("", "a", "a", "xa"), ("1", "a", "a", "xa"),
                   ("def", "abc", "a", "xa")]


def test_group_by_expression_from_lookup(spark, full_catalog):
    """testGroupByExpressionFromLookup — querying the lookup table itself
    with an expression dimension."""
    out = srows(q(spark, full_catalog, """
        SELECT SUBSTRING(v, 1, 1) AS s, COUNT(*) AS n
        FROM lookup.lookyloo GROUP BY 1"""))
    assert out == [("m", 1), ("x", 3)]
