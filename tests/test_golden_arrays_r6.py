"""Golden SQL tests — round-6 tranche: the remaining CalciteArraysQueryTest
methods (reference sql/src/test/.../calcite/CalciteArraysQueryTest.java),
SQL-compatible null mode, honest-ARRAY semantics (see test_golden_arrays.py
header).  Two documented divergences recur:

  * GROUP BY an array value groups the WHOLE array (Druid's MVD storage
    explodes multi-values into per-element rows and collapses [] to null).
  * The reference's array constructor coerces decimal literals to ints
    ("this needs fixed in the future", CalciteArraysQueryTest.java:166);
    this engine keeps honest doubles.

numfoo dim3 per row: ["a","b"], ["b","c"], ["d"], [""], [], null
numfoo dim2 per row: ["a"], [], [""], ["a"], ["abc"], null
"""

import pytest

from incubator_druid_spark.sql.functions import druid_sql


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def test_array_append_group_by(spark, numfoo_catalog):
    """CalciteArraysQueryTest.java testArrayAppend — whole-array groups (the
    reference explodes to per-element rows: foo:6, null:2, b:2, ...)."""
    out = q(spark, numfoo_catalog, """
        SELECT ARRAY_APPEND(dim3, 'foo') AS a, SUM(cnt) AS c
        FROM druid.numfoo GROUP BY 1 ORDER BY 2 DESC""").collect()
    got = {(tuple(r["a"]) if r["a"] is not None else None, r["c"]) for r in out}
    assert got == {(("a", "b", "foo"), 1), (("b", "c", "foo"), 1),
                   (("d", "foo"), 1), (("", "foo"), 1), (("foo",), 1),
                   (None, 1)}


def test_array_prepend_append_to_string(spark, numfoo_catalog):
    """CalciteArraysQueryTest.java testArrayPrependAppend — ARRAY_TO_STRING
    collapses to scalars, so grouping matches the reference row-for-row
    except the []/null MVD collapse: Druid shows ('foo,null','null,foo',2)
    for both; honest arrays give ('foo','foo') for [] and (null,null) for
    the null row (array fns propagate null in SQL mode)."""
    out = q(spark, numfoo_catalog, """
        SELECT ARRAY_TO_STRING(ARRAY_PREPEND('foo', dim3), ',') AS p,
               ARRAY_TO_STRING(ARRAY_APPEND(dim3, 'foo'), ',') AS a,
               SUM(cnt) AS c
        FROM druid.numfoo GROUP BY 1,2 ORDER BY 3 DESC""").collect()
    got = {(r["p"], r["a"], r["c"]) for r in out}
    assert got == {("foo,a,b", "a,b,foo", 1), ("foo,b,c", "b,c,foo", 1),
                   ("foo,d", "d,foo", 1), ("foo,", ",foo", 1),
                   ("foo", "foo", 1), (None, None, 1)}


def test_array_concat_group_by(spark, numfoo_catalog):
    """CalciteArraysQueryTest.java testArrayConcat — self-concat doubles
    each array; whole-array groups (reference explodes: b:4, null:4, ...)."""
    out = q(spark, numfoo_catalog, """
        SELECT ARRAY_CONCAT(dim3, dim3) AS a, SUM(cnt) AS c
        FROM druid.numfoo GROUP BY 1 ORDER BY 2 DESC""").collect()
    got = {(tuple(r["a"]) if r["a"] is not None else None, r["c"]) for r in out}
    assert got == {(("a", "b", "a", "b"), 1), (("b", "c", "b", "c"), 1),
                   (("d", "d"), 1), (("", ""), 1), ((), 1), (None, 1)}


def test_array_to_string_to_string_to_array(spark, numfoo_catalog):
    """CalciteArraysQueryTest.java testArrayToStringToMultiValueString —
    round-trip through ARRAY_TO_STRING + STRING_TO_ARRAY appending 'd'."""
    out = q(spark, numfoo_catalog, """
        SELECT STRING_TO_ARRAY(
                   CONCAT(ARRAY_TO_STRING(dim3, ','), ',d'), ',') AS a,
               SUM(cnt) AS c
        FROM druid.numfoo WHERE ARRAY_LENGTH(dim3) > 0
        GROUP BY 1 ORDER BY 2 DESC""").collect()
    got = {(tuple(r["a"]), r["c"]) for r in out}
    assert got == {(("a", "b", "d"), 1), (("b", "c", "d"), 1),
                   (("d", "d"), 1), (("", "d"), 1)}


def test_array_contains_array_of_one_element(spark, numfoo_catalog):
    """CalciteArraysQueryTest.java testArrayContainsArrayOfOneElement."""
    out = q(spark, numfoo_catalog, """
        SELECT dim3 FROM druid.numfoo
        WHERE ARRAY_CONTAINS(dim3, ARRAY['a']) LIMIT 5""").collect()
    assert [tuple(r[0]) for r in out] == [("a", "b")]


def test_array_contains_array_of_non_literal(spark, numfoo_catalog):
    """CalciteArraysQueryTest.java testArrayContainsArrayOfNonLiteral — a
    non-literal array second argument dispatches contains-ALL by column
    TYPE (the reference plans ARRAY[dim2]; dim2 is already an array here).
    [b,c] ⊇ [] is vacuously true; Druid's [] row collapses to null and
    shows as the null row instead."""
    out = q(spark, numfoo_catalog, """
        SELECT dim3 FROM druid.numfoo
        WHERE ARRAY_CONTAINS(dim3, dim2) LIMIT 5""").collect()
    assert sorted(tuple(r[0]) for r in out) == [("a", "b"), ("b", "c")]


def test_array_overlap_filter_non_literal(spark, numfoo_catalog):
    """CalciteArraysQueryTest.java testArrayOverlapFilterNonLiteral."""
    out = q(spark, numfoo_catalog, """
        SELECT dim3 FROM druid.numfoo
        WHERE ARRAY_OVERLAP(dim3, dim2) LIMIT 5""").collect()
    assert sorted(tuple(r[0]) for r in out) == [("a", "b")]


def test_array_agg_multi_value(spark, foo_catalog):
    """CalciteArraysQueryTest.java testArrayAggMultiValue — ARRAY_AGG over
    an array column keeps honest arrays-of-arrays (the reference flattens
    the MVD elements); nulls are kept like Druid's SQL mode."""
    r = q(spark, foo_catalog,
          "SELECT ARRAY_AGG(dim3) AS a, ARRAY_AGG(DISTINCT dim3) AS d "
          "FROM foo").first()
    norm = lambda arrs: sorted(  # noqa: E731
        (tuple(x) if x is not None else None for x in arrs),
        key=lambda t: (t is None, t))
    expect = [("",), ("a", "b"), ("b", "c"), ("d",), (), None]
    assert norm(r["a"]) == sorted(
        (tuple(x) if x is not None else None for x in expect),
        key=lambda t: (t is None, t))
    assert norm(r["d"]) == norm(r["a"])  # six distinct values


def test_array_agg_max_bytes(spark, numfoo_catalog):
    """CalciteArraysQueryTest.java testArrayAggMaxBytes — ARRAY_AGG(x, 128)
    honors the byte cap arg; SQL mode keeps nulls ([7,325323,0,null,null,
    null] in the reference, order undefined under parallel agg)."""
    r = q(spark, numfoo_catalog,
          "SELECT ARRAY_AGG(l1, 128) AS a, ARRAY_AGG(DISTINCT l1, 128) AS d "
          "FROM numfoo").first()
    key = lambda v: (v is None, v)  # noqa: E731
    assert sorted(r["a"], key=key) == [0, 7, 325323, None, None, None]
    assert sorted(r["d"], key=key) == [0, 7, 325323, None]


def test_array_agg_group_by_array_agg_from_subquery(spark, foo_catalog):
    """CalciteArraysQueryTest.java testArrayAggGroupByArrayAggFromSubquery —
    the reference planner REFUSES (cannot create query type helper from
    STRING_ARRAY); grouping by an array-valued aggregate works here
    (documented superset, like the tranche-O planner-refusal ports)."""
    out = q(spark, foo_catalog, """
        SELECT dim2, arr, COUNT(*) AS c FROM (
            SELECT dim2, ARRAY_AGG(DISTINCT dim1) AS arr FROM foo
            WHERE dim1 is not null GROUP BY 1 LIMIT 5)
        GROUP BY 1,2""").collect()
    got = {(tuple(r["dim2"]) if r["dim2"] is not None else None,
            tuple(sorted(r["arr"])), r["c"]) for r in out}
    assert got == {(("a",), ("", "1"), 1), ((), ("10.1",), 1),
                   (("",), ("2",), 1), (("abc",), ("def",), 1),
                   (None, ("abc",), 1)}


def test_array_agg_group_by_array_contains_subquery(spark, foo_catalog):
    """CalciteArraysQueryTest.java testArrayAggGroupByArrayContainsSubquery
    — scalar ARRAY_AGG subquery as a contains-filter; every dim1 is
    non-null so all six rows pass.  Reference rows merge [] into null:2;
    honest arrays keep them apart."""
    out = q(spark, foo_catalog, """
        SELECT dim2, COUNT(*) AS c FROM foo
        WHERE ARRAY_CONTAINS(
            (SELECT ARRAY_AGG(DISTINCT dim1) FROM foo
             WHERE dim1 is not null), dim1)
        GROUP BY 1""").collect()
    got = {(tuple(r["dim2"]) if r["dim2"] is not None else None, r["c"])
           for r in out}
    assert got == {(("a",), 2), ((), 1), (("",), 1), (("abc",), 1),
                   (None, 1)}


def test_some_array_functions_with_scan_query(spark, numfoo_catalog):
    """CalciteArraysQueryTest.java:164 testSomeArrayFunctionsWithScanQuery
    (and :313 testSomeArrayFunctionsWithScanQueryNoStringify — results
    here are never stringified).  The
    reference's sql-null-mode expected row, with its two acknowledged
    constructor-coercion bugs fixed (ARRAY[1.9,2.2,4.3] keeps doubles,
    ARRAY_APPEND(ARRAY[1.2,2.2], d1) appends honestly)."""
    r = q(spark, numfoo_catalog, """
        SELECT dim1, dim2, dim3, l1, l2, d1, d2,
               ARRAY['a','b','c'] AS a1, ARRAY[1,2,3] AS a2,
               ARRAY[1.9,2.2,4.3] AS a3,
               ARRAY_APPEND(dim3,'foo') AS a4,
               ARRAY_PREPEND('foo', dim2) AS a5,
               ARRAY_APPEND(ARRAY[1,2], l1) AS a6,
               ARRAY_PREPEND(l2, ARRAY[1,2]) AS a7,
               ARRAY_APPEND(ARRAY[1.2,2.2], d1) AS a8,
               ARRAY_PREPEND(d2, ARRAY[1.1,2.2]) AS a9,
               ARRAY_CONCAT(dim2, dim3) AS a10,
               ARRAY_CONCAT(ARRAY[l1], ARRAY[l2]) AS a11,
               ARRAY_CONCAT(ARRAY[d1], ARRAY[d2]) AS a12,
               ARRAY_OFFSET(ARRAY[l1],0) AS a13,
               ARRAY_OFFSET(ARRAY[d1],0) AS a14,
               ARRAY_ORDINAL(ARRAY[l1],1) AS a15,
               ARRAY_ORDINAL(ARRAY[d1],1) AS a16
        FROM druid.numfoo ORDER BY __time LIMIT 1""").first()
    assert (r["dim1"], list(r["dim2"]), list(r["dim3"])) == ("", ["a"], ["a", "b"])
    assert (r["l1"], r["l2"], r["d1"], r["d2"]) == (7, None, 1.0, None)
    assert list(r["a1"]) == ["a", "b", "c"]
    assert list(r["a2"]) == [1, 2, 3]
    assert list(r["a3"]) == [1.9, 2.2, 4.3]
    assert list(r["a4"]) == ["a", "b", "foo"]
    assert list(r["a5"]) == ["foo", "a"]
    assert list(r["a6"]) == [1, 2, 7]
    assert list(r["a7"]) == [None, 1, 2]
    assert list(r["a8"]) == [1.2, 2.2, 1.0]
    assert list(r["a9"]) == [None, 1.1, 2.2]
    assert list(r["a10"]) == ["a", "a", "b"]
    assert list(r["a11"]) == [7, None]
    assert list(r["a12"]) == [1.0, None]
    assert (r["a13"], r["a14"], r["a15"], r["a16"]) == (7, 1.0, 7, 1.0)


def test_select_nonconstant_array_expression_multival_superset(spark, foo_catalog):
    """CalciteArraysQueryTest.java
    testSelectNonConstantArrayExpressionFromTableFailForMultival — the
    reference REFUSES (unhandled map function output STRING_ARRAY) because
    CONCAT over an MVD maps per element; honest arrays make CONCAT(dim3,
    'word') a cast-to-string concat, evaluated row-wise (superset)."""
    out = q(spark, foo_catalog, """
        SELECT ARRAY[CONCAT(CAST(dim3 AS VARCHAR), 'word'),'up'] AS arr, dim1
        FROM foo ORDER BY __time LIMIT 2""").collect()
    assert len(out) == 2
    for r in out:
        assert len(r["arr"]) == 2 and r["arr"][1] == "up"


def test_array_prepend_group_by(spark, numfoo_catalog):
    """CalciteArraysQueryTest.java testArrayPrepend — whole-array groups
    (the reference explodes to per-element rows: foo:6, null:2, b:2, ...),
    the mirror of testArrayAppend above."""
    out = q(spark, numfoo_catalog, """
        SELECT ARRAY_PREPEND('foo', dim3) AS a, SUM(cnt) AS c
        FROM druid.numfoo GROUP BY 1 ORDER BY 2 DESC""").collect()
    got = {(tuple(r["a"]) if r["a"] is not None else None, r["c"])
           for r in out}
    assert got == {(("foo", "a", "b"), 1), (("foo", "b", "c"), 1),
                   (("foo", "d"), 1), (("foo", ""), 1), (("foo",), 1),
                   (None, 1)}
