"""Golden SQL tests — the CalciteParameterQueryTest.java remainder tranche
(round 6): '?' parameters as constants, in filters, TRIM family, typed
TIMESTAMP/DATE binding (epoch-millis and string forms), INFORMATION_SCHEMA,
and the unbound-parameter error contract.

Reference: sql/src/test/java/org/apache/druid/sql/calcite/
CalciteParameterQueryTest.java (0.22.0).  Known fixture deviations, same as
test_golden_sql_r5e.py: our `foo` has no unique_dim1 COMPLEX column and
reports MVDs as ARRAY<VARCHAR> (JDBC 2003) where the reference says VARCHAR,
so the INFORMATION_SCHEMA aggregate values are recomputed over the same
query shape.
"""

import datetime as dt

import pytest

from incubator_druid_spark.api import sql_query


def _pq(spark, cat, sql, params):
    return sql_query({"query": sql, "parameters": params}, spark, cat)


def _p(type_, value):
    return {"type": type_, "value": value}


def test_select_constant_param_gets_constant(spark, foo_catalog):
    """CalciteParameterQueryTest.java:57 testSelectConstantParamGetsConstant
    — SELECT 1 + ? folds to the constant."""
    out = _pq(spark, foo_catalog, "SELECT 1 + ? AS e",
              [_p("INTEGER", 1)])
    assert [r["e"] for r in out] == [2]


def test_params_get_optimized_into_constant(spark, foo_catalog):
    """:83 testParamsGetOptimizedIntoConstant — 1 + ? is a virtual constant
    column; LIMIT ? binds too (ORDER BY __time pins the row the reference
    gets from segment order)."""
    out = _pq(spark, foo_catalog,
              "SELECT 1 + ? AS e, dim1 FROM foo ORDER BY __time LIMIT ?",
              [_p("INTEGER", 1), _p("INTEGER", 1)])
    assert [(r["e"], r["dim1"]) for r in out] == [(2, "")]


def test_parameters_in_select_and_filter(spark, foo_catalog):
    """:109 testParametersInSelectAndFilter — dim2 = '0' matches nothing:
    exp(0) + 10 = 11, SUM of no rows is NULL (SQL null mode)."""
    out = _pq(spark, foo_catalog,
              "SELECT exp(count(*)) + ? AS e, sum(m2) AS s "
              "FROM druid.foo WHERE dim2 = ?",
              [_p("INTEGER", 10), _p("INTEGER", 0)])
    assert [(r["e"], r["s"]) for r in out] == [(11.0, None)]


def test_select_trim_family_with_parameters(spark, foo_catalog):
    """:141 testSelectTrimFamilyWithParameters — TRIM's whacky parse forms
    all bind '?' (BOTH/TRAILING/x FROM y, BTRIM/LTRIM/RTRIM 1- and 2-arg)."""
    out = _pq(spark, foo_catalog, """
        SELECT
        TRIM(BOTH ? FROM ?) AS p0,
        TRIM(TRAILING ? FROM ?) AS p1,
        TRIM(? FROM ?) AS p2,
        TRIM(TRAILING FROM ?) AS p3,
        TRIM(?) AS p4,
        BTRIM(?) AS p5,
        BTRIM(?, ?) AS p6,
        LTRIM(?) AS p7,
        LTRIM(?, ?) AS p8,
        RTRIM(?) AS p9,
        RTRIM(?, ?) AS p10,
        COUNT(*) AS a0
        FROM foo""",
              [_p("VARCHAR", "x"), _p("VARCHAR", "xfoox"),
               _p("VARCHAR", "x"), _p("VARCHAR", "xfoox"),
               _p("VARCHAR", " "), _p("VARCHAR", " foo "),
               _p("VARCHAR", " foo "),
               _p("VARCHAR", " foo "),
               _p("VARCHAR", " foo "),
               _p("VARCHAR", "xfoox"), _p("VARCHAR", "x"),
               _p("VARCHAR", " foo "),
               _p("VARCHAR", "xfoox"), _p("VARCHAR", "x"),
               _p("VARCHAR", " foo "),
               _p("VARCHAR", "xfoox"), _p("VARCHAR", "x")])
    r = out[0]
    assert (r["p0"], r["p1"], r["p2"], r["p3"], r["p4"], r["p5"], r["p6"],
            r["p7"], r["p8"], r["p9"], r["p10"], r["a0"]) == \
        ("foo", "xfoo", "foo", " foo", "foo", "foo", "foo", "foo ", "foox",
         " foo", "xfoo", 6)


def test_params_in_information_schema(spark, foo_catalog):
    """:208 testParamsInInformationSchema — aggregates over JDBC_TYPE with
    bound schema/table names (values per our fixture schema: 93 + 12 +
    2003 + 2003 - 5 + 6 + 8 = 4120 over 7 columns)."""
    out = _pq(spark, foo_catalog, """
        SELECT
          COUNT(JDBC_TYPE) AS c,
          SUM(JDBC_TYPE) AS s,
          CAST(AVG(JDBC_TYPE) AS BIGINT) AS a,
          MIN(JDBC_TYPE) AS mn,
          MAX(JDBC_TYPE) AS mx
        FROM INFORMATION_SCHEMA.COLUMNS
        WHERE TABLE_SCHEMA = ? AND TABLE_NAME = ?""",
              [_p("VARCHAR", "druid"), _p("VARCHAR", "foo")])
    r = out[0]
    assert (r["c"], r["s"], r["a"], r["mn"], r["mx"]) == \
        (7, 4120, 588, -5, 2003)
    # and a bound name that matches nothing
    out = _pq(spark, foo_catalog,
              "SELECT COUNT(JDBC_TYPE) AS c FROM INFORMATION_SCHEMA.COLUMNS "
              "WHERE TABLE_SCHEMA = ? AND TABLE_NAME = ?",
              [_p("VARCHAR", "druid"), _p("VARCHAR", "nope")])
    assert out[0]["c"] == 0


def test_parameters_in_strange_places(spark, foo_catalog):
    """:295 testParametersInStrangePlaces — FILTER(WHERE dim2 <> ?) both in
    the projection and HAVING; <> compiles to Druid's not(selector) which
    matches nulls, and COUNT/COUNT is long division."""
    out = _pq(spark, foo_catalog, """
        SELECT
          dim1,
          COUNT(*) FILTER(WHERE dim2 <> ?)/COUNT(*) AS ratio
        FROM druid.foo
        GROUP BY dim1
        HAVING COUNT(*) FILTER(WHERE dim2 <> ?)/COUNT(*) = ?""",
              [_p("VARCHAR", "a"), _p("VARCHAR", "a"), _p("INTEGER", 1)])
    got = sorted((r["dim1"], r["ratio"]) for r in out)
    assert got == [("10.1", 1), ("2", 1), ("abc", 1), ("def", 1)]


def test_parameters_in_cases(spark, foo_catalog):
    """:339 testParametersInCases — params in simple-CASE arms; only the
    matching arm survives ('foo' → SUM(m1) / 10 = 2.1)."""
    out = _pq(spark, foo_catalog, """
        SELECT
          CASE 'foo'
          WHEN ? THEN SUM(cnt) / CAST(? as INT)
          WHEN ? THEN SUM(m1) / CAST(? as INT)
          WHEN ? THEN SUM(m2) / CAST(? as INT)
          END AS e
        FROM foo""",
              [_p("VARCHAR", "bar"), _p("INTEGER", 10),
               _p("VARCHAR", "foo"), _p("INTEGER", 10),
               _p("VARCHAR", "baz"), _p("INTEGER", 10)])
    assert [r["e"] for r in out] == [pytest.approx(2.1)]


_TS_2999_MILLIS = int(dt.datetime(
    2999, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)


def test_timestamp_parameter_millis(spark, foo_catalog):
    """:373 testTimestamp — a TIMESTAMP parameter given as epoch millis
    becomes the UTC wall-clock literal (SqlParameterizerShuttle.java:61)."""
    out = _pq(spark, foo_catalog,
              "SELECT exp(count(*)) + ? AS e, sum(m2) AS s "
              "FROM druid.foo WHERE __time >= ?",
              [_p("INTEGER", 10), _p("TIMESTAMP", _TS_2999_MILLIS)])
    assert [(r["e"], r["s"]) for r in out] == [(11.0, None)]


def test_timestamp_parameter_string(spark, foo_catalog):
    """:410 testTimestampString — same instant as a 'yyyy-MM-dd HH:mm:ss'
    string."""
    out = _pq(spark, foo_catalog,
              "SELECT exp(count(*)) + ? AS e, sum(m2) AS s "
              "FROM druid.foo WHERE __time >= ?",
              [_p("INTEGER", 10), _p("TIMESTAMP", "2999-01-01 00:00:00")])
    assert [(r["e"], r["s"]) for r in out] == [(11.0, None)]


def test_date_parameter(spark, foo_catalog):
    """:446 testDate — a DATE parameter in a __time comparison."""
    out = _pq(spark, foo_catalog,
              "SELECT exp(count(*)) + ? AS e, sum(m2) AS s "
              "FROM druid.foo WHERE __time >= ?",
              [_p("INTEGER", 10), _p("DATE", "2999-01-01")])
    assert [(r["e"], r["s"]) for r in out] == [(11.0, None)]


def test_doubles(spark, foo_catalog):
    """:483 testDoubles — DOUBLE/FLOAT params against the long cnt column:
    a fractional bound excludes everything; equality on 1.0 matches all."""
    out = _pq(spark, foo_catalog,
              "SELECT COUNT(*) AS c FROM druid.foo "
              "WHERE cnt > ? and cnt < ?",
              [_p("DOUBLE", 1.1), _p("FLOAT", 100000001.0)])
    assert out[0]["c"] == 0
    out = _pq(spark, foo_catalog,
              "SELECT COUNT(*) AS c FROM druid.foo WHERE cnt = ? or cnt = ?",
              [_p("DOUBLE", 1.0), _p("FLOAT", 100000001.0)])
    assert out[0]["c"] == 6


def test_floats(spark, foo_catalog):
    """:532 testFloats — a REAL parameter."""
    out = _pq(spark, foo_catalog,
              "SELECT COUNT(*) AS c FROM druid.foo WHERE cnt = ?",
              [_p("REAL", 1.0)])
    assert out[0]["c"] == 6


def test_longs(spark, numfoo_catalog):
    """:554 testLongs — a BIGINT parameter against the nullable l1."""
    out = _pq(spark, numfoo_catalog,
              "SELECT COUNT(*) AS c FROM druid.numfoo WHERE l1 > ?",
              [_p("BIGINT", 3)])
    assert out[0]["c"] == 2


def test_missing_parameter(spark, numfoo_catalog):
    """:576 testMissingParameter — 'Parameter: [?0] is not bound'."""
    with pytest.raises(ValueError, match=r"Parameter: \[\?0\] is not bound"):
        _pq(spark, numfoo_catalog,
            "SELECT COUNT(*) FROM druid.numfoo WHERE l1 > ?", [])
    # a '?' inside a string literal is data, not a placeholder
    out = _pq(spark, numfoo_catalog,
              "SELECT COUNT(*) AS c FROM druid.numfoo WHERE dim1 = '?'", [])
    assert out[0]["c"] == 0


def test_partially_missing_parameter(spark, numfoo_catalog):
    """:591 testPartiallyMissingParameter — the second '?' is unbound:
    'Parameter: [?1] is not bound'."""
    with pytest.raises(ValueError, match=r"Parameter: \[\?1\] is not bound"):
        _pq(spark, numfoo_catalog,
            "SELECT COUNT(*) FROM druid.numfoo WHERE l1 > ? AND f1 = ?",
            [_p("BIGINT", 3)])
