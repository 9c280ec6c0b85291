"""SqlResourceTest ports (sql/src/test/java/org/apache/druid/sql/http/
SqlResourceTest.java) — the /druid/v2/sql surface: result formats with and
without headers, timestamp rendering, field aliasing, unicode round-trip,
and the error paths.  The engine analog is ``api.sql_query`` (no HTTP
transport; a 4xx in the reference is a raised exception here).

Adaptations, documented per the porting convention:
  * The reference's `SELECT *` format tests read foo's MVD dim3 as a JSON
    STRING ("[\"a\",\"b\"]") because Calcite exposes MVDs as VARCHAR, and
    carry an opaque unique_dim1 HLL column.  This engine returns true
    ARRAY columns for MVDs and has no per-row HLL complex column, so the
    format ports select the scalar columns (the format CONTRACT — shapes,
    headers, null cells, terminators, timestamp rendering — is what these
    tests pin).
  * Reference LIMIT-without-ORDER relies on segment order; an ORDER BY
    __time pins the same two rows deterministically.
  * testFieldAliasing* use dim2 (scalar 'a' under Calcite); dim1 plays
    that role here since dim2 is a true array (see above).
  * testTooManyRequests (laning 429) is covered by
    test_api.py::test_result_cache_and_scheduling_context; testUnauthorized
    needs the basic-security authorizer (no ACL model here, skipped like
    the rest of that family); testQueryTimeoutException and
    testResourceLimitExceeded were ported in earlier rounds
    (test_api.py::test_query_timeout_cancels_job, groupBy resource-limit
    guards).

The expected rows mirror CalciteTests ROWS1: 2000-01-01 (dim1 '', m1 1.0)
and 2000-01-02 (dim1 '10.1', m1 2.0)."""

from __future__ import annotations

import json

import pytest

from incubator_druid_spark.api import sql_query

Q2 = ("SELECT __time, cnt, dim1, m1, m2, "
      "CASE dim1 WHEN 'nope' THEN dim1 END AS e "
      "FROM druid.foo ORDER BY __time LIMIT 2")
HDR = ["__time", "cnt", "dim1", "m1", "m2", "e"]
ROW1 = ["2000-01-01T00:00:00.000Z", 1, "", 1.0, 1.0, None]
ROW2 = ["2000-01-02T00:00:00.000Z", 1, "10.1", 2.0, 2.0, None]


def _post(spark, cat, sql, **kw):
    return sql_query({"query": sql, **kw}, spark, cat)


def test_count_star(spark, foo_catalog):
    """SqlResourceTest.java testCountStar."""
    rows = _post(spark, foo_catalog,
                 "SELECT COUNT(*) AS cnt FROM druid.foo")
    assert rows == [{"cnt": 6}]


def test_count_star_extended_characters(spark, foo_catalog):
    """SqlResourceTest.java testCountStarExtendedCharacters — a Hangul
    filter literal survives the whole request pipeline (the reference
    filters its lotsocolumns fixture; an inline VALUES table carries the
    same literal here)."""
    rows = _post(spark, foo_catalog,
                 "SELECT COUNT(*) AS cnt FROM (VALUES "
                 "('ㅑ ㅓ ㅕ ㅗ ㅛ ㅜ ㅠ ㅡ ㅣ'), ('other')) t(s) "
                 "WHERE s = 'ㅑ ㅓ ㅕ ㅗ ㅛ ㅜ ㅠ ㅡ ㅣ'")
    assert rows == [{"cnt": 1}]


def test_field_aliasing_select(spark, foo_catalog):
    """SqlResourceTest.java testFieldAliasingSelect (dim1 for dim2)."""
    rows = _post(spark, foo_catalog,
                 'SELECT dim1 "x", dim1 "y" FROM druid.foo '
                 "WHERE dim1 = 'abc' LIMIT 1")
    assert rows == [{"x": "abc", "y": "abc"}]


def test_field_aliasing_group_by(spark, foo_catalog):
    """SqlResourceTest.java testFieldAliasingGroupBy (dim1 for dim2;
    SQL null mode: '' and NULL group separately... dim1 has no nulls in
    ROWS1, so the six distinct values come back)."""
    rows = _post(spark, foo_catalog,
                 'SELECT dim1 "x", dim1 "y" FROM druid.foo '
                 "GROUP BY dim1 ORDER BY dim1")
    assert rows[0] == {"x": "", "y": ""}
    assert {"x": "abc", "y": "abc"} in rows


def test_timestamps_in_response(spark, foo_catalog):
    """SqlResourceTest.java testTimestampsInResponse — instants render
    with exactly three fractional digits and a Z suffix."""
    rows = _post(spark, foo_catalog,
                 "SELECT __time, CAST(__time AS DATE) AS t2 "
                 "FROM druid.foo ORDER BY __time LIMIT 1")
    assert rows == [{"__time": "2000-01-01T00:00:00.000Z",
                     "t2": "2000-01-01T00:00:00.000Z"}]


def test_timestamps_in_response_la_timezone(spark, foo_catalog):
    """SqlResourceTest.java testTimestampsInResponseLosAngelesTimeZone —
    sqlTimeZone renders the same instant in LA wall-clock."""
    rows = _post(spark, foo_catalog,
                 "SELECT __time, CAST(__time AS DATE) AS t2 "
                 "FROM druid.foo ORDER BY __time LIMIT 1",
                 context={"sqlTimeZone": "America/Los_Angeles"})
    assert rows == [{"__time": "1999-12-31T16:00:00.000-08:00",
                     "t2": "1999-12-31T00:00:00.000-08:00"}]


def test_timestamps_in_response_with_nulls(spark, foo_catalog):
    """SqlResourceTest.java testTimestampsInResponseWithNulls — SQL null
    mode: a filtered MAX with no matching rows is null, not Long.MIN."""
    rows = _post(spark, foo_catalog,
                 "SELECT MAX(__time) AS t1, MAX(__time) "
                 "FILTER(WHERE dim1 = 'non_existing') AS t2 FROM druid.foo")
    assert rows == [{"t1": "2001-01-03T00:00:00.000Z", "t2": None}]


def test_timestamps_with_parameterized_limit(spark, foo_catalog):
    """SqlResourceTest.java testTimestampsInResponseWithParameterizedLimit."""
    rows = _post(spark, foo_catalog,
                 "SELECT __time, CAST(__time AS DATE) AS t2 "
                 "FROM druid.foo ORDER BY __time LIMIT ?",
                 parameters=[{"type": "INTEGER", "value": 1}])
    assert rows == [{"__time": "2000-01-01T00:00:00.000Z",
                     "t2": "2000-01-01T00:00:00.000Z"}]


def test_object_result_format(spark, foo_catalog):
    """SqlResourceTest.java testObjectResultFormat."""
    rows = _post(spark, foo_catalog, Q2, resultFormat="object")
    assert rows == [dict(zip(HDR, ROW1)), dict(zip(HDR, ROW2))]


def test_array_result_format(spark, foo_catalog):
    """SqlResourceTest.java testArrayResultFormat (+WithHeader)."""
    rows = _post(spark, foo_catalog, Q2, resultFormat="array")
    assert rows == [ROW1, ROW2]
    rows = _post(spark, foo_catalog, Q2, resultFormat="array", header=True)
    assert rows == [HDR, ROW1, ROW2]


def test_array_lines_result_format(spark, foo_catalog):
    """SqlResourceTest.java testArrayLinesResultFormat — one JSON array
    per line, two trailing blank lines (writeResponseEnd's truncation
    marker)."""
    resp = _post(spark, foo_catalog, Q2, resultFormat="arrayLines")
    lines = resp.split("\n")
    assert len(lines) == 4
    assert json.loads(lines[0]) == ROW1
    assert json.loads(lines[1]) == ROW2
    assert lines[2] == "" and lines[3] == ""


def test_array_lines_result_format_with_header(spark, foo_catalog):
    """SqlResourceTest.java testArrayLinesResultFormatWithHeader."""
    resp = _post(spark, foo_catalog, Q2, resultFormat="arrayLines",
                 header=True)
    lines = resp.split("\n")
    assert len(lines) == 5
    assert json.loads(lines[0]) == HDR
    assert json.loads(lines[1]) == ROW1
    assert json.loads(lines[2]) == ROW2
    assert lines[3] == "" and lines[4] == ""


def test_object_lines_result_format(spark, foo_catalog):
    """SqlResourceTest.java testObjectLinesResultFormat."""
    resp = _post(spark, foo_catalog, Q2, resultFormat="objectLines")
    lines = resp.split("\n")
    assert len(lines) == 4
    assert json.loads(lines[0]) == dict(zip(HDR, ROW1))
    assert json.loads(lines[1]) == dict(zip(HDR, ROW2))
    assert lines[2] == "" and lines[3] == ""


def test_csv_result_format(spark, foo_catalog):
    """SqlResourceTest.java testCsvResultFormat (+WithHeaders) — '\\n'
    line endings, null cells empty, blank-line terminator."""
    resp = _post(spark, foo_catalog, Q2, resultFormat="csv")
    lines = resp.split("\n")
    assert lines[0] == "2000-01-01T00:00:00.000Z,1,,1.0,1.0,"
    assert lines[1] == "2000-01-02T00:00:00.000Z,1,10.1,2.0,2.0,"
    assert lines[2] == "" and lines[3] == ""
    resp = _post(spark, foo_catalog, Q2, resultFormat="csv", header=True)
    assert resp.split("\n")[0] == "__time,cnt,dim1,m1,m2,e"


def test_cannot_parse(spark, foo_catalog):
    """SqlResourceTest.java testCannotParse — invalid SQL is a clean
    error (the reference's 400 SqlParseException)."""
    with pytest.raises(Exception):
        _post(spark, foo_catalog, "SELECT WHERE FROM !!!")


def test_cannot_validate(spark, foo_catalog):
    """SqlResourceTest.java testCannotValidate — an unknown column is a
    validation error (400 ValidationException)."""
    with pytest.raises(Exception):
        _post(spark, foo_catalog,
              "SELECT no_such_column FROM druid.foo")


def test_unsupported_query_throws(spark, foo_catalog):
    """SqlResourceTest.java testUnsupportedQueryThrowsException — a query
    over a nonexistent datasource fails cleanly."""
    with pytest.raises(Exception):
        _post(spark, foo_catalog, "SELECT * FROM druid.no_such_table")


def test_explain_count_star(spark, foo_catalog):
    """SqlResourceTest.java testExplainCountStar — EXPLAIN PLAN FOR
    returns one (PLAN, RESOURCES) row; RESOURCES names foo."""
    rows = _post(spark, foo_catalog,
                 "EXPLAIN PLAN FOR SELECT COUNT(*) AS cnt FROM druid.foo")
    assert len(rows) == 1
    res = json.loads(rows[0]["RESOURCES"])
    assert {"name": "foo", "type": "DATASOURCE"} in res
    assert rows[0]["PLAN"]
