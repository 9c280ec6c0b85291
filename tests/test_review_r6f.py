"""Regression tests for the seventh round-6 self-review batch (SQL layer):

1. SQL comments are protected spans: an apostrophe inside -- or /* */ must
   not shift literal detection and corrupt downstream rewrites.
2. CAST(<timestamp> AS BIGINT) yields epoch MILLIS (Druid's TIMESTAMP
   runtime type), not Spark's seconds.
3. LOOKUP registration escapes quotes in keys/values and sanitizes
   non-identifier lookup names.
4. A registered SQL view referencing sys.* doesn't recurse infinitely.
5. FLOOR(ts TO <bogus>) raises; DATE_TRUNC 'decade'/'century'/'millennium'
   compute instead of returning all-NULL.
6. Duplicate output column names keep both values in array formats.
7. TIME_FORMAT translates Joda 'Y' (year-of-era) — not java.time's
   week-based year.
8. MV_TO_STRING renders null elements as 'null' (String.valueOf).
9. COUNT(DISTINCT <mvd>) FILTER (WHERE ...) plans (filtered aggregation
   over the value universe).
"""

import pytest

from incubator_druid_spark.api import sql_query


def _arr(spark, cat, sql, ctx=None, **body):
    return sql_query({"query": sql, "resultFormat": "array",
                      "context": ctx or {}, **body}, spark, cat)


def test_comment_apostrophe_does_not_break_rewrites(spark, full_catalog):
    rows = _arr(spark, full_catalog, """
        SELECT COUNT(*) AS n FROM foo
        WHERE dim1 <> 'z' /* it's fine */ -- isn't it
    """)
    # two-valued matcher semantics must still apply after the comment
    base = _arr(spark, full_catalog,
                "SELECT COUNT(*) AS n FROM foo WHERE dim1 <> 'z'")
    assert rows == base


def test_cast_time_to_bigint_is_millis(spark, full_catalog):
    rows = _arr(spark, full_catalog,
                "SELECT CAST(__time AS BIGINT) AS t, "
                "CAST(MAX(__time) AS BIGINT) AS mx FROM foo "
                "GROUP BY __time ORDER BY t LIMIT 1")
    assert rows[0][0] == 946684800000  # 2000-01-01 in MILLIS, not seconds
    assert rows[0][1] == 946684800000


def test_lookup_quote_escaping_and_odd_names(spark, full_catalog):
    from incubator_druid_spark.functions import lookups as lk
    saved = (dict(lk._LOOKUPS), dict(lk._DF_LOOKUPS))
    try:
        lk.register_lookup("quoty", {"k1": "O'Brien", "k'2": "x"})
        rows = _arr(spark, full_catalog,
                    "SELECT LOOKUP('k1', 'quoty') AS a, "
                    "LOOKUP('k''2', 'quoty') AS b")
        assert rows[0] == ["O'Brien", "x"]
    finally:
        lk._LOOKUPS.clear()
        lk._LOOKUPS.update(saved[0])
        lk._DF_LOOKUPS.clear()
        lk._DF_LOOKUPS.update(saved[1])
        lk._LOOKUP_DFS.clear()


def test_view_referencing_sys_does_not_recurse(spark, full_catalog):
    from incubator_druid_spark.sql.functions import (drop_sql_view,
                                                     register_sql_view)
    register_sql_view("seg_report", "SELECT * FROM sys.segments")
    try:
        rows = _arr(spark, full_catalog,
                    "SELECT COUNT(*) AS n FROM sys.segments")
        assert rows[0][0] >= 0
        rows = _arr(spark, full_catalog,
                    "SELECT COUNT(*) AS n FROM view.seg_report")
        assert rows[0][0] >= 0
    finally:
        drop_sql_view("seg_report")


def test_floor_to_bogus_unit_raises(spark, full_catalog):
    with pytest.raises(Exception, match="unknown time unit"):
        _arr(spark, full_catalog,
             "SELECT FLOOR(__time TO DECADE) AS d FROM foo LIMIT 1")


def test_date_trunc_decade_century_millennium(spark, full_catalog):
    rows = _arr(spark, full_catalog, """
        SELECT CAST(DATE_TRUNC('decade', __time) AS VARCHAR) AS d,
               CAST(DATE_TRUNC('century', __time) AS VARCHAR) AS c,
               CAST(DATE_TRUNC('millennium', __time) AS VARCHAR) AS m
        FROM foo WHERE dim1 = 'def' LIMIT 1
    """)
    d, c, m = rows[0]
    assert d.startswith("2000-01-01")    # 2001 row? dim1 'def' is 2001
    assert c.startswith("2001-01-01")
    assert m.startswith("2001-01-01")


def test_duplicate_output_columns_array_format(spark, full_catalog):
    rows = _arr(spark, full_catalog,
                "SELECT dim1 AS k, m1 AS k FROM foo "
                "WHERE dim1 = 'def'")
    assert rows[0][0] == "def" and float(rows[0][1]) == 5.0


def test_time_format_joda_capital_y(spark, full_catalog):
    rows = _arr(spark, full_catalog,
                "SELECT TIME_FORMAT(TIMESTAMP '2025-12-29 00:00:00', "
                "'YYYY-MM-dd') AS s")
    assert rows[0][0] == "2025-12-29"  # Joda Y = year-of-era, NOT week-year


def test_mv_to_string_null_elements(spark, full_catalog):
    rows = _arr(spark, full_catalog,
                "SELECT MV_TO_STRING(ARRAY['a', NULL, 'b'], ',') AS s")
    assert rows[0][0] == "a,null,b"


def test_count_distinct_mvd_with_filter_clause(spark, full_catalog):
    rows = _arr(spark, full_catalog,
                "SELECT COUNT(DISTINCT dim2) "
                "FILTER (WHERE dim1 <> 'def') AS n FROM foo")
    # dim2 values over non-'def' rows: {'a', '', 'abc'} minus 'def' row's
    # — the filtered value universe plans and counts
    assert rows[0][0] >= 1
