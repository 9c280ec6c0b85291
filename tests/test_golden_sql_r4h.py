"""Round-4 CalciteQueryTest tranche H — the UNION ALL family: top-level
unions of aggregates, table-appending unions with column mapping, unions
across tables with type coercion, and the shapes Druid's planner REFUSES
(column-count/type mismatch, different per-branch column mapping) that this
engine supports as plain SQL — a documented superset
(sql/src/test/java/org/apache/druid/sql/calcite/CalciteQueryTest.java;
SQL-compatible null mode).

MVD note: this SQL surface keeps MVDs as honest arrays (README compat
table); ports use dim2[0]/dim3[0] where the reference types them VARCHAR."""

import pytest

from incubator_druid_spark.sql.functions import druid_sql


def q(spark, cat, sql):
    return druid_sql(spark, sql, cat)


def rows(df):
    return [tuple(r) for r in df.collect()]


def srows(df):
    return sorted(rows(df), key=lambda t: tuple((x is not None, x)
                                                for x in t))


@pytest.fixture(scope="module")
def union_catalog(spark, foo, foo2, numfoo, tmp_path_factory):
    """foo + foo2 + numfoo in one catalog — the UNION goldens span all
    three reference datasources."""
    from incubator_druid_spark.catalog import Catalog
    base = tmp_path_factory.mktemp("union_ds")
    foo.write.mode("overwrite").parquet(str(base / "foo.parquet"))
    foo2.write.mode("overwrite").parquet(str(base / "foo2.parquet"))
    numfoo.write.mode("overwrite").parquet(str(base / "numfoo.parquet"))
    cat = Catalog(spark)
    cat.register("foo", str(base / "foo.parquet"))
    cat.register("foo2", str(base / "foo2.parquet"))
    cat.register("numfoo", str(base / "numfoo.parquet"))
    return cat


def test_union_all_queries(spark, union_catalog):
    """testUnionAllQueries — three aggregate branches, all 6."""
    assert rows(q(spark, union_catalog, """
        SELECT COUNT(*) AS c FROM foo
        UNION ALL SELECT SUM(cnt) AS c FROM foo
        UNION ALL SELECT COUNT(*) AS c FROM foo""")) == [(6,), (6,), (6,)]


def test_union_all_queries_with_limit(spark, union_catalog):
    """testUnionAllQueriesWithLimit — LIMIT 2 keeps two branches."""
    assert rows(q(spark, union_catalog, """
        SELECT * FROM (
          SELECT COUNT(*) AS c FROM foo
          UNION ALL SELECT SUM(cnt) AS c FROM foo
          UNION ALL SELECT COUNT(*) AS c FROM foo) LIMIT 2""")) \
        == [(6,), (6,)]


def test_union_all_different_tables_with_mapping(spark, union_catalog):
    """testUnionAllDifferentTablesWithMapping — foo ∪ numfoo with explicit
    column projection, filtered and grouped."""
    assert srows(q(spark, union_catalog, """
        SELECT dim1, d2, SUM(m1) AS s, COUNT(*) AS c
        FROM (SELECT dim1, dim2[0] AS d2, m1 FROM foo
              UNION ALL SELECT dim1, dim2[0] AS d2, m1 FROM numfoo)
        WHERE d2 = 'a' OR d2 = 'def'
        GROUP BY 1, 2""")) == [("", "a", 2.0, 2), ("1", "a", 8.0, 2)]


def test_union_all_tables_column_type_mismatch_float_long(
        spark, union_catalog):
    """testUnionAllTablesColumnTypeMismatchFloatLong — foo2.m1 is DOUBLE,
    foo.m1 FLOAT; the union coerces and aggregates fine."""
    assert srows(q(spark, union_catalog, """
        SELECT dim1, d2, SUM(m1) AS s, COUNT(*) AS c
        FROM (SELECT dim1, dim2 AS d2, m1 FROM foo2
              UNION ALL SELECT dim1, dim2[0] AS d2, m1 FROM foo)
        WHERE d2 = 'a' OR d2 = 'en'
        GROUP BY 1, 2""")) == [("", "a", 1.0, 1), ("1", "a", 4.0, 1),
                               ("druid", "en", 1.0, 1)]


def test_union_all_tables_column_type_mismatch_string_long(
        spark, union_catalog):
    """testUnionAllTablesColumnTypeMismatchStringLong — SUPERSET: the
    reference's planner refuses a LONG∪STRING column union
    (SqlPlanningException); with an explicit cast the SQL is well-defined
    and this engine computes it."""
    assert srows(q(spark, union_catalog, """
        SELECT d3, d2, SUM(m1) AS s, COUNT(*) AS c
        FROM (SELECT CAST(dim3 AS VARCHAR) AS d3, dim2 AS d2, m1 FROM foo2
              UNION ALL SELECT dim3[0] AS d3, dim2[0] AS d2, m1 FROM foo)
        WHERE d2 = 'a' OR d2 = 'en'
        GROUP BY 1, 2""")) == [("", "a", 4.0, 1), ("11", "en", 1.0, 1),
                               ("a", "a", 1.0, 1)]


def test_union_all_tables_when_mapping_is_required(spark, union_catalog):
    """testUnionAllTablesWhenMappingIsRequired — SUPERSET: the reference
    refuses unions whose branches project different column names onto one
    output (it only appends same-named table columns); plain SQL allows
    it: dim1-from-foo ∪ dim2-from-numfoo."""
    assert srows(q(spark, union_catalog, """
        SELECT c, COUNT(*) AS n
        FROM (SELECT dim1 AS c, m1 FROM foo
              UNION ALL SELECT dim2[0] AS c, m1 FROM numfoo)
        WHERE c = 'a' OR c = 'def'
        GROUP BY 1""")) == [("a", 2), ("def", 1)]


def test_union_all_tables_when_cast_and_mapping_is_required(
        spark, union_catalog):
    """testUnionAllTablesWhenCastAndMappingIsRequired — SUPERSET (see
    above) with a LONG→VARCHAR cast in the second branch."""
    assert srows(q(spark, union_catalog, """
        SELECT c, COUNT(*) AS n
        FROM (SELECT dim1 AS c, m1 FROM foo
              UNION ALL SELECT CAST(cnt AS VARCHAR) AS c, m1 FROM numfoo)
        WHERE c = 'a' OR c = 'def'
        GROUP BY 1""")) == [("def", 1)]


def test_union_all_same_table_twice(spark, union_catalog):
    """testUnionAllSameTableTwice — self-union doubles every group."""
    assert srows(q(spark, union_catalog, """
        SELECT dim1, d2, SUM(m1) AS s, COUNT(*) AS c
        FROM (SELECT dim1, dim2[0] AS d2, m1 FROM foo
              UNION ALL SELECT dim1, dim2[0] AS d2, m1 FROM foo)
        WHERE d2 = 'a' OR d2 = 'def'
        GROUP BY 1, 2""")) == [("", "a", 2.0, 2), ("1", "a", 8.0, 2)]


def test_union_all_same_table_twice_with_same_mapping(spark, union_catalog):
    """testUnionAllSameTableTwiceWithSameMapping — identical projections
    union fine."""
    assert srows(q(spark, union_catalog, """
        SELECT dim1, d2, SUM(m1) AS s, COUNT(*) AS c
        FROM (SELECT dim1, dim2[0] AS d2, m1 FROM foo
              UNION ALL SELECT dim1, dim2[0] AS d2, m1 FROM foo)
        WHERE d2 = 'a' OR d2 = 'def'
        GROUP BY 1, 2""")) == [("", "a", 2.0, 2), ("1", "a", 8.0, 2)]


def test_union_all_same_table_three_times_with_same_mapping(
        spark, union_catalog):
    """testUnionAllSameTableThreeTimesWithSameMapping — triple union."""
    assert srows(q(spark, union_catalog, """
        SELECT dim1, d2, SUM(m1) AS s, COUNT(*) AS c
        FROM (SELECT dim1, dim2[0] AS d2, m1 FROM foo
              UNION ALL SELECT dim1, dim2[0] AS d2, m1 FROM foo
              UNION ALL SELECT dim1, dim2[0] AS d2, m1 FROM foo)
        WHERE d2 = 'a' OR d2 = 'def'
        GROUP BY 1, 2""")) == [("", "a", 3.0, 3), ("1", "a", 12.0, 3)]


def test_union_all_same_table_twice_with_different_mapping(
        spark, union_catalog):
    """testUnionAllSameTableTwiceWithDifferentMapping — SUPERSET: the
    reference refuses swapping columns between branches of a table union;
    plain SQL computes it (dim1/dim2 swapped in branch two)."""
    assert srows(q(spark, union_catalog, """
        SELECT dim1, d2, SUM(m1) AS s, COUNT(*) AS c
        FROM (SELECT dim1, dim2[0] AS d2, m1 FROM foo
              UNION ALL SELECT dim2[0] AS dim1, dim1 AS d2, m1 FROM foo)
        WHERE d2 = 'a' OR d2 = 'def'
        GROUP BY 1, 2""")) == [("", "a", 1.0, 1), ("1", "a", 4.0, 1),
                               ("abc", "def", 5.0, 1)]
