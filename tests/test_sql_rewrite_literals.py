"""The SQL rewriter's boolean-matcher (<>/!=) and MVD comparison rewrites
must be string-literal-safe and context-aware:

- a quoted literal CONTAINING an `id <> '...'` shape passes through
  verbatim (regex rewrites never touch data);
- in a projection context (`SELECT dim <> 'z' AS flag`) Druid's
  sql-compatible `!=` is an EXPRESSION yielding NULL for NULL input
  (ExpressionVirtualColumn three-valued semantics), while in filter
  contexts (WHERE/HAVING/ON/WHEN) it plans as not(selector) — a two-valued
  ValueMatcher that matches nulls (CalciteQueryTest testCountStarOnView).

Reference: sql/src/main/java/org/apache/druid/sql/calcite/expression/
Expressions.java (filter vs expression planning split)."""

from incubator_druid_spark.sql.functions import druid_sql


def q1(spark, cat, sql):
    return tuple(druid_sql(spark, sql, cat).first())


def test_literal_containing_neq_shape_untouched(spark, foo_catalog):
    # The advisor's verified corruption case: 'x <> ''y''' is DATA.
    assert q1(spark, foo_catalog,
              "SELECT 'x <> ''y''' AS s FROM foo LIMIT 1") == ("x <> 'y'",)


def test_literal_containing_mvd_eq_shape_untouched(spark, foo_catalog):
    # dim2 is an MVD column; a literal containing `dim2 = 'a'` is DATA.
    assert q1(spark, foo_catalog,
              "SELECT 'dim2 = ''a''' AS s FROM foo LIMIT 1") == ("dim2 = 'a'",)


def test_projection_neq_is_three_valued(spark, foo_catalog):
    # dim1 = '' row: '' <> 'z' is TRUE; but a NULL operand projects NULL.
    # numeric-string col dim1 has no nulls in foo, so build one via NULLIF.
    got = q1(spark, foo_catalog, """
        SELECT COUNT(*) AS total,
               COUNT(CASE WHEN NULLIF(dim1, '') <> 'z' THEN 1 END) AS t
        FROM foo""")
    # 6 rows; NULLIF makes one NULL → expression yields NULL there (not
    # TRUE), CASE counts only the 5 definite rows.
    assert got == (6, 5)


def test_filter_neq_is_two_valued(spark, foo_catalog):
    # WHERE context stays a matcher: NULL rows MATCH <> 'z'
    # (testCountStarOnView semantics).
    # Bare-identifier form is the rewritten (matcher) path: all 6 rows.
    got = q1(spark, foo_catalog,
             "SELECT COUNT(*) AS c FROM foo WHERE dim1 <> 'z'")
    assert got == (6,)
    # Non-bare shapes (function call on the left) stay on Spark's
    # three-valued <>: the NULL row drops.  Documented limitation — Druid
    # would virtual-column + matcher this too.
    got2 = q1(spark, foo_catalog,
              "SELECT COUNT(*) AS c FROM foo WHERE NULLIF(dim1, '') <> 'z'")
    assert got2 == (5,)


def test_where_neq_after_and_still_rewritten(spark, foo_catalog):
    got = q1(spark, foo_catalog, """
        SELECT COUNT(*) AS c FROM foo
        WHERE cnt = 1 AND dim1 <> 'z'""")
    assert got == (6,)
