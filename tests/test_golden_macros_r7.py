"""Expression-macro goldens — the regexp/contains/trim matrices from
processing/src/test/java/org/apache/druid/query/expression/
RegexpExtractExprMacroTest.java, RegexpLikeExprMacroTest.java,
ContainsExprMacroTest.java, CaseInsensitiveExprMacroTest.java and
TrimExprMacroTest.java, run through the native expression compiler.

SQL null mode throughout: a NULL or non-literal pattern/substring raises
('pattern must be a string literal'), an empty extracted group is null
(NullHandling.emptyToNullIfNeeded), and a null input matches nothing."""

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.functions.druid_expr import compile_expr


def ev(spark, expression, a="foo"):
    df = spark.createDataFrame([(a,)], "a string")
    col = compile_expr(expression, F.col, {"a"})
    return df.select(col.alias("r")).first()["r"]


# -- regexp_extract (RegexpExtractExprMacroTest) -----------------------------

def test_regexp_extract_match(spark):
    assert ev(spark, "regexp_extract(a, 'f(.o)')") == "foo"        # testMatch
    assert ev(spark, "regexp_extract(a, 'f(.o)', 0)") == "foo"     # testMatchGroup0
    assert ev(spark, "regexp_extract(a, 'f(.o)', 1)") == "oo"      # testMatchGroup1
    assert ev(spark, "regexp_extract(a, '.o$')") == "oo"           # testMatchInMiddle


def test_regexp_extract_match_group2_raises(spark):
    """testMatchGroup2 — 'No group 2'."""
    with pytest.raises(Exception):
        ev(spark, "regexp_extract(a, 'f(.o)', 2)")


def test_regexp_extract_no_match(spark):
    assert ev(spark, "regexp_extract(a, 'f(.x)')") is None         # testNoMatch


def test_regexp_extract_empty_pattern(spark):
    """testEmptyStringPattern — the empty extracted group is null in SQL
    null mode (emptyToNullIfNeeded(''))."""
    assert ev(spark, "regexp_extract(a, '')") is None
    assert ev(spark, "regexp_extract(a, '')", a=None) is None  # ...OnNull


def test_regexp_extract_pattern_must_be_literal(spark):
    """testNullPattern / testNumericPattern / testNonLiteralPattern."""
    for bad in ("null", "1", "a"):
        with pytest.raises(Exception):
            ev(spark, f"regexp_extract(a, {bad})")


def test_regexp_extract_arg_count(spark):
    for expr in ("regexp_extract()", "regexp_extract('a', 'b', 'c', 'd')"):
        with pytest.raises(Exception):
            ev(spark, expr)


# -- regexp_like (RegexpLikeExprMacroTest) -----------------------------------

def test_regexp_like_match(spark):
    assert ev(spark, "regexp_like(a, 'f.o')") == 1                 # testMatch
    assert ev(spark, "regexp_like(a, 'f.x')") == 0                 # testNoMatch
    assert ev(spark, "regexp_like(a, '')") == 1                    # testEmptyStringPattern
    assert ev(spark, "regexp_like(a, '')", a="") == 1  # ...OnEmptyString
    # null input matches nothing (false, not null)
    assert ev(spark, "regexp_like(a, 'f.o')", a=None) == 0


def test_regexp_like_pattern_must_be_literal(spark):
    with pytest.raises(Exception):
        ev(spark, "regexp_like(a, null)")


def test_regexp_like_arg_count(spark):
    for expr in ("regexp_like()", "regexp_like('a', 'b', 'c')"):
        with pytest.raises(Exception):
            ev(spark, expr)


# -- contains_string (ContainsExprMacroTest) ---------------------------------

def test_contains_string(spark):
    assert ev(spark, "contains_string(a, 'oba')", a="foobar") == 1  # testMatch
    assert ev(spark, "contains_string(a, 'bar')") == 0              # testNoMatch
    assert ev(spark, "contains_string(a, '')") == 1     # testEmptyStringSearch
    assert ev(spark, "contains_string(a, '')", a="") == 1  # ...OnEmptyString
    # case matters
    assert ev(spark, "contains_string(a, 'OBA')", a="foobar") == 0


def test_contains_string_null_search_raises(spark):
    """testNullSearch — SQL mode: 'substring must be a string literal'."""
    with pytest.raises(Exception):
        ev(spark, "contains_string(a, null)")


def test_contains_string_arg_count(spark):
    for expr in ("contains_string()", "contains_string('a', 'b', 'c')"):
        with pytest.raises(Exception):
            ev(spark, expr)


# -- icontains_string (CaseInsensitiveExprMacroTest) -------------------------

def test_icontains_string(spark):
    assert ev(spark, "icontains_string(a, 'OBA')", a="foobar") == 1
    assert ev(spark, "icontains_string(a, 'oba')", a="FOOBAR") == 1
    assert ev(spark, "icontains_string(a, 'bar')") == 0             # testNoMatch
    assert ev(spark, "icontains_string(a, '')") == 1
    assert ev(spark, "icontains_string(a, '')", a="") == 1


def test_icontains_string_null_search_raises(spark):
    with pytest.raises(Exception):
        ev(spark, "icontains_string(a, null)")


def test_icontains_string_arg_count(spark):
    for expr in ("icontains_string()", "icontains_string('a', 'b', 'c')"):
        with pytest.raises(Exception):
            ev(spark, expr)


# -- trim family (TrimExprMacroTest) -----------------------------------------

def test_trim(spark):
    assert ev(spark, "trim(a)", a="  foo  ") == "foo"
    assert ev(spark, "ltrim(a)", a="  foo  ") == "foo  "
    assert ev(spark, "rtrim(a)", a="  foo  ") == "  foo"
    assert ev(spark, "trim(a)", a=None) is None
