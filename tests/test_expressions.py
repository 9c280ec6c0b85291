"""Druid expression-language compiler tests (math/expr/Function.java,
ApplyFunction.java, query/expression/ macros)."""

import datetime

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.functions.druid_expr import compile_expr


def ev(spark, expression, data=None, schema="x long, y double, s string"):
    df = spark.createDataFrame(data or [(7, 2.5, "hello world")], schema)
    return df.select(compile_expr(expression, F.col).alias("r")).first()["r"]


def test_arithmetic_precedence(spark):
    assert ev(spark, "1 + 2 * 3") == 7
    assert ev(spark, "(1 + 2) * 3") == 9
    assert ev(spark, "2 ^ 3 + 1") == 9.0
    assert ev(spark, "-x + 1") == -6
    assert ev(spark, "x % 4") == 3


def test_comparison_logic(spark):
    assert ev(spark, "x > 5 && y < 3") is True
    assert ev(spark, "x < 5 || y < 3") is True
    assert ev(spark, "!(x == 7)") is False


def test_math_functions(spark):
    assert ev(spark, "abs(0 - x)") == 7
    assert ev(spark, "sqrt(y * 10)") == 5.0
    assert ev(spark, "pow(2, 10)") == 1024.0
    assert ev(spark, "max(x, 10)") == 10
    assert ev(spark, "div(7, 2)") == 3
    assert ev(spark, "safe_divide(1, 0)") is None
    assert ev(spark, "bitwiseAnd(12, 10)") == 8
    assert ev(spark, "bitwiseShiftLeft(1, 4)") == 16


def test_string_functions(spark):
    assert ev(spark, "concat(s, '!')") == "hello world!"
    assert ev(spark, "strlen(s)") == 11
    assert ev(spark, "upper(substring(s, 0, 5))") == "HELLO"
    assert ev(spark, "strpos(s, 'world')") == 6
    assert ev(spark, "replace(s, 'world', 'druid')") == "hello druid"
    assert ev(spark, "regexp_extract(s, '([a-z]+) ([a-z]+)', 2)") == "world"
    # Druid native booleans are LONG 1/0 (ExpressionsTest testContains)
    assert ev(spark, "contains_string(s, 'lo w')") == 1
    assert ev(spark, "lpad('5', 3, '0')") == "005"


def test_conditionals(spark):
    assert ev(spark, "if(x > 5, 'big', 'small')") == "big"
    assert ev(spark, "nvl(null, 'fallback')") == "fallback"
    assert ev(spark, "case_searched(x > 10, 'a', x > 5, 'b', 'c')") == "b"
    assert ev(spark, "case_simple(x, 7, 'seven', 8, 'eight', 'other')") == "seven"
    assert ev(spark, "isnull(null)") is True
    assert ev(spark, "cast(y, 'LONG')") == 2


def test_time_macros(spark):
    t = datetime.datetime(2024, 3, 5, 13, 47, 21)
    df = spark.createDataFrame([(t,)], "t timestamp")

    def evt(e):
        return df.select(compile_expr(e, F.col).alias("r")).first()["r"]

    assert evt("timestamp_floor(t, 'PT1H')") == datetime.datetime(2024, 3, 5, 13)
    assert evt("timestamp_ceil(t, 'P1D')") == datetime.datetime(2024, 3, 6)
    assert evt("timestamp_shift(t, 'P1M', 2)") == datetime.datetime(2024, 5, 5, 13, 47, 21)
    assert evt("timestamp_extract(t, 'HOUR')") == 13
    assert evt("timestamp_extract(t, 'DOY')") == 65
    assert evt("timestamp_format(t, 'yyyy-MM-dd')") == "2024-03-05"
    assert evt("timestamp_to_millis(t)") == int(t.replace(
        tzinfo=datetime.timezone.utc).timestamp() * 1000)


def test_array_functions(spark):
    df = spark.createDataFrame([([1, 2, 3], ["a", "b"])],
                               "xs array<long>, ss array<string>")

    def eva(e):
        return df.select(compile_expr(e, F.col).alias("r")).first()["r"]

    assert eva("array_length(xs)") == 3
    assert eva("array_offset(xs, 0)") == 1
    assert eva("array_ordinal(xs, 3)") == 3
    assert eva("array_contains(xs, 2)") is True
    assert eva("array_to_string(ss, ',')") == "a,b"
    assert eva("array_append(ss, 'c')") == ["a", "b", "c"]
    assert eva("array_slice(xs, 1, 3)") == [2, 3]
    assert eva("array_offset_of(xs, 2)") == 1


def test_higher_order_functions(spark):
    df = spark.createDataFrame([([1, 2, 3, 4],)], "xs array<long>")

    def eva(e):
        return df.select(compile_expr(e, F.col).alias("r")).first()["r"]

    assert eva("map((x) -> x * 2, xs)") == [2, 4, 6, 8]
    assert eva("filter((x) -> x > 2, xs)") == [3, 4]
    assert eva("fold((x, acc) -> x + acc, xs, 0)") == 10
    assert eva("any((x) -> x > 3, xs)") is True
    assert eva("all((x) -> x > 3, xs)") is False


def test_ip_functions(spark):
    assert ev(spark, "ipv4_parse('192.168.0.1')") == 3232235521
    assert ev(spark, "ipv4_stringify(3232235521)") == "192.168.0.1"
    assert ev(spark, "ipv4_match('192.168.1.50', '192.168.0.0/16')") is True
    assert ev(spark, "ipv4_match('10.0.0.1', '192.168.0.0/16')") is False


def test_lookup_expr(spark, foo_catalog):
    df = spark.createDataFrame([("abc",), ("zzz",)], "k string")
    out = df.select(compile_expr("lookup(k, 'lookyloo')", F.col).alias("v"))
    assert [r["v"] for r in out.collect()] == ["xabc", None]


def test_unknown_function_raises(spark):
    with pytest.raises(ValueError, match="unknown druid function"):
        ev(spark, "frobnicate(x)")


def test_extract_reference_quirks(spark):
    """DOW==ISODOW==joda dayOfWeek (Mon=1..Sun=7); EPOCH in seconds;
    MILLISECOND = millis-of-second (TimestampExtractExprMacro.java:113-154)."""
    import datetime
    t = datetime.datetime(2024, 3, 10, 6, 30, 15, 250000)  # a Sunday
    df = spark.createDataFrame([(t,)], "t timestamp")

    def evt(e):
        return df.select(compile_expr(e, F.col).alias("r")).first()["r"]

    assert evt("timestamp_extract(t, 'DOW')") == 7
    assert evt("timestamp_extract(t, 'ISODOW')") == 7
    assert evt("timestamp_extract(t, 'MILLISECOND')") == 250
    assert evt("timestamp_extract(t, 'EPOCH')") == int(t.replace(
        tzinfo=datetime.timezone.utc).timestamp())
    assert evt("timestamp_extract(t, 'DECADE')") == 202
    assert evt("timestamp_extract(t, 'CENTURY')") == 21


def test_array_contains_dispatch(spark):
    """ArrayContainsFunction: array 2nd arg = contains-ALL, scalar =
    membership.  Dispatch comes from parser tags, so parenthesized /
    cast-produced / concat-produced array operands all take the
    contains-all branch."""
    e = lambda x: ev(spark, x)
    assert e("array_contains(['a','b','c'], ['a','c'])") is True
    assert e("array_contains(['a','b','c'], ['a','z'])") is False
    assert e("array_contains(['a','b','c'], 'b')") is True
    assert e("array_contains(['a','b','c'], 'z')") is False
    # parenthesized beyond one level, array(), concat, cast
    assert e("array_contains(['a','b'], ((array('a'))))") is True
    assert e("array_contains([1,2,3], array_concat([1],[3]))") is True
    assert e("array_contains([1,2,3], array_concat([1],[4]))") is False
    assert e("array_contains(['1','2'], cast([1,2], 'STRING_ARRAY'))") is True
    assert e("array_contains(string_to_array('a,b,c', ','), "
             "string_to_array('a,c', ','))") is True
    # scalar produced by a function still routes to membership
    assert e("array_contains(['ab'], concat('a','b'))") is True


def test_millisecond_pmod_pre_1970(spark):
    """Joda millisOfSecond().get() is 0..999 always — pre-1970 timestamps
    must not return signed remainders."""
    t = datetime.datetime(1969, 12, 31, 23, 59, 59, 250000)
    df = spark.createDataFrame([(t,)], "t timestamp")
    r = df.select(compile_expr("timestamp_extract(t, 'MILLISECOND')",
                               F.col).alias("r")).first()["r"]
    assert r == 250


def test_parser_pins_tagged_columns(spark):
    """string_ids/array_ids tag Columns by id(); id() is only unique among
    LIVE objects, so every tagged Column must be kept alive by the parser
    (_pinned) — otherwise CPython recycles a freed tagged id for a later
    unrelated Column and `+` silently turns into concat (or array dispatch
    misfires)."""
    from pyspark.sql import functions as F

    from incubator_druid_spark.functions.druid_expr import (_Parser, _lex,
                                                            registry)

    expr = "concat(s, 'x') + s + array(1,2) + upper(s)"
    p = _Parser(_lex(expr), lambda n: F.col(n), registry())
    p.parse()
    tagged = p.string_ids | p.array_ids
    pinned_ids = {id(c) for c in p._pinned}
    assert tagged, "expression should have produced tagged columns"
    assert tagged <= pinned_ids
