"""Regression tests for the sixth round-6 self-review batch (native
expression semantics vs core/math/expr in the reference):

1. Druid truthiness (Evals.asBoolean): numbers true iff > 0; the string
   'true' alone parses true (Boolean.parseBoolean).  Applied in &&/||/!/
   if/case and in expression FILTERS.
2. `+` concatenates only when BOTH sides are STRING
   (ExprTypeConversion.autoDetect); mixed string/number adds as DOUBLE.
3. `/` over two longs is Java long division (BinDivExpr.evalLong).
4. String literals Java-unescape ('\\t' is a TAB, '\\u0041' is 'A').
5. timestamp_extract EPOCH/MICROSECOND are tz-independent instants.
6. max()/min() return null when EITHER operand is null
   (BivariateMathFunction); greatest/least keep null-skipping.
7. string_to_array follows Java String.split: regex separator, trailing
   empties dropped, '' → [''].
8. human_readable_* scale by unit.
9. ipv4_* dispatch numerically for long inputs and null out invalid
   addresses; ipv4_match is false (not null) for invalid.
10. interval filters on non-time columns compare NUMERICALLY (BigDecimal
    bound filters), not just strictly-integral strings.
"""

import datetime

import pytest

from pyspark.sql import functions as F

from incubator_druid_spark.functions.druid_expr import compile_expr
from incubator_druid_spark.filters.filters import FilterContext, compile_filter


def _eval(spark, expr, data="1 AS one", **tags):
    df = spark.range(1).selectExpr(data)
    col = compile_expr(expr, F.col, **tags)
    return df.select(col.alias("v")).collect()[0]["v"]


def test_druid_truthiness_numbers_and_strings(spark):
    assert _eval(spark, "if(0 - 5, 'yes', 'no')") == "no"   # -5 is falsy
    assert _eval(spark, "if(2, 'yes', 'no')") == "yes"
    assert _eval(spark, "if('true', 'yes', 'no')") == "yes"
    assert _eval(spark, "if('1', 'yes', 'no')") == "no"     # parseBoolean
    assert _eval(spark, "(0 - 5) || 0") is False
    assert _eval(spark, "1 && (0 - 1)") is False


def test_expression_filter_negative_number_is_falsy(spark):
    df = spark.createDataFrame([(5,), (15,)], "x long")
    ctx = FilterContext(df)
    pred = compile_filter({"type": "expression", "expression": "x - 10"},
                          ctx)
    assert [r["x"] for r in df.filter(pred).collect()] == [15]


def test_plus_mixed_string_number_is_double(spark):
    df = spark.createDataFrame([("5", 1.0)], "s string, d double")
    ctx_tags = dict(string_cols={"s"}, numeric_cols={"d"})
    col = compile_expr("s + 1", F.col, **ctx_tags)
    assert df.select(col.alias("v")).collect()[0]["v"] == 6.0
    col = compile_expr("s + 'x'", F.col, **ctx_tags)
    assert df.select(col.alias("v")).collect()[0]["v"] == "5x"
    # unparseable string + number → null
    df2 = spark.createDataFrame([("abc",)], "s string")
    col = compile_expr("s + 1", F.col, string_cols={"s"})
    # other side is a numeric LITERAL → numeric path
    assert df2.select(col.alias("v")).collect()[0]["v"] is None


def test_long_division_truncates(spark):
    assert _eval(spark, "7 / 2") == 3
    assert _eval(spark, "(0 - 7) / 2") == -3
    df = spark.createDataFrame([(9007199254740995,)], "x long")
    col = compile_expr("x / 2", F.col, integral_cols={"x"})
    out = df.select(col.alias("v")).collect()[0]["v"]
    assert out == 4503599627370497  # exact, no double rounding
    # double involvement stays fractional
    assert _eval(spark, "7 / 2.0") == 3.5


def test_string_literal_java_escapes(spark):
    assert _eval(spark, r"'a\tb'") == "a\tb"       # \t IS a tab, not 't'
    assert _eval(spark, r"'A'") == "A"
    assert _eval(spark, r"'a\\b'") == "a\\b"


def test_timestamp_extract_epoch_tz_independent(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 15, 10, 0),)], "t timestamp")
    col = compile_expr(
        "timestamp_extract(t, 'EPOCH', 'America/Los_Angeles')", F.col)
    utc_col = compile_expr("timestamp_extract(t, 'EPOCH')", F.col)
    row = df.select(col.alias("a"), utc_col.alias("b")).collect()[0]
    assert row["a"] == row["b"]  # the instant, not a shifted wall clock
    mcol = compile_expr("timestamp_extract(t, 'MICROSECOND')", F.col)
    assert df.select(mcol.alias("m")).collect()[0]["m"] == row["b"] // 1000


def test_max_min_null_propagate(spark):
    df = spark.createDataFrame([(None, 5.0)], "a double, b double")
    col = compile_expr("max(a, b)", F.col)
    assert df.select(col.alias("v")).collect()[0]["v"] is None
    col = compile_expr("greatest(a, b)", F.col)  # ReduceFunction skips null
    assert df.select(col.alias("v")).collect()[0]["v"] == 5.0


def test_string_to_array_java_split(spark):
    def arr(s):
        df = spark.createDataFrame([(s,)], "s string")
        col = compile_expr("string_to_array(s, ',')", F.col,
                           string_cols={"s"})
        return df.select(col.alias("v")).collect()[0]["v"]
    assert arr("a,b,,") == ["a", "b"]   # trailing empties dropped
    assert arr("a,,b") == ["a", "", "b"]
    assert arr("") == [""]
    assert arr(",,") == []
    # regex separator ('\\d' in the expression text Java-unescapes to \d)
    df = spark.createDataFrame([("a1b22c",)], "s string")
    col = compile_expr(r"string_to_array(s, '\\d+')", F.col,
                       string_cols={"s"})
    assert df.select(col.alias("v")).collect()[0]["v"] == ["a", "b", "c"]


def test_human_readable_formats(spark):
    assert _eval(spark, "human_readable_binary_byte_format(45678)") \
        == "44.61 KiB"
    assert _eval(spark, "human_readable_decimal_byte_format(45678)") \
        == "45.68 KB"
    assert _eval(spark, "human_readable_decimal_format(45678)") == "45.68 K"
    assert _eval(spark, "human_readable_binary_byte_format(500)") \
        == "500.00 B"


def test_ipv4_long_dispatch_and_validation(spark):
    df = spark.createDataFrame([(3232235776,)], "ip long")
    col = compile_expr("ipv4_match(ip, '192.168.0.0/16')", F.col,
                       integral_cols={"ip"})
    assert df.select(col.alias("v")).collect()[0]["v"] is True
    assert _eval(spark, "ipv4_parse('999.1.2.3')") is None
    assert _eval(spark, "ipv4_parse('192.168.0.1')") == 3232235521
    assert _eval(spark, "ipv4_stringify(0 - 1)") is None
    assert _eval(spark, "ipv4_stringify(3232235521)") == "192.168.0.1"
    assert _eval(spark, "ipv4_match('not-an-ip', '192.168.0.0/16')") is False


def test_interval_filter_numeric_on_double_column(spark):
    df = spark.createDataFrame([(1301616000000.0,), (99.0,)], "v double")
    ctx = FilterContext(df)
    pred = compile_filter(
        {"type": "interval", "dimension": "v",
         "intervals": ["2011-03-31T00:00:00Z/2011-04-02T00:00:00Z"]}, ctx)
    got = [r["v"] for r in df.filter(pred).collect()]
    assert got == [1301616000000.0]  # '1.301616E12' matches numerically
