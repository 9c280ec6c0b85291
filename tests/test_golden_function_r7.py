"""FunctionTest goldens — the remaining unported families from
core/src/test/java/org/apache/druid/math/expr/FunctionTest.java: the
case_simple/case_searched matrices, string basics (lower/upper/strlen/
substring/replace/lpad/rpad), isnull/notnull, the full round() matrix
(long/double/float, NaN/Infinity clamping, extreme longs, invalid second
argument), greatest/least type widening, bitwise string dispatch, and the
array constructor/contains/overlap/set_add/cast families.

Bindings mirror FunctionTest.setup(): x='foo', y=2L, z=3.1, d=34.56,
f=12.34f, maxLong/minLong, nan/inf, o=0, od=0.0, a/b/c arrays."""

import math

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.functions.druid_expr import compile_expr

SCHEMA = ("x string, y long, z double, d double, maxLong long, "
          "minLong long, f float, nan double, inf double, o long, "
          "od double, a array<string>, b array<long>, c array<double>")
ROW = ("foo", 2, 3.1, 34.56, 2**63 - 1, -(2**63), 12.34, float("nan"),
       float("inf"), 0, 0.0, ["foo", "bar", "baz", "foobar"],
       [1, 2, 3, 4, 5], [3.1, 4.2, 5.3])
STR_COLS = {"x"}
INT_COLS = {"y", "maxLong", "minLong", "o"}
NUM_COLS = {"z", "d", "f", "nan", "inf", "od"}
ARR_COLS = {"a", "b", "c"}


def ev(spark, expression):
    df = spark.createDataFrame([ROW], SCHEMA)
    col = compile_expr(expression, F.col, STR_COLS, ARR_COLS, INT_COLS,
                       NUM_COLS)
    return df.select(col.alias("r")).first()["r"]


def test_case_simple(spark):
    assert ev(spark, "case_simple(x,'baz','is baz','foo','is foo','is other')") == "is foo"
    assert ev(spark, "case_simple(x,'baz','is baz','bar','is bar','is other')") == "is other"
    assert ev(spark, "case_simple(y,2,'is 2',3,'is 3','is other')") == "is 2"
    assert ev(spark, "case_simple(z,2,'is 2',3,'is 3','is other')") == "is other"


def test_case_searched(spark):
    assert ev(spark, "case_searched(x=='baz','is baz',x=='foo','is foo','is other')") == "is foo"
    assert ev(spark, "case_searched(y==2,'is 2',y==3,'is 3','is other')") == "is 2"
    assert ev(spark, "case_searched(z==2,'is 2',z==3,'is 3','is other')") == "is other"


def test_lower_upper_strlen_substring_replace(spark):
    assert ev(spark, "lower('FOO')") == "foo"
    assert ev(spark, "upper(x)") == "FOO"
    assert ev(spark, "strlen(x)") == 3
    assert ev(spark, "strlen(null)") is None
    assert ev(spark, "substring(x, 1, 2)") == "oo"
    assert ev(spark, "replace(x, 'oo', 'ab')") == "fab"


def test_isnull_notnull(spark):
    assert ev(spark, "isnull(null)") == 1
    assert ev(spark, "isnull('abc')") == 0
    assert ev(spark, "notnull(null)") == 0
    assert ev(spark, "notnull('abc')") == 1


def test_lpad_rpad(spark):
    """testLpad/testRpad — the scalar subset (SQL null mode: negative
    length is '', null pad is null, empty pad truncates-only)."""
    assert ev(spark, "lpad(x, 5, 'ab')") == "abfoo"
    assert ev(spark, "lpad(x, 4, 'ab')") == "afoo"
    assert ev(spark, "lpad(x, 2, 'ab')") == "fo"
    assert ev(spark, "lpad(null, 5, 'ab')") is None
    assert ev(spark, "lpad(x, 2, null)") is None
    assert ev(spark, "rpad(x, 5, 'ab')") == "fooab"
    assert ev(spark, "rpad(x, 4, 'ab')") == "fooa"
    assert ev(spark, "rpad(x, 2, 'ab')") == "fo"
    assert ev(spark, "rpad(null, 5, 'ab')") is None
    assert ev(spark, "rpad(x, 2, null)") is None


def test_round_with_long(spark):
    assert ev(spark, "round(y)") == 2
    assert ev(spark, "round(y, 2)") == 2
    assert ev(spark, "round(y, -1)") == 0


def test_round_with_double(spark):
    assert ev(spark, "round(d)") == 35.0
    assert ev(spark, "round(d, 2)") == pytest.approx(34.56)
    assert ev(spark, "round(d, 1)") == pytest.approx(34.6)
    assert ev(spark, "round(d, -1)") == 30.0


def test_round_with_column_scale(spark):
    """round(d, y) — a NON-literal scale argument (testRoundWithDouble's
    'round(d, y)' row) scales arithmetically."""
    assert ev(spark, "round(d, y)") == pytest.approx(34.56)
    assert ev(spark, "round(f, y)") == pytest.approx(12.34, abs=1e-5)


def test_round_with_float(spark):
    assert ev(spark, "round(f)") == 12.0
    assert ev(spark, "round(f, 2)") == pytest.approx(12.34, abs=1e-5)
    assert ev(spark, "round(f, 1)") == pytest.approx(12.3, abs=1e-5)
    assert ev(spark, "round(f, -1)") == 10.0


def test_round_with_non_numeric_values(spark):
    """testRoundWithNonNumericValuesShouldReturn0 — NaN rounds to 0,
    infinities clamp to ±Double.MAX_VALUE."""
    maxv = 1.7976931348623157e308
    assert ev(spark, "round(nan)") == 0.0
    assert ev(spark, "round(nan, 5)") == 0.0
    assert ev(spark, "round(inf)") == maxv
    assert ev(spark, "round(inf, 4)") == maxv
    assert ev(spark, "round(-inf)") == -maxv
    assert ev(spark, "round(-inf, 3)") == -maxv
    # divisions by zero are NULL under the engine's two-mode-identical
    # division (documented adaptation: the reference's 0/0.0 is NaN → 0,
    # 1/0.0 is Infinity → MAX_VALUE; here both are null-in, null-out)
    assert ev(spark, "round(0/od)") is None


def test_round_with_extreme_numbers(spark):
    assert ev(spark, "round(maxLong)") == 2**63 - 1
    assert ev(spark, "round(minLong)") == -(2**63)


def test_round_invalid_input_is_null(spark):
    """testRoundWithNullValueOrInvalid (SQL mode): strings and arrays
    round to null."""
    assert ev(spark, "round(null)") is None
    assert ev(spark, "round(x)") is None
    assert ev(spark, "round(a)") is None
    assert ev(spark, "round(b)") is None
    assert ev(spark, "round(c)") is None


def test_round_invalid_second_argument(spark):
    """testRoundWithInvalidSecondArgument — non-integer scale raises."""
    for bad in ("1.2", "'x'"):
        with pytest.raises(Exception):
            ev(spark, f"round(d, {bad})")


def test_greatest(spark):
    assert ev(spark, "greatest(y, 0)") == 2
    assert ev(spark, "greatest(34.0, z, 5.0, 767.0)") == 767.0
    assert ev(spark, "greatest('B', x, 'A')") == "foo"
    # different types: any string widens the reduction to string compare
    assert ev(spark, "greatest(-1, z, 'A')") == "A"
    assert ev(spark, "greatest(-1, z)") == 3.1
    assert ev(spark, "greatest(1, 'A')") == "A"
    # null handling: nulls are skipped
    assert ev(spark, "greatest(null, null)") is None
    assert ev(spark, "greatest(1, null, 'A')") == "A"


def test_least(spark):
    assert ev(spark, "least(y, 0)") == 0
    assert ev(spark, "least(34.0, z, 5.0, 767.0)") == 3.1
    assert ev(spark, "least('B', x, 'A')") == "A"
    assert ev(spark, "least(-1, z, 'A')") == "-1"
    assert ev(spark, "least(-1, z)") == -1.0
    assert ev(spark, "least(1, 'A')") == "1"
    assert ev(spark, "least(null, null)") is None
    assert ev(spark, "least(1, null, 'A')") == "1"


def test_bitwise(spark):
    assert ev(spark, "bitwiseAnd(3, 1)") == 1
    assert ev(spark, "bitwiseAnd(2, 1)") == 0
    assert ev(spark, "bitwiseOr(3, 1)") == 3
    assert ev(spark, "bitwiseOr(2, 1)") == 3
    assert ev(spark, "bitwiseXor(3, 1)") == 2
    assert ev(spark, "bitwiseXor(2, 1)") == 3
    assert ev(spark, "bitwiseShiftLeft(2, 1)") == 4
    assert ev(spark, "bitwiseShiftRight(2, 1)") == 1
    assert ev(spark, "bitwiseAnd(bitwiseComplement(1), 7)") == 6
    # two strings is sad; one is forgiven
    assert ev(spark, "bitwiseAnd('2', '1')") is None
    assert ev(spark, "bitwiseAnd(3, '1')") == 1
    assert ev(spark, "bitwiseAnd(2, null)") is None
    # unary accepts no slop
    assert ev(spark, "bitwiseComplement('1')") is None
    assert ev(spark, "bitwiseComplement(null)") is None
    # doubles are cast (truncated)
    assert ev(spark, "bitwiseOr(2.345, 1)") == 3
    assert ev(spark, "bitwiseOr(2, 1.3)") == 3
    assert ev(spark, "bitwiseAnd(2.345, 2.0)") == 2


def test_array_constructor(spark):
    assert ev(spark, "array(1, 2, 3, 4)") == [1, 2, 3, 4]
    assert ev(spark, "array(1, 2, 3, 'bar')") == [1, 2, 3, None]
    assert ev(spark, "array(1.0)") == [1.0]
    assert ev(spark, "array('foo', 'bar')") == ["foo", "bar"]


def test_array_contains(spark):
    assert bool(ev(spark, "array_contains([1, 2, 3], 2)")) is True
    assert bool(ev(spark, "array_contains([1, 2, 3], 4)")) is False
    assert bool(ev(spark, "array_contains([1, 2, 3], [2, 3])")) is True
    assert bool(ev(spark, "array_contains([1, 2, 3], [3, 4])")) is False
    assert bool(ev(spark, "array_contains(b, [3, 4])")) is True


def test_array_overlap(spark):
    assert bool(ev(spark, "array_overlap([1, 2, 3], [2, 4, 6])")) is True
    assert bool(ev(spark, "array_overlap([1, 2, 3], [4, 5, 6])")) is False


def test_array_set_add(spark):
    assert sorted(ev(spark, "array_set_add([1, 2, 3], 4)")) == [1, 2, 3, 4]
    assert sorted(ev(spark, "array_set_add([1, 2, 2], 1)")) == [1, 2]


def test_array_set_add_all(spark):
    assert sorted(ev(spark, "array_set_add_all([1, 2, 3], [2, 4, 6])")) \
        == [1, 2, 3, 4, 6]


def test_string_to_array(spark):
    assert ev(spark, "string_to_array('1,2,3', ',')") == ["1", "2", "3"]
    assert ev(spark, "string_to_array('1', ',')") == ["1"]
    assert ev(spark,
              "string_to_array(array_to_string(a, ','), ',')") == \
        ["foo", "bar", "baz", "foobar"]


def test_array_cast(spark):
    assert ev(spark, "cast([1, 2, 3], 'STRING_ARRAY')") == ["1", "2", "3"]
    assert ev(spark, "cast([1, 2, 3], 'DOUBLE_ARRAY')") == [1.0, 2.0, 3.0]
    assert ev(spark, "cast(c, 'LONG_ARRAY')") == [3, 4, 5]
    assert ev(spark, "cast(['1.0', '2.0', '3.0'], 'LONG_ARRAY')") == [1, 2, 3]
