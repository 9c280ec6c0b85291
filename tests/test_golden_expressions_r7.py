"""ExpressionsTest.java golden port, round-7 tranche — the suite's
remaining uncited cases: regexp_like / contains as FILTERS (evaluated
through compile_filter over the reference's one-row binding set),
round() on ±Infinity, TIMESTAMP ± day-time / year-month intervals,
EXTRACT, the abnormal LEFT/RIGHT/REPEAT argument cases, and the
OperatorConversions druidUnary/BinaryFn families
(sql/src/test/java/org/apache/druid/sql/calcite/expression/
ExpressionsTest.java:438-527, 961-989, 1193-1305, 1443-1533, 1583-1600,
1821-2100; bindings from :74-120).

Adaptations (documented engine semantics, not omissions):
  * testAbnormalRight/LeftWithNegativeNumber and the *WithWrongType
    trio expect a planner-time IAE; the engine's SQL-null mode returns
    null instead (functions/druid_expr.py right/left/repeat guards) —
    same rows-out contract as Druid's own `druid.generic.useDefaultValue
    =false` expression null handling for unevaluable inputs.
  * The reference's "-inf"/"-finf" binding names are renamed
    neginf/negfinf (struct fields cannot start with '-').
"""

import datetime as _dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_druid_spark.filters.filters import FilterContext, compile_filter
from incubator_druid_spark.functions.druid_expr import compile_expr

_T_MILLIS = 949550706000  # 2000-02-03T04:05:06Z
DMAX = 1.7976931348623157e308  # Double.MAX_VALUE


@pytest.fixture(scope="module")
def bindings(spark):
    schema = T.StructType([
        T.StructField("t", T.TimestampType()),
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("x", T.FloatType()),
        T.StructField("y", T.LongType()),
        T.StructField("z", T.FloatType()),
        T.StructField("o", T.LongType()),
        T.StructField("inf", T.DoubleType()),
        T.StructField("neginf", T.DoubleType()),
        T.StructField("finf", T.FloatType()),
        T.StructField("negfinf", T.FloatType()),
        T.StructField("s", T.StringType()),
        T.StructField("spacey", T.StringType()),
        T.StructField("newliney", T.StringType()),
        T.StructField("tstr", T.StringType()),
        T.StructField("dstr", T.StringType()),
    ])
    row = (_dt.datetime.fromtimestamp(_T_MILLIS / 1000, _dt.timezone.utc),
           10, 25, 2.25, 3, -2.25, 0,
           float("inf"), float("-inf"), float("inf"), float("-inf"),
           "foo", "  hey there  ", "beep\nboop",
           "2000-02-03 04:05:06", "2000-02-03")
    return spark.createDataFrame([row], schema)


def ev(bindings, expr):
    col = compile_expr(expr, F.col, string_cols={"s", "spacey", "newliney",
                                                 "tstr", "dstr"},
                       integral_cols={"a", "b", "y", "o"},
                       numeric_cols={"x", "z", "inf", "neginf", "finf",
                                     "negfinf"},
                       timestamp_cols={"t"})
    v = bindings.select(col.alias("v")).first()["v"]
    if isinstance(v, bool):
        return 1 if v else 0
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1000)
    return v


def fmatch(bindings, spec):
    """True iff the one binding row passes the native filter."""
    pred = compile_filter(spec, FilterContext(bindings))
    return bindings.filter(pred).count() == 1


def test_regexp_like_as_filter(bindings):
    """testRegexpLikeAsFilter — REGEXP_LIKE plans to the native regex
    filter, which matches with find() semantics (RegexDimFilter: a
    partial match anywhere counts; '^'/'$' anchor to string bounds)."""
    rx = lambda d, p: {"type": "regex", "dimension": d, "pattern": p}
    assert fmatch(bindings, rx("s", "f."))
    assert fmatch(bindings, rx("s", "o"))          # find(), not matches()
    assert not fmatch(bindings, rx("s", "x."))
    assert fmatch(bindings, rx("s", ""))           # empty pattern matches
    assert not fmatch(bindings, rx("newliney", "^beep$"))
    assert fmatch(bindings, rx("newliney", "^beep\nboop$"))


def test_regexp_like_virtual_column_operand(spark, bindings):
    """testRegexpLikeAsFilter final case — the non-column operand goes
    through an expression virtual column: regexp over concat('Z',"s")."""
    df = bindings.withColumn(
        "v0", compile_expr("concat('Z',\"s\")", F.col, string_cols={"s"}))
    assert not fmatch(df, {"type": "regex", "dimension": "v0",
                           "pattern": "x(.)"})
    assert fmatch(df, {"type": "regex", "dimension": "v0",
                       "pattern": "Zf"})


def test_contains_as_filter(bindings):
    """testContainsAsFilter — CONTAINS_STRING/ICONTAINS_STRING plan to
    search filters with contains specs (case flag = caseSensitive)."""
    def cs(d, v, sensitive=True):
        return {"type": "search", "dimension": d,
                "query": {"type": "contains", "value": v,
                          "caseSensitive": sensitive}}
    assert fmatch(bindings, cs("spacey", "there"))
    assert not fmatch(bindings, cs("spacey", "There"))
    assert fmatch(bindings, cs("spacey", "There", sensitive=False))
    assert fmatch(bindings, cs("spacey", ""))      # empty contains matches


def test_contains_virtual_column_operand(bindings):
    """testContainsAsFilter expression-operand cases — the search filter
    over concat('what is', spacey) = 'what is  hey there  '."""
    df = bindings.withColumn(
        "v0", compile_expr("concat('what is',\"spacey\")", F.col,
                           string_cols={"spacey"}))
    def cs(v, sensitive=True):
        return {"type": "search", "dimension": "v0",
                "query": {"type": "contains", "value": v,
                          "caseSensitive": sensitive}}
    assert fmatch(df, cs("what"))
    assert fmatch(df, cs("there"))
    assert fmatch(df, cs("What", sensitive=False))


def test_round_with_infinity_clamps_to_double_max(bindings):
    """testRoundWithInfinityShouldRoundTo0 (sic — the expectations clamp
    to ±Double.MAX_VALUE, RoundFunction's Infinity guard): double and
    float infinities both clamp at the DOUBLE extreme."""
    assert ev(bindings, 'round("inf")') == DMAX
    assert ev(bindings, 'round("neginf")') == -DMAX
    assert ev(bindings, 'round("finf")') == DMAX
    assert ev(bindings, 'round("negfinf")') == -DMAX


def test_time_plus_day_time_interval(bindings):
    """testTimePlusDayTimeInterval — DAY-TIME interval literals are
    millis; TIMESTAMP + INTERVAL '1 01:01' DAY TO MINUTE is plain millis
    arithmetic ("t" + 90060000)."""
    expect = int(_dt.datetime(2000, 2, 4, 5, 6, 6,
                              tzinfo=_dt.timezone.utc).timestamp() * 1000)
    assert ev(bindings, '("t" + 90060000)') == expect


def test_time_plus_year_month_interval(bindings):
    """testTimePlusYearMonthInterval — YEAR-MONTH interval literals are
    months and go through calendar-aware timestamp_shift('P13M', 1)."""
    expect = int(_dt.datetime(2001, 3, 3, 4, 5, 6,
                              tzinfo=_dt.timezone.utc).timestamp() * 1000)
    assert ev(bindings, "timestamp_shift(\"t\",'P13M',1,'UTC')") == expect


def test_time_minus_day_time_interval(bindings):
    """testTimeMinusDayTimeInterval — ("t" - 90060000)."""
    expect = int((_dt.datetime(2000, 2, 3, 4, 5, 6,
                               tzinfo=_dt.timezone.utc)
                  - _dt.timedelta(days=1, hours=1, minutes=1))
                 .timestamp() * 1000)
    assert ev(bindings, '("t" - 90060000)') == expect


def test_time_minus_year_month_interval(bindings):
    """testTimeMinusYearMonthInterval — timestamp_shift('P13M', -1)."""
    expect = int(_dt.datetime(1999, 1, 3, 4, 5, 6,
                              tzinfo=_dt.timezone.utc).timestamp() * 1000)
    assert ev(bindings, "timestamp_shift(\"t\",'P13M',-1,'UTC')") == expect


def test_extract(bindings):
    """testExtract — EXTRACT(QUARTER/DAY FROM t) via timestamp_extract."""
    assert ev(bindings, "timestamp_extract(\"t\",'QUARTER','UTC')") == 1
    assert ev(bindings, "timestamp_extract(\"t\",'DAY','UTC')") == 3


def test_abnormal_right_with_negative_number(bindings):
    """testAbnormalRightWithNegativeNumber — the reference raises IAE at
    plan time; the engine's SQL-null mode yields null (see module doc)."""
    assert ev(bindings, 'right("s",-1)') is None


def test_abnormal_right_with_wrong_type(bindings):
    """testAbnormalRightWithWrongType — right("s","s"): non-integer count
    is null in the engine (reference: IAE)."""
    assert ev(bindings, 'right("s","s")') is None


def test_abnormal_left_with_negative_number(bindings):
    """testAbnormalLeftWithNegativeNumber — null (reference: IAE)."""
    assert ev(bindings, 'left("s",-1)') is None


def test_abnormal_left_with_wrong_type(bindings):
    """testAbnormalLeftWithWrongType — null (reference: IAE)."""
    assert ev(bindings, 'left("s","s")') is None


def test_abnormal_repeat_with_wrong_type(bindings):
    """testAbnormalRepeatWithWrongType — repeat("s","s") is null; the
    in-range cases stay exact (testRepeat: -1 count is null, not error)."""
    assert ev(bindings, 'repeat("s","s")') is None
    assert ev(bindings, 'repeat("s",1)') == "foo"
    assert ev(bindings, 'repeat("s",3)') == "foofoofoo"
    assert ev(bindings, 'repeat("s",-1)') is None


def test_operator_conversions_druid_unary_long_fn(bindings):
    """testOperatorConversionsDruidUnaryLongFn — bitwiseComplement over
    long (10 → -11), float (2.25 reads as long 2 → -3), string (null)."""
    assert ev(bindings, 'bitwiseComplement("a")') == -11
    assert ev(bindings, 'bitwiseComplement("x")') == -3
    assert ev(bindings, 'bitwiseComplement("s")') is None


def test_operator_conversions_druid_unary_double_fn(bindings):
    """testOperatorConversionsDruidUnaryDoubleFn —
    bitwiseConvertLongBitsToDouble(10) = 4.9E-323 (denormal), float input
    reads as long 2 → 1.0E-323, string → null."""
    assert ev(bindings, 'bitwiseConvertLongBitsToDouble("a")') == 4.9e-323
    assert ev(bindings, 'bitwiseConvertLongBitsToDouble("x")') == 1.0e-323
    assert ev(bindings, 'bitwiseConvertLongBitsToDouble("s")') is None


def test_virtual_column_time_reads_long_millis(spark, tmp_path):
    """Engine contract behind testTimePlusDayTimeInterval: a virtual
    column over __time reads the LONG millis storage — arithmetic works,
    outputType LONG renders millis (not Spark's timestamp→seconds cast),
    and outputType STRING renders the millis digits (Druid's long→string
    cast), while a time-macro VC keeps the same millis contract."""
    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import Catalog
    schema = T.StructType([T.StructField("__time", T.TimestampType()),
                           T.StructField("d", T.StringType())])
    rows = [(_dt.datetime(2000, 2, 3, 4, 5, 6), "a")]
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(rows, schema).write.parquet(p)
    cat = Catalog(spark)
    cat.register("tt", p)
    full = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]

    def vc(expression, ot):
        out = translate(
            {"queryType": "scan", "dataSource": "tt", "intervals": full,
             "virtualColumns": [{"type": "expression", "name": "v",
                                 "expression": expression,
                                 "outputType": ot}],
             "columns": ["v"]}, spark, cat).collect()
        return out[0]["v"]

    assert vc("__time + 90060000", "LONG") == _T_MILLIS + 90060000
    assert vc("__time", "LONG") == _T_MILLIS
    assert vc("__time", "STRING") == str(_T_MILLIS)
    assert vc("timestamp_floor(__time,'P1D')", "LONG") == \
        int(_dt.datetime(2000, 2, 3,
                         tzinfo=_dt.timezone.utc).timestamp() * 1000)


def test_expression_filter_time_is_millis(spark, tmp_path):
    """Expression filters compare __time as LONG millis
    (ExpressionFilter over the long selector)."""
    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import Catalog
    schema = T.StructType([T.StructField("__time", T.TimestampType()),
                           T.StructField("d", T.StringType())])
    rows = [(_dt.datetime(2000, 2, 3, 4, 5, 6), "a"),
            (_dt.datetime(2000, 2, 4, 4, 5, 6), "b")]
    p = str(tmp_path / "t2.parquet")
    spark.createDataFrame(rows, schema).write.parquet(p)
    cat = Catalog(spark)
    cat.register("tt2", p)
    full = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]
    out = translate(
        {"queryType": "scan", "dataSource": "tt2", "intervals": full,
         "filter": {"type": "expression",
                    "expression": f"__time > {_T_MILLIS}"},
         "columns": ["d"]}, spark, cat).collect()
    assert [r["d"] for r in out] == ["b"]


def test_operator_conversions_druid_binary_long_fn(bindings):
    """testOperatorConversionsDruidBinaryLongFn — bitwiseAnd(10,25)=8,
    bitwiseAnd(2.25, 3) reads longs → 2, two strings → null."""
    assert ev(bindings, 'bitwiseAnd("a","b")') == 8
    assert ev(bindings, 'bitwiseAnd("x","y")') == 2
    assert ev(bindings, 'bitwiseAnd("s","s")') is None
