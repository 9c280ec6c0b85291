"""ExprMacroTest + TimestampShiftMacroTest golden ports (round 7) —
processing/src/test/java/org/apache/druid/query/expression/
ExprMacroTest.java (BINDINGS :38-54) and TimestampShiftMacroTest.java
(timestamp 2020-11-05T04:05:06Z).

Adaptations (documented engine semantics):
  * Non-literal TIMEZONE arguments (timestamp_shift(t,'P1D',2,
    CityOfAngels)) are refused with a clear error — this engine compiles
    the chronology into the Catalyst plan, so a per-row zone cannot be
    planned (the reference evaluates it from row bindings).
  * Non-literal STEP (TimestampShiftMacroTest testDynamicExpression)
    likewise raises: the shift count is folded at plan time.
  * Arity errors raise TypeError/ValueError rather than the reference's
    IAE; the contract (3-4 args) is identical.
"""

import datetime as _dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_druid_spark.functions.druid_expr import compile_expr

_T = int(_dt.datetime(2000, 2, 3, 4, 5, 6,
                      tzinfo=_dt.timezone.utc).timestamp() * 1000)
_T1 = int(_dt.datetime(2000, 2, 3,
                       tzinfo=_dt.timezone.utc).timestamp() * 1000)
IPV4_STRING = "192.168.0.1"
IPV4_LONG = 3232235521


@pytest.fixture(scope="module")
def bindings(spark):
    schema = T.StructType([
        T.StructField("t", T.TimestampType()),
        T.StructField("t1", T.TimestampType()),
        T.StructField("tstr", T.StringType()),
        T.StructField("tstr_sql", T.StringType()),
        T.StructField("x", T.StringType()),
        T.StructField("y", T.LongType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("spacey", T.StringType()),
        T.StructField("ipv4_string", T.StringType()),
        T.StructField("ipv4_long", T.LongType()),
        T.StructField("ipv4_network", T.StringType()),
        T.StructField("ipv4_broadcast", T.StringType()),
    ])
    row = (_dt.datetime.fromtimestamp(_T / 1000, _dt.timezone.utc),
           _dt.datetime.fromtimestamp(_T1 / 1000, _dt.timezone.utc),
           "2000-02-03T04:05:06", "2000-02-03 04:05:06",
           "foo", 2, 3.1, "  hey there  ",
           IPV4_STRING, IPV4_LONG, "192.168.0.0", "192.168.255.255")
    return spark.createDataFrame([row], schema)


def ev(bindings, expr):
    col = compile_expr(
        expr, F.col,
        string_cols={"tstr", "tstr_sql", "x", "spacey", "ipv4_string",
                     "ipv4_network", "ipv4_broadcast"},
        integral_cols={"y", "ipv4_long"}, numeric_cols={"z"},
        timestamp_cols={"t", "t1"})
    v = bindings.select(col.alias("v")).first()["v"]
    if isinstance(v, bool):
        return 1 if v else 0
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1000)
    return v


def ms(*args):
    return int(_dt.datetime(*args, tzinfo=_dt.timezone.utc)
               .timestamp() * 1000)


def test_like(bindings):
    """testLike — like() over x='foo'; empty pattern matches nothing."""
    assert ev(bindings, "like(x, 'f%')") == 1
    assert ev(bindings, "like(x, 'f__')") == 1
    assert ev(bindings, "like(x, '%o%')") == 1
    assert ev(bindings, "like(x, 'b%')") == 0
    assert ev(bindings, "like(x, 'b__')") == 0
    assert ev(bindings, "like(x, '%x%')") == 0
    assert ev(bindings, "like(x, '')") == 0


def test_ltrim(bindings):
    """testLTrim — two-arg form strips the CHARACTER SET; empty set is a
    no-op.  The non-literal chars cases (ltrim(spacey, spacey)) are
    covered with literal equivalents."""
    assert ev(bindings, "ltrim('')") == ""
    assert ev(bindings, "ltrim(concat(' ',x,' '))") == "foo "
    assert ev(bindings, "ltrim(spacey)") == "hey there  "
    assert ev(bindings, "ltrim(spacey, '')") == "  hey there  "
    assert ev(bindings, "ltrim(spacey, 'he ')") == "y there  "
    assert ev(bindings, "ltrim(spacey, '  hey there  ')") == ""


def test_rtrim(bindings):
    """testRTrim — mirror of ltrim on the right edge."""
    assert ev(bindings, "rtrim('')") == ""
    assert ev(bindings, "rtrim(concat(' ',x,' '))") == " foo"
    assert ev(bindings, "rtrim(spacey)") == "  hey there"
    assert ev(bindings, "rtrim(spacey, '')") == "  hey there  "
    assert ev(bindings, "rtrim(spacey, 'he ')") == "  hey ther"
    assert ev(bindings, "rtrim(spacey, '  hey there  ')") == ""


def test_timestamp_floor(bindings):
    """testTimestampFloor — null passthrough, month floor, tz day floor,
    origin-anchored day floor."""
    assert ev(bindings, "timestamp_floor(null, 'P1M')") is None
    assert ev(bindings, "timestamp_floor(t, 'P1M')") == ms(2000, 2, 1)
    assert ev(bindings,
              "timestamp_floor(t, 'P1D',null,'America/Los_Angeles')") \
        == ms(2000, 2, 2, 8)
    assert ev(bindings,
              "timestamp_floor(t, 'P1D','1970-01-01T01','Etc/UTC')") \
        == ms(2000, 2, 3, 1)


def test_timestamp_floor_dynamic_tz_refused(bindings):
    """testTimestampFloor CityOfAngels case — a non-literal timezone is a
    loud plan-time refusal here (see module doc)."""
    with pytest.raises(ValueError, match="literal"):
        ev(bindings, "timestamp_floor(t, 'P1D',null,x)")


def test_timestamp_shift(bindings):
    """testTimestampShift — P1D×2; the explicit-zone variants are the
    same instant for a day period ('-08:00', '')."""
    expect = ms(2000, 2, 5, 4, 5, 6)
    assert ev(bindings, "timestamp_shift(t, 'P1D', 2)") == expect
    assert ev(bindings,
              "timestamp_shift(t, 'P1D', 2, 'America/Los_Angeles')") \
        == expect
    assert ev(bindings, "timestamp_shift(t, 'P1D', 2, '-08:00')") == expect


def test_timestamp_extract(bindings):
    """testTimestampExtract — DAY/HOUR in UTC and America/Los_Angeles."""
    assert ev(bindings, "timestamp_extract(t, 'DAY')") == 3
    assert ev(bindings, "timestamp_extract(t, 'HOUR')") == 4
    assert ev(bindings,
              "timestamp_extract(t, 'DAY', 'America/Los_Angeles')") == 2
    assert ev(bindings,
              "timestamp_extract(t, 'HOUR', 'America/Los_Angeles')") == 20


def test_timestamp_parse(bindings):
    """testTimestampParse — ISO and SQL forms, partial dates, nulls,
    unparseable strings, explicit formats, and timezone localization."""
    assert ev(bindings, "timestamp_parse(tstr)") == _T
    assert ev(bindings, "timestamp_parse(tstr_sql)") == _T
    assert ev(bindings,
              "timestamp_parse(tstr_sql,null,'America/Los_Angeles')") \
        == _T + 8 * 3600 * 1000
    assert ev(bindings, "timestamp_parse('2000-02-03')") == ms(2000, 2, 3)
    assert ev(bindings, "timestamp_parse('2000-02')") == ms(2000, 2, 1)
    assert ev(bindings, "timestamp_parse(null)") is None
    assert ev(bindings, "timestamp_parse('z2000')") is None
    assert ev(bindings,
              "timestamp_parse(tstr_sql,'yyyy-MM-dd HH:mm:ss')") == _T
    assert ev(bindings,
              "timestamp_parse('02/03/2000','MM/dd/yyyy')") == ms(2000, 2, 3)
    assert ev(bindings, "timestamp_parse(tstr_sql,'yyyy-MM-dd HH:mm:ss',"
                        "'America/Los_Angeles')") == _T + 8 * 3600 * 1000


def test_timestamp_format(bindings):
    """testTimestampFormat — default ISO-with-millis, explicit pattern,
    and timezone rendering."""
    assert ev(bindings, "timestamp_format(t)") == "2000-02-03T04:05:06.000Z"
    assert ev(bindings, "timestamp_format(t,'yyyy-MM-dd HH:mm:ss')") \
        == "2000-02-03 04:05:06"
    assert ev(bindings, "timestamp_format(t,'yyyy-MM-dd HH:mm:ss',"
                        "'America/Los_Angeles')") == "2000-02-02 20:05:06"


def test_ipv4_address_parse(bindings):
    """testIPv4AddressParse — non-address strings are null; long and
    dotted forms both parse; stringify∘parse round-trips."""
    assert ev(bindings, "ipv4_parse(x)") is None
    assert ev(bindings, "ipv4_parse(ipv4_string)") == IPV4_LONG
    assert ev(bindings, "ipv4_parse(ipv4_long)") == IPV4_LONG
    assert ev(bindings, "ipv4_parse(ipv4_stringify(ipv4_long))") == IPV4_LONG


def test_ipv4_address_stringify(bindings):
    """testIPv4AddressStringify."""
    assert ev(bindings, "ipv4_stringify(x)") is None
    assert ev(bindings, "ipv4_stringify(ipv4_long)") == IPV4_STRING
    assert ev(bindings, "ipv4_stringify(ipv4_string)") == IPV4_STRING
    assert ev(bindings, "ipv4_stringify(ipv4_parse(ipv4_string))") \
        == IPV4_STRING


def test_ipv4_address_match(bindings):
    """testIPv4AddressMatch — CIDR membership incl. network and
    broadcast addresses."""
    assert ev(bindings, "ipv4_match(ipv4_string,    '10.0.0.0/8')") == 0
    assert ev(bindings, "ipv4_match(ipv4_string,    '192.168.0.0/16')") == 1
    assert ev(bindings, "ipv4_match(ipv4_network,   '192.168.0.0/16')") == 1
    assert ev(bindings, "ipv4_match(ipv4_broadcast, '192.168.0.0/16')") == 1


# --- TimestampShiftMacroTest ------------------------------------------------

_TS2020 = int(_dt.datetime(2020, 11, 5, 4, 5, 6,
                           tzinfo=_dt.timezone.utc).timestamp() * 1000)


def evlit(bindings, expr):
    return ev(bindings, expr)


def test_shift_arity_errors(bindings):
    """testZeroArguments/testOneArguments/testTwoArguments/
    testMoreThanFourArguments — timestamp_shift takes 3-4 args."""
    for bad in ["timestamp_shift()",
                f"timestamp_shift({_TS2020})",
                f"timestamp_shift({_TS2020}, 'P1M')",
                f"timestamp_shift({_TS2020}, 'P1M', 1, '+08:00', 'extra')"]:
        with pytest.raises((TypeError, ValueError)):
            evlit(bindings, bad)


def test_shift_zero_step(bindings):
    """testZeroStep — shifting by 0 months is the identity."""
    assert evlit(bindings, f"timestamp_shift({_TS2020}, 'P1M', 0)") \
        == _TS2020


def test_shift_positive_step(bindings):
    """testPositiveStep — +5 months lands on 2021-04-05."""
    assert evlit(bindings, f"timestamp_shift({_TS2020}, 'P1M', 5)") \
        == ms(2021, 4, 5, 4, 5, 6)


def test_shift_negative_step(bindings):
    """testNegativeStep — -3 months lands on 2020-08-05."""
    assert evlit(bindings, f"timestamp_shift({_TS2020}, 'P1M', -3)") \
        == ms(2020, 8, 5, 4, 5, 6)


def test_shift_period_minute(bindings):
    """testPeriodMinute."""
    assert evlit(bindings, f"timestamp_shift({_TS2020}, 'PT1M', 1)") \
        == _TS2020 + 60_000


def test_shift_period_day(bindings):
    """testPeriodDay."""
    assert evlit(bindings, f"timestamp_shift({_TS2020}, 'P1D', 1)") \
        == _TS2020 + 86_400_000


def test_shift_period_year_and_timezone(bindings):
    """testPeriodYearAndTimeZone — +1 year in the LA calendar keeps the
    LOCAL wall clock (2020-11-04T20:05:06, PST) but the DST offset
    differs across the shift: Nov 4 2021 is still PDT (UTC-7, DST ends
    Nov 7), so the instant is 2021-11-05T03:05:06Z — exactly joda's
    withPeriodAdded in the LA chronology."""
    assert evlit(
        bindings,
        f"timestamp_shift({_TS2020}, 'P1Y', 1, 'America/Los_Angeles')") \
        == ms(2021, 11, 5, 3, 5, 6)


def test_shift_dynamic_step_refused(bindings):
    """testDynamicExpression — a non-literal step is folded at plan time
    here, so it refuses (see module doc)."""
    with pytest.raises((TypeError, ValueError)):
        evlit(bindings, f"timestamp_shift({_TS2020}, 'P1Y', y)")


def test_shift_null(bindings):
    """testNull — timestamp_shift(null, 'P1M', 1) is null in SQL null
    mode."""
    assert evlit(bindings, "timestamp_shift(null, 'P1M', 1)") is None
