"""QueryGranularityTest golden port, round-7 tranche — the remaining
iterable/truncate/duration families
(processing/src/test/java/org/apache/druid/granularity/
QueryGranularityTest.java).

The engine's `Granularity.spine(start, end)` is getIterable()'s bucket
enumeration (timeseries zero-fill) and `floor(col)` is bucketStart.

Not ported, with reasons:
  * testIterableAllSimple / testIterableAllComplex — ALL's iterable is a
    single eternity interval; the engine's ALL granularity is one bucket
    by construction in operators/timeseries.py (ts_all oracle entry) and
    spine() intentionally returns [] for it.
  * testCompoundPeriodTruncate first block (P1M2D) — mixed
    calendar+fixed periods are a documented refusal
    (model/granularity.py parse_period raises); the fixed-only compound
    (PT12H5M) blocks ARE ported below.
  * testDurationIncrement / testDurationIncrementOnMillis /
    testDurationToDateTime — increment() is an internal iterator step;
    covered behaviorally by the spine stepping asserts below.
"""

import datetime as _dt

import pytest

from incubator_druid_spark.model.granularity import parse_granularity


def ms(iso: str) -> int:
    return int(_dt.datetime.fromisoformat(iso).timestamp() * 1000)


def floor_ms(spark, gran, t_ms: int) -> int:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    df = spark.createDataFrame(
        [(_dt.datetime.fromtimestamp(t_ms / 1000, _dt.timezone.utc),)],
        T.StructType([T.StructField("t", T.TimestampType())]))
    v = df.select(gran.floor(F.col("t")).alias("b")).first()["b"]
    if v.tzinfo is None:
        v = v.replace(tzinfo=_dt.timezone.utc)
    return int(v.timestamp() * 1000)


def test_iterable_hour_complex():
    """testIterableHourComplex — an unaligned start floors back; the
    unaligned end still covers its bucket (4 hours for a 3-hour span)."""
    g = parse_granularity("hour")
    base = ms("2011-01-01T09:38:02.992+00:00")
    assert g.spine(base, base + 3 * 3600_000) == [
        ms("2011-01-01T09:00:00+00:00"), ms("2011-01-01T10:00:00+00:00"),
        ms("2011-01-01T11:00:00+00:00"), ms("2011-01-01T12:00:00+00:00")]


def test_iterable_day_complex():
    """testIterableDayComplex."""
    g = parse_granularity("day")
    base = ms("2011-01-01T09:38:02.992+00:00")
    assert g.spine(base, base + 3 * 86400_000) == [
        ms("2011-01-01T00:00:00+00:00"), ms("2011-01-02T00:00:00+00:00"),
        ms("2011-01-03T00:00:00+00:00"), ms("2011-01-04T00:00:00+00:00")]


def test_iterable_month_complex():
    """testIterableMonthComplex — calendar stepping over month ends."""
    g = parse_granularity("month")
    base = ms("2011-01-01T09:38:00+00:00")
    end = ms("2011-04-01T09:38:00+00:00")
    assert g.spine(base, end) == [
        ms("2011-01-01T00:00:00+00:00"), ms("2011-02-01T00:00:00+00:00"),
        ms("2011-03-01T00:00:00+00:00"), ms("2011-04-01T00:00:00+00:00")]


def test_iterable_quarter_simple_and_complex():
    """testIterableQuarterSimple / testIterableQuarterComplex."""
    g = parse_granularity("quarter")
    base = ms("2011-01-01T00:00:00+00:00")
    assert g.spine(base, ms("2011-10-01T00:00:00+00:00")) == [
        ms("2011-01-01T00:00:00+00:00"), ms("2011-04-01T00:00:00+00:00"),
        ms("2011-07-01T00:00:00+00:00")]
    base2 = ms("2011-01-01T09:38:00+00:00")
    assert g.spine(base2, ms("2011-10-01T09:38:00+00:00")) == [
        ms("2011-01-01T00:00:00+00:00"), ms("2011-04-01T00:00:00+00:00"),
        ms("2011-07-01T00:00:00+00:00"), ms("2011-10-01T00:00:00+00:00")]


def test_iterable_year_simple_and_complex():
    """testIterableYearSimple / testIterableYearComplex."""
    g = parse_granularity("year")
    base = ms("2011-01-01T00:00:00+00:00")
    assert g.spine(base, ms("2014-01-01T00:00:00+00:00")) == [
        ms("2011-01-01T00:00:00+00:00"), ms("2012-01-01T00:00:00+00:00"),
        ms("2013-01-01T00:00:00+00:00")]
    base2 = ms("2011-01-01T09:38:00+00:00")
    assert g.spine(base2, ms("2014-01-01T09:38:00+00:00")) == [
        ms("2011-01-01T00:00:00+00:00"), ms("2012-01-01T00:00:00+00:00"),
        ms("2013-01-01T00:00:00+00:00"), ms("2014-01-01T00:00:00+00:00")]


def test_iterable_month_la_tz():
    """testIterableMonth — month buckets in America/Los_Angeles across
    the Nov-2012 DST fallback: bucket starts are local midnights, so the
    UTC instants flip from -07:00 to -08:00 offsets."""
    g = parse_granularity({"type": "period", "period": "P1M",
                           "timeZone": "America/Los_Angeles"})
    base = ms("2012-11-03T10:00:00-07:00")
    end = ms("2013-02-03T10:00:00-08:00")  # base + 3 calendar months (LA)
    assert g.spine(base, end) == [
        ms("2012-11-01T00:00:00-07:00"), ms("2012-12-01T00:00:00-08:00"),
        ms("2013-01-01T00:00:00-08:00"), ms("2013-02-01T00:00:00-08:00")]


def test_iterable_week_la_tz():
    """testIterableWeek — Monday-anchored weeks in LA across the DST
    fallback; with an origin the anchor moves to the origin instant and
    the local wall clock holds (10:00) while the UTC offset flips."""
    g = parse_granularity({"type": "period", "period": "P1W",
                           "timeZone": "America/Los_Angeles"})
    base = ms("2012-11-03T10:00:00-07:00")
    end = ms("2012-11-24T10:00:00-08:00")  # base + 3 weeks of local days
    assert g.spine(base, end) == [
        ms("2012-10-29T00:00:00-07:00"), ms("2012-11-05T00:00:00-08:00"),
        ms("2012-11-12T00:00:00-08:00"), ms("2012-11-19T00:00:00-08:00")]
    g2 = parse_granularity({"type": "period", "period": "P1W",
                            "timeZone": "America/Los_Angeles",
                            "origin": "2012-11-03T10:00:00-07:00"})
    assert g2.spine(base, ms("2012-11-24T10:00:00-08:00")) == [
        ms("2012-11-03T10:00:00-07:00"), ms("2012-11-10T10:00:00-08:00"),
        ms("2012-11-17T10:00:00-08:00")]


def test_compound_period_fixed_truncate_la(spark):
    """testCompoundPeriodTruncate PT12H5M block — a fixed-only compound
    period with an origin truncates by modular arithmetic from the
    origin, timezone-independent for fixed periods."""
    g = parse_granularity({"type": "period", "period": "PT12H5M",
                           "origin": "2012-01-02T05:00:00.000-08:00",
                           "timeZone": "America/Los_Angeles"})
    cases = [
        ("2012-01-01T05:00:04.123-08:00", "2012-01-01T04:50:00-08:00"),
        ("2012-01-02T07:00:04.123-08:00", "2012-01-02T05:00:00-08:00"),
        ("2012-01-03T00:20:04.123-08:00", "2012-01-02T17:05:00-08:00"),
        ("2012-02-03T22:25:00.000-08:00", "2012-02-03T22:25:00-08:00"),
    ]
    for t, expect in cases:
        assert floor_ms(spark, g, ms(t)) == ms(expect), t


def test_compound_period_millis_truncate(spark):
    """testCompoundPeriodMillisTruncate — same PT12H5M origin arithmetic
    under UTC."""
    g = parse_granularity({"type": "period", "period": "PT12H5M",
                           "origin": "2012-01-02T05:00:00.000-08:00"})
    cases = [
        ("2012-01-01T05:00:04.123-08:00", "2012-01-01T04:50:00-08:00"),
        ("2012-01-02T07:00:04.123-08:00", "2012-01-02T05:00:00-08:00"),
        ("2012-01-03T00:20:04.123-08:00", "2012-01-02T17:05:00-08:00"),
        ("2012-02-03T22:25:00.000-08:00", "2012-02-03T22:25:00-08:00"),
    ]
    for t, expect in cases:
        assert floor_ms(spark, g, ms(t)) == ms(expect), t


def test_compound_calendar_period_refused():
    """testCompoundPeriodTruncate P1M2D block — mixed calendar+fixed
    periods are a documented refusal in this engine (parse_period)."""
    with pytest.raises(ValueError, match="calendar"):
        parse_granularity({"type": "period", "period": "P1M2D"})


def test_duration_bucket_start(spark):
    """testDurationBucketStart — a duration granularity (raw millis +
    origin) buckets identically to the fixed compound period."""
    dur = 12 * 3600_000 + 5 * 60_000
    g = parse_granularity({"type": "duration", "duration": dur,
                           "origin": "2012-01-02T05:00:00.000-08:00"})
    cases = [
        ("2012-01-01T05:00:04.123-08:00", "2012-01-01T04:50:00-08:00"),
        ("2012-01-02T07:00:04.123-08:00", "2012-01-02T05:00:00-08:00"),
        ("2012-01-03T00:20:04.123-08:00", "2012-01-02T17:05:00-08:00"),
        ("2012-02-03T22:25:00.000-08:00", "2012-02-03T22:25:00-08:00"),
    ]
    for t, expect in cases:
        assert floor_ms(spark, g, ms(t)) == ms(expect), t


def test_duration_spine_steps_by_duration():
    """testDurationIncrement behavior — successive spine buckets differ
    by exactly the duration."""
    dur = 12 * 3600_000 + 5 * 60_000
    g = parse_granularity({"type": "duration", "duration": dur,
                           "origin": "2012-01-02T05:00:00.000-08:00"})
    start = ms("2012-01-01T05:00:04.123-08:00")
    sp = g.spine(start, start + 3 * dur)
    assert len(sp) >= 3
    assert all(b - a == dur for a, b in zip(sp, sp[1:]))
    assert sp[0] == ms("2012-01-01T04:50:00-08:00")


def test_truncate_kathmandu(spark):
    """testTruncateKathmandu — Asia/Kathmandu (+05:45, a 45-minute
    offset): year and hour floors land on local boundaries, and PT2H
    aligns two-hour buckets on the LOCAL even hour."""
    date = ms("2011-03-15T21:42:23.898+05:45")
    year = parse_granularity({"type": "period", "period": "P1Y",
                              "timeZone": "Asia/Kathmandu"})
    hour = parse_granularity({"type": "period", "period": "PT1H",
                              "timeZone": "Asia/Kathmandu"})
    two_hour = parse_granularity({"type": "period", "period": "PT2H",
                                  "timeZone": "Asia/Kathmandu"})
    assert floor_ms(spark, year, date) == ms("2011-01-01T00:00:00+05:45")
    assert floor_ms(spark, hour, date) == ms("2011-03-15T21:00:00+05:45")
    assert floor_ms(spark, two_hour, date) == \
        ms("2011-03-15T20:00:00+05:45")


def test_truncate_dhaka(spark):
    """testTruncateDhaka — Asia/Dhaka (+06:00): same family with a
    whole-hour offset."""
    date = ms("2011-03-15T21:42:23.898+06:00")
    year = parse_granularity({"type": "period", "period": "P1Y",
                              "timeZone": "Asia/Dhaka"})
    hour = parse_granularity({"type": "period", "period": "PT1H",
                              "timeZone": "Asia/Dhaka"})
    two_hour = parse_granularity({"type": "period", "period": "PT2H",
                                  "timeZone": "Asia/Dhaka"})
    assert floor_ms(spark, year, date) == ms("2011-01-01T00:00:00+06:00")
    assert floor_ms(spark, hour, date) == ms("2011-03-15T21:00:00+06:00")
    assert floor_ms(spark, two_hour, date) == \
        ms("2011-03-15T20:00:00+06:00")
