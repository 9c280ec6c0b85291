"""Extraction-fn golden ports (round 6) — value-level semantics of the
reference's query/extraction test suite, sql-compatible-mode branches
(processing/src/test/java/org/apache/druid/query/extraction/
RegexDimExtractionFnTest.java, MatchingDimExtractionFnTest.java,
SearchQuerySpecDimExtractionFnTest.java, StrlenExtractionFnTest.java,
SubstringDimExtractionFnTest.java, TimeDimExtractionFnTest.java,
TimeFormatExtractionFnTest.java, BucketExtractionFnTest.java,
StringFormatExtractionFnTest.java, CascadeExtractionFnTest.java,
LowerExtractionFnTest.java, UpperExtractionFnTest.java).

Driven through compile_extraction over a one-column frame (the same
unit altitude as the reference's apply() calls).  Locale-parameterized
TimeFormat variants (is/de day names) are not portable — Spark's
date_format renders with the JVM default locale only; the tz+literal
pattern test runs in English.  Serde/cache-key/equals tests are
Java-object surface."""

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.functions.extraction import compile_extraction


def apply_fn(spark, spec, values, cast=None):
    """Run compile_extraction over a single string column; returns the
    outputs in input order."""
    df = spark.createDataFrame([(v,) for v in values], "v string")
    if cast:
        df = df.select(F.col("v").cast(cast).alias("v"))
    out = df.select(compile_extraction(spec, F.col("v")).alias("o"))
    return [r["o"] for r in out.collect()]


PATHS = ["/druid/prod/historical", "/druid/prod/broker",
         "/druid/prod/coordinator", "/druid/demo/historical",
         "/druid/demo/broker", "/druid/demo/coordinator",
         "/dash/aloe", "/dash/baloo"]
TEST_STRINGS = ["apple", "awesome", "asylum", "business", "be", "cool"]
MATCH_CITIES = ["Quito", "Calgary", "Tokyo", "Stockholm", "Vancouver",
                "Pretoria", "Wellington", None, "Ontario"]
SEARCH_CITIES = ["Kyoto", "Calgary", "Tokyo", "Stockholm", "Toyokawa",
                 "Pretoria", "Yorktown", "Ontario"]


# ------------------------------------------------------------------ regex


def test_regex_path_extraction(spark):
    """testPathExtraction / testDeeperPathExtraction / testIndexZero /
    testIndexTwo / testStringExtraction."""
    assert set(apply_fn(spark, {"type": "regex", "expr": "/([^/]+)/"},
                        PATHS)) == {"druid", "dash"}
    assert set(apply_fn(spark,
                        {"type": "regex", "expr": "^/([^/]+/[^/]+)(/|$)"},
                        PATHS)) == \
        {"druid/prod", "druid/demo", "dash/aloe", "dash/baloo"}
    assert set(apply_fn(spark, {"type": "regex", "expr": "/([^/]{4})/",
                                "index": 0}, PATHS)) == \
        {"/prod/", "/demo/", "/dash/"}
    assert set(apply_fn(spark,
                        {"type": "regex", "expr": "^/([^/]+)/([^/]+)",
                         "index": 2}, PATHS)) == \
        {"prod", "demo", "aloe", "baloo"}
    assert set(apply_fn(spark, {"type": "regex", "expr": "(.)"},
                        TEST_STRINGS)) == {"a", "b", "c"}


def test_regex_null_and_empty(spark):
    """testNullAndEmpty sql branch — a non-matching value passes through
    unchanged; an empty captured group stays ''."""
    spec = {"type": "regex", "expr": "(.*)/.*/.*"}
    assert apply_fn(spark, spec, ["", None, "/a/b"]) == ["", None, ""]


def test_regex_missing_value_replacement(spark):
    """testMissingValueReplacementWhenPatternDoesNotMatchNull /
    WhenPatternMatchesNull / ToEmpty / testMissingValueReplacement
    (sql branches)."""
    spec = {"type": "regex", "expr": "(bob)", "replaceMissingValue": True,
            "replaceMissingValueWith": "NO MATCH"}
    assert apply_fn(spark, spec, ["", None, "abc", "bob"]) == \
        ["NO MATCH", "NO MATCH", "NO MATCH", "bob"]
    spec2 = {"type": "regex", "expr": "^()$", "replaceMissingValue": True,
             "replaceMissingValueWith": "NO MATCH"}
    assert apply_fn(spark, spec2, ["", None, "abc"]) == \
        ["", "NO MATCH", "NO MATCH"]
    spec3 = {"type": "regex", "expr": "(bob)", "replaceMissingValue": True,
             "replaceMissingValueWith": ""}
    assert apply_fn(spark, spec3, [None, "", "abc", "123", "bobby"]) == \
        ["", "", "", "", "bob"]
    spec4 = {"type": "regex", "expr": "(a\\w*)",
             "replaceMissingValue": True,
             "replaceMissingValueWith": "foobar"}
    assert set(apply_fn(spark, spec4, TEST_STRINGS)) == \
        {"apple", "awesome", "asylum", "foobar"}


# -------------------------------------------------------- partial / search


def test_partial_extraction(spark):
    """MatchingDimExtractionFnTest testExtraction / testNullExtraction —
    keep the value when the regex finds a match, else null; null never
    matches, '' matches ^$ (sql mode)."""
    spec = {"type": "partial", "expr": ".*[Tt][Oo].*"}
    got = [v for v in apply_fn(spark, spec, MATCH_CITIES)
           if v is not None]
    assert sorted(got) == sorted(
        ["Quito", "Tokyo", "Stockholm", "Pretoria", "Wellington"])
    assert apply_fn(spark, {"type": "partial", "expr": "^$"},
                    [None, ""]) == [None, ""]


def test_search_query_spec_extraction(spark):
    """SearchQuerySpecDimExtractionFnTest — fragment spec keeps matching
    values, case sensitivity honored."""
    spec = {"type": "searchQuery",
            "query": {"type": "fragment", "values": ["tO", "yO"],
                      "caseSensitive": False}}
    got = [v for v in apply_fn(spark, spec, SEARCH_CITIES) if v is not None]
    assert sorted(got) == ["Kyoto", "Tokyo", "Toyokawa", "Yorktown"]

    spec_cs = {"type": "searchQuery",
               "query": {"type": "fragment", "values": ["to", "yo"],
                         "caseSensitive": True}}
    got = [v for v in apply_fn(spark, spec_cs, SEARCH_CITIES) if v is not None]
    assert got == ["Kyoto"]

    spec_cs2 = {"type": "searchQuery",
                "query": {"type": "fragment", "values": ["To", "yo"],
                          "caseSensitive": True}}
    got = [v for v in apply_fn(spark, spec_cs2, SEARCH_CITIES) if v is not None]
    assert sorted(got) == ["Tokyo", "Toyokawa"]


# ------------------------------------------------- strlen / substring


def test_strlen(spark):
    """StrlenExtractionFnTest sql branch — Java UTF-16 length (the emoji
    surrogate pair counts 2)."""
    spec = {"type": "strlen"}
    assert apply_fn(spark, spec,
                    [None, "", "x", "foo", "föo", "\U0001F602"]) == \
        [None, "0", "1", "3", "3", "2"]


def test_substring(spark):
    """testSubstrings / testNoLength / testNullAndEmpty sql branch."""
    spec = {"type": "substring", "index": 1, "length": 3}
    assert apply_fn(spark, spec, ["apple", "be", "cool", "a"]) == \
        ["ppl", "e", "ool", None]
    nolen = {"type": "substring", "index": 1}
    assert apply_fn(spark, nolen, ["/abcdef", "/"]) == ["abcdef", None]


# ------------------------------------------------------ time extraction


def test_time_dim_extraction(spark):
    """TimeDimExtractionFnTest — month roll-up plus the empty/null/
    unparseable sql branch (unparseable passes through)."""
    dims = ["01/01/2012", "01/02/2012", "03/03/2012", "03/04/2012",
            "05/05/2012", "12/21/2012"]
    spec = {"type": "time", "timeFormat": "MM/dd/yyyy",
            "resultFormat": "MM/yyyy", "joda": True}
    assert set(apply_fn(spark, spec, dims)) == \
        {"01/2012", "03/2012", "05/2012", "12/2012"}
    assert apply_fn(spark, spec, [None, "", "foo"]) == [None, "", "foo"]


def test_time_format_extraction(spark):
    """TimeFormatExtractionFnTest testDayOfWeekExtraction /
    testGranularExtractionWithNullPattern / testTimeZoneExtraction (in
    English — per-call locales are not portable)."""
    stamps = ["2015-01-01T23:00:00Z", "2015-01-02T23:00:00Z",
              "2015-03-03T23:00:00Z", "2015-03-04T23:00:00Z",
              "2015-05-02T23:00:00Z", "2015-12-21T23:00:00Z"]
    ts_col = "timestamp"
    assert apply_fn(spark, {"type": "timeFormat", "format": "EEEE"},
                    stamps, cast=ts_col) == \
        ["Thursday", "Friday", "Tuesday", "Wednesday", "Saturday",
         "Monday"]
    assert apply_fn(spark, {"type": "timeFormat", "granularity":
                            {"type": "duration", "duration": 86400000}},
                    stamps, cast=ts_col) == \
        ["2015-01-01T00:00:00.000Z", "2015-01-02T00:00:00.000Z",
         "2015-03-03T00:00:00.000Z", "2015-03-04T00:00:00.000Z",
         "2015-05-02T00:00:00.000Z", "2015-12-21T00:00:00.000Z"]
    berlin = {"type": "timeFormat",
              "format": "'Es ist schon 'EEEE",
              "timeZone": "Europe/Berlin"}
    assert apply_fn(spark, berlin, stamps, cast=ts_col) == \
        ["Es ist schon Friday", "Es ist schon Saturday",
         "Es ist schon Wednesday", "Es ist schon Thursday",
         "Es ist schon Sunday", "Es ist schon Tuesday"]


# ---------------------------------------------------------------- bucket


def test_bucket_extraction(spark):
    """BucketExtractionFnTest.testApply — bucketed values render with
    trailing zeros stripped; unparseable input is null."""
    fn1 = {"type": "bucket", "size": 100.0, "offset": 0.5}
    assert apply_fn(spark, fn1,
                    ["1234.99", "1", "100", "501", "-325", "2.42e3",
                     "1.2e-1", "should be null", ""]) == \
        ["1200.5", "0.5", "0.5", "500.5", "-399.5", "2400.5", "-99.5",
         None, None]
    fn2 = {"type": "bucket", "size": 3.0, "offset": 2.0}
    assert apply_fn(spark, fn2, ["2", "3", "4.22", "-8", "7.1e1"]) == \
        ["2", "2", "2", "-10", "71"]


# ---------------------------------------------------------- stringFormat


def test_string_format(spark):
    """StringFormatExtractionFnTest sql branches — NULLSTRING default
    formats null as the literal 'null'; RETURNNULL skips; EMPTYSTRING
    formats ''."""
    assert apply_fn(spark, {"type": "stringFormat", "format": "[%s]"},
                    ["1000", None]) == ["[1000]", "[null]"]
    assert apply_fn(spark, {"type": "stringFormat", "format": "[%s]",
                            "nullHandling": "returnNull"},
                    [None, "x"]) == [None, "[x]"]
    assert apply_fn(spark, {"type": "stringFormat", "format": "%s",
                            "nullHandling": "emptyString"},
                    [None]) == [""]


# -------------------------------------------------------------- cascade


def test_cascade(spark):
    """CascadeExtractionFnTest shape (regex → substring; the middle
    javascript 'str + _' stage ports as its stringFormat twin)."""
    spec = {"type": "cascade", "extractionFns": [
        {"type": "regex", "expr": "/([^/]+)/", "index": 1},
        {"type": "stringFormat", "format": "%s_"},
        {"type": "substring", "index": 0, "length": 3}]}
    assert set(apply_fn(spark, spec, PATHS)) == {"dru", "das"}


# ---------------------------------------------------------- lower/upper


def test_lower_upper(spark):
    """Lower/UpperExtractionFnTest sql branches."""
    assert apply_fn(spark, {"type": "lower"},
                    ["lOwER 1 String", "", None, "1"]) == \
        ["lower 1 string", "", None, "1"]
    assert apply_fn(spark, {"type": "upper"},
                    ["uPpER 1 String", "", None, "1"]) == \
        ["UPPER 1 STRING", "", None, "1"]


def test_lookup_extraction_expectations(spark):
    """LookupExtractionFnExpectationsTest sql branches — a null input is
    always a miss (the '' key maps only the '' input), misses replace or
    retain per the flags, and mapped-to-'' stays '' in sql mode."""
    fn_retain = {"type": "lookup",
                 "lookup": {"type": "map", "map": {"foo": "bar"}},
                 "retainMissingValue": True, "injective": False}
    assert apply_fn(spark, fn_retain, [None, "foo", "baz"]) == \
        [None, "bar", "baz"]
    fn_replace = {"type": "lookup",
                  "lookup": {"type": "map", "map": {"foo": "bar"}},
                  "retainMissingValue": False,
                  "replaceMissingValueWith": "REPLACE", "injective": False}
    assert apply_fn(spark, fn_replace, [None, "foo", "baz"]) == \
        ["REPLACE", "bar", "REPLACE"]
    fn_empty_key = {"type": "lookup",
                    "lookup": {"type": "map", "map": {"": "bar"}},
                    "retainMissingValue": False,
                    "replaceMissingValueWith": "REPLACE",
                    "injective": False}
    assert apply_fn(spark, fn_empty_key, [None, ""]) == ["REPLACE", "bar"]
    fn_empty_val = {"type": "lookup",
                    "lookup": {"type": "map", "map": {"foo": ""}},
                    "retainMissingValue": False,
                    "replaceMissingValueWith": "REPLACE",
                    "injective": False}
    assert apply_fn(spark, fn_empty_val, [None, "foo"]) == ["REPLACE", ""]
