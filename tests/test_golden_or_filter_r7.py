"""OrFilterTest golden port (round 7) — OR combination tables incl. the
literal TRUE member and the AND-of-(IN, OR) composition
(processing/src/test/java/org/apache/druid/segment/filter/
OrFilterTest.java: ROWS dim0 0..5, dim1 all '0').

Not ported, with reason: testEquals — Java Object.equals/hashCode of the
filter classes; filters here are JSON dicts compiled to Catalyst
predicates."""

import datetime as _dt

import pytest
from pyspark.sql import types as T

from incubator_druid_spark.filters.filters import FilterContext, compile_filter


@pytest.fixture(scope="module")
def or_df(spark):
    schema = T.StructType([
        T.StructField("dim0", T.StringType()),
        T.StructField("dim1", T.StringType()),
    ])
    rows = [(str(i), "0") for i in range(6)]
    return spark.createDataFrame(rows, schema)


def matches(df, spec):
    pred = compile_filter(spec, FilterContext(df))
    return sorted(r["dim0"] for r in df.filter(pred).collect())


def sel(d, v):
    return {"type": "selector", "dimension": d, "value": v}


def orf(*fields):
    return {"type": "or", "fields": list(fields)}


ALL6 = [str(i) for i in range(6)]


def test_one_filter_match_some(or_df):
    """testOneFilterMatchSome — a single-member OR is the member."""
    assert matches(or_df, orf(sel("dim0", "1"))) == ["1"]


def test_one_filter_match_all(or_df):
    """testOneFilterMatchAll."""
    assert matches(or_df, orf(sel("dim1", "0"))) == ALL6


def test_one_filter_match_none(or_df):
    """testOneFilterMatchNone."""
    assert matches(or_df, orf(sel("dim1", "7"))) == []


def test_two_filter_all_or_none_combinations(or_df):
    """testTwoFilterFirstMatchesAllSecondMatchesNone /
    FirstMatchesNoneSecondMatchesAll / FirstMatchesAllSecondMatchesAll /
    FirstMatchesNoneSecondMatchesNone — OR short-circuit tables in both
    orders."""
    assert matches(or_df, orf(sel("dim1", "0"), sel("dim0", "7"))) == ALL6
    assert matches(or_df, orf(sel("dim0", "7"), sel("dim1", "0"))) == ALL6
    assert matches(or_df, orf(sel("dim1", "0"),
                              {"type": "not",
                               "field": sel("dim0", "7")})) == ALL6
    assert matches(or_df, orf(sel("dim1", "7"), sel("dim0", "7"))) == []


def test_two_filter_literally_true_member(or_df):
    """testTwoFilterFirstMatchesNoneSecondLiterallyTrue /
    FirstLiterallyTrueSecondMatchesAll — a TRUE member saturates the
    OR."""
    assert matches(or_df, orf(sel("dim0", "7"), {"type": "true"})) == ALL6
    assert matches(or_df, orf({"type": "true"},
                              {"type": "not",
                               "field": sel("dim0", "7")})) == ALL6


def test_two_filter_some_and_none(or_df):
    """testTwoFilterFirstMatchesSomeSecondMatchesNone /
    FirstMatchesNoneSecondMatchesSome."""
    assert matches(or_df, orf(sel("dim0", "3"), sel("dim1", "7"))) == ["3"]
    assert matches(or_df, orf(sel("dim1", "7"), sel("dim0", "3"))) == ["3"]


def test_three_filter_some_true_none_under_and(or_df):
    """testThreeFilterFirstMatchesSomeSecondLiterallyTrueThirdMatchesNone
    — AND(IN(0,1,2,4,5), OR(=4, TRUE, =7)) keeps the IN set."""
    spec = {"type": "and", "fields": [
        {"type": "in", "dimension": "dim0",
         "values": ["0", "1", "2", "4", "5"]},
        orf(sel("dim0", "4"), {"type": "true"}, sel("dim0", "7")),
    ]}
    assert matches(or_df, spec) == ["0", "1", "2", "4", "5"]
