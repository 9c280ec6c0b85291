"""BoundFilterTest.java golden port, round-7 tranche — the remaining
lexicographic/alphanumeric/numeric match families and the numeric-null
cases (processing/src/test/java/org/apache/druid/segment/filter/
BoundFilterTest.java; rows from BaseFilterTest.java:162-169 + the two
extra bound rows).  Expected lists are the sql-compatible-mode branches
(canTestNumericNullsAsDefaultValues = false).

Not ported, with reason: testRequiredColumnRewrite — Filter
.rewriteRequiredColumns is the reference's join-pushdown Java API; the
engine rewrites columns through Catalyst plan transforms with no
user-visible surface.
"""

import pytest

from tests.test_golden_bound_filter_r6 import (  # noqa: F401 (fixture)
    ALL8, bf_catalog, bound, matches)

VNUM = [{"type": "expression", "name": "vd0", "expression": "d0",
         "outputType": "DOUBLE"},
        {"type": "expression", "name": "vf0", "expression": "f0",
         "outputType": "FLOAT"},
        {"type": "expression", "name": "vl0", "expression": "l0",
         "outputType": "LONG"}]


def test_lexicographic_match_no_upper_limit(spark, bf_catalog):
    """testLexicographicMatchNoUpperLimit — dim1 > 'ab' strict."""
    assert matches(spark, bf_catalog,
                   bound("dim1", "ab", None, lower_strict=True,
                         upper_strict=True)) == ["4", "5"]


def test_lexicographic_match_no_lower_limit(spark, bf_catalog):
    """testLexicographicMatchNoLowerLimit — dim1 < 'abd' strict; nulls
    never match but '' does."""
    assert matches(spark, bf_catalog,
                   bound("dim1", None, "abd", lower_strict=True,
                         upper_strict=True)) \
        == ["0", "1", "2", "3", "5", "6", "7"]


def test_lexicographic_match_numbers(spark, bf_catalog):
    """testLexicographicMatchNumbers — digit strings compare as STRINGS
    ('10' < '2'); '-1' admits the negative-string rows."""
    assert matches(spark, bf_catalog, bound("dim1", "1", "3")) \
        == ["1", "2", "3"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "1", "3", lower_strict=True,
                         upper_strict=True)) == ["1", "2"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "-1", "3", lower_strict=True,
                         upper_strict=True)) == ["1", "2", "3", "6", "7"]


def test_lexicographic_match_surrounding_single_value(spark, bf_catalog):
    """testLexicographicMatchSurroundingSingleValue — ('ab','abd')
    strict-both isolates 'abc'."""
    assert matches(spark, bf_catalog,
                   bound("dim1", "ab", "abd", lower_strict=True,
                         upper_strict=True)) == ["5"]


def test_alphanumeric_match_no_lower_limit(spark, bf_catalog):
    """testAlphaNumericMatchNoLowerLimit — alphanumeric chunks digits as
    numbers and sorts digit chunks BEFORE non-digit chunks, so the
    '-'-prefixed strings exceed '2' but everything is under 'ZZZZZ'."""
    assert matches(spark, bf_catalog,
                   bound("dim1", None, "2", lower_strict=True,
                         upper_strict=True, ordering="alphanumeric")) \
        == ["0", "3"]
    assert matches(spark, bf_catalog,
                   bound("dim1", None, "ZZZZZ", lower_strict=True,
                         upper_strict=True, ordering="alphanumeric")) \
        == ALL8


def test_alphanumeric_match_exactly_single_value(spark, bf_catalog):
    """testAlphaNumericMatchExactlySingleValue."""
    assert matches(spark, bf_catalog,
                   bound("dim1", "2", "2", ordering="alphanumeric")) \
        == ["2"]


def test_alphanumeric_match_surrounding_single_value(spark, bf_catalog):
    """testAlphaNumericMatchSurroundingSingleValue — (1,3) strict holds
    only '2' ('10' chunks as the number 10)."""
    assert matches(spark, bf_catalog,
                   bound("dim1", "1", "3", lower_strict=True,
                         upper_strict=True, ordering="alphanumeric")) \
        == ["2"]


def test_alphanumeric_match_too_strict(spark, bf_catalog):
    """testAlphaNumericMatchTooStrict — any strict side on an exact
    value empties the range."""
    for ls, us in [(True, False), (True, True), (False, True)]:
        assert matches(spark, bf_catalog,
                       bound("dim1", "2", "2", lower_strict=ls,
                             upper_strict=us,
                             ordering="alphanumeric")) == []


def test_alphanumeric_match_with_negatives(spark, bf_catalog):
    """testAlphaNumericMatchWithNegatives — alphanumeric has NO negative
    semantics: '-2000' is a minus chunk then digits, sorting AFTER plain
    digit strings, so (-2000, 3) is empty while (3, -2000) catches the
    '10' and '-' rows."""
    assert matches(spark, bf_catalog,
                   bound("dim1", "-2000", "3", lower_strict=True,
                         upper_strict=True, ordering="alphanumeric")) == []
    assert matches(spark, bf_catalog,
                   bound("dim1", "3", "-2000", lower_strict=True,
                         upper_strict=True, ordering="alphanumeric")) \
        == ["1", "6", "7"]


def test_numeric_match_no_lower_limit(spark, bf_catalog):
    """testNumericMatchNoLowerLimit — numeric ordering parses values;
    non-numeric strings ('', 'abc') sort below numbers (null group)."""
    assert matches(spark, bf_catalog,
                   bound("dim1", None, "2", lower_strict=True,
                         upper_strict=True, ordering="numeric")) \
        == ["0", "3", "4", "5", "6", "7"]


def test_numeric_match_exactly_single_value(spark, bf_catalog):
    """testNumericMatchExactlySingleValue — incl. an exact negative
    decimal."""
    assert matches(spark, bf_catalog,
                   bound("dim1", "2", "2", ordering="numeric")) == ["2"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "-10.012", "-10.012",
                         ordering="numeric")) == ["7"]


def test_numeric_match_surrounding_single_value(spark, bf_catalog):
    """testNumericMatchSurroundingSingleValue."""
    assert matches(spark, bf_catalog,
                   bound("dim1", "1", "3", lower_strict=True,
                         upper_strict=True, ordering="numeric")) == ["2"]
    assert matches(spark, bf_catalog,
                   bound("dim1", "-11", "-10", ordering="numeric")) \
        == ["7"]


def test_numeric_match_too_strict(spark, bf_catalog):
    """testNumericMatchTooStrict."""
    for ls, us in [(True, False), (True, True), (False, True)]:
        assert matches(spark, bf_catalog,
                       bound("dim1", "2", "2", lower_strict=ls,
                             upper_strict=us, ordering="numeric")) == []


def test_numeric_match_with_negatives(spark, bf_catalog):
    """testNumericMatchWithNegatives — true numeric range over mixed
    signs."""
    assert matches(spark, bf_catalog,
                   bound("dim1", "-2000", "3", lower_strict=True,
                         upper_strict=True, ordering="numeric")) \
        == ["2", "3", "6", "7"]


def test_numeric_nulls(spark, bf_catalog):
    """testNumericNulls — bounds over typed numeric columns skip null
    rows entirely."""
    assert matches(spark, bf_catalog,
                   bound("f0", "1.0", None, ordering="numeric")) \
        == ["1", "2", "3", "5", "7"]
    assert matches(spark, bf_catalog,
                   bound("d0", "1", None, ordering="numeric")) \
        == ["1", "3", "4", "5", "6"]
    assert matches(spark, bf_catalog,
                   bound("l0", "1", None, ordering="numeric")) \
        == ["1", "2", "4", "5", "6"]


def test_numeric_nulls_and_zeros(spark, bf_catalog):
    """testNumericNullsAndZeros — sql-compatible mode: null is NOT 0, so
    [0,1] catches only the true-zero row."""
    for col in ("d0", "f0", "l0"):
        assert matches(spark, bf_catalog,
                       bound(col, "0.0", "1.0", ordering="numeric")) \
            == ["0"], col


def test_virtual_numeric_nulls_and_zeros(spark, bf_catalog):
    """testVirtualNumericNullsAndZeros — identical through expression
    virtual columns (null propagates, no default-zero coercion)."""
    for col in ("vd0", "vf0", "vl0"):
        assert matches(spark, bf_catalog,
                       bound(col, "0.0", "1.0", ordering="numeric"),
                       virtual=VNUM) == ["0"], col
