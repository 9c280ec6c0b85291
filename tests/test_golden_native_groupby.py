"""Round-3 GroupByQueryRunnerTest tranche — typed numeric dimension columns,
__time-as-LONG extraction inputs, string-default rendering, dim-filter having
over typed aliases, duration granularity, and no-aggregator grouping
(processing/src/test/java/org/apache/druid/query/groupby/
GroupByQueryRunnerTest.java).  Reference doubles compare at 1e-6 relative;
the reference's JavaScript 'super-'+str extraction fns port through the
equivalent stringFormat fn (javascript is a deliberate raise)."""

import pytest

from incubator_druid_spark import translate

F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]


def gb(spark, cat, dims, aggs=None, granularity="day", intervals=None,
       **extra):
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": granularity, "intervals": intervals or F2T,
         "dimensions": dims,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"},
         ] if aggs is None else aggs}
    q.update(extra)
    return translate(q, spark, cat)


ENT = {"type": "selector", "dimension": "quality", "value": "entertainment"}
ENT_TECH = {"type": "in", "dimension": "quality",
            "values": ["entertainment", "technology"]}


def test_group_by_long_column(spark, wiki_catalog):
    """testGroupByLongColumn — LONG-typed dim, numeric asc order."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "qualityLong",
               "outputName": "ql_alias", "outputType": "LONG"}],
             filter=ENT,
             limitSpec={"type": "default", "columns": [
                 {"dimension": "ql_alias", "direction": "ascending",
                  "dimensionOrder": "numeric"}]}).collect()
    got = sorted((str(r["__time"])[:10], r["ql_alias"], r["rows"], r["idx"])
                 for r in out)
    assert got == [("2011-04-01", 1200, 1, 158),
                   ("2011-04-02", 1200, 1, 166)]


def test_group_by_long_column_descending(spark, wiki_catalog):
    """testGroupByLongColumnDescending — numeric DESC limit ordering."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "qualityLong",
               "outputName": "ql_alias", "outputType": "LONG"}],
             granularity="all", filter=ENT_TECH,
             limitSpec={"type": "default", "columns": [
                 {"dimension": "ql_alias", "direction": "descending",
                  "dimensionOrder": "numeric"}]}).collect()
    assert [(r["ql_alias"], r["rows"], r["idx"]) for r in out] == [
        (1700, 2, 175), (1200, 2, 324)]


def test_group_by_long_column_with_ex_fn(spark, wiki_catalog):
    """testGroupByLongColumnWithExFn's shape via stringFormat."""
    out = gb(spark, wiki_catalog,
             [{"type": "extraction", "dimension": "qualityLong",
               "outputName": "ql_alias",
               "extractionFn": {"type": "stringFormat",
                                "format": "super-%s"}}],
             filter=ENT).collect()
    got = sorted((str(r["__time"])[:10], r["ql_alias"], r["rows"], r["idx"])
                 for r in out)
    assert got == [("2011-04-01", "super-1200", 1, 158),
                   ("2011-04-02", "super-1200", 1, 166)]


def test_group_by_long_time_column(spark, wiki_catalog):
    """testGroupByLongTimeColumn — __time as LONG groups by epoch millis."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "__time",
               "outputName": "time_alias", "outputType": "LONG"}],
             filter=ENT).collect()
    got = sorted((r["time_alias"], r["rows"], r["idx"]) for r in out)
    assert got == [(1301616000000, 1, 158), (1301702400000, 1, 166)]


def test_group_by_long_time_column_with_ex_fn(spark, wiki_catalog):
    """testGroupByLongTimeColumnWithExFn — a string extraction fn over
    __time sees the MILLIS rendering ('super-1301616000000'), not a
    formatted datetime."""
    out = gb(spark, wiki_catalog,
             [{"type": "extraction", "dimension": "__time",
               "outputName": "time_alias",
               "extractionFn": {"type": "stringFormat",
                                "format": "super-%s"}}],
             filter=ENT).collect()
    got = sorted((r["time_alias"], r["rows"], r["idx"]) for r in out)
    assert got == [("super-1301616000000", 1, 158),
                   ("super-1301702400000", 1, 166)]


def test_group_by_float_column(spark, wiki_catalog):
    """testGroupByFloatColumn — the double index column as a FLOAT dim."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "index",
               "outputName": "index_alias", "outputType": "FLOAT"}],
             filter=ENT,
             limitSpec={"type": "default", "columns": [
                 {"dimension": "index_alias", "direction": "ascending",
                  "dimensionOrder": "numeric"}]}).collect()
    got = sorted((str(r["__time"])[:10], r["index_alias"], r["rows"],
                  r["idx"]) for r in out)
    assert got[0][0] == "2011-04-01"
    assert got[0][1] == pytest.approx(158.747224, rel=1e-6)
    assert got[0][2:] == (1, 158)
    assert got[1][0] == "2011-04-02"
    assert got[1][1] == pytest.approx(166.016049, rel=1e-6)
    assert got[1][2:] == (1, 166)


def test_group_by_float_column_descending(spark, wiki_catalog):
    """testGroupByFloatColumnDescending."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "qualityFloat",
               "outputName": "qf_alias", "outputType": "FLOAT"}],
             granularity="all", filter=ENT_TECH,
             limitSpec={"type": "default", "columns": [
                 {"dimension": "qf_alias", "direction": "descending",
                  "dimensionOrder": "numeric"}]}).collect()
    assert [(r["qf_alias"], r["rows"], r["idx"]) for r in out] == [
        (17000.0, 2, 175), (12000.0, 2, 324)]


def test_group_by_double_column_descending(spark, wiki_catalog):
    """testGroupByDoubleColumnDescending."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "qualityDouble",
               "outputName": "alias", "outputType": "DOUBLE"}],
             granularity="all", filter=ENT_TECH,
             limitSpec={"type": "default", "columns": [
                 {"dimension": "alias", "direction": "descending",
                  "dimensionOrder": "numeric"}]}).collect()
    assert [(r["alias"], r["rows"], r["idx"]) for r in out] == [
        (17000.0, 2, 175), (12000.0, 2, 324)]


def test_group_by_float_column_with_ex_fn(spark, wiki_catalog):
    """testGroupByFloatColumnWithExFn — stringFormat over the double index
    renders the Java double string."""
    out = gb(spark, wiki_catalog,
             [{"type": "extraction", "dimension": "index",
               "outputName": "index_alias",
               "extractionFn": {"type": "stringFormat",
                                "format": "super-%s"}}],
             filter=ENT).collect()
    got = sorted((str(r["__time"])[:10], r["index_alias"], r["rows"],
                  r["idx"]) for r in out)
    assert got == [("2011-04-01", "super-158.747224", 1, 158),
                   ("2011-04-02", "super-166.016049", 1, 166)]


def test_group_by_having_on_long_and_float(spark, wiki_catalog):
    """testGroupByWithHavingSpecOnLongAndFloat — dim-filter having over
    typed output aliases: string selector matches the LONG rendering,
    numeric bound brackets the FLOAT alias."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "all",
         "intervals": F2T,
         "dimensions": [
             {"type": "default", "dimension": "market",
              "outputName": "alias"},
             {"type": "default", "dimension": "qualityLong",
              "outputName": "ql_alias", "outputType": "LONG"},
             {"type": "default", "dimension": "__time",
              "outputName": "time_alias", "outputType": "LONG"},
             {"type": "default", "dimension": "index",
              "outputName": "index_alias", "outputType": "FLOAT"}],
         "aggregations": [{"type": "count", "name": "rows"}],
         "having": {"type": "filter", "filter": {"type": "and", "fields": [
             {"type": "selector", "dimension": "ql_alias", "value": "1400"},
             {"type": "selector", "dimension": "time_alias",
              "value": "1301616000000"},
             {"type": "bound", "dimension": "index_alias",
              "lower": "1310.0", "upper": "1320.0", "lowerStrict": True,
              "upperStrict": True, "ordering": "numeric"}]}}}
    out = translate(q, spark, wiki_catalog).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["alias"], r["time_alias"], r["ql_alias"], r["rows"]) == (
        "total_market", 1301616000000, 1400, 1)
    assert r["index_alias"] == pytest.approx(1314.8397, rel=1e-6)


def test_group_by_long_and_float_output_as_string(spark, wiki_catalog):
    """testGroupByLongAndFloatOutputAsString — dict-form default specs with
    no outputType render numeric columns as STRINGS ('1200', '12000.0')."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "qualityLong",
               "outputName": "ql_alias"},
              {"type": "default", "dimension": "qualityFloat",
               "outputName": "qf_alias"}],
             filter=ENT).collect()
    got = sorted((str(r["__time"])[:10], r["ql_alias"], r["qf_alias"],
                  r["rows"], r["idx"]) for r in out)
    assert got == [("2011-04-01", "1200", "12000.0", 1, 158),
                   ("2011-04-02", "1200", "12000.0", 1, 166)]


def test_group_by_string_output_as_long(spark, wiki_catalog):
    """testGroupByStringOutputAsLong — strlen extraction + LONG outputType
    ('entertainment' → 13)."""
    out = gb(spark, wiki_catalog,
             [{"type": "extraction", "dimension": "quality",
               "outputName": "alias", "outputType": "LONG",
               "extractionFn": {"type": "strlen"}}],
             filter=ENT).collect()
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
                 for r in out)
    assert got == [("2011-04-01", 13, 1, 158), ("2011-04-02", 13, 1, 166)]


def test_group_by_no_aggregators(spark, wiki_catalog):
    """testGroupByNoAggregators — distinct (day, quality) pairs."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "alias"}],
             aggs=[]).collect()
    got = sorted((str(r["__time"])[:10], r["alias"]) for r in out)
    qualities = ["automotive", "business", "entertainment", "health",
                 "mezzanine", "news", "premium", "technology", "travel"]
    assert got == ([("2011-04-01", q) for q in qualities]
                   + [("2011-04-02", q) for q in qualities])


def test_group_by_duration_granularity(spark, wiki_catalog):
    """testGroupByWithDurationGranularity — an 86400 MILLIS duration; the
    fixture's rows sit exactly on midnights, which are multiples of 86.4 s
    from the epoch, so buckets land on the same day boundaries."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "alias"}],
             granularity={"type": "duration", "duration": 86400}).collect()
    got = {(str(r["__time"])[:10], r["alias"]): (r["rows"], r["idx"])
           for r in out}
    assert len(got) == 18
    assert got[("2011-04-01", "mezzanine")] == (3, 2870)
    assert got[("2011-04-02", "premium")] == (3, 2505)
    assert got[("2011-04-01", "technology")] == (1, 78)
    assert got[("2011-04-02", "travel")] == (1, 126)


def test_group_by_output_name_collisions(spark, wiki_catalog):
    """testGroupByWithOutputNameCollisions — '[alias] already defined'."""
    with pytest.raises(ValueError, match=r"\[alias\] already defined"):
        gb(spark, wiki_catalog,
           [{"type": "default", "dimension": "quality",
             "outputName": "alias"}],
           aggs=[{"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "alias",
                  "fieldName": "index"}]).collect()


def test_group_by_alphanumeric_dimension_order(spark, wiki_catalog):
    """testGroupByWithAlphaNumericDimensionOrder — lookup extraction fn
    remaps qualities, limitSpec sorts ALPHANUMERIC (number chunks compare
    numerically: health09 < health20 < health105 < health999)."""
    mapping = {"automotive": "health105", "business": "health20",
               "entertainment": "travel47", "health": "health55",
               "mezzanine": "health09", "news": "health0000",
               "premium": "health999", "technology": "travel123",
               "travel": "travel555"}
    out = gb(spark, wiki_catalog,
             [{"type": "extraction", "dimension": "quality",
               "outputName": "alias",
               "extractionFn": {"type": "lookup",
                                "lookup": {"type": "map", "map": mapping}}}],
             limitSpec={"type": "default", "columns": [
                 {"dimension": "alias",
                  "dimensionOrder": "alphanumeric"}]}).collect()
    per_day = {}
    for r in out:
        per_day.setdefault(str(r["__time"])[:10], []).append(
            (r["alias"], r["rows"], r["idx"]))
    assert per_day["2011-04-01"] == [
        ("health0000", 1, 121), ("health09", 3, 2870), ("health20", 1, 118),
        ("health55", 1, 120), ("health105", 1, 135), ("health999", 3, 2900),
        ("travel47", 1, 158), ("travel123", 1, 78), ("travel555", 1, 119)]
    assert per_day["2011-04-02"] == [
        ("health0000", 1, 114), ("health09", 3, 2447), ("health20", 1, 112),
        ("health55", 1, 113), ("health105", 1, 147), ("health999", 3, 2505),
        ("travel47", 1, 166), ("travel123", 1, 97), ("travel555", 1, 126)]


def test_group_by_time_column_long_sum(spark, wiki_catalog):
    """testGroupByWithTimeColumn — longSum over __time is millis."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "all",
         "intervals": F2T,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "sumtime", "fieldName": "__time"}]}
    out = translate(q, spark, wiki_catalog).collect()
    assert out[0]["rows"] == 26 and out[0]["sumtime"] == 33843139200000


def test_string_virtual_column_no_literal_concat(spark, wiki_catalog):
    """`market + market` — binary + with TWO string COLUMN operands (no
    literal) still concatenates: the virtual-column compiler tags
    string-typed schema columns for BinPlusExpr.evalString dispatch."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "all",
         "intervals": F2T,
         "virtualColumns": [{"type": "expression", "name": "vc",
                             "expression": "market + market",
                             "outputType": "STRING"}],
         "dimensions": [{"type": "default", "dimension": "vc",
                         "outputName": "vc"}],
         "aggregations": [{"type": "count", "name": "rows"}]}
    out = {r["vc"]: r["rows"] for r in translate(q, spark, wiki_catalog).collect()}
    assert out == {"spotspot": 18, "total_markettotal_market": 4,
                   "upfrontupfront": 4}


CANON_18 = {
    ("2011-04-01", "automotive"): (1, 135),
    ("2011-04-01", "business"): (1, 118),
    ("2011-04-01", "entertainment"): (1, 158),
    ("2011-04-01", "health"): (1, 120),
    ("2011-04-01", "mezzanine"): (3, 2870),
    ("2011-04-01", "news"): (1, 121),
    ("2011-04-01", "premium"): (3, 2900),
    ("2011-04-01", "technology"): (1, 78),
    ("2011-04-01", "travel"): (1, 119),
    ("2011-04-02", "automotive"): (1, 147),
    ("2011-04-02", "business"): (1, 112),
    ("2011-04-02", "entertainment"): (1, 166),
    ("2011-04-02", "health"): (1, 113),
    ("2011-04-02", "mezzanine"): (3, 2447),
    ("2011-04-02", "news"): (1, 114),
    ("2011-04-02", "premium"): (3, 2505),
    ("2011-04-02", "technology"): (1, 97),
    ("2011-04-02", "travel"): (1, 126),
}

RENAME_MAP = {q: q + "0" for q in
              ["automotive", "business", "entertainment", "health",
               "mezzanine", "news", "premium", "technology", "travel"]}


@pytest.mark.parametrize("retain,injective", [
    (False, False), (True, False), (True, True), (False, True)])
def test_group_by_rename_lookup_variants(retain, injective, spark,
                                         wiki_catalog):
    """testGroupByWithRebucketRename / SimpleRename{RetainMissing,
    RetainMissingNonInjective,AndMissingString,} — a total rename map gives
    identical results across retainMissingValue/injective flags."""
    out = gb(spark, wiki_catalog,
             [{"type": "extraction", "dimension": "quality",
               "outputName": "alias",
               "extractionFn": {"type": "lookup",
                                "lookup": {"type": "map",
                                           "map": RENAME_MAP},
                                "retainMissingValue": retain,
                                "injective": injective}}]).collect()
    got = {(str(r["__time"])[:10], r["alias"]): (r["rows"], r["idx"])
           for r in out}
    assert got == {(d, q + "0"): v for (d, q), v in CANON_18.items()}


def test_group_by_extraction_dim_filter_or(spark, wiki_catalog):
    """testGroupByWithExtractionDimFilter — deprecated `extraction` filter
    matching the lookup-mapped value, OR'ed with plain selectors; covers
    every quality → the canonical 18 rows."""
    lk = {"type": "lookup",
          "lookup": {"type": "map", "map": {
              "automotive": "automotiveAndBusinessAndNewsAndMezzanine",
              "business": "automotiveAndBusinessAndNewsAndMezzanine",
              "mezzanine": "automotiveAndBusinessAndNewsAndMezzanine",
              "news": "automotiveAndBusinessAndNewsAndMezzanine"}},
          "retainMissingValue": False, "injective": False}
    filt = {"type": "or", "fields": [
        {"type": "extraction", "dimension": "quality",
         "value": "automotiveAndBusinessAndNewsAndMezzanine",
         "extractionFn": lk}] + [
        {"type": "selector", "dimension": "quality", "value": v}
        for v in ["entertainment", "health", "premium", "technology",
                  "travel"]]}
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "alias"}], filter=filt).collect()
    got = {(str(r["__time"])[:10], r["alias"]): (r["rows"], r["idx"])
           for r in out}
    assert got == CANON_18


def test_group_by_extraction_dim_filter_null_or_empty_mapping(
        spark, wiki_catalog):
    """testGroupByWithExtractionDimFilterCaseMappingValueIsNullOrEmpty
    (SQL-null mode): searching '' matches only the key mapped to '' (news);
    a null mapping does NOT match ''."""
    lk = {"type": "lookup",
          "lookup": {"type": "map", "map": {
              "automotive": "automotive0", "business": "business0",
              "entertainment": "entertainment0", "health": "health0",
              "mezzanine": None, "news": "", "premium": "premium0",
              "technology": "technology0", "travel": "travel0"}}}
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "alias"}],
             filter={"type": "extraction", "dimension": "quality",
                     "value": "", "extractionFn": lk}).collect()
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
                 for r in out)
    assert got == [("2011-04-01", "news", 1, 121),
                   ("2011-04-02", "news", 1, 114)]


def test_group_by_extraction_dim_filter_value_not_in_map(spark,
                                                         wiki_catalog):
    """testGroupByWithExtractionDimFilterWhenSearchValueNotInTheMap —
    empty lookup map, search value unmapped → zero rows."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "alias"}],
             filter={"type": "extraction", "dimension": "quality",
                     "value": "NOT_THERE",
                     "extractionFn": {"type": "lookup",
                                      "lookup": {"type": "map",
                                                 "map": {}}}}).collect()
    assert out == []


def test_group_by_extraction_dim_filter_key_is_null(spark, wiki_catalog):
    """testGroupByWithExtractionDimFilterKeyisNull (SQL-null mode) — a
    lookup with replaceMissingValueWith over a NONEXISTENT column maps every
    (null) value to REPLACED_VALUE → all rows match, grouped under null."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "null_column",
               "outputName": "alias"}],
             filter={"type": "extraction", "dimension": "null_column",
                     "value": "REPLACED_VALUE",
                     "extractionFn": {
                         "type": "lookup",
                         "lookup": {"type": "map", "map": {"": "NOT_USED"}},
                         "replaceMissingValueWith": "REPLACED_VALUE"}}
             ).collect()
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
                 for r in out)
    assert got == [("2011-04-01", None, 13, 6619),
                   ("2011-04-02", None, 13, 5827)]


def test_group_by_aggregator_filter_with_extraction_fn(spark, wiki_catalog):
    """testGroupByWithAggregatorFilterAndExtractionFunction — FILTERED aggs
    whose filter uses a lookup extraction (mezzanine+news → one value,
    misses → 'missing'): non-matching groups keep rows=0 and a NULL sum."""
    lk = {"type": "lookup",
          "lookup": {"type": "map", "map": {
              "automotive": "automotive0", "business": "business0",
              "entertainment": "entertainment0", "health": "health0",
              "mezzanine": "mezzanineANDnews", "news": "mezzanineANDnews",
              "premium": "premium0", "technology": "technology0",
              "travel": "travel0"}},
          "replaceMissingValueWith": "missing"}
    filt = {"type": "extraction", "dimension": "quality",
            "value": "mezzanineANDnews", "extractionFn": lk}
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "alias"}],
             aggs=[{"type": "filtered", "filter": filt,
                    "aggregator": {"type": "count", "name": "rows"}},
                   {"type": "filtered", "filter": filt,
                    "aggregator": {"type": "longSum", "name": "idx",
                                   "fieldName": "index"}}]).collect()
    got = {(str(r["__time"])[:10], r["alias"]): (r["rows"], r["idx"])
           for r in out}
    assert len(got) == 18
    assert got[("2011-04-01", "mezzanine")] == (3, 2870)
    assert got[("2011-04-01", "news")] == (1, 121)
    assert got[("2011-04-02", "mezzanine")] == (3, 2447)
    assert got[("2011-04-02", "news")] == (1, 114)
    for (d, q), (r_, i_) in got.items():
        if q not in ("mezzanine", "news"):
            assert (r_, i_) == (0, None), (d, q)


def test_group_by_extraction_dim_filter_many_to_one(spark, wiki_catalog):
    """testGroupByWithExtractionDimFilterOptimazitionManyToOne — injective
    flag set, two keys map to the search value."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "quality",
               "outputName": "alias"}],
             filter={"type": "extraction", "dimension": "quality",
                     "value": "newsANDmezzanine",
                     "extractionFn": {
                         "type": "lookup",
                         "lookup": {"type": "map", "map": {
                             "mezzanine": "newsANDmezzanine",
                             "news": "newsANDmezzanine"}},
                         "injective": True}}).collect()
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
                 for r in out)
    assert got == [("2011-04-01", "mezzanine", 3, 2870),
                   ("2011-04-01", "news", 1, 121),
                   ("2011-04-02", "mezzanine", 3, 2447),
                   ("2011-04-02", "news", 1, 114)]


def test_group_by_extraction_dim_filter_null_dims(spark, wiki_catalog):
    """testGroupByWithExtractionDimFilterNullDims (SQL-null mode) — the
    nonexistent column's nulls hit replaceMissingValueWith('EMPTY') and the
    filter value 'EMPTY' matches every row."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "null_column",
               "outputName": "alias"}],
             filter={"type": "extraction", "dimension": "null_column",
                     "value": "EMPTY",
                     "extractionFn": {
                         "type": "lookup",
                         "lookup": {"type": "map",
                                    "map": {"": "SHOULD_NOT_BE_USED"}},
                         "replaceMissingValueWith": "EMPTY",
                         "injective": True}}).collect()
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
                 for r in out)
    assert got == [("2011-04-01", None, 13, 6619),
                   ("2011-04-02", None, 13, 5827)]


# --------------------------------------------------------------------------
# Subquery (query datasource) family
# --------------------------------------------------------------------------

FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
SECOND = ["2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"]


def _inner_quality_day(aggs=None, intervals=None, virtual=None, **extra):
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": intervals or F2T,
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "alias"}],
         "aggregations": aggs if aggs is not None else [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"}]}
    if virtual:
        q["virtualColumns"] = virtual
    q.update(extra)
    return q


def test_identical_subquery(spark, wiki_catalog):
    """testIdenticalSubquery — outer re-groups the inner result on the same
    key, summing the inner partials (the reference's no-op JS filter is the
    javascript raise here; `true` filter is the equivalent)."""
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query",
                            "query": _inner_quality_day(
                                filter={"type": "true"})},
             "granularity": "day", "intervals": F2T,
             "dimensions": [{"type": "default", "dimension": "alias",
                             "outputName": "alias"}],
             "aggregations": [
                 {"type": "longSum", "name": "rows", "fieldName": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "idx"}]}
    got = {(str(r["__time"])[:10], r["alias"]): (r["rows"], r["idx"])
           for r in translate(outer, spark, wiki_catalog).collect()}
    assert got == CANON_18


def test_subquery_with_multiple_intervals_in_outer_query(spark,
                                                         wiki_catalog):
    """testSubqueryWithMultipleIntervalsInOuterQuery — the outer interval
    list re-filters the inner result's day buckets."""
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": _inner_quality_day()},
             "granularity": "day",
             "intervals": ["2011-04-01T00:00:00.000Z/2011-04-01T23:58:00.000Z",
                           "2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
             "dimensions": [{"type": "default", "dimension": "alias",
                             "outputName": "alias"}],
             "aggregations": [
                 {"type": "longSum", "name": "rows", "fieldName": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "idx"}]}
    got = {(str(r["__time"])[:10], r["alias"]): (r["rows"], r["idx"])
           for r in translate(outer, spark, wiki_catalog).collect()}
    assert got == CANON_18


def test_subquery_with_extraction_fn_in_outer_query(spark, wiki_catalog):
    """testSubqueryWithExtractionFnInOuterQuery (apache/druid#2556) — regex
    extraction with replaceMissingValue collapses every inner group to
    'a'."""
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": _inner_quality_day()},
             "granularity": "day", "intervals": F2T,
             "dimensions": [{"type": "extraction", "dimension": "alias",
                             "outputName": "alias",
                             "extractionFn": {
                                 "type": "regex", "expr": "(a).*",
                                 "replaceMissingValue": True,
                                 "replaceMissingValueWith": "a"}}],
             "aggregations": [
                 {"type": "longSum", "name": "rows", "fieldName": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "idx"}]}
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
                 for r in translate(outer, spark, wiki_catalog).collect())
    assert got == [("2011-04-01", "a", 13, 6619),
                   ("2011-04-02", "a", 13, 5827)]


def test_different_grouping_subquery(spark, wiki_catalog):
    """testDifferentGroupingSubquery — outer aggregates WITHOUT dimensions
    over inner per-quality sums (doubleMax), incl. the virtual-column
    phase: longSum over float(-index + 100) truncates per row."""
    inner = _inner_quality_day(aggs=[
        {"type": "count", "name": "rows"},
        {"type": "longSum", "name": "idx", "fieldName": "index"},
        {"type": "longSum", "name": "indexMaxPlusTen",
         "fieldName": "imp10"}],
        virtual=[{"type": "expression", "name": "imp10",
                  "expression": "index + 10", "outputType": "DOUBLE"}])
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": inner},
             "granularity": "day", "intervals": F2T,
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "doubleMax", "name": "idx", "fieldName": "idx"},
                 {"type": "doubleMax", "name": "indexMaxPlusTen",
                  "fieldName": "indexMaxPlusTen"}]}
    got = sorted((str(r["__time"])[:10], r["rows"], r["idx"],
                  r["indexMaxPlusTen"])
                 for r in translate(outer, spark, wiki_catalog).collect())
    assert got == [("2011-04-01", 9, 2900.0, 2930.0),
                   ("2011-04-02", 9, 2505.0, 2535.0)]
    # phase 2: inner idx becomes longSum over the float expr -index + 100
    inner2 = _inner_quality_day(aggs=[
        {"type": "count", "name": "rows"},
        {"type": "longSum", "name": "idx", "fieldName": "expr"},
        {"type": "longSum", "name": "indexMaxPlusTen",
         "fieldName": "imp10"}],
        virtual=[{"type": "expression", "name": "expr",
                  "expression": "-index + 100", "outputType": "FLOAT"},
                 {"type": "expression", "name": "imp10",
                  "expression": "index + 10", "outputType": "DOUBLE"}])
    outer2 = dict(outer, dataSource={"type": "query", "query": inner2})
    got2 = sorted((str(r["__time"])[:10], r["rows"], r["idx"],
                   r["indexMaxPlusTen"])
                  for r in translate(outer2, spark, wiki_catalog).collect())
    assert got2 == [("2011-04-01", 9, 21.0, 2930.0),
                    ("2011-04-02", 9, 2.0, 2535.0)]


def test_different_interval_subquery(spark, wiki_catalog):
    """testDifferentIntervalSubquery — outer SECOND_ONLY interval over an
    inner FIRST_TO_THIRD result."""
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": _inner_quality_day()},
             "granularity": "day", "intervals": SECOND,
             "aggregations": [{"type": "doubleMax", "name": "idx",
                               "fieldName": "idx"}]}
    got = [(str(r["__time"])[:10], r["idx"])
           for r in translate(outer, spark, wiki_catalog).collect()]
    assert got == [("2011-04-02", 2505.0)]


def test_empty_subquery(spark, wiki_catalog):
    """testEmptySubquery — inner over an empty interval → outer empty."""
    inner = _inner_quality_day(
        intervals=["2020-04-02T00:00:00.000Z/2020-04-03T00:00:00.000Z"])
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": inner},
             "granularity": "day", "intervals": F2T,
             "aggregations": [{"type": "doubleMax", "name": "idx",
                               "fieldName": "idx"}]}
    assert translate(outer, spark, wiki_catalog).count() == 0


def test_time_as_output_name_raises(spark, wiki_catalog):
    """testGroupByTimeExtractionNamedUnderUnderTime +
    testGroupByWithUnderUnderTimeAsDimensionNameWithHavingAndLimit —
    '__time' is a reserved output name."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "all",
         "intervals": F2T,
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "__time"}],
         "aggregations": [{"type": "count", "name": "rows"}]}
    with pytest.raises(ValueError, match="'__time' cannot be used"):
        translate(q, spark, wiki_catalog)
    q2 = {"queryType": "groupBy", "dataSource": "wiki",
          "granularity": "all", "intervals": F2T,
          "dimensions": [{"type": "default", "dimension": "market",
                          "outputName": "market"}],
          "aggregations": [{"type": "longSum", "name": "__time",
                            "fieldName": "index"}]}
    with pytest.raises(ValueError, match="'__time' cannot be used"):
        translate(q2, spark, wiki_catalog)


def test_subquery_with_outer_filter_aggregator(spark, wiki_catalog):
    """testSubqueryWithOuterFilterAggregator — filtered count over the
    inner (market, quality, day) result: 837 spot rows."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": FULL,
             "dimensions": [
                 {"type": "default", "dimension": "market",
                  "outputName": "market"},
                 {"type": "default", "dimension": "quality",
                  "outputName": "quality"}],
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "index",
                  "fieldName": "index"}]}
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": inner},
             "granularity": "all", "intervals": FULL,
             "aggregations": [
                 {"type": "filtered",
                  "filter": {"type": "selector", "dimension": "market",
                             "value": "spot"},
                  "aggregator": {"type": "count", "name": "rows"}}]}
    out = translate(outer, spark, wiki_catalog).collect()
    assert len(out) == 1 and out[0]["rows"] == 837


def test_subquery_with_outer_time_filter(spark, wiki_catalog):
    """testSubqueryWithOuterTimeFilter — timeFormat extraction filters over
    the INNER result's __time: day-of-month in (1,2,3), filtered-count of
    Fridays (only 2011-04-01 is one)."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": FULL,
             "dimensions": [
                 {"type": "default", "dimension": "market",
                  "outputName": "market"},
                 {"type": "default", "dimension": "quality",
                  "outputName": "quality"}],
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "index",
                  "fieldName": "index"}]}
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": inner},
             "granularity": "day", "intervals": FULL,
             "filter": {"type": "in", "dimension": "__time",
                        "values": ["1", "2", "3"],
                        "extractionFn": {"type": "timeFormat",
                                         "format": "d"}},
             "aggregations": [
                 {"type": "filtered",
                  "filter": {"type": "selector", "dimension": "__time",
                             "value": "Friday",
                             "extractionFn": {"type": "timeFormat",
                                              "format": "EEEE"}},
                  "aggregator": {"type": "count", "name": "rows"}}]}
    got = sorted((str(r["__time"])[:10], r["rows"])
                 for r in translate(outer, spark, wiki_catalog).collect())
    assert got == [("2011-02-01", 0), ("2011-02-02", 0), ("2011-02-03", 0),
                   ("2011-03-01", 0), ("2011-03-02", 0), ("2011-03-03", 0),
                   ("2011-04-01", 13), ("2011-04-02", 0),
                   ("2011-04-03", 0)]


def test_subquery_no_agg_inner_with_outer_count(spark, wiki_catalog):
    """testSubqueryWithContextTimeout / testSubqueryWithOuterCountAggregator
    — an inner groupBy with NO aggregators feeding an outer count (18
    distinct (day, quality) groups); plus OuterVirtualColumns: longSum over
    a constant-1 expression."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": FULL,
             "dimensions": [{"type": "default", "dimension": "quality",
                             "outputName": "alias"}]}
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": inner},
             "granularity": "all", "intervals": F2T,
             "aggregations": [{"type": "count", "name": "count"}],
             "context": {"timeout": 10000}}
    out = translate(outer, spark, wiki_catalog).collect()
    assert len(out) == 1 and out[0]["count"] == 18
    outer_vc = {"queryType": "groupBy",
                "dataSource": {"type": "query", "query": inner},
                "granularity": "all", "intervals": F2T,
                "virtualColumns": [{"type": "expression", "name": "expr",
                                    "expression": "1",
                                    "outputType": "FLOAT"}],
                "aggregations": [{"type": "longSum", "name": "count",
                                  "fieldName": "expr"}]}
    out = translate(outer_vc, spark, wiki_catalog).collect()
    assert len(out) == 1 and out[0]["count"] == 18


def test_subquery_with_outer_cardinality_aggregator(spark, wiki_catalog):
    """testSubqueryWithOuterCardinalityAggregator — 9 distinct qualities
    through the inner (market, quality) grouping (exact here; the reference
    asserts its HLL estimate)."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "all", "intervals": FULL,
             "dimensions": [
                 {"type": "default", "dimension": "market",
                  "outputName": "market"},
                 {"type": "default", "dimension": "quality",
                  "outputName": "quality"}],
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "index",
                  "fieldName": "index"}]}
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": inner},
             "granularity": "all", "intervals": FULL,
             "aggregations": [{"type": "cardinality", "name": "car",
                               "fields": ["quality"], "byRow": False}]}
    out = translate(outer, spark, wiki_catalog).collect()
    assert len(out) == 1 and round(float(out[0]["car"])) == 9


def test_merge_results_with_order_by_variants(spark, wiki_catalog):
    """testMergeResultsWithOrderBy — a P1M bucket over two days, the four
    limitSpec orderings (idx asc, rows+idx asc, idx desc, rows+idx desc)."""
    base_rows = [("automotive", 2, 269), ("business", 2, 217),
                 ("entertainment", 2, 319), ("health", 2, 216),
                 ("mezzanine", 6, 4420), ("news", 2, 221),
                 ("premium", 6, 4416), ("technology", 2, 177),
                 ("travel", 2, 243)]
    cases = [
        ([{"dimension": "idx"}],
         sorted(base_rows, key=lambda t: t[2])),
        ([{"dimension": "rows"}, {"dimension": "idx"}],
         sorted(base_rows, key=lambda t: (t[1], t[2]))),
        ([{"dimension": "idx", "direction": "descending"}],
         sorted(base_rows, key=lambda t: -t[2])),
        ([{"dimension": "rows", "direction": "descending"},
          {"dimension": "idx", "direction": "descending"}],
         sorted(base_rows, key=lambda t: (-t[1], -t[2]))),
    ]
    for columns, exp in cases:
        q = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": {"type": "period", "period": "P1M"},
             "intervals": ["2011-04-02T00:00:00Z/2011-04-04T00:00:00Z"],
             "dimensions": [{"type": "default", "dimension": "quality",
                             "outputName": "alias"}],
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "index"}],
             "limitSpec": {"type": "default", "columns": columns}}
        got = [(r["alias"], r["rows"], r["idx"])
               for r in translate(q, spark, wiki_catalog).collect()]
        assert got == exp, columns


def test_merge_results_with_negative_limit(spark, wiki_catalog):
    """testMergeResultsWithNegativeLimit — limit must be >= 0."""
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": {"type": "period", "period": "P1M"},
         "intervals": ["2011-04-02T00:00:00Z/2011-04-04T00:00:00Z"],
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "alias"}],
         "aggregations": [{"type": "count", "name": "rows"}],
         "limitSpec": {"type": "default", "limit": -1}}
    with pytest.raises(ValueError, match="must be >= 0"):
        translate(q, spark, wiki_catalog).collect()


def test_merge_results_limit_order_by_math_expression(spark, wiki_catalog):
    """testMergeResultsAcrossMultipleDaysWithLimitAndOrderByUsingMath-
    Expressions — longSum over a float virtual column (index*2 +
    float(index)/10; the reference's indexMin metric is the float read of
    index), desc by idx with limit 14 across day buckets."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": F2T,
         "virtualColumns": [{"type": "expression", "name": "expr",
                             "expression":
                                 "index * 2 + cast(index, 'FLOAT') / 10",
                             "outputType": "FLOAT"}],
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "alias"}],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "expr"}],
         "limitSpec": {"type": "default", "limit": 14, "columns": [
             {"dimension": "idx", "direction": "descending"}]}}
    got = [(str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
           for r in translate(q, spark, wiki_catalog).collect()]
    # DefaultLimitSpec.makeComparator: time orders FIRST, idx desc within
    # each day, limit over the flattened sequence — day1's technology(165)
    # makes the cut while day2's larger values past the 14th row do not
    exp = [("2011-04-01", "premium", 3, 6090),
           ("2011-04-01", "mezzanine", 3, 6030),
           ("2011-04-01", "entertainment", 1, 333),
           ("2011-04-01", "automotive", 1, 285),
           ("2011-04-01", "news", 1, 255),
           ("2011-04-01", "health", 1, 252),
           ("2011-04-01", "travel", 1, 251),
           ("2011-04-01", "business", 1, 248),
           ("2011-04-01", "technology", 1, 165),
           ("2011-04-02", "premium", 3, 5262),
           ("2011-04-02", "mezzanine", 3, 5141),
           ("2011-04-02", "entertainment", 1, 348),
           ("2011-04-02", "automotive", 1, 309),
           ("2011-04-02", "travel", 1, 265)]
    assert len(got) == 14
    assert got == exp


def test_multi_value_dimension(spark, wiki_catalog):
    """testMultiValueDimension — grouping on an MVD explodes one row per
    element."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "placementish",
               "outputName": "alias"}],
             granularity="all").collect()
    got = {r["alias"]: (r["rows"], r["idx"]) for r in out}
    assert got == {"a": (2, 282), "b": (2, 230), "e": (2, 324),
                   "h": (2, 233), "m": (6, 5317), "n": (2, 235),
                   "p": (6, 5405), "preferred": (26, 12446), "t": (4, 420)}


def test_two_multi_value_dimensions(spark, wiki_catalog):
    """testTwoMultiValueDimensions — the SAME MVD grouped twice explodes the
    cartesian product of its elements (a/preferred × a/preferred)."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "placementish",
               "outputName": "alias"},
              {"type": "default", "dimension": "placementish",
               "outputName": "alias2"}],
             granularity="all",
             filter={"type": "selector", "dimension": "placementish",
                     "value": "a"}).collect()
    got = sorted((r["alias"], r["alias2"], r["rows"], r["idx"]) for r in out)
    assert got == [("a", "a", 2, 282), ("a", "preferred", 2, 282),
                   ("preferred", "a", 2, 282),
                   ("preferred", "preferred", 2, 282)]


def test_multiple_dimensions_one_multi_value(spark, wiki_catalog):
    """testMultipleDimensionsOneOfWhichIsMultiValue1 — MVD × scalar dim:
    each quality pairs with its letter and with 'preferred'."""
    out = gb(spark, wiki_catalog,
             [{"type": "default", "dimension": "placementish",
               "outputName": "alias"},
              {"type": "default", "dimension": "quality",
               "outputName": "quality"}],
             granularity="all").collect()
    got = {(r["quality"], r["alias"]): (r["rows"], r["idx"]) for r in out}
    assert got[("automotive", "a")] == (2, 282)
    assert got[("automotive", "preferred")] == (2, 282)
    assert got[("business", "b")] == (2, 230)
    assert got[("mezzanine", "m")] == (6, 5317)
    assert got[("mezzanine", "preferred")] == (6, 5317)
    assert got[("premium", "p")] == (6, 5405)
    # every (quality, letter) + (quality, preferred) pair → 18 groups
    assert len(got) == 18


def test_group_by_order_limit(spark, wiki_catalog):
    """testGroupByOrderLimit — orderBy (rows asc, alias desc) over a P1M
    bucket, with and without limit, in three aggregator spellings (plain
    longSum, expression-based doubleSum, FLOAT virtual column)."""
    base = {"queryType": "groupBy", "dataSource": "wiki",
            "granularity": {"type": "period", "period": "P1M"},
            "intervals": ["2011-04-02T00:00:00Z/2011-04-04T00:00:00Z"],
            "dimensions": [{"type": "default", "dimension": "quality",
                            "outputName": "alias"}],
            "limitSpec": {"type": "default", "columns": [
                {"dimension": "rows"},
                {"dimension": "alias", "direction": "descending"}]}}
    exp_names = ["travel", "technology", "news", "health", "entertainment",
                 "business", "automotive", "premium", "mezzanine"]
    q = dict(base, aggregations=[
        {"type": "count", "name": "rows"},
        {"type": "longSum", "name": "idx", "fieldName": "index"}])
    got = [(r["alias"], r["rows"], r["idx"])
           for r in translate(q, spark, wiki_catalog).collect()]
    assert got == [("travel", 2, 243), ("technology", 2, 177),
                   ("news", 2, 221), ("health", 2, 216),
                   ("entertainment", 2, 319), ("business", 2, 217),
                   ("automotive", 2, 269), ("premium", 6, 4416),
                   ("mezzanine", 6, 4420)]
    q_lim = dict(q, limitSpec=dict(q["limitSpec"], limit=5))
    got5 = [r["alias"] for r in translate(q_lim, spark, wiki_catalog).collect()]
    assert got5 == exp_names[:5]
    # expression-based doubleSum (indexMin = the reference's float read)
    exp_idx = {"travel": 365.4876403808594, "technology": 267.3737487792969,
               "news": 333.3147277832031, "health": 325.467529296875,
               "entertainment": 479.916015625, "business": 328.083740234375,
               "automotive": 405.5966796875, "premium": 6627.927734375,
               "mezzanine": 6635.47998046875}
    q2 = dict(base, aggregations=[
        {"type": "count", "name": "rows"},
        {"type": "doubleSum", "name": "idx",
         "expression": "index / 2 + cast(index, 'FLOAT')"}])
    got2 = [(r["alias"], r["idx"])
            for r in translate(q2, spark, wiki_catalog).collect()]
    assert [a for a, _ in got2] == exp_names
    for a, v in got2:
        assert v == pytest.approx(exp_idx[a], rel=2e-6), a
    # FLOAT virtual column spelling
    q3 = dict(base,
              virtualColumns=[{"type": "expression", "name": "expr",
                               "expression":
                                   "index / 2 + cast(index, 'FLOAT')",
                               "outputType": "FLOAT"}],
              aggregations=[{"type": "count", "name": "rows"},
                            {"type": "doubleSum", "name": "idx",
                             "fieldName": "expr"}])
    got3 = [(r["alias"], r["idx"])
            for r in translate(q3, spark, wiki_catalog).collect()]
    assert [a for a, _ in got3] == exp_names
    for a, v in got3:
        assert v == pytest.approx(exp_idx[a], rel=2e-6), a


def test_group_by_order_limit_desc_dim(spark, wiki_catalog):
    """testGroupByWithSameCaseOrdering + testGroupByWithOrderLimit4 — dim
    desc ordering with limit 3 over the full interval."""
    for alias in ("marketalias", "market"):
        q = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "all", "intervals": FULL,
             "dimensions": [{"type": "default", "dimension": "market",
                             "outputName": alias}],
             "aggregations": [{"type": "count", "name": "rows"}],
             "limitSpec": {"type": "default", "limit": 3, "columns": [
                 {"dimension": alias, "direction": "descending"}]}}
        got = [(r[alias], r["rows"])
               for r in translate(q, spark, wiki_catalog).collect()]
        assert got == [("upfront", 186), ("total_market", 186),
                       ("spot", 837)], alias


def test_group_by_time_extraction_day_of_week(spark, wiki_catalog):
    """testGroupByTimeExtraction — timeFormat('EEEE') dimension over __time
    crossed with market; spot-Friday/Monday exact sums."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "all",
         "intervals": FULL,
         "dimensions": [
             {"type": "default", "dimension": "market",
              "outputName": "market"},
             {"type": "extraction", "dimension": "__time",
              "outputName": "dayOfWeek",
              "extractionFn": {"type": "timeFormat", "format": "EEEE"}}],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "doubleSum", "name": "index", "fieldName": "index"}],
         "filter": {"type": "or", "fields": [
             {"type": "selector", "dimension": "market", "value": "spot"},
             {"type": "selector", "dimension": "market",
              "value": "upfront"}]}}
    got = {(r["market"], r["dayOfWeek"]): (r["rows"], r["index"])
           for r in translate(q, spark, wiki_catalog).collect()}
    assert len(got) == 14  # 2 markets × 7 day names
    assert got[("spot", "Friday")][0] == 117
    assert got[("spot", "Friday")][1] == pytest.approx(13219.574157714844,
                                                       rel=2e-6)
    assert got[("spot", "Monday")][0] == 117
    assert got[("spot", "Monday")][1] == pytest.approx(13557.738830566406,
                                                       rel=2e-6)
    assert got[("spot", "Saturday")][1] == pytest.approx(13493.751281738281,
                                                         rel=2e-6)
    assert got[("spot", "Sunday")][1] == pytest.approx(13585.541015625,
                                                       rel=2e-6)


def test_group_by_with_uniques_and_cardinality(spark, wiki_catalog):
    """testGroupByWithUniques + testGroupByWithCardinality — 9 distinct
    qualities (the reference asserts its HLL estimate 9.0198; this engine's
    sketch is exact at this cardinality) + the same-name post-agg error."""
    for agg in ({"type": "hyperUnique", "name": "uniques",
                 "fieldName": "quality"},
                {"type": "cardinality", "name": "uniques",
                 "fields": ["quality"], "byRow": False}):
        q = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "all", "intervals": F2T,
             "aggregations": [{"type": "count", "name": "rows"}, agg]}
        out = translate(q, spark, wiki_catalog).collect()
        assert out[0]["rows"] == 26
        assert round(float(out[0]["uniques"])) == 9
    # testGroupByWithUniquesAndPostAggWithSameName — name collision raises
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "all",
         "intervals": F2T,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "hyperUnique", "name": "quality_uniques",
              "fieldName": "quality"}],
         "postAggregations": [
             {"type": "hyperUniqueCardinality", "name": "quality_uniques",
              "fieldName": "quality_uniques"}]}
    with pytest.raises(ValueError, match="already defined"):
        translate(q, spark, wiki_catalog)


def test_post_agg_having_spec(spark, wiki_catalog):
    """testPostAggMergedHavingSpec/testPostAggHavingSpec — a greaterThan
    having over the POST-AGGREGATED column."""
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": {"type": "period", "period": "P1M"},
         "intervals": ["2011-04-02T00:00:00Z/2011-04-04T00:00:00Z"],
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "alias"}],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "index", "fieldName": "index"}],
         "postAggregations": [
             {"type": "arithmetic", "name": "addRowsIndexConstant",
              "fn": "+",
              "fields": [{"type": "fieldAccess", "fieldName": "rows"},
                         {"type": "fieldAccess", "fieldName": "index"},
                         {"type": "constant", "value": 1}]}],
         "having": {"type": "or", "havingSpecs": [
             {"type": "greaterThan", "aggregation": "addRowsIndexConstant",
              "value": 1000}]}}
    got = sorted((r["alias"], r["rows"], r["index"],
                  r["addRowsIndexConstant"])
                 for r in translate(q, spark, wiki_catalog).collect())
    assert got == [("mezzanine", 6, 4420, 4427.0),
                   ("premium", 6, 4416, 4423.0)]


def test_group_by_order_limit_having_spec(spark, wiki_catalog):
    """testGroupByWithOrderLimitHavingSpec — having(index > 310) + index asc
    limit 5, with long/double/float min/max over the index column."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "all",
         "intervals": ["2011-01-25T00:00:00Z/2011-01-28T00:00:00Z"],
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "alias"}],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "doubleSum", "name": "index", "fieldName": "index"},
             {"type": "longMin", "name": "lmin", "fieldName": "index"},
             {"type": "longMax", "name": "lmax", "fieldName": "index"},
             {"type": "doubleMin", "name": "dmin", "fieldName": "index"},
             {"type": "doubleMax", "name": "dmax", "fieldName": "index"},
             {"type": "floatMin", "name": "fmin", "fieldName": "index"},
             {"type": "floatMax", "name": "fmax", "fieldName": "index"}],
         "having": {"type": "greaterThan", "aggregation": "index",
                    "value": 310},
         "limitSpec": {"type": "default", "limit": 5, "columns": [
             {"dimension": "index", "direction": "ascending"}]}}
    out = translate(q, spark, wiki_catalog).collect()
    exp = [("business", 3, 312.38165283203125, 101, 105, 101.624789,
            105.873942),
           ("news", 3, 312.7834167480469, 102, 105, 102.907866, 105.266058),
           ("technology", 3, 324.6412353515625, 102, 116, 102.044542,
            116.979005),
           ("travel", 3, 393.36322021484375, 122, 149, 122.077247,
            149.125271),
           ("health", 3, 511.2996826171875, 159, 180, 159.988606,
            180.575246)]
    assert len(out) == 5
    for r, (alias, rows_, idx, lmin, lmax, dmin, dmax) in zip(out, exp):
        assert r["alias"] == alias and r["rows"] == rows_
        assert r["index"] == pytest.approx(idx, rel=2e-6)
        assert (r["lmin"], r["lmax"]) == (lmin, lmax)
        assert r["dmin"] == pytest.approx(dmin, rel=2e-6)
        assert r["dmax"] == pytest.approx(dmax, rel=2e-6)
        assert r["fmin"] == pytest.approx(dmin, rel=2e-5)
        assert r["fmax"] == pytest.approx(dmax, rel=2e-5)


def test_group_by_lookup_limit_sort_by_dims_first(spark, wiki_catalog):
    """testGroupByWithLookupAndLimitAndSortByDimsFirst — sortByDimsFirst
    context: the alias orders BEFORE the day bucket (1,1,2,2,...), limit 11
    cuts mid-pair."""
    mapping = {"automotive": "9", "business": "8", "entertainment": "7",
               "health": "6", "mezzanine": "5", "news": "4", "premium": "3",
               "technology": "2", "travel": "1"}
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": F2T,
         "dimensions": [{"type": "extraction", "dimension": "quality",
                         "outputName": "alias",
                         "extractionFn": {"type": "lookup",
                                          "lookup": {"type": "map",
                                                     "map": mapping}}}],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"}],
         "limitSpec": {"type": "default", "limit": 11, "columns": [
             {"dimension": "alias", "dimensionOrder": "alphanumeric"}]},
         "context": {"sortByDimsFirst": True}}
    got = [(str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
           for r in translate(q, spark, wiki_catalog).collect()]
    assert got == [
        ("2011-04-01", "1", 1, 119), ("2011-04-02", "1", 1, 126),
        ("2011-04-01", "2", 1, 78), ("2011-04-02", "2", 1, 97),
        ("2011-04-01", "3", 3, 2900), ("2011-04-02", "3", 3, 2505),
        ("2011-04-01", "4", 1, 121), ("2011-04-02", "4", 1, 114),
        ("2011-04-01", "5", 3, 2870), ("2011-04-02", "5", 3, 2447),
        ("2011-04-01", "6", 1, 120)]


def test_nested_inner_query_numerics(spark, wiki_catalog):
    """testGroupByNestedWithInnerQueryNumerics — outer string-selector over
    a LONG alias ('1200'), numeric bound over a FLOAT alias, outer sums of
    the inner keys."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": F2T,
             "filter": {"type": "in", "dimension": "quality",
                        "values": ["entertainment"]},
             "dimensions": [
                 {"type": "default", "dimension": "quality",
                  "outputName": "alias"},
                 {"type": "default", "dimension": "qualityLong",
                  "outputName": "ql_alias", "outputType": "LONG"},
                 {"type": "default", "dimension": "qualityFloat",
                  "outputName": "qf_alias", "outputType": "FLOAT"}],
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "index"}]}
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": inner},
             "granularity": "all", "intervals": F2T,
             "dimensions": [
                 {"type": "default", "dimension": "ql_alias",
                  "outputName": "quallong", "outputType": "LONG"},
                 {"type": "default", "dimension": "qf_alias",
                  "outputName": "qualfloat", "outputType": "FLOAT"}],
             "filter": {"type": "and", "fields": [
                 {"type": "selector", "dimension": "ql_alias",
                  "value": "1200"},
                 {"type": "bound", "dimension": "qf_alias",
                  "lower": "11095.0", "upper": "12005.0",
                  "lowerStrict": True, "upperStrict": True,
                  "ordering": "numeric"}]},
             "aggregations": [
                 {"type": "longSum", "name": "ql_alias_sum",
                  "fieldName": "ql_alias"},
                 {"type": "doubleSum", "name": "qf_alias_sum",
                  "fieldName": "qf_alias"}]}
    out = translate(outer, spark, wiki_catalog).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["quallong"], r["qualfloat"], r["ql_alias_sum"],
            r["qf_alias_sum"]) == (1200, 12000.0, 2400, 24000.0)


def test_nested_inner_query_output_null_numerics(spark, wiki_catalog):
    """testGroupByNestedWithInnerQueryOutputNullNumerics — a searchQuery
    extraction fn nulls the non-matching quality's numeric aliases; the
    outer groups and sums keep the null group with NULL sums."""
    exfn = {"type": "searchQuery",
            "query": {"type": "contains", "value": "1200"}}
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": F2T,
             "filter": {"type": "in", "dimension": "quality",
                        "values": ["entertainment", "business"]},
             "dimensions": [
                 {"type": "default", "dimension": "quality",
                  "outputName": "alias"},
                 {"type": "extraction", "dimension": "qualityLong",
                  "outputName": "ql_alias", "outputType": "LONG",
                  "extractionFn": exfn},
                 {"type": "extraction", "dimension": "qualityFloat",
                  "outputName": "qf_alias", "outputType": "FLOAT",
                  "extractionFn": exfn},
                 {"type": "extraction", "dimension": "qualityDouble",
                  "outputName": "qd_alias", "outputType": "DOUBLE",
                  "extractionFn": exfn}],
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "index"}]}
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": inner},
             "granularity": "all", "intervals": F2T,
             "dimensions": [
                 {"type": "default", "dimension": "ql_alias",
                  "outputName": "quallong", "outputType": "LONG"},
                 {"type": "default", "dimension": "qf_alias",
                  "outputName": "qualfloat", "outputType": "FLOAT"},
                 {"type": "default", "dimension": "qd_alias",
                  "outputName": "qualdouble", "outputType": "DOUBLE"}],
             "aggregations": [
                 {"type": "longSum", "name": "ql_alias_sum",
                  "fieldName": "ql_alias"},
                 {"type": "doubleSum", "name": "qf_alias_sum",
                  "fieldName": "qf_alias"},
                 {"type": "doubleSum", "name": "qd_alias_sum",
                  "fieldName": "qd_alias"}]}
    out = sorted(
        ((r["quallong"], r["qualfloat"], r["qualdouble"],
          r["ql_alias_sum"], r["qf_alias_sum"], r["qd_alias_sum"])
         for r in translate(outer, spark, wiki_catalog).collect()),
        key=lambda t: (t[0] is not None, t[0] or 0))
    assert out == [(None, None, None, None, None, None),
                   (1200, 12000.0, 12000.0, 2400, 24000.0, 24000.0)]


def test_group_by_with_string_post_aggregator(spark, wiki_catalog):
    """testGroupByWithStringPostAggregator — an expression post-agg builds a
    STRING (alias + 'x'); ordering by it desc within each day bucket."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": F2T,
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "alias"}],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"}],
         "postAggregations": [{"type": "expression", "name": "post",
                               "expression": "alias + 'x'"}],
         "limitSpec": {"type": "default", "columns": [
             {"dimension": "post", "direction": "descending"}]}}
    got = [(str(r["__time"])[:10], r["post"], r["rows"], r["idx"])
           for r in translate(q, spark, wiki_catalog).collect()]
    day1 = [g for g in got if g[0] == "2011-04-01"]
    names_desc = ["travelx", "technologyx", "premiumx", "newsx",
                  "mezzaninex", "healthx", "entertainmentx", "businessx",
                  "automotivex"]
    assert [g[1] for g in day1] == names_desc
    assert got[:9] == day1  # time-first ordering
    assert day1[0][2:] == (1, 119) and day1[2][2:] == (3, 2900)


def test_group_by_regex_filter_and_missing_columns(spark, wiki_catalog):
    """testGroupByWithRegEx (find()-style regex filter) +
    testGroupByOnMissingColumn (nonexistent dims: plain → null group,
    StringFormatExtractionFn('foo') → constant 'foo')."""
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": {"type": "period", "period": "P1M"},
         "intervals": ["2011-04-02T00:00:00Z/2011-04-04T00:00:00Z"],
         "filter": {"type": "regex", "dimension": "quality",
                    "pattern": "auto.*"},
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "quality"}],
         "aggregations": [{"type": "count", "name": "rows"}]}
    got = [(r["quality"], r["rows"])
           for r in translate(q, spark, wiki_catalog).collect()]
    assert got == [("automotive", 2)]
    q2 = {"queryType": "groupBy", "dataSource": "wiki",
          "granularity": "all", "intervals": F2T,
          "dimensions": [
              {"type": "default", "dimension": "nonexistent0",
               "outputName": "alias0"},
              {"type": "extraction", "dimension": "nonexistent1",
               "outputName": "alias1",
               "extractionFn": {"type": "stringFormat", "format": "foo"}}],
          "aggregations": [{"type": "count", "name": "rows"}]}
    out = translate(q2, spark, wiki_catalog).collect()
    assert len(out) == 1
    assert (out[0]["alias0"], out[0]["alias1"], out[0]["rows"]) == (
        None, "foo", 26)


def test_group_by_nonexistent_plus_real_dimension(spark, wiki_catalog):
    """testGroupByWithNonexistentDimension — a missing dim groups as one
    null value next to the real dim."""
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": {"type": "period", "period": "P1M"},
         "intervals": ["2011-04-02T00:00:00Z/2011-04-04T00:00:00Z"],
         "dimensions": [
             {"type": "default", "dimension": "billy",
              "outputName": "billy"},
             {"type": "default", "dimension": "quality",
              "outputName": "quality"}],
         "aggregations": [{"type": "count", "name": "rows"}]}
    out = translate(q, spark, wiki_catalog).collect()
    assert len(out) == 9
    assert all(r["billy"] is None for r in out)
    assert {r["quality"]: r["rows"] for r in out}["mezzanine"] == 6


def test_group_by_cardinality_agg_with_extraction_fn(spark, wiki_catalog):
    """testGroupByCardinalityAggWithExtractionFn — the cardinality agg's
    fields are DIMENSION SPECS: a constant-producing extraction fn collapses
    every quality to one value (exact 1 here; the reference asserts its HLL
    estimate 1.00024)."""
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": F2T,
         "dimensions": [{"type": "default", "dimension": "market",
                         "outputName": "alias"}],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "cardinality", "name": "numVals", "byRow": False,
              "fields": [{"type": "extraction", "dimension": "quality",
                          "outputName": "quality",
                          "extractionFn": {"type": "stringFormat",
                                           "format": "hello"}}]}]}
    out = translate(q, spark, wiki_catalog).collect()
    assert len(out) == 6  # 3 markets × 2 days
    by_key = {(str(r["__time"])[:10], r["alias"]): (r["rows"],
                                                    round(float(r["numVals"])))
              for r in out}
    assert by_key[("2011-04-01", "spot")] == (9, 1)
    assert by_key[("2011-04-01", "total_market")] == (2, 1)
    assert all(v[1] == 1 for v in by_key.values())


def test_group_by_all_filters_on_null_dims_with_extraction_fns(
        spark, wiki_catalog):
    """testGroupByWithAllFiltersOnNullDimsWithExtractionFns — selector, in,
    bound, regex and search filters ANDed, each matching the
    replaceMissingValueWith('EMPTY') rendering of a NONEXISTENT column (the
    JS filter is the deliberate raise)."""
    exfn = {"type": "lookup",
            "lookup": {"type": "map", "map": {"": "EMPTY"}},
            "replaceMissingValueWith": "EMPTY", "injective": True}
    superfilter = {"type": "and", "fields": [
        {"type": "selector", "dimension": "null_column", "value": "EMPTY",
         "extractionFn": exfn},
        {"type": "in", "dimension": "null_column",
         "values": ["NOT-EMPTY", "FOOBAR", "EMPTY"], "extractionFn": exfn},
        {"type": "bound", "dimension": "null_column", "lower": "EMPTY",
         "upper": "EMPTY", "ordering": "alphanumeric",
         "extractionFn": exfn},
        {"type": "regex", "dimension": "null_column", "pattern": "EMPTY",
         "extractionFn": exfn},
        {"type": "search", "dimension": "null_column",
         "query": {"type": "contains", "value": "EMPTY",
                   "caseSensitive": True},
         "extractionFn": exfn}]}
    q = {"queryType": "groupBy", "dataSource": "wiki", "granularity": "day",
         "intervals": F2T,
         "dimensions": [{"type": "default", "dimension": "null_column",
                         "outputName": "alias"}],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"}],
         "filter": superfilter}
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
                 for r in translate(q, spark, wiki_catalog).collect())
    assert got == [("2011-04-01", None, 13, 6619),
                   ("2011-04-02", None, 13, 5827)]


def test_dim_filter_having_spec_with_extraction_fns(spark, wiki_catalog):
    """testDimFilterHavingSpecWithExtractionFns — a dim-filter having whose
    leaves apply extraction fns to AGGREGATE columns (the reference's JS
    'super-'+str ports as stringFormat; the numeric +10 bound reduces to a
    plain numeric bound)."""
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": {"type": "period", "period": "P1M"},
         "intervals": ["2011-04-02T00:00:00Z/2011-04-04T00:00:00Z"],
         "dimensions": [{"type": "default", "dimension": "quality",
                         "outputName": "alias"}],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "index"}],
         "having": {"type": "filter", "filter": {"type": "or", "fields": [
             {"type": "bound", "dimension": "rows", "lower": "2",
              "lowerStrict": True, "ordering": "numeric"},
             {"type": "selector", "dimension": "idx",
              "value": "super-217",
              "extractionFn": {"type": "stringFormat",
                               "format": "super-%s"}}]}}}
    got = sorted((r["alias"], r["rows"], r["idx"])
                 for r in translate(q, spark, wiki_catalog).collect())
    assert got == [("business", 2, 217), ("mezzanine", 6, 4420),
                   ("premium", 6, 4416)]


def test_subquery_with_post_aggregators(spark, wiki_catalog):
    """testSubqueryWithPostAggregators — the outer longSum consumes the
    INNER's post-aggregated column (idx + 1000), and the outer adds its own
    post-agg (+10000)."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": F2T,
             "filter": {"type": "true"},
             "dimensions": [{"type": "default", "dimension": "quality",
                             "outputName": "alias"}],
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "idx_subagg",
                  "fieldName": "index"}],
             "postAggregations": [
                 {"type": "arithmetic", "name": "idx_subpostagg", "fn": "+",
                  "fields": [{"type": "fieldAccess",
                              "fieldName": "idx_subagg"},
                             {"type": "constant", "value": 1000}]}]}
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": inner},
             "granularity": "day", "intervals": F2T,
             "dimensions": [{"type": "default", "dimension": "alias",
                             "outputName": "alias"}],
             "aggregations": [
                 {"type": "longSum", "name": "rows", "fieldName": "rows"},
                 {"type": "longSum", "name": "idx",
                  "fieldName": "idx_subpostagg"}],
             "postAggregations": [
                 {"type": "arithmetic", "name": "idx_post", "fn": "+",
                  "fields": [{"type": "fieldAccess", "fieldName": "idx"},
                             {"type": "constant", "value": 10000}]}]}
    got = {(str(r["__time"])[:10], r["alias"]):
           (r["rows"], r["idx"], r["idx_post"])
           for r in translate(outer, spark, wiki_catalog).collect()}
    assert got == {k: (v[0], v[1] + 1000, float(v[1] + 11000))
                   for k, v in CANON_18.items()}


def test_subquery_with_multi_column_aggregators(spark, wiki_catalog):
    """testSubqueryWithMultiColumnAggregators — the inner query carries a
    multi-input aggregator (the reference's JS 'current + index + dim.length'
    ports as an expressionLambda fold over two fields), a post-agg, a having
    on the post-agg, and the outer re-aggregates everything under a desc
    alias limit."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": F2T,
             "filter": {"type": "true"},
             "dimensions": [{"type": "default", "dimension": "quality",
                             "outputName": "alias"}],
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "doubleSum", "name": "idx_subagg",
                  "fieldName": "index"},
                 {"type": "expression", "name": "js_agg",
                  "fields": ["index", "market"], "initialValue": "0.0",
                  "fold": "__acc + index + strlen(market)"}],
             "postAggregations": [
                 {"type": "arithmetic", "name": "idx_subpostagg", "fn": "+",
                  "fields": [{"type": "fieldAccess",
                              "fieldName": "idx_subagg"},
                             {"type": "constant", "value": 1000}]}],
             "having": {"type": "lessThan", "aggregation": "idx_subpostagg",
                        "value": 3800}}
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": inner},
             "granularity": "day", "intervals": F2T,
             "dimensions": [{"type": "default", "dimension": "alias",
                             "outputName": "alias"}],
             "aggregations": [
                 {"type": "longSum", "name": "rows", "fieldName": "rows"},
                 {"type": "longSum", "name": "idx",
                  "fieldName": "idx_subpostagg"},
                 {"type": "doubleSum", "name": "js_outer_agg",
                  "fieldName": "js_agg"}],
             "postAggregations": [
                 {"type": "arithmetic", "name": "idx_post", "fn": "+",
                  "fields": [{"type": "fieldAccess", "fieldName": "idx"},
                             {"type": "constant", "value": 10000}]}],
             "limitSpec": {"type": "default", "limit": 5, "columns": [
                 {"dimension": "alias", "direction": "descending"}]}}
    out = translate(outer, spark, wiki_catalog).collect()
    exp = [("travel", 1, 1119, 11119.0, 123.92274475097656),
           ("technology", 1, 1078, 11078.0, 82.62254333496094),
           ("news", 1, 1121, 11121.0, 125.58358001708984),
           ("health", 1, 1120, 11120.0, 124.13470458984375),
           ("entertainment", 1, 1158, 11158.0, 162.74722290039062)]
    assert len(out) == 5
    for r, (alias, rows_, idx, idx_post, js) in zip(out, exp):
        assert str(r["__time"])[:10] == "2011-04-01"
        assert (r["alias"], r["rows"], r["idx"]) == (alias, rows_, idx)
        assert r["idx_post"] == pytest.approx(idx_post, rel=2e-6)
        assert r["js_outer_agg"] == pytest.approx(js, rel=2e-6)


def test_subquery_with_hyper_uniques(spark, wiki_catalog):
    """testSubqueryWithHyperUniques — a hyperUnique re-aggregated through a
    subquery (each inner group carries one distinct quality → outer uniq 1;
    the reference asserts its estimate 1.00024)."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": F2T,
             "dimensions": [{"type": "default", "dimension": "quality",
                             "outputName": "alias"}],
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "index"},
                 {"type": "hyperUnique", "name": "qu",
                  "fieldName": "quality"}]}
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": inner},
             "granularity": "all", "intervals": F2T,
             "dimensions": [{"type": "default", "dimension": "alias",
                             "outputName": "alias"}],
             "aggregations": [
                 {"type": "longSum", "name": "rows", "fieldName": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "idx"},
                 {"type": "hyperUnique", "name": "uniq",
                  "fieldName": "qu"}]}
    out = translate(outer, spark, wiki_catalog).collect()
    assert len(out) == 9
    got = {r["alias"]: (r["rows"], r["idx"], round(float(r["uniq"])))
           for r in out}
    day_sums = {}
    for (d, q), (rw, ix) in CANON_18.items():
        day_sums[q] = (day_sums.get(q, (0, 0))[0] + rw,
                       day_sums.get(q, (0, 0))[1] + ix)
    assert got == {q: (v[0], v[1], 1) for q, v in day_sums.items()}


def test_merge_results_limit_offset_default_ordering(spark, wiki_catalog):
    """doTestMergeResultsWithValidLimit with NO ordering columns — paging
    applies over Druid's default (time, dims) result ordering."""
    base = [("automotive", 2, 269), ("business", 2, 217),
            ("entertainment", 2, 319), ("health", 2, 216),
            ("mezzanine", 6, 4420), ("news", 2, 221),
            ("premium", 6, 4416), ("technology", 2, 177),
            ("travel", 2, 243)]
    for limit, offset in [(1, 0), (3, 2), (5, 4), (9, 0), (4, 7), (6, 10)]:
        q = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": {"type": "period", "period": "P1M"},
             "intervals": ["2011-04-02T00:00:00Z/2011-04-04T00:00:00Z"],
             "dimensions": [{"type": "default", "dimension": "quality",
                             "outputName": "alias"}],
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "index"}],
             "limitSpec": {"type": "default", "limit": limit,
                           "offset": offset}}
        out = [(r["alias"], r["rows"], r["idx"])
               for r in translate(q, spark, wiki_catalog).collect()]
        assert out == base[offset:offset + limit], (limit, offset)


def test_different_grouping_subquery_multiple_aggs_same_field(
        spark, wiki_catalog):
    """testDifferentGroupingSubqueryMultipleAggregatorsOnSameField — two
    outer aggs over the same inner column plus two over the inner post-agg
    (idx + idx)."""
    inner = _inner_quality_day(aggs=[
        {"type": "count", "name": "rows"},
        {"type": "longSum", "name": "idx", "fieldName": "index"}])
    inner["postAggregations"] = [
        {"type": "arithmetic", "name": "post_agg", "fn": "+",
         "fields": [{"type": "fieldAccess", "fieldName": "idx"},
                    {"type": "fieldAccess", "fieldName": "idx"}]}]
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": inner},
             "granularity": "day", "intervals": F2T,
             "aggregations": [
                 {"type": "doubleMax", "name": "idx1", "fieldName": "idx"},
                 {"type": "doubleMax", "name": "idx2", "fieldName": "idx"},
                 {"type": "doubleMax", "name": "idx3",
                  "fieldName": "post_agg"},
                 {"type": "doubleMax", "name": "idx4",
                  "fieldName": "post_agg"}]}
    got = sorted((str(r["__time"])[:10], r["idx1"], r["idx2"], r["idx3"],
                  r["idx4"])
                 for r in translate(outer, spark, wiki_catalog).collect())
    assert got == [("2011-04-01", 2900.0, 2900.0, 5800.0, 5800.0),
                   ("2011-04-02", 2505.0, 2505.0, 5010.0, 5010.0)]


def test_different_grouping_subquery_with_filter(spark, wiki_catalog):
    """testDifferentGroupingSubqueryWithFilter — the outer filter (an OR of
    every quality) applies to the INNER result's dimension column."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": F2T,
             "dimensions": [{"type": "default", "dimension": "quality",
                             "outputName": "quality"}],
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "index"}]}
    outer = {"queryType": "groupBy",
             "dataSource": {"type": "query", "query": inner},
             "granularity": "day", "intervals": F2T,
             "filter": {"type": "or", "fields": [
                 {"type": "selector", "dimension": "quality", "value": v}
                 for v in ["automotive", "premium", "mezzanine", "business",
                           "entertainment", "health", "news", "technology",
                           "travel"]]},
             "aggregations": [{"type": "doubleMax", "name": "idx",
                               "fieldName": "idx"}]}
    got = sorted((str(r["__time"])[:10], r["idx"])
                 for r in translate(outer, spark, wiki_catalog).collect())
    assert got == [("2011-04-01", 2900.0), ("2011-04-02", 2505.0)]
