"""JSON-surface completeness sweep — every `type` name the reference's
Jackson registrations accept (DimFilter.java:35-51, HavingSpec.java:35-43,
DimensionSpec.java:41-45 + LookupSerdeModule, ExtractionFn.java:42-56,
SearchQuerySpec.java:32-36, TopNMetricSpec.java:37-41,
NeverHavingSpec) must be either implemented or a DELIBERATE
NotImplementedError with a rewrite hint — never an 'unknown type' path.
"""

import pytest

from incubator_druid_spark import translate

INTERVAL = ["2000-01-01T00:00:00Z/2002-01-01T00:00:00Z"]

# type name -> spec; None value means "deliberate NotImplementedError"
FILTERS = {
    "and": {"type": "and", "fields": [{"type": "true"}]},
    "or": {"type": "or", "fields": [{"type": "true"}]},
    "not": {"type": "not", "field": {"type": "false"}},
    "selector": {"type": "selector", "dimension": "dim1", "value": "abc"},
    "columnComparison": {"type": "columnComparison",
                         "dimensions": ["dim1", "dim1"]},
    "extraction": {"type": "extraction", "dimension": "dim1", "value": "abc",
                   "extractionFn": {"type": "identity"}},
    "regex": {"type": "regex", "dimension": "dim1", "pattern": "a"},
    "search": {"type": "search", "dimension": "dim1",
               "query": {"type": "contains", "value": "a"}},
    "javascript": None,
    "spatial": {"type": "spatial", "dimension": "dim1",
                "bound": {"type": "rectangular", "minCoords": [0, 0],
                          "maxCoords": [1, 1]}},
    "in": {"type": "in", "dimension": "dim1", "values": ["abc"]},
    "bound": {"type": "bound", "dimension": "dim1", "lower": "a"},
    "interval": {"type": "interval", "dimension": "__time",
                 "intervals": INTERVAL},
    "like": {"type": "like", "dimension": "dim1", "pattern": "a%"},
    "expression": {"type": "expression", "expression": "dim1 == 'abc'"},
    "true": {"type": "true"},
    "false": {"type": "false"},
    "bloom": None,  # needs a serialized filter; covered by its own tests
}

HAVING = {
    "and": {"type": "and", "havingSpecs": [{"type": "always"}]},
    "or": {"type": "or", "havingSpecs": [{"type": "always"}]},
    "not": {"type": "not", "havingSpec": {"type": "always"}},
    "greaterThan": {"type": "greaterThan", "aggregation": "rows", "value": 0},
    "lessThan": {"type": "lessThan", "aggregation": "rows", "value": 10},
    "equalTo": {"type": "equalTo", "aggregation": "rows", "value": 1},
    "dimSelector": {"type": "dimSelector", "dimension": "v", "value": "abc"},
    "always": {"type": "always"},
    "never": {"type": "never"},
    "filter": {"type": "filter", "filter": {"type": "true"}},
}

DIM_SPECS = {
    "default": {"type": "default", "dimension": "dim1", "outputName": "v"},
    "extraction": {"type": "extraction", "dimension": "dim1",
                   "outputName": "v", "extractionFn": {"type": "identity"}},
    "regexFiltered": {"type": "regexFiltered", "outputName": "v",
                      "delegate": {"type": "default", "dimension": "dim1"},
                      "pattern": ".*"},
    "listFiltered": {"type": "listFiltered", "outputName": "v",
                     "delegate": {"type": "default", "dimension": "dim1"},
                     "values": ["abc"]},
    "prefixFiltered": {"type": "prefixFiltered", "outputName": "v",
                       "delegate": {"type": "default", "dimension": "dim1"},
                       "prefix": "a"},
    "lookup": {"type": "lookup", "dimension": "dim1", "outputName": "v",
               "name": "lookyloo"},
}

EXTRACTION_FNS = {
    "time": {"type": "time", "timeFormat": "yyyy", "resultFormat": "yy"},
    "regex": {"type": "regex", "expr": "(a.*)"},
    "partial": {"type": "partial", "expr": "a"},
    "searchQuery": {"type": "searchQuery",
                    "query": {"type": "contains", "value": "a"}},
    "javascript": None,
    "timeFormat": {"type": "timeFormat", "format": "yyyy-MM-dd"},
    "identity": {"type": "identity"},
    "lookup": {"type": "lookup",
               "lookup": {"type": "map", "map": {"abc": "x"}}},
    "registeredLookup": {"type": "registeredLookup", "lookup": "lookyloo"},
    "substring": {"type": "substring", "index": 0, "length": 2},
    "cascade": {"type": "cascade", "extractionFns": [{"type": "upper"}]},
    "stringFormat": {"type": "stringFormat", "format": "[%s]"},
    "upper": {"type": "upper"},
    "lower": {"type": "lower"},
    "bucket": {"type": "bucket", "size": 2, "offset": 0},
    "strlen": {"type": "strlen"},
}

SEARCH_SPECS = {
    "contains": {"type": "contains", "value": "a"},
    "insensitive_contains": {"type": "insensitive_contains", "value": "a"},
    "fragment": {"type": "fragment", "values": ["a"]},
    "regex": {"type": "regex", "pattern": "a"},
    "all": {"type": "all"},
}

TOPN_METRICS = {
    "numeric": {"type": "numeric", "metric": "rows"},
    "lexicographic": {"type": "lexicographic"},
    "alphaNumeric": {"type": "alphaNumeric"},
    "inverted": {"type": "inverted",
                 "metric": {"type": "numeric", "metric": "rows"}},
    "dimension": {"type": "dimension", "ordering": "lexicographic"},
}


def _run(q, spark, cat):
    translate(q, spark, cat).collect()


@pytest.mark.parametrize("name", sorted(FILTERS))
def test_filter_types(name, spark, foo_catalog):
    spec = FILTERS[name]
    if spec is None:
        return  # deliberate raise (javascript) / covered elsewhere (bloom)
    q = {"queryType": "timeseries", "dataSource": "foo",
         "granularity": "all", "intervals": INTERVAL, "filter": spec,
         "aggregations": [{"type": "count", "name": "rows"}]}
    _run(q, spark, foo_catalog)


def test_javascript_filter_is_deliberate(spark, foo_catalog):
    q = {"queryType": "timeseries", "dataSource": "foo",
         "granularity": "all", "intervals": INTERVAL,
         "filter": {"type": "javascript", "dimension": "dim1",
                    "function": "function(x){return true}"},
         "aggregations": [{"type": "count", "name": "rows"}]}
    with pytest.raises(NotImplementedError):
        _run(q, spark, foo_catalog)


@pytest.mark.parametrize("name", sorted(HAVING))
def test_having_types(name, spark, foo_catalog):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "intervals": INTERVAL,
         "dimensions": [{"type": "default", "dimension": "dim1",
                         "outputName": "v"}],
         "aggregations": [{"type": "count", "name": "rows"}],
         "having": HAVING[name]}
    _run(q, spark, foo_catalog)


def test_never_having_filters_everything(spark, foo_catalog):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "intervals": INTERVAL,
         "dimensions": [{"type": "default", "dimension": "dim1",
                         "outputName": "v"}],
         "aggregations": [{"type": "count", "name": "rows"}],
         "having": {"type": "never"}}
    assert translate(q, spark, foo_catalog).count() == 0


@pytest.mark.parametrize("name", sorted(DIM_SPECS))
def test_dimension_spec_types(name, spark, foo_catalog):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "intervals": INTERVAL, "dimensions": [DIM_SPECS[name]],
         "aggregations": [{"type": "count", "name": "rows"}]}
    _run(q, spark, foo_catalog)


@pytest.mark.parametrize("name", sorted(EXTRACTION_FNS))
def test_extraction_fn_types(name, spark, foo_catalog):
    fn = EXTRACTION_FNS[name]
    col = "__time" if name in ("time", "timeFormat") else "dim1"
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "intervals": INTERVAL,
         "dimensions": [{"type": "extraction", "dimension": col,
                         "outputName": "v",
                         "extractionFn": fn or {"type": "javascript",
                                                "function": "f"}}],
         "aggregations": [{"type": "count", "name": "rows"}]}
    if fn is None:
        with pytest.raises(NotImplementedError):
            _run(q, spark, foo_catalog)
    else:
        _run(q, spark, foo_catalog)


def test_partial_extraction_semantics(spark, foo_catalog):
    """MatchingDimExtractionFn: find()-matched values kept verbatim, the
    rest null."""
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "intervals": INTERVAL,
         "dimensions": [{"type": "extraction", "dimension": "dim1",
                         "outputName": "v",
                         "extractionFn": {"type": "partial", "expr": "b"}}],
         "aggregations": [{"type": "count", "name": "rows"}]}
    out = {r["v"]: r["rows"] for r in translate(q, spark, foo_catalog).collect()}
    assert out == {"abc": 1, None: 5}


@pytest.mark.parametrize("name", sorted(SEARCH_SPECS))
def test_search_spec_types(name, spark, foo_catalog):
    q = {"queryType": "search", "dataSource": "foo", "granularity": "all",
         "intervals": INTERVAL, "searchDimensions": ["dim1"],
         "query": SEARCH_SPECS[name]}
    _run(q, spark, foo_catalog)


@pytest.mark.parametrize("name", sorted(TOPN_METRICS))
def test_topn_metric_spec_types(name, spark, foo_catalog):
    q = {"queryType": "topN", "dataSource": "foo", "granularity": "all",
         "intervals": INTERVAL,
         "dimension": {"type": "default", "dimension": "dim1",
                       "outputName": "v"},
         "metric": TOPN_METRICS[name], "threshold": 3,
         "aggregations": [{"type": "count", "name": "rows"}]}
    _run(q, spark, foo_catalog)


def test_search_all_spec_matches_every_value(spark, foo_catalog):
    q = {"queryType": "search", "dataSource": "foo", "granularity": "all",
         "intervals": INTERVAL, "searchDimensions": ["dim1"],
         "query": {"type": "all"}}
    out = translate(q, spark, foo_catalog).collect()
    assert {r["value"] for r in out} == {"", "10.1", "2", "1", "def", "abc"}
