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


AGGREGATORS = {
    # AggregatorsModule.java:94-125 — every registered aggregator type name
    "count": {"type": "count", "name": "a"},
    "longSum": {"type": "longSum", "name": "a", "fieldName": "cnt"},
    "doubleSum": {"type": "doubleSum", "name": "a", "fieldName": "m2"},
    "floatSum": {"type": "floatSum", "name": "a", "fieldName": "m1"},
    "doubleMax": {"type": "doubleMax", "name": "a", "fieldName": "m2"},
    "floatMin": {"type": "floatMin", "name": "a", "fieldName": "m1"},
    "floatMax": {"type": "floatMax", "name": "a", "fieldName": "m1"},
    "doubleMin": {"type": "doubleMin", "name": "a", "fieldName": "m2"},
    "longMax": {"type": "longMax", "name": "a", "fieldName": "cnt"},
    "longMin": {"type": "longMin", "name": "a", "fieldName": "cnt"},
    "javascript": None,
    "histogram": {"type": "histogram", "name": "a", "fieldName": "m2",
                  "breaks": [0.0, 3.0, 7.0]},
    "hyperUnique": {"type": "hyperUnique", "name": "a", "fieldName": "dim1"},
    "cardinality": {"type": "cardinality", "name": "a", "fields": ["dim1"]},
    "filtered": {"type": "filtered", "filter": {"type": "true"},
                 "aggregator": {"type": "count", "name": "a"}},
    "longFirst": {"type": "longFirst", "name": "a", "fieldName": "cnt"},
    "doubleFirst": {"type": "doubleFirst", "name": "a", "fieldName": "m2"},
    "floatFirst": {"type": "floatFirst", "name": "a", "fieldName": "m1"},
    "stringFirst": {"type": "stringFirst", "name": "a", "fieldName": "dim1"},
    "stringFirstFold": {"type": "stringFirstFold", "name": "a",
                        "fieldName": "dim1"},
    "longLast": {"type": "longLast", "name": "a", "fieldName": "cnt"},
    "doubleLast": {"type": "doubleLast", "name": "a", "fieldName": "m2"},
    "doubleMean": {"type": "doubleMean", "name": "a", "fieldName": "m2"},
    "floatLast": {"type": "floatLast", "name": "a", "fieldName": "m1"},
    "stringLast": {"type": "stringLast", "name": "a", "fieldName": "dim1"},
    "stringLastFold": {"type": "stringLastFold", "name": "a",
                       "fieldName": "dim1"},
    "longAny": {"type": "longAny", "name": "a", "fieldName": "cnt"},
    "floatAny": {"type": "floatAny", "name": "a", "fieldName": "m1"},
    "doubleAny": {"type": "doubleAny", "name": "a", "fieldName": "m2"},
    "stringAny": {"type": "stringAny", "name": "a", "fieldName": "dim1"},
    # "grouping" needs subtotals context — covered by gb_subtotals
    "expression": {"type": "expression", "name": "a", "fields": ["m2"],
                   "initialValue": "0.0", "fold": "__acc + m2"},
}

POST_AGGS = {
    # AggregatorsModule.java:133-143
    "expression": {"type": "expression", "name": "p", "expression": "a + 1"},
    "arithmetic": {"type": "arithmetic", "name": "p", "fn": "+",
                   "fields": [{"type": "fieldAccess", "fieldName": "a"},
                              {"type": "constant", "value": 1}]},
    "fieldAccess": {"type": "arithmetic", "name": "p", "fn": "*",
                    "fields": [{"type": "fieldAccess", "fieldName": "a"},
                               {"type": "fieldAccess", "fieldName": "a"}]},
    "finalizingFieldAccess": {"type": "arithmetic", "name": "p", "fn": "+",
                              "fields": [{"type": "finalizingFieldAccess",
                                          "fieldName": "a"},
                                         {"type": "constant", "value": 0}]},
    "constant": {"type": "constant", "name": "p", "value": 42},
    "javascript": None,
    "doubleGreatest": {"type": "doubleGreatest", "name": "p",
                       "fields": [{"type": "fieldAccess", "fieldName": "a"},
                                  {"type": "constant", "value": 1}]},
    "doubleLeast": {"type": "doubleLeast", "name": "p",
                    "fields": [{"type": "fieldAccess", "fieldName": "a"},
                               {"type": "constant", "value": 1}]},
    "longGreatest": {"type": "longGreatest", "name": "p",
                     "fields": [{"type": "fieldAccess", "fieldName": "a"},
                                {"type": "constant", "value": 1}]},
    "longLeast": {"type": "longLeast", "name": "p",
                  "fields": [{"type": "fieldAccess", "fieldName": "a"},
                             {"type": "constant", "value": 1}]},
}


@pytest.mark.parametrize("name", sorted(AGGREGATORS))
def test_aggregator_types(name, spark, foo_catalog):
    spec = AGGREGATORS[name]
    if spec is None:
        q = {"queryType": "timeseries", "dataSource": "foo",
             "granularity": "all", "intervals": INTERVAL,
             "aggregations": [{"type": "javascript", "name": "a",
                               "fieldNames": ["m1"], "fnAggregate": "f",
                               "fnCombine": "f", "fnReset": "f"}]}
        with pytest.raises(NotImplementedError):
            _run(q, spark, foo_catalog)
        return
    q = {"queryType": "timeseries", "dataSource": "foo",
         "granularity": "all", "intervals": INTERVAL,
         "aggregations": [spec]}
    _run(q, spark, foo_catalog)


@pytest.mark.parametrize("name", sorted(POST_AGGS))
def test_post_aggregator_types(name, spark, foo_catalog):
    spec = POST_AGGS[name]
    q = {"queryType": "timeseries", "dataSource": "foo",
         "granularity": "all", "intervals": INTERVAL,
         "aggregations": [{"type": "doubleSum", "name": "a",
                           "fieldName": "m2"}]}
    if spec is None:
        q["postAggregations"] = [{"type": "javascript", "name": "p",
                                  "fieldNames": ["a"], "function": "f"}]
        with pytest.raises(NotImplementedError):
            _run(q, spark, foo_catalog)
        return
    q["postAggregations"] = [spec]
    _run(q, spark, foo_catalog)


DATASOURCES = {
    # DataSource.java:33-39
    "table": {"type": "table", "name": "foo"},
    "query": {"type": "query",
              "query": {"queryType": "scan", "dataSource": "foo",
                        "intervals": INTERVAL, "columns": ["dim1", "cnt"]}},
    "union": {"type": "union", "dataSources": ["foo", "foo"]},
    "join": {"type": "join", "left": "foo",
             "right": {"type": "lookup", "lookup": "lookyloo"},
             "rightPrefix": "j0.", "condition": "dim1 == \"j0.k\"",
             "joinType": "INNER"},
    "lookup": {"type": "lookup", "lookup": "lookyloo"},
    "inline": {"type": "inline", "columnNames": ["dim1", "cnt"],
               "rows": [["a", 1], ["b", 2]]},
    "globalTable": {"type": "globalTable", "name": "foo"},
}


@pytest.mark.parametrize("name", sorted(DATASOURCES))
def test_datasource_types(name, spark, foo_catalog):
    ds = DATASOURCES[name]
    q = {"queryType": "scan", "dataSource": ds, "intervals": INTERVAL,
         "limit": 3}
    if name in ("lookup", "inline"):
        q.pop("intervals")  # lookup/inline tables have no __time
        q["intervals"] = None
    df = __import__("incubator_druid_spark").translate(
        {k: v for k, v in q.items() if v is not None}, spark, foo_catalog)
    assert df.count() >= 0


GRANULARITIES = [
    "all", "none", "second", "minute", "five_minute", "ten_minute",
    "fifteen_minute", "thirty_minute", "hour", "six_hour", "eight_hour",
    "day", "week", "month", "quarter", "year",
    {"type": "duration", "duration": 3600000},
    {"type": "period", "period": "PT2H"},
    {"type": "period", "period": "P1M", "timeZone": "America/Los_Angeles",
     "origin": "2000-01-03T00:00:00Z"},
]


@pytest.mark.parametrize("gran", [str(g) for g in GRANULARITIES])
def test_granularity_types(gran, spark, foo_catalog):
    g = next(x for x in GRANULARITIES if str(x) == gran)
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": g,
         "intervals": ["2000-01-01T00:00:00Z/2000-01-04T00:00:00Z"],
         "aggregations": [{"type": "count", "name": "rows"}],
         "context": {"skipEmptyBuckets": True}}
    _run(q, spark, foo_catalog)
