"""Round-6b GroupByQueryRunnerTest tranche — the final unported
remainders: the base testGroupBy (typed sum matrix), string virtual
columns, having over hyperUnique, merged having across day segments,
numeric-string nested grouping, decorated numeric dimension specs,
expression-lambda aggregators, and math-expression limit ordering
(processing/src/test/java/org/apache/druid/query/groupby/
GroupByQueryRunnerTest.java:465,1019,3271,3781,4421,9507,9621,11217).

The fixture's indexFloat/indexMin columns mirror TestIndex.java:136-153
METRIC_AGGS at NONE rollup (each equals a cast of the row's index)."""

import pytest

from incubator_druid_spark import translate

F2T = ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]
FULL = ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]

UNIQUES_9 = 9.019833517963864


def gb(spark, cat, **extra):
    q = {"queryType": "groupBy", "dataSource": "wiki",
         "granularity": "day", "intervals": F2T,
         "aggregations": [{"type": "count", "name": "rows"},
                          {"type": "longSum", "name": "idx",
                           "fieldName": "index"}]}
    q.update(extra)
    return translate(q, spark, cat).collect()


GB_DAY1 = [("automotive", 1, 135), ("business", 1, 118),
           ("entertainment", 1, 158), ("health", 1, 120),
           ("mezzanine", 3, 2870), ("news", 1, 121), ("premium", 3, 2900),
           ("technology", 1, 78), ("travel", 1, 119)]
GB_DAY2 = [("automotive", 1, 147), ("business", 1, 112),
           ("entertainment", 1, 166), ("health", 1, 113),
           ("mezzanine", 3, 2447), ("news", 1, 114), ("premium", 3, 2505),
           ("technology", 1, 97), ("travel", 1, 126)]


GB_DOUBLES = {
    ("2011-04-01", "automotive"): 135.88510131835938,
    ("2011-04-01", "business"): 118.57034,
    ("2011-04-01", "entertainment"): 158.747224,
    ("2011-04-01", "health"): 120.134704,
    ("2011-04-01", "mezzanine"): 2871.8866900000003,
    ("2011-04-01", "news"): 121.58358,
    ("2011-04-01", "premium"): 2900.798647,
    ("2011-04-01", "technology"): 78.622547,
    ("2011-04-01", "travel"): 119.922742,
    ("2011-04-02", "automotive"): 147.42593,
    ("2011-04-02", "business"): 112.987027,
    ("2011-04-02", "entertainment"): 166.016049,
    ("2011-04-02", "health"): 113.446008,
    ("2011-04-02", "mezzanine"): 2448.830613,
    ("2011-04-02", "news"): 114.290141,
    ("2011-04-02", "premium"): 2506.415148,
    ("2011-04-02", "technology"): 97.387433,
    ("2011-04-02", "travel"): 126.411364,
}


def test_group_by(spark, wiki_catalog):
    """testGroupBy — count + longSum + floatSum + doubleSum per quality
    per day.  The reference asserts doubles at ~1e-5 relative (its own
    expecteds mix float32-rounded and exact renderings)."""
    out = gb(spark, wiki_catalog,
             dimensions=[{"type": "default", "dimension": "quality",
                          "outputName": "alias"}],
             aggregations=[
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "index"},
                 {"type": "floatSum", "name": "idxFloat",
                  "fieldName": "indexFloat"},
                 {"type": "doubleSum", "name": "idxDouble",
                  "fieldName": "index"}])
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"],
                  r["idxFloat"], r["idxDouble"]) for r in out)
    assert [(a, rws, idx) for _, a, rws, idx, _, _ in got] == \
        [(a, rws, idx) for a, rws, idx in GB_DAY1 + GB_DAY2]
    for day, alias, _, _, f, d in got:
        assert d == pytest.approx(GB_DOUBLES[(day, alias)], rel=1e-5)
        assert f == pytest.approx(GB_DOUBLES[(day, alias)], rel=1e-5)


def test_group_by_with_string_virtual_column(spark, wiki_catalog):
    """testGroupByWithStringVirtualColumn (+ the Vectorizable cast
    twin) — `quality + 'x'` concatenates because quality is string."""
    out = gb(spark, wiki_catalog,
             virtualColumns=[{"type": "expression", "name": "vc",
                              "expression": "quality + 'x'",
                              "outputType": "STRING"}],
             dimensions=[{"type": "default", "dimension": "vc",
                          "outputName": "alias"}])
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
                 for r in out)
    assert got == \
        [("2011-04-01", a + "x", rws, idx) for a, rws, idx in GB_DAY1] + \
        [("2011-04-02", a + "x", rws, idx) for a, rws, idx in GB_DAY2]

    out2 = gb(spark, wiki_catalog,
              virtualColumns=[{"type": "expression", "name": "vc",
                               "expression": "cast(quality, 'STRING')",
                               "outputType": "STRING"}],
              dimensions=[{"type": "default", "dimension": "vc",
                           "outputName": "alias"}])
    got2 = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
                  for r in out2)
    assert got2 == \
        [("2011-04-01", a, rws, idx) for a, rws, idx in GB_DAY1] + \
        [("2011-04-02", a, rws, idx) for a, rws, idx in GB_DAY2]


def test_group_by_with_having_on_hyper_unique(spark, wiki_catalog):
    """testGroupByWithHavingOnHyperUnique — having > 8 on the raw
    uniques metric, ordered desc, limit 3: only spot survives."""
    out = gb(spark, wiki_catalog,
             granularity="all", intervals=FULL,
             dimensions=[{"type": "default", "dimension": "market",
                          "outputName": "market"}],
             aggregations=[{"type": "hyperUnique", "name": "uniques",
                            "fieldName": "quality"}],
             postAggregations=[{"type": "hyperUniqueCardinality",
                                "name": "hyperUniqueFinalizingPostAggMetric",
                                "fieldName": "uniques"}],
             having={"type": "greaterThan", "aggregation": "uniques",
                     "value": 8},
             limitSpec={"type": "default", "limit": 3, "columns": [
                 {"dimension": "uniques", "direction": "descending"}]})
    # the engine's documented exact upgrade returns 9 where the
    # reference's HLL estimates UNIQUES_9 = 9.0198…; having > 8 and the
    # desc ordering select the same single row either way
    assert [(r["market"], int(r["uniques"]),
             int(r["hyperUniqueFinalizingPostAggMetric"]))
            for r in out] == [("spot", 9, 9)]


def test_merged_having_spec(spark, wiki_catalog):
    """testMergedHavingSpec — P1M granularity over two days, OR having
    (rows > 2 OR idx == 217)."""
    out = gb(spark, wiki_catalog,
             granularity={"type": "period", "period": "P1M"},
             intervals=["2011-04-02/2011-04-04"],
             dimensions=[{"type": "default", "dimension": "quality",
                          "outputName": "alias"}],
             having={"type": "or", "havingSpecs": [
                 {"type": "greaterThan", "aggregation": "rows", "value": 2},
                 {"type": "equalTo", "aggregation": "idx", "value": 217}]})
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
                 for r in out)
    assert got == [("2011-04-01", "business", 2, 217),
                   ("2011-04-01", "mezzanine", 6, 4420),
                   ("2011-04-01", "premium", 6, 4416)]


def test_group_by_numeric_strings_as_numeric(spark, wiki_catalog):
    """testGroupByNumericStringsAsNumeric — inner query emits string
    aliases of LONG/FLOAT dims + __time; the outer query re-reads them
    as LONG/FLOAT."""
    inner = {"queryType": "groupBy", "dataSource": "wiki",
             "granularity": "day", "intervals": F2T,
             "dimensions": [
                 {"type": "default", "dimension": "qualityLong",
                  "outputName": "ql_alias"},
                 {"type": "default", "dimension": "qualityFloat",
                  "outputName": "qf_alias"},
                 {"type": "default", "dimension": "__time",
                  "outputName": "time_alias"}],
             "filter": {"type": "selector", "dimension": "quality",
                        "value": "entertainment"},
             "aggregations": [
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "index"}]}
    outer = {"queryType": "groupBy", "dataSource": {"type": "query",
                                                    "query": inner},
             "granularity": "all", "intervals": F2T,
             "dimensions": [
                 {"type": "default", "dimension": "time_alias",
                  "outputName": "time_alias2", "outputType": "LONG"},
                 {"type": "default", "dimension": "ql_alias",
                  "outputName": "ql_alias_long", "outputType": "LONG"},
                 {"type": "default", "dimension": "qf_alias",
                  "outputName": "qf_alias_float", "outputType": "FLOAT"},
                 {"type": "default", "dimension": "ql_alias",
                  "outputName": "ql_alias_float", "outputType": "FLOAT"}],
             "aggregations": [{"type": "count", "name": "count"}]}
    out = translate(outer, spark, wiki_catalog).collect()
    got = sorted((r["time_alias2"], r["ql_alias_long"], r["qf_alias_float"],
                  r["ql_alias_float"], r["count"]) for r in out)
    assert got == [(1301616000000, 1200, 12000.0, 1200.0, 1),
                   (1301702400000, 1200, 12000.0, 1200.0, 1)]


def test_group_by_numeric_strings_as_numeric_with_decoration(
        spark, wiki_catalog):
    """testGroupByNumericStringsAsNumericWithDecoration — regex/list
    filtered specs over the numeric-string column with LONG/FLOAT output;
    excluded rows group under null."""
    out = gb(spark, wiki_catalog,
             granularity="all",
             dimensions=[
                 {"type": "regexFiltered",
                  "delegate": {"type": "default",
                               "dimension": "qualityNumericString",
                               "outputName": "ql", "outputType": "LONG"},
                  "pattern": "170000"},
                 {"type": "listFiltered",
                  "delegate": {"type": "default",
                               "dimension": "qualityNumericString",
                               "outputName": "qf", "outputType": "FLOAT"},
                  "values": ["170000"], "isWhitelist": True}],
             filter={"type": "in", "dimension": "quality",
                     "values": ["entertainment", "technology"]},
             aggregations=[{"type": "count", "name": "count"}],
             limitSpec={"type": "default", "columns": [
                 {"dimension": "ql", "direction": "ascending"}]})
    assert [(r["ql"], r["qf"], r["count"]) for r in out] == \
        [(None, None, 2), (170000, 170000.0, 2)]


def test_group_by_decoration_on_numerics(spark, wiki_catalog):
    """testGroupByDecorationOnNumerics sql branch — the decorations
    filter on the STRING rendering of native LONG/FLOAT columns."""
    out = gb(spark, wiki_catalog,
             granularity="all",
             dimensions=[
                 {"type": "regexFiltered",
                  "delegate": {"type": "default",
                               "dimension": "qualityLong",
                               "outputName": "ql", "outputType": "LONG"},
                  "pattern": "1700"},
                 {"type": "listFiltered",
                  "delegate": {"type": "default",
                               "dimension": "qualityFloat",
                               "outputName": "qf", "outputType": "FLOAT"},
                  "values": ["17000.0"], "isWhitelist": True}],
             filter={"type": "in", "dimension": "quality",
                     "values": ["entertainment", "technology"]},
             aggregations=[{"type": "count", "name": "count"}])
    got = sorted(((r["ql"], r["qf"], r["count"]) for r in out),
                 key=lambda t: (t[0] is not None, t[0] or 0))
    assert got == [(None, None, 2), (1700, 17000.0, 2)]


def test_group_by_with_expression_aggregator(spark, wiki_catalog):
    """testGroupByWithExpressionAggregator — row-count and double-sum
    folds as expressionLambda aggregators."""
    out = gb(spark, wiki_catalog,
             dimensions=[{"type": "default", "dimension": "quality",
                          "outputName": "alias"}],
             aggregations=[
                 {"type": "expression", "name": "rows",
                  "fields": [], "initialValue": "0",
                  "fold": "__acc + 1", "combine": "__acc + rows"},
                 {"type": "expression", "name": "idx",
                  "fields": ["index"], "initialValue": "0.0",
                  "fold": "__acc + index"}])
    got = sorted((str(r["__time"])[:10], r["alias"], r["rows"],
                  float(r["idx"]))
                 for r in out)
    assert [(d, a, rws) for d, a, rws, _ in got] == \
        [("2011-04-01", a, rws) for a, rws, _ in GB_DAY1] + \
        [("2011-04-02", a, rws) for a, rws, _ in GB_DAY2]
    for day, alias, _, idx in got:
        assert idx == pytest.approx(GB_DOUBLES[(day, alias)], rel=1e-5)


def test_merge_results_with_limit_and_math_expression_order(
        spark, wiki_catalog):
    """testMergeResultsAcrossMultipleDaysWithLimitAndOrderByUsing-
    MathExpressions — longSum over a FLOAT virtual expression, desc
    order, limit 14.  The reference's `indexMin` float metric equals
    cast(index, FLOAT) at NONE rollup."""
    out = gb(spark, wiki_catalog,
             virtualColumns=[{"type": "expression", "name": "expr",
                              "expression":
                                  "index * 2 + cast(index, 'FLOAT') / 10",
                              "outputType": "FLOAT"}],
             dimensions=[{"type": "default", "dimension": "quality",
                          "outputName": "alias"}],
             aggregations=[
                 {"type": "count", "name": "rows"},
                 {"type": "longSum", "name": "idx", "fieldName": "expr"}],
             limitSpec={"type": "default", "limit": 14, "columns": [
                 {"dimension": "idx", "direction": "descending"}]})
    got = [(str(r["__time"])[:10], r["alias"], r["rows"], r["idx"])
           for r in out]
    assert got == [
        ("2011-04-01", "premium", 3, 6090),
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
        ("2011-04-02", "travel", 1, 265),
    ]
