"""Large-lookup scale path (VERDICT r3 ask #4).

The reference serves production lookups of 10^5-10^7 keys from node-resident
maps (extensions-core/lookups-cached-global/, query/lookup/LookupExtractor.java).
A literal CreateMap at that size explodes the serialized plan and codegen, so
above LOOKUP_JOIN_THRESHOLD every lookup application (expression lookup(),
registeredLookup extraction fn, lookup dimension spec, inline-map extraction,
SQL LOOKUP()) compiles into a broadcast left-join against a cached lookup
DataFrame instead — asserted here on the physical plan.
"""

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark import translate
from incubator_druid_spark.functions import lookups as lk


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


N_KEYS = 1_000_000


@pytest.fixture(scope="module")
def big_lookup():
    mapping = {str(i): f"v{i}" for i in range(N_KEYS)}
    # a few human keys so fixture dimension values actually hit
    mapping.update({"": "EMPTY", "abc": "XABC", "def": "XDEF", "2": "TWO"})
    lk.register_lookup("biglkp", mapping)
    yield "biglkp"
    lk._LOOKUPS.pop("biglkp", None)
    lk._LOOKUP_DFS.pop("biglkp", None)


def test_dimension_spec_broadcast_join(spark, foo_catalog, big_lookup):
    """lookup DIMENSION SPEC over a 1M-key lookup: BroadcastHashJoin, no
    million-literal projection, correct values."""
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": [{"type": "lookup", "dimension": "dim1",
                         "outputName": "d", "name": big_lookup,
                         "replaceMissingValueWith": "MISS"}],
         "aggregations": [{"type": "count", "name": "rows"}]}
    out = translate(q, spark, foo_catalog)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    # plan stays O(1) in lookup size — a CreateMap of 1M literals would be
    # tens of MB of plan text
    assert len(plan) < 100_000
    got = {r["d"]: r["rows"] for r in out.collect()}
    assert got["XABC"] == 1 and got["XDEF"] == 1 and got["TWO"] == 1
    assert got["EMPTY"] == 1 and got["MISS"] == 1  # only '10.1' misses
    assert got["v1"] == 1  # '1' hits the numeric 1M-key space


def test_expression_lookup_broadcast_join(spark, foo_catalog, big_lookup):
    """lookup() EXPRESSION inside a virtualColumn takes the same join path."""
    q = {"queryType": "scan", "dataSource": "foo",
         "virtualColumns": [{"type": "expression", "name": "lv",
                             "expression": f"lookup(dim1, '{big_lookup}')",
                             "outputType": "STRING"}],
         "columns": ["dim1", "lv"]}
    out = translate(q, spark, foo_catalog)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    vals = {r["dim1"]: r["lv"] for r in out.collect()}
    assert vals["abc"] == "XABC" and vals["10.1"] is None


def test_registered_lookup_extraction_fn(spark, foo_catalog, big_lookup):
    """registeredLookup extractionFn with retainMissingValue over the big
    lookup: join path + Druid retain semantics."""
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": [{"type": "extraction", "dimension": "dim1",
                         "outputName": "d",
                         "extractionFn": {"type": "registeredLookup",
                                          "lookup": big_lookup,
                                          "retainMissingValue": True}}],
         "aggregations": [{"type": "count", "name": "rows"}]}
    out = translate(q, spark, foo_catalog)
    assert "BroadcastHashJoin" in plan_of(out)
    got = {r["d"]: r["rows"] for r in out.collect()}
    assert got["XABC"] == 1 and got["10.1"] == 1  # retained original


def test_small_lookup_stays_literal(spark, foo_catalog):
    """Below the threshold the literal CreateMap path is kept — no join."""
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": [{"type": "lookup", "dimension": "dim1",
                         "outputName": "d", "name": "lookyloo"}],
         "aggregations": [{"type": "count", "name": "rows"}]}
    out = translate(q, spark, foo_catalog)
    assert "BroadcastHashJoin" not in plan_of(out)
    assert out.count() > 0


def test_sql_lookup_big(spark, foo_catalog, big_lookup):
    """SQL LOOKUP() over the big lookup probes a temp view via a correlated
    scalar subquery instead of inlining 1M literals into the UDF body."""
    from incubator_druid_spark.sql.functions import druid_sql
    out = druid_sql(spark,
                    f"SELECT dim1, LOOKUP(dim1, '{big_lookup}') AS v FROM foo",
                    foo_catalog)
    vals = {r["dim1"]: r["v"] for r in out.collect()}
    assert vals["abc"] == "XABC" and vals["2"] == "TWO"
    assert vals["10.1"] is None


def test_filter_with_big_lookup_expression(spark, foo_catalog, big_lookup):
    """An expression FILTER referencing the big lookup flushes the join
    before the predicate applies."""
    q = {"queryType": "scan", "dataSource": "foo",
         "filter": {"type": "expression",
                    "expression": f"lookup(dim1, '{big_lookup}') == 'XABC'"},
         "columns": ["dim1"]}
    out = translate(q, spark, foo_catalog)
    rows = out.collect()
    assert [r["dim1"] for r in rows] == ["abc"]
