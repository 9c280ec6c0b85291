"""SchemaEvolutionTest goldens — a datasource whose column types change
across segments (processing/src/test/java/org/apache/druid/query/
SchemaEvolutionTest.java).

The reference builds four segments of the same six logical rows where `c1`
evolves string(1) -> long(2) -> double(3) -> absent(4), `c2` appears from
segment 2, and `uniques` is a pre-built HLL sketch column in segments 2-3
(lines 137-147), then runs one timeseries query across segment subsets.
Here each segment is a parquet file with its own schema inside one
datasource dir registered with schemaEvolution=True (catalog.py
_read_evolving): files group by schema epoch, conflicting types promote
(numeric/string -> string, whose per-row casts reproduce Druid's
per-segment typed reads), and epochs union by name."""

import shutil

import pytest

from incubator_druid_spark import translate

IVL = ["1000/3000"]  # SchemaEvolutionTest.java:235 intervals("1000/3000")

TIMES = ["2000-01-01", "2000-01-02", "2000-01-03",
         "2001-01-01", "2001-01-02", "2001-01-03"]
C1 = ["9", "10.1", "2", "1", "4", "5"]
C2 = [["a"], [], [""], ["a", "c"], ["abc"], None]


@pytest.fixture(scope="module")
def evo(spark, tmp_path_factory):
    """index1..index4 parquet dirs + evolving combo datasources."""
    import datetime
    from pyspark.sql import functions as F
    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.operators.aggregations import _hll_input

    base = tmp_path_factory.mktemp("schema_evo")
    ts = [datetime.datetime.fromisoformat(t) for t in TIMES]

    def hll(df):
        """Per-row pre-built HLL sketch of the row's c2 elements — the
        COMPLEX `uniques` column rollup ingest would store."""
        e = df.select("rid", F.explode("c2").alias("v"))
        sk = e.groupBy("rid").agg(
            F.hll_sketch_agg(_hll_input(F.col("v"))).alias("uniques"))
        return df.join(sk, "rid", "left")

    idx = {}
    # index1: c1 string dimension, no c2, no uniques
    idx[1] = spark.createDataFrame(
        [(t, c, 1) for t, c in zip(ts, C1)],
        "`__time` timestamp, c1 string, cnt long")
    # index2: c1 long metric, c2 string MVD, uniques HLL, longmin
    rows2 = [(i, t, int(float(c)), c2, 1, int(float(c)))
             for i, (t, c, c2) in enumerate(zip(ts, C1, C2))]
    df2 = spark.createDataFrame(
        rows2, "rid long, `__time` timestamp, c1 long, "
               "c2 array<string>, cnt long, longmin long")
    idx[2] = hll(df2).drop("rid")
    # index3: c1 double metric, c2 string MVD, uniques HLL
    rows3 = [(i, t, float(c), c2, 1)
             for i, (t, c, c2) in enumerate(zip(ts, C1, C2))]
    df3 = spark.createDataFrame(
        rows3, "rid long, `__time` timestamp, c1 double, "
               "c2 array<string>, cnt long")
    idx[3] = hll(df3).drop("rid")
    # index4: no c1; c2 IS the HLL sketch column
    rows4 = [(i, t, c2) for i, (t, c2) in enumerate(zip(ts, C2))]
    df4 = spark.createDataFrame(
        rows4, "rid long, `__time` timestamp, c2 array<string>")
    idx[4] = hll(df4).select("__time", F.col("uniques").alias("c2"))

    cat = Catalog(spark)
    for i, df in idx.items():
        p = str(base / f"index{i}")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        cat.register(f"index{i}", p)

    import os
    for name, members in (("evo123", (1, 2, 3)), ("evo1234", (1, 2, 3, 4)),
                          ("evo234", (2, 3, 4))):
        combo = base / name
        combo.mkdir()
        for m in members:
            src = base / f"index{m}"
            for fn in os.listdir(src):
                if fn.endswith(".parquet"):
                    shutil.copy(src / fn, combo / f"seg{m}-{fn}")
        cat.register(name, str(combo), schemaEvolution="true")
    return cat


def ts_query(spark, cat, ds, aggs, **extra):
    q = {"queryType": "timeseries", "dataSource": ds, "granularity": "all",
         "intervals": IVL, "aggregations": aggs}
    q.update(extra)
    rows = translate(q, spark, cat).collect()
    assert len(rows) == 1
    return rows[0]


NUMERIC_AGGS = [
    {"type": "longSum", "name": "a", "fieldName": "c1"},
    {"type": "doubleSum", "name": "b", "fieldName": "c1"},
    {"type": "longSum", "name": "c", "expression": "c1 * 1"},
    {"type": "doubleSum", "name": "d", "expression": "c1 * 1"},
]


def test_hyper_unique_evolution(spark, evo):
    """testHyperUniqueEvolutionTimeseries — the sketch column is absent in
    segment 1 and a COMPLEX binary in 2-3; the union must still merge.
    The reference's exact 4.0039 estimate is its own HyperLogLogCollector
    bias; ours is the datasketches HLL (exact in the sparse range)."""
    aggs = [{"type": "hyperUnique", "name": "uniques",
             "fieldName": "uniques"}]
    r1 = ts_query(spark, evo, "index1", aggs)
    assert (r1["uniques"] or 0.0) == 0.0
    r123 = ts_query(spark, evo, "evo123", aggs)
    assert round(r123["uniques"]) == 4  # {a, '', c, abc}


def test_numeric_evolution_aggregation(spark, evo):
    """testNumericEvolutionTimeseriesAggregation — longSum/doubleSum with
    and without expressions as c1 evolves string->long->double->absent."""
    T = 31.1
    # string(1): per-value long casts truncate ('10.1' -> 10)
    r = ts_query(spark, evo, "index1", NUMERIC_AGGS)
    assert (r["a"], r["c"]) == (31, 31)
    assert r["b"] == pytest.approx(T) and r["d"] == pytest.approx(T)
    # long(2)
    r = ts_query(spark, evo, "index2", NUMERIC_AGGS)
    assert (r["a"], r["c"]) == (31, 31)
    assert r["b"] == 31.0 and r["d"] == 31.0
    # double(3)
    r = ts_query(spark, evo, "index3", NUMERIC_AGGS)
    assert (r["a"], r["c"]) == (31, 31)
    assert r["b"] == pytest.approx(T) and r["d"] == pytest.approx(T)
    # absent(4) — SQL null mode: sum of nothing is null
    r = ts_query(spark, evo, "index4", NUMERIC_AGGS)
    assert (r["a"], r["b"], r["c"], r["d"]) == (None,) * 4
    # string + long + double + absent
    r = ts_query(spark, evo, "evo1234", NUMERIC_AGGS)
    assert (r["a"], r["c"]) == (93, 93)
    assert r["b"] == pytest.approx(T * 2 + 31)
    assert r["d"] == pytest.approx(T * 2 + 31)
    # long + double + absent
    r = ts_query(spark, evo, "evo234", NUMERIC_AGGS)
    assert (r["a"], r["c"]) == (62, 62)
    assert r["b"] == pytest.approx(T + 31)
    assert r["d"] == pytest.approx(T + 31)


def test_numeric_evolution_filtering(spark, evo):
    """testNumericEvolutionFiltering — numeric bound filter c1 in [9, 11]
    across the type evolution; matches 9 and 10.x per segment."""
    aggs = [
        {"type": "longSum", "name": "a", "fieldName": "c1"},
        {"type": "doubleSum", "name": "b", "fieldName": "c1"},
        {"type": "floatSum", "name": "d", "fieldName": "c1"},
        {"type": "longMin", "name": "e", "fieldName": "c1"},
        {"type": "count", "name": "c"},
    ]
    filt = {"type": "bound", "dimension": "c1", "lower": "9", "upper": "11",
            "ordering": "numeric"}
    r = ts_query(spark, evo, "index1", aggs, filter=filt)
    assert (r["a"], r["c"], r["e"]) == (19, 2, 9)
    assert r["b"] == pytest.approx(19.1)
    assert r["d"] == pytest.approx(19.1, abs=1e-4)
    r = ts_query(spark, evo, "index2", aggs, filter=filt)
    assert (r["a"], r["c"], r["e"]) == (19, 2, 9)
    assert r["b"] == 19.0
    r = ts_query(spark, evo, "index3", aggs, filter=filt)
    assert (r["a"], r["c"], r["e"]) == (19, 2, 9)
    assert r["b"] == pytest.approx(19.1)
    # absent(4): nothing matches; count is 0, the rest null
    r = ts_query(spark, evo, "index4", aggs, filter=filt)
    assert (r["a"], r["b"], r["d"], r["e"], r["c"]) == (None,) * 4 + (0,)
    # all four united
    r = ts_query(spark, evo, "evo1234", aggs, filter=filt)
    assert (r["a"], r["c"], r["e"]) == (57, 6, 9)
    assert r["b"] == pytest.approx(57.2)
    assert r["d"] == pytest.approx(57.2, abs=1e-3)
