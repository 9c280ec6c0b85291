"""Native `bloom` aggregator at scale: per-group aggregation state must be
bounded by the filter size (k·m ints), not by input cardinality — Druid
folds into a fixed-size ByteBuffer bitset
(extensions-core/druid-bloom-filter/.../BloomFilterAggregatorFactory.java).
A collect_set of per-row position ARRAYS grows with distinct values
(millions of k-int arrays for a high-cardinality field) and OOMs an
executor; the per-probe collect_set design caps it."""

import datetime

from pyspark.sql import functions as F

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog
from incubator_druid_spark.functions.bloom import bloom_might_contain


def _mk_highcard(spark, tmp_path, n=10_000_000):
    """One group, n rows, ~n DISTINCT values — the unbounded-state shape."""
    path = str(tmp_path / "hc.parquet")
    (spark.range(n)
          .select(F.lit(datetime.datetime(2024, 1, 1)).alias("__time"),
                  F.lit("g").alias("grp"),
                  F.concat(F.lit("u"), F.col("id")).alias("uid"))
          .write.mode("overwrite").parquet(path))
    cat = Catalog(spark)
    cat.register("hc", path)
    return cat


def test_bloom_agg_10m_distinct_single_group_bounded_state(spark, tmp_path):
    m, k = 8192, 6
    cat = _mk_highcard(spark, tmp_path)
    q = {"queryType": "groupBy", "dataSource": "hc", "granularity": "all",
         "dimensions": ["grp"],
         "aggregations": [{"type": "bloom", "name": "bf",
                           "fieldName": "uid",
                           "maxNumEntries": m, "k": k}]}
    df = translate(q, spark, cat)
    # state bound is structural: the plan aggregates per-probe collect_sets
    # of ints (≤ m distinct each), never a collect_set/list of arrays
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    row = df.first()
    positions = row["bf"]
    # a saturated filter: ≤ m positions, sorted, all in [0, m)
    assert len(positions) <= m
    assert positions == sorted(positions)
    assert 0 <= positions[0] and positions[-1] < m


def test_bloom_agg_probe_semantics_unchanged(spark, tmp_path):
    """Small-group correctness: members probe true, non-member FP rate sane."""
    m, k = 8192, 6
    path = str(tmp_path / "small.parquet")
    spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1), "g", f"v{i}") for i in range(100)],
        "__time timestamp, grp string, uid string") \
        .write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("small", path)
    q = {"queryType": "groupBy", "dataSource": "small", "granularity": "all",
         "dimensions": ["grp"],
         "aggregations": [{"type": "bloom", "name": "bf",
                           "fieldName": "uid",
                           "maxNumEntries": m, "k": k}]}
    positions = translate(q, spark, cat).first()["bf"]
    probe = spark.createDataFrame(
        [(f"v{i}",) for i in range(100)] + [(f"no{i}",) for i in range(200)],
        "uid string") \
        .select("uid", bloom_might_contain(list(positions), F.col("uid"),
                                           m, k).alias("hit"))
    hits = {r["uid"]: r["hit"] for r in probe.collect()}
    assert all(hits[f"v{i}"] for i in range(100))  # no false negatives
    fp = sum(1 for i in range(200) if hits[f"no{i}"])
    assert fp <= 10  # 100 entries in m=8192, k=6 → FP rate well under 5%
