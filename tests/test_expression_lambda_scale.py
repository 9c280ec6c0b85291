"""expressionLambda at scale: the scalar fold fast paths must stream
through built-in partial aggregation (no per-group row materialization),
and growing (array) accumulators must honor Druid's maxSizeBytes contract
(ExpressionLambdaAggregatorFactory.java:105-115 — the accumulator is
size-bounded; exceeding it errors instead of OOMing an executor)."""

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog


def _mk_big(spark, tmp_path, n=10_000_000):
    """One group, n rows — the shape that OOMs a collect_list design."""
    import datetime
    path = str(tmp_path / "big.parquet")
    (spark.range(n)
          .select(F.lit(datetime.datetime(2024, 1, 1)).alias("__time"),
                  F.lit("g").alias("grp"),
                  (F.col("id") % 1000).alias("v"))
          .write.mode("overwrite").parquet(path))
    cat = Catalog(spark)
    cat.register("big", path)
    return cat


def _lambda_q(fold, init, fields, name="s"):
    return {"queryType": "groupBy", "dataSource": "big", "granularity": "all",
            "dimensions": ["grp"],
            "aggregations": [{"type": "expressionLambda", "name": name,
                              "fields": fields, "initialValue": init,
                              "fold": fold}]}


def test_sum_fold_streams_10m_single_group(spark, tmp_path):
    cat = _mk_big(spark, tmp_path)
    df = translate(_lambda_q("__acc + v", "0", ["v"]), spark, cat)
    # fast path: the plan must contain NO collect_list materialization
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    out = df.first()
    # sum of (id % 1000) over 10M ids = 10000 full cycles of 0..999
    assert out["s"] == 10_000 * (999 * 1000 // 2)


def test_min_max_count_folds_stream(spark, tmp_path):
    cat = _mk_big(spark, tmp_path, n=1_000_000)
    for fold, init, fields, expect in [
            ("max(__acc, v)", "-1", ["v"], 999),
            ("min(__acc, v)", "100000", ["v"], 0),
            ("__acc + 1", "0", [], 1_000_000)]:
        df = translate(_lambda_q(fold, init, fields), spark, cat)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "collect_list" not in plan, fold
        assert df.first()["s"] == expect, fold


def test_array_accumulator_exceeding_max_size_errors(spark, tmp_path):
    """Default maxSizeBytes is 1 KiB (DEFAULT_MAX_SIZE_BYTES = 1 << 10): an
    array accumulator folding 1000 doubles (8 KB) must error cleanly."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    cat = _mk_big(spark, tmp_path, n=1000)
    q = _lambda_q("array_append(__acc, v)", "<DOUBLE>[]", ["v"])
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="maxSizeBytes"):
        translate(q, spark, cat).collect()


def test_array_accumulator_within_explicit_max_size_passes(spark, tmp_path):
    cat = _mk_big(spark, tmp_path, n=1000)
    q = _lambda_q("array_append(__acc, v)", "<DOUBLE>[]", ["v"])
    q["aggregations"][0]["maxSizeBytes"] = "32KiB"
    out = translate(q, spark, cat).first()
    assert len(out["s"]) == 1000


def test_fast_path_value_parity_with_fold(spark, catalog):
    """Fast-path results must equal the generic fold on a real table with
    nulls and groups (value column of events has nulls)."""
    def run(fold, init, fields):
        q = {"queryType": "groupBy", "dataSource": "events",
             "granularity": "all", "dimensions": ["event_type"],
             "aggregations": [{"type": "expressionLambda", "name": "s",
                               "fields": fields, "initialValue": init,
                               "fold": fold}]}
        return {r["event_type"]: r["s"]
                for r in translate(q, spark, catalog).collect()}

    ev = catalog.table("events")
    exact_sum = {r["event_type"]: r["x"] for r in
                 ev.groupBy("event_type").agg(F.sum("value").alias("x"))
                   .collect()}
    got = run("__acc + value", "0.0", ["value"])
    for k, v in exact_sum.items():
        # relative tolerance: both sides are FP sums whose partial order
        # varies run-to-run with partition scheduling
        assert abs(got[k] - v) <= 1e-9 * max(1.0, abs(v)), k
    exact_max = {r["event_type"]: r["x"] for r in
                 ev.groupBy("event_type").agg(F.max("value").alias("x"))
                   .collect()}
    got = run("max(__acc, value)", "-1e308", ["value"])
    for k, v in exact_max.items():
        assert abs(got[k] - v) < 1e-9, k
