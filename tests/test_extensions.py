"""Bloom filter, sessionization, IVF ANN tests."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


def test_bloom_build_and_probe(spark, catalog):
    from incubator_druid_spark.functions.bloom import (bloom_build,
                                                       bloom_might_contain)
    events = catalog.table("events")
    build_side = events.filter(F.col("event_type") == "purchase") \
                       .select("user_id").distinct()
    positions = bloom_build(build_side, "user_id")
    probed = events.filter(bloom_might_contain(positions, F.col("user_id")))
    # no false negatives: every actual purchaser's events pass the filter
    actual = {r["user_id"] for r in build_side.collect()}
    passed = {r["user_id"] for r in probed.select("user_id").distinct().collect()}
    assert actual <= passed
    # filter is selective (false-positive rate far below 1)
    total = events.select("user_id").distinct().count()
    assert len(passed) < total or len(actual) == total


def test_bloom_dim_filter_in_query(spark, catalog):
    from incubator_druid_spark import translate
    from incubator_druid_spark.functions.bloom import bloom_build
    events = catalog.table("events")
    positions = bloom_build(
        events.filter(F.col("event_type") == "error").select("user_id"),
        "user_id")
    q = {"queryType": "timeseries", "dataSource": "events", "granularity": "all",
         "filter": {"type": "bloom", "dimension": "user_id",
                    "bloomKFilter": {"positions": positions}},
         "aggregations": [{"type": "count", "name": "cnt"}]}
    out = translate(q, spark, catalog).first()
    full = events.count()
    assert 0 < out["cnt"] <= full


def test_bloom_aggregator(spark, foo_catalog):
    from incubator_druid_spark import translate
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": [],
         "aggregations": [{"type": "bloom", "name": "bf", "fieldName": "dim1"}]}
    r = translate(q, spark, foo_catalog).first()
    assert len(r["bf"]) > 0  # position set built


def test_sessionize(spark):
    import datetime
    from incubator_druid_spark.pipeline.sessions import (session_stats,
                                                         sessionize)
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    mk = lambda m: base + datetime.timedelta(minutes=m)  # noqa: E731
    df = spark.createDataFrame(
        [(1, mk(0), 1.0), (1, mk(5), 2.0), (1, mk(50), 3.0),  # gap > 30 → new
         (2, mk(0), 4.0)],
        "user_id long, __time timestamp, value double")
    s = sessionize(df, gap_minutes=30)
    got = {(r["user_id"], str(r["__time"])): r["session_id"] for r in s.collect()}
    assert got[(1, "2024-01-01 10:00:00")] == 1
    assert got[(1, "2024-01-01 10:05:00")] == 1
    assert got[(1, "2024-01-01 10:50:00")] == 2
    stats = session_stats(df, gap_minutes=30)
    by_key = {(r["user_id"], r["session_id"]): r for r in stats.collect()}
    assert by_key[(1, 1)]["n_events"] == 2
    assert by_key[(1, 1)]["duration_sec"] == 300.0
    assert by_key[(1, 1)]["total_value"] == 3.0


def test_ivf_topk_recall(spark, catalog):
    from incubator_druid_spark.pipeline.similarity import (ann_ivf_topk,
                                                           cosine_topk)
    emb = catalog.table("embeddings")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    rest = emb.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in cosine_topk(rest, q, k=10).collect()}
    ivf = {r["vec_id"] for r in ann_ivf_topk(rest, q, k=10, n_clusters=8,
                                             nprobe=4).collect()}
    assert len(exact & ivf) >= 5
