"""Hashed linear quality scoring (pipeline/score.py) — bucket hashing,
weighted-sum scoring, OOV handling, empty documents, threshold, and
plan hygiene (broadcast weights, no Python UDF)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.score import (
    linear_quality_score,
    token_buckets,
)

DIM = 64


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % DIM


@pytest.fixture()
def weights(spark):
    # every bucket weighted except multiples of 5 (OOV path)
    return (spark.range(DIM).filter(F.col("id") % 5 != 0)
            .select(F.col("id").alias("bucket"),
                    F.lit(0.25).alias("weight")))


class TestTokenBuckets:
    def test_buckets_match_reference_md5(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta alpha")], "doc_id int, text string")
        rows = {(r.bucket): r.cnt
                for r in token_buckets(df, dim=DIM).collect()}
        assert rows[_bucket("alpha")] == 2
        assert rows[_bucket("beta")] == 1


class TestLinearScore:
    def test_score_arithmetic(self, spark, weights):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta")], "doc_id int, text string")
        r = linear_quality_score(df, weights, dim=DIM, bias=0.5).first()
        matched = sum(1 for t in ("alpha", "beta", "gamma", "delta")
                      if _bucket(t) % 5 != 0)
        assert r.n_tokens == 4
        assert r.matched_tokens == matched
        raw = 0.5 + 0.25 * matched
        assert r.score_raw == pytest.approx(raw)
        assert r.score == pytest.approx(1.0 / (1.0 + math.exp(-raw)))
        assert r.keep is (r.score >= 0.5)

    def test_empty_doc_scores_bias(self, spark, weights):
        df = spark.createDataFrame(
            [(1, ""), (2, None)], "doc_id int, text string")
        rows = {r.doc_id: r for r in
                linear_quality_score(df, weights, dim=DIM,
                                     bias=-1.0).collect()}
        for r in rows.values():
            assert r.n_tokens == 0 and r.matched_tokens == 0
            assert r.score_raw == -1.0
            assert not r.keep

    def test_oov_contributes_zero(self, spark):
        w = (pytest.importorskip("pyspark.sql").SparkSession
             .getActiveSession().createDataFrame(
                 [(999999, 5.0)], "bucket long, weight double"))
        df = w.sparkSession.createDataFrame(
            [(1, "word")], "doc_id int, text string")
        r = linear_quality_score(df, w, dim=DIM).first()
        assert r.matched_tokens == 0 and r.score_raw == 0.0
        assert r.score == 0.5 and r.keep  # sigmoid(0) ties keep >= 0.5

    def test_threshold(self, spark, weights):
        df = spark.createDataFrame(
            [(1, "alpha alpha alpha alpha")], "doc_id int, text string")
        hi = linear_quality_score(df, weights, dim=DIM,
                                  threshold=0.99).first()
        assert hi.keep is bool(hi.score >= 0.99)

    def test_plan_broadcasts_weights_no_udf(self, spark, weights):
        df = spark.createDataFrame(
            [(1, "a b c")], "doc_id int, text string")
        plan = (linear_quality_score(df, weights, dim=DIM)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan
