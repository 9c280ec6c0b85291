"""Text embedding plumbing (pipeline/embed.py) — default model
determinism and normalization, pluggable model/model_factory hooks,
composition with the ANN tier, and the Arrow plan shape."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.embed import (
    embed_text,
    hash_embedding_batch,
)


class TestDefaultModel:
    def test_deterministic_and_normalized(self):
        a = hash_embedding_batch(["hello world", "", "hello world"], 4)
        assert np.array_equal(a[0], a[2])
        assert np.array_equal(a[1], np.zeros(4))
        assert math.isclose(float((a[0] ** 2).sum()), 1.0,
                            rel_tol=1e-12)

    def test_token_order_insensitive_sum(self):
        a = hash_embedding_batch(["alpha beta"], 4)
        b = hash_embedding_batch(["beta alpha"], 4)
        assert np.allclose(a, b)


class TestEmbedText:
    @pytest.fixture()
    def docs(self, spark):
        return spark.createDataFrame(
            [(1, "hello world"), (2, None), (3, "x")],
            "doc_id long, text string")

    def test_end_to_end(self, spark, docs):
        rows = {r.doc_id: r.embedding
                for r in embed_text(docs, dim=4).collect()}
        ref = hash_embedding_batch(["hello world"], 4)[0]
        assert rows[1] == pytest.approx(list(ref))
        assert rows[2] == [0.0] * 4  # null text -> zero vector

    def test_custom_model(self, spark, docs):
        def constant(ts):
            return np.ones((len(ts), 2))
        rows = embed_text(docs, dim=2, model=constant).collect()
        assert all(r.embedding == [1.0, 1.0] for r in rows)

    def test_model_factory_runs_workerside(self, spark, docs):
        def factory():
            # built lazily inside the worker; returns the batch fn
            return lambda ts: np.full((len(ts), 2), 7.0)
        rows = embed_text(docs, dim=2, model_factory=factory).collect()
        assert all(r.embedding == [7.0, 7.0] for r in rows)

    def test_model_and_factory_conflict(self, docs):
        with pytest.raises(ValueError):
            embed_text(docs, model=lambda t: t,
                       model_factory=lambda: (lambda t: t))

    def test_feeds_ann_tier(self, spark, docs):
        # text -> vectors -> brute-force cosine kNN join, end to end
        from incubator_druid_spark.pipeline.similarity import knn_join
        vecs = embed_text(docs.filter("text IS NOT NULL"), dim=4)
        v = vecs.withColumnRenamed("doc_id", "vec_id")
        out = knn_join(v, v, k=1, id_col="vec_id")
        top = {r.q_id: r for r in out.collect()}
        assert top[1].c_id == 1  # self is the nearest neighbor
        assert top[1].cosine == pytest.approx(1.0)

    def test_plan_is_map_in_pandas(self, docs):
        p = (embed_text(docs, dim=2)
             ._jdf.queryExecution().executedPlan().toString())
        assert "MapInPandas" in p and "BatchEvalPython" not in p
