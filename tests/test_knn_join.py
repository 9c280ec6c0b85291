"""Set-to-set brute-force kNN join (pipeline/similarity.py knn_join):
Arrow GEMM kernel with batch-local top-k pruning, final window rank.
The oracle entry (knn_join_topk) hash-checks real data; these pin the
corners — boundary ties, pruning across batches, zero vectors, guards."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.similarity import knn_join


def _vecs(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows])


class TestKnnJoin:
    def test_exact_neighbors(self, spark):
        corpus = _vecs(spark, [
            (10, [1.0, 0.0]), (11, [0.0, 1.0]),
            (12, [1.0, 1.0]), (13, [-1.0, 0.0]),
        ])
        queries = _vecs(spark, [(1, [1.0, 0.0])])
        out = knn_join(corpus, queries, k=3).collect()
        assert [(r["rank"], r["c_id"]) for r in out] == \
            [(1, 10), (2, 12), (3, 11)]
        assert math.isclose(out[0]["cosine"], 1.0)
        assert math.isclose(out[1]["cosine"], 1 / math.sqrt(2))

    def test_tie_breaks_by_corpus_id(self, spark):
        # three corpus vectors with IDENTICAL cosine to the query
        corpus = _vecs(spark, [(22, [2.0, 0.0]), (20, [1.0, 0.0]),
                               (21, [3.0, 0.0]), (30, [0.0, 1.0])])
        queries = _vecs(spark, [(1, [1.0, 0.0])])
        out = knn_join(corpus, queries, k=2).collect()
        assert [(r["rank"], r["c_id"]) for r in out] == [(1, 20), (2, 21)]

    def test_pruning_across_many_partitions(self, spark):
        # best neighbor isolated in its own partition: batch-local top-k
        # must still surface it globally
        rows = [(100 + i, [1.0, float(i)]) for i in range(40)]
        corpus = _vecs(spark, rows).repartition(8)
        queries = _vecs(spark, [(1, [1.0, 0.0])])
        out = knn_join(corpus, queries, k=1).collect()
        assert out[0]["c_id"] == 100  # [1, 0] itself

    def test_multiple_queries(self, spark):
        corpus = _vecs(spark, [(10, [1.0, 0.0]), (11, [0.0, 1.0])])
        queries = _vecs(spark, [(1, [1.0, 0.1]), (2, [0.1, 1.0])])
        out = {r["q_id"]: r["c_id"] for r in
               knn_join(corpus, queries, k=1).collect()}
        assert out == {1: 10, 2: 11}

    def test_zero_vector_cosine_zero(self, spark):
        corpus = _vecs(spark, [(10, [0.0, 0.0]), (11, [1.0, 0.0])])
        queries = _vecs(spark, [(1, [1.0, 0.0])])
        out = {r["c_id"]: r["cosine"] for r in
               knn_join(corpus, queries, k=2).collect()}
        assert out[10] == 0.0 and math.isclose(out[11], 1.0)

    def test_k_larger_than_corpus(self, spark):
        corpus = _vecs(spark, [(10, [1.0, 0.0])])
        queries = _vecs(spark, [(1, [1.0, 0.0])])
        assert len(knn_join(corpus, queries, k=5).collect()) == 1

    def test_null_embeddings_skipped(self, spark):
        corpus = spark.createDataFrame(
            [Row(vec_id=10, embedding=[1.0, 0.0]),
             Row(vec_id=11, embedding=None)],
            "vec_id long, embedding array<double>")
        queries = spark.createDataFrame(
            [Row(vec_id=1, embedding=[1.0, 0.0]),
             Row(vec_id=2, embedding=None)],
            "vec_id long, embedding array<double>")
        out = knn_join(corpus, queries, k=2).collect()
        assert [(r["q_id"], r["c_id"]) for r in out] == [(1, 10)]

    def test_max_queries_guard(self, spark):
        df = _vecs(spark, [(i, [1.0, 0.0]) for i in range(5)])
        with pytest.raises(ValueError, match="max_queries"):
            knn_join(df, df, k=1, max_queries=3)
        with pytest.raises(ValueError, match="empty"):
            knn_join(df, df.filter(F.col("vec_id") < 0), k=1)
