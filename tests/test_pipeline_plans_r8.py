"""Plan-shape hygiene for the round-8 pipeline operators: the
closed-form operators must compile to pure JVM plans (no Python of any
kind), and the Arrow-kernel operators must use the vectorized Arrow
nodes (MapInPandas / FlatMapGroupsInPandas), never row-at-a-time
BatchEvalPython."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"some text {i} here.") for i in range(20)])


def _emb(spark):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(20)])


class TestColumnOnlyPlans:
    """No Python evaluation node of ANY kind in the closed-form ops."""

    def _assert_jvm_only(self, df):
        plan = _plan(df)
        for marker in ("BatchEvalPython", "MapInPandas",
                       "FlatMapGroupsInPandas", "ArrowEvalPython"):
            assert marker not in plan, marker

    def test_text_curation_ops(self, spark):
        from incubator_druid_spark.pipeline.text import (c4_clean,
                                                         gopher_quality,
                                                         pii_counts,
                                                         redact_pii,
                                                         repetition_stats,
                                                         script_profile)
        docs = _docs(spark)
        for op in (gopher_quality, c4_clean, pii_counts, redact_pii,
                   script_profile):
            self._assert_jvm_only(op(docs))
        self._assert_jvm_only(repetition_stats(docs))

    def test_chunk_pack_concat_mixture(self, spark):
        from incubator_druid_spark.pipeline.packing import (chunk_documents,
                                                            pack_concat)
        from incubator_druid_spark.pipeline.sampling import weighted_mixture
        docs = _docs(spark)
        self._assert_jvm_only(chunk_documents(docs, chunk_tokens=4))
        self._assert_jvm_only(pack_concat(docs, seq_len=8, shards=2))
        self._assert_jvm_only(weighted_mixture(docs, {"x": 2.0},
                                               "text", "doc_id"))

    def test_decontaminate_and_spans(self, spark):
        from incubator_druid_spark.pipeline.decontaminate import decontaminate
        from incubator_druid_spark.pipeline.dedup import (
            repeated_ngram_spans, strip_repeated_spans)
        docs = _docs(spark)
        self._assert_jvm_only(decontaminate(docs, docs, n=2))
        self._assert_jvm_only(repeated_ngram_spans(docs, n=2))
        self._assert_jvm_only(strip_repeated_spans(docs, n=2))


class TestArrowKernelPlans:
    """The two deliberate Python kernels are Arrow-vectorized — and
    nothing in the repo's new operators is row-at-a-time."""

    def test_pack_greedy_uses_grouped_arrow(self, spark):
        from incubator_druid_spark.pipeline.packing import pack_greedy
        plan = _plan(pack_greedy(_docs(spark), seq_len=8, shards=2))
        assert "FlatMapGroupsInPandas" in plan
        assert "BatchEvalPython" not in plan

    def test_knn_join_uses_map_in_pandas(self, spark):
        from incubator_druid_spark.pipeline.similarity import knn_join
        emb = _emb(spark)
        plan = _plan(knn_join(emb, emb.limit(3), k=2))
        assert "MapInPandas" in plan
        assert "BatchEvalPython" not in plan
