"""Plan hygiene for the round-9 operators: the closed-form ones must
compile to pure-JVM plans (no Python evaluation anywhere), the Arrow
ones must be MapInPandas (never row-at-a-time BatchEvalPython), and the
layout operator must produce a range-partitioned shuffle on the code.
Same contract as tests/test_pipeline_plans_r8.py."""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_jvm_only(df):
    p = _plan(df)
    assert "EvalPython" not in p          # Batch- and Arrow- variants
    assert "MapInPandas" not in p
    assert "FlatMapGroupsInPandas" not in p


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "src", "en", "<p>hello world</p> user: hi")],
        "doc_id int, source string, lang string, text string")


class TestClosedFormJvmOnly:
    def test_html_stats(self, docs):
        from incubator_druid_spark.pipeline.html import html_stats
        _assert_jvm_only(html_stats(docs.withColumnRenamed("text",
                                                           "html")))

    def test_chat_spans(self, docs):
        from incubator_druid_spark.pipeline.chat import chat_spans
        _assert_jvm_only(chat_spans(docs))

    def test_chat_stats(self, docs):
        from incubator_druid_spark.pipeline.chat import chat_stats
        _assert_jvm_only(chat_stats(docs))

    def test_truncate(self, docs):
        from incubator_druid_spark.pipeline.text import truncate_to_tokens
        _assert_jvm_only(truncate_to_tokens(docs, 5))

    def test_corpus_profile(self, docs):
        from incubator_druid_spark.pipeline.text import corpus_profile
        _assert_jvm_only(corpus_profile(docs))

    def test_quality_score(self, spark, docs):
        from incubator_druid_spark.pipeline.score import (
            linear_quality_score)
        w = spark.range(8).select(F.col("id").alias("bucket"),
                                  F.lit(0.5).alias("weight"))
        _assert_jvm_only(linear_quality_score(docs, w, dim=8))

    def test_url_parse(self, docs):
        from incubator_druid_spark.pipeline.urls import parse_urls
        _assert_jvm_only(parse_urls(
            docs.select("doc_id",
                        F.lit("https://a.com/x").alias("url"))))


class TestArrowKernels:
    def test_warc_records_is_map_in_pandas(self, spark):
        from incubator_druid_spark.pipeline.warc import warc_record_rows
        df = spark.createDataFrame([(1, bytearray(b""))],
                                   "doc_id int, content binary")
        p = _plan(warc_record_rows(df))
        assert "MapInPandas" in p and "BatchEvalPython" not in p


class TestLayoutPlan:
    def test_zorder_range_partitions_on_code(self, spark):
        from incubator_druid_spark.sources.layout import cluster_by_zorder
        df = spark.range(100).select(
            F.col("id").cast("double").alias("x"),
            (F.col("id") * 3 % 97).cast("double").alias("y"))
        out = cluster_by_zorder(df, ["x", "y"], bits=4, num_partitions=4,
                                bounds={"x": (0.0, 99.0),
                                        "y": (0.0, 96.0)})
        p = _plan(out)
        assert "rangepartitioning" in p.lower()
        _assert_jvm_only(out)

    def test_single_projection_no_extra_exchange(self, spark):
        # html extraction must stay a single scan+project: no shuffle
        from incubator_druid_spark.pipeline.html import extract_html
        df = spark.createDataFrame([(1, "<p>x</p>")],
                                   "doc_id int, html string")
        assert "Exchange" not in _plan(extract_html(df))
