"""The scan-tier curation operators are STATELESS Column/Arrow
transforms, so they must run unchanged on a Structured Streaming
source — a 100 TB/day crawl can be quality-scored, extracted and
truncated in-flight, with only the stateful stages (dedup, grouping)
needing the dedicated streaming operators (pipeline/dedup.py
dedup_stream).  These tests pin that contract: html extraction, chat
spans-free stats projections, linear scoring, truncation and URL
parsing each process a file stream via a memory sink."""

import json

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def stream_dir(tmp_path):
    rows = [
        {"doc_id": 1, "text": "user: hi", "url": "https://A.com/x?utm_source=z",
         "html": "<p>hello <b>world</b></p><a href='/'>nav</a>"},
        {"doc_id": 2, "text": "one two three four five",
         "url": "http://b.org:80/p#frag", "html": "<div>bye</div>"},
    ]
    p = tmp_path / "in"
    p.mkdir()
    with open(p / "batch.jsonl", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    return str(p)


def _run(stream_df, name):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return name


SCHEMA = "doc_id long, text string, url string, html string"


class TestStatelessCurationOnStreams:
    def test_html_extraction_streams(self, spark, stream_dir):
        from incubator_druid_spark.pipeline.html import strip_html_tags
        src = spark.readStream.schema(SCHEMA).json(stream_dir)
        out = src.select("doc_id",
                         strip_html_tags(F.col("html")).alias("text"))
        t = _run(out, "html_stream")
        rows = {r.doc_id: r.text
                for r in spark.sql(f"SELECT * FROM {t}").collect()}
        assert rows[1] == "hello worldnav" or "hello world" in rows[1]
        assert rows[2] == "bye"

    def test_quality_score_streams_via_foreach_batch(self, spark,
                                                     stream_dir):
        # the scorer aggregates per doc (bucket counts), so on streams
        # it applies per micro-batch — the standard foreachBatch shape
        from incubator_druid_spark.pipeline.score import (
            linear_quality_score)
        w = spark.range(16).select(F.col("id").alias("bucket"),
                                   F.lit(0.5).alias("weight"))
        src = spark.readStream.schema(SCHEMA).json(stream_dir)
        got = []

        def score_batch(batch_df, _bid):
            got.extend(linear_quality_score(batch_df, w, dim=16)
                       .collect())

        q = (src.writeStream.foreachBatch(score_batch)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert len(got) == 2 and all(r.score > 0 for r in got)

    def test_truncation_and_urls_stream(self, spark, stream_dir):
        from incubator_druid_spark.pipeline.text import truncate_to_tokens
        from incubator_druid_spark.pipeline.urls import parse_urls
        src = spark.readStream.schema(SCHEMA).json(stream_dir)
        out = parse_urls(truncate_to_tokens(src, 3))
        t = _run(out, "url_stream")
        rows = {r.doc_id: r
                for r in spark.sql(f"SELECT * FROM {t}").collect()}
        assert rows[1].host == "a.com"
        assert rows[2].canonical_url == "http://b.org/p"
        assert rows[2].text_truncated == "one two three"

    def test_chat_parse_streams(self, spark, stream_dir):
        # parse_chat is a stateless explode — runs on streams; the
        # windowed span/stat variants are batch (documented)
        from incubator_druid_spark.pipeline.chat import parse_chat
        src = spark.readStream.schema(SCHEMA).json(stream_dir)
        t = _run(parse_chat(src), "chat_stream")
        rows = spark.sql(f"SELECT * FROM {t} WHERE doc_id = 1").collect()
        assert rows[0].role == "user" and rows[0].content == "hi"
