"""Round-9 text additions — token-budget truncation and the corpus
profile report (pipeline/text.py)."""

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.text import (
    corpus_profile,
    truncate_to_tokens,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "a", "en", "one two  three four five"),
         (2, "a", "en", "x y"),
         (3, "b", "fr", "aa bb cc"),
         (4, "a", "en", None),
         (5, "b", "fr", "")],
        "doc_id int, source string, lang string, text string")


class TestTruncate:
    def test_cut_and_flag(self, docs):
        out = {r.doc_id: r for r in truncate_to_tokens(docs, 3).collect()}
        assert out[1].text_truncated == "one two three"  # runs collapse
        assert out[1].was_truncated is True
        assert out[2].text_truncated == "x y"
        assert out[2].was_truncated is False
        assert out[4].text_truncated is None
        assert out[5].text_truncated == ""

    def test_zero_budget(self, docs):
        r = truncate_to_tokens(docs, 0).filter("doc_id = 1").first()
        assert r.text_truncated == "" and r.was_truncated

    def test_negative_raises(self, docs):
        with pytest.raises(ValueError):
            truncate_to_tokens(docs, -1)


class TestCorpusProfile:
    def test_groups_and_percentiles(self, docs):
        out = {(r.source, r.lang): r
               for r in corpus_profile(docs).collect()}
        a = out[("a", "en")]
        # token counts 5, 2, 0 (null doc counts 0)
        assert a.n_docs == 3 and a.total_tokens == 7
        assert a.p50_tokens == 2.0
        assert a.p95_tokens == pytest.approx(4.7)
        b = out[("b", "fr")]
        assert b.n_docs == 2 and b.total_chars == 8

    def test_custom_group(self, docs):
        out = corpus_profile(docs, group_cols=["source"]).collect()
        assert {r.source for r in out} == {"a", "b"}
