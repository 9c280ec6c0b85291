"""Bigram-LM perplexity filter (pipeline/lm.py) — smoothing
arithmetic, <unk>/<s> handling, in-domain vs out-of-domain ordering,
determinism, and plan hygiene."""

import math

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.lm import (
    lm_perplexity,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def lm(spark):
    ref = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the dog sat on the rug"),
         (3, "the cat ran")],
        "doc_id int, text string")
    return train_bigram_lm(ref, vocab_size=100, add_k=0.5)


class TestTrain:
    def test_vocab_and_counts(self, lm):
        vocab = {r.w for r in lm["vocab"].collect()}
        assert "the" in vocab and "cat" in vocab
        assert lm["v_total"] == len(vocab) + 1
        uni = {r.w: r.cnt for r in lm["unigrams"].collect()}
        assert uni["<s>"] == 3          # one start per ref doc
        # U counts HISTORIES: a doc's final token never conditions
        # anything, so "the" (5 occurrences as history) scores 5
        assert uni["the"] == 5
        bi = {(r.w1, r.w2): r.cnt for r in lm["bigrams"].collect()}
        assert bi[("<s>", "the")] == 3
        assert bi[("the", "cat")] == 2

    def test_vocab_cutoff_deterministic(self, spark):
        ref = spark.createDataFrame(
            [(1, "aa bb cc aa bb aa")], "doc_id int, text string")
        m = train_bigram_lm(ref, vocab_size=2)
        # counts: aa=3, bb=2, cc=1 -> vocab {aa, bb}
        assert {r.w for r in m["vocab"].collect()} == {"aa", "bb"}


class TestScore:
    def test_known_pair_probability(self, spark, lm):
        # doc "the cat": pairs (<s>,the), (the,cat)
        df = spark.createDataFrame([(1, "the cat")],
                                   "doc_id int, text string")
        r = lm_perplexity(df, lm).first()
        v = lm["v_total"]
        p1 = (3 + 0.5) / (3 + 0.5 * v)      # B(<s>,the)=3, U(<s>)=3
        p2 = (2 + 0.5) / (5 + 0.5 * v)      # B(the,cat)=2, U(the)=5
        want = (math.log2(p1) + math.log2(p2)) / 2
        assert r.n_pairs == 2
        assert r.mean_log2p == pytest.approx(want)
        assert r.perplexity == pytest.approx(2 ** -want)

    def test_in_domain_beats_gibberish(self, spark, lm):
        df = spark.createDataFrame(
            [(1, "the cat sat on the mat"),
             (2, "zebra quantum flux torus")],
            "doc_id int, text string")
        out = {r.doc_id: r.perplexity
               for r in lm_perplexity(df, lm).collect()}
        assert out[1] < out[2]

    def test_empty_and_null_score_null(self, spark, lm):
        df = spark.createDataFrame([(1, ""), (2, None)],
                                   "doc_id int, text string")
        for r in lm_perplexity(df, lm).collect():
            assert r.n_pairs == 0
            assert r.mean_log2p is None and r.perplexity is None

    def test_unseen_history_is_finite(self, spark, lm):
        # both tokens OOV -> pair (<unk>,<unk>) with U(<unk>)=0
        df = spark.createDataFrame([(1, "zzz qqq")],
                                   "doc_id int, text string")
        r = lm_perplexity(df, lm).first()
        assert r.perplexity is not None and r.perplexity > 1

    def test_broadcast_plan_no_udf(self, spark, lm):
        df = spark.createDataFrame([(1, "the cat")],
                                   "doc_id int, text string")
        plan = (lm_perplexity(df, lm)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan
        assert "EvalPython" not in plan


class TestHigherOrder:
    def test_trigram_history_counts(self, spark):
        from incubator_druid_spark.pipeline.lm import train_ngram_lm
        ref = spark.createDataFrame(
            [(1, "a b c a b d")], "doc_id int, text string")
        m = train_ngram_lm(ref, vocab_size=10, order=3)
        bi = {(r.w1, r.w2): r.cnt for r in m["bigrams"].collect()}
        # histories are space-joined previous-2 tokens, <s>-padded
        assert bi[("<s> <s>", "a")] == 1
        assert bi[("<s> a", "b")] == 1
        assert bi[("a b", "c")] == 1 and bi[("a b", "d")] == 1
        uni = {r.w: r.cnt for r in m["unigrams"].collect()}
        assert uni[("a b")] == 2

    def test_trigram_scores_in_domain_lower(self, spark):
        from incubator_druid_spark.pipeline.lm import (
            lm_perplexity, train_ngram_lm)
        ref = spark.createDataFrame(
            [(1, "the cat sat on the mat"),
             (2, "the dog sat on the rug")],
            "doc_id int, text string")
        m = train_ngram_lm(ref, vocab_size=100, order=3)
        df = spark.createDataFrame(
            [(1, "the cat sat on the rug"), (2, "rug the on cat")],
            "doc_id int, text string")
        out = {r.doc_id: r.perplexity
               for r in lm_perplexity(df, m).collect()}
        assert out[1] < out[2]

    def test_order_one_rejected(self, spark):
        from incubator_druid_spark.pipeline.lm import train_ngram_lm
        ref = spark.createDataFrame([(1, "a")], "doc_id int, text string")
        with pytest.raises(ValueError):
            train_ngram_lm(ref, order=1)
