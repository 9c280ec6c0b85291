"""Fuzzy (MinHash) decontamination (pipeline/decontaminate.py
decontaminate_fuzzy) — exact leaks, near leaks, clean docs, short
docs, and the broadcast plan shape."""

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.decontaminate import (
    decontaminate,
    decontaminate_fuzzy,
)

LEAK = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill nearby every single morning")
NEAR = LEAK.replace("lazy dog", "sleepy hound")
CLEAN = ("completely different text about spark catalyst optimizer "
         "plans shuffles partitions and whole stage code generation")


@pytest.fixture()
def corpora(spark):
    train = spark.createDataFrame(
        [(1, LEAK), (2, NEAR), (3, CLEAN), (4, "too few"), (5, None)],
        "doc_id int, text string")
    ev = spark.createDataFrame(
        [(100, LEAK)], "eval_id int, text string")
    return train, ev


class TestFuzzyDecontam:
    def test_exact_and_near_leak_flagged(self, corpora):
        train, ev = corpora
        out = {r.doc_id: r for r in decontaminate_fuzzy(
            train, ev, eval_id_col="eval_id", threshold=0.5,
            bands=32).collect()}
        assert out[1].n_matches == 1
        assert out[1].max_jaccard == pytest.approx(1.0)
        # near-dup: most shingles shared, above 0.5, below 1.0
        assert out[2].n_matches == 1
        assert 0.5 <= out[2].max_jaccard < 1.0

    def test_clean_and_degenerate_docs_zero(self, corpora):
        train, ev = corpora
        out = {r.doc_id: r for r in decontaminate_fuzzy(
            train, ev, eval_id_col="eval_id", threshold=0.5,
            bands=32).collect()}
        for did in (3, 4, 5):
            r = out[did]
            assert (r.n_candidates, r.n_matches, r.max_jaccard) == \
                (0, 0, 0.0)
        assert len(out) == 5  # every train doc reported

    def test_threshold_separates_near_from_exact(self, corpora):
        train, ev = corpora
        out = {r.doc_id: r for r in decontaminate_fuzzy(
            train, ev, eval_id_col="eval_id", threshold=0.999,
            bands=32).collect()}
        assert out[1].n_matches == 1      # exact copy survives
        assert out[2].n_matches == 0      # near-dup is below
        assert out[2].n_candidates >= 1   # but WAS a candidate

    def test_near_leak_invisible_to_exact_13gram(self, corpora):
        # the motivating case: exact decontamination misses the
        # paraphrase that fuzzy catches
        train, ev = corpora
        exact = {r.doc_id: r for r in decontaminate(
            train, ev, eval_id_col="eval_id", n=13).collect()}
        assert exact[1].contaminated_grams > 0
        assert exact[2].contaminated_grams == 0

    def test_column_path_matches_pandas_kernel(self, corpora):
        train, ev = corpora
        a = decontaminate_fuzzy(train, ev, eval_id_col="eval_id",
                                threshold=0.5, bands=32,
                                use_pandas=True).collect()
        b = decontaminate_fuzzy(train, ev, eval_id_col="eval_id",
                                threshold=0.5, bands=32,
                                use_pandas=False).collect()
        key = lambda r: (r.doc_id, r.n_candidates, r.n_matches,
                         round(r.max_jaccard, 9))
        assert sorted(map(key, a)) == sorted(map(key, b))

    def test_eval_side_broadcast_in_plan(self, corpora):
        train, ev = corpora
        plan = (decontaminate_fuzzy(train, ev, eval_id_col="eval_id")
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan


class TestStripContaminated:
    def test_removes_only_overlapping_spans(self, spark):
        from incubator_druid_spark.pipeline.decontaminate import (
            strip_contaminated_spans)
        leak = "alpha beta gamma delta epsilon zeta eta theta"
        train = spark.createDataFrame(
            [(1, f"intro words here {leak} closing words here"),
             (2, "totally unrelated text with many different words")],
            "doc_id int, text string")
        ev = spark.createDataFrame([(9, leak)],
                                   "eval_id int, text string")
        out = {r.doc_id: r for r in strip_contaminated_spans(
            train, ev, eval_id_col="eval_id", n=8).collect()}
        assert "gamma" not in out[1].clean_text
        assert out[1].clean_text.startswith("intro words here")
        assert out[1].removed_tokens == 8
        assert out[2].removed_tokens == 0

    def test_all_occurrences_removed(self, spark):
        # unlike strip_repeated_spans, contamination has no survivor
        from incubator_druid_spark.pipeline.decontaminate import (
            strip_contaminated_spans)
        leak = "one two three four five six seven eight"
        train = spark.createDataFrame(
            [(1, leak), (2, leak)], "doc_id int, text string")
        ev = spark.createDataFrame([(9, leak)],
                                   "eval_id int, text string")
        out = strip_contaminated_spans(train, ev, eval_id_col="eval_id",
                                       n=8).collect()
        assert all(r.clean_text == "" and r.removed_tokens == 8
                   for r in out)
