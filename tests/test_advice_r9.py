"""Regression tests for the round-8 ADVICE fixes (round 9).

Covers: knn_join duplicate-query-id refusal, dedup_by_groups keep_by with
string ids (and the non-numeric-score refusal), and the latin script range
excluding the U+00D7/U+00F7 symbols.
"""

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.dedup import dedup_by_groups
from incubator_druid_spark.pipeline.similarity import knn_join
from incubator_druid_spark.pipeline.text import script_profile


def test_knn_join_rejects_duplicate_query_ids(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"])
    queries = spark.createDataFrame(
        [(7, [1.0, 0.0]), (7, [0.0, 1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="duplicate query ids"):
        knn_join(corpus, queries, k=1)


def test_dedup_by_groups_keep_by_string_ids(spark):
    # string/UUID-style ids used to crash on the -id tie-break negation
    df = spark.createDataFrame(
        [("a", 0.9), ("b", 0.9), ("c", 0.1), ("z", 0.5)],
        ["doc_id", "quality"])
    groups = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a")], ["id", "group_id"])
    kept = sorted(r["doc_id"]
                  for r in dedup_by_groups(df, groups, "doc_id",
                                           keep_by="quality").collect())
    # group {a,b,c}: max quality 0.9 tie between a/b -> lowest id 'a';
    # singleton z kept as-is
    assert kept == ["a", "z"]


def test_dedup_by_groups_keep_by_rejects_non_numeric_score(spark):
    df = spark.createDataFrame([(1, "hi")], ["doc_id", "text"])
    groups = spark.createDataFrame([(1, 1)], ["id", "group_id"])
    with pytest.raises(ValueError, match="numeric"):
        dedup_by_groups(df, groups, "doc_id", keep_by="text")


def test_script_profile_latin_excludes_multiply_divide_signs(spark):
    df = spark.createDataFrame(
        [(1, "3×4÷2"), (2, "é×÷")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert rows[1]["n_latin"] == 0
    assert rows[1]["dominant_script"] == "none"
    # é still counts; the two symbols don't
    assert rows[2]["n_latin"] == 1
