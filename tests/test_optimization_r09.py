"""Regression tests for the round-9 optimization internals.

Covers the two operator-internal changes of the optimization round that
existing suites did not pin:
- gopher_quality's staged tokenization (the document must be tokenized
  exactly ONCE per row, even under a gopher_pass filter — the historical
  shape re-tokenized once per stopword marker and again per substituted
  filter conjunct), and the array_intersect stop-hits rewrite's value
  semantics (case, duplicates, null text).
- _widen_for_explode's min_bytes floor (a small narrow input is not
  repartitioned by regex-only callers; the unconditional path still
  widens).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
    return spark.createDataFrame(rows, schema)


class TestGopherStagedTokenization:
    def test_tokenize_once_under_filter(self, spark):
        """The optimized plan of filter(gopher_pass) must contain exactly
        ONE whitespace-tokenizing split: the pinned __toks staging.  The
        pre-r9 shape carried 10+ copies (one per stopword marker via the
        inverted array_contains probe, plus the filter-substituted
        conjuncts)."""
        from incubator_druid_spark.pipeline.text import gopher_quality
        df = _docs(spark, [(1, "the quick brown fox and the lazy dog")])
        plan = (gopher_quality(df).filter(F.col("gopher_pass"))
                ._jdf.queryExecution().optimizedPlan().toString())
        assert plan.count("\\s+") == 1, plan

    def test_stop_hits_semantics(self, spark):
        """stop_hits counts DISTINCT markers present (not token
        occurrences), case-sensitively on the lowercased tokens; null
        text counts 0."""
        from incubator_druid_spark.pipeline.text import gopher_quality
        rows = [
            (1, "the the THE tHe and grumble"),   # 'the' + 'and' -> 2
            (2, "xyzzy plugh"),                   # no markers -> 0
            (3, None),                            # null text -> 0
            (4, "theater andover"),               # substrings only -> 0
            (5, "of to is in that with for was the and"),  # all 10
        ]
        out = {r["doc_id"]: r["stop_hits"]
               for r in gopher_quality(_docs(spark, rows)).collect()}
        assert out == {1: 2, 2: 0, 3: 0, 4: 0, 5: 10}

    def test_signal_values_unchanged(self, spark):
        """Spot golden values for every signal on a crafted doc (same
        numbers the pre-staging implementation produced)."""
        from incubator_druid_spark.pipeline.text import gopher_quality
        text = "• bullet line\nplain words here...\nshort\n\n"
        r = gopher_quality(_docs(spark, [(1, text)])).collect()[0]
        # tokens: ['•','bullet','line','plain','words','here...','short']
        assert r["n_words"] == 7
        # lines: 3 non-empty; 1 bullet-led; 1 ellipsis-ended
        assert abs(r["bullet_line_frac"] - 1 / 3) < 1e-15
        assert abs(r["ellipsis_line_frac"] - 1 / 3) < 1e-15
        # alpha words: all but '•'
        assert abs(r["alpha_word_frac"] - 6 / 7) < 1e-15
        # symbols: one '...' run, no '#', no '…'
        assert abs(r["symbol_word_ratio"] - 1 / 7) < 1e-15


class TestWidenFloor:
    def test_small_input_not_repartitioned(self, spark, tmp_path):
        """fingerprint_dedup on a tiny narrow PARQUET input must not
        widen: the 64 MB floor keeps the one-regex-pass caller off the
        exchange.  (A parquet scan carries a real size estimate; local
        relations under coalesce estimate to Long.MaxValue and take the
        conservative widen-anyway path — also asserted below.)"""
        from incubator_druid_spark.pipeline.dedup import fingerprint_dedup
        p = str(tmp_path / "docs.parquet")
        _docs(spark, [(i, f"doc number {i}") for i in range(20)]) \
            .coalesce(1).write.mode("overwrite").parquet(p)
        df = spark.read.parquet(p)
        assert df.rdd.getNumPartitions() < \
            spark.sparkContext.defaultParallelism
        plan = (fingerprint_dedup(df, "text", "doc_id")
                ._jdf.queryExecution().optimizedPlan().toString())
        assert "RepartitionByExpression" not in plan, plan
        # unknown statistics (local relation behind a coalesce) estimate
        # to Long.MaxValue and fail open: widen anyway
        local = _docs(spark, [(1, "x")]).coalesce(1)
        plan2 = (fingerprint_dedup(local, "text", "doc_id")
                 ._jdf.queryExecution().optimizedPlan().toString())
        assert "RepartitionByExpression" in plan2, plan2

    def test_unconditional_widen_still_fires(self, spark):
        """min_bytes=0 (the gram-explode callers' setting) widens any
        narrow input regardless of size."""
        from incubator_druid_spark.pipeline.dedup import _widen_for_explode
        df = _docs(spark, [(i, "x") for i in range(20)]).coalesce(1)
        out = _widen_for_explode(df, by="doc_id")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "RepartitionByExpression" in plan, plan

    def test_results_identical_both_paths(self, spark):
        """The floor only changes partitioning, never the dedup result."""
        from incubator_druid_spark.pipeline.dedup import (_widen_for_explode,
                                                          fingerprint_dedup)
        rows = [(1, "Hello, World!"), (2, "hello world"), (3, "other doc"),
                (4, None), (5, "")]
        df = _docs(spark, rows).coalesce(1)
        base = {(r["fingerprint"], r["doc_id"], r["dup_count"])
                for r in fingerprint_dedup(df, "text", "doc_id").collect()}
        from incubator_druid_spark.pipeline.text import normalize_text
        widened = _widen_for_explode(df, by="doc_id")  # min_bytes=0 path
        manual = {(r["fingerprint"], r["doc_id"], r["dup_count"])
                  for r in (widened
                            .withColumn("__fp", F.xxhash64(
                                normalize_text(F.col("text"))))
                            .groupBy("__fp")
                            .agg(F.min("doc_id").alias("doc_id"),
                                 F.count(F.lit(1)).alias("dup_count"))
                            .withColumnRenamed("__fp", "fingerprint")
                            .collect())}
        assert base == manual
