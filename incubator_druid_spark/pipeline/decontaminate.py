"""Benchmark decontamination — flag training documents that overlap an
evaluation/benchmark corpus by exact word n-gram collision (the GPT-3
appendix-C / PaLM methodology: a training doc is contaminated when it
shares at least one n-gram — canonically 13 words — with any eval doc).

Scale shape (100 TB train, MB-scale eval): the eval side collapses to its
DISTINCT n-gram set and is BROADCAST — the train side is one scan +
posexplode + broadcast semi-ish join + per-doc aggregate, no shuffle of
the training text at all.  Benchmark suites are small by construction;
`broadcast_eval=False` falls back to a plain shuffle join for the rare
eval corpus too big to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.dedup import (_positioned_grams,
                                                  _widen_for_explode)


def _distinct_grams(df: DataFrame, id_col: str, text_col: str, n: int):
    """(base, grams): base = (__id, __n_tokens); grams = distinct
    (__id, __g).  Tokenization matches the dedup family (normalize_text +
    whitespace tokens) so decontamination and ExactSubstr agree on what a
    "word" is."""
    base, grams = _positioned_grams(df, id_col, text_col, n)
    return base, grams.select("__id", "__g").distinct()


def decontaminate(train: DataFrame, eval_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  eval_id_col: str | None = None,
                  eval_text_col: str | None = None,
                  n: int = 13, broadcast_eval: bool = True) -> DataFrame:
    """Per-training-document n-gram overlap against the eval corpus.

    Returns one row per train document:
      (id, n_grams, contaminated_grams) — n_grams is the doc's DISTINCT
    n-gram count (documents shorter than n words have 0 and can never be
    flagged, matching the reference methodology), contaminated_grams is
    how many of those also occur anywhere in the eval corpus.  Callers
    flag on `contaminated_grams > 0` (strict GPT-3 rule) or threshold on
    the ratio.
    """
    base, train_grams = _distinct_grams(_widen_for_explode(train),
                                        id_col, text_col, n)
    eval_grams = _positioned_grams(
        eval_df, eval_id_col or id_col, eval_text_col or text_col, n,
    )[1].select("__g").distinct()
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    # one pass over the train grams: tag each with an eval hit via the
    # broadcast left join, then fold totals and hits in a single
    # aggregate (two separate groupBys would re-run the scan + explode +
    # distinct chain — a second full pass over the training text)
    per_doc = (train_grams
               .join(eval_grams.withColumn("__hit", F.lit(1)), "__g", "left")
               .groupBy("__id")
               .agg(F.count(F.lit(1)).alias("__n_grams"),
                    F.count("__hit").alias("contaminated_grams")))
    return (base
            .join(per_doc, "__id", "left")
            .select(F.col("__id").alias(id_col),
                    F.coalesce("__n_grams", F.lit(0))
                     .cast("long").alias("n_grams"),
                    F.coalesce("contaminated_grams", F.lit(0))
                     .cast("long").alias("contaminated_grams")))
