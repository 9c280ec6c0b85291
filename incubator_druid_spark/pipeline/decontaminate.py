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
    base, train_grams = _distinct_grams(_widen_for_explode(train, by=id_col),
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


def decontaminate_fuzzy(train: DataFrame, eval_df: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        eval_id_col: str | None = None,
                        eval_text_col: str | None = None,
                        threshold: float = 0.5, num_hashes: int = 64,
                        bands: int = 16, shingle_n: int = 3,
                        max_bucket: int = 64,
                        use_pandas: bool = True) -> DataFrame:
    """NEAR-duplicate decontamination: flag training documents whose
    shingle-set Jaccard against ANY eval document reaches ``threshold``
    — the fuzzy complement of :func:`decontaminate`'s exact n-gram
    rule (paraphrased/reformatted benchmark leaks survive exact
    13-gram matching; MinHash catches them).

    Shape (100 TB train, MB-scale eval): both sides run the SAME
    Arrow signature kernel as minhash_dedup (one pass over each
    corpus); the eval side's band buckets AND shingle-hash sets are
    BROADCAST, so the train text never shuffles — candidates are a
    broadcast band-key join, the verify stage is a broadcast
    array-intersect, and the only shuffle is the final per-doc
    aggregate on train ids.  Train-side hot buckets are capped at
    ``max_bucket`` exactly like the self-join path.

    Returns one row per train document:
      (id, n_candidates, n_matches, max_jaccard) — candidates are LSH
    band collisions, matches are candidates whose verified Jaccard >=
    threshold; clean documents report (0, 0, 0.0).
    """
    from incubator_druid_spark.pipeline.dedup import (
        _shingle_frame, _signature_frame_pandas, _widen_for_explode,
        banded_buckets, minhash_signature, shingle_hash64)

    eid = eval_id_col or id_col
    etx = eval_text_col or text_col
    par = train.sparkSession.sparkContext.defaultParallelism

    def sig_frame(df, idc, txc):
        if use_pandas:
            return _signature_frame_pandas(
                df.repartition(par, F.col(idc)), idc, txc,
                num_hashes, shingle_n)
        sh = _shingle_frame(df, idc, txc, shingle_n)
        return (sh.select(
            F.col(idc),
            minhash_signature(F.col("__sh"), num_hashes).alias("__sig"),
            F.transform(F.col("__sh"), shingle_hash64).alias("__sh"))
            .filter(F.col("__sig")[0].isNotNull()))

    t = sig_frame(_widen_for_explode(train, by=id_col), id_col, text_col).persist()
    e = (sig_frame(eval_df, eid, etx)
         .select(F.col(eid).alias("__eval_id"), "__sig", "__sh"))
    tb = banded_buckets(t, id_col, num_hashes, bands)
    eb = banded_buckets(e, "__eval_id", num_hashes, bands)
    if max_bucket:
        sizes = (tb.groupBy("band", "bh")
                   .agg(F.count(F.lit(1)).alias("__n"))
                   .filter(F.col("__n") <= max_bucket)
                   .drop("__n"))
        tb = tb.join(sizes, ["band", "bh"])
    cand = (tb.join(F.broadcast(eb.select("band", "bh", "__eval_id")),
                    ["band", "bh"])
              .select(id_col, "__eval_id").distinct())
    tsh = t.select(F.col(id_col), F.col("__sh").alias("__sh_t"))
    esh = F.broadcast(e.select("__eval_id", F.col("__sh").alias("__sh_e")))
    # |A∪B| = |A|+|B|−|A∩B| over the distinct-gram hash sets — same
    # union-arithmetic as minhash_dedup's verify (and the DuckDB oracle);
    # drops the per-pair union-array materialization
    inter = F.size(F.array_intersect(F.col("__sh_t"), F.col("__sh_e")))
    union = F.size(F.col("__sh_t")) + F.size(F.col("__sh_e")) - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    per_pair = (cand.join(tsh, id_col).join(esh, "__eval_id")
                    .select(id_col, jac.alias("__jaccard")))
    agg = per_pair.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum((F.col("__jaccard") >= threshold).cast("int"))
         .alias("n_matches"),
        F.max("__jaccard").alias("max_jaccard"))
    return (train.select(id_col).join(agg, id_col, "left")
                 .select(id_col,
                         F.coalesce("n_candidates", F.lit(0))
                          .cast("long").alias("n_candidates"),
                         F.coalesce("n_matches", F.lit(0))
                          .cast("long").alias("n_matches"),
                         F.coalesce("max_jaccard", F.lit(0.0))
                          .alias("max_jaccard")))


def strip_contaminated_spans(train: DataFrame, eval_df: DataFrame,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             eval_id_col: str | None = None,
                             eval_text_col: str | None = None,
                             n: int = 13) -> DataFrame:
    """SURGICAL decontamination: instead of dropping a whole training
    document that collides with the eval corpus (the strict GPT-3
    rule :func:`decontaminate` supports), remove just the tokens
    covered by any eval-overlapping word n-gram and reassemble the
    rest — the middle-ground policy for long documents with one
    quoted benchmark item.  ALL occurrences of a contaminated gram
    are removed (contamination has no "first survives").

    Returns (id, clean_text, n_tokens, removed_tokens) over the
    NORMALIZED text (same contract as strip_repeated_spans).

    Scale shape: eval grams collapse to a broadcast distinct set; the
    train side is one positioned-gram pass, a broadcast join to find
    contaminated starts, and the shared bounded-explode cleaning
    tail — the training text shuffles once, for reassembly."""
    from incubator_druid_spark.pipeline.dedup import (
        _positioned_grams, _strip_covered_spans, _widen_for_explode)

    df = _widen_for_explode(train, by=id_col)
    base, grams = _positioned_grams(df, id_col, text_col, n)
    eval_grams = _positioned_grams(
        eval_df, eval_id_col or id_col, eval_text_col or text_col, n,
    )[1].select("__g").distinct()
    starts = (grams.join(F.broadcast(eval_grams), "__g")
                   .select("__id", "__pos"))
    return _strip_covered_spans(df, base, starts, n, id_col, text_col)
