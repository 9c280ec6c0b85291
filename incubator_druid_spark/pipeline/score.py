"""Model-based quality scoring — a hashed bag-of-words linear
classifier applied at corpus scale.

The modern curation pipelines (FineWeb-Edu's educational-value
classifier, DCLM's fastText filter) gate documents with a LEARNED
quality model, not just closed-form heuristics.  The dominant shape is
linear over hashed token features: score = sigmoid(b + Σ_t w[h(t)]).
Training happens offline; what the 100 TB engine needs is the SCORING
pass, and that is pure relational algebra:

    tokens → hash-bucket (explode) → per-(doc, bucket) counts →
    broadcast join the weight table → per-doc weighted sum → sigmoid

Scale design: the explode is bounded by token count (same shape as the
gram operators, widened inputs); the weight table (dim rows) is
broadcast — the corpus text never shuffles, only (doc_id, bucket,
count) triples; one shuffle on doc_id.  No UDFs anywhere.

Hash contract (SQL-replayable, same family as pipeline/dedup.py
``_hash60``): bucket = int(md5(token)[:15 hex]) % dim — a 60-bit
non-negative integer every engine computes identically.  Weights are
DATA, not code: any (bucket BIGINT, weight DOUBLE) frame works; tokens
hashing to a bucket absent from the table contribute 0 (out-of-model,
reported via ``matched_tokens``).

No counterpart in the reference engine (training-data-pipeline tier,
SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_buckets", "linear_quality_score"]


def _bucket(col, dim: int):
    return (F.conv(F.substring(F.md5(col), 1, 15), 16, 10)
            .cast("long") % dim)


def token_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1 << 20,
) -> DataFrame:
    """(id, bucket, cnt) hashed bag-of-words counts per document —
    the sparse feature vector in relational form."""
    from incubator_druid_spark.pipeline.text import tokens
    toks = tokens(F.col(text_col))
    return (df.select(F.col(id_col), F.explode(toks).alias("__tok"))
              .select(id_col, _bucket(F.col("__tok"), dim).alias("bucket"))
              .groupBy(id_col, "bucket")
              .agg(F.count("*").alias("cnt")))


def linear_quality_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1 << 20,
    bias: float = 0.0,
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document with a hashed linear model: (id, n_tokens,
    matched_tokens, score_raw, score, keep).  ``weights`` is a
    (bucket, weight) frame — broadcast, so the text never shuffles;
    documents with no tokens score sigmoid(bias).  ``keep`` applies the
    sigmoid threshold (FineWeb-Edu keeps score >= 0.5 by default)."""
    from incubator_druid_spark.pipeline.text import tokens
    w = F.broadcast(weights.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("weight").cast("double").alias("weight")))
    # The dot product Σ w(bucket(tok)) needs no per-(id, bucket) counts,
    # so probe the broadcast weights per TOKEN row and aggregate straight
    # to the document: the former token_buckets() pre-aggregation paid a
    # full exchange of every (id, bucket) token row before this one —
    # the only shuffle left now is the per-document partial aggregate
    # (guide-§2.3 "aggregate before you shuffle" applied to the feature
    # pass itself).  Counts are integers (exact), and the declared-entry
    # weights are dyadic rationals, so the per-token fold equals the
    # per-bucket fold exactly; n_tokens = count of token rows as before.
    # The text column is still read exactly once; the base side scans
    # only the id column.
    from incubator_druid_spark.pipeline.dedup import _widen_for_explode
    tok_rows = (_widen_for_explode(df, by=id_col)
                .select(F.col(id_col),
                        F.explode(tokens(F.col(text_col))).alias("__tok"))
                .select(id_col, _bucket(F.col("__tok"), dim).alias("bucket")))
    dots = (tok_rows.join(w, "bucket", "left")
                 .groupBy(id_col)
                 .agg(F.count(F.lit(1)).alias("n_tokens"),
                      F.sum(F.coalesce(F.col("weight"), F.lit(0.0)))
                       .alias("__dot"),
                      F.count(F.col("weight")).alias("matched_tokens")))
    base = df.select(F.col(id_col))
    raw = F.coalesce(F.col("__dot"), F.lit(0.0)) + F.lit(float(bias))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-raw))
    return (base.join(dots, id_col, "left")
                .select(id_col,
                        F.coalesce(F.col("n_tokens"), F.lit(0))
                         .alias("n_tokens"),
                        F.coalesce(F.col("matched_tokens"), F.lit(0))
                         .alias("matched_tokens"),
                        raw.alias("score_raw"),
                        score.alias("score"),
                        (score >= F.lit(float(threshold))).alias("keep")))
