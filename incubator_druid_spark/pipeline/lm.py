"""N-gram language-model perplexity scoring — the CCNet-style quality
filter, trained and applied as pure relational algebra.

CCNet (Wenzek et al. 2019) and its descendants rank web documents by
the perplexity of a language model trained on a clean reference corpus
(Wikipedia) and keep the low-perplexity head.  The original uses a
5-gram KenLM; the relational core is identical at any order and needs
no external binary: counts are aggregates, smoothing is arithmetic,
scoring is a join.  This module implements the bigram case:

  TRAIN (one pass over the reference corpus):
    * normalize + tokenize (the dedup family's normalize_text contract)
    * vocabulary = top ``vocab_size`` words by count (ties broken by
      word ascending — deterministic); everything else maps to <unk>
    * unigram counts U(w) over the mapped stream, plus U(<s>) = one
      sentence start per document; bigram counts B(w1, w2) over
      (<s>, t0), (t0, t1), …

  SCORE (scan + bounded explode + join per document):
    * per-pair add-k probability  p = (B + k) / (U(w1) + k * V)
      with V = |vocab| + 1 (the <unk> event; <s> never follows)
    * doc score = mean log2 p over its pairs;  perplexity = 2^(-mean)
    * empty documents score NULL (no pairs — nothing to judge)

Scale shape: training is two groupBys over the (small, clean)
reference corpus; the model is DATA — two (key, count) frames — and is
broadcast into the scoring join by default (a bigram table from a
reference corpus is millions of rows at most; pass
``broadcast_model=False`` for the shuffle join if yours is bigger).
The 100 TB score side explodes to (doc, w1, w2) triples — the text
itself never shuffles — and aggregates back per doc.  No UDFs.

No counterpart in the reference engine (training-data-pipeline tier,
SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["train_bigram_lm", "train_ngram_lm", "lm_perplexity"]

START = "<s>"
UNK = "<unk>"


def _positioned(df: DataFrame, text_col: str, id_col: str):
    from incubator_druid_spark.pipeline.text import normalize_text, tokens
    toks = tokens(normalize_text(F.col(text_col)))
    return (df.select(F.col(id_col).alias("__id"), toks.alias("__t"))
              .select("__id", F.posexplode("__t").alias("__pos", "__w")))


def _history(order: int):
    """History key for an order-n model: the space-joined (n-1)
    previous mapped tokens, <s>-padded before the document start —
    order=2 degenerates to the single previous token."""
    lags = [F.lag("__m", i, START).over(
        Window.partitionBy("__id").orderBy("__pos"))
        for i in range(order - 1, 0, -1)]
    return lags[0] if len(lags) == 1 else F.concat_ws(" ", *lags)


def _raw_bigram_pairs(df: DataFrame, text_col: str, id_col: str,
                      min_widen_bytes: int = 0):
    """(__id, __w1raw, __w2raw) UNMAPPED bigram pairs, formed ARRAY-side:
    zip the token array with its <s>-prepended shift instead of a lag()
    window — the window shape shuffled and sorted the ENTIRE token stream
    by document just to read each row's neighbor (guide §2.4).  The pair
    multiset is exactly the window form's: per document, position i
    yields (token[i-1] | <s>, token[i]).  Also returns the (__id, __t)
    token frame so trainers can persist it and derive word counts from
    the same single tokenization pass.

    ``min_widen_bytes`` is the _widen_for_explode size floor: the TRAIN
    side passes 64 MB (a clean reference corpus is usually small and the
    widening exchange costs more than the single-core pass); the SCORE
    side keeps unconditional widening (the 100 TB corpus is the thing
    being scored)."""
    from incubator_druid_spark.pipeline.dedup import _widen_for_explode
    from incubator_druid_spark.pipeline.text import normalize_text, tokens
    toks = tokens(normalize_text(F.col(text_col)))
    tbase = (_widen_for_explode(df, by=id_col, min_bytes=min_widen_bytes)
             .select(F.col(id_col).alias("__id"), toks.alias("__t")))
    prevs = F.concat(
        F.array(F.lit(START)),
        F.slice(F.col("__t"), 1,
                F.greatest(F.size("__t") - 1, F.lit(0))))
    zipped = F.when(F.size("__t") > 0,
                    F.arrays_zip(prevs.alias("p"),
                                 F.col("__t").alias("c")))
    raw = (tbase.select("__id", F.explode(zipped).alias("__pc"))
                .select("__id",
                        F.col("__pc.p").alias("__w1raw"),
                        F.col("__pc.c").alias("__w2raw")))
    return tbase, raw


def train_bigram_lm(
    ref: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
    add_k: float = 0.5,
    order: int = 2,
) -> dict:
    """Train an order-n model (default bigram; CCNet proper uses
    order=5) on the reference corpus; returns the model as a dict of
    {"unigrams": DF(w, cnt) — HISTORY counts, "bigrams": DF(w1, w2,
    cnt) — (history, next) counts, "vocab": DF(w), "v_total": int,
    "add_k": float, "order": int} — all data, no state.  The
    vocabulary window runs over the AGGREGATED word-count table
    (bounded by the reference corpus' vocabulary, not its size)."""
    if order < 2:
        raise ValueError("order must be >= 2")
    if order == 2:
        # Bigram training forms (prev, cur) pairs ARRAY-side — the same
        # zip-with-shift the scoring path uses (_raw_bigram_pairs) —
        # instead of the _history lag window, which shuffled and sorted
        # the reference corpus' ENTIRE token stream by document just to
        # read each row's neighbor (guide §2.4; at 100 TB the training
        # pass over the reference corpus dominates).  The trained tables
        # are pure COUNTS over the pair multiset, and the multiset is
        # identical (position i → (token[i-1] | <s>, token[i])), so every
        # count — and thus every downstream probability — is bit-exact.
        # The vocab map moves after pair formation: '<s>' can't collide
        # with a real token (tokens are [a-z0-9]+ runs).
        tbase, raw = _raw_bigram_pairs(ref, text_col, id_col,
                                       min_widen_bytes=64 * 1024 * 1024)
        tbase.persist()
        counts = (tbase.select(F.explode("__t").alias("__w"))
                       .groupBy("__w").agg(F.count(F.lit(1)).alias("cnt")))
        w_rank = Window.orderBy(F.col("cnt").desc(), F.col("__w"))
        vocab = (counts.withColumn("__r", F.row_number().over(w_rank))
                       .filter(F.col("__r") <= vocab_size)
                       .select(F.col("__w").alias("w")))
        v1 = F.broadcast(vocab.select(F.col("w").alias("__v1")))
        v2 = F.broadcast(vocab.select(F.col("w").alias("__v2")))
        pairs = (raw
                 .join(v2, F.col("__w2raw") == F.col("__v2"), "left")
                 .join(v1, F.col("__w1raw") == F.col("__v1"), "left")
                 .select(F.when(F.col("__w1raw") == START, F.lit(START))
                          .otherwise(F.coalesce("__v1", F.lit(UNK)))
                          .alias("w1"),
                         F.coalesce("__v2", F.lit(UNK)).alias("w2")))
    else:
        pos = _positioned(ref, text_col, id_col).persist()
        counts = pos.groupBy("__w").agg(F.count(F.lit(1)).alias("cnt"))
        w_rank = Window.orderBy(F.col("cnt").desc(), F.col("__w"))
        vocab = (counts.withColumn("__r", F.row_number().over(w_rank))
                       .filter(F.col("__r") <= vocab_size)
                       .select(F.col("__w").alias("w")))
        v = F.broadcast(vocab)
        mapped = (pos.join(v, pos["__w"] == v["w"], "left")
                     .select("__id", "__pos",
                             F.coalesce("w", F.lit(UNK)).alias("__m")))
        pairs = mapped.select(_history(order).alias("w1"),
                              F.col("__m").alias("w2"))
    bigrams = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("cnt"))
    n_docs = ref.select(F.count(F.lit(1))).first()[0]
    unigrams = (pairs.groupBy(F.col("w1").alias("w"))
                     .agg(F.count(F.lit(1)).alias("cnt")))
    # U(h) := times h appears as a HISTORY — exactly the denominator
    # base the pair probabilities condition on (includes the all-<s>
    # history = docs with >=1 token); v_total = vocab + <unk>
    n_vocab = vocab.count()
    (tbase if order == 2 else pos).unpersist()
    return {"unigrams": unigrams, "bigrams": bigrams, "vocab": vocab,
            "v_total": n_vocab + 1, "add_k": float(add_k),
            "order": int(order), "n_train_docs": int(n_docs)}


#: CCNet-shaped alias — same trainer at any order.
train_ngram_lm = train_bigram_lm


def lm_perplexity(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Score every document: (id, n_pairs, mean_log2p, perplexity).
    Lower perplexity = more reference-like; empty docs score NULL."""
    k = model["add_k"]
    v_total = model["v_total"]
    uni = model["unigrams"].select(F.col("w").alias("__uw"),
                                   F.col("cnt").alias("__ucnt"))
    bi = model["bigrams"].select(F.col("w1").alias("__b1"),
                                 F.col("w2").alias("__b2"),
                                 F.col("cnt").alias("__bcnt"))
    vocab = model["vocab"]
    if broadcast_model:
        uni, bi, vocab = F.broadcast(uni), F.broadcast(bi), \
            F.broadcast(vocab)
    order = model.get("order", 2)
    if order == 2:
        # Bigram scoring forms (prev, cur) pairs ARRAY-side — zip the
        # token array with its <s>-prepended shift — instead of the
        # _history lag window, which shuffled and sorted the ENTIRE
        # token stream by document just to read each row's neighbor.
        # The vocab map moves after pair formation (two broadcast
        # probes instead of one; '<s>' can't collide with a real token
        # — tokens are [a-z0-9]+ runs), so the only exchange left in
        # the whole scoring plan is the per-document partial aggregate.
        # Pair order within a document is the array order — the same
        # per-document position order the window produced — so the
        # mean-log2p float fold is bit-identical.
        raw = _raw_bigram_pairs(df, text_col, id_col)[1]
        v1 = vocab.select(F.col("w").alias("__v1"))
        v2 = vocab.select(F.col("w").alias("__v2"))
        if broadcast_model:
            v1, v2 = F.broadcast(v1), F.broadcast(v2)
        pairs = (raw
                 .join(v2, F.col("__w2raw") == F.col("__v2"), "left")
                 .join(v1, F.col("__w1raw") == F.col("__v1"), "left")
                 .select("__id",
                         F.when(F.col("__w1raw") == START, F.lit(START))
                          .otherwise(F.coalesce("__v1", F.lit(UNK)))
                          .alias("w1"),
                         F.coalesce("__v2", F.lit(UNK)).alias("w2")))
    else:
        pos = _positioned(df, text_col, id_col)
        mapped = (pos.join(vocab, pos["__w"] == vocab["w"], "left")
                     .select("__id", "__pos",
                             F.coalesce("w", F.lit(UNK)).alias("__m")))
        pairs = mapped.select("__id",
                              _history(order).alias("w1"),
                              F.col("__m").alias("w2"))
    joined = (pairs
              .join(bi, (F.col("w1") == F.col("__b1"))
                    & (F.col("w2") == F.col("__b2")), "left")
              .join(uni, F.col("w1") == F.col("__uw"), "left"))
    logp = F.log2(
        (F.coalesce(F.col("__bcnt"), F.lit(0)) + F.lit(k))
        / (F.coalesce(F.col("__ucnt"), F.lit(0)) + F.lit(k * v_total)))
    scored = (joined.groupBy("__id")
              .agg(F.count(F.lit(1)).alias("n_pairs"),
                   F.avg(logp).alias("mean_log2p")))
    base = df.select(F.col(id_col))
    return (base.join(scored, base[id_col] == scored["__id"], "left")
                .select(id_col,
                        F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
                        F.col("mean_log2p"),
                        F.pow(F.lit(2.0), -F.col("mean_log2p"))
                         .alias("perplexity")))
