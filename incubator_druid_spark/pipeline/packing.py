"""Sequence chunking and packing for training-data pipelines.

Three operators, in increasing order of packing quality:

* `chunk_documents` — split each document into fixed-token windows
  (optionally overlapping).  Closed-form Column expressions: one scan,
  one bounded explode (ceil(tokens/stride) rows per doc), no shuffle.
* `pack_concat` — the "concatenate the corpus, cut every seq_len tokens"
  scheme most LM training loaders use: documents are laid end-to-end in a
  deterministic order and a document lands in the sequence(s) its token
  range spans.  Closed-form: one cumulative-sum window per shard.
* `pack_greedy` — next-fit bin packing that never splits a document:
  within a shard, docs are visited in id order and a new sequence starts
  whenever the current one would overflow.  Inherently sequential per
  shard, so it runs as one Arrow-batched `applyInPandas` pass per shard —
  shard count is the parallelism knob (set it to a multiple of the
  cluster's cores; each shard's doc list streams through a single linear
  numpy loop, no quadratic work, no driver state).

All three consume a precomputed token count when the caller has one
(`token_count_col`), else count whitespace tokens scan-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.text import token_count, tokens


def _tok_count(df: DataFrame, text_col: str,
               token_count_col: str | None) -> F.Column:
    # null text (or a null precomputed count) reads as 0 tokens — a NaN
    # reaching pack_greedy's Arrow batch would crash the int64 cast
    if token_count_col is not None:
        return F.coalesce(F.col(token_count_col).cast("long"), F.lit(0))
    return F.coalesce(token_count(F.col(text_col)).cast("long"), F.lit(0))


def _shard_of(df: DataFrame, id_col: str, shards: int) -> F.Column:
    """Deterministic shard key: numeric ids shard by value (modulo —
    SQL-replayable), everything else by xxhash64 (a string id under an
    ANSI host must not go through cast-to-long, which throws there)."""
    dtype = dict(df.dtypes).get(id_col, "")
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return F.pmod(F.col(id_col).cast("long"), F.lit(shards))
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 128,
                    overlap: int = 0) -> DataFrame:
    """Split documents into fixed-token chunks with optional overlap.

    Returns (id, chunk_id, chunk_text, chunk_n_tokens); chunk_id is
    0-based, chunk i covers tokens [i*stride, i*stride + chunk_tokens)
    with stride = chunk_tokens - overlap.  Empty documents produce no
    rows.  One chunk is emitted per window start in {0, stride, 2*stride,
    ...} below the token count, so the final chunk may be shorter (and,
    with overlap, may repeat only already-covered tokens — the standard
    sliding-window contract).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    # Empty docs are dropped BEFORE tokenization with a cheap raw-text
    # probe: text RLIKE '\S' ⟺ size(tokens(text)) > 0 (a token exists
    # iff some non-whitespace char exists; null text fails both).  The
    # historical `filter(size(__toks) > 0)` was pushed below the staging
    # projection by the optimizer with the FULL split/filter pipeline
    # substituted in — tokenizing every document twice (r10, guide §1.2).
    # The staged __toks then survives as a single evaluation because
    # CollapseProject never inlines a non-cheap alias referenced more
    # than once (the chunk slice + __n).
    base = (df.filter(F.col(text_col).rlike(r"\S"))
              .select(F.col(id_col).alias("__id"), toks.alias("__toks"))
              .withColumn("__n", F.size("__toks")))
    # chunk starts: 0, stride, 2*stride, ... while start < n
    n_chunks = F.ceil(F.col("__n") / F.lit(stride)).cast("int")
    out = (base
           .select("__id", "__toks",
                   F.explode(F.sequence(F.lit(0), n_chunks - 1))
                    .alias("chunk_id"))
           .withColumn("__chunk_toks",
                       F.slice(F.col("__toks"),
                               F.col("chunk_id") * stride + 1,
                               chunk_tokens)))
    return out.select(
        F.col("__id").alias(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", "__chunk_toks").alias("chunk_text"),
        F.size("__chunk_toks").cast("long").alias("chunk_n_tokens"))


def pack_concat(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", seq_len: int = 2048,
                shards: int = 8,
                token_count_col: str | None = None) -> DataFrame:
    """Concat-and-cut packing: within a shard (hash of the id), documents
    are laid end-to-end in id order and cut every seq_len tokens.

    Returns (id, shard, n_tokens, first_seq, last_seq) — the sequence
    index range [first_seq, last_seq] the document's tokens span (a doc
    crossing a cut belongs to several sequences; zero-token docs sit on a
    boundary and span the single sequence they abut).

    Shape: one window cumulative sum per shard — the window key is the
    shard, so parallelism equals `shards`; everything stays in
    whole-stage codegen.
    """
    t = _tok_count(df, text_col, token_count_col)
    base = df.select(
        F.col(id_col).alias("__id"), t.alias("__t"),
        _shard_of(df, id_col, shards).alias("shard"))
    w = Window.partitionBy("shard").orderBy("__id")
    cum = F.sum("__t").over(w)
    return (base
            .withColumn("__end", cum)
            .withColumn("__start", F.col("__end") - F.col("__t"))
            .select(F.col("__id").alias(id_col),
                    F.col("shard").cast("long").alias("shard"),
                    F.col("__t").alias("n_tokens"),
                    F.floor(F.col("__start") / seq_len).alias("first_seq"),
                    F.floor((F.greatest(F.col("__end") - 1, F.col("__start")))
                            / seq_len).alias("last_seq")))


def pack_greedy(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", seq_len: int = 2048,
                shards: int = 8,
                token_count_col: str | None = None) -> DataFrame:
    """Next-fit packing that never splits documents: within a shard, docs
    are visited in id order; a doc opens a new sequence when adding it
    would push the current sequence past seq_len.  Docs longer than
    seq_len are truncated to seq_len (flagged via `truncated`).

    Returns (id, shard, seq_id, n_tokens, truncated) with seq_id 0-based
    per shard.

    Next-fit is order-sequential, so this is the one packing operator
    with Python in the plan: one Arrow `applyInPandas` per shard, a
    single linear pass over that shard's (id, tokens) pairs — the text
    itself never leaves the JVM.  Scale by raising `shards`.
    """
    t = _tok_count(df, text_col, token_count_col)
    base = df.select(
        F.col(id_col).alias("__id"), t.alias("__t"),
        _shard_of(df, id_col, shards).alias("shard"))

    def pack_one(pdf):
        import pandas as pd

        pdf = pdf.sort_values("__id").reset_index(drop=True)
        toks = pdf["__t"].clip(upper=seq_len)
        seq_ids = []
        seq_id, fill = 0, 0
        for tk in toks:
            if fill + tk > seq_len:
                seq_id += 1
                fill = 0
            fill += tk
            seq_ids.append(seq_id)
        return pd.DataFrame({
            "__id": pdf["__id"], "shard": pdf["shard"],
            "seq_id": pd.Series(seq_ids, dtype="int64"),
            "n_tokens": toks.astype("int64"),
            "truncated": (pdf["__t"] > seq_len),
        })

    id_type = df.schema[id_col].dataType.simpleString()
    out = base.groupBy("shard").applyInPandas(
        pack_one,
        schema=(f"__id {id_type}, shard long, seq_id long, n_tokens long, "
                "truncated boolean"))
    return out.withColumnRenamed("__id", id_col)


def materialize_sequences(df: DataFrame, packed: DataFrame,
                          id_col: str = "doc_id", text_col: str = "text",
                          separator: str = "\n\n") -> DataFrame:
    """Turn packing ASSIGNMENTS into loader-ready sequence rows: join the
    documents to a (id, shard, seq_id) assignment frame (pack_greedy
    output — or anything with those columns) and emit one row per
    sequence with the member texts concatenated in id order.

    Returns (shard, seq_id, seq_text, n_docs, n_tokens).

    Shape: one broadcast-or-shuffle join on the id + one per-(shard,
    seq_id) sort-aggregate (collect_list of (id, text) structs,
    array_sort, join) — sequence groups are bounded by seq_len, so the
    collected list per group is small by construction no matter the
    corpus size."""
    from incubator_druid_spark.pipeline.text import token_count

    asg = packed.select(F.col(id_col).alias("__id"), "shard", "seq_id")
    docs = df.select(F.col(id_col).alias("__id"),
                     F.col(text_col).alias("__text"))
    joined = docs.join(asg, "__id")
    return (joined
            .groupBy("shard", "seq_id")
            .agg(F.concat_ws(separator, F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("__id"), F.col("__text")))),
                     lambda s: s["__text"])).alias("seq_text"),
                 F.count(F.lit(1)).cast("long").alias("n_docs"))
            .withColumn("n_tokens",
                        token_count(F.col("seq_text")).cast("long")))
