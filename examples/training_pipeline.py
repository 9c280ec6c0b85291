"""Training-data pipeline end-to-end: the operators a 100 TB corpus curation
job runs, on the synthetic documents/embeddings tables.

    python examples/training_pipeline.py [sf_dir]

Stages (each one scan/shuffle-disciplined — see module docstrings):
  1. text analysis: token counts, quality score, language ID, fingerprint
  2. quality + language filter (the cheap pre-filter pass)
  3. exact + fingerprint dedup
  4. MinHash-LSH near-dup pairs with exact-Jaccard verification
  5. embedding ANN: brute-force top-k baseline vs IVF (partition-pruned)
  6. near-dup pairs in embedding space (hyperplane LSH + cosine verify)
  7. near-dup groups (connected components) → keep one per group
  8. stratified sampling
  9. per-source top terms
  10. rule-based curation: Gopher flags, C4 cleaning, repetition signals
  11. PII scrub (counts, then precedence-ordered redaction)
  12. repeated-substring (ExactSubstr) spans + cleaning
  13. benchmark decontamination (eval grams broadcast)
  14. chunking + sequence packing for the training loader
  15. weighted corpus mixture (per-source epochs)
  16. set-to-set kNN join
  17. crawl front door: HTML extraction + link-density boilerplate flags
  18. chat transcripts: turns, loss-mask spans, shape report
  19. model-based quality scoring (hashed linear classifier)
  20. fuzzy decontamination (MinHash vs the eval corpus)
  21. corpus profile + token-budget truncation
  22. z-order layout for multi-dimension file skipping
  23. bigram-LM perplexity filter (CCNet-style, trained in two groupBys)
  24. text embedding (pluggable batch model) feeding the kNN join
  25. masked SFT sequences (packed conversations + loss-mask spans)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from incubator_druid_spark import Catalog, get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark).register_dir(sf_dir)
    docs = cat.table("documents")
    emb = cat.table("embeddings")

    print("== 1. text analysis (single pass, all JVM-side expressions)")
    from incubator_druid_spark.pipeline.text import analyze
    analyzed = analyze(docs).cache()
    analyzed.select("doc_id", "n_tokens", "quality", "lang_pred").show(5)

    print("== 2. quality/language filter")
    kept = analyzed.filter((F.col("quality") > 0.5)
                           & (F.col("lang_pred") == "en"))
    print(f"kept {kept.count()} / {analyzed.count()} docs")

    print("== 3. exact + fingerprint dedup")
    from incubator_druid_spark.pipeline.dedup import (exact_dedup,
                                                      fingerprint_dedup)
    print("exact-unique:", exact_dedup(docs, ["text"], "doc_id").count())
    print("fingerprint-unique:",
          fingerprint_dedup(docs, "text", "doc_id").count())

    print("== 4. MinHash-LSH near-dups (bucket-capped, Jaccard-verified)")
    from incubator_druid_spark.pipeline.dedup import minhash_dedup
    pairs = minhash_dedup(docs, "doc_id", "text", threshold=0.7)
    pairs.orderBy(F.col("jaccard").desc()).show(5)

    print("== 5. ANN: brute-force vs IVF top-10 for one query vector")
    from incubator_druid_spark.pipeline.similarity import (ann_ivf_topk,
                                                           cosine_topk)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    rest = emb.filter(F.col("vec_id") != 0)
    exact = cosine_topk(rest, qvec, k=10)
    approx = ann_ivf_topk(rest, qvec, k=10, n_clusters=8, nprobe=3)
    hits = (exact.select("vec_id")
            .intersect(approx.select("vec_id")).count())
    print(f"IVF recall@10 vs exact: {hits}/10")

    print("== 6. embedding-space near-dup pairs (hyperplane LSH)")
    from incubator_druid_spark.pipeline.similarity import \
        embedding_near_dup_pairs
    embedding_near_dup_pairs(emb, threshold=0.4).show(5)

    print("== 7. near-dup GROUPS (connected components) → keep one per group")
    from incubator_druid_spark.pipeline.dedup import (connected_components,
                                                      dedup_by_groups)
    groups = connected_components(pairs.select("id_a", "id_b"))
    n_groups = groups.select("group_id").distinct().count()
    print(f"{groups.count()} near-dup docs in {n_groups} groups")
    deduped = dedup_by_groups(kept, groups, "doc_id")
    print(f"after group-dedup: {deduped.count()} docs")

    print("== 8. stratified sample (20/source, deterministic md5 order)")
    from incubator_druid_spark.pipeline.sampling import stratified_sample
    sample = stratified_sample(deduped, "source", "doc_id", 20)
    sample.groupBy("source").count().orderBy("source").show()

    print("== 9. per-source top terms")
    from incubator_druid_spark.pipeline.text import top_terms
    top_terms(docs, "source", k=3).orderBy("source", "rank").show(9)

    print("== 10. rule-based curation: Gopher flags + C4 cleaning + "
          "repetition")
    from incubator_druid_spark.pipeline.text import (c4_clean,
                                                     gopher_quality,
                                                     repetition_stats)
    gq = gopher_quality(docs)
    print("gopher-pass:",
          gq.filter("gopher_pass").count(), "/", gq.count())
    c4 = c4_clean(docs)
    c4.select("doc_id", "n_lines_kept", "n_lines_dropped", "c4_keep") \
      .show(5)
    repetition_stats(docs).orderBy(
        F.col("top_bigram_char_frac").desc()).show(5)

    print("== 11. PII scrub (counts, then precedence-ordered redaction)")
    from incubator_druid_spark.pipeline.text import pii_counts, redact_pii
    flagged = pii_counts(docs).filter(
        "n_email + n_ssn + n_ipv4 + n_phone > 0")
    print("docs with PII hits:", flagged.count())
    redact_pii(docs).select("doc_id", "redacted_text").show(2, truncate=60)

    print("== 12. repeated-substring (ExactSubstr) spans + cleaning")
    from incubator_druid_spark.pipeline.dedup import (repeated_ngram_spans,
                                                      strip_repeated_spans)
    spans = repeated_ngram_spans(docs, "doc_id", "text", n=8)
    spans.orderBy(F.col("repeated_starts").desc()).show(5)
    cleaned = strip_repeated_spans(docs, "doc_id", "text", n=8)
    cleaned.agg(F.sum("removed_tokens").alias("tokens_removed")).show()

    print("== 13. benchmark decontamination (eval grams broadcast)")
    from incubator_druid_spark.pipeline.decontaminate import decontaminate
    ev = docs.filter(F.col("doc_id") % 50 == 0)   # stand-in benchmark set
    train = docs.filter(F.col("doc_id") % 50 != 0)
    dec = decontaminate(train, ev, n=8)
    dec.filter("contaminated_grams > 0").show(5)

    print("== 14. chunk + pack for the training loader")
    from incubator_druid_spark.pipeline.packing import (chunk_documents,
                                                        pack_concat,
                                                        pack_greedy)
    print("128-token chunks:",
          chunk_documents(docs, chunk_tokens=128).count())
    pack_concat(docs, seq_len=512, shards=4) \
        .agg(F.max("last_seq").alias("sequences_per_shard_max")).show()
    pg = pack_greedy(docs, seq_len=512, shards=4)
    pg.groupBy("shard").agg(
        F.max("seq_id").alias("seqs"),
        F.sum("n_tokens").alias("tokens")).orderBy("shard").show()

    print("== 15. weighted mixture (2x one source, half another)")
    from incubator_druid_spark.pipeline.sampling import weighted_mixture
    mix = weighted_mixture(docs, {"src0": 2.0, "src1": 0.5},
                           "source", "doc_id")
    mix.groupBy("source").count().orderBy("source").show(5)

    print("== 16. set-to-set kNN join (every query's top-3 neighbors)")
    from incubator_druid_spark.pipeline.similarity import knn_join
    knn = knn_join(emb.filter(F.col("vec_id") >= 5),
                   emb.filter(F.col("vec_id") < 5), k=3)
    knn.orderBy("q_id", "rank").show(9)

    print("== 17. crawl front door: HTML wrap -> extract text + "
          "link-density boilerplate flags")
    from incubator_druid_spark.pipeline.html import html_stats
    pages = docs.select("doc_id", F.concat(
        F.lit("<html><body><p>"), F.col("text"),
        F.lit('</p><a href="/n">nav</a></body></html>')).alias("html"))
    html_stats(pages).select("doc_id", "n_links", "text_chars",
                             "link_density", "is_boilerplate").show(3)

    print("== 18. chat transcripts: turns, loss-mask spans, shape report")
    from incubator_druid_spark.pipeline.chat import chat_spans, chat_stats
    convs = docs.limit(3).select("doc_id", F.concat(
        F.lit("user: "), F.substring("text", 1, 40),
        F.lit("\n\nassistant: "), F.substring("text", 41, 40))
        .alias("text"))
    chat_spans(convs).show(6)
    chat_stats(convs).show(3)

    print("== 19. model-based quality score (hashed linear classifier, "
          "weights broadcast)")
    from incubator_druid_spark.pipeline.score import linear_quality_score
    w = spark.range(256).select(
        F.col("id").alias("bucket"),
        ((F.col("id") % 11 - 5) / F.lit(32.0)).alias("weight"))
    linear_quality_score(docs, w, dim=256).orderBy("doc_id").show(3)

    print("== 20. FUZZY decontamination (MinHash vs the eval corpus — "
          "catches paraphrased leaks)")
    from incubator_druid_spark.pipeline.decontaminate import (
        decontaminate_fuzzy)
    ev = (docs.filter(F.col("doc_id") % 17 == 0)
              .select(F.col("doc_id").alias("eval_id"),
                      F.substring("text", 1, 150).alias("text")))
    fz = decontaminate_fuzzy(docs, ev, eval_id_col="eval_id",
                             threshold=0.4)
    fz.filter(F.col("n_matches") > 0).orderBy("doc_id").show(5)

    print("== 21. corpus profile + token-budget truncation")
    from incubator_druid_spark.pipeline.text import (corpus_profile,
                                                     truncate_to_tokens)
    corpus_profile(docs).orderBy("source", "lang").show(5)
    truncate_to_tokens(docs, 32).select(
        "doc_id", "was_truncated",
        F.length("text_truncated").alias("cut_chars")).show(3)

    print("== 22. z-order layout: cluster orders on (custkey, price) "
          "for two-dimension file skipping")
    from incubator_druid_spark.sources.layout import cluster_by_zorder
    orders = cat.table("orders")
    zed = cluster_by_zorder(orders, ["o_custkey", "o_totalprice"],
                            bits=8, num_partitions=8)
    print(f"   clustered into {zed.rdd.getNumPartitions()} "
          "tight-bbox partitions")

    print("== 23. bigram-LM perplexity filter (CCNet-style)")
    from incubator_druid_spark.pipeline.lm import (lm_perplexity,
                                                   train_bigram_lm)
    lm = train_bigram_lm(docs.filter(F.col("doc_id") % 3 == 0),
                         vocab_size=300)
    lm_perplexity(docs, lm).orderBy("perplexity").show(3)

    print("== 24. text embedding (hash-projection default model) "
          "-> kNN join")
    from incubator_druid_spark.pipeline.embed import embed_text
    vecs = (embed_text(docs.limit(20), dim=16)
            .withColumnRenamed("doc_id", "vec_id"))
    knn_join(vecs, vecs.limit(3), k=2, id_col="vec_id") \
        .orderBy("q_id", "rank").show(6)

    print("== 25. masked SFT sequences: packed conversations with "
          "loss-mask spans")
    from incubator_druid_spark.pipeline.chat import (
        chat_spans, materialize_masked_sequences)
    asg = convs.select("doc_id",
                       (F.col("doc_id") % 2).alias("shard"),
                       F.lit(0).alias("seq_id"))
    masked = materialize_masked_sequences(chat_spans(convs), asg)
    masked.select("shard", "seq_id", "n_convs", "train_chars",
                  F.size("mask_spans").alias("n_spans")).show()

    print("done.")


if __name__ == "__main__":
    main()
