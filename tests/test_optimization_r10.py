"""Pins for the r10 optimization internals (VERDICT r9 next-round list).

Every test here asserts VALUE-equivalence of a rewritten path against the
shape it replaced (or a plan property the rewrite is supposed to hold), on
tiny in-memory corpora — fast tier."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# --- 1. minhash capped candidates: pre-count feeds collect_list -------------

def _pair_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_minhash_capped_pairs_match_uncapped_join(spark):
    """The windowed pre-count path must emit exactly the pair set the
    distributed self-join emits (minus pairs from over-cap buckets, absent
    here with a high cap) — including on a corpus WITH a hot bucket."""
    from incubator_druid_spark.pipeline.dedup import minhash_lsh_candidates
    rows = [(i, "the quick brown fox jumps over the lazy dog run " + str(i % 3))
            for i in range(1, 25)]
    # near-identical cluster → hot buckets in most bands
    rows += [(100 + i, "common boilerplate header repeated everywhere exactly")
             for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_lsh_candidates(df, "doc_id", "text", max_bucket=64)
    uncapped = minhash_lsh_candidates(df, "doc_id", "text", max_bucket=0)
    assert _pair_set(capped) == _pair_set(uncapped)
    assert len(_pair_set(capped)) >= 15  # the boilerplate clique alone


def test_minhash_capped_drops_hot_bucket_before_collect(spark):
    """Plan shape: the bucket-size pre-count (a window count over
    (band, bh)) must sit BELOW the collect_list aggregation, so a hot
    bucket is dropped before its ids are ever buffered (guide §5)."""
    from incubator_druid_spark.pipeline.dedup import minhash_lsh_candidates
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = minhash_lsh_candidates(df, "doc_id", "text", max_bucket=4) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" in plan
    # the bucket-size cap is a filter on the window pre-count (__n),
    # below the collect_list aggregate — NOT a size(collect_list) filter
    assert "(__n" in plan
    w_pos = plan.index("windowspecdefinition(band")
    c_pos = plan.index("collect_list")
    # optimizedPlan prints top-down: the aggregate (collect_list) sits
    # above the window pre-count
    assert c_pos < w_pos


def test_minhash_cap_still_drops_oversized_buckets(spark):
    """A bucket above the cap contributes no pairs (the r9 contract)."""
    from incubator_druid_spark.pipeline.dedup import minhash_lsh_candidates
    rows = [(i, "common boilerplate header repeated everywhere exactly")
            for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert _pair_set(
        minhash_lsh_candidates(df, "doc_id", "text", max_bucket=4)) == set()


# --- 2. bigram LM training: array-side pairs == lag-window pairs ------------

def test_train_bigram_lm_counts_match_window_form(spark):
    """The r10 zip-with-shift trainer must produce bit-identical count
    tables to the historical lag()-window form (re-derived inline here)."""
    from incubator_druid_spark.pipeline.lm import (START, UNK,
                                                   train_bigram_lm)
    from incubator_druid_spark.pipeline.text import normalize_text, tokens
    from pyspark.sql import Window
    rows = [(1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, ""), (4, None),
            (5, "a b a b a unseen-word the")]
    ref = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_bigram_lm(ref, vocab_size=4, add_k=0.5)

    # legacy shape: posexplode + vocab map + lag window
    toks = tokens(normalize_text(F.col("text")))
    pos = (ref.select(F.col("doc_id").alias("__id"), toks.alias("__t"))
              .select("__id", F.posexplode("__t").alias("__pos", "__w")))
    counts = pos.groupBy("__w").agg(F.count(F.lit(1)).alias("cnt"))
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("__w"))
    vocab = (counts.withColumn("__r", F.row_number().over(w_rank))
                   .filter(F.col("__r") <= 4).select(F.col("__w").alias("w")))
    mapped = (pos.join(F.broadcast(vocab), pos["__w"] == vocab["w"], "left")
                 .select("__id", "__pos",
                         F.coalesce("w", F.lit(UNK)).alias("__m")))
    hist = F.lag("__m", 1, START).over(
        Window.partitionBy("__id").orderBy("__pos"))
    pairs = mapped.select(hist.alias("w1"), F.col("__m").alias("w2"))
    exp_bi = {(r["w1"], r["w2"]): r["cnt"] for r in
              pairs.groupBy("w1", "w2").agg(
                  F.count(F.lit(1)).alias("cnt")).collect()}
    exp_uni = {r["w"]: r["cnt"] for r in
               pairs.groupBy(F.col("w1").alias("w")).agg(
                   F.count(F.lit(1)).alias("cnt")).collect()}

    got_bi = {(r["w1"], r["w2"]): r["cnt"]
              for r in model["bigrams"].collect()}
    got_uni = {r["w"]: r["cnt"] for r in model["unigrams"].collect()}
    assert got_bi == exp_bi
    assert got_uni == exp_uni
    assert model["v_total"] == 5  # 4 vocab + <unk>


def test_lm_pipeline_has_no_token_stream_window(spark):
    """VERDICT r9 #4 done-criterion: no Window over the token stream
    anywhere in the lm plan (train + score)."""
    from incubator_druid_spark.pipeline.lm import (lm_perplexity,
                                                   train_bigram_lm)
    ref = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog ran")], "doc_id long, text string")
    model = train_bigram_lm(ref, vocab_size=10)
    scored = lm_perplexity(ref, model)
    plan = scored._jdf.queryExecution().optimizedPlan().toString()
    # the single remaining window is the vocab row_number over the
    # AGGREGATED word-count table (bounded by vocabulary size, fine);
    # no lag() over per-document token positions may remain
    assert "lag(" not in plan


# --- 3. analyze(): staged metrics == direct Column formulas -----------------

def test_analyze_matches_column_formulas(spark):
    from incubator_druid_spark.pipeline.text import (analyze, char_count,
                                                     fingerprint,
                                                     language_id,
                                                     mean_word_length,
                                                     punct_ratio,
                                                     quality_score,
                                                     stopword_ratio,
                                                     token_count)
    rows = [(1, "The cat sat on the mat, with the dog!"),
            (2, "le chat est dans la maison pour le diner"),
            (3, "der hund ist ein guter hund und das ist gut"),
            (4, ""), (5, None),
            (6, "el perro y el gato en la casa por la noche"),
            (7, "zzz qqq xxx"),
            (8, "a  b\t c\nd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = analyze(df).orderBy("doc_id").collect()
    t = F.col("text")
    exp = (df.withColumn("n_tokens", token_count(t))
             .withColumn("punct_ratio", punct_ratio(t))
             .withColumn("stopword_ratio", stopword_ratio(t))
             .withColumn("mean_word_len", mean_word_length(t))
             .withColumn("quality", quality_score(t))
             .withColumn("lang_pred", language_id(t))
             .withColumn("n_chars_measured", char_count(t))
             .withColumn("fingerprint", fingerprint(t))
             .orderBy("doc_id").collect())
    for g, e in zip(got, exp):
        for c in ("n_tokens", "punct_ratio", "stopword_ratio",
                  "mean_word_len", "quality", "lang_pred",
                  "n_chars_measured", "fingerprint"):
            assert g[c] == e[c], (g["doc_id"], c, g[c], e[c])


def test_analyze_single_tokenization_in_plan(spark):
    """VERDICT r9 #6 done-criterion: ONE raw and ONE lowered tokenization
    in the analyze plan (the split appears once per staging column), not
    one per signal."""
    from incubator_druid_spark.pipeline.text import analyze
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = analyze(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 2  # __rt + __lt, nothing else


# --- 4. dim-memo staleness guard ---------------------------------------------

def test_all_dim_memo_reprobes_on_inplace_mutation(spark, tmp_path):
    """VERDICT r9 #8: overwriting the parquet under the SAME path must not
    serve a stale uniformity verdict."""
    from incubator_druid_spark.pipeline import similarity as S
    p = str(tmp_path / "vecs.parquet")
    spark.createDataFrame([(1, [1.0, 2.0]), (2, [3.0, 4.0])],
                          "vec_id long, embedding array<double>") \
         .write.mode("overwrite").parquet(p)
    df1 = spark.read.parquet(p)
    assert S._all_dim(df1, "embedding", 2) is True
    # in-place replacement with a RAGGED corpus under the same path
    spark.createDataFrame([(1, [1.0, 2.0, 3.0]), (2, [3.0, 4.0])],
                          "vec_id long, embedding array<double>") \
         .write.mode("overwrite").parquet(p)
    df2 = spark.read.parquet(p)
    assert S._all_dim(df2, "embedding", 2) is False


# --- 5. chain-SQL parse memo --------------------------------------------------

def test_memo_expr_reuses_parsed_column(spark):
    from incubator_druid_spark.pipeline.similarity import (_CHAIN_MEMO,
                                                           _memo_expr)
    sql = "0.0D + (`x`[0] * `x`[0])"
    c1 = _memo_expr(spark, sql)
    c2 = _memo_expr(spark, sql)
    assert c1 is c2
    assert (spark, sql) in _CHAIN_MEMO
    # the memoized Column is reusable across frames
    df = spark.createDataFrame([([2.0],)], "x array<double>")
    assert df.select(c1.alias("v")).first()["v"] == 4.0


# --- 6. jaccard union arithmetic: |A∪B| = |A|+|B|−|A∩B| -----------------------

def test_jaccard_union_arithmetic_matches_array_union(spark):
    """The verify-stage jaccard now computes the union size arithmetically
    (the __sh arrays are distinct-element sets, and the form matches the
    DuckDB oracle's `x / (sa.n + sb.n - x)` term for term).  Re-derive the
    replaced size(array_union(...)) denominator over the SAME pairs and
    assert bit-equality — including zero-overlap and near-identical pairs."""
    from incubator_druid_spark.pipeline.dedup import minhash_dedup, shingles

    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),   # near-dup of 1
            (3, "totally different words with zero shared grams here"),
            (4, "alpha beta gamma delta epsilon zeta eta theta")]   # exact dup of 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in minhash_dedup(df, "doc_id", "text",
                                  threshold=0.1).collect()}
    assert got, "expected at least the near/exact dup pairs"

    # legacy denominator, re-derived inline over the raw shingle-hash sets
    from incubator_druid_spark.pipeline.dedup import shingle_hash64
    sh = df.select(F.col("doc_id"),
                   F.transform(shingles(F.col("text"), 3),
                               shingle_hash64).alias("sh"))
    legacy = (sh.alias("a").crossJoin(sh.alias("b"))
              .filter(F.col("a.doc_id") < F.col("b.doc_id"))
              .select(F.col("a.doc_id").alias("id_a"),
                      F.col("b.doc_id").alias("id_b"),
                      (F.size(F.array_intersect("a.sh", "b.sh"))
                       / F.size(F.array_union("a.sh", "b.sh"))).alias("j")))
    legacy_map = {(r["id_a"], r["id_b"]): r["j"] for r in legacy.collect()}
    for pair, j in got.items():
        assert legacy_map[pair] == j, (pair, legacy_map[pair], j)
    # exact dup scores 1.0, zero-overlap pairs never pass the threshold
    assert got[(1, 4)] == 1.0
    assert all(3 not in pair for pair in got)


def test_ngram_jaccard_union_arithmetic(spark):
    """Same identity on the string-set brute-force path (exact: shingles()
    ends in array_distinct, so the arrays are sets by construction)."""
    from incubator_druid_spark.pipeline.dedup import ngram_jaccard
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g"), (3, "x y z w v u"),
         (4, None), (5, "q r")],  # null text and under-n-token edge cases
        "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard(df, df, "doc_id", "text", n=3).collect()}
    # doc 1 vs 2: grams {abc,bcd,cde,def} vs {abc,bcd,cde,deg} → 3/5
    assert abs(out[(1, 2)] - 0.6) < 1e-12
    assert out[(1, 3)] == 0.0          # disjoint
    assert out[(4, 5)] == 0.0          # empty vs empty → guard, not NaN
    assert out[(1, 1)] == 1.0          # self


# --- 7. c4_clean line-pipeline staging ----------------------------------------

def test_c4_clean_matches_inline_form(spark):
    """c4_clean's staged line pipeline must be value-identical to the
    historical inline Column composition (re-derived here), including
    null text, empty pages, and the flag/keep interactions."""
    from incubator_druid_spark.pipeline.text import c4_clean

    rows = [
        (1, "A good sentence here today. Another fine line follows now.\n"
            "short one.\nno terminal punctuation in this line at all\n"
            "This closing line has plenty of words and ends properly!"),
        (2, "some {code} block with enough words to pass the filter."),
        (3, "lorem ipsum dolor sit amet consectetur adipiscing elit sed."),
        (4, None),
        (5, ""),
        (6, 'A quoted ending line with enough words right here."'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cols = ["doc_id", "clean_text", "n_lines_kept", "n_lines_dropped",
            "n_sentences", "has_curly_brace", "has_lorem_ipsum", "c4_keep"]
    got = {r["doc_id"]: tuple(r[c] for c in cols)
           for r in c4_clean(df).select(cols).collect()}

    # legacy inline form (pre-r10 §16 shape), same formulas
    t = F.col("text")
    lines = F.coalesce(
        F.filter(F.transform(F.split(t, "\n", -1), lambda l: F.trim(l)),
                 lambda l: l != ""),
        F.array().cast("array<string>"))
    kept = F.filter(
        lines,
        lambda l: l.rlike(r'[.!?"]$') &
        (F.size(F.filter(F.split(l, r"\s+"), lambda w: w != "")) >= 5))
    clean = F.array_join(kept, "\n")
    n_sent = F.size(F.split(clean, r"[.!?]", -1)) - 1
    legacy = (df
              .withColumn("clean_text", clean)
              .withColumn("n_lines_kept", F.size(kept).cast("long"))
              .withColumn("n_lines_dropped",
                          (F.size(lines) - F.size(kept)).cast("long"))
              .withColumn("n_sentences", n_sent.cast("long"))
              .withColumn("has_curly_brace",
                          F.coalesce(t.contains("{"), F.lit(False)))
              .withColumn("has_lorem_ipsum",
                          F.coalesce(F.lower(t).contains("lorem ipsum"),
                                     F.lit(False)))
              .withColumn("c4_keep",
                          (F.col("n_sentences") >= 3)
                          & ~F.col("has_curly_brace")
                          & ~F.col("has_lorem_ipsum")))
    want = {r["doc_id"]: tuple(r[c] for c in cols)
            for r in legacy.select(cols).collect()}
    assert got == want


def test_c4_clean_single_line_filter_in_plan(spark):
    """The kept-lines filter (the rlike) must appear ONCE in the optimized
    plan — the pre-staging form inlined it into four output columns."""
    from incubator_druid_spark.pipeline.text import c4_clean
    df = spark.createDataFrame([(1, "a line that ends well today.")],
                               "doc_id long, text string")
    plan = c4_clean(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("RLIKE") + plan.count("rlike") == 1, plan


# --- 8. parse_urls output staging ----------------------------------------------

def _legacy_parse_urls(df):
    """The pre-r10 inline composition of parse_urls, re-derived."""
    from incubator_druid_spark.pipeline.urls import (
        canonicalize_url, registrable_domain, url_dedup_key, url_host,
        url_path, url_query, url_scheme)
    u = F.col("url")
    host = url_host(u)
    return (df
            .withColumn("scheme", url_scheme(u))
            .withColumn("host", host)
            .withColumn("domain", registrable_domain(host))
            .withColumn("path", url_path(u))
            .withColumn("query", url_query(u))
            .withColumn("canonical_url", canonicalize_url(u))
            .withColumn("url_key", url_dedup_key(u)))


def test_parse_urls_matches_inline_form(spark):
    from incubator_druid_spark.pipeline.urls import parse_urls
    rows = [
        (1, "HTTP://Example.COM:80/a/b?utm_source=x&z=1&a=2#frag"),
        (2, "https://sub.shop.co.uk:443/"),
        (3, "https://192.168.0.1/x?fbclid=abc"),
        (4, "not a url"),
        (5, None),
        (6, "ftp://files.example.org:21/pub?b=2&a=1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    cols = ["doc_id", "scheme", "host", "domain", "path", "query",
            "canonical_url", "url_key"]
    got = {r["doc_id"]: tuple(r[c] for c in cols)
           for r in parse_urls(df).select(cols).collect()}
    want = {r["doc_id"]: tuple(r[c] for c in cols)
            for r in _legacy_parse_urls(df).select(cols).collect()}
    assert got == want
    assert got[1][6] == "http://example.com/a/b?a=2&z=1"  # canonical contract
    assert got[4][6] is None and got[4][7] is None        # unparseable


def test_parse_urls_fewer_regex_matches_than_inline(spark):
    """Staging must strictly reduce URL_RE evaluations in the optimized
    plan (the legacy form re-ran the full canonicalization inside
    url_key and re-derived host inside domain)."""
    from incubator_druid_spark.pipeline.urls import parse_urls
    df = spark.createDataFrame([(1, "https://a.example.com/x?b=1")],
                               "doc_id long, url string")
    new_plan = parse_urls(df)._jdf.queryExecution().optimizedPlan().toString()
    old_plan = _legacy_parse_urls(df)._jdf.queryExecution() \
                                     .optimizedPlan().toString()
    assert new_plan.count("regexp_extract") < old_plan.count("regexp_extract")
    # url_key must hash the staged attribute, not re-canonicalize
    assert new_plan.count("xxhash64") == 1


def test_staged_operators_run_on_streams(spark, tmp_path):
    """parse_urls and c4_clean must stay stream-capable after staging:
    the staged columns are plain deterministic aliases (kept from
    inlining by CollapseProject's non-cheap multi-reference rule), NOT
    monotonically_increasing_id pins (rejected by the streaming
    checker)."""
    import json

    from incubator_druid_spark.pipeline.text import c4_clean
    from incubator_druid_spark.pipeline.urls import parse_urls
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.json").write_text(json.dumps(
        {"doc_id": 1, "url": "https://A.com/x?utm_a=1&b=2",
         "text": "A full sentence with enough words to keep here."}) + "\n")
    src = spark.readStream.schema(
        "doc_id long, url string, text string").json(str(d))
    for name, frame in [("urls_pin_stream", parse_urls(src)),
                        ("c4_pin_stream", c4_clean(src))]:
        q = (frame.writeStream.format("memory").queryName(name)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
    u = spark.sql("SELECT canonical_url FROM urls_pin_stream").first()
    assert u["canonical_url"] == "https://a.com/x?b=2"
    c = spark.sql("SELECT n_lines_kept FROM c4_pin_stream").first()
    assert c["n_lines_kept"] == 1


def test_truncate_to_tokens_staged_matches_inline(spark):
    from incubator_druid_spark.pipeline.text import tokens, truncate_to_tokens
    df = spark.createDataFrame(
        [(1, "one two  three   four five"), (2, "a b"), (3, None), (4, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["text_truncated"], r["was_truncated"])
           for r in truncate_to_tokens(df, 3).collect()}
    toks = tokens(F.col("text"))
    legacy = df.select(
        "doc_id",
        F.when(F.col("text").isNull(), F.lit(None).cast("string"))
         .otherwise(F.array_join(F.slice(toks, 1, 3), " "))
         .alias("text_truncated"),
        F.coalesce(F.size(toks) > 3, F.lit(False)).alias("was_truncated"))
    want = {r["doc_id"]: (r["text_truncated"], r["was_truncated"])
            for r in legacy.collect()}
    assert got == want
    assert got[1] == ("one two three", True)
    assert got[3] == (None, False)
    # the tokenizing split must appear ONCE in the optimized plan
    plan = truncate_to_tokens(df, 3)._jdf.queryExecution() \
                                    .optimizedPlan().toString()
    assert plan.count("split(") == 1, plan
