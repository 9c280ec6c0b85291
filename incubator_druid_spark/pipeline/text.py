"""Text analysis operators for large-scale training-data pipelines.

All operators are pure Column expressions (no UDFs): tokenization, counting,
quality scoring, language ID and fingerprinting run inside whole-stage codegen
and scale linearly with partitions — at 100 TB the plan is a single scan +
projection per operator, no shuffle at all unless the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword marker sets for the n-gram/stopword heuristic
# language-ID (public knowledge; tiny on purpose — they ride along as plan
# literals, no broadcast needed).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with", "for", "was"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "dans", "pour"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "mit", "von", "nicht"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "es", "en", "por"],
}

_BPE_ISH_RE = r"[A-Za-z]+|\d|[^\sA-Za-z\d]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    # greatest(_, 0) normalizes the null-text reading across session
    # modes: size(null) is -1 with ANSI off and null with ANSI on — a
    # null document counts 0 tokens either way
    return F.greatest(F.size(tokens(text)), F.lit(0))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored count: alpha runs + single digits + punctuation marks,
    approximating subword tokenizers' behavior on digits/punct."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_ISH_RE), 0))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n > 0, p / n).otherwise(F.lit(0.0))


def _marker_hits(toks: Column, words: list[str]) -> Column:
    """Count tokens appearing in the marker set.  NOTE: the lambda must take
    exactly one parameter — PySpark derives HOF arity from the Python
    signature, so closing over `markers` via a default arg would silently bind
    it to the element *index*."""
    markers = F.array(*[F.lit(w) for w in words])

    def contains(t):
        return F.array_contains(markers, t)

    return F.size(F.filter(toks, contains))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(text))
    hits = _marker_hits(toks, _LANG_MARKERS[lang])
    n = F.size(toks)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] heuristic quality score: favors moderate length,
    word-like tokens, some stopwords, low punctuation density — the standard
    cheap pre-filter shape for web-scale corpora."""
    n_tok = token_count(text).cast("double")
    length_score = F.least(n_tok / 100.0, F.lit(1.0))
    sw = stopword_ratio(text)
    sw_score = F.least(sw * 5.0, F.lit(1.0))
    pr = punct_ratio(text)
    punct_score = F.greatest(F.lit(0.0), 1.0 - pr * 4.0)
    mwl = mean_word_length(text)
    word_score = F.when((mwl >= 2.5) & (mwl <= 10.0), 1.0).otherwise(0.3)
    return (length_score * 0.3 + sw_score * 0.3 + punct_score * 0.2
            + word_score * 0.2)


def language_id(text: Column) -> Column:
    """Stopword-marker language ID: argmax over per-language marker hits.
    Unknown when nothing matches."""
    toks = tokens(F.lower(text))
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    # build an argmax chain; langs is small and fixed so this unrolls in codegen
    for lang, words in _LANG_MARKERS.items():
        hits = _marker_hits(toks, words)
        better = hits > best_hits
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, hits).otherwise(best_hits)
    return best_lang


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip punctuation,
    collapse whitespace.

    One regex pass: a maximal run of non-[a-z0-9] chars (punctuation and
    whitespace alike) becomes a single space, then trim — provably the
    same output as the historical two-pass form (replace [^a-z0-9\\s]
    with " ", then collapse \\s+), since both yield the [a-z0-9]+ tokens
    joined by single spaces.  The single pass measures ~2.8x faster on
    the 500k-doc corpus (the per-char class match built a punct-wide
    intermediate string the run form never materializes)."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))


def fingerprint(text: Column) -> Column:
    """64-bit document fingerprint of the normalized text (xxhash64 — a
    rolling-hash-class content id, stable across partitioning)."""
    return F.xxhash64(normalize_text(text))


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection: adds token/char counts, ratios,
    quality, language and fingerprint columns.

    Tokenization is staged ONCE per row (r10, guide §1.2 — the
    gopher_quality treatment): the raw and lowercased token arrays, and
    the per-language marker-hit counts, become pinned staging columns the
    signal expressions reference as per-row ATTRIBUTES.  The historical
    Column-composition form re-derived `tokens(text)` inside every signal
    (HOFs are CodegenFallback with no subexpression reuse) and the
    language_id argmax chain additionally nested each language's hit
    expression into every later branch — the lowered split ran 10+ times
    per row.  Values are bit-identical: pure common-subexpression
    factoring, the same expressions over the same rows.

    NOTE: the staging pin is non-deterministic, so NO downstream filter
    (even on an untouched partition/date column) pushes below it to the
    scan — apply scan-prunable filters BEFORE analyze()."""
    t = F.col(text_col)

    def _pin(col: Column) -> Column:
        return F.when(F.monotonically_increasing_id() >= -1, col)

    staged = (df
              .withColumn("__rt", _pin(tokens(t)))
              .withColumn("__lt", _pin(tokens(F.lower(t)))))
    for lang, words in _LANG_MARKERS.items():
        staged = staged.withColumn(f"__h_{lang}",
                                   _marker_hits(F.col("__lt"), words))
    rt, lt = F.col("__rt"), F.col("__lt")
    n_tok = F.greatest(F.size(rt), F.lit(0))
    hits_en = F.col("__h_en")
    n_low = F.size(lt)
    sw = F.when(n_low > 0, hits_en / n_low).otherwise(F.lit(0.0))
    total_len = F.aggregate(rt, F.lit(0), lambda acc, w: acc + F.length(w))
    mwl = F.when(F.size(rt) > 0, total_len / F.size(rt)) \
           .otherwise(F.lit(0.0))
    pr = punct_ratio(t)
    # quality_score's composite, over the staged metrics (same formula)
    length_score = F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
    sw_score = F.least(sw * 5.0, F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), 1.0 - pr * 4.0)
    word_score = F.when((mwl >= 2.5) & (mwl <= 10.0), 1.0).otherwise(0.3)
    quality = (length_score * 0.3 + sw_score * 0.3 + punct_score * 0.2
               + word_score * 0.2)
    # language_id's first-in-order strict-> argmax, over staged hit counts
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in _LANG_MARKERS:
        hits = F.col(f"__h_{lang}")
        better = hits > best_hits
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, hits).otherwise(best_hits)
    return (staged
            .withColumn("n_tokens", n_tok)
            .withColumn("n_bpe_tokens", bpe_ish_token_count(t))
            .withColumn("n_chars_measured", char_count(t))
            .withColumn("punct_ratio", pr)
            .withColumn("stopword_ratio", sw)
            .withColumn("mean_word_len", mwl)
            .withColumn("quality", quality)
            .withColumn("lang_pred", best_lang)
            .withColumn("fingerprint", fingerprint(t))
            .drop("__rt", "__lt", *[f"__h_{lang}" for lang in _LANG_MARKERS]))


# PII patterns, deliberately in the Java-regex ∩ RE2 subset (no lookaround,
# no backreferences) so the same pattern text runs verbatim in Spark and in
# SQL oracles.  Redaction order matters: emails first (their local parts can
# contain digit runs a phone pattern would eat), then SSNs, then IPv4 (dots
# disambiguate), then the broad phone pattern last.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\b\d[\d() -]{6,12}\d\b", "[PHONE]"),
]


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts (n_email, n_ssn, n_ipv4, n_phone), each
    counted independently over the ORIGINAL text (overlapping categories —
    an SSN also matching the phone shape — count in both; redact_pii is
    the one that resolves precedence).  Pure regexp_count projections —
    scan-speed, no shuffle."""
    out = df
    for kind, pat, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}",
            F.coalesce(F.regexp_count(F.col(text_col), F.lit(pat)),
                       F.lit(0)).cast("long"))
    return out


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted_text") -> DataFrame:
    """Replace PII spans with typed placeholder tokens, applying the
    PII_PATTERNS precedence order (email → ssn → ipv4 → phone) so the
    broad phone pattern never eats the structured forms.  Placeholders
    contain no digits or '@', so later passes cannot re-match earlier
    redactions.  One chained regexp_replace projection — scan-speed."""
    t = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        t = F.regexp_replace(t, pat, token)
    return df.withColumn(out_col, t)


# Unicode script ranges as EXPLICIT codepoint classes — identical pattern
# text in Java regex and RE2 (named script classes spell differently per
# engine: Java \p{IsCyrillic} vs RE2 \p{Cyrillic}), so the same strings run
# in Spark and SQL oracles.  Coarse, deliberately: the major blocks only.
SCRIPT_RANGES = [
    # À-Ö Ø-ö ø-ɏ skips U+00D7 (×) and U+00F7 (÷) — the two non-letter
    # codepoints inside Latin-1 Supplement that would otherwise inflate
    # n_latin on symbol-heavy text
    ("latin", r"[A-Za-zÀ-ÖØ-öø-ɏ]"),
    ("cyrillic", r"[Ѐ-ӿ]"),
    ("greek", r"[Ͱ-Ͽ]"),
    ("arabic", r"[؀-ۿ]"),
    ("hebrew", r"[֐-׿]"),
    ("devanagari", r"[ऀ-ॿ]"),
    ("cjk", r"[一-鿿぀-ヿ가-힯]"),
]


def script_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Unicode script histogram + dominant script — the
    multilingual-curation complement to the stopword language-ID (which
    only separates Latin-script languages).  Adds n_<script> counts and
    `dominant_script` (highest count; ties resolve in SCRIPT_RANGES
    order; 'none' when no script chars at all).  Pure regexp_count
    projections — scan-speed, no shuffle."""
    t = F.col(text_col)
    out = df
    for name, pat in SCRIPT_RANGES:
        out = out.withColumn(
            f"n_{name}",
            F.coalesce(F.regexp_count(t, F.lit(pat)), F.lit(0))
             .cast("long"))
    dominant = F.lit("none")
    best = F.lit(0).cast("long")
    for name, _ in SCRIPT_RANGES:
        c = F.col(f"n_{name}")
        better = c > best
        dominant = F.when(better, F.lit(name)).otherwise(dominant)
        best = F.when(better, c).otherwise(best)
    return out.withColumn("dominant_script", dominant)


def gopher_quality(df: DataFrame, text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len: float = 3.0,
                   max_mean_word_len: float = 10.0,
                   max_symbol_word_ratio: float = 0.1,
                   max_bullet_line_frac: float = 0.9,
                   max_ellipsis_line_frac: float = 0.3,
                   min_alpha_word_frac: float = 0.8,
                   min_stop_hits: int = 2) -> DataFrame:
    """Gopher-rule quality signals (Rae et al. 2021 §A1.1): word-count
    bounds, mean word length bounds, symbol-to-word ratio (# and ...),
    bullet-led / ellipsis-ended line fractions, fraction of words with an
    alphabetic character, and a distinct-stopword floor — plus the
    combined `gopher_pass` flag.  Pure Column expressions, scan-speed.

    Line fractions are over non-empty lines; documents with no non-empty
    lines score 0 on both (and can't fail those rules), matching the
    convention that empty docs fail on word count alone.

    NOTE (ADVICE r9): the __toks/__lines staging pin below is
    non-deterministic, which blocks ALL predicate pushdown through this
    operator's output — not just filters on gopher columns but filters on
    untouched partition/date columns too (PushPredicateThroughNonJoin
    requires every project field to be deterministic), so partition
    pruning is lost for anything filtered AFTER this call.  Apply
    scan-prunable filters BEFORE gopher_quality; the barrier cannot be
    made selective per-predicate."""
    t = F.col(text_col)
    # Tokenize and line-split ONCE per row, pinned behind a
    # value-preserving pushdown barrier (monotonically_increasing_id() is
    # never negative, so the branch always fires and the value is exactly
    # the expression).  Two pathologies motivate the staging, both
    # measured on the 5k-doc sf0.1 corpus (r9, guide §1.2 "don't compute
    # things twice" — the same class as _positioned_grams' pinned
    # tokenization):
    # - interpreted HOFs have NO common-subexpression reuse, so every
    #   signal that referenced the `tokens(t)` expression re-split the
    #   document, and the stopword probe — a filter over the 10-marker
    #   array whose lambda referenced the lowercased-tokens TREE —
    #   re-tokenized the document once per marker (10×/row; that single
    #   signal was 0.9 s of the 1.2 s projection);
    # - PushPredicateThroughNonJoin substitutes aliased expressions into a
    #   downstream filter(gopher_pass) with no cost model, re-deriving the
    #   full chains per conjunct (measured 1.4 s vs 0.05 s for identical
    #   math kept as a projection).
    # With __toks/__lines as non-deterministic staging columns the signal
    # projection references per-row ATTRIBUTES, and a caller's filter
    # stays above the staging (it cannot push through non-determinism).
    def _pin(col: Column) -> Column:
        return F.when(F.monotonically_increasing_id() >= -1, col)

    staged = (df
              .withColumn("__toks", _pin(tokens(t)))
              .withColumn("__lines", _pin(F.filter(
                  F.transform(F.split(t, "\n", -1), lambda l: F.trim(l)),
                  lambda l: l != ""))))
    toks = F.col("__toks")
    lines = F.col("__lines")
    # null text reads as the empty document (0 words, every rate 0.0,
    # pass=false) in BOTH session modes — size(null) is -1 ANSI-off /
    # null ANSI-on
    n_words = F.greatest(F.size(toks), F.lit(0))
    total_len = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    mean_len = F.when(F.size(toks) > 0, total_len / F.size(toks)) \
                .otherwise(F.lit(0.0))
    n_symbols = (F.size(F.split(t, "#", -1)) - 1 +
                 F.size(F.split(t, r"\.\.\.", -1)) - 1 +
                 F.size(F.split(t, "…", -1)) - 1)
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words) \
                    .otherwise(F.lit(0.0))
    n_lines = F.size(lines)
    bullet_lines = F.size(F.filter(
        lines, lambda l: l.rlike(r"^(•|\*|-)\s")))
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: l.rlike(r"(\.\.\.|…)$")))
    bullet_frac = F.when(n_lines > 0, bullet_lines / n_lines) \
                   .otherwise(F.lit(0.0))
    ellipsis_frac = F.when(n_lines > 0, ellipsis_lines / n_lines) \
                     .otherwise(F.lit(0.0))
    alpha_words = F.size(F.filter(toks,
                                  lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.when(n_words > 0, alpha_words / n_words) \
                  .otherwise(F.lit(0.0))
    low = F.transform(toks, lambda w: F.lower(w))
    # distinct-marker count as ONE intersection over the lowercased-token
    # array instead of the historical filter(markers, array_contains(low))
    # — which evaluated `low` (and thus the tokenization) once PER MARKER.
    # The markers are distinct literals, so |array_intersect(markers, low)|
    # counts exactly the markers present; null tokens (null text) map to 0
    # hits, the value the per-marker form produced via its null-excluding
    # lambda.  The null guard reads the staged ATTRIBUTE, not `low`:
    # transform(null) is null iff __toks is null, so the value is
    # identical, and the HOF (CodegenFallback, no subexpression reuse)
    # isn't materialized a second time just to test for null (r10,
    # ADVICE r9).
    stop_hits = F.when(
        toks.isNotNull(),
        F.size(F.array_intersect(
            F.array(*[F.lit(w) for w in _LANG_MARKERS["en"]]), low))) \
        .otherwise(F.lit(0))
    # The signal columns themselves stay deterministic: once they reference
    # the staged attributes, a filter's substituted copy is cheap (an
    # interleaved A/B of pinning them too measured no difference).
    out = (staged
           .withColumn("n_words", n_words.cast("long"))
           .withColumn("mean_word_len", mean_len)
           .withColumn("symbol_word_ratio", symbol_ratio)
           .withColumn("bullet_line_frac", bullet_frac)
           .withColumn("ellipsis_line_frac", ellipsis_frac)
           .withColumn("alpha_word_frac", alpha_frac)
           .withColumn("stop_hits", stop_hits.cast("long")))
    return (out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= min_words) &
        (F.col("n_words") <= max_words) &
        (F.col("mean_word_len") >= min_mean_word_len) &
        (F.col("mean_word_len") <= max_mean_word_len) &
        (F.col("symbol_word_ratio") <= max_symbol_word_ratio) &
        (F.col("bullet_line_frac") <= max_bullet_line_frac) &
        (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac) &
        (F.col("alpha_word_frac") >= min_alpha_word_frac) &
        (F.col("stop_hits") >= min_stop_hits))
        .drop("__toks", "__lines"))


def c4_clean(df: DataFrame, text_col: str = "text",
             min_words_per_line: int = 5,
             min_sentences: int = 3) -> DataFrame:
    """C4-style page cleaning (Raffel et al. 2019 §2.2): keep only lines
    that end in terminal punctuation (. ! ? or a closing double quote)
    AND contain at least `min_words_per_line` words; flag pages
    containing '{' (code) or the phrase 'lorem ipsum'
    (case-insensitive); keep a page when its cleaned text still has at
    least `min_sentences` sentences (terminal-punctuation marks) and
    neither flag fired.

    Adds: clean_text (kept lines joined by newlines), n_lines_kept,
    n_lines_dropped, n_sentences, has_curly_brace, has_lorem_ipsum,
    c4_keep.  Pure Column expressions — scan-speed, no shuffle.

    The line pipeline is staged ONCE per row (r10, guide §1.2): the
    historical form inlined the kept-lines filter (per-line rlike + word
    count — CodegenFallback HOFs, no subexpression reuse) into FOUR
    output columns, running it 4× per row.  Values are bit-identical:
    pure common-subexpression factoring.  The staging needs no
    non-determinism pin — CollapseProject never inlines a non-cheap
    alias referenced more than once, and __c4_lines/__c4_kept/clean_text
    are each read 2-3 times — so the operator stays a deterministic
    projection and remains STREAM-capable (a mid-based pin is rejected
    on streams; rand()-based guards are constant-folded away)."""
    t = F.col(text_col)
    # null text reads as the empty page (no lines, keep=false)
    lines = F.coalesce(
        F.filter(F.transform(F.split(t, "\n", -1), lambda l: F.trim(l)),
                 lambda l: l != ""),
        F.array().cast("array<string>"))
    kept = F.filter(
        F.col("__c4_lines"),
        lambda l: l.rlike(r'[.!?"]$') &
        (F.size(F.filter(F.split(l, r"\s+"), lambda w: w != ""))
         >= min_words_per_line))
    staged = (df
              .withColumn("__c4_lines", lines)
              .withColumn("__c4_kept", kept)
              .withColumn("clean_text",
                          F.array_join(F.col("__c4_kept"), "\n")))
    n_sent = F.size(F.split(F.col("clean_text"), r"[.!?]", -1)) - 1
    out = (staged
           .withColumn("n_lines_kept", F.size("__c4_kept").cast("long"))
           .withColumn("n_lines_dropped",
                       (F.size("__c4_lines") - F.size("__c4_kept"))
                       .cast("long"))
           .withColumn("n_sentences", n_sent.cast("long"))
           .withColumn("has_curly_brace",
                       F.coalesce(t.contains("{"), F.lit(False)))
           .withColumn("has_lorem_ipsum",
                       F.coalesce(F.lower(t).contains("lorem ipsum"),
                                  F.lit(False))))
    return (out.withColumn(
        "c4_keep",
        (F.col("n_sentences") >= min_sentences) &
        ~F.col("has_curly_brace") & ~F.col("has_lorem_ipsum"))
        .drop("__c4_lines", "__c4_kept"))


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (Gopher §A1.1): duplicate-line
    fraction (by line count and by character mass) and the fraction of
    characters covered by the most frequent word bigram.

    Exact definitions (deterministic, replayable in SQL):
      * lines = trimmed, non-empty '\\n' splits; a line's duplicate mass
        is (count-1) copies — dup_line_frac = (n_lines - n_distinct) /
        n_lines, dup_line_char_frac weights each line by its length.
      * bigrams = adjacent whitespace-token pairs; the top bigram is the
        max-count one (ties: lexicographically smallest); its char mass
        is count * (len(w1) + len(w2) + 1) over the single-space-joined
        token length.  Docs with < 2 tokens (or no lines) score 0.

    Shape: two bounded explodes (lines, bigrams), partial-aggregated
    counts, per-doc rollups — shuffle keys are the doc id, no Python."""
    from pyspark.sql import Window

    base = df.select(F.col(id_col).alias("__id"), F.col(text_col)
                     .alias("__text"))
    lines = (base.select(
        "__id",
        F.explode(F.filter(
            F.transform(F.split(F.col("__text"), "\n", -1),
                        lambda l: F.trim(l)),
            lambda l: l != "")).alias("__line")))
    per_line = (lines.groupBy("__id", "__line")
                     .agg(F.count(F.lit(1)).alias("__c")))
    line_stats = (per_line.groupBy("__id").agg(
        F.sum("__c").alias("__n_lines"),
        F.count(F.lit(1)).alias("__n_distinct"),
        F.sum(F.col("__c") * F.length("__line")).alias("__line_chars"),
        F.sum((F.col("__c") - 1) * F.length("__line"))
         .alias("__dup_chars")))
    toks = tokens(F.col("__text"))
    tok_base = base.select("__id", toks.alias("__toks")) \
                   .withColumn("__n_toks", F.size("__toks"))
    joined_len = (tok_base.select(
        "__id", "__n_toks",
        (F.aggregate("__toks", F.lit(0).cast("long"),
                     lambda acc, w: acc + F.length(w)) +
         F.greatest(F.col("__n_toks") - 1, F.lit(0))).alias("__join_len")))
    bi = (tok_base.filter(F.col("__n_toks") >= 2)
          .select("__id", F.posexplode("__toks").alias("__p", "__w"))
          .withColumn("__w2", F.lead("__w", 1).over(
              Window.partitionBy("__id").orderBy("__p")))
          .filter(F.col("__w2").isNotNull())
          .groupBy("__id", "__w", "__w2")
          .agg(F.count(F.lit(1)).alias("__c")))
    top_bi = (bi.withColumn(
        "__rk", F.row_number().over(
            Window.partitionBy("__id")
                  .orderBy(F.col("__c").desc(), "__w", "__w2")))
        .filter(F.col("__rk") == 1)
        .select("__id",
                (F.col("__c") * (F.length("__w") + F.length("__w2") + 1))
                .alias("__top_chars")))
    return (base.select("__id")
            .join(line_stats, "__id", "left")
            .join(joined_len, "__id", "left")
            .join(top_bi, "__id", "left")
            .select(
                F.col("__id").alias(id_col),
                F.coalesce(F.col("__n_lines"), F.lit(0))
                 .cast("long").alias("n_lines"),
                F.coalesce(
                    F.when(F.col("__n_lines") > 0,
                           (F.col("__n_lines") - F.col("__n_distinct"))
                           / F.col("__n_lines")),
                    F.lit(0.0)).alias("dup_line_frac"),
                F.coalesce(
                    F.when(F.col("__line_chars") > 0,
                           F.col("__dup_chars") / F.col("__line_chars")),
                    F.lit(0.0)).alias("dup_line_char_frac"),
                F.coalesce(
                    F.when(F.col("__join_len") > 0,
                           F.col("__top_chars") / F.col("__join_len")),
                    F.lit(0.0)).alias("top_bigram_char_frac")))


def top_terms(df: DataFrame, group_col: str, text_col: str = "text",
              k: int = 10, min_len: int = 3) -> DataFrame:
    """Top-k terms per group by document frequency-weighted count.

    Shape: tokenize scan-side (Column expressions, no UDF) → one explode →
    partial-aggregated (group, term) counts → per-group top-k via a rank
    window over the already-aggregated frame.  The explode output
    carries only (group, term) — the document text never shuffles.  Ties
    break lexicographically so results are deterministic cross-engine.

    Top-k is TWO-PHASE: a per-(group, term-hash-salt) window prunes to k
    candidates per salt — each salt partition holds only a slice of the
    group's vocabulary, so no partition ever sorts the whole vocabulary
    (a single-window top-k over a web corpus' ~10^8-term groups is a
    straggler) — then the final window ranks the tiny candidate set.
    Counts are final before phase 1, so any global top-k row is in its
    salt's top-k and the result is identical to the one-window form."""
    toks = F.transform(tokens(F.lower(F.col(text_col))),
                       lambda t: F.regexp_replace(t, r"[^a-z0-9]", ""))
    terms = (df.select(F.col(group_col), F.explode(toks).alias("term"))
               .filter(F.length("term") >= min_len)
               .groupBy(group_col, "term")
               .agg(F.count(F.lit(1)).alias("term_count")))
    from pyspark.sql import Window
    n_salts = max(2, df.sparkSession.sparkContext.defaultParallelism)
    order = (F.col("term_count").desc(), F.col("term"))
    w_salt = (Window.partitionBy(group_col, "__salt").orderBy(*order))
    cand = (terms
            .withColumn("__salt", F.pmod(F.xxhash64("term"),
                                         F.lit(n_salts)))
            .withColumn("__r", F.row_number().over(w_salt))
            .filter(F.col("__r") <= k)
            .drop("__salt", "__r"))
    w = Window.partitionBy(group_col).orderBy(*order)
    return (cand.withColumn("rank", F.row_number().over(w).cast("long"))
                .filter(F.col("rank") <= k))


def truncate_to_tokens(df: DataFrame, max_tokens: int,
                       text_col: str = "text",
                       out_col: str = "text_truncated") -> DataFrame:
    """Token-budget truncation: keep the first ``max_tokens`` whitespace
    tokens, rejoined by single spaces (whitespace runs are normalized —
    the same reading every tokenizer downstream of this cut sees).
    Adds ``out_col`` and ``was_truncated``.  Closed-form slice/join —
    scan-speed, no shuffle; the context-window prep step before
    chunking/packing."""
    if max_tokens < 0:
        raise ValueError("max_tokens must be >= 0")
    # token array staged ONCE per row (r10, guide §1.2): out_col and
    # was_truncated both read it, and the split/filter HOF pipeline is
    # CodegenFallback with no subexpression reuse.  No pin needed —
    # CollapseProject keeps a non-cheap alias referenced twice — so the
    # operator stays deterministic and stream-capable.
    staged = df.withColumn("__tt_toks", tokens(F.col(text_col)))
    cut = F.array_join(F.slice(F.col("__tt_toks"), 1, max_tokens), " ")
    return (staged.select(
        "*",
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
         .otherwise(cut).alias(out_col),
        F.coalesce(F.size("__tt_toks") > max_tokens, F.lit(False))
         .alias("was_truncated"))
        .drop("__tt_toks"))


def corpus_profile(df: DataFrame, group_cols: list[str] | None = None,
                   text_col: str = "text") -> DataFrame:
    """Per-(source, lang, ...) corpus report: doc count, char/token
    mass, token-count mean and exact p50/p95 (linear interpolation) —
    the first table a curation run prints.  One shuffle on the group
    key; token counts are computed scan-side so the text itself never
    shuffles."""
    group_cols = ["source", "lang"] if group_cols is None else group_cols
    per_doc = df.select(
        *group_cols,
        char_count(F.col(text_col)).alias("__chars"),
        token_count(F.col(text_col)).cast("double").alias("__toks"))
    return (per_doc.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.sum("__chars").alias("total_chars"),
        F.sum("__toks").cast("long").alias("total_tokens"),
        F.avg("__toks").alias("avg_tokens"),
        F.expr("percentile(__toks, 0.5)").alias("p50_tokens"),
        F.expr("percentile(__toks, 0.95)").alias("p95_tokens")))
