"""HTML text extraction — tag stripping, entity decoding, title/link
stats and link-density boilerplate signals, all as pure Column
expressions.

Raw web corpora (Common Crawl WARC payloads) arrive as HTML; extraction
to visible text is the step BEFORE every quality/dedup operator in this
package.  The chain here is closed-form — a fixed sequence of
regexp_replace / replace steps in the Java-regex ∩ RE2 subset, so the
IDENTICAL pattern strings run in Spark (whole-stage codegen, scan-speed,
no shuffle, no UDF) and in ANSI-SQL oracles.  At 100 TB the plan is a
single scan + projection.

Extraction contract (deterministic, documented, SQL-replayable):
  1. ``<!-- ... -->`` comments removed (non-greedy, dotall)
  2. ``<script>``/``<style>`` elements removed WITH their contents
  3. the whole ``<head>`` element removed (title is extracted separately
     by :func:`html_title` before this strips it)
  4. block-level open/close tags (p, div, br, li, h1–h6, tr, td, th,
     table, ul, ol, blockquote, pre, section, article, header, footer,
     nav, aside, form, hr) become newlines — inline tags (a, b, i, span,
     em, strong, …) strip without a break, so "<b>bold</b>text" stays
     one token stream
  5. every remaining tag stripped
  6. the named-entity subset &nbsp; &lt; &gt; &quot; &#39; &apos; &amp;
     decoded — &amp; LAST, so double-escaped "&amp;lt;" correctly yields
     the literal text "&lt;" (other numeric entities pass through
     verbatim; documented subset, matching the closed-form constraint)
  7. whitespace normalized: runs of space/tab/CR collapse to one space,
     line edges trimmed, blank lines dropped, outer whitespace trimmed

Known limits (shared by every regexp-level extractor): an UNCLOSED
<script> leaks its body as text; CDATA sections are treated as markup.
Both are rare in crawl data and both fail identically in the oracle, so
the contract stays exact.

Reference parity note: the reference engine (Apache Druid) has no HTML
operator — this is part of the training-data-pipeline tier layered on
top of the reference's query surface (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Step patterns — module-level constants so tests and oracle builders
# import the exact strings.  All are valid and equivalent in Java regex
# and RE2 (inline (?is) flags, non-greedy, no lookaround/backrefs).
COMMENT_RE = r"(?s)<!--.*?-->"
SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
HEAD_RE = r"(?is)<head\b[^>]*>.*?</head>"
BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|br|li|h[1-6]|tr|td|th|table|thead|tbody|ul|ol|"
    r"blockquote|pre|section|article|header|footer|nav|aside|form|hr)"
    r"\b[^>]*>"
)
ANY_TAG_RE = r"(?s)<[^>]*>"
TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"

#: (entity, replacement) in decode order — &amp; must stay last.
ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def decode_entities(col: Column) -> Column:
    """Decode the documented named-entity subset (literal replace, no
    regex — &amp; last so double-escapes resolve one level)."""
    for ent, rep in ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


def _normalize_ws(col: Column) -> Column:
    col = F.regexp_replace(col, r"[ \t\r]+", " ")
    col = F.regexp_replace(col, r"(?m)^ +| +$", "")
    col = F.regexp_replace(col, r"\n+", "\n")
    return F.regexp_replace(col, r"^\n+|\n+$", "")


def strip_html_tags(col: Column) -> Column:
    """Visible text of an HTML string per the module contract: one line
    per block-level element, inline markup flattened, entities decoded,
    whitespace normalized."""
    col = F.regexp_replace(col, COMMENT_RE, "")
    col = F.regexp_replace(col, SCRIPT_RE, "")
    col = F.regexp_replace(col, STYLE_RE, "")
    col = F.regexp_replace(col, HEAD_RE, "")
    col = F.regexp_replace(col, BLOCK_TAG_RE, "\n")
    col = F.regexp_replace(col, ANY_TAG_RE, "")
    return _normalize_ws(decode_entities(col))


def html_title(col: Column) -> Column:
    """<title> inner text (first match), entity-decoded and
    whitespace-collapsed; null when absent or empty."""
    t = F.regexp_extract(col, TITLE_RE, 1)
    return F.nullif(F.trim(_normalize_ws(decode_entities(t))), F.lit(""))


def anchor_chars(col: Column) -> Column:
    """Total characters of anchor (<a>…</a>) inner text, nested tags
    stripped (entities counted encoded — documented approximation).
    The numerator of link density, THE classic boilerplate signal."""
    inner = F.regexp_extract_all(col, F.lit(ANCHOR_RE), F.lit(1))
    lens = F.transform(
        inner, lambda x: F.length(F.regexp_replace(x, ANY_TAG_RE, ""))
    )
    return F.aggregate(lens, F.lit(0), lambda a, x: a + x)


def extract_html(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Add ``out_col`` = visible text of ``html_col``.  Scan-speed, no
    shuffle — the 100 TB plan is one projection."""
    return df.withColumn(out_col, strip_html_tags(F.col(html_col)))


def html_stats(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Per-document HTML signals: title, tag counts, extracted text +
    length, anchor-text mass and link density (anchor chars / text
    chars; 0.0 for empty text).  ``is_boilerplate`` flags link_density >
    0.5 — the rule-of-thumb nav/footer-page cutoff, override by
    filtering on the raw ratio."""
    h = F.col(html_col)
    # Two projections so the (large) extraction chain is evaluated once
    # and the stats reference the materialized column — Catalyst fuses
    # both into one codegen stage, but won't re-run the chain per stat.
    staged = df.select(
        "*",
        html_title(h).alias("title"),
        F.regexp_count(h, F.lit(r"(?i)<a\b")).alias("n_links"),
        F.regexp_count(h, F.lit(r"(?i)<p\b")).alias("n_paragraphs"),
        F.regexp_count(h, F.lit(r"(?i)<img\b")).alias("n_images"),
        (F.regexp_count(h, F.lit(r"(?i)<script\b")) > 0).alias("has_script"),
        strip_html_tags(h).alias("text"),
        anchor_chars(h).alias("anchor_chars"),
    )
    t_chars = F.length(F.col("text"))
    density = F.when(
        t_chars > 0, F.col("anchor_chars").cast("double") / t_chars
    ).otherwise(F.lit(0.0))
    return staged.select(
        "*",
        t_chars.alias("text_chars"),
        density.alias("link_density"),
        (density > 0.5).alias("is_boilerplate"),
    )
