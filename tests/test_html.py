"""HTML text extraction (pipeline/html.py) — chain semantics, edge
cases, and plan hygiene.

The extraction contract is regexp-level and documented in the module
docstring; these tests pin the behaviors the oracle relies on (entity
decode order, block-vs-inline tags, head/script/style removal, stray-
'<' passthrough, link density) plus null/empty handling across ANSI
modes.
"""

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.html import (
    anchor_chars,
    decode_entities,
    extract_html,
    html_stats,
    html_title,
    strip_html_tags,
)


def _one(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(strip_html_tags(F.col("html")).alias("t")).first().t


class TestStripHtml:
    def test_full_page(self, spark):
        t = _one(
            spark,
            '<html><head><title>T</title><style>p{}</style></head>'
            "<body><!-- c --><p>Hello <b>world</b> &amp; you</p>"
            '<script>var x = "<p>leak?</p>";</script>'
            '<div>Line2</div><a href="/x">a link</a> tail</body></html>',
        )
        assert t == "Hello world & you\nLine2\na link tail"

    def test_inline_tags_do_not_break(self, spark):
        assert _one(spark, "<b>bold</b>text <i>i</i>x") == "boldtext ix"

    def test_block_tags_break_lines(self, spark):
        assert _one(spark, "<p>a</p><P>b</P><br>c<li>d") == "a\nb\nc\nd"

    def test_head_removed_entirely(self, spark):
        t = _one(spark, "<head><meta x><title>gone</title></head>kept")
        assert t == "kept"

    def test_script_contents_removed(self, spark):
        assert _one(spark, 'x<script a="1">if (a<b) {}</script>y') == "xy"

    def test_unclosed_script_leaks_documented(self, spark):
        # Documented limit: no closing tag -> tag stripped, body leaks.
        assert _one(spark, "<script>leaky") == "leaky"

    def test_comment_removed(self, spark):
        assert _one(spark, "a<!-- <p>x</p> -->b") == "ab"

    def test_stray_lt_passthrough(self, spark):
        assert _one(spark, "3 < 4 stray") == "3 < 4 stray"

    def test_entity_decode_order(self, spark):
        # &amp;lt; decodes ONE level to the literal text "&lt;".
        assert _one(spark, "&amp;lt; &lt; &nbsp;&#39;") == "&lt; < '"

    def test_whitespace_normalized(self, spark):
        assert _one(spark, "  a\t b \r\n<p>  </p><p>c</p>") == "a b\nc"

    def test_empty_and_null(self, spark):
        df = spark.createDataFrame([("",), (None,)], "html string")
        out = [r.t for r in
               df.select(strip_html_tags(F.col("html")).alias("t")).collect()]
        assert out == ["", None]


class TestHtmlStats:
    def test_stats_row(self, spark):
        df = spark.createDataFrame(
            [(1, '<head><title> Hi &amp; Bye </title></head>'
                 '<p>one two three four five six seven eight</p>'
                 '<a href="/">x</a><a>yz</a><img src="i">')],
            "doc_id int, html string",
        )
        r = html_stats(df).first()
        assert r.title == "Hi & Bye"
        assert (r.n_links, r.n_paragraphs, r.n_images) == (2, 1, 1)
        assert r.has_script is False
        assert r.anchor_chars == 3
        assert r.text_chars == len(r.text)
        assert 0.0 < r.link_density < 0.5 and r.is_boilerplate is False

    def test_link_farm_flagged(self, spark):
        df = spark.createDataFrame(
            [(1, '<a href="/1">long anchor text here</a> ok')],
            "doc_id int, html string",
        )
        r = html_stats(df).first()
        assert r.link_density > 0.5 and r.is_boilerplate is True

    def test_anchor_nested_tags_stripped(self, spark):
        df = spark.createDataFrame([("<a><b>ab</b>c</a>",)], "html string")
        assert df.select(
            anchor_chars(F.col("html")).alias("n")).first().n == 3

    def test_title_absent_is_null(self, spark):
        df = spark.createDataFrame([("<p>x</p>",), ("<title></title>",)],
                                   "html string")
        out = [r.t for r in
               df.select(html_title(F.col("html")).alias("t")).collect()]
        assert out == [None, None]

    def test_extract_html_column(self, spark):
        df = spark.createDataFrame([(7, "<p>hi</p>")], "id int, html string")
        out = extract_html(df)
        assert out.columns == ["id", "html", "text"]
        assert out.first().text == "hi"


class TestPlanHygiene:
    def test_no_python_udf_in_plan(self, spark):
        df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id int, html string")
        plan = html_stats(df)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
