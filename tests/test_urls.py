"""Tests for pipeline/urls.py — URL parse/canonicalize/domain/dedup."""

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.urls import (
    canonicalize_url, domain_stats, parse_urls, registrable_domain,
    url_dedup, url_host)


def _canon(spark, url):
    return spark.range(1).select(
        canonicalize_url(F.lit(url)).alias("c")).collect()[0]["c"]


@pytest.mark.parametrize("url,expect", [
    # case + tracking params + param sort + fragment
    ("https://WWW.Ex.COM/A/b?utm_source=x&b=2&a=1#frag",
     "https://www.ex.com/A/b?a=1&b=2"),
    # default ports strip; explicit non-default kept
    ("http://h.com:80/p", "http://h.com/p"),
    ("https://h.com:443/p", "https://h.com/p"),
    ("http://h.com:8080/p", "http://h.com:8080/p"),
    # bare and slash-only paths collapse
    ("https://h.com", "https://h.com"),
    ("https://h.com/", "https://h.com"),
    # query emptied by tracking-strip drops the '?'
    ("https://h.com/p?gclid=1", "https://h.com/p"),
    # path/query case preserved
    ("https://h.com/P?Q=V", "https://h.com/P?Q=V"),
    # unparseable -> null
    ("not a url", None),
    ("", None),
])
def test_canonicalize(spark, url, expect):
    assert _canon(spark, url) == expect


@pytest.mark.parametrize("host,expect", [
    ("www.example.com", "example.com"),
    ("a.b.co.uk", "b.co.uk"),
    ("x.co.uk", "x.co.uk"),
    ("co.uk", "co.uk"),
    ("192.168.1.7", "192.168.1.7"),
    ("localhost", "localhost"),
    ("shop.example.com", "example.com"),
])
def test_registrable_domain(spark, host, expect):
    got = spark.range(1).select(
        registrable_domain(F.lit(host)).alias("d")).collect()[0]["d"]
    assert got == expect


def test_registrable_domain_ansi_safe_on_short_hosts(spark):
    # 1-label hosts must not trip element_at/slice bounds under ANSI
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        got = spark.createDataFrame(
            [("x",), ("a.b",), ("q.co.uk",)], ["h"]).select(
            registrable_domain(F.col("h")).alias("d")).collect()
        assert [r["d"] for r in got] == ["x", "a.b", "q.co.uk"]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_parse_urls_columns(spark):
    df = spark.createDataFrame(
        [(1, "https://A.B.com:9090/x/y?b=2&a=1&utm_x=9#f"), (2, "junk")],
        ["doc_id", "url"])
    rows = {r["doc_id"]: r for r in parse_urls(df).collect()}
    r = rows[1]
    assert r["scheme"] == "https" and r["host"] == "a.b.com"
    assert r["domain"] == "b.com" and r["path"] == "/x/y"
    assert r["canonical_url"] == "https://a.b.com:9090/x/y?a=1&b=2"
    assert r["url_key"] is not None
    assert rows[2]["canonical_url"] is None and rows[2]["url_key"] is None


def test_url_dedup_keeps_min_id_and_unparseable(spark):
    df = spark.createDataFrame(
        [(3, "https://h.com/p?a=1"),
         (1, "https://H.com/p?a=1&utm_q=z"),   # same canonical as 3
         (2, "https://h.com/other"),
         (9, "broken"), (8, "also broken")],
        ["doc_id", "url"])
    kept = sorted(r["doc_id"] for r in url_dedup(df).collect())
    assert kept == [1, 2, 8, 9]


def test_domain_stats_shares_sum_to_parseable_fraction(spark):
    df = spark.createDataFrame(
        [(1, "https://a.com/1"), (2, "https://b.a.com/2"),
         (3, "https://c.org/3"), (4, "junk")],
        ["doc_id", "url"])
    rows = {r["domain"]: r for r in domain_stats(df).collect()}
    assert rows["a.com"]["n_docs"] == 2
    assert abs(sum(r["share"] for r in rows.values()) - 0.75) < 1e-9


def test_url_host_null_for_garbage(spark):
    got = spark.createDataFrame([("ftp://ok.net/x",), ("nope",)], ["u"]) \
        .select(url_host(F.col("u")).alias("h")).collect()
    assert [r["h"] for r in got] == ["ok.net", None]
