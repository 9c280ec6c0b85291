"""URL curation operators — parse, canonicalize, registrable-domain,
URL-key dedup and per-domain stats.

Web-scale corpora carry a URL per document, and the first dedup pass in
the standard pipelines (C4, RefinedWeb, FineWeb) is BY CANONICAL URL
before any content hashing.  Everything here is pure Column expressions
(regexp + array ops in the Java-regex ∩ RE2 subset, so the identical
pattern strings run in Spark and ANSI-SQL oracles): scan-speed, no
shuffle, no UDF.

Canonicalization contract (deterministic, documented, SQL-replayable):
  * scheme and host lowercased; path/query case preserved
  * fragment stripped
  * default ports stripped (http:80, https:443)
  * tracking params removed (utm_*, fbclid, gclid, msclkid, mc_eid,
    igshid, ref_src) — the industry-common subset, kept in sync with
    TRACKING_PARAM_RE
  * remaining query params sorted bytewise; '?' dropped when the query
    emptied; trailing '/' collapsed on a bare-host path
Registrable domain is a HEURISTIC (last two labels, three when the
second-level label is a known country-code second level like co.uk) —
the full public-suffix list is a data file, not an algorithm; swap
`_CC_SLD` for the PSL when fidelity matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scheme://host[:port]/path?query#fragment — RE2-safe, no lookaround.
URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"

#: Tracking params dropped by canonicalize_url (anchored full-key match).
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)="

#: Country-code second-level labels under which a third label is the
#: registrable domain (heuristic subset; see module docstring).
_CC_SLD = ["co", "com", "net", "org", "ac", "gov", "edu"]


def url_scheme(url: Column) -> Column:
    return F.lower(F.nullif(F.regexp_extract(url, URL_RE, 1), F.lit("")))


def url_host(url: Column) -> Column:
    return F.lower(F.nullif(F.regexp_extract(url, URL_RE, 2), F.lit("")))


def url_path(url: Column) -> Column:
    return F.nullif(F.regexp_extract(url, URL_RE, 4), F.lit(""))


def url_query(url: Column) -> Column:
    return F.nullif(F.regexp_extract(url, URL_RE, 5), F.lit(""))


def registrable_domain(host: Column) -> Column:
    """Heuristic registrable domain: the last two labels — three when
    the second-to-last label is a known cc second level (co.uk style)
    AND there are at least three labels.  IPv4 hosts pass through."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    is_ip = host.rlike(r"^(\d{1,3}\.){3}\d{1,3}$")
    # positive clamped indices/starts: when/otherwise evaluates BOTH
    # branches, and element_at/slice throw out-of-bounds under an ANSI
    # host for 1-label hosts if fed a raw n-2
    second = F.element_at(labels, F.greatest(n - 1, F.lit(1)))
    take3 = (n >= 3) & F.array_contains(
        F.array(*[F.lit(s) for s in _CC_SLD]), second)
    tail = F.when(take3, F.slice(labels, F.greatest(n - 2, F.lit(1)), 3)) \
            .otherwise(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    return F.when(is_ip | host.isNull(), host) \
            .otherwise(F.array_join(tail, "."))


def canonicalize_url(url: Column) -> Column:
    """Canonical form per the module-docstring contract; null for
    strings that do not parse as scheme://host URLs."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = F.nullif(F.regexp_extract(url, URL_RE, 3), F.lit(""))
    path = F.regexp_extract(url, URL_RE, 4)
    query = F.regexp_extract(url, URL_RE, 5)
    drop_port = (port.isNull()
                 | ((scheme == "http") & (port == "80"))
                 | ((scheme == "https") & (port == "443")))
    port_part = F.when(drop_port, F.lit("")) \
                 .otherwise(F.concat(F.lit(":"), port))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    sorted_q = F.array_join(F.array_sort(params), "&")
    query_part = F.when(sorted_q == "", F.lit("")) \
                  .otherwise(F.concat(F.lit("?"), sorted_q))
    path_part = F.when(path == "", F.lit("")) \
                 .otherwise(F.when(path == "/", F.lit("")).otherwise(path))
    return F.when(
        scheme.isNull() | host.isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, port_part,
                         path_part, query_part))


def url_dedup_key(url: Column) -> Column:
    """64-bit dedup key of the canonical URL — feed to exact dedup /
    dedup_against exactly like a text fingerprint.  Null for unparseable
    URLs: xxhash64(NULL) would otherwise return the SEED constant,
    silently colliding every unparseable row into one dedup bucket."""
    canon = canonicalize_url(url)
    return F.when(canon.isNull(), F.lit(None).cast("long")) \
            .otherwise(F.xxhash64(canon))


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Projection: adds scheme/host/domain/path/query/canonical_url/
    url_key columns.  One scan, no shuffle.

    Output columns are staged ONCE per row (r10, guide §1.2): the
    historical composition inlined url_host into registrable_domain and
    re-ran the WHOLE canonicalization inside url_dedup_key — 45
    regexp_extract full matches of URL_RE per row in the optimized plan;
    staging cuts that to one match per component (plan-asserted in
    tests).  Values are bit-identical: url_key is xxhash64 of the same
    canonical string, domain reads the same host.  The staging holds
    WITHOUT a non-determinism pin: CollapseProject never inlines a
    non-cheap alias referenced more than once, and every multiply-read
    column here (host, canonical_url) is non-cheap.  (A pin would also
    break the streaming contract — monotonically_increasing_id is
    rejected on streams, and rand()-based guards are constant-folded
    away by the optimizer.)  Downstream filters still push through by
    substituting the single component expression — scan pruning below
    parse_urls keeps working."""
    u = F.col(url_col)
    staged = (df
              .withColumn("scheme", url_scheme(u))
              .withColumn("host", url_host(u))
              .withColumn("domain", registrable_domain(F.col("host")))
              .withColumn("path", url_path(u))
              .withColumn("query", url_query(u))
              .withColumn("canonical_url", canonicalize_url(u)))
    canon = F.col("canonical_url")
    return staged.withColumn(
        "url_key",
        F.when(canon.isNull(), F.lit(None).cast("long"))
         .otherwise(F.xxhash64(canon)))


def url_dedup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Keep one row per canonical URL.  The representative is the row
    with the MINIMUM value of the frame's FIRST column — pass the id
    column first (a deterministic contract; an arbitrary `first()` per
    group would be partition-order-dependent).  Rows whose URL does not
    parse (null key) are kept as-is.  Shuffle carries (key, id) only."""
    id_col = df.columns[0]
    key = url_dedup_key(F.col(url_col))
    keyed = df.withColumn("__uk", key)
    winners = (keyed.filter(F.col("__uk").isNotNull())
               .groupBy("__uk")
               .agg(F.min(id_col).alias(id_col))
               .select(id_col))
    return (keyed.filter(F.col("__uk").isNull()).drop("__uk")
            .unionByName(keyed.join(winners, id_col, "semi").drop("__uk")))


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per registrable domain: doc count and share of the corpus — the
    head-domain report every curation run starts with.  One aggregate."""
    host = url_host(F.col(url_col))
    dom = registrable_domain(host)
    total = df.count()
    return (df.select(dom.alias("domain"))
              .filter(F.col("domain").isNotNull())
              .groupBy("domain")
              .agg(F.count(F.lit(1)).alias("n_docs"))
              .withColumn("share",
                          F.col("n_docs") / F.lit(float(total))))
