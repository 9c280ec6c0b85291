"""Bloom filter, sessionization, IVF ANN tests."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


def test_bloom_build_and_probe(spark, catalog):
    from incubator_druid_spark.functions.bloom import (bloom_build,
                                                       bloom_might_contain)
    events = catalog.table("events")
    build_side = events.filter(F.col("event_type") == "purchase") \
                       .select("user_id").distinct()
    positions = bloom_build(build_side, "user_id")
    probed = events.filter(bloom_might_contain(positions, F.col("user_id")))
    # no false negatives: every actual purchaser's events pass the filter
    actual = {r["user_id"] for r in build_side.collect()}
    passed = {r["user_id"] for r in probed.select("user_id").distinct().collect()}
    assert actual <= passed
    # filter is selective (false-positive rate far below 1)
    total = events.select("user_id").distinct().count()
    assert len(passed) < total or len(actual) == total


def test_bloom_dim_filter_in_query(spark, catalog):
    from incubator_druid_spark import translate
    from incubator_druid_spark.functions.bloom import bloom_build
    events = catalog.table("events")
    positions = bloom_build(
        events.filter(F.col("event_type") == "error").select("user_id"),
        "user_id")
    q = {"queryType": "timeseries", "dataSource": "events", "granularity": "all",
         "filter": {"type": "bloom", "dimension": "user_id",
                    "bloomKFilter": {"positions": positions}},
         "aggregations": [{"type": "count", "name": "cnt"}]}
    out = translate(q, spark, catalog).first()
    full = events.count()
    assert 0 < out["cnt"] <= full


def test_bloom_aggregator(spark, foo_catalog):
    from incubator_druid_spark import translate
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": [],
         "aggregations": [{"type": "bloom", "name": "bf", "fieldName": "dim1"}]}
    r = translate(q, spark, foo_catalog).first()
    assert len(r["bf"]) > 0  # position set built


def test_sessionize(spark):
    import datetime
    from incubator_druid_spark.pipeline.sessions import (session_stats,
                                                         sessionize)
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    mk = lambda m: base + datetime.timedelta(minutes=m)  # noqa: E731
    df = spark.createDataFrame(
        [(1, mk(0), 1.0), (1, mk(5), 2.0), (1, mk(50), 3.0),  # gap > 30 → new
         (2, mk(0), 4.0)],
        "user_id long, __time timestamp, value double")
    s = sessionize(df, gap_minutes=30)
    got = {(r["user_id"], str(r["__time"])): r["session_id"] for r in s.collect()}
    assert got[(1, "2024-01-01 10:00:00")] == 1
    assert got[(1, "2024-01-01 10:05:00")] == 1
    assert got[(1, "2024-01-01 10:50:00")] == 2
    stats = session_stats(df, gap_minutes=30)
    by_key = {(r["user_id"], r["session_id"]): r for r in stats.collect()}
    assert by_key[(1, 1)]["n_events"] == 2
    assert by_key[(1, 1)]["duration_sec"] == 300.0
    assert by_key[(1, 1)]["total_value"] == 3.0


def test_ivf_topk_recall(spark, catalog):
    from incubator_druid_spark.pipeline.similarity import (ann_ivf_topk,
                                                           cosine_topk)
    emb = catalog.table("embeddings")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    rest = emb.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in cosine_topk(rest, q, k=10).collect()}
    ivf = {r["vec_id"] for r in ann_ivf_topk(rest, q, k=10, n_clusters=8,
                                             nprobe=4).collect()}
    assert len(exact & ivf) >= 5


def test_sketch_quantile_postagg_rewrite(spark, catalog):
    from incubator_druid_spark import translate
    q = {"queryType": "groupBy", "dataSource": "lineitem", "granularity": "all",
         "dimensions": ["l_returnflag"],
         "aggregations": [{"type": "quantilesDoublesSketch", "name": "sk",
                           "fieldName": "l_quantity", "k": 128}],
         "postAggregations": [
             {"type": "quantilesDoublesSketchToQuantile", "name": "p90",
              "field": {"type": "fieldAccess", "fieldName": "sk"},
              "fraction": 0.9}]}
    out = translate(q, spark, catalog)
    assert "p90" in out.columns
    r = {x["l_returnflag"]: x["p90"] for x in out.collect()}
    # l_quantity uniform on [1,50] → p90 ≈ 45
    assert all(40 <= v <= 50 for v in r.values())


def test_streaming_stateful_sessionize(spark, tmp_path):
    import json as _json
    from incubator_druid_spark.streaming.stateful import streaming_sessionize
    src = tmp_path / "sess_in"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(_json.dumps(x) for x in [
        {"t": "2024-01-01T10:00:00Z", "user_id": 1, "value": 1.0},
        {"t": "2024-01-01T10:05:00Z", "user_id": 1, "value": 2.0},
        {"t": "2024-01-01T11:30:00Z", "user_id": 1, "value": 9.0},  # new session
        {"t": "2024-01-01T10:00:00Z", "user_id": 2, "value": 4.0},
    ]))
    stream = (spark.readStream.schema("t string, user_id long, value double")
              .json(str(src))
              .selectExpr("cast(t as timestamp) as __time", "user_id", "value"))
    out = streaming_sessionize(stream, gap_minutes=30)
    q = (out.writeStream.format("memory").queryName("sessions_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions_out").collect()
    # user 1's first session (2 events, 5-min span) closes when the 11:30
    # event arrives past the 30-min gap
    sessions = {(r["user_id"], r["n_events"]): r for r in got}
    assert (1, 2) in sessions
    assert sessions[(1, 2)]["total_value"] == 3.0


def test_http_server_endpoints(spark, tmp_path):
    import json as _json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer
    from incubator_druid_spark.catalog import load_catalog
    from incubator_druid_spark.server import make_handler
    from tests.conftest import SF_DIR

    catalog = load_catalog(spark, SF_DIR)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(spark, catalog))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/status") as r:
            st = _json.loads(r.read())
        assert "events" in st["datasources"]

        body = _json.dumps({
            "queryType": "timeseries", "dataSource": "events",
            "granularity": "all",
            "aggregations": [{"type": "count", "name": "cnt"}]}).encode()
        req = urllib.request.Request(f"http://127.0.0.1:{port}/druid/v2/",
                                     data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = _json.loads(r.read())
        assert out[0]["result"]["cnt"] == 1000

        sql_body = _json.dumps({"query": "SELECT count(*) AS c FROM events",
                                "resultFormat": "object"}).encode()
        req2 = urllib.request.Request(f"http://127.0.0.1:{port}/druid/v2/sql/",
                                      data=sql_body,
                                      headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req2) as r:
            out2 = _json.loads(r.read())
        assert out2 == [{"c": 1000}]
    finally:
        httpd.shutdown()


def test_ivf_index_partition_pruning(spark, catalog, tmp_path):
    from incubator_druid_spark.pipeline.similarity import (
        ann_ivf_topk_indexed, cosine_topk, train_ivf_centroids, write_ivf_index)
    from tests.test_plans import plan_of
    from pyspark.sql import functions as F

    emb = catalog.table("embeddings")
    cent = train_ivf_centroids(emb, n_clusters=8)
    path = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, path, cent)

    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    out = ann_ivf_topk_indexed(spark, path, q, cent, k=10, nprobe=4)
    plan = plan_of(out)
    assert "PartitionFilters" in plan and "__ivf" in plan
    exact = {r["vec_id"] for r in
             cosine_topk(emb.filter(F.col("vec_id") != 0), q, k=10).collect()}
    approx = {r["vec_id"] for r in out.collect()}
    assert len(exact & approx) >= 5


def test_theta_sketch_set_operations(spark, catalog):
    """thetaSketchEstimate over thetaSketchSetOp via inclusion–exclusion."""
    from incubator_druid_spark import translate

    def mk(func):
        return {"queryType": "timeseries", "dataSource": "events",
                "granularity": "all",
                "aggregations": [
                    {"type": "filtered",
                     "filter": {"type": "selector", "dimension": "event_type",
                                "value": "purchase"},
                     "aggregator": {"type": "thetaSketch", "name": "buyers",
                                    "fieldName": "user_id"}},
                    {"type": "filtered",
                     "filter": {"type": "selector", "dimension": "event_type",
                                "value": "error"},
                     "aggregator": {"type": "thetaSketch", "name": "errorers",
                                    "fieldName": "user_id"}}],
                "postAggregations": [
                    {"type": "thetaSketchEstimate", "name": "est",
                     "field": {"type": "thetaSketchSetOp", "func": func,
                               "fields": [
                                   {"type": "fieldAccess", "fieldName": "buyers"},
                                   {"type": "fieldAccess", "fieldName": "errorers"}]}}]}

    events = catalog.table("events")
    buyers = {r["user_id"] for r in events.filter(
        F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    errorers = {r["user_id"] for r in events.filter(
        F.col("event_type") == "error").select("user_id").distinct().collect()}

    got_i = translate(mk("INTERSECT"), spark, catalog).first()["est"]
    got_u = translate(mk("UNION"), spark, catalog).first()["est"]
    got_n = translate(mk("NOT"), spark, catalog).first()["est"]
    assert got_i == len(buyers & errorers)
    assert got_u == len(buyers | errorers)
    assert got_n == len(buyers - errorers)


def test_quantiles_sketch_rank_cdf_histogram_post_aggs(spark, catalog):
    """DoublesSketchToRank/ToCDF/ToHistogram post-aggs rewrite to exact
    single-pass aggregations over raw columns (quantiles/DoublesSketchTo*
    PostAggregator.java semantics: rank = fraction < value, CDF = cumulative
    fractions at split points + trailing 1.0, histogram = PMF x N)."""
    from incubator_druid_spark import translate

    q = {"queryType": "timeseries", "dataSource": "events",
         "granularity": "all",
         "aggregations": [{"type": "quantilesDoublesSketch", "name": "sk",
                           "fieldName": "value"}],
         "postAggregations": [
             {"type": "quantilesDoublesSketchToRank", "name": "rank",
              "field": {"type": "fieldAccess", "fieldName": "sk"}, "value": 50.0},
             {"type": "quantilesDoublesSketchToCDF", "name": "cdf",
              "field": {"type": "fieldAccess", "fieldName": "sk"},
              "splitPoints": [10.0, 50.0, 200.0]},
             {"type": "quantilesDoublesSketchToHistogram", "name": "hist",
              "field": {"type": "fieldAccess", "fieldName": "sk"},
              "splitPoints": [10.0, 50.0, 200.0]}]}
    row = translate(q, spark, catalog).first()

    vals = [r["value"] for r in
            catalog.table("events").select("value").collect()
            if r["value"] is not None]
    n = len(vals)
    want_rank = sum(1 for v in vals if v < 50.0) / n
    assert abs(row["rank"] - want_rank) < 1e-9
    want_cdf = [sum(1 for v in vals if v < s) / n for s in (10.0, 50.0, 200.0)] + [1.0]
    assert all(abs(a - b) < 1e-9 for a, b in zip(row["cdf"], want_cdf))
    splits = [10.0, 50.0, 200.0]
    want_hist = [float(sum(1 for v in vals if v < splits[0]))]
    want_hist += [float(sum(1 for v in vals if lo <= v < hi))
                  for lo, hi in zip(splits, splits[1:])]
    want_hist.append(float(sum(1 for v in vals if v >= splits[-1])))
    assert row["hist"] == want_hist

    # numBins path: equally-spaced bins between min/max off the centroid
    # sketch — counts must sum to ~N
    q2 = {**q, "postAggregations": [
        {"type": "quantilesDoublesSketchToHistogram", "name": "hist",
         "field": {"type": "fieldAccess", "fieldName": "sk"}, "numBins": 5}]}
    h = translate(q2, spark, catalog).first()["hist"]
    assert len(h) == 5 and abs(sum(h) - n) / n < 0.02


def test_hll_union_and_bounds_post_aggs(spark, catalog):
    """HLLSketchEstimate(HLLSketchUnion(a,b)) = distinct under OR of the
    operand filters (one extra agg, no sketch materialization);
    HLLSketchEstimateWithBounds returns [estimate, lo, hi]."""
    from incubator_druid_spark import translate

    def agg(name, etype):
        return {"type": "filtered",
                "filter": {"type": "selector", "dimension": "event_type",
                           "value": etype},
                "aggregator": {"type": "HLLSketchBuild", "name": name,
                               "fieldName": "user_id"}}

    q = {"queryType": "timeseries", "dataSource": "events",
         "granularity": "all",
         "aggregations": [agg("buyers", "purchase"), agg("errorers", "error")],
         "postAggregations": [
             {"type": "HLLSketchEstimate", "name": "union_est",
              "field": {"type": "HLLSketchUnion", "fields": [
                  {"type": "fieldAccess", "fieldName": "buyers"},
                  {"type": "fieldAccess", "fieldName": "errorers"}]}},
             {"type": "HLLSketchEstimateWithBounds", "name": "bounds",
              "field": {"type": "fieldAccess", "fieldName": "buyers"},
              "numStdDev": 2}]}
    row = translate(q, spark, catalog).first()

    ev = catalog.table("events")
    either = ev.filter(F.col("event_type").isin("purchase", "error")) \
        .select("user_id").distinct().count()
    # approx_count_distinct backs the estimate — allow its rank error
    assert abs(row["union_est"] - either) / either < 0.05
    est, lo, hi = row["bounds"]
    assert lo <= est <= hi and lo > 0


def test_array_of_doubles_tuple_sketch(spark, catalog):
    """tuple/ArrayOfDoublesSketchAggregatorFactory — distinct keys with
    per-key summed metric vectors, computed exact: estimate==numEntries==
    count_distinct(key); metric sums telescope so ToMeans = sum/distinct."""
    from incubator_druid_spark import translate

    fa = {"type": "fieldAccess", "fieldName": "sk"}
    q = {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
         "dimensions": ["event_type"],
         "aggregations": [{"type": "arrayOfDoublesSketch", "name": "sk",
                           "fieldName": "user_id", "metricColumns": ["value"]}],
         "postAggregations": [
             {"type": "arrayOfDoublesSketchToEstimate", "name": "est", "field": fa},
             {"type": "arrayOfDoublesSketchToNumEntries", "name": "n", "field": fa},
             {"type": "arrayOfDoublesSketchToEstimateAndBounds", "name": "b",
              "field": fa, "numStdDevs": 2},
             {"type": "arrayOfDoublesSketchToMeans", "name": "means", "field": fa}]}
    out = {r["event_type"]: r for r in translate(q, spark, catalog).collect()}

    ev = catalog.table("events")
    want = {r["event_type"]: r for r in
            ev.groupBy("event_type")
              .agg(F.count_distinct("user_id").alias("cd"),
                   F.sum("value").alias("sv")).collect()}
    for et, w in want.items():
        r = out[et]
        assert r["est"] == float(w["cd"]) and r["n"] == w["cd"]
        assert r["b"] == [float(w["cd"])] * 3
        assert abs(r["means"][0] - w["sv"] / w["cd"]) < 1e-6


def test_tuple_sketch_keyed_variances_and_quantile(spark, catalog):
    """tuple/ArrayOfDoublesSketchToVariancesPostAggregator.java — SAMPLE
    variance per value column across the sketch's PER-KEY sums (needs the
    two-level aggregation in operators/tuple_keyed.py), and
    ToQuantilesSketch→ToQuantile over the same per-key sum population."""
    from incubator_druid_spark import translate

    fa = {"type": "fieldAccess", "fieldName": "sk"}
    q = {"queryType": "groupBy", "dataSource": "events", "granularity": "all",
         "dimensions": ["event_type"],
         "aggregations": [
             {"type": "arrayOfDoublesSketch", "name": "sk",
              "fieldName": "user_id", "metricColumns": ["value"]},
             {"type": "count", "name": "rows"}],
         "postAggregations": [
             {"type": "arrayOfDoublesSketchToVariances", "name": "vars",
              "field": fa},
             {"type": "quantilesDoublesSketchToQuantile", "name": "med",
              "fraction": 0.5,
              "field": {"type": "arrayOfDoublesSketchToQuantilesSketch",
                        "name": "qs", "column": 1, "field": fa}},
             {"type": "arrayOfDoublesSketchToEstimate", "name": "est",
              "field": fa}]}
    out = {r["event_type"]: r for r in translate(q, spark, catalog).collect()}

    ev = catalog.table("events")
    per_key = ev.groupBy("event_type", "user_id") \
        .agg(F.sum(F.col("value").cast("double")).alias("s"))
    want = {r["event_type"]: r for r in
            per_key.groupBy("event_type")
            .agg(F.var_samp("s").alias("v"),
                 F.percentile("s", F.lit(0.5)).alias("med"),
                 F.count_distinct("user_id").alias("cd")).collect()}
    rows = {r["event_type"]: r["c"] for r in
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("c")).collect()}
    for et, w in want.items():
        r = out[et]
        assert abs(r["vars"][0] - w["v"]) < 1e-6 * max(1.0, abs(w["v"]))
        assert abs(r["med"] - w["med"]) < 1e-9
        assert r["est"] == float(w["cd"])
        assert r["rows"] == rows[et]


def test_tuple_sketch_ttest_and_setop(spark, catalog):
    """tuple/ArrayOfDoublesSketchTTestPostAggregator.java:78-86 — Welch's
    t-test p-value between two sketches' per-key sum populations, and
    SetOp UNION/INTERSECT membership estimates."""
    from incubator_druid_spark import translate

    def side(name, etype):
        return {"type": "filtered",
                "filter": {"type": "selector", "dimension": "event_type",
                           "value": etype},
                "aggregator": {"type": "arrayOfDoublesSketch", "name": name,
                               "fieldName": "user_id",
                               "metricColumns": ["value"]}}

    fa = lambda n: {"type": "fieldAccess", "fieldName": n}
    q = {"queryType": "timeseries", "dataSource": "events",
         "granularity": "all",
         "aggregations": [side("a", "click"), side("b", "purchase")],
         "postAggregations": [
             {"type": "arrayOfDoublesSketchTTest", "name": "p",
              "fields": [fa("a"), fa("b")]},
             {"type": "arrayOfDoublesSketchToEstimate", "name": "u_est",
              "field": {"type": "arrayOfDoublesSketchSetOp",
                        "operation": "UNION", "name": "u",
                        "fields": [fa("a"), fa("b")]}},
             {"type": "arrayOfDoublesSketchToEstimate", "name": "i_est",
              "field": {"type": "arrayOfDoublesSketchSetOp",
                        "operation": "INTERSECT", "name": "i",
                        "fields": [fa("a"), fa("b")]}}]}
    row = translate(q, spark, catalog).first()

    ev = catalog.table("events")
    a_keys = {r[0] for r in ev.filter(F.col("event_type") == "click")
              .select("user_id").distinct().collect()}
    b_keys = {r[0] for r in ev.filter(F.col("event_type") == "purchase")
              .select("user_id").distinct().collect()}
    assert row["u_est"] == float(len(a_keys | b_keys))
    assert row["i_est"] == float(len(a_keys & b_keys))

    import numpy as np
    pk = ev.filter(F.col("event_type").isin("click", "purchase")) \
        .groupBy("event_type", "user_id") \
        .agg(F.sum(F.col("value").cast("double")).alias("s")).collect()
    xs = np.array([r["s"] for r in pk if r["event_type"] == "click"])
    ys = np.array([r["s"] for r in pk if r["event_type"] == "purchase"])
    m1, v1, n1 = xs.mean(), xs.var(ddof=1), len(xs)
    m2, v2, n2 = ys.mean(), ys.var(ddof=1), len(ys)
    from incubator_druid_spark.operators.tuple_keyed import _welch_p
    want_p = _welch_p(m1, v1, n1, m2, v2, n2)
    try:
        from scipy import stats as sstats  # cross-check when available
        sp = sstats.ttest_ind(xs, ys, equal_var=False).pvalue
        assert abs(want_p - sp) < 1e-8
    except ImportError:
        pass
    assert abs(row["p"][0] - want_p) < 1e-9


def test_theta_sketch_constant_roundtrip_and_setops(spark, catalog):
    """thetaSketchConstant (SketchConstantPostAggregator.java): base64
    compact theta sketches parsed from the public DataSketches serVer-3
    layout — estimate, single-item and empty forms, estimation-mode theta,
    and UNION/INTERSECT/NOT among constants."""
    from incubator_druid_spark import translate
    from incubator_druid_spark.functions.theta_sketch import (
        parse_compact_theta, serialize_compact_theta, theta_set_op)
    import base64

    # round-trip: exact mode
    a = serialize_compact_theta([100, 200, 300])
    b = serialize_compact_theta([200, 300, 400, 500])
    sa, sb = parse_compact_theta(a), parse_compact_theta(b)
    assert sa.estimate == 3.0 and sb.estimate == 4.0
    # single item + empty
    assert parse_compact_theta(serialize_compact_theta([42])).estimate == 1.0
    assert parse_compact_theta(serialize_compact_theta([])).estimate == 0.0
    # estimation mode: 100 hashes under theta=0.5 → estimate 200
    est = parse_compact_theta(serialize_compact_theta(range(100), theta=0.5))
    assert abs(est.estimate - 200.0) < 1e-6
    # set ops among constants
    assert theta_set_op("INTERSECT", [sa, sb]).estimate == 2.0
    assert theta_set_op("UNION", [sa, sb]).estimate == 5.0
    assert theta_set_op("NOT", [sa, sb]).estimate == 1.0

    # exporter writes the DEFAULT_UPDATE_SEED(9001) seed hash at bytes 6-7 —
    # datasketches-java Sketch.wrap validates it (and rejects 0), verified
    # against the real library; ADVICE r1
    import struct
    assert struct.unpack_from("<H", a, 6)[0] == 37836

    # golden interop: sketches produced by datasketches-java 6.2.0
    # (UpdateSketch.update("user0".."user4").compact(true)) parse exactly
    golden = ("AgMDAAAazJMFAAAAAACAP3ATtMxZL8AOhJk/IQvAUiBPYwqhnGdgOvnpUueu"
              "UnhZ9tl6KPi9Nmg=")
    assert parse_compact_theta(golden).estimate == 5.0
    # estimation-mode golden (nominal 16, 1000 distinct ints):
    # java getEstimate() == 829.7403132548839, 24 retained entries
    golden_est = ("AwMDAAAazJMYAAAAAACAPzk+6xYTzrMD1Ynt8rp0KgDerGvh4dllAPp0"
                  "s0wWsW4Ax8SBhRN/cwD/PttJMfqWAFFnAT7v4t0AS79+7n5A9QDkx1gS"
                  "msQGAa9fFaZJkk4BCiLbtxyHXwGIZVc30Qp0AXt/7GbteH8B+zh5iRMk"
                  "jwG5v5/q+p6qAXg9RuN9fNMB76+uz1vd9AGU3tbIoHUqAtHutbEZtJMC"
                  "bfP7iFWNlgJzR6JuOU2ZAq6a0RmkcCcDpZB75TT5bQO4M7Uaw25yAw9d"
                  "EZDciLED")
    ge = parse_compact_theta(golden_est)
    assert ge.hashes and len(ge.hashes) == 24
    assert abs(ge.estimate - 829.7403132548839) < 1e-9

    # through the query surface: constants in post-aggregations
    b64a = base64.b64encode(a).decode()
    b64b = base64.b64encode(b).decode()
    q = {"queryType": "timeseries", "dataSource": "events",
         "granularity": "all",
         "aggregations": [{"type": "count", "name": "rows"}],
         "postAggregations": [
             {"type": "thetaSketchEstimate", "name": "const_est",
              "field": {"type": "thetaSketchConstant", "name": "c",
                        "value": b64a}},
             {"type": "thetaSketchEstimate", "name": "inter",
              "field": {"type": "thetaSketchSetOp", "func": "INTERSECT",
                        "fields": [
                            {"type": "thetaSketchConstant", "name": "x",
                             "value": b64a},
                            {"type": "thetaSketchConstant", "name": "y",
                             "value": b64b}]}}]}
    r = translate(q, spark, catalog).first()
    assert r["const_est"] == 3.0 and r["inter"] == 2.0


# ---------------------------------------------------------------------------
# Druid-serialized DataSketches binary interop (HllSketch + DoublesSketch)
# ---------------------------------------------------------------------------

# goldens generated by datasketches-java 6.2.0 (the library Druid bundles)
_HLL_LIST_COMPACT = "AgEHDAMIBQBaoYgGEEDZBDWjUQXipREGXn+xBA=="          # 5 items
_HLL_LIST_UPD = "AgEHDAMABQBaoYgGEEDZBDWjUQXipREGXn+xBAAAAAAAAAAAAAAAAA=="
_DS_SMALL_COMPACT = ("AgMIGoAAAAAKAAAAAAAAAAAAAAAAAPg/AAAAAAAALkAAAAAAAAD4"
                     "PwAAAAAAAAhAAAAAAAAAEkAAAAAAAAAYQAAAAAAAAB5AAAAAAAAA"
                     "IkAAAAAAAAAlQAAAAAAAAChAAAAAAAAAK0AAAAAAAAAuQA==")
_DS_SMALL_UPD = ("AgMIAIAAAAAKAAAAAAAAAAAAAAAAAPg/AAAAAAAALkAAAAAAAAD4PwAA"
                 "AAAAAAhAAAAAAAAAEkAAAAAAAAAYQAAAAAAAAB5AAAAAAAAAIkAAAAAA"
                 "AAAlQAAAAAAAAChAAAAAAAAAK0AAAAAAAAAuQAAAAAAAAAAAAAAAAAAA"
                 "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA==")
_DS_EMPTY = "AQMIHoAAAAA="


def test_doubles_sketch_binary_parse_golden():
    """functions/doubles_sketch.py vs datasketches-java 6.2.0 goldens:
    getQuantile(INCLUSIVE) must match BIT-EXACTLY on both the compact and
    the updatable serialization of the same stream (10 items = 1.5*i)."""
    from incubator_druid_spark.functions.doubles_sketch import (
        parse_doubles_sketch, quantile, rank_of)
    java = {0.0: 1.5, 0.1: 1.5, 0.25: 4.5, 0.5: 7.5, 0.75: 12.0,
            0.9: 13.5, 0.99: 15.0, 1.0: 15.0}
    for b64 in (_DS_SMALL_COMPACT, _DS_SMALL_UPD):
        v = parse_doubles_sketch(b64)
        assert (v.n, v.k, v.min_item, v.max_item) == (10, 128, 1.5, 15.0)
        for r, want in java.items():
            assert quantile(v, r) == want, (b64[:16], r)
        assert rank_of(v, 7.5) == 0.5          # INCLUSIVE: 5 of 10 <= 7.5
        assert rank_of(v, 7.5, inclusive=False) == 0.4
    e = parse_doubles_sketch(_DS_EMPTY)
    assert e.is_empty and quantile(e, 0.5) is None


def test_doubles_sketch_multilevel_golden():
    """Deep-level compact sketch (k=16, n=5000, bitPattern=10011100):
    level weights 2^(level+1) must decode so every java quantile matches."""
    from tests.ds_goldens import MOD_N5K_K16_COMPACT, MOD_N5K_K16_UPD
    from incubator_druid_spark.functions.doubles_sketch import (
        parse_doubles_sketch, quantile)
    java = {0.0: 0.0, 0.1: 82.0, 0.25: 267.0, 0.5: 536.0, 0.75: 777.0,
            0.9: 912.0, 0.99: 972.0, 1.0: 996.0}
    for b64 in (MOD_N5K_K16_COMPACT, MOD_N5K_K16_UPD):
        v = parse_doubles_sketch(b64)
        assert v.n == 5000 and v.k == 16
        for r, want in java.items():
            assert quantile(v, r) == want


def test_doubles_sketch_exporter_roundtrip():
    """serialize_doubles_compact output re-parses exactly (and was verified
    to load in datasketches-java: DoublesSketch.wrap → same quantiles)."""
    from incubator_druid_spark.functions.doubles_sketch import (
        merge_views, parse_doubles_sketch, quantile, serialize_doubles_compact)
    v = parse_doubles_sketch(serialize_doubles_compact([3.5, 1.0, 2.0, 9.0]))
    assert (v.n, v.min_item, v.max_item) == (4, 1.0, 9.0)
    assert quantile(v, 0.5) == 2.0
    # merge = weighted-item concatenation across stored sketches
    a = parse_doubles_sketch(serialize_doubles_compact([1.0, 2.0]))
    b = parse_doubles_sketch(serialize_doubles_compact([3.0, 4.0, 5.0, 6.0]))
    m = merge_views([a, b])
    assert m.n == 6 and quantile(m, 0.5) == 3.0 and quantile(m, 1.0) == 6.0


def test_doubles_sketch_complex_column_query(spark, tmp_path):
    """quantilesDoublesSketch + To{Quantile,Rank,CDF} post-aggs over a
    BINARY column of Druid-serialized DoublesSketch bytes (the migrated-
    segment shape, DoublesSketchAggregatorFactory.java read path)."""
    import datetime

    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.functions.doubles_sketch import \
        serialize_doubles_compact

    t0 = datetime.datetime(2024, 1, 1)
    rows = [  # two "segments" per group, one per row
        ("a", bytearray(serialize_doubles_compact([1.0, 2.0, 3.0]))),
        ("a", bytearray(serialize_doubles_compact([4.0, 5.0]))),
        ("b", bytearray(serialize_doubles_compact([10.0, 20.0]))),
    ]
    df = spark.createDataFrame(
        [(t0, g, s) for g, s in rows],
        "__time timestamp, grp string, qsk binary")
    path = str(tmp_path / "seg.parquet")
    df.write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("seg", path)
    q = {"queryType": "groupBy", "dataSource": "seg", "granularity": "all",
         "dimensions": ["grp"],
         "aggregations": [{"type": "quantilesDoublesSketch", "name": "qs",
                           "fieldName": "qsk"}],
         "postAggregations": [
             {"type": "quantilesDoublesSketchToQuantile", "name": "med",
              "field": {"type": "fieldAccess", "fieldName": "qs"},
              "fraction": 0.5},
             {"type": "quantilesDoublesSketchToRank", "name": "rk",
              "field": {"type": "fieldAccess", "fieldName": "qs"},
              "value": 4.0},
             {"type": "quantilesDoublesSketchToCDF", "name": "cd",
              "field": {"type": "fieldAccess", "fieldName": "qs"},
              "splitPoints": [3.0]}]}
    out = {r["grp"]: r for r in translate(q, spark, cat).collect()}
    # group a = {1..5}: median (INCLUSIVE) = 3.0; rank(<4) = 3/5; cdf(<3)=2/5
    assert out["a"]["med"] == 3.0
    assert abs(out["a"]["rk"] - 0.6) < 1e-12
    assert [round(x, 6) for x in out["a"]["cd"]] == [0.4, 1.0]
    assert out["b"]["med"] == 10.0


def test_hll_sketch_binary_interop(spark, tmp_path):
    """Druid-serialized HllSketch bytes (LIST compact + updatable golden,
    datasketches-java 6.2.0) are consumed DIRECTLY by the engine's binary
    HLL path — Spark's hll_* functions are datasketches-backed, so
    hyperUnique/HLLSketchMerge over a migrated COMPLEX column needs no
    Python (HllSketchMergeAggregatorFactory.java read parity)."""
    import base64
    import datetime

    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import Catalog

    t0 = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(t0, "x", bytearray(base64.b64decode(_HLL_LIST_COMPACT))),
         (t0, "x", bytearray(base64.b64decode(_HLL_LIST_UPD)))],
        "__time timestamp, grp string, hsk binary")
    path = str(tmp_path / "hllseg.parquet")
    df.write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("seg", path)
    q = {"queryType": "groupBy", "dataSource": "seg", "granularity": "all",
         "dimensions": ["grp"],
         "aggregations": [{"type": "HLLSketchMerge", "name": "u",
                           "fieldName": "hsk"}]}
    out = translate(q, spark, cat).collect()
    # both sketches hold the same 5 values ("v0".."v4") → union estimate 5
    assert len(out) == 1 and int(out[0]["u"]) == 5


def test_hll_sketch_column_all_layouts(spark, tmp_path):
    """Druid-written HllSketch COMPLEX columns in every layout Druid can
    store — HLL_4/HLL_6/HLL_8 targets, compact and updatable serialization,
    coupon (LIST/SET) and dense HLL modes, mixed lgK — generated live via
    the SAME datasketches-java calls Druid's build/merge aggregators make
    (HllSketchObjectStrategy.java:49 wraps these bytes; serialization by
    toCompactByteArray/toUpdatableByteArray).  Merged through both the
    HLLSketchMerge and hyperUnique COMPLEX paths."""
    import datetime

    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import Catalog

    jvm = spark.sparkContext._jvm
    HllSketch = jvm.org.apache.datasketches.hll.HllSketch
    TgtHllType = jvm.org.apache.datasketches.hll.TgtHllType

    def sk_bytes(values, lgk=12, tgt="HLL_4", compact=True):
        sk = HllSketch(lgk, TgtHllType.valueOf(tgt))
        for v in values:
            sk.update(v)
        b = sk.toCompactByteArray() if compact else sk.toUpdatableByteArray()
        return bytearray(b)

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        # coupon-range group: 3 overlapping sketches over 80 keys → exact 80
        (t0, "small", sk_bytes([f"k{i}" for i in range(0, 80, 2)])),
        (t0, "small", sk_bytes([f"k{i}" for i in range(1, 80, 2)], tgt="HLL_6")),
        (t0, "small", sk_bytes([f"k{i}" for i in range(30, 60)], tgt="HLL_8",
                               compact=False)),
        # dense-HLL group: 20k distinct across two sketches w/ different lgK
        (t0, "big", sk_bytes([f"u{i}" for i in range(12000)], lgk=11)),
        (t0, "big", sk_bytes([f"u{i}" for i in range(8000, 20000)], lgk=13,
                             tgt="HLL_8", compact=False)),
    ]
    df = spark.createDataFrame(rows, "__time timestamp, grp string, hsk binary")
    path = str(tmp_path / "hll_layouts.parquet")
    df.write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("seg", path)
    for agg_type in ("HLLSketchMerge", "hyperUnique"):
        q = {"queryType": "groupBy", "dataSource": "seg",
             "granularity": "all", "dimensions": ["grp"],
             "aggregations": [{"type": agg_type, "name": "u",
                               "fieldName": "hsk"}]}
        out = {r["grp"]: int(r["u"]) for r in translate(q, spark, cat).collect()}
        assert out["small"] == 80, (agg_type, out)
        # dense mode: HLL relative standard error at lgK=11 is ~2.3%; allow 3σ
        assert abs(out["big"] - 20000) < 20000 * 0.07, (agg_type, out)


def test_theta_sketch_binary_column_merge(spark, tmp_path):
    """thetaSketch/sketchMerge over a COMPLEX BinaryType column of
    serialized compact theta sketches parses + UNIONs the stored sketches
    (datasketches theta/SketchMergeAggregatorFactory.java, SketchHolder.java
    union path) instead of silently count-distincting blobs.  Sketches are
    generated live via the SAME datasketches-java calls Druid's aggregators
    make (UpdateSketch.builder().build().update(v) → compact().toByteArray(),
    SketchHolder wraps exactly these bytes)."""
    import datetime

    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import Catalog

    jvm = spark.sparkContext._jvm
    US = jvm.org.apache.datasketches.theta.UpdateSketch

    def sk_bytes(values):
        b = US.builder().build()
        for v in values:
            b.update(v)
        return bytearray(b.compact().toByteArray())

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        # overlapping exact-mode sketches: {0..39} ∪ {20..59} → 60 distinct
        (t0, "x", sk_bytes([f"k{i}" for i in range(40)])),
        (t0, "x", sk_bytes([f"k{i}" for i in range(20, 60)])),
        # empty + single-item serial forms
        (t0, "y", sk_bytes([])),
        (t0, "y", sk_bytes(["only"])),
        # a null sketch cell must be ignored, not crash the merge
        (t0, "y", None),
    ]
    df = spark.createDataFrame(rows, "__time timestamp, grp string, tsk binary")
    path = str(tmp_path / "theta_seg.parquet")
    df.write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("seg", path)
    for agg_type in ("thetaSketch", "sketchMerge"):
        q = {"queryType": "groupBy", "dataSource": "seg", "granularity": "all",
             "dimensions": ["grp"],
             "aggregations": [{"type": agg_type, "name": "u",
                               "fieldName": "tsk"}]}
        out = {r["grp"]: r["u"] for r in translate(q, spark, cat).collect()}
        assert out["x"] == 60.0, (agg_type, out)
        assert out["y"] == 1.0, (agg_type, out)


def test_theta_sketch_binary_estimation_mode_union(spark, tmp_path):
    """Mixed exact/estimation-mode sketches union at the MINIMUM theta
    (SketchHolder union semantics): a downsampled (small-k) sketch over many
    values merges with an exact one and the estimate stays within the theta
    sketch's relative-error bounds (~1/sqrt(k))."""
    import datetime

    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.functions.theta_sketch import \
        parse_compact_theta

    jvm = spark.sparkContext._jvm
    US = jvm.org.apache.datasketches.theta.UpdateSketch

    def sk_bytes(values, k=None):
        bld = US.builder()
        if k is not None:
            bld = bld.setNominalEntries(k)
        b = bld.build()
        for v in values:
            b.update(v)
        return bytearray(b.compact().toByteArray())

    small_k = sk_bytes([f"v{i}" for i in range(50000)], k=1024)
    assert parse_compact_theta(bytes(small_k)).theta < 1.0  # really sampling
    exact = sk_bytes([f"v{i}" for i in range(40000, 60000)])

    t0 = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame([(t0, small_k), (t0, exact)],
                               "__time timestamp, tsk binary")
    path = str(tmp_path / "theta_est.parquet")
    df.write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("seg", path)
    q = {"queryType": "timeseries", "dataSource": "seg", "granularity": "all",
         "aggregations": [{"type": "thetaSketch", "name": "u",
                           "fieldName": "tsk"}]}
    got = translate(q, spark, cat).first()["u"]
    # true distinct = 60000; rse at k=1024 is ~3.1%, allow 4 sigma
    assert abs(got - 60000) < 60000 * 0.125, got
