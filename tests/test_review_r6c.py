"""Regression tests for the fourth round-6 self-review batch (older core):

1. __bucket partition pruning floors the LOWER bound to the table's
   segment granularity (an interval starting mid-segment must not prune
   away the first partially-covered partition).
2. timestampSpec format 'auto' reads numeric input as epoch MILLIS
   (TimestampParser.java), not Spark's seconds-interpreting cast.
3. rollup=false + metricsSpec stores ROW-LEVEL metric columns.
4. filtered aggregator naming: the WRAPPER's name wins
   (FilteredAggregatorFactory.getName), including in zero-fill.
5. inline datasource honors columnTypes (all-null DOUBLE column).
6. streaming rollup REFUSES calendar queryGranularity loudly.
7. timeFormat extraction with format=null + tz prints the real zone
   offset, not 'Z'.
8. embedding_near_dup_pairs returns an empty pair frame on empty input.
9. sessionize splits at EXACTLY gap — identical to session_window.
"""

import datetime

import pytest

from pyspark.sql import functions as F

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog


def _mk_events(spark):
    rows = [(datetime.datetime(2024, 1, d, h, tzinfo=datetime.timezone.utc),
             f"u{d % 3}", float(d * 10 + h))
            for d in range(10, 15) for h in (2, 9, 16, 23)]
    return spark.createDataFrame(
        [(t.replace(tzinfo=None), u, v) for t, u, v in rows],
        "ts timestamp, user string, value double")


def _ingest(spark, tmp_path, df, name, seg_gran="day", rollup=False,
            metrics=None, qgran="none"):
    from incubator_druid_spark.sources.ingest import ingest
    src = str(tmp_path / f"{name}_src")
    df.write.mode("overwrite").parquet(src)
    cat = Catalog(spark)
    spec = {"dataSchema": {
                "dataSource": name,
                "timestampSpec": {"column": "ts", "format": "iso"},
                "dimensionsSpec": {"dimensions": ["user"]},
                "metricsSpec": metrics or [],
                "granularitySpec": {"segmentGranularity": seg_gran,
                                    "queryGranularity": qgran,
                                    "rollup": rollup}},
            "ioConfig": {"inputSource": {"type": "local", "files": [src]},
                         "inputFormat": {"type": "parquet"}}}
    ingest(spark, spec, cat, str(tmp_path))
    return cat


def test_bucket_prune_mid_segment_interval(spark, tmp_path):
    metrics = [{"type": "doubleSum", "name": "value", "fieldName": "value"}]
    cat = _ingest(spark, tmp_path, _mk_events(spark), "ev_day",
                  metrics=metrics)
    # interval starts at NOON of Jan 12 — the '2024-01-12T00' partition is
    # partially covered and must not be pruned
    q = {"queryType": "timeseries", "dataSource": "ev_day",
         "granularity": "all",
         "intervals": ["2024-01-12T12:00:00Z/2024-01-14T00:00:00Z"],
         "aggregations": [{"type": "count", "name": "rows"}]}
    out = translate(q, spark, cat).collect()
    assert out[0]["rows"] == 2 + 4  # Jan-12 16:00,23:00 + all of Jan-13
    # pruning still happens: the partition filter floor is the DAY start
    df = translate(q, spark, cat)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "2024-01-12T00" in plan or "__bucket" in plan


def test_bucket_prune_still_prunes_partitions(spark, tmp_path):
    cat = _ingest(spark, tmp_path, _mk_events(spark), "ev_day2")
    q = {"queryType": "scan", "dataSource": "ev_day2",
         "intervals": ["2024-01-12T12:00:00Z/2024-01-13T00:00:00Z"],
         "columns": ["user"]}
    df = translate(q, spark, cat)
    # input_file_name() post-execution reflects the runtime PartitionFilters
    # (inputFiles() lists the relation's unpruned files)
    fs = [r[0] for r in df.select(F.input_file_name()).distinct().collect()]
    assert fs and all("__bucket=2024-01-12T00" in f for f in fs)


def test_timestamp_auto_numeric_is_millis(spark):
    from incubator_druid_spark.sources.ingest import _apply_timestamp
    df = spark.createDataFrame([(1315964416000,)], "ts long")
    out = _apply_timestamp(df, {"column": "ts", "format": "auto"}).collect()
    assert out[0]["__time"].year == 2011
    # string ISO input still parses
    df = spark.createDataFrame([("2011-09-14T00:00:00Z",)], "ts string")
    out = _apply_timestamp(df, {"column": "ts", "format": "auto"}).collect()
    assert out[0]["__time"].year == 2011
    # digit STRING is millis too
    df = spark.createDataFrame([("1315964416000",)], "ts string")
    out = _apply_timestamp(df, {"column": "ts", "format": "auto"}).collect()
    assert out[0]["__time"].year == 2011


def test_norollup_metrics_stored_rowlevel(spark, tmp_path):
    metrics = [{"type": "doubleSum", "name": "added", "fieldName": "value"},
               {"type": "count", "name": "cnt"}]
    cat = _ingest(spark, tmp_path, _mk_events(spark), "ev_nr",
                  metrics=metrics)
    t = cat.table("ev_nr")
    assert "added" in t.columns and "cnt" in t.columns
    row = t.orderBy("__time").limit(1).collect()[0]
    assert row["cnt"] == 1 and row["added"] is not None
    # and a query summing the metric works
    q = {"queryType": "timeseries", "dataSource": "ev_nr",
         "granularity": "all", "intervals": [],
         "aggregations": [{"type": "doubleSum", "name": "s",
                           "fieldName": "added"}]}
    out = translate(q, spark, cat).collect()
    assert out[0]["s"] > 0


def test_filtered_agg_wrapper_name_wins(spark, catalog):
    q = {"queryType": "timeseries", "dataSource": "events",
         "granularity": "day",
         "intervals": ["2024-01-01T00:00:00Z/2024-01-04T00:00:00Z"],
         "aggregations": [
             {"type": "filtered", "name": "outer",
              "filter": {"type": "selector", "dimension": "event_type",
                         "value": "click"},
              "aggregator": {"type": "count", "name": "inner"}}],
         "postAggregations": [
             {"type": "arithmetic", "name": "doubled", "fn": "*",
              "fields": [{"type": "fieldAccess", "fieldName": "outer"},
                         {"type": "constant", "value": 2}]}]}
    df = translate(q, spark, catalog)
    assert "outer" in df.columns and "inner" not in df.columns
    rows = df.collect()
    assert all(r["doubled"] == 2 * r["outer"] for r in rows)


def test_inline_datasource_column_types(spark, catalog):
    q = {"queryType": "scan",
         "dataSource": {"type": "inline",
                        "columnNames": ["k", "v"],
                        "columnTypes": ["STRING", "DOUBLE"],
                        "rows": [["a", None], ["b", None]]},
         "intervals": [], "columns": ["k", "v"]}
    df = translate(q, spark, catalog)
    assert dict(df.dtypes)["v"] == "double"
    assert df.count() == 2
    # declared DOUBLE with integer-looking values stays double
    q["dataSource"]["rows"] = [["a", 1], ["b", 2]]
    df = translate(q, spark, catalog)
    assert dict(df.dtypes)["v"] == "double"


def test_streaming_calendar_rollup_refused(spark, tmp_path):
    from incubator_druid_spark.streaming.ingest import build_streaming_ingest
    src = (spark.readStream.format("rate").load()
                .selectExpr("timestamp AS ts",
                            "CAST(value AS STRING) AS user"))
    spec = {"dataSchema": {
                "dataSource": "s1",
                "timestampSpec": {"column": "ts", "format": "iso"},
                "dimensionsSpec": {"dimensions": ["user"]},
                "metricsSpec": [{"type": "count", "name": "cnt"}],
                "granularitySpec": {"rollup": True,
                                    "queryGranularity": "month"}},
            "ioConfig": {}}
    with pytest.raises((ValueError, NotImplementedError),
                       match="fixed queryGranularity"):
        build_streaming_ingest(spark, spec, str(tmp_path / "out"),
                               source_override=src)


def test_timeformat_null_format_tz_prints_offset(spark):
    from incubator_druid_spark.functions.extraction import compile_extraction
    df = spark.createDataFrame(
        [(datetime.datetime(2011, 1, 1, 0, 0),)], "t timestamp")
    col = compile_extraction({"type": "timeFormat",
                              "timeZone": "America/Los_Angeles"},
                             F.col("t"))
    out = df.select(col.alias("s")).collect()[0]["s"]
    assert out == "2010-12-31T16:00:00.000-08:00"
    # DST summer instant renders -07:00
    df = spark.createDataFrame(
        [(datetime.datetime(2011, 7, 1, 0, 0),)], "t timestamp")
    out = df.select(col.alias("s")).collect()[0]["s"]
    assert out.endswith("-07:00")


def test_embedding_near_dup_empty_input(spark):
    from incubator_druid_spark.pipeline.similarity import \
        embedding_near_dup_pairs
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = embedding_near_dup_pairs(df)
    assert out.count() == 0
    assert set(out.columns) == {"id_a", "id_b", "cosine"}


def test_sessionize_boundary_matches_session_window(spark):
    from incubator_druid_spark.pipeline.sessions import (sessionize,
                                                         session_window_stats)
    t0 = datetime.datetime(2024, 1, 1, 0, 0)
    rows = [("u", t0), ("u", t0 + datetime.timedelta(minutes=30)),
            ("u", t0 + datetime.timedelta(minutes=45))]
    df = spark.createDataFrame(rows, "user_id string, __time timestamp")
    s = sessionize(df, gap_minutes=30.0)
    n_batch = s.select("session_id").distinct().count()
    n_stream = session_window_stats(df, gap_minutes=30.0).count()
    # Spark's session_window MERGES an event at exactly last+gap — the
    # batch form's strict > reproduces that: one session for [0, 30m, 45m]
    assert n_batch == n_stream == 1
    # and a gap strictly beyond the threshold splits in both
    rows2 = [("u", t0), ("u", t0 + datetime.timedelta(minutes=31))]
    df2 = spark.createDataFrame(rows2, "user_id string, __time timestamp")
    assert sessionize(df2, gap_minutes=30.0) \
        .select("session_id").distinct().count() == 2
    assert session_window_stats(df2, gap_minutes=30.0).count() == 2
