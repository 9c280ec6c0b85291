"""Regression tests for the eighth round-6 self-review batch:

1. Calendar period granularities honor `origin` (PeriodGranularity
   months-with-origin branch: buckets keep the origin's day-of-month and
   time); pre-epoch months floor correctly (pmod, not sign-following %);
   the month spine keeps true pre-epoch keys.
2. bucket extractionFn prints integer-valued buckets via the LONG
   rendering (no '1.0E7' scientific notation).
3. timeFormat extraction over a STRING column parses ISO strings.
4. scan columns resolve dotted join-prefix names via qcol.
5. DefaultDimensionSpec outputType coerces MVD elements per element.
6. The HTTP server answers 400 (not 500) to valid-JSON non-object bodies.
"""

import datetime

import pytest

from pyspark.sql import functions as F

from incubator_druid_spark import translate
from incubator_druid_spark.model.granularity import parse_granularity


def test_month_granularity_with_origin(spark):
    g = parse_granularity({"type": "period", "period": "P1M",
                           "origin": "2012-01-02T05:00:00Z"})
    df = spark.createDataFrame(
        [(datetime.datetime(2012, 1, 20),), (datetime.datetime(2012, 1, 1),)],
        "t timestamp")
    out = [r["f"] for r in df.select(g.floor(F.col("t")).alias("f"))
           .orderBy("t").collect()]
    # 2012-01-01 predates the Jan origin instant → previous period
    assert out[0] == datetime.datetime(2011, 12, 2, 5, 0)
    assert out[1] == datetime.datetime(2012, 1, 2, 5, 0)
    spine = g.spine(int(datetime.datetime(2012, 1, 1,
                                          tzinfo=datetime.timezone.utc)
                        .timestamp() * 1000),
                    int(datetime.datetime(2012, 3, 1,
                                          tzinfo=datetime.timezone.utc)
                        .timestamp() * 1000))
    starts = [datetime.datetime.fromtimestamp(t / 1000,
                                              datetime.timezone.utc)
              .strftime("%Y-%m-%dT%H") for t in spine]
    assert starts == ["2011-12-02T05", "2012-01-02T05", "2012-02-02T05"]


def test_pre_epoch_month_floor_and_spine(spark):
    g = parse_granularity({"type": "period", "period": "P2M"})
    df = spark.createDataFrame(
        [(datetime.datetime(1969, 5, 15),)], "t timestamp")
    out = df.select(g.floor(F.col("t")).alias("f")).collect()[0]["f"]
    assert out == datetime.datetime(1969, 5, 1)
    lo = int(datetime.datetime(1969, 11, 1, tzinfo=datetime.timezone.utc)
             .timestamp() * 1000)
    hi = int(datetime.datetime(1970, 2, 1, tzinfo=datetime.timezone.utc)
             .timestamp() * 1000)
    spine = g.spine(lo, hi)
    assert len(spine) == len(set(spine)) == 2  # 1969-11, 1970-01 (P2M)
    assert spine[0] < 0  # true pre-epoch key, not clamped to 0


def test_bucket_extraction_long_rendering(spark):
    from incubator_druid_spark.functions.extraction import compile_extraction
    df = spark.createDataFrame([(12345678.0,), (3.5,)], "v double")
    col = compile_extraction({"type": "bucket", "size": 10000000}, F.col("v"))
    out = [r["b"] for r in df.select(col.alias("b")).orderBy("v").collect()]
    assert out == ["0", "10000000"]
    col = compile_extraction({"type": "bucket", "size": 0.5}, F.col("v"))
    assert df.filter("v = 3.5").select(col.alias("b")) \
             .collect()[0]["b"] == "3.5"


def test_timeformat_extraction_over_string_column(spark):
    from incubator_druid_spark.functions.extraction import compile_extraction
    from pyspark.sql import types as T
    df = spark.createDataFrame(
        [("2024-01-05T00:00:00Z",), ("1704412800000",)], "s string")
    col = compile_extraction({"type": "timeFormat", "format": "yyyy-MM"},
                             F.col("s"), input_type=T.StringType())
    out = {r["s"]: r["m"] for r in df.select("s", col.alias("m")).collect()}
    assert out["2024-01-05T00:00:00Z"] == "2024-01"
    assert out["1704412800000"] == "2024-01"  # digit string = epoch millis


def test_scan_with_join_prefix_columns(spark, catalog):
    q = {"queryType": "scan",
         "dataSource": {"type": "join", "left": "orders",
                        "right": {"type": "globalTable", "name": "customer"},
                        "rightPrefix": "j0.",
                        "condition": "o_custkey == \"j0.c_custkey\"",
                        "joinType": "INNER"},
         "intervals": [], "columns": ["o_orderkey", "j0.c_name"],
         "limit": 3}
    rows = translate(q, spark, catalog).collect()
    assert len(rows) == 3 and all(r["j0.c_name"] for r in rows)


def test_default_dimension_output_type_over_mvd(spark, tmp_path):
    from incubator_druid_spark.catalog import Catalog
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1), ["7", "8"]),
         (datetime.datetime(2024, 1, 1), ["007"])],
        "__time timestamp, tags array<string>")
    df.write.mode("overwrite").parquet(str(tmp_path / "mv"))
    cat = Catalog(spark)
    cat.register("mv", str(tmp_path / "mv"))
    q = {"queryType": "groupBy", "dataSource": "mv", "granularity": "all",
         "intervals": [], "dimensions": [
             {"type": "default", "dimension": "tags", "outputName": "t",
              "outputType": "LONG"}],
         "aggregations": [{"type": "count", "name": "n"}]}
    out = {r["t"]: r["n"] for r in translate(q, spark, cat).collect()}
    assert out == {7: 2, 8: 1}  # '7' and '007' coerce to ONE long key


def test_server_rejects_non_object_json():
    from incubator_druid_spark.server import make_handler
    h = make_handler(None, None)
    # exercise the body-shape guard directly (no socket): a JSON string
    # body must 400, not AttributeError into a 500
    import json as _json
    sent = {}

    class Fake(h):
        def __init__(self):  # bypass BaseHTTPRequestHandler socket setup
            self.headers = {"Content-Length": "10"}

        class _R:
            @staticmethod
            def read(n):
                return b'"SELECT 1"'
        rfile = _R()

        def _send(self, code, payload, ct=None):
            sent["code"] = code
            sent["payload"] = payload

    Fake().do_POST()
    assert sent["code"] == 400 and "JSON object" in str(sent["payload"]) \
        or "JSON" in str(sent["payload"])
