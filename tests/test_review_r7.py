"""Round-7 self-review fixes, each regression-tested:

1. FILTERED expression aggregators keep column-type tags (_WhenContext
   exposes _types): `strdim * 2` under a filter takes the lenient
   double route, and `__time + N` resolves as millis — identically to
   the unfiltered twin, under ANSI on or off.
2. Virtual-column outputType casts are LENIENT: a string expression
   under outputType LONG truncates '10.1' → 10 and nulls garbage
   (DimensionHandlerUtils.convertObjectToLong), never throwing under an
   ANSI host.
3. Lambda BODIES keep outer-column type tags (the sub-parser shares the
   parent's tag sets): string columns concatenate, timestamp columns
   read as millis inside map()/filter().
4. round(x, scale_col) with a non-literal scale: integral inputs with
   scale >= 0 return exactly (no double corruption beyond 2^53), and a
   garbage scale nulls instead of throwing.
5. druid_sql's non-ANSI clone tracks host temp-view changes (a
   createOrReplaceTempView after the first call is visible).
"""

import datetime as _dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_druid_spark import translate
from incubator_druid_spark.catalog import Catalog

FULL = ["1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z"]


@pytest.fixture(scope="module")
def rv_catalog(spark, tmp_path_factory):
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("sdim", T.StringType()),
        T.StructField("snum", T.StringType()),
        T.StructField("big", T.LongType()),
        T.StructField("scl", T.LongType()),
    ])
    t = _dt.datetime(2000, 1, 1, tzinfo=_dt.timezone.utc)
    rows = [
        (t, "a", "6.55", 9007199254740993, 2),
        (t, "b", "3", 9007199254740995, 0),
        (t, "a", "oops", 7, -1),
    ]
    path = str(tmp_path_factory.mktemp("rv_ds") / "rv.parquet")
    spark.createDataFrame(rows, schema).write.parquet(path)
    cat = Catalog(spark)
    cat.register("rv", path)
    return cat


def test_filtered_expression_agg_keeps_tags(spark, rv_catalog):
    """#1 — the filtered aggregator's expression gets the same lenient
    string→double route as the unfiltered one: sum('6.55'*2 + '3'*2)
    filtered to sdim='a' is 13.1 ('oops' nulls out), never a cast
    error."""
    out = translate(
        {"queryType": "timeseries", "dataSource": "rv",
         "granularity": "all", "intervals": FULL,
         "aggregations": [
             {"type": "filtered",
              "filter": {"type": "selector", "dimension": "sdim",
                         "value": "a"},
              "aggregator": {"type": "doubleSum", "name": "s",
                             "expression": "snum * 2"}},
             {"type": "doubleSum", "name": "all_s",
              "expression": "snum * 2"}]},
        spark, rv_catalog).collect()[0]
    assert out["s"] == pytest.approx(13.1)
    assert out["all_s"] == pytest.approx(19.1)


def test_filtered_expression_agg_time_is_millis(spark, rv_catalog):
    """#1 — __time inside a FILTERED aggregator expression reads millis
    (longMax of __time + 1 == epoch millis + 1)."""
    expect = int(_dt.datetime(2000, 1, 1,
                              tzinfo=_dt.timezone.utc).timestamp() * 1000)
    out = translate(
        {"queryType": "timeseries", "dataSource": "rv",
         "granularity": "all", "intervals": FULL,
         "aggregations": [
             {"type": "filtered",
              "filter": {"type": "selector", "dimension": "sdim",
                         "value": "a"},
              "aggregator": {"type": "longMax", "name": "m",
                             "expression": "__time + 1"}}]},
        spark, rv_catalog).collect()[0]
    assert out["m"] == expect + 1


def test_virtual_column_output_type_lenient_cast(spark, rv_catalog):
    """#2 — outputType LONG over a string expression truncates decimals
    and nulls garbage; never a CAST_INVALID_INPUT under an ANSI host."""
    out = translate(
        {"queryType": "scan", "dataSource": "rv", "intervals": FULL,
         "virtualColumns": [{"type": "expression", "name": "v",
                             "expression": "concat(snum, '')",
                             "outputType": "LONG"}],
         "columns": ["snum", "v"]}, spark, rv_catalog).collect()
    got = {r["snum"]: r["v"] for r in out}
    assert got == {"6.55": 6, "3": 3, "oops": None}


def test_lambda_body_keeps_string_tags(spark):
    """#3 — inside map(x -> x + sdim, arr) the outer STRING column
    concatenates with the element (BinPlusExpr.evalString), because the
    lambda sub-parser shares the parent's tag sets."""
    from incubator_druid_spark.functions.druid_expr import compile_expr
    df = spark.createDataFrame([(["1", "2"], "s")],
                               "arr array<string>, sdim string")
    col = compile_expr("map((x) -> x + sdim, arr)", F.col,
                       string_cols={"sdim"}, array_cols={"arr"})
    assert df.select(col.alias("v")).first()["v"] == ["1s", "2s"]


def test_lambda_body_time_is_millis(spark):
    """#3 — a timestamp column referenced inside a lambda body reads as
    LONG millis."""
    from incubator_druid_spark.functions.druid_expr import compile_expr
    t = _dt.datetime(2000, 1, 1, tzinfo=_dt.timezone.utc)
    df = spark.createDataFrame([([1, 2], t)],
                               "arr array<long>, ts timestamp")
    col = compile_expr("map((x) -> x + ts, arr)", F.col,
                       array_cols={"arr"}, timestamp_cols={"ts"})
    millis = int(t.timestamp() * 1000)
    assert df.select(col.alias("v")).first()["v"] == [millis + 1,
                                                      millis + 2]


def test_round_column_scale_exact_longs(spark, rv_catalog):
    """#4 — round(big, scl) with a column scale: scale >= 0 over longs is
    the exact identity (9007199254740993 stays odd); negative scale
    rounds through the double leg."""
    out = translate(
        {"queryType": "scan", "dataSource": "rv", "intervals": FULL,
         "virtualColumns": [{"type": "expression", "name": "r",
                             "expression": "round(big, scl)"}],
         "columns": ["big", "scl", "r"]}, spark, rv_catalog).collect()
    got = {r["big"]: r["r"] for r in out}
    assert got[9007199254740993] == 9007199254740993  # scale 2: identity
    assert got[9007199254740995] == 9007199254740995  # scale 0: identity
    assert got[7] == 10                               # scale -1: HALF_UP


def test_non_ansi_clone_sees_replaced_temp_view(spark):
    """#5 — druid_sql under an ANSI host: replacing a host temp view
    between calls is visible (the clone cache keys on host state)."""
    from incubator_druid_spark.sql.functions import druid_sql
    host = spark.newSession()
    host.conf.set("spark.sql.ansi.enabled", "true")
    host.createDataFrame([(1,)], "a long").createOrReplaceTempView("rv7_t")
    r1 = druid_sql(host, "SELECT SUM(a) AS s FROM rv7_t").collect()[0]["s"]
    host.createDataFrame([(5,), (6,)], "a long") \
        .createOrReplaceTempView("rv7_t")
    r2 = druid_sql(host, "SELECT SUM(a) AS s FROM rv7_t").collect()[0]["s"]
    assert (r1, r2) == (1, 11)
