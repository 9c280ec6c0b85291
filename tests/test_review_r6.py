"""Round-6 self-review regressions: filtered doubleMean over MVDs /
null rows (DoubleMeanAggregator has no nullable wrapper), schema-epoch
timestamp/long promotion (epoch MILLIS, not Spark's seconds cast),
Calcite-quoted function calls under lazy SQL registration, and the
schemaEvolution option's string-falsiness."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from incubator_druid_spark import translate


def test_filtered_double_mean_excludes_masked_rows(spark, tmp_path_factory):
    """A filtered doubleMean must not count filter-masked rows in the
    denominator (FilteredAggregator never calls aggregate()), while
    genuine null rows DO count as one 0-update."""
    import datetime
    from incubator_druid_spark.catalog import Catalog
    t0 = datetime.datetime(2020, 1, 1)
    rows = [(t0, "a", ["2.0", None, "4.0"], "6.0"),
            (t0, "a", None, None),          # null row: one 0-update
            (t0, "b", ["100.0"], "100.0")]  # filtered out
    df = spark.createDataFrame(
        rows, "`__time` timestamp, g string, mv array<string>, sv string")
    path = str(tmp_path_factory.mktemp("fmean") / "t.parquet")
    df.write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("fmean", path)
    out = translate({
        "queryType": "timeseries", "dataSource": "fmean",
        "granularity": "all", "intervals": ["2019-01-01/2021-01-01"],
        "aggregations": [
            {"type": "filtered",
             "filter": {"type": "selector", "dimension": "g", "value": "a"},
             "aggregator": {"type": "doubleMean", "name": "mv_mean",
                            "fieldName": "mv"}},
            {"type": "filtered",
             "filter": {"type": "selector", "dimension": "g", "value": "a"},
             "aggregator": {"type": "doubleMean", "name": "sv_mean",
                            "fieldName": "sv"}},
            {"type": "doubleMean", "name": "sv_mean_all",
             "fieldName": "sv"}],
    }, spark, cat).collect()
    r = out[0]
    # mv: row1 contributes (2+0+4)/3 elements, null row 0/1; b-row excluded
    assert r["mv_mean"] == pytest.approx(6.0 / 4.0)
    # sv: 6.0 and a 0-counted null row; b-row excluded
    assert r["sv_mean"] == pytest.approx(3.0)
    # unfiltered: (6 + 0 + 100) / 3 — null counts, b-row counts
    assert r["sv_mean_all"] == pytest.approx(106.0 / 3.0)


def test_schema_evolution_long_epoch_promotes_to_millis(spark,
                                                        tmp_path_factory):
    """A column stored as timestamp in one epoch and long epoch-millis in
    another must union to the SAME instants (timestamp_millis, not
    Spark's seconds-interpreting cast)."""
    import datetime
    import shutil
    from incubator_druid_spark.catalog import Catalog
    t = datetime.datetime(2024, 1, 15, 12, 0, 0)
    ms = int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
    base = tmp_path_factory.mktemp("evo_ts")
    df1 = spark.createDataFrame([(t, t, 1)],
                                "`__time` timestamp, ev timestamp, n long")
    df2 = spark.createDataFrame([(t, ms, 2)],
                                "`__time` timestamp, ev long, n long")
    for i, df in enumerate((df1, df2)):
        df.coalesce(1).write.mode("overwrite").parquet(
            str(base / f"e{i}"))
    combo = base / "combo"
    combo.mkdir()
    import os
    for i in range(2):
        for fn in os.listdir(base / f"e{i}"):
            if fn.endswith(".parquet"):
                shutil.copy(base / f"e{i}" / fn, combo / f"s{i}-{fn}")
    cat = Catalog(spark)
    cat.register("evo_ts", str(combo), schemaEvolution="true")
    got = cat.table("evo_ts").select("ev").collect()
    assert all(r["ev"] == t for r in got), got


def test_schema_evolution_false_string_disables(spark, tmp_path_factory):
    from incubator_druid_spark.catalog import Catalog
    df = spark.range(3).withColumn("__time", F.current_timestamp())
    path = str(tmp_path_factory.mktemp("plain") / "t.parquet")
    df.write.mode("overwrite").parquet(path)
    cat = Catalog(spark)
    cat.register("plain", path, schemaEvolution="false")
    # must take the plain reader path (no epoch sniffing) and still work
    assert cat.table("plain").count() == 3


def test_quoted_function_call_registers_lazily(spark, catalog):
    """Calcite double-quoted function names arrive backtick-quoted in the
    final SQL; the lazy registration scan must still register them."""
    from incubator_druid_spark.sql import functions as sf
    from incubator_druid_spark.sql.functions import druid_sql
    # force a fresh registration state for this check
    sf._FN_STATE.pop(spark, None)
    out = druid_sql(
        spark,
        'SELECT "TIME_FLOOR"(TIMESTAMP \'2024-03-05 10:30:00\', \'P1D\') '
        "AS d", catalog).collect()
    assert str(out[0]["d"])[:10] == "2024-03-05"
