"""URI-loaded lookups (functions/lookups.py register_lookup_uri) — the
lookups-cached-global URI namespace
(extensions-core/lookups-cached-global/.../UriExtractionNamespace.java):
csv/tsv/simpleJson/customJson parse specs, the small-map (literal) vs
DataFrame-backed (broadcast join, never on the driver) regimes, and the
df-backed path through every consumer: expression lookup, SQL LOOKUP(),
lookup.<name> tables and the native lookup datasource."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture(autouse=True)
def _clean_registry():
    from incubator_druid_spark.functions import lookups as lk
    saved = (dict(lk._LOOKUPS), dict(lk._DF_LOOKUPS))
    yield
    lk._LOOKUPS.clear()
    lk._LOOKUPS.update(saved[0])
    lk._DF_LOOKUPS.clear()
    lk._DF_LOOKUPS.update(saved[1])
    lk._LOOKUP_DFS.clear()


def test_csv_header_and_tsv_columns(spark, tmp_path):
    from incubator_druid_spark.functions.lookups import (get_lookup,
                                                         register_lookup_uri)
    p = tmp_path / "m.csv"
    p.write_text("key,val\na,apple\nb,banana\n")
    n = register_lookup_uri(spark, "uri_csv", str(p), fmt="csv")
    assert n == 2
    assert get_lookup("uri_csv") == {"a": "apple", "b": "banana"}

    p2 = tmp_path / "m.tsv"
    p2.write_text("x\tex\ny\twhy\n")
    register_lookup_uri(spark, "uri_tsv", str(p2), fmt="tsv",
                        columns=["k", "v"])
    assert get_lookup("uri_tsv") == {"x": "ex", "y": "why"}


def test_simple_and_custom_json(spark, tmp_path):
    from incubator_druid_spark.functions.lookups import (get_lookup,
                                                         register_lookup_uri)
    p = tmp_path / "m.json"
    p.write_text('{"foo": "bar"}\n{"baz": "bat"}\n')
    register_lookup_uri(spark, "uri_sj", str(p), fmt="simpleJson")
    assert get_lookup("uri_sj") == {"foo": "bar", "baz": "bat"}

    p2 = tmp_path / "c.json"
    p2.write_text('{"code": "us", "name": "United States", "x": 1}\n'
                  '{"code": "fr", "name": "France", "x": 2}\n')
    register_lookup_uri(spark, "uri_cj", str(p2), fmt="customJson",
                        key_column="code", value_column="name")
    assert get_lookup("uri_cj") == {"us": "United States", "fr": "France"}


def test_df_backed_regime_never_collects(spark, tmp_path):
    from incubator_druid_spark.functions import lookups as lk
    p = tmp_path / "big.csv"
    p.write_text("key,val\n" + "".join(f"k{i},v{i}\n" for i in range(50)))
    n = lk.register_lookup_uri(spark, "uri_big", str(p),
                               collect_threshold=10)
    assert n == 50
    assert lk.is_df_lookup("uri_big")
    with pytest.raises(ValueError, match="DataFrame-backed"):
        lk.get_lookup("uri_big")
    # expression path: lookup_column defers to a broadcast join that the
    # plan layer applies (flush) BEFORE the column is consumed
    df = spark.createDataFrame([("k7",), ("k12",), ("nope",)], "d string")
    vcol = lk.lookup_column("uri_big", F.col("d"),
                            replace_missing="MISS").alias("v")
    out = lk.flush_lookup_joins(df).select(F.col("d"), vcol)
    got = {r["d"]: r["v"] for r in out.collect()}
    assert got == {"k7": "v7", "k12": "v12", "nope": "MISS"}


def test_df_backed_sql_lookup_fn_and_table(spark, catalog, tmp_path):
    from incubator_druid_spark.functions import lookups as lk
    from incubator_druid_spark.sql.functions import druid_sql
    p = tmp_path / "sqlbig.csv"
    p.write_text("key,val\n" + "".join(f"s{i},t{i}\n" for i in range(40)))
    lk.register_lookup_uri(spark, "uri_sql", str(p), collect_threshold=5)
    out = druid_sql(spark, "SELECT LOOKUP('s3', 'uri_sql') AS v", catalog)
    assert out.collect()[0]["v"] == "t3"
    out2 = druid_sql(
        spark, "SELECT k, v FROM lookup.uri_sql WHERE k = 's11'", catalog)
    assert [tuple(r) for r in out2.collect()] == [("s11", "t11")]


def test_df_backed_native_lookup_datasource(spark, catalog, tmp_path):
    from incubator_druid_spark import translate
    from incubator_druid_spark.functions import lookups as lk
    p = tmp_path / "native.csv"
    p.write_text("key,val\n" + "".join(f"n{i},w{i}\n" for i in range(30)))
    lk.register_lookup_uri(spark, "uri_native", str(p), collect_threshold=5)
    q = {"queryType": "scan", "dataSource": {"type": "lookup",
                                             "lookup": "uri_native"},
         "intervals": [], "columns": ["k", "v"]}
    rows = {r["k"]: r["v"] for r in translate(q, spark, catalog).collect()}
    assert rows["n4"] == "w4" and len(rows) == 30


def test_duplicate_keys_deduped(spark, tmp_path):
    from incubator_druid_spark.functions import lookups as lk
    p = tmp_path / "dup.csv"
    p.write_text("key,val\nz,one\nz,two\n" +
                 "".join(f"d{i},x\n" for i in range(20)))
    lk.register_lookup_uri(spark, "uri_dup", str(p), collect_threshold=3)
    df = spark.createDataFrame([("z",)], "d string")
    vcol = lk.lookup_column("uri_dup", F.col("d")).alias("v")
    out = lk.flush_lookup_joins(df).select(vcol)
    assert out.count() == 1  # unique-key contract: no row multiplication


def test_small_uri_lookup_native_datasource(spark, catalog, tmp_path):
    # the SMALL (collected) regime must also be reachable through the
    # native lookup datasource — it registers in the functions registry
    # only, and Catalog.lookup_map must fall back to it
    from incubator_druid_spark import translate
    from incubator_druid_spark.functions import lookups as lk
    p = tmp_path / "small.csv"
    p.write_text("key,val\na,apple\nb,banana\n")
    lk.register_lookup_uri(spark, "uri_small_native", str(p))
    q = {"queryType": "scan", "dataSource": {"type": "lookup",
                                             "lookup": "uri_small_native"},
         "intervals": [], "columns": ["k", "v"]}
    rows = {r["k"]: r["v"] for r in translate(q, spark, catalog).collect()}
    assert rows == {"a": "apple", "b": "banana"}


def test_one_column_file_with_key_column_raises_clearly(spark, tmp_path):
    from incubator_druid_spark.functions import lookups as lk
    p = tmp_path / "one.csv"
    p.write_text("key\x01val\na\x01apple\n")  # wrong delimiter → 1 column
    with pytest.raises(ValueError, match="check the delimiter"):
        lk.register_lookup_uri(spark, "uri_one", str(p), fmt="csv",
                               key_column="key")
