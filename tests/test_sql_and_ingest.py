"""SQL surface, batch ingestion, and streaming ingestion tests."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


# -- Druid SQL functions -----------------------------------------------------

def test_druid_sql_functions(spark, foo_catalog):
    from incubator_druid_spark.sql.functions import druid_sql
    out = druid_sql(spark, """
        SELECT TIME_FLOOR(__time, 'P1Y') AS y,
               sum(m2) AS sm,
               APPROX_COUNT_DISTINCT(dim1) AS card
        FROM foo GROUP BY 1 ORDER BY 1
    """, foo_catalog)
    got = [(str(r["y"]), r["sm"], r["card"]) for r in out.collect()]
    assert got == [("2000-01-01 00:00:00", 6.0, 3),
                   ("2001-01-01 00:00:00", 15.0, 3)]


def test_sql_mv_functions(spark, foo_catalog):
    from incubator_druid_spark.sql.functions import druid_sql
    out = druid_sql(spark, """
        SELECT dim1, MV_LENGTH(dim3) AS n, MV_CONTAINS(dim2, 'a') AS has_a,
               MV_TO_STRING(dim3, '|') AS joined
        FROM foo WHERE dim1 = ''
    """, foo_catalog).first()
    assert out["n"] == 2 and out["has_a"] is True and out["joined"] == "a|b"


def test_sql_time_functions(spark, foo_catalog):
    from incubator_druid_spark.sql.functions import druid_sql
    r = druid_sql(spark, """
        SELECT TIME_SHIFT(TIME_PARSE('2024-03-05 13:00:00'), 'PT1H', 3) AS t,
               TIMESTAMP_TO_MILLIS(TIME_PARSE('1970-01-01 00:00:01')) AS ms,
               TIME_IN_INTERVAL(TIME_PARSE('2024-06-01 00:00:00'),
                                '2024-01-01/2025-01-01') AS inside,
               TIME_FLOOR(TIME_PARSE('2024-03-07 10:00:00'), 'P1W') AS wk,
               STRPOS('abcdef', 'cd') AS p,
               SAFE_DIVIDE(1.0, 0.0) AS sd,
               LOOKUP('abc', 'lookyloo') AS lk
    """).first()
    assert str(r["t"]) == "2024-03-05 16:00:00"
    assert r["ms"] == 1000
    assert r["inside"] is True
    assert str(r["wk"]) == "2024-03-04 00:00:00"  # ISO Monday
    assert r["p"] == 3
    assert r["sd"] is None
    assert r["lk"] == "xabc"


# -- batch ingestion ---------------------------------------------------------

@pytest.fixture(scope="module")
def ingest_dirs(tmp_path_factory):
    src = tmp_path_factory.mktemp("ingest_src")
    sink = tmp_path_factory.mktemp("ingest_sink")
    lines = [
        {"t": "2024-01-01T10:00:00Z", "site": "a", "clicks": 3, "skip": False},
        {"t": "2024-01-01T10:30:00Z", "site": "a", "clicks": 2, "skip": False},
        {"t": "2024-01-01T11:00:00Z", "site": "b", "clicks": 5, "skip": False},
        {"t": "2024-01-02T09:00:00Z", "site": "a", "clicks": 7, "skip": True},
    ]
    p = src / "data.json"
    p.write_text("\n".join(json.dumps(l) for l in lines))
    return str(p), str(sink)


def test_batch_ingest_with_rollup(spark, ingest_dirs):
    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.sources.ingest import ingest
    src, sink = ingest_dirs
    spec = {
        "dataSchema": {
            "dataSource": "clicks_rollup",
            "timestampSpec": {"column": "t", "format": "iso"},
            "dimensionsSpec": {"dimensions": ["site"]},
            "transformSpec": {
                "transforms": [{"name": "site_upper",
                                "expression": "upper(site)"}],
                "filter": {"type": "selector", "dimension": "skip",
                           "value": "false"}},
            "metricsSpec": [{"type": "longSum", "name": "clicks",
                             "fieldName": "clicks"},
                            {"type": "count", "name": "cnt"}],
            "granularitySpec": {"segmentGranularity": "day",
                                "queryGranularity": "hour", "rollup": True},
        },
        "ioConfig": {"inputSource": {"type": "local", "files": [src]},
                     "inputFormat": {"type": "json"}},
    }
    cat = Catalog(spark)
    path = ingest(spark, spec, cat, sink)
    out = cat.table("clicks_rollup")
    got = rows(out, "__time", "site", "clicks", "cnt")
    # 10:00+10:30 rolled into the 10:00 hour bucket; skip=True row filtered
    import datetime
    assert got == [
        (datetime.datetime(2024, 1, 1, 10), "a", 5, 2),
        (datetime.datetime(2024, 1, 1, 11), "b", 5, 1),
    ]
    # segment layout: day-partition directories
    assert any("__bucket=2024-01-01" in d for d in os.listdir(path))


def test_csv_and_regex_input_formats(spark, tmp_path):
    from incubator_druid_spark.sources.ingest import read_input
    csv = tmp_path / "in.csv"
    csv.write_text("2024-01-01,alpha,10\n2024-01-02,beta,20\n")
    df = read_input(spark, {
        "inputSource": {"type": "local", "files": [str(csv)]},
        "inputFormat": {"type": "csv", "columns": ["d", "name", "v"]}})
    assert df.count() == 2 and df.columns == ["d", "name", "v"]

    logf = tmp_path / "in.log"
    logf.write_text("INFO 2024-01-01 start\nWARN 2024-01-02 stop\n")
    df2 = read_input(spark, {
        "inputSource": {"type": "local", "files": [str(logf)]},
        "inputFormat": {"type": "regex",
                        "pattern": r"(\w+) (\S+) (\w+)",
                        "columns": ["level", "day", "msg"]}})
    assert rows(df2, "level", "msg") == [("INFO", "start"), ("WARN", "stop")]


def test_information_schema_and_sys_tables(spark, foo_catalog):
    """Druid SQL metadata surface (InformationSchema.java / SystemSchema.java):
    dotted INFORMATION_SCHEMA.* / sys.segments names run verbatim."""
    from incubator_druid_spark.sql.functions import druid_sql
    t = druid_sql(spark, "SELECT TABLE_NAME FROM INFORMATION_SCHEMA.TABLES "
                         "ORDER BY TABLE_NAME", foo_catalog)
    assert "foo" in [r[0] for r in t.collect()]
    c = druid_sql(spark, "SELECT COLUMN_NAME, DATA_TYPE FROM "
                         "INFORMATION_SCHEMA.COLUMNS WHERE TABLE_NAME = 'foo'",
                  foo_catalog)
    types = {r[0]: r[1] for r in c.collect()}
    assert types["__time"] == "TIMESTAMP"
    assert types["m2"] == "DOUBLE"
    assert types["dim1"] == "VARCHAR"
    assert types["dim2"] == "ARRAY<VARCHAR>"
    s = druid_sql(spark, "SELECT datasource, size FROM sys.segments", foo_catalog)
    assert any(r["datasource"] == "foo" and r["size"] > 0 for r in s.collect())
    srv = druid_sql(spark, "SELECT server, server_type FROM sys.servers",
                    foo_catalog).collect()
    assert len(srv) == 1 and srv[0]["server_type"] == "historical"
    assert druid_sql(spark, "SELECT * FROM sys.tasks", foo_catalog).count() == 0


def test_rollup_sketch_column_roundtrip(spark, tmp_path):
    """COMPLEX sketch columns: rollup ingest stores a mergeable HLL binary
    per (bucket, dims) row; query-time hyperUnique detects the BinaryType
    column and merges across rows (AggregatorFactory partial/combine
    contract — HyperUniquesAggregatorFactory serde in the reference)."""
    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.sources.ingest import ingest

    src = tmp_path / "visits.csv"
    src.write_text("".join(
        f"2024-01-0{d},s{s},u{u}\n"
        for d, s, u in [(1, 1, 1), (1, 1, 2), (1, 2, 3),
                        (2, 1, 2), (2, 2, 3), (2, 2, 4), (2, 2, 5)]))
    cat = Catalog(spark)
    ingest(spark, {
        "dataSchema": {
            "dataSource": "visits",
            "timestampSpec": {"column": "d", "format": "auto"},
            "dimensionsSpec": {"dimensions": ["site"]},
            "metricsSpec": [
                {"type": "count", "name": "cnt"},
                {"type": "hyperUnique", "name": "uniq_users",
                 "fieldName": "user"}],
            "granularitySpec": {"segmentGranularity": "day",
                                "queryGranularity": "day", "rollup": True}},
        "ioConfig": {"inputSource": {"type": "local", "files": [str(src)]},
                     "inputFormat": {"type": "csv",
                                     "columns": ["d", "site", "user"]}}},
        cat, str(tmp_path / "seg"))

    stored = cat.table("visits")
    assert dict(stored.dtypes)["uniq_users"] == "binary"  # sketch, not number
    assert stored.count() == 4                            # (2 days × 2 sites)

    r = translate({"queryType": "timeseries", "dataSource": "visits",
                   "granularity": "all",
                   "aggregations": [
                       {"type": "longSum", "name": "rows", "fieldName": "cnt"},
                       {"type": "hyperUnique", "name": "uniq",
                        "fieldName": "uniq_users"}]},
                  spark, cat).first()
    assert r["rows"] == 7
    assert r["uniq"] == 5  # users u1..u5, merged across day/site partials


def _pb_varint(n: int) -> bytes:
    n &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def _pb_tag(fnum, wtype):
    return _pb_varint((fnum << 3) | wtype)


def _pb_ld(fnum, payload: bytes) -> bytes:
    return _pb_tag(fnum, 2) + _pb_varint(len(payload)) + payload


def _pb_vi(fnum, n) -> bytes:
    return _pb_tag(fnum, 0) + _pb_varint(n)


def _pb_field(name, number, ftype, label=1, type_name=None) -> bytes:
    b = _pb_ld(1, name.encode()) + _pb_vi(3, number) + _pb_vi(4, label) + \
        _pb_vi(5, ftype)
    if type_name:
        b += _pb_ld(6, type_name.encode())
    return b


def _pb_descriptor_set(tmp_path):
    """Hand-encoded `protoc --descriptor_set_out` equivalent for
    message t.Event{int64 ts=1; string name=2; double value=3;
    repeated int32 flags=4 [packed]; t.Meta meta=5} / t.Meta{string src=1}."""
    event = (_pb_ld(1, b"Event")
             + _pb_ld(2, _pb_field("ts", 1, 3))
             + _pb_ld(2, _pb_field("name", 2, 9))
             + _pb_ld(2, _pb_field("value", 3, 1))
             + _pb_ld(2, _pb_field("flags", 4, 5, label=3))
             + _pb_ld(2, _pb_field("meta", 5, 11, type_name=".t.Meta")))
    meta = _pb_ld(1, b"Meta") + _pb_ld(2, _pb_field("src", 1, 9))
    fdp = (_pb_ld(1, b"t.proto") + _pb_ld(2, b"t")
           + _pb_ld(4, event) + _pb_ld(4, meta))
    desc = tmp_path / "event.desc"
    desc.write_bytes(_pb_ld(1, fdp))
    return str(desc)


def _pb_event(ts, name, value, flags, src) -> bytes:
    import struct as S
    packed = b"".join(_pb_varint(f) for f in flags)
    return (_pb_vi(1, ts) + _pb_ld(2, name.encode())
            + _pb_tag(3, 1) + S.pack("<d", value)
            + _pb_ld(4, packed)
            + _pb_ld(5, _pb_ld(1, src.encode())))


def test_protobuf_input_format(spark, tmp_path):
    """Wire-format decode against a compiled descriptor set
    (protobuf-extensions ProtobufInputFormat.java semantics) — covers
    varint/negative int, double, string, packed repeated, nested message."""
    from incubator_druid_spark.sources.ingest import read_input
    desc = _pb_descriptor_set(tmp_path)
    (tmp_path / "m1.pb").write_bytes(
        _pb_event(1704067200000, "alpha", 1.5, [1, -2, 3], "web"))
    (tmp_path / "m2.pb").write_bytes(
        _pb_event(1704153600000, "beta", -2.25, [], "app"))
    fmt = {"type": "protobuf",
           "protoBytesDecoder": {"type": "file", "descriptor": desc,
                                  "protoMessageType": "t.Event"}}
    df = read_input(spark, {
        "inputSource": {"type": "local",
                        "files": [str(tmp_path / "m1.pb"),
                                  str(tmp_path / "m2.pb")]},
        "inputFormat": fmt})
    got = {r["name"]: r for r in df.collect()}
    assert got["alpha"]["ts"] == 1704067200000
    assert got["alpha"]["flags"] == [1, -2, 3]
    assert got["alpha"]["meta"]["src"] == "web"
    assert got["beta"]["value"] == -2.25 and got["beta"]["flags"] == []

    # varint-length-delimited stream file (two messages, one file)
    stream = tmp_path / "stream.pb"
    m1 = _pb_event(1, "s1", 0.5, [7], "x")
    m2 = _pb_event(2, "s2", 1.5, [8, 9], "y")
    stream.write_bytes(_pb_varint(len(m1)) + m1 + _pb_varint(len(m2)) + m2)
    df2 = read_input(spark, {
        "inputSource": {"type": "local", "files": [str(stream)]},
        "inputFormat": {**fmt, "delimited": True}})
    assert sorted(r["name"] for r in df2.collect()) == ["s1", "s2"]


def test_compaction_rerollup_merges_sketch_state(spark, tmp_path):
    """CompactionTask with a granularitySpec override: hour-grain rollup
    re-rolled to day-grain must MERGE the stored HLL state, keeping the
    distinct count correct across the collapsed buckets."""
    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.sources.ingest import ingest
    from incubator_druid_spark.streaming.ingest import compact

    src = tmp_path / "v.csv"
    src.write_text("".join(
        f"2024-01-01T{h:02d}:00:00,s,u{u}\n"
        for h, u in [(1, 1), (2, 2), (3, 1), (4, 3), (5, 4), (6, 2)]))
    cat = Catalog(spark)
    metrics = [{"type": "count", "name": "cnt"},
               {"type": "hyperUnique", "name": "uniq", "fieldName": "user"}]
    ingest(spark, {
        "dataSchema": {
            "dataSource": "hourly",
            "timestampSpec": {"column": "ts", "format": "auto"},
            "dimensionsSpec": {"dimensions": ["site"]},
            "metricsSpec": metrics,
            "granularitySpec": {"segmentGranularity": "day",
                                "queryGranularity": "hour", "rollup": True}},
        "ioConfig": {"inputSource": {"type": "local", "files": [str(src)]},
                     "inputFormat": {"type": "csv",
                                     "columns": ["ts", "site", "user"]}}},
        cat, str(tmp_path / "seg"))
    assert cat.table("hourly").count() == 6          # six hour buckets

    compact(spark, str(tmp_path / "seg" / "hourly"),
            str(tmp_path / "seg" / "daily"), segment_granularity="day",
            query_granularity="day", dimensions=["site"],
            metrics=[{"type": "longSum", "name": "cnt", "fieldName": "cnt"},
                     {"type": "hyperUnique", "name": "uniq",
                      "fieldName": "uniq"}])
    cat.register("daily", str(tmp_path / "seg" / "daily"))
    assert cat.table("daily").count() == 1           # one day bucket

    r = translate({"queryType": "timeseries", "dataSource": "daily",
                   "granularity": "all",
                   "aggregations": [
                       {"type": "longSum", "name": "rows", "fieldName": "cnt"},
                       {"type": "hyperUnique", "name": "u",
                        "fieldName": "uniq"}]},
                  spark, cat).first()
    assert r["rows"] == 6 and r["u"] == 4            # users u1..u4 merged


def test_append_mode_and_segment_metadata_analysis(spark, tmp_path):
    """ioConfig.appendToExisting adds segments instead of replacing; the
    segmentMetadata rollup/aggregators/queryGranularity analyses read the
    ingest-spec sidecar (per-segment metadata in the reference)."""
    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.sources.ingest import ingest

    (tmp_path / "a.csv").write_text("2024-01-01,x,1\n")
    (tmp_path / "b.csv").write_text("2024-01-01,y,2\n")
    cat = Catalog(spark)

    def spec(f, append=False):
        return {"dataSchema": {
                    "dataSource": "appendable",
                    "timestampSpec": {"column": "d", "format": "auto"},
                    "dimensionsSpec": {"dimensions": ["site"]},
                    "metricsSpec": [{"type": "longSum", "name": "v_sum",
                                     "fieldName": "v"}],
                    "granularitySpec": {"segmentGranularity": "day",
                                        "queryGranularity": "day",
                                        "rollup": True}},
                "ioConfig": {"inputSource": {"type": "local", "files": [f]},
                             "inputFormat": {"type": "csv",
                                             "columns": ["d", "site", "v"]},
                             "appendToExisting": append}}

    ingest(spark, spec(str(tmp_path / "a.csv")), cat, str(tmp_path / "seg"))
    ingest(spark, spec(str(tmp_path / "b.csv"), append=True), cat,
           str(tmp_path / "seg"))
    assert cat.table("appendable").count() == 2     # appended, not replaced

    md = translate({"queryType": "segmentMetadata", "dataSource": "appendable",
                    "analysisTypes": ["minmax", "rollup", "aggregators",
                                      "queryGranularity"]},
                   spark, cat)
    r = md.first()
    assert r["rollup"] is True
    assert r["queryGranularity"] == "day"
    assert "longSum" in r["aggregators"]


def test_rollup_first_last_pair_state(spark, tmp_path):
    """first/last COMPLEX state: rollup stores (original timestamp, value)
    pairs (SerializablePair serde in the reference) so a query over the
    rolled table returns the TRUE first/last value, not a bucket-boundary
    artifact."""
    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.sources.ingest import ingest

    src = tmp_path / "seq.csv"
    # day 1 holds the global first (09:00 "early"); day 2 the last (17:00)
    src.write_text(
        "2024-01-01T10:00:00,a,mid1\n2024-01-01T09:00:00,a,early\n"
        "2024-01-02T08:00:00,a,mid2\n2024-01-02T17:00:00,a,late\n")
    cat = Catalog(spark)
    ingest(spark, {
        "dataSchema": {
            "dataSource": "seq",
            "timestampSpec": {"column": "ts", "format": "auto"},
            "dimensionsSpec": {"dimensions": ["site"]},
            "metricsSpec": [
                {"type": "stringFirst", "name": "first_tag", "fieldName": "tag"},
                {"type": "stringLast", "name": "last_tag", "fieldName": "tag"}],
            "granularitySpec": {"segmentGranularity": "day",
                                "queryGranularity": "day", "rollup": True}},
        "ioConfig": {"inputSource": {"type": "local", "files": [str(src)]},
                     "inputFormat": {"type": "csv",
                                     "columns": ["ts", "site", "tag"]}}},
        cat, str(tmp_path / "seg"))

    stored = cat.table("seq")
    assert stored.count() == 2                       # one row per day bucket
    assert dict(stored.dtypes)["first_tag"].startswith("struct<t:")

    r = translate({"queryType": "timeseries", "dataSource": "seq",
                   "granularity": "all",
                   "aggregations": [
                       {"type": "stringFirst", "name": "f",
                        "fieldName": "first_tag"},
                       {"type": "stringLast", "name": "l",
                        "fieldName": "last_tag"}]},
                  spark, cat).first()
    assert r["f"] == "early" and r["l"] == "late"


def test_rollup_quantile_state_roundtrip(spark, tmp_path):
    """COMPLEX quantiles column: rollup stores mergeable centroid state
    (min/max + histogram_numeric bins); query-time quantilesDoublesSketch
    merges states across buckets and interpolates the quantile."""
    from incubator_druid_spark import translate
    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.sources.ingest import ingest

    src = tmp_path / "lat.csv"
    src.write_text("".join(
        f"2024-01-0{1 + i % 3},s{i % 2},{i + 1}\n" for i in range(100)))
    cat = Catalog(spark)
    ingest(spark, {
        "dataSchema": {
            "dataSource": "latencies",
            "timestampSpec": {"column": "d", "format": "auto"},
            "dimensionsSpec": {"dimensions": ["site"]},
            "metricsSpec": [
                {"type": "count", "name": "cnt"},
                {"type": "quantilesDoublesSketch", "name": "lat_sketch",
                 "fieldName": "ms", "k": 128}],
            "granularitySpec": {"segmentGranularity": "day",
                                "queryGranularity": "day", "rollup": True}},
        "ioConfig": {"inputSource": {"type": "local", "files": [str(src)]},
                     "inputFormat": {"type": "csv",
                                     "columns": ["d", "site", "ms"]}}},
        cat, str(tmp_path / "seg"))

    stored = cat.table("latencies")
    assert dict(stored.dtypes)["lat_sketch"].startswith("struct<mn:")
    assert stored.count() == 6                       # 3 days × 2 sites

    r = translate({"queryType": "timeseries", "dataSource": "latencies",
                   "granularity": "all",
                   "aggregations": [
                       {"type": "quantilesDoublesSketch", "name": "med",
                        "fieldName": "lat_sketch"}]},
                  spark, cat).first()
    assert abs(r["med"] - 50.5) < 2.0               # true median of 1..100


def _avro_long(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        out.append(b | 0x80 if z else b)
        if not z:
            return bytes(out)


def _avro_str(s: str) -> bytes:
    b = s.encode()
    return _avro_long(len(b)) + b


def _avro_ocf(tmp_path, fname, rows, codec="null"):
    """Independent Avro Object Container File writer for the round-trip test:
    record{id long, name string, v double, tag union[null,string],
    xs array<long>}."""
    import json as J
    import struct as S
    import zlib
    schema = {"type": "record", "name": "E", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "v", "type": "double"},
        {"name": "tag", "type": ["null", "string"]},
        {"name": "xs", "type": {"type": "array", "items": "long"}}]}
    body = b""
    for rid, name, v, tag, xs in rows:
        body += _avro_long(rid) + _avro_str(name) + S.pack("<d", v)
        body += (_avro_long(0) if tag is None
                 else _avro_long(1) + _avro_str(tag))
        if xs:
            body += _avro_long(len(xs)) + b"".join(_avro_long(x) for x in xs)
        body += _avro_long(0)
    if codec == "deflate":
        body = zlib.compress(body)[2:-4]  # raw deflate, no zlib header/crc
    meta_pairs = {"avro.schema": J.dumps(schema).encode(),
                  "avro.codec": codec.encode()}
    meta = _avro_long(len(meta_pairs))
    for k, val in meta_pairs.items():
        meta += _avro_str(k) + _avro_long(len(val)) + val
    meta += _avro_long(0)
    sync = bytes(range(16))
    blob = (b"Obj\x01" + meta + sync
            + _avro_long(len(rows)) + _avro_long(len(body)) + body + sync)
    p = tmp_path / fname
    p.write_bytes(blob)
    return str(p)


def test_avro_input_format(spark, tmp_path):
    """avro-extensions OCF read — pure-Python fallback (no spark-avro jar in
    this container); covers zigzag longs, strings, doubles, null unions,
    arrays, and the deflate codec."""
    from incubator_druid_spark.sources.ingest import read_input
    f1 = _avro_ocf(tmp_path, "a.avro",
                   [(1, "alpha", 1.5, "x", [1, -2]),
                    (2, "beta", -2.25, None, [])])
    f2 = _avro_ocf(tmp_path, "b.avro",
                   [(3, "gamma", 0.5, "y", [7])], codec="deflate")
    df = read_input(spark, {
        "inputSource": {"type": "local", "files": [f1, f2]},
        "inputFormat": {"type": "avro"}})
    got = {r["id"]: r for r in df.collect()}
    assert got[1]["name"] == "alpha" and got[1]["xs"] == [1, -2]
    assert got[2]["tag"] is None and got[2]["v"] == -2.25
    assert got[3]["tag"] == "y" and got[3]["xs"] == [7]


def test_protobuf_decode_column(spark, tmp_path):
    """Streaming path: per-record protobuf decode of a binary column (the
    Kafka `value` shape) via pandas_udf."""
    from incubator_druid_spark.sources.protobuf import decode_column
    desc = _pb_descriptor_set(tmp_path)
    msgs = [_pb_event(1, "a", 1.0, [1], "x"), _pb_event(2, "b", 2.0, [2], "y")]
    df = spark.createDataFrame([(m,) for m in msgs], "value binary")
    out = decode_column(df, "value", {
        "protoBytesDecoder": {"descriptor": desc,
                              "protoMessageType": "t.Event"}})
    got = sorted((r["decoded"]["name"], r["decoded"]["ts"])
                 for r in out.collect())
    assert got == [("a", 1), ("b", 2)]


def test_protobuf_streaming_decode(spark, tmp_path):
    """Kafka-shaped streaming decode: binary `value` column decoded per
    micro-batch (the path build_stream_source takes for
    inputFormat=protobuf; file-backed stream stands in for the broker)."""
    from incubator_druid_spark.sources.protobuf import decode_column
    desc = _pb_descriptor_set(tmp_path)
    msgs = [_pb_event(i, f"n{i}", float(i), [i], "s") for i in range(4)]
    src = str(tmp_path / "stream_src")
    spark.createDataFrame([(m,) for m in msgs], "value binary") \
        .write.parquet(src)
    stream = spark.readStream.schema("value binary").parquet(src)
    decoded = decode_column(stream, "value", {
        "protoBytesDecoder": {"descriptor": desc,
                              "protoMessageType": "t.Event"}}) \
        .select("decoded.*")
    q = (decoded.writeStream.format("memory")
         .queryName("pb_stream").outputMode("append").start())
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT ts, name FROM pb_stream ORDER BY ts").collect()
        assert [(r["ts"], r["name"]) for r in got] == \
            [(0, "n0"), (1, "n1"), (2, "n2"), (3, "n3")]
    finally:
        q.stop()


def test_http_input_source(spark, tmp_path):
    """HttpInputSource.java — URIs staged to local files, then format-read."""
    import http.server
    import threading

    (tmp_path / "data.csv").write_text("2024-01-01,a,1\n2024-01-02,b,2\n")
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(tmp_path), **kw)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from incubator_druid_spark.sources.ingest import read_input
        df = read_input(spark, {
            "inputSource": {"type": "http",
                            "uris": [f"http://127.0.0.1:{srv.server_port}/data.csv"]},
            "inputFormat": {"type": "csv", "columns": ["d", "name", "v"]}})
        assert rows(df, "name", "v") == [("a", 1), ("b", 2)]
    finally:
        srv.shutdown()


# -- streaming ingestion -----------------------------------------------------

def test_streaming_ingest_file_source(spark, tmp_path):
    """File-source stand-in for Kafka: same plan, testable without a broker."""
    from incubator_druid_spark.streaming.ingest import (build_streaming_ingest,
                                                        realtime_view)
    src = tmp_path / "stream_in"
    src.mkdir()
    (src / "batch1.json").write_text("\n".join(json.dumps(x) for x in [
        {"t": "2024-01-01T10:00:00Z", "site": "a", "clicks": 3},
        {"t": "2024-01-01T10:20:00Z", "site": "a", "clicks": 4},
        {"t": "2024-01-01T11:00:00Z", "site": "b", "clicks": 1},
    ]))
    sink = str(tmp_path / "stream_out")
    spec = {
        "dataSchema": {
            "dataSource": "stream_clicks",
            "timestampSpec": {"column": "t", "format": "iso"},
            "dimensionsSpec": {"dimensions": ["site"]},
            "granularitySpec": {"rollup": False},
        },
        "ioConfig": {"type": "file", "path": str(src), "format": "json"},
        "valueSchema": "t string, site string, clicks long",
    }
    stream = (spark.readStream.schema("t string, site string, clicks long")
              .json(str(src)))
    out, start, path = build_streaming_ingest(spark, spec, sink,
                                              source_override=stream)
    q = start(trigger_once=True)
    q.awaitTermination(120)
    live = realtime_view(spark, path, None)
    assert live.count() == 3
    assert "__time" in live.columns


def test_streaming_rollup_with_watermark(spark, tmp_path):
    from incubator_druid_spark.streaming.ingest import build_streaming_ingest
    src = tmp_path / "s2"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(json.dumps(x) for x in [
        {"t": "2024-01-01T10:00:00Z", "site": "a", "clicks": 3},
        {"t": "2024-01-01T10:20:00Z", "site": "a", "clicks": 4},
        {"t": "2024-01-01T12:00:00Z", "site": "a", "clicks": 9},
    ]))
    sink = str(tmp_path / "s2_out")
    spec = {
        "dataSchema": {
            "dataSource": "s2",
            "timestampSpec": {"column": "t", "format": "iso"},
            "dimensionsSpec": {"dimensions": ["site"]},
            "metricsSpec": [{"type": "longSum", "name": "clicks",
                             "fieldName": "clicks"}],
            "granularitySpec": {"queryGranularity": "hour", "rollup": True},
        },
        "ioConfig": {"type": "file", "path": str(src), "format": "json",
                     "lateMessageRejectionPeriod": "PT1H"},
    }
    stream = (spark.readStream.schema("t string, site string, clicks long")
              .json(str(src)))
    out, start, path = build_streaming_ingest(spark, spec, sink,
                                              source_override=stream)
    q = start(trigger_once=True)
    q.awaitTermination(120)
    got = spark.read.parquet(path)
    # append mode emits buckets sealed by the watermark: the 10:00 bucket
    # (7 clicks) seals once the 12:00 event advances the watermark past 11:00
    data = {str(r["__time"]): r["clicks"] for r in got.collect()}
    assert data.get("2024-01-01 10:00:00") == 7


def test_compaction_and_realtime_view(spark, tmp_path):
    import json as _json
    from incubator_druid_spark.streaming.ingest import (build_streaming_ingest,
                                                        compact, realtime_view)
    src = tmp_path / "c_in"
    src.mkdir()
    (src / "b.json").write_text("\n".join(_json.dumps(
        {"t": f"2024-01-{d:02d}T08:00:00Z", "site": "s", "v": d})
        for d in range(1, 5)))
    sink = str(tmp_path / "c_out")
    spec = {"dataSchema": {"dataSource": "c1",
                           "timestampSpec": {"column": "t", "format": "iso"},
                           "granularitySpec": {"rollup": False}},
            "ioConfig": {"type": "file", "path": str(src), "format": "json"}}
    stream = (spark.readStream.schema("t string, site string, v long")
              .json(str(src)))
    _, start, path = build_streaming_ingest(spark, spec, sink,
                                            source_override=stream)
    start(trigger_once=True).awaitTermination(120)

    table_path = str(tmp_path / "c_hist")
    compact(spark, path, table_path, segment_granularity="day")
    hist = spark.read.parquet(table_path)
    assert hist.count() == 4
    assert "__bucket" in hist.columns  # time-partitioned layout
    view = realtime_view(spark, path, hist)
    assert view.count() == 8  # stream ∪ historical (pre-dedup union semantics)


def test_single_dim_range_partitioning(spark, tmp_path):
    """single_dim partitionsSpec (SingleDimensionPartitionsSpec) →
    range-repartition + sort: parquet files carry disjoint tight min/max
    ranges on the dimension, so row-group stats prune dim-range scans (the
    range-shard-spec pruning analogue)."""
    import glob

    import pyarrow.parquet as pq

    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.sources.ingest import ingest

    src = str(tmp_path / "src.json")
    with open(src, "w") as fh:
        for i in range(4000):
            fh.write('{"t": "2024-01-01T00:%02d:00Z", "u": %d, "v": 1}\n'
                     % (i % 60, i * 7919 % 1000))
    cat = Catalog(spark)
    spec = {"dataSchema": {
                "dataSource": "ranged",
                "timestampSpec": {"column": "t"},
                "dimensionsSpec": {"dimensions": ["u"]},
                "granularitySpec": {"segmentGranularity": "day"}},
            "ioConfig": {"inputSource": {"type": "local", "files": [src]},
                         "inputFormat": {"type": "json"}},
            "tuningConfig": {"partitionsSpec": {
                "type": "single_dim", "partitionDimension": "u",
                "numShards": 4}}}
    path = ingest(spark, spec, cat, str(tmp_path))

    ranges = []
    for f in glob.glob(f"{path}/__bucket=*/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col = {md.schema.column(i).name: i for i in range(md.num_columns)}["u"]
        st = md.row_group(0).column(col).statistics
        ranges.append((st.min, st.max))
    assert len(ranges) >= 3
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint, tight ranges per file


def test_dynamic_partitions_max_rows_per_segment(spark, tmp_path):
    """DynamicPartitionsSpec (Druid's default): segments roll over at
    maxRowsPerSegment — mapped to Spark's maxRecordsPerFile, so every
    parquet file in every time bucket stays under the cap (bounds segment
    size and downstream per-task memory without an extra shuffle)."""
    import glob

    import pyarrow.parquet as pq

    from incubator_druid_spark.catalog import Catalog
    from incubator_druid_spark.sources.ingest import ingest

    src = str(tmp_path / "src.json")
    with open(src, "w") as fh:
        for i in range(3000):
            fh.write('{"t": "2024-01-%02dT00:00:00Z", "u": %d}\n'
                     % (1 + i % 2, i))
    cat = Catalog(spark)
    spec = {"dataSchema": {
                "dataSource": "rolled",
                "timestampSpec": {"column": "t"},
                "dimensionsSpec": {"dimensions": ["u"]},
                "granularitySpec": {"segmentGranularity": "day"}},
            "ioConfig": {"inputSource": {"type": "local", "files": [src]},
                         "inputFormat": {"type": "json"}},
            "tuningConfig": {"partitionsSpec": {
                "type": "dynamic", "maxRowsPerSegment": 400}}}
    path = ingest(spark, spec, cat, str(tmp_path))

    files = glob.glob(f"{path}/__bucket=*/*.parquet")
    counts = [pq.ParquetFile(f).metadata.num_rows for f in files]
    assert sum(counts) == 3000
    assert max(counts) <= 400       # every segment respects the cap
    assert len(counts) >= 8         # 1500 rows/bucket / 400 → ≥4 per bucket
