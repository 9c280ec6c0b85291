"""Batch ingestion: Druid task spec → time-partitioned Parquet table.

Reference pipeline being re-expressed (SURVEY §3.3): InputSource/InputFormat
(core/.../data/input/impl/) → TransformSpec (segment/transform/TransformSpec.java)
→ GranularitySpec bucketing (server/.../granularity/UniformGranularitySpec.java)
→ rollup in IncrementalIndex (segment/incremental/IncrementalIndex.java:217,
1152-1165) → IndexMergerV9 persist → segment publish.

Spark-first: read with the native reader for the format, apply transforms as
Column expressions, derive `__time` per the timestampSpec, optionally
pre-aggregate (rollup ≡ ingest-time GROUP BY), and write Parquet partitioned by
the segment granularity bucket.  Segments = partition directories; Druid's
version/overshadow model maps to deterministic partition overwrite
(`spark.sql.sources.partitionOverwriteMode=dynamic` keeps it atomic per
partition at scale).

Spec shape accepted (the Druid ioConfig/dataSchema fields that matter):
{
  "dataSchema": {
    "dataSource": "name",
    "timestampSpec": {"column": "ts", "format": "iso"|"millis"|"auto"|<joda>},
    "dimensionsSpec": {"dimensions": [... names or {"name","type"} ...]},
    "transformSpec": {"transforms": [{"name","expression"}...],
                       "filter": <DimFilter>},
    "metricsSpec": [<AggregatorFactory>...],          # rollup metrics
    "granularitySpec": {"segmentGranularity": "day",
                         "queryGranularity": "hour" | "none",
                         "rollup": true|false}
  },
  "ioConfig": {"inputSource": {"type": "local", "files": [...]} ,
               "inputFormat": {"type": "csv"|"tsv"|"json"|"regex"|"parquet"|
                                "orc"|"avro", ...}}
}
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_druid_spark.catalog import Catalog, TIME_COLUMN
from incubator_druid_spark.filters.filters import FilterContext, compile_filter
from incubator_druid_spark.model.granularity import parse_granularity


# ---------------------------------------------------------------------------
# input formats / sources
# ---------------------------------------------------------------------------

def read_input(spark: SparkSession, io_config: dict) -> DataFrame:
    src = io_config.get("inputSource", {})
    fmt = io_config.get("inputFormat", {"type": "json"})
    paths = _source_paths(src)
    t = fmt.get("type", "json")

    if t == "csv" or t == "tsv" or t == "delimited":
        # core/.../impl/CsvInputFormat.java, DelimitedInputFormat.java
        sep = fmt.get("delimiter", "\t" if t in ("tsv", "delimited") else ",")
        reader = (spark.read
                  .option("sep", sep)
                  .option("header", str(fmt.get("findColumnsFromHeader", False)).lower())
                  .option("inferSchema", "true"))
        df = reader.csv(paths)
        cols = fmt.get("columns")
        if cols and not fmt.get("findColumnsFromHeader", False):
            df = df.toDF(*cols)
        # listDelimiter (DelimitedInputFormat.java — default \x01): Druid
        # decides multi-valuedness per ROW at parse time; a columnar schema
        # needs it declared, so the columns that carry MVD values are named
        # in multiValueColumns and become ARRAY<STRING>
        ld = fmt.get("listDelimiter")
        if ld is not None:
            import re as _re
            for c in fmt.get("multiValueColumns", []):
                df = df.withColumn(
                    c, F.split(F.col(c).cast("string"), _re.escape(ld)))
        return df
    if t == "json":
        # core/.../impl/JsonInputFormat.java (+flattenSpec handled by Spark's
        # nested-field access; explicit flatten fields below)
        df = spark.read.json(paths)
        flatten = (fmt.get("flattenSpec") or {}).get("fields") or []
        for f in flatten:
            # {"type":"path","name":...,"expr":"$.a.b"} — JsonPath subset
            expr = f.get("expr", "")
            dotted = expr.lstrip("$.").replace("['", ".").replace("']", "")
            df = df.withColumn(f["name"], F.col(dotted))
        return df
    if t == "regex":
        # core/.../impl/RegexInputFormat.java — one capture group per column
        pattern = fmt["pattern"]
        cols = fmt["columns"]
        df = spark.read.text(paths)
        out = df
        for i, c in enumerate(cols, start=1):
            out = out.withColumn(c, F.regexp_extract(F.col("value"), pattern, i))
        return out.drop("value")
    if t in ("parquet", "orc"):
        # extensions-core/{parquet,orc}-extensions → native Spark readers
        return spark.read.format(t).load(paths)
    if t == "avro":
        # extensions-core/avro-extensions — native spark-avro when the jar is
        # deployed (real clusters), else the pure-Python OCF reader
        try:
            return spark.read.format("avro").load(paths)
        except Exception:
            from incubator_druid_spark.sources.avro import read_avro
            return read_avro(spark, paths)
    if t == "protobuf":
        # extensions-core/protobuf-extensions (ProtobufInputFormat.java) —
        # pure-Python wire decoder against a compiled descriptor set,
        # distributed via mapInPandas (sources/protobuf.py)
        from incubator_druid_spark.sources.protobuf import read_protobuf
        return read_protobuf(spark, paths, fmt)
    raise ValueError(f"unknown inputFormat type {t!r}")


def _source_paths(src: dict):
    t = src.get("type", "local")
    if t == "local":
        # core/.../impl/LocalInputSource.java — baseDir+filter or files
        if src.get("files"):
            return src["files"]
        base = src.get("baseDir", ".")
        filt = src.get("filter", "*")
        return os.path.join(base, filt)
    if t == "inline":
        raise ValueError("inline input: pass data via InlineDataSource instead")
    if t == "http":
        # core/.../impl/HttpInputSource.java — the reference streams each URI
        # inside the ingest task.  Spark's FS readers don't speak http, so
        # stage the URIs to local files first (driver-side; fine for the
        # task-spec sizes this source is for — at bulk scale data should land
        # on an object store the executors read directly, same advice as the
        # reference gives for large batch ingest).
        return [_stage_http(u) for u in (src.get("uris") or [])]
    if t in ("s3", "google", "azure", "hdfs"):
        # cloud connectors ride on Hadoop FS — pass URIs straight through
        return src.get("uris") or src.get("paths")
    raise ValueError(f"unknown inputSource type {t!r}")


def _stage_http(uri: str) -> str:
    import hashlib
    import tempfile
    import urllib.request

    dst = os.path.join(tempfile.gettempdir(), "druid_spark_http",
                       hashlib.sha1(uri.encode()).hexdigest()[:16]
                       + "_" + os.path.basename(uri.split("?")[0]))
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if not os.path.exists(dst):
        with urllib.request.urlopen(uri) as resp, open(dst, "wb") as out:
            while chunk := resp.read(1 << 20):
                out.write(chunk)
    return dst


# ---------------------------------------------------------------------------
# dataSchema application
# ---------------------------------------------------------------------------

def apply_data_schema(df: DataFrame, data_schema: dict) -> DataFrame:
    """timestampSpec → __time; transformSpec; dimension projection; optional
    rollup pre-aggregation."""
    ts_spec = data_schema.get("timestampSpec", {"column": "timestamp",
                                                "format": "auto"})
    df = _apply_timestamp(df, ts_spec)

    tf = data_schema.get("transformSpec") or {}
    for tr in tf.get("transforms") or []:
        # segment/transform/ExpressionTransform.java
        from incubator_druid_spark.functions.druid_expr import compile_expr
        df = df.withColumn(tr["name"], compile_expr(tr["expression"], F.col))
    if tf.get("filter") is not None:
        df = df.filter(compile_filter(tf["filter"], FilterContext(df)))

    dims = (data_schema.get("dimensionsSpec") or {}).get("dimensions") or []
    metrics = data_schema.get("metricsSpec") or []
    gran_spec = data_schema.get("granularitySpec") or {}

    if gran_spec.get("rollup") and metrics:
        df = rollup(df, dims, metrics, gran_spec.get("queryGranularity", "none"))
    elif dims:
        names = [_dim_name(d) for d in dims]
        # rollup disabled but metrics declared: Druid still stores ROW-LEVEL
        # metric columns (each row is its own group) — the aggregator's
        # input value under its OUTPUT name, count → 1 per row.  Dropping
        # them would make later queries over the metric read nothing.
        casts = {"longSum": "long", "longMin": "long", "longMax": "long",
                 "doubleSum": "double", "doubleMin": "double",
                 "doubleMax": "double", "floatSum": "float",
                 "floatMin": "float", "floatMax": "float"}
        mcols = []
        for m in metrics:
            mname = m.get("name")
            if not mname or mname in names or mname == TIME_COLUMN:
                continue
            if m.get("type") == "count":
                mcols.append(F.lit(1).cast("long").alias(mname))
                continue
            src = m.get("fieldName")
            if src is None or src not in df.columns:
                continue
            typ = casts.get(m.get("type"))
            col = F.col(src).cast(typ) if typ else F.col(src)
            mcols.append(col.alias(mname))
        df = df.select(TIME_COLUMN, *[n for n in names if n in df.columns],
                       *[c for c in df.columns
                         if c not in names and c != TIME_COLUMN
                         and metrics == []],
                       *mcols)
    return df


def _dim_name(d) -> str:
    return d if isinstance(d, str) else d["name"]


def _apply_timestamp(df: DataFrame, ts_spec: dict) -> DataFrame:
    col = ts_spec.get("column", "timestamp")
    fmt = ts_spec.get("format", "auto")
    c = F.col(col)
    if fmt in ("millis",):
        t = F.timestamp_millis(c.cast("long"))
    elif fmt in ("posix", "seconds"):
        t = F.timestamp_seconds(c.cast("long"))
    elif fmt in ("micro",):
        t = F.timestamp_micros(c.cast("long"))
    elif fmt == "iso":
        t = c.cast("timestamp")
    elif fmt == "auto":
        # TimestampParser.java 'auto': NUMERIC input is epoch MILLIS
        # (Long.parseLong → DateTimes.utc), otherwise ISO/SQL string parse.
        # Spark's long→timestamp cast reads SECONDS and a digit string
        # casts to null — both silently wrong here.
        s = c.cast("string")
        t = (F.when(s.rlike(r"^-?\d+$"),
                    F.timestamp_millis(s.cast("long")))
              .otherwise(c.try_cast("timestamp")))
    else:  # joda pattern
        from incubator_druid_spark.functions.druid_expr import _joda_to_spark
        t = F.try_to_timestamp(c, F.lit(_joda_to_spark(fmt)))
    return df.withColumn(TIME_COLUMN, t)


def rollup(df: DataFrame, dims: list, metrics: list[dict],
           query_granularity="none") -> DataFrame:
    """Ingest-time rollup ≡ GROUP BY (time_floor, dims) with metric partials
    (IncrementalIndex facts-table semantics).  The output stores FINALIZED
    metric values; re-aggregation of sums/counts/mins/maxes composes exactly,
    which is why Druid restricts rollup metrics to those shapes."""
    from incubator_druid_spark.operators.aggregations import \
        compile_rollup_aggregations
    gran = parse_granularity(query_granularity)
    names = [_dim_name(d) for d in dims]
    keys = [gran.floor(F.col(TIME_COLUMN)).alias(TIME_COLUMN)] + \
           [F.col(n) for n in names if n in df.columns]
    aggs = compile_rollup_aggregations(metrics, FilterContext(df))
    return df.groupBy(*keys).agg(*aggs)


# ---------------------------------------------------------------------------
# sink: time-partitioned parquet "segments"
# ---------------------------------------------------------------------------

def ingest(spark: SparkSession, spec: dict, catalog: Catalog,
           base_dir: str) -> str:
    """Run a batch ingest spec end-to-end; returns the table path and
    registers the datasource in the catalog.

    tuningConfig.partitionsSpec maps to the physical layout:
    - default: time-partition directories (`__bucket`) only — Druid's
      segment-per-interval model;
    - {"type": "hashed", "partitionDimensions": [...], "numShards": N}:
      additionally bucketBy the shard key (Druid's hashed shard spec).
      Bucketed tables join/aggregate on the shard key with NO shuffle —
      at 100 TB that's the difference between a network-bound and a
      local-only join (the analogue of Druid's secondary partitioning +
      broker shard pruning, DimFilterUtils.filterShards).
    - {"type": "single_dim"/"range", "partitionDimension(s)": ...}:
      range-partition + sort on the dimension inside each time chunk
      (SingleDimensionPartitionsSpec / DimensionRangePartitionsSpec) — each
      parquet file then covers a tight dimension range, so min/max row-group
      stats prune scans on that dimension the way Druid's broker prunes
      range shard specs.
    """
    ds = spec["dataSchema"]
    name = ds["dataSource"]
    df = read_input(spark, spec.get("ioConfig", {}))
    df = apply_data_schema(df, ds)

    seg_gran = (ds.get("granularitySpec") or {}).get("segmentGranularity", "day")
    gran = parse_granularity(seg_gran)
    out = df.withColumn("__bucket",
                        F.date_format(gran.floor(F.col(TIME_COLUMN)),
                                      "yyyy-MM-dd'T'HH"))
    tuning = spec.get("tuningConfig") or {}
    pspec = tuning.get("partitionsSpec") or {}
    # DynamicPartitionsSpec (Druid's default): segments roll over at
    # maxRowsPerSegment.  Spark's maxRecordsPerFile is the same contract —
    # each writer task rolls a new file at the limit, no extra count pass or
    # shuffle needed; bounds both segment size and the memory any one
    # downstream scan task needs.
    max_rows = int(pspec.get("maxRowsPerSegment")
                   or tuning.get("maxRowsPerSegment") or 0)
    path = os.path.join(base_dir, name)
    # ioConfig.appendToExisting (AbstractBatchIndexTask) — append new
    # segments instead of replacing the datasource version
    mode = "append" if (spec.get("ioConfig") or {}).get("appendToExisting") \
        else "overwrite"
    if pspec.get("type") == "hashed" and pspec.get("partitionDimensions"):
        dims = pspec["partitionDimensions"]
        shards = int(pspec.get("numShards", 8))
        spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
        (out.write.mode(mode)
            .option("maxRecordsPerFile", max_rows)
            .partitionBy("__bucket")
            .bucketBy(shards, *dims)
            .sortBy(*dims)
            .option("path", path)
            .saveAsTable(name))
        catalog.register_managed(name)
    elif pspec.get("type") in ("single_dim", "range"):
        dims = ([pspec["partitionDimension"]]
                if pspec.get("partitionDimension")
                else list(pspec.get("partitionDimensions") or []))
        if not dims:
            raise ValueError(f"{pspec['type']} partitionsSpec needs "
                             "partitionDimension(s)")
        shards = int(pspec.get("numShards")
                     or spark.sparkContext.defaultParallelism)
        (out.repartitionByRange(shards, F.col("__bucket"),
                                *[F.col(d) for d in dims])
            .sortWithinPartitions("__bucket", *dims)
            .write.mode(mode)
            .option("maxRecordsPerFile", max_rows)
            .partitionBy("__bucket")
            .parquet(path))
        catalog.register(name, path)
    elif pspec.get("type") == "zorder":
        # Superset of the reference's range specs (no Druid analogue):
        # Morton-interleave several dimensions inside each time chunk so
        # file min/max stats prune filters on ANY clustered dimension,
        # not just the range chain's prefix (sources/layout.py).
        from .layout import cluster_by_zorder
        dims = list(pspec.get("partitionDimensions") or [])
        if not dims:
            raise ValueError("zorder partitionsSpec needs "
                             "partitionDimensions")
        shards = int(pspec.get("numShards")
                     or spark.sparkContext.defaultParallelism)
        (cluster_by_zorder(out, dims, bits=int(pspec.get("bits", 12)),
                           num_partitions=shards,
                           prefix_cols=["__bucket"])
            .write.mode(mode)
            .option("maxRecordsPerFile", max_rows)
            .partitionBy("__bucket")
            .parquet(path))
        catalog.register(name, path)
    else:
        (out.write.mode(mode)
            .option("maxRecordsPerFile", max_rows)
            .partitionBy("__bucket")
            .parquet(path))
        catalog.register(name, path)
    _write_table_meta(path, ds)
    return path


def _write_table_meta(path: str, data_schema: dict) -> None:
    """`_druid_meta.json` sidecar: the ingest-spec facts segmentMetadata
    reports (rollup / queryGranularity / aggregators / dimensions) — the
    analogue of the reference's per-segment metadata.drd."""
    import json
    gran = data_schema.get("granularitySpec") or {}
    meta = {
        "rollup": bool(gran.get("rollup")),
        "queryGranularity": gran.get("queryGranularity"),
        "segmentGranularity": gran.get("segmentGranularity"),
        "aggregators": data_schema.get("metricsSpec") or [],
        "dimensions": [_dim_name(d) for d in
                       (data_schema.get("dimensionsSpec") or {})
                       .get("dimensions") or []],
    }
    try:
        with open(os.path.join(path, "_druid_meta.json"), "w") as fh:
            json.dump(meta, fh)
    except OSError:
        pass  # non-local FS (s3/hdfs) — sidecar is best-effort
