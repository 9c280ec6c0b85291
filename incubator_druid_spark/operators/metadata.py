"""Metadata queries: timeBoundary, segmentMetadata, dataSourceMetadata.

Reference:
- query/timeboundary/TimeBoundaryQuery.java:49-63 — min/max __time, optional
  bound=minTime|maxTime, optional filter.
- query/metadata/metadata/SegmentMetadataQuery.java:58-67 — per-segment column
  analysis (cardinality/minmax/size/rollup); SegmentAnalysis merges per-segment
  schemas.  Segments are a physical concept that doesn't survive the move to
  Parquet/Catalyst, so we emit the merged (table-level) analysis directly: one
  row per column with type / approximate cardinality / min / max / null count —
  a single pass of partial aggregates, not one job per column.
- query/datasourcemetadata/DataSourceMetadataQuery.java — max ingested time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_druid_spark.catalog import Catalog, TIME_COLUMN
from incubator_druid_spark.plans.translator import prepare_frame


def time_boundary(query: dict, spark: SparkSession, catalog: Catalog) -> DataFrame:
    df = prepare_frame(query, spark, catalog)
    bound = query.get("bound")
    # no matching rows → EMPTY result, not a null-bounds row
    # (TimeBoundaryQueryRunnerTest testFilteredTimeBoundaryQueryNoMatches)
    if bound == "minTime":
        out = df.agg(F.min(TIME_COLUMN).alias("minTime"))
        return out.filter(F.col("minTime").isNotNull())
    if bound == "maxTime":
        out = df.agg(F.max(TIME_COLUMN).alias("maxTime"))
        return out.filter(F.col("maxTime").isNotNull())
    out = df.agg(F.min(TIME_COLUMN).alias("minTime"),
                 F.max(TIME_COLUMN).alias("maxTime"))
    return out.filter(F.col("minTime").isNotNull())


def datasource_metadata(query: dict, spark: SparkSession, catalog: Catalog) -> DataFrame:
    df = prepare_frame(query, spark, catalog)
    return df.agg(F.max(TIME_COLUMN).alias("maxIngestedEventTime"))


_DRUID_TYPES = {
    T.LongType: "LONG", T.IntegerType: "LONG", T.ShortType: "LONG",
    T.FloatType: "FLOAT", T.DoubleType: "DOUBLE", T.StringType: "STRING",
    T.TimestampType: "LONG", T.TimestampNTZType: "LONG",
    T.DateType: "STRING", T.BooleanType: "LONG", T.BinaryType: "COMPLEX",
}


def segment_metadata(query: dict, spark: SparkSession, catalog: Catalog) -> DataFrame:
    """One row per column: column, type, hasMultipleValues, cardinality
    (approx), minValue, maxValue, nullCount, numRows.  All analyses computed in
    ONE aggregate pass (partial aggregates per column), then unpivoted."""
    df = prepare_frame(query, spark, catalog)
    # an EXPLICIT empty analysisTypes list means "types only"
    # (testSegmentMetadataQueryWithNoAnalysisTypesMerge); absent → defaults
    requested = query.get("analysisTypes")
    analysis = set(["cardinality", "minmax", "size"]
                   if requested is None else requested)

    fields = df.schema.fields
    approx = bool((query.get("context") or {}).get("useApproximateCardinality"))
    aggs = [F.count(F.lit(1)).alias("__numRows")]
    for f in fields:
        c = F.col(f.name)
        safe = f.name.replace(".", "_")
        if "minmax" in analysis and isinstance(f.dataType, (T.StringType, T.LongType,
                                                            T.IntegerType, T.DoubleType,
                                                            T.FloatType, T.TimestampType,
                                                            T.TimestampNTZType, T.DateType)):
            aggs.append(F.min(c).cast("string").alias(f"__min__{safe}"))
            aggs.append(F.max(c).cast("string").alias(f"__max__{safe}"))
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"__nulls__{safe}"))
    stats = df.agg(*aggs).collect()[0].asDict()

    if "cardinality" in analysis:
        # exact by default: Druid's per-segment cardinality is the exact
        # string-dictionary size (SegmentMetadataQuery CARDINALITY);
        # context.useApproximateCardinality=true switches to one-pass HLL.
        #
        # r9 shape (guide §2.3): per-column single-distinct aggregates
        # instead of folding every count_distinct into the stats
        # aggregate above.  N distinct aggs in one Aggregate make
        # Spark's RewriteDistinctAggregates EXPAND every input row N+1
        # ways (rows × 17 for lineitem) and shuffle that multiple — the
        # wide-table metadata query was the slowest board entry (39.9 s
        # at sf0.1).  Each branch prunes the scan to its ONE column and
        # shuffles only that column's partially-deduped values.
        #
        # r10 (guide §2.6): the per-column jobs are submitted from a
        # small thread pool rather than as one UNION action — the r9
        # union ran its 17 branches back-to-back (each branch is
        # scan → partial-distinct → exchange → final, and the union
        # glue serialized their tails), so the table-wide analysis was
        # 17 sequential small jobs in one action.  Concurrent driver
        # threads let each branch's scan back-fill the previous
        # branch's exchange tail; counts are exact and per-column
        # independent, so results are identical in any order.
        card_fields = [f for f in fields
                       if not isinstance(f.dataType, (T.ArrayType, T.BinaryType))]
        if card_fields:
            from concurrent.futures import ThreadPoolExecutor

            def _card_of(f):
                card = (F.approx_count_distinct(F.col(f.name)) if approx
                        else F.count_distinct(F.col(f.name)))
                return f.name, df.agg(card.cast("long").alias("__v")) \
                                 .first()["__v"]

            with ThreadPoolExecutor(
                    max_workers=min(8, len(card_fields))) as pool:
                for name, v in pool.map(_card_of, card_fields):
                    stats[f"__card__{name.replace('.', '_')}"] = v

    rows = []
    for f in fields:
        safe = f.name.replace(".", "_")
        is_mvd = isinstance(f.dataType, T.ArrayType)
        dtype = type(f.dataType if not is_mvd else f.dataType.elementType)
        rows.append((
            f.name,
            _DRUID_TYPES.get(dtype, "COMPLEX") + ("_ARRAY" if is_mvd else ""),
            is_mvd,
            stats.get(f"__card__{safe}"),
            stats.get(f"__min__{safe}"),
            stats.get(f"__max__{safe}"),
            stats.get(f"__nulls__{safe}"),
            stats["__numRows"],
        ))
    schema = ("column string, type string, hasMultipleValues boolean, "
              "cardinality long, minValue string, maxValue string, "
              "nullCount long, numRows long")
    out = spark.createDataFrame(rows, schema=schema)

    if analysis & {"rollup", "aggregators", "queryGranularity"}:
        # SegmentMetadataQuery.java:58-67 AnalysisTypes ROLLUP / AGGREGATORS /
        # QUERYGRANULARITY — served from the ingest-spec sidecar the way the
        # reference reads them from per-segment metadata
        meta = _read_table_meta(catalog, query["dataSource"]) or {}
        if "rollup" in analysis:
            out = out.withColumn("rollup", F.lit(meta.get("rollup")))
        if "queryGranularity" in analysis:
            out = out.withColumn("queryGranularity",
                                 F.lit(meta.get("queryGranularity")))
        if "aggregators" in analysis:
            import json as _json
            aggs_json = _json.dumps(meta.get("aggregators")) \
                if meta.get("aggregators") is not None else None
            out = out.withColumn("aggregators", F.lit(aggs_json))
    return out


def _read_table_meta(catalog: Catalog, name) -> dict | None:
    """Read the `_druid_meta.json` sidecar written by sources/ingest."""
    import json as _json
    import os as _os
    if not isinstance(name, str) or name not in catalog:
        return None
    spec = catalog._specs[name]
    p = _os.path.join(spec.path, "_druid_meta.json") if spec.path else None
    if p and _os.path.exists(p):
        with open(p) as fh:
            return _json.load(fh)
    return None
