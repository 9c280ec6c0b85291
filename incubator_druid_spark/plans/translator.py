"""Native JSON query → DataFrame translator (the engine's main entry point).

Reference lifecycle being replaced: QueryResource deserializes the JSON into a
typed Query (processing/.../query/Query.java:55-76 enumerates the types),
ClientQuerySegmentWalker inlines subqueries, CachingClusteredClient scatters
per-segment, per-type QueryRunnerFactory engines execute, toolchests merge
(SURVEY §3.2).  All of that collapses into: build ONE declarative DataFrame
plan and let Catalyst/AQE handle pruning, distribution and merge.

Shared query frame (all types): dataSource tree (plans.datasource), then
virtualColumns (materialized with withColumn — Catalyst collapses the
projection into the scan), then ``intervals`` time pruning + ``filter``
(filters.filters) — pushed to Parquet by Catalyst, replacing Druid's
segment-timeline + bitmap-index pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_druid_spark.catalog import Catalog, TIME_COLUMN
from incubator_druid_spark.filters.filters import FilterContext, compile_filter
from incubator_druid_spark.model.intervals import (interval_predicate, parse_intervals)
from incubator_druid_spark.plans.datasource import resolve_datasource


def prepare_frame(query: dict, spark: SparkSession, catalog: Catalog) -> DataFrame:
    """dataSource → virtualColumns → intervals → filter, shared by all types."""
    df = resolve_datasource(query["dataSource"], spark, catalog)

    for vc in query.get("virtualColumns") or []:
        # segment/virtual/ExpressionVirtualColumn.java — scan-time projection
        if vc.get("type", "expression") != "expression":
            raise ValueError(f"unsupported virtualColumn type {vc.get('type')!r}")
        from incubator_druid_spark.functions.druid_expr import compile_expr
        col = compile_expr(vc["expression"], F.col)
        ot = vc.get("outputType")
        if ot and ot.upper() in ("LONG", "FLOAT", "DOUBLE", "STRING"):
            col = col.cast(ot.lower())
        df = df.withColumn(vc["name"], col)

    ivs = parse_intervals(query.get("intervals"))
    if ivs:
        pred = interval_predicate(ivs, F.col(TIME_COLUMN))
        # Segment-partition pruning: tables written by sources/ingest carry a
        # `__bucket` partition column (yyyy-MM-dd'THH format — lexicographic
        # order == chronological).  Adding a redundant range predicate on it
        # turns the interval into Catalyst PartitionFilters, so at 100 TB the
        # scan opens only the covered partition directories (the same role as
        # Druid's segment-timeline pruning in CachingClusteredClient).
        if "__bucket" in df.columns:
            import datetime
            lo = min(s for s, _ in ivs) // 1000
            hi = max(e for _, e in ivs) // 1000
            fmt = "%Y-%m-%dT%H"
            lo_s = datetime.datetime.fromtimestamp(
                lo, tz=datetime.timezone.utc).strftime(fmt)
            hi_s = datetime.datetime.fromtimestamp(
                hi, tz=datetime.timezone.utc).strftime(fmt)
            pred = pred & (F.col("__bucket") >= lo_s) & (F.col("__bucket") <= hi_s)
        df = df.filter(pred)

    flt = query.get("filter")
    if flt is not None:
        ctx = FilterContext(df)
        df = df.filter(compile_filter(flt, ctx))
    return df


def translate(query: dict, spark: SparkSession, catalog: Catalog) -> DataFrame:
    qt = query["queryType"]
    from incubator_druid_spark.operators import (groupby, metadata, scan, search,
                                                 timeseries, topn)
    dispatch = {
        "timeseries": timeseries.run,
        "groupBy": groupby.run,
        "topN": topn.run,
        "scan": scan.run,
        "search": search.run,
        "timeBoundary": metadata.time_boundary,
        "segmentMetadata": metadata.segment_metadata,
        "dataSourceMetadata": metadata.datasource_metadata,
    }
    if qt == "select":
        # query/select/SelectQuery.java:43-49 — removed upstream, directs to scan
        raise ValueError("'select' query was removed in Druid 0.17; use 'scan'")
    if qt not in dispatch:
        raise ValueError(f"unknown queryType {qt!r}")
    return dispatch[qt](query, spark, catalog)
