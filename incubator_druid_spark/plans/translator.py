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


def _legacy_null_frame(df: DataFrame) -> DataFrame:
    """Druid legacy null mode (NullHandling.java:67-118 replaceWithDefault):
    null strings read as '' and null numerics as 0.  Druid implements this at
    the segment layer — a null cell IS ''/0 on disk — so the faithful Spark
    chokepoint is one projection over the source frame before any operator
    logic; every filter/agg/dimension then behaves legacy-mode for free.
    Catalyst collapses the coalesce into the scan projection."""
    from pyspark.sql import types as T
    cols = []
    for f in df.schema.fields:
        if f.name == TIME_COLUMN or f.name == "__bucket":
            cols.append(F.col(f.name))
        elif isinstance(f.dataType, T.StringType):
            cols.append(F.coalesce(F.col(f.name), F.lit("")).alias(f.name))
        elif isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType,
                                     T.ByteType, T.DoubleType, T.FloatType)):
            cols.append(F.coalesce(F.col(f.name),
                                   F.lit(0).cast(f.dataType)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def prepare_frame(query: dict, spark: SparkSession, catalog: Catalog) -> DataFrame:
    """dataSource → virtualColumns → intervals → filter, shared by all types."""
    df = resolve_datasource(query["dataSource"], spark, catalog)

    ctx_opts = query.get("context") or {}
    # druid.generic.useDefaultValueForNull — legacy mode replaces null with
    # ''/0; exposed per-query here (the reference makes it a process-wide
    # config; a per-query context flag is a strict superset)
    if ctx_opts.get("useDefaultValueForNull"):
        df = _legacy_null_frame(df)

    for vc in query.get("virtualColumns") or []:
        # segment/virtual/ExpressionVirtualColumn.java — scan-time projection
        if vc.get("type", "expression") != "expression":
            raise ValueError(f"unsupported virtualColumn type {vc.get('type')!r}")
        from pyspark.sql import types as T
        from incubator_druid_spark.functions.druid_expr import (
            compile_expr_mvd)
        arr_cols = {f.name for f in df.schema.fields
                    if isinstance(f.dataType, T.ArrayType)}
        str_arr_cols = {f.name for f in df.schema.fields
                        if isinstance(f.dataType, T.ArrayType)
                        and isinstance(f.dataType.elementType, T.StringType)}
        str_cols = {f.name for f in df.schema.fields
                    if isinstance(f.dataType, T.StringType)}
        int_cols = {f.name for f in df.schema.fields
                    if isinstance(f.dataType, (T.LongType, T.IntegerType,
                                               T.ShortType, T.ByteType))}
        num_cols = {f.name for f in df.schema.fields
                    if isinstance(f.dataType, (T.DoubleType, T.FloatType,
                                               T.DecimalType))}
        # time columns read at their LONG storage (epoch millis) inside
        # expressions — `__time + 86400000` is plain arithmetic and an
        # outputType LONG/STRING cast renders millis, never Spark's
        # timestamp→seconds cast (Expr bindings via
        # ColumnValueSelector.getLong)
        ts_cols = {f.name for f in df.schema.fields
                   if isinstance(f.dataType, T.TimestampType)}

        # segments are schema-free in the reference: an expression over a
        # column absent from the segment reads null, not an analysis error
        # (ExpressionVirtualColumnTest testDimensionSelectorUsing
        # NonexistentColumn; same rule as FilterContext.resolve)
        _known = set(df.columns)

        def _vc_resolve(name):
            if name not in _known:
                return F.lit(None).cast("string")
            return F.col(name)

        col = compile_expr_mvd(vc["expression"], _vc_resolve, arr_cols,
                               str_cols, int_cols, num_cols,
                               timestamp_cols=ts_cols,
                               string_array_cols=str_arr_cols)
        from incubator_druid_spark.functions.lookups import flush_lookup_joins
        df = flush_lookup_joins(df)  # large-lookup refs inside the expr
        ot = vc.get("outputType")
        if ot and ot.upper() in ("LONG", "FLOAT", "DOUBLE", "STRING"):
            rtype = df.select(col.alias("__vc")).schema[0].dataType
            if isinstance(rtype, T.ArrayType):
                # an MVD-valued result — the auto-mapped scalar path, an
                # explicit map(), or an array function — is Druid's
                # multi-value STRING: never collapse the array to one
                # string (grouping explodes it instead); a STRING
                # outputType renders each ELEMENT as its Java string
                # (ExpressionVirtualColumnTest testMultiObjectSelector:
                # b * 2 over MVD b is ['2.0','4.0','6.0'])
                if ot.upper() == "STRING" \
                        and not isinstance(rtype.elementType, T.StringType):
                    col = F.transform(col, lambda x: x.cast("string"))
            else:
                if isinstance(rtype, T.TimestampType):
                    # time-macro results are LONG millis in Druid's type
                    # system (timestamp_floor returns ExprType.LONG):
                    # outputType LONG must be millis and STRING the millis
                    # digits — never Spark's timestamp→seconds /
                    # rendered-datetime casts
                    col = F.unix_millis(col)
                # lenient (try-semantics) cast: a string-valued expression
                # under outputType LONG truncates '10.1' → 10 and nulls
                # garbage, identically under ANSI on/off (Druid's
                # DimensionHandlerUtils.convertObjectToLong never throws)
                from incubator_druid_spark.functions.lenient import \
                    lenient_cast
                col = lenient_cast(col, ot.lower())
        if vc["name"] == TIME_COLUMN:
            # a virtual column REPLACING __time must stay the engine's
            # timestamp type (granularity bucketing floors it); expression
            # results carrying time are epoch millis
            rtype = df.select(col.alias("__vc")).schema[0].dataType
            if not isinstance(rtype, T.TimestampType):
                from incubator_druid_spark.functions.lenient import \
                    lenient_cast
                col = F.timestamp_millis(lenient_cast(col, "long"))
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
            lo_ms = min(s for s, _ in ivs)
            hi = max(e for _, e in ivs) // 1000
            fmt = "%Y-%m-%dT%H"
            # the upper bound is always safe (a partition's start never
            # exceeds its rows' times); the LOWER bound must be the
            # interval start floored to the table's SEGMENT granularity —
            # the raw start would exclude the first partially-covered
            # segment (e.g. a noon start pruning away '...T00' of a
            # day-partitioned table)
            hi_s = datetime.datetime.fromtimestamp(
                hi, tz=datetime.timezone.utc).strftime(fmt)
            pred = pred & (F.col("__bucket") <= hi_s)
            lo_s = _bucket_floor_lo(query, catalog, lo_ms)
            if lo_s is not None:
                pred = pred & (F.col("__bucket") >= lo_s)
        df = df.filter(pred)

    flt = query.get("filter")
    if flt is not None:
        ctx = FilterContext(df)
        pred = compile_filter(flt, ctx)
        from incubator_druid_spark.functions.lookups import flush_lookup_joins
        df = flush_lookup_joins(df)  # large-lookup refs inside the predicate
        df = df.filter(pred)
    return df


def _bucket_floor_lo(query: dict, catalog, lo_ms: int) -> str | None:
    """Lower partition-prune bound: the interval start floored to the
    table's SEGMENT granularity, i.e. the partition value of the segment
    CONTAINING lo.  The granularity comes from the ingest sidecar
    (_druid_meta.json, operators/metadata._read_table_meta); tables with
    no sidecar, non-table datasources, or complex granularities
    (tz/origin/all) return None and the caller keeps only the upper
    bound — weaker pruning, never wrong."""
    import datetime

    ds = query.get("dataSource")
    if isinstance(ds, dict) and ds.get("type") == "table":
        ds = ds.get("name")
    if not isinstance(ds, str):
        return None
    from incubator_druid_spark.operators.metadata import _read_table_meta
    try:
        meta = _read_table_meta(catalog, ds)
    except Exception:
        return None
    sg = (meta or {}).get("segmentGranularity")
    if not isinstance(sg, str):
        return None
    from incubator_druid_spark.model.granularity import parse_granularity
    try:
        g = parse_granularity(sg)
    except ValueError:
        return None
    if g.kind != "period" or g.tz or g.origin_millis is not None:
        return None
    p = g.period
    utc = datetime.timezone.utc
    if p.is_calendar:  # mirror Granularity._floor_months (UTC, epoch-based)
        dt = datetime.datetime.fromtimestamp(lo_ms / 1000, tz=utc)
        mi = (dt.year - 1970) * 12 + dt.month - 1
        fl = (mi // p.months) * p.months
        out = datetime.datetime(1970 + fl // 12, fl % 12 + 1, 1, tzinfo=utc)
    else:  # mirror Granularity._floor_millis (P1W → Monday anchor)
        anchor = (-259_200_000
                  if p.weeks and p.millis == 604_800_000 else 0)
        ms = ((lo_ms - anchor) // p.millis) * p.millis + anchor
        out = datetime.datetime.fromtimestamp(ms / 1000, tz=utc)
    return out.strftime("%Y-%m-%dT%H")


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
    # Native Druid queries compute in UTC unless a granularity carries its
    # own timeZone (Granularities.nullToUtc — the server's machine zone is
    # never consulted).  A host session on a non-UTC zone would leak into
    # date_trunc floors, string→timestamp casts and toPandas rendering, so
    # execute under a UTC-pinned session clone (cached per host; the
    # engine's own sessions and the driver's are UTC already → no clone).
    # ANSI-on UTC hosts stay on the host session: the operator tree is
    # ANSI-independent by construction (lenient try_* routes).
    from incubator_druid_spark.sql.functions import _exec_session, _UTC_ALIASES
    if spark.conf.get("spark.sql.session.timeZone") not in _UTC_ALIASES:
        spark = _exec_session(spark, "UTC")
        catalog = catalog.for_session(spark)
    from incubator_druid_spark.functions.lookups import clear_lookup_joins
    clear_lookup_joins()  # drop leftovers from any abandoned prior compile
    from incubator_druid_spark.plans import cache
    cache.apply_scheduling(query, spark)
    hit = cache.lookup(query)
    if hit is not None:
        return hit
    out = dispatch[qt](query, spark, catalog)
    # helper aggregates synthesized by rewrite_sketch_query (theta/HLL set-op
    # rewrites) are internal — Druid never surfaces them in the result row
    helpers = [c for c in out.columns
               if c.startswith("__theta_union_") or c.startswith("__hll_union_")]
    if helpers:
        out = out.drop(*helpers)
    return cache.populate(query, out)
