"""search query — find dimension VALUES matching a pattern.

Reference: query/search/SearchQueryRunner.java; result rows are
(dimension, value, count) sorted by a SearchSortSpec
(query/search/SearchSortSpec.java: lexicographic | alphanumeric | numeric |
strlen).  Druid has two strategies (UseIndexesStrategy walks bitmap-index
dictionaries, CursorOnlyStrategy scans); Spark has no per-value dictionary
exposed, so we scan — but the scan is a single pass producing all dimensions'
matches at once via an unpivot (stack), with MVD columns exploded first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_druid_spark.catalog import Catalog, TIME_COLUMN
from incubator_druid_spark.filters.filters import _ordering_key, compile_search_spec
from incubator_druid_spark.model.granularity import parse_granularity
from incubator_druid_spark.plans.translator import prepare_frame


def run(query: dict, spark: SparkSession, catalog: Catalog) -> DataFrame:
    df = prepare_frame(query, spark, catalog)
    gran = parse_granularity(query.get("granularity", "all"))

    dims = [d if isinstance(d, str) else d["dimension"]
            for d in (query.get("searchDimensions") or [])]
    if not dims:
        dims = [f.name for f in df.schema.fields
                if isinstance(f.dataType, T.StringType) and f.name != TIME_COLUMN]

    types = {f.name: f.dataType for f in df.schema.fields}
    per_bucket = gran.kind != "all"

    # one pass: project (bucket?, dim-name, value) per search dimension and
    # union — Catalyst merges these into a single scan via column pruning when
    # possible; each branch filters early so the shuffle carries matches only.
    branches = []
    for d in dims:
        col = F.col(d)
        if isinstance(types.get(d), T.ArrayType):
            value = F.explode(col)
        else:
            value = col.cast("string")
        sel = [F.lit(d).alias("dimension"), value.alias("value")]
        if per_bucket:
            sel = [gran.floor(F.col(TIME_COLUMN)).alias(TIME_COLUMN)] + sel
        b = df.select(*sel)
        b = b.filter(compile_search_spec(query["query"], F.col("value")))
        branches.append(b)
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)

    keys = ([TIME_COLUMN] if per_bucket else []) + ["dimension", "value"]
    out = out.groupBy(*keys).agg(F.count(F.lit(1)).alias("count"))

    sort = (query.get("sort") or {}).get("type", "lexicographic")
    out = out.orderBy(_ordering_key(F.col("value"), sort).asc(),
                      F.col("dimension").asc())

    # SearchQuery default limit is 1000 (query/search/SearchQuery.java)
    limit = query.get("limit", 1000)
    if limit is not None:
        out = out.limit(int(limit))
    return out
