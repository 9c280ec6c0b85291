"""scan query — raw row retrieval ordered only by __time, with offset+limit.

Reference: query/scan/ScanQuery.java:129-141 (columns, filter, resultFormat,
batchSize, offset, limit, order — Order enum :89 NONE/ASCENDING/DESCENDING);
ScanQueryEngine.java streams rows per segment.  Spark: select + filter +
orderBy(__time) + offset + limit; with order NONE no sort is emitted at all
(no shuffle — straight scan with pushed filters).  batchSize/resultFormat are
wire-format concerns that don't exist for a DataFrame result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_druid_spark.catalog import Catalog, TIME_COLUMN
from incubator_druid_spark.plans.translator import prepare_frame


def run(query: dict, spark: SparkSession, catalog: Catalog) -> DataFrame:
    df = prepare_frame(query, spark, catalog)

    cols = query.get("columns") or []
    if cols:
        # absent columns read as NULL string (Druid's schema-free segments;
        # ScanQueryRunnerTest testFullSelectNoDimensionAndMetric)
        present = set(df.columns)
        from incubator_druid_spark.model.columns import qcol
        # qcol, not F.col: join-datasource outputs carry the dotted
        # rightPrefix ('j0.n_name'), which a bare F.col parses as struct
        # access
        df = df.select(*[
            qcol(c).alias(c) if c in present
            else F.lit(None).cast("string").alias(c)
            for c in cols])

    order = (query.get("order") or "none").lower()
    if order == "ascending":
        df = df.orderBy(F.col(TIME_COLUMN).asc())
    elif order == "descending":
        df = df.orderBy(F.col(TIME_COLUMN).desc())

    offset = int(query.get("offset") or 0)
    if offset:
        df = df.offset(offset)
    limit = query.get("limit")
    if limit is not None:
        df = df.limit(int(limit))
    return df
