"""incubator_druid_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Apache Druid (reference: apache/incubator-druid
@ 0.22.0-SNAPSHOT).

This is NOT a port: Druid's broker/historical topology, ByteBuffer aggregators and
mmap'd segment format are replaced wholesale by Spark's DataFrame/Catalyst/Tungsten
machinery.  What survives is the *query surface*: the native JSON query language
(timeseries / topN / groupBy / scan / search / timeBoundary / segmentMetadata /
dataSourceMetadata), the DimFilter tree, the aggregator + post-aggregator library,
the expression function library, the granularity system, and the ingestion-spec
model — each re-expressed as a translation to declarative DataFrame plans so that
Catalyst keeps predicate pushdown, column pruning, partial aggregation and
whole-stage codegen.

Public entry points:
    translate(query_json) -> (spark, catalog) -> DataFrame   (plans.translator)
    DruidSession / get_spark                                 (session)
    Catalog                                                  (catalog)
"""

from incubator_druid_spark.session import get_spark
from incubator_druid_spark.catalog import Catalog
from incubator_druid_spark.plans.translator import translate

__version__ = "0.1.0"

__all__ = ["get_spark", "Catalog", "translate", "__version__"]
