"""Quickstart: the full surface in one script.

    python examples/quickstart.py [sf_dir]

Walks a Druid user's day: batch ingest → native JSON queries → Druid SQL →
streaming-style rollup table → training-data pipeline (dedup + ANN).
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from incubator_druid_spark import Catalog, get_spark, translate  # noqa: E402
from incubator_druid_spark.sql.functions import druid_sql  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark).register_dir(sf_dir)

    print("== 1. native timeseries (day buckets, filtered agg, post-agg)")
    translate({
        "queryType": "timeseries", "dataSource": "events", "granularity": "day",
        "intervals": ["2024-01-01T00:00:00Z/2024-01-08T00:00:00Z"],
        "aggregations": [
            {"type": "count", "name": "cnt"},
            {"type": "filtered",
             "filter": {"type": "selector", "dimension": "event_type",
                        "value": "purchase"},
             "aggregator": {"type": "doubleSum", "name": "purchase_total",
                            "fieldName": "value"}}],
        "postAggregations": [
            {"type": "arithmetic", "name": "share", "fn": "/",
             "fields": [{"type": "fieldAccess", "fieldName": "purchase_total"},
                        {"type": "fieldAccess", "fieldName": "cnt"}]}],
    }, spark, cat).show(7, False)

    print("== 2. native topN + groupBy with join datasource")
    translate({
        "queryType": "topN", "dataSource": "events", "granularity": "all",
        "dimension": "user_id", "metric": "total", "threshold": 5,
        "aggregations": [{"type": "doubleSum", "name": "total",
                          "fieldName": "value"}],
    }, spark, cat).show()

    print("== 3. Druid SQL (TIME_FLOOR, LOOKUP-free)")
    druid_sql(spark, """
        SELECT TIME_FLOOR(__time, 'P1W') AS wk, event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 8
    """, cat).show(8, False)

    print("== 4. batch ingest with rollup -> time-partitioned table")
    from incubator_druid_spark.sources.ingest import ingest
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in.json")
        with open(src, "w") as f:
            for d in range(1, 6):
                f.write(json.dumps({"t": f"2024-02-{d:02d}T10:00:00Z",
                                    "site": "a" if d % 2 else "b",
                                    "clicks": d}) + "\n")
        ingest(spark, {
            "dataSchema": {
                "dataSource": "quickstart_clicks",
                "timestampSpec": {"column": "t", "format": "iso"},
                "dimensionsSpec": {"dimensions": ["site"]},
                "metricsSpec": [{"type": "longSum", "name": "clicks",
                                 "fieldName": "clicks"}],
                "granularitySpec": {"segmentGranularity": "day",
                                    "queryGranularity": "day", "rollup": True}},
            "ioConfig": {"inputSource": {"type": "local", "files": [src]},
                         "inputFormat": {"type": "json"}},
        }, cat, td)
        translate({"queryType": "scan", "dataSource": "quickstart_clicks"},
                  spark, cat).show()

    print("== 5. training-data pipeline: near-dup + ANN")
    from incubator_druid_spark.pipeline.dedup import minhash_dedup
    from incubator_druid_spark.pipeline.similarity import cosine_topk
    docs = cat.table("documents")
    minhash_dedup(docs, "doc_id", "text", threshold=0.5).show(5)
    emb = cat.table("embeddings")
    qv = emb.first()["embedding"]
    cosine_topk(emb, qv, k=5).show()


if __name__ == "__main__":
    main()
