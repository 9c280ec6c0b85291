"""Datasource catalog: name -> (path, time column, options).

Druid's equivalent is the segment-metadata-driven ``DruidSchema``
(reference: sql/src/main/java/org/apache/druid/sql/calcite/schema/DruidSchema.java)
plus the coordinator's datasource registry.  Here a datasource is simply a
Parquet/Delta path (optionally time-partitioned) registered under a name; the
schema comes from the files.

Every datasource exposes a canonical ``__time`` timestamp column (Druid's
mandatory long-millis timestamp — reference:
processing/.../segment/column/ColumnHolder.java TIME_COLUMN_NAME).  For tables
whose natural time column has another name (e.g. ``events.ts``) the catalog
aliases it at load; tables with no time column get no ``__time`` and time-scoped
queries on them fail loudly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TIME_COLUMN = "__time"

# Known time columns for the driver-generated test tables.
_DEFAULT_TIME_COLUMNS = {
    "events": "ts",
    "orders": "o_orderdate",
    "lineitem": "l_shipdate",
}

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@dataclass
class DatasourceSpec:
    name: str
    path: str
    fmt: str = "parquet"
    time_column: str | None = None  # aliased to __time on load (original kept)
    options: dict[str, str] = field(default_factory=dict)


class Catalog:
    """Registry of named datasources, resolved lazily to DataFrames."""

    _SERIAL = iter(range(1, 1 << 62))

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._specs: dict[str, DatasourceSpec] = {}
        self._lookups: dict[str, dict[str, str]] = {}
        # identity + mutation counter so per-session caches (temp-view
        # registration, schema lookups) can detect "same catalog, unchanged"
        self._serial = next(Catalog._SERIAL)
        self._version = 0
        self._schema_cache: dict[str, object] = {}

    def version(self) -> tuple[int, int]:
        """(identity, mutation-count) — changes whenever datasources do."""
        return (self._serial, self._version)

    # -- datasources -------------------------------------------------------
    def register(self, name: str, path: str, fmt: str = "parquet",
                 time_column: str | None = None, **options: str) -> None:
        self._specs[name] = DatasourceSpec(name, path, fmt, time_column, options)
        self._version += 1
        self._schema_cache.pop(name, None)

    def register_dir(self, sf_dir: str) -> "Catalog":
        """Register every ``<table>.parquet`` under a testdata dir."""
        for t in TPCH_TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                self.register(t, p, time_column=_DEFAULT_TIME_COLUMNS.get(t))
        return self

    def register_managed(self, name: str) -> None:
        """Datasource backed by a session-catalog table (saveAsTable) — the
        path for bucketed layouts, whose bucketing metadata only survives
        through spark.table()."""
        self._specs[name] = DatasourceSpec(name, path="", fmt="managed")
        self._version += 1
        self._schema_cache.pop(name, None)

    def table(self, name: str) -> DataFrame:
        if name not in self._specs:
            raise KeyError(f"unknown datasource: {name!r} (registered: {sorted(self._specs)})")
        spec = self._specs[name]
        if spec.fmt == "managed":
            return self.spark.table(name)
        reader = self.spark.read.format(spec.fmt)
        for k, v in spec.options.items():
            reader = reader.option(k, v)
        df = reader.load(spec.path)
        if spec.time_column and spec.time_column in df.columns and TIME_COLUMN not in df.columns:
            # Alias (not rename): queries may address either name; Catalyst
            # prunes whichever is unused so the scan reads it once.
            tc = F.col(spec.time_column)
            dtype = dict(df.dtypes)[spec.time_column]
            if dtype == "bigint":
                # nanosAsLong path (parquet TIMESTAMP(NANOS) read as long ns)
                tc = F.timestamp_micros((tc / 1000).cast("long"))
            else:
                tc = tc.cast("timestamp")
            df = df.withColumn(TIME_COLUMN, tc)
        return df

    def schema(self, name: str):
        """Cached schema of a datasource — metadata-only callers (SQL
        rewriters scanning for MVD columns) must not pay a reader-resolution
        JVM roundtrip per query.  Invalidated on (re-)register."""
        s = self._schema_cache.get(name)
        if s is None:
            s = self._schema_cache[name] = self.table(name).schema
        return s

    def __contains__(self, name: str) -> bool:
        return name in self._specs

    def names(self) -> list[str]:
        return sorted(self._specs)

    # -- lookups (Druid key/value lookup containers) -----------------------
    # reference: query/LookupDataSource.java + query/expression/LookupExprMacro.java
    def register_lookup(self, name: str, mapping: dict[str, str]) -> None:
        self._lookups[name] = dict(mapping)

    def lookup_map(self, name: str) -> dict[str, str]:
        if name not in self._lookups:
            raise KeyError(f"unknown lookup: {name!r}")
        return self._lookups[name]

    def lookup_df(self, name: str) -> DataFrame:
        m = self.lookup_map(name)
        return self.spark.createDataFrame(list(m.items()), schema="k string, v string")


def load_catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    return Catalog(spark).register_dir(sf_dir)
