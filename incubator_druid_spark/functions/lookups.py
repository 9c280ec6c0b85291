"""Lookup registry — Druid's key→value lookup containers.

Reference: lookups are broker/historical-resident maps queried via the
``lookup(expr, name)`` expression macro (query/expression/LookupExprMacro.java),
the ``registeredLookup`` extraction fn (query/lookup/RegisteredLookupExtractionFn.java)
and the ``lookup`` datasource (query/LookupDataSource.java).

Spark-first: a lookup small enough to live on every Druid node is small enough
to broadcast.  We compile ``lookup(col, name)`` into a literal ``map[...]``
expression (a `CreateMap` of literals) — Catalyst ships it in the serialized
plan exactly once per stage, it's evaluated JVM-side inside codegen, and as a
join input the lookup DataFrame is marked `broadcast()`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LOOKUPS: dict[str, dict[str, str]] = {}


def register_lookup(name: str, mapping: dict[str, str]) -> None:
    _LOOKUPS[name] = dict(mapping)


def get_lookup(name: str) -> dict[str, str]:
    if name not in _LOOKUPS:
        raise KeyError(f"unknown lookup {name!r}; registered: {sorted(_LOOKUPS)}")
    return _LOOKUPS[name]


def lookup_names() -> list[str]:
    return sorted(_LOOKUPS)


def lookup_column(name: str, col: Column, replace_missing: str | None = None) -> Column:
    """lookup(col, name) → element_at(map<lit...>, col)."""
    m = get_lookup(name)
    if not m:
        return F.lit(replace_missing)
    pairs = []
    for k, v in m.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    out = F.element_at(F.create_map(*pairs), col.cast("string"))
    if replace_missing is not None:
        out = F.coalesce(out, F.lit(replace_missing))
    return out
