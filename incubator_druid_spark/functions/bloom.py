"""Bloom filter build + membership test.

Reference: extensions-core/druid-bloom-filter — BloomFilterAggregatorFactory
(build a filter over a column) and BloomDimFilter (test membership against a
serialized filter).

Spark 4's BloomFilterAggregate/might_contain are internal-only (used by
runtime join filters), so this engine defines its own filter format: the
**sorted array of set bit positions** (a sparse bitset), with the hash family
``xxhash64(seed_i, cast(value as string)) mod m``.  Both build and probe use
the same JVM-side expression, so the whole thing lives in codegen:

- build: k per-probe collect_sets of ints, unioned post-agg — per-group
  aggregation STATE is bounded by k·m ints no matter how many distinct
  input values a group holds (Druid's analogue: a fixed-size ByteBuffer
  bitset in BloomFilterAggregatorFactory), and collect_set partials dedup
  map-side so the shuffle carries ≤ k·m ints per group;
- probe: k array_contains checks against the (broadcast-literal or column)
  position set.

False-positive behavior matches a classical Bloom filter with k hash
functions over an m-bit table.  The wire format intentionally differs from
Druid's ByteBuffer BloomKFilter — a bit-image is engine-private anyway; users
rebuild filters at ingest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M = 8192
DEFAULT_K = 6


def _probe_positions(col: Column, m: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(F.lit(i), col.cast("string")), F.lit(m))
            for i in range(k)]


def bloom_build_agg(col: Column, m: int = DEFAULT_M, k: int = DEFAULT_K) -> Column:
    """Aggregate expression: bloom position-set of a column within each group
    (BloomFilterAggregatorFactory — fixed-size ByteBuffer bitset in the
    reference).  Use inside .agg().

    One ``collect_set`` PER PROBE keeps the aggregation state bounded: each
    set holds distinct ints in [0, m), so per-group state is ≤ k·m ints even
    for a group with millions of distinct input values (a ``collect_set`` of
    per-row position ARRAYS would grow with input cardinality instead —
    the OOM shape this replaces).  The k sets are unioned post-agg."""
    sets = [F.collect_set(p) for p in _probe_positions(col, m, k)]
    merged = sets[0] if k == 1 else F.concat(*sets)
    return F.array_sort(F.array_distinct(merged))


def bloom_build(df: DataFrame, col: str, m: int = DEFAULT_M,
                k: int = DEFAULT_K) -> list[int]:
    """Whole-frame build → sorted position list (driver-side literal for
    subsequent ``bloom_filter`` probes).  Shuffle carries ≤ m distinct ints."""
    rows = (df.select(F.explode(F.array(
        *_probe_positions(F.col(col), m, k))).alias("p"))
        .distinct().collect())
    return sorted(r["p"] for r in rows)


def bloom_might_contain(positions: list[int] | Column, col: Column,
                        m: int = DEFAULT_M, k: int = DEFAULT_K) -> Column:
    """BloomDimFilter: true iff every probe position is set."""
    pos_arr = positions if isinstance(positions, Column) else \
        F.array(*[F.lit(int(p)) for p in positions])
    probes = [F.array_contains(pos_arr, p) for p in _probe_positions(col, m, k)]
    out = probes[0]
    for p in probes[1:]:
        out = out & p
    return out
