"""Z-order (Morton-code) clustering for multi-dimension data skipping.

Druid's range shard specs (reference: DimensionRangeShardSpec) give each
segment a tight range on ONE dimension chain, so the broker prunes
shards for filters on that prefix.  Parquet gives the same pruning for
free from per-file/row-group min-max stats — but range partitioning
still only tightens the leading dimension.  Z-ordering interleaves the
bits of SEVERAL normalized dimensions into one Morton code and
range-partitions + sorts on that code: every file then covers a small
hyper-rectangle of the combined key space, and a selective filter on
ANY of the clustered dimensions prunes most files (the layout Delta
Lake's OPTIMIZE ZORDER BY popularized; public technique, Morton 1966).

Scale design: normalization bounds come from ONE cheap min/max
aggregate (or caller-provided literals); the code itself is pure bit
arithmetic inside whole-stage codegen; the only shuffle is the
`repartitionByRange` that any clustered write needs anyway.  No UDFs,
no sampling pass, no driver-side data.

Deterministic contract (oracle-replayable):
  * per column: ``floor((x - lo) / (hi - lo) * (2^bits - 1))`` clamped
    to [0, 2^bits - 1]; evaluated in double precision in exactly that
    association order; nulls map to cell 0 (sort first)
  * code: bit b of column i lands at position ``b * n_cols + i``
Numeric and timestamp (cast to epoch-millis double) columns are
supported; strings have no meaningful linear cell mapping here and
raise (hash them to a numeric column first if locality by prefix is
not needed).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["zorder_cell", "zorder_code", "cluster_by_zorder"]


def zorder_cell(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Normalize one column to an integer cell in [0, 2^bits): the
    documented floor((x-lo)/(hi-lo)*(2^bits-1)) with clamping; a
    degenerate (lo == hi) or null column lands in cell 0."""
    m = float((1 << bits) - 1)
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = F.floor((col.cast("double") - F.lit(float(lo)))
                     / F.lit(float(hi - lo)) * F.lit(m))
    cell = F.least(F.greatest(scaled, F.lit(0)), F.lit(int(m)))
    return F.coalesce(cell, F.lit(0)).cast("long")


def zorder_code(cells: list[Column], bits: int) -> Column:
    """Morton-interleave pre-normalized integer cells: bit b of cell i
    goes to output bit ``b * len(cells) + i``.  len(cells) * bits must
    fit a signed long (<= 62)."""
    n = len(cells)
    if n == 0:
        raise ValueError("zorder_code needs at least one column")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long")
    terms = [
        F.shiftleft(
            F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
        for i, c in enumerate(cells)
        for b in range(bits)
    ]
    return reduce(lambda a, x: a.bitwiseOR(x), terms)


def _column_bounds(df: DataFrame, names: list[str]) -> dict[str, tuple]:
    """One aggregate pass for (min, max) of every clustered column."""
    aggs = []
    for c in names:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
    row = df.agg(*aggs).first()
    return {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in names}


def cluster_by_zorder(
    df: DataFrame,
    columns: list[str],
    bits: int = 12,
    num_partitions: int | None = None,
    bounds: dict[str, tuple] | None = None,
    prefix_cols: list[str] | None = None,
) -> DataFrame:
    """Return ``df`` redistributed so each output partition covers a
    tight hyper-rectangle of ``columns``: normalize each column to a
    2^bits grid, Morton-interleave, range-partition + sort on the code.
    Write the result with ``.write.parquet`` (or hand it to the segment
    sink) and min-max file stats prune scans filtered on ANY clustered
    column.  ``bounds`` overrides the one-pass min/max aggregate with
    literal (lo, hi) pairs — use for stable incremental layouts.
    ``prefix_cols`` lead the range-partition/sort key before the code —
    the segment sink passes its time bucket here so z-locality holds
    WITHIN each time chunk (Druid's segment-per-interval model)."""
    for c in columns:
        t = df.schema[c].dataType
        if isinstance(t, T.StringType):
            raise ValueError(
                f"zorder column '{c}' is a string — no linear cell "
                "mapping; cluster on a numeric/timestamp column or a "
                "hashed projection of it")
    num = df.sparkSession.sparkContext.defaultParallelism \
        if num_partitions is None else num_partitions
    proj = {
        c: (F.col(c).cast("timestamp").cast("double") * 1000.0
            if isinstance(df.schema[c].dataType, T.TimestampType)
            else F.col(c).cast("double"))
        for c in columns
    }
    if bounds is None:
        tmp = df.select(*[proj[c].alias(c) for c in columns])
        bounds = _column_bounds(tmp, columns)
    cells = [zorder_cell(proj[c], bounds[c][0], bounds[c][1], bits)
             for c in columns]
    coded = df.withColumn("__zcode", zorder_code(cells, bits))
    lead = [F.col(c) for c in (prefix_cols or [])]
    return (coded.repartitionByRange(num, *lead, F.col("__zcode"))
                 .sortWithinPartitions(*(prefix_cols or []), "__zcode")
                 .drop("__zcode"))
