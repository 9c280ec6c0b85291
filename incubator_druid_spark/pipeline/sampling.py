"""Sampling operators for training-data pipelines.

Scale design (100 TB):
- stratified_sample: exact n-per-stratum via a window rank over a
  deterministic pseudo-random order (md5 of the id).  One shuffle on the
  stratum key; no driver-side state, no second pass.  Deterministic =
  re-runnable and oracle-checkable (the same rows are chosen on every
  engine that implements md5).
- proportional_sample: fraction per stratum from the same ordering, sized
  by a window count — still one shuffle.
- A skewed stratum (one giant source) concentrates its rank window in one
  task; for pathological strata pre-split by a salt on the md5 prefix and
  take the per-salt quota n/salts (documented escape hatch — the plain
  window is correct and fine up to ~100M rows per stratum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rand_order(id_col: str):
    """Deterministic pseudo-random sort key: md5 of the id rendered as a
    string.  Uniform over ids, stable across runs and engines."""
    return F.md5(F.col(id_col).cast("string"))


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      n_per_stratum: int) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by deterministic
    hash order (uniform, reproducible)."""
    w = (Window.partitionBy(strata_col)
         .orderBy(_rand_order(id_col), F.col(id_col)))
    return (df.withColumn("__rk", F.row_number().over(w))
              .filter(F.col("__rk") <= n_per_stratum)
              .drop("__rk"))


def proportional_sample(df: DataFrame, strata_col: str, id_col: str,
                        fraction: float) -> DataFrame:
    """ceil(fraction × |stratum|) rows per stratum, same ordering — every
    stratum is represented (unlike a Bernoulli sample, which loses small
    strata entirely at small fractions)."""
    w = (Window.partitionBy(strata_col)
         .orderBy(_rand_order(id_col), F.col(id_col)))
    cnt = Window.partitionBy(strata_col)
    return (df.withColumn("__rk", F.row_number().over(w))
              .withColumn("__n", F.count(F.lit(1)).over(cnt))
              .filter(F.col("__rk") <= F.ceil(F.col("__n") * F.lit(fraction)))
              .drop("__rk", "__n"))
