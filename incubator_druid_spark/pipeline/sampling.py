"""Sampling operators for training-data pipelines.

Scale design (100 TB):
- stratified_sample: exact n-per-stratum via a window rank over a
  deterministic pseudo-random order (md5 of the id).  One shuffle on the
  stratum key; no driver-side state, no second pass.  Deterministic =
  re-runnable and oracle-checkable (the same rows are chosen on every
  engine that implements md5).
- proportional_sample: fraction per stratum from the same ordering, sized
  by a window count — still one shuffle.
- ``salts``: a skewed stratum (one giant source — at web-crawl scale the
  COMMON case, not the pathological one) concentrates its rank window in
  one task.  ``salts=s`` splits every stratum into s deterministic
  sub-partitions (pmod(xxhash64(id), s)) and takes a per-salt quota that
  sums to n — the sort/rank parallelizes s-ways and no single task sees
  more than ~|stratum|/s rows.  Trade-off: with salts>1 the selected SET
  differs from salts=1 (still deterministic for fixed s), and a stratum
  smaller than ~n rows may return slightly fewer than n (a salt bucket can
  run dry); use salts>1 for strata ≫ n where neither matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rand_order(id_col: str):
    """Deterministic pseudo-random sort key: md5 of the id rendered as a
    string.  Uniform over ids, stable across runs and engines."""
    return F.md5(F.col(id_col).cast("string"))


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      n_per_stratum: int, salts: int = 1) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by deterministic
    hash order (uniform, reproducible).

    ``salts>1`` is the hot-stratum path: the window partitions by
    (stratum, salt) so a giant stratum's top-n is computed by ``salts``
    parallel rank tasks instead of one; per-salt quotas are
    n//salts (+1 for the first n%salts salts), summing to n."""
    if salts <= 1:
        w = (Window.partitionBy(strata_col)
             .orderBy(_rand_order(id_col), F.col(id_col)))
        return (df.withColumn("__rk", F.row_number().over(w))
                  .filter(F.col("__rk") <= n_per_stratum)
                  .drop("__rk"))
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salts))
    base, extra = divmod(int(n_per_stratum), int(salts))
    quota = F.lit(base) + F.when(F.col("__salt") < extra, 1).otherwise(0)
    w = (Window.partitionBy(strata_col, "__salt")
         .orderBy(_rand_order(id_col), F.col(id_col)))
    return (df.withColumn("__salt", salt)
              .withColumn("__rk", F.row_number().over(w))
              .filter(F.col("__rk") <= quota)
              .drop("__rk", "__salt"))


def weighted_mixture(df: DataFrame, weights: dict[str, float],
                     strata_col: str = "source", id_col: str = "doc_id",
                     default_weight: float = 1.0) -> DataFrame:
    """Corpus mixing by per-stratum sampling weight — the 'N epochs of
    wikipedia, 0.5 of common-crawl' recipe training mixtures are built
    from.  Weight w emits floor(w) full copies of every row plus one
    extra copy for the deterministic md5-fraction of rows below the
    fractional part; each copy carries an `epoch` column (0-based) so
    the loader can vary shuffling/masking per repetition.

    Deterministic (md5 of the id — same rows chosen on every engine and
    every run) and closed-form: one weight projection + one bounded
    explode, no shuffle, no driver state.  Weight 0 drops the stratum."""
    if any(v < 0 for v in weights.values()) or default_weight < 0:
        raise ValueError("mixture weights must be >= 0")
    w = F.lit(float(default_weight))
    for k, v in sorted(weights.items()):
        w = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(w)
    full = F.floor(w).cast("long")
    frac = w - full
    # uniform [0,1): first 8 md5 hex chars of the id
    u = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16, 10).cast("double") / F.lit(float(16 ** 8)))
    n_copies = full + F.when(u < frac, F.lit(1)).otherwise(F.lit(0))
    return (df.withColumn("__n_copies", n_copies)
              .filter(F.col("__n_copies") > 0)
              .withColumn("epoch", F.explode(
                  F.sequence(F.lit(0).cast("long"),
                             F.col("__n_copies") - 1)))
              .drop("__n_copies"))


def proportional_sample(df: DataFrame, strata_col: str, id_col: str,
                        fraction: float, salts: int = 1) -> DataFrame:
    """ceil(fraction × |stratum|) rows per stratum, same ordering — every
    stratum is represented (unlike a Bernoulli sample, which loses small
    strata entirely at small fractions).

    ``salts>1``: per-salt window + per-salt proportional quota
    (ceil(fraction × |salt slice|)), so a hot stratum's rank never lands in
    a single task; the realized fraction is within salts rows of exact."""
    if salts <= 1:
        w = (Window.partitionBy(strata_col)
             .orderBy(_rand_order(id_col), F.col(id_col)))
        cnt = Window.partitionBy(strata_col)
        return (df.withColumn("__rk", F.row_number().over(w))
                  .withColumn("__n", F.count(F.lit(1)).over(cnt))
                  .filter(F.col("__rk")
                          <= F.ceil(F.col("__n") * F.lit(fraction)))
                  .drop("__rk", "__n"))
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salts))
    w = (Window.partitionBy(strata_col, "__salt")
         .orderBy(_rand_order(id_col), F.col(id_col)))
    cnt = Window.partitionBy(strata_col, "__salt")
    return (df.withColumn("__salt", salt)
              .withColumn("__rk", F.row_number().over(w))
              .withColumn("__n", F.count(F.lit(1)).over(cnt))
              .filter(F.col("__rk") <= F.ceil(F.col("__n") * F.lit(fraction)))
              .drop("__rk", "__n", "__salt"))
