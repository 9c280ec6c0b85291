"""Local emulation of the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against ``oracle_sql()``
via DuckDB: row count, column-name set, and order-insensitive value comparison
(sorted columns, sorted rows).
Usage:  python scripts/check_correctness.py [sf_dir] [--only name1,name2]
                                            [--ansi] [--bare] [--case]
                                            [--tz ZONE] [--hostile]

Host modes — the engine must be correct under ANY session it is given:
  --ansi     the DRIVER's session: ansi.enabled=true, timezone pinned UTC.
  --bare     a vanilla PySpark-4 host: ANSI on, NO pinned timezone (the
             first session a real embedding user hands us — r7 VERDICT
             crack #1 crashed here).
  --case     spark.sql.caseSensitive=true on top of the driver session.
  --tz ZONE  a non-UTC host zone (e.g. America/Los_Angeles); Druid
             semantics stay UTC, so results must not shift.
  --hostile  the whole matrix: ansi, bare, case, tz:America/Los_Angeles —
             one session, confs flipped between boards (all four are
             runtime confs).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns), ignore_index=True)


# Conf deltas per hostile mode, applied to one shared host session between
# boards (all runtime-settable).  None = unset (fall back to the JVM zone).
HOSTILE_MODES = {
    "ansi": {"spark.sql.ansi.enabled": "true",
             "spark.sql.session.timeZone": "UTC"},
    "bare": {"spark.sql.ansi.enabled": "true",
             "spark.sql.session.timeZone": None},
    "case": {"spark.sql.ansi.enabled": "true",
             "spark.sql.session.timeZone": "UTC",
             "spark.sql.caseSensitive": "true"},
    "tz":   {"spark.sql.ansi.enabled": "true",
             "spark.sql.session.timeZone": "America/Los_Angeles"},
}


def _hostile_session():
    """A session the engine did NOT create, PySpark-4 defaults (ANSI on)."""
    from pyspark.sql import SparkSession
    cpus = os.environ["SPARK_GRAFT_CPUS"]
    return (SparkSession.builder.appName("hostile-host")
            .master(f"local[{cpus}]")
            .config("spark.sql.ansi.enabled", "true")
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .getOrCreate())


def _apply_mode(spark, mode: str, tz: str | None = None):
    deltas = dict(HOSTILE_MODES[mode])
    if mode == "tz" and tz:
        deltas["spark.sql.session.timeZone"] = tz
    # reset the knobs other modes may have touched
    defaults = {"spark.sql.caseSensitive": "false"}
    for k, v in {**defaults, **deltas}.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def main() -> int:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    modes: list[str] = []
    for flag in ("--ansi", "--bare", "--case"):
        if flag in args:
            modes.append(flag[2:])
            args.remove(flag)
    tz_zone = None
    if "--tz" in args:
        i = args.index("--tz")
        tz_zone = args[i + 1]
        modes.append("tz")
        args = args[:i] + args[i + 2:]
    if "--hostile" in args:
        args.remove("--hostile")
        modes = ["ansi", "bare", "case", "tz"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    import __spark_entry__ as entrymod

    if modes:
        spark = _hostile_session()
    else:
        from incubator_druid_spark import get_spark
        spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    total_fail = 0
    for mode in (modes or [None]):
        if mode is not None:
            _apply_mode(spark, mode, tz_zone)
            print(f"=== host mode: {mode} "
                  f"(tz={spark.conf.get('spark.sql.session.timeZone')}, "
                  f"caseSensitive="
                  f"{spark.conf.get('spark.sql.caseSensitive')}) ===")
        total_fail += run_board(spark, con, entrymod, sf_dir, only)
    return 1 if total_fail else 0


def run_board(spark, con, entrymod, sf_dir, only) -> int:
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc(limit=5)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) [rows-only]")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        if set(sdf.columns) != set(odf.columns):
            print(f"FAIL  {name}: columns {sorted(sdf.columns)} != {sorted(odf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rowcount {len(sdf)} != {len(odf)}")
            n_fail += 1
            continue
        # Dtype stability check emulating the driver's EXACT value hash:
        # an int64 engine column vs a float64 oracle column (DuckDB HUGEINT
        # widening, typically sum(BIGINT)) hashes differently even when every
        # value is numerically identical.  Flag it locally before the driver
        # does — only when the float side is null-free (a nullable int column
        # legitimately lands as float64 in pandas on BOTH sides).
        dtype_bad = []
        for c in sdf.columns:
            sa, ob = sdf[c], odf[c]
            int_vs_float = (
                (pd.api.types.is_integer_dtype(sa) and pd.api.types.is_float_dtype(ob)
                 and not ob.isna().any())
                or (pd.api.types.is_float_dtype(sa) and pd.api.types.is_integer_dtype(ob)
                    and not sa.isna().any())
            )
            if int_vs_float:
                dtype_bad.append((c, str(sa.dtype), str(ob.dtype)))
        if dtype_bad:
            print(f"FAIL  {name}: dtype drift (driver hash would mismatch): "
                  + ", ".join(f"{c} spark={s} oracle={o}" for c, s, o in dtype_bad))
            n_fail += 1
            continue
        a, b = norm_frame(sdf), norm_frame(odf)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=False, rtol=1e-6, atol=1e-6)
            print(f"PASS  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL  {name}: value mismatch ({len(sdf)} rows)")
            print(str(e).splitlines()[-1] if str(e) else "")
            merged = a.compare(b) if a.shape == b.shape else None
            if merged is not None and not merged.empty:
                print(merged.head(5))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return n_fail


if __name__ == "__main__":
    raise SystemExit(main())
