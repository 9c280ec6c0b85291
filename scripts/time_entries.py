"""Time every declared query end-to-end (entry build + count action).

Usage: python scripts/time_entries.py [sf_dir] [names_csv|all] [reps]

Times `queries()[name](spark, sf_dir).count()` — the bench's own timed
action — once per rep with the bench's session config, printing one line
per entry and a sorted summary.  Used to screen ALL board entries for
fixed-overhead outliers (the driver's bench times only the headline set).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    import __spark_entry__ as entrymod
    from incubator_druid_spark import get_spark
    spark = get_spark(extra_conf={
        "spark.sql.columnVector.offheap.enabled": "true",
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "8g",
        "spark.sql.parquet.columnarReaderBatchSize": "32768",
    })
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = list(qs) if which == "all" else which.split(",")
    # session warmup (bench-alike): fault tables + codegen paths once
    from incubator_druid_spark.catalog import load_catalog
    cat = load_catalog(spark, sf_dir)
    cat.table("lineitem").count()
    cat.table("events").count()
    out = {}
    for name in names:
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.time()
            try:
                qs[name](spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001
                print(f"ERR  {name}: {type(e).__name__}: {e}", flush=True)
                runs = None
                break
            runs.append(time.time() - t0)
        if runs:
            out[name] = min(runs)
            print(f"{out[name]:8.3f}s  {name}", flush=True)
    print("\n=== slowest (best-of-%d) ===" % reps)
    for name, sec in sorted(out.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{sec:8.3f}s  {name}")
    print(f"total {sum(out.values()):.1f}s over {len(out)} entries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
