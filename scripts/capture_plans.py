"""Capture .explain("formatted") output for named board queries.

Usage: python scripts/capture_plans.py <out_dir> <suffix> name1,name2,...
e.g.:  python scripts/capture_plans.py plans/r09 after dedup_fingerprint,ts_day

Writes <out_dir>/<name>_<suffix>.txt for each query, using the sf0.1
testdata (the bench scale) so plan shapes match the benched queries.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    import __spark_entry__ as entrymod
    from incubator_druid_spark import get_spark
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
