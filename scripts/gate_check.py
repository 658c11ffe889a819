"""Pre-flight simulation of the driver's correctness gate.

Runs the first N (default 50 — the driver's observed window) entries of
``__spark_entry__.queries()`` under a RAW ``SparkSession`` (no tuned
session-factory configs, mirroring the driver) at sf0.01 and compares
each against its ``oracle_sql()`` entry with the same multiset/value
normalization as the driver gate. Queries with no oracle get a rows-only
smoke check. Run from the repo root::

    python scripts/gate_check.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pyspark.sql import SparkSession  # noqa: E402

from oracle_util import compare_to_oracle, duck_connection  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    import __spark_entry__ as entry_mod

    # raw session on purpose: the driver does not use our session factory
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("gate_check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duck_connection(SF_DIR)
    failures = []
    for i, (name, fn) in enumerate(qs.items()):
        if i >= n:
            break
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            if name in oracles:
                ok, msg = compare_to_oracle(df, con, oracles[name])
            else:
                ok, msg = df.count() >= 0, "rows-only"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        status = "ok" if ok else "FAIL"
        print(f"[{i + 1:2d}/{n}] {name:32s} {status:4s} "
              f"{time.time() - t0:6.2f}s  {msg[:120]}")
        if not ok:
            failures.append((name, msg))
    print(f"\n{n - len(failures)}/{n} green")
    for name, msg in failures:
        print(f"  FAIL {name}: {msg[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
