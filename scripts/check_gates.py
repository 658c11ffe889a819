"""Check NAMED gates against their DuckDB oracles — the fast inner-loop
companion to verify_drive.py (full registry) and gate_check.py (driver
window). Runs each named gate at sf0.01 AND sf0.001 by default (the two
sfs the driver exercises), with the driver-faithful Arrow comparator.
Run from the repo root::

    python scripts/check_gates.py q171_anova_f q172_bloom_prefilter
    python scripts/check_gates.py --sf /root/testdata/sf0.01 q171_anova_f
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from pyspark.sql import SparkSession  # noqa: E402

from oracle_util import compare_to_oracle, duck_connection  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sfs = ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]
    if args and args[0] == "--sf":
        sfs = [args[1]]
        args = args[2:]
    if not args:
        print(__doc__)
        return 2
    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_gates")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    fails = []
    for sf in sfs:
        con = duck_connection(sf)
        for name in args:
            if name not in qs:
                print(f"{name}: NOT REGISTERED")
                fails.append(name)
                continue
            t0 = time.time()
            try:
                df = qs[name](spark, sf)
                if name not in oracles:
                    ok, msg = df.count() >= 0, "rows-only"
                else:
                    ok, msg = compare_to_oracle(df, con, oracles[name])
            except Exception as e:  # noqa: BLE001
                ok, msg = False, f"EXC {type(e).__name__}: {e}"
            print(
                f"{sf.rsplit('/', 1)[-1]:8s} {name:34s} "
                f"{'ok' if ok else 'FAIL':4s} {time.time() - t0:6.2f}s  "
                f"{str(msg)[:200]}"
            )
            if not ok:
                fails.append(name)
    if fails:
        print("FAILS:", sorted(set(fails)))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
