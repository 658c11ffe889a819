"""Benchmark runner: executes every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Materialization is a noop-sink write (full distributed compute, no
driver-side collect) — measures the engine, not the result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_table_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="data_table_spark_bench")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    # warm the JVM/codegen once so timings reflect steady state, not init
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            materialize(qs[name](spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a failing query gets a null, not a crash
            timings[name] = None
            print(f"# bench error in {name}: {e}", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)
    print(
        json.dumps(
            {
                "metric": "total_query_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
