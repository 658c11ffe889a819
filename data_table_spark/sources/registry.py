"""TESTDATA parquet registry (TESTDATA.md tables).

Loads are plain ``spark.read.parquet`` — Catalyst pushes filters and prunes
columns into the scan, which is the whole point of declaring queries on top
of these instead of materializing intermediates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet stores ts as parquet TIMESTAMP(NANOS), which the
        # Spark reader rejects; read nanos as long and convert to a
        # microsecond timestamp (expression-only, no data pass)
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: ts/1000 in double would round at ~1.7e18 ns
            # (beyond double's 2^53 integer precision) and shift values by
            # a microsecond
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every TESTDATA table as a temp view so ``spark.sql`` queries
    (the engine's get-data-table equivalent, clsql-data-table.lisp:13-19)
    can reference them by name."""
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
