"""SQL-string entry point (SURVEY §2.1 R33).

``get-data-table`` (clsql-data-table.lisp:13-19) is the reference's main
query entry: pass an arbitrary SQL string, get a table back, optionally
auto-typed. Here the "backing database" is Spark SQL itself — same
Catalyst planning as the DataFrame API — and auto-typing is the engine's
inference pass (useful when the query yields string columns, e.g. raw CSV
reads or string literals).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..config import DEFAULT_CONFIG, EngineConfig
from ..core import DataTable
from ..inference import auto_type
from ..sources.registry import DEFAULT_SF_DIR, register_views


def get_data_table(
    spark: SparkSession,
    query: str,
    auto_type_result: bool = False,
    config: EngineConfig = DEFAULT_CONFIG,
) -> DataTable:
    """Run a SQL string → DataTable (get-data-table,
    clsql-data-table.lisp:13-19; ``auto_type_result`` mirrors its
    ``:auto-type`` keyword)."""
    df = spark.sql(query)
    if auto_type_result:
        df = auto_type(
            df,
            sample_size=config.guessing_sample_size,
            on_error=config.on_coerce_error,
        )
    return DataTable(df, config=config)


def open_testdata(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register the TESTDATA tables as views so get_data_table queries can
    name them directly."""
    register_views(spark, sf_dir)
