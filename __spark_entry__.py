"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as
  (spark, sf_dir) -> DataFrame builders.
``oracle_sql()`` — matching DuckDB SQL for the hash-compare gate.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_table_spark.operators.relational import (
    RELATIONAL_ORACLE,
    RELATIONAL_QUERIES,
)

try:  # extension operators land incrementally; keep entry importable
    from data_table_spark.operators.dedup import DEDUP_ORACLE, DEDUP_QUERIES
except Exception:  # pragma: no cover
    DEDUP_QUERIES, DEDUP_ORACLE = {}, {}
try:
    from data_table_spark.operators.similarity import (
        SIMILARITY_ORACLE,
        SIMILARITY_QUERIES,
    )
except Exception:  # pragma: no cover
    SIMILARITY_QUERIES, SIMILARITY_ORACLE = {}, {}
try:
    from data_table_spark.operators.textstats import (
        TEXTSTATS_ORACLE,
        TEXTSTATS_QUERIES,
    )
except Exception:  # pragma: no cover
    TEXTSTATS_QUERIES, TEXTSTATS_ORACLE = {}, {}
try:
    from data_table_spark.operators.reference_ops import (
        REFERENCE_ORACLE,
        REFERENCE_QUERIES,
    )
except Exception:  # pragma: no cover
    REFERENCE_QUERIES, REFERENCE_ORACLE = {}, {}
try:
    from data_table_spark.operators.udfs import UDF_ORACLE, UDF_QUERIES
except Exception:  # pragma: no cover
    UDF_QUERIES, UDF_ORACLE = {}, {}
try:
    from data_table_spark.operators.multimodal import (
        MULTIMODAL_ORACLE,
        MULTIMODAL_QUERIES,
    )
except Exception:  # pragma: no cover
    MULTIMODAL_QUERIES, MULTIMODAL_ORACLE = {}, {}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY §2.3 Q12) on sf0.001."""
    return RELATIONAL_QUERIES["q12_group_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(RELATIONAL_QUERIES)
    out.update(DEDUP_QUERIES)
    out.update(SIMILARITY_QUERIES)
    out.update(TEXTSTATS_QUERIES)
    out.update(REFERENCE_QUERIES)
    out.update(MULTIMODAL_QUERIES)
    out.update(UDF_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLE)
    out.update(DEDUP_ORACLE)
    out.update(SIMILARITY_ORACLE)
    out.update(TEXTSTATS_ORACLE)
    out.update(REFERENCE_ORACLE)
    out.update(MULTIMODAL_ORACLE)
    out.update(UDF_ORACLE)
    return out
