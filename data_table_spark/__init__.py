"""data_table_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of AccelerationNet/data-table (reference at
/root/reference/, BSD), re-expressed Spark-first.

Public surface:
- :class:`DataTable` — facade over DataFrame with reference parity semantics.
- :mod:`data_table_spark.operators` — relational surface + LLM-pipeline ops
  (dedup, similarity, text analysis, multimodal).
- :mod:`data_table_spark.sources` — parquet/CSV/records/JDBC ingest.
- :mod:`data_table_spark.streaming` — Structured Streaming windows/dedup.
"""

from .config import DEFAULT_CONFIG, EngineConfig
from .core import DataTable, with_row_id
from .inference import BadTypeGuess, auto_type, guess_types, simplify_type
from .session import get_spark
from .sources.sql import get_data_table

__all__ = [
    "DataTable",
    "with_row_id",
    "get_spark",
    "get_data_table",
    "EngineConfig",
    "DEFAULT_CONFIG",
    "auto_type",
    "guess_types",
    "simplify_type",
    "BadTypeGuess",
]
