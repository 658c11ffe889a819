"""CSV ingest with reference-semantics type inference (SURVEY §2.2 G1).

The reference ingests stringly data and then guesses/coerces types
(get-data-table :auto-type, clsql-data-table.lisp:13-19 →
data-table.lisp:387-407). Spark's own inferSchema does NOT implement the
lenient ``$``/``,``/``%`` parse, the "nil"-null rule, or the 2^63
demotion — so we read all-string and run the engine's inference pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..config import DEFAULT_CONFIG, EngineConfig
from ..inference import auto_type
from ..names import dedupe_names


def read_csv_inferred(
    spark: SparkSession,
    path: str,
    header: bool = True,
    explicit: dict[str, T.DataType] | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
    **options,
) -> DataFrame:
    """Read CSV as all-string, repair duplicate headers with the
    reference's numeric-suffix policy, then run the inference lattice +
    strict coercion (§1.3).

    Spark's own reader silently renames duplicate headers (a0, a1, …), so
    the raw header line is parsed driver-side (one line, not a data scan)
    and the deduped names are supplied as an explicit all-string schema.
    """
    df = None
    if header:
        import csv as _csv

        first = spark.read.text(path).limit(1).collect()
        if first:
            raw_names = next(_csv.reader([first[0][0]]))
            fixed = dedupe_names(list(raw_names), config.on_duplicate_column)
            schema = T.StructType(
                [T.StructField(n, T.StringType()) for n in fixed]
            )
            df = (
                spark.read.option("header", "true")
                .schema(schema)
                .options(**{k: str(v) for k, v in options.items()})
                .csv(path)
            )
    if df is None:
        df = (
            spark.read.option("header", str(header).lower())
            .options(**{k: str(v) for k, v in options.items()})
            .csv(path)
        )
    return auto_type(
        df,
        explicit=explicit,
        sample_size=config.guessing_sample_size,
        on_error=config.on_coerce_error,
    )
