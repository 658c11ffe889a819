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
            # honor a caller-supplied dialect in the driver-side header
            # parse too (sniffed ; tab | dumps would otherwise come
            # back as one mangled column name)
            raw_names = next(
                _csv.reader(
                    [first[0][0]],
                    delimiter=str(options.get("sep", ",")),
                    quotechar=str(options.get("quote", '"')),
                )
            )
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


#: candidate delimiters for dialect sniffing, in tiebreak-priority order
SNIFF_DELIMS = (",", "\t", ";", "|")


def sniff_csv_dialect(
    spark: SparkSession,
    path: str,
    sample_lines: int = 100,
) -> dict:
    """Infer the CSV delimiter and quote character from a bounded
    driver-side sample — the robustness layer real-world ingest needs
    before `read_csv_inferred` (exported dumps disagree on , ; tab |
    and the reference's CSV adjacency, cl-csv, takes the dialect as a
    caller-supplied parameter: this supplies it).

    Method (csv.Sniffer's core idea, deterministic re-implementation):
    for each candidate delimiter, parse the sample with the stdlib csv
    reader and score CONSISTENCY — a delimiter that yields the same
    column count (> 1) on every sampled line is the structural one;
    ties break by (higher column count, SNIFF_DELIMS priority). The
    quote char is '"' if any sampled field round-trips through quoting
    under the winner, else "'" if that parses strictly more cleanly.

    Driver-side by design: ``limit(sample_lines)`` reads ONE parquet/
    text split head — O(sample), not O(file) — the same bounded-sample
    contract as the reference's 1000-row type-inference reservoir
    (data-table.lisp:292-307). Returns {"delimiter", "quotechar",
    "n_columns", "consistent"}."""
    import csv as _csv

    lines = [
        r[0]
        for r in spark.read.text(path).limit(sample_lines).collect()
        if r[0].strip()
    ]
    if not lines:
        raise ValueError(f"sniff_csv_dialect: no sample lines in {path}")
    best = None
    for quote in ('"', "'"):
        for delim in SNIFF_DELIMS:
            try:
                counts = {
                    len(row)
                    for row in _csv.reader(
                        lines, delimiter=delim, quotechar=quote
                    )
                }
            except _csv.Error:
                continue
            if not counts:
                continue
            ncols = max(counts)
            consistent = len(counts) == 1 and ncols > 1
            score = (
                1 if consistent else 0,
                ncols if consistent else 0,
                -SNIFF_DELIMS.index(delim),
                1 if quote == '"' else 0,
            )
            if best is None or score > best[0]:
                best = (score, delim, quote, ncols, consistent)
    _, delim, quote, ncols, consistent = best
    return {
        "delimiter": delim,
        "quotechar": quote,
        "n_columns": ncols,
        "consistent": consistent,
    }


def read_csv_sniffed(
    spark: SparkSession,
    path: str,
    config: EngineConfig = DEFAULT_CONFIG,
    **options,
) -> DataFrame:
    """`sniff_csv_dialect` + `read_csv_inferred` in one call: detect
    the dialect from the bounded sample, then run the normal
    reference-semantics ingest with the detected delimiter/quote."""
    d = sniff_csv_dialect(spark, path)
    return read_csv_inferred(
        spark,
        path,
        config=config,
        sep=d["delimiter"],
        quote=d["quotechar"],
        **options,
    )
