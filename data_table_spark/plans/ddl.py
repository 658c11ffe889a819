"""Data-driven DDL sizing + table round-trip (SURVEY §2.1 R36-R39).

Reference (into /root/reference/):
- mssql-db-types-for-data-table: varchar sized to next power of two ≥ max
  observed length, text at ≥ 8000; int vs bigint by observed min/max vs
  ±2^31 (clsql-data-table.lisp:56-80)
- ensure-mssql/postgres-table-for-data-table: CREATE TABLE generation with
  serial PK, excluded columns, dry-run (clsql-data-table.lisp:82-128,
  183-192)
- make-row-importer/import-data-table: row-at-a-time INSERT loop
  (clsql-data-table.lisp:194-239) — replaced by batched writes
  (saveAsTable / JDBC batchsize), the scale-correct equivalent.
- exec / has-table? (clsql-data-table.lisp:4-10)

The sizing scan is ONE aggregation job over the table (max(length), min,
max per column) — same idea as the reference's per-column scans, but a
single distributed pass instead of N in-memory list traversals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1
TEXT_CUTOVER = 8000  # varchar → text (clsql-data-table.lisp:68-70)


def next_highest_power_of_two(n: int) -> int:
    """clsql-data-table.lisp:56-57."""
    if n <= 1:
        return 1
    return 1 << (int(n - 1).bit_length())


def column_stats(df: DataFrame) -> dict[str, dict]:
    """One agg pass: per string column max(length); per integral column
    min/max. Everything else typed statically."""
    aggs = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StringType):
            aggs.append(F.max(F.length(F.col(f.name))).alias(f"len__{f.name}"))
        elif isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType)):
            aggs.append(F.min(F.col(f.name)).alias(f"min__{f.name}"))
            aggs.append(F.max(F.col(f.name)).alias(f"max__{f.name}"))
    if not aggs:
        return {}
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict[str, dict] = {}
    for k, v in row.items():
        kind, name = k.split("__", 1)
        out.setdefault(name, {})[kind] = v
    return out


def db_types_for_dataframe(df: DataFrame, dialect: str = "postgres") -> dict[str, str]:
    """Column → DB type string, sized from the data (R36)."""
    stats = column_stats(df)
    out: dict[str, str] = {}
    for f in df.schema.fields:
        dt = f.dataType
        if isinstance(dt, T.StringType):
            max_len = (stats.get(f.name, {}).get("len") or 0)
            if max_len >= TEXT_CUTOVER:
                out[f.name] = "TEXT" if dialect == "postgres" else "VARCHAR(MAX)"
            else:
                out[f.name] = f"VARCHAR({next_highest_power_of_two(max_len or 1)})"
        elif isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
            lo = stats.get(f.name, {}).get("min")
            hi = stats.get(f.name, {}).get("max")
            small = (
                lo is not None and hi is not None
                and lo >= INT32_MIN and hi <= INT32_MAX
            )
            out[f.name] = "INT" if small else "BIGINT"
        elif isinstance(dt, (T.DoubleType, T.FloatType)):
            out[f.name] = "DOUBLE PRECISION" if dialect == "postgres" else "FLOAT"
        elif isinstance(dt, T.TimestampType):
            out[f.name] = "TIMESTAMP" if dialect == "postgres" else "DATETIME2"
        elif isinstance(dt, T.DateType):
            out[f.name] = "DATE"
        elif isinstance(dt, T.BooleanType):
            out[f.name] = "BOOLEAN" if dialect == "postgres" else "BIT"
        elif isinstance(dt, T.DecimalType):
            out[f.name] = f"DECIMAL({dt.precision},{dt.scale})"
        else:
            out[f.name] = "TEXT" if dialect == "postgres" else "VARCHAR(MAX)"
    return out


def create_table_ddl(
    df: DataFrame,
    table_name: str,
    dialect: str = "postgres",
    serial_pk: str | None = "id",
    excluded: tuple[str, ...] = (),
) -> str:
    """CREATE TABLE text (R37: serial PK prepended, excluded columns
    dropped, names assumed pre-escaped via names.english_to_postgres/
    english_to_mssql)."""
    types = db_types_for_dataframe(df, dialect)
    cols = []
    if serial_pk and serial_pk not in df.columns:
        pk = (
            f"{serial_pk} SERIAL PRIMARY KEY"
            if dialect == "postgres"
            else f"{serial_pk} INT IDENTITY(1,1) PRIMARY KEY"
        )
        cols.append(pk)
    for f in df.schema.fields:
        if f.name in excluded:
            continue
        cols.append(f"{f.name} {types[f.name]}")
    body = ",\n  ".join(cols)
    return f"CREATE TABLE {table_name} (\n  {body}\n)"


def has_table(spark: SparkSession, name: str) -> bool:
    """R39 has-table? → catalog check."""
    return spark.catalog.tableExists(name)


def ensure_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    mode: str = "error",
) -> None:
    """Catalog-backed equivalent of ensure-table-for-data-table: create a
    managed table matching df's schema (Spark owns physical typing for
    its own catalog; db_types_for_dataframe drives external JDBC DDL)."""
    if not has_table(spark, name):
        df.limit(0).write.saveAsTable(name)
    elif mode == "error":
        raise ValueError(f"table {name} already exists")


class ImportValidationError(ValueError):
    """Raised by import_dataframe(on_insert_error='raise') when rows fail
    the ``validate`` predicate — the batched surface of the reference's
    insert-error condition (clsql-data-table.lisp:228-234)."""

    def __init__(self, n_invalid: int, sample_rows):
        self.n_invalid = n_invalid
        self.sample_rows = sample_rows
        super().__init__(
            f"{n_invalid} rows fail the import validation predicate; "
            f"sample: {sample_rows}"
        )


def import_dataframe(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    row_filter=None,
    row_transform=None,
    mode: str = "append",
    validate=None,
    on_insert_error: str = "raise",
    max_retries: int = 2,
    writer=None,
) -> int:
    """R38 import-data-table, batched: the reference's row-fn hook
    (clsql-data-table.lisp:224-225) can both VETO a row (returning nil)
    and REWRITE it (returning a modified row) before insert — that splits
    into ``row_filter`` (a boolean Column, pre-write filter) and
    ``row_transform`` (DataFrame -> DataFrame, applied after the filter).
    Both stay declarative so Catalyst fuses them into the write's scan;
    the write itself is a single distributed append, not per-row INSERTs.

    ``on_insert_error`` is the batched form of the reference's per-INSERT
    restart protocol (try-again / skip, clsql-data-table.lisp:228-234).
    A per-row INSERT can catch the database's own error row-by-row; a
    distributed batch write cannot, so the row-level half moves BEFORE
    the write as a ``validate`` predicate (boolean Column marking rows
    the target would accept — NOT NULL, ranges, lengths — typically
    derived from the same db_types_for_dataframe sizing used for DDL):

    - 'raise' (default, = declining both restarts): any validate-failing
      row aborts the import before anything writes, with count + sample
      in ImportValidationError.
    - 'skip' (= the skip restart): validate-failing rows are dropped,
      the rest write once; returns the target count as usual.
    - 'retry' (= the try-again restart): the WRITE is re-attempted up to
      ``max_retries`` extra times on failure — the batched use-case is
      transient DB errors (deadlock victim, failover), where the
      reference would re-run the same INSERT. validate-failing rows
      still abort first when a predicate is given: retrying cannot fix
      a constraint violation, and silently skipping under 'retry' would
      conflate the two policies.

    ``writer`` overrides the write action (e.g. a write_jdbc closure for
    an external DB); default appends to the session catalog table."""
    if on_insert_error not in ("raise", "skip", "retry"):
        raise ValueError(
            f"on_insert_error must be 'raise'|'skip'|'retry', got {on_insert_error!r}"
        )
    out = df.where(row_filter) if row_filter is not None else df
    if row_transform is not None:
        out = row_transform(out)
    if validate is not None:
        if on_insert_error == "skip":
            out = out.where(validate)
        else:
            bad = out.where(~F.coalesce(validate, F.lit(False)))
            sample = bad.limit(3).collect()
            if sample:
                raise ImportValidationError(bad.count(), sample)

    def _write() -> None:
        if writer is not None:
            writer(out)
        else:
            out.write.mode(mode).saveAsTable(name)

    attempts = 1 + (max_retries if on_insert_error == "retry" else 0)
    for attempt in range(attempts):
        try:
            _write()
            break
        except ImportValidationError:
            raise
        except Exception:
            if attempt + 1 >= attempts:
                raise
    if writer is not None:
        return -1  # external target: caller counts via its own reader
    return spark.table(name).count()


def read_jdbc(spark: SparkSession, url: str, table: str, **props) -> DataFrame:
    """R33's external half: read a DB table/query into a DataFrame."""
    reader = spark.read
    for k, v in props.items():
        reader = reader.option(k, v)
    return reader.jdbc(url, table)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10000,
    dialect: str = "postgres",
    **props,
) -> None:
    """External-DB path: batched JDBC append with data-driven column types
    (replaces the reference's one-INSERT-per-row loop,
    clsql-data-table.lisp:229-239). Tested against embedded Derby (on the
    Spark classpath); the sizing strings are ANSI enough for Derby and
    Postgres both."""
    # createTableColumnTypes must parse as Spark SQL types — normalize the
    # dialect strings (DOUBLE PRECISION/TEXT are DDL-only spellings)
    def spark_parsable(t: str) -> str:
        return {
            "DOUBLE PRECISION": "DOUBLE",
            "FLOAT": "DOUBLE",
            "TEXT": "VARCHAR(32672)",
            "VARCHAR(MAX)": "VARCHAR(32672)",
            "DATETIME2": "TIMESTAMP",
            "BIT": "BOOLEAN",
        }.get(t, t)

    col_types = ", ".join(
        f"{c} {spark_parsable(t)}"
        for c, t in db_types_for_dataframe(df, dialect).items()
    )
    w = (
        df.write.mode(mode)
        .option("batchsize", str(batchsize))
        .option("createTableColumnTypes", col_types)
    )
    for k, v in props.items():
        w = w.option(k, v)
    w.jdbc(url, table)
