"""DuckDB-oracle comparison mirroring the driver's correctness gate:
row-count + order-insensitive value comparison with column names sorted.
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
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style normalization: round to kill fp representation noise
        return round(v, 6)
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
    d = con.execute(sql)
    d_cols = [c[0].lower() for c in d.description]
    d_rows = d.fetchall()
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
