"""Registry lint: no oracle may expose a DuckDB result type the driver's
pandas canonicalizer mangles (no Spark needed — pure DuckDB binding).

Round-5 incident: three oracles returned HUGEINT columns (DuckDB SUM over
integers), which ``rel.df()`` converts to float64 — the driver hashed
``9.0`` against Spark's ``9`` and recorded hash_match=false despite
byte-identical values. The fix is CAST(SUM(..) AS BIGINT) at the oracle;
this lint makes the whole class unshippable. DECIMAL is banned for the
same reason (pandas renders it as float64/object depending on version).
Binding via ``con.sql(sql).types`` plans but does not execute, so this
covers all ~143 oracles in seconds.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from oracle_util import duck_connection  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")

BANNED_EXACT = {"HUGEINT", "UHUGEINT"}


def test_no_hugeint_or_decimal_oracle_columns():
    con = duck_connection(SF_DIR)
    bad = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        offenders = [
            (c, t)
            for c, t in zip(rel.columns, (str(t).upper() for t in rel.types))
            if t in BANNED_EXACT or t.startswith("DECIMAL")
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "oracle result columns with pandas-hostile DuckDB types "
        f"(wrap integer SUMs in CAST(.. AS BIGINT)): {bad}"
    )


def test_comparator_catches_hugeint_typing(spark):
    """Regression for the round-5 escape: an integer-identical result
    must FAIL the comparison when the oracle column is HUGEINT (the
    pandas fetch renders it float64, exactly as the driver sees it),
    and PASS once cast to BIGINT."""
    from oracle_util import compare_to_oracle

    con = duck_connection(SF_DIR)
    sdf = spark.range(1).selectExpr("CAST(9 AS BIGINT) AS x")
    ok_hug, _ = compare_to_oracle(
        sdf, con, "SELECT SUM(v) AS x FROM (VALUES (4), (5)) t(v)"
    )
    assert not ok_hug, "HUGEINT oracle must hash-mismatch a long result"
    ok_big, msg = compare_to_oracle(
        sdf, con,
        "SELECT CAST(SUM(v) AS BIGINT) AS x FROM (VALUES (4), (5)) t(v)",
    )
    assert ok_big, msg
