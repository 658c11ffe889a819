"""Q01-Q32 hash-match the DuckDB oracle at sf0.01 (SURVEY §2.3)."""

from __future__ import annotations

import pytest

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_table_spark.operators.relational import (  # noqa: E402
    RELATIONAL_ORACLE,
    RELATIONAL_QUERIES,
)
from tests.oracle_util import compare_to_oracle, duck_connection  # noqa: E402


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(RELATIONAL_ORACLE))
def test_oracle_match(name, spark, sf_dir, duck):
    df = RELATIONAL_QUERIES[name](spark, sf_dir)
    ok, msg = compare_to_oracle(df, duck, RELATIONAL_ORACLE[name])
    assert ok, f"{name}: {msg}"


def test_q17_tolerance(spark, sf_dir, duck):
    approx = (
        RELATIONAL_QUERIES["q17_approx_count_distinct"](spark, sf_dir)
        .collect()[0][0]
    )
    exact = duck.execute(
        "SELECT COUNT(DISTINCT o_custkey) FROM orders"
    ).fetchone()[0]
    assert abs(approx - exact) <= 0.05 * exact, (approx, exact)
