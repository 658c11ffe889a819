"""Round-14 optimization equivalence tests.

Every gate whose PLAN is restructured this round gets a focused test
pinning the new plan's output against the straightforward (pre-
optimization) formulation on real testdata — the round-13 discipline
continued — so the rewrite can never drift from the semantics the
DuckDB oracle checks.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402


def _rows(df, order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def test_ewma_matches_grouped_map_form(spark, sf_dir):
    """The partition-sorted mapInPandas fold must emit exactly what the
    original per-key grouped-map recurrence emitted — same float64 op
    sequence per row (python float is the same IEEE-754 double), same
    flooring expression, same per-key rn numbering."""
    import pandas as pd

    from data_table_spark.operators.udfs import ewma_per_key, load_table

    alpha = 0.2

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        y, out = None, []
        for x in pdf["value"].astype("float64"):
            y = x if y is None else alpha * x + (1.0 - alpha) * y
            out.append(y)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "rn": range(1, len(out) + 1),
                "ewma_e6": [int(v * 1e6 // 1) for v in out],
            }
        )

    e = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "value"
    )
    reference = e.groupBy("user_id").applyInPandas(
        fold, "user_id long, rn long, ewma_e6 long"
    )
    got = ewma_per_key(e)
    key = ["user_id", "rn"]
    assert _rows(got, key) == _rows(reference, key)


def test_q79_matches_self_join_form(spark, sf_dir):
    """The basket-explode pair count must equal the original
    distinct → self-join → groupBy formulation row for row (each order
    contributes each unordered distinct-part pair exactly once in both
    forms)."""
    from data_table_spark.operators.relational import _t

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    reference = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )
    got = entry.queries()["q79_cooccurrence"](spark, sf_dir)
    key = ["part_a", "part_b"]
    assert _rows(got, key) == _rows(reference, key)


def test_q117_matches_self_join_form(spark, sf_dir):
    """The basket-explode association-rule build must equal the original
    three-consumer distinct-li formulation (self-join pair counts, item
    counts, basket count) on every column, including the floored
    confidence/lift integer ratios."""
    from data_table_spark.operators.relational import _floor_div_dec, _t

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    n_baskets = li.select("l_orderkey").distinct().count()
    item = li.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count(F.lit(1)).alias("n_item")
    )
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(y, "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .groupBy(
            F.col("x.l_partkey").alias("a"),
            F.col("y.l_partkey").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    directed = pairs.select("a", "b", "n_ab").unionAll(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"), "n_ab")
    )
    ia, ib = item.alias("ia"), item.alias("ib")
    reference = (
        directed.join(ia, F.col("a") == F.col("ia.item"))
        .join(ib, F.col("b") == F.col("ib.item"))
        .select(
            F.col("a").alias("antecedent"),
            F.col("b").alias("consequent"),
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("ia.n_item").cast("long").alias("n_a"),
            F.col("ib.n_item").cast("long").alias("n_b"),
            F.floor(F.lit(1_000_000) * F.col("n_ab") / F.col("ia.n_item"))
            .cast("long").alias("confidence_e6"),
            _floor_div_dec(
                F.col("n_ab").cast("decimal(38,0)")
                * F.lit(1_000_000) * F.lit(n_baskets),
                F.col("ia.n_item").cast("decimal(38,0)") * F.col("ib.n_item"),
            ).alias("lift_e6"),
        )
    )
    got = entry.queries()["q117_association_rules"](spark, sf_dir)
    key = ["antecedent", "consequent"]
    assert _rows(got, key) == _rows(reference, key)
