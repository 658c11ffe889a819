"""Candidate-funnel diagnostic for dedup_prefix_filter_pairs at 1× vs
100× (round-10 judge item 5): measures each pruning stage's cardinality
so the 81.9× wall-clock curve is adjudicable as either a fixable plan
problem or the information-theoretic floor of exact prefix filtering.

Stages (per corpus):
  docs            corpus size
  vocab           distinct trigram shingles
  prefix_rows     exploded prefix tokens (the join input)
  join_rows       raw prefix-join rows (multi-token matches included)
  cand_len        distinct pairs surviving the length filter
  cand_pos        pairs surviving the PPJoin positional filter
  true_pairs      verified Jaccard >= 1/2 output

Any EXACT prefix-filter algorithm under a fixed global token order must
enumerate every (doc,doc) pair sharing >= 1 prefix token — that lower
bound is cand_len (the length filter is applied inside the same join
predicate by every AllPairs implementation). If cand_len at 100× is
~join-rows-sized and cand_pos is within a small multiple of
true_pairs, the verify stage is near-minimal and the growth curve is
the candidate set itself, not the plan.

Usage: python scripts/prefix_filter_funnel.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from data_table_spark.operators.dedup import (  # noqa: E402
    _trigram_shingles,
    prefix_filter_pairs,
)
from data_table_spark.session import get_spark  # noqa: E402

T_NUM, T_DEN = 1, 2


def funnel(spark, sf_dir: str) -> dict:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sets = docs.select(
        F.col("doc_id").alias("doc"),
        _trigram_shingles(F.col("text")).alias("s"),
    )
    toks = sets.select(
        "doc", F.explode("s").alias("tok"), F.size("s").alias("n")
    )
    rank = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("rk", F.row_number().over(Window.orderBy("df", "tok")))
    )
    pos = toks.join(F.broadcast(rank.select("tok", "rk")), "tok").withColumn(
        "rn", F.row_number().over(Window.partitionBy("doc").orderBy("rk"))
    )
    prefix_len = (
        F.col("n") - F.expr(f"({T_NUM} * n + {T_DEN} - 1) div {T_DEN}") + 1
    )
    pref = pos.where(F.col("rn") <= prefix_len).select(
        "doc", "tok", "n", "rn"
    ).localCheckpoint()
    out = {
        "docs": docs.count(),
        "vocab": rank.count(),
        "prefix_rows": pref.count(),
    }
    a = pref.select(
        F.col("doc").alias("a"), "tok",
        F.col("n").alias("an"), F.col("rn").alias("ra"),
    )
    b = pref.select(
        F.col("doc").alias("b"), "tok",
        F.col("n").alias("bn"), F.col("rn").alias("rb"),
    )
    joined = a.join(b, "tok").where(F.col("a") < F.col("b"))
    out["join_rows"] = joined.count()
    len_ok = joined.where(
        T_NUM * F.greatest("an", "bn") <= T_DEN * F.least("an", "bn")
    )
    grouped = len_ok.groupBy("a", "b", "an", "bn").agg(
        F.min("ra").alias("pa"), F.min("rb").alias("pb")
    ).localCheckpoint()
    out["cand_len"] = grouped.count()
    out["cand_pos"] = grouped.where(
        (T_DEN + T_NUM)
        * (1 + F.least(F.col("an") - F.col("pa"), F.col("bn") - F.col("pb")))
        >= T_NUM * (F.col("an") + F.col("bn"))
    ).count()
    t0 = time.perf_counter()
    out["true_pairs"] = prefix_filter_pairs(docs).count()
    out["gate_sec"] = round(time.perf_counter() - t0, 1)
    return out


def main() -> None:
    spark = get_spark(app_name="prefix_filter_funnel")
    for label, sf_dir in (
        ("1x_sf0.1", "/root/testdata/sf0.1"),
        ("100x", os.path.join(REPO, ".scale_smoke", "sf10")),
    ):
        r = funnel(spark, sf_dir)
        print(json.dumps({"corpus": label, **r}))


if __name__ == "__main__":
    main()
