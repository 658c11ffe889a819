"""Invariant tests for the round-8 operators — each pins an algebraic
property the DuckDB hash oracle cannot state (the oracle proves value
equality; these prove the SEMANTICS are the intended ones)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_table_spark.operators.relational import (  # noqa: E402
    RELATIONAL_QUERIES,
)
from data_table_spark.sources.registry import load_table  # noqa: E402


def test_pvm_bridge_is_additive(spark, sf_smoke):
    """q157: volume + price effects must reconstruct the revenue delta
    EXACTLY on every row — the residual definition makes the bridge
    additive by construction; this pins that no row escapes it."""
    rows = RELATIONAL_QUERIES["q157_price_volume_mix"](
        spark, sf_smoke
    ).collect()
    assert rows
    for r in rows:
        assert (
            r["volume_effect_cents"] + r["price_effect_cents"]
            == r["rev1_cents"] - r["rev0_cents"]
        ), r


def test_window_funnel_matches_bruteforce(spark, sf_smoke):
    """q154 levels equal a per-user python recompute of the documented
    semantics (first-view anchor, earliest-next-step chain, 24h cap)."""
    ev = (
        load_table(spark, "events", sf_smoke)
        .select("user_id", "event_type", "ts")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    exp: dict = {}
    for u, rows in by_user.items():
        t1 = min((t for t, k in rows if k == "view"), default=None)
        t2 = (
            min((t for t, k in rows if k == "click" and t > t1), default=None)
            if t1 else None
        )
        t3 = (
            min((t for t, k in rows if k == "purchase" and t > t2), default=None)
            if t2 else None
        )
        lim = t1 and (t1 + __import__("datetime").timedelta(hours=24))
        if t3 and t3 <= lim:
            lv = 3
        elif t2 and t2 <= lim:
            lv = 2
        elif t1:
            lv = 1
        else:
            lv = 0
        exp[lv] = exp.get(lv, 0) + 1
    got = {
        r["level"]: r["n_users"]
        for r in RELATIONAL_QUERIES["q154_window_funnel"](
            spark, sf_smoke
        ).collect()
    }
    assert got == exp


def test_new_vs_returning_accounting(spark, sf_smoke):
    """q158: every user is new exactly once, so sum(new) == distinct
    users, and per-day new+returning == that day's distinct actives."""
    out = RELATIONAL_QUERIES["q158_new_vs_returning"](spark, sf_smoke)
    rows = out.collect()
    ev = load_table(spark, "events", sf_smoke)
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["new_users"] for r in rows) == n_users
    per_day = {
        r["day"]: r["cnt"]
        for r in ev.select(
            F.to_date("ts").cast("string").alias("day"), "user_id"
        )
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in rows:
        assert r["new_users"] + r["returning_users"] == per_day[r["day"]]


def test_quality_calibration_deciles_partition_sources(spark, sf_smoke):
    """pipe_quality_calibration: per source, decile counts must sum to
    the source's doc count, every decile sits in 0..9, and sizes are
    near-equal (the integer rank arithmetic guarantees |n_d − n/10| ≤ 1
    for n ≥ 10)."""
    from data_table_spark.operators.pipeline import PIPELINE_QUERIES

    rows = PIPELINE_QUERIES["pipe_quality_calibration"](
        spark, sf_smoke
    ).collect()
    per_src_total: dict = {}
    for r in rows:
        assert 0 <= r["decile"] <= 9
        assert r["min_score"] <= r["max_score"]
        per_src_total[r["source"]] = (
            per_src_total.get(r["source"], 0) + r["n_docs"]
        )
    truth = {
        r["source"]: r["n"]
        for r in load_table(spark, "documents", sf_smoke)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_src_total == truth
    for r in rows:
        n = truth[r["source"]]
        if n >= 10:
            assert abs(r["n_docs"] - n / 10) <= 1, r


def test_wav_energy_total_decomposes(spark, sf_smoke):
    """media_wav_energy: window energies per doc must sum to the
    whole-signal energy recomputed from the document bytes, and the
    window sample counts must tile the 64-sample signal."""
    from data_table_spark.operators.multimodal import MULTIMODAL_QUERIES

    rows = MULTIMODAL_QUERIES["media_wav_energy"](spark, sf_smoke).collect()
    got: dict = {}
    samples: dict = {}
    for r in rows:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + r["energy"]
        samples[r["doc_id"]] = samples.get(r["doc_id"], 0) + r["n_samples"]
    docs = load_table(spark, "documents", sf_smoke).select(
        "doc_id", "text"
    ).collect()
    for d in docs:
        data = d["text"].encode()
        cyc = (data * (1 + 64 // len(data)))[:64]
        exp = sum(((b - 128) * 256) ** 2 for b in cyc)
        assert got[d["doc_id"]] == exp
        assert samples[d["doc_id"]] == 64


def test_filtered_topk_respects_predicate(spark, sf_smoke):
    """sim_filtered_topk: every hit passes the metadata predicate, and
    the scores equal the unfiltered ranking restricted to that label
    (pre-filter semantics, not post-truncation)."""
    from data_table_spark.operators.similarity import (
        FILTER_LABEL,
        QUERY_VEC_ID,
        SIMILARITY_QUERIES,
        TOP_K,
        cosine,
    )

    hits = SIMILARITY_QUERIES["sim_filtered_topk"](spark, sf_smoke).collect()
    assert 0 < len(hits) <= TOP_K
    assert all(h["label"] == FILTER_LABEL for h in hits)
    e = load_table(spark, "embeddings", sf_smoke)
    q = e.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    brute = (
        e.where(
            (F.col("label") == FILTER_LABEL)
            & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("s"),
        )
        .orderBy(F.col("s").desc(), "vec_id")
        .limit(TOP_K)
        .collect()
    )
    assert [(h["vec_id"], h["cos_sim"]) for h in hits] == [
        (b["vec_id"], b["s"]) for b in brute
    ]


def test_geo_radius_join_matches_bruteforce(spark, sf_dir):
    """q162: the cell-bucketed join must find EXACTLY the brute-force
    all-pairs-within-radius set (completeness: the 3x3 neighborhood
    covers the radius; soundness: the haversine verify). Runs at sf0.01
    - the sf0.001 customer set is too sparse for any pair inside 10 km
    (zero-row degeneracy)."""
    import math

    rows = RELATIONAL_QUERIES["q162_geo_radius_join"](
        spark, sf_dir
    ).collect()
    got = {(r["a"], r["b"]) for r in rows}

    ids = [
        r["c_custkey"]
        for r in load_table(spark, "customer", sf_dir)
        .select("c_custkey").collect()
    ]

    def pt(k):
        la = 45.0 + 5.0 * ((k * 2654435761) % (1 << 31)) / float(1 << 31)
        lo = 0.0 + 10.0 * (((k + 7) * 2246822519) % (1 << 31)) / float(1 << 31)
        return la, lo

    def hav(p, q):
        r = math.pi / 180.0
        dla, dlo = (q[0] - p[0]) * r / 2, (q[1] - p[1]) * r / 2
        x = (
            math.sin(dla) ** 2
            + math.cos(p[0] * r) * math.cos(q[0] * r) * math.sin(dlo) ** 2
        )
        return 2.0 * 6371000.0 * math.asin(math.sqrt(x))

    pts = {k: pt(k) for k in ids}
    exp = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if math.floor(hav(pts[min(a, b)], pts[max(a, b)])) <= 10000
        for a, b in [(min(a, b), max(a, b))]
    }
    assert got == exp and got


def test_gini_by_region_bounds_and_global_consistency(spark, sf_smoke):
    """q165: every region's Gini lies in [0, 1e6) and regions with more
    unequal revenue must not be NEGATIVE; totals reconcile with orders."""
    rows = RELATIONAL_QUERIES["q165_gini_by_region"](spark, sf_smoke).collect()
    assert rows
    total = sum(r["total_cents"] for r in rows)
    orders = load_table(spark, "orders", sf_smoke)
    exp = orders.select(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("s")
    ).collect()[0]["s"]
    assert total == exp
    for r in rows:
        assert 0 <= r["gini_e6"] < 1_000_000, r


def test_tile_hashes_consistent_with_whole_image(spark, sf_smoke):
    """media_tile_hashes: identical documents (identical synthesized
    images) must share all four tile hashes; every doc yields exactly
    4 tiles of 16 bits."""
    from data_table_spark.operators.multimodal import MULTIMODAL_QUERIES

    rows = MULTIMODAL_QUERIES["media_tile_hashes"](spark, sf_smoke).collect()
    per_doc: dict = {}
    for r in rows:
        assert len(r["tile_bits"]) == 16
        per_doc.setdefault(r["doc_id"], {})[r["tile"]] = r["tile_bits"]
    docs = load_table(spark, "documents", sf_smoke).select(
        "doc_id", "text"
    ).collect()
    by_text: dict = {}
    for d in docs:
        assert set(per_doc[d["doc_id"]].keys()) == {0, 1, 2, 3}
        by_text.setdefault(d["text"], []).append(d["doc_id"])
    for _text, ids in by_text.items():
        sigs = {tuple(sorted(per_doc[i].items())) for i in ids}
        assert len(sigs) == 1, "identical images hashed differently"


def test_repeat_purchase_interval_monotone(spark, sf_smoke):
    """q164: p50 <= p90 per segment, and gap counts equal orders minus
    first-orders (every non-first order contributes one gap)."""
    rows = RELATIONAL_QUERIES["q164_repeat_purchase_interval"](
        spark, sf_smoke
    ).collect()
    assert rows
    for r in rows:
        assert r["p50_days"] <= r["p90_days"], r
    o = load_table(spark, "orders", sf_smoke)
    c = load_table(spark, "customer", sf_smoke)
    n_orders = o.count()
    n_buyers = o.select("o_custkey").distinct().count()
    assert sum(r["n_gaps"] for r in rows) == n_orders - n_buyers
