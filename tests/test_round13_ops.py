"""Invariant tests for the round-13 operators — each pins an algebraic
property or a pure-Python recompute the DuckDB hash oracle cannot state
(the oracle proves value equality; these prove the SEMANTICS are the
intended ones)."""

from __future__ import annotations

import datetime
import math
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_table_spark.operators.dedup import (  # noqa: E402
    DEDUP_QUERIES,
    PAIR_BOUND,
    SNM_WINDOW,
)
from data_table_spark.operators.multimodal import (  # noqa: E402
    MULTIMODAL_QUERIES,
)
from data_table_spark.operators.pipeline import (  # noqa: E402
    PIPELINE_QUERIES,
    RESAMPLE_N,
    SENT_SPLIT,
)
from data_table_spark.operators.relational import (  # noqa: E402
    LR_SEATS,
    RELATIONAL_QUERIES,
)
from data_table_spark.operators.udfs import UDF_QUERIES  # noqa: E402
from data_table_spark.sources.registry import load_table  # noqa: E402


# --------------------------------------------------------------------------
# q196 gaps-and-islands streaks
# --------------------------------------------------------------------------

def test_streak_islands_python_replay(spark, sf_smoke):
    """Per-user streak summary replayed by walking each user's sorted
    distinct day set in Python; max_streak <= active_days and the
    streak/day accounting is self-consistent."""
    e = load_table(spark, "events", sf_smoke)
    per: dict[int, set] = defaultdict(set)
    for r in e.select("user_id", F.to_date("ts").alias("day")).collect():
        per[r["user_id"]].add(r["day"])
    want = {}
    for uid, days in per.items():
        sd = sorted(days)
        runs, cur = [], 1
        for a, b in zip(sd, sd[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        want[uid] = (len(sd), len(runs), max(runs))
    got = {
        r["user_id"]: (r["active_days"], r["n_streaks"], r["max_streak"])
        for r in RELATIONAL_QUERIES["q196_streak_islands"](
            spark, sf_smoke
        ).collect()
    }
    assert got == want
    for ad, ns, mx in got.values():
        assert mx <= ad and ns >= 1 and mx >= 1
        assert ad >= ns  # every streak holds >= 1 day


# --------------------------------------------------------------------------
# q197 largest-remainder apportionment
# --------------------------------------------------------------------------

def test_largest_remainder_exact_total_and_quota(spark, sf_smoke):
    """Seats sum EXACTLY to LR_SEATS (the property naive rounding
    breaks), and every source's allocation satisfies the quota rule:
    floor(n*S/N) <= seats <= ceil(n*S/N)."""
    rows = RELATIONAL_QUERIES["q197_largest_remainder"](
        spark, sf_smoke
    ).collect()
    total = sum(r["n_docs"] for r in rows)
    assert sum(r["seats"] for r in rows) == LR_SEATS
    for r in rows:
        lo = r["n_docs"] * LR_SEATS // total
        hi = -((-r["n_docs"] * LR_SEATS) // total)
        assert lo <= r["seats"] <= hi, r


def test_largest_remainder_python_replay(spark, sf_smoke):
    """Full Hamilton replay: base + one extra seat for the LARGEST
    remainders, ties broken lexically by source."""
    d = load_table(spark, "documents", sf_smoke)
    counts = Counter(
        r["source"] for r in d.select("source").collect()
    )
    total = sum(counts.values())
    base = {s: n * LR_SEATS // total for s, n in counts.items()}
    rem = {s: (n * LR_SEATS) % total for s, n in counts.items()}
    leftover = LR_SEATS - sum(base.values())
    order = sorted(counts, key=lambda s: (-rem[s], s))
    want = {
        s: base[s] + (1 if i < leftover else 0)
        for i, s in enumerate(order)
    }
    got = {
        r["source"]: r["seats"]
        for r in RELATIONAL_QUERIES["q197_largest_remainder"](
            spark, sf_smoke
        ).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# q198 degree assortativity
# --------------------------------------------------------------------------

def test_degree_assortativity_python_replay(spark, sf_smoke):
    """Newman r replayed in arbitrary-precision Python ints over the
    co-purchase edges; r_e6 matches bit-for-bit and lies in
    [-1e6, 1e6]."""
    li = load_table(spark, "lineitem", sf_smoke)
    per_order: dict[int, set] = defaultdict(set)
    for r in li.select("l_orderkey", "l_partkey").collect():
        per_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in per_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                edges.add((a, b))
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    m = 2 * len(edges)
    sxy = sum(2 * deg[a] * deg[b] for a, b in edges)
    sx = sum(deg[a] + deg[b] for a, b in edges)
    sx2 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in edges)
    num = m * sxy - sx * sx
    var = m * sx2 - sx * sx
    exp = math.floor(1_000_000.0 * float(num) / math.sqrt(float(var) * float(var)))
    (row,) = RELATIONAL_QUERIES["q198_degree_assortativity"](
        spark, sf_smoke
    ).collect()
    assert row["m_directed"] == m
    assert row["r_e6"] == exp
    assert -1_000_000 <= row["r_e6"] <= 1_000_000


# --------------------------------------------------------------------------
# pipe systematic resample
# --------------------------------------------------------------------------

def test_systematic_resample_coverage_and_targets(spark, sf_smoke):
    """Every pick lands on exactly ONE document; the replayed stride
    targets select the same docs; per-doc pick counts respect the
    systematic-sampling bound |picks(d) − n·w_d/W| < 1 + 1 (floor/phase
    slack) — the low-discrepancy property that distinguishes this from
    multinomial sampling."""
    docs = sorted(
        (r["doc_id"], r["n_chars"])
        for r in load_table(spark, "documents", sf_smoke)
        .select("doc_id", "n_chars")
        .collect()
    )
    total = sum(w for _, w in docs)
    rows = PIPELINE_QUERIES["pipe_systematic_resample"](
        spark, sf_smoke
    ).collect()
    assert len(rows) == RESAMPLE_N
    assert sorted(r["pick_id"] for r in rows) == list(range(RESAMPLE_N))
    # python replay of the interval walk
    want = {}
    cum, iv = 0, []
    for d, w in docs:
        iv.append((cum, cum + w, d, w))
        cum += w
    for j in range(RESAMPLE_N):
        t = (2 * j + 1) * total // (2 * RESAMPLE_N)
        for lo, hi, d, w in iv:
            if lo <= t < hi:
                want[j] = (d, w)
                break
    got = {r["pick_id"]: (r["doc_id"], r["weight"]) for r in rows}
    assert got == want
    # low-discrepancy: actual picks per doc within 1 of the real-valued
    # expectation (plus 1 more for the floored stride phase)
    picks = Counter(d for d, _ in got.values())
    for d, w in docs:
        expect = RESAMPLE_N * w / total
        assert abs(picks[d] - expect) < 2.0, (d, picks[d], expect)


# --------------------------------------------------------------------------
# pipe loss-mask spans
# --------------------------------------------------------------------------

def test_loss_mask_spans_python_replay(spark, sf_smoke):
    """Role parity is assigned on RAW split positions (pre-filter), and
    the token accounting matches a regex replay; trainable <= total and
    the basis points are exact integer division."""
    d = load_table(spark, "documents", sf_smoke)
    want = {}
    for r in d.select("doc_id", "text").collect():
        segs = re.split(SENT_SPLIT, r["text"])
        n_turns = total = trainable = 0
        for pos, seg in enumerate(segs):
            if not seg.strip():
                continue
            t = len([w for w in re.split(r"\s+", seg.lower().strip()) if w])
            n_turns += 1
            total += t
            if pos % 2 == 1:
                trainable += t
        if n_turns:
            want[r["doc_id"]] = (
                n_turns, total, trainable, trainable * 10000 // total
            )
    got = {
        r["doc_id"]: (
            r["n_turns"], r["total_tokens"], r["trainable_tokens"],
            r["trainable_bp"],
        )
        for r in PIPELINE_QUERIES["pipe_loss_mask_spans"](
            spark, sf_smoke
        ).collect()
    }
    assert got == want
    for n_turns, total, trainable, bp in got.values():
        assert 0 <= trainable <= total
        assert 0 <= bp <= 10000


# --------------------------------------------------------------------------
# dedup sorted-neighborhood
# --------------------------------------------------------------------------

def test_snm_pairs_subset_of_bruteforce(spark, sf_smoke):
    """Soundness: every SNM pair inside the brute-force slice
    (doc_id < PAIR_BOUND) appears in the all-pairs gate with the SAME
    jaccard — the window only limits RECALL, never changes a score."""
    brute = {
        (r["a"], r["b"]): r["jaccard"]
        for r in DEDUP_QUERIES["dedup_ngram_jaccard_pairs"](
            spark, sf_smoke
        ).collect()
    }
    snm = DEDUP_QUERIES["dedup_sorted_neighborhood_pairs"](
        spark, sf_smoke
    ).collect()
    assert snm, "SNM found no pairs at all"
    for r in snm:
        if r["a"] < PAIR_BOUND and r["b"] < PAIR_BOUND:
            assert brute.get((r["a"], r["b"])) == r["jaccard"], r


def test_snm_finds_planted_normalized_duplicates(spark):
    """Completeness on the easy class: exact normalized duplicates sort
    ADJACENT, so a planted dup group of size <= SNM_WINDOW + 1 yields
    all its consecutive pairs at jaccard 1.0 — while the lexically
    distant decoys never pair with them."""
    from data_table_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [
        (1, "the quick brown fox jumps"),
        (2, "THE  quick   Brown fox JUMPS"),   # normalized dup of 1
        (3, "the quick\tbrown fox jumps"),     # normalized dup of 1
        (4, "zebras graze on open plains"),
        (5, "apples and oranges differ wildly"),
        (6, "midway through the winter storm"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in sorted_neighborhood_pairs(docs).collect()
    }
    assert got.get((1, 2)) == 1.0
    assert got.get((1, 3)) == 1.0
    assert got.get((2, 3)) == 1.0
    assert all(a in (1, 2, 3) and b in (1, 2, 3) for a, b in got)
    assert SNM_WINDOW >= 2  # the group of 3 fits one window span


# --------------------------------------------------------------------------
# UDF transport gates
# --------------------------------------------------------------------------

def test_arrow_grouped_map_equals_builtin_agg(spark, sf_smoke):
    """The applyInArrow ledger equals the same aggregation computed by
    built-in JVM expressions — proving the Arrow grouped-map transport,
    not the arithmetic."""
    from data_table_spark.operators.udfs import STATS_COHORTS

    o = load_table(spark, "orders", sf_smoke).select(
        (F.col("o_custkey") % STATS_COHORTS).alias("cohort"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    want = {
        r["cohort"]: (r["n"], r["tot"], r["mx"])
        for r in o.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("tot"),
            F.max("cents").alias("mx"),
        )
        .collect()
    }
    got = {
        r["cohort"]: (r["n_orders"], r["total_cents"], r["max_cents"])
        for r in UDF_QUERIES["udf_arrow_grouped_map"](
            spark, sf_smoke
        ).collect()
    }
    assert got == want


def test_cogrouped_merge_full_outer_semantics(spark, sf_smoke):
    """Keys present on only one side still surface (the full-outer
    contract): every order appears exactly once, orphan lineitems (none
    in TPC-H-ish fixtures, but asserted structurally) would carry null
    o_cents, and the per-order line sums match a Spark join replay."""
    rows = UDF_QUERIES["udf_cogrouped_merge"](spark, sf_smoke).collect()
    by_key = {r["okey"]: r for r in rows}
    assert len(by_key) == len(rows), "duplicate order keys emitted"
    o = load_table(spark, "orders", sf_smoke)
    li = load_table(spark, "lineitem", sf_smoke)
    n_orders = o.count()
    li_sum = {
        r["l_orderkey"]: (r["s"], r["n"])
        for r in li.groupBy("l_orderkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100).cast("long")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert len(rows) >= n_orders
    for okey, r in by_key.items():
        if okey in li_sum:
            assert (r["li_cents"], r["n_lines"]) == li_sum[okey]
        else:
            assert r["li_cents"] is None and r["n_lines"] == 0


def test_iter_series_net_equals_expression(spark, sf_smoke):
    """The iterator-flavor UDF equals the pure-expression floor-cents
    computation row for row."""
    li = load_table(spark, "lineitem", sf_smoke)
    want = {
        (r["l_orderkey"], r["l_linenumber"]): r["c"]
        for r in li.select(
            "l_orderkey", "l_linenumber",
            F.floor(
                F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
            ).cast("long").alias("c"),
        ).collect()
    }
    got = {
        (r["l_orderkey"], r["l_linenumber"]): r["net_cents"]
        for r in UDF_QUERIES["udf_iter_series_net"](
            spark, sf_smoke
        ).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# media mean-crossing rate
# --------------------------------------------------------------------------

def test_wav_crossings_python_replay(spark, sf_smoke):
    """The real encode→decode→count chain replayed from the ASCII text
    in pure Python: samples are (byte−128)·256 over the cycled UTF-8
    bytes, crossings counted on the n·s − S product."""
    d = load_table(spark, "documents", sf_smoke).select("doc_id", "text")
    want = {}
    for r in d.collect():
        data = r["text"].encode("utf-8")
        cyc = (data * (1 + 64 // len(data)))[:64]
        s = [(b - 128) * 256 for b in cyc]
        tot = sum(s)
        c = [64 * v - tot for v in s]
        want[r["doc_id"]] = (
            sum(1 for a, b in zip(c, c[1:]) if a * b < 0),
            min(s),
            max(s),
        )
    got = {
        r["doc_id"]: (r["mcr"], r["s_min"], r["s_max"])
        for r in MULTIMODAL_QUERIES["media_wav_crossings"](
            spark, sf_smoke
        ).collect()
    }
    assert got == want
    for mcr, lo, hi in got.values():
        assert 0 <= mcr <= 63 and lo <= hi


# --------------------------------------------------------------------------
# eval metrics (wave 2)
# --------------------------------------------------------------------------

def _tok_counts(text):
    return Counter(w for w in re.split(r"\s+", text.lower().strip()) if w)


def _eval_pairs(spark, sf_smoke):
    from data_table_spark.operators.evalmetrics import EVAL_STRIDE

    d = load_table(spark, "documents", sf_smoke)
    texts = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    return {
        a: (texts[a], texts[a + 1])
        for a in texts
        if a % EVAL_STRIDE == 0 and a + 1 in texts
    }


def test_token_f1_python_replay(spark, sf_smoke):
    """SQuAD token F1 replayed with Counters: clipped multiset overlap,
    exact e6 integer divisions; 0 <= P, R, F1 <= 1e6 and F1 lies
    between min(P,R) and max(P,R)."""
    from data_table_spark.operators.evalmetrics import EVAL_QUERIES

    got = {
        r["a"]: (r["overlap"], r["len_ref"], r["len_hyp"],
                 r["prec_e6"], r["rec_e6"], r["f1_e6"])
        for r in EVAL_QUERIES["eval_token_f1_pairs"](
            spark, sf_smoke
        ).collect()
    }
    want = {}
    for a, (ta, tb) in _eval_pairs(spark, sf_smoke).items():
        cr, ch = _tok_counts(ta), _tok_counts(tb)
        if not cr or not ch:
            continue
        ov = sum((cr & ch).values())
        la, lb = sum(cr.values()), sum(ch.values())
        want[a] = (
            ov, la, lb,
            1_000_000 * ov // lb, 1_000_000 * ov // la,
            2_000_000 * ov // (la + lb),
        )
    assert got == want
    for ov, la, lb, p, r_, f in got.values():
        assert 0 <= f <= 1_000_000
        assert min(p, r_) - 1 <= f <= max(p, r_) + 1  # harmonic between


def test_bleu2_python_replay(spark, sf_smoke):
    """BLEU-2 replayed in Python: clipped 1/2-gram matches, score =
    floor(1e6*sqrt(p1*p2)); hypothesis shorter than 2 tokens excluded."""
    from data_table_spark.operators.evalmetrics import EVAL_QUERIES

    got = {
        r["a"]: (r["m1"], r["m2"], r["len_hyp"], r["bleu2_e6"])
        for r in EVAL_QUERIES["eval_bleu2_pairs"](spark, sf_smoke).collect()
    }
    want = {}
    for a, (ta, tb) in _eval_pairs(spark, sf_smoke).items():
        tr = [w for w in re.split(r"\s+", ta.lower().strip()) if w]
        th = [w for w in re.split(r"\s+", tb.lower().strip()) if w]
        if len(th) < 2:
            continue
        m1 = sum(
            (Counter(th) & Counter(tr)).values()
        )
        bg = lambda t: Counter(  # noqa: E731
            f"{x} {y}" for x, y in zip(t, t[1:])
        )
        m2 = sum((bg(th) & bg(tr)).values())
        sc = math.floor(
            1_000_000.0
            * math.sqrt(float(m1 * m2) / float(len(th) * (len(th) - 1)))
        )
        want[a] = (m1, m2, len(th), sc)
    assert got == want


def test_rouge_l_python_golden(spark, sf_smoke):
    """FULL golden for the rows-only ROUGE-L gate: the numpy rolling-row
    LCS must equal a classic O(n·m) Python DP on the capped token
    streams, and the F-measure is the exact integer division."""
    from data_table_spark.operators.evalmetrics import (
        EVAL_QUERIES,
        ROUGE_CAP,
    )

    got = {
        r["a"]: (r["lcs_len"], r["len_ref"], r["len_hyp"],
                 r["rouge_l_f_e6"])
        for r in EVAL_QUERIES["eval_rouge_l_pairs"](
            spark, sf_smoke
        ).collect()
    }
    want = {}
    for a, (ta, tb) in _eval_pairs(spark, sf_smoke).items():
        xr = [w for w in re.split(r"\s+", ta.lower().strip()) if w][:ROUGE_CAP]
        xh = [w for w in re.split(r"\s+", tb.lower().strip()) if w][:ROUGE_CAP]
        la, lb = len(xr), len(xh)
        dp = [[0] * (lb + 1) for _ in range(la + 1)]
        for i in range(la):
            for j in range(lb):
                dp[i + 1][j + 1] = (
                    dp[i][j] + 1
                    if xr[i] == xh[j]
                    else max(dp[i][j + 1], dp[i + 1][j])
                )
        lcs = dp[la][lb]
        want[a] = (
            lcs, la, lb,
            (2_000_000 * lcs) // (la + lb) if la + lb else 0,
        )
    assert got == want
    for lcs, la, lb, f in got.values():
        assert lcs <= min(la, lb)
        assert 0 <= f <= 1_000_000


def test_cohens_kappa_python_replay(spark, sf_smoke):
    """Kappa replayed from the raw rater rules; kappa_e6 in
    [-1e6, 1e6] and the exact rational matches."""
    d = load_table(spark, "documents", sf_smoke)
    cells = Counter()
    for r in d.select("n_chars", "text").collect():
        ra = 0 if r["n_chars"] < 200 else (1 if r["n_chars"] < 400 else 2)
        nt = len([w for w in re.split(r"\s+", r["text"].lower().strip()) if w])
        rb = 0 if nt < 40 else (1 if nt < 80 else 2)
        cells[(ra, rb)] += 1
    n = sum(cells.values())
    diag = sum(v for (a, b), v in cells.items() if a == b)
    rows_ = Counter()
    cols_ = Counter()
    for (a, b), v in cells.items():
        rows_[a] += v
        cols_[b] += v
    pe = sum(rows_[k] * cols_[k] for k in set(rows_) | set(cols_))
    exp = math.floor(1_000_000.0 * float(n * diag - pe) / float(n * n - pe))
    (row,) = RELATIONAL_QUERIES["q199_cohens_kappa"](
        spark, sf_smoke
    ).collect()
    assert (row["n_docs"], row["diag"], row["pe_num"]) == (n, diag, pe)
    assert row["kappa_e6"] == exp
    assert -1_000_000 <= row["kappa_e6"] <= 1_000_000


def test_pass_at_k_python_replay(spark, sf_smoke):
    """The unbiased estimator replayed with exact Fractions (then the
    same ordered double fold): per-problem p_e6 and corpus means match;
    pass@k is monotone nondecreasing in k."""
    from data_table_spark.operators.evalmetrics import (
        EVAL_QUERIES,
        PASS_AT_KS,
    )

    e = load_table(spark, "events", sf_smoke)
    per = Counter()
    passes = Counter()
    for r in e.select("user_id", "event_type").collect():
        per[r["user_id"]] += 1
        if r["event_type"] == "purchase":
            passes[r["user_id"]] += 1
    want = {}
    for k in PASS_AT_KS:
        scores = []
        for uid, n in per.items():
            if n < k:
                continue
            c = passes[uid]
            if n - c < k:
                scores.append(1_000_000)
            else:
                prod = 1.0
                for i in range(k):
                    prod *= float(n - c - i) / float(n - i)
                scores.append(math.floor(1_000_000.0 * (1.0 - prod)))
        want[k] = (len(scores), sum(scores) // len(scores))
    got = {
        r["k"]: (r["n_problems"], r["mean_pass_e6"])
        for r in EVAL_QUERIES["eval_pass_at_k"](spark, sf_smoke).collect()
    }
    assert got == want
    ks = sorted(got)
    means = [got[k][1] for k in ks]
    assert means == sorted(means), "pass@k must be monotone in k"


def test_ece_bins_python_replay(spark, sf_smoke):
    """The calibration table replayed from raw text/lang in Python:
    exact conf buckets, positives, confidence mass, and gaps; bin
    confidence mass must sit inside the bin's e4 range."""
    from data_table_spark.operators.evalmetrics import EVAL_QUERIES

    d = load_table(spark, "documents", sf_smoke)
    stop = re.compile(r"\b(the|a|of|and|to|in|is|it)\b")
    bins: dict[int, list] = defaultdict(lambda: [0, 0, 0])
    for r in d.select("text", "lang").collect():
        toks = [w for w in re.split(r"\s+", r["text"].lower().strip()) if w]
        if not toks:
            continue
        ns = len(stop.findall(r["text"].lower()))
        conf = min(10000, 30000 * ns // len(toks))
        b = min(conf // 1000, 9)
        cell = bins[b]
        cell[0] += 1
        cell[1] += 1 if r["lang"] == "en" else 0
        cell[2] += conf
    want = {
        b: (n, pos, sc, (1_000_000 * abs(10_000 * pos - sc)) // (10_000 * n))
        for b, (n, pos, sc) in bins.items()
    }
    got = {
        r["bin"]: (r["n_docs"], r["n_pos"], r["sum_conf_e4"], r["gap_e6"])
        for r in EVAL_QUERIES["eval_ece_bins"](spark, sf_smoke).collect()
    }
    assert got == want
    for b, (n, pos, sc, gap) in got.items():
        assert 0 <= pos <= n
        assert 0 <= gap <= 1_000_000
        if b < 9:
            assert b * 1000 * n <= sc < (b + 1) * 1000 * n


def test_parameterized_sql(spark, sf_smoke):
    """spark.sql named/positional parameter binding (the injection-safe
    SQL surface): parameterized and literal forms agree."""
    load_table(spark, "orders", sf_smoke).createOrReplaceTempView(
        "orders_param"
    )
    named = spark.sql(
        "SELECT COUNT(*) AS n FROM orders_param "
        "WHERE o_totalprice > :lo AND o_orderstatus = :st",
        args={"lo": 1000.0, "st": "O"},
    ).collect()[0]["n"]
    positional = spark.sql(
        "SELECT COUNT(*) AS n FROM orders_param "
        "WHERE o_totalprice > ? AND o_orderstatus = ?",
        args=[1000.0, "O"],
    ).collect()[0]["n"]
    literal = spark.sql(
        "SELECT COUNT(*) AS n FROM orders_param "
        "WHERE o_totalprice > 1000.0 AND o_orderstatus = 'O'"
    ).collect()[0]["n"]
    assert named == positional == literal > 0


def test_business_days_matches_numpy_busday(spark, sf_smoke):
    """The closed-form g(d2)−g(d1) equals numpy's busday_count (the
    independent calendar authority) for every (order, ship) pair —
    weekends excluded exactly, sign preserved when shipping precedes
    ordering."""
    import numpy as np

    li = load_table(spark, "lineitem", sf_smoke).select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, "orders", sf_smoke).select(
        "o_orderkey", "o_orderdate"
    )
    pairs = [
        (r["o_orderdate"], r["l_shipdate"])
        for r in li.join(
            o, li["l_orderkey"] == o["o_orderkey"]
        ).collect()
    ]
    one = np.timedelta64(1, "D")
    want = Counter()
    for d1, d2 in pairs:
        a = np.datetime64(str(d1)[:10])
        b = np.datetime64(str(d2)[:10])
        # g-diff counts the SIGNED business days in the half-open
        # interval (d1, d2]; numpy's reversed-argument convention
        # differs by one, so negate an explicit forward count instead
        if b >= a:
            n = int(np.busday_count(a + one, b + one))
        else:
            n = -int(np.busday_count(b + one, a + one))
        want[n] += 1
    got = {
        r["bdays"]: r["n_lines"]
        for r in RELATIONAL_QUERIES["q201_business_days"](
            spark, sf_smoke
        ).collect()
    }
    assert got == dict(want)


def test_retrieval_ranking_planted_ranks(spark, sf_smoke):
    """The relevant twin must land at EXACTLY rank 1 + (q mod 3) —
    i.e. the decoys out-tie it and nothing natural intrudes — and the
    metric columns follow: rr = 1e6 div rank, ndcg from the
    precomputed literal table; corpus-level MRR falls out as the mean."""
    from data_table_spark.operators.evalmetrics import (
        EVAL_QUERIES,
        NDCG10_E6,
        RETR_N_QUERIES,
    )

    rows = EVAL_QUERIES["eval_retrieval_ranking"](
        spark, sf_smoke
    ).collect()
    n_vec = load_table(spark, "embeddings", sf_smoke).where(
        F.col("vec_id") < RETR_N_QUERIES
    ).count()
    assert len(rows) == n_vec > 0
    for r in rows:
        want_rank = 1 + r["q_id"] % 3
        assert r["rank"] == want_rank, r
        assert r["rr_e6"] == 1_000_000 // want_rank
        assert r["ndcg10_e6"] == NDCG10_E6[want_rank]
    mrr = sum(r["rr_e6"] for r in rows) / len(rows)
    assert 500_000 < mrr <= 1_000_000  # ranks 1..3 ⇒ MRR in (1/2, 1]


def test_chrf_python_replay(spark, sf_smoke):
    """chrF replayed with char-trigram Counters; the closed form
    5o/(4r+h) equals F_2 of P=o/h, R=o/r, and scores sit in [0, 1e6]."""
    from data_table_spark.operators.evalmetrics import EVAL_QUERIES

    got = {
        r["a"]: (r["overlap"], r["r_grams"], r["h_grams"], r["chrf2_e6"])
        for r in EVAL_QUERIES["eval_chrf_pairs"](spark, sf_smoke).collect()
    }
    want = {}
    for a, (ta, tb) in _eval_pairs(spark, sf_smoke).items():
        sa = re.sub(r"\s+", "", ta.lower())
        sb = re.sub(r"\s+", "", tb.lower())
        if len(sa) < 3 or len(sb) < 3:
            continue
        ca = Counter(sa[i : i + 3] for i in range(len(sa) - 2))
        cb = Counter(sb[i : i + 3] for i in range(len(sb) - 2))
        o = sum((ca & cb).values())
        r_, h = sum(ca.values()), sum(cb.values())
        want[a] = (o, r_, h, (5_000_000 * o) // (4 * r_ + h))
    assert got == want
    for o, r_, h, f in got.values():
        assert 0 <= f <= 1_000_000
        assert o <= min(r_, h)


def test_mase_python_replay(spark, sf_smoke):
    """MASE replayed from the raw daily series in exact ints + one
    float op; the lag-7 error sum skips the first 7 days exactly."""
    o = load_table(spark, "orders", sf_smoke)
    daily: dict = defaultdict(int)
    for r in o.select(
        F.to_date("o_orderdate").alias("day"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
    ).collect():
        daily[r["day"]] += r["c"]
    days = sorted(daily)
    xs = [daily[d] for d in days]
    n = len(xs)
    s7 = sum(abs(xs[i] - xs[i - 7]) for i in range(7, n))
    s1 = sum(abs(xs[i] - xs[i - 1]) for i in range(1, n))
    exp = math.floor(
        1_000_000.0 * float(s7 * (n - 1)) / float(s1 * (n - 7))
    )
    (row,) = RELATIONAL_QUERIES["q204_mase_forecast_error"](
        spark, sf_smoke
    ).collect()
    assert (row["n_days"], row["sum_err7"], row["sum_err1"]) == (n, s7, s1)
    assert row["mase_e6"] == exp


def test_gini_split_python_replay(spark, sf_smoke):
    """Weighted Gini replayed with exact Fractions; each side's
    impurity sits in [0, 1 − 1/k], and the emitted closed form equals
    the textbook (nL/n)·giniL + (nR/n)·giniR."""
    from fractions import Fraction

    from data_table_spark.operators.relational import GINI_THRESHOLDS

    o = load_table(spark, "orders", sf_smoke)
    rows = [
        (r["c"], r["cls"])
        for r in o.select(
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
            F.col("o_orderstatus").alias("cls"),
        ).collect()
    ]
    want = {}
    for thr in GINI_THRESHOLDS:
        left = Counter(cls for c, cls in rows if c <= thr)
        right = Counter(cls for c, cls in rows if c > thr)
        nl, nr = sum(left.values()), sum(right.values())

        def gini(cnt, n):
            return 1 - sum(Fraction(v, n) ** 2 for v in cnt.values())

        w = Fraction(nl, nl + nr) * gini(left, nl) + Fraction(
            nr, nl + nr
        ) * gini(right, nr)
        want[thr] = (nl, nr, math.floor(1_000_000.0 * float(w)))
    got = {
        r["thr"]: (r["n_left"], r["n_right"], r["weighted_gini_e6"])
        for r in RELATIONAL_QUERIES["q205_gini_split_scores"](
            spark, sf_smoke
        ).collect()
    }
    assert got == want
    for nl, nr, g in got.values():
        assert 0 <= g <= 1_000_000


def test_average_precision_python_replay(spark, sf_smoke):
    """AP replayed by explicitly sorting (conf desc, doc_id) in Python
    and summing floored P@rank terms at the positives; ap_e6 in
    [0, 1e6] and equals the replay exactly."""
    from data_table_spark.operators.evalmetrics import EVAL_QUERIES

    d = load_table(spark, "documents", sf_smoke)
    stop = re.compile(r"\b(the|a|of|and|to|in|is|it)\b")
    rows = []
    for r in d.select("doc_id", "text", "lang").collect():
        toks = [w for w in re.split(r"\s+", r["text"].lower().strip()) if w]
        if not toks:
            continue
        ns = len(stop.findall(r["text"].lower()))
        conf = min(10000, 30000 * ns // len(toks))
        rows.append((conf, r["doc_id"], 1 if r["lang"] == "en" else 0))
    rows.sort(key=lambda t: (-t[0], t[1]))
    cum = 0
    terms = []
    for rank, (_, _, y) in enumerate(rows, start=1):
        cum += y
        if y:
            terms.append(1_000_000 * cum // rank)
    n_pos = sum(y for _, _, y in rows)
    want = (len(rows), n_pos, sum(terms) // n_pos)
    (row,) = EVAL_QUERIES["eval_average_precision"](
        spark, sf_smoke
    ).collect()
    assert (row["n_docs"], row["n_pos"], row["ap_e6"]) == want
    assert 0 <= row["ap_e6"] <= 1_000_000
