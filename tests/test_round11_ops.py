"""Invariant tests for the round-11 operators — each pins an algebraic
property or a pure-Python recompute the DuckDB hash oracle cannot state
(the oracle proves value equality; these prove the SEMANTICS are the
intended ones)."""

from __future__ import annotations

import hashlib
import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_table_spark.operators.dedup import (  # noqa: E402
    OPH_K,
    oph_minhash_slots,
)
from data_table_spark.operators.pipeline import (  # noqa: E402
    GOPHER_ALPHA_DEN,
    GOPHER_ALPHA_NUM,
    GOPHER_MAX_WORDS,
    GOPHER_MEAN_LEN_MAX,
    GOPHER_MEAN_LEN_MIN,
    GOPHER_MIN_STOP_HITS,
    GOPHER_MIN_WORDS,
    GOPHER_STOPWORDS,
    KFOLD_K,
    KFOLD_SEED,
    gopher_rules,
    kfold_assign,
)
from data_table_spark.operators.relational import (  # noqa: E402
    RELATIONAL_QUERIES,
)
from data_table_spark.operators.textstats import (  # noqa: E402
    dup_ngram_stats,
)
from data_table_spark.sources.registry import load_table  # noqa: E402


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _toks(text: str) -> list[str]:
    return [w for w in text.lower().strip().split() if w]


# --------------------------------------------------------------------------
# Gopher rules
# --------------------------------------------------------------------------

def test_gopher_rules_matches_python_replay(spark, sf_smoke):
    """Per-source pass/fail table equals an independent per-doc Python
    recompute of all four rules — pins tokenization, the exact
    cross-multiplied thresholds, and the per-rule counting."""
    docs = load_table(spark, "documents", sf_smoke).select("source", "text")
    exp: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in docs.collect():
        t = _toks(r["text"])
        n = len(t)
        sumlen = sum(len(w) for w in t)
        n_alpha = sum(1 for w in t if any("a" <= c <= "z" for c in w))
        n_stop = sum(1 for w in t if w in GOPHER_STOPWORDS)
        f_wc = n < GOPHER_MIN_WORDS or n > GOPHER_MAX_WORDS
        f_mwl = (
            sumlen < GOPHER_MEAN_LEN_MIN * n
            or sumlen > GOPHER_MEAN_LEN_MAX * n
        )
        f_alpha = GOPHER_ALPHA_DEN * n_alpha < GOPHER_ALPHA_NUM * n
        f_stop = n_stop < GOPHER_MIN_STOP_HITS
        e = exp[r["source"]]
        e[0] += 1
        e[1] += not (f_wc or f_mwl or f_alpha or f_stop)
        e[2] += f_wc
        e[3] += f_mwl
        e[4] += f_alpha
        e[5] += f_stop
    got = {
        r["source"]: [
            r["n_docs"], r["n_pass"], r["fail_word_count"],
            r["fail_mean_word_len"], r["fail_alpha_ratio"],
            r["fail_stopwords"],
        ]
        for r in gopher_rules(docs).collect()
    }
    assert got == {k: list(v) for k, v in exp.items()}
    # the fixture must exercise BOTH outcomes or the gate is vacuous
    assert any(v[1] > 0 for v in exp.values()), "no doc passes"
    assert any(v[0] > v[1] for v in exp.values()), "no doc fails"


# --------------------------------------------------------------------------
# k-fold assignment
# --------------------------------------------------------------------------

def test_kfold_partitions_and_loo_sums(spark, sf_smoke):
    """Folds equal the md5 replay, fold sizes partition the corpus, and
    every leave-one-out pair satisfies fold + train == total."""
    docs = load_table(spark, "documents", sf_smoke).select("doc_id", "text")
    exp_docs: Counter = Counter()
    exp_toks: Counter = Counter()
    for r in docs.collect():
        fold = _h32(f"{KFOLD_SEED}:{r['doc_id']}") % KFOLD_K
        exp_docs[fold] += 1
        exp_toks[fold] += len(_toks(r["text"]))
    rows = kfold_assign(docs).collect()
    assert len(rows) == KFOLD_K
    tot_d, tot_t = sum(exp_docs.values()), sum(exp_toks.values())
    for r in rows:
        assert exp_docs[r["fold"]] == r["n_docs"]
        assert exp_toks[r["fold"]] == r["n_tokens"]
        assert r["n_docs"] + r["train_docs"] == tot_d
        assert r["n_tokens"] + r["train_tokens"] == tot_t


# --------------------------------------------------------------------------
# duplicate 5-gram fraction
# --------------------------------------------------------------------------

def test_dup_ngrams_matches_python_replay(spark, sf_smoke):
    """Per-source instance/dup counts equal a Python recompute of the
    word-5-gram windows; cross-source boilerplate is charged to every
    source carrying it; the fixture must actually contain duplicate
    5-grams (the degeneracy check that killed the sentence form)."""
    from data_table_spark.operators.textstats import DUP_NGRAM_N

    docs = load_table(spark, "documents", sf_smoke).select(
        "doc_id", "source", "text"
    )
    gram_docs: dict[str, set[int]] = defaultdict(set)
    inst: list[tuple[str, str]] = []
    for r in docs.collect():
        t = _toks(r["text"])
        for i in range(len(t) - DUP_NGRAM_N + 1):
            g = " ".join(t[i:i + DUP_NGRAM_N])
            gram_docs[g].add(r["doc_id"])
            inst.append((r["source"], g))
    exp: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for src, g in inst:
        exp[src][0] += 1
        exp[src][1] += len(gram_docs[g]) > 1
    got = {
        r["source"]: [r["n_ngrams"], r["n_dup_instances"], r["dup_rate_e6"]]
        for r in dup_ngram_stats(docs).collect()
    }
    assert set(got) == set(exp)
    for src, (n, d) in exp.items():
        assert got[src] == [n, d, (1_000_000 * d) // n]
    assert any(d > 0 for _, d in exp.values()), "fixture has no dup 5-grams"


# --------------------------------------------------------------------------
# OPH minhash
# --------------------------------------------------------------------------

def _py_oph(text: str) -> list[int] | None:
    t = _toks(text)
    if len(t) < 2:
        return None
    sh = {f"{a} {b}" for a, b in zip(t, t[1:])}
    hs = [
        int(hashlib.md5(f"oph␟{s}".encode()).hexdigest()[:12], 16)
        for s in sh
    ]
    bins: dict[int, int] = {}
    for h in hs:
        p = h % OPH_K
        bins[p] = min(bins.get(p, h), h)
    out = []
    for i in range(OPH_K):
        for j in range(OPH_K):
            p = (i + j) % OPH_K
            if p in bins:
                out.append(bins[p])
                break
    return out


def test_oph_slots_match_python_replay(spark, sf_smoke):
    """Densified slot vectors equal the rotation replay on the full
    smoke corpus — pins the hash, binning, and clockwise borrowing."""
    docs = load_table(spark, "documents", sf_smoke).select("doc_id", "text")
    got: dict[int, dict[int, int]] = defaultdict(dict)
    for r in oph_minhash_slots(docs).collect():
        got[r["doc_id"]][r["i"]] = r["slot"]
    for r in docs.collect():
        exp = _py_oph(r["text"])
        if exp is None:
            assert r["doc_id"] not in got
            continue
        g = got[r["doc_id"]]
        assert [g[i] for i in range(OPH_K)] == exp, r["doc_id"]


def test_oph_identical_docs_agree_everywhere(spark):
    """J = 1 pairs estimate exactly 1: identical texts share every slot
    (the estimator's calibration anchor), and any doc with >= 1 shingle
    gets ALL slots filled (densification leaves no holes)."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "one two"),  # single shingle: densification fans it out
        ],
        ["doc_id", "text"],
    )
    slots = oph_minhash_slots(docs).collect()
    per = defaultdict(dict)
    for r in slots:
        per[r["doc_id"]][r["i"]] = r["slot"]
    assert per[1] == per[2]
    assert len(per[3]) == OPH_K
    assert len(set(per[3].values())) == 1  # one shingle fills every slot


# --------------------------------------------------------------------------
# OHLC bars
# --------------------------------------------------------------------------

def test_ohlc_matches_python_replay(spark, sf_smoke):
    """Bars equal a per-(type, day) Python fold ordered by (ts,
    event_id) — pins the argmin/argmax key construction and cents."""
    ev = load_table(spark, "events", sf_smoke).select(
        "event_id", "ts", "event_type", "value"
    )
    bars: dict[tuple, list] = {}
    for r in sorted(
        ev.collect(), key=lambda r: (r["ts"], r["event_id"])
    ):
        k = (r["event_type"], r["ts"].date())
        v = round(r["value"] * 100)
        if k not in bars:
            bars[k] = [v, v, v, v, 0]  # open, high, low, close, n
        b = bars[k]
        b[1] = max(b[1], v)
        b[2] = min(b[2], v)
        b[3] = v
        b[4] += 1
    got = {
        (r["event_type"], r["day"]): [
            r["open_c"], r["high_c"], r["low_c"], r["close_c"], r["n_events"]
        ]
        for r in RELATIONAL_QUERIES["q186_ohlc_bars"](
            spark, sf_smoke
        ).collect()
    }
    assert got == {k: list(v) for k, v in bars.items()}


# --------------------------------------------------------------------------
# Kendall tau
# --------------------------------------------------------------------------

def test_kendall_tau_matches_python_replay(spark, sf_smoke):
    """Pair counts and tau_b equal the O(D²) Python recompute."""
    ev = load_table(spark, "events", sf_smoke).select("ts", "value")
    daily: dict = defaultdict(lambda: [0, 0])
    for r in ev.collect():
        d = daily[r["ts"].date()]
        d[0] += 1
        d[1] += round(r["value"] * 100)
    days = sorted(daily)
    nc = nd = n1 = n2 = 0
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            cx = (daily[days[j]][0] > daily[days[i]][0]) - (
                daily[days[j]][0] < daily[days[i]][0]
            )
            cy = (daily[days[j]][1] > daily[days[i]][1]) - (
                daily[days[j]][1] < daily[days[i]][1]
            )
            nc += cx * cy > 0
            nd += cx * cy < 0
            n1 += cx == 0
            n2 += cy == 0
    n0 = len(days) * (len(days) - 1) // 2
    r = RELATIONAL_QUERIES["q188_kendall_tau"](spark, sf_smoke).collect()[0]
    assert (
        r["n_pairs"], r["concordant"], r["discordant"],
        r["ties_x"], r["ties_y"],
    ) == (n0, nc, nd, n1, n2)
    tau = (nc - nd) / math.sqrt((n0 - n1) * (n0 - n2))
    assert r["tau_b_e6"] == math.floor(1_000_000 * tau)


# --------------------------------------------------------------------------
# Cramér's V
# --------------------------------------------------------------------------

def test_cramers_v_bounds_and_chi2_consistency(spark, sf_smoke):
    """V ∈ [0, 1] and reproduces from the returned χ² and marginal
    dimensions by the published formula (one double sqrt)."""
    r = RELATIONAL_QUERIES["q187_cramers_v"](spark, sf_smoke).collect()[0]
    assert 0 <= r["cramers_v_e6"] <= 1_000_000
    v = math.sqrt(
        (r["chi2_e6"] / 1e6)
        / (r["n"] * min(r["n_rows_cat"] - 1, r["n_cols_cat"] - 1))
    )
    assert r["cramers_v_e6"] == math.floor(1_000_000 * v)


# --------------------------------------------------------------------------
# TPC-H completion shapes — the share/threshold algebra the hash
# oracle proves by value; these pin the CROSS-ENGINE-INDEPENDENT facts
# --------------------------------------------------------------------------

def test_q180_threshold_is_exact_partition(spark, sf_smoke):
    """Returned parts are EXACTLY those whose value crosses the global
    0.1% line — recomputed from an independent full per-part scan."""
    li = load_table(spark, "lineitem", sf_smoke)
    per = {}
    for r in li.collect():
        u = round(r["l_extendedprice"] * 100) * (
            100 - round(r["l_discount"] * 100)
        )
        per[r["l_partkey"]] = per.get(r["l_partkey"], 0) + u
    total = sum(per.values())
    exp = {k: v for k, v in per.items() if v * 1000 > total}
    got = {
        r["p_partkey"]: r["value_u"]
        for r in RELATIONAL_QUERIES["q180_tpch_q11_important"](
            spark, sf_smoke
        ).collect()
    }
    assert got == exp


def test_q182_ties_all_included(spark):
    """Equal-revenue suppliers BOTH surface (exact-integer argmax —
    planted tie via a 2-supplier, 2-line fixture)."""
    import pandas as pd

    spark_dir = None  # the gate reads parquet: build a tmp sf dir
    import tempfile

    spark_dir = tempfile.mkdtemp(prefix="q182_tie_")
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 2],
            "l_partkey": [1, 1],
            "l_suppkey": [7, 8],
            "l_linenumber": [1, 1],
            "l_quantity": [1.0, 1.0],
            "l_extendedprice": [50.0, 50.0],
            "l_discount": [0.0, 0.0],
            "l_tax": [0.0, 0.0],
            "l_returnflag": ["N", "N"],
            "l_linestatus": ["O", "O"],
            "l_shipdate": pd.to_datetime(["1998-02-01", "1998-02-02"]),
        }
    )
    s = pd.DataFrame(
        {
            "s_suppkey": [7, 8],
            "s_name": ["Supplier#7", "Supplier#8"],
            "s_nationkey": [0, 1],
            "s_acctbal": [0.0, 0.0],
        }
    )
    spark.createDataFrame(li).write.mode("overwrite").parquet(
        os.path.join(spark_dir, "lineitem.parquet")
    )
    spark.createDataFrame(s).write.mode("overwrite").parquet(
        os.path.join(spark_dir, "supplier.parquet")
    )
    rows = RELATIONAL_QUERIES["q182_tpch_q15_top_supplier"](
        spark, spark_dir
    ).collect()
    assert {(r["s_suppkey"], r["total_rev_u"]) for r in rows} == {
        (7, 500000), (8, 500000)
    }


# --------------------------------------------------------------------------
# tri-clause MERGE
# --------------------------------------------------------------------------

def test_merge_full_three_arms(spark):
    """All three MERGE arms on a planted fixture: matched rows take
    source values, source-only rows insert, base-only rows DELETE."""
    from data_table_spark.operators.relational import merge_full

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "status", "price"],
    )
    src = spark.createDataFrame(
        [(2, "U", 99.0), (4, "I", 40.0)], ["k", "status", "price"]
    )
    got = {
        (r["k"], r["status"], r["price"])
        for r in merge_full(base, src, ["k"]).collect()
    }
    assert got == {(2, "U", 99.0), (4, "I", 40.0)}  # 1 and 3 deleted


# --------------------------------------------------------------------------
# subtree rollup
# --------------------------------------------------------------------------

def test_subtree_rollup_matches_python_walk(spark, sf_smoke):
    """Counts and price mass equal an imperative parent-chain walk."""
    p = load_table(spark, "part", sf_smoke).select(
        "p_partkey", "p_retailprice"
    )
    size: dict[int, int] = defaultdict(int)
    mass: dict[int, int] = defaultdict(int)
    n_parts = 0
    for r in p.collect():
        n = r["p_partkey"]
        c = round(r["p_retailprice"] * 100)
        n_parts += 1
        if n == 0:  # node 0 is its own 1-element chain (never reaches 1)
            size[0] += 1
            mass[0] += c
            continue
        a = n
        while a >= 1:
            if a <= 63:
                size[a] += 1
                mass[a] += c
            if a == 1:
                break
            a //= 2
    got = {
        r["node"]: (r["subtree_size"], r["subtree_price_c"])
        for r in RELATIONAL_QUERIES["q190_subtree_rollup"](
            spark, sf_smoke
        ).collect()
    }
    assert got == {k: (size[k], mass[k]) for k in size}
    # the root's subtree is every part except the orphan node 0
    assert got[1][0] == n_parts - 1
    assert got[0] == (1, mass[0])


# --------------------------------------------------------------------------
# DP sum release
# --------------------------------------------------------------------------

def test_dp_sum_noise_exact_and_bounded(spark, sf_smoke):
    """Released = clipped true sum + round(Laplace_b=C/eps(md5 uniform));
    noise magnitude bounded by b·ln(2^32) so a release can't be wildly
    off; clipping actually binds on this fixture (some doc > C)."""
    from data_table_spark.operators.pipeline import (
        DP_SUM_CLIP,
        DP_SUM_SEED,
        dp_sums,
    )

    docs = load_table(spark, "documents", sf_smoke)
    true: Counter = Counter()
    clipped_binds = False
    for r in docs.select("source", "text").collect():
        n = len(_toks(r["text"]))
        clipped_binds |= n > DP_SUM_CLIP
        true[r["source"]] += min(n, DP_SUM_CLIP)
    assert clipped_binds, "fixture never exceeds the clip: rule vacuous"
    for r in dp_sums(docs).collect():
        u = (_h32(f"{DP_SUM_SEED}:{r['source']}") + 0.5) / 4294967296.0
        lap = -float(DP_SUM_CLIP) * math.copysign(1.0, u - 0.5) * math.log(
            1.0 - 2.0 * abs(u - 0.5)
        )
        assert r["released_token_sum"] == true[r["source"]] + math.floor(
            lap + 0.5
        )
        assert abs(r["released_token_sum"] - true[r["source"]]) <= (
            DP_SUM_CLIP * math.log(2**32) + 1
        )
        # cross-engine portability rests on FLOOR(lap + 0.5) agreeing
        # between Spark's F.log and DuckDB's LN (both libm, neither
        # correctly rounded): assert every per-group noise value sits
        # FAR from a floor boundary, so a last-ulp ln difference cannot
        # flip the released integer (round-11 ADVICE item — the same
        # treatment the sqrt-based gates carry)
        frac = (lap + 0.5) % 1.0
        assert min(frac, 1.0 - frac) > 1e-6, (
            f"noise for {r['source']!r} within 1e-6 of a floor boundary: "
            f"{lap + 0.5!r} — reseed DP_SUM_SEED"
        )


# --------------------------------------------------------------------------
# packing efficiency
# --------------------------------------------------------------------------

def test_pack_efficiency_consistency(spark, sf_smoke):
    """Per-source totals reconcile with the pack_sequences gate output
    joined to sources, and fill_e6 is the exact floored ratio."""
    from data_table_spark.operators.pipeline import (
        PACK_BUDGET,
        chunk_documents,
        pack_efficiency,
        pack_sequences,
    )

    docs = load_table(spark, "documents", sf_smoke)
    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    packs: dict[tuple, int] = defaultdict(int)
    for r in pack_sequences(chunk_documents(docs)).collect():
        packs[(src[r["doc_id"]], r["doc_id"], r["pack_id"])] += r["n_chunk_tokens"]
    exp: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for (s, _, _), toks in packs.items():
        exp[s][0] += 1
        exp[s][1] += toks
    for r in pack_efficiency(docs).collect():
        n, t = exp[r["source"]]
        assert (r["n_packs"], r["total_tokens"]) == (n, t)
        assert r["capacity"] == n * PACK_BUDGET
        assert r["fill_e6"] == (1_000_000 * t) // (n * PACK_BUDGET)
        # a chunk that straddles the budget line overfills its pack, so
        # fill can exceed 1e6 by < chunk_len/budget; it can't double
        assert 0 < r["fill_e6"] < 2_000_000


# --------------------------------------------------------------------------
# IVF + PQ composition
# --------------------------------------------------------------------------

def test_ivf_pq_topk_is_adc_restricted_to_probe(spark, sf_smoke):
    """The composed gate equals brute-force integer ADC restricted to
    the probed coarse clusters — proving the composition loses nothing
    but the unprobed clusters (the IVF contract)."""
    from data_table_spark.operators.similarity import (
        _ivf_pq_probed_clusters,
        _pq_dist64,
        codebook_assign,
        pinned_codebook,
        pq_encode,
        sim_ivf_pq_topk,
    )

    e = load_table(spark, "embeddings", sf_smoke)
    probed = set(_ivf_pq_probed_clusters())
    assign = {
        r["vec_id"]: r["cluster"]
        for r in codebook_assign(e, pinned_codebook()).collect()
    }
    dt = _pq_dist64()
    scored = []
    for r in pq_encode(e).collect():
        if assign[r["vec_id"]] not in probed:
            continue
        d = sum(dt[m][r[f"c{m}"]] for m in range(len(dt)))
        scored.append((d, r["vec_id"]))
    scored.sort()
    got = [
        (r["dist64"], r["vec_id"], r["cluster"])
        for r in sim_ivf_pq_topk(spark, sf_smoke).collect()
    ]
    assert [(d, v) for d, v, _ in got] == scored[:10]
    assert all(c in probed for _, _, c in got)


# --------------------------------------------------------------------------
# equi-depth histogram
# --------------------------------------------------------------------------

def test_equidepth_buckets_partition_and_balance(spark, sf_smoke):
    """Buckets partition the rows, ranges are disjoint and ordered, and
    every bucket holds ~n/8 rows up to value-atomic tie rounding (no
    bucket more than the largest tie group off balance)."""
    rows = RELATIONAL_QUERIES["q192_equidepth_histogram"](
        spark, sf_smoke
    ).collect()
    o = load_table(spark, "orders", sf_smoke).select("o_totalprice").collect()
    vals = sorted(round(r["o_totalprice"] * 100) for r in o)
    n = len(vals)
    assert sum(r["n_rows"] for r in rows) == n
    by_b = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(by_b, by_b[1:]):
        assert a["hi_c"] < b["lo_c"]
    # python replay of the value-atomic bucketing
    from collections import Counter

    cnt = Counter(vals)
    cum = 0
    exp: dict[int, int] = defaultdict(int)
    for v in sorted(cnt):
        cum += cnt[v]
        exp[((cum - 1) * 8) // n] += cnt[v]
    assert {r["bucket"]: r["n_rows"] for r in rows} == dict(exp)


# --------------------------------------------------------------------------
# Neyman allocation
# --------------------------------------------------------------------------

def test_neyman_allocation_matches_python_and_dominates(spark, sf_smoke):
    """Weights equal √(N·Q − S²) e6-floored, allocations floor-split
    the budget, and a higher-variance-mass stratum never gets fewer
    samples than a lower one (the optimality ordering)."""
    from data_table_spark.operators.pipeline import (
        NEYMAN_BUDGET,
        neyman_allocation,
    )

    docs = load_table(spark, "documents", sf_smoke)
    m: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for r in docs.select("source", "text").collect():
        x = len(_toks(r["text"]))
        e = m[r["source"]]
        e[0] += 1
        e[1] += x
        e[2] += x * x
    w = {
        s: math.floor(1e6 * math.sqrt(n * q - v * v))
        for s, (n, v, q) in m.items()
    }
    tot = sum(w.values())
    rows = neyman_allocation(docs).collect()
    assert len(rows) == len(m)
    got_alloc = {}
    for r in rows:
        assert r["weight_e6"] == w[r["source"]]
        assert r["total_weight_e6"] == tot
        assert r["alloc_n"] == (NEYMAN_BUDGET * w[r["source"]]) // tot
        got_alloc[r["source"]] = r["alloc_n"]
    assert sum(got_alloc.values()) <= NEYMAN_BUDGET
    ordered = sorted(m, key=lambda s: w[s])
    for a, b in zip(ordered, ordered[1:]):
        assert got_alloc[a] <= got_alloc[b]


# --------------------------------------------------------------------------
# RAKE keywords
# --------------------------------------------------------------------------

def test_rake_matches_python_replay(spark, sf_smoke):
    """Top-15 phrase table equals a pure-Python RAKE over the same
    stopword set — pins islands segmentation, degree/freq scoring,
    the distinct-phrase collapse, and the tie-break."""
    from data_table_spark.operators.textstats import (
        RAKE_TOP_K,
        STOPWORDS,
        rake_keywords,
    )

    docs = load_table(spark, "documents", sf_smoke).select("doc_id", "text")
    phrases: list[tuple[str, ...]] = []
    for r in docs.collect():
        run: list[str] = []
        for wtok in _toks(r["text"]) + ["the"]:  # sentinel flush
            if wtok in STOPWORDS:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(wtok)
    freq: Counter = Counter()
    deg: Counter = Counter()
    for ph in phrases:
        for wtok in ph:
            freq[wtok] += 1
            deg[wtok] += len(ph)
    ws = {wtok: (1_000_000 * deg[wtok]) // freq[wtok] for wtok in freq}
    uniq = {ph for ph in phrases}
    scored = sorted(
        (
            (-sum(ws[wtok] for wtok in ph), " ".join(ph), len(ph))
            for ph in uniq
        ),
        key=lambda x: (x[0], x[1]),
    )[:RAKE_TOP_K]
    got = [
        (r["phrase"], r["n_words"], r["score_e6"])
        for r in rake_keywords(docs).collect()
    ]
    assert got == [(p, n, -s) for s, p, n in scored]
