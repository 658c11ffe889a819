"""Driver-contract window policy (no Spark needed — pure registry checks).

The round driver grades the FIRST 50 queries() entries against
oracle_sql() and records the result in CORRECTNESS_r{N}.json. These
tests pin the rotation policy documented in __spark_entry__._PRIORITY:
no window slot may be wasted on a gate the driver cannot hash-grade,
and every oracle-backed gate that has never earned a green row must be
inside the window.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: gates whose output is tolerance-checked or hash-dependent BY NATURE —
#: they can never hash-match an oracle and must stay out of the window
#: (each has a deterministic-oracle sibling or recall/golden pytest).
ROWS_ONLY_BY_NATURE = {
    "q17_approx_count_distinct",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "dedup_clusters",
    "sim_lsh_topk",
    "sim_knn_join",
    "sim_ivf_kmeans_topk",
    "ntile_approx_buckets",  # GK quantile sketch has no DuckDB replay;
                             # golden test pins ≥99% agreement w/ exact
    "pipe_bpe_merges",  # iterative per-round global argmax is not
                        # single-statement SQL; the pytest golden pins
                        # the FULL merge table against a pure-Python
                        # reference BPE (test_bpe_train_matches_reference),
                        # and pipe_bpe_pair_counts is the oracle-backed
                        # sibling for the round-0 statistics
    "text_compression_ratio",  # zlib deflate size has no SQL replay;
                                # the golden test compares the FULL
                                # output against Python zlib directly
                                # (same contract as pipe_bpe_merges)
    # media_decode_features left this set in round 5: the fake-decode
    # features are byte arithmetic an ASCII fixture lets DuckDB replay
    # exactly (ord(char) == byte), so it now carries a hash oracle.
}


def _window():
    return list(entry.queries())[:50]


def test_priority_entries_all_resolve():
    qs = entry.queries()
    missing = [p for p in entry._PRIORITY if p not in qs]
    assert not missing, missing
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))


def test_window_is_fully_oracle_backed():
    oracles = entry.oracle_sql()
    unhashable = [k for k in _window() if k not in oracles]
    assert not unhashable, f"window slots the driver cannot grade: {unhashable}"
    in_window = ROWS_ONLY_BY_NATURE & set(_window())
    assert not in_window, f"rows-only gates burning window slots: {in_window}"


def test_every_never_green_oracle_gate_is_in_window():
    """A gate with an oracle but no green row in any committed
    CORRECTNESS file is exactly what the window exists to prove."""
    green = set()
    for n in range(1, 50):
        p = os.path.join(REPO, f"CORRECTNESS_r{n:02d}.json")
        if not os.path.exists(p):
            continue
        with open(p) as f:
            for k, v in json.load(f).items():
                if v.get("hash_match"):
                    green.add(k)
    oracles = entry.oracle_sql()
    never_green = {k for k in entry.queries() if k in oracles} - green
    # the window holds 50 slots; when never-green gates outnumber it
    # (gates written after the window froze), the overflow must be
    # EXPLICITLY staged in _NEXT_WINDOW_QUEUE — nothing falls through
    # silently, and re-proof slots never displace a frozen window
    # mid-round.
    out = never_green - set(_window()) - set(entry._NEXT_WINDOW_QUEUE)
    assert not out, f"never-green oracle-backed gates outside the window: {out}"
    # queued gates must still be real, oracle-backed registry entries
    stale_queue = [
        k for k in entry._NEXT_WINDOW_QUEUE if k not in entry.queries()
    ]
    assert not stale_queue, f"queue names unknown gates: {stale_queue}"


def test_rows_only_set_matches_registry():
    """Every registered query lacking an oracle must be in the documented
    rows-only list — a new gate without an oracle is either an oversight
    or needs adding to ROWS_ONLY_BY_NATURE with a written justification."""
    oracles = entry.oracle_sql()
    no_oracle = {k for k in entry.queries() if k not in oracles}
    assert no_oracle == ROWS_ONLY_BY_NATURE, (
        no_oracle ^ ROWS_ONLY_BY_NATURE
    )


def _latest_green():
    latest = {}
    for n in range(1, 50):
        p = os.path.join(REPO, f"CORRECTNESS_r{n:02d}.json")
        if not os.path.exists(p):
            continue
        with open(p) as f:
            for k, v in json.load(f).items():
                if v.get("hash_match"):
                    latest[k] = n
    return latest


def test_stalest_cohort_is_in_window_or_staged_for_r9():
    """Round-6 judge item 4: the r3-proven cohort is the stalest green
    set. Every gate whose FRESHEST green row is round 3 must either be
    re-proven in this round's window or hold an explicit round-9
    re-proof claim — the claim order is pinned here, not improvised
    next round."""
    latest = _latest_green()
    stalest_round = min(latest.values())
    stale = {k for k, r in latest.items() if r <= 3}
    out = stale - set(_window()) - set(entry._R9_REPROOF_QUEUE)
    assert not out, (
        f"r{stalest_round}-resting gates neither in window nor staged: {out}"
    )
    # queue entries must be real registry gates (no stale names)
    unknown = [k for k in entry._R9_REPROOF_QUEUE if k not in entry.queries()]
    assert not unknown, f"r9 queue names unknown gates: {unknown}"


def test_r4_cohort_reproved_in_r11():
    """Archival, never re-interpreted: every pinned r4 claim
    (_R11_REPROOF_QUEUE) earned its green row in the committed
    CORRECTNESS_r11.json. Asserting against the committed artifact —
    not against the live window — is what keeps this test true after
    later rounds rotate the window (the round-11 judge's 'equality
    against moving state' defect, VERDICT r11 item 2)."""
    with open(os.path.join(REPO, "CORRECTNESS_r11.json")) as f:
        r11 = json.load(f)
    not_green = [
        k
        for k in entry._R11_REPROOF_QUEUE
        if not r11.get(k, {}).get("hash_match")
    ]
    assert not not_green, f"pinned r4 claims without an r11 green: {not_green}"


def test_r11_session_additions_lead_the_r12_window():
    """Round-12 window rule 1 (VERDICT r11 item 1): the 27 round-11
    session additions — pinned verbatim from round 11's
    _NEXT_WINDOW_QUEUE — occupy the window's first 27 slots in queue
    order, so every one of them gets its first driver row this round."""
    assert _window()[:27] == entry._R11_SESSION_ADDITIONS
    assert len(entry._R11_SESSION_ADDITIONS) == 27


def test_r5_cohort_is_in_window_or_staged():
    """The r5 cohort is the stalest green set. Its claim order is
    pinned (_R5_COHORT_CLAIM_ORDER); rounds consume it strictly as a
    prefix (r11 spillover took 4, the r12 window takes the next 23),
    and _R13_REPROOF_QUEUE is exactly the unconsumed suffix.

    COVERAGE, not equality: a grading file landing mid-round moves
    gates OUT of the stale set (their freshest green row advances),
    so the pinned order must be a superset of whatever still rests on
    r5 — never asserted equal to it (VERDICT r11 item 2)."""
    latest = _latest_green()
    stale = {k for k, r in latest.items() if r == 5}
    assert stale <= set(entry._R5_COHORT_CLAIM_ORDER), (
        stale - set(entry._R5_COHORT_CLAIM_ORDER)
    )
    out = stale - set(_window()) - set(entry._R13_REPROOF_QUEUE)
    assert not out, f"r5-resting gates neither in window nor staged: {out}"
    unknown = [
        k for k in entry._R13_REPROOF_QUEUE if k not in entry.queries()
    ]
    assert not unknown, f"r13 queue names unknown gates: {unknown}"
    # the r13 queue must not hold gates already re-proven in this
    # round's window (a slot claimed twice is a slot wasted)
    dup = set(entry._R13_REPROOF_QUEUE) & set(_window())
    assert not dup, f"r13 queue duplicates round-12 window slots: {dup}"
    # rule-3 slots consume the r12 claim order's prefix, no skipping
    # ahead; the r13 queue is exactly its suffix
    consumed = [
        k for k in entry._R12_REPROOF_QUEUE if k in set(_window())
    ]
    assert consumed == entry._R12_REPROOF_QUEUE[: len(consumed)], (
        "rule-3 slots skip ahead of the pinned r12 claim order"
    )
    assert entry._R13_REPROOF_QUEUE == entry._R12_REPROOF_QUEUE[
        len(consumed):
    ], "r13 queue is not the unconsumed suffix of the r12 claim order"
