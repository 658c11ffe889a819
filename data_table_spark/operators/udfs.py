"""UDF surface (SURVEY §2.2 G11): scalar pandas UDF, grouped-map
applyInPandas, and table-function (explode/posexplode) forms.

Policy: UDFs are the SLOW path — every operator elsewhere in this engine
is built-in expressions. This module exists because the reference's users
need an escape hatch, and it demonstrates the right way to take it:
Arrow-batched pandas UDFs (per-batch JVM⇄Python transfer), never
row-at-a-time Python UDFs. Each demo computes something that also has a
pure-SQL equivalent so the DuckDB gate can verify the UDF machinery
end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Iterator, Tuple  # noqa: UP035 — pandas_udf hint parsing

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..sources.registry import load_table


def _round_half_up_i64(s: "pd.Series") -> "pd.Series":
    """Half-UP rounding to int64 for NON-NEGATIVE series (round-10
    ADVICE): pandas ``.round()`` is half-EVEN (banker's) while the
    DuckDB oracle's ROUND is half-away-from-zero — on the shipped
    fixtures no value lands exactly on .5 after the float multiply, so
    the two coincided, but the equivalence was coincidental. floor(x +
    0.5) IS half-up for x >= 0; every caller rounds prices/quantities/
    discounts, non-negative by construction."""
    import numpy as np

    arr = s.to_numpy(dtype="float64")
    if (arr < 0).any():
        raise ValueError("_round_half_up_i64 requires non-negative values")
    return pd.Series(np.floor(arr + 0.5).astype("int64"), index=s.index)


def _net_price_udf():
    # built lazily: the pandas_udf decorator parses its type against an
    # active SparkSession, so it cannot run at module import time
    @pandas_udf(T.DoubleType())
    def _net_price(ext: pd.Series, disc: pd.Series) -> pd.Series:
        return ext * (1.0 - disc)

    return _net_price


def udf_scalar_net_price(spark, sf_dir):
    """Scalar pandas UDF over lineitem; Arrow-batched, one Python worker
    per task. (For production this exact formula should be a built-in
    expression — the UDF is the point here.)"""
    li = load_table(spark, "lineitem", sf_dir)
    net = _net_price_udf()
    return li.select(
        "l_orderkey", "l_linenumber",
        # floor-truncate: price*(1-disc) lands exactly on .xx5 often, where
        # Spark ROUND (half-up on decimal repr) and DuckDB ROUND (binary)
        # disagree; floor of identical doubles is engine-independent
        (F.floor(net("l_extendedprice", "l_discount") * 100) / 100).alias("net"),
    )


GROUP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("cohort", T.LongType()),
        T.StructField("n_orders", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("max_price", T.DoubleType()),
        T.StructField("median_price", T.DoubleType()),
    ]
)

#: cohort count for the grouped-map demo. Grouping applyInPandas by a
#: near-unique key (e.g. raw o_custkey: ~n/10 groups of ~10 rows) pays
#: the per-group pandas overhead ~n/10 times for work a built-in agg does
#: in one pass — measured 10.6 s at sf0.1, vs <1 s with 100 cohorts of
#: ~1500 rows. Grouped-map wants FEW, LARGE groups; this constant is the
#: demo's documentation of that rule.
STATS_COHORTS = 100


def udf_grouped_map_stats(spark, sf_dir):
    """Grouped-map applyInPandas: per-cohort order stats, including a
    pandas-interpolated median (the kind of stat that justifies dropping
    to Python). Each group arrives as ONE pandas DataFrame — the shuffle
    is on the cohort key, state is bounded by the largest group."""
    o = load_table(spark, "orders", sf_dir).withColumn(
        "cohort", F.col("o_custkey") % STATS_COHORTS
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf["o_totalprice"]
        return pd.DataFrame(
            {
                "cohort": [pdf["cohort"].iloc[0]],
                "n_orders": [len(pdf)],
                "total": [round(p.sum(), 2)],
                "max_price": [p.max()],
                "median_price": [p.median()],
            }
        )

    return o.groupBy("cohort").applyInPandas(stats, GROUP_STATS_SCHEMA)


def udf_table_function_tokens(spark, sf_dir):
    """Table-function surface: posexplode of the token array (1 row in →
    N rows out). Bounded to doc_id < 50 to keep the gate result small."""
    d = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 50)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return (
        d.select("doc_id", F.posexplode(toks).alias("pos", "token"))
        .select("doc_id", (F.col("pos") + 1).cast("long").alias("pos"), "token")
    )


UDF_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "udf_scalar_net_price": udf_scalar_net_price,
    "udf_grouped_map_stats": udf_grouped_map_stats,
    "udf_table_function_tokens": udf_table_function_tokens,
}

UDF_ORACLE: dict[str, str] = {
    "udf_scalar_net_price":
        "SELECT l_orderkey, l_linenumber, "
        "FLOOR(l_extendedprice * (1 - l_discount) * 100) / 100 net FROM lineitem",
    "udf_grouped_map_stats":
        # MEDIAN: DuckDB interpolates the two middle values on even
        # counts, exactly like pandas Series.median (both IEEE means of
        # representable doubles → engine-identical)
        "SELECT o_custkey % 100 AS cohort, COUNT(*)::BIGINT n_orders, "
        "ROUND(SUM(o_totalprice), 2) total, MAX(o_totalprice) max_price, "
        "MEDIAN(o_totalprice) median_price "
        "FROM orders GROUP BY o_custkey % 100",
    "udf_table_function_tokens":
        "SELECT doc_id, u.pos::BIGINT pos, u.token FROM documents, "
        "LATERAL (SELECT UNNEST(string_split_regex(trim(text), '\\s+')) token, "
        "generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) pos) u "
        "WHERE doc_id < 50",
}


def udf_python_udtf_words(spark, sf_dir):
    """A real Python UDTF (PySpark 4 @udtf): one text row in → one row per
    word out, with the word length. Registered and invoked through the
    SQL LATERAL surface; bounded to doc_id < 20."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, wlen: bigint")
    class Words:
        def eval(self, text: str):
            for w in (text or "").split():
                yield w, len(w)

    spark.udtf.register("dt_words", Words)
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT doc_id, w.word, w.wlen
        FROM docs_udtf, LATERAL dt_words(text) w
        WHERE doc_id < 20
        """
    )


UDF_QUERIES["udf_python_udtf_words"] = udf_python_udtf_words
UDF_ORACLE["udf_python_udtf_words"] = (
    # list_filter: Python str.split() yields NO tokens for blank text,
    # while split_regex(trim('')) yields one empty string — filter it so
    # a blank document can never diverge the engines (round-9 ADVICE)
    "SELECT doc_id, u.word, CAST(length(u.word) AS BIGINT) wlen "
    "FROM documents, "
    "LATERAL (SELECT UNNEST(list_filter("
    "  string_split_regex(trim(text), '\\s+'), x -> x <> '')) word) u "
    "WHERE doc_id < 20"
)


def ewma_per_key(
    df,
    key_col: str = "user_id",
    ts_cols: tuple = ("ts", "event_id"),
    value_col: str = "value",
    alpha: float = 0.2,
):
    """Sequential per-key state the SQL window algebra cannot express:
    EWMA is a first-order recurrence (y_t = α·x_t + (1−α)·y_{t−1}),
    not a frame aggregate. The closed form Σα(1−α)^i·x could ride a
    window + pow, but drifts numerically for long histories; the
    recurrence is the numerically-honest form and the same double ops
    DuckDB's recursive CTE replays, so the gate is hash-exact (floored
    to e6 — floor has no tie-breaking, unlike ROUND).

    Round-14 optimization (guide §4.2, the capped_sessions recipe
    applied mechanically as OPTIMIZATION_r13 staged): the per-key
    grouped-map form paid ~2 ms of applyInPandas machinery PER KEY
    (Arrow slice + pandas frame per group — the same overhead isolated
    at 3.2 s for a no-op fold over the 1500 sf0.1 keys). Now ONE
    repartition(key) + sortWithinPartitions(key, ts, tiebreak) feeds
    ``mapInPandas``, which folds a WHOLE partition in one pass: key
    breaks reset the recurrence, and each row runs the identical
    float64 ops (python float IS the same IEEE-754 double), so the
    output is row-identical to the grouped-map form (pinned in
    tests/test_optimization_r14.py). The grouped-map surface itself
    stays proven by udf_grouped_map_stats / udf_cogrouped_merge /
    udf_arrow_grouped_map. Hot-key cost is unchanged (one in-memory
    pass over that key's rows; state is O(1))."""
    import pandas as pd

    def fold_partition(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if len(pdf) == 0:
            return
        # rows arrive sorted by (key, *ts_cols); complete key groups
        # land in one partition via the repartition(key)
        keys = pdf[key_col].to_numpy()
        xs = pdf[value_col].to_numpy(dtype="float64").tolist()
        n = len(xs)
        out = [0] * n
        rn = [0] * n
        y = 0.0
        prev = None
        r = 0
        for i in range(n):
            x = xs[i]
            k = keys[i]
            if prev is None or k != prev:
                y, r, prev = x, 1, k
            else:
                y = alpha * x + (1.0 - alpha) * y
                r += 1
            # identical flooring expression to the grouped-map form
            out[i] = int(y * 1e6 // 1)
            rn[i] = r
        yield pd.DataFrame({key_col: keys, "rn": rn, "ewma_e6": out})

    return (
        df.repartition(key_col)
        .sortWithinPartitions(key_col, *ts_cols)
        .mapInPandas(
            fold_partition, f"{key_col} long, rn long, ewma_e6 long"
        )
    )


def udf_ewma_state(spark, sf_dir):
    """Gate: per-user EWMA over event values (α=0.2) — the sequential
    recurrence via a partition-sorted mapInPandas fold, proven
    hash-exact against DuckDB's RECURSIVE CTE replay of the identical
    double arithmetic."""
    e = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "value"
    )
    return ewma_per_key(e)


UDF_QUERIES["udf_ewma_state"] = udf_ewma_state
UDF_ORACLE["udf_ewma_state"] = (
    "WITH RECURSIVE o AS ("
    "  SELECT user_id, value, ROW_NUMBER() OVER ("
    "    PARTITION BY user_id ORDER BY ts, event_id) AS rn "
    "  FROM events), "
    "r AS ("
    "  SELECT user_id, rn, value AS y FROM o WHERE rn = 1 "
    "  UNION ALL "
    "  SELECT o.user_id, o.rn, 0.2 * o.value + 0.8 * r.y "
    "  FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1) "
    "SELECT user_id, rn, CAST(FLOOR(y * 1000000) AS BIGINT) AS ewma_e6 "
    "FROM r"
)


#: capped-sessionization parameters: a session breaks after 30 min of
#: inactivity OR when an event would stretch it past 24 h from its start
SESSION_GAP_US = 1_800_000_000
SESSION_CAP_US = 86_400_000_000


def capped_sessions(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_us: int = SESSION_GAP_US,
    cap_us: int = SESSION_CAP_US,
):
    """Sessionization with BOTH an inactivity gap and a max-duration
    cap. The gap alone is the classic gaps-and-islands (q34 /
    stream_session_counts); adding the cap makes the split SEQUENTIAL —
    whether an event starts a new session depends on the current
    session's start, which depends on every earlier split — so no
    window algebra expresses it (the same first-order-recurrence class
    as EWMA). DuckDB replays the identical recurrence with a RECURSIVE
    CTE, so the gate is hash-exact — all arithmetic is integer
    epoch-microseconds, no floats anywhere.

    Round-13 optimization (guide §4.2): the per-key grouped-map form
    paid ~2 ms of applyInPandas machinery PER KEY (Arrow slice +
    pandas frame per group — measured 3.2 s for a no-op fold over the
    1500 sf0.1 keys, more than the real work). Now ONE
    repartition(key) + sortWithinPartitions(key, ts, tiebreak) feeds
    ``mapInPandas``, which folds a WHOLE partition vectorized: gap and
    key breaks come from one shifted numpy comparison, and the
    cap-split recurrence iterates once per emitted SESSION (a
    searchsorted jump per split), not once per event. Same shuffle,
    identical output (pinned row-for-row against the grouped-map form
    in tests/test_optimization_r13.py); the grouped-map surface itself
    stays proven by udf_grouped_map_stats / udf_cogrouped_merge /
    udf_arrow_grouped_map. sf0.1: 5.6 s → ~1.5 s. Memory note: the fold
    concatenates its partition's batches (complete key groups land in
    one partition by the repartition) — partition sizing bounds this,
    the usual mapInPandas contract."""
    import numpy as np
    import pandas as pd

    def fold_partition(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if len(pdf) == 0:
            return
        # rows arrive sorted by (key, ts, tiebreak)
        keys = pdf[key_col].to_numpy()
        us = pdf[ts_col].to_numpy().astype("int64") // 1000  # ns → µs
        n = len(us)
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = (keys[1:] != keys[:-1]) | ((us[1:] - us[:-1]) > gap_us)
        bounds = np.append(np.flatnonzero(brk), n)
        starts: list[int] = []
        for a, b in zip(bounds[:-1], bounds[1:]):
            s = int(a)
            starts.append(s)
            # cap splits inside a gap-island: jump to the first event
            # past start+cap — one iteration per SESSION, not per event
            while True:
                j = s + int(
                    np.searchsorted(us[s:b], us[s] + cap_us, side="right")
                )
                if j >= b:
                    break
                starts.append(j)
                s = j
        st = np.asarray(starts, dtype="int64")
        ends = np.append(st[1:], n) - 1
        # sid restarts at 1 per key, in time order
        key_first = np.empty(len(st), dtype=bool)
        key_first[0] = True
        key_first[1:] = keys[st[1:]] != keys[st[:-1]]
        first_idx = np.maximum.accumulate(
            np.where(key_first, np.arange(len(st)), 0)
        )
        sid = np.arange(len(st)) - first_idx + 1
        yield pd.DataFrame(
            {
                key_col: keys[st],
                "sid": sid,
                "n_events": np.append(st[1:], n) - st,
                "start_us": us[st],
                "end_us": us[ends],
            }
        )

    return (
        df.repartition(key_col)
        .sortWithinPartitions(key_col, ts_col, tiebreak_col)
        .mapInPandas(
            fold_partition,
            f"{key_col} long, sid long, n_events long, "
            "start_us long, end_us long",
        )
    )


def udf_capped_sessions(spark, sf_dir):
    """Gate: gap+cap sessionization of events — the second non-window-
    expressible recurrence proven hash-exact against DuckDB's
    RECURSIVE CTE (after udf_ewma_state)."""
    e = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id"
    )
    return capped_sessions(e)


UDF_QUERIES["udf_capped_sessions"] = udf_capped_sessions
UDF_ORACLE["udf_capped_sessions"] = (
    "WITH RECURSIVE o AS ("
    "  SELECT user_id, epoch_us(ts) AS t, ROW_NUMBER() OVER ("
    "    PARTITION BY user_id ORDER BY ts, event_id) AS rn "
    "  FROM events), "
    "r AS ("
    "  SELECT user_id, rn, t, 1::BIGINT AS sid, t AS sess_start "
    "  FROM o WHERE rn = 1 "
    "  UNION ALL "
    "  SELECT o.user_id, o.rn, o.t, "
    "    CASE WHEN o.t - r.t > 1800000000 "
    "      OR o.t - r.sess_start > 86400000000 "
    "      THEN r.sid + 1 ELSE r.sid END, "
    "    CASE WHEN o.t - r.t > 1800000000 "
    "      OR o.t - r.sess_start > 86400000000 "
    "      THEN o.t ELSE r.sess_start END "
    "  FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1) "
    "SELECT user_id, sid, COUNT(*) AS n_events, "
    "  CAST(MIN(t) AS BIGINT) AS start_us, "
    "  CAST(MAX(t) AS BIGINT) AS end_us "
    "FROM r GROUP BY user_id, sid"
)


# --------------------------------------------------------------------------
# Arrow-optimized Python UDF (the third UDF flavor, Spark 3.5+/4 useArrow)
# --------------------------------------------------------------------------

def udf_arrow_scalar_tax(spark, sf_dir):
    """Arrow-optimized Python UDF (``@F.udf(..., useArrow=True)``) — the
    third UDF execution flavor after pandas_udf (vectorized batches,
    udf_scalar_net_price) and row-at-a-time pickled UDFs (deliberately
    absent from this repo's hot paths): the function still receives ONE
    row's values, but the JVM⇄Python transfer rides Arrow batches
    instead of pickle — the drop-in accelerator for legacy row UDF code
    that can't be vectorized. Integer-exact body (cents arithmetic) so
    the oracle replays it; the sibling docstrings' advice stands — a
    formula this simple belongs in built-in expressions, the execution
    surface is the point."""
    @F.udf(returnType=T.LongType(), useArrow=True)
    def tax_cents(price, tax):
        # cents via nearest-integer rounding: the 2dp-rounded double
        # times 100 sits within float noise of an integer, so round()
        # (Python) and CAST(.. AS BIGINT) (DuckDB) pick the same one —
        # int() truncation picked the integer BELOW for x.9999.. floats
        # (caught by the oracle on first run)
        return int(round(price * 100)) * int(round(tax * 100)) // 100

    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey", "l_linenumber",
        tax_cents(
            F.round(F.col("l_extendedprice"), 2),
            F.round(F.col("l_tax"), 2),
        ).alias("tax_cents"),
    )


UDF_QUERIES["udf_arrow_scalar_tax"] = udf_arrow_scalar_tax
UDF_ORACLE["udf_arrow_scalar_tax"] = (
    "SELECT l_orderkey, l_linenumber, "
    "  CAST((CAST(ROUND(l_extendedprice, 2) * 100 AS BIGINT) "
    "    * CAST(ROUND(l_tax, 2) * 100 AS BIGINT)) // 100 AS BIGINT) "
    "    AS tax_cents "
    "FROM lineitem"
)


def udf_arrow_udtf_words(spark, sf_dir):
    """The Arrow-OPTIMIZED Python UDTF execution flavor (PySpark 4
    ``@udtf(..., useArrow=True)``) — completes the Python-surface
    matrix the way udf_arrow_scalar_tax did for scalars: same word
    generator as udf_python_udtf_words, same oracle SQL, but rows move
    to/from the worker as Arrow batches instead of pickled rows. The
    gate exists to prove the FLAVOR (the plan must still produce
    identical output through the batched transport); the logic itself
    belongs in built-ins — documented here exactly like the scalar
    twin. Bounded to doc_id >= 20 AND < 40 so the two UDTF gates
    exercise disjoint slices."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, wlen: bigint", useArrow=True)
    class ArrowWords:
        def eval(self, text: str):
            for w in (text or "").split():
                yield w, len(w)

    spark.udtf.register("dt_words_arrow", ArrowWords)
    load_table(spark, "documents", sf_dir).createOrReplaceTempView(
        "docs_udtf_arrow"
    )
    return spark.sql(
        """
        SELECT doc_id, w.word, w.wlen
        FROM docs_udtf_arrow, LATERAL dt_words_arrow(text) w
        WHERE doc_id >= 20 AND doc_id < 40
        """
    )


UDF_QUERIES["udf_arrow_udtf_words"] = udf_arrow_udtf_words
UDF_ORACLE["udf_arrow_udtf_words"] = (
    # list_filter guards the blank-document edge exactly like the
    # non-Arrow twin above (round-9 ADVICE)
    "SELECT doc_id, u.word, CAST(length(u.word) AS BIGINT) wlen "
    "FROM documents, "
    "LATERAL (SELECT UNNEST(list_filter("
    "  string_split_regex(trim(text), '\\s+'), x -> x <> '')) word) u "
    "WHERE doc_id >= 20 AND doc_id < 40"
)


# --------------------------------------------------------------------------
# mapInPandas: batch-level filter + project (the map-partitions flavor)
# --------------------------------------------------------------------------

#: quantity cut for the mapInPandas demo — ~50 % selectivity at every sf.
MIP_MIN_QTY = 25


def udf_mapinpandas_filter(spark, sf_dir):
    """mapInPandas over lineitem — the remaining Python execution
    flavor in the matrix (scalar pandas_udf / Arrow row UDF / grouped
    applyInPandas / pickled+Arrow UDTF / applyInPandasWithState are
    all gated already): the WHOLE Arrow batch arrives as a DataFrame
    and the function may filter, project, and re-shape it (0..n rows
    out per batch) with no grouping key — the shape bulk featurizers
    and batch-level model scoring actually use (multimodal.py rides it
    for decode; this gate pins the flavor on the relational path with
    an exact oracle).

    Exactness: net cents computed INSIDE the batch in integer space —
    round(ext·100)·(100 − round(disc·100)) // 100 on int64 pandas
    columns, replayed by the oracle in BIGINT arithmetic; no float
    leaves the worker.

    Scale shape: map-only (no shuffle, no grouping); predicate
    selectivity happens inside the batch. The cost vs a builtin WHERE
    is one Arrow round-trip per batch — which is the point: everything
    expressible as Column expressions STAYS JVM-side (q02), and this
    flavor exists for logic that is not."""
    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.LongType()),
            T.StructField("qty", T.LongType()),
            T.StructField("net_cents", T.LongType()),
        ]
    )

    def batches(it):
        for pdf in it:
            qty = _round_half_up_i64(pdf["l_quantity"])
            keep = pdf[qty >= MIP_MIN_QTY]
            kq = qty[qty >= MIP_MIN_QTY]
            ext_c = _round_half_up_i64(keep["l_extendedprice"] * 100)
            disc_p = _round_half_up_i64(keep["l_discount"] * 100)
            out = pd.DataFrame(
                {
                    "l_orderkey": keep["l_orderkey"].astype("int64"),
                    "l_linenumber": keep["l_linenumber"].astype("int64"),
                    "qty": kq.astype("int64"),
                    "net_cents": (ext_c * (100 - disc_p)) // 100,
                }
            )
            yield out

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount",
    )
    return li.mapInPandas(batches, schema)


UDF_QUERIES["udf_mapinpandas_filter"] = udf_mapinpandas_filter
UDF_ORACLE["udf_mapinpandas_filter"] = (
    "SELECT l_orderkey, l_linenumber, "
    "  CAST(ROUND(l_quantity) AS BIGINT) AS qty, "
    "  CAST((CAST(ROUND(l_extendedprice * 100) AS BIGINT) "
    "    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) // 100 "
    "    AS BIGINT) AS net_cents "
    "FROM lineitem "
    f"WHERE CAST(ROUND(l_quantity) AS BIGINT) >= {MIP_MIN_QTY}"
)


# --------------------------------------------------------------------------
# grouped-agg pandas UDF (series -> scalar UDAF flavor)
# --------------------------------------------------------------------------

def udf_grouped_agg_sums(spark, sf_dir):
    """Grouped-AGGREGATE pandas UDF — the series→scalar UDAF flavor
    completing the Python surface (scalar / Arrow row / grouped-map /
    batch map / UDTF ×2 / stateful are all gated): the whole group's
    column arrives as ONE pandas Series and the function returns one
    scalar, which is how custom aggregates (weighted means, trimmed
    stats, domain losses) plug into groupBy/agg — and unlike
    grouped-map it composes with built-in aggregates in the same agg().

    Exactness: the UDAF sums int64 cents in numpy (exact integer
    arithmetic inside the worker) and returns the sum as a double —
    every corpus-realistic value sits far below 2^53, so the
    long→double handoff is lossless and engine-comparable; the
    weighted mean is then ONE double division per group, outside the
    UDF, identical in the oracle.

    Scale shape: one shuffle on the group key — and the documented
    memory caveat: unlike built-in aggregates there is NO partial
    aggregation; each group's ENTIRE column materializes in one Python
    worker. Three return flags over a 100 TB fact table means a third
    of the column per worker — at scale this exact grouping is the
    anti-pattern, and a sum like this one belongs in built-ins (q12).
    The flavor earns its keep on non-algebraic per-group functions
    over BOUNDED groups (per-user, per-order); for algebraic ones
    pre-reduce with built-ins or run a manual two-level
    partial/merge."""
    import numpy as np

    @pandas_udf(T.DoubleType())
    def wsum_cents(ext: pd.Series, qty: pd.Series) -> float:
        cents = _round_half_up_i64(ext * 100).to_numpy()
        q = _round_half_up_i64(qty).to_numpy()
        s = int((cents * q).sum())
        # the long->double handoff is lossless only below 2^53; a
        # grouped-agg pandas UDF can only return scalar primitives, so
        # past that the exact sum would SILENTLY diverge from the
        # BIGINT oracle — fail loudly instead (round-10 ADVICE). At
        # scale this aggregate belongs in built-ins anyway (docstring).
        if abs(s) >= 2**53:
            raise OverflowError(
                f"wsum_cents {s} exceeds 2^53; double return would round"
            )
        return float(s)

    @pandas_udf(T.DoubleType())
    def qty_sum(qty: pd.Series) -> float:
        s = int(_round_half_up_i64(qty).to_numpy().sum())
        if abs(s) >= 2**53:
            raise OverflowError(
                f"qty_sum {s} exceeds 2^53; double return would round"
            )
        return float(s)

    @pandas_udf(T.DoubleType())
    def row_count(qty: pd.Series) -> float:
        return float(len(qty))

    li = load_table(spark, "lineitem", sf_dir)
    g = li.groupBy("l_returnflag").agg(
        row_count("l_quantity").alias("n_rows_d"),
        wsum_cents("l_extendedprice", "l_quantity").alias("wsum"),
        qty_sum("l_quantity").alias("qsum"),
    )
    return g.select(
        "l_returnflag",
        F.col("n_rows_d").cast("long").alias("n_rows"),
        F.col("wsum").cast("long").alias("wsum_cents"),
        F.col("qsum").cast("long").alias("qty_sum"),
        F.round(F.col("wsum") / F.col("qsum") / 100.0, 4)
        .alias("wavg_price"),
    )


UDF_QUERIES["udf_grouped_agg_sums"] = udf_grouped_agg_sums
UDF_ORACLE["udf_grouped_agg_sums"] = (
    "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) "
    "    * CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS wsum_cents, "
    "  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty_sum, "
    "  ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) "
    "    * CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE) "
    "    / CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE) "
    "    / 100.0, 4) AS wavg_price "
    "FROM lineitem GROUP BY l_returnflag"
)


def udf_udtf_dynamic_schema(spark, sf_dir):
    """The third Python-UDTF flavor (PySpark 4 polymorphic analyze):
    the OUTPUT SCHEMA is computed at PLAN time by a static ``analyze``
    method from the call's constant argument — here `dt_head_cols(text,
    3)` derives columns (n_toks, w0, w1, w2), and calling it with a
    different literal would produce a different relation shape without
    touching the class. This is the API for schema-polymorphic table
    functions (pivot-like explodes, CSV-ish splitters) that a static
    returnType cannot express; eval() is the same generator surface as
    the other two flavors. Bounded to 40 <= doc_id < 60 so the three
    UDTF gates scan disjoint slices. Cites udf_python_udtf_words
    (static schema) and udf_arrow_udtf_words (Arrow transport) — this
    completes the flavor matrix on the schema axis."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class HeadCols:
        @staticmethod
        def analyze(
            text: AnalyzeArgument, n: AnalyzeArgument
        ) -> AnalyzeResult:
            if not n.isConstantExpression or n.value is None:
                raise ValueError("dt_head_cols: n must be a constant")
            k = int(n.value)
            return AnalyzeResult(
                schema=StructType(
                    [StructField("n_toks", LongType())]
                    + [StructField(f"w{i}", StringType()) for i in range(k)]
                )
            )

        def eval(self, text, n):
            toks = (text or "").split()
            yield tuple(
                [len(toks)]
                + [toks[i] if i < len(toks) else None for i in range(int(n))]
            )

    spark.udtf.register("dt_head_cols", udtf(HeadCols))
    load_table(spark, "documents", sf_dir).createOrReplaceTempView(
        "docs_udtf_dyn"
    )
    return spark.sql(
        """
        SELECT doc_id, h.n_toks, h.w0, h.w1, h.w2
        FROM docs_udtf_dyn, LATERAL dt_head_cols(text, 3) h
        WHERE doc_id >= 40 AND doc_id < 60
        """
    )


UDF_QUERIES["udf_udtf_dynamic_schema"] = udf_udtf_dynamic_schema
UDF_ORACLE["udf_udtf_dynamic_schema"] = (
    # 1-based list indexing returns NULL out of range — matching the
    # eval()'s None padding; blank text filters to zero tokens on both
    # sides (the udf_python_udtf_words list_filter convention)
    "WITH t AS ("
    "  SELECT doc_id, list_filter(string_split_regex(trim(text), "
    "    '\\s+'), x -> x <> '') AS l "
    "  FROM documents WHERE doc_id >= 40 AND doc_id < 60) "
    "SELECT doc_id, CAST(len(l) AS BIGINT) AS n_toks, "
    "  l[1] AS w0, l[2] AS w1, l[3] AS w2 "
    "FROM t"
)


def udf_arrow_grouped_map(spark, sf_dir):
    """Grouped-map over RAW ARROW batches (``applyInArrow``) — the
    zero-pandas sibling of udf_grouped_map_stats. Each cohort's rows
    arrive as ONE ``pyarrow.Table``; compute.* kernels aggregate it
    and a one-row Table goes back. Same Arrow IPC transport as
    applyInPandas but WITHOUT the pandas materialization tax (no
    index, no block manager, no object boxing) — the right flavor
    when per-group logic is itself columnar, and the last missing
    cell of the grouped-map transport matrix (pandas / pandas+state /
    Arrow). Money is floored to int cents per row BEFORE the sum so
    the aggregation is associative-exact (the udf_grouped_agg_sums
    discipline), never float-order-dependent.

    Scale: ONE shuffle on the cohort key; 100 cohorts (the
    STATS_COHORTS sizing note) keeps per-group batches ~n/100."""
    import pyarrow as pa
    import pyarrow.compute as pc

    o = load_table(spark, "orders", sf_dir).select(
        (F.col("o_custkey") % STATS_COHORTS).alias("cohort"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    def stats(tbl: "pa.Table") -> "pa.Table":
        cents = tbl.column("cents")
        return pa.table(
            {
                "cohort": [tbl.column("cohort")[0].as_py()],
                "n_orders": [tbl.num_rows],
                "total_cents": [pc.sum(cents).as_py()],
                "max_cents": [pc.max(cents).as_py()],
            },
            schema=pa.schema(
                [
                    ("cohort", pa.int64()),
                    ("n_orders", pa.int64()),
                    ("total_cents", pa.int64()),
                    ("max_cents", pa.int64()),
                ]
            ),
        )

    return o.groupBy("cohort").applyInArrow(
        stats,
        "cohort long, n_orders long, total_cents long, max_cents long",
    )


UDF_QUERIES["udf_arrow_grouped_map"] = udf_arrow_grouped_map
UDF_ORACLE["udf_arrow_grouped_map"] = (
    f"SELECT o_custkey % {STATS_COHORTS} AS cohort, "
    "  COUNT(*)::BIGINT AS n_orders, "
    "  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "    AS total_cents, "
    "  CAST(MAX(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "    AS max_cents "
    "FROM orders GROUP BY cohort"
)


def udf_cogrouped_merge(spark, sf_dir):
    """COGROUPED applyInPandas — the two-sided escape hatch
    (``df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas``): each
    order key's rows from BOTH orders and lineitem arrive as a pandas
    frame pair in one task, the general form of custom merges
    (reconciliation, as-of stitching, schema-divergent unions) that a
    join + groupBy cannot express when the per-key logic is
    imperative. Here the per-key logic is a reconciliation ledger —
    order-header cents vs the sum of its line extendedprice cents and
    the line count — deliberately SQL-expressible so the DuckDB
    oracle proves the cogroup transport end to end (the
    udf_grouped_map_stats discipline).

    Scale: BOTH sides shuffle once on the key — exactly a shuffle
    join's exchange pattern — then Python sees each key once; keys
    with rows on one side only still surface (full-outer semantics),
    which the oracle pins via FULL JOIN. Cohorted on o_orderkey %
    1000 to keep per-group frames batched (the STATS_COHORTS
    sizing note)."""
    o = load_table(spark, "orders", sf_dir).select(
        (F.col("o_orderkey") % 1000).alias("k"),
        F.col("o_orderkey").alias("okey"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("o_cents"),
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        (F.col("l_orderkey") % 1000).alias("k"),
        F.col("l_orderkey").alias("okey"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        lo = (
            left.groupby("okey", as_index=False)
            .agg(o_cents=("o_cents", "min"), n_headers=("o_cents", "size"))
            if len(left)
            else pd.DataFrame(columns=["okey", "o_cents", "n_headers"])
        )
        ro = (
            right.groupby("okey", as_index=False)
            .agg(li_cents=("cents", "sum"), n_lines=("cents", "size"))
            if len(right)
            else pd.DataFrame(columns=["okey", "li_cents", "n_lines"])
        )
        m = lo.merge(ro, on="okey", how="outer")
        for c in ("o_cents", "li_cents"):
            m[c] = m[c].astype("float64")
        for c in ("n_headers", "n_lines"):
            m[c] = m[c].astype("float64").fillna(0.0).astype("int64")
        return m[["okey", "o_cents", "n_headers", "li_cents", "n_lines"]]

    return (
        o.groupBy("k")
        .cogroup(li.groupBy("k"))
        .applyInPandas(
            merge,
            "okey long, o_cents double, n_headers long, "
            "li_cents double, n_lines long",
        )
        .select(
            "okey",
            F.col("o_cents").cast("long").alias("o_cents"),
            "n_headers",
            F.col("li_cents").cast("long").alias("li_cents"),
            "n_lines",
        )
    )


UDF_QUERIES["udf_cogrouped_merge"] = udf_cogrouped_merge
UDF_ORACLE["udf_cogrouped_merge"] = (
    "WITH o AS ("
    "  SELECT o_orderkey AS okey, "
    "    CAST(MIN(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "      AS o_cents, "
    "    COUNT(*)::BIGINT AS n_headers "
    "  FROM orders GROUP BY o_orderkey), "
    "l AS ("
    "  SELECT l_orderkey AS okey, "
    "    CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
    "      AS li_cents, "
    "    COUNT(*)::BIGINT AS n_lines "
    "  FROM lineitem GROUP BY l_orderkey) "
    "SELECT COALESCE(o.okey, l.okey) AS okey, o.o_cents, "
    "  COALESCE(o.n_headers, 0)::BIGINT AS n_headers, l.li_cents, "
    "  COALESCE(l.n_lines, 0)::BIGINT AS n_lines "
    "FROM o FULL JOIN l ON o.okey = l.okey"
)


def udf_iter_series_net(spark, sf_dir):
    """ITERATOR-of-series scalar pandas UDF (``Iterator[pd.Series] ->
    Iterator[pd.Series]``) — the flavor whose point is PER-TASK
    initialization amortization: expensive setup (model load, regex
    compile, dictionary mmap) runs ONCE before the batch loop instead
    of per batch, which at 100 TB is the difference between loading a
    tokenizer 10⁶ times and ~10³ times. Here the "expensive init" is a
    deterministic rate table built before the loop; the arithmetic
    (floor cents of ext·(1−disc)) matches udf_scalar_net_price's
    engine-exact floor discipline so the oracle proves the iterator
    transport, not float luck. Completes the scalar-UDF flavor matrix:
    plain pandas (udf_scalar_net_price), Arrow-native
    (udf_arrow_scalar_tax), iterator (this)."""
    # typing.Iterator/Tuple (imported at MODULE level — get_type_hints
    # resolves the stringified annotations in module globals, so a
    # function-local import is invisible to the signature parser)
    @pandas_udf(T.LongType())
    def net_cents(
        batches: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        import numpy as np

        # per-task init: runs once, amortized over every Arrow batch
        scale = np.float64(100.0)
        for ext, disc in batches:
            yield pd.Series(
                np.floor(
                    ext.to_numpy() * (1.0 - disc.to_numpy()) * scale
                ).astype("int64")
            )

    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_cents(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "net_cents"
        ),
    )


UDF_QUERIES["udf_iter_series_net"] = udf_iter_series_net
UDF_ORACLE["udf_iter_series_net"] = (
    "SELECT l_orderkey, l_linenumber, "
    "  CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) "
    "    AS net_cents "
    "FROM lineitem"
)
