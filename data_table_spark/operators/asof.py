"""As-of (temporal nearest) join — a custom operator the reference reaches
only via its SQL pass-through (get-data-table,
/root/reference/clsql-data-table.lisp:13-19) when the backing RDBMS happens
to support it. Spark has no asof primitive, so this implements the classic
scalable shape: tag both sides, union, and resolve the match with a single
running window — ONE shuffle on the `by` keys, no range-join explosion, no
per-row Python.

Why not a range join? ``left JOIN right ON by AND right.ts <= left.ts`` +
argmax produces O(|left| * matches) intermediate rows — quadratic per key
on dense keys. The union+window form is O(|left| + |right|) rows through
one shuffle and stays entirely in whole-stage codegen, which is the shape
that survives 100 TB. Skew note: a single pathological `by` key serializes
inside one window partition; pre-bucket by (key, coarse time bucket) with a
carry-in row if that ever dominates.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table

_SIDE = "_asof_side"
_TS = "_asof_ts"
_PAY = "_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_on: str,
    right_on: str,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``right_on <= left_on`` (direction='backward', inclusive — DuckDB /
    pandas.merge_asof semantics), smallest ``right_on >= left_on``
    ('forward'), or minimal ``|right_on - left_on|`` ('nearest',
    backward match on an exact distance tie) sharing the ``by`` keys;
    unmatched left rows keep NULLs (left-outer semantics).

    ``right_cols`` limits the attached payload (default: every non-by,
    non-ts right column). Attached columns keep their names unless they
    collide with a left column, in which case ``suffix`` is appended.
    ``tolerance_seconds`` voids matches farther than the tolerance (the
    row survives with NULL payload, as in pandas.merge_asof).

    Ties inside the right side (two right rows with identical (by, ts))
    resolve to the later row in window order — deduplicate the right side
    first if deterministic tie-break matters.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != right_on]
    right_cols = list(right_cols)

    # payload struct carries the right ts too, for the tolerance check and
    # so callers can project the matched timestamp
    pay_fields = [F.col(right_on).alias("_ts")] + [F.col(c).alias(c) for c in right_cols]
    r = right.select(
        *[F.col(c) for c in by],
        F.col(right_on).alias(_TS),
        F.struct(*pay_fields).alias(_PAY),
        F.lit(0).alias(_SIDE),
    )
    l = left.select(
        "*",
        F.col(left_on).alias(_TS),
        F.lit(None).cast(r.schema[_PAY].dataType).alias(_PAY),
        F.lit(1).alias(_SIDE),
    )
    unioned = l.unionByName(r.select(*by, _TS, _PAY, _SIDE), allowMissingColumns=True)

    # backward: ascending ts, right rows sort BEFORE left rows at equal ts
    # (side 0 < 1) so an equal-ts right row is visible — inclusive match.
    # forward: descending ts, same tie order. nearest: BOTH passes over
    # the one unioned frame (two window sorts on the same partition key —
    # one exchange), then pick the closer match per row, backward on an
    # exact distance tie (documented, mirrored by the oracle's
    # ORDER BY abs_gap, ts).
    def _pass(ts_order):
        w = (
            Window.partitionBy(*by)
            .orderBy(ts_order, F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(_PAY, ignorenulls=True).over(w)

    if direction == "nearest":
        matched = unioned.withColumn(
            "_pb", _pass(F.col(_TS).asc())
        ).withColumn("_pf", _pass(F.col(_TS).desc()))
        # EXACT integer-microsecond gaps for the near-side pick: the
        # double-cast form the tolerance check uses rounds each epoch to
        # ~0.4 µs, enough to flip an exact-tie comparison against the
        # oracle's integer epoch_us ordering
        gap_b = F.expr(f"timestampdiff(MICROSECOND, _pb._ts, {_TS})")
        gap_f = F.expr(f"timestampdiff(MICROSECOND, {_TS}, _pf._ts)")
        matched = matched.withColumn(
            _PAY,
            F.when(F.col("_pb").isNull(), F.col("_pf"))
            .when(F.col("_pf").isNull(), F.col("_pb"))
            .when(gap_b <= gap_f, F.col("_pb"))
            .otherwise(F.col("_pf")),
        ).drop("_pb", "_pf")
    else:
        ts_order = (
            F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
        )
        matched = unioned.withColumn(_PAY, _pass(ts_order))
    out = matched.where(F.col(_SIDE) == 1)

    if tolerance_seconds is not None:
        gap = F.abs(
            F.col(_TS).cast("double") - F.col(_PAY)["_ts"].cast("double")
        )
        out = out.withColumn(
            _PAY, F.when(gap <= float(tolerance_seconds), F.col(_PAY))
        )

    pay = F.col(_PAY)
    taken = set(left.columns)
    proj = [F.col(c) for c in left.columns]
    matched_ts_name = right_on if right_on not in taken else right_on + suffix
    proj.append(pay["_ts"].alias(matched_ts_name))
    for c in right_cols:
        name = c if c not in taken else c + suffix
        proj.append(pay[c].alias(name))
    return out.select(*proj)


def asof_join_events(spark, sf_dir):
    """Gate query: for every purchase event, the most recent click by the
    same user at or before the purchase (classic attribution as-of). The
    click side is pre-deduplicated to one row per (user_id, ts) so the
    match is deterministic and the DuckDB ASOF JOIN oracle agrees
    bit-for-bit."""
    e = load_table(spark, "events", sf_dir)
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="ts",
        right_on="ts",
        right_cols=["click_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value_r"),
        F.col("ts_right").alias("click_ts"),
        "click_id",
    )


def asof_forward_events(spark, sf_dir):
    """Gate for the FORWARD direction + tolerance paths (previously
    implemented but never oracle-gated): for every click, the NEXT
    purchase by the same user at-or-after the click, voided when it is
    more than 7 days out (time-to-next-purchase — the conversion-lag
    primitive). Purchases are pre-deduplicated per (user_id, ts) so
    the match is deterministic; the oracle replays the semantics with
    a correlated LATERAL min-pick plus the same 7-day CASE voiding."""
    e = load_table(spark, "events", sf_dir)
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    out = asof_join(
        clicks,
        purchases,
        by=["user_id"],
        left_on="ts",
        right_on="ts",
        right_cols=["purchase_id"],
        direction="forward",
        tolerance_seconds=7 * 86400,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts_right").alias("purchase_ts"),
        "purchase_id",
    )




def asof_nearest_events(spark, sf_dir):
    """Gate for the NEAREST direction: for every click, the purchase by
    the same user closest in time in EITHER direction, voided past a
    3-day tolerance — the sensor-alignment flavor of as-of (pair each
    reading with the closest calibration, whichever side it falls on),
    which neither the backward nor the forward gate exercises. Backward
    wins an exact distance tie (documented in asof_join; the oracle
    mirrors it with ORDER BY abs_gap, ts). Purchases pre-deduplicate
    per (user_id, ts) so the match is deterministic."""
    e = load_table(spark, "events", sf_dir)
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    out = asof_join(
        clicks,
        purchases,
        by=["user_id"],
        left_on="ts",
        right_on="ts",
        right_cols=["purchase_id"],
        direction="nearest",
        tolerance_seconds=3 * 86400,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts_right").alias("purchase_ts"),
        "purchase_id",
    )


ASOF_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "asof_join_events": asof_join_events,
    "asof_forward_events": asof_forward_events,
    "asof_nearest_events": asof_nearest_events,
}

ASOF_ORACLE: dict[str, str] = {
    "asof_join_events":
        "WITH p AS (SELECT event_id, user_id, ts, value FROM events "
        "           WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts, MAX(event_id) click_id FROM events "
        "      WHERE event_type = 'click' GROUP BY user_id, ts) "
        "SELECT p.event_id, p.user_id, ROUND(p.value, 2) value_r, "
        "c.ts click_ts, c.click_id "
        "FROM p ASOF LEFT JOIN c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts",
    "asof_forward_events":
        "WITH c AS (SELECT event_id, user_id, ts FROM events "
        "           WHERE event_type = 'click'), "
        "p AS (SELECT user_id, ts, MAX(event_id) purchase_id FROM events "
        "      WHERE event_type = 'purchase' GROUP BY user_id, ts) "
        "SELECT c.event_id, c.user_id, "
        "CASE WHEN epoch(n.ts) - epoch(c.ts) <= 604800 THEN n.ts END "
        "  AS purchase_ts, "
        "CASE WHEN epoch(n.ts) - epoch(c.ts) <= 604800 THEN n.purchase_id "
        "  END AS purchase_id "
        "FROM c LEFT JOIN LATERAL ("
        "  SELECT p.ts, p.purchase_id FROM p "
        "  WHERE p.user_id = c.user_id AND p.ts >= c.ts "
        "  ORDER BY p.ts LIMIT 1) n ON TRUE",
    "asof_nearest_events":
        "WITH c AS (SELECT event_id, user_id, ts FROM events "
        "           WHERE event_type = 'click'), "
        "p AS (SELECT user_id, ts, MAX(event_id) purchase_id FROM events "
        "      WHERE event_type = 'purchase' GROUP BY user_id, ts) "
        "SELECT c.event_id, c.user_id, "
        "CASE WHEN ABS(epoch(n.ts) - epoch(c.ts)) <= 259200 "
        "  THEN n.ts END AS purchase_ts, "
        "CASE WHEN ABS(epoch(n.ts) - epoch(c.ts)) <= 259200 "
        "  THEN n.purchase_id END AS purchase_id "
        "FROM c LEFT JOIN LATERAL ("
        "  SELECT p.ts, p.purchase_id FROM p "
        "  WHERE p.user_id = c.user_id "
        "  ORDER BY ABS(epoch_us(p.ts) - epoch_us(c.ts)), p.ts LIMIT 1) "
        "n ON TRUE",
}
