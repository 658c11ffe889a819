"""The full relational operator surface (SURVEY §2.2-§2.3, Q01-Q32).

The reference reaches all of this by passing raw SQL to its backing RDBMS
(get-data-table, /root/reference/clsql-data-table.lisp:13-19). Here each
operator is expressed natively with the DataFrame API so Catalyst owns the
physical strategy (broadcast-vs-sort-merge, pushdown, pruning, AQE).

Every builder takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names match its oracle SQL (see ORACLE) exactly — the driver's
correctness gate hash-compares values after sorting columns by name.

Scale posture per query class:
- scans/filters/projections: pushed to parquet (check PushedFilters).
- joins: small dims (region/nation/supplier ≤ O(100) rows/SF) broadcast
  explicitly; fact-fact joins stay sort-merge and shuffle on join keys.
- aggregations: map-side partial agg is automatic; rollup/cube expand rows
  before the shuffle but the grouping-set count is small and bounded.
- windows: partitioned windows shuffle once per partitioning key; the two
  global windows (Q22 ntile, Q23 top-k) are documented single-reducer
  semantics — top-k uses orderBy+limit which Spark executes as a
  per-partition partial top-k + final merge (TakeOrderedAndProject).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleaning import relaxed_double, trim_and_nullify
from ..lineage import truncate_lineage
from ..sources.registry import local_df


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _sorted_array_pairs(col: str):
    """All index pairs (i > j) of a SORTED array column as structs
    (a=ps[j], b=ps[i]) with a < b — the map-side C(n,2) expansion shared
    by the basket pair builders (_copurchase_edges / q79 / q117).
    Callers must guard size >= 2 so sequence(1, n-1) ascends. The lambda
    references only the materialized array attribute, never a
    recomputed expression (the round-13 HOF-recompute trap)."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(col) - 1),
            lambda i: F.transform(
                F.sequence(F.lit(0), i - 1),
                lambda j: F.struct(
                    F.element_at(col, j + 1).alias("a"),
                    F.element_at(col, i + 1).alias("b"),
                ),
            ),
        )
    )


def mi_term_e6(cxy, cx, cy, n):
    """One mutual-information cell term, floored to 1e-6 nats:
    floor(1e6 · (cxy/n) · ln(cxy·n / (cx·cy))) for COUNT-typed columns.

    The count operands are cast to double BEFORE each product (mirroring
    the DuckDB oracle's CAST(cxy AS DOUBLE) * n): a long×long product of
    two counts wraps silently once cx·cy ≥ 2^63 (~3e9 rows — real at
    100 TB); the double product is exact to 2^53 and merely loses ulps
    past it, never wraps. Property-tested at planted 1e10-scale counts
    (tests/test_properties.py) so the overflow class can't recur."""
    return F.floor(
        F.lit(1_000_000)
        * (cxy.cast("double") / n)
        * F.log((cxy.cast("double") * n) / (cx.cast("double") * cy))
    )


def kl_term_e6(cp, c, cgp, cg):
    """One KL-divergence cell term, floored to 1e-6 nats:
    floor(1e6 · (cp/c) · ln(cp·cg / (c·cgp))) for COUNT-typed columns.
    Same operand-first double-cast discipline as mi_term_e6 (q160/q127
    overflow class); property-tested at planted 1e10-scale counts."""
    return F.floor(
        F.lit(1_000_000)
        * (cp.cast("double") / c)
        * F.log((cp.cast("double") * cg) / (c.cast("double") * cgp))
    )


def _floor_div_dec(num, den):
    """Exact floored quotient of two NON-NEGATIVE decimal columns.

    A plain decimal(38,0)/decimal(38,0) division yields decimal(38,6)
    rounded HALF_UP at scale 6 BEFORE any floor/cast reaches it — a true
    fractional part in [0.9999995, 1) rounds UP first and floors one
    higher than an exact ``//`` (the DuckDB-oracle semantics). Subtracting
    the exact modulus first makes the dividend exactly divisible, so the
    division result IS the floored quotient and the scale-6 rounding step
    has nothing to round. Truncation == floor only for non-negative
    quotients — every caller's ratio is a share/lift/Gini (>= 0 by
    construction)."""
    return ((num - num % den) / den).cast("long")


# --------------------------------------------------------------------------
# scan / filter / projection
# --------------------------------------------------------------------------

def q01_scan_project(spark, sf_dir):
    """Parquet scan + projection (column pruning reaches the reader)."""
    return _t(spark, sf_dir, "region").select("r_regionkey", "r_name")


def q02_filter(spark, sf_dir):
    """Comparison predicates; both push down to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


def q03_in_between_like(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").between(1000, 5000)
            & F.col("o_orderpriority").like("1%")
        ).select("o_orderkey")
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------

def q04_inner_join(spark, sf_dir):
    """Fact-dim equi join; customer is small per-SF → leave strategy to
    Catalyst/AQE (broadcasts under threshold, sort-merge above)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "inner")
        .select("c_custkey", "o_orderkey")
    )


def q05_multiway_join(spark, sf_dir):
    """3-way star join; nation(25)/region(5) are broadcast explicitly —
    at 100 TB these dims are still tiny, so the fact table never shuffles."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


def q06_left_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", "o_orderkey")
    )


def q07_full_outer(spark, sf_dir):
    """Full outer of two per-nation aggregates — aggregate BEFORE joining
    so the outer join sees O(nations) rows, not O(customers)."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    a = c.groupBy(F.col("c_nationkey").alias("ak")).agg(F.count("*").alias("c"))
    b = s.groupBy(F.col("s_nationkey").alias("bk")).agg(F.count("*").alias("s"))
    return (
        a.join(b, a.ak == b.bk, "full")
        .select(F.coalesce(a.ak, b.bk).alias("k"), "c", "s")
    )


def q08_semi_join(spark, sf_dir):
    """EXISTS → left_semi: no duplication, no payload columns shuffled."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_semi").select("c_custkey")


def q09_anti_join(spark, sf_dir):
    """NOT EXISTS → left_anti: customers with no URGENT order. (The
    original unfiltered form — customers with no orders at all — is
    EMPTY at every sf in this synthesis, so the gate was matching its
    oracle on zero rows and proving nothing; the priority filter keeps
    the anti-join shape and populates both sides.)"""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o, "c_custkey", "left_anti").select("c_custkey")


def q10_cross_join(spark, sf_dir):
    r1 = _t(spark, sf_dir, "region").select(F.col("r_name").alias("a"))
    r2 = _t(spark, sf_dir, "region").select(F.col("r_name").alias("b"))
    return r1.crossJoin(r2)


def q11_theta_join(spark, sf_dir):
    """Equi key + inequality residual: executes as an equi join on
    l_partkey with the range predicate as a post-join filter — NOT a
    nested-loop; scales like any shuffle join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(
            p,
            (li.l_partkey == p.p_partkey)
            & (li.l_extendedprice > 20 * p.p_retailprice),
        ).select("l_orderkey", "l_linenumber", "p_partkey")
    )


# --------------------------------------------------------------------------
# aggregation
# --------------------------------------------------------------------------

def q12_group_agg(spark, sf_dir):
    """TPC-H Q1 shape: partial agg map-side, 6-group final — the canonical
    'aggregate early' plan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sq"),
        F.round(F.avg("l_extendedprice"), 2).alias("ap"),
        F.count("*").alias("cnt"),
    )


def q13_count_distinct(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("nd")
    )


def q14_having(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= 5)
    )


def q15_rollup(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.rollup("c_mktsegment", "c_nationkey").agg(F.count("*").alias("cnt"))


def q16_cube(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("cnt"))


def q17_approx_count_distinct(spark, sf_dir):
    """HLL++ sketch — constant memory per partition vs exact distinct's
    shuffle; tolerance-checked (±5%) rather than hash-matched."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(F.approx_count_distinct("o_custkey", rsd=0.01).alias("acd"))


# --------------------------------------------------------------------------
# windows
# --------------------------------------------------------------------------

def q18_row_number(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
    )


def q19_rank(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity",
        F.rank().over(w).cast("long").alias("rk"),
        F.dense_rank().over(w).cast("long").alias("drk"),
    )


def q20_lag_lead(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.lag("o_totalprice").over(w).alias("pv"),
        F.lead("o_totalprice").over(w).alias("nx"),
    )


def q21_running_sum(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rs"),
    )


def q22_ntile(spark, sf_dir):
    """Global ntile is inherently single-reducer; acceptable for quartile
    reports, not a 100 TB path — the scale-safe variant is
    operators/scale.ntile_approx (two-pass approx-quantile bucketing,
    map-only after the boundary broadcast, golden+plan tested)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", F.ntile(4).over(w).cast("long").alias("q")
    )


# --------------------------------------------------------------------------
# sort / limit / set ops
# --------------------------------------------------------------------------

def q23_top_k(spark, sf_dir):
    """orderBy+limit compiles to TakeOrderedAndProject: per-partition
    partial top-k then a k-row merge on one task — no global sort."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


def q24_union_all(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionByName(s).groupBy("k").agg(F.count("*").alias("c"))


def q25_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select("c_nationkey")
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("c_nationkey")
    )
    return c.intersect(s)


def q26_except(spark, sf_dir):
    """EXCEPT (set difference with dedup): calendar days on which
    something SHIPPED but nothing was ORDERED — guaranteed non-empty
    because ship dates trail order dates by up to ~4 months. (The
    original nation-key difference was EMPTY at every sf — suppliers
    cover every customer nation — so the gate matched its oracle on
    zero rows.)"""
    ship = _t(spark, sf_dir, "lineitem").select(
        F.to_date("l_shipdate").alias("day")
    )
    ordered = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day")
    )
    return ship.subtract(ordered)


# --------------------------------------------------------------------------
# scalar functions
# --------------------------------------------------------------------------

def q27_strings(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("ub"),
        F.lower("p_type").alias("lt"),
        F.substring("p_name", 1, 5).alias("s5"),
        F.length("p_name").cast("long").alias("ln"),
        F.concat_ws("-", "p_brand", "p_type").alias("cat"),
    )


def q28_trim_nullify(spark, sf_dir):
    """Reference trim-and-nullify semantics (data-table.lisp:48-56) as a
    pure expression over an inline table."""
    df = local_df(
        spark,
        [(1, "  a  "), (2, "   "), (3, "nil"), (4, "NIL"), (5, "b")],
        "id long, x string",
    )
    return df.select(
        F.col("id").cast("long").alias("id"),
        trim_and_nullify(F.col("x")).alias("v"),
    )


def q29_relaxed_parse(spark, sf_dir):
    """Reference relaxed-parse-float (data-table.lisp:74-90): strip
    whitespace/$/,/% then cast double."""
    df = local_df(
        spark,
        [(1, "$1,000.50"), (2, "50%"), (3, " 26.2 "), (4, "1e3")],
        "id long, x string",
    )
    return df.select(
        F.col("id").cast("long").alias("id"),
        relaxed_double(F.col("x")).alias("v"),
    )


def q30_dates(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.date_trunc("month", F.col("o_orderdate")).alias("mt"),
    )


def q31_math(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round("l_extendedprice", 1).alias("r"),
        F.abs(F.col("l_discount") - 0.05).alias("a"),
        F.floor("l_quantity").cast("long").alias("f"),
        F.ceil("l_quantity").cast("long").alias("c"),
        (F.col("l_orderkey") % 7).alias("m"),
    )


def q32_conditionals(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.when(F.col("o_orderkey").isNull(), "none").otherwise("some").alias("has_orders"),
        F.coalesce("o_totalprice", F.lit(0.0)).alias("tp"),
    )


# --------------------------------------------------------------------------
# registry: name → (builder, oracle SQL for DuckDB)
# --------------------------------------------------------------------------

RELATIONAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_scan_project": q01_scan_project,
    "q02_filter": q02_filter,
    "q03_in_between_like": q03_in_between_like,
    "q04_inner_join": q04_inner_join,
    "q05_multiway_join": q05_multiway_join,
    "q06_left_join": q06_left_join,
    "q07_full_outer": q07_full_outer,
    "q08_semi_join": q08_semi_join,
    "q09_anti_join": q09_anti_join,
    "q10_cross_join": q10_cross_join,
    "q11_theta_join": q11_theta_join,
    "q12_group_agg": q12_group_agg,
    "q13_count_distinct": q13_count_distinct,
    "q14_having": q14_having,
    "q15_rollup": q15_rollup,
    "q16_cube": q16_cube,
    "q17_approx_count_distinct": q17_approx_count_distinct,
    "q18_row_number": q18_row_number,
    "q19_rank": q19_rank,
    "q20_lag_lead": q20_lag_lead,
    "q21_running_sum": q21_running_sum,
    "q22_ntile": q22_ntile,
    "q23_top_k": q23_top_k,
    "q24_union_all": q24_union_all,
    "q25_intersect": q25_intersect,
    "q26_except": q26_except,
    "q27_strings": q27_strings,
    "q28_trim_nullify": q28_trim_nullify,
    "q29_relaxed_parse": q29_relaxed_parse,
    "q30_dates": q30_dates,
    "q31_math": q31_math,
    "q32_conditionals": q32_conditionals,
}

RELATIONAL_ORACLE: dict[str, str] = {
    "q01_scan_project":
        "SELECT r_regionkey, r_name FROM region",
    "q02_filter":
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
        "WHERE l_quantity > 30 AND l_returnflag = 'R'",
    "q03_in_between_like":
        "SELECT o_orderkey FROM orders WHERE o_orderstatus IN ('O','F') "
        "AND o_totalprice BETWEEN 1000 AND 5000 AND o_orderpriority LIKE '1%'",
    "q04_inner_join":
        "SELECT c.c_custkey, o.o_orderkey FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey",
    "q05_multiway_join":
        "SELECT c_custkey, n_name, r_name FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey",
    "q06_left_join":
        "SELECT c.c_custkey, o.o_orderkey FROM customer c "
        "LEFT JOIN orders o ON c.c_custkey = o.o_custkey",
    "q07_full_outer":
        "SELECT COALESCE(a.k, b.k) AS k, a.c, b.s FROM "
        "(SELECT c_nationkey k, COUNT(*) c FROM customer GROUP BY c_nationkey) a "
        "FULL JOIN "
        "(SELECT s_nationkey k, COUNT(*) s FROM supplier GROUP BY s_nationkey) b "
        "ON a.k = b.k",
    "q08_semi_join":
        "SELECT c_custkey FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "q09_anti_join":
        "SELECT c_custkey FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderpriority = '1-URGENT')",
    "q10_cross_join":
        "SELECT r1.r_name AS a, r2.r_name AS b FROM region r1 CROSS JOIN region r2",
    "q11_theta_join":
        "SELECT l_orderkey, l_linenumber, p_partkey FROM lineitem "
        "JOIN part ON l_partkey = p_partkey AND l_extendedprice > 20 * p_retailprice",
    "q12_group_agg":
        "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity),2) sq, "
        "ROUND(AVG(l_extendedprice),2) ap, COUNT(*) cnt "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "q13_count_distinct":
        "SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) nd FROM customer "
        "GROUP BY c_mktsegment",
    "q14_having":
        "SELECT o_custkey, COUNT(*) cnt FROM orders GROUP BY o_custkey "
        "HAVING COUNT(*) >= 5",
    "q15_rollup":
        "SELECT c_mktsegment, c_nationkey, COUNT(*) cnt FROM customer "
        "GROUP BY ROLLUP(c_mktsegment, c_nationkey)",
    "q16_cube":
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) cnt FROM orders "
        "GROUP BY CUBE(o_orderstatus, o_orderpriority)",
    # q17 intentionally has no oracle: approx sketch (rows-only check;
    # tolerance asserted in tests/test_relational.py instead)
    "q18_row_number":
        "SELECT o_custkey, o_orderkey, CAST(ROW_NUMBER() OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) rn "
        "FROM orders",
    "q19_rank":
        "SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity, "
        "CAST(RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS BIGINT) rk, "
        "CAST(DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS BIGINT) drk "
        "FROM lineitem",
    "q20_lag_lead":
        "SELECT o_custkey, o_orderkey, "
        "LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) pv, "
        "LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) nx "
        "FROM orders",
    "q21_running_sum":
        "SELECT o_custkey, o_orderkey, "
        "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) rs "
        "FROM orders",
    "q22_ntile":
        "SELECT o_orderkey, CAST(NTILE(4) OVER "
        "(ORDER BY o_totalprice, o_orderkey) AS BIGINT) q FROM orders",
    "q23_top_k":
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q24_union_all":
        "SELECT k, COUNT(*) c FROM ("
        "SELECT c_nationkey k FROM customer UNION ALL "
        "SELECT s_nationkey k FROM supplier) t GROUP BY k",
    "q25_intersect":
        "SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier",
    "q26_except":
        "SELECT CAST(l_shipdate AS DATE) AS day FROM lineitem "
        "EXCEPT SELECT CAST(o_orderdate AS DATE) FROM orders",
    "q27_strings":
        "SELECT p_partkey, UPPER(p_brand) ub, LOWER(p_type) lt, "
        "SUBSTR(p_name,1,5) s5, CAST(LENGTH(p_name) AS BIGINT) ln, "
        "p_brand || '-' || p_type cat FROM part",
    "q28_trim_nullify":
        "SELECT CAST(id AS BIGINT) id, CASE WHEN LOWER(TRIM(x)) IN ('', 'nil') "
        "THEN NULL ELSE TRIM(x) END v "
        "FROM (VALUES (1,'  a  '), (2,'   '), (3,'nil'), (4,'NIL'), (5,'b')) t(id,x)",
    "q29_relaxed_parse":
        "SELECT CAST(id AS BIGINT) id, "
        "TRY_CAST(REGEXP_REPLACE(x, '[\\s$,%]', '', 'g') AS DOUBLE) v "
        "FROM (VALUES (1,'$1,000.50'), (2,'50%'), (3,' 26.2 '), (4,'1e3')) t(id,x)",
    "q30_dates":
        "SELECT o_orderkey, CAST(YEAR(o_orderdate) AS BIGINT) y, "
        "CAST(MONTH(o_orderdate) AS BIGINT) m, "
        "CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) mt FROM orders",
    "q31_math":
        "SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice,1) r, "
        "ABS(l_discount-0.05) a, CAST(FLOOR(l_quantity) AS BIGINT) f, "
        "CAST(CEIL(l_quantity) AS BIGINT) c, l_orderkey % 7 m FROM lineitem",
    "q32_conditionals":
        "SELECT c.c_custkey, "
        "CASE WHEN o.o_orderkey IS NULL THEN 'none' ELSE 'some' END has_orders, "
        "COALESCE(o.o_totalprice, 0.0) tp "
        "FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey",
}


# --------------------------------------------------------------------------
# extended coverage: events windowing, sessionization, pivot, scalar breadth
# --------------------------------------------------------------------------

def q33_events_tumbling(spark, sf_dir):
    """Batch form of streaming S1: 5-minute tumbling buckets over events
    (epoch-floor buckets so the oracle is engine-neutral)."""
    from ..sources.registry import load_table

    e = load_table(spark, "events", sf_dir)
    bucket = F.floor(F.unix_timestamp("ts") / 300).cast("long")
    return e.groupBy(bucket.alias("bucket"), "event_type").agg(
        F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value")
    )


def q34_sessionization(spark, sf_dir):
    """Batch sessionization (gaps-and-islands): a session breaks after a
    30-minute silence per user. One window pass for lag, one running sum
    for session ids, one agg — all shuffles on user_id."""
    from ..sources.registry import load_table

    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > 1800, 1
    ).otherwise(0)
    sess = e.select(
        "user_id", "ts", "event_id",
        F.sum(gap).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def q35_pivot(spark, sf_dir):
    """Pivot l_returnflag values into columns (oracle spells it as
    conditional aggregation — the portable form of PIVOT)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_linestatus",
            F.col("A").alias("qty_a"),
            F.col("N").alias("qty_n"),
            F.col("R").alias("qty_r"),
        )
    )


def q36_string_breadth(spark, sf_dir):
    """Wider scalar-string coverage: pad/replace/position/initcap-adjacent."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.rpad("p_brand", 12, "-").alias("rp"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("rep"),
        F.instr(F.col("p_name"), "a").cast("long").alias("pos_a"),
        F.reverse(F.col("p_brand")).alias("rev"),
        F.left(F.col("p_type"), F.lit(3)).alias("l3"),
        F.right(F.col("p_type"), F.lit(3)).alias("r3"),
    )


def q37_date_breadth(spark, sf_dir):
    """Date arithmetic: diffs, offsets, truncation, parts, last_day."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("1998-01-01").cast("date"), d).cast("long").alias("dd"),
        F.date_add(d, 30).alias("plus30"),
        F.last_day(d).alias("eom"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.quarter(d).cast("long").alias("qtr"),
    )


def q38_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (beyond rollup/cube): totals by status, by
    priority, and grand total — via SQL (the DataFrame API spells it
    rollup/cube only)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q39_string_agg(spark, sf_dir):
    """Ordered string aggregation: deterministic via sorted collect."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


def q40_conditional_agg(spark, sf_dir):
    """FILTER-style conditional aggregation + least/greatest."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
        F.count(F.when(F.col("l_discount") == 0, 1)).alias("n_nodisc"),
        F.round(
            F.sum(F.least(F.col("l_quantity"), F.lit(10.0))), 2
        ).alias("capped_qty"),
    )


RELATIONAL_QUERIES.update(
    {
        "q33_events_tumbling": q33_events_tumbling,
        "q34_sessionization": q34_sessionization,
        "q35_pivot": q35_pivot,
        "q36_string_breadth": q36_string_breadth,
        "q37_date_breadth": q37_date_breadth,
        "q38_grouping_sets": q38_grouping_sets,
        "q39_string_agg": q39_string_agg,
        "q40_conditional_agg": q40_conditional_agg,
    }
)

RELATIONAL_ORACLE.update(
    {
        "q33_events_tumbling":
            "SELECT CAST(FLOOR(epoch(ts)/300) AS BIGINT) bucket, event_type, "
            "COUNT(*)::BIGINT cnt, ROUND(SUM(value), 2) sum_value "
            "FROM events GROUP BY 1, 2",
        "q34_sessionization":
            "WITH lagged AS ("
            "  SELECT user_id, ts, event_id, "
            "  CASE WHEN FLOOR(epoch(ts))::BIGINT - FLOOR(epoch(LAG(ts) OVER "
            "    (PARTITION BY user_id ORDER BY ts, event_id)))::BIGINT > 1800 "
            "  THEN 1 ELSE 0 END brk FROM events"
            "), sess AS ("
            "  SELECT user_id, ts, "
            "  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) session_id "
            "  FROM lagged) "
            "SELECT user_id, session_id, COUNT(*)::BIGINT n_events, "
            "CAST(MIN(ts) AS TIMESTAMP) session_start, "
            "CAST(MAX(ts) AS TIMESTAMP) session_end "
            "FROM sess GROUP BY user_id, session_id",
        "q35_pivot":
            "SELECT l_linestatus, "
            "ROUND(SUM(CASE WHEN l_returnflag='A' THEN l_quantity END), 2) qty_a, "
            "ROUND(SUM(CASE WHEN l_returnflag='N' THEN l_quantity END), 2) qty_n, "
            "ROUND(SUM(CASE WHEN l_returnflag='R' THEN l_quantity END), 2) qty_r "
            "FROM lineitem GROUP BY l_linestatus",
        "q36_string_breadth":
            "SELECT p_partkey, lpad(p_brand, 12, '*') lp, rpad(p_brand, 12, '-') rp, "
            "replace(p_type, ' ', '_') rep, "
            "CAST(strpos(p_name, 'a') AS BIGINT) pos_a, reverse(p_brand) rev, "
            "left(p_type, 3) l3, right(p_type, 3) r3 FROM part",
        "q37_date_breadth":
            "SELECT o_orderkey, "
            "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) dd, "
            "CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) plus30, "
            "last_day(CAST(o_orderdate AS DATE)) eom, "
            "CAST(day(o_orderdate) AS BIGINT) dom, "
            "CAST(dayofweek(o_orderdate) + 1 AS BIGINT) dow, "  # DuckDB Sun=0; Spark Sun=1
            "CAST(quarter(o_orderdate) AS BIGINT) qtr "
            "FROM orders",
        "q38_grouping_sets":
            "SELECT o_orderstatus, o_orderpriority, COUNT(*) cnt FROM orders "
            "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())",
        "q39_string_agg":
            "SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) nations "
            "FROM nation GROUP BY n_regionkey",
        "q40_conditional_agg":
            "SELECT l_returnflag, "
            "COUNT(*) FILTER (WHERE l_quantity > 25)::BIGINT n_big, "
            "COUNT(*) FILTER (WHERE l_discount = 0)::BIGINT n_nodisc, "
            "ROUND(SUM(LEAST(l_quantity, 10.0)), 2) capped_qty "
            "FROM lineitem GROUP BY l_returnflag",
    }
)


def q41_percentiles(spark, sf_dir):
    """Exact percentiles per group (linear interpolation — both engines
    interpolate identically on doubles; 6dp rounding absorbs ulp noise)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q25"),
    )


def q42_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates it into a join
    (no per-row re-execution; check the plan for the rewritten agg+join)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_cs")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_cs")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT COUNT(*) FROM orders_cs o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer_cs c
        """
    )


def q43_range_frame(spark, sf_dir):
    """RANGE window frame: sum of all orders within ±1000.0 of the current
    price, per status — value-based frames, not row-based."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_rf")
    # SQL form: the DataFrame API's rangeBetween only takes integer
    # offsets; RANGE with fractional bounds needs the SQL surface
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(COUNT(*) OVER (
                 PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING
               ) AS BIGINT) AS n_near
        FROM orders_rf
        """
    )


def q44_first_last_value(spark, sf_dir):
    """first_value / last_value / nth_value over a full-partition frame."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.first_value("o_orderkey").over(w).alias("first_ok"),
        F.last_value("o_orderkey").over(w).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )


def q45_case_insensitive_and_regex(spark, sf_dir):
    """regexp_extract / regexp_count / case-insensitive match — the
    regex scalar family."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("first_word"),
        F.regexp_count("p_name", F.lit("a")).cast("long").alias("n_a"),
        F.col("p_brand").rlike("(?i)brand#1").cast("int").cast("long").alias("is_b1"),
    )


RELATIONAL_QUERIES.update(
    {
        "q41_percentiles": q41_percentiles,
        "q42_correlated_subquery": q42_correlated_subquery,
        "q43_range_frame": q43_range_frame,
        "q44_first_last_value": q44_first_last_value,
        "q45_regex_scalars": q45_case_insensitive_and_regex,
    }
)

RELATIONAL_ORACLE.update(
    {
        "q41_percentiles":
            "SELECT l_returnflag, "
            "ROUND(quantile_cont(l_extendedprice, 0.5), 6) p50, "
            "ROUND(quantile_cont(l_extendedprice, 0.9), 6) p90, "
            "ROUND(quantile_cont(l_quantity, 0.25), 6) q25 "
            "FROM lineitem GROUP BY l_returnflag",
        "q42_correlated_subquery":
            "SELECT c_custkey, "
            "(SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) n_orders "
            "FROM customer c",
        "q43_range_frame":
            "SELECT o_orderkey, CAST(COUNT(*) OVER ("
            "PARTITION BY o_orderstatus ORDER BY o_totalprice "
            "RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS BIGINT) n_near "
            "FROM orders",
        "q44_first_last_value":
            "SELECT o_custkey, o_orderkey, "
            "FIRST_VALUE(o_orderkey) OVER w first_ok, "
            "LAST_VALUE(o_orderkey) OVER w last_ok, "
            "NTH_VALUE(o_orderkey, 2) OVER w second_ok "
            "FROM orders WINDOW w AS (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
        "q45_regex_scalars":
            "SELECT p_partkey, regexp_extract(p_type, '^(\\w+)', 1) first_word, "
            "CAST(len(regexp_extract_all(p_name, 'a')) AS BIGINT) n_a, "
            "CAST(CASE WHEN regexp_matches(p_brand, '(?i)brand#1') THEN 1 ELSE 0 END AS BIGINT) is_b1 "
            "FROM part",
    }
)


def q46_array_ops(spark, sf_dir):
    """G4: array build / join / element access — the reference's list-cell
    → ", "-joined-string semantics (data-table.lisp:448-451) as native
    array columns."""
    n = _t(spark, sf_dir, "nation")
    arr = F.array("n_name", F.upper("n_name"))
    return n.select(
        "n_nationkey",
        F.concat_ws(", ", arr).alias("joined"),
        F.element_at(arr, 1).alias("first_el"),
        F.size(arr).cast("long").alias("n_el"),
        F.array_contains(arr, F.upper("n_name")).alias("has_upper"),
    )


RELATIONAL_QUERIES["q46_array_ops"] = q46_array_ops
RELATIONAL_ORACLE["q46_array_ops"] = (
    "SELECT n_nationkey, "
    "array_to_string([n_name, upper(n_name)], ', ') joined, "
    "[n_name, upper(n_name)][1] first_el, "
    "CAST(len([n_name, upper(n_name)]) AS BIGINT) n_el, "
    "list_contains([n_name, upper(n_name)], upper(n_name)) has_upper "
    "FROM nation"
)


def q47_tpch_q3_shape(spark, sf_dir):
    """Composite showcase (TPC-H Q3 shape): selective filters pushed to
    both scans, fact-fact join, aggregation, top-k — Catalyst orders the
    joins, AQE resizes the shuffle."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q48_tpch_q5_shape(spark, sf_dir):
    """Composite showcase (TPC-H Q5 shape): 5-way star join with broadcast
    dims + grouped revenue per nation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


RELATIONAL_QUERIES["q47_tpch_q3_shape"] = q47_tpch_q3_shape
RELATIONAL_QUERIES["q48_tpch_q5_shape"] = q48_tpch_q5_shape
RELATIONAL_ORACLE["q47_tpch_q3_shape"] = (
    "SELECT l_orderkey, o_orderdate, "
    "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) revenue "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "WHERE c_mktsegment = 'BUILDING' "
    "GROUP BY l_orderkey, o_orderdate "
    "ORDER BY revenue DESC, l_orderkey LIMIT 10"
)
RELATIONAL_ORACLE["q48_tpch_q5_shape"] = (
    "SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) revenue, "
    "COUNT(*)::BIGINT n_items "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "GROUP BY n_name"
)


def q49_json_extract(spark, sf_dir):
    """JSON scalar family: typed extraction from the events.props JSON
    strings via a single ``from_json`` parse. The parse-once guarantee is
    STRUCTURAL: the first select materializes `k`, the second aliases the
    column, and CollapseProject declines to merge them because from_json
    is non-cheap — the optimized plan carries exactly one from_json (plan
    test asserts it). Relying on runtime subexpression elimination instead
    is fragile here: JsonToStructs is CodegenFallback, so this Project runs
    interpreted, and an interpreted dual parse Jackson-allocates per row —
    the likely amplifier behind the round-3 driver-context outlier (15.6 s
    vs 0.35 s local for the dual-parse form). The path-string form
    (``get_json_object``) is asserted equal in
    tests/test_relational.py::test_json_extract_paths_agree."""
    from ..sources.registry import load_table

    e = load_table(spark, "events", sf_dir)
    return (
        e.select(
            "event_id",
            F.from_json(F.col("props"), "k BIGINT")["k"].alias("k"),
        )
        .select("event_id", "k", F.col("k").alias("k_typed"))
    )


RELATIONAL_QUERIES["q49_json_extract"] = q49_json_extract
RELATIONAL_ORACLE["q49_json_extract"] = (
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) k, "
    "CAST(json_extract_string(props, '$.k') AS BIGINT) k_typed FROM events"
)


def q50_right_join(spark, sf_dir):
    """RIGHT OUTER join (mirror of q06): the reference reaches RIGHT JOIN
    through its SQL pass-through (get-data-table,
    /root/reference/clsql-data-table.lisp:13-19). Catalyst plans right outer
    exactly like left outer with sides swapped; customers without orders
    survive with NULL o_orderkey."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .select("c_custkey", "o_orderkey")
    )


def q51_union_distinct(spark, sf_dir):
    """UNION (distinct) — union() is bag concat, distinct() dedupes; Spark
    plans this as a single hash aggregate over the concatenated scans (no
    extra shuffle vs UNION ALL + GROUP BY)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct()


def q52_except_all(spark, sf_dir):
    """EXCEPT ALL — multiset difference keeps duplicate cardinality
    (customer has ~60 rows per nationkey, supplier ~4; the result keeps the
    surplus copies, unlike q26's set-semantics EXCEPT)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.exceptAll(s)


def q53_intersect_all(spark, sf_dir):
    """INTERSECT ALL — multiset intersection (min of per-side
    multiplicities per key)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersectAll(s)


RELATIONAL_QUERIES["q50_right_join"] = q50_right_join
RELATIONAL_QUERIES["q51_union_distinct"] = q51_union_distinct
RELATIONAL_QUERIES["q52_except_all"] = q52_except_all
RELATIONAL_QUERIES["q53_intersect_all"] = q53_intersect_all
RELATIONAL_ORACLE["q50_right_join"] = (
    "SELECT c_custkey, o_orderkey FROM orders "
    "RIGHT JOIN customer ON o_custkey = c_custkey"
)
RELATIONAL_ORACLE["q51_union_distinct"] = (
    "SELECT c_nationkey k FROM customer UNION SELECT s_nationkey k FROM supplier"
)
RELATIONAL_ORACLE["q52_except_all"] = (
    "SELECT c_nationkey k FROM customer EXCEPT ALL "
    "SELECT s_nationkey k FROM supplier"
)
RELATIONAL_ORACLE["q53_intersect_all"] = (
    "SELECT c_nationkey k FROM customer INTERSECT ALL "
    "SELECT s_nationkey k FROM supplier"
)


def q54_unpivot(spark, sf_dir):
    """UNPIVOT/melt — the inverse of q35's pivot: wide per-part pricing
    columns back to (part, metric, value) long form. Spark's unpivot is a
    zero-shuffle generate (each input row fans out to len(metrics) rows
    map-side)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_retailprice").alias("retail"),
        (F.col("p_retailprice") * 0.9).alias("discounted"),
    ).unpivot(
        ids=["p_partkey"],
        values=["retail", "discounted"],
        variableColumnName="metric",
        valueColumnName="price_raw",
    ).select(
        "p_partkey", "metric", F.round("price_raw", 2).alias("price")
    )


RELATIONAL_QUERIES["q54_unpivot"] = q54_unpivot
RELATIONAL_ORACLE["q54_unpivot"] = (
    "SELECT p_partkey, metric, ROUND(price_raw, 2) AS price FROM ("
    "  SELECT p_partkey, p_retailprice AS retail, "
    "         p_retailprice * 0.9 AS discounted FROM part"
    ") UNPIVOT (price_raw FOR metric IN (retail, discounted))"
)


def q55_time_rollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate shape: one pass computes the
    events rollup at BOTH hour and day granularity via GROUPING SETS over
    date_trunc buckets (one shuffle; each input row expands to its two
    grouping sets map-side — how a timeseries store backfills multi-level
    rollups without rescanning per level)."""
    from ..sources.registry import load_table

    load_table(spark, "events", sf_dir).createOrReplaceTempView("events_tr")
    return spark.sql(
        """
        SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'day' END AS grain,
               COALESCE(h, d) AS bucket,
               COUNT(*) AS cnt,
               ROUND(SUM(value), 2) AS sum_value
        FROM (SELECT date_trunc('hour', ts) h, date_trunc('day', ts) d, value
              FROM events_tr)
        GROUP BY GROUPING SETS ((d, h), (d))
        """
    )


RELATIONAL_QUERIES["q55_time_rollup"] = q55_time_rollup
RELATIONAL_ORACLE["q55_time_rollup"] = (
    # DuckDB date_trunc('day') yields DATE — cast both buckets to TIMESTAMP
    "SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'day' END AS grain, "
    "COALESCE(h, d) AS bucket, COUNT(*)::BIGINT AS cnt, "
    "ROUND(SUM(value), 2) AS sum_value FROM ("
    "  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) h, "
    "         CAST(date_trunc('day', ts) AS TIMESTAMP) d, value FROM events"
    ") GROUP BY GROUPING SETS ((d, h), (d))"
)


def q56_map_entries(spark, sf_dir):
    """MAP-typed column surface: parse props into map<string,string>,
    explode to (key, value) entry rows — from_json + explode are both
    map-side generates, no shuffle."""
    from ..sources.registry import load_table

    e = load_table(spark, "events", sf_dir)
    m = F.from_json(F.col("props"), "map<string,string>")
    return e.select("event_id", F.explode(m).alias("key", "value")).orderBy(
        "event_id", "key"
    )


RELATIONAL_QUERIES["q56_map_entries"] = q56_map_entries
RELATIONAL_ORACLE["q56_map_entries"] = (
    # the fixture's props objects all have the single key 'k'
    # (json_structure is uniform); DuckDB has no json_each, so the oracle
    # extracts that key directly
    "SELECT event_id, 'k' AS key, json_extract_string(props, '$.k') AS value "
    "FROM events"
)


def q57_rank_ratios(spark, sf_dir):
    """percent_rank / cume_dist — relative-position window functions
    (the remaining rank family members beyond q19/q22)."""
    o = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


RELATIONAL_QUERIES["q57_rank_ratios"] = q57_rank_ratios
RELATIONAL_ORACLE["q57_rank_ratios"] = (
    "SELECT o_orderkey, o_orderstatus, "
    "ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderstatus "
    "ORDER BY o_totalprice, o_orderkey), 6) pr, "
    "ROUND(CUME_DIST() OVER (PARTITION BY o_orderstatus "
    "ORDER BY o_totalprice, o_orderkey), 6) cd "
    "FROM orders"
)


def q58_tpch_q10_shape(spark, sf_dir):
    """TPC-H Q10 shape: revenue from returned items per customer, top 20.
    Two-join star with the filter pushed below both joins and the
    aggregate before the top-k (TakeOrderedAndProject)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name")
        # floor-truncate: a sum of price*(1-disc) products lands on the
        # ROUND half-up boundary often enough to flap between engines
        .agg((F.floor(rev * 100) / 100).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


RELATIONAL_QUERIES["q58_tpch_q10_shape"] = q58_tpch_q10_shape
RELATIONAL_ORACLE["q58_tpch_q10_shape"] = (
    "SELECT c_custkey, c_name, "
    "FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100) / 100 AS revenue "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE l_returnflag = 'R' "
    "GROUP BY c_custkey, c_name "
    "ORDER BY revenue DESC, c_custkey LIMIT 20"
)


def q59_latest_per_key(spark, sf_dir):
    """Latest-record-per-key compaction (the CDC/upsert-log dedup every
    warehouse ingest runs): keep each customer's most recent order.

    row_number over (key, recency desc) then rank=1 — at scale this is
    ONE shuffle on the key; Spark pushes the rank-1 predicate into the
    window sort as a per-partition top-1 (WindowGroupLimit), so the
    shuffle carries the full input but state per key is O(1), never the
    group. The tie-break on o_orderkey makes the survivor deterministic
    for same-timestamp updates — an upsert log without a total order is
    a correctness bug, not a perf knob."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


RELATIONAL_QUERIES["q59_latest_per_key"] = q59_latest_per_key
RELATIONAL_ORACLE["q59_latest_per_key"] = (
    "SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM ("
    "  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, "
    "  ROW_NUMBER() OVER (PARTITION BY o_custkey "
    "  ORDER BY o_orderdate DESC, o_orderkey DESC) rn FROM orders"
    ") WHERE rn = 1"
)


def q60_variant_extract(spark, sf_dir):
    """Semi-structured extraction via Spark 4's VARIANT type: parse the
    events.props JSON once into a variant, then pull typed fields with
    try_variant_get. This is the 100 TB JSON path — variant stores a
    parsed binary form, so repeated field access never re-parses the
    text (vs from_json/get_json_object which are per-expression text
    parses), and Parquet variant shredding lets the scan prune to the
    accessed fields. Same parse-once structure as q49: the variant is
    materialized in the first select so CollapseProject cannot duplicate
    the parse into each extraction. try_parse_json (not parse_json) so a
    malformed props row degrades to NULL exactly like the oracle's
    TRY_CAST path instead of failing the whole job."""
    from ..sources.registry import load_table

    e = load_table(spark, "events", sf_dir)
    return (
        e.select("event_id", F.try_parse_json(F.col("props")).alias("v"))
        .select(
            "event_id",
            F.try_variant_get(F.col("v"), "$.k", "bigint").alias("k"),
            F.try_variant_get(F.col("v"), "$.k", "string").alias("k_str"),
        )
    )


RELATIONAL_QUERIES["q60_variant_extract"] = q60_variant_extract
RELATIONAL_ORACLE["q60_variant_extract"] = (
    "SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) k, "
    "json_extract_string(props, '$.k') AS k_str FROM events"
)


def interval_join_bucketed(
    events, intervals, ts_col="ts", start_col="w_start", end_col="w_end"
):
    """Big-big interval-overlap join via day bucketing: each interval is
    exploded into the day buckets it spans, events bucket to their day,
    and the join is an EQUI join on the bucket with the exact range
    predicate as residual. This is the shape that survives two large
    sides — a raw ts-between join plans as a nested-loop cross product
    (O(|E|·|I|)), while bucketing costs one shuffle on the day key and
    each event meets only the intervals sharing its day. Buckets are
    dates, so the explode factor is interval-length-in-days (bounded);
    skewed days are AQE-split. Tiny interval sides short-circuit: when
    the interval table fits the broadcast threshold Catalyst broadcasts
    the exploded side and no shuffle happens at all."""
    # degenerate intervals (end <= start) must produce ZERO buckets —
    # without the guard, sequence() auto-selects step -1 when start >
    # stop and counts DOWN across the whole inverted span, joining (and
    # then discarding) every event on those days (review finding)
    iv = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "_day",
        F.explode(
            F.sequence(
                F.to_date(F.col(start_col)),
                # end is exclusive; an interval ending at midnight must
                # not claim the next day's bucket. Back off one
                # MICROSECOND (Spark timestamp precision) — a 1-second
                # backoff would drop the last day of any interval ending
                # within the first second past midnight (review finding)
                F.to_date(F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND")),
            )
        ),
    )
    ev = events.withColumn("_day", F.to_date(F.col(ts_col)))
    return (
        ev.join(iv, "_day")
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_day")
    )


def q61_interval_join(spark, sf_dir):
    """Interval-overlap join gate: ten 3-day campaign windows over the
    events span (w_id k = [2024-01-01 + 3k days, +3 days)), each event
    attributed to its window, aggregated per window. Uses the bucketed
    big-big path (interval_join_bucketed) even though this interval side
    is broadcast-sized — the plan is the one that scales; a plan test
    asserts no nested-loop join survives."""
    from ..sources.registry import load_table

    e = load_table(spark, "events", sf_dir)
    iv = spark.range(10).select(
        F.col("id").alias("w_id"),
        (F.to_timestamp(F.lit("2024-01-01"))
         + F.col("id").cast("int") * F.expr("INTERVAL 3 DAYS")).alias("w_start"),
        (F.to_timestamp(F.lit("2024-01-01"))
         + (F.col("id").cast("int") + 1) * F.expr("INTERVAL 3 DAYS")).alias("w_end"),
    )
    return (
        interval_join_bucketed(e, iv)
        .groupBy("w_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


RELATIONAL_QUERIES["q61_interval_join"] = q61_interval_join
RELATIONAL_ORACLE["q61_interval_join"] = (
    "WITH iv AS ("
    "  SELECT g.range AS w_id, "
    "  TIMESTAMP '2024-01-01' + INTERVAL (g.range * 3) DAY AS w_start, "
    "  TIMESTAMP '2024-01-01' + INTERVAL ((g.range + 1) * 3) DAY AS w_end "
    "  FROM range(10) g"
    ") "
    "SELECT w_id, COUNT(*)::BIGINT n_events, "
    "COUNT(DISTINCT user_id)::BIGINT n_users, "
    "ROUND(SUM(value), 2) total_value "
    "FROM events JOIN iv ON ts >= w_start AND ts < w_end "
    "GROUP BY w_id"
)


def q62_tpch_q7_shape(spark, sf_dir):
    """TPC-H Q7 (volume shipping) shape: bilateral revenue between two
    nations by ship year. Six-table star with TWO roles for nation —
    supplier-side and customer-side — so the dim broadcasts twice under
    different aliases; the only real shuffle is the final (nation,
    nation, year) aggregate, whose cardinality is tiny. The symmetric
    nation-pair predicate prunes before the aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


RELATIONAL_QUERIES["q62_tpch_q7_shape"] = q62_tpch_q7_shape
RELATIONAL_ORACLE["q62_tpch_q7_shape"] = (
    "SELECT n1.n_name supp_nation, n2.n_name cust_nation, "
    "YEAR(l_shipdate)::BIGINT l_year, "
    "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) revenue, "
    "COUNT(*)::BIGINT n_items "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
    "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
    "WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
    "   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1') "
    "GROUP BY 1, 2, 3"
)


def q63_funnel(spark, sf_dir):
    """Ordered conversion funnel over the event stream: signup → first
    click AFTER signup → first purchase AFTER that click, per user, then
    stage-level distinct-user counts. The ordering constraint is what
    makes this a funnel rather than three independent filters — each
    stage's candidate events are bounded by the previous stage's
    timestamp via an equi-join on user_id with the time bound as
    residual. Scale: every shuffle keys on user_id (the natural
    co-partitioning key for event analytics); stage outputs are
    one-row-per-user aggregates, monotonically shrinking."""
    from ..sources.registry import load_table

    e = load_table(spark, "events", sf_dir)
    s1 = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    return (
        s1.select(F.lit("1_signup").alias("stage"), "user_id")
        .unionByName(s2.select(F.lit("2_click").alias("stage"), "user_id"))
        .unionByName(s3.select(F.lit("3_purchase").alias("stage"), "user_id"))
        .groupBy("stage")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def q64_retention_cohorts(spark, sf_dir):
    """Day-cohort retention triangle: users grouped by first-seen day,
    activity counted per day offset from that cohort day — the standard
    growth-analytics rollup. Two shuffles: first-seen per user (user_id
    key), then the (cohort_day, offset) count whose cardinality is
    days². The first-seen aggregate is broadcast back onto the event
    stream when it fits (cohort tables are users-sized, tiny next to
    events at 100 TB — but broadcastability is data-dependent, so the
    join is left unhinted for AQE to decide)."""
    from ..sources.registry import load_table

    e = load_table(spark, "events", sf_dir).select(
        "user_id", F.to_date("ts").alias("day")
    )
    first_seen = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(first_seen, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("bigint").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


RELATIONAL_QUERIES["q63_funnel"] = q63_funnel
RELATIONAL_QUERIES["q64_retention_cohorts"] = q64_retention_cohorts
RELATIONAL_ORACLE["q63_funnel"] = (
    "WITH s1 AS ("
    "  SELECT user_id, MIN(ts) t1 FROM events "
    "  WHERE event_type = 'signup' GROUP BY user_id"
    "), s2 AS ("
    "  SELECT e.user_id, MIN(e.ts) t2 FROM events e "
    "  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1 "
    "  WHERE e.event_type = 'click' GROUP BY e.user_id"
    "), s3 AS ("
    "  SELECT e.user_id, MIN(e.ts) t3 FROM events e "
    "  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2 "
    "  WHERE e.event_type = 'purchase' GROUP BY e.user_id"
    ") "
    "SELECT stage, COUNT(DISTINCT user_id)::BIGINT n_users FROM ("
    "  SELECT '1_signup' stage, user_id FROM s1 "
    "  UNION ALL SELECT '2_click', user_id FROM s2 "
    "  UNION ALL SELECT '3_purchase', user_id FROM s3"
    ") GROUP BY stage"
)
RELATIONAL_ORACLE["q64_retention_cohorts"] = (
    "WITH d AS (SELECT user_id, CAST(ts AS DATE) AS dd FROM events), "
    "fs AS (SELECT user_id, MIN(dd) cohort_day FROM d GROUP BY user_id) "
    "SELECT fs.cohort_day, (d.dd - fs.cohort_day)::BIGINT day_offset, "
    "COUNT(DISTINCT d.user_id)::BIGINT n_active "
    "FROM d JOIN fs ON d.user_id = fs.user_id "
    "GROUP BY 1, 2"
)


#: minimum total quantity for the Q18 "large volume" cut (≈ p99 of
#: per-order quantity sums at every testdata sf)
Q18_MIN_QTY = 250


def q65_tpch_q18_shape(spark, sf_dir):
    """TPC-H Q18 (large-volume customer) shape: orders whose total line
    quantity exceeds Q18_MIN_QTY, joined back to customer detail, top-20
    by price. The spec's HAVING subquery + regrouping COLLAPSES here:
    each (customer, order) group is exactly one order, so the per-order
    aggregate IS the group's sum — join the filtered aggregate straight
    to orders/customer instead of semi-joining raw lineitem and
    re-aggregating (one lineitem scan and one aggregation instead of
    two of each; measured 15.7 s → 12.4 s at 100× facts, identical
    result). Top-20 compiles to TakeOrderedAndProject (no global
    sort)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > Q18_MIN_QTY)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", F.round("sq", 2).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


RELATIONAL_QUERIES["q65_tpch_q18_shape"] = q65_tpch_q18_shape
RELATIONAL_ORACLE["q65_tpch_q18_shape"] = (
    "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, "
    "ROUND(SUM(l_quantity), 2) sum_qty "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "WHERE l_orderkey IN ("
    f"  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > {Q18_MIN_QTY}"
    ") "
    "GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"
)


# --------------------------------------------------------------------------
# round 5: EXISTS/NOT-EXISTS decorrelation, correlated-min, MERGE upsert,
# runtime filter, SCD2 intervals
# --------------------------------------------------------------------------

def q66_tpch_q21_shape(spark, sf_dir):
    """TPC-H Q21 (waiting-supplier) shape adapted to this schema: for
    finalized orders, suppliers whose line was returned ('R') while at
    least one OTHER supplier shipped the order (EXISTS) and NO other
    supplier's line was returned (NOT EXISTS).

    The correlated EXISTS / NOT EXISTS pair (inequality predicate
    ``l2.l_suppkey <> l1.l_suppkey``) would plan as two extra joins; it
    is decorrelated into ONE auxiliary aggregate over lineitem:
    ``EXISTS other-supplier``       <=> n_supp >= 2
    ``NOT EXISTS other-R-supplier`` <=> n_r_supp == 1 (l1's own 'R' line
    puts its supplier in the set, so "no other" means exactly one).
    The aggregation-based decorrelation Catalyst cannot derive itself
    for inequality correlation. Supplier is a broadcast dim.

    The auxiliary aggregate is TWO-PHASE — distinct (order, supplier)
    pairs with an any-R flag, then per-order counts — instead of two
    countDistincts in one groupBy: multiple distinct aggregates compile
    to an Expand that multiplies every lineitem row before the shuffle,
    and the two-phase form replaces that with a map-side-combining pair
    aggregate (measured 90 s → 53 s at 100× facts, identical result;
    the second shuffle is on the already-collapsed pair set).
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r")
    )
    ord_stats = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_r").alias("n_r_supp"),
    )
    l1 = li.where(F.col("l_returnflag") == "R")
    fo = o.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    return (
        l1.join(fo, l1.l_orderkey == fo.o_orderkey)
        .join(ord_stats, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


RELATIONAL_QUERIES["q66_tpch_q21_shape"] = q66_tpch_q21_shape
RELATIONAL_ORACLE["q66_tpch_q21_shape"] = (
    "SELECT s_name, COUNT(*) AS numwait "
    "FROM supplier, lineitem l1, orders "
    "WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey "
    "  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R' "
    "  AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey "
    "              AND l2.l_suppkey <> l1.l_suppkey) "
    "  AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey "
    "              AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') "
    "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"
)


def q67_tpch_q2_shape(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier) shape: for mid-size parts, the
    supplier(s) achieving the minimum observed unit price
    (l_extendedprice / l_quantity) for that part.

    The correlated scalar subquery ``= (SELECT MIN(...) WHERE
    l2.l_partkey = p_partkey)`` is expressed as a per-part aggregate
    joined back on l_partkey — the same rewrite Catalyst applies to
    equality-correlated scalar subqueries, stated explicitly so both
    lineitem passes shuffle on the one key and co-partition. part and
    supplier are broadcast dims. DISTINCT collapses equal-priced
    duplicate lines from the same supplier. Unit prices are compared
    exactly (both engines evaluate the identical binary64 division and
    order-independent MIN), rounded only for output.
    """
    p = _t(spark, sf_dir, "part").where(F.col("p_size").between(10, 15))
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    unit = li.select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    mn = unit.groupBy("l_partkey").agg(F.min("unit_price").alias("min_price"))
    return (
        unit.join(mn, "l_partkey")
        .where(F.col("unit_price") == F.col("min_price"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey", "p_name", "s_name",
            F.round("unit_price", 4).alias("best_unit_price"),
        )
        .distinct()
    )


RELATIONAL_QUERIES["q67_tpch_q2_shape"] = q67_tpch_q2_shape
RELATIONAL_ORACLE["q67_tpch_q2_shape"] = (
    "SELECT DISTINCT p_partkey, p_name, s_name, "
    "  ROUND(l_extendedprice / l_quantity, 4) AS best_unit_price "
    "FROM part, supplier, lineitem "
    "WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey "
    "  AND p_size BETWEEN 10 AND 15 "
    "  AND l_extendedprice / l_quantity = ("
    "    SELECT MIN(l2.l_extendedprice / l2.l_quantity) FROM lineitem l2 "
    "    WHERE l2.l_partkey = p_partkey)"
)


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    validate_unique: bool = False,
) -> DataFrame:
    """Whole-row MERGE/upsert (SQL ``MERGE WHEN MATCHED THEN UPDATE WHEN
    NOT MATCHED THEN INSERT`` with whole-row sources): rows of ``updates``
    replace key-matching rows of ``base``; the rest of ``base`` survives.

    PRECONDITION: ``updates`` has at most one row per key. SQL MERGE
    raises when several source rows match one target row; here a
    duplicate key would survive into the output as duplicate rows.
    ``validate_unique=True`` enforces the precondition with one extra
    aggregation job over the updates (raises ValueError naming the
    duplicate count) — opt-in because the check costs a full pass at
    100 TB; leave it off when the updates are keyed by construction
    (e.g. the output of a groupBy on the keys).

    The reference's closest surface is re-importing a table over an
    existing one (import-data-table, /root/reference/clsql-data-table.lisp:236-239),
    which is replace-only; this is the incremental form every warehouse
    pipeline needs. Plan: ONE left-anti join of base against the distinct
    update keys (shuffles both sides on the key; broadcastable when
    updates are small) + a union — no window, no driver state. At 100 TB
    pair it with bucketed base tables so the anti join reuses the
    bucketing instead of shuffling the fact.
    """
    if validate_unique:
        dups = (
            updates.groupBy(*keys).count().where(F.col("count") > 1).count()
        )
        if dups:
            raise ValueError(
                f"merge_upsert: {dups} update key(s) have multiple rows "
                "(SQL MERGE cardinality violation)"
            )
    anti = base.join(
        updates.select(*keys).distinct(), list(keys), "left_anti"
    )
    return anti.unionByName(updates.select(*base.columns))


def q68_merge_upsert(spark, sf_dir):
    """MERGE gate: base = orders outside every 3rd key; updates = every
    even key re-priced 2x and flagged 'U'. Exercises both MERGE arms:
    even keys divisible by 3 are pure inserts, the rest are updates.
    The reprice factor is 2 (exact in binary floating point) so the
    ROUND never lands on a half-cent tie, where Spark's HALF_UP and
    DuckDB's double rounding disagree."""
    o = _t(spark, sf_dir, "orders")
    base = o.where(F.col("o_orderkey") % 3 != 0)
    upd = (
        o.where(F.col("o_orderkey") % 2 == 0)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 2, 2))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    return merge_upsert(base, upd, ["o_orderkey"]).select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price_r"),
    )


RELATIONAL_QUERIES["q68_merge_upsert"] = q68_merge_upsert
RELATIONAL_ORACLE["q68_merge_upsert"] = (
    "WITH upd AS ("
    "  SELECT o_orderkey, 'U' AS o_orderstatus, "
    "         ROUND(o_totalprice * 2, 2) AS o_totalprice "
    "  FROM orders WHERE o_orderkey % 2 = 0) "
    "SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS price_r "
    "FROM ("
    "  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders "
    "  WHERE o_orderkey % 3 <> 0 "
    "    AND o_orderkey NOT IN (SELECT o_orderkey FROM upd) "
    "  UNION ALL SELECT * FROM upd)"
)


def q69_runtime_filter(spark, sf_dir):
    """Runtime filter (dynamic semi-join reduction): the selective dim
    predicate (urgent, high-value orders) is turned into a broadcast
    LEFT SEMI join that prunes the fact BEFORE its aggregation shuffle —
    the manual form of Spark's runtime bloom/DPP filters, for when the
    filter column isn't the partition column. At 100 TB the semi join
    drops ~95% of lineitem bytes ahead of the groupBy exchange. The
    broadcast hint is GUARDED (scale.py runtime_filter): it is added
    only while Catalyst's dim size estimate fits the session broadcast
    threshold — an unconditional hint would override the threshold and
    OOM on a dim that outgrows it — so past the threshold the plan
    legitimately degrades to a shuffled semi join. Plan asserted in
    tests/test_plans.py (BroadcastExchange + LeftSemi for the small-dim
    case, shuffled-semi fallback for the oversized case).
    """
    from .scale import runtime_filter

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    hot = o.where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 400000)
    )
    pruned = runtime_filter(li, hot, "l_orderkey", "o_orderkey")
    return (
        pruned.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


RELATIONAL_QUERIES["q69_runtime_filter"] = q69_runtime_filter
RELATIONAL_ORACLE["q69_runtime_filter"] = (
    "SELECT l_returnflag, COUNT(*) AS n_lines, "
    "  ROUND(SUM(l_extendedprice), 2) AS revenue "
    "FROM lineitem WHERE l_orderkey IN ("
    "  SELECT o_orderkey FROM orders "
    "  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000) "
    "GROUP BY l_returnflag"
)


def scd2_build(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """SCD type-2 interval builder: compress each key's ``state_col``
    sequence (ordered by ``order_cols``, whose FIRST column is the event
    time) into [valid_from, valid_to) validity intervals with an
    is_current flag — the standard islands construction (lag-based
    change flag, running-sum run id, per-run aggregate, lead() for the
    closing edge). All three windows and the groupBy partition on the
    key, so the whole build costs ONE shuffle (AQE reuses the
    partitioning); nothing is global. ``order_cols`` must totally order
    each key's rows (add a unique id as tie-break) or the survivor
    intervals are undefined. Laws (contiguity, alternation, event
    conservation, containment) are property-tested in
    tests/test_properties.py."""
    ts_col = order_cols[0]
    w = Window.partitionBy(key).orderBy(*order_cols)
    chg = df.withColumn(
        "chg",
        F.when(
            F.lag(state_col).over(w).eqNullSafe(F.col(state_col)), 0
        ).otherwise(1),
    )
    runs = chg.withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    seg = runs.groupBy(key, "run_id", state_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key).orderBy("valid_from", "run_id")
    return seg.select(
        key, state_col, "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        "n_events",
    )


def q70_scd2_build(spark, sf_dir):
    """Gate: :func:`scd2_build` over the events table — per-user
    event_type validity intervals, ties broken by event_id so both
    engines see one deterministic sequence."""
    e = _t(spark, sf_dir, "events")
    return scd2_build(e, "user_id", ["ts", "event_id"], "event_type")


RELATIONAL_QUERIES["q70_scd2_build"] = q70_scd2_build
RELATIONAL_ORACLE["q70_scd2_build"] = (
    "WITH chg AS ("
    "  SELECT user_id, event_type, ts, event_id, "
    "    CASE WHEN LAG(event_type) OVER "
    "      (PARTITION BY user_id ORDER BY ts, event_id) "
    "      IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg "
    "  FROM events), "
    "runs AS ("
    "  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "    ROWS UNBOUNDED PRECEDING) AS run_id FROM chg), "
    "seg AS ("
    "  SELECT user_id, run_id, event_type, MIN(ts) AS valid_from, "
    "    COUNT(*) AS n_events FROM runs GROUP BY 1, 2, 3) "
    "SELECT user_id, event_type, valid_from, "
    "  LEAD(valid_from) OVER w2 AS valid_to, "
    "  LEAD(valid_from) OVER w2 IS NULL AS is_current, n_events "
    "FROM seg WINDOW w2 AS ("
    "  PARTITION BY user_id ORDER BY valid_from, run_id)"
)


def q71_incremental_agg(spark, sf_dir):
    """Incremental aggregate maintenance (materialized-rollup refresh):
    a pre-aggregate over the history partition (o_orderdate < split) is
    merged with a delta re-aggregate (>= split) by combining partial
    states — COUNT merges as SUM, SUM as SUM, MAX as MAX. At 100 TB
    this is the nightly-rollup pattern: refresh touches only the delta
    partition; history is never rescanned. The oracle computes the same
    rollup from scratch over the full table, proving merge == rebuild.
    Money is summed in integer cents (exact ×100 of the 2-decimal
    doubles) so the two-level merge is associativity-proof — partial
    double sums re-added in a different order than a single-pass SUM
    can drift in the low bits."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "price_cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    split = "1997-01-01"

    def rollup(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_cents").alias("sum_cents"),
            F.max("o_orderdate").alias("last_order"),
        )

    hist = rollup(o.where(F.col("o_orderdate") < split))
    delta = rollup(o.where(F.col("o_orderdate") >= split))
    return (
        hist.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_cents").alias("sum_cents"),
            F.max("last_order").alias("last_order"),
        )
    )


RELATIONAL_QUERIES["q71_incremental_agg"] = q71_incremental_agg
RELATIONAL_ORACLE["q71_incremental_agg"] = (
    # CAST(SUM(..) AS BIGINT): DuckDB SUM over integers yields HUGEINT,
    # which the driver's pandas canonicalizer renders as float64 ("9.0")
    # while Spark emits a long ("9") — hash mismatch with identical values.
    "SELECT o_custkey, COUNT(*) AS n_orders, "
    "  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
    "    AS sum_cents, "
    "  MAX(o_orderdate) AS last_order "
    "FROM orders GROUP BY o_custkey"
)


def table_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Snapshot reconciliation: classify every key as 'added' (new
    only), 'removed' (old only), or 'changed' (both sides, any non-key
    column differs); unchanged keys are dropped. The workhorse for
    audit/anti-entropy between two table versions — ONE full outer join
    on the key, null-safe column comparison (<=>), no collect. At
    100 TB run it on bucketed snapshots so the outer join reuses the
    bucketing. Non-key columns are surfaced as old_*/new_* pairs."""
    val_cols = [c for c in old.columns if c not in keys]
    o = old.select(*keys, *[F.col(c).alias(f"old_{c}") for c in val_cols],
                   F.lit(True).alias("_in_old"))
    n = new.select(*keys, *[F.col(c).alias(f"new_{c}") for c in val_cols],
                   F.lit(True).alias("_in_new"))
    j = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in val_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("diff_status", status)
        .where(F.col("diff_status").isNotNull())
        .drop("_in_old", "_in_new")
    )


def q72_table_diff(spark, sf_dir):
    """table_diff gate: old = orders below the top 1000 keys; new drops
    every 7th key inside old ('removed'), re-prices every 5th
    ('changed'), keeps the rest identical (excluded), and the top-1000
    keys exist only in new ('added'). The cutoff is data-derived
    (max − 1000) via a broadcast scalar join — no driver collect, and
    the same shape at every sf — matching the oracle's scalar
    subquery, which DuckDB decorrelates identically."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    cut = o.agg((F.max("o_orderkey") - 1000).alias("_cutoff"))
    old = (
        o.crossJoin(F.broadcast(cut))
        .where(F.col("o_orderkey") < F.col("_cutoff"))
        .drop("_cutoff")
    )
    new = (
        o.where(F.col("o_orderkey") % 7 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 5 == 0,
                F.round(F.col("o_totalprice") * 2, 2),
            ).otherwise(F.col("o_totalprice")),
        )
    )
    return table_diff(old, new, ["o_orderkey"]).select(
        "o_orderkey", "diff_status",
        F.round("old_o_totalprice", 2).alias("old_price"),
        F.round("new_o_totalprice", 2).alias("new_price"),
    )


RELATIONAL_QUERIES["q72_table_diff"] = q72_table_diff
RELATIONAL_ORACLE["q72_table_diff"] = (
    "WITH old AS ("
    "  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders "
    "  WHERE o_orderkey < (SELECT MAX(o_orderkey) - 1000 FROM orders)), "
    "new AS ("
    "  SELECT o_orderkey, o_orderstatus, "
    "    CASE WHEN o_orderkey % 5 = 0 THEN ROUND(o_totalprice * 2, 2) "
    "         ELSE o_totalprice END AS o_totalprice "
    "  FROM orders WHERE o_orderkey % 7 <> 0), "
    "j AS ("
    "  SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey, "
    "    old.o_totalprice AS old_price, new.o_totalprice AS new_price, "
    "    old.o_orderkey IS NOT NULL AS in_old, "
    "    new.o_orderkey IS NOT NULL AS in_new, "
    "    (old.o_orderstatus IS NOT DISTINCT FROM new.o_orderstatus AND "
    "     old.o_totalprice IS NOT DISTINCT FROM new.o_totalprice) AS same "
    "  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey) "
    "SELECT o_orderkey, "
    "  CASE WHEN NOT in_old THEN 'added' WHEN NOT in_new THEN 'removed' "
    "       WHEN NOT same THEN 'changed' END AS diff_status, "
    "  ROUND(old_price, 2) AS old_price, ROUND(new_price, 2) AS new_price "
    "FROM j WHERE NOT in_old OR NOT in_new OR NOT same"
)


def q73_gap_fill(spark, sf_dir):
    """Time-series gap filling (resample-daily): each user's event
    history densified to one row per calendar day between their first
    and last event — missing days get n_events=0 and carry the last
    seen event_type forward. The dense day spine comes from
    sequence()+explode of per-user (min,max) day bounds — generated
    DISTRIBUTED, sized by each user's own span (never a driver-side
    calendar); the forward fill is last(ignorenulls) over the user
    partition. Both the daily aggregate and the windows partition on
    user_id, so the whole densification is two shuffles on one key.
    """
    e = _t(spark, sf_dir, "events")
    daily = (
        e.withColumn("day", F.to_date("ts"))
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # arg-max via lexicographic struct MAX — (ts, event_id) is
            # unique, so the day's last event_type is deterministic and
            # DuckDB's struct MAX replays it exactly (its max_by cannot
            # take a struct ordering key)
            F.max(F.struct("ts", "event_id", "event_type"))[
                "event_type"
            ].alias("last_type"),
        )
    )
    spine = (
        e.groupBy("user_id")
        .agg(
            F.to_date(F.min("ts")).alias("d0"),
            F.to_date(F.max("ts")).alias("d1"),
        )
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id", "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("last_type", ignorenulls=True).over(w).alias("last_type"),
        )
    )


RELATIONAL_QUERIES["q73_gap_fill"] = q73_gap_fill
RELATIONAL_ORACLE["q73_gap_fill"] = (
    "WITH daily AS ("
    "  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events, "
    "    (MAX(struct_pack(ts := ts, eid := event_id, et := event_type))).et "
    "      AS last_type "
    "  FROM events GROUP BY 1, 2), "
    "spine AS ("
    "  SELECT user_id, CAST(UNNEST(generate_series("
    "    CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE), "
    "    INTERVAL 1 DAY)) AS DATE) AS day "
    "  FROM events GROUP BY user_id) "
    "SELECT s.user_id, s.day, COALESCE(d.n_events, 0) AS n_events, "
    "  LAST_VALUE(d.last_type IGNORE NULLS) OVER ("
    "    PARTITION BY s.user_id ORDER BY s.day "
    "    ROWS UNBOUNDED PRECEDING) AS last_type "
    "FROM spine s LEFT JOIN daily d "
    "  ON s.user_id = d.user_id AND s.day = d.day"
)


#: q74 histogram geometry (fixed-width buckets over o_totalprice)
HIST_LO, HIST_W, HIST_N = 0.0, 30000.0, 20


def q74_histogram(spark, sf_dir):
    """Fixed-width histogram: one aggregation pass, bucket index from
    pure arithmetic (floor((x-lo)/w), clamped into [0, n-1]) — the
    map-side-combinable form whose cost is one shuffle of at most n
    rows per partition, vs. the naive orderBy+ntile histogram that
    global-sorts. Empty buckets are absent by construction (left to the
    caller to densify — at 100 TB a 20-row spine join is free)."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.least(
        F.greatest(
            F.floor((F.col("o_totalprice") - HIST_LO) / HIST_W), F.lit(0)
        ),
        F.lit(HIST_N - 1),
    ).cast("long")
    return (
        o.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo_price"),
            F.round(F.max("o_totalprice"), 2).alias("hi_price"),
        )
    )


RELATIONAL_QUERIES["q74_histogram"] = q74_histogram
RELATIONAL_ORACLE["q74_histogram"] = (
    f"SELECT CAST(LEAST(GREATEST(FLOOR((o_totalprice - {HIST_LO}) / {HIST_W}), 0), "
    f"{HIST_N - 1}) AS BIGINT) AS bucket, "
    "COUNT(*) AS n_orders, ROUND(MIN(o_totalprice), 2) AS lo_price, "
    "ROUND(MAX(o_totalprice), 2) AS hi_price "
    "FROM orders GROUP BY 1"
)


def q75_corr_matrix(spark, sf_dir):
    """Correlation/covariance matrix over lineitem's numeric columns,
    emitted as (col_x, col_y, corr, covar) rows — ONE aggregation pass
    computing every pairwise moment map-side (no per-pair jobs, no
    driver loop; the unpivot to rows happens after the single agg).
    Values are rounded to 4 decimals: Spark and DuckDB accumulate
    moments in different orders, identical to ~1e-12 — far inside the
    rounding — but not bit-equal."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = []
    for i, x in enumerate(cols):
        for y in cols[i + 1:]:
            aggs.append(F.round(F.corr(x, y), 4).alias(f"corr_{x}_{y}"))
            aggs.append(F.round(F.covar_samp(x, y), 4).alias(f"cov_{x}_{y}"))
    wide = li.agg(*aggs)
    pairs = [
        (x, y)
        for i, x in enumerate(cols)
        for y in cols[i + 1:]
    ]
    stack = ", ".join(
        f"'{x}', '{y}', corr_{x}_{y}, cov_{x}_{y}" for x, y in pairs
    )
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (col_x, col_y, corr, covar)"
    )


RELATIONAL_QUERIES["q75_corr_matrix"] = q75_corr_matrix
RELATIONAL_ORACLE["q75_corr_matrix"] = (
    "SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y, "
    "  ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr, "
    "  ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar FROM lineitem "
    "UNION ALL SELECT 'l_quantity', 'l_discount', "
    "  ROUND(CORR(l_quantity, l_discount), 4), "
    "  ROUND(COVAR_SAMP(l_quantity, l_discount), 4) FROM lineitem "
    "UNION ALL SELECT 'l_extendedprice', 'l_discount', "
    "  ROUND(CORR(l_extendedprice, l_discount), 4), "
    "  ROUND(COVAR_SAMP(l_extendedprice, l_discount), 4) FROM lineitem"
)


def q76_transition_matrix(spark, sf_dir):
    """Event-transition matrix (path analysis): per user, each
    consecutive event_type bigram counted corpus-wide — the Markov
    transition counts product analytics builds funnels from. One lag()
    window partitioned on user_id + one global count aggregation; the
    bigram never materializes per-path strings, just two columns."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


RELATIONAL_QUERIES["q76_transition_matrix"] = q76_transition_matrix
RELATIONAL_ORACLE["q76_transition_matrix"] = (
    "WITH seq AS ("
    "  SELECT event_type, LAG(event_type) OVER ("
    "    PARTITION BY user_id ORDER BY ts, event_id) AS prev_type "
    "  FROM events) "
    "SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions "
    "FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2"
)


def q77_outliers(spark, sf_dir):
    """Per-group statistical outliers: orders priced more than 2 sample
    standard deviations above their customer's mean. The per-customer
    moments come from ONE aggregation joined back on the same shuffle
    key (never a per-row correlated subquery); customers with a single
    order have NULL stddev and are excluded by the comparison in both
    engines. The z-score is recomputed from the same double moments in
    both engines and rounded for output only."""
    o = _t(spark, sf_dir, "orders")
    stats = o.groupBy("o_custkey").agg(
        F.avg("o_totalprice").alias("mu"),
        F.stddev_samp("o_totalprice").alias("sigma"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        o.join(stats, "o_custkey")
        .where(F.col("o_totalprice") > F.col("mu") + 2 * F.col("sigma"))
        .select(
            "o_custkey", "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.round((F.col("o_totalprice") - F.col("mu")) / F.col("sigma"), 3)
            .alias("z"),
            "n_orders",
        )
    )


RELATIONAL_QUERIES["q77_outliers"] = q77_outliers
RELATIONAL_ORACLE["q77_outliers"] = (
    "WITH stats AS ("
    "  SELECT o_custkey, AVG(o_totalprice) AS mu, "
    "    STDDEV_SAMP(o_totalprice) AS sigma, COUNT(*) AS n_orders "
    "  FROM orders GROUP BY o_custkey) "
    "SELECT o.o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price, "
    "  ROUND((o_totalprice - mu) / sigma, 3) AS z, n_orders "
    "FROM orders o JOIN stats s ON o.o_custkey = s.o_custkey "
    "WHERE o_totalprice > mu + 2 * sigma"
)


#: q78 bounded fuzzy-match slice (the exact oracle for fuzzy entity
#: matching; the scale path is blocking — join on a cheap key like
#: soundex/prefix/length-band FIRST, then levenshtein only candidates)
FUZZY_BOUND = 300


def q78_fuzzy_match(spark, sf_dir):
    """Fuzzy entity matching: near-identical part names (levenshtein
    distance 1-2) within a bounded slice. The quadratic compare is
    bounded to FUZZY_BOUND parts BY DESIGN — like the n-gram Jaccard
    gate it exists as the exact oracle; at 100 TB you block first
    (the shared trailing noun here, cutting candidates ~50×
    before any edit-distance is computed) and levenshtein only the
    blocked candidates."""
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_partkey") < FUZZY_BOUND)
        .select("p_partkey", "p_name")
    )
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.p_partkey") < F.col("b.p_partkey"))
            # blocking on the trailing noun: part names are
            # "adjective noun", so near-matches share the noun while the
            # adjective carries the edit distance
            & (
                F.substring_index("a.p_name", " ", -1)
                == F.substring_index("b.p_name", " ", -1)
            ),
        )
        .withColumn("dist", F.levenshtein("a.p_name", "b.p_name"))
        .where(F.col("dist").between(1, 2))
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            "dist",
        )
    )


RELATIONAL_QUERIES["q78_fuzzy_match"] = q78_fuzzy_match
RELATIONAL_ORACLE["q78_fuzzy_match"] = (
    "SELECT a.p_partkey AS key_a, b.p_partkey AS key_b, "
    "  a.p_name AS name_a, b.p_name AS name_b, "
    "  levenshtein(a.p_name, b.p_name) AS dist "
    f"FROM part a, part b "
    f"WHERE a.p_partkey < {FUZZY_BOUND} AND b.p_partkey < {FUZZY_BOUND} "
    "  AND a.p_partkey < b.p_partkey "
    "  AND split_part(a.p_name, ' ', -1) = split_part(b.p_name, ' ', -1) "
    "  AND levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2"
)


def q79_cooccurrence(spark, sf_dir):
    """Market-basket co-occurrence: part pairs appearing in the same
    order, top-20 by support. Pair explosion is bounded by the per-order
    line count squared (≤ ~13² here — basket width, never corpus size;
    a < b from the sorted array halves it).

    Round-14 optimization (guide §2.4, the r13 _copurchase_edges recipe
    applied to its pair-COUNT sibling): the former distinct → self-join
    on l_orderkey → groupBy(pair) planned three exchanges plus a
    sort-merge join of the line stream against itself. Now ONE exchange
    groups each order's distinct parts into a sorted array (collect_set
    dedups in the same aggregate, so the separate distinct disappears),
    the C(n,2) pairs explode MAP-SIDE, and the pair count is one
    map-combinable aggregate — 2 exchanges, no join, no sort. Same
    multiset of pairs by construction (each order contributes each
    unordered distinct-part pair exactly once either way); equivalence
    vs the self-join form pinned in tests/test_optimization_r14.py."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .where(F.size("ps") >= 2)
    )
    return (
        baskets.select(F.explode(_sorted_array_pairs("ps")).alias("e"))
        .groupBy(
            F.col("e.a").alias("part_a"),
            F.col("e.b").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


RELATIONAL_QUERIES["q79_cooccurrence"] = q79_cooccurrence
RELATIONAL_ORACLE["q79_cooccurrence"] = (
    "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) "
    "SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
    "  COUNT(*) AS n_orders "
    "FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey "
    "  AND a.l_partkey < b.l_partkey "
    "GROUP BY 1, 2 ORDER BY n_orders DESC, part_a, part_b LIMIT 20"
)


def q80_ab_test(spark, sf_dir):
    """A/B experiment readout: users split into two deterministic arms
    (user_id parity stands in for the assignment column), per-arm
    conversion to 'purchase', and the pooled two-proportion z statistic
    — the hypothesis-test arithmetic run after every experiment. The
    per-user conversion flags reduce to BOTH arms' sufficient
    statistics in one conditional aggregation over one events scan
    (plan-verified: a per-arm groupBy + self-join would scan and
    aggregate twice); the z-score is a pure scalar expression over the
    1-row result, computed identically in both engines, NULL in both
    when the pooled variance degenerates to zero. At 100 TB nothing
    here is driver-side."""
    e = _t(spark, sf_dir, "events")
    # conversion = the user's FIRST event (by ts, event_id) is a
    # purchase — a genuinely varying behavioral flag at every scale
    # factor (an any-purchase flag saturates to 1 for every user in
    # this fixture, collapsing the pooled variance to zero); the
    # arg-min is a lexicographic struct MIN both engines replay exactly
    per_user = (
        e.groupBy("user_id")
        .agg(
            (
                F.min(F.struct("ts", "event_id", "event_type"))[
                    "event_type"
                ]
                == "purchase"
            ).cast("int").alias("converted")
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("int"))
    )
    # both arms' sufficient statistics from ONE conditional aggregation
    # (a per-arm groupBy + self-join would scan and aggregate the events
    # lineage twice — the arm filter pushes below the aggregate, so
    # exchange reuse never fires)
    arm0 = F.col("arm") == 0
    j = per_user.agg(
        F.sum(arm0.cast("long")).alias("n0"),
        F.sum(F.when(arm0, F.col("converted")).otherwise(0)).alias("c0"),
        F.sum((~arm0).cast("long")).alias("n1"),
        F.sum(F.when(~arm0, F.col("converted")).otherwise(0)).alias("c1"),
    )
    p0 = F.col("c0") / F.col("n0")
    p1 = F.col("c1") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    se = F.sqrt(pp * (1 - pp) * (1 / F.col("n0") + 1 / F.col("n1")))
    # degenerate pooled variance (all or none converted) → NULL z in
    # BOTH engines, instead of Spark NULL-vs-DuckDB inf divergence
    z = F.when(se > 0, F.round((p1 - p0) / se, 4))
    return j.select(
        "n0", "c0", "n1", "c1",
        F.round(p0, 6).alias("rate_a"),
        F.round(p1, 6).alias("rate_b"),
        z.alias("z_score"),
    )


RELATIONAL_QUERIES["q80_ab_test"] = q80_ab_test
RELATIONAL_ORACLE["q80_ab_test"] = (
    "WITH per_user AS ("
    "  SELECT user_id, CAST((MIN(struct_pack(ts := ts, eid := event_id, "
    "    et := event_type))).et = 'purchase' AS INT) AS converted, "
    "    CAST(user_id % 2 AS INT) AS arm "
    "  FROM events GROUP BY user_id), "
    # CAST(..AS BIGINT): DuckDB SUM(int) is HUGEINT → pandas float64 on
    # the driver, breaking the hash vs Spark's long. Cast in the CTE so
    # every downstream use inherits BIGINT.
    "j AS ("
    "  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, "
    "         CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS c0, "
    "         CAST(SUM(CASE WHEN arm <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
    "         CAST(SUM(CASE WHEN arm <> 0 THEN converted ELSE 0 END) AS BIGINT) AS c1 "
    "  FROM per_user), "
    "m AS ("
    "  SELECT n0, c0, n1, c1, "
    "    SQRT(((c0 + c1) / CAST(n0 + n1 AS DOUBLE)) * "
    "         (1 - (c0 + c1) / CAST(n0 + n1 AS DOUBLE)) * "
    "         (1.0 / n0 + 1.0 / n1)) AS se "
    "  FROM j) "
    "SELECT n0, c0, n1, c1, "
    "  ROUND(c0 / CAST(n0 AS DOUBLE), 6) AS rate_a, "
    "  ROUND(c1 / CAST(n1 AS DOUBLE), 6) AS rate_b, "
    "  CASE WHEN se > 0 THEN "
    "    ROUND((c1 / CAST(n1 AS DOUBLE) - c0 / CAST(n0 AS DOUBLE)) / se, 4) "
    "  END AS z_score "
    "FROM m"
)


def ntile_approx_buckets(spark, sf_dir):
    """The scale-safe global ntile (operators/scale.ntile_approx) as a
    registry gate — the variant that replaces q22's single-reducer
    global ORDER BY window at 100 TB (q22 stays registered for exact
    reference parity only; see PLANS.md). Rows-only BY NATURE: pass 1's
    Greenwald-Khanna quantile sketch is Spark-side and has no DuckDB
    replay. Correctness is pinned instead by the golden test
    (tests/test_plans.py::test_ntile_approx_golden_and_plan — ≥99%
    per-row agreement with exact ntile, pass-2 plan asserted
    window/sort/shuffle-free) and this gate's bucket profile is stable
    per dataset (boundaries are deterministic for a given input)."""
    from .scale import ntile_approx

    o = _t(spark, sf_dir, "orders")
    return (
        ntile_approx(o, "o_totalprice", n=4)
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


RELATIONAL_QUERIES["ntile_approx_buckets"] = ntile_approx_buckets


# --------------------------------------------------------------------------
# round-6 TPC-H breadth: the remaining classic query SHAPES, adapted to
# this fixture's schema (no partsupp / l_shipmode / l_commitdate /
# o_comment — predicates are re-cast onto existing columns; the shapes
# themselves — EXISTS/NOT-EXISTS decorrelation, double aggregation,
# scalar-subquery thresholds, disjunctive join predicates, per-group
# averages — are what SURVEY §2.3 declares and what Catalyst must plan
# well). Money is summed in integer cents/e4 wherever a SUM feeds the
# hash gate, per the SURVEY §2.3 BIGINT oracle rule.
# --------------------------------------------------------------------------


def q81_tpch_q4_shape(spark, sf_dir):
    """TPC-H Q4 shape (priority count): EXISTS(lineitem shipped after
    the order date) decorrelated to ONE left-semi join on the order key
    with the date comparison as the join residual — the semi join keeps
    the probe at order granularity (no fan-out, no distinct) and the
    groupBy that follows reduces to the 5 priority rows. At 100 TB the
    only fact shuffle is the semi join's; the order-date window prunes
    at the scan (PushedFilters)."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    hit = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


RELATIONAL_QUERIES["q81_tpch_q4_shape"] = q81_tpch_q4_shape
RELATIONAL_ORACLE["q81_tpch_q4_shape"] = (
    "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders o "
    "WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01' "
    "AND EXISTS (SELECT 1 FROM lineitem l "
    "  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate) "
    "GROUP BY o_orderpriority"
)


def q82_tpch_q13_shape(spark, sf_dir):
    """TPC-H Q13 shape (customer order distribution): LEFT join so
    zero-order customers survive with count 0, then the double
    aggregation — per-customer order count, then the distribution of
    those counts. The first groupBy keys on the join key (c_custkey),
    so with AQE the join's exchange is reused and the distribution agg
    runs over |customers| rows, already tiny. The non-join predicate
    (priority filter) rides on the orders side BEFORE the join, as the
    spec's ON-clause semantics require for outer joins."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


RELATIONAL_QUERIES["q82_tpch_q13_shape"] = q82_tpch_q13_shape
RELATIONAL_ORACLE["q82_tpch_q13_shape"] = (
    "SELECT c_count, COUNT(*) AS custdist FROM ("
    "  SELECT c_custkey, COUNT(o_orderkey) AS c_count "
    "  FROM customer LEFT JOIN orders "
    "    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' "
    "  GROUP BY c_custkey"
    ") GROUP BY c_count"
)


def q83_tpch_q14_shape(spark, sf_dir):
    """TPC-H Q14 shape (promo revenue share): one conditional aggregate
    over the lineitem-part join in a 3-month ship window — numerator
    and denominator from the SAME pass, never two scans. Revenue is
    summed in integer e4 units (price×(1−discount) is a 4-decimal
    quantity) so the sums are associativity-proof and the BIGINT/ratio
    split keeps the oracle HUGEINT-free; the pct is a pure scalar over
    the 1-row result. part is a broadcast dim."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-12-01")
    )
    p = _t(spark, sf_dir, "part")
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    agg = j.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
        ).alias("promo_rev_e4"),
        F.sum(rev).alias("total_rev_e4"),
    )
    return agg.select(
        "promo_rev_e4",
        "total_rev_e4",
        F.round(
            F.lit(100.0) * F.col("promo_rev_e4") / F.col("total_rev_e4"), 4
        ).alias("promo_pct"),
    )


RELATIONAL_QUERIES["q83_tpch_q14_shape"] = q83_tpch_q14_shape
RELATIONAL_ORACLE["q83_tpch_q14_shape"] = (
    "WITH r AS ("
    "  SELECT p_type, "
    "    CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"
    "      AS rev "
    "  FROM lineitem JOIN part ON l_partkey = p_partkey "
    "  WHERE l_shipdate >= '1996-09-01' AND l_shipdate < '1996-12-01'), "
    "a AS ("
    "  SELECT "
    "    CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT)"
    "      AS promo_rev_e4, "
    "    CAST(SUM(rev) AS BIGINT) AS total_rev_e4 "
    "  FROM r) "
    "SELECT promo_rev_e4, total_rev_e4, "
    "  ROUND(100.0 * promo_rev_e4 / total_rev_e4, 4) AS promo_pct FROM a"
)


def q84_tpch_q17_shape(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    per-part average quantity is computed with ONE window over
    l_partkey instead of the spec's correlated subquery (which would
    re-scan lineitem) — one shuffle on the part key after the brand
    filter semi-joins the fact down to the brand's parts (broadcast).
    Quantities are integral doubles, so the window AVG is exact and the
    0.2·avg comparison is engine-identical."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    j = li.join(
        p.select("p_partkey"),
        li["l_partkey"] == p["p_partkey"],
        "left_semi",
    )
    w = Window.partitionBy("l_partkey")
    flt = j.withColumn("avg_qty", F.avg("l_quantity").over(w)).where(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    # sum in exact cents, divide after: a ROUND over SUM(double) can
    # flip on partial-aggregation order (engines sum in different
    # orders) — the r5-incident class, avoided by construction
    return flt.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("sum_price_cents"),
    ).select(
        "n_lines",
        "sum_price_cents",
        F.round(F.col("sum_price_cents") / 700.0, 2).alias("avg_yearly"),
    )


RELATIONAL_QUERIES["q84_tpch_q17_shape"] = q84_tpch_q17_shape
RELATIONAL_ORACLE["q84_tpch_q17_shape"] = (
    "WITH a AS ("
    "  SELECT COUNT(*) AS n_lines, "
    "    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
    "      AS sum_price_cents "
    "  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
    "  WHERE p.p_brand = 'Brand#23' AND l.l_quantity < ("
    "    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 "
    "    WHERE l2.l_partkey = l.l_partkey)) "
    "SELECT n_lines, sum_price_cents, "
    "  ROUND(CAST(sum_price_cents AS DOUBLE) / 700.0, 2) AS avg_yearly "
    "FROM a"
)


def q85_tpch_q20_shape(spark, sf_dir):
    """TPC-H Q20 shape (excess-stock suppliers, partsupp-free): nested
    semi-join reduction — parts filtered by name prefix semi-join the
    1997 lineitems, the surviving rows aggregate per supplier with a
    HAVING threshold, and THAT key set semi-joins the supplier dim.
    Every step shrinks the data before the next; nothing fans out.
    Quantity sums run as BIGINT (quantities are integral doubles)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("small"))
    s = _t(spark, sf_dir, "supplier")
    shipped = (
        li.join(
            p.select("p_partkey"),
            li["l_partkey"] == p["p_partkey"],
            "left_semi",
        )
        .groupBy("l_suppkey")
        # round-then-cast: Spark cast('long') truncates while DuckDB's
        # CAST rounds — align on ROUND so a non-integral quantity in a
        # future fixture cannot diverge the engines (review finding)
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty")
        )
        .where(F.col("qty") > 300)
    )
    return s.join(
        shipped, s["s_suppkey"] == shipped["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name")


RELATIONAL_QUERIES["q85_tpch_q20_shape"] = q85_tpch_q20_shape
RELATIONAL_ORACLE["q85_tpch_q20_shape"] = (
    "SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN ("
    "  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey "
    "  WHERE p_name LIKE 'small%' "
    "    AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01' "
    "  GROUP BY l_suppkey "
    "  HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 300)"
)


def q86_tpch_q22_shape(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): customers in target
    segments with an above-average balance and NO RECENT order (the
    fixture has no orderless customers, so 'recent' makes the anti set
    real — 615 of 1500 at sf0.01). The scalar average is ONE 1-row
    aggregate broadcast-crossed into the probe (no correlated re-scan),
    balances compare in exact integer cents, and the NOT EXISTS is a
    left-anti join against the pruned recent-orders key set."""
    c = _t(spark, sf_dir, "customer").withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    segs = ("AUTOMOBILE", "MACHINERY", "HOUSEHOLD")
    pool = c.where(F.col("c_mktsegment").isin(*segs))
    avg_bal = pool.where(F.col("bal_cents") > 0).agg(
        F.avg("bal_cents").alias("avg_cents")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2001-01-01")
        .select("o_custkey")
    )
    rich = pool.join(F.broadcast(avg_bal)).where(
        F.col("bal_cents") > F.col("avg_cents")
    )
    lonely = rich.join(
        recent, rich["c_custkey"] == recent["o_custkey"], "left_anti"
    )
    return lonely.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("bal_cents").alias("total_bal_cents"),
    )


RELATIONAL_QUERIES["q86_tpch_q22_shape"] = q86_tpch_q22_shape
RELATIONAL_ORACLE["q86_tpch_q22_shape"] = (
    "WITH cc AS ("
    "  SELECT c_custkey, c_mktsegment, "
    "    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents "
    "  FROM customer "
    "  WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'HOUSEHOLD')), "
    "a AS (SELECT AVG(bal_cents) AS avg_cents FROM cc WHERE bal_cents > 0) "
    "SELECT c_mktsegment, COUNT(*) AS numcust, "
    "  CAST(SUM(bal_cents) AS BIGINT) AS total_bal_cents "
    "FROM cc, a WHERE bal_cents > avg_cents "
    "AND NOT EXISTS (SELECT 1 FROM orders "
    "  WHERE o_custkey = cc.c_custkey AND o_orderdate >= '2001-01-01') "
    "GROUP BY c_mktsegment"
)


def q87_tpch_q11_shape(spark, sf_dir):
    """TPC-H Q11 shape (important stock, partsupp-free): per-part value
    vs a fraction of the GLOBAL value — the group-vs-global-scalar
    pattern. The naive form (rollup ⋈ broadcast(rollup.agg())) plans
    TWO fact scans because the rollup's exchange does not canonicalize
    to a reusable subtree; instead the global sum is a single-partition
    window over the ROLLUP — the fact is scanned and pre-aggregated
    exactly once, and the single partition holds only |parts| rows
    (plan-asserted: one parquet scan). Values in exact cents."""
    li = _t(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("val_cents")
    )
    thr = (F.sum("val_cents").over(Window.partitionBy()) * 0.0006)
    return (
        pv.withColumn("threshold", thr)
        .where(F.col("val_cents") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"), "val_cents")
    )


RELATIONAL_QUERIES["q87_tpch_q11_shape"] = q87_tpch_q11_shape
RELATIONAL_ORACLE["q87_tpch_q11_shape"] = (
    "WITH pv AS ("
    "  SELECT l_partkey, "
    "    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
    "      AS val_cents "
    "  FROM lineitem GROUP BY l_partkey) "
    "SELECT l_partkey AS partkey, val_cents FROM pv "
    # CAST to DOUBLE first: DuckDB's HUGEINT * 0.0006 is exact
    # DECIMAL(38,4) while Spark's sum→double threshold loses integer
    # precision past 2^53 — compare in the SAME arithmetic both sides
    "WHERE val_cents > (SELECT CAST(SUM(val_cents) AS DOUBLE) * 0.0006 "
    "FROM pv)"
)


def q88_tpch_q19_shape(spark, sf_dir):
    """TPC-H Q19 shape (disjunctive discounted revenue): the OR-of-ANDs
    predicate spanning both sides. Catalyst extracts the common
    p_partkey equi-key so this plans as a hash join with the
    disjunction as the residual filter — NEVER a nested-loop join
    (plan-asserted in tests/test_plans.py). Revenue in exact e4
    integers as in q83."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (li["l_partkey"] == p["p_partkey"]) & (
        (
            (p["p_brand"] == "Brand#12")
            & p["p_size"].between(1, 15)
            & li["l_quantity"].between(1, 11)
        )
        | (
            (p["p_brand"] == "Brand#23")
            & p["p_size"].between(1, 25)
            & li["l_quantity"].between(10, 20)
        )
        | (
            (p["p_brand"] == "Brand#34")
            & p["p_size"].between(1, 35)
            & li["l_quantity"].between(20, 30)
        )
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return li.join(p, cond).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(rev).alias("revenue_e4"),
    )


RELATIONAL_QUERIES["q88_tpch_q19_shape"] = q88_tpch_q19_shape
RELATIONAL_ORACLE["q88_tpch_q19_shape"] = (
    "SELECT COUNT(*) AS n_lines, "
    "  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)"
    "    AS BIGINT)) AS BIGINT) AS revenue_e4 "
    "FROM lineitem JOIN part ON l_partkey = p_partkey AND ("
    "  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 "
    "    AND l_quantity BETWEEN 1 AND 11) OR "
    "  (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 "
    "    AND l_quantity BETWEEN 10 AND 20) OR "
    "  (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 "
    "    AND l_quantity BETWEEN 20 AND 30))"
)


def q89_tpch_q16_shape(spark, sf_dir):
    """TPC-H Q16 shape (supplier-part relationship count): distinct
    suppliers per (brand, type, size) over the lineitem-part join,
    excluding a brand and a supplier blocklist. The blocklist NOT-IN
    runs as a broadcast left-anti join (s_suppkey is non-null, so anti
    ≡ NOT IN); part is a broadcast dim; the only fact shuffle is the
    count-distinct's partial-agg exchange on the group keys."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 5, 9, 14, 20, 25, 30, 36)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    j = li.join(
        bad, li["l_suppkey"] == bad["s_suppkey"], "left_anti"
    ).join(p, li["l_partkey"] == p["p_partkey"])
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


RELATIONAL_QUERIES["q89_tpch_q16_shape"] = q89_tpch_q16_shape
RELATIONAL_ORACLE["q89_tpch_q16_shape"] = (
    "SELECT p_brand, p_type, p_size, "
    "  COUNT(DISTINCT l_suppkey) AS supplier_cnt "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE p_brand <> 'Brand#45' "
    "  AND p_size IN (1, 5, 9, 14, 20, 25, 30, 36) "
    "  AND l_suppkey NOT IN ("
    "    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
    "GROUP BY p_brand, p_type, p_size"
)


def q90_latest_n_per_key(spark, sf_dir):
    """Latest-N-per-key (the "last 3 events per user" feature-store
    primitive — q59's top-1 generalized): row_number over (user, recency
    desc), keep rank ≤ 3. Spark pushes the rank bound into the window
    sort as a per-partition top-N heap (WindowGroupLimit, plan-asserted)
    — ONE shuffle on user_id with O(N) state per key, so a hot user
    costs N rows of state, not its whole history. Tie-break on event_id
    keeps the survivors deterministic."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("user_id", "rn", "event_id", "ts", "event_type")
    )


RELATIONAL_QUERIES["q90_latest_n_per_key"] = q90_latest_n_per_key
RELATIONAL_ORACLE["q90_latest_n_per_key"] = (
    "SELECT user_id, rn, event_id, ts, event_type FROM ("
    "  SELECT user_id, event_id, ts, event_type, ROW_NUMBER() OVER ("
    "    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
    "  FROM events"
    ") WHERE rn <= 3"
)


def q91_tpch_q8_shape(spark, sf_dir):
    """TPC-H Q8 shape (national market share): NATION_2's share of
    ASIA-customer revenue per order year. Five joins, but only ONE is
    fact-fact (lineitem⋈orders, the unavoidable SMJ at scale) — nation,
    region, customer, supplier are broadcast dims, and the share is a
    conditional aggregate over a single joined pass (numerator and
    denominator together, never two scans). Revenue in exact e4
    integers; the share ratio is a scalar over the per-year rows."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cust_in_asia = (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, (n["n_regionkey"] == r["r_regionkey"]) & (r["r_name"] == "ASIA"))
        .select("c_custkey")
    )
    supp_nation = s.join(
        n.select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        ),
        s["s_nationkey"] == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust_in_asia, o["o_custkey"] == F.col("c_custkey"), "left_semi")
        .join(supp_nation, li["l_suppkey"] == F.col("s_suppkey"))
        .select(F.year("o_orderdate").alias("o_year"),
                rev.alias("rev_e4"), "supp_nation")
    )
    agg = j.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_2", F.col("rev_e4"))
            .otherwise(F.lit(0))
        ).alias("nation_rev_e4"),
        F.sum("rev_e4").alias("total_rev_e4"),
    )
    return agg.select(
        "o_year", "nation_rev_e4", "total_rev_e4",
        F.round(
            F.col("nation_rev_e4") / F.col("total_rev_e4"), 6
        ).alias("mkt_share"),
    )


RELATIONAL_QUERIES["q91_tpch_q8_shape"] = q91_tpch_q8_shape
RELATIONAL_ORACLE["q91_tpch_q8_shape"] = (
    "WITH j AS ("
    "  SELECT EXTRACT(year FROM o_orderdate) AS o_year, "
    "    CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"
    "      AS rev_e4, "
    "    sn.n_name AS supp_nation "
    "  FROM lineitem "
    "  JOIN orders ON l_orderkey = o_orderkey "
    "  JOIN supplier ON l_suppkey = s_suppkey "
    "  JOIN nation sn ON s_nationkey = sn.n_nationkey "
    "  WHERE o_custkey IN ("
    "    SELECT c_custkey FROM customer "
    "    JOIN nation cn ON c_nationkey = cn.n_nationkey "
    "    JOIN region ON cn.n_regionkey = r_regionkey "
    "    WHERE r_name = 'ASIA')), "
    "a AS ("
    "  SELECT o_year, "
    "    CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev_e4 "
    "      ELSE 0 END) AS BIGINT) AS nation_rev_e4, "
    "    CAST(SUM(rev_e4) AS BIGINT) AS total_rev_e4 "
    "  FROM j GROUP BY o_year) "
    "SELECT o_year, nation_rev_e4, total_rev_e4, "
    "  ROUND(CAST(nation_rev_e4 AS DOUBLE) / total_rev_e4, 6) AS mkt_share "
    "FROM a"
)


def q92_tpch_q9_shape(spark, sf_dir):
    """TPC-H Q9 shape (product-line profit by nation and year,
    partsupp-free): margin = discounted revenue − 80% of retail cost,
    in exact e4 integers, over parts whose name contains 'red', grouped
    by supplier nation × order year. part and supplier/nation broadcast;
    lineitem⋈orders is the one fact-fact SMJ; the part name filter
    semi-reduces the fact FIRST so the big join moves only matching
    lines. (The spec's ps_supplycost is replaced by p_retailprice — the
    fixture has no partsupp — preserving the join/agg shape.)"""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    supp_nation = s.join(
        n.select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("nation"),
        ),
        s["s_nationkey"] == F.col("sn_key"),
    ).select("s_suppkey", "nation")
    profit = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity")
        ) * 10000
    ).cast("long")
    j = (
        li.join(p.select("p_partkey", "p_retailprice"),
                li["l_partkey"] == p["p_partkey"])
        .join(o.select("o_orderkey", "o_orderdate"),
              li["l_orderkey"] == o["o_orderkey"])
        .join(supp_nation, li["l_suppkey"] == F.col("s_suppkey"))
    )
    return (
        j.select("nation", F.year("o_orderdate").alias("o_year"),
                 profit.alias("profit_e4"))
        .groupBy("nation", "o_year")
        .agg(F.sum("profit_e4").alias("sum_profit_e4"))
    )


RELATIONAL_QUERIES["q92_tpch_q9_shape"] = q92_tpch_q9_shape
RELATIONAL_ORACLE["q92_tpch_q9_shape"] = (
    "SELECT n_name AS nation, "
    "  EXTRACT(year FROM o_orderdate) AS o_year, "
    "  CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount) "
    "    - 0.8 * p_retailprice * l_quantity) * 10000) AS BIGINT)) AS BIGINT)"
    "    AS sum_profit_e4 "
    "FROM lineitem "
    "JOIN part ON l_partkey = p_partkey "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE p_name LIKE '%red%' "
    "GROUP BY n_name, EXTRACT(year FROM o_orderdate)"
)


def q93_tpch_q12_shape(spark, sf_dir):
    """TPC-H Q12 shape (shipping priority audit, l_shipmode-free:
    l_returnflag stands in as the category): per category, counts of
    high- vs low-priority orders among late-in-year shipments — the
    join + dual conditional count. orders is the smaller side here and
    broadcasts at this sf; at scale both sides are facts and AQE picks
    SMJ. Counts via SUM(CASE) in exact integers."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_returnflag").agg(
        F.sum(high.cast("long")).alias("high_line_count"),
        F.sum((~high).cast("long")).alias("low_line_count"),
    )


RELATIONAL_QUERIES["q93_tpch_q12_shape"] = q93_tpch_q12_shape
RELATIONAL_ORACLE["q93_tpch_q12_shape"] = (
    "SELECT l_returnflag, "
    "  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
    "    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
    "    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01' "
    "GROUP BY l_returnflag"
)


def q94_tpch_q15_shape(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): per-supplier revenue over a
    quarter, then the supplier(s) achieving the GLOBAL maximum — the
    scalar-max-subquery pattern. Like q87, the max is a single-partition
    window over the SUPPLIER-sized rollup (one fact scan, plan shape
    identical to Q11's threshold), then a broadcast join back to the
    supplier dim for the name. Revenue in exact cents makes the
    equality-with-max well-defined (double maxima are a tie-break
    hazard)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
            .cast("long")
        ).alias("total_rev_e4")
    )
    mx = F.max("total_rev_e4").over(Window.partitionBy())
    top = rev.withColumn("_mx", mx).where(
        F.col("total_rev_e4") == F.col("_mx")
    )
    return top.join(s, top["l_suppkey"] == s["s_suppkey"]).select(
        "s_suppkey", "s_name", "total_rev_e4"
    )


RELATIONAL_QUERIES["q94_tpch_q15_shape"] = q94_tpch_q15_shape
RELATIONAL_ORACLE["q94_tpch_q15_shape"] = (
    "WITH rev AS ("
    "  SELECT l_suppkey, "
    "    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)"
    "      AS BIGINT)) AS BIGINT) AS total_rev_e4 "
    "  FROM lineitem "
    "  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01' "
    "  GROUP BY l_suppkey) "
    "SELECT s_suppkey, s_name, total_rev_e4 "
    "FROM rev JOIN supplier ON l_suppkey = s_suppkey "
    "WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM rev)"
)


def q95_tpch_q6_shape(spark, sf_dir):
    """TPC-H Q6 (forecast revenue change): the pure scan-filter-agg —
    every predicate reaches the parquet scan (PushedFilters:
    date range, discount band, quantity cap; plan-asserted), the
    aggregate is map-side-combinable, and the answer is one row. The
    simplest query in the suite and the one that most directly measures
    scan + pushdown health at 100 TB. Revenue = extendedprice×discount
    in exact e4 integers."""
    li = _t(spark, sf_dir, "lineitem")
    flt = li.where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return flt.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000)
            .cast("long")
        ).alias("revenue_e4"),
    )


RELATIONAL_QUERIES["q95_tpch_q6_shape"] = q95_tpch_q6_shape
RELATIONAL_ORACLE["q95_tpch_q6_shape"] = (
    "SELECT COUNT(*) AS n_lines, "
    "  CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT))"
    "    AS BIGINT) AS revenue_e4 "
    "FROM lineitem "
    "WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01' "
    "  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
)


def q96_tpch_q1_full(spark, sf_dir):
    """TPC-H Q1 in FULL (q12_group_agg carries only part of Q1's
    aggregate battery): per (returnflag, linestatus) — sum qty, sum
    base price, sum discounted, sum charged, three averages, and the
    row count, over a shipdate cutoff. One scan, one partial-aggregable
    shuffle on a 6-group key; money sums in exact e4 integers, the
    averages derived FROM those integer sums (identical in both
    engines) rather than re-aggregated doubles."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= "2001-09-01"
    )
    price_e4 = F.round(F.col("l_extendedprice") * 10000).cast("long")
    disc_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    charge_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax")) * 10000
    ).cast("long")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
        F.sum(price_e4).alias("sum_base_e4"),
        F.sum(disc_e4).alias("sum_disc_e4"),
        F.sum(charge_e4).alias("sum_charge_e4"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_e4",
        "sum_disc_e4", "sum_charge_e4", "count_order",
        F.round(F.col("sum_qty") / F.col("count_order"), 6).alias("avg_qty"),
        F.round(
            F.col("sum_base_e4") / F.col("count_order") / 10000.0, 6
        ).alias("avg_price"),
        F.round(
            F.col("sum_disc_e4") / F.col("count_order") / 10000.0, 6
        ).alias("avg_disc_price"),
    )


RELATIONAL_QUERIES["q96_tpch_q1_full"] = q96_tpch_q1_full
RELATIONAL_ORACLE["q96_tpch_q1_full"] = (
    "WITH a AS ("
    "  SELECT l_returnflag, l_linestatus, "
    "    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, "
    "    CAST(SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)) AS BIGINT)"
    "      AS sum_base_e4, "
    "    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)"
    "      AS BIGINT)) AS BIGINT) AS sum_disc_e4, "
    "    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) "
    "      * (1 + l_tax) * 10000) AS BIGINT)) AS BIGINT) AS sum_charge_e4, "
    "    COUNT(*) AS count_order "
    "  FROM lineitem WHERE l_shipdate <= '2001-09-01' "
    "  GROUP BY l_returnflag, l_linestatus) "
    "SELECT l_returnflag, l_linestatus, sum_qty, sum_base_e4, "
    "  sum_disc_e4, sum_charge_e4, count_order, "
    "  ROUND(CAST(sum_qty AS DOUBLE) / count_order, 6) AS avg_qty, "
    "  ROUND(CAST(sum_base_e4 AS DOUBLE) / count_order / 10000.0, 6)"
    "    AS avg_price, "
    "  ROUND(CAST(sum_disc_e4 AS DOUBLE) / count_order / 10000.0, 6)"
    "    AS avg_disc_price "
    "FROM a"
)


def q97_column_profile(spark, sf_dir):
    """Whole-table column profiler — the reference's type-inference
    spirit (R16/R17 sample a column to guess what it holds,
    data-table.lisp:258-297) industrialized into ONE scan that yields
    per-column null count, exact distinct count, min/max, an exact
    e4-integer sum and a mean derived from it.

    The scale-correct shape is NOT one countDistinct() per column in a
    single agg — Spark plans N distinct aggregates over one relation as
    an Expand that multiplies every row by N (the q66 lesson,
    PERF_NOTES.md). Instead the row is exploded map-side into
    (column_name, vnum, vstr) long form — one scan, no shuffle yet —
    and ONE aggregate groups by the 7-key column_name, where the single
    count_distinct(struct) compiles to a partial-distinct on
    (column_name, value) with map-side combine and no Expand. Numeric
    columns profile their values; string columns profile their LENGTHS
    through vnum (min/max/avg are length stats, documented) while the
    raw string rides vstr so n_distinct still counts true values. The
    e4 integer sum keeps both engines bit-identical for MEASURE
    columns; the key column (l_orderkey) profiles null/distinct/
    min/max but carries a NULL sum/avg — an ID's e4-scaled sum is
    meaningless AND its partials would brush the 64-bit ceiling past
    ~sf100 (≈4.5e18 at the 100× smoke already). avg_v is guarded for
    all-NULL columns (no non-null denominator → NULL, not a divide)."""
    li = _t(spark, sf_dir, "lineitem")
    nul_s = F.lit(None).cast("string")
    nul_d = F.lit(None).cast("double")

    def num(cn, summable=True):
        v = F.col(cn).cast("double")
        return F.struct(
            F.lit(cn).alias("cn"),
            v.alias("vnum"),
            nul_s.alias("vstr"),
            (v if summable else nul_d).alias("vsum"),
        )

    def strc(cn):
        ln = F.length(cn).cast("double")
        return F.struct(
            F.lit(cn).alias("cn"),
            ln.alias("vnum"),
            F.col(cn).alias("vstr"),
            ln.alias("vsum"),
        )

    long = li.select(
        F.explode(
            F.array(
                num("l_orderkey", summable=False),
                num("l_quantity"), num("l_extendedprice"),
                num("l_discount"), num("l_tax"),
                strc("l_returnflag"), strc("l_linestatus"),
            )
        ).alias("p")
    ).select("p.*")
    notnull = F.col("vnum").isNotNull() | F.col("vstr").isNotNull()
    agg = long.groupBy("cn").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(~notnull, 1).otherwise(0)).cast("long").alias("n_nulls"),
        F.count_distinct(
            F.when(notnull, F.struct("vnum", "vstr"))
        ).alias("n_distinct"),
        F.min("vnum").alias("min_v"),
        F.max("vnum").alias("max_v"),
        F.sum(F.round(F.col("vsum") * 10000).cast("long")).alias("sum_e4"),
    )
    denom = F.col("n_rows") - F.col("n_nulls")
    return agg.select(
        "cn", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v", "sum_e4",
        F.when(
            F.col("sum_e4").isNotNull() & (denom > 0),
            F.round(F.col("sum_e4") / denom / 10000.0, 6),
        ).alias("avg_v"),
    )


RELATIONAL_QUERIES["q97_column_profile"] = q97_column_profile
RELATIONAL_ORACLE["q97_column_profile"] = (
    "WITH long AS ("
    "  SELECT 'l_orderkey' AS cn, CAST(l_orderkey AS DOUBLE) AS vnum, "
    "    CAST(NULL AS VARCHAR) AS vstr, CAST(NULL AS DOUBLE) AS vsum "
    "  FROM lineitem "
    "  UNION ALL SELECT 'l_quantity', l_quantity, NULL, l_quantity "
    "    FROM lineitem "
    "  UNION ALL SELECT 'l_extendedprice', l_extendedprice, NULL, "
    "    l_extendedprice FROM lineitem "
    "  UNION ALL SELECT 'l_discount', l_discount, NULL, l_discount "
    "    FROM lineitem "
    "  UNION ALL SELECT 'l_tax', l_tax, NULL, l_tax FROM lineitem "
    "  UNION ALL SELECT 'l_returnflag', CAST(length(l_returnflag) AS "
    "    DOUBLE), l_returnflag, CAST(length(l_returnflag) AS DOUBLE) "
    "    FROM lineitem "
    "  UNION ALL SELECT 'l_linestatus', CAST(length(l_linestatus) AS "
    "    DOUBLE), l_linestatus, CAST(length(l_linestatus) AS DOUBLE) "
    "    FROM lineitem), "
    "a AS ("
    "  SELECT cn, COUNT(*) AS n_rows, "
    "    CAST(SUM(CASE WHEN vnum IS NULL AND vstr IS NULL THEN 1 ELSE 0 "
    "      END) AS BIGINT) AS n_nulls, "
    "    CAST(COUNT(DISTINCT CASE WHEN vnum IS NOT NULL OR vstr IS NOT "
    "      NULL THEN (vnum, vstr) END) AS BIGINT) AS n_distinct, "
    "    MIN(vnum) AS min_v, MAX(vnum) AS max_v, "
    "    CAST(SUM(CAST(ROUND(vsum * 10000) AS BIGINT)) AS BIGINT) "
    "      AS sum_e4 "
    "  FROM long GROUP BY cn) "
    "SELECT cn, n_rows, n_nulls, n_distinct, min_v, max_v, sum_e4, "
    "  CASE WHEN sum_e4 IS NOT NULL AND n_rows - n_nulls > 0 THEN "
    "    ROUND(CAST(sum_e4 AS DOUBLE) / (n_rows - n_nulls) / 10000.0, 6) "
    "  END AS avg_v "
    "FROM a"
)


def q98_cdc_fold(spark, sf_dir):
    """CDC changelog fold — apply an ordered stream of `set` / `incr` /
    `del` operations per key and emit the final state (the
    counter-with-reset shape every CDC / feature-store ingest needs;
    complements q68's MERGE, which is last-write-wins only). The
    changelog derives deterministically from events: signup→set,
    error→del, click/view/purchase→incr, amount in exact cents.

    Fold semantics: state starts absent; `set` overwrites, `incr` adds
    (to 0 if absent/deleted), `del` removes. A key is present at the end
    iff its last non-incr op is a `set`, OR any `incr` landed after the
    last reset (incr re-creates from 0), OR it only ever saw incrs.

    Scale shape: the fold is NOT an iterative loop — it collapses to
    "find the last reset, then aggregate the suffix": rn = row_number
    over (user, ts, event_id); r = max(rn | op≠incr) as a second window
    on the SAME partitioning; one groupBy(user) picks the base (amount
    at r if set) and sums incrs with rn > r. Window→window→agg all hash
    on user_id, so the whole fold is ONE shuffle (plan-asserted in
    tests/test_plans.py); per-key state is O(1), hot keys cost a sort,
    not memory."""
    e = _t(spark, sf_dir, "events")
    log = e.select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_type") == "signup", "set")
        .when(F.col("event_type") == "error", "del")
        .otherwise("incr").alias("op"),
        F.coalesce(F.round(F.col("value") * 100), F.lit(0))
        .cast("long").alias("amount_cents"),
    )
    return cdc_fold(log)


def cdc_fold(log: DataFrame) -> DataFrame:
    """The reusable fold behind q98: input (user_id, ts, event_id, op ∈
    set|incr|del, amount_cents) → final per-key state. Semantics and the
    one-shuffle plan are documented on q98_cdc_fold; the imperative
    reference fold lives in tests/test_properties.py and pins this
    closed form against arbitrary hypothesis-generated changelogs."""
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = Window.partitionBy("user_id")
    staged = log.withColumn("rn", F.row_number().over(w_ord)).withColumn(
        "r", F.max(F.when(F.col("op") != "incr", F.col("rn"))).over(w_all)
    )
    agg = staged.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("rn") == F.col("r")) & (F.col("op") == "set"),
                F.col("amount_cents"),
            )
        ).alias("base"),
        F.max(F.when(F.col("rn") == F.col("r"), F.col("op"))).alias(
            "last_reset_op"
        ),
        F.sum(
            F.when(
                (F.col("op") == "incr")
                & (F.col("rn") > F.coalesce(F.col("r"), F.lit(0))),
                F.col("amount_cents"),
            )
        ).alias("incr_sum"),
        F.count(
            F.when(
                (F.col("op") == "incr")
                & (F.col("rn") > F.coalesce(F.col("r"), F.lit(0))),
                1,
            )
        ).alias("n_incr"),
    )
    present = (
        F.col("last_reset_op").isNull()
        | (F.col("last_reset_op") == "set")
        | (F.col("n_incr") > 0)
    )
    return agg.where(present).select(
        "user_id",
        (F.coalesce(F.col("base"), F.lit(0))
         + F.coalesce(F.col("incr_sum"), F.lit(0))).alias("balance_cents"),
        F.coalesce(F.col("last_reset_op"), F.lit("incr")).alias("last_reset"),
        F.col("n_incr").cast("long").alias("n_incr_applied"),
    )


RELATIONAL_QUERIES["q98_cdc_fold"] = q98_cdc_fold
RELATIONAL_ORACLE["q98_cdc_fold"] = (
    "WITH log AS ("
    "  SELECT user_id, ts, event_id, "
    "    CASE WHEN event_type = 'signup' THEN 'set' "
    "         WHEN event_type = 'error' THEN 'del' "
    "         ELSE 'incr' END AS op, "
    "    CAST(COALESCE(ROUND(value * 100), 0) AS BIGINT) AS amount_cents "
    "  FROM events), "
    "numbered AS ("
    "  SELECT *, ROW_NUMBER() OVER ("
    "      PARTITION BY user_id ORDER BY ts, event_id) AS rn "
    "  FROM log), "
    "staged AS ("
    "  SELECT *, MAX(CASE WHEN op <> 'incr' THEN rn END) OVER ("
    "      PARTITION BY user_id) AS r "
    "  FROM numbered), "
    "agg AS ("
    "  SELECT user_id, "
    "    MAX(CASE WHEN rn = r AND op = 'set' THEN amount_cents END) "
    "      AS base, "
    "    MAX(CASE WHEN rn = r THEN op END) AS last_reset_op, "
    "    CAST(SUM(CASE WHEN op = 'incr' AND rn > COALESCE(r, 0) "
    "      THEN amount_cents END) AS BIGINT) AS incr_sum, "
    "    COUNT(CASE WHEN op = 'incr' AND rn > COALESCE(r, 0) THEN 1 END) "
    "      AS n_incr "
    "  FROM staged GROUP BY user_id) "
    "SELECT user_id, "
    "  COALESCE(base, 0) + COALESCE(incr_sum, 0) AS balance_cents, "
    "  COALESCE(last_reset_op, 'incr') AS last_reset, "
    "  n_incr AS n_incr_applied "
    "FROM agg "
    "WHERE last_reset_op IS NULL OR last_reset_op = 'set' OR n_incr > 0"
)


def q99_sliding_distinct(spark, sf_dir):
    """Sliding-window distinct count — distinct users active in the
    trailing 7 days, for EVERY day of the data range. Spark windows
    cannot express COUNT(DISTINCT) OVER (RANGE ...), and the naive
    day-spine × events range join re-scans every event once per
    overlapping window (7× at a 7-day window; 90× at 90 days). The
    scale-correct plan never fans events out:

    1. dedup to (user, day) active pairs — shuffle 1, map-side combine;
    2. per user, merge day coverage into islands (gap > 6 days splits —
       two consecutive islands never overlap in window space) — shuffle
       2 on user_id; a user's whole history collapses to O(islands);
    3. each island [s, e] covers windows ending s..e+6: emit +1 at s,
       −1 at e+7 (a difference array), aggregate deltas per day — the
       shuffled rows are now O(islands), not O(events);
    4. running-sum the deltas over the day spine — a GLOBAL ordered
       window, single reducer BY DESIGN over #days rows (cardinality =
       calendar days, ~37k rows even at a century).

    The oracle is the naive quadratic form (spine LEFT JOIN events on
    BETWEEN + COUNT DISTINCT) — an independent semantic definition, so
    the gate proves the islands/difference-array rewrite exactly."""
    e = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    w_ord = Window.partitionBy("user_id").orderBy("day")
    islands = (
        e.withColumn(
            "brk",
            F.when(
                F.datediff(
                    F.col("day"), F.lag("day").over(w_ord)
                ) > 6, 1
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("brk").over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("day").alias("s"), F.max("day").alias("e"))
    )
    deltas = (
        islands.select(
            F.explode(
                F.array(
                    F.struct(F.col("s").alias("day"), F.lit(1).alias("d")),
                    F.struct(
                        F.date_add("e", 7).alias("day"),
                        F.lit(-1).alias("d"),
                    ),
                )
            ).alias("p")
        )
        .select("p.*")
        .groupBy("day")
        .agg(F.sum("d").alias("delta"))
    )
    bounds = e.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    return (
        spine.join(F.broadcast(deltas), "day", "left")
        .withColumn(
            "n_active_7d",
            F.sum(F.coalesce("delta", F.lit(0)))
            .over(
                Window.orderBy("day").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .cast("long"),
        )
        .select("day", "n_active_7d")
    )


RELATIONAL_QUERIES["q99_sliding_distinct"] = q99_sliding_distinct
RELATIONAL_ORACLE["q99_sliding_distinct"] = (
    "WITH bounds AS ("
    "  SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi "
    "  FROM events), "
    "spine AS ("
    "  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE "
    "    AS day FROM bounds) "
    "SELECT s.day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) "
    "  AS n_active_7d "
    "FROM spine s LEFT JOIN events e "
    "  ON CAST(e.ts AS DATE) BETWEEN s.day - 6 AND s.day "
    "GROUP BY s.day"
)


def q100_pagerank(spark, sf_dir):
    """PageRank over the event-type transition graph, in EXACT integer
    fixed-point — the iterative-algorithm shape (power method as a
    bounded loop of join+aggregate rounds) that Spark expresses as an
    unrolled dataflow, with every engine-dependent float removed so the
    DuckDB oracle replays it bit-for-bit:

    - edges: per-user consecutive event transitions (lag over ts,
      event_id), weighted by count — one shuffle on user_id, one on
      (src, dst);
    - per-edge share_e6 = w·10⁶ div out_weight(src), precomputed ONCE
      so the per-iteration multiply r·share stays under 64 bits at any
      scale (r ≤ 10¹², share ≤ 10⁶);
    - 3 power iterations, damping 0.85, all in integer div/mod:
      r' = 15·10¹²/(100·N) + 85·Σ(r·share/10⁶)/100.

    Scale posture: each iteration is one join (rank table × edges) +
    one partial-aggregable groupBy(dst). The rank/out-weight/contrib
    sides are all bounded by the NODE VOCABULARY (event types), not
    the event count, so they carry explicit broadcast hints — this is
    the structural-boundedness case where a hint is correct, unlike
    the data-dependent build side the q69 ADVICE item removed one
    from (without the hint, Catalyst's pre-AQE size estimate scales
    with the input scan and plans 17 SMJs at 100× facts — caught by
    scale_smoke_100x). A web-scale-graph variant (rank table ~nodes,
    not a vocabulary) would drop the hints and shuffle. The loop
    unrolls into a single plan — no driver-side collect between
    rounds. Dangling nodes are absent by construction here (every
    event type both sends and receives); a general build would add
    the dangling mass redistribution term."""
    e = _t(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # round-13 (guide §5): the transition-count table is vocabulary²-
    # sized but derives from the full event window — and it feeds the
    # node count action plus every unrolled iteration's share join
    # (~8 subtree references). Materialize it once.
    edges = (
        e.withColumn("src", F.lag("event_type").over(w_ord))
        .where(F.col("src").isNotNull())
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=True)
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    share = (
        edges.join(F.broadcast(outw), "src")
        .select("src", "dst", F.expr("w * 1000000 div ow").alias("share_e6"))
    )
    nodes = share.select(F.col("src").alias("node")).union(
        share.select("dst")
    ).distinct()
    n = nodes.count()  # bounded: the node-type vocabulary, not the events
    ranks = nodes.select(
        "node", F.lit(10**12 // n).cast("long").alias("r")
    )
    for _ in range(3):
        contrib = (
            share.join(F.broadcast(ranks), share["src"] == ranks["node"])
            .select("dst", F.expr("r * share_e6 div 1000000").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            F.broadcast(contrib), nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit(15 * 10**12 // (100 * n))
                + F.expr("85 * coalesce(s, 0) div 100")
            ).cast("long").alias("r"),
        )
    return ranks.select(F.col("node").alias("event_type"), F.col("r").alias("rank_e12"))


RELATIONAL_QUERIES["q100_pagerank"] = q100_pagerank


def _pagerank_oracle() -> str:
    base = (
        "WITH lagged AS ("
        "  SELECT user_id, event_type AS dst, LAG(event_type) OVER ("
        "    PARTITION BY user_id ORDER BY ts, event_id) AS src "
        "  FROM events), "
        "edges AS ("
        "  SELECT src, dst, COUNT(*) AS w FROM lagged "
        "  WHERE src IS NOT NULL GROUP BY src, dst), "
        "outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src), "
        "share AS ("
        "  SELECT e.src, e.dst, e.w * 1000000 // o.ow AS share_e6 "
        "  FROM edges e JOIN outw o ON e.src = o.src), "
        "nodes AS (SELECT src AS node FROM share "
        "  UNION SELECT dst FROM share), "
        "nn AS (SELECT COUNT(*) AS n FROM nodes), "
        "r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes, nn)"
    )
    it = (
        ", {next} AS ("
        "  SELECT nodes.node, "
        "    (15000000000000 // (100 * nn.n)) "
        "    + 85 * COALESCE(c.s, 0) // 100 AS r "
        "  FROM nodes CROSS JOIN nn LEFT JOIN ("
        "    SELECT s.dst, SUM(s.share_e6 * p.r // 1000000) AS s "
        "    FROM share s JOIN {prev} p ON s.src = p.node "
        "    GROUP BY s.dst) c ON nodes.node = c.dst)"
    )
    for i in range(3):
        base += it.format(next=f"r{i + 1}", prev=f"r{i}")
    return (
        base + " SELECT node AS event_type, CAST(r AS BIGINT) AS rank_e12 "
        "FROM r3"
    )


RELATIONAL_ORACLE["q100_pagerank"] = _pagerank_oracle()


def q101_pit_join(spark, sf_dir):
    """Point-in-time (PIT) join — each fact row matched to the dimension
    version that was valid WHEN THE FACT HAPPENED, the lookup every
    feature store / bitemporal warehouse needs and the reason SCD2
    intervals (q70) exist at all. Dim = scd2_build over the status
    events (signup/error = account-status changes); facts = purchases;
    match on valid_from ≤ ts < valid_to (half-open, so boundary facts
    match exactly one interval; pre-signup purchases keep NULL status
    via the left join).

    Scale shape: the join carries the EQUI key user_id plus the range
    predicate as a residual — Catalyst plans a sort-merge join on
    user_id with the interval test as a join-condition filter, NOT a
    nested loop (plan-asserted in tests/test_plans.py). Per-user
    interval counts are small (state-change cadence, not event
    cadence), so the residual scan per matched key is bounded; this is
    the cheaper plan than the q61-style bucketed interval join, which
    pays off only when intervals lack an equi key."""
    e = _t(spark, sf_dir, "events")
    status = e.where(F.col("event_type").isin("signup", "error"))
    dim = scd2_build(
        status, "user_id", ["ts", "event_id"], "event_type"
    ).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("status"),
        "valid_from", "valid_to",
    )
    facts = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("amount_cents"),
    )
    cond = (
        (facts["user_id"] == dim["d_user"])
        & (dim["valid_from"] <= facts["ts"])
        & (dim["valid_to"].isNull() | (facts["ts"] < dim["valid_to"]))
    )
    return facts.join(dim, cond, "left").select(
        "event_id", "user_id", "amount_cents", "status", "valid_from"
    )


RELATIONAL_QUERIES["q101_pit_join"] = q101_pit_join
RELATIONAL_ORACLE["q101_pit_join"] = (
    "WITH status AS ("
    "  SELECT * FROM events WHERE event_type IN ('signup', 'error')), "
    "chg AS ("
    "  SELECT user_id, event_type, ts, event_id, "
    "    CASE WHEN LAG(event_type) OVER "
    "      (PARTITION BY user_id ORDER BY ts, event_id) "
    "      IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg "
    "  FROM status), "
    "runs AS ("
    "  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, "
    "    event_id ROWS UNBOUNDED PRECEDING) AS run_id FROM chg), "
    "seg AS ("
    "  SELECT user_id, event_type, run_id, MIN(ts) AS valid_from "
    "  FROM runs GROUP BY 1, 2, 3), "
    "dim AS ("
    "  SELECT user_id, event_type AS status, valid_from, "
    "    LEAD(valid_from) OVER (PARTITION BY user_id "
    "      ORDER BY valid_from, run_id) AS valid_to "
    "  FROM seg) "
    "SELECT f.event_id, f.user_id, "
    "  CAST(ROUND(f.value * 100) AS BIGINT) AS amount_cents, "
    "  d.status, d.valid_from "
    "FROM events f LEFT JOIN dim d ON f.user_id = d.user_id "
    "  AND d.valid_from <= f.ts "
    "  AND (d.valid_to IS NULL OR f.ts < d.valid_to) "
    "WHERE f.event_type = 'purchase'"
)


def q102_skyline(spark, sf_dir):
    """2-D skyline (Pareto frontier) — the lineitems no other lineitem
    strictly dominates on (maximize l_extendedprice, maximize
    l_quantity): the multi-objective selection shape (best
    quality-vs-length docs, cheapest-vs-fastest suppliers) that has no
    SQL keyword and is usually written as a quadratic NOT EXISTS.

    The scalable exact form is the sort-scan: collapse to per-price
    max quantity (one shuffle, map-combinable), then a running max
    over prices DESCENDING — a point survives iff its max-quantity
    strictly exceeds the running max over all HIGHER prices (strict
    prefix, empty-prefix ⇒ survivor). The running max uses
    scale.distributed_prefix_max (two-phase bucket scan,
    inclusive=False) — NO global window anywhere, the same machinery
    as pipe_pps_sample's prefix sum with max as the monoid. A final
    join back to the (price, qty) counts recovers the tied rows at
    each frontier point. The oracle computes the identical frontier
    with DuckDB's native window — same algebra, independent engine."""
    from .scale import distributed_prefix_max

    li = _t(spark, sf_dir, "lineitem")
    pts = li.groupBy(
        F.col("l_extendedprice").alias("p"), F.col("l_quantity").alias("q")
    ).agg(F.count(F.lit(1)).alias("c"))
    pm = pts.groupBy("p").agg(F.max("q").alias("mq"))
    hm = distributed_prefix_max(
        pm, "p", "mq", out_col="hm", bucket_span=4096,
        descending=True, inclusive=False,
    )
    frontier = hm.where(
        F.col("hm").isNull() | (F.col("mq") > F.col("hm"))
    ).select(F.col("p").alias("fp"), F.col("mq").alias("fq"))
    return (
        frontier.join(
            pts,
            (F.col("fp") == F.col("p")) & (F.col("fq") == F.col("q")),
        )
        .select(
            F.col("fp").alias("l_extendedprice"),
            F.col("fq").alias("l_quantity"),
            F.col("c").cast("long").alias("n_rows"),
        )
    )


RELATIONAL_QUERIES["q102_skyline"] = q102_skyline
RELATIONAL_ORACLE["q102_skyline"] = (
    "WITH pts AS ("
    "  SELECT l_extendedprice AS p, l_quantity AS q, COUNT(*) AS c "
    "  FROM lineitem GROUP BY 1, 2), "
    "pm AS (SELECT p, MAX(q) AS mq FROM pts GROUP BY p), "
    "cm AS ("
    "  SELECT p, mq, MAX(mq) OVER (ORDER BY p DESC "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hm "
    "  FROM pm) "
    "SELECT cm.p AS l_extendedprice, cm.mq AS l_quantity, "
    "  CAST(pts.c AS BIGINT) AS n_rows "
    "FROM cm JOIN pts ON cm.p = pts.p AND cm.mq = pts.q "
    "WHERE cm.hm IS NULL OR cm.mq > cm.hm"
)


def q103_weighted_median(spark, sf_dir):
    """Weighted median per group — the order statistic where half the
    WEIGHT (not half the rows) lies at or below the answer; the robust
    location estimate a revenue-weighted pipeline wants (q41's
    percentiles are row-weighted). No SQL aggregate computes it; the
    scalable exact form is a per-group cumulative weight scan:

      median_w(g) = min{ v : 2·cumw(v) ≥ W(g) }

    computed the scale-correct way for LOW-CARDINALITY group keys
    (3 return flags here — a per-ROW window partitioned by group would
    funnel the whole fact table through 3 reducers): first collapse to
    per-(group, value) weight sums — a map-combinable aggregate, and
    collapsing equal values provably cannot move the crossing value —
    then run the cumulative scan over the COLLAPSED table, whose
    per-group size is the value cardinality (50 distinct quantities),
    not the row count. All weights in exact e4 integers so both
    engines agree to the bit. (A high-cardinality value domain would
    swap the per-group window for the bucketed two-phase scan of
    scale.distributed_prefix_sum.)"""
    li = _t(spark, sf_dir, "lineitem")
    w_e4 = F.round(F.col("l_extendedprice") * 10000).cast("long")
    base = li.select(
        "l_returnflag", F.col("l_quantity").alias("v"), w_e4.alias("w")
    )
    return weighted_median(base, "l_returnflag", "v", "w").select(
        "l_returnflag",
        F.col("weighted_median").alias("weighted_median_qty"),
        F.col("total_weight").alias("total_weight_e4"),
    )


def weighted_median(
    df: DataFrame, group_col: str, value_col: str, weight_col: str
) -> DataFrame:
    """The reusable scan behind q103: collapse to per-(group, value)
    weight sums, cumulative-scan the collapsed table, take the first
    value whose cumulative weight reaches half the total. Property-
    tested against an imperative fold in tests/test_properties.py."""
    vals = df.groupBy(group_col, F.col(value_col).alias("v")).agg(
        F.sum(weight_col).alias("vw")
    )
    cw = Window.partitionBy(group_col).orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = vals.withColumn("cumw", F.sum("vw").over(cw))
    totals = vals.groupBy(group_col).agg(F.sum("vw").alias("tw"))
    return (
        cum.join(F.broadcast(totals), group_col)
        .where(2 * F.col("cumw") >= F.col("tw"))
        .groupBy(group_col)
        .agg(
            F.min("v").alias("weighted_median"),
            F.max("tw").alias("total_weight"),
        )
    )


RELATIONAL_QUERIES["q103_weighted_median"] = q103_weighted_median
RELATIONAL_ORACLE["q103_weighted_median"] = (
    "WITH vals AS ("
    "  SELECT l_returnflag, l_quantity AS v, "
    "    CAST(SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)) "
    "      AS BIGINT) AS vw "
    "  FROM lineitem GROUP BY 1, 2), "
    "cum AS ("
    "  SELECT *, SUM(vw) OVER (PARTITION BY l_returnflag "
    "    ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumw "
    "  FROM vals), "
    "tot AS (SELECT l_returnflag, CAST(SUM(vw) AS BIGINT) AS tw "
    "  FROM vals GROUP BY 1) "
    "SELECT c.l_returnflag, MIN(c.v) AS weighted_median_qty, "
    "  CAST(MAX(t.tw) AS BIGINT) AS total_weight_e4 "
    "FROM cum c JOIN tot t ON c.l_returnflag = t.l_returnflag "
    "WHERE 2 * c.cumw >= t.tw "
    "GROUP BY c.l_returnflag"
)


def q104_chi_square(spark, sf_dir):
    """Pearson chi-square independence test (returnflag × linestatus) —
    the categorical counterpart to q80's A/B z-readout: one fact scan
    to the contingency cells, then ALL marginals by windows over the
    CELL table (bounded by the category product, here 3×2 — never a
    second fact pass). Expected counts e_ij = row_i·col_j/N and the
    statistic derive from exact BIGINT cell counts in IEEE doubles;
    each CELL's contribution is floored to an e6 integer BEFORE the
    final sum, so the statistic is an integer sum — order-independent
    and bit-stable across partitionings (a raw double Σ over cells
    would sum in shuffle order and could flap the last bits run to
    run). Output: per-cell observed/expected plus the shared
    χ²_e6 = Σ⌊contrib·10⁶⌋ and degrees of freedom on every row."""
    e = _t(spark, sf_dir, "lineitem")
    cells = e.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("o")
    )
    w_all = Window.partitionBy()
    w_row = Window.partitionBy("l_returnflag")
    w_col = Window.partitionBy("l_linestatus")
    with_m = cells.select(
        "l_returnflag", "l_linestatus", "o",
        F.sum("o").over(w_row).alias("rt"),
        F.sum("o").over(w_col).alias("ct"),
        F.sum("o").over(w_all).alias("n"),
        # distinct window aggregates are unsupported in Spark —
        # collect_set over the (bounded) cell table is the idiom
        F.size(F.collect_set("l_returnflag").over(w_all)).alias("nr"),
        F.size(F.collect_set("l_linestatus").over(w_all)).alias("nc"),
    )
    exp = (F.col("rt") * F.col("ct")).cast("double") / F.col("n")
    contrib = (F.col("o") - exp) * (F.col("o") - exp) / exp
    scored = with_m.select(
        "l_returnflag", "l_linestatus", "o",
        F.floor(exp * 1000000).cast("long").alias("expected_e6"),
        F.floor(contrib * 1000000).cast("long").alias("_c_e6"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
    )
    return scored.select(
        "l_returnflag", "l_linestatus", "o", "expected_e6", "dof",
        F.sum("_c_e6").over(Window.partitionBy("dof"))
        .cast("long").alias("chi2_e6"),
    )


RELATIONAL_QUERIES["q104_chi_square"] = q104_chi_square
RELATIONAL_ORACLE["q104_chi_square"] = (
    "WITH cells AS ("
    "  SELECT l_returnflag, l_linestatus, COUNT(*) AS o "
    "  FROM lineitem GROUP BY 1, 2), "
    "m AS ("
    "  SELECT l_returnflag, l_linestatus, o, "
    "    SUM(o) OVER (PARTITION BY l_returnflag) AS rt, "
    "    SUM(o) OVER (PARTITION BY l_linestatus) AS ct, "
    "    SUM(o) OVER () AS n, "
    "    (SELECT COUNT(DISTINCT l_returnflag) FROM cells) AS nr, "
    "    (SELECT COUNT(DISTINCT l_linestatus) FROM cells) AS nc "
    "  FROM cells), "
    "s AS ("
    "  SELECT l_returnflag, l_linestatus, o, "
    "    CAST(FLOOR(CAST(rt * ct AS DOUBLE) / n * 1000000) AS BIGINT) "
    "      AS expected_e6, "
    "    CAST(FLOOR((o - CAST(rt * ct AS DOUBLE) / n) "
    "      * (o - CAST(rt * ct AS DOUBLE) / n) "
    "      / (CAST(rt * ct AS DOUBLE) / n) * 1000000) AS BIGINT) "
    "      AS c_e6, "
    "    CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof "
    "  FROM m) "
    "SELECT l_returnflag, l_linestatus, o, expected_e6, dof, "
    "  CAST(SUM(c_e6) OVER () AS BIGINT) AS chi2_e6 "
    "FROM s"
)


# --------------------------------------------------------------------------
# round 6: interval algebra, graph, order statistics
# --------------------------------------------------------------------------

def q105_interval_coverage(spark, sf_dir):
    """Per-user interval union (coverage): merge overlapping/touching
    event intervals into islands and report how much of the timeline
    each user's activity actually covers — the interval-algebra dual of
    q73's gap fill (there we filled the holes; here we measure the
    cover). Each event spans ``[ts, ts + (1 + event_id % 7) minutes]``
    (deterministic integer microseconds, so both engines agree to the
    bit).

    The merge is the classic distributed islands scan: within each
    user, an interval starts a NEW island iff its start lies strictly
    past the running ``max(end)`` of everything before it — a single
    partitioned window over ``user_id`` (one shuffle; no island can
    span users, so 100 TB parallelism is per-user and the hot-key bound
    is a user's own event count, the same bound q73 documents). Islands
    then collapse with one map-combinable aggregate.
    """
    # tz-free epoch micros: events.ts is TIMESTAMP_NTZ, so unix_micros
    # (TZ-typed) won't bind and unix_timestamp would re-interpret in the
    # session zone; timestampdiff against the NTZ epoch matches DuckDB's
    # epoch_us bit-for-bit regardless of session timezone
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        us.alias("s"),
        (us + (F.lit(1) + F.col("event_id") % 7) * F.lit(60_000_000))
        .alias("e"),
        "event_id",
    )
    return interval_union(ev, "user_id", "s", "e", "event_id").select(
        "user_id",
        F.col("n_intervals").alias("n_events"),
        "n_islands",
        F.col("covered").alias("covered_us"),
    )


def interval_union(
    df: DataFrame, key_col: str, start_col: str, end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """The reusable islands merge behind q105: per key, merge
    overlapping-or-touching [start, end] intervals and report interval
    count, island count, and total covered length. Merge rule: an
    interval opens a NEW island iff its start lies strictly past the
    running max(end) of every earlier interval (ordered by start,
    tiebreak). Property-tested against an imperative sweep in
    tests/test_properties.py."""
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(start_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(start_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = df.withColumn(
        "new_island",
        F.when(
            F.col(start_col) > F.coalesce(
                F.max(end_col).over(w_prev),
                F.lit(None).cast("long"),
            ),
            1,
        ).when(F.max(end_col).over(w_prev).isNull(), 1).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(w_run))
    islands = marked.groupBy(key_col, "island").agg(
        F.min(start_col).alias("i_start"), F.max(end_col).alias("i_end"),
        F.count(F.lit(1)).alias("n_iv"),
    )
    return islands.groupBy(key_col).agg(
        F.sum("n_iv").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("i_end") - F.col("i_start"))
        .cast("long").alias("covered"),
    )


RELATIONAL_QUERIES["q105_interval_coverage"] = q105_interval_coverage
RELATIONAL_ORACLE["q105_interval_coverage"] = (
    "WITH iv AS ("
    "  SELECT user_id, epoch_us(ts) AS s, "
    "    epoch_us(ts) + (1 + event_id % 7) * 60000000 AS e, event_id "
    "  FROM events), "
    "marked AS ("
    "  SELECT user_id, s, e, event_id, "
    "    CASE WHEN s > COALESCE(MAX(e) OVER ("
    "      PARTITION BY user_id ORDER BY s, event_id "
    "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) "
    "    THEN 1 ELSE 0 END AS new_island "
    "  FROM iv), "
    "isl AS ("
    "  SELECT user_id, s, e, "
    "    SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id "
    "      ROWS UNBOUNDED PRECEDING) AS island "
    "  FROM marked), "
    "g AS ("
    "  SELECT user_id, island, MIN(s) AS i_start, MAX(e) AS i_end, "
    "    COUNT(*) AS n_ev "
    "  FROM isl GROUP BY 1, 2) "
    "SELECT user_id, CAST(SUM(n_ev) AS BIGINT) AS n_events, "
    "  CAST(COUNT(*) AS BIGINT) AS n_islands, "
    "  CAST(SUM(i_end - i_start) AS BIGINT) AS covered_us "
    "FROM g GROUP BY user_id"
)


def q106_triangle_count(spark, sf_dir):
    """Exact triangle count over the part co-purchase graph (two parts
    are adjacent iff some order contains both) — the canonical
    distributed graph-analytics kernel beyond q100's PageRank.

    Scale shape is the degree-ordered orientation algorithm (Cohen's
    MapReduce form; also Schank-Wagner): orient every undirected edge
    from its (degree, id)-smaller endpoint to the larger, then count
    directed wedges u->v, v->w that close with an oriented edge u->w.
    Orientation counts each triangle exactly once AND caps every
    node's out-degree at O(sqrt(m)), so the wedge join's fan-out —
    the step that explodes on hub nodes in a naive a<b<c self-join —
    is bounded regardless of skew. Three shuffles total (pair build,
    wedge join, closure join); the degree table is node-sized and
    broadcastable until the graph itself is huge, at which point
    Catalyst's threshold flips it to sort-merge (same degradation
    story as q68).
    """
    return triangle_count(_copurchase_edges(spark, sf_dir))


def _copurchase_edges(spark, sf_dir) -> DataFrame:
    """Distinct co-purchase edges (a < b): two parts are adjacent iff
    some order contains both — the shared edge builder for the q106 /
    q124 triangle kernels.

    Round-13 optimization (guide §2.4 remove shuffles): the former
    distinct → self-join on l_orderkey → distinct planned THREE
    exchanges of the line/pair stream (measured 5.5 s of q106's 11 s).
    Now ONE exchange groups each order's distinct parts into a sorted
    array (collect_set — map-side partial aggregation), the C(n,2)
    pairs explode MAP-SIDE from the array (baskets are small, so the
    per-order expansion is constant work), and one distinct remains.
    Same edge set by construction: a<b ordering comes from the sorted
    array's index pairs."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .where(F.size("ps") >= 2)
    )
    # index-pair explode over the materialized array attribute (no
    # recomputed-expression-in-lambda trap: `ps` is an agg output).
    # sequence() guard: size >= 2 above, so sequence(1, n-1) ascends.
    # Round-14: the expansion expression is the shared
    # _sorted_array_pairs helper (also behind q79 / q117).
    return (
        baskets.select(F.explode(_sorted_array_pairs("ps")).alias("e"))
        .select("e.a", "e.b")
        .distinct()
    )


def _oriented_graph(edges: DataFrame):
    """Shared materialization step for the triangle kernels: checkpoint
    the (possibly expensive — fact-join-derived) edge list ONCE, then
    build the degree table and the degree-ordered orientation, also
    checkpointed. Without this, every downstream self-join re-executes
    the whole edge build — q124's plan carried 191 exchanges (~8 edge
    rebuilds) and localCheckpoint cut its warm wall from ~10 s to ~4 s
    at sf0.01. localCheckpoint (not .persist()) on purpose: persist
    registers in the session CacheManager and leaks across the bench's
    215 gates, while checkpointed blocks are freed by the
    ContextCleaner when the frame is released. On a real cluster the
    edge set is ≪ the fact table (distinct pairs), so materializing it
    is the 100 TB-correct trade; executor loss there wants reliable
    checkpointing or recompute-tolerant persist instead."""
    edges = edges.localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("a").alias("n"))
        .unionAll(edges.select(F.col("b").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    oriented = (
        edges.join(da, F.col("a") == F.col("da.n"))
        .join(db, F.col("b") == F.col("db.n"))
        .select(
            F.when(
                (F.col("da.d") < F.col("db.d"))
                | ((F.col("da.d") == F.col("db.d"))
                   & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            ).otherwise(
                F.struct(F.col("b").alias("u"), F.col("a").alias("v"))
            ).alias("e")
        )
        .select("e.u", "e.v")
        .localCheckpoint(eager=True)
    )
    return edges, deg, oriented


def _oriented_adjacency(oriented: DataFrame) -> DataFrame:
    """Per-node sorted out-neighbor arrays of the degree-oriented graph
    — every row's array is bounded at O(√m) elements by the
    orientation, so the adjacency table has node count rows and edge
    count total entries, with no unbounded row. Checkpointed: both
    attach joins read it."""
    return (
        oriented.groupBy(F.col("u").alias("n"))
        .agg(F.array_sort(F.collect_list("v")).alias("nb"))
        .localCheckpoint(eager=True)
    )


def _edge_triangles(oriented: DataFrame) -> DataFrame:
    """Round-13 optimization (guide §2.3/§2.4): per-oriented-edge
    triangle enumeration WITHOUT materializing the wedge stream. The
    former plan joined oriented⋈oriented into 49M wedge rows (sf0.1)
    and semi-joined them against the edge list — a 49M-row exchange
    plus its sort. Edge-centric form: attach each edge's endpoints'
    out-neighbor arrays and intersect — S = N⁺(u) ∩ N⁺(v) holds
    exactly the w closing u→v→w with u→w, so each triangle is counted
    once on its unique base edge. The shuffles move the edge stream
    (+ one O(√m)-bounded array per row), not the wedge stream;
    measured 5.3 s → 2.0 s for the count phase. Inner joins are
    correct: an endpoint missing from the adjacency table has no
    out-neighbors, so its edges close nothing.
    Returns (u, v, s, c): base edge, intersection array, |s| as long."""
    adj = _oriented_adjacency(oriented)
    return (
        oriented.join(
            adj.select(F.col("n").alias("u"), F.col("nb").alias("nu")),
            "u",
        )
        .join(
            adj.select(F.col("n").alias("v"), F.col("nb").alias("nv")),
            "v",
        )
        .select(
            "u", "v",
            F.array_intersect("nu", "nv").alias("s"),
        )
        .select(
            "u", "v", "s", F.size("s").cast("long").alias("c")
        )
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """The reusable degree-ordered triangle kernel behind q106:
    ``edges`` holds one row per UNDIRECTED edge as (a, b) with a < b,
    no duplicates, no self-loops. Returns a single row
    (n_nodes, n_edges, n_triangles). Property-tested against a brute-
    force combination check in tests/test_properties.py. The edge list
    and orientation are checkpoint-materialized once (_oriented_graph);
    triangle enumeration is the edge-centric intersection form
    (:func:`_edge_triangles` — round-13, no wedge materialization)."""
    edges, deg, oriented = _oriented_graph(edges)
    tri = _edge_triangles(oriented)
    # assemble the three scalars JOIN-FREE: tagged union of the 1-row
    # aggregates + one conditional aggregate. A crossJoin (or even a
    # constant-key equi join, which Catalyst folds back into a
    # cross join) would put a BroadcastNestedLoopJoin in an otherwise
    # NLJ-free plan and trip the scale smoke's blanket rule.
    u = (
        deg.agg(F.count(F.lit(1)).alias("v"))
        .select(F.lit("n_nodes").alias("m"), "v")
        .unionAll(
            edges.agg(F.count(F.lit(1)).alias("v"))
            .select(F.lit("n_edges").alias("m"), "v")
        )
        .unionAll(
            # coalesce: an edge set whose every edge closes nothing can
            # leave tri empty (inner adjacency joins drop such edges),
            # where the old semi-join count was 0, not NULL
            tri.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("v"))
            .select(F.lit("n_triangles").alias("m"), "v")
        )
    )
    return u.agg(
        *[
            F.max(F.when(F.col("m") == name, F.col("v")))
            .cast("long").alias(name)
            for name in ("n_nodes", "n_edges", "n_triangles")
        ]
    )


RELATIONAL_QUERIES["q106_triangle_count"] = q106_triangle_count
RELATIONAL_ORACLE["q106_triangle_count"] = (
    "WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
    "edges AS ("
    "  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b "
    "  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey "
    "  WHERE x.l_partkey < y.l_partkey), "
    "nodes AS (SELECT a AS n FROM edges UNION SELECT b FROM edges) "
    "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes, "
    "  (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges, "
    "  (SELECT CAST(COUNT(*) AS BIGINT) FROM edges e1 "
    "   JOIN edges e2 ON e1.b = e2.a "
    "   JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles"
)


def q107_mode_per_group(spark, sf_dir):
    """Exact per-group mode with a deterministic tie-break (highest
    count, then smallest value) — the categorical location statistic
    q103's weighted median doesn't cover. Scale-correct two-phase
    shape: collapse to per-(group, value) counts first (map-side
    combinable; the collapsed table is bounded by |groups| x |distinct
    values|, NOT row count), then a tiny partitioned window picks the
    winner. No fact-table window, no single reducer."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy(
        "l_returnflag", F.col("l_quantity").alias("v")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("v").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("v").alias("mode_qty"),
            F.col("cnt").cast("long").alias("mode_count"),
        )
    )


RELATIONAL_QUERIES["q107_mode_per_group"] = q107_mode_per_group
RELATIONAL_ORACLE["q107_mode_per_group"] = (
    "WITH c AS ("
    "  SELECT l_returnflag, l_quantity AS v, COUNT(*) AS cnt "
    "  FROM lineitem GROUP BY 1, 2), "
    "r AS ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag "
    "    ORDER BY cnt DESC, v ASC) AS rn FROM c) "
    "SELECT l_returnflag, v AS mode_qty, CAST(cnt AS BIGINT) AS mode_count "
    "FROM r WHERE rn = 1"
)


def q108_percentile_disc(spark, sf_dir):
    """Exact discrete percentiles (p50/p90/p99 of order totalprice, in
    integer cents) per order priority — distributed the same two-phase
    way as q103's weighted median: collapse the fact table to
    per-(group, value) counts (map-combinable; collapsing equal values
    cannot move any order statistic), cumulative-count the COLLAPSED
    table under a per-group window, then each percentile is the
    smallest value whose cumulative count reaches p% of the group —
    the integer predicate ``100*cum >= p*n`` exactly, no float ceil.
    One conditional-min aggregate emits all three percentiles in a
    single pass over the collapsed table."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    vals = o.groupBy(
        "o_orderpriority", cents.alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("o_orderpriority").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("o_orderpriority")
    cum = vals.select(
        "o_orderpriority", "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    def pick(p):
        return F.min(
            F.when(100 * F.col("cum") >= p * F.col("n"), F.col("v"))
        ).alias(f"p{p}_cents")
    return cum.groupBy("o_orderpriority").agg(
        pick(50), pick(90), pick(99),
        F.max("n").cast("long").alias("n_orders"),
    )


RELATIONAL_QUERIES["q108_percentile_disc"] = q108_percentile_disc
RELATIONAL_ORACLE["q108_percentile_disc"] = (
    "WITH vals AS ("
    "  SELECT o_orderpriority, "
    "    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v, COUNT(*) AS c "
    "  FROM orders GROUP BY 1, 2), "
    "cum AS ("
    "  SELECT o_orderpriority, v, "
    "    SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY v "
    "      ROWS UNBOUNDED PRECEDING) AS cum, "
    "    SUM(c) OVER (PARTITION BY o_orderpriority) AS n "
    "  FROM vals) "
    "SELECT o_orderpriority, "
    "  MIN(CASE WHEN 100 * cum >= 50 * n THEN v END) AS p50_cents, "
    "  MIN(CASE WHEN 100 * cum >= 90 * n THEN v END) AS p90_cents, "
    "  MIN(CASE WHEN 100 * cum >= 99 * n THEN v END) AS p99_cents, "
    "  CAST(MAX(n) AS BIGINT) AS n_orders "
    "FROM cum GROUP BY o_orderpriority"
)


def q109_regression_slope(spark, sf_dir):
    """Per-nation OLS fit (order totalprice vs customer account balance)
    from EXACT integer moments: one customer join (threshold-broadcast
    while small — see the hint note below), then a single
    map-combinable aggregate collects n, Σx, Σy, Σxy, Σx² as BIGINTs
    over integer cents — no second pass, no per-group window, no
    sampling. The closed form

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    is evaluated in doubles ONLY at the very end (the cross products
    would overflow BIGINT at ~2e20; converting the same exact int64
    moments to double is deterministic across engines, as is the IEEE
    arithmetic after it — the q104 pattern), and both slope and
    intercept are floored to e6 integers for the hash."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    x = F.round(F.col("c_acctbal") * 100).cast("long")
    y = F.round(F.col("o_totalprice") * 100).cast("long")
    # no broadcast HINT on the customer projection: customer SCALES
    # with SF, and a hint overrides the threshold (the round-5 ADVICE
    # trap). Below the threshold Catalyst broadcasts it unhinted
    # (plan-asserted); past it the flip to SMJ is the correct plan.
    j = o.join(
        c.select("c_custkey", "c_nationkey", x.alias("x")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("c_nationkey", "x", y.alias("y"))
    # Σxy/Σx² accumulate in DECIMAL(38,0): each cents×cents product fits
    # a long, but the per-nation SUM leaves int64 near 1e9 rows (q160
    # overflow class — the docstring's 2e20 note only covered the final
    # cross-products; the oracle's SUM promotes to HUGEINT)
    m = j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") \
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    den = nd * F.col("sxx").cast("double") \
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / nd
    return m.select(
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.col("n").cast("long").alias("n_orders"),
        F.floor(slope * 1_000_000).cast("long").alias("slope_e6"),
        F.floor(intercept * 1_000_000).cast("long").alias("intercept_e6"),
    )


RELATIONAL_QUERIES["q109_regression_slope"] = q109_regression_slope
RELATIONAL_ORACLE["q109_regression_slope"] = (
    "WITH j AS ("
    "  SELECT c_nationkey, "
    "    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x, "
    "    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y "
    "  FROM orders JOIN customer ON o_custkey = c_custkey), "
    "m AS ("
    "  SELECT c_nationkey, COUNT(*) AS n, "
    "    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
    "    CAST(SUM(x * y) AS BIGINT) AS sxy, "
    "    CAST(SUM(x * x) AS BIGINT) AS sxx "
    "  FROM j GROUP BY 1) "
    "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
    "  CAST(n AS BIGINT) AS n_orders, "
    "  CAST(FLOOR((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) "
    "    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) "
    "    * 1000000) AS BIGINT) AS slope_e6, "
    "  CAST(FLOOR((CAST(sy AS DOUBLE) "
    "    - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) "
    "      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) "
    "      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) "
    "    * 1000000) AS BIGINT) AS intercept_e6 "
    "FROM m"
)


def q110_pareto_cover(spark, sf_dir):
    """Pareto (80/20) coverage per region: the smallest number of
    customers whose revenue reaches 80% of the region's total. Facts
    collapse to per-customer revenue first (map-combinable, one fact
    shuffle on custkey); the ranking window then runs over the
    COLLAPSED customer table ordered by revenue desc — partitioned by
    region, which is low-cardinality by construction (5 groups; same
    documented caveat as q103: a high-cardinality grouping would swap
    the window for scale.distributed_prefix_sum's bucketed two-phase
    scan). A customer is NEEDED while the cumulative revenue BEFORE it
    is under 80% of the total — the integer predicate 5·prev < 4·total,
    no float thresholds."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .alias("rev")
    )
    # nation/region are bounded dims (hint-safe); the customer→region
    # map scales with SF, so it joins UNHINTED — threshold-broadcast
    # locally, SMJ at 100 TB (round-5 ADVICE rule)
    cust = rev.join(
        c.select("c_custkey", "c_nationkey")
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "r_name"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("r_name", "o_custkey", "rev")
    w_prev = (
        Window.partitionBy("r_name")
        .orderBy(F.col("rev").desc(), F.col("o_custkey").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("r_name")
    scanned = cust.select(
        "r_name", "rev",
        F.coalesce(F.sum("rev").over(w_prev), F.lit(0)).alias("prev"),
        F.sum("rev").over(w_all).alias("total"),
    )
    return scanned.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(
            F.when(5 * F.col("prev") < 4 * F.col("total"), 1).otherwise(0)
        ).cast("long").alias("n_cover_80"),
        F.max("total").cast("long").alias("total_rev_cents"),
    )


RELATIONAL_QUERIES["q110_pareto_cover"] = q110_pareto_cover
RELATIONAL_ORACLE["q110_pareto_cover"] = (
    "WITH rev AS ("
    "  SELECT o_custkey, "
    "    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "      AS rev "
    "  FROM orders GROUP BY 1), "
    "cust AS ("
    "  SELECT r_name, o_custkey, rev "
    "  FROM rev JOIN customer ON o_custkey = c_custkey "
    "  JOIN nation ON c_nationkey = n_nationkey "
    "  JOIN region ON n_regionkey = r_regionkey), "
    "scanned AS ("
    "  SELECT r_name, rev, "
    "    COALESCE(SUM(rev) OVER (PARTITION BY r_name "
    "      ORDER BY rev DESC, o_custkey ASC "
    "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev, "
    "    SUM(rev) OVER (PARTITION BY r_name) AS total "
    "  FROM cust) "
    "SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_customers, "
    "  CAST(SUM(CASE WHEN 5 * prev < 4 * total THEN 1 ELSE 0 END) "
    "    AS BIGINT) AS n_cover_80, "
    "  CAST(MAX(total) AS BIGINT) AS total_rev_cents "
    "FROM scanned GROUP BY r_name"
)


def q111_session_paths(spark, sf_dir):
    """Session path analysis: sessionize events per user (30-minute
    gap), take each session's first three event types IN ORDER, and
    count sessions per path string — the navigation-flow summary a
    product-analytics engine ships next to q63's funnel (the funnel
    fixes the step sequence; paths DISCOVER it).

    Order determinism without relying on collect_list ordering (which
    Spark does not guarantee across shuffles): number the first three
    events with a per-session window, then sort_array over (rn, type)
    structs — sorting inside the row is deterministic wherever the
    rows landed. Both windows partition on user_id/session, so the
    whole query is two user-keyed shuffles plus a bounded path count
    (≤ |event_type|³ groups)."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = (
        F.unix_timestamp("ts")
        - F.unix_timestamp(F.lag("ts").over(w_seq))
    )
    marked = e.withColumn(
        "new_sess",
        F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0),
    ).withColumn(
        "sid",
        F.sum("new_sess").over(
            w_seq.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    w_sess = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    first3 = (
        marked.withColumn("rn", F.row_number().over(w_sess))
        .where(F.col("rn") <= 3)
    )
    paths = first3.groupBy("user_id", "sid").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )


RELATIONAL_QUERIES["q111_session_paths"] = q111_session_paths
RELATIONAL_ORACLE["q111_session_paths"] = (
    "WITH marked AS ("
    "  SELECT user_id, ts, event_id, event_type, "
    "    CASE WHEN FLOOR(epoch(ts))::BIGINT - FLOOR(epoch(LAG(ts) OVER "
    "      (PARTITION BY user_id ORDER BY ts, event_id)))::BIGINT > 1800 "
    "      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "        IS NULL "
    "    THEN 1 ELSE 0 END AS new_sess "
    "  FROM events), "
    "sess AS ("
    "  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id "
    "    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid "
    "  FROM marked), "
    "first3 AS ("
    "  SELECT user_id, sid, event_type, "
    "    ROW_NUMBER() OVER (PARTITION BY user_id, sid "
    "      ORDER BY ts, event_id) AS rn "
    "  FROM sess QUALIFY rn <= 3), "
    "paths AS ("
    "  SELECT user_id, sid, "
    "    STRING_AGG(event_type, '>' ORDER BY rn) AS path "
    "  FROM first3 GROUP BY 1, 2) "
    "SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions "
    "FROM paths GROUP BY path"
)


def q112_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of two independent document rankers
    (length in chars vs token count) — the standard zero-training way
    to merge retrieval signals (hybrid BM25+vector search uses exactly
    this shape). Each ranker is a window partitioned BY LANGUAGE (never
    a global ORDER BY — the q22 single-reducer trap), and the fused
    score Σ⌊1e9/(60+rank)⌋ is summed in exact integers so the hash is
    bit-stable. Token counts come from regexp_count of non-space runs,
    which the two engines tokenize identically. Top-10 per language by
    (fused desc, doc_id) keeps the result bounded."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        F.regexp_count(F.col("text"), F.lit(r"\S+")).alias("n_tokens"),
    )
    w1 = Window.partitionBy("lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    w2 = Window.partitionBy("lang").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    ranked = d.select(
        "doc_id", "lang",
        F.row_number().over(w1).alias("r1"),
        F.row_number().over(w2).alias("r2"),
    )
    fused = ranked.select(
        "doc_id", "lang",
        (
            F.floor(F.lit(1_000_000_000) / (F.lit(60) + F.col("r1")))
            + F.floor(F.lit(1_000_000_000) / (F.lit(60) + F.col("r2")))
        ).cast("long").alias("fused_e9"),
    )
    w_top = Window.partitionBy("lang").orderBy(
        F.col("fused_e9").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") <= 10)
        .select("lang", F.col("rn").cast("long").alias("rn"),
                "doc_id", "fused_e9")
    )


RELATIONAL_QUERIES["q112_rrf_fusion"] = q112_rrf_fusion
RELATIONAL_ORACLE["q112_rrf_fusion"] = (
    "WITH d AS ("
    "  SELECT doc_id, lang, n_chars, "
    "    len(regexp_extract_all(text, '\\S+')) AS n_tokens "
    "  FROM documents), "
    "ranked AS ("
    "  SELECT doc_id, lang, "
    "    ROW_NUMBER() OVER (PARTITION BY lang "
    "      ORDER BY n_chars DESC, doc_id ASC) AS r1, "
    "    ROW_NUMBER() OVER (PARTITION BY lang "
    "      ORDER BY n_tokens DESC, doc_id ASC) AS r2 "
    "  FROM d), "
    "fused AS ("
    "  SELECT doc_id, lang, "
    "    CAST(FLOOR(1000000000 / (60 + r1)) "
    "      + FLOOR(1000000000 / (60 + r2)) AS BIGINT) AS fused_e9 "
    "  FROM ranked) "
    "SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id, fused_e9 FROM ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang "
    "    ORDER BY fused_e9 DESC, doc_id ASC) AS rn "
    "  FROM fused) WHERE rn <= 10"
)


def q113_null_semantics(spark, sf_dir):
    """NOT IN vs NOT EXISTS under NULLs — the classic three-valued-
    logic trap, proven in the hash signal. The probe key is nullable
    by construction (NULLIF(o_custkey % 100, 0)); the exclusion list is
    null-free (a NULL in it would empty the NOT IN result entirely).
    ANSI semantics: a NULL probe key makes ``key NOT IN (...)`` UNKNOWN
    → the row is dropped; ``NOT EXISTS`` with an equality predicate
    finds no match for NULL → the row is KEPT. Spark plans the NOT IN
    as a null-aware anti join (NAAJ — broadcast-only strategy in
    Spark: the build side must fit, which it does here and generally
    for exclusion lists; an unbounded exclusion side should be
    rewritten as the NOT EXISTS form, which plans as a regular
    shuffled anti join). Output: both counts plus the null-probe row
    count, one row."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # fixed names + createOrReplace ⇒ reruns are idempotent (no view
    # accumulation across driver replays / best-of-2 bench runs)
    ov, cv = "q113_orders_probe", "q113_customer_excl"
    o.createOrReplaceTempView(ov)
    c.createOrReplaceTempView(cv)
    return spark.sql(f"""
        WITH probe AS (
          SELECT NULLIF(o_custkey % 100, 0) AS k FROM {ov}
        ), excl AS (
          SELECT DISTINCT c_custkey % 100 AS k FROM {cv}
          WHERE c_acctbal < -500 AND c_custkey % 100 <> 0
        )
        SELECT
          CAST((SELECT COUNT(*) FROM probe
                WHERE k NOT IN (SELECT k FROM excl)) AS BIGINT)
            AS n_not_in,
          CAST((SELECT COUNT(*) FROM probe p
                WHERE NOT EXISTS (SELECT 1 FROM excl e WHERE e.k = p.k))
            AS BIGINT) AS n_not_exists,
          CAST((SELECT COUNT(*) FROM probe WHERE k IS NULL) AS BIGINT)
            AS n_null_probe
    """)


RELATIONAL_QUERIES["q113_null_semantics"] = q113_null_semantics
RELATIONAL_ORACLE["q113_null_semantics"] = (
    "WITH probe AS ("
    "  SELECT NULLIF(o_custkey % 100, 0) AS k FROM orders), "
    "excl AS ("
    "  SELECT DISTINCT c_custkey % 100 AS k FROM customer "
    "  WHERE c_acctbal < -500 AND c_custkey % 100 <> 0) "
    "SELECT "
    "  CAST((SELECT COUNT(*) FROM probe "
    "        WHERE k NOT IN (SELECT k FROM excl)) AS BIGINT) AS n_not_in, "
    "  CAST((SELECT COUNT(*) FROM probe p "
    "        WHERE NOT EXISTS (SELECT 1 FROM excl e WHERE e.k = p.k)) "
    "    AS BIGINT) AS n_not_exists, "
    "  CAST((SELECT COUNT(*) FROM probe WHERE k IS NULL) AS BIGINT) "
    "    AS n_null_probe"
)


def q114_cohort_ltv(spark, sf_dir):
    """Cohort LTV matrix: customers cohorted by first-order month, each
    cohort's revenue laid out by months-since-first-order, with the
    running (cumulative) LTV per cohort — the canonical retention-
    economics readout over q64's retention triangle (there: user
    counts; here: money, cumulated).

    One fact shuffle total on o_custkey: the first-order aggregate and
    the self-join that attaches it group/join on the same key, so the
    exchange is reused. Calendar math stays in integer year·12+month
    space (no timezone, no date_trunc dialect drift), revenue in exact
    cents, and the cumulative window runs over the COLLAPSED
    cohort×age matrix (bounded by months², not fact rows)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .alias("ym"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("rev"),
    )
    firsts = o.groupBy("o_custkey").agg(F.min("ym").alias("fym"))
    cells = (
        o.join(firsts, "o_custkey")
        .groupBy(
            F.col("fym").alias("cohort_ym"),
            (F.col("ym") - F.col("fym")).alias("age_months"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("rev").alias("rev_cents"),
        )
    )
    w_cum = Window.partitionBy("cohort_ym").orderBy("age_months").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return cells.select(
        F.col("cohort_ym").cast("long").alias("cohort_ym"),
        F.col("age_months").cast("long").alias("age_months"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("rev_cents").cast("long").alias("rev_cents"),
        F.sum("rev_cents").over(w_cum).cast("long").alias("cum_rev_cents"),
    )


RELATIONAL_QUERIES["q114_cohort_ltv"] = q114_cohort_ltv
RELATIONAL_ORACLE["q114_cohort_ltv"] = (
    "WITH o AS ("
    "  SELECT o_custkey, "
    "    YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS ym, "
    "    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS rev "
    "  FROM orders), "
    "firsts AS (SELECT o_custkey, MIN(ym) AS fym FROM o GROUP BY 1), "
    "cells AS ("
    "  SELECT fym AS cohort_ym, o.ym - fym AS age_months, "
    "    COUNT(*) AS n_orders, CAST(SUM(rev) AS BIGINT) AS rev_cents "
    "  FROM o JOIN firsts USING (o_custkey) GROUP BY 1, 2) "
    "SELECT CAST(cohort_ym AS BIGINT) AS cohort_ym, "
    "  CAST(age_months AS BIGINT) AS age_months, "
    "  CAST(n_orders AS BIGINT) AS n_orders, rev_cents, "
    "  CAST(SUM(rev_cents) OVER (PARTITION BY cohort_ym "
    "    ORDER BY age_months ROWS UNBOUNDED PRECEDING) AS BIGINT) "
    "    AS cum_rev_cents "
    "FROM cells"
)


def q115_last_touch_attribution(spark, sf_dir):
    """Last-touch revenue attribution: each order's revenue is credited
    to the user's latest event at-or-before the order date (the
    marketing-attribution join every growth stack runs) — an AS-OF join
    by construction, so this gate reuses operators/asof.py's
    union-merge-scan (one shuffle on the user key, no inequality
    nested-loop; the naive SQL form the oracle runs is the O(orders ×
    events-per-user) expansion this plan avoids). The right side is
    deduplicated to one event per (user, ts) keeping the max event_id
    first, making the tie-break deterministic in both engines. Orders
    whose customer has no prior events credit to '(none)'."""
    from .asof import asof_join

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("rev"),
    )
    e = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max(F.struct("event_id", "event_type")).alias("m"))
        .select("user_id", "ts", F.col("m.event_type").alias("event_type"))
    )
    attributed = asof_join(
        o, e, by=["user_id"], left_on="ts", right_on="ts",
        right_cols=["event_type"], direction="backward",
    )
    return attributed.groupBy(
        F.coalesce(F.col("event_type"), F.lit("(none)")).alias("channel")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("rev").cast("long").alias("rev_cents"),
    )


RELATIONAL_QUERIES["q115_last_touch_attribution"] = q115_last_touch_attribution
RELATIONAL_ORACLE["q115_last_touch_attribution"] = (
    "WITH e AS ("
    "  SELECT user_id, ts, "
    "    arg_max(event_type, event_id) AS event_type "
    "  FROM events GROUP BY 1, 2), "
    "ranked AS ("
    "  SELECT o.o_orderkey, "
    "    CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS rev, "
    "    e.event_type, "
    "    ROW_NUMBER() OVER (PARTITION BY o.o_orderkey "
    "      ORDER BY e.ts DESC NULLS LAST) AS rn "
    "  FROM orders o LEFT JOIN e "
    "    ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate) "
    "SELECT COALESCE(event_type, '(none)') AS channel, "
    "  CAST(COUNT(*) AS BIGINT) AS n_orders, "
    "  CAST(SUM(rev) AS BIGINT) AS rev_cents "
    "FROM ranked WHERE rn = 1 GROUP BY 1"
)


def q116_rolling_slope(spark, sf_dir):
    """Rolling (trailing-90-day) OLS trend per nation — q109's closed-
    form fit turned into a moving window: collapse orders to one
    (nation, day, revenue) row first (map-combinable; the window then
    runs over the COLLAPSED daily series, bounded by nations × days,
    not order rows), then accumulate n, Σx, Σy, Σxy, Σx² with a RANGE
    frame over integer day numbers — RANGE, not ROWS, so missing days
    genuinely age out of the window. Days are centered on 2024-01-01,
    which keeps every cross-moment exactly representable (BIGINT and
    double-exact even at 100× daily revenue); the final ratio is the
    only double op, identical IEEE in both engines (q109's argument).
    Output: one row per (nation, day) with the trailing slope in
    cents/day, floored to e2."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    daily = (
        o.join(
            # unhinted: customer scales with SF (round-5 ADVICE rule);
            # the threshold broadcasts it while small
            c.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "c_nationkey",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("2024-01-01").cast("date"),
            ).alias("x"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("y")
        )
    )
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("x")
        .rangeBetween(-89, 0)
    )
    m = daily.select(
        "c_nationkey", "x", "y",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    ).withColumn(
        # num/den in DECIMAL(38,0): n·sxy and sx·sy pass int64 near
        # 10× the 100 TB point (cents-scale sums × a 90-day window —
        # q160 overflow-class margin too thin to leave in longs); the
        # slope ratio converts to double once, as before
        "num",
        F.col("n").cast("decimal(38,0)") * F.col("sxy")
        - F.col("sx").cast("decimal(38,0)") * F.col("sy"),
    ).withColumn(
        "den",
        F.col("n").cast("decimal(38,0)") * F.col("sxx")
        - F.col("sx").cast("decimal(38,0)") * F.col("sx"),
    )
    return m.select(
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.col("x").cast("long").alias("day_x"),
        F.col("y").cast("long").alias("rev_cents"),
        F.col("n").cast("long").alias("n_days_window"),
        F.when(
            F.col("den") != 0,
            F.floor(
                F.col("num").cast("double") / F.col("den").cast("double")
                * 100
            ),
        ).cast("long").alias("slope_e2"),
    )


RELATIONAL_QUERIES["q116_rolling_slope"] = q116_rolling_slope
RELATIONAL_ORACLE["q116_rolling_slope"] = (
    "WITH daily AS ("
    "  SELECT c_nationkey, "
    "    CAST(CAST(o_orderdate AS DATE) - DATE '2024-01-01' AS BIGINT) "
    "      AS x, "
    "    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "      AS y "
    "  FROM orders JOIN customer ON o_custkey = c_custkey "
    "  GROUP BY 1, 2), "
    "m AS ("
    "  SELECT c_nationkey, x, y, "
    "    COUNT(*) OVER w AS n, SUM(x) OVER w AS sx, SUM(y) OVER w AS sy, "
    "    SUM(x * y) OVER w AS sxy, SUM(x * x) OVER w AS sxx "
    "  FROM daily "
    "  WINDOW w AS (PARTITION BY c_nationkey ORDER BY x "
    "    RANGE BETWEEN 89 PRECEDING AND CURRENT ROW)), "
    "s AS ("
    "  SELECT c_nationkey, x, y, n, "
    "    CAST(n * sxy - sx * sy AS BIGINT) AS num, "
    "    CAST(n * sxx - sx * sx AS BIGINT) AS den "
    "  FROM m) "
    "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
    "  x AS day_x, y AS rev_cents, CAST(n AS BIGINT) AS n_days_window, "
    "  CASE WHEN den <> 0 THEN CAST(FLOOR("
    "    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 100) AS BIGINT) "
    "  END AS slope_e2 "
    "FROM s"
)


def q117_association_rules(spark, sf_dir):
    """Market-basket association rules (support / confidence / lift)
    from exact counts — the decision layer on top of q79's raw
    co-occurrence. Baskets are orders; the pair join is basket-bounded
    (TPC-H caps lines per order at 7, and at scale the same bound
    comes from capping basket size before pairing — q79's documented
    guard), item frequencies join back broadcast-until-big. Every
    reported metric is INTEGER arithmetic end to end: confidence and
    lift are floored e6 ratios of BIGINT products, so the hash is
    platform-exact with no float division anywhere. Rules are emitted
    in both directions for pairs seen ≥ 2 times.

    Round-14 optimization (guide §2.4, the q79 basket-explode recipe):
    the former distinct li fed THREE consumers (n_baskets count action,
    item counts, and a self-join pair count) — three exchanges plus a
    sort-merge join. Now ONE exchange builds per-order sorted
    distinct-part arrays (collect_set dedups in the aggregate), the
    basket table is checkpoint-materialized once for its three
    consumers, and items / pairs both derive map-side from the arrays:
    n_baskets = basket rows, n_item = one explode + count, n_ab = the
    C(n,2) struct explode + count. No join of the line stream against
    itself anywhere; equivalence vs the self-join form pinned in
    tests/test_optimization_r14.py."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = truncate_lineage(
        li.groupBy("l_orderkey").agg(
            F.array_sort(F.collect_set("l_partkey")).alias("ps")
        )
    )
    n_baskets = baskets.count()
    item = (
        baskets.select(F.explode("ps").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    pairs = (
        baskets.where(F.size("ps") >= 2)
        .select(F.explode(_sorted_array_pairs("ps")).alias("e"))
        .groupBy(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    directed = pairs.select("a", "b", "n_ab").unionAll(
        pairs.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "n_ab"
        )
    )
    ia, ib = item.alias("ia"), item.alias("ib")
    joined = (
        directed.join(ia, F.col("a") == F.col("ia.item"))
        .join(ib, F.col("b") == F.col("ib.item"))
        .select(
            "a", "b", "n_ab",
            F.col("ia.n_item").alias("n_a"),
            F.col("ib.n_item").alias("n_b"),
        )
    )
    return joined.select(
        F.col("a").alias("antecedent"),
        F.col("b").alias("consequent"),
        F.col("n_ab").cast("long").alias("n_ab"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.floor(F.lit(1_000_000) * F.col("n_ab") / F.col("n_a"))
        .cast("long").alias("confidence_e6"),
        # DECIMAL(38,0) numerator (the q160/q165 overflow class, fixed
        # proactively in the round-8 sweep): 1e6·n_ab·n_baskets passes
        # int64 once pair-count × basket-count reaches ~9.2e12.
        # _floor_div_dec, not F.floor of the decimal division: the
        # decimal(38,6) quotient is HALF_UP-rounded before floor sees it
        # (round-8 ADVICE item — a fraction in [0.9999995, 1) floored
        # one high).
        _floor_div_dec(
            F.col("n_ab").cast("decimal(38,0)")
            * F.lit(1_000_000) * F.lit(n_baskets),
            F.col("n_a").cast("decimal(38,0)") * F.col("n_b"),
        ).alias("lift_e6"),
    )


RELATIONAL_QUERIES["q117_association_rules"] = q117_association_rules
RELATIONAL_ORACLE["q117_association_rules"] = (
    "WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
    "nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM li), "
    "item AS (SELECT l_partkey AS item, COUNT(*) AS n_item "
    "  FROM li GROUP BY 1), "
    "pairs AS ("
    "  SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS n_ab "
    "  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey "
    "    AND x.l_partkey < y.l_partkey "
    "  GROUP BY 1, 2 HAVING COUNT(*) >= 2), "
    "directed AS ("
    "  SELECT a, b, n_ab FROM pairs "
    "  UNION ALL SELECT b, a, n_ab FROM pairs) "
    "SELECT d.a AS antecedent, d.b AS consequent, "
    "  CAST(d.n_ab AS BIGINT) AS n_ab, "
    "  CAST(ia.n_item AS BIGINT) AS n_a, "
    "  CAST(ib.n_item AS BIGINT) AS n_b, "
    "  CAST(FLOOR(1000000 * d.n_ab / ia.n_item) AS BIGINT) "
    "    AS confidence_e6, "
    "  CAST(FLOOR(1000000 * d.n_ab * (SELECT n FROM nb) "
    "    / (ia.n_item * ib.n_item)) AS BIGINT) AS lift_e6 "
    "FROM directed d "
    "JOIN item ia ON d.a = ia.item JOIN item ib ON d.b = ib.item"
)


#: floor(1e6·log10(1+1/d)) for d = 1..9, precomputed in Python so
#: NEITHER engine evaluates a transcendental (log10 is not IEEE-pinned
#: across libm implementations; a constant table is)
_BENFORD_E6 = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757]


def q118_benford(spark, sf_dir):
    """Benford's-law screen over order totals — the forensic-accounting
    distribution test: leading-digit frequencies vs log10(1+1/d). The
    leading digit is extracted from the INTEGER cents rendered as a
    string (integer→string is locale-free and identical across
    engines; floor(v/10^floor(log10 v)) would hinge on libm rounding
    at powers of ten), expected frequencies come from a precomputed
    constant table, and observed shares are floored e6 integer ratios.
    One map-combinable aggregate over a single scan; 9 output rows."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    d = o.select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit")
    )
    w_all = Window.partitionBy()
    counted = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    benford = F.element_at(
        F.array(*[F.lit(v) for v in _BENFORD_E6]), F.col("digit").cast("int")
    )
    return counted.select(
        "digit",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.floor(
            F.lit(1_000_000) * F.col("n_orders")
            / F.sum("n_orders").over(w_all)
        ).cast("long").alias("observed_e6"),
        benford.cast("long").alias("benford_e6"),
    )


RELATIONAL_QUERIES["q118_benford"] = q118_benford
RELATIONAL_ORACLE["q118_benford"] = (
    "WITH d AS ("
    "  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) "
    "    AS VARCHAR), 1, 1) AS BIGINT) AS digit "
    "  FROM orders), "
    "c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1) "
    "SELECT digit, CAST(n AS BIGINT) AS n_orders, "
    "  CAST(FLOOR(1000000 * n / SUM(n) OVER ()) AS BIGINT) "
    "    AS observed_e6, "
    "  CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091 "
    "    WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181 "
    "    WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152 "
    "    WHEN 9 THEN 45757 END AS benford_e6 "
    "FROM c"
)


def q119_gini(spark, sf_dir):
    """Gini concentration coefficient of customer revenue per region —
    the inequality summary behind q110's Pareto cover (cover answers
    "how many customers reach 80%"; Gini summarizes the whole curve).
    Uses the rank formulation over revenue sorted ASCENDING:

        G = 2·Σ(i·x_i) / (n·Σx) − (n+1)/n

    with Σ(i·x_i) accumulated as an exact BIGINT under the same
    low-cardinality per-region window as q103/q110 (collapsed
    per-customer revenue, never the fact table; ranks over ties are
    made deterministic by the (rev, custkey) order — any tie order
    yields the same Σi·x since tied x are equal). Final ratio in
    doubles from exact moments, floored to e6."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n_ = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .alias("rev")
    )
    cust = rev.join(
        # same hint policy as q110: bounded dims hinted, the scaling
        # customer map threshold-decided
        c.select("c_custkey", "c_nationkey")
        .join(F.broadcast(n_.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "r_name"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("r_name", "o_custkey", "rev")
    w_rank = Window.partitionBy("r_name").orderBy(
        F.col("rev").asc(), F.col("o_custkey").asc()
    )
    ranked = cust.select(
        "r_name", "rev",
        F.row_number().over(w_rank).cast("long").alias("i"),
    )
    m = ranked.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("t"),
        # DECIMAL(38,0) accumulation: Σ(i·rev) ~ n²·rev/2 leaves int64
        # near n ~ 3e9 customers (q165's fix, applied to the unkeyed
        # original; the oracle's SUM promotes to HUGEINT)
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("rev")).alias("s"),
    )
    nd = F.col("n").cast("double")
    gini = (
        F.lit(2.0) * F.col("s").cast("double")
        / (nd * F.col("t").cast("double"))
        - (nd + 1.0) / nd
    )
    return m.select(
        "r_name",
        F.col("n").cast("long").alias("n_customers"),
        F.col("t").cast("long").alias("total_rev_cents"),
        F.floor(gini * 1_000_000).cast("long").alias("gini_e6"),
    )


RELATIONAL_QUERIES["q119_gini"] = q119_gini
RELATIONAL_ORACLE["q119_gini"] = (
    "WITH rev AS ("
    "  SELECT o_custkey, "
    "    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "      AS rev "
    "  FROM orders GROUP BY 1), "
    "cust AS ("
    "  SELECT r_name, o_custkey, rev "
    "  FROM rev JOIN customer ON o_custkey = c_custkey "
    "  JOIN nation ON c_nationkey = n_nationkey "
    "  JOIN region ON n_regionkey = r_regionkey), "
    "ranked AS ("
    "  SELECT r_name, rev, "
    "    ROW_NUMBER() OVER (PARTITION BY r_name "
    "      ORDER BY rev ASC, o_custkey ASC) AS i "
    "  FROM cust), "
    "m AS ("
    "  SELECT r_name, COUNT(*) AS n, CAST(SUM(rev) AS BIGINT) AS t, "
    "    CAST(SUM(i * rev) AS BIGINT) AS s "
    "  FROM ranked GROUP BY 1) "
    "SELECT r_name, CAST(n AS BIGINT) AS n_customers, "
    "  t AS total_rev_cents, "
    "  CAST(FLOOR((2.0 * s / (CAST(n AS DOUBLE) * t) "
    "    - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)) * 1000000) "
    "    AS BIGINT) AS gini_e6 "
    "FROM m"
)


def q120_spatial_grid_join(spark, sf_dir):
    """Spatial neighbor join on a uniform grid — the classic
    distributed proximity-pairs kernel (geohash/S2-cell bucketing in
    miniature): find all point pairs within radius r WITHOUT the
    quadratic cross join. Each point gets an integer grid cell
    (cell = coord // cellsize with cellsize ≥ r); the LEFT side is
    replicated into its 3×3 neighborhood, equi-joined on cell against
    the RIGHT side's home cell, and the exact squared distance (pure
    BIGINT micro-degrees, no floats) filters the candidates. With
    cellsize ≥ r every qualifying pair lands in exactly one
    (replica-cell == home-cell) match, so no dedup pass is needed
    beyond the a < b ordering. Replication factor is a constant 9 —
    at 100 TB the shuffle is 9× points, never points², and skew is
    bounded by the densest single cell.

    The testdata has no coordinates, so points are derived
    deterministically from md5 of the customer key (48-bit ints →
    micro-degrees in a 2°×2° region; both engines compute identical
    values via the pipeline hash idiom). The ORACLE is the naive
    quadratic join — an algebraically independent construction, so a
    hash match certifies the grid decomposition itself."""
    c = _t(spark, sf_dir, "customer")

    def h48(col, salt):
        return F.conv(
            F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))),
                        1, 12),
            16, 10,
        ).cast("bigint")

    cell = 100_000          # 0.1 degree in micro-degrees
    r2 = cell * cell        # radius == cellsize
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (h48(F.col("c_custkey"), "lat") % 2_000_000).alias("lat"),
        (h48(F.col("c_custkey"), "lon") % 2_000_000).alias("lon"),
    )
    return grid_neighbor_pairs(pts, cell, r2)


def grid_neighbor_pairs(pts: DataFrame, cell: int, r2: int) -> DataFrame:
    """The reusable grid kernel behind q120: ``pts`` holds
    (id, lat, lon) with NON-NEGATIVE integer coordinates; returns all
    (a < b) pairs with squared distance ≤ r2, where cell² ≥ r2 so the
    3×3 neighborhood is sufficient. Property-tested against the
    brute-force quadratic pairing in tests/test_properties.py.

    Round-13 optimization (guide §2.3): HALF-neighborhood replication.
    Any qualifying pair spans cells differing by at most 1 per axis, so
    each unordered cell pair only needs to be generated ONCE — the four
    forward offsets (0,1),(1,−1),(1,0),(1,1) cover every distinct
    neighboring cell pair in exactly one direction (the set contains no
    additive inverses), and (0,0) handles intra-cell pairs under the
    id < id tie rule. Replication factor 5 instead of 9: the shuffle
    carries 5× points, and the join emits ~5n_c² candidate rows per
    cell instead of 9n_c² (the dropped 4 offsets produced only rows the
    old a < b filter discarded). Output is identical: cross-cell pairs
    are emitted as (least, greatest)."""
    if cell * cell < r2:
        raise ValueError(f"cell² ({cell * cell}) must cover r2 ({r2})")
    spark = pts.sparkSession
    home = pts.select(
        "id", "lat", "lon",
        (F.col("lat") / cell).cast("long").alias("cx"),
        (F.col("lon") / cell).cast("long").alias("cy"),
    )
    # floor-div via cast is fine: lat/lon are non-negative here
    offsets = local_df(
        spark, [(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)], "dx long, dy long"
    )
    repl = home.crossJoin(F.broadcast(offsets)).select(
        F.col("id").alias("p"),
        F.col("lat").alias("plat"), F.col("lon").alias("plon"),
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
        ((F.col("dx") == 0) & (F.col("dy") == 0)).alias("home0"),
    )
    right = home.select(
        F.col("id").alias("q"),
        F.col("lat").alias("qlat"), F.col("lon").alias("qlon"),
        "cx", "cy",
    )
    pairs = repl.join(right, ["cx", "cy"]).where(
        ~F.col("home0") | (F.col("p") < F.col("q"))
    )
    d2 = (
        (F.col("plat") - F.col("qlat")) * (F.col("plat") - F.col("qlat"))
        + (F.col("plon") - F.col("qlon")) * (F.col("plon") - F.col("qlon"))
    )
    return pairs.select(
        F.least("p", "q").alias("a"),
        F.greatest("p", "q").alias("b"),
        d2.alias("dist2"),
    ).where(F.col("dist2") <= r2)


RELATIONAL_QUERIES["q120_spatial_grid_join"] = q120_spatial_grid_join
RELATIONAL_ORACLE["q120_spatial_grid_join"] = (
    "WITH pts AS ("
    "  SELECT c_custkey AS id, "
    "    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'lat'), 1, 12))"
    "      ::BIGINT % 2000000 AS lat, "
    "    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'lon'), 1, 12))"
    "      ::BIGINT % 2000000 AS lon "
    "  FROM customer) "
    "SELECT x.id AS a, y.id AS b, "
    "  CAST((x.lat - y.lat) * (x.lat - y.lat) "
    "    + (x.lon - y.lon) * (x.lon - y.lon) AS BIGINT) AS dist2 "
    "FROM pts x JOIN pts y ON x.id < y.id "
    "WHERE (x.lat - y.lat) * (x.lat - y.lat) "
    "  + (x.lon - y.lon) * (x.lon - y.lon) <= 10000000000"
)


def q121_tree_closure(spark, sf_dir):
    """Hierarchy flattening by POINTER DOUBLING — the O(log depth)
    rounds algorithm for transitive closure / org-chart / BOM rollup
    at scale (each round composes every node's known-ancestor pointer
    with that ancestor's own pointer, doubling the covered distance;
    a naive parent-walk needs depth rounds and a recursive CTE is
    sequential per path). The hierarchy is synthesized over the part
    table as a binary tree (parent = partkey // 2, root = 1) since the
    testdata has no native hierarchy; the ALGORITHM is the deliverable.

    Each round is one self-equi-join on the pointer key (shuffle on
    partkey-sized ints); 6 rounds cover depth 64 — far past any real
    catalog. Matches DuckDB's sequential WITH RECURSIVE walk — an
    algebraically independent construction (per-path recursion vs
    parallel doubling), so the hash match certifies the doubling
    composition including the uneven-depth tail where a pointer
    already rests at the root. Output: every part's root and depth."""
    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node")
    )
    state = p.select(
        "node",
        F.when(F.col("node") > 1, (F.col("node") / 2).cast("long"))
        .otherwise(F.lit(1)).alias("ptr"),
        F.when(F.col("node") > 1, F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("d"),
    )
    return pointer_doubling(state, rounds=6)


def pointer_doubling(state: DataFrame, rounds: int) -> DataFrame:
    """The reusable doubling kernel behind q121: ``state`` holds one
    row per node as (node, ptr, d) where ptr is the node's PARENT
    (d = 1) and roots point at THEMSELVES with d = 0 — the self-loop
    makes composition a fixpoint for finished chains. Each round
    composes every pointer with its target's pointer, doubling covered
    distance; ``rounds`` must satisfy 2^rounds ≥ max depth. Returns
    (node, root, depth). Property-tested against an imperative parent
    walk over random forests in tests/test_properties.py."""
    for _ in range(rounds):
        hop = state.select(
            F.col("node").alias("h_node"),
            F.col("ptr").alias("h_ptr"),
            F.col("d").alias("h_d"),
        )
        state = (
            state.join(hop, F.col("ptr") == F.col("h_node"))
            .select(
                "node",
                F.col("h_ptr").alias("ptr"),
                (F.col("d") + F.col("h_d")).alias("d"),
            )
        )
    return state.select(
        "node",
        F.col("ptr").alias("root"),
        F.col("d").alias("depth"),
    )


RELATIONAL_QUERIES["q121_tree_closure"] = q121_tree_closure
RELATIONAL_ORACLE["q121_tree_closure"] = (
    "WITH RECURSIVE walk(node, cur, d) AS ("
    "  SELECT p_partkey, p_partkey, 0 FROM part "
    "  UNION ALL "
    "  SELECT node, cur // 2, d + 1 FROM walk WHERE cur > 1) "
    "SELECT node, CAST(1 AS BIGINT) AS root, "
    "  CAST(MAX(d) AS BIGINT) AS depth "
    "FROM walk GROUP BY node"
)


def q122_mad_outliers(spark, sf_dir):
    """Robust outlier detection by median absolute deviation — the
    resistant alternative to q77's z-score (one wild value corrupts a
    mean/stddev fence; the MAD fence shrugs): per event type, median
    of value, then median of |value − median|, then count points
    beyond 3×MAD. Both medians run the q103 two-phase scan (collapse
    to per-(group, value) counts — map-combinable, bounded by the
    value domain — then a cumulative window over the COLLAPSED table
    with the integer crossing predicate 2·cum ≥ n). Values live in e4
    integers end to end, so deviations, fences, and counts are exact
    BIGINT arithmetic — no float compare anywhere. Three passes over
    collapsed tables, each shuffle bounded by |type| × |distinct
    value|, never row count."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 10000).cast("long").alias("v"),
    )

    def median_of(df, col):
        vals = df.groupBy("event_type", F.col(col).alias("mv")).agg(
            F.count(F.lit(1)).alias("c")
        )
        w_cum = Window.partitionBy("event_type").orderBy("mv").rowsBetween(
            Window.unboundedPreceding, 0
        )
        w_all = Window.partitionBy("event_type")
        cum = vals.select(
            "event_type", "mv",
            F.sum("c").over(w_cum).alias("cum"),
            F.sum("c").over(w_all).alias("n"),
        )
        return cum.where(2 * F.col("cum") >= F.col("n")).groupBy(
            "event_type"
        ).agg(F.min("mv").alias("med"))

    med = median_of(e, "v")
    dev = e.join(med, "event_type").select(
        "event_type", "v",
        F.abs(F.col("v") - F.col("med")).alias("d"),
        "med",
    )
    mad = median_of(dev.select("event_type", F.col("d").alias("v")), "v") \
        .select("event_type", F.col("med").alias("mad"))
    fenced = dev.join(mad, "event_type")
    return fenced.groupBy("event_type").agg(
        F.max("med").cast("long").alias("median_e4"),
        F.max("mad").cast("long").alias("mad_e4"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0)
        ).cast("long").alias("n_outliers"),
    )


RELATIONAL_QUERIES["q122_mad_outliers"] = q122_mad_outliers
RELATIONAL_ORACLE["q122_mad_outliers"] = (
    "WITH e AS ("
    "  SELECT event_type, CAST(ROUND(value * 10000) AS BIGINT) AS v "
    "  FROM events), "
    "m1v AS (SELECT event_type, v, COUNT(*) AS c FROM e GROUP BY 1, 2), "
    "m1c AS ("
    "  SELECT event_type, v, "
    "    SUM(c) OVER (PARTITION BY event_type ORDER BY v "
    "      ROWS UNBOUNDED PRECEDING) AS cum, "
    "    SUM(c) OVER (PARTITION BY event_type) AS n "
    "  FROM m1v), "
    "med AS ("
    "  SELECT event_type, MIN(v) AS med FROM m1c "
    "  WHERE 2 * cum >= n GROUP BY 1), "
    "dev AS ("
    "  SELECT e.event_type, e.v, ABS(e.v - med.med) AS d, med.med "
    "  FROM e JOIN med ON e.event_type = med.event_type), "
    "m2v AS (SELECT event_type, d, COUNT(*) AS c FROM dev GROUP BY 1, 2), "
    "m2c AS ("
    "  SELECT event_type, d, "
    "    SUM(c) OVER (PARTITION BY event_type ORDER BY d "
    "      ROWS UNBOUNDED PRECEDING) AS cum, "
    "    SUM(c) OVER (PARTITION BY event_type) AS n "
    "  FROM m2v), "
    "mad AS ("
    "  SELECT event_type, MIN(d) AS mad FROM m2c "
    "  WHERE 2 * cum >= n GROUP BY 1) "
    "SELECT dev.event_type, "
    "  CAST(MAX(dev.med) AS BIGINT) AS median_e4, "
    "  CAST(MAX(mad.mad) AS BIGINT) AS mad_e4, "
    "  CAST(COUNT(*) AS BIGINT) AS n_events, "
    "  CAST(SUM(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END) "
    "    AS BIGINT) AS n_outliers "
    "FROM dev JOIN mad ON dev.event_type = mad.event_type "
    "GROUP BY dev.event_type"
)


def q123_time_to_convert(spark, sf_dir):
    """Signup→purchase conversion-lag percentiles, DAY-granular — the
    activation metric a growth stack reads next to q63's funnel. Per
    user: first signup, then the first purchase AT/after it (equi join
    on user + min-aggregate over the time residual — never an
    inequality nested loop); the lag collapses to whole days, which
    BOUNDS the percentile table by the calendar span (q108's machinery
    then runs over ≤ a few hundred rows regardless of user count —
    that's what makes the exact percentile scale; a per-user-value
    percentile would grow with users and belongs to ntile_approx).
    Output: one row with cohort sizes and p50/p90 lag days."""
    e = _t(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    signup = e.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min(us).alias("s_us")
    )
    purch = e.where(F.col("event_type") == "purchase").select(
        "user_id", us.alias("p_us")
    )
    lag = (
        signup.join(purch, "user_id", "left")
        .groupBy("user_id", "s_us")
        .agg(
            F.min(
                F.when(F.col("p_us") >= F.col("s_us"), F.col("p_us"))
            ).alias("c_us")
        )
        .select(
            "user_id",
            ((F.col("c_us") - F.col("s_us")) / F.lit(86_400_000_000))
            .cast("long").alias("lag_days"),
        )
    )
    days = lag.where(F.col("lag_days").isNotNull()).groupBy("lag_days").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = Window.orderBy("lag_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    cum = days.select(
        "lag_days",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    pct = cum.select(
        F.min(
            F.when(100 * F.col("cum") >= 50 * F.col("n"), F.col("lag_days"))
        ).alias("p50_days"),
        F.min(
            F.when(100 * F.col("cum") >= 90 * F.col("n"), F.col("lag_days"))
        ).alias("p90_days"),
    )
    # join-free scalar assembly (see q106's note: even a constant-key
    # equi join folds back into a nested loop): tagged union + one
    # conditional aggregate
    u = (
        signup.agg(F.count(F.lit(1)).alias("v"))
        .select(F.lit("n_signup_users").alias("m"), "v")
        .unionAll(
            lag.where(F.col("lag_days").isNotNull())
            .agg(F.count(F.lit(1)).alias("v"))
            .select(F.lit("n_converted").alias("m"), "v")
        )
        .unionAll(pct.select(F.expr(
            "stack(2, 'p50_days', p50_days, 'p90_days', p90_days) "
            "AS (m, v)"
        )))
    )
    return u.agg(
        *[
            F.max(F.when(F.col("m") == name, F.col("v")))
            .cast("long").alias(name)
            for name in (
                "n_signup_users", "n_converted", "p50_days", "p90_days"
            )
        ]
    )


RELATIONAL_QUERIES["q123_time_to_convert"] = q123_time_to_convert
RELATIONAL_ORACLE["q123_time_to_convert"] = (
    "WITH signup AS ("
    "  SELECT user_id, MIN(epoch_us(ts)) AS s_us FROM events "
    "  WHERE event_type = 'signup' GROUP BY 1), "
    "lag AS ("
    "  SELECT s.user_id, "
    "    (MIN(CASE WHEN epoch_us(e.ts) >= s.s_us "
    "       THEN epoch_us(e.ts) END) - s.s_us) // 86400000000 "
    "      AS lag_days "
    "  FROM signup s LEFT JOIN events e "
    "    ON e.user_id = s.user_id AND e.event_type = 'purchase' "
    "  GROUP BY s.user_id, s.s_us), "
    "days AS ("
    "  SELECT lag_days, COUNT(*) AS c FROM lag "
    "  WHERE lag_days IS NOT NULL GROUP BY 1), "
    "cum AS ("
    "  SELECT lag_days, "
    "    SUM(c) OVER (ORDER BY lag_days ROWS UNBOUNDED PRECEDING) AS cum, "
    "    SUM(c) OVER () AS n "
    "  FROM days) "
    "SELECT "
    "  (SELECT CAST(COUNT(*) AS BIGINT) FROM signup) AS n_signup_users, "
    "  (SELECT CAST(COUNT(*) AS BIGINT) FROM lag "
    "   WHERE lag_days IS NOT NULL) AS n_converted, "
    "  MIN(CASE WHEN 100 * cum >= 50 * n THEN lag_days END) AS p50_days, "
    "  MIN(CASE WHEN 100 * cum >= 90 * n THEN lag_days END) AS p90_days "
    "FROM cum"
)


def q124_clustering_coefficient(spark, sf_dir):
    """Per-node local clustering coefficient over the q106 co-purchase
    graph — the node-level refinement of the global triangle count
    (graph-quality / community-density readout). Reuses the oriented
    wedge machinery: triangles are enumerated ONCE each as (u, v, w)
    via the same degree-ordered orientation (out-degree capped at
    O(sqrt(m)), so the wedge join survives hub skew exactly as q106's
    does), then every triangle credits its three corners — an
    unpivot + count, map-combinable. Coefficient is EXACT integer
    arithmetic: coeff_e6 = (2_000_000 * tri) // (d * (d - 1)) over the
    node's degree d from the undirected degree table. Output: the top
    20 nodes by (coeff_e6, node) — a TakeOrderedAndProject, no global
    sort."""
    edges, deg, oriented = _oriented_graph(_copurchase_edges(spark, sf_dir))
    # Round-13: triangles come from the edge-centric intersection form
    # (_edge_triangles — no 49M-row wedge materialization; see q106).
    # Corner crediting stays ONE explode in the same map pass: the base
    # edge's endpoints each get |S| (they sit in |S| triangles through
    # this edge) and every completing w gets 1 — identical per-node
    # totals to exploding each triangle's (u, v, w).
    tri = _edge_triangles(oriented)
    credits = tri.select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(F.col("u").alias("n"), F.col("c").alias("t")),
                    F.struct(F.col("v").alias("n"), F.col("c").alias("t")),
                ),
                F.transform(
                    "s",
                    lambda w: F.struct(
                        w.alias("n"), F.lit(1).cast("long").alias("t")
                    ),
                ),
            )
        ).alias("x")
    )
    tcnt = credits.groupBy(F.col("x.n").alias("n")).agg(
        F.sum("x.t").alias("t")
    )
    return (
        deg.where(F.col("d") >= 2)
        .join(tcnt, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("triangles"),
            # _floor_div_dec in DECIMAL(38,0), matching the oracle's
            # exact `//`: the former double division truncated-to-long,
            # which equals floor only while 2e6·tri stays under 2^53 —
            # the q109-q142 overflow class, eliminated here too
            _floor_div_dec(
                F.lit(2_000_000).cast("decimal(38,0)")
                * F.coalesce(F.col("t"), F.lit(0)),
                (F.col("d") * (F.col("d") - 1)).cast("decimal(38,0)"),
            ).alias("coeff_e6"),
        )
        .orderBy(F.col("coeff_e6").desc(), F.col("node").asc())
        .limit(20)
    )


RELATIONAL_QUERIES["q124_clustering_coefficient"] = q124_clustering_coefficient
RELATIONAL_ORACLE["q124_clustering_coefficient"] = (
    "WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
    "edges AS ("
    "  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b "
    "  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey "
    "  WHERE x.l_partkey < y.l_partkey), "
    "deg AS ("
    "  SELECT n, COUNT(*) AS d FROM ("
    "    SELECT a AS n FROM edges UNION ALL SELECT b FROM edges) "
    "  GROUP BY 1), "
    "tris AS ("
    "  SELECT e1.a AS u, e1.b AS v, e2.b AS w FROM edges e1 "
    "  JOIN edges e2 ON e2.a = e1.b "
    "  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b), "
    "corners AS ("
    "  SELECT u AS n FROM tris UNION ALL SELECT v FROM tris "
    "  UNION ALL SELECT w FROM tris), "
    "tcnt AS (SELECT n, COUNT(*) AS t FROM corners GROUP BY 1) "
    "SELECT deg.n AS node, CAST(deg.d AS BIGINT) AS degree, "
    "  CAST(COALESCE(tcnt.t, 0) AS BIGINT) AS triangles, "
    "  CAST((2000000 * COALESCE(tcnt.t, 0)) // (deg.d * (deg.d - 1)) "
    "    AS BIGINT) AS coeff_e6 "
    "FROM deg LEFT JOIN tcnt ON deg.n = tcnt.n WHERE deg.d >= 2 "
    "ORDER BY coeff_e6 DESC, node ASC LIMIT 20"
)


def q125_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic (URGENT vs LOW order
    totals) in EXACT integer arithmetic — distribution-drift detection
    for pipelines without any float CDF. KS = max over the pooled
    support of |F_a(x) − F_b(x)|; cross-multiplying removes the
    division: ks_num = max |cum_a·n_b − cum_b·n_a|, exact in longs.

    Scale shape: collapse to per-price-cent counts first (map-side
    combinable, support-bounded), then ONE distributed_prefix_sum pass
    over the collapsed support computes BOTH running counts — the two
    32-bit counters ride one 64-bit value (cnt_a·2^32 + cnt_b; each
    cumulative stays < 2^31 so the fields can't carry into each other)
    — no global window anywhere. The final max is a 1-row aggregate.

    Exact-integer DOMAIN (documented, not silent): the packed counters
    cap each class at 2^31 rows, and ks_num itself is ~n_a·n_b — past
    ~3e9 rows per class the LONG OUTPUT TYPE cannot represent the
    statistic, packed or not. Beyond that, run the same plan with two
    separate prefix-sum passes and a decimal cross-product, or accept
    the double ks_stat (the ks_num column is what forces the bound)."""
    from .scale import distributed_prefix_sum

    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("p"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0).alias("is_a"),
    )
    per_price = o.groupBy("p").agg(
        F.sum("is_a").alias("ca"),
        F.sum(F.lit(1) - F.col("is_a")).alias("cb"),
    ).withColumn(
        "packed", F.col("ca") * F.lit(1 << 32) + F.col("cb")
    )
    cum = distributed_prefix_sum(
        per_price, "p", "packed", out_col="cum_packed",
        bucket_span=1 << 16,
    ).select(
        # integer DIV, not float /: the double quotient loses exactness
        # once cum_packed exceeds 2^53 (cum_a ≳ 2^21) — the round-13
        # DIV-parity rule, same result below that, correct above it
        F.expr(f"cum_packed DIV {1 << 32}").alias("cum_a"),
        (F.col("cum_packed") % F.lit(1 << 32)).alias("cum_b"),
    )
    # totals fetched as TWO DRIVER LONGS — the prefix-sum ledger's own
    # bounded-driver-state contract. The former 1-row-broadcast join
    # planned a BroadcastNestedLoopJoin (no equi key), which the 100×
    # smoke's blanket rule bans; literals keep the final pass map-only.
    tot = cum.agg(F.max("cum_a"), F.max("cum_b")).collect()[0]
    n_a, n_b = int(tot[0]), int(tot[1])
    return (
        cum.agg(
            F.max(
                F.abs(
                    F.col("cum_a") * F.lit(n_b)
                    - F.col("cum_b") * F.lit(n_a)
                )
            ).cast("long").alias("ks_num"),
        )
        .select(
            F.lit(n_a).cast("long").alias("n_a"),
            F.lit(n_b).cast("long").alias("n_b"),
            "ks_num",
            F.round(
                F.col("ks_num") / F.lit(float(n_a) * float(n_b)), 6
            ).alias("ks_stat"),
        )
    )


RELATIONAL_QUERIES["q125_ks_test"] = q125_ks_test
RELATIONAL_ORACLE["q125_ks_test"] = (
    "WITH pc AS ("
    "  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS p, "
    "    SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) "
    "      AS ca, "
    "    SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS cb "
    "  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW') "
    "  GROUP BY 1), "
    "cum AS ("
    "  SELECT SUM(ca) OVER (ORDER BY p ROWS UNBOUNDED PRECEDING) AS cum_a, "
    "    SUM(cb) OVER (ORDER BY p ROWS UNBOUNDED PRECEDING) AS cum_b "
    "  FROM pc), "
    "tot AS (SELECT MAX(cum_a) AS na, MAX(cum_b) AS nb FROM cum) "
    "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, "
    "  CAST(MAX(ABS(cum_a * nb - cum_b * na)) AS BIGINT) AS ks_num, "
    "  ROUND(CAST(MAX(ABS(cum_a * nb - cum_b * na)) AS DOUBLE) "
    "    / (na * nb), 6) AS ks_stat "
    "FROM cum, tot GROUP BY na, nb"
)


def q126_hhi_concentration(spark, sf_dir):
    """Herfindahl-Hirschman market-concentration index per region:
    each nation's share of its region's order revenue, HHI = Σ share².
    The division happens ONCE at the end on exact integer moments —
    revenue collapses to per-(region, nation) BIGINT cents (one
    map-combinable agg over the fact join), squares accumulate in
    DECIMAL(38,0) (a nation's cents² exceeds 2^63 long before 100 TB),
    and hhi = numer/tot² converts the two exact integers to double in
    one deterministic rounding each. Dims (customer→nation→region)
    broadcast against the orders fact."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("rev_c"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    per_nation = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_nationkey")
        .agg(F.sum("rev_c").alias("nrev"))
    )
    return per_nation.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.sum("nrev").cast("long").alias("tot_rev_c"),
        F.round(
            F.sum(
                F.col("nrev").cast("decimal(38,0)") * F.col("nrev")
            ).cast("double")
            / (
                F.sum("nrev").cast("double") * F.sum("nrev").cast("double")
            ),
            6,
        ).alias("hhi"),
    )


RELATIONAL_QUERIES["q126_hhi_concentration"] = q126_hhi_concentration
RELATIONAL_ORACLE["q126_hhi_concentration"] = (
    "WITH per_nation AS ("
    "  SELECT r.r_name, c.c_nationkey, "
    "    SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS nrev "
    "  FROM orders o "
    "  JOIN customer c ON o.o_custkey = c.c_custkey "
    "  JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "  JOIN region r ON n.n_regionkey = r.r_regionkey "
    "  GROUP BY 1, 2) "
    "SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations, "
    "  CAST(SUM(nrev) AS BIGINT) AS tot_rev_c, "
    "  ROUND(CAST(SUM(nrev * nrev) AS DOUBLE) "
    "    / (CAST(SUM(nrev) AS DOUBLE) * CAST(SUM(nrev) AS DOUBLE)), 6) "
    "    AS hhi "
    "FROM per_nation GROUP BY r_name"
)


def q127_mutual_information(spark, sf_dir):
    """Mutual information between event type and hour-of-day — the
    dependence readout behind feature selection and drift monitors,
    computed as an integer sum of per-cell floored contributions
    (q104's chi-square discipline extended to a transcendental:
    term_e6 = floor(1e6 · (c_xy/N) · ln(c_xy·N / (c_x·c_y)))). Every
    ratio entering ln() is a division of exact sub-2^53 integers, so
    both engines evaluate ln of the SAME double; the e6 floor leaves
    three orders of magnitude between an ulp wobble and a flipped
    integer. The cell table is bounded (|types| × 24), built in one
    map-combinable aggregate; marginals come from windows over the
    bounded cell table, never the fact rows."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hh")
    )
    cells = e.groupBy("event_type", "hh").agg(
        F.count(F.lit(1)).alias("cxy")
    )
    wx = Window.partitionBy("event_type")
    wy = Window.partitionBy("hh")
    wn = Window.partitionBy()
    terms = cells.select(
        F.col("cxy"),
        F.sum("cxy").over(wx).alias("cx"),
        F.sum("cxy").over(wy).alias("cy"),
        F.sum("cxy").over(wn).alias("n"),
    ).select(
        # mi_term_e6 owns the operand-first double casts (the long×long
        # count-product overflow class) and the oracle-parity contract
        mi_term_e6(
            F.col("cxy"), F.col("cx"), F.col("cy"), F.col("n")
        ).alias("term_e6"),
        "n",
    )
    return terms.groupBy().agg(
        F.max("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("term_e6").cast("long").alias("mi_e6"),
    )


RELATIONAL_QUERIES["q127_mutual_information"] = q127_mutual_information
RELATIONAL_ORACLE["q127_mutual_information"] = (
    "WITH cells AS ("
    "  SELECT event_type, EXTRACT(hour FROM ts) AS hh, COUNT(*) AS cxy "
    "  FROM events GROUP BY 1, 2), "
    "m AS ("
    "  SELECT cxy, "
    "    SUM(cxy) OVER (PARTITION BY event_type) AS cx, "
    "    SUM(cxy) OVER (PARTITION BY hh) AS cy, "
    "    SUM(cxy) OVER () AS n "
    "  FROM cells) "
    "SELECT CAST(MAX(n) AS BIGINT) AS n_events, "
    "  CAST(COUNT(*) AS BIGINT) AS n_cells, "
    "  CAST(SUM(FLOOR(1000000 * (CAST(cxy AS DOUBLE) / n) "
    "    * LN((CAST(cxy AS DOUBLE) * n) / (CAST(cx AS DOUBLE) * cy)))) "
    "    AS BIGINT) AS mi_e6 "
    "FROM m"
)


def q128_trimmed_stats(spark, sf_dir):
    """Robust location per market segment: the 10%-trimmed mean of
    account balance — the outlier-resistant average q122's MAD flags
    feed into. Same two-phase order-statistic shape as q108: collapse
    to per-(segment, cents) counts, find the exact p10/p90 bounds on
    the collapsed table (integer predicate, no float ceil), then ONE
    more conditional aggregate over the same collapsed table computes
    the kept count and kept sum — the mean's division is the only
    float, rounded once. No fact-table window; the per-segment window
    runs over collapsed distinct values."""
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    vals = c.groupBy(
        "c_mktsegment", cents.alias("v")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("c_mktsegment").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("c_mktsegment")
    cum = vals.select(
        "c_mktsegment", "v", "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    bounds = cum.groupBy("c_mktsegment").agg(
        F.min(
            F.when(10 * F.col("cum") >= F.col("n"), F.col("v"))
        ).alias("lo_c"),
        F.min(
            F.when(10 * F.col("cum") >= 9 * F.col("n"), F.col("v"))
        ).alias("hi_c"),
    )
    kept = cum.join(F.broadcast(bounds), "c_mktsegment").where(
        (F.col("v") >= F.col("lo_c")) & (F.col("v") <= F.col("hi_c"))
    )
    return kept.groupBy("c_mktsegment").agg(
        F.max("lo_c").cast("long").alias("lo_c"),
        F.max("hi_c").cast("long").alias("hi_c"),
        F.sum("cnt").cast("long").alias("n_kept"),
        F.round(
            F.sum(F.col("v") * F.col("cnt")) / F.sum("cnt") / 100.0, 4
        ).alias("trimmed_mean"),
    )


RELATIONAL_QUERIES["q128_trimmed_stats"] = q128_trimmed_stats
RELATIONAL_ORACLE["q128_trimmed_stats"] = (
    "WITH vals AS ("
    "  SELECT c_mktsegment, "
    "    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v, COUNT(*) AS cnt "
    "  FROM customer GROUP BY 1, 2), "
    "cum AS ("
    "  SELECT c_mktsegment, v, cnt, "
    "    SUM(cnt) OVER (PARTITION BY c_mktsegment ORDER BY v "
    "      ROWS UNBOUNDED PRECEDING) AS cum, "
    "    SUM(cnt) OVER (PARTITION BY c_mktsegment) AS n "
    "  FROM vals), "
    "bounds AS ("
    "  SELECT c_mktsegment, "
    "    MIN(CASE WHEN 10 * cum >= n THEN v END) AS lo_c, "
    "    MIN(CASE WHEN 10 * cum >= 9 * n THEN v END) AS hi_c "
    "  FROM cum GROUP BY 1) "
    "SELECT cum.c_mktsegment, CAST(MAX(lo_c) AS BIGINT) AS lo_c, "
    "  CAST(MAX(hi_c) AS BIGINT) AS hi_c, "
    "  CAST(SUM(cnt) AS BIGINT) AS n_kept, "
    "  ROUND(CAST(SUM(v * cnt) AS DOUBLE) / SUM(cnt) / 100.0, 4) "
    "    AS trimmed_mean "
    "FROM cum JOIN bounds ON cum.c_mktsegment = bounds.c_mktsegment "
    "WHERE v >= lo_c AND v <= hi_c GROUP BY 1"
)


def q129_decile_lift(spark, sf_dir):
    """Decile lift table — the campaign-targeting readout: customers
    deciled by account balance WITHIN region (partitioned ntile: 5
    bounded partitions, the q22 caveat doesn't bite; the global form
    would ride ntile_approx_buckets), each decile's buyer rate
    against its region's overall rate as an exact integer lift
    (lift_e6 = 1e6·buyers·region_n // (n·region_buyers)). Buyer flags
    come from a distinct-key semi-ish aggregation of orders, joined
    broadcast (customer-bounded)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    buyers = (
        _t(spark, sf_dir, "orders").select("o_custkey").distinct()
        .withColumn("is_buyer", F.lit(1))
    )
    base = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(buyers, c["c_custkey"] == buyers["o_custkey"], "left")
        .select(
            "r_name", "bal_c", "c_custkey",
            F.coalesce(F.col("is_buyer"), F.lit(0)).alias("is_buyer"),
        )
    )
    w = Window.partitionBy("r_name").orderBy(
        F.col("bal_c").desc(), F.col("c_custkey").asc()
    )
    deciled = base.withColumn("decile", F.ntile(10).over(w))
    per_decile = deciled.groupBy("r_name", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_buyer").alias("buyers"),
    )
    w_r = Window.partitionBy("r_name")
    return per_decile.select(
        "r_name", "decile",
        F.col("n").cast("long").alias("n"),
        F.col("buyers").cast("long").alias("buyers"),
        # DECIMAL(38,0) numerator (q160/q165 overflow class, fixed
        # proactively): 1e6·buyers·region_n passes int64 at ~100×.
        # _floor_div_dec matches the oracle's exact `//` — a bare
        # decimal division HALF_UP-rounds at scale 6 before the long
        # cast truncates (round-8 ADVICE item).
        _floor_div_dec(
            F.col("buyers").cast("decimal(38,0)")
            * F.lit(1_000_000)
            * F.sum("n").over(w_r),
            F.col("n").cast("decimal(38,0)")
            * F.sum("buyers").over(w_r),
        ).alias("lift_e6"),
    )


RELATIONAL_QUERIES["q129_decile_lift"] = q129_decile_lift
RELATIONAL_ORACLE["q129_decile_lift"] = (
    "WITH base AS ("
    "  SELECT r.r_name, "
    "    CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal_c, "
    "    c.c_custkey, "
    "    CASE WHEN b.o_custkey IS NULL THEN 0 ELSE 1 END AS is_buyer "
    "  FROM customer c "
    "  JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "  JOIN region r ON n.n_regionkey = r.r_regionkey "
    "  LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) b "
    "    ON c.c_custkey = b.o_custkey), "
    "deciled AS ("
    "  SELECT r_name, is_buyer, NTILE(10) OVER ("
    "    PARTITION BY r_name ORDER BY bal_c DESC, c_custkey ASC) "
    "    AS decile "
    "  FROM base), "
    "per_decile AS ("
    "  SELECT r_name, decile, COUNT(*) AS n, SUM(is_buyer) AS buyers "
    "  FROM deciled GROUP BY 1, 2) "
    "SELECT r_name, decile, CAST(n AS BIGINT) AS n, "
    "  CAST(buyers AS BIGINT) AS buyers, "
    "  CAST((1000000 * buyers * SUM(n) OVER (PARTITION BY r_name)) "
    "    // (n * SUM(buyers) OVER (PARTITION BY r_name)) AS BIGINT) "
    "    AS lift_e6 "
    "FROM per_decile"
)


def q130_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint detection over the daily revenue series — the
    monitoring primitive for level shifts, in EXACT integer arithmetic
    (the q125 cross-multiplication again): the break statistic at day
    k is |n·S_k − k·S_n| (S = cumulative daily revenue cents, k = day
    index), maximized with a deterministic earliest-day tie-break.
    Revenue collapses to the bounded calendar spine first (one
    map-combinable agg; the cumulative window runs over ~2.4k day
    rows — the q99 day-spine bound, documented there), and the argmax
    is one conditional aggregate, not a sort."""
    o = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("rev_c"),
    )
    daily = o.groupBy("day").agg(F.sum("rev_c").alias("rev"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("k"),
        F.sum("rev").over(w).alias("s_k"),
    )
    # totals as TWO DRIVER LONGS (the day spine is calendar-bounded;
    # the former 1-row-broadcast joins planned BroadcastNestedLoopJoins
    # — the 100× smoke's blanket rule), and the argmax-with-earliest-
    # day tie-break is ONE struct extremum (stat desc, then min day via
    # negated epoch-day) — no peak self-join, no sort
    tot = cum.agg(F.max("k"), F.max("s_k")).collect()[0]
    n_days, s_n = int(tot[0]), int(tot[1])
    best = cum.select(
        F.struct(
            F.abs(
                F.lit(n_days) * F.col("s_k") - F.col("k") * F.lit(s_n)
            ).alias("stat"),
            (-F.unix_date("day")).alias("negd"),
        ).alias("cand")
    ).agg(F.max("cand").alias("b"))
    return best.select(
        F.date_from_unix_date(-F.col("b.negd")).alias("break_day"),
        F.col("b.stat").cast("long").alias("cusum_num"),
        F.lit(n_days).cast("long").alias("n_days"),
        F.lit(s_n).cast("long").alias("total_rev_c"),
    )


RELATIONAL_QUERIES["q130_cusum_changepoint"] = q130_cusum_changepoint
RELATIONAL_ORACLE["q130_cusum_changepoint"] = (
    "WITH daily AS ("
    "  SELECT CAST(o_orderdate AS DATE) AS day, "
    "    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev "
    "  FROM orders GROUP BY 1), "
    "cum AS ("
    "  SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS k, "
    "    SUM(rev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s_k "
    "  FROM daily), "
    "tot AS (SELECT MAX(k) AS n_days, MAX(s_k) AS s_n FROM cum), "
    "scored AS ("
    "  SELECT day, n_days, s_n, ABS(n_days * s_k - k * s_n) AS stat "
    "  FROM cum, tot) "
    "SELECT MIN(day) AS break_day, "
    "  CAST(MAX(stat) AS BIGINT) AS cusum_num, "
    "  CAST(MAX(n_days) AS BIGINT) AS n_days, "
    "  CAST(MAX(s_n) AS BIGINT) AS total_rev_c "
    "FROM scored WHERE stat = (SELECT MAX(stat) FROM scored)"
)


def q131_burstiness(spark, sf_dir):
    """Burstiness (Fano factor: variance-to-mean ratio of the daily
    count series) per event type — separates steady telemetry from
    bursty user behavior, and the standard overdispersion check before
    fitting anything Poisson. Two map-combinable aggregates: daily
    counts per (type, day), then exact integer moments per type —
    variance·n² = n·Σx² − (Σx)² stays in longs (counts are small
    integers), and the Fano ratio (nΣx² − (Σx)²) / (n·Σx) is the one
    float, rounded once. Days are the type's active days (zero-count
    days excluded — documented choice, keeps the spine join out)."""
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = e.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("x")
    )
    # moments accumulate in DECIMAL(38,0) (the long-sum flavor of the
    # q160 overflow class): Σx² of daily counts leaves int64 once a
    # type's daily volume reaches ~1e8 over a few-thousand-day spine —
    # the DuckDB oracle's SUM promotes to HUGEINT, so a long Spark sum
    # would silently diverge at 100 TB. One double conversion at the
    # ratio, mirroring the oracle's CAST(... AS DOUBLE).
    xd = F.col("x").cast("decimal(38,0)")
    nd = F.count(F.lit(1)).cast("decimal(38,0)")
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("n_events"),
        F.round(
            (nd * F.sum(xd * xd) - F.sum(xd) * F.sum(xd)).cast("double")
            / (nd * F.sum(xd)).cast("double"),
            6,
        ).alias("fano"),
    )


RELATIONAL_QUERIES["q131_burstiness"] = q131_burstiness
RELATIONAL_ORACLE["q131_burstiness"] = (
    "WITH daily AS ("
    "  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x "
    "  FROM events GROUP BY 1, 2) "
    "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days, "
    "  CAST(SUM(x) AS BIGINT) AS n_events, "
    "  ROUND(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE) "
    "    / (COUNT(*) * SUM(x)), 6) AS fano "
    "FROM daily GROUP BY event_type"
)


# --------------------------------------------------------------------------
# rank statistics: Mann-Whitney U / AUC, Spearman correlation
# --------------------------------------------------------------------------

def q132_mannwhitney_auc(spark, sf_dir):
    """Two-sample Mann-Whitney U (equivalently: exact ROC AUC of the
    grouping variable as a classifier score) over URGENT vs LOW order
    totals — the rank-based complement of q125's KS and q80's z-test,
    and THE standard exact evaluation metric for a ranking model.

    Exactness: everything rides DOUBLED midranks, which are integers
    (midrank of a tie group = (lo+hi)/2, so 2·midrank = 2·cum_before +
    m + 1 where m is the tie size). 2·R_A = Σ_v ca(v)·(2·cum_tot(v) −
    m(v) + 1) accumulates in longs (≤ N·(2N+1), inside int64 to N ~
    2·10⁹); 2·U_A = 2·R_A − n_a(n_a+1) and AUC = U_A/(n_a·n_b) divides
    ONCE at the end. The tie-correction term Σ(m³−m) (what a z-score
    variance needs) is emitted as an exact BIGINT so callers can finish
    significance testing without re-scanning.

    Scale shape = q125's: collapse to per-price-cent counts (map-side
    combinable, support-bounded), ONE distributed_prefix_sum over the
    collapsed support with the a/b counters packed into a single
    64-bit value — no global window; the reduction is a 1-row agg.

    Exact-integer DOMAIN (documented, not silent): the rank sum and
    u2_a are ~N², so past N ~ 2e9 the LONG OUTPUT TYPE itself cannot
    hold the exact statistic (the packed counters cap at 2^31 per class
    at roughly the same point, and a tie group past ~2.1e6 rows leaves
    int64 in m³). Beyond that domain the AUC double (a ratio, not an
    exact integer) is the deliverable — recompute these sums in
    DECIMAL(38,0) with unpacked prefix passes and drop the exact-long
    columns."""
    from .scale import distributed_prefix_sum

    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("p"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0).alias("is_a"),
    )
    per_price = o.groupBy("p").agg(
        F.sum("is_a").alias("ca"),
        F.sum(F.lit(1) - F.col("is_a")).alias("cb"),
    ).withColumn(
        "packed", F.col("ca") * F.lit(1 << 32) + F.col("cb")
    )
    cum = distributed_prefix_sum(
        per_price, "p", "packed", out_col="cum_packed",
        bucket_span=1 << 16,
    ).select(
        "ca", "cb",
        (F.col("ca") + F.col("cb")).alias("m"),
        (
            (F.col("cum_packed") / F.lit(1 << 32)).cast("long")
            + F.col("cum_packed") % F.lit(1 << 32)
        ).alias("cum_tot"),
    )
    agg = cum.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(
            F.col("ca")
            * (F.lit(2) * F.col("cum_tot") - F.col("m") + F.lit(1))
        ).cast("long").alias("r2_a"),
        F.sum(
            F.col("m") * F.col("m") * F.col("m") - F.col("m")
        ).cast("long").alias("tie_cube"),
    )
    return agg.select(
        "n_a", "n_b",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        .alias("u2_a"),
        "tie_cube",
        F.round(
            (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
            / (F.lit(2.0) * F.col("n_a") * F.col("n_b")),
            6,
        ).alias("auc"),
    )


RELATIONAL_QUERIES["q132_mannwhitney_auc"] = q132_mannwhitney_auc
RELATIONAL_ORACLE["q132_mannwhitney_auc"] = (
    "WITH pc AS ("
    "  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS p, "
    "    SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) "
    "      AS ca, "
    "    SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS cb "
    "  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW') "
    "  GROUP BY 1), "
    "cum AS ("
    "  SELECT ca, cb, ca + cb AS m, "
    "    SUM(ca + cb) OVER (ORDER BY p ROWS UNBOUNDED PRECEDING) "
    "      AS cum_tot "
    "  FROM pc), "
    "agg AS ("
    "  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, "
    "    CAST(SUM(cb) AS BIGINT) AS n_b, "
    "    CAST(SUM(ca * (2 * cum_tot - m + 1)) AS BIGINT) AS r2_a, "
    "    CAST(SUM(m * m * m - m) AS BIGINT) AS tie_cube "
    "  FROM cum) "
    "SELECT n_a, n_b, "
    "  CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a, tie_cube, "
    "  ROUND(CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) "
    "    / (2.0 * n_a * n_b), 6) AS auc "
    "FROM agg"
)


def q133_spearman_corr(spark, sf_dir):
    """Spearman rank correlation between a customer's account balance
    and their realized order revenue — the distribution-free monotonic
    association measure (q75's Pearson on RANKS, with exact midrank tie
    handling). Does wealth predict spend, without assuming linearity?

    Exactness: both variables are ranked via integer DOUBLED midranks
    (2·midrank = 2·cum_before + m + 1, the q132 identity), computed by
    collapsing each variable to its distinct-value counts and running
    ONE distributed_prefix_sum per variable over the collapsed support
    (acctbal cents are shifted +10⁵ so the prefix-sum's bucket keys
    stay non-negative). Bucket spans are sized per variable — the
    ledger contract is (key-range / span) ≲ 1e6 driver rows, and the
    revenue range is ~10³× the balance range (and grows with fact
    volume), so rev_c scans with a 2²⁴ span vs bal_c's 2¹⁶; per-bucket
    window width stays bounded by DISTINCT VALUE count per span, which
    the customer-bounded pair table keeps small either way. The Pearson moments of the doubled ranks
    accumulate in DECIMAL(38,0) (q126's overflow posture: Σ rank² ~
    4N³ leaves int64 near N ~ 1.3·10⁶), and rho = (n·Sxy − Sx·Sy) /
    (√(n·Sxx − Sx²)·√(n·Syy − Sy²)) converts each exact integer moment
    to double once — sqrt is IEEE exactly-rounded, so both engines see
    identical doubles. One float division, rounded once."""
    from .scale import distributed_prefix_sum

    o = _t(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .alias("rev_c")
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.round(F.col("c_acctbal") * 100).cast("long") + F.lit(100_000))
        .alias("bal_c"),
    )
    # customer-bounded; localCheckpoint because FIVE actions otherwise
    # re-derive it (each midrank2's ledger collect + the final 3-way
    # join's two rank subtrees + the fact side) — round-13, guide §5
    pairs = c.join(o, F.col("c_custkey") == F.col("o_custkey")).select(
        "c_custkey", "bal_c", "rev_c"
    ).localCheckpoint(eager=True)

    def midrank2(col, span):
        per_v = pairs.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("m")
        )
        cum = distributed_prefix_sum(
            per_v, "v", "m", out_col="cum", bucket_span=span
        )
        return cum.select(
            F.col("v").alias(col),
            (F.lit(2) * F.col("cum") - F.col("m") + F.lit(1))
            .alias(f"r2_{col}"),
        )

    # the rank tables are distinct-value-sized (~n rows) — NOT
    # broadcastable at scale; these are plain equi-joins on the value,
    # and AQE flips them to broadcast only while the support is small
    ranked = (
        pairs.join(midrank2("bal_c", 1 << 16), "bal_c")
        .join(midrank2("rev_c", 1 << 24), "rev_c")
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec("r2_bal_c")).alias("sx"),
        F.sum(dec("r2_rev_c")).alias("sy"),
        F.sum(dec("r2_bal_c") * dec("r2_bal_c")).alias("sxx"),
        F.sum(dec("r2_rev_c") * dec("r2_rev_c")).alias("syy"),
        F.sum(dec("r2_bal_c") * dec("r2_rev_c")).alias("sxy"),
    )
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    return m.select(
        "n",
        F.round(
            (d("n") * d("sxy") - d("sx") * d("sy"))
            / (
                F.sqrt(d("n") * d("sxx") - d("sx") * d("sx"))
                * F.sqrt(d("n") * d("syy") - d("sy") * d("sy"))
            ),
            6,
        ).alias("spearman_rho"),
    )


RELATIONAL_QUERIES["q133_spearman_corr"] = q133_spearman_corr
RELATIONAL_ORACLE["q133_spearman_corr"] = (
    "WITH o AS ("
    "  SELECT o_custkey, "
    "    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c "
    "  FROM orders GROUP BY 1), "
    "pairs AS ("
    "  SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000 AS bal_c, "
    "    rev_c "
    "  FROM customer JOIN o ON c_custkey = o_custkey), "
    "rx AS ("
    "  SELECT v AS bal_c, 2 * SUM(m) OVER (ORDER BY v "
    "      ROWS UNBOUNDED PRECEDING) - m + 1 AS r2x "
    "  FROM (SELECT bal_c AS v, COUNT(*) AS m FROM pairs GROUP BY 1)), "
    "ry AS ("
    "  SELECT v AS rev_c, 2 * SUM(m) OVER (ORDER BY v "
    "      ROWS UNBOUNDED PRECEDING) - m + 1 AS r2y "
    "  FROM (SELECT rev_c AS v, COUNT(*) AS m FROM pairs GROUP BY 1)), "
    "ranked AS ("
    "  SELECT r2x, r2y FROM pairs "
    "  JOIN rx USING (bal_c) JOIN ry USING (rev_c)), "
    "m AS ("
    "  SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    "    SUM(CAST(r2x AS HUGEINT)) AS sx, SUM(CAST(r2y AS HUGEINT)) AS sy, "
    "    SUM(CAST(r2x AS HUGEINT) * r2x) AS sxx, "
    "    SUM(CAST(r2y AS HUGEINT) * r2y) AS syy, "
    "    SUM(CAST(r2x AS HUGEINT) * r2y) AS sxy "
    "  FROM ranked) "
    "SELECT n, ROUND("
    "  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
    "     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
    "  / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
    "       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) "
    "   * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
    "       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) "
    "  AS spearman_rho "
    "FROM m"
)


# --------------------------------------------------------------------------
# graph link prediction: common neighbors / Jaccard / Adamic-Adar
# --------------------------------------------------------------------------

def q134_link_prediction(spark, sf_dir):
    """Link-prediction scores over the part co-purchase graph (q106's
    edge set): for NON-adjacent part pairs, the three classic
    neighborhood scores — common-neighbor count, neighborhood Jaccard
    (micro-units), and Adamic-Adar (Σ_z 1/ln(deg z), each term floored
    to integer micro-units BEFORE summing — the text_lm_score
    exactness trick, so the sum is exact int64 arithmetic). Top-20 by
    (cn, aa) with a deterministic pair tie-break.

    Scale honesty: common-neighbor enumeration through a center z is
    inherently Σ d(z)² — the hub-explosion shape that q106's
    orientation AVOIDS for counting but that pair SCORING cannot,
    because the pair (x,y) is the output, not a count. The production
    mitigations are candidate bounding (here: scored endpoints limited
    to a part-key prefix, mirroring sim_*'s PAIR_BOUND pattern) and
    hub capping (drop centers above a degree ceiling — biased, so it
    must be declared); the oracle mirrors the same bound exactly.
    Degrees stay FULL-graph (node-sized — joined without a forced
    hint; AQE broadcasts while small) so the scores are true even
    though the scored pair universe is bounded."""
    bound = 400
    # round-13: same edge set via the shared one-exchange builder
    # (collect_set + map-side pair explode — see _copurchase_edges)
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    adj = edges.select(
        F.col("a").alias("n"), F.col("b").alias("z")
    ).unionAll(edges.select(F.col("b").alias("n"), F.col("a").alias("z")))
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("d"))
    # per-center AA term in integer micro-units; deg(z) >= 2 for any
    # wedge center, so ln > 0
    aa_term = deg.select(
        "z",
        F.floor(F.lit(1_000_000) / F.log(F.col("d").cast("double")))
        .cast("long").alias("aa_micro_term"),
        F.col("d").alias("dz"),
    )
    l_, r_ = adj.alias("l"), adj.alias("r")
    wedges = (
        l_.join(r_, F.col("l.z") == F.col("r.z"))
        .where(
            (F.col("l.n") < F.col("r.n"))
            & (F.col("l.n") < bound) & (F.col("r.n") < bound)
        )
        .select(
            F.col("l.n").alias("px"), F.col("r.n").alias("py"),
            F.col("l.z").alias("z"),
        )
    )
    # deg/aa are node-sized — unbounded at corpus scale, so no forced
    # broadcast hint (the q69 lesson); AQE flips these equi-joins to
    # broadcast while the graph is small
    scored = (
        wedges.join(aa_term, "z")
        .groupBy("px", "py")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cn"),
            F.sum("aa_micro_term").cast("long").alias("aa_micro"),
        )
    )
    dd = deg.select(F.col("z").alias("n"), F.col("d"))
    dx, dy = dd.alias("dx"), dd.alias("dy")
    non_adj = scored.join(
        edges,
        (F.col("px") == F.col("a")) & (F.col("py") == F.col("b")),
        "left_anti",
    )
    return (
        non_adj.join(dx, F.col("px") == F.col("dx.n"))
        .join(dy, F.col("py") == F.col("dy.n"))
        .select(
            "px", "py", "cn",
            F.floor(
                F.lit(1_000_000) * F.col("cn")
                / (F.col("dx.d") + F.col("dy.d") - F.col("cn"))
            ).cast("long").alias("jaccard_e6"),
            "aa_micro",
        )
        .orderBy(
            F.col("cn").desc(), F.col("aa_micro").desc(), "px", "py"
        )
        .limit(20)
    )


RELATIONAL_QUERIES["q134_link_prediction"] = q134_link_prediction
RELATIONAL_ORACLE["q134_link_prediction"] = (
    "WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
    "edges AS ("
    "  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b "
    "  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey "
    "  WHERE x.l_partkey < y.l_partkey), "
    "adj AS ("
    "  SELECT a AS n, b AS z FROM edges "
    "  UNION ALL SELECT b AS n, a AS z FROM edges), "
    "deg AS (SELECT z, COUNT(*) AS d FROM adj GROUP BY 1), "
    "aa AS ("
    "  SELECT z, CAST(FLOOR(1000000 / LN(CAST(d AS DOUBLE))) AS BIGINT) "
    "    AS aa_micro_term "
    "  FROM deg), "
    "wedges AS ("
    "  SELECT l.n AS px, r.n AS py, l.z AS z "
    "  FROM adj l JOIN adj r ON l.z = r.z "
    "  WHERE l.n < r.n AND l.n < 400 AND r.n < 400), "
    "scored AS ("
    "  SELECT px, py, CAST(COUNT(*) AS BIGINT) AS cn, "
    "    CAST(SUM(aa_micro_term) AS BIGINT) AS aa_micro "
    "  FROM wedges JOIN aa USING (z) GROUP BY 1, 2), "
    "non_adj AS ("
    "  SELECT s.* FROM scored s "
    "  WHERE NOT EXISTS (SELECT 1 FROM edges e "
    "    WHERE e.a = s.px AND e.b = s.py)) "
    "SELECT px, py, cn, "
    "  CAST(FLOOR(1000000.0 * cn / (dx.d + dy.d - cn)) AS BIGINT) "
    "    AS jaccard_e6, aa_micro "
    "FROM non_adj JOIN deg dx ON dx.z = px JOIN deg dy ON dy.z = py "
    "ORDER BY cn DESC, aa_micro DESC, px, py LIMIT 20"
)


def q135_dow_seasonality(spark, sf_dir):
    """Day-of-week seasonal decomposition of daily order revenue, plus
    the most seasonally-anomalous day per weekday — the baseline every
    monitoring system needs before q130's changepoint makes sense
    (a Sunday dip is seasonality, not a break). Per ISO weekday:
    day count, exact total revenue cents, mean daily revenue, and the
    day maximizing |rev·n_dow − tot_dow| (the cross-multiplied
    deviation-from-mean — no division inside the argmax; exact longs),
    earliest-day tie-break.

    Scale shape: revenue collapses to the bounded calendar spine first
    (one map-combinable agg, ~2.4k day rows — the q99/q130 bound);
    the weekday means are a 7-row aggregate joined back broadcast, and
    the per-weekday argmax is a rank window over 7 bounded partitions
    of the day spine."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("rev")
        )
        .withColumn("isodow", (F.weekday("day") + F.lit(1)).cast("int"))
    )
    per_dow = daily.groupBy("isodow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("rev").alias("tot"),
    )
    scored = daily.join(F.broadcast(per_dow), "isodow").withColumn(
        "dev_num",
        F.abs(F.col("rev") * F.col("n_days") - F.col("tot")),
    )
    w = Window.partitionBy("isodow").orderBy(
        F.col("dev_num").desc(), F.col("day").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "isodow",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("tot").cast("long").alias("rev_total_c"),
            F.round(F.col("tot") / F.col("n_days"), 6).alias(
                "mean_daily_rev_c"
            ),
            F.col("day").alias("anomaly_day"),
            F.col("dev_num").cast("long").alias("anomaly_dev_num"),
        )
    )


RELATIONAL_QUERIES["q135_dow_seasonality"] = q135_dow_seasonality
RELATIONAL_ORACLE["q135_dow_seasonality"] = (
    "WITH daily AS ("
    "  SELECT CAST(o_orderdate AS DATE) AS day, "
    "    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev "
    "  FROM orders GROUP BY 1), "
    "d2 AS (SELECT day, rev, ISODOW(day) AS isodow FROM daily), "
    "per_dow AS ("
    "  SELECT isodow, COUNT(*) AS n_days, SUM(rev) AS tot "
    "  FROM d2 GROUP BY 1), "
    "scored AS ("
    "  SELECT d2.isodow, n_days, tot, day, "
    "    ABS(rev * n_days - tot) AS dev_num, "
    "    ROW_NUMBER() OVER (PARTITION BY d2.isodow "
    "      ORDER BY ABS(rev * n_days - tot) DESC, day ASC) AS rk "
    "  FROM d2 JOIN per_dow USING (isodow)) "
    "SELECT CAST(isodow AS INT) AS isodow, "
    "  CAST(n_days AS BIGINT) AS n_days, "
    "  CAST(tot AS BIGINT) AS rev_total_c, "
    "  ROUND(CAST(tot AS DOUBLE) / n_days, 6) AS mean_daily_rev_c, "
    "  day AS anomaly_day, "
    "  CAST(dev_num AS BIGINT) AS anomaly_dev_num "
    "FROM scored WHERE rk = 1"
)


# --------------------------------------------------------------------------
# sketches: Count-Min, deterministic HyperLogLog, Poisson bootstrap
# --------------------------------------------------------------------------

def q136_countmin_estimate(spark, sf_dir):
    """Count-Min sketch frequency estimation, engine-replayable: the
    production sketch for per-key counts when the key universe is too
    large to materialize (CMS state is FIXED — depth·width cells —
    regardless of corpus size; that's the whole 100 TB story). Built
    here with depth 4 × width 1024 from the md5 hash-bucket family
    (pipeline.py's hash_bucket — deterministic across engines, unlike
    either engine's native hash). For the top-10 users by exact event
    count, report exact vs CMS estimate: CMS never underestimates
    (estimate = min over rows of the hashed cell counts, each cell a
    sum that includes the key's own count), and the overestimate is
    bounded collision mass.

    Scale shape: one explode (×4 rows, map-side) + one hash aggregate
    into 4096 cells; the sketch table is bounded BY CONSTRUCTION, so
    the probe join broadcasts it legitimately (not a q69-class guess:
    4096 rows is a constant)."""
    depth, width = 4, 1024
    ev = _t(spark, sf_dir, "events").select("user_id")
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    top = exact.orderBy(F.col("exact_n").desc(), "user_id").limit(10)

    def cell(j, key):
        hex8 = F.substring(
            F.md5(F.concat(F.lit(f"cms{j}_"), key.cast("string"))), 1, 8
        )
        return (F.conv(hex8, 16, 10).cast("bigint") % width).alias("bucket")

    rows = [
        ev.select(F.lit(j).alias("j"), cell(j, F.col("user_id")))
        for j in range(depth)
    ]
    stacked = rows[0]
    for r in rows[1:]:
        stacked = stacked.unionAll(r)
    cms = stacked.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cell_n")
    )
    probe = top.select(
        "user_id", "exact_n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    cell(j, F.col("user_id")).alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("p"),
    ).select("user_id", "exact_n", "p.j", "p.bucket")
    return (
        probe.join(F.broadcast(cms), ["j", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cell_n").cast("long").alias("cms_n"))
    )


RELATIONAL_QUERIES["q136_countmin_estimate"] = q136_countmin_estimate
RELATIONAL_ORACLE["q136_countmin_estimate"] = (
    "WITH ev AS (SELECT user_id FROM events), "
    "exact_t AS ("
    "  SELECT user_id, COUNT(*) AS exact_n FROM ev GROUP BY 1), "
    "top_t AS ("
    "  SELECT user_id, exact_n FROM exact_t "
    "  ORDER BY exact_n DESC, user_id LIMIT 10), "
    "stacked AS ("
    "  SELECT CAST(t.j AS INT) AS j, "
    "    ('0x' || substr(md5('cms' || t.j || '_' || "
    "       CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 1024 AS bucket "
    "  FROM ev, UNNEST(RANGE(4)) AS t(j)), "
    "cms AS ("
    "  SELECT j, bucket, COUNT(*) AS cell_n FROM stacked GROUP BY 1, 2), "
    "probe AS ("
    "  SELECT user_id, exact_n, CAST(t.j AS INT) AS j, "
    "    ('0x' || substr(md5('cms' || t.j || '_' || "
    "       CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 1024 AS bucket "
    "  FROM top_t, UNNEST(RANGE(4)) AS t(j)) "
    "SELECT user_id, CAST(exact_n AS BIGINT) AS exact_n, "
    "  CAST(MIN(cell_n) AS BIGINT) AS cms_n "
    "FROM probe JOIN cms USING (j, bucket) GROUP BY 1, 2"
)


def q137_hll_distinct(spark, sf_dir):
    """Deterministic HyperLogLog distinct-count — built by hand so BOTH
    engines replay it bit-for-bit (q17's native approx_count_distinct
    is tolerance-only because Spark's HLL++ internals aren't
    replayable; this gate is the hash-exact sibling). m = 256 registers
    keyed by the first md5 byte; rho = leading-zero rank of the next
    32 hash bits, computed WITHOUT libm via bin() string length
    (rho = 33 − len(bin(h)) for h>0 — both engines' bin() drops
    leading zeros). The harmonic mean stays EXACT integer arithmetic:
    Σ 2^−r is scaled by 2^33 so every term 2^(33−r) with r ∈ [0, 33]
    is an int64 power of two (empty registers contribute 2^33); the
    raw-estimate float math (α·m²·2³³/S) happens once, on exact
    integers < 2^53. No small-range/large-range correction — the gate
    pins the RAW HLL formula and emits the exact distinct alongside,
    so the estimate's quality is visible in the row itself — plus the small-range
    linear-counting correction (m·ln(m/V) when the raw estimate is
    ≤ 2.5m and empty registers remain — the published HLL regime
    switch; ln is one libm call on one final value, the micro-nat
    gates' accepted risk class at round-3 granularity).

    Scale: register table is 256 rows — fixed state; one map-side hash
    per row + one 256-cell max-aggregate. THE classic pre-aggregable
    distinct sketch (registers merge by max across partitions — what
    Spark's partial aggregation does for free here)."""
    m = 256
    ev = _t(spark, sf_dir, "events").select("user_id")
    h = F.md5(F.concat(F.lit("hll_"), F.col("user_id").cast("string")))
    hashed = ev.select(
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
        F.conv(F.substring(h, 3, 8), 16, 10).cast("bigint").alias("h32"),
    )
    regs = hashed.select(
        "bucket",
        F.when(F.col("h32") == 0, F.lit(33))
        .otherwise(F.lit(33) - F.length(F.bin(F.col("h32"))))
        .alias("rho"),
    ).groupBy("bucket").agg(F.max("rho").alias("r"))
    spine = spark.range(m).select(F.col("id").cast("int").alias("bucket"))
    # regs is a groupBy over an m-valued key domain — ≤ 256 rows BY
    # CONSTRUCTION. Catalyst's estimate for the post-agg side scales
    # with the 100× fact scan and flipped this join to SMJ in the
    # smoke; the forced hint is constructional (q136's argument), not
    # a size guess (the q69 lesson does not apply to domain-bounded
    # aggregates).
    full = spine.join(F.broadcast(regs), "bucket", "left").select(
        F.coalesce(F.col("r"), F.lit(0)).alias("r")
    )
    harm = full.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 33 - r)"))
        .cast("long").alias("s_scaled"),
        F.sum(F.when(F.col("r") > 0, 1).otherwise(0))
        .cast("long").alias("n_nonzero"),
    )
    exact = ev.agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    # alpha_256 = 0.7213 / (1 + 1.079/256): the published HLL constant,
    # written as one double literal so both engines parse the same value
    alpha_m2 = 0.7213 / (1.0 + 1.079 / 256.0) * (256.0 * 256.0)
    raw = F.lit(alpha_m2) * F.lit(float(1 << 33)) / F.col("s_scaled")
    est = harm.select(
        "n_nonzero", "s_scaled",
        F.round(raw, 3).alias("hll_estimate"),
        F.round(
            F.when(
                (raw <= F.lit(2.5 * m)) & (F.col("n_nonzero") < m),
                F.lit(float(m))
                * F.log(F.lit(float(m)) / (F.lit(m) - F.col("n_nonzero"))),
            ).otherwise(raw),
            3,
        ).alias("hll_corrected"),
    )
    # tagged-union scalar assembly (q106's NLJ-free pattern)
    u = (
        est.select(
            F.lit("e").alias("k"), "n_nonzero", "s_scaled", "hll_estimate",
            "hll_corrected",
            F.lit(None).cast("long").alias("exact_distinct"),
        )
        .unionAll(
            exact.select(
                F.lit("x").alias("k"),
                F.lit(None).cast("long").alias("n_nonzero"),
                F.lit(None).cast("long").alias("s_scaled"),
                F.lit(None).cast("double").alias("hll_estimate"),
                F.lit(None).cast("double").alias("hll_corrected"),
                "exact_distinct",
            )
        )
    )
    return u.agg(
        F.max("exact_distinct").cast("long").alias("exact_distinct"),
        F.max("n_nonzero").cast("long").alias("n_nonzero"),
        F.max("s_scaled").cast("long").alias("s_scaled"),
        F.max("hll_estimate").alias("hll_estimate"),
        F.max("hll_corrected").alias("hll_corrected"),
    )


RELATIONAL_QUERIES["q137_hll_distinct"] = q137_hll_distinct
RELATIONAL_ORACLE["q137_hll_distinct"] = (
    "WITH hashed AS ("
    "  SELECT ('0x' || substr(md5('hll_' || CAST(user_id AS VARCHAR)), "
    "      1, 2))::BIGINT AS bucket, "
    "    ('0x' || substr(md5('hll_' || CAST(user_id AS VARCHAR)), "
    "      3, 8))::BIGINT AS h32 "
    "  FROM events), "
    "regs AS ("
    "  SELECT bucket, MAX(CASE WHEN h32 = 0 THEN 33 "
    "    ELSE 33 - LENGTH(BIN(h32)) END) AS r "
    "  FROM hashed GROUP BY 1), "
    "spine AS (SELECT UNNEST(RANGE(256)) AS bucket), "
    "full_t AS ("
    "  SELECT COALESCE(r, 0) AS r FROM spine "
    "  LEFT JOIN regs USING (bucket)), "
    "harm AS ("
    "  SELECT CAST(SUM(CAST(1 AS BIGINT) << (33 - r)) AS BIGINT) "
    "      AS s_scaled, "
    "    CAST(SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT) "
    "      AS n_nonzero "
    "  FROM full_t), "
    "exact_t AS ("
    "  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct "
    "  FROM events) "
    ", raw AS ("
    "  SELECT n_nonzero, s_scaled, "
    "    (0.7213 / (1.0 + 1.079 / 256.0)) * (256.0 * 256.0) "
    "      * 8589934592.0 / s_scaled AS r_est "
    "  FROM harm) "
    "SELECT exact_distinct, n_nonzero, s_scaled, "
    "  ROUND(r_est, 3) AS hll_estimate, "
    "  ROUND(CASE WHEN r_est <= 640.0 AND n_nonzero < 256 "
    "    THEN 256.0 * LN(256.0 / (256 - n_nonzero)) "
    "    ELSE r_est END, 3) AS hll_corrected "
    "FROM raw, exact_t"
)


def q138_bootstrap_ci(spark, sf_dir):
    """Poisson-bootstrap confidence interval for the mean order value —
    THE distributed bootstrap (classical resampling needs n draws from
    a corpus no single node holds; Poisson bootstrap gives each row an
    independent mean-1 replicate weight, one corpus scan for ALL
    replicates). Deterministic: replicate b's weight for a row counts
    the '0'/'1' hex chars among the first 8 of md5(key_b) — 8 trials
    at p=2/16 each, Binomial(8, 1/8) ≈ Poisson(1) (mean exactly 1; the
    approximation is documented, not hidden). B = 32 replicates; per
    replicate the mean is exact integer cents Σw·x / Σw divided once;
    the interval is the 2nd/31st order statistic of the 32 replicate
    means (93.75% coverage — order statistics, no normality assumption).

    Scale shape (round-13 optimization, guide §1.2/§2.3): the md5 +
    translate work per row is oracle-locked, but the replicate STREAM
    is not — the former plan exploded 32 (b, w) rows per order through
    a 32-group hash aggregate (4.8M generated rows at sf0.1), then ran
    a window + union tail over the 32-row result, and scanned orders a
    SECOND time for the full mean. Now ONE flat map-combinable
    aggregate computes all 64 replicate accumulators (Σw·x, Σw per b —
    exact long sums, identical doubles after the single division) plus
    the full-mean pair in the same scan: a projection materializes the
    8 digests once per row (h0..h7 attributes, so nothing re-inlines
    the md5), 64 conditional sums consume fixed hex slices of them,
    and the order statistics collapse to array_sort over the 32
    replicate means on the 1-row result. No Generate, no second scan,
    no shuffle beyond 66 accumulator cells; state stays B cells,
    independent of corpus size. Equivalence to the explode/window
    formulation is pinned row-for-row in
    tests/test_optimization_r13.py::test_q138_matches_explode_window_form.
    Measured ~1.9× (interleaved same-session A/B at sf0.1: old
    9.3-13.2 s vs new 4.7-5.3 s across three sessions); results
    byte-identical at sf0.001/0.01/0.1."""
    B = 32
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    key = F.col("o_orderkey").cast("string")
    digs = o.select(
        "x",
        *[
            F.md5(F.concat(F.lit("boot"), F.lit(g), F.lit("_"), key)).alias(
                f"h{g}"
            )
            for g in range(B // 4)
        ],
    )

    def w(g: int, j: int):
        # count of '0'/'1' chars = 8 − length after removing them;
        # translate beats a per-row regexp (measured: the regexp, not
        # the md5, dominated the original form)
        return F.lit(8) - F.length(
            F.translate(F.substring(F.col(f"h{g}"), j * 8 + 1, 8), "01", "")
        )

    aggs = []
    for b in range(B):
        g, j = divmod(b, 4)
        aggs.append(F.sum(w(g, j) * F.col("x")).alias(f"s{b}"))
        aggs.append(F.sum(w(g, j)).alias(f"c{b}"))
    row = digs.agg(*aggs, F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
    # replicate means: one division per b (same exact-long-sums-then-
    # one-divide discipline as the groupBy form), sorted in-plan
    reps = F.array_sort(
        F.array(*[F.col(f"s{b}") / F.col(f"c{b}") for b in range(B)])
    )
    return row.select(
        F.round(F.col("sx") / F.col("n"), 6).alias("mean_c"),
        F.round(F.element_at(reps, 2), 6).alias("ci_lo_c"),
        F.round(F.element_at(reps, B - 1), 6).alias("ci_hi_c"),
        F.lit(B).cast("long").alias("n_replicates"),
    )


RELATIONAL_QUERIES["q138_bootstrap_ci"] = q138_bootstrap_ci
RELATIONAL_ORACLE["q138_bootstrap_ci"] = (
    "WITH o AS ("
    "  SELECT o_orderkey, "
    "    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x "
    "  FROM orders), "
    "digests AS ("
    "  SELECT x, CAST(t.g AS INT) AS g, "
    "    md5('boot' || t.g || '_' || CAST(o_orderkey AS VARCHAR)) AS h "
    "  FROM o, UNNEST(RANGE(8)) AS t(g)), "
    "rep AS ("
    "  SELECT x, g * 4 + CAST(u.j AS INT) AS b, "
    "    8 - LENGTH(REPLACE(REPLACE("
    "      SUBSTR(h, CAST(u.j AS INT) * 8 + 1, 8), '0', ''), '1', '')) "
    "      AS w "
    "  FROM digests, UNNEST(RANGE(4)) AS u(j)), "
    "means AS ("
    "  SELECT b, CAST(SUM(w * x) AS DOUBLE) / SUM(w) AS rep_mean "
    "  FROM rep GROUP BY 1), "
    "ranked AS ("
    "  SELECT rep_mean, ROW_NUMBER() OVER (ORDER BY rep_mean) AS rk "
    "  FROM means), "
    "ci AS ("
    "  SELECT ROUND(MIN(rep_mean), 6) AS ci_lo_c, "
    "    ROUND(MAX(rep_mean), 6) AS ci_hi_c "
    "  FROM ranked WHERE rk IN (2, 31)), "
    "full_t AS ("
    "  SELECT ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS mean_c "
    "  FROM o) "
    "SELECT mean_c, ci_lo_c, ci_hi_c, "
    "  CAST(32 AS BIGINT) AS n_replicates "
    "FROM ci, full_t"
)


def q139_bounded_bfs(spark, sf_dir):
    """Hop-bounded multi-source BFS over the part co-purchase graph:
    exact shortest hop distance (≤ 3) from the seed set (part keys
    < 10) to every reachable node, reported as a (distance, n_nodes)
    histogram — the reachability primitive behind "blast radius"
    and recommendation-neighborhood queries.

    Scale shape is q100's unrolled message-passing: THREE fixed
    rounds, each one equi-join (frontier × adjacency) + one min
    aggregate over node-sized state — O(hops) shuffles, no driver
    iteration, no recursion. The fact-derived edge list is
    checkpoint-materialized ONCE (_oriented_graph's rationale) so the
    three rounds reuse it instead of re-running the basket self-join;
    distance state stays node-sized throughout. An unbounded-depth
    BFS at 100 TB runs the same round as a loop with a convergence
    check (dedup_clusters' pattern); the hop bound here makes the
    plan statically analyzable — and most product queries ARE
    hop-bounded."""
    # round-13: same edge set via the shared one-exchange builder
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    adj = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    nodes = adj.select("u").distinct()
    dist = nodes.select(
        "u",
        F.when(F.col("u") < 10, F.lit(0)).otherwise(F.lit(None))
        .cast("int").alias("d"),
    )
    for _hop in range(3):
        # frontier-only messaging (r13 opt, guide §2.2 — shuffle fewer
        # bytes): after round k, dist holds the EXACT distance of every
        # node with d <= k (BFS invariant), so a node with d < k already
        # sent its messages in an earlier round and every neighbor it
        # could update holds d <= d+1 — re-sending from it cannot lower
        # any min. Messaging only d == k is result-identical and drops
        # the round-3 message volume from ~all reached x degree to the
        # last ring x degree (the dense-graph rounds were re-sending
        # nearly the whole graph).
        msgs = (
            dist.where(F.col("d") == _hop)
            .join(adj, "u")
            .select(F.col("v").alias("u"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.unionAll(msgs)
            .groupBy("u")
            .agg(F.min("d").alias("d"))
        )
    return (
        dist.where(F.col("d").isNotNull())
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .select(F.col("d").cast("int").alias("dist"), "n_nodes")
    )


RELATIONAL_QUERIES["q139_bounded_bfs"] = q139_bounded_bfs
RELATIONAL_ORACLE["q139_bounded_bfs"] = (
    "WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
    "edges AS ("
    "  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b "
    "  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey "
    "  WHERE x.l_partkey < y.l_partkey), "
    "adj AS ("
    "  SELECT a AS u, b AS v FROM edges "
    "  UNION ALL SELECT b AS u, a AS v FROM edges), "
    "nodes AS (SELECT DISTINCT u FROM adj), "
    "d0 AS ("
    "  SELECT u, CASE WHEN u < 10 THEN 0 END AS d FROM nodes), "
    "d1 AS ("
    "  SELECT u, MIN(d) AS d FROM ("
    "    SELECT u, d FROM d0 UNION ALL "
    "    SELECT adj.v AS u, d0.d + 1 AS d FROM d0 JOIN adj USING (u) "
    "    WHERE d0.d IS NOT NULL) GROUP BY u), "
    "d2 AS ("
    "  SELECT u, MIN(d) AS d FROM ("
    "    SELECT u, d FROM d1 UNION ALL "
    "    SELECT adj.v AS u, d1.d + 1 AS d FROM d1 JOIN adj USING (u) "
    "    WHERE d1.d IS NOT NULL) GROUP BY u), "
    "d3 AS ("
    "  SELECT u, MIN(d) AS d FROM ("
    "    SELECT u, d FROM d2 UNION ALL "
    "    SELECT adj.v AS u, d2.d + 1 AS d FROM d2 JOIN adj USING (u) "
    "    WHERE d2.d IS NOT NULL) GROUP BY u) "
    "SELECT CAST(d AS INT) AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes "
    "FROM d3 WHERE d IS NOT NULL GROUP BY d"
)



def q140_autocorrelation(spark, sf_dir):
    """Lag-1..7 autocorrelation of the daily order-count series — the
    seasonality/momentum readout behind forecasting features and
    data-drift monitors (a weekly cycle shows up as a lag-7 peak).
    Exactness discipline: avoid subtracting a float mean by scaling
    through n — centered value c_t = n·y_t − S is EXACT int64 at any
    scale (n is calendar-bounded), and the moment sums Σ c², Σ c·c_{+k}
    accumulate in DECIMAL(38,0) so they stay exact even where daily
    volume reaches 1e8+ and the long sum would wrap (q160 overflow
    class). r_k = Σ c_t·c_{t+k} / Σ c_t², floored to 1e-6 units after
    ONE double conversion.

    Scale shape: ONE map-combinable aggregate collapses the fact scan
    to the bounded day spine (~2.4k rows); the scalar (n, S) and the
    lead window run over that bounded table only (q99's documented
    single-reducer day-spine contract), and all 7 lags ride ONE window
    sort via 7 leads. Output is 7 rows."""
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    wn = Window.partitionBy()
    cen = daily.select(
        "day",
        (
            F.sum(F.lit(1)).over(wn) * F.col("y")
            - F.sum("y").over(wn)
        ).alias("c"),
    )
    w = Window.orderBy("day")
    led = cen.select(
        "c",
        *[F.lead("c", k).over(w).alias(f"l{k}") for k in range(1, 8)],
    )
    # moments in DECIMAL(38,0): c = n·y − S fits a long at any scale
    # (calendar-bounded n), but Σ c² ~ days·(n·y)² leaves int64 once
    # daily volume reaches ~1e8 (100 TB territory) — the long-sum
    # flavor of the q160 overflow class. The e6 ratio converts to
    # double once, as before.
    cd = F.col("c").cast("decimal(38,0)")
    mom = led.agg(
        F.sum(cd * cd).alias("den"),
        *[
            F.sum(cd * F.col(f"l{k}")).alias(f"num{k}")
            for k in range(1, 8)
        ],
    )
    return mom.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("lag"),
                        F.floor(
                            F.lit(1_000_000)
                            * F.col(f"num{k}").cast("double")
                            / F.col("den").cast("double")
                        ).cast("long").alias("acf_e6"),
                    )
                    for k in range(1, 8)
                ]
            )
        ).alias("r")
    ).select("r.lag", "r.acf_e6")


RELATIONAL_QUERIES["q140_autocorrelation"] = q140_autocorrelation
RELATIONAL_ORACLE["q140_autocorrelation"] = (
    "WITH daily AS ("
    "  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS y "
    "  FROM orders GROUP BY 1), "
    "tot AS (SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS s "
    "  FROM daily), "
    "cen AS (SELECT day, n * y - s AS c FROM daily, tot), "
    "led AS ("
    "  SELECT c, "
    + ", ".join(
        f"LEAD(c, {k}) OVER (ORDER BY day) AS l{k}" for k in range(1, 8)
    )
    + "  FROM cen), "
    "mom AS ("
    "  SELECT CAST(SUM(c * c) AS BIGINT) AS den, "
    + ", ".join(
        f"CAST(SUM(c * l{k}) AS BIGINT) AS num{k}" for k in range(1, 8)
    )
    + "  FROM led) "
    + " UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS lag, "
        f"CAST(FLOOR(1000000 * CAST(num{k} AS DOUBLE) "
        f"/ CAST(den AS DOUBLE)) AS BIGINT) AS acf_e6 FROM mom"
        for k in range(1, 8)
    )
)


def q141_kl_divergence(spark, sf_dir):
    """Per-region KL divergence of the order-priority distribution
    against the global distribution — the distribution-shift readout
    behind corpus-mix monitoring (which region's workload deviates
    most from the fleet?). KL(P_r ‖ P_g) = Σ_p (c_rp/c_r) ·
    ln((c_rp·c_g)/(c_r·c_gp)) with every ratio a division of exact
    sub-2^53 int64 counts, each cell's contribution floored to 1e-6
    units BEFORE summing (q127's mutual-information discipline — the
    e6 floor leaves three orders of magnitude between an ulp wobble
    and a flipped integer).

    Scale shape: the fact scan collapses to (region, priority) cells
    in one map-combinable aggregate behind a fact⋈customer equi-join
    (nation/region dims stay broadcast by size); marginals are windows
    over the BOUNDED 25-cell table, never the fact rows."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("crp"))
    )
    wr = Window.partitionBy("r_name")
    wp = Window.partitionBy("o_orderpriority")
    wn = Window.partitionBy()
    terms = cells.select(
        "r_name",
        F.col("crp"),
        F.sum("crp").over(wr).alias("cr"),
        F.sum("crp").over(wp).alias("cgp"),
        F.sum("crp").over(wn).alias("cg"),
    ).select(
        "r_name",
        "cr",
        # kl_term_e6 owns the operand-first double casts (the long×long
        # count-product overflow class) and the oracle-parity contract
        kl_term_e6(
            F.col("crp"), F.col("cr"), F.col("cgp"), F.col("cg")
        ).alias("term_e6"),
    )
    return (
        terms.groupBy("r_name")
        .agg(
            F.max("cr").cast("long").alias("n_orders"),
            F.sum("term_e6").cast("long").alias("kl_e6"),
        )
        .select("r_name", "n_orders", "kl_e6")
    )


RELATIONAL_QUERIES["q141_kl_divergence"] = q141_kl_divergence
RELATIONAL_ORACLE["q141_kl_divergence"] = (
    "WITH cells AS ("
    "  SELECT r_name, o_orderpriority, COUNT(*) AS crp "
    "  FROM orders "
    "  JOIN customer ON o_custkey = c_custkey "
    "  JOIN nation ON c_nationkey = n_nationkey "
    "  JOIN region ON n_regionkey = r_regionkey "
    "  GROUP BY 1, 2), "
    "m AS ("
    "  SELECT r_name, crp, "
    "    SUM(crp) OVER (PARTITION BY r_name) AS cr, "
    "    SUM(crp) OVER (PARTITION BY o_orderpriority) AS cgp, "
    "    SUM(crp) OVER () AS cg "
    "  FROM cells), "
    "t AS ("
    "  SELECT r_name, cr, "
    "    FLOOR(1000000 * (CAST(crp AS DOUBLE) / cr) "
    "      * LN((CAST(crp AS DOUBLE) * cg) / (CAST(cr AS DOUBLE) * cgp))) "
    "      AS term_e6 "
    "  FROM m) "
    "SELECT r_name, CAST(MAX(cr) AS BIGINT) AS n_orders, "
    "  CAST(SUM(term_e6) AS BIGINT) AS kl_e6 "
    "FROM t GROUP BY 1"
)


def q142_welch_t(spark, sf_dir):
    """Welch's unequal-variance t-statistic between the BUILDING and
    MACHINERY customer segments on account balance — the parametric
    sibling of q132's Mann-Whitney (same A/B-readout family; rank test
    vs moment test). Balances are exact cents (int64); the three
    moments (n, Σx, Σx²) per group are exact integers, every one
    < 2^53 at test scale, so the double-arithmetic tail — sample
    variance s² = (n·Σx² − (Σx)²) / (n·(n−1)), t = (m₁−m₂) /
    √(s₁²/n₁ + s₂²/n₂), and the Welch–Satterthwaite df — is computed
    from IDENTICAL doubles in both engines; outputs floored at e6/e3.
    Σx² accumulates in DECIMAL(38,0) (it leaves int64 near 1e10 rows of
    cents² — the q160 overflow class, mirrored by the oracle's HUGEINT
    sum), so the moments stay exact to 38 digits at any realistic scale.

    Scale shape: ONE map-combinable conditional aggregate over the
    customer scan — no join, no window, 1 output row."""
    seg_a, seg_b = "BUILDING", "MACHINERY"
    c = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin(seg_a, seg_b)
    ).select(
        (F.col("c_mktsegment") == seg_a).alias("is_a"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
    )

    def moms(flag):
        cond = F.col("is_a") if flag else ~F.col("is_a")
        z = F.when(cond, F.col("x"))
        return [
            F.count(z).alias(f"n_{flag}"),
            F.sum(z).alias(f"s_{flag}"),
            # Σx² in DECIMAL(38,0): the docstring's own 100 TB note,
            # now fixed rather than documented — cents² sums leave
            # int64 near 1e10 customers (q160 overflow class; the
            # DuckDB oracle's SUM promotes to HUGEINT)
            F.sum(
                F.when(cond, F.col("x").cast("decimal(38,0)") * F.col("x"))
            ).alias(f"q_{flag}"),
        ]

    m = c.agg(*moms(True), *moms(False))
    n1, s1, q1 = F.col("n_True"), F.col("s_True"), F.col("q_True")
    n2, s2, q2 = F.col("n_False"), F.col("s_False"), F.col("q_False")
    v1 = (
        n1.cast("double") * q1.cast("double")
        - s1.cast("double") * s1.cast("double")
    ) / (n1.cast("double") * (n1 - 1).cast("double"))
    v2 = (
        n2.cast("double") * q2.cast("double")
        - s2.cast("double") * s2.cast("double")
    ) / (n2.cast("double") * (n2 - 1).cast("double"))
    se2_1 = v1 / n1.cast("double")
    se2_2 = v2 / n2.cast("double")
    t = (
        s1.cast("double") / n1.cast("double")
        - s2.cast("double") / n2.cast("double")
    ) / F.sqrt(se2_1 + se2_2)
    df = (
        (se2_1 + se2_2) * (se2_1 + se2_2)
        / (
            se2_1 * se2_1 / (n1 - 1).cast("double")
            + se2_2 * se2_2 / (n2 - 1).cast("double")
        )
    )
    return m.select(
        n1.cast("long").alias("n_a"),
        n2.cast("long").alias("n_b"),
        F.floor(F.lit(1_000_000) * t).cast("long").alias("t_e6"),
        F.floor(F.lit(1_000) * df).cast("long").alias("df_e3"),
    )


RELATIONAL_QUERIES["q142_welch_t"] = q142_welch_t
RELATIONAL_ORACLE["q142_welch_t"] = (
    "WITH b AS ("
    "  SELECT c_mktsegment = 'BUILDING' AS is_a, "
    "    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x "
    "  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')), "
    "m AS ("
    "  SELECT "
    "    CAST(COUNT(CASE WHEN is_a THEN x END) AS BIGINT) AS n1, "
    "    CAST(SUM(CASE WHEN is_a THEN x END) AS BIGINT) AS s1, "
    "    CAST(SUM(CASE WHEN is_a THEN x * x END) AS BIGINT) AS q1, "
    "    CAST(COUNT(CASE WHEN NOT is_a THEN x END) AS BIGINT) AS n2, "
    "    CAST(SUM(CASE WHEN NOT is_a THEN x END) AS BIGINT) AS s2, "
    "    CAST(SUM(CASE WHEN NOT is_a THEN x * x END) AS BIGINT) AS q2 "
    "  FROM b), "
    "v AS ("
    "  SELECT n1, n2, "
    "    (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE) "
    "      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
    "      / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)) / n1 AS e1, "
    "    (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE) "
    "      - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) "
    "      / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE)) / n2 AS e2, "
    "    CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md "
    "  FROM m) "
    "SELECT n1 AS n_a, n2 AS n_b, "
    "  CAST(FLOOR(1000000 * md / SQRT(e1 + e2)) AS BIGINT) AS t_e6, "
    "  CAST(FLOOR(1000 * (e1 + e2) * (e1 + e2) "
    "    / (e1 * e1 / (n1 - 1) + e2 * e2 / (n2 - 1))) AS BIGINT) "
    "    AS df_e3 "
    "FROM v"
)


# --------------------------------------------------------------------------
# q143: Kaplan-Meier survival table over user lifetimes
# --------------------------------------------------------------------------

def q143_survival_table(spark, sf_dir):
    """Kaplan-Meier survival table over user lifetimes in the events
    stream — the churn/retention primitive the reference's RDBMS users
    run as a stored query. A user's lifetime is last − first activity
    in WHOLE HOURS (exact integer `div` of epoch-microsecond spans —
    day granularity is degenerate on this corpus: every user is active
    within a day of the horizon); a user is an observed churn EVENT if
    their last activity precedes the corpus horizon by more than 12
    hours (the median last-gap is ~7 h, so both classes are populated),
    else right-CENSORED (still alive at the horizon). For each duration
    with ≥1 event: the at-risk count (lifetimes ≥ d), the event count,
    and the running log-survival Σ ln(1 − dᵢ/nᵢ) with each step floored
    to integer micro-nats BEFORE the cumulative sum (the q127/text_lm
    exactness trick — the sum is then exact int64). A step where every
    at-risk user dies (n_event = n_risk, only possible on the final
    event row) has log-survival −∞ → NULL, handled identically in both
    engines.

    Scale shape: one map-combinable min/max agg per user, one agg to
    the duration distribution (hour-bounded: ≤ ~720 distinct durations
    on a 30-day corpus — the q99 spine bound), then two running windows
    over that bounded spine. Horizon + cohort size ride as TWO DRIVER
    LONGS from one 1-row agg (q130's scalar pattern — a 1-row
    broadcast would plan the banned BroadcastNestedLoopJoin)."""
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    e = _t(spark, sf_dir, "events").select("user_id", us.alias("t"))
    users = e.groupBy("user_id").agg(
        F.min("t").alias("first_t"), F.max("t").alias("last_t")
    )
    g = users.agg(F.max("last_t"), F.count(F.lit(1))).collect()[0]
    gmax, n_users = int(g[0]), int(g[1])
    per_user = users.select(
        F.expr("(last_t - first_t) div 3600000000").alias("dur"),
        (F.col("last_t") < F.lit(gmax - 12 * 3_600_000_000))
        .cast("long").alias("ev"),
    )
    dist = per_user.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_total"), F.sum("ev").alias("n_event")
    )
    w = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    km = dist.select(
        "dur",
        "n_event",
        (
            F.lit(n_users) - F.sum("n_total").over(w) + F.col("n_total")
        ).alias("n_risk"),
    ).where(F.col("n_event") > 0)
    step = F.when(
        F.col("n_event") < F.col("n_risk"),
        F.floor(
            F.lit(1_000_000)
            * F.log(
                (F.col("n_risk") - F.col("n_event")).cast("double")
                / F.col("n_risk").cast("double")
            )
        ).cast("long"),
    )
    staged = km.select("dur", "n_risk", "n_event", step.alias("step_e6"))
    return staged.select(
        F.col("dur").cast("long").alias("dur_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("n_event").cast("long").alias("n_event"),
        F.when(
            F.col("n_event") < F.col("n_risk"),
            F.sum("step_e6").over(w),
        ).cast("long").alias("log_surv_e6"),
    )


RELATIONAL_QUERIES["q143_survival_table"] = q143_survival_table
RELATIONAL_ORACLE["q143_survival_table"] = (
    "WITH u AS ("
    "  SELECT user_id, "
    "    MIN(epoch_us(ts)) AS first_t, "
    "    MAX(epoch_us(ts)) AS last_t "
    "  FROM events GROUP BY 1), "
    "g AS (SELECT MAX(last_t) AS gmax, COUNT(*) AS n_users FROM u), "
    "p AS ("
    "  SELECT (last_t - first_t) // 3600000000 AS dur, "
    "    CASE WHEN last_t < (SELECT gmax FROM g) - 43200000000 "
    "      THEN 1 ELSE 0 END AS ev "
    "  FROM u), "
    "dist AS ("
    "  SELECT dur, COUNT(*) AS n_total, CAST(SUM(ev) AS BIGINT) AS n_event "
    "  FROM p GROUP BY 1), "
    "km AS ("
    "  SELECT dur, n_event, "
    "    (SELECT n_users FROM g) "
    "      - SUM(n_total) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) "
    "      + n_total AS n_risk "
    "  FROM dist), "
    "ev AS ("
    "  SELECT dur, n_risk, n_event, "
    "    CASE WHEN n_event < n_risk THEN "
    "      CAST(FLOOR(1000000 * LN(CAST(n_risk - n_event AS DOUBLE) "
    "        / CAST(n_risk AS DOUBLE))) AS BIGINT) END AS step_e6 "
    "  FROM km WHERE n_event > 0) "
    "SELECT CAST(dur AS BIGINT) AS dur_days, "
    "  CAST(n_risk AS BIGINT) AS n_risk, n_event, "
    "  CASE WHEN n_event < n_risk THEN "
    "    CAST(SUM(step_e6) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) "
    "      AS BIGINT) END AS log_surv_e6 "
    "FROM ev"
)


# --------------------------------------------------------------------------
# q144: bounded (3,3)-core peeling on the bipartite part-supplier graph
# --------------------------------------------------------------------------

def bipartite_k_core(
    edges: DataFrame, kp: int, ks: int, rounds: int
) -> DataFrame:
    """Reusable kernel: bounded k-core peeling on a bipartite edge list
    with columns (p, s) — ``rounds`` unrolled rounds of dropping every
    edge whose p-endpoint has degree < ``kp`` OR s-endpoint degree
    < ``ks`` in the CURRENT graph; returns one summary row per round
    (0 = input graph) with surviving edge / p / s counts. Bounded
    unrolling is the q139-BFS contract — true k-core iterates to a
    fixpoint, which is a driver loop with a convergence check at
    100 TB (dedup_clusters documents that pattern); a FIXED round
    count keeps the result deterministic and single-plan so an oracle
    can replay it as a CTE chain.

    Scale shape: each round is two map-combinable degree aggs + two
    key equi-joins on a MONOTONICALLY SHRINKING edge set. Each round's
    edges are localCheckpoint-materialized because three consumers
    read them (both degree aggs + the next round) — DataFrame reuse is
    not plan reuse (the q124 lesson); without the cut, round r's plan
    re-executes round r-1 three times and the unroll goes exponential."""
    edges = edges.select("p", "s").distinct().localCheckpoint(eager=True)
    summaries = []

    def summary(r, e):
        return e.agg(
            F.lit(r).cast("long").alias("round"),
            F.count(F.lit(1)).alias("n_edges"),
            F.count_distinct("p").alias("n_parts"),
            F.count_distinct("s").alias("n_supps"),
        )

    summaries.append(summary(0, edges))
    for r in range(1, rounds + 1):
        pdeg = edges.groupBy("p").agg(F.count(F.lit(1)).alias("dp"))
        sdeg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("ds"))
        edges = (
            edges.join(pdeg.where(F.col("dp") >= kp).select("p"), "p")
            .join(sdeg.where(F.col("ds") >= ks).select("s"), "s")
            .select("p", "s")
            .localCheckpoint(eager=True)
        )
        summaries.append(summary(r, edges))
    out = summaries[0]
    for s_ in summaries[1:]:
        out = out.unionAll(s_)
    return out


def q144_k_core(spark, sf_dir):
    """Bounded k-core peeling on the bipartite part↔supplier graph
    (edges = distinct supply relationships in the first-six-months
    lineitem slice — the full-history graph is already a (26,500)-core
    and nothing peels): 4 rounds at part-degree ≥ 3 / supplier-degree
    ≥ 25 (asymmetric thresholds because bipartite sides have
    asymmetric degree scales) — a genuine cascade: supplier removals
    lower part degrees, which lowers supplier degrees, every round
    non-trivial. The edge list is a fact distinct (NO self-join — the
    bipartite graph is materially cheaper than q106's co-purchase
    projection); peeling itself is the ``bipartite_k_core`` kernel
    (property-tested against a brute-force peel)."""
    edges = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp"))
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
    )
    return bipartite_k_core(edges, kp=3, ks=25, rounds=4)


RELATIONAL_QUERIES["q144_k_core"] = q144_k_core
_KCORE_ROUND = (
    "SELECT {r} AS round, COUNT(*) AS n_edges, "
    "COUNT(DISTINCT p) AS n_parts, COUNT(DISTINCT s) AS n_supps "
    "FROM e{r}"
)
_KCORE_PEEL = (
    "e{r} AS ("
    "  SELECT e.p, e.s FROM e{prev} e "
    "  JOIN (SELECT p FROM e{prev} GROUP BY p HAVING COUNT(*) >= 3) dp "
    "    USING (p) "
    "  JOIN (SELECT s FROM e{prev} GROUP BY s HAVING COUNT(*) >= 25) ds "
    "    USING (s))"
)
RELATIONAL_ORACLE["q144_k_core"] = (
    "WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s "
    "FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-07-01'), "
    + ", ".join(_KCORE_PEEL.format(r=r, prev=r - 1) for r in range(1, 5))
    + " "
    + " UNION ALL ".join(_KCORE_ROUND.format(r=r) for r in range(5))
)


# --------------------------------------------------------------------------
# q145: Wald-Wolfowitz runs test on the daily order-count series
# --------------------------------------------------------------------------

def runs_test_summary(daily: DataFrame) -> DataFrame:
    """Reusable kernel: Wald-Wolfowitz runs test over an ordered series
    with columns (day, cnt) — sign each point above/below the series
    MEAN (the strict comparison cnt·D > total is exact integer
    cross-multiplication — the q125 trick; a median split would drag
    in quantile tie politics for no statistical gain), count the runs
    of equal consecutive signs, and emit the z-statistic against the
    null mean/variance μ = 1 + 2ab/n, σ² = 2ab(2ab−n) / (n²(n−1)) in
    floored micro-units (identical doubles in any engine).

    Scale shape: the series is assumed ALREADY collapsed to a bounded
    spine (the q99 day-spine bound) — the lag + the final moments are
    one bounded-spine window + one 1-row agg. Point count and grand
    total ride as TWO DRIVER LONGS (q130's scalar pattern). An empty
    series yields one all-NULL row (the agg over zero rows)."""
    tot = daily.agg(F.count(F.lit(1)), F.sum("cnt")).collect()[0]
    if tot[1] is None:  # empty series: SUM over zero rows is NULL
        tot = (0, 0)
    n_days, total = int(tot[0]), int(tot[1])
    signed = daily.select(
        "day",
        (F.col("cnt") * F.lit(n_days) > F.lit(total)).cast("long").alias("sg"),
    )
    w = Window.orderBy("day")
    runs = signed.select(
        "sg",
        F.when(
            F.lag("sg").over(w).isNull()
            | (F.lag("sg").over(w) != F.col("sg")),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("brk"),
    )
    m = runs.agg(
        F.sum("sg").alias("a"),
        (F.count(F.lit(1)) - F.sum("sg")).alias("b"),
        F.sum("brk").alias("r"),
    )
    a, b, r = (F.col(c).cast("double") for c in ("a", "b", "r"))
    n = a + b
    mu = F.lit(1.0) + F.lit(2.0) * a * b / n
    var = (
        F.lit(2.0) * a * b * (F.lit(2.0) * a * b - n)
        / (n * n * (n - F.lit(1.0)))
    )
    return m.select(
        F.col("a").cast("long").alias("n_above"),
        F.col("b").cast("long").alias("n_below"),
        F.col("r").cast("long").alias("n_runs"),
        # σ² = 2ab(2ab−n)/… is zero for a one-sign series AND for the
        # knife-edge 2ab = n (e.g. n=2, a=b=1): z undefined → NULL (a
        # bare division trips ANSI divide-by-zero)
        F.when(
            F.lit(2) * F.col("a") * F.col("b") > F.col("a") + F.col("b"),
            F.floor(F.lit(1_000_000) * (r - mu) / F.sqrt(var)),
        ).cast("long").alias("z_e6"),
    )


def q145_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test for randomness of the daily order-count
    series: the fact scan collapses to the calendar day spine in one
    map-combinable agg (q99's bound), then the ``runs_test_summary``
    kernel (property-tested against a brute-force scan) does the
    sign/run/z computation."""
    daily = (
        _t(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return runs_test_summary(daily)


RELATIONAL_QUERIES["q145_runs_test"] = q145_runs_test
RELATIONAL_ORACLE["q145_runs_test"] = (
    "WITH daily AS ("
    "  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS cnt "
    "  FROM orders GROUP BY 1), "
    "t AS (SELECT COUNT(*) AS n_days, CAST(SUM(cnt) AS BIGINT) AS total "
    "  FROM daily), "
    "signed AS ("
    "  SELECT day, CASE WHEN cnt * (SELECT n_days FROM t) "
    "    > (SELECT total FROM t) THEN 1 ELSE 0 END AS sg "
    "  FROM daily), "
    "runs AS ("
    "  SELECT sg, CASE WHEN LAG(sg) OVER (ORDER BY day) IS NULL "
    "    OR LAG(sg) OVER (ORDER BY day) <> sg THEN 1 ELSE 0 END AS brk "
    "  FROM signed), "
    "m AS ("
    "  SELECT CAST(SUM(sg) AS BIGINT) AS a, "
    "    CAST(COUNT(*) - SUM(sg) AS BIGINT) AS b, "
    "    CAST(SUM(brk) AS BIGINT) AS r "
    "  FROM runs) "
    "SELECT a AS n_above, b AS n_below, r AS n_runs, "
    "  CASE WHEN 2 * a * b > a + b THEN "
    "    CAST(FLOOR(1000000 * (r - (1 + 2.0 * a * b / (a + b))) "
    "      / SQRT(2.0 * a * b * (2.0 * a * b - (a + b)) "
    "        / ((a + b) * (a + b) * (a + b - 1.0)))) AS BIGINT) "
    "  END AS z_e6 "
    "FROM m"
)


# --------------------------------------------------------------------------
# q146: SAX-style motif counts over the daily revenue series
# --------------------------------------------------------------------------

def _daily_rev_cents(spark, sf_dir) -> DataFrame:
    """Shared collapse for the daily-series gates (q146/q148/q149):
    orders → (day, exact revenue cents) on the calendar-bounded spine.
    One definition so a future rounding change cannot drift between
    the gates (and _DAILY_REV_CTE is its oracle twin)."""
    return (
        _t(spark, sf_dir, "orders")
        .select(
            F.to_date("o_orderdate").alias("day"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("rev"),
        )
        .groupBy("day")
        .agg(F.sum("rev").alias("rev"))
    )


_DAILY_REV_CTE = (
    "daily AS ("
    "  SELECT CAST(o_orderdate AS DATE) AS day, "
    "    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "      AS rev "
    "  FROM orders GROUP BY 1)"
)


def q146_sax_motifs(spark, sf_dir):
    """SAX-style symbolization + motif mining over the daily revenue
    series: each day gets a quartile letter a-d (NTILE(4) ordered by
    (revenue, day) — RANK-based discretization instead of the classic
    z-score breakpoints, so the letters are exact integers with a
    deterministic tie-break; NTILE remainder semantics are identical
    in Spark and DuckDB), then every 3 consecutive calendar-spine rows
    form a motif word and the top-5 motifs by (count desc, motif asc)
    are reported — the repeated-shape readout (e.g. 'dad' = spike-dip-
    spike) a monitoring pipeline mines for recurring patterns.

    Scale shape: the fact scan collapses to the bounded day spine
    first (q99's bound); the NTILE and the two LEADs are windows over
    that spine; the motif count is one map-combinable agg over ≤ 64
    motif cells and the top-5 a TakeOrdered."""
    daily = _daily_rev_cents(spark, sf_dir)
    lettered = daily.select(
        "day",
        F.element_at(
            F.split(F.lit("a,b,c,d"), ","),
            F.ntile(4).over(Window.orderBy("rev", "day")),
        ).alias("sym"),
    )
    w_day = Window.orderBy("day")
    motifs = lettered.select(
        F.concat(
            "sym", F.lead("sym", 1).over(w_day), F.lead("sym", 2).over(w_day)
        ).alias("motif")
    ).where(F.col("motif").isNotNull())
    return (
        motifs.groupBy("motif")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("motif"))
        .limit(5)
    )


RELATIONAL_QUERIES["q146_sax_motifs"] = q146_sax_motifs
RELATIONAL_ORACLE["q146_sax_motifs"] = (
    "WITH " + _DAILY_REV_CTE + ", "
    "lettered AS ("
    "  SELECT day, ['a','b','c','d'][NTILE(4) OVER (ORDER BY rev, day)] "
    "    AS sym "
    "  FROM daily), "
    "motifs AS ("
    "  SELECT sym || LEAD(sym, 1) OVER (ORDER BY day) "
    "    || LEAD(sym, 2) OVER (ORDER BY day) AS motif "
    "  FROM lettered) "
    "SELECT motif, COUNT(*) AS cnt FROM motifs "
    "WHERE motif IS NOT NULL "
    "GROUP BY 1 ORDER BY cnt DESC, motif LIMIT 5"
)


# --------------------------------------------------------------------------
# q147: per-user inter-arrival histogram in decimal-digit buckets
# --------------------------------------------------------------------------

def q147_interarrival_hist(spark, sf_dir):
    """Inter-arrival-time histogram across all users: consecutive
    same-user event gaps in whole seconds, bucketed by DECIMAL DIGIT
    COUNT (order of magnitude: bucket 0 = same-second, 1 = 1-9 s,
    2 = 10-99 s, …) — digit-count bucketing is exact string arithmetic
    in both engines, where a log2/log10 float bucket could flip at a
    boundary ulp between JVM and C libm. Per bucket: gap count and
    distinct users exhibiting it — the burstiness-profile readout
    (q131's Fano factor is the scalar cousin).

    Scale shape: one LAG window per user key (keyed shuffle — the
    legitimate per-key window), then a map-combinable agg over ≤ ~12
    bucket cells. Epoch micros via timestampdiff against the NTZ epoch
    (the q105 idiom — unix_timestamp would re-interpret in session
    zone)."""
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    e = _t(spark, sf_dir, "events").select(
        "user_id", us.alias("t"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    gaps = e.select(
        "user_id",
        (
            (F.col("t") - F.lag("t").over(w)) / F.lit(1_000_000)
        ).cast("long").alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    return (
        gaps.select(
            "user_id",
            F.when(F.col("gap_s") <= 0, F.lit(0))
            .otherwise(F.length(F.col("gap_s").cast("string")))
            .cast("long").alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


RELATIONAL_QUERIES["q147_interarrival_hist"] = q147_interarrival_hist
RELATIONAL_ORACLE["q147_interarrival_hist"] = (
    "WITH gaps AS ("
    "  SELECT user_id, "
    "    CAST((epoch_us(ts) - LAG(epoch_us(ts)) OVER ("
    "      PARTITION BY user_id ORDER BY epoch_us(ts), event_id)) "
    "      // 1000000 AS BIGINT) AS gap_s "
    "  FROM events), "
    "b AS ("
    "  SELECT user_id, CASE WHEN gap_s <= 0 THEN 0 "
    "    ELSE length(CAST(gap_s AS VARCHAR)) END AS bucket "
    "  FROM gaps WHERE gap_s IS NOT NULL) "
    "SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_gaps, "
    "  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
    "FROM b GROUP BY 1"
)


# --------------------------------------------------------------------------
# spine_pairs kernel + q148/q149: pairwise trend statistics
# --------------------------------------------------------------------------

def spine_pairs(df: DataFrame, idx_col: str = "idx", width: int = 64) -> DataFrame:
    """Reusable kernel: ALL ordered pairs (idx_a < idx_b) of a BOUNDED
    spine, with no nested-loop join. ``df`` carries ``idx_col`` (dense
    0..n−1) plus payload columns; the result has ``a_<col>`` /
    ``b_<col>`` for every payload column.

    A bare ``i < j`` theta self-join plans a BroadcastNestedLoopJoin
    (the node the 100× smoke's blanket rule bans), so the quadratic is
    EQUI-IZED via bucket-pair keys: rows land in ⌈n/width⌉ index
    buckets; same-bucket pairs join equi on the bucket id with the
    ``i < j`` residual; cross-bucket pairs explode each side to its
    bucket-pair keys (long-typed ``a·1e9 + b`` — collision-free and
    overflow-safe up to 1e9 buckets, with a fail-fast beyond) and join
    equi on the key. Every pair appears exactly once. Intended for
    CALENDAR-BOUNDED spines (the q99/q102 bounded-quadratic argument):
    output is n(n−1)/2 rows and must stay bounded by construction."""
    payload = [c for c in df.columns if c != idx_col]
    # checkpoint BEFORE the count: counting first would execute the
    # input lineage once for n and again for the materialization — the
    # q124 double-execution class
    d = df.withColumn(
        "_xb", (F.col(idx_col) / width).cast("long")
    ).localCheckpoint(eager=True)  # 3 consumers: same + both cross sides
    n = d.count()
    nb = max(1, (n + width - 1) // width)
    if nb > 1_000_000_000:
        raise ValueError(
            f"spine_pairs: {nb} buckets exceeds the pair-key capacity "
            "(the kernel is for BOUNDED spines; a quadratic this size "
            "is the wrong tool regardless)"
        )
    a_sel = [F.col(f"a.{c}").alias(f"a_{c}") for c in payload]
    b_sel = [F.col(f"b.{c}").alias(f"b_{c}") for c in payload]
    same = (
        d.alias("a")
        .join(
            d.alias("b"),
            (F.col("a._xb") == F.col("b._xb"))
            & (F.col(f"a.{idx_col}") < F.col(f"b.{idx_col}")),
        )
        .select(*a_sel, *b_sel)
    )
    la = (
        d.where(F.col("_xb") < nb - 1)
        .select(
            *[F.col(c).alias(f"a_{c}") for c in payload],
            "_xb",
            F.explode(
                F.sequence(F.col("_xb") + 1, F.lit(nb - 1).cast("long"))
            ).alias("_tb"),
        )
        .select(
            *[f"a_{c}" for c in payload],
            (F.col("_xb") * 1_000_000_000 + F.col("_tb")).alias("_pk"),
        )
    )
    rb = (
        d.where(F.col("_xb") > 0)
        .select(
            *[F.col(c).alias(f"b_{c}") for c in payload],
            "_xb",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("_xb") - 1)
            ).alias("_sa"),
        )
        .select(
            *[f"b_{c}" for c in payload],
            (F.col("_sa") * 1_000_000_000 + F.col("_xb")).alias("_pk"),
        )
    )
    cross = la.join(rb, "_pk").select(
        *[f"a_{c}" for c in payload], *[f"b_{c}" for c in payload]
    )
    return same.unionByName(cross)


def q148_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test on daily revenue — the standard
    nonparametric is-there-a-monotone-trend readout (CUSUM's q130
    sibling: q130 finds WHERE the level shifts, this asks WHETHER a
    trend exists): S = Σ_{i<j} sign(rev_j − rev_i) over all day pairs,
    tie-corrected variance 18·Var = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5),
    and the continuity-corrected z = (S∓1)/√Var in floored micro-units.
    S and the variance are EXACT int64; only the final z divides.

    Scale shape: the quadratic pair join is over the CALENDAR-BOUNDED
    day spine (the q99 bound: ~2.4k rows at any corpus size — the
    q102-skyline bounded-quadratic argument), after the fact scan
    collapses in one map-combinable agg. Tie groups are one more
    bounded agg. At 100 TB nothing here grows except the first
    aggregate's input."""
    daily = _daily_rev_cents(spark, sf_dir)
    w_day = Window.orderBy("day")
    d = daily.select(
        "rev", (F.row_number().over(w_day) - 1).alias("idx")
    ).localCheckpoint(eager=True)  # consumers: the pair kernel + ties
    s_df = spine_pairs(d).agg(
        F.sum(
            F.signum(
                (F.col("b_rev") - F.col("a_rev")).cast("double")
            ).cast("long")
        ).alias("s")
    )
    # tie scalars as DRIVER LONGS (q130's pattern — joining two 1-row
    # aggregates would plan the banned BroadcastNestedLoopJoin); the
    # tie agg runs over the checkpointed bounded spine, not the facts
    trow = (
        d.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum("t"),
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
        )
        .collect()[0]
    )
    n, tie_term = int(trow[0]), int(trow[1])
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    s = F.col("s")
    zc = F.when(s > 0, s - 1).when(s < 0, s + 1).otherwise(F.lit(0))
    return s_df.select(
        s.cast("long").alias("s_stat"),
        F.lit(n).cast("long").alias("n_days"),
        F.lit(var18 // 18).cast("long").alias("var_floor"),
        F.when(
            F.lit(var18 > 0),
            F.floor(
                F.lit(1_000_000) * zc.cast("double")
                / F.sqrt(F.lit(float(var18)) / F.lit(18.0))
            ),
        ).cast("long").alias("z_e6"),
    )


RELATIONAL_QUERIES["q148_mann_kendall"] = q148_mann_kendall
RELATIONAL_ORACLE["q148_mann_kendall"] = (
    "WITH " + _DAILY_REV_CTE + ", "
    "s AS ("
    "  SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1 "
    "    WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s "
    "  FROM daily a JOIN daily b ON a.day < b.day), "
    "ties AS ("
    "  SELECT COUNT(*) AS groups, CAST(SUM(t) AS BIGINT) AS n, "
    "    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term "
    "  FROM (SELECT rev, COUNT(*) AS t FROM daily GROUP BY 1)) "
    "SELECT s AS s_stat, n AS n_days, "
    "  CAST(FLOOR((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0) "
    "    AS BIGINT) AS var_floor, "
    "  CASE WHEN n * (n - 1) * (2 * n + 5) - tie_term > 0 THEN "
    "    CAST(FLOOR(1000000 * (CASE WHEN s > 0 THEN s - 1 "
    "      WHEN s < 0 THEN s + 1 ELSE 0 END) "
    "      / SQRT((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0)) "
    "      AS BIGINT) END AS z_e6 "
    "FROM s, ties"
)


# --------------------------------------------------------------------------
# q149: Theil-Sen robust trend slope on the daily revenue series
# --------------------------------------------------------------------------

def q149_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend slope on daily revenue — Mann-Kendall's
    (q148) companion estimator: the MEDIAN of all pairwise slopes
    (rev_b − rev_a)/(day_b − day_a), each slope floored to integer
    micro-cents-per-day BEFORE the median. Δrev is cast to double
    BEFORE the 1e6 scale-up so the expression cannot overflow int64 at
    any corpus size (review finding: daily deltas beyond ~$92B would
    ANSI-abort the integer form); below 2^53 the arithmetic is exact,
    above it both engines run the identical IEEE sequence so the
    floors still hash-match. Median = smallest slope with 2·cum ≥ n
    (the lower median, q108's integer predicate — no float ceil).

    Scale shape: pairs ride the spine_pairs kernel (equi-ized bounded
    quadratic over the calendar spine); the median runs q103/q108's
    collapse-then-cumulate pattern over the collapsed slope table. The
    cumulative window is unpartitioned over distinct slope values —
    bounded by spine²; the distributed_prefix_sum kernel is the named
    alternative if the slope universe ever outgrows one partition
    (PLANS.md's q22 note)."""
    daily = _daily_rev_cents(spark, sf_dir)
    w_day = Window.orderBy("day")
    d = daily.select(
        "rev",
        F.unix_date("day").alias("ud"),
        (F.row_number().over(w_day) - 1).alias("idx"),
    )
    slopes = spine_pairs(d).select(
        F.floor(
            F.lit(1_000_000)
            * (F.col("b_rev") - F.col("a_rev")).cast("double")
            / (F.col("b_ud") - F.col("a_ud"))
        ).cast("long").alias("slope_e6")
    )
    # Round-13 optimization (guide §2): the former groupBy(slope) +
    # UNPARTITIONED cumulative window sorted the ~n²/2 mostly-distinct
    # slope values on ONE reducer (the documented alternative was
    # named; this lands it). Lower median = the ceil(n/2)-th smallest
    # slope WITH multiplicity, so skip the collapse entirely:
    # repartitionByRange orders the slope stream across P partitions
    # (equal values land in one partition — range partitioning is
    # value-deterministic), a P-row per-partition count ledger finds
    # the partition holding global rank k and its offset (bounded
    # driver state, the distributed_prefix_sum discipline), and ONE
    # partition-local sort selects the row — no global window anywhere.
    from ..session import DEFAULT_SHUFFLE_PARTITIONS

    sp = (
        slopes.repartitionByRange(
            DEFAULT_SHUFFLE_PARTITIONS, "slope_e6"
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    ledger = sorted(
        (r["_pid"], r["c"])
        for r in sp.groupBy("_pid").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    )
    if not ledger:  # empty spine: one all-NULL row, like the old agg
        return local_df(
            spark, [(None, None)], "median_slope_e6 long, n_pairs long"
        )
    n = sum(c for _, c in ledger)
    k = (n + 1) // 2  # smallest slope with 2·cum ≥ n  ⇔  rank ceil(n/2)
    target, prior = ledger[0][0], 0
    for pid, c in ledger:
        if prior + c >= k:
            target = pid
            break
        prior += c
    w_local = Window.partitionBy("_pid").orderBy("slope_e6")
    return (
        sp.where(F.col("_pid") == target)
        .withColumn("_rn", F.row_number().over(w_local))
        .where(F.col("_rn") == k - prior)
        .select(
            F.col("slope_e6").alias("median_slope_e6"),
            F.lit(n).cast("long").alias("n_pairs"),
        )
    )


RELATIONAL_QUERIES["q149_theil_sen"] = q149_theil_sen
RELATIONAL_ORACLE["q149_theil_sen"] = (
    "WITH " + _DAILY_REV_CTE + ", "
    "d AS (SELECT rev, day - DATE '1970-01-01' AS ud FROM daily), "
    "slopes AS ("
    "  SELECT CAST(FLOOR(1000000 * CAST(b.rev - a.rev AS DOUBLE) "
    "    / (b.ud - a.ud)) AS BIGINT) AS slope_e6 "
    "  FROM d a JOIN d b ON a.ud < b.ud), "
    "vals AS ("
    "  SELECT slope_e6, COUNT(*) AS c FROM slopes GROUP BY 1), "
    "cum AS ("
    "  SELECT slope_e6, "
    "    SUM(c) OVER (ORDER BY slope_e6 ROWS UNBOUNDED PRECEDING) AS cum, "
    "    SUM(c) OVER () AS n "
    "  FROM vals) "
    "SELECT CAST(MIN(CASE WHEN 2 * cum >= n THEN slope_e6 END) AS BIGINT) "
    "  AS median_slope_e6, "
    "  CAST(MAX(n) AS BIGINT) AS n_pairs "
    "FROM cum"
)


# --------------------------------------------------------------------------
# q150: referential-integrity audit across the star schema
# --------------------------------------------------------------------------

def q150_fk_integrity(spark, sf_dir):
    """Referential-integrity audit — the warehouse health check a
    data-table user runs before trusting any join: orphaned lineitems
    (no parent order), childless orders (no lineitems), orders with a
    dangling customer key, and customers with a dangling nation key,
    plus the base cardinalities, in ONE result row. Each violation
    count is an anti-join (left-anti: the null-safe 'no match exists'
    form — q113 documents the NOT-IN/NAAJ contrast).

    Scale shape: four key anti-joins, each shuffling only its two key
    columns (projection pushdown keeps the scans skinny); counts are
    map-combinable; dims broadcast where small. Scalars are assembled
    by a tagged union + conditional agg — the q106/q123 join-free
    pattern (per-count crossJoins would stack nested loops)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey")

    def tagged(df, tag):
        return df.select(F.lit(tag).alias("tag"))

    counts = (
        tagged(li, "lineitems")
        .unionAll(tagged(o, "orders"))
        .unionAll(
            tagged(li.join(o, li["l_orderkey"] == o["o_orderkey"],
                           "left_anti"), "orphan_lineitems")
        )
        .unionAll(
            tagged(o.join(li, o["o_orderkey"] == li["l_orderkey"],
                          "left_anti"), "childless_orders")
        )
        .unionAll(
            tagged(o.join(c, o["o_custkey"] == c["c_custkey"],
                          "left_anti"), "dangling_custkeys")
        )
        .unionAll(
            tagged(c.join(F.broadcast(n),
                          c["c_nationkey"] == n["n_nationkey"],
                          "left_anti"), "dangling_nationkeys")
        )
    )

    def pick(tag):
        return F.coalesce(
            F.sum(F.when(F.col("tag") == tag, 1)), F.lit(0)
        ).cast("long").alias(f"n_{tag}")

    return counts.agg(
        pick("lineitems"), pick("orders"), pick("orphan_lineitems"),
        pick("childless_orders"), pick("dangling_custkeys"),
        pick("dangling_nationkeys"),
    )


RELATIONAL_QUERIES["q150_fk_integrity"] = q150_fk_integrity
RELATIONAL_ORACLE["q150_fk_integrity"] = (
    "SELECT "
    "  (SELECT COUNT(*) FROM lineitem) AS n_lineitems, "
    "  (SELECT COUNT(*) FROM orders) AS n_orders, "
    "  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS ("
    "    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) "
    "    AS n_orphan_lineitems, "
    "  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS ("
    "    SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) "
    "    AS n_childless_orders, "
    "  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS ("
    "    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) "
    "    AS n_dangling_custkeys, "
    "  (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS ("
    "    SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) "
    "    AS n_dangling_nationkeys"
)


# --------------------------------------------------------------------------
# q151: Kaplan-Meier survival per signup cohort (the keyed, 100 TB form)
# --------------------------------------------------------------------------

def q151_survival_by_cohort(spark, sf_dir):
    """Kaplan-Meier survival tables PER SIGNUP COHORT (first-event
    day) — q143's scalable sibling and the form a retention dashboard
    actually wants (compare cohorts' curves): every window is
    PARTITIONED BY cohort, so unlike q143's global bounded-spine
    windows this shape scales keyed — per-cohort spine rows shuffle to
    their cohort's reducer and no single partition ever sees the whole
    table. Per-cohort user totals come from a keyed full-frame window
    (cohort cardinality is calendar-bounded); only the global censoring
    horizon rides as a driver long (q130's scalar pattern). Hour-
    granular lifetimes, 12 h churn horizon, and per-step floored
    log-survival are exactly q143's semantics."""
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    e = _t(spark, sf_dir, "events").select("user_id", us.alias("t"))
    users = e.groupBy("user_id").agg(
        F.min("t").alias("first_t"), F.max("t").alias("last_t")
    )
    gmax = int(users.agg(F.max("last_t")).collect()[0][0])
    per_user = users.select(
        F.date_from_unix_date(
            F.expr("first_t div 86400000000").cast("int")
        ).alias("cohort"),
        F.expr("(last_t - first_t) div 3600000000").alias("dur"),
        (F.col("last_t") < F.lit(gmax - 12 * 3_600_000_000))
        .cast("long").alias("ev"),
    )
    dist = per_user.groupBy("cohort", "dur").agg(
        F.count(F.lit(1)).alias("n_total"), F.sum("ev").alias("n_event")
    )
    w_cum = Window.partitionBy("cohort").orderBy("dur").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("cohort")
    km = dist.select(
        "cohort",
        "dur",
        "n_event",
        (
            F.sum("n_total").over(w_all)
            - F.sum("n_total").over(w_cum)
            + F.col("n_total")
        ).alias("n_risk"),
    ).where(F.col("n_event") > 0)
    step = F.when(
        F.col("n_event") < F.col("n_risk"),
        F.floor(
            F.lit(1_000_000)
            * F.log(
                (F.col("n_risk") - F.col("n_event")).cast("double")
                / F.col("n_risk").cast("double")
            )
        ).cast("long"),
    )
    staged = km.select(
        "cohort", "dur", "n_risk", "n_event", step.alias("step_e6")
    )
    return staged.select(
        "cohort",
        F.col("dur").cast("long").alias("dur_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("n_event").cast("long").alias("n_event"),
        F.when(
            F.col("n_event") < F.col("n_risk"),
            F.sum("step_e6").over(w_cum),
        ).cast("long").alias("log_surv_e6"),
    )


RELATIONAL_QUERIES["q151_survival_by_cohort"] = q151_survival_by_cohort
RELATIONAL_ORACLE["q151_survival_by_cohort"] = (
    "WITH u AS ("
    "  SELECT user_id, "
    "    MIN(epoch_us(ts)) AS first_t, "
    "    MAX(epoch_us(ts)) AS last_t "
    "  FROM events GROUP BY 1), "
    "g AS (SELECT MAX(last_t) AS gmax FROM u), "
    "p AS ("
    "  SELECT DATE '1970-01-01' "
    "      + CAST(first_t // 86400000000 AS INTEGER) AS cohort, "
    "    (last_t - first_t) // 3600000000 AS dur, "
    "    CASE WHEN last_t < (SELECT gmax FROM g) - 43200000000 "
    "      THEN 1 ELSE 0 END AS ev "
    "  FROM u), "
    "dist AS ("
    "  SELECT cohort, dur, COUNT(*) AS n_total, "
    "    CAST(SUM(ev) AS BIGINT) AS n_event "
    "  FROM p GROUP BY 1, 2), "
    "km AS ("
    "  SELECT cohort, dur, n_event, "
    "    SUM(n_total) OVER (PARTITION BY cohort) "
    "      - SUM(n_total) OVER (PARTITION BY cohort ORDER BY dur "
    "        ROWS UNBOUNDED PRECEDING) "
    "      + n_total AS n_risk "
    "  FROM dist), "
    "ev AS ("
    "  SELECT cohort, dur, n_risk, n_event, "
    "    CASE WHEN n_event < n_risk THEN "
    "      CAST(FLOOR(1000000 * LN(CAST(n_risk - n_event AS DOUBLE) "
    "        / CAST(n_risk AS DOUBLE))) AS BIGINT) END AS step_e6 "
    "  FROM km WHERE n_event > 0) "
    "SELECT CAST(cohort AS DATE) AS cohort, "
    "  CAST(dur AS BIGINT) AS dur_days, "
    "  CAST(n_risk AS BIGINT) AS n_risk, n_event, "
    "  CASE WHEN n_event < n_risk THEN "
    "    CAST(SUM(step_e6) OVER (PARTITION BY cohort ORDER BY dur "
    "      ROWS UNBOUNDED PRECEDING) AS BIGINT) END AS log_surv_e6 "
    "FROM ev"
)


# --------------------------------------------------------------------------
# q152: correlated LATERAL top-k — the SQL surface Spark decorrelates
# --------------------------------------------------------------------------

def q152_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery with ORDER BY + LIMIT: top-3
    customers by account balance per region, written as the SQL-standard
    ``FROM region r, LATERAL (SELECT ... WHERE n_regionkey =
    r.r_regionkey ORDER BY ... LIMIT 3)`` — the surface a reference
    user would reach for before knowing the window idiom
    (data-table's get-data-table passthrough, data-table.lisp:33-39,
    lets users run exactly this class of vendor SQL).

    What Spark does with it (observed, sf0.01 plan): Catalyst
    DECORRELATES the per-row subquery into a row_number window over
    the correlation key — no per-outer-row re-execution, both joins
    broadcast. The wart worth knowing: the rewrite FIRST materializes
    the subquery's ORDER BY as a global rangepartitioning sort over
    ALL customers, then hash-exchanges by the correlation key for the
    window — one exchange more than the handwritten form. At 100 TB
    write q90_latest_n_per_key's direct window (one hash shuffle, per
    -key local sort) instead; this gate pins the semantics of the
    lateral surface and PERF_NOTES records the plan delta."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("q152_customer")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("q152_nation")
    _t(spark, sf_dir, "region").createOrReplaceTempView("q152_region")
    return spark.sql("""
        SELECT r.r_name AS region, t.c_name AS c_name,
               t.c_acctbal AS c_acctbal
        FROM q152_region r,
        LATERAL (
          SELECT c.c_name, c.c_acctbal
          FROM q152_customer c
          JOIN q152_nation n ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          ORDER BY c.c_acctbal DESC, c.c_custkey
          LIMIT 3
        ) t
    """)


RELATIONAL_QUERIES["q152_lateral_topk"] = q152_lateral_topk
RELATIONAL_ORACLE["q152_lateral_topk"] = (
    "SELECT r.r_name AS region, t.c_name AS c_name, "
    "  t.c_acctbal AS c_acctbal "
    "FROM region r, "
    "LATERAL ("
    "  SELECT c.c_name, c.c_acctbal "
    "  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "  WHERE n.n_regionkey = r.r_regionkey "
    "  ORDER BY c.c_acctbal DESC, c.c_custkey "
    "  LIMIT 3"
    ") t"
)


# --------------------------------------------------------------------------
# q153: Spark 4 native WITH RECURSIVE — the same walk, engine-recursive
# --------------------------------------------------------------------------

def q153_native_recursive_cte(spark, sf_dir):
    """Spark 4's native ``WITH RECURSIVE`` (new engine surface in 4.x)
    running q121's exact parent walk: per part, climb parent =
    node DIV 2 to the root, emit (node, root, depth). Together with
    q121 this triple-proves the hierarchy semantics — Spark native
    recursion == DuckDB RECURSIVE CTE (this gate's hash) and pointer
    doubling == DuckDB (q121's hash) — by three algebraically
    independent constructions.

    Scale verdict, pinned here so the two gates stay a deliberate
    pair: the native recursive CTE executes one DISTRIBUTED JOIN
    ROUND PER DEPTH LEVEL (O(depth) sequential shuffles; iteration
    cap spark.sql.cteRecursionLevelLimit), which is fine for the
    shallow hierarchies real catalogs have — while pointer_doubling
    (q121) needs only O(log depth) rounds and is the 100 TB form for
    deep or unknown-depth graphs. Use the native surface for
    readability on shallow data; the kernel for scale."""
    _t(spark, sf_dir, "part").select("p_partkey").createOrReplaceTempView(
        "q153_part"
    )
    return spark.sql("""
        WITH RECURSIVE walk(node, cur, d) AS (
          SELECT p_partkey, p_partkey, 0 FROM q153_part
          UNION ALL
          SELECT node, cur DIV 2, d + 1 FROM walk WHERE cur > 1
        )
        SELECT node, CAST(1 AS BIGINT) AS root,
               CAST(MAX(d) AS BIGINT) AS depth
        FROM walk GROUP BY node
    """)


RELATIONAL_QUERIES["q153_native_recursive_cte"] = q153_native_recursive_cte
RELATIONAL_ORACLE["q153_native_recursive_cte"] = (
    "WITH RECURSIVE walk(node, cur, d) AS ("
    "  SELECT p_partkey, p_partkey, 0 FROM part "
    "  UNION ALL "
    "  SELECT node, cur // 2, d + 1 FROM walk WHERE cur > 1) "
    "SELECT node, CAST(1 AS BIGINT) AS root, "
    "  CAST(MAX(d) AS BIGINT) AS depth "
    "FROM walk GROUP BY node"
)


# --------------------------------------------------------------------------
# q154: time-bounded conversion funnel (windowFunnel), first-touch anchored
# --------------------------------------------------------------------------

def q154_window_funnel(spark, sf_dir):
    """Time-bounded three-step funnel (the windowFunnel readout every
    product-analytics engine ships): per user, anchor at the FIRST
    'view', chain to the earliest 'click' strictly after it, then the
    earliest 'purchase' strictly after that; the user's level is the
    deepest step whose timestamp still fits inside 24 h of the anchor.
    First-touch anchoring + earliest-next-step chaining makes the level
    a pure function of per-user MINs — deterministic on both engines
    with no tie policy needed (MIN is order-free), unlike q63's
    strict-ordering funnel which counts step rows.

    Scale shape: ONE shuffle — three stacked Window nodes share the
    user_id partitioning (t2's predicate consumes t1's frame, t3's
    consumes t2's; Catalyst plans them over a single Exchange), then
    the per-user level collapses through a distinct + global count
    whose cardinality is 4 levels. No collect_list state: memory per
    row is three timestamps, so a hot user costs sort time, not heap
    (the skewed 100x events synthesis is the target shape)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = e.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    t2 = t1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    t3 = t2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    horizon = F.col("t1") + F.expr("INTERVAL 24 HOURS")
    lv = t3.select(
        "user_id",
        F.when(F.col("t3").isNotNull() & (F.col("t3") <= horizon), 3)
        .when(F.col("t2").isNotNull() & (F.col("t2") <= horizon), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("level"),
    ).distinct()
    return lv.groupBy("level").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


RELATIONAL_QUERIES["q154_window_funnel"] = q154_window_funnel
RELATIONAL_ORACLE["q154_window_funnel"] = (
    "WITH t1 AS ("
    "  SELECT user_id, MIN(ts) AS ts1 FROM events "
    "  WHERE event_type = 'view' GROUP BY 1), "
    "t2 AS ("
    "  SELECT e.user_id, MIN(e.ts) AS ts2 "
    "  FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.ts1 "
    "  WHERE e.event_type = 'click' GROUP BY 1), "
    "t3 AS ("
    "  SELECT e.user_id, MIN(e.ts) AS ts3 "
    "  FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.ts2 "
    "  WHERE e.event_type = 'purchase' GROUP BY 1), "
    "u AS (SELECT DISTINCT user_id FROM events), "
    "lv AS ("
    "  SELECT u.user_id, CASE "
    "    WHEN ts3 IS NOT NULL AND ts3 <= ts1 + INTERVAL 24 HOUR THEN 3 "
    "    WHEN ts2 IS NOT NULL AND ts2 <= ts1 + INTERVAL 24 HOUR THEN 2 "
    "    WHEN ts1 IS NOT NULL THEN 1 ELSE 0 END AS level "
    "  FROM u LEFT JOIN t1 ON u.user_id = t1.user_id "
    "  LEFT JOIN t2 ON u.user_id = t2.user_id "
    "  LEFT JOIN t3 ON u.user_id = t3.user_id) "
    "SELECT CAST(level AS BIGINT) AS level, "
    "  CAST(COUNT(*) AS BIGINT) AS n_users "
    "FROM lv GROUP BY 1"
)


# --------------------------------------------------------------------------
# q155: RFM segmentation (recency / frequency / monetary quintiles)
# --------------------------------------------------------------------------

def q155_rfm_segments(spark, sf_dir):
    """RFM customer segmentation — the classic marketing rollup: per
    customer, days since last order (R), order count (F), lifetime
    spend in exact cents (M); each dimension quintiled with ntile(5)
    under a fully tie-broken total order (metric, then custkey — SQL
    ntile is deterministic only given a total order), then segments
    aggregated to (r,f,m) cells. Spend is summed in integer cents so
    both engines rank the same exact values (q128's cents discipline;
    a double SUM could flip a quintile edge on an ulp).

    Scale shape: one shuffle to the per-customer rollup (map-side
    combinable aggs), then three ntile windows over the CUSTOMER
    dimension — bounded by |customers|, not facts. The single-reducer
    global windows are the documented dim-sized exception (the q99
    day-spine rationale); at open-web customer counts swap ntile for
    q108's two-phase exact-percentile split on the same cents values."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("f_cnt"),
        F.sum("cents").alias("m_cents"),
    )
    anchored = per_cust.withColumn(
        "r_days",
        F.datediff(
            F.max("last_order").over(Window.partitionBy()), F.col("last_order")
        ).cast("long"),
    )
    scored = anchored.select(
        "o_custkey", "r_days", "f_cnt", "m_cents",
        F.ntile(5).over(
            Window.orderBy(F.col("r_days").desc(), F.col("o_custkey"))
        ).alias("r_score"),
        F.ntile(5).over(
            Window.orderBy(F.col("f_cnt").asc(), F.col("o_custkey"))
        ).alias("f_score"),
        F.ntile(5).over(
            Window.orderBy(F.col("m_cents").asc(), F.col("o_custkey"))
        ).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("m_cents").cast("long").alias("segment_cents"),
    ).select(
        F.col("r_score").cast("long").alias("r_score"),
        F.col("f_score").cast("long").alias("f_score"),
        F.col("m_score").cast("long").alias("m_score"),
        "n_customers", "segment_cents",
    )


RELATIONAL_QUERIES["q155_rfm_segments"] = q155_rfm_segments
RELATIONAL_ORACLE["q155_rfm_segments"] = (
    "WITH per_cust AS ("
    "  SELECT o_custkey, MAX(o_orderdate) AS last_order, "
    "    COUNT(*) AS f_cnt, "
    "    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "      AS m_cents "
    "  FROM orders GROUP BY 1), "
    "anchored AS ("
    "  SELECT *, CAST(DATEDIFF('day', last_order, "
    "    MAX(last_order) OVER ()) AS BIGINT) AS r_days "
    "  FROM per_cust), "
    "scored AS ("
    "  SELECT o_custkey, m_cents, "
    "    NTILE(5) OVER (ORDER BY r_days DESC, o_custkey) AS r_score, "
    "    NTILE(5) OVER (ORDER BY f_cnt ASC, o_custkey) AS f_score, "
    "    NTILE(5) OVER (ORDER BY m_cents ASC, o_custkey) AS m_score "
    "  FROM anchored) "
    "SELECT CAST(r_score AS BIGINT) AS r_score, "
    "  CAST(f_score AS BIGINT) AS f_score, "
    "  CAST(m_score AS BIGINT) AS m_score, "
    "  CAST(COUNT(*) AS BIGINT) AS n_customers, "
    "  CAST(SUM(m_cents) AS BIGINT) AS segment_cents "
    "FROM scored GROUP BY 1, 2, 3"
)


# --------------------------------------------------------------------------
# q156: exponential time-decay engagement score (feature-store rollup)
# --------------------------------------------------------------------------

def q156_decay_score(spark, sf_dir):
    """Exponentially time-decayed engagement per market segment — the
    feature-store rollup behind churn/LTV features: each order
    contributes exp(-age_days/30), so last week's order counts ~30x a
    five-month-old one, and the segment score is the sum. Decay weights
    floor-quantize to integer micro-units PER ROW before the sum
    (q127's transcendental discipline: the exp() argument -k/30 is a
    division of exact integers, so both engines evaluate the same
    double, and the e6 floor leaves three orders of magnitude between
    an ulp wobble and a flipped integer; the sum is then exact int64).

    Scale shape: the global anchor (max order date) is fetched as ONE
    DRIVER SCALAR and inlined as a literal (the bigram_lm precedent —
    the 1-row-broadcast crossJoin alternative plans a
    BroadcastNestedLoopJoin, which the 100x smoke's blanket rule bans);
    weights are map-side expressions; the customer join broadcasts the
    dim, and the segment rollup is the only shuffle.
    Decayed sums are associative, so at 100 TB this runs as partial
    aggregates with map-side combine — and an incremental refresh only
    rescales yesterday's total by exp(-1/30), which is the operational
    reason decay features use exponentials at all."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    anchor = o.agg(F.max("o_orderdate")).collect()[0][0]
    weighted = o.select(
        "o_custkey",
        F.floor(
            F.lit(1_000_000)
            * F.exp(
                -F.datediff(
                    F.lit(anchor).cast("timestamp"), F.col("o_orderdate")
                )
                / F.lit(30.0)
            )
        ).cast("long").alias("w_e6"),
    )
    return (
        weighted.join(F.broadcast(c), weighted["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("w_e6").cast("long").alias("decayed_e6"),
        )
    )


RELATIONAL_QUERIES["q156_decay_score"] = q156_decay_score
RELATIONAL_ORACLE["q156_decay_score"] = (
    "WITH anchor AS (SELECT MAX(o_orderdate) AS anchor FROM orders), "
    "w AS ("
    "  SELECT o_custkey, CAST(FLOOR(1000000 * EXP("
    "    -DATEDIFF('day', o_orderdate, anchor) / 30.0)) AS BIGINT) AS w_e6 "
    "  FROM orders, anchor) "
    "SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders, "
    "  CAST(SUM(w_e6) AS BIGINT) AS decayed_e6 "
    "FROM w JOIN customer c ON w.o_custkey = c.c_custkey "
    "GROUP BY 1"
)


# --------------------------------------------------------------------------
# q157: price-volume-mix decomposition (period-over-period revenue bridge)
# --------------------------------------------------------------------------

def q157_price_volume_mix(spark, sf_dir):
    """Revenue-bridge decomposition per part brand — the FP&A readout
    behind every "why did revenue move" question: split the corpus at
    the midpoint ship date into two periods and attribute each brand's
    revenue delta to a VOLUME effect ((q1−q0) at period-0 price) and a
    PRICE effect (the exact remainder, keeping the bridge additive —
    the standard residual assignment, so volume+price == Δrev by
    construction). Quantities and cents are exact integers; the one
    division (period-0 unit price) happens inside FLOOR of a double
    ratio of sub-2^53 integers, identical on both engines (q127's
    discipline); the midpoint is integer epoch arithmetic.

    Scale shape: lineitem joins the part dim (broadcast); the global
    min/max epoch is fetched as TWO DRIVER LONGS inlined as literals
    (bigram_lm/q156 precedent — a 1-row crossJoin would plan the BNLJ
    the 100x smoke bans), and the whole decomposition collapses in ONE
    conditional aggregate per brand — no second fact scan, no window."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.unix_timestamp("l_shipdate").alias("ep"),
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    lo, hi = li.agg(F.min("ep"), F.max("ep")).collect()[0]
    tagged = (
        li.withColumn("p1", F.col("ep") >= F.lit((lo + hi) / 2))
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    )

    def side(col, when1):
        return F.coalesce(
            F.sum(F.when(F.col("p1") == when1, F.col(col))), F.lit(0)
        )

    agg = tagged.groupBy("p_brand").agg(
        side("qty", False).cast("long").alias("qty0"),
        side("qty", True).cast("long").alias("qty1"),
        side("cents", False).cast("long").alias("rev0_cents"),
        side("cents", True).cast("long").alias("rev1_cents"),
    )
    volume = F.floor(
        (F.col("qty1") - F.col("qty0"))
        * (F.col("rev0_cents").cast("double") / F.col("qty0"))
    ).cast("long")
    return agg.where(F.col("qty0") > 0).select(
        "p_brand", "qty0", "qty1", "rev0_cents", "rev1_cents",
        volume.alias("volume_effect_cents"),
        (
            F.col("rev1_cents") - F.col("rev0_cents") - volume
        ).cast("long").alias("price_effect_cents"),
    )


RELATIONAL_QUERIES["q157_price_volume_mix"] = q157_price_volume_mix
RELATIONAL_ORACLE["q157_price_volume_mix"] = (
    "WITH li AS ("
    "  SELECT l_partkey, epoch(l_shipdate) AS ep, "
    "    CAST(ROUND(l_quantity) AS BIGINT) AS qty, "
    "    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents "
    "  FROM lineitem), "
    "span AS (SELECT MIN(ep) AS lo, MAX(ep) AS hi FROM li), "
    "agg AS ("
    "  SELECT p.p_brand, "
    "    CAST(COALESCE(SUM(CASE WHEN ep >= (lo + hi) / 2 "
    "      THEN NULL ELSE qty END), 0) AS BIGINT) AS qty0, "
    "    CAST(COALESCE(SUM(CASE WHEN ep >= (lo + hi) / 2 "
    "      THEN qty END), 0) AS BIGINT) AS qty1, "
    "    CAST(COALESCE(SUM(CASE WHEN ep >= (lo + hi) / 2 "
    "      THEN NULL ELSE cents END), 0) AS BIGINT) AS rev0_cents, "
    "    CAST(COALESCE(SUM(CASE WHEN ep >= (lo + hi) / 2 "
    "      THEN cents END), 0) AS BIGINT) AS rev1_cents "
    "  FROM li CROSS JOIN span "
    "  JOIN part p ON li.l_partkey = p.p_partkey "
    "  GROUP BY 1) "
    "SELECT p_brand, qty0, qty1, rev0_cents, rev1_cents, "
    "  CAST(FLOOR((qty1 - qty0) * (CAST(rev0_cents AS DOUBLE) / qty0)) "
    "    AS BIGINT) AS volume_effect_cents, "
    "  CAST(rev1_cents - rev0_cents "
    "    - FLOOR((qty1 - qty0) * (CAST(rev0_cents AS DOUBLE) / qty0)) "
    "    AS BIGINT) AS price_effect_cents "
    "FROM agg WHERE qty0 > 0"
)


# --------------------------------------------------------------------------
# q158: daily active users split new vs returning (product health metric)
# --------------------------------------------------------------------------

def q158_new_vs_returning(spark, sf_dir):
    """Daily actives split into NEW (first-ever event lands today) vs
    RETURNING — the growth-accounting readout behind every DAU chart:
    growth is new + resurrected... this fixture has no gaps long enough
    for a resurrection bucket, so the canonical two-way split. A user's
    first day comes from ONE min-aggregate; each active (user, day) then
    classifies by equality — no window over the event stream.

    Scale shape: distinct (user, day) collapse (map-combinable), a
    per-user min over the COLLAPSED table (second shuffle on user), and
    a broadcast-size daily rollup. The firsts table is user-bounded and
    fact-derived: its join back to the collapsed actives shares the
    user partitioning, so AQE keeps it to the same exchange."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    active = e.distinct()
    firsts = active.groupBy("user_id").agg(F.min("d").alias("first_d"))
    return (
        active.join(firsts, "user_id")
        .groupBy("d")
        .agg(
            F.sum(F.when(F.col("d") == F.col("first_d"), 1).otherwise(0))
            .cast("long").alias("new_users"),
            F.sum(F.when(F.col("d") != F.col("first_d"), 1).otherwise(0))
            .cast("long").alias("returning_users"),
        )
        .select(
            F.col("d").cast("string").alias("day"),
            "new_users", "returning_users",
        )
    )


RELATIONAL_QUERIES["q158_new_vs_returning"] = q158_new_vs_returning
RELATIONAL_ORACLE["q158_new_vs_returning"] = (
    "WITH active AS ("
    "  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events), "
    "firsts AS ("
    "  SELECT user_id, MIN(d) AS first_d FROM active GROUP BY 1) "
    "SELECT CAST(a.d AS VARCHAR) AS day, "
    "  CAST(SUM(CASE WHEN a.d = f.first_d THEN 1 ELSE 0 END) AS BIGINT) "
    "    AS new_users, "
    "  CAST(SUM(CASE WHEN a.d <> f.first_d THEN 1 ELSE 0 END) AS BIGINT) "
    "    AS returning_users "
    "FROM active a JOIN firsts f ON a.user_id = f.user_id "
    "GROUP BY 1"
)


# --------------------------------------------------------------------------
# q159: keyed CUSUM changepoints (per-series monitoring at fleet scale)
# --------------------------------------------------------------------------

def q159_cusum_by_key(spark, sf_dir):
    """Per-key CUSUM changepoint — q130's level-shift detector in the
    form a monitoring fleet actually runs it: one break day PER SERIES
    (here per event type over daily counts), thousands of series in one
    pass (the q143→q151 keyed-sibling pattern). Same exact integer
    statistic |n·S_k − k·S_n|; the per-key totals that q130 fetched as
    driver scalars become two more windows over the SAME (type)
    partition — every window shares one exchange, and the spine is
    bounded by types × calendar days. Argmax per key is one struct
    extremum with the earliest-day tie-break; no sort, no self-join."""
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = e.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type", "day",
        F.row_number().over(w_ord).alias("k"),
        F.sum("cnt").over(w_cum).alias("s_k"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("cnt").over(w_all).alias("s_n"),
    )
    best = cum.select(
        "event_type", "n", "s_n",
        F.struct(
            F.abs(
                F.col("n") * F.col("s_k") - F.col("k") * F.col("s_n")
            ).alias("stat"),
            (-F.unix_date("day")).alias("negd"),
        ).alias("cand"),
    ).groupBy("event_type").agg(
        F.max("cand").alias("b"),
        F.max("n").cast("long").alias("n_days"),
        F.max("s_n").cast("long").alias("total_events"),
    )
    return best.select(
        "event_type",
        F.date_from_unix_date(-F.col("b.negd")).cast("string").alias("break_day"),
        F.col("b.stat").cast("long").alias("cusum_num"),
        "n_days", "total_events",
    )


RELATIONAL_QUERIES["q159_cusum_by_key"] = q159_cusum_by_key
RELATIONAL_ORACLE["q159_cusum_by_key"] = (
    "WITH daily AS ("
    "  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt "
    "  FROM events GROUP BY 1, 2), "
    "cum AS ("
    "  SELECT event_type, day, "
    "    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k, "
    "    SUM(cnt) OVER (PARTITION BY event_type ORDER BY day "
    "      ROWS UNBOUNDED PRECEDING) AS s_k, "
    "    COUNT(*) OVER (PARTITION BY event_type) AS n, "
    "    SUM(cnt) OVER (PARTITION BY event_type) AS s_n "
    "  FROM daily), "
    "scored AS ("
    "  SELECT event_type, day, n, s_n, "
    "    ABS(n * s_k - k * s_n) AS stat "
    "  FROM cum), "
    "mx AS ("
    "  SELECT event_type, MAX(stat) AS mstat FROM scored GROUP BY 1) "
    "SELECT s.event_type, "
    "  CAST(MIN(s.day) AS VARCHAR) AS break_day, "
    "  CAST(MAX(s.stat) AS BIGINT) AS cusum_num, "
    "  CAST(MAX(s.n) AS BIGINT) AS n_days, "
    "  CAST(MAX(s.s_n) AS BIGINT) AS total_events "
    "FROM scored s JOIN mx ON s.event_type = mx.event_type "
    "  AND s.stat = mx.mstat "
    "GROUP BY 1"
)


# --------------------------------------------------------------------------
# q160: share-of-parent contribution in a dimension hierarchy
# --------------------------------------------------------------------------

def q160_share_of_parent(spark, sf_dir):
    """Contribution analysis down a dimension hierarchy — the "% of
    parent" column every BI drill-down shows: revenue per nation, as a
    share of its region and of the total, in e6-floored integer ratios
    of exact cent sums (the one division per level happens inside
    FLOOR of a ratio of sub-2^53 integers — q127's discipline, so both
    engines agree bit-for-bit).

    Scale shape: ONE fact aggregate to the (region, nation) grain (the
    hierarchy is dim-bounded), then region/total shares come from two
    windows over that bounded rollup — never a second fact pass. Dims
    broadcast; the rollup is the only fact shuffle."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    grain = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(F.sum("cents").alias("rev_c"))
    )
    w_r = Window.partitionBy("r_name")
    w_all = Window.partitionBy()

    def share(total):
        # DECIMAL(38,0) numerator: 1e6·rev_c overflows int64 once a
        # parent's cents pass ~9.2e12 (the 100× smoke found exactly
        # this — ARITHMETIC_OVERFLOW under ANSI mode); decimal keeps
        # the product exact to 38 digits at any realistic scale.
        # _floor_div_dec gives the exact floored quotient — F.floor of
        # the raw decimal division saw a HALF_UP-rounded scale-6 value
        # (round-8 ADVICE item).
        return _floor_div_dec(
            F.col("rev_c").cast("decimal(38,0)") * F.lit(1_000_000),
            total.cast("decimal(38,0)"),
        )

    return grain.select(
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
        F.col("rev_c").cast("long").alias("rev_cents"),
        share(F.sum("rev_c").over(w_r)).alias("share_of_region_e6"),
        share(F.sum("rev_c").over(w_all)).alias("share_of_total_e6"),
    )


RELATIONAL_QUERIES["q160_share_of_parent"] = q160_share_of_parent
RELATIONAL_ORACLE["q160_share_of_parent"] = (
    "WITH grain AS ("
    "  SELECT r.r_name AS region, n.n_name AS nation, "
    "    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "      AS rev_c "
    "  FROM orders o "
    "  JOIN customer c ON o.o_custkey = c.c_custkey "
    "  JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "  JOIN region r ON n.n_regionkey = r.r_regionkey "
    "  GROUP BY 1, 2) "
    "SELECT region, nation, rev_c AS rev_cents, "
    "  CAST(FLOOR(1000000 * rev_c / "
    "    SUM(rev_c) OVER (PARTITION BY region)) AS BIGINT) "
    "    AS share_of_region_e6, "
    "  CAST(FLOOR(1000000 * rev_c / SUM(rev_c) OVER ()) AS BIGINT) "
    "    AS share_of_total_e6 "
    "FROM grain"
)


# --------------------------------------------------------------------------
# q161: key-skew profile (per-key cardinality distribution readout)
# --------------------------------------------------------------------------

def q161_key_skew_profile(spark, sf_dir):
    """Key-skew profile of events.user_id — the diagnostic a 100 TB
    operator reads BEFORE choosing salting/AQE strategies for any
    user-keyed shuffle: exact p50/p90/p99/max of per-key row counts,
    distinct keys, and the share of all rows owned by the single
    hottest key (hot_share in e6). Two-phase exact order statistics on
    the COUNTS' distribution (q108's collapse-then-cumulate: per-key
    counts collapse again to (count, n_keys) — the support is tiny —
    then one cumulative window + conditional min per percentile).

    Scale shape: one fact shuffle (the per-key count), then windows
    over the collapsed count-of-counts table, bounded by distinct
    per-key counts, not keys."""
    e = _t(spark, sf_dir, "events").select("user_id")
    per_key = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    dist = per_key.groupBy("c").agg(F.count(F.lit(1)).alias("keys"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = dist.select(
        "c", "keys",
        F.sum("keys").over(w).alias("cum_keys"),
        F.sum(F.col("c") * F.col("keys")).over(
            Window.orderBy("c").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total_rows"),
        F.sum("keys").over(
            Window.orderBy("c").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_keys"),
    )

    def pct(p):
        # smallest count whose cumulative key coverage reaches p%
        return F.min(
            F.when(
                F.lit(100) * F.col("cum_keys") >= F.lit(p) * F.col("n_keys"),
                F.col("c"),
            )
        ).cast("long")

    return cum.agg(
        F.max("n_keys").cast("long").alias("n_keys"),
        F.max("total_rows").cast("long").alias("n_rows"),
        pct(50).alias("p50_rows_per_key"),
        pct(90).alias("p90_rows_per_key"),
        pct(99).alias("p99_rows_per_key"),
        F.max("c").cast("long").alias("max_rows_per_key"),
        F.floor(
            F.lit(1_000_000) * F.max("c") / F.max("total_rows")
        ).cast("long").alias("hot_share_e6"),
    )


RELATIONAL_QUERIES["q161_key_skew_profile"] = q161_key_skew_profile
RELATIONAL_ORACLE["q161_key_skew_profile"] = (
    "WITH per_key AS ("
    "  SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1), "
    "dist AS (SELECT c, COUNT(*) AS keys FROM per_key GROUP BY 1), "
    "cum AS ("
    "  SELECT c, keys, "
    "    SUM(keys) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum_keys, "
    "    SUM(c * keys) OVER () AS total_rows, "
    "    SUM(keys) OVER () AS n_keys "
    "  FROM dist) "
    "SELECT CAST(MAX(n_keys) AS BIGINT) AS n_keys, "
    "  CAST(MAX(total_rows) AS BIGINT) AS n_rows, "
    "  CAST(MIN(CASE WHEN 100 * cum_keys >= 50 * n_keys THEN c END) "
    "    AS BIGINT) AS p50_rows_per_key, "
    "  CAST(MIN(CASE WHEN 100 * cum_keys >= 90 * n_keys THEN c END) "
    "    AS BIGINT) AS p90_rows_per_key, "
    "  CAST(MIN(CASE WHEN 100 * cum_keys >= 99 * n_keys THEN c END) "
    "    AS BIGINT) AS p99_rows_per_key, "
    "  CAST(MAX(c) AS BIGINT) AS max_rows_per_key, "
    "  CAST(FLOOR(1000000 * MAX(c) / MAX(total_rows)) AS BIGINT) "
    "    AS hot_share_e6 "
    "FROM cum"
)


# --------------------------------------------------------------------------
# q162: geospatial radius join (grid-cell candidates + haversine verify)
# --------------------------------------------------------------------------

def q162_geo_radius_join(spark, sf_dir):
    """Geospatial radius self-join — find customer pairs within 10 km —
    via the cell-bucket pattern every spatial engine uses at scale:
    quantize each point to a 1° grid cell, explode one side into its
    3×3 neighbor cells, equi-join on the cell, then verify candidates
    with the exact haversine distance. Coordinates are synthesized
    deterministically from c_custkey (Knuth multiplicative hash —
    plain integer arithmetic both engines replay), points densified
    into a 5°×10° region around 45-50°N (a planet-wide spread made the
    gate zero-row — the round-7 degeneracy audit's lesson) where a 1°
    lon cell is ≥ 71 km wide, so the 3×3 neighborhood provably covers
    the 10 km radius, far from any wraparound.

    Engine-exactness: synthesis is exact integer math; the haversine's
    trig runs on IDENTICAL doubles and the meter distance floors to an
    integer (the q127 transcendental discipline — an ulp wobble sits
    eight orders of magnitude under the floor).

    Scale shape: candidates are bounded by cell occupancy (constant·avg
    density per point), never O(n²); the join is a plain equi-join on
    the cell key, shuffled both sides — the geohash recipe at any
    scale. Skewed cells (cities) would salt exactly like any hot key.

    Round-13 optimization (guide §2.3, the q120/grid_neighbor_pairs
    recipe): HALF-neighborhood replication. The 3×3 explode generated
    every unordered pair TWICE (once from each endpoint's probe), with
    the a < b filter discarding half the join output AFTER the join
    paid for it (~40M candidate rows at sf0.1). The five forward
    offsets (0,0),(0,1),(1,−1),(1,0),(1,1) generate each neighboring
    cell pair exactly once (no additive inverses in the set) and (0,0)
    keeps intra-cell pairs under id < id, so the join emits ~5/9 of
    the rows and no post-join candidate is redundant. Cross-cell pairs
    are emitted as (least, greatest); the haversine is exactly
    symmetric under the endpoint swap (odd sin under squaring,
    commutative multiplies — identical doubles), asserted against the
    3×3 formulation in tests/test_optimization_r13.py."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    h1 = F.pmod(F.col("c_custkey") * F.lit(2654435761), F.lit(1 << 31))
    h2 = F.pmod(
        (F.col("c_custkey") + F.lit(7)) * F.lit(2246822519), F.lit(1 << 31)
    )
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (F.lit(45.0) + F.lit(5.0) * h1 / F.lit(float(1 << 31))).alias("lat"),
        (F.lit(0.0) + F.lit(10.0) * h2 / F.lit(float(1 << 31))).alias("lon"),
    ).select(
        "id", "lat", "lon",
        F.floor("lat").cast("long").alias("cy"),
        F.floor("lon").cast("long").alias("cx"),
    )
    # literal-array explode (not a broadcast offsets spine): same five
    # forward offsets as grid_neighbor_pairs, one Generate node
    offs = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy, dx in ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
        ]
    )
    probe = pts.select(
        F.col("id").alias("p"), F.col("lat").alias("pla"),
        F.col("lon").alias("plo"), "cy", "cx",
        F.explode(offs).alias("o"),
    ).select(
        "p", "pla", "plo",
        (F.col("cy") + F.col("o.dy")).alias("y"),
        (F.col("cx") + F.col("o.dx")).alias("x"),
        ((F.col("o.dy") == 0) & (F.col("o.dx") == 0)).alias("home0"),
    )
    build = pts.select(
        F.col("id").alias("q"), F.col("lat").alias("qla"),
        F.col("lon").alias("qlo"),
        F.col("cy").alias("y"), F.col("cx").alias("x"),
    )
    pairs = probe.join(build, ["y", "x"]).where(
        ~F.col("home0") | (F.col("p") < F.col("q"))
    )
    rad = 3.141592653589793 / 180.0
    dist = (
        F.lit(2.0 * 6371000.0)
        * F.asin(
            F.sqrt(
                F.pow(F.sin((F.col("qla") - F.col("pla")) * rad / 2), 2)
                + F.cos(F.col("pla") * rad)
                * F.cos(F.col("qla") * rad)
                * F.pow(F.sin((F.col("qlo") - F.col("plo")) * rad / 2), 2)
            )
        )
    )
    return (
        pairs.select(
            F.least("p", "q").alias("a"),
            F.greatest("p", "q").alias("b"),
            F.floor(dist).cast("long").alias("dist_m"),
        )
        .where(F.col("dist_m") <= 10_000)
    )


RELATIONAL_QUERIES["q162_geo_radius_join"] = q162_geo_radius_join
RELATIONAL_ORACLE["q162_geo_radius_join"] = (
    "WITH pts AS ("
    "  SELECT c_custkey AS id, "
    "    45.0 + 5.0 * ((c_custkey * 2654435761) % 2147483648) "
    "      / 2147483648.0 AS lat, "
    "    0.0 + 10.0 * (((c_custkey + 7) * 2246822519) % 2147483648) "
    "      / 2147483648.0 AS lon "
    "  FROM customer), "
    "cells AS ("
    "  SELECT id, lat, lon, "
    "    CAST(FLOOR(lat) AS BIGINT) AS cy, CAST(FLOOR(lon) AS BIGINT) AS cx "
    "  FROM pts), "
    "probe AS ("
    "  SELECT id AS a, lat AS la, lon AS oa, cy + dy AS y, cx + dx AS x "
    "  FROM cells, UNNEST([-1, 0, 1]) t1(dy), UNNEST([-1, 0, 1]) t2(dx)), "
    "cand AS ("
    "  SELECT p.a, c.id AS b, p.la, p.oa, c.lat AS lb, c.lon AS ob "
    "  FROM probe p JOIN cells c ON p.y = c.cy AND p.x = c.cx "
    "  WHERE p.a < c.id) "
    "SELECT a, b, CAST(FLOOR(2.0 * 6371000.0 * ASIN(SQRT("
    "  POW(SIN((lb - la) * PI() / 180.0 / 2), 2) "
    "  + COS(la * PI() / 180.0) * COS(lb * PI() / 180.0) "
    "  * POW(SIN((ob - oa) * PI() / 180.0 / 2), 2)))) AS BIGINT) AS dist_m "
    "FROM cand "
    "WHERE FLOOR(2.0 * 6371000.0 * ASIN(SQRT("
    "  POW(SIN((lb - la) * PI() / 180.0 / 2), 2) "
    "  + COS(la * PI() / 180.0) * COS(lb * PI() / 180.0) "
    "  * POW(SIN((ob - oa) * PI() / 180.0 / 2), 2)))) <= 10000"
)


# --------------------------------------------------------------------------
# q163: boolean/conditional aggregate breadth (count_if, bool_and/or, FILTER)
# --------------------------------------------------------------------------

def q163_agg_breadth(spark, sf_dir):
    """Boolean/conditional aggregate surface in one gate: count_if,
    bool_and/bool_or (ANSI every/any), and the FILTER-clause pattern
    (expressed as conditional aggregation — the portable form, exactly
    how q35 treats PIVOT) — per order priority over orders. These are
    the idioms BI tools emit constantly; each is map-combinable, one
    shuffle total."""
    o = _t(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 200_000
    return o.groupBy("o_orderpriority").agg(
        F.count_if(big).cast("long").alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 900).alias("all_over_900"),
        F.bool_or(big).alias("any_big"),
        F.count_if(F.col("o_orderstatus") == "F").cast("long").alias("n_f"),
        F.min(F.when(big, F.col("o_orderkey"))).cast("long")
        .alias("first_big_key"),
    )


RELATIONAL_QUERIES["q163_agg_breadth"] = q163_agg_breadth
RELATIONAL_ORACLE["q163_agg_breadth"] = (
    "SELECT o_orderpriority, "
    "  CAST(COUNT(*) FILTER (o_totalprice > 200000) AS BIGINT) AS n_big, "
    "  BOOL_AND(o_totalprice > 900) AS all_over_900, "
    "  BOOL_OR(o_totalprice > 200000) AS any_big, "
    "  CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f, "
    "  CAST(MIN(o_orderkey) FILTER (o_totalprice > 200000) AS BIGINT) "
    "    AS first_big_key "
    "FROM orders GROUP BY 1"
)


# --------------------------------------------------------------------------
# q164: repeat-purchase interval (inter-order gap percentiles per segment)
# --------------------------------------------------------------------------

def q164_repeat_purchase_interval(spark, sf_dir):
    """Repeat-purchase cadence — the replenishment readout behind CRM
    timing: per market segment, the exact p50/p90 of days between a
    customer's consecutive orders. One LAG per customer (orders sorted
    within the customer partition), gaps collapse to (segment, days)
    counts, and the percentiles run q108's collapse-then-cumulate scan
    over that bounded table — never a window over raw gaps.

    Scale shape: one shuffle on custkey (LAG), one map-combinable
    collapse, windows over the (segment × distinct gap) support."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    gaps = (
        o.withColumn("prev", F.lag("o_orderdate").over(w))
        .where(F.col("prev").isNotNull())
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_mktsegment",
            F.datediff("o_orderdate", "prev").alias("d"),
        )
    )
    dist = gaps.groupBy("c_mktsegment", "d").agg(
        F.count(F.lit(1)).alias("n")
    )
    wc = Window.partitionBy("c_mktsegment").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wa = Window.partitionBy("c_mktsegment")
    cum = dist.select(
        "c_mktsegment", "d",
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wa).alias("tot"),
    )

    def pct(p):
        return F.min(
            F.when(
                F.lit(100) * F.col("cum") >= F.lit(p) * F.col("tot"),
                F.col("d"),
            )
        ).cast("long")

    return cum.groupBy("c_mktsegment").agg(
        F.max("tot").cast("long").alias("n_gaps"),
        pct(50).alias("p50_days"),
        pct(90).alias("p90_days"),
    )


RELATIONAL_QUERIES["q164_repeat_purchase_interval"] = (
    q164_repeat_purchase_interval
)
RELATIONAL_ORACLE["q164_repeat_purchase_interval"] = (
    "WITH gaps AS ("
    "  SELECT c.c_mktsegment, DATEDIFF('day', "
    "    LAG(o_orderdate) OVER (PARTITION BY o_custkey "
    "      ORDER BY o_orderdate), o_orderdate) AS d "
    "  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey), "
    "dist AS ("
    "  SELECT c_mktsegment, d, COUNT(*) AS n FROM gaps "
    "  WHERE d IS NOT NULL GROUP BY 1, 2), "
    "cum AS ("
    "  SELECT c_mktsegment, d, "
    "    SUM(n) OVER (PARTITION BY c_mktsegment ORDER BY d "
    "      ROWS UNBOUNDED PRECEDING) AS cum, "
    "    SUM(n) OVER (PARTITION BY c_mktsegment) AS tot "
    "  FROM dist) "
    "SELECT c_mktsegment, CAST(MAX(tot) AS BIGINT) AS n_gaps, "
    "  CAST(MIN(CASE WHEN 100 * cum >= 50 * tot THEN d END) AS BIGINT) "
    "    AS p50_days, "
    "  CAST(MIN(CASE WHEN 100 * cum >= 90 * tot THEN d END) AS BIGINT) "
    "    AS p90_days "
    "FROM cum GROUP BY 1"
)


# --------------------------------------------------------------------------
# q165: keyed Gini (revenue concentration per region — q119's keyed sibling)
# --------------------------------------------------------------------------

def q165_gini_by_region(spark, sf_dir):
    """Per-region Gini of customer revenue — q119's exact integer Gini
    in the keyed form a marketplace actually monitors (concentration
    per market, thousands at once; the q143→q151 / q130→q159 keyed-
    sibling pattern). Exact integers end-to-end: per-customer cents
    collapse, rank+cumsum windows over the REGION partition, and the
    Gini numerator/denominator (n+1−2·Σcum/Σrev forms) assembled from
    window sums — emitted as e6-floored ratio of two exact longs."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    per_cust = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "o_custkey")
        .agg(F.sum("cents").alias("rev"))
    )
    w = Window.partitionBy("r_name").orderBy("rev", "o_custkey")
    wa = Window.partitionBy("r_name")
    ranked = per_cust.select(
        "r_name",
        F.row_number().over(w).alias("i"),
        F.col("rev"),
        F.count(F.lit(1)).over(wa).alias("nn"),
    )
    # G = (2·Σ(i·rev) − (n+1)·Σrev) / (n·Σrev), exact integer num/den
    agg = ranked.groupBy("r_name").agg(
        F.max("nn").alias("nn"),
        # the rank-weighted sum accumulates in DECIMAL(38,0): each i·rev
        # product fits a long, but Σ(i·rev) ~ n²·rev/2 leaves int64 near
        # n ~ 3e9 customers (the long-sum flavor of the q160 class; the
        # DuckDB oracle's SUM promotes to HUGEINT so it never wraps)
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("rev"))
        .alias("s_irev"),
        F.sum("rev").alias("s_rev"),
        F.count(F.lit(1)).cast("long").alias("n_customers"),
    )
    # DECIMAL(38,0) ratio (the q160 lesson, caught by its fresh-JVM
    # bench run at sf0.1): 1e6 x the Gini numerator passes int64 once a
    # region's n x Σrev reaches ~9.2e12
    num = (
        F.lit(2) * F.col("s_irev").cast("decimal(38,0)")
        - (F.col("nn") + 1) * F.col("s_rev").cast("decimal(38,0)")
    )
    den = F.col("nn") * F.col("s_rev").cast("decimal(38,0)")
    return agg.select(
        F.col("r_name").alias("region"),
        "n_customers",
        F.col("s_rev").cast("long").alias("total_cents"),
        # exact floored quotient (round-8 ADVICE item): the raw decimal
        # division HALF_UP-rounds at scale 6 before F.floor sees it
        _floor_div_dec(num * F.lit(1_000_000), den).alias("gini_e6"),
    )


RELATIONAL_QUERIES["q165_gini_by_region"] = q165_gini_by_region
RELATIONAL_ORACLE["q165_gini_by_region"] = (
    "WITH per_cust AS ("
    "  SELECT r.r_name, o.o_custkey, "
    "    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "      AS rev "
    "  FROM orders o "
    "  JOIN customer c ON o.o_custkey = c.c_custkey "
    "  JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "  JOIN region r ON n.n_regionkey = r.r_regionkey "
    "  GROUP BY 1, 2), "
    "ranked AS ("
    "  SELECT r_name, rev, "
    "    ROW_NUMBER() OVER (PARTITION BY r_name ORDER BY rev, o_custkey) "
    "      AS i, "
    "    COUNT(*) OVER (PARTITION BY r_name) AS nn "
    "  FROM per_cust) "
    "SELECT r_name AS region, CAST(COUNT(*) AS BIGINT) AS n_customers, "
    "  CAST(SUM(rev) AS BIGINT) AS total_cents, "
    "  CAST(FLOOR(1000000 * (2 * SUM(i * rev) - (MAX(nn) + 1) * SUM(rev)) "
    "    / (MAX(nn) * SUM(rev))) AS BIGINT) AS gini_e6 "
    "FROM ranked GROUP BY 1"
)


# --------------------------------------------------------------------------
# q166: session bounce rate (single-event-session share per day)
# --------------------------------------------------------------------------

def q166_bounce_rate(spark, sf_dir):
    """Daily bounce rate — the engagement-quality readout next to q158's
    growth accounting: sessionize each user's events with the standard
    30-minute inactivity gap (the q34/q111 islands construction: a LAG
    over the user partition marks session breaks, a running sum of
    breaks numbers the sessions), then a session is a BOUNCE when it
    contains exactly one event. Emits per day (of session start):
    sessions, bounces, bounce share in e6 (exact integer ratio of two
    counts — no float boundary).

    Scale shape: one shuffle on user_id for the LAG + break-sum windows
    (shared partition), one map-combinable session rollup keyed by
    (user, session no), one day rollup."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    ep = F.unix_timestamp("ts")
    brk = F.when(
        ep - F.lag(ep).over(w) > 1800,
        1,
    ).otherwise(0)
    sess = e.withColumn("brk", brk).withColumn(
        "sid", F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start_ts"),
    )
    return (
        per_sess.groupBy(F.to_date("start_ts").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long").alias("n_bounces"),
        )
        .select(
            "day", "n_sessions", "n_bounces",
            F.floor(
                F.lit(1_000_000) * F.col("n_bounces") / F.col("n_sessions")
            ).cast("long").alias("bounce_e6"),
        )
    )


RELATIONAL_QUERIES["q166_bounce_rate"] = q166_bounce_rate
RELATIONAL_ORACLE["q166_bounce_rate"] = (
    "WITH marked AS ("
    "  SELECT user_id, ts, CASE WHEN epoch(ts) - epoch(LAG(ts) OVER "
    "    (PARTITION BY user_id ORDER BY ts)) > 1800 THEN 1 ELSE 0 END "
    "    AS brk "
    "  FROM events), "
    "sess AS ("
    "  SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id "
    "    ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid "
    "  FROM marked), "
    "per_sess AS ("
    "  SELECT user_id, sid, COUNT(*) AS n_events, MIN(ts) AS start_ts "
    "  FROM sess GROUP BY 1, 2) "
    "SELECT CAST(CAST(start_ts AS DATE) AS VARCHAR) AS day, "
    "  CAST(COUNT(*) AS BIGINT) AS n_sessions, "
    "  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) "
    "    AS n_bounces, "
    "  CAST(FLOOR(1000000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) "
    "    / COUNT(*)) AS BIGINT) AS bounce_e6 "
    "FROM per_sess GROUP BY 1"
)


# --------------------------------------------------------------------------
# q167: time-weighted average value per event type (the TWAP shape)
# --------------------------------------------------------------------------

def q167_time_weighted_value(spark, sf_dir):
    """Time-weighted average of the event `value` per event type — the
    TWAP/telemetry-gauge readout (a reading counts for as long as it is
    the key's LATEST reading, not once per sample), which plain AVG
    gets wrong whenever sampling is irregular: a gauge sampled every
    second during an incident and hourly otherwise must not let the
    incident dominate the mean.

    Exactness: value collapses to cents (long), the holding duration is
    the exact epoch-MICROSECOND gap to the USER's next event (LEAD over
    the user partition — each user is an independent sensor stream; the
    q101 tz-free NTZ timestampdiff ↔ DuckDB epoch_us, both exact
    BIGINTs — epoch-second truncation would diverge on these sub-second
    timestamps), and the
    weighted sum Σ(cents·dur_us) accumulates in DECIMAL(38,0) from the
    start (the q160/q165 overflow posture: cents ~ 1e8 × micros ~ 1e12
    leaves int64 immediately at scale); held time reports as the
    exact floored second count via _floor_div_dec. One double division,
    rounded once. A user's last event holds for 0 by definition (no
    successor) and drops from both sums — documented boundary, mirrored
    in the oracle.

    Scale shape: ONE shuffle on user_id for the LEAD window, then a
    map-combinable aggregate to the 5-row type table. No global window,
    no join."""
    # tz-free epoch micros (the q101 NTZ pattern): events.ts is
    # TIMESTAMP_NTZ, so unix_micros won't bind and unix_timestamp would
    # re-interpret in the session zone; timestampdiff against the NTZ
    # epoch matches DuckDB's epoch_us bit-for-bit
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", us.alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_type", "cents")
    timed = e.select(
        "event_type", "cents",
        (F.lead("us", 1).over(w) - F.col("us")).alias("dur_us"),
    ).where(F.col("dur_us").isNotNull())
    return (
        timed.groupBy("event_type")
        .agg(
            F.sum(
                F.col("cents").cast("decimal(38,0)") * F.col("dur_us")
            ).alias("wsum"),
            F.sum(F.col("dur_us").cast("decimal(38,0)")).alias("dsum"),
            F.count(F.lit(1)).cast("long").alias("n_readings"),
        )
        .select(
            "event_type", "n_readings",
            _floor_div_dec(F.col("dsum"), F.lit(1_000_000)).alias("held_s"),
            # a type whose every reading holds for 0 us (all duplicate
            # timestamps) has dsum=0; 0.0/0.0 is NaN in Spark while
            # DuckDB's double division may yield NULL depending on
            # ieee_floating_point_ops — gate the division so both
            # engines emit NULL (round-9 ADVICE)
            F.when(
                F.col("dsum") > 0,
                F.round(
                    F.col("wsum").cast("double")
                    / F.col("dsum").cast("double") / 100.0,
                    6,
                ),
            ).alias("twa_value"),
        )
    )


RELATIONAL_QUERIES["q167_time_weighted_value"] = q167_time_weighted_value
RELATIONAL_ORACLE["q167_time_weighted_value"] = (
    "WITH timed AS ("
    "  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents, "
    "    epoch_us(LEAD(ts, 1) OVER (PARTITION BY user_id "
    "      ORDER BY ts, event_type, CAST(ROUND(value * 100) AS BIGINT))) "
    "      - epoch_us(ts) AS dur_us "
    "  FROM events) "
    "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_readings, "
    "  CAST(SUM(dur_us) // 1000000 AS BIGINT) AS held_s, "
    "  CASE WHEN SUM(dur_us) > 0 THEN "
    "    ROUND(CAST(SUM(cents * dur_us) AS DOUBLE) "
    "      / CAST(SUM(dur_us) AS DOUBLE) / 100.0, 6) END AS twa_value "
    "FROM timed WHERE dur_us IS NOT NULL GROUP BY event_type"
)


# --------------------------------------------------------------------------
# q168: SLO percentiles reconstructed from a mergeable gap histogram
# --------------------------------------------------------------------------

def q168_gap_percentiles(spark, sf_dir):
    """p50/p90/p99 UPPER BOUNDS of the per-user inter-event gap,
    reconstructed from a decimal-digit-bucketed histogram — the
    latency-SLO readout every monitoring stack computes this exact way
    (HDR-style mergeable buckets + cumulative reconstruction), and the
    production answer when exact order statistics over 1e12 gaps are
    too expensive: the histogram is ONE map-combinable aggregate of
    ~12 cells, merges associatively across any sharding, and the
    percentile query runs on the driver-sized cell table. The bound is
    exact integer arithmetic: bucket = number of decimal digits of the
    gap (q147's engine-parity trick — string length, no libm), upper
    bound of bucket b = 10^b − 1, and the percentile predicate
    100·cum ≥ p·total compares exact longs.

    Scale shape: one shuffle on user_id for the LAG, one ~12-cell
    aggregate, windows over the cell table only. Output: 3 rows."""
    # exact micros first (the q101 tz-free NTZ pattern ↔ DuckDB
    # epoch_us, both BIGINT — per-side second truncation would
    # mis-bucket sub-second stamps), then ONE floor to whole seconds;
    # gap_us < 2^53 so the double division is exact
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    e = _t(spark, sf_dir, "events").select("user_id", us.alias("us"))
    w = Window.partitionBy("user_id").orderBy("us")
    gaps = e.select(
        (F.col("us") - F.lag("us", 1).over(w)).alias("g_us")
    ).where(F.col("g_us").isNotNull() & (F.col("g_us") >= 0)).select(
        F.floor(F.col("g_us") / F.lit(1_000_000)).cast("long").alias("g")
    )
    hist = gaps.groupBy(
        F.length(F.col("g").cast("string")).alias("digits")
    ).agg(F.count(F.lit(1)).alias("n"))
    wc = Window.orderBy("digits").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("digits").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "digits", "n",
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wt).alias("total"),
    )

    def pct(p):
        # smallest bucket whose cumulative count covers p% of gaps;
        # upper bound of that bucket = 10^digits - 1 seconds
        return F.min(
            F.when(
                F.lit(100) * F.col("cum") >= F.lit(p) * F.col("total"),
                F.struct("digits", "cum", "total"),
            )
        )

    agg = cum.agg(
        pct(50).alias("b50"), pct(90).alias("b90"), pct(99).alias("b99")
    )
    out = []
    for p, b in ((50, "b50"), (90, "b90"), (99, "b99")):
        out.append(
            F.struct(
                F.lit(p).cast("int").alias("pct"),
                (
                    F.pow(F.lit(10.0), F.col(f"{b}.digits")).cast("long")
                    - 1
                ).alias("gap_upper_s"),
                F.col(f"{b}.cum").cast("long").alias("cum_gaps"),
                F.col(f"{b}.total").cast("long").alias("total_gaps"),
            )
        )
    # an empty gap set (every user has exactly one event) makes the
    # ungrouped agg ONE all-NULL row, which would explode into 3 NULL
    # percentile rows while the oracle's `FROM p, cum` cross-join over
    # an empty cum yields 0 — guard so both engines agree (r9 ADVICE)
    return (
        agg.where(F.col("b50.total").isNotNull())
        .select(F.explode(F.array(*out)).alias("r"))
        .select("r.pct", "r.gap_upper_s", "r.cum_gaps", "r.total_gaps")
    )


RELATIONAL_QUERIES["q168_gap_percentiles"] = q168_gap_percentiles
RELATIONAL_ORACLE["q168_gap_percentiles"] = (
    "WITH gaps_us AS ("
    "  SELECT epoch_us(ts) - epoch_us(LAG(ts) OVER ("
    "    PARTITION BY user_id ORDER BY ts)) AS g_us "
    "  FROM events), "
    "gaps AS ("
    "  SELECT g_us // 1000000 AS g FROM gaps_us "
    "  WHERE g_us IS NOT NULL AND g_us >= 0), "
    "hist AS ("
    "  SELECT LENGTH(CAST(g AS VARCHAR)) AS digits, COUNT(*) AS n "
    "  FROM gaps GROUP BY 1), "
    "cum AS ("
    "  SELECT digits, "
    "    CAST(SUM(n) OVER (ORDER BY digits ROWS UNBOUNDED PRECEDING) "
    "      AS BIGINT) AS cum, "
    "    CAST(SUM(n) OVER () AS BIGINT) AS total "
    "  FROM hist), "
    "p AS (SELECT UNNEST([50, 90, 99]) AS pct) "
    "SELECT CAST(p.pct AS INT) AS pct, "
    "  CAST(POWER(10, MIN(CASE WHEN 100 * cum >= pct * total "
    "    THEN digits END)) AS BIGINT) - 1 AS gap_upper_s, "
    "  MIN(CASE WHEN 100 * cum >= pct * total THEN cum END) AS cum_gaps, "
    "  CAST(MAX(total) AS BIGINT) AS total_gaps "
    "FROM p, cum GROUP BY p.pct"
)


# --------------------------------------------------------------------------
# q169: DAU/MAU stickiness (rolling 28-day distinct actives, exact)
# --------------------------------------------------------------------------

def q169_dau_mau_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per day — THE product-health ratio (what share
    of the monthly audience shows up on a given day), with MAU as the
    EXACT rolling 28-day distinct-user count. The naive form is a
    28-day-range distinct per day — a fact-sized range self-join. The
    scalable identity: a user counts toward MAU(d) for d in
    [active_day, active_day+27], so per user, MERGE active days whose
    coverage intervals touch (gap ≤ 28 days — the q34 islands
    construction) and EXPLODE each merged island's coverage once;
    islands are disjoint by construction, so the exploded (user, day)
    table is already distinct and ONE count per day is MAU. Explode
    fan-out is ≤ 28 rows per active day — a constant, not a join.

    Output per active day: dau, mau, stickiness in e6 (exact floored
    integer ratio via _floor_div_dec). Scale shape: one (user, day)
    distinct collapse, one user-keyed LAG window over the collapsed
    table, the bounded-constant explode, and two map-combinable
    aggregates; the dau↔mau join is day-spine-sized."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    active = e.distinct()
    dau = active.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    w = Window.partitionBy("user_id").orderBy("d")
    brk = F.when(
        F.datediff(F.col("d"), F.lag("d", 1).over(w)) > 28, 1
    ).otherwise(0)
    isl = active.select(
        "user_id", "d",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("isl"),
    )
    spans = isl.groupBy("user_id", "isl").agg(
        F.min("d").alias("s"), F.max("d").alias("e")
    )
    cover = spans.select(
        "user_id",
        F.explode(
            F.sequence(F.col("s"), F.date_add(F.col("e"), 27))
        ).alias("d"),
    )
    mau = cover.groupBy("d").agg(F.count(F.lit(1)).alias("mau"))
    # the dau<->mau join is CALENDAR-bounded on both sides (~active days
    # + 27 rows each, at any corpus size) — hint it broadcast because
    # Catalyst can't see a size estimate through the explode and the
    # 100x smoke showed it conservatively flipping to SMJ (q99's
    # day-spine-is-a-dim argument)
    return (
        dau.join(F.broadcast(mau), "d")
        .select(
            F.col("d").cast("string").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("mau").cast("long").alias("mau"),
            _floor_div_dec(
                F.col("dau").cast("decimal(38,0)") * F.lit(1_000_000),
                F.col("mau").cast("decimal(38,0)"),
            ).alias("stickiness_e6"),
        )
    )


RELATIONAL_QUERIES["q169_dau_mau_stickiness"] = q169_dau_mau_stickiness
RELATIONAL_ORACLE["q169_dau_mau_stickiness"] = (
    "WITH active AS ("
    "  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events), "
    "dau AS (SELECT d, COUNT(*) AS dau FROM active GROUP BY 1), "
    "mau AS ("
    "  SELECT dd.d, COUNT(DISTINCT a.user_id) AS mau "
    "  FROM (SELECT DISTINCT d FROM active) dd "
    "  JOIN active a ON a.d BETWEEN dd.d - 27 AND dd.d "
    "  GROUP BY 1) "
    "SELECT CAST(dau.d AS VARCHAR) AS day, "
    "  CAST(dau.dau AS BIGINT) AS dau, CAST(mau.mau AS BIGINT) AS mau, "
    "  CAST((1000000 * dau.dau) // mau.mau AS BIGINT) AS stickiness_e6 "
    "FROM dau JOIN mau ON dau.d = mau.d"
)


# --------------------------------------------------------------------------
# q170: ISO week rollup (the year-boundary calendar trap)
# --------------------------------------------------------------------------

def q170_iso_week_rollup(spark, sf_dir):
    """Weekly revenue rollup on the ISO calendar — the reporting grain
    finance actually uses, and a classic cross-engine parity trap: the
    days around January 1st belong to week 52/53 of the PREVIOUS iso
    year or week 1 of the NEXT one, so grouping by (year(d), week(d))
    silently splits those weeks in half. Grouping key is
    (iso_year, iso_week) — Spark's extract(YEAROFWEEK)/weekofyear and
    DuckDB's isoyear/weekofyear agree on the ISO-8601 definition, which
    is exactly what this gate pins. Exact cent sums; one
    map-combinable aggregate, output bounded by weeks."""
    o = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return (
        o.groupBy(
            F.expr("extract(YEAROFWEEK FROM d)").cast("int")
            .alias("iso_year"),
            F.weekofyear("d").cast("int").alias("iso_week"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
    )


RELATIONAL_QUERIES["q170_iso_week_rollup"] = q170_iso_week_rollup
RELATIONAL_ORACLE["q170_iso_week_rollup"] = (
    "SELECT CAST(isoyear(CAST(o_orderdate AS DATE)) AS INT) AS iso_year, "
    "  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS iso_week, "
    "  CAST(COUNT(*) AS BIGINT) AS n_orders, "
    "  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "    AS rev_cents "
    "FROM orders GROUP BY 1, 2"
)


# --------------------------------------------------------------------------
# q171: one-way ANOVA F across customer segments
# --------------------------------------------------------------------------

def q171_anova_f(spark, sf_dir):
    """One-way ANOVA F-statistic of account balance across ALL five
    market segments — the k-group completion of the two-sample battery
    (q142 Welch t tests two groups; q132's Mann-Whitney is its rank
    twin): does ANY segment's mean balance differ? SSB/SSW decompose
    total variance into between- and within-group parts;
    F = (SSB/(k−1)) / (SSW/(N−k)).

    Exactness (the q142 posture, extended to k groups): per-group
    moments n, Σx are exact longs and Σx² accumulates in DECIMAL(38,0)
    (cents² leaves int64 near 1e10 rows — oracle sums in HUGEINT); the
    per-group double terms ssw_g = Σx²_g − (Σx_g)²/n_g and
    ssb_g = n_g·(m_g − m)² are each ONE double expression over exact
    operands, floored to whole cents² longs, and the k-row sums then
    run on exact integers — so the engines cannot diverge on float
    addition order across groups (the text-family per-term-floor
    posture applied to a stats decomposition). F reports e6-floored.

    Scale shape: ONE map-combinable aggregate over the customer scan
    to k rows, a 1-row global rollup crossed back, and a k-row
    aggregate to the single output row. No join against base data, no
    window."""
    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
    )
    g = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("q"),
    )
    # global moments via an unpartitioned window over the k-row group
    # table (k = 5 segments) — not a 1-row crossJoin: the broadcast
    # nested-loop node it compiles to trips the scale smoke's strict
    # no-BNLJ audit, and over a dimension-bounded table the window is
    # free and keeps the plan join-less
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    nd, sd = F.col("n").cast("double"), F.col("s").cast("double")
    mg = sd / nd
    m = F.col("ss").cast("double") / F.col("nn").cast("double")
    terms = g.select(
        "n", "s", "q",
        F.sum("n").over(wall).alias("nn"),
        F.sum("s").over(wall).alias("ss"),
        F.count(F.lit(1)).over(wall).alias("k"),
    ).select(
        "nn", "k",
        F.floor(F.col("q").cast("double") - sd * sd / nd)
        .cast("long").alias("ssw_t"),
        F.floor(nd * (mg - m) * (mg - m)).cast("long").alias("ssb_t"),
    )
    kd = F.col("k").cast("double")
    nnd = F.col("nn").cast("double")
    f_stat = (
        F.col("ssb").cast("double") / (kd - F.lit(1.0))
    ) / (F.col("ssw").cast("double") / (nnd - kd))
    return (
        terms.groupBy("nn", "k")
        .agg(
            F.sum("ssw_t").cast("long").alias("ssw"),
            F.sum("ssb_t").cast("long").alias("ssb"),
        )
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("nn").cast("long").alias("n"),
            "ssb", "ssw",
            F.floor(F.lit(1_000_000) * f_stat).cast("long").alias("f_e6"),
        )
    )


RELATIONAL_QUERIES["q171_anova_f"] = q171_anova_f
RELATIONAL_ORACLE["q171_anova_f"] = (
    "WITH g AS ("
    "  SELECT c_mktsegment, COUNT(*) AS n, "
    "    CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s, "
    "    SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT) "
    "      * CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS q "
    "  FROM customer GROUP BY 1), "
    "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, "
    "  CAST(SUM(s) AS BIGINT) AS ss, COUNT(*) AS k FROM g), "
    "terms AS ("
    "  SELECT nn, k, "
    "    CAST(FLOOR(CAST(q AS DOUBLE) "
    "      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
    "      AS BIGINT) AS ssw_t, "
    "    CAST(FLOOR(CAST(n AS DOUBLE) "
    "      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) "
    "         - CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE)) "
    "      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) "
    "         - CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))) AS BIGINT) "
    "      AS ssb_t "
    "  FROM g, tot) "
    "SELECT CAST(k AS BIGINT) AS k, nn AS n, "
    "  CAST(SUM(ssb_t) AS BIGINT) AS ssb, "
    "  CAST(SUM(ssw_t) AS BIGINT) AS ssw, "
    "  CAST(FLOOR(1000000 * (CAST(SUM(ssb_t) AS DOUBLE) "
    "    / (CAST(k AS DOUBLE) - 1.0)) / (CAST(SUM(ssw_t) AS DOUBLE) "
    "    / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))) AS BIGINT) AS f_e6 "
    "FROM terms GROUP BY k, nn"
)


# --------------------------------------------------------------------------
# q172: Bloom-filter semi-join prefilter
# --------------------------------------------------------------------------

#: Bloom parameters: m bits, 2 hash positions per key (md5-derived, so
#: DuckDB replays them exactly). m is sized to the fixture's build side
#: (~n/5 customers) so the FP count discriminates at EVERY sf the
#: driver grades (m=1024 produced zero FPs at sf0.001 — the degeneracy
#: lesson): 7 FPs at sf0.001, ~5.4k at sf0.01.
BLOOM_M = 512
BLOOM_SEGMENT = "AUTOMOBILE"


def q172_bloom_prefilter(spark, sf_dir):
    """Bloom-filter probe prefilter — the sketch form of q69's runtime
    filter: instead of shipping the build side's exact key set to the
    probe scan, ship an m-bit Bloom filter (k=2 md5-derived bit
    positions per key). A probe row is a CANDIDATE iff both its bits
    are set; every true match is a candidate (no false negatives — the
    Bloom guarantee), and the readout quantifies the price: candidate,
    true-match, and false-positive counts plus the filter's fill. This
    is Spark's own injectRuntimeFilter/BloomFilterAggregate strategy
    made explicit and engine-checkable.

    Exactness: bit positions are md5-prefix mod m (the pipeline
    hash_bucket derivation — identical in DuckDB), so the filter, the
    candidate set, and all counts are exact integers.

    Scale shape: the build side aggregates to ≤m distinct bit rows,
    broadcast twice against the probe scan (two map-side semi joins —
    the probe NEVER shuffles); the truth check broadcasts the build
    keys the same way. One map-combinable count aggregate to 1 row.
    At 100 TB the bitset (128 KiB at m=2^20) rides the same broadcast
    path Spark uses for its own runtime bloom filters."""
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == BLOOM_SEGMENT
    ).select(F.col("c_custkey").alias("key"))

    def pos(i, col):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bloom{i}:"), col.cast("string"))), 1, 8),
            16, 10,
        ).cast("long") % BLOOM_M

    bits = (
        cust.select(F.explode(F.array(pos(0, F.col("key")), pos(1, F.col("key")))).alias("bit"))
        .distinct()
    )
    probe = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("pkey"),
        pos(0, F.col("o_custkey")).alias("b0"),
        pos(1, F.col("o_custkey")).alias("b1"),
    )
    flagged = (
        probe.join(
            F.broadcast(bits.select(F.col("bit").alias("b0"), F.lit(1).alias("hit0"))),
            "b0", "left",
        )
        .join(
            F.broadcast(bits.select(F.col("bit").alias("b1"), F.lit(1).alias("hit1"))),
            "b1", "left",
        )
        .join(
            F.broadcast(cust.select(F.col("key").alias("pkey"), F.lit(1).alias("truth"))),
            "pkey", "left",
        )
        .select(
            (F.col("hit0").isNotNull() & F.col("hit1").isNotNull()).alias("cand"),
            F.col("truth").isNotNull().alias("is_true"),
        )
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum(F.when(F.col("cand"), 1).otherwise(0)).cast("long")
        .alias("n_candidates"),
        F.sum(F.when(F.col("is_true"), 1).otherwise(0)).cast("long")
        .alias("n_true"),
        F.sum(F.when(F.col("cand") & ~F.col("is_true"), 1).otherwise(0))
        .cast("long").alias("n_false_pos"),
        F.sum(F.when(F.col("is_true") & ~F.col("cand"), 1).otherwise(0))
        .cast("long").alias("n_false_neg"),
    )


RELATIONAL_QUERIES["q172_bloom_prefilter"] = q172_bloom_prefilter
RELATIONAL_ORACLE["q172_bloom_prefilter"] = (
    "WITH cust AS ("
    f"  SELECT c_custkey AS key FROM customer "
    f"  WHERE c_mktsegment = '{BLOOM_SEGMENT}'), "
    "bits AS ("
    "  SELECT DISTINCT bit FROM ("
    "    SELECT ('0x' || substr(md5('bloom0:' || CAST(key AS VARCHAR)), "
    f"      1, 8))::BIGINT % {BLOOM_M} AS bit FROM cust "
    "    UNION ALL "
    "    SELECT ('0x' || substr(md5('bloom1:' || CAST(key AS VARCHAR)), "
    f"      1, 8))::BIGINT % {BLOOM_M} FROM cust)), "
    "probe AS ("
    "  SELECT o_custkey AS pkey, "
    "    ('0x' || substr(md5('bloom0:' || CAST(o_custkey AS VARCHAR)), "
    f"      1, 8))::BIGINT % {BLOOM_M} AS b0, "
    "    ('0x' || substr(md5('bloom1:' || CAST(o_custkey AS VARCHAR)), "
    f"      1, 8))::BIGINT % {BLOOM_M} AS b1 "
    "  FROM orders), "
    "flagged AS ("
    "  SELECT (b0 IN (SELECT bit FROM bits) "
    "      AND b1 IN (SELECT bit FROM bits)) AS cand, "
    "    pkey IN (SELECT key FROM cust) AS is_true "
    "  FROM probe) "
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_probe, "
    "  CAST(SUM(CASE WHEN cand THEN 1 ELSE 0 END) AS BIGINT) "
    "    AS n_candidates, "
    "  CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true, "
    "  CAST(SUM(CASE WHEN cand AND NOT is_true THEN 1 ELSE 0 END) "
    "    AS BIGINT) AS n_false_pos, "
    "  CAST(SUM(CASE WHEN is_true AND NOT cand THEN 1 ELSE 0 END) "
    "    AS BIGINT) AS n_false_neg "
    "FROM flagged"
)


# --------------------------------------------------------------------------
# q173: second-order Markov paths (event-type trigrams)
# --------------------------------------------------------------------------

def q173_second_order_paths(spark, sf_dir):
    """Second-order transition model over each user's event stream:
    count every ordered event-type TRIGRAM (two LEADs over the user
    timeline) and report P(c | a, b) — the 2-step Markov extension of
    q76's 1-step transition matrix, and the statistic behind
    next-action prediction and bot-pattern detection (a bot's
    (view, view) → view probability is ~1; a human's is not).

    Exactness: counts are exact longs; the conditional probability is
    an exact e6 floor-div of trigram count over the (a, b) context
    total (_floor_div_dec semantics via integer floor division — both
    engines' // on BIGINT).

    Scale shape: ONE shuffle on user_id for the LEAD window, one
    map-combinable trigram count (output ≤ |types|³ rows), a context
    rollup over that tiny table, and a broadcast join-back. The base
    events table is scanned once."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        e.select(
            F.col("event_type").alias("a"),
            F.lead("event_type", 1).over(w).alias("b"),
            F.lead("event_type", 2).over(w).alias("c"),
        )
        .where(F.col("c").isNotNull())
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ctx = tri.groupBy("a", "b").agg(F.sum("n").cast("long").alias("ctx_n"))
    return (
        tri.join(F.broadcast(ctx), ["a", "b"])
        .select(
            "a", "b", "c", "n",
            # exact floor division in DECIMAL(38,0): 1e6 x a trigram
            # count is int64-safe only to ~9e12 occurrences - the q176
            # hardening applied at design review
            _floor_div_dec(
                F.col("n").cast("decimal(38,0)") * 1_000_000,
                F.col("ctx_n").cast("decimal(38,0)"),
            ).alias("p_e6"),
        )
    )


RELATIONAL_QUERIES["q173_second_order_paths"] = q173_second_order_paths
RELATIONAL_ORACLE["q173_second_order_paths"] = (
    "WITH tri AS ("
    "  SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n FROM ("
    "    SELECT event_type AS a, "
    "      LEAD(event_type, 1) OVER (PARTITION BY user_id "
    "        ORDER BY ts, event_id) AS b, "
    "      LEAD(event_type, 2) OVER (PARTITION BY user_id "
    "        ORDER BY ts, event_id) AS c "
    "    FROM events) WHERE c IS NOT NULL GROUP BY 1, 2, 3), "
    "ctx AS (SELECT a, b, CAST(SUM(n) AS BIGINT) AS ctx_n "
    "  FROM tri GROUP BY 1, 2) "
    "SELECT tri.a, tri.b, tri.c, tri.n, "
    "  CAST((1000000::HUGEINT * tri.n) // ctx.ctx_n AS BIGINT) AS p_e6 "
    "FROM tri JOIN ctx ON tri.a = ctx.a AND tri.b = ctx.b"
)


# --------------------------------------------------------------------------
# q174: exact trailing-window moving median
# --------------------------------------------------------------------------

def q174_moving_median(spark, sf_dir):
    """Exact 7-day trailing MEDIAN of daily revenue per region — the
    robust sibling of a moving average (one whale order shifts the
    mean for a week; the median shrugs), and the smoother dashboards
    actually want. Median-over-window is not a built-in Spark window
    aggregate; the exact form is collect_list over a RANGE frame on
    the day number + array_sort + middle order statistics — bounded
    at 7 elements per frame, so the "collect" is a constant-size
    buffer, not a scalability hazard.

    Exactness: the window median of an EVEN count interpolates, so the
    gate emits med2_cents = lower + upper middle order statistics
    (= 2·median, exact integer cents — the q103 weighted-median
    posture: order statistics over exact ints, no float interpolation).
    Day arithmetic is DATE-level (datediff from epoch ↔ DuckDB date
    subtraction — both exact integer days, no tz).

    Scale shape: daily rollup first (map-combinable, one shuffle to
    |regions|·|days| rows), then the window runs PARTITIONED by region
    over the tiny rollup — never a global single-partition window and
    never a window over base facts."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), "day")
        .agg(F.sum("cents").cast("long").alias("rev"))
    )
    dnum = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("region")
        .orderBy(dnum)
        .rangeBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list("rev").over(w))
    nn = F.size(arr)
    lo = F.element_at(arr, ((nn + 1) / 2).cast("int"))
    hi = F.element_at(arr, (nn / 2).cast("int") + 1)
    return daily.select(
        "region", "day",
        nn.cast("long").alias("n_in_window"),
        (lo + hi).cast("long").alias("med2_cents"),
    )


RELATIONAL_QUERIES["q174_moving_median"] = q174_moving_median
RELATIONAL_ORACLE["q174_moving_median"] = (
    "WITH daily AS ("
    "  SELECT r_name AS region, CAST(o_orderdate AS DATE) AS day, "
    "    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "      AS rev "
    "  FROM orders "
    "  JOIN customer ON o_custkey = c_custkey "
    "  JOIN nation ON c_nationkey = n_nationkey "
    "  JOIN region ON n_regionkey = r_regionkey "
    "  GROUP BY 1, 2), "
    "win AS ("
    "  SELECT region, day, "
    "    list_sort(list(rev) OVER ("
    "      PARTITION BY region "
    "      ORDER BY day - DATE '1970-01-01' "
    "      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr "
    "  FROM daily) "
    "SELECT region, day, CAST(len(arr) AS BIGINT) AS n_in_window, "
    "  CAST(arr[CAST((len(arr) + 1) // 2 AS INT)] "
    "    + arr[CAST(len(arr) // 2 AS INT) + 1] AS BIGINT) AS med2_cents "
    "FROM win"
)


# --------------------------------------------------------------------------
# q175: hour-of-day entropy per event type
# --------------------------------------------------------------------------

def q175_hour_entropy(spark, sf_dir):
    """Shannon entropy of each event type's hour-of-day distribution —
    the temporal-regularity detector: organic human activity spreads
    over the day (entropy near ln 24), a cron job or bot hammers one
    hour (entropy near 0). Complements q131's burstiness (inter-event
    spacing) with WHERE-in-the-day mass concentrates; the peak hour
    and its share make the readout actionable.

    Exactness: hour counts are exact longs over the bounded 24-cell
    table; each −p·ln p term is ONE double expression floored to e6
    micro-nats and the per-type sum runs on exact longs (the
    q127/q141 per-term-floor posture); peak share is an exact e6
    floor-div.

    Scale shape: ONE map-combinable (type, hour) count aggregate —
    ≤ |types|·24 rows — then windows/rollups over that bounded table
    only. The events scan never shuffles raw rows."""
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("int").alias("h")
    )
    c = e.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    t = c.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("n_hours_used"),
    )
    p = F.col("c").cast("double") / F.col("t").cast("double")
    terms = c.join(F.broadcast(t), "event_type").select(
        "event_type", "h", "c", "t", "n_hours_used",
        F.floor(F.lit(1_000_000.0) * (-p * F.log(p))).cast("long")
        .alias("term_e6"),
    )
    from pyspark.sql import Window

    peak = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), F.col("h").asc()
    )
    ranked = terms.withColumn("rk", F.row_number().over(peak))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("t").alias("n_events"),
            F.max("n_hours_used").alias("n_hours_used"),
            F.sum("term_e6").cast("long").alias("entropy_e6"),
            F.max(F.when(F.col("rk") == 1, F.col("h"))).cast("int")
            .alias("peak_hour"),
            F.max(F.when(F.col("rk") == 1, F.col("c"))).alias("peak_c"),
        )
        .select(
            "event_type", "n_events", "n_hours_used", "entropy_e6",
            "peak_hour",
            # DECIMAL: 1e6 x a per-type event count is int64-safe only
            # to ~9e12 rows/type - hardened with the q176 posture
            _floor_div_dec(
                F.col("peak_c").cast("decimal(38,0)") * 1_000_000,
                F.col("n_events").cast("decimal(38,0)"),
            ).alias("peak_share_e6"),
        )
    )


RELATIONAL_QUERIES["q175_hour_entropy"] = q175_hour_entropy
RELATIONAL_ORACLE["q175_hour_entropy"] = (
    "WITH c AS ("
    "  SELECT event_type, hour(ts) AS h, CAST(COUNT(*) AS BIGINT) AS c "
    "  FROM events GROUP BY 1, 2), "
    "t AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS t, "
    "  CAST(COUNT(*) AS BIGINT) AS n_hours_used FROM c GROUP BY 1), "
    "terms AS ("
    "  SELECT c.event_type, h, c, t.t, t.n_hours_used, "
    "    CAST(FLOOR(1000000.0 * (-(CAST(c AS DOUBLE) / CAST(t.t AS "
    "      DOUBLE)) * LN(CAST(c AS DOUBLE) / CAST(t.t AS DOUBLE)))) "
    "      AS BIGINT) AS term_e6, "
    "    ROW_NUMBER() OVER (PARTITION BY c.event_type "
    "      ORDER BY c DESC, h) AS rk "
    "  FROM c JOIN t ON c.event_type = t.event_type) "
    "SELECT event_type, MAX(t) AS n_events, "
    "  MAX(n_hours_used) AS n_hours_used, "
    "  CAST(SUM(term_e6) AS BIGINT) AS entropy_e6, "
    "  CAST(MAX(CASE WHEN rk = 1 THEN h END) AS INT) AS peak_hour, "
    "  CAST((1000000::HUGEINT * MAX(CASE WHEN rk = 1 THEN c END)) "
    "    // MAX(t) AS BIGINT) AS peak_share_e6 "
    "FROM terms GROUP BY event_type"
)


# --------------------------------------------------------------------------
# q176: Lorenz curve by spend decile
# --------------------------------------------------------------------------

def q176_lorenz_deciles(spark, sf_dir):
    """Customer-spend Lorenz curve by decile — the distributional
    readout q119's Gini integrates away: rank ALL customers by total
    spend ascending (no-order customers count at 0 — concentration
    statements must include the inactive base) and report each
    decile's revenue and the cumulative share up to it. "The top 10 %
    hold X %" is cum_share of decile 8, read directly.

    Exactness: spend is exact cents; decile = (rn−1)·10 div N and both
    share columns are exact e6 floor-divs; cumulative sums run over
    the 10-row decile table.

    Scale shape: one customer-key rollup (map-combinable), one global
    rank window over the customer-level rollup — the q119/q133
    documented single-exchange global sort, Spark's RangePartitioner
    form at cluster scale — then windows over the 10-row table. Facts
    never enter a window."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    spend = (
        c.join(
            o.groupBy("o_custkey").agg(F.sum("cents").alias("sp")),
            c.c_custkey == o.o_custkey, "left",
        )
        .select(
            "c_custkey", F.coalesce("sp", F.lit(0)).cast("long").alias("sp")
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("sp", "c_custkey")
    # N rides the SAME global sort as the rank (full-frame count over
    # the identical ordering) — not a 1-row crossJoin, which compiles
    # to the BNLJ node the scale smoke audits against
    wn = Window.orderBy("sp", "c_custkey").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = spend.select(
        "sp",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    dec = (
        ranked.select(
            F.expr("((rn - 1) * 10) div n").cast("long").alias("decile"),
            "sp",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum("sp").cast("long").alias("rev_cents"),
        )
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return dec.select(
        "decile", "n_cust", "rev_cents",
        F.sum("rev_cents").over(wc).alias("cum"),
        F.sum("rev_cents").over(wt).alias("tot"),
    ).select(
        "decile", "n_cust", "rev_cents",
        # DECIMAL(38,0): 1e6 x cumulative corpus cents leaves int64 two
        # orders of magnitude before 100 TB facts do - the 10x smoke
        # ABORTED with an arithmetic overflow on the long form (the
        # q160/q165 overflow class, caught by the smoke this time);
        # the oracle's HUGEINT // mirrors the exact floor-div
        _floor_div_dec(
            F.col("cum").cast("decimal(38,0)") * 1_000_000,
            F.col("tot").cast("decimal(38,0)"),
        ).alias("cum_share_e6"),
    )


RELATIONAL_QUERIES["q176_lorenz_deciles"] = q176_lorenz_deciles
RELATIONAL_ORACLE["q176_lorenz_deciles"] = (
    "WITH spend AS ("
    "  SELECT c_custkey, COALESCE(SUM(CAST(ROUND(o_totalprice * 100) "
    "    AS BIGINT)), 0) AS sp "
    "  FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
    "  GROUP BY 1), "
    "ranked AS ("
    "  SELECT sp, ROW_NUMBER() OVER (ORDER BY sp, c_custkey) AS rn, "
    "    COUNT(*) OVER () AS n "
    "  FROM spend), "
    "dec AS ("
    "  SELECT ((rn - 1) * 10) // n AS decile, "
    "    CAST(COUNT(*) AS BIGINT) AS n_cust, "
    "    CAST(SUM(sp) AS BIGINT) AS rev_cents "
    "  FROM ranked GROUP BY 1) "
    "SELECT CAST(decile AS BIGINT) AS decile, n_cust, rev_cents, "
    "  CAST((1000000::HUGEINT * SUM(rev_cents) OVER (ORDER BY decile "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
    "    // SUM(rev_cents) OVER () AS BIGINT) AS cum_share_e6 "
    "FROM dec"
)


# --------------------------------------------------------------------------
# q177: Bollinger-band breach counts (rolling mean ± 2σ, all-integer)
# --------------------------------------------------------------------------

def q177_bollinger_breaches(spark, sf_dir):
    """Rolling mean ± 2σ band breaches of daily revenue per region —
    the volatility-aware anomaly flag next to q174's robust median:
    a day breaches when it leaves the trailing 7-day two-sigma band.
    The entire breach decision is EXACT integer arithmetic — no
    square roots: x > mean + 2σ over the window moments (n, S = Σx,
    Q = Σx²) multiplies out to (x·n − S)² > 4·(n·Q − S²) (population
    σ of the trailing window; both sides scale by n²), so both
    thresholds compare DECIMAL(38,0) products (d² ~ 1e28 at 10× —
    int64 died two gates ago; the q176 lesson applied at design
    time). First cut carried a stray ·n on the left — a 2σ/√n
    standard-ERROR band — caught because ~25 % of days "breached"
    where a 2σ band admits a few percent. The trailing window
    EXCLUDES the current day (a point should not damp the band that
    judges it).

    Scale shape: daily rollup first (map-combinable), RANGE-frame
    moment sums over the region-partitioned rollup, breach flags and
    counts over that tiny table. Facts never enter a window."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), "day")
        .agg(F.sum("cents").cast("long").alias("x"))
    )
    dnum = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = Window.partitionBy("region").orderBy(dnum).rangeBetween(-7, -1)
    m = daily.select(
        "region", "day", "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).over(w)
        .alias("q"),
    ).where(F.col("n") >= 3)
    d = (
        F.col("x").cast("decimal(38,0)") * F.col("n")
        - F.col("s").cast("decimal(38,0)")
    )
    var4n = (
        F.lit(4).cast("decimal(38,0)")
        * (
            F.col("n").cast("decimal(38,0)") * F.col("q")
            - F.col("s").cast("decimal(38,0)") * F.col("s")
        )
    )
    up = (d > 0) & (d * d > var4n)
    dn = (d < 0) & (d * d > var4n)
    return (
        m.select(
            "region",
            F.when(up, 1).otherwise(0).alias("u"),
            F.when(dn, 1).otherwise(0).alias("l"),
        )
        .groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days_judged"),
            F.sum("u").cast("long").alias("n_upper_breaches"),
            F.sum("l").cast("long").alias("n_lower_breaches"),
        )
    )


RELATIONAL_QUERIES["q177_bollinger_breaches"] = q177_bollinger_breaches
RELATIONAL_ORACLE["q177_bollinger_breaches"] = (
    "WITH daily AS ("
    "  SELECT r_name AS region, CAST(o_orderdate AS DATE) AS day, "
    "    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "      AS x "
    "  FROM orders "
    "  JOIN customer ON o_custkey = c_custkey "
    "  JOIN nation ON c_nationkey = n_nationkey "
    "  JOIN region ON n_regionkey = r_regionkey "
    "  GROUP BY 1, 2), "
    "m AS ("
    "  SELECT region, day, x, "
    "    COUNT(*) OVER wtrail AS n, "
    "    SUM(x) OVER wtrail AS s, "
    "    SUM(x::HUGEINT * x) OVER wtrail AS q "
    "  FROM daily "
    "  WINDOW wtrail AS (PARTITION BY region "
    "    ORDER BY day - DATE '1970-01-01' "
    "    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)), "
    "f AS ("
    "  SELECT region, "
    "    CASE WHEN (x::HUGEINT * n - s) > 0 AND "
    "      (x::HUGEINT * n - s) * (x::HUGEINT * n - s) "
    "        > 4 * (n * q - s::HUGEINT * s) THEN 1 ELSE 0 END AS u, "
    "    CASE WHEN (x::HUGEINT * n - s) < 0 AND "
    "      (x::HUGEINT * n - s) * (x::HUGEINT * n - s) "
    "        > 4 * (n * q - s::HUGEINT * s) THEN 1 ELSE 0 END AS l "
    "  FROM m WHERE n >= 3) "
    "SELECT region, CAST(COUNT(*) AS BIGINT) AS n_days_judged, "
    "  CAST(SUM(u) AS BIGINT) AS n_upper_breaches, "
    "  CAST(SUM(l) AS BIGINT) AS n_lower_breaches "
    "FROM f GROUP BY region"
)


# --------------------------------------------------------------------------
# TPC-H completion shapes (round 11): the classic decision-support
# queries not yet represented, adapted to this schema (no partsupp /
# l_shipmode / l_commitdate / c_phone — each adaptation is documented
# in place). All money math is EXACT integer micros: rev_u =
# round(extprice·100) · (100 − round(disc·100)), summed in
# DECIMAL(38,0) (the q176 posture), shares via _floor_div_dec.
# --------------------------------------------------------------------------

def _rev_u():
    """Per-line revenue in cent-hundredths (cents × (100 − disc_pct)),
    exact in longs per row; SUM in decimal(38,0) at every aggregate."""
    return (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    )


_REV_U_SQL = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT) "
    "* (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)


def q178_tpch_q8_share(spark, sf_dir):
    """TPC-H Q8 (national market share) shape: of all PROMO-part
    revenue delivered to EUROPE-region customers, the share supplied
    by NATION_3, per order year. The canonical share-of-filtered-fan
    join: lineitem fans to orders→customer→nation→region on one side
    and supplier→nation + part on the other — all five dims broadcast
    (region/nation/supplier/part are dim-bounded; only
    lineitem⋈orders shuffles). Share is exact: conditional decimal
    sum over rev_u, _floor_div_dec against the year total."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    cn = n.alias("cn")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    j = (
        li.select("l_orderkey", "l_suppkey", "l_partkey", _rev_u().alias("rev_u"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(F.broadcast(r.where(F.col("r_name") == "EUROPE")),
              F.col("cn.n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(p.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
    )
    g = j.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", F.col("rev_u"))
            .otherwise(F.lit(0))
            .cast("decimal(38,0)")
        ).alias("nat"),
        F.sum(F.col("rev_u").cast("decimal(38,0)")).alias("tot"),
    )
    return g.select(
        "o_year",
        F.col("nat").cast("long").alias("nation_rev_u"),
        F.col("tot").cast("long").alias("total_rev_u"),
        _floor_div_dec(
            F.col("nat") * F.lit(1_000_000), F.col("tot")
        ).alias("share_e6"),
    )


RELATIONAL_QUERIES["q178_tpch_q8_share"] = q178_tpch_q8_share
RELATIONAL_ORACLE["q178_tpch_q8_share"] = (
    "WITH j AS ("
    f"  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year, {_REV_U_SQL} AS rev_u, "
    "    sn.n_name AS supp_nation "
    "  FROM lineitem l "
    "  JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "  JOIN customer c ON o.o_custkey = c.c_custkey "
    "  JOIN nation cn ON c.c_nationkey = cn.n_nationkey "
    "  JOIN region rg ON cn.n_regionkey = rg.r_regionkey "
    "    AND rg.r_name = 'EUROPE' "
    "  JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "  JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
    "  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO') "
    "SELECT CAST(o_year AS BIGINT) AS o_year, "
    "  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_u ELSE 0 END) "
    "    AS BIGINT) AS nation_rev_u, "
    "  CAST(SUM(rev_u) AS BIGINT) AS total_rev_u, "
    "  CAST((1000000 * SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_u "
    "    ELSE 0 END)) // SUM(rev_u) AS BIGINT) AS share_e6 "
    "FROM j GROUP BY o_year"
)


def q179_tpch_q9_profit(spark, sf_dir):
    """TPC-H Q9 (product-type profit) shape: profit per supplier nation
    per order year over parts whose name contains 'widget'. No
    partsupp table in this schema, so unit cost substitutes
    p_retailprice (documented adaptation — the join/agg geometry is
    Q9's: fact fans to part + supplier→nation + orders-for-the-year).
    amount_u = rev_u − retail_c·qty·100, exact per row in longs
    (possibly negative), summed in decimal(38,0)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").contains("widget"))
    amount = _rev_u() - (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.round(F.col("l_quantity")).cast("long")
        * F.lit(100)
    )
    j = (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(_t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount_u"),
        )
    )
    return (
        j.groupBy("nation", "o_year")
        .agg(
            F.sum(F.col("amount_u").cast("decimal(38,0)"))
            .cast("long")
            .alias("profit_u"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


RELATIONAL_QUERIES["q179_tpch_q9_profit"] = q179_tpch_q9_profit
RELATIONAL_ORACLE["q179_tpch_q9_profit"] = (
    "WITH j AS ("
    "  SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS yr, "
    f"    {_REV_U_SQL} "
    "      - CAST(ROUND(p.p_retailprice * 100) AS BIGINT) "
    "        * CAST(ROUND(l.l_quantity) AS BIGINT) * 100 AS amount_u "
    "  FROM lineitem l "
    "  JOIN part p ON l.l_partkey = p.p_partkey "
    "    AND p.p_name LIKE '%widget%' "
    "  JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "  JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "  JOIN orders o ON l.l_orderkey = o.o_orderkey) "
    "SELECT nation, CAST(yr AS BIGINT) AS o_year, "
    "  CAST(SUM(amount_u) AS BIGINT) AS profit_u, "
    "  CAST(COUNT(*) AS BIGINT) AS n_lines "
    "FROM j GROUP BY nation, yr"
)


def q180_tpch_q11_important(spark, sf_dir):
    """TPC-H Q11 (important stock) shape: parts whose revenue exceeds
    0.1 % of GLOBAL revenue — the HAVING-against-scalar-subquery
    geometry. No partsupp table, so "value" is lineitem revenue per
    part (documented adaptation; the operator under test is the
    global-scalar threshold, not the inventory join). The comparison
    is EXACT cross-multiplied integers: 1000·part_value > total — no
    division, no float threshold. The global total is a 1-row
    aggregate broadcast into the filter (one fact scan feeds both
    aggregates via grouping on p_partkey then re-aggregation — the
    per-part table IS the input to the total, so the fact scan runs
    once)."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = (
        li.select(F.col("l_partkey"), _rev_u().alias("rev_u"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("rev_u").cast("decimal(38,0)")).alias("value"))
        .localCheckpoint()  # reuse: feeds BOTH the total and the filter
    )
    total = per_part.agg(F.sum("value").alias("t"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value") * 1000 > F.col("t"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value").cast("long").alias("value_u"),
        )
    )


RELATIONAL_QUERIES["q180_tpch_q11_important"] = q180_tpch_q11_important
RELATIONAL_ORACLE["q180_tpch_q11_important"] = (
    "WITH per_part AS ("
    f"  SELECT l_partkey, SUM({_REV_U_SQL}) AS value "
    "  FROM lineitem GROUP BY l_partkey) "
    "SELECT l_partkey AS p_partkey, CAST(value AS BIGINT) AS value_u "
    "FROM per_part "
    "WHERE value * 1000 > (SELECT SUM(value) FROM per_part)"
)


def q181_tpch_q14_promo(spark, sf_dir):
    """TPC-H Q14 (promotion effect) shape: the share of September-1997
    shipped revenue carried by PROMO-type parts — a month-pruned scan
    (both shipdate bounds push to parquet), a broadcast part join, and
    ONE conditional aggregate; the share divides once via
    _floor_div_dec."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    g = (
        li.select("l_partkey", _rev_u().alias("rev_u"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("rev_u"))
                .otherwise(F.lit(0))
                .cast("decimal(38,0)")
            ).alias("promo"),
            F.sum(F.col("rev_u").cast("decimal(38,0)")).alias("tot"),
        )
    )
    return g.select(
        "n_items",
        F.col("promo").cast("long").alias("promo_rev_u"),
        F.col("tot").cast("long").alias("total_rev_u"),
        _floor_div_dec(
            F.col("promo") * F.lit(1_000_000), F.col("tot")
        ).alias("promo_share_e6"),
    )


RELATIONAL_QUERIES["q181_tpch_q14_promo"] = q181_tpch_q14_promo
RELATIONAL_ORACLE["q181_tpch_q14_promo"] = (
    "WITH j AS ("
    f"  SELECT {_REV_U_SQL} AS rev_u, p.p_type "
    "  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    "  WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' "
    "    AND l.l_shipdate < TIMESTAMP '1997-10-01') "
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_items, "
    "  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_u ELSE 0 END) "
    "    AS BIGINT) AS promo_rev_u, "
    "  CAST(SUM(rev_u) AS BIGINT) AS total_rev_u, "
    "  CAST((1000000 * SUM(CASE WHEN p_type = 'PROMO' THEN rev_u ELSE 0 "
    "    END)) // SUM(rev_u) AS BIGINT) AS promo_share_e6 "
    "FROM j"
)


def q182_tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier) shape: suppliers whose 1998-Q1 shipped
    revenue equals the maximum — the view-then-argmax geometry. The
    revenue "view" is one grouped aggregate; the max is a 1-row
    aggregate of THAT view broadcast back as an equi-filter (ties
    included, per the spec). Exact integers end to end, so "equals
    max" is well-defined — no float max comparison."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1998-01-01")
        & (F.col("l_shipdate") < "1998-04-01")
    )
    rev = (
        li.select("l_suppkey", _rev_u().alias("rev_u"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("rev_u").cast("decimal(38,0)")).alias("total"))
        .localCheckpoint()  # reuse: feeds both the argmax and the filter
    )
    mx = rev.agg(F.max("total").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.col("total").cast("long").alias("total_rev_u"),
        )
    )


RELATIONAL_QUERIES["q182_tpch_q15_top_supplier"] = q182_tpch_q15_top_supplier
RELATIONAL_ORACLE["q182_tpch_q15_top_supplier"] = (
    "WITH rev AS ("
    f"  SELECT l_suppkey, SUM({_REV_U_SQL}) AS total "
    "  FROM lineitem "
    "  WHERE l_shipdate >= TIMESTAMP '1998-01-01' "
    "    AND l_shipdate < TIMESTAMP '1998-04-01' "
    "  GROUP BY l_suppkey) "
    "SELECT s.s_suppkey, s.s_name, CAST(r.total AS BIGINT) AS total_rev_u "
    "FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey "
    "WHERE r.total = (SELECT MAX(total) FROM rev)"
)


def q183_tpch_q17_small_qty(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue) shape: Brand#4 lines
    whose quantity is below 20 % of that part's average quantity — the
    correlated-average-per-group filter. The threshold is EXACT
    cross-multiplied integers: qty < 0.2·(Σqty/n) ⟺ 5·qty·n < Σqty
    (quantities are integral by fixture; rounded to long on both
    sides). The per-part averages table is part-bounded → broadcast
    back onto the same filtered scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#4")
    lines = li.join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        "l_partkey",
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("ext_c"),
    )
    per_part = lines.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum("qty").cast("long").alias("sum_qty"),
    )
    return (
        lines.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pk"))
        .where(F.lit(5) * F.col("qty") * F.col("n_i") < F.col("sum_qty"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("ext_c").cast("decimal(38,0)"))
            .cast("long")
            .alias("small_qty_rev_c"),
        )
    )


RELATIONAL_QUERIES["q183_tpch_q17_small_qty"] = q183_tpch_q17_small_qty
RELATIONAL_ORACLE["q183_tpch_q17_small_qty"] = (
    "WITH lines AS ("
    "  SELECT l.l_partkey, CAST(ROUND(l.l_quantity) AS BIGINT) AS qty, "
    "    CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS ext_c "
    "  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    "  WHERE p.p_brand = 'Brand#4'), "
    "per_part AS ("
    "  SELECT l_partkey AS pk, COUNT(*) AS n_i, "
    "    CAST(SUM(qty) AS BIGINT) AS sum_qty "
    "  FROM lines GROUP BY 1) "
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_lines, "
    "  CAST(SUM(ext_c) AS BIGINT) AS small_qty_rev_c "
    "FROM lines j JOIN per_part ON j.l_partkey = pk "
    "WHERE 5 * j.qty * n_i < sum_qty"
)


def q184_tpch_q19_disjunctive(spark, sf_dir):
    """TPC-H Q19 (discounted revenue) shape: three OR'd
    brand/size/quantity brackets over the part join — the disjunctive
    multi-bracket predicate Catalyst must keep join-convertible (the
    common `l_partkey = p_partkey` factor hoists out of the OR, so
    the plan stays an equi-join with a residual disjunction, never a
    nested loop). Quantities compare as the fixture's integral
    doubles, identical in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    bracket = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#16")
            & F.col("p_size").between(10, 30)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(20, 50)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(bracket)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(_rev_u().cast("decimal(38,0)"))
            .cast("long")
            .alias("disc_rev_u"),
        )
    )


RELATIONAL_QUERIES["q184_tpch_q19_disjunctive"] = q184_tpch_q19_disjunctive
RELATIONAL_ORACLE["q184_tpch_q19_disjunctive"] = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_lines, "
    f"  CAST(SUM({_REV_U_SQL}) AS BIGINT) AS disc_rev_u "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    "WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 15 "
    "       AND l.l_quantity BETWEEN 1 AND 11) "
    "   OR (p.p_brand = 'Brand#16' AND p.p_size BETWEEN 10 AND 30 "
    "       AND l.l_quantity BETWEEN 10 AND 20) "
    "   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 50 "
    "       AND l.l_quantity BETWEEN 20 AND 30)"
)


def q185_tpch_q22_antijoin(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity) shape: customers with
    above-average positive balances who never ordered, grouped by a
    name-derived cohort (no c_phone column — the last digit of c_name
    substitutes for the phone country code; the operator under test
    is scalar-subquery threshold + anti-join + re-aggregation). The
    average threshold is exact cross-multiplied cents: bal_c·n_pos >
    sum_pos_c. The anti join streams orders once."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr("right(c_name, 1)").alias("cohort"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    pos = c.where(F.col("bal_c") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(F.col("bal_c").cast("decimal(38,0)")).alias("sum_pos_c"),
    )
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    rich = (
        c.crossJoin(F.broadcast(pos))
        .where(
            F.col("bal_c").cast("decimal(38,0)") * F.col("n_pos")
            > F.col("sum_pos_c")
        )
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return rich.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_custs"),
        F.sum(F.col("bal_c").cast("decimal(38,0)"))
        .cast("long")
        .alias("total_bal_c"),
    )


RELATIONAL_QUERIES["q185_tpch_q22_antijoin"] = q185_tpch_q22_antijoin
RELATIONAL_ORACLE["q185_tpch_q22_antijoin"] = (
    "WITH c AS ("
    "  SELECT c_custkey, right(c_name, 1) AS cohort, "
    "    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c "
    "  FROM customer), "
    "pos AS ("
    "  SELECT COUNT(*) AS n_pos, SUM(bal_c) AS sum_pos_c "
    "  FROM c WHERE bal_c > 0) "
    "SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_custs, "
    "  CAST(SUM(bal_c) AS BIGINT) AS total_bal_c "
    "FROM c, pos "
    "WHERE bal_c * n_pos > sum_pos_c "
    "  AND NOT EXISTS (SELECT 1 FROM orders o "
    "                  WHERE o.o_custkey = c.c_custkey) "
    "GROUP BY cohort"
)


def q186_ohlc_bars(spark, sf_dir):
    """OHLC (open-high-low-close) candlestick bars per (event_type,
    day) — the market-data rollup every time-series store ships, as
    ONE hash aggregate: open/close are min_by/max_by over a totally-
    ordered DECIMAL(38,0) key (epoch micros · 10¹² + event_id — ties
    in ts are broken by the unique event id, so the argmin is
    deterministic at any scale; the key form assumes event_id < 10¹²,
    enforced by an in-plan assert_true folded into the key — round-11
    ADVICE — so a larger id raises instead of silently bleeding into
    the timestamp digits), high/low/n are
    plain min/max/count. No window function — min_by keeps the whole
    bar map-side combinable, where a row_number-per-partition form
    would shuffle every row to rank it."""
    e = _t(spark, sf_dir, "events")
    ordkey = (
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP'1970-01-01 00:00:00', ts)"
        ).cast("decimal(38,0)")
        * F.lit(10**12).cast("decimal(38,0)")
        + F.col("event_id")
        # + 0 while the id fits its 10^12 digit slot; raises otherwise
        + F.coalesce(
            F.assert_true(
                F.col("event_id") < F.lit(10**12).cast("long"),
                F.lit(
                    "q186_ohlc_bars: event_id >= 10^12 would bleed into"
                    " the timestamp digits of the OHLC ordering key"
                ),
            ).cast("decimal(38,0)"),
            F.lit(0).cast("decimal(38,0)"),
        )
    )
    v_c = F.round(F.col("value") * 100).cast("long")
    return (
        e.select(
            "event_type",
            F.to_date("ts").alias("day"),
            v_c.alias("v_c"),
            ordkey.alias("ok"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.min_by("v_c", "ok").alias("open_c"),
            F.max("v_c").alias("high_c"),
            F.min("v_c").alias("low_c"),
            F.max_by("v_c", "ok").alias("close_c"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


RELATIONAL_QUERIES["q186_ohlc_bars"] = q186_ohlc_bars
RELATIONAL_ORACLE["q186_ohlc_bars"] = (
    "WITH e AS ("
    "  SELECT event_type, CAST(ts AS DATE) AS day, "
    "    CAST(ROUND(value * 100) AS BIGINT) AS v_c, "
    "    epoch_us(ts)::HUGEINT * 1000000000000 + event_id AS ok "
    "  FROM events) "
    "SELECT event_type, day, "
    "  arg_min(v_c, ok) AS open_c, "
    "  CAST(MAX(v_c) AS BIGINT) AS high_c, "
    "  CAST(MIN(v_c) AS BIGINT) AS low_c, "
    "  arg_max(v_c, ok) AS close_c, "
    "  CAST(COUNT(*) AS BIGINT) AS n_events "
    "FROM e GROUP BY event_type, day"
)


def q187_cramers_v(spark, sf_dir):
    """Cramér's V association strength for the event_type × day-of-week
    contingency — the normalized effect size q104's chi-square lacks
    (χ² grows with N; V ∈ [0,1] answers "is the association BIG").
    Same kernel discipline as q104: exact BIGINT cell counts, each
    cell's χ² contribution floored to e6 BEFORE the sum, then
    V = sqrt(χ²/(N·min(r−1,c−1))) — sqrt is IEEE-exact (correctly
    rounded, unlike libm ln), so flooring its e6 scaling is
    engine-portable by construction. Day-of-week is pure integer
    calendar math (epoch_days mod 7), immune to the Spark-vs-DuckDB
    dayofweek origin mismatch."""
    e = _t(spark, sf_dir, "events")
    epoch_s = F.expr(
        "timestampdiff(SECOND, TIMESTAMP'1970-01-01 00:00:00', ts)"
    )
    cells = (
        e.select(
            "event_type",
            ((epoch_s / 86400).cast("long") % 7).alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    w_all = Window.partitionBy()
    with_m = cells.select(
        "event_type", "dow", "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("rt"),
        F.sum("o").over(Window.partitionBy("dow")).alias("ct"),
        F.sum("o").over(w_all).alias("n"),
        F.size(F.collect_set("event_type").over(w_all)).alias("nr"),
        F.size(F.collect_set("dow").over(w_all)).alias("nc"),
    )
    exp = (F.col("rt") * F.col("ct")).cast("double") / F.col("n")
    contrib = (F.col("o") - exp) * (F.col("o") - exp) / exp
    scored = with_m.select(
        "o", "n", "nr", "nc",
        F.floor(contrib * 1_000_000).cast("long").alias("c_e6"),
    )
    g = scored.groupBy("n", "nr", "nc").agg(
        F.sum("c_e6").alias("chi2_e6"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    v = F.sqrt(
        (F.col("chi2_e6").cast("double") / 1e6)
        / (
            F.col("n").cast("double")
            * F.least(F.col("nr") - 1, F.col("nc") - 1).cast("double")
        )
    )
    return g.select(
        F.col("n").cast("long").alias("n"),
        F.col("nr").cast("long").alias("n_rows_cat"),
        F.col("nc").cast("long").alias("n_cols_cat"),
        "n_cells",
        F.col("chi2_e6").cast("long").alias("chi2_e6"),
        F.floor(v * 1_000_000).cast("long").alias("cramers_v_e6"),
    )


RELATIONAL_QUERIES["q187_cramers_v"] = q187_cramers_v
RELATIONAL_ORACLE["q187_cramers_v"] = (
    "WITH cells AS ("
    "  SELECT event_type, (epoch(ts)::BIGINT // 86400) % 7 AS dow, "
    "    COUNT(*) AS o "
    "  FROM events GROUP BY 1, 2), "
    "m AS ("
    "  SELECT o, "
    "    SUM(o) OVER (PARTITION BY event_type) AS rt, "
    "    SUM(o) OVER (PARTITION BY dow) AS ct, "
    "    SUM(o) OVER () AS n, "
    "    (SELECT COUNT(DISTINCT event_type) FROM cells) AS nr, "
    "    (SELECT COUNT(DISTINCT dow) FROM cells) AS nc "
    "  FROM cells), "
    "scored AS ("
    "  SELECT n, nr, nc, "
    "    CAST(FLOOR(1000000 * (o - (rt * ct)::DOUBLE / n) "
    "      * (o - (rt * ct)::DOUBLE / n) / ((rt * ct)::DOUBLE / n)) "
    "      AS BIGINT) AS c_e6 "
    "  FROM m), "
    "g AS ("
    "  SELECT n, nr, nc, CAST(SUM(c_e6) AS BIGINT) AS chi2_e6, "
    "    COUNT(*) AS n_cells "
    "  FROM scored GROUP BY 1, 2, 3) "
    "SELECT CAST(n AS BIGINT) AS n, CAST(nr AS BIGINT) AS n_rows_cat, "
    "  CAST(nc AS BIGINT) AS n_cols_cat, "
    "  CAST(n_cells AS BIGINT) AS n_cells, chi2_e6, "
    "  CAST(FLOOR(1000000 * SQRT((chi2_e6::DOUBLE / 1000000) "
    "    / (n::DOUBLE * LEAST(nr - 1, nc - 1)::DOUBLE))) AS BIGINT) "
    "    AS cramers_v_e6 "
    "FROM g"
)


def q188_kendall_tau(spark, sf_dir):
    """Kendall τ-b rank correlation between daily event volume and
    daily total value — the tie-robust companion to q133's midrank
    Spearman. The series collapses to ONE row per day first (the
    support-collapse discipline), then concordant/discordant/tied
    pair counts come from a day×day self-join bounded by the CALENDAR
    (O(D²) in days, never in events — 30 days ⇒ 435 pairs at any
    corpus size; at 10 years ⇒ ~6.7M pairs, still trivially
    distributed). τ_b = (nc−nd)/√((n0−n1)(n0−n2)) evaluates in
    doubles whose operands are exact longs; sqrt and one division are
    IEEE-correctly-rounded, so the e6 floor is engine-portable."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"),
        )
        .localCheckpoint()  # tiny; feeds both sides of the pair join
    )
    a = daily.select(
        F.col("day").alias("d1"), F.col("x").alias("x1"),
        F.col("y").alias("y1"),
    )
    b = daily.select(
        F.col("day").alias("d2"), F.col("x").alias("x2"),
        F.col("y").alias("y2"),
    )
    # structural broadcast: the daily table is CALENDAR-bounded, but
    # Catalyst's pre-AQE size estimate scales with the events scan and
    # degraded this non-equi join to an unbroadcast CartesianProduct at
    # the 100x smoke — the q100 bounded-side hint case
    pairs = a.join(F.broadcast(b), F.col("d1") < F.col("d2")).select(
        F.signum((F.col("x2") - F.col("x1")).cast("double")).alias("cx"),
        F.signum((F.col("y2") - F.col("y1")).cast("double")).alias("cy"),
    )
    g = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.when(F.col("cx") * F.col("cy") > 0, 1).otherwise(0))
        .alias("nc"),
        F.sum(F.when(F.col("cx") * F.col("cy") < 0, 1).otherwise(0))
        .alias("nd"),
        F.sum(F.when(F.col("cx") == 0, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("cy") == 0, 1).otherwise(0)).alias("n2"),
    )
    tau = (F.col("nc") - F.col("nd")).cast("double") / F.sqrt(
        (F.col("n0") - F.col("n1")).cast("double")
        * (F.col("n0") - F.col("n2")).cast("double")
    )
    return g.select(
        F.col("n0").cast("long").alias("n_pairs"),
        F.col("nc").cast("long").alias("concordant"),
        F.col("nd").cast("long").alias("discordant"),
        F.col("n1").cast("long").alias("ties_x"),
        F.col("n2").cast("long").alias("ties_y"),
        F.floor(tau * 1_000_000).cast("long").alias("tau_b_e6"),
    )


RELATIONAL_QUERIES["q188_kendall_tau"] = q188_kendall_tau
RELATIONAL_ORACLE["q188_kendall_tau"] = (
    "WITH daily AS ("
    "  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x, "
    "    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y "
    "  FROM events GROUP BY 1), "
    "pairs AS ("
    "  SELECT SIGN((b.x - a.x)::DOUBLE) AS cx, "
    "    SIGN((b.y - a.y)::DOUBLE) AS cy "
    "  FROM daily a JOIN daily b ON a.day < b.day), "
    "g AS ("
    "  SELECT COUNT(*) AS n0, "
    "    SUM(CASE WHEN cx * cy > 0 THEN 1 ELSE 0 END) AS nc, "
    "    SUM(CASE WHEN cx * cy < 0 THEN 1 ELSE 0 END) AS nd, "
    "    SUM(CASE WHEN cx = 0 THEN 1 ELSE 0 END) AS n1, "
    "    SUM(CASE WHEN cy = 0 THEN 1 ELSE 0 END) AS n2 "
    "  FROM pairs) "
    "SELECT CAST(n0 AS BIGINT) AS n_pairs, CAST(nc AS BIGINT) AS concordant, "
    "  CAST(nd AS BIGINT) AS discordant, CAST(n1 AS BIGINT) AS ties_x, "
    "  CAST(n2 AS BIGINT) AS ties_y, "
    "  CAST(FLOOR(1000000 * (nc - nd)::DOUBLE "
    "    / SQRT((n0 - n1)::DOUBLE * (n0 - n2)::DOUBLE)) AS BIGINT) "
    "    AS tau_b_e6 "
    "FROM g"
)


def merge_full(base: DataFrame, src: DataFrame, keys: list) -> DataFrame:
    """Tri-clause MERGE semantics (Delta/Iceberg MERGE INTO, all three
    arms): WHEN MATCHED → UPDATE from source, WHEN NOT MATCHED →
    INSERT from source, WHEN NOT MATCHED BY SOURCE → DELETE. One FULL
    OUTER join on the key + per-column CASE — every non-key column
    resolves to the source side when the source row exists, and rows
    present only in base drop. (q68's merge_upsert is the two-arm
    form; the BY SOURCE arm is what turns a merge into a full
    snapshot REPLACE-by-key, the CDC compaction contract.)

    Scale shape: one shuffle on the merge key; the CASE projection is
    map-side. Delete-by-absence requires the full outer — there is no
    cheaper plan that sees both absences."""
    b = base.alias("b")
    s = src.alias("s")
    cond = None
    for k in keys:
        c = F.col(f"b.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else (cond & c)
    src_exists = F.col(f"s.{keys[0]}").isNotNull()
    cols = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"b.{k}")).alias(k) for k in keys
    ] + [
        F.when(src_exists, F.col(f"s.{c}")).otherwise(F.col(f"b.{c}"))
        .alias(c)
        for c in base.columns
        if c not in keys
    ]
    return b.join(s, cond, "full_outer").where(src_exists).select(*cols)


def q189_merge_full(spark, sf_dir):
    """Gate: tri-clause MERGE. Base = orders with key % 5 != 4 (so the
    source holds pure inserts); source = even keys repriced 2× and
    flagged 'U' (updates + the %5==4 evens as inserts). Odd base rows
    not in the source DELETE — the BY SOURCE arm. The reprice factor
    is 2 (exact in binary) so ROUND never lands on a half-cent tie."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = o.where(F.col("o_orderkey") % 5 != 4)
    src = (
        o.where(F.col("o_orderkey") % 2 == 0)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 2, 2))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    return merge_full(base, src, ["o_orderkey"]).select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price_r"),
    )


RELATIONAL_QUERIES["q189_merge_full"] = q189_merge_full
RELATIONAL_ORACLE["q189_merge_full"] = (
    # the tri-clause MERGE collapses to: every source row survives
    # (matched rows take source values; unmatched insert), and base
    # rows absent from the source are deleted — i.e. the result IS the
    # source projection, which is exactly what makes the FULL OUTER
    # implementation verifiable: the oracle states the CONTRACT, the
    # engine runs the join
    "SELECT o_orderkey, 'U' AS o_orderstatus, "
    "  ROUND(ROUND(o_totalprice * 2, 2), 2) AS price_r "
    "FROM orders WHERE o_orderkey % 2 = 0"
)


def q190_subtree_rollup(spark, sf_dir):
    """BOM subtree aggregation over q121's synthesized part hierarchy
    (parent = key // 2): every top-6-level node's DESCENDANT count and
    retail-price mass — the "cost of this assembly including every
    part under it" rollup. The ancestor set comes from an arithmetic
    explode of the halving chain (node >> k for k = 0..21 while ≥ 1;
    21 levels cover 2M parts) — the closed form this synthetic
    hierarchy admits; a data-driven hierarchy derives the same
    (node, ancestor) pairs from pointer_doubling's intermediate
    states. Then ONE groupBy(ancestor) aggregates the exploded
    stream. Money is exact cents.

    Round-13 optimization (guide §2.3 "shuffle fewer bytes"): the
    ≤63 ancestor filter is applied INSIDE the chain array, before the
    explode — each part emits only its ≤6 shallow ancestors instead
    of its full 22-element chain that a post-explode WHERE then threw
    away (22 generated rows per part → ~6; sf0.1: 4.7 s → ~1 s, same
    exact result since explode-then-filter ≡ filter-then-explode for
    a per-element predicate)."""
    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
    )
    # node 0 exists in the fixture (keys start at 0) and is its own
    # 1-element chain: the halving walk from 0 never reaches 1, and a
    # bare >= 1 filter would drop it while the recursive oracle keeps
    # its seed row — array_distinct collapses the shift tail instead
    chain = F.when(
        F.col("node") == 0, F.array(F.lit(0).cast("long"))
    ).otherwise(
        F.array_distinct(
            F.filter(
                # 22 literal shifts (shiftright's bit count is a Python
                # int, not a Column) — covers 2^21 > 2M parts
                F.array(
                    # element 0 is the fail-loud depth guard (round-11
                    # ADVICE): NULL (dropped by the >= 1 predicate)
                    # while every node fits the 22-shift chain; raises
                    # before one silently-truncated chain can ship
                    F.assert_true(
                        F.col("node") < F.lit(1 << 22).cast("long"),
                        F.concat(
                            F.lit("q190_subtree_rollup: p_partkey "),
                            F.col("node").cast("string"),
                            F.lit(
                                " >= 2^22 — the 22-shift ancestor chain"
                                " would truncate before reaching 1"
                            ),
                        ),
                    ).cast("long"),
                    *[F.shiftright(F.col("node"), k) for k in range(22)],
                ),
                lambda a: (a >= 1) & (a <= 63),
            )
        )
    )
    anc = p.select("node", "price_c", F.explode(chain).alias("anc"))
    return (
        anc.groupBy(F.col("anc").alias("node"))
        .agg(
            # the node itself is in its own chain: subtree INCLUDES it
            F.count(F.lit(1)).cast("long").alias("subtree_size"),
            F.sum(F.col("price_c").cast("decimal(38,0)"))
            .cast("long")
            .alias("subtree_price_c"),
        )
    )


RELATIONAL_QUERIES["q190_subtree_rollup"] = q190_subtree_rollup
RELATIONAL_ORACLE["q190_subtree_rollup"] = (
    "WITH RECURSIVE walk(node, anc) AS ("
    "  SELECT p_partkey, p_partkey FROM part "
    "  UNION ALL "
    "  SELECT node, anc // 2 FROM walk WHERE anc > 1) "
    "SELECT w.anc AS node, CAST(COUNT(*) AS BIGINT) AS subtree_size, "
    "  CAST(SUM(CAST(ROUND(p.p_retailprice * 100) AS BIGINT)) AS BIGINT) "
    "    AS subtree_price_c "
    "FROM walk w JOIN part p ON w.node = p.p_partkey "
    "WHERE w.anc <= 63 GROUP BY w.anc"
)


def q191_hits_scores(spark, sf_dir):
    """HITS hub/authority scores (Kleinberg) over the customer→part
    purchase bipartite graph, 2 mutual-reinforcement iterations in
    EXACT integer arithmetic — the link-analysis sibling of q100's
    PageRank (PageRank ranks by random-walk mass; HITS separates
    "good buyers" (hubs) from "widely-bought parts" (authorities)).
    Normalization is deliberately deferred — the iterates stay
    UNNORMALIZED integer sums (auth₁ = in-degree, hub₁ = Σ auth₁ over
    the customer's parts, auth₂ = Σ hub₁ over the part's buyers), so
    every value is a path count, exact in DECIMAL(38,0) at any scale
    (rankings are scale-invariant, so normalization adds nothing but
    float drift). Edges are DISTINCT (customer, part) pairs.

    Scale shape: each iteration is one equi-join + one map-combinable
    aggregate over the edge list (the q100 message-passing shape);
    the output is a TakeOrderedAndProject top-20."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint()  # three passes ride one materialized edge list
    )
    auth1 = edges.groupBy("p").agg(F.count(F.lit(1)).alias("a1"))
    hub1 = (
        edges.join(auth1, "p")
        .groupBy("c")
        .agg(F.sum(F.col("a1").cast("decimal(38,0)")).alias("h1"))
    )
    auth2 = (
        edges.join(hub1, "c")
        .groupBy("p")
        .agg(F.sum(F.col("h1")).alias("a2"))
    )
    return (
        auth2.join(auth1, "p")
        .select(
            F.col("p").alias("p_partkey"),
            F.col("a1").cast("long").alias("auth1_indegree"),
            F.col("a2").cast("long").alias("auth2_score"),
        )
        .orderBy(F.col("auth2_score").desc(), F.col("p_partkey"))
        .limit(20)
    )


RELATIONAL_QUERIES["q191_hits_scores"] = q191_hits_scores
RELATIONAL_ORACLE["q191_hits_scores"] = (
    "WITH edges AS ("
    "  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p "
    "  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey), "
    "auth1 AS (SELECT p, COUNT(*) AS a1 FROM edges GROUP BY p), "
    "hub1 AS ("
    "  SELECT e.c, CAST(SUM(a1) AS BIGINT) AS h1 "
    "  FROM edges e JOIN auth1 USING (p) GROUP BY e.c), "
    "auth2 AS ("
    "  SELECT e.p, CAST(SUM(h1) AS BIGINT) AS a2 "
    "  FROM edges e JOIN hub1 USING (c) GROUP BY e.p) "
    "SELECT x.p AS p_partkey, CAST(y.a1 AS BIGINT) AS auth1_indegree, "
    "  x.a2 AS auth2_score "
    "FROM auth2 x JOIN auth1 y ON y.p = x.p "
    "ORDER BY auth2_score DESC, p_partkey LIMIT 20"
)


def q192_equidepth_histogram(spark, sf_dir):
    """Equi-DEPTH (equal-frequency) 8-bucket histogram of order totals —
    the quantile-bucket profile q74's fixed-WIDTH histogram can't give
    on skewed money data (every bucket holds ~n/8 rows, so the bins
    adapt to density). Scale shape is the q125 discipline: collapse to
    per-cent (value, count) cells FIRST (map-combinable,
    support-bounded), ONE distributed_prefix_sum pass over the
    collapsed support (bucketed two-phase scan — no global window),
    then bucket = ((cum − 1) · 8) div n in exact integers. Ties are
    VALUE-ATOMIC by construction: a repeated price lands wholly in the
    bucket of its last cumulative position — deterministic in both
    engines, unlike row-ntile whose tie-splitting is order-dependent."""
    from .scale import distributed_prefix_sum

    o = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v_c")
    )
    cells = o.groupBy("v_c").agg(F.count(F.lit(1)).alias("cnt"))
    cum = distributed_prefix_sum(cells, "v_c", "cnt", out_col="cum")
    n = cells.agg(F.sum("cnt").alias("n"))
    return (
        cum.crossJoin(F.broadcast(n))
        .select(
            "v_c", "cnt",
            F.expr("((cum - 1) * 8) div n").cast("long").alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.min("v_c").cast("long").alias("lo_c"),
            F.max("v_c").cast("long").alias("hi_c"),
        )
    )


RELATIONAL_QUERIES["q192_equidepth_histogram"] = q192_equidepth_histogram
RELATIONAL_ORACLE["q192_equidepth_histogram"] = (
    "WITH o AS ("
    "  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v_c "
    "  FROM orders), "
    "cells AS (SELECT v_c, COUNT(*) AS cnt FROM o GROUP BY v_c), "
    "cum AS ("
    "  SELECT v_c, cnt, "
    "    SUM(cnt) OVER (ORDER BY v_c ROWS UNBOUNDED PRECEDING) AS cum, "
    "    SUM(cnt) OVER () AS n "
    "  FROM cells) "
    "SELECT CAST(((cum - 1) * 8) // n AS BIGINT) AS bucket, "
    "  CAST(SUM(cnt) AS BIGINT) AS n_rows, "
    "  CAST(MIN(v_c) AS BIGINT) AS lo_c, "
    "  CAST(MAX(v_c) AS BIGINT) AS hi_c "
    "FROM cum GROUP BY 1"
)


def q193_interval_range_frame(spark, sf_dir):
    """Trailing-7-day rolling value sum per event over RAW timestamps —
    semantically `SUM(v_c) OVER (PARTITION BY event_type ORDER BY ts
    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)`, result
    = top-20 events by (rolling sum, event_id). The INTERVAL-frame SQL
    surface itself stays proven by
    tests/test_optimization_r13.py::test_q193_matches_interval_frame_window,
    which pins this plan's output row-for-row against the literal
    INTERVAL-frame window.

    Round-13 optimization (guide §1.2 "the distributed algorithm"):
    Spark executes a moving-lower-bound RANGE frame as
    SlidingWindowFunctionFrame, RE-AGGREGATING the whole frame per row
    (no retraction) — O(rows · frame_width), measured 18.9 s vs 2.0 s
    for a ROWS control at sf0.1 (frame ≈ 23 % of the partition). The
    identical result in O(rows) per partition: every event emits its
    BASE row (ts, tag 1, +v_c) and a PROBE row (ts − 7d, tag 0, 0);
    one accumulating window — RANGE UNBOUNDED PRECEDING, the default
    frame, O(1) per row — over (ts, tag) gives the base row the
    tie-inclusive running total C(ts) and the probe row the running
    total B = Σ v_c over ts' < ts − 7d STRICTLY (the probe's tag 0
    sorts before base rows at the exact boundary, so a row AT ts − 7d
    stays inside the frame, matching the inclusive PRECEDING bound).
    roll = C − B folds in one map-combinable groupBy(event_id).
    Plan: 2 Exchanges (window + fold) instead of 1, but the window
    frame is accumulating, not sliding — sf0.1: 16.5 s → ~1.3 s."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts",
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
    )
    rows = e.select(
        "event_id", "event_type",
        F.explode(
            F.array(
                F.struct(
                    F.col("ts").alias("k"),
                    F.lit(1).alias("tag"),
                    F.col("v_c").alias("w"),
                ),
                F.struct(
                    (F.col("ts") - F.expr("INTERVAL 7 DAYS")).alias("k"),
                    F.lit(0).alias("tag"),
                    F.lit(0).cast("long").alias("w"),
                ),
            )
        ).alias("r"),
    ).select("event_id", "event_type", "r.k", "r.tag", "r.w")
    # default (accumulating) frame: RANGE UNBOUNDED PRECEDING → CURRENT
    # ROW over a composite order key — ties share the running total, so
    # base rows at equal ts see each other (RANGE semantics preserved)
    cum = F.expr(
        "SUM(w) OVER (PARTITION BY event_type ORDER BY k, tag)"
    )
    folded = (
        rows.select(
            "event_id", "event_type", "tag", cum.alias("cum")
        )
        .groupBy("event_id", "event_type")
        .agg(
            F.sum(
                F.when(F.col("tag") == 1, F.col("cum"))
                .otherwise(-F.col("cum"))
            ).cast("long").alias("roll7d_c")
        )
    )
    return (
        folded.select("event_id", "event_type", "roll7d_c")
        .orderBy(F.col("roll7d_c").desc(), F.col("event_id"))
        .limit(20)
    )


RELATIONAL_QUERIES["q193_interval_range_frame"] = q193_interval_range_frame
RELATIONAL_ORACLE["q193_interval_range_frame"] = (
    "WITH e AS ("
    "  SELECT event_id, event_type, ts, "
    "    CAST(ROUND(value * 100) AS BIGINT) AS v_c "
    "  FROM events) "
    "SELECT event_id, event_type, "
    "  CAST(SUM(v_c) OVER ("
    "    PARTITION BY event_type ORDER BY ts "
    "    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW"
    "  ) AS BIGINT) AS roll7d_c "
    "FROM e ORDER BY roll7d_c DESC, event_id LIMIT 20"
)


def q194_mode_per_key(spark, sf_dir):
    """Per-user MODAL event type (the statistical mode, an aggregate
    Spark has no built-in for) as TWO hash aggregates: count per
    (user, type), then one min_by over the packed (-count, type)
    struct — highest count wins, ties break to the lexically smallest
    type, so the survivor is total-order deterministic.

    Scale shape: both aggregates are map-side combinable and share the
    user_id shuffle key (ONE exchange end to end; AQE coalesces the
    second agg onto the first's partitioning). The row_number
    formulation computes the same thing but shuffles every (user,
    type) row into a window sort — the aggregate form keeps per-key
    state at O(|types seen|), which is what survives a 100x key-count
    scale-up. Oracle replays the tie rule with a window; results
    agree because the order key is identical."""
    e = _t(spark, sf_dir, "events")
    per = (
        e.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per.groupBy("user_id")
        .agg(
            F.min_by(
                "event_type", F.struct(-F.col("cnt"), F.col("event_type"))
            ).alias("mode_type"),
            F.max("cnt").cast("long").alias("mode_cnt"),
            F.sum("cnt").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
        )
    )


RELATIONAL_QUERIES["q194_mode_per_key"] = q194_mode_per_key
RELATIONAL_ORACLE["q194_mode_per_key"] = (
    "WITH per AS ("
    "  SELECT user_id, event_type, COUNT(*) AS cnt "
    "  FROM events GROUP BY 1, 2), "
    "r AS ("
    "  SELECT user_id, event_type, cnt, "
    "    ROW_NUMBER() OVER (PARTITION BY user_id "
    "      ORDER BY cnt DESC, event_type) AS rn "
    "  FROM per) "
    "SELECT r.user_id, r.event_type AS mode_type, "
    "  CAST(r.cnt AS BIGINT) AS mode_cnt, "
    "  CAST(t.n_events AS BIGINT) AS n_events, "
    "  CAST(t.n_types AS BIGINT) AS n_types "
    "FROM r JOIN ("
    "  SELECT user_id, SUM(cnt) AS n_events, COUNT(*) AS n_types "
    "  FROM per GROUP BY 1) t USING (user_id) "
    "WHERE r.rn = 1"
)


def q195_crosscorr_daily(spark, sf_dir):
    """Lagged cross-correlation between the daily click and purchase
    value series at lags −3..+3 — the lead/lag detector ("do clicks
    predict purchases k days out?") behind attribution and demand
    models. Series collapse to ONE row per calendar day first (the
    support-collapse discipline: window cost is calendar-bounded
    forever after), then each lag is an equi-join of the day table
    against itself shifted by date_add — 7 lags × |days| rows, never a
    row-level self-join. Centering is exact: a_t = n·x_t − Σx in longs
    (n ≤ |days|, so n·x fits), products and their sums in
    DECIMAL(38,0) (a·b ~ 1e24 at sf10 overflows BIGINT — the oracle
    promotes to HUGEINT for the same reason). r = num/√(Σa²·Σb²) uses
    the FULL-series variances (the signal-processing biased
    normalization, lag-invariant denominator — documented choice);
    num and the variances are the same exact integers in both engines,
    so their double casts, the sqrt, the division and the e6 floor are
    bit-identical."""
    e = _t(spark, sf_dir, "events")
    v_c = F.round(F.col("value") * 100).cast("long")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", v_c).otherwise(0))
            .cast("long").alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", v_c).otherwise(0)
            ).cast("long").alias("y"),
        )
        .localCheckpoint()  # calendar-sized; feeds 4 readers below
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    )
    d = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        (F.col("n") * F.col("x") - F.col("sx")).alias("a"),
        (F.col("n") * F.col("y") - F.col("sy")).alias("b"),
    ).localCheckpoint()
    dec = "decimal(38,0)"
    var = d.agg(
        F.sum(F.col("a").cast(dec) * F.col("a").cast(dec)).alias("va"),
        F.sum(F.col("b").cast(dec) * F.col("b").cast(dec)).alias("vb"),
    )
    lags = d.select(
        "day", "a", F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("lag")
    )
    num = (
        lags.join(
            # structural broadcast: d is calendar-bounded (q100's case)
            F.broadcast(
                d.select(F.col("day").alias("d2"), F.col("b").alias("b2"))
            ),
            F.col("d2") == F.date_add(F.col("day"), F.col("lag")),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_overlap"),
            F.sum(F.col("a").cast(dec) * F.col("b2").cast(dec)).alias(
                "num"
            ),
        )
    )
    r = F.floor(
        F.lit(1_000_000.0)
        * F.col("num").cast("double")
        / F.sqrt(F.col("va").cast("double") * F.col("vb").cast("double"))
    ).cast("long")
    return (
        num.crossJoin(F.broadcast(var))
        .select(F.col("lag").cast("long").alias("lag"), "n_overlap",
                r.alias("r_e6"))
    )


RELATIONAL_QUERIES["q195_crosscorr_daily"] = q195_crosscorr_daily
RELATIONAL_ORACLE["q195_crosscorr_daily"] = (
    "WITH daily AS ("
    "  SELECT CAST(ts AS DATE) AS day, "
    "    CAST(SUM(CASE WHEN event_type = 'click' "
    "      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)"
    "      AS x, "
    "    CAST(SUM(CASE WHEN event_type = 'purchase' "
    "      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)"
    "      AS y "
    "  FROM events GROUP BY 1), "
    "tot AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy FROM daily), "
    "d AS ("
    "  SELECT day, n * x - sx AS a, n * y - sy AS b "
    "  FROM daily, tot), "
    "var AS ("
    "  SELECT SUM(a::HUGEINT * a) AS va, SUM(b::HUGEINT * b) AS vb "
    "  FROM d), "
    "num AS ("
    "  SELECT l.lag, COUNT(*) AS n_overlap, "
    "    SUM(da.a::HUGEINT * db.b) AS num "
    "  FROM (SELECT unnest(range(-3, 4)) AS lag) l "
    "  JOIN d da ON TRUE "
    "  JOIN d db ON db.day = da.day + CAST(l.lag AS INT) "
    "  GROUP BY l.lag) "
    "SELECT CAST(lag AS BIGINT) AS lag, "
    "  CAST(n_overlap AS BIGINT) AS n_overlap, "
    "  CAST(FLOOR(1000000.0 * num::DOUBLE "
    "    / SQRT(va::DOUBLE * vb::DOUBLE)) AS BIGINT) AS r_e6 "
    "FROM num, var"
)


# --------------------------------------------------------------------------
# round 13: q196-q198
# --------------------------------------------------------------------------


def q196_streak_islands(spark, sf_dir):
    """Longest consecutive-day activity streak per user — the canonical
    gaps-and-islands shape (retention/engagement's "current streak"
    metric), which none of the window gates cover: q73 fills gaps,
    q64 buckets cohorts, but nothing identifies maximal runs.

    Technique: ONE hash aggregate — ``sort_array(collect_set(day))``
    per user — then pure array algebra: consecutive-day gaps via
    zip_with over shifted slices (the _bigram_shingles discipline, no
    per-index element_at), longest run via one aggregate() fold,
    streak count = 1 + gaps≠1. The textbook day−row_number anchor
    trick would be a second exchange plus a per-user window sort
    (measured plan: distinct shuffles on (user, day), window
    re-exchanges on user); this form is one exchange, zero windows,
    and the collect_set partial-aggregates map-side.

    Scale posture: per-user state is the DISTINCT-DAY array — bounded
    by the calendar (≤ 366/year), not by event count — so hot users
    cost the same as anyone and no skew salt is needed."""
    e = _t(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(
        F.sort_array(F.collect_set(F.to_date("ts"))).alias("days")
    )
    n = F.size("days")
    per = per.withColumn(
        "gaps",
        F.when(n < 2, F.array().cast("array<int>")).otherwise(
            F.zip_with(
                F.slice("days", 2, n - 1),
                F.slice("days", 1, n - 1),
                lambda b, a: F.datediff(b, a),
            )
        ),
    )
    run = F.aggregate(
        F.col("gaps"),
        F.struct(F.lit(1).alias("cur"), F.lit(1).alias("best")),
        lambda acc, d: F.struct(
            F.when(d == 1, acc.cur + 1).otherwise(F.lit(1)).alias("cur"),
            F.greatest(
                F.when(d == 1, acc.cur + 1).otherwise(F.lit(1)), acc.best
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    return per.select(
        "user_id",
        F.size("days").cast("long").alias("active_days"),
        (1 + F.size(F.filter("gaps", lambda d: d != 1)))
        .cast("long").alias("n_streaks"),
        run.cast("long").alias("max_streak"),
    )


RELATIONAL_QUERIES["q196_streak_islands"] = q196_streak_islands
RELATIONAL_ORACLE["q196_streak_islands"] = (
    "WITH days AS ("
    "  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), "
    "isl AS ("
    "  SELECT user_id, day - CAST(ROW_NUMBER() OVER ("
    "    PARTITION BY user_id ORDER BY day) AS INT) AS anchor "
    "  FROM days), "
    "s AS ("
    "  SELECT user_id, anchor, COUNT(*) AS len "
    "  FROM isl GROUP BY user_id, anchor) "
    "SELECT user_id, CAST(SUM(len) AS BIGINT) AS active_days, "
    "  CAST(COUNT(*) AS BIGINT) AS n_streaks, "
    "  CAST(MAX(len) AS BIGINT) AS max_streak "
    "FROM s GROUP BY user_id"
)

#: total seats for the largest-remainder apportionment gate
LR_SEATS = 1000


def q197_largest_remainder(spark, sf_dir):
    """Largest-remainder (Hamilton) apportionment of LR_SEATS slots
    across document sources by document count — the deterministic
    budget-allocation primitive under sampling quotas and shard-count
    assignment ("give each source shards proportional to size, exact
    total"). Pure integer arithmetic: base = n·S div N, then the
    S − Σbase leftover seats go to the largest remainders
    (tie-broken lexically by source), so Σseats == LR_SEATS exactly —
    what naive rounding cannot guarantee.

    Scale posture: the per-source count is one partial-aggregable
    groupBy; everything after operates on the SOURCE VOCABULARY
    (a handful of rows), so the total and leftover scalars broadcast
    and the remainder-rank window's single partition holds vocabulary-
    bounded rows — the q100 structural-boundedness case, not a data-
    sized global sort."""
    counts = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = counts.agg(F.sum("n_docs").alias("tot"))
    q = counts.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs",
        F.expr(f"n_docs * {LR_SEATS} div tot").alias("base"),
        F.expr(f"(n_docs * {LR_SEATS}) % tot").alias("rem"),
    )
    lo = q.agg((F.lit(LR_SEATS) - F.sum("base")).alias("leftover"))
    w = Window.orderBy(F.col("rem").desc(), F.col("source"))
    return (
        q.crossJoin(F.broadcast(lo))
        .withColumn("rk", F.row_number().over(w))
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            ).cast("long").alias("seats"),
        )
    )


RELATIONAL_QUERIES["q197_largest_remainder"] = q197_largest_remainder
RELATIONAL_ORACLE["q197_largest_remainder"] = (
    "WITH c AS ("
    "  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source), "
    "t AS (SELECT SUM(n_docs) AS tot FROM c), "
    f"q AS (SELECT source, n_docs, n_docs * {LR_SEATS} // tot AS base, "
    f"  (n_docs * {LR_SEATS}) % tot AS rem FROM c, t), "
    f"l AS (SELECT {LR_SEATS} - SUM(base) AS leftover FROM q), "
    "r AS (SELECT q.*, ROW_NUMBER() OVER ("
    "  ORDER BY rem DESC, source) AS rk FROM q) "
    "SELECT source, CAST(n_docs AS BIGINT) AS n_docs, "
    "  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) "
    "    AS seats "
    "FROM r, l"
)


def q198_degree_assortativity(spark, sf_dir):
    """Degree assortativity (Newman's degree–degree Pearson r) of the
    part co-purchase graph — the one-number structural profile (hub-
    to-hub vs hub-to-leaf wiring) that complements q106's triangles,
    q124's clustering coefficient and q191's HITS on the same graph.

    Exact integer moments over DIRECTED edge incidences (each
    undirected edge contributes both directions, the standard
    convention, making Σdx = Σdy by symmetry): r = (m·Σdxdy − Σdx·Σdy)
    / sqrt((m·Σdx² − (Σdx)²)(m·Σdy² − (Σdy)²)), accumulated in
    decimal(38,0) so m·Σd² stays exact far past int64 at 100 TB; the
    single float op is the final divide, floored to r_e6 — the q195
    exact-moments-then-one-divide discipline.

    Scale posture: the edge build is q106's (distinct order-part pairs,
    self-join on order, distinct) — the expensive stage, shuffling on
    l_orderkey then (a,b). The degree table is node-sized but
    FACT-DERIVED (it grows with the part vocabulary), so the degree
    joins carry NO broadcast hints — Catalyst broadcasts them while
    they fit and AQE flips to sort-merge when the graph outgrows the
    threshold (the 100x audit pins that flip); the moment aggregation
    is a single partial-aggregable reduce to one row."""
    # round-13: shared one-exchange edge builder + checkpoint — the
    # degree union and the directed union reference the edge subtree
    # FOUR times in the one final plan
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dir_e = edges.unionAll(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dx"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("dy"))
    j = dir_e.join(da, "a").join(db, "b")
    dec = "decimal(38,0)"
    s = j.agg(
        F.count(F.lit(1)).cast(dec).alias("m"),
        F.sum(F.col("dx").cast(dec) * F.col("dy")).alias("sxy"),
        F.sum("dx").cast(dec).alias("sx"),
        F.sum("dy").cast(dec).alias("sy"),
        F.sum(F.col("dx").cast(dec) * F.col("dx")).alias("sx2"),
        F.sum(F.col("dy").cast(dec) * F.col("dy")).alias("sy2"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("m") * F.col("sx2") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("m") * F.col("sy2") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return s.select(
        F.col("m").cast("long").alias("m_directed"),
        F.floor(1000000.0 * num / F.sqrt(vx * vy)).cast("long").alias(
            "r_e6"
        ),
    )


RELATIONAL_QUERIES["q198_degree_assortativity"] = q198_degree_assortativity
RELATIONAL_ORACLE["q198_degree_assortativity"] = (
    "WITH li AS ("
    "  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
    "edges AS ("
    "  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b "
    "  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey "
    "  WHERE x.l_partkey < y.l_partkey), "
    "deg AS ("
    "  SELECT node, COUNT(*) AS deg FROM ("
    "    SELECT a AS node FROM edges "
    "    UNION ALL SELECT b FROM edges) GROUP BY node), "
    "dir_e AS ("
    "  SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges), "
    "s AS ("
    "  SELECT COUNT(*)::HUGEINT AS m, "
    "    SUM(dx.deg::HUGEINT * dy.deg) AS sxy, "
    "    SUM(dx.deg)::HUGEINT AS sx, SUM(dy.deg)::HUGEINT AS sy, "
    "    SUM(dx.deg::HUGEINT * dx.deg) AS sx2, "
    "    SUM(dy.deg::HUGEINT * dy.deg) AS sy2 "
    "  FROM dir_e JOIN deg dx ON dir_e.a = dx.node "
    "  JOIN deg dy ON dir_e.b = dy.node) "
    "SELECT CAST(m AS BIGINT) AS m_directed, "
    "  CAST(FLOOR(1000000.0 * (m * sxy - sx * sy)::DOUBLE "
    "    / SQRT((m * sx2 - sx * sx)::DOUBLE "
    "           * (m * sy2 - sy * sy)::DOUBLE)) AS BIGINT) AS r_e6 "
    "FROM s"
)


def q199_cohens_kappa(spark, sf_dir):
    """Cohen's kappa — chance-corrected inter-rater agreement between
    two deterministic 3-class document raters (a length-based and a
    token-count-based quality classifier). THE agreement statistic of
    LLM-judge calibration (two judges / judge-vs-human on the same
    items); q187's Cramér's V measures association strength, kappa
    measures AGREEMENT on a shared label space — different diagonal.

    kappa = (p_o − p_e)/(1 − p_e) computed as one exact rational:
    (N·Σdiag − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k), every moment
    an integer; the single float op is the final FLOOR(1e6·x) divide
    (handles negative kappa where integer div truncation would differ
    between engines).

    Scale posture: one conditional-expression pass over documents into
    a 3×3 contingency aggregate (map-combinable, 9 cells); marginals,
    the diagonal, and the cross products are all algebra on the
    9-row cell table — broadcast scalars, no second corpus pass. The
    3-row marginal join carries a structural broadcast hint (bounded
    by the CLASS vocabulary — without it Catalyst's pre-AQE estimate
    scales with the corpus scan and plans a sort-merge join for 3
    rows, caught by the 100x audit)."""
    d = _t(spark, sf_dir, "documents")
    ntok = F.size(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda x: x != "",
        )
    )
    ca = (
        F.when(F.col("n_chars") < 200, 0)
        .when(F.col("n_chars") < 400, 1)
        .otherwise(2)
    )
    cb = F.when(ntok < 40, 0).when(ntok < 80, 1).otherwise(2)
    cells = d.select(ca.alias("ra"), cb.alias("rb")).groupBy(
        "ra", "rb"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cells.agg(
        F.sum("n").alias("n_docs"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("n")).otherwise(0))
        .alias("diag"),
    )
    rows = cells.groupBy("ra").agg(F.sum("n").alias("rn"))
    cols = cells.groupBy("rb").agg(F.sum("n").alias("cn"))
    pe = (
        rows.join(F.broadcast(cols), rows["ra"] == cols["rb"])
        .agg(F.sum(F.col("rn") * F.col("cn")).alias("pe_num"))
    )
    return (
        tot.crossJoin(F.broadcast(pe))
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("diag").cast("long").alias("diag"),
            F.col("pe_num").cast("long").alias("pe_num"),
            F.floor(
                1000000.0
                * (F.col("n_docs") * F.col("diag") - F.col("pe_num"))
                .cast("double")
                / (F.col("n_docs") * F.col("n_docs") - F.col("pe_num"))
                .cast("double")
            ).cast("long").alias("kappa_e6"),
        )
    )


RELATIONAL_QUERIES["q199_cohens_kappa"] = q199_cohens_kappa
RELATIONAL_ORACLE["q199_cohens_kappa"] = (
    "WITH r AS ("
    "  SELECT "
    "    CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 400 THEN 1 "
    "      ELSE 2 END AS ra, "
    "    CASE WHEN len(list_filter(string_split_regex(lower(trim(text)), "
    "      '\\s+'), x -> x <> '')) < 40 THEN 0 "
    "    WHEN len(list_filter(string_split_regex(lower(trim(text)), "
    "      '\\s+'), x -> x <> '')) < 80 THEN 1 ELSE 2 END AS rb "
    "  FROM documents), "
    "cells AS (SELECT ra, rb, COUNT(*) AS n FROM r GROUP BY ra, rb), "
    "tot AS ("
    "  SELECT SUM(n) AS n_docs, "
    "    SUM(CASE WHEN ra = rb THEN n ELSE 0 END) AS diag FROM cells), "
    "m AS ("
    "  SELECT SUM(rn * cn) AS pe_num FROM "
    "    (SELECT ra, SUM(n) AS rn FROM cells GROUP BY ra) a "
    "    JOIN (SELECT rb, SUM(n) AS cn FROM cells GROUP BY rb) b "
    "    ON a.ra = b.rb) "
    "SELECT CAST(n_docs AS BIGINT) AS n_docs, "
    "  CAST(diag AS BIGINT) AS diag, CAST(pe_num AS BIGINT) AS pe_num, "
    "  CAST(FLOOR(1000000.0 * (n_docs * diag - pe_num)::DOUBLE "
    "    / (n_docs * n_docs - pe_num)::DOUBLE) AS BIGINT) AS kappa_e6 "
    "FROM tot, m"
)


def q200_sql_scripting_search(spark, sf_dir):
    """SQL SCRIPTING (Spark 4 `BEGIN … END` compound statements,
    `spark.sql.scripting.enabled`): DECLARE session variables and an
    exponential-search WHILE loop — the procedural surface (migration
    target for T-SQL/PLpgSQL jobs) that pure relational gates cannot
    exercise. The loop doubles a price threshold until fewer than
    n DIV 10 orders exceed it; the result is the first power of two
    whose exceed-count drops below a tenth of the table.

    Round-13 optimization (guide §1.2): the loop's per-iteration
    aggregate no longer re-scans the fact table. ONE pass over orders
    computes the whole 40-row power spine — count above every
    candidate threshold 2^k as 40 conditional map-combinable sums plus
    the total — which is localCheckpoint-materialized (41 tiny rows)
    and registered as the view the WHILE loop probes. The scripting
    surface (DECLARE / WHILE / SET, imperative control flow between
    statements) is exercised unchanged, but each iteration now costs a
    sub-ms probe of a 40-row table instead of a fact-table aggregate:
    ~log2(threshold) × 2 fact scans → 1 fact scan (sf0.1: 5.4 s →
    ~0.9 s). tests/test_optimization_r13.py pins this result against
    the original scan-per-iteration scripting form. The integer
    comparisons use DIV so both engines agree exactly."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    o = _t(spark, sf_dir, "orders")
    spine_row = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(
                F.when(
                    F.col("o_totalprice") > F.lit(1 << k).cast("long"), 1
                ).otherwise(0)
            ).cast("long").alias(f"c{k}")
            for k in range(40)
        ],
    )
    stack_args = ", ".join(
        f"CAST({1 << k} AS BIGINT), c{k}" for k in range(40)
    )
    spine = spine_row.select(
        "n", F.expr(f"stack(40, {stack_args}) AS (thr, cnt)")
    ).localCheckpoint(eager=True)
    spine.createOrReplaceTempView("orders_script_pc")
    return spark.sql(
        """
        BEGIN
          DECLARE t BIGINT DEFAULT 1;
          DECLARE lim BIGINT DEFAULT 0;
          SET lim = (SELECT MAX(n) FROM orders_script_pc) DIV 10;
          WHILE (SELECT cnt FROM orders_script_pc WHERE thr = t)
                >= lim DO
            SET t = t * 2;
          END WHILE;
          SELECT t AS threshold,
                 (SELECT CAST(cnt AS BIGINT) FROM orders_script_pc
                  WHERE thr = t) AS n_above;
        END
        """
    )


RELATIONAL_QUERIES["q200_sql_scripting_search"] = q200_sql_scripting_search
RELATIONAL_ORACLE["q200_sql_scripting_search"] = (
    "WITH tot AS (SELECT COUNT(*) AS n FROM orders), "
    "ks AS (SELECT unnest(range(0, 40)) AS k), "
    "c AS ("
    "  SELECT ks.k, "
    "    (SELECT COUNT(*) FROM orders "
    "     WHERE o_totalprice > (1::BIGINT << ks.k)) AS cnt "
    "  FROM ks), "
    "sel AS ("
    "  SELECT MIN(k) AS k FROM c, tot WHERE c.cnt < tot.n // 10) "
    "SELECT CAST(1::BIGINT << sel.k AS BIGINT) AS threshold, "
    "  CAST(c.cnt AS BIGINT) AS n_above "
    "FROM sel JOIN c ON c.k = sel.k"
)


def q201_business_days(spark, sf_dir):
    """Order-to-ship lead time in BUSINESS DAYS (weekends excluded) —
    the closed-form calendar arithmetic every warehouse SLA report
    needs, with no UDF and no calendar-spine join: g(d) = 5·(days div
    7) + min(days mod 7 + 1, 5) counts business days from the epoch
    Monday (1970-01-05) through d, so bdays(d1 → d2] = g(d2) − g(d1)
    — two integer expressions per row, map-side only. Distribution
    emitted as (bdays, n_lines) — a support-bounded aggregate (lead
    times span days, not rows).

    Scale: one lineitem⋈orders equi-join on the order key (the fact-
    fact join AQE plans as SMJ at scale) + one map-combinable
    aggregate; the closed form replaces both a 7-row dow lookup join
    and the naive per-day explode."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    joined = li.join(o, "l_orderkey").select(
        F.datediff(
            F.to_date("l_shipdate"), F.to_date(F.lit("1970-01-05"))
        ).cast("long").alias("ds"),
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-05"))
        ).cast("long").alias("do_"),
    )
    # integer DIV throughout (the round-13 floor(float /) parity rule)
    bdays = F.expr(
        "(5 * (ds DIV 7) + LEAST(ds % 7 + 1, 5)) "
        "- (5 * (do_ DIV 7) + LEAST(do_ % 7 + 1, 5))"
    )
    return (
        joined.select(bdays.cast("long").alias("bdays"))
        .groupBy("bdays")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lines"))
    )


RELATIONAL_QUERIES["q201_business_days"] = q201_business_days
RELATIONAL_ORACLE["q201_business_days"] = (
    "WITH j AS ("
    "  SELECT CAST(l.l_shipdate AS DATE) - DATE '1970-01-05' AS ds, "
    "    CAST(o.o_orderdate AS DATE) - DATE '1970-01-05' AS do_ "
    "  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey), "
    "b AS ("
    "  SELECT (5 * (ds // 7) + LEAST(ds % 7 + 1, 5)) "
    "    - (5 * (do_ // 7) + LEAST(do_ % 7 + 1, 5)) AS bdays "
    "  FROM j) "
    "SELECT CAST(bdays AS BIGINT) AS bdays, COUNT(*)::BIGINT AS n_lines "
    "FROM b GROUP BY bdays"
)


#: community width for the modularity gate: part keys bucket into
#: communities of this size (deterministic partition of the node set)
MODULARITY_BUCKET = 25


def q202_modularity(spark, sf_dir):
    """Newman modularity Q of a node partition over the part
    co-purchase graph — the partition-QUALITY readout that closes the
    graph-analytics loop (q100 ranks, q106/q124 count structure,
    dedup_clusters_* PRODUCE partitions; nothing measured how good a
    partition is). Communities here are the deterministic
    ``l_partkey div MODULARITY_BUCKET`` buckets, so the oracle replays
    the exact same partition.

    Q = (4m·Σ_c e_c − Σ_c deg_c²) / (4m²) with e_c = intra-community
    edges, deg_c = total degree in c, m = |edges| — every moment an
    exact integer (DECIMAL(38,0) / HUGEINT for the squares), one final
    FLOOR(1e6·x) divide. Emits the component sums alongside so the
    score is auditable.

    Scale: the edge build is q106's; everything after is two
    aggregates over edges (intra flag is a map-side expression) and
    one over the node-degree table — no joins beyond the edge build
    itself."""
    # round-13: shared one-exchange edge builder + checkpoint (three
    # aggregate consumers reference the edge subtree in the final plan)
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    b = MODULARITY_BUCKET
    stats = edges.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("m"),
        F.sum(
            F.when(
                F.expr(f"a DIV {b}") == F.expr(f"b DIV {b}"), 1
            ).otherwise(0)
        ).cast("decimal(38,0)").alias("intra"),
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    degc = (
        deg.groupBy(F.expr(f"node DIV {b}").alias("comm"))
        .agg(F.sum("deg").cast("decimal(38,0)").alias("dc"))
        .agg(F.sum(F.col("dc") * F.col("dc")).alias("sum_dc2"))
    )
    return (
        stats.crossJoin(F.broadcast(degc))
        .select(
            F.col("m").cast("long").alias("m_edges"),
            F.col("intra").cast("long").alias("intra_edges"),
            F.col("sum_dc2").cast("long").alias("sum_deg2"),
            F.floor(
                1000000.0
                * (
                    F.lit(4) * F.col("m") * F.col("intra")
                    - F.col("sum_dc2")
                ).cast("double")
                / (F.lit(4) * F.col("m") * F.col("m")).cast("double")
            ).cast("long").alias("q_e6"),
        )
    )


RELATIONAL_QUERIES["q202_modularity"] = q202_modularity
RELATIONAL_ORACLE["q202_modularity"] = (
    "WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
    "edges AS ("
    "  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b "
    "  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey "
    "  WHERE x.l_partkey < y.l_partkey), "
    "s AS ("
    "  SELECT COUNT(*)::HUGEINT AS m, "
    f"    SUM(CASE WHEN a // {MODULARITY_BUCKET} = b // "
    f"{MODULARITY_BUCKET} THEN 1 ELSE 0 END)::HUGEINT AS intra "
    "  FROM edges), "
    "deg AS ("
    "  SELECT node, COUNT(*) AS deg FROM ("
    "    SELECT a AS node FROM edges UNION ALL SELECT b FROM edges) "
    "  GROUP BY node), "
    "dc AS ("
    f"  SELECT node // {MODULARITY_BUCKET} AS comm, "
    "    SUM(deg)::HUGEINT AS d FROM deg GROUP BY comm), "
    "d2 AS (SELECT SUM(d * d) AS sum_dc2 FROM dc) "
    "SELECT CAST(m AS BIGINT) AS m_edges, "
    "  CAST(intra AS BIGINT) AS intra_edges, "
    "  CAST(sum_dc2 AS BIGINT) AS sum_deg2, "
    "  CAST(FLOOR(1000000.0 * (4 * m * intra - sum_dc2)::DOUBLE "
    "    / (4 * m * m)::DOUBLE) AS BIGINT) AS q_e6 "
    "FROM s, d2"
)


def q203_try_arithmetic(spark, sf_dir):
    """ANSI-mode safety surface: the `try_` function family — under
    Spark 4's ANSI default, overflow/÷0/bad-index THROW (the pass@k
    overflow was caught exactly this way), and `try_add/try_multiply/
    try_divide/try_element_at` are the per-expression opt-outs that
    return NULL instead, without giving up ANSI for the whole session.
    Each column mixes NULL and non-NULL outcomes deterministically by
    key arithmetic; the oracle replays the NULL rule with HUGEINT
    range checks (DuckDB has no try_ functions — the CASE forms ARE
    the semantics being pinned).

    Map-only expressions over orders; one pass, no shuffle beyond the
    final aggregate-free projection."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("long")
    big = F.lit(9223372036854775807).cast("long")
    return o.select(
        "o_orderkey",
        # overflows for every key > 0 at odd parity, exact otherwise
        F.try_add(
            (k % 2) * F.lit(9223372036854775800).cast("long"), k
        ).alias("t_add"),
        # overflows once |k * 3037000500| passes 2^63
        F.try_multiply(k * F.lit(1000), F.lit(3037000500).cast("long"))
        .alias("t_mul"),
        F.try_subtract(-big, (k % 2)).alias("t_sub"),
        # denominator cycles -1, 0, 1: the 0 lane must be NULL
        F.try_divide(F.col("o_totalprice"), (k % 3) - 1).alias("t_div"),
        # index cycles 1..4 over a 2-element array: 3 and 4 are NULL
        # (index 0 is invalid USAGE — it throws even under try_, so the
        # cycle starts at 1; the out-of-bounds lanes are the runtime
        # misses try_element_at exists for)
        F.try_element_at(
            F.array(F.lit("a"), F.lit("b")), ((k % 4) + 1).cast("int")
        ).alias("t_elem"),
    )


RELATIONAL_QUERIES["q203_try_arithmetic"] = q203_try_arithmetic
RELATIONAL_ORACLE["q203_try_arithmetic"] = (
    "WITH o AS (SELECT o_orderkey, CAST(o_orderkey AS BIGINT) AS k, "
    "  o_totalprice FROM orders), "
    "c AS ("
    "  SELECT o_orderkey, "
    "    (k % 2) * 9223372036854775800::HUGEINT + k AS h_add, "
    "    k::HUGEINT * 1000 * 3037000500 AS h_mul, "
    "    -9223372036854775807::HUGEINT - (k % 2) AS h_sub, "
    "    o_totalprice, k "
    "  FROM o) "
    "SELECT o_orderkey, "
    "  CASE WHEN h_add BETWEEN -9223372036854775808::HUGEINT "
    "    AND 9223372036854775807::HUGEINT THEN CAST(h_add AS BIGINT) "
    "    END AS t_add, "
    "  CASE WHEN h_mul BETWEEN -9223372036854775808::HUGEINT "
    "    AND 9223372036854775807::HUGEINT THEN CAST(h_mul AS BIGINT) "
    "    END AS t_mul, "
    "  CASE WHEN h_sub BETWEEN -9223372036854775808::HUGEINT "
    "    AND 9223372036854775807::HUGEINT THEN CAST(h_sub AS BIGINT) "
    "    END AS t_sub, "
    "  CASE WHEN (k % 3) - 1 = 0 THEN NULL "
    "    ELSE o_totalprice / ((k % 3) - 1) END AS t_div, "
    "  CASE (k % 4) + 1 WHEN 1 THEN 'a' WHEN 2 THEN 'b' END AS t_elem "
    "FROM c"
)


def q204_mase_forecast_error(spark, sf_dir):
    """MASE (mean absolute SCALED error, Hyndman-Koehler 2006) of the
    seasonal-naive forecaster on the daily revenue series — the
    forecast-eval yardstick: a lag-7 "same day last week" forecast is
    useful exactly when its MAE beats the lag-1 random-walk MAE that
    scales the denominator (MASE < 1e6 here). Everything is exact
    integer cents: the two absolute-error sums cross-multiply with
    their term counts instead of dividing into means, so mase_e6 =
    (1e6·Σ|x−x₋₇|·(n−1)) div (Σ|x−x₋₁|·(n−7)) is ONE integer
    division. Emits the component sums for auditability.

    Scale shape: orders collapse to the daily spine FIRST (one
    map-combinable aggregate; the spine is calendar-bounded), then two
    LAG windows over the tiny spine and a one-row reduce — the q174/
    q130 collapse-then-window discipline; fact size never reaches a
    window."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .alias("rev_c")
        )
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day", "rev_c",
        F.lag("rev_c", 1).over(w).alias("l1"),
        F.lag("rev_c", 7).over(w).alias("l7"),
    )
    s = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.abs(F.col("rev_c") - F.col("l7"))).cast("long")
        .alias("sum_err7"),
        F.sum(F.abs(F.col("rev_c") - F.col("l1"))).cast("long")
        .alias("sum_err1"),
    )
    # the 1e6-scaled cross-product overflows int64 (ANSI threw at
    # sf0.001) — apply the one-float-op discipline instead: both
    # products stay exactly representable (< 2^53) far past 100x, and
    # a single double divide + floor is engine-identical
    return s.select(
        "n_days", "sum_err7", "sum_err1",
        F.floor(
            1000000.0
            * (F.col("sum_err7") * (F.col("n_days") - 1)).cast("double")
            / (F.col("sum_err1") * (F.col("n_days") - 7)).cast("double")
        ).cast("long").alias("mase_e6"),
    )


RELATIONAL_QUERIES["q204_mase_forecast_error"] = q204_mase_forecast_error
RELATIONAL_ORACLE["q204_mase_forecast_error"] = (
    "WITH daily AS ("
    "  SELECT CAST(o_orderdate AS DATE) AS day, "
    "    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "      AS rev_c "
    "  FROM orders GROUP BY day), "
    "lagged AS ("
    "  SELECT rev_c, LAG(rev_c, 1) OVER (ORDER BY day) AS l1, "
    "    LAG(rev_c, 7) OVER (ORDER BY day) AS l7 "
    "  FROM daily), "
    "s AS ("
    "  SELECT COUNT(*) AS n_days, "
    "    SUM(ABS(rev_c - l7)) AS sum_err7, "
    "    SUM(ABS(rev_c - l1)) AS sum_err1 "
    "  FROM lagged) "
    "SELECT CAST(n_days AS BIGINT) AS n_days, "
    "  CAST(sum_err7 AS BIGINT) AS sum_err7, "
    "  CAST(sum_err1 AS BIGINT) AS sum_err1, "
    "  CAST(FLOOR(1000000.0 * (sum_err7 * (n_days - 1))::DOUBLE "
    "    / (sum_err1 * (n_days - 7))::DOUBLE) AS BIGINT) AS mase_e6 "
    "FROM s"
)


#: candidate price thresholds (cents) for the split-scoring gate —
#: fixed literals spanning the fixture's o_totalprice range
GINI_THRESHOLDS = (5_000_00, 10_000_00, 20_000_00, 30_000_00, 40_000_00)


def q205_gini_split_scores(spark, sf_dir):
    """Decision-tree split scoring — weighted Gini impurity of the
    children induced by each candidate threshold on o_totalprice,
    predicting o_orderstatus: THE inner loop of tree/GBM training
    expressed as pure dataflow (XGBoost/LightGBM's histogram pass is
    exactly this shape), and the ML-primitive family's first member.

    Exact integers end to end: per (threshold, side) the class counts
    c_k give side impurity (n_s² − Σc_k²)/n_s²; the n-weighted sum
    over both sides has closed form
      [(nL² − ΣcL²)·nR + (nR² − ΣcR²)·nL] / (n·nL·nR),
    every moment a DECIMAL(38,0)/HUGEINT product and ONE final
    FLOOR(1e6·x) double divide. The best split is the min impurity —
    left to the consumer (all candidate rows are emitted, the
    histogram-pass contract).

    Scale: ONE scan of orders exploded ×|thresholds| map-side (the
    q136 sketch-explode shape), one (threshold, side, class) hash
    aggregate — bounded by |thresholds|·2·|classes| cells — and
    algebra on that tiny cell table."""
    o = _t(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderstatus").alias("cls"),
    )
    th = F.explode(
        F.array(*[F.lit(int(t)).cast("long") for t in GINI_THRESHOLDS])
    ).alias("thr")
    cells = (
        o.select("cents", "cls", th)
        .select(
            "thr", "cls",
            F.when(F.col("cents") <= F.col("thr"), 1).otherwise(0)
            .alias("side"),
        )
        .groupBy("thr", "side", "cls")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    sides = cells.groupBy("thr", "side").agg(
        F.sum("n").cast("decimal(38,0)").alias("ns"),
        F.sum(F.col("n") * F.col("n")).cast("decimal(38,0)").alias("sq"),
    )
    l = sides.where(F.col("side") == 1).select(
        "thr", F.col("ns").alias("nl"), F.col("sq").alias("sql_")
    )
    r = sides.where(F.col("side") == 0).select(
        "thr", F.col("ns").alias("nr"), F.col("sq").alias("sqr_")
    )
    # the sides table is bounded by |thresholds| rows — structural
    # broadcast hint (the q199 marginal-join case: pre-AQE estimates
    # scale with the fact scan and would plan an SMJ for 5 rows)
    j = l.join(F.broadcast(r), "thr")
    num = (
        (F.col("nl") * F.col("nl") - F.col("sql_")) * F.col("nr")
        + (F.col("nr") * F.col("nr") - F.col("sqr_")) * F.col("nl")
    ).cast("double")
    den = (
        (F.col("nl") + F.col("nr")) * F.col("nl") * F.col("nr")
    ).cast("double")
    return j.select(
        F.col("thr").cast("long").alias("thr"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("nr").cast("long").alias("n_right"),
        F.floor(1000000.0 * num / den).cast("long").alias(
            "weighted_gini_e6"
        ),
    )


RELATIONAL_QUERIES["q205_gini_split_scores"] = q205_gini_split_scores
RELATIONAL_ORACLE["q205_gini_split_scores"] = (
    "WITH o AS ("
    "  SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents, "
    "    o_orderstatus AS cls FROM orders), "
    "th AS (SELECT unnest(["
    + ", ".join(str(int(t)) for t in GINI_THRESHOLDS)
    + "]) AS thr), "
    "cells AS ("
    "  SELECT th.thr, CASE WHEN o.cents <= th.thr THEN 1 ELSE 0 END "
    "    AS side, o.cls, COUNT(*) AS n "
    "  FROM o, th GROUP BY 1, 2, 3), "
    "sides AS ("
    "  SELECT thr, side, SUM(n)::HUGEINT AS ns, "
    "    SUM(n::HUGEINT * n) AS sq "
    "  FROM cells GROUP BY thr, side), "
    "j AS ("
    "  SELECT l.thr, l.ns AS nl, l.sq AS sql_, r.ns AS nr, "
    "    r.sq AS sqr_ "
    "  FROM sides l JOIN sides r ON l.thr = r.thr "
    "  WHERE l.side = 1 AND r.side = 0) "
    "SELECT CAST(thr AS BIGINT) AS thr, CAST(nl AS BIGINT) AS n_left, "
    "  CAST(nr AS BIGINT) AS n_right, "
    "  CAST(FLOOR(1000000.0 * ((nl * nl - sql_) * nr "
    "    + (nr * nr - sqr_) * nl)::DOUBLE "
    "    / ((nl + nr) * nl * nr)::DOUBLE) AS BIGINT) "
    "    AS weighted_gini_e6 "
    "FROM j"
)
