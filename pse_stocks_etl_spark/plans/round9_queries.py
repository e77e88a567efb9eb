"""Round-9 queries, part 1: the classic TPC-H subquery/decorrelation
shapes the engine had not yet covered — each one exercises a distinct
Catalyst optimization pattern:

- Q13 analog  (`customer_order_distribution`) — outer-join + double
  aggregation (distribution of per-customer counts).
- Q17 analog  (`small_quantity_revenue`) — correlated scalar subquery
  (per-part average) decorrelated into an aggregate + re-join.
- Q22 analog  (`idle_rich_customers`) — global scalar subquery +
  NOT EXISTS anti-join.
- Q19 analog  (`brand_bracket_revenue`) — disjunctive (OR-of-ANDs)
  predicate pushed into one fact scan.
- Q4 analog   (`late_ship_priority_counts`) — EXISTS semi-join with a
  non-equi correlated condition.
- Q15 analog  (`top_revenue_suppliers`) — aggregate + join on the
  scalar max of that same aggregate.
- Q11 analog  (`part_revenue_concentration`) — per-group sum HAVING a
  share of the global sum (scalar broadcast).

Determinism rules are repo-wide (functions/money.py): money sums go
through integer cents / rev10k BIGINTs (order-free), quantities sum as
BIGINTs, and every ratio is a single IEEE division of exactly-equal
integers on both engines — so value hashes match DuckDB bit-for-bit.

The testdata schema lacks TPC-H's l_commitdate / l_receiptdate /
c_phone / partsupp, so the analog predicates use the columns that
exist (shipdate-vs-orderdate lateness, acctbal percentiles, lineitem
revenue per part); the JOIN/SUBQUERY shape — which is what Catalyst
optimizes — is the faithful part.

Reference parity: the reference engine (pandas sync loop,
src/etl/postgres_sync.py) has no subquery surface; these are the §2.5/§2.8
extension analytics a warehouse user runs on top (SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents, sql_cents
from ..sources.catalog import load_table
from .registry import REGISTRY, register

# Q4 analog: a lineitem is "late" when it ships this many days after
# the order date (no l_commitdate in the testdata).
LATE_SHIP_DAYS = 75

# Q17 analog: "small" quantity = below this fraction of the part's
# average lineitem quantity.
SMALL_QTY_FRACTION = 0.5

# Q11 analog: parts whose revenue exceeds this fraction of total
# revenue are "concentrated".
CONCENTRATION_PPM = 100  # parts-per-million of global revenue

# Q22 analog: a customer is idle when they placed no order on/after
# this date (~the last 7 months of the 1995-2001 order history; every
# testdata customer has SOME order, so plain non-existence is empty).
IDLE_SINCE = "2001-01-01"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev10k(price: str, disc: str) -> Column:
    return cents(F.col(price)) * (100 - cents(F.col(disc)))


def _sql_rev10k(price: str, disc: str) -> str:
    return f"({sql_cents(price)} * (100 - {sql_cents(disc)}))"


# --------------------------------------------------------------------------
# TPC-H Q13 analog: distribution of orders-per-customer
# --------------------------------------------------------------------------
@register(
    "customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey,
             COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT n_orders, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY n_orders
    """,
    tags=("J1", "A5", "tpch-q13"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed 0, 1, 2, ... non-urgent
    orders. LEFT OUTER join (customers with no orders must appear in
    the 0 bucket — an inner join would drop them) followed by two
    aggregations.

    Scale: the join and first group-by share the c_custkey/o_custkey
    key, so Catalyst reuses one hash-partitioning for both — orders
    shuffles once. The second aggregate runs on one-row-per-customer
    data with map-side combine into ~tens of n_orders groups; its
    exchange is tiny. The filter on o_orderpriority is pushed to the
    orders scan (it must sit in the JOIN condition, not a WHERE, to
    preserve the outer-join zero bucket)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# TPC-H Q17 analog: revenue from small-quantity lineitems of one brand
# --------------------------------------------------------------------------
@register(
    "small_quantity_revenue",
    oracle=f"""
    WITH brand_parts AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'
    ),
    part_qty AS (
      SELECT li.l_partkey,
             CAST(SUM(CAST(li.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             COUNT(*) AS n_li
      FROM lineitem li JOIN brand_parts bp ON li.l_partkey = bp.p_partkey
      GROUP BY li.l_partkey
    )
    SELECT (SUM({sql_cents('li.l_extendedprice')}) / 100.0) AS small_qty_revenue,
           COUNT(*) AS n_small
    FROM lineitem li
    JOIN part_qty pq ON li.l_partkey = pq.l_partkey
    WHERE li.l_quantity < {SMALL_QTY_FRACTION} * (pq.sum_qty * 1.0 / pq.n_li)
    """,
    tags=("J5", "A1", "tpch-q17", "decorrelation"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: total revenue from lineitems of BrandA parts whose
    quantity is below half the part's average lineitem quantity. The
    textbook correlated scalar subquery (`WHERE l_quantity < (SELECT
    0.5*avg(l_quantity) ... WHERE l_partkey = p_partkey)`) is
    decorrelated by hand into a per-part aggregate re-joined to the
    fact — the same rewrite Catalyst's DecorrelateInnerQuery performs,
    stated explicitly so the plan is deterministic.

    Scale: the brand filter cuts part to ~1/25 (pushed to the part
    scan); that key set and the per-part aggregate output (~8k
    parts/SF) both SCALE WITH SF, so neither carries a forced
    broadcast hint — AQE sizes them at runtime (broadcast while they
    fit, shuffle past the threshold; r7 VERDICT item 3). The per-part
    (sum, count) aggregate is map-side combinable. avg is one
    IEEE division of exact BIGINT sum/count on both engines, and the
    threshold compare `qty < f*avg` is evaluated identically."""
    li = _t(spark, sf_dir, "lineitem")
    bp = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    li_b = li.join(bp, li.l_partkey == bp.p_partkey).drop("p_partkey")
    part_qty = li_b.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count("*").alias("n_li"),
    )
    avg_qty = F.col("sum_qty") * 1.0 / F.col("n_li")
    return (
        li_b.join(
            part_qty.withColumnRenamed("l_partkey", "pq_partkey"),
            F.col("l_partkey") == F.col("pq_partkey"),
        )
        .filter(F.col("l_quantity") < SMALL_QTY_FRACTION * avg_qty)
        .agg(
            (F.sum(cents(F.col("l_extendedprice"))) / 100.0).alias("small_qty_revenue"),
            F.count("*").alias("n_small"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q22 analog: above-average-balance customers with no orders
# --------------------------------------------------------------------------
@register(
    "idle_rich_customers",
    oracle=f"""
    WITH bal AS (
      SELECT SUM({sql_cents('c_acctbal')}) AS s, COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_cust,
           (SUM({sql_cents('c.c_acctbal')}) / 100.0) AS total_bal
    FROM customer c, bal
    WHERE {sql_cents('c.c_acctbal')} * bal.n > bal.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '{IDLE_SINCE}')
    GROUP BY c.c_mktsegment
    """,
    tags=("J3", "A1", "tpch-q22", "anti-join"),
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: customers whose balance beats the positive-balance
    average but who placed no order since IDLE_SINCE (every testdata
    customer has SOME order, so idleness is recency-scoped — same
    NOT EXISTS shape), grouped by market segment. Global scalar
    subquery + anti-join.

    Scale: the scalar (sum, count) aggregate collapses to one row and
    is CROSS-broadcast (a 1-row broadcast nested loop — free); the
    above-average test is the exact integer cross-multiplication
    `cents(bal)*n > sum_cents` — no float average, so both engines
    agree bit-for-bit. The anti-join streams orders' o_custkey only
    (column pruning) and hash-partitions on custkey; with AQE it turns
    broadcast when the filtered customer side is small. No
    per-customer correlated probe survives — both subqueries are
    decorrelated into joins."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.to_date("o_orderdate") >= F.lit(IDLE_SINCE))
        .select("o_custkey")
    )
    bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.sum(cents(F.col("c_acctbal"))).alias("s"), F.count("*").alias("n"))
    )
    rich = (
        c.crossJoin(F.broadcast(bal))
        .filter(cents(F.col("c_acctbal")) * F.col("n") > F.col("s"))
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        (F.sum(cents(F.col("c_acctbal"))) / 100.0).alias("total_bal"),
    )


# --------------------------------------------------------------------------
# TPC-H Q19 analog: disjunctive bracket predicate revenue
# --------------------------------------------------------------------------
@register(
    "brand_bracket_revenue",
    oracle=f"""
    SELECT (SUM({_sql_rev10k('li.l_extendedprice', 'li.l_discount')}) / 10000.0)
             AS bracket_revenue,
           COUNT(*) AS n_li
    FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND li.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 30
           AND li.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 50
           AND li.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("J5", "A1", "tpch-q19", "pushdown"),
)
def brand_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue matching any of three (brand, size-range,
    quantity-range) brackets — the canonical OR-of-ANDs predicate.

    Scale: Catalyst CNF-converts the disjunction and pushes the
    single-table residues to each scan — `p_brand IN (A,B,C) AND
    p_size BETWEEN 1 AND 50` prunes part pages, `l_quantity BETWEEN 1
    AND 30` prunes lineitem pages — before the join (AQE-sized:
    part scales with sf, so the hint is left to the planner)
    evaluates the cross-table brackets. Without CNF pushdown this scan
    reads everything; `.explain` shows PushedFilters on both sides.
    One conditional aggregate, exact rev10k BIGINTs."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    bracket = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(bracket).agg(
        (F.sum(_rev10k("l_extendedprice", "l_discount")) / 10000.0).alias(
            "bracket_revenue"
        ),
        F.count("*").alias("n_li"),
    )


# --------------------------------------------------------------------------
# TPC-H Q4 analog: orders with a late-shipping lineitem, by priority
# --------------------------------------------------------------------------
@register(
    "late_ship_priority_counts",
    oracle=f"""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem li
      WHERE li.l_orderkey = o.o_orderkey
        AND li.l_shipdate > o.o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
    )
    GROUP BY o.o_orderpriority
    """,
    tags=("J3", "A5", "tpch-q4", "semi-join"),
)
def late_ship_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: count of orders, per priority, having at least one
    lineitem shipped more than LATE_SHIP_DAYS after the order date
    (the testdata has no l_commitdate; shipdate-vs-orderdate lateness
    is the same correlated non-equi EXISTS shape).

    Scale: LEFT SEMI join on l_orderkey = o_orderkey with the non-equi
    lateness residual evaluated during the probe — each order emits at
    most once no matter how many late lineitems it has (a plain join +
    distinct would shuffle the duplicates first). Both sides
    hash-partition on orderkey; lineitem is column-pruned to
    (l_orderkey, l_shipdate). The priority group-by then aggregates
    one row per order into 5 groups, map-side."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # Full-timestamp comparison, token-identical to the oracle's
    # `l_shipdate > o_orderdate + INTERVAL n DAY` — a DATE-truncated
    # Spark predicate would silently diverge if the testdata ever grew
    # intra-day shipment times (ADVICE r5).
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr(f"INTERVAL {LATE_SHIP_DAYS} DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


# --------------------------------------------------------------------------
# TPC-H Q15 analog: suppliers achieving the maximum revenue
# --------------------------------------------------------------------------
@register(
    "top_revenue_suppliers",
    oracle=f"""
    WITH srev AS (
      SELECT li.l_suppkey,
             SUM({_sql_rev10k('li.l_extendedprice', 'li.l_discount')}) AS rev10k
      FROM lineitem li
      GROUP BY li.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, (srev.rev10k / 10000.0) AS total_revenue
    FROM srev
    JOIN (SELECT MAX(rev10k) AS m FROM srev) mx ON srev.rev10k = mx.m
    JOIN supplier s ON s.s_suppkey = srev.l_suppkey
    """,
    tags=("J5", "A4", "tpch-q15"),
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) whose lineitem revenue equals the
    global maximum — aggregate, then join the aggregate against its
    own scalar max (ties must all surface, so this is NOT a LIMIT 1).

    Scale: one map-side-combinable shuffle builds per-supplier revenue
    (~10k rows/SF); the scalar max is a 1-row broadcast; the equality
    filter then keeps ~1 row, and AQE broadcasts that tiny side into
    the supplier join at runtime (supplier scales with sf, so the
    build-side choice is the planner's, not a hint). Revenue is an
    exact rev10k BIGINT, so "equals the max" is an integer equality —
    no float-tie ambiguity between engines."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    srev = li.groupBy("l_suppkey").agg(
        F.sum(_rev10k("l_extendedprice", "l_discount")).alias("rev10k")
    )
    mx = srev.agg(F.max("rev10k").alias("m"))
    top = srev.crossJoin(F.broadcast(mx)).filter(F.col("rev10k") == F.col("m"))
    return (
        s.join(F.broadcast(top), s.s_suppkey == top.l_suppkey)
        .select(
            "s_suppkey", "s_name", (F.col("rev10k") / 10000.0).alias("total_revenue")
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q11 analog: parts holding an outsized share of global revenue
# --------------------------------------------------------------------------
@register(
    "part_revenue_concentration",
    oracle=f"""
    WITH prev AS (
      SELECT li.l_partkey,
             SUM({_sql_rev10k('li.l_extendedprice', 'li.l_discount')}) AS rev10k
      FROM lineitem li
      GROUP BY li.l_partkey
    ),
    tot AS (SELECT SUM(rev10k) AS t FROM prev)
    SELECT prev.l_partkey AS p_partkey,
           (prev.rev10k / 10000.0) AS part_revenue,
           (prev.rev10k * 1.0 / tot.t) AS revenue_share
    FROM prev, tot
    WHERE prev.rev10k * 1000000 > tot.t * {CONCENTRATION_PPM}
    """,
    tags=("A1", "tpch-q11", "having-share"),
)
def part_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose revenue exceeds CONCENTRATION_PPM
    parts-per-million of total revenue — a group-sum HAVING a share of
    the global sum of the same expression.

    Scale: ONE map-side-combinable shuffle builds per-part revenue;
    the global total re-aggregates that result (no second fact scan —
    the textbook Q11 plan computes both from one pass) and broadcasts
    as a single row. The share threshold is the exact integer
    cross-multiplication `rev*1e6 > total*ppm` (no float compare);
    the reported share is one IEEE division per surviving row."""
    li = _t(spark, sf_dir, "lineitem")
    prev = li.groupBy("l_partkey").agg(
        F.sum(_rev10k("l_extendedprice", "l_discount")).alias("rev10k")
    )
    tot = prev.agg(F.sum("rev10k").alias("t"))
    return (
        prev.crossJoin(F.broadcast(tot))
        .filter(F.col("rev10k") * 1000000 > F.col("t") * CONCENTRATION_PPM)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("rev10k") / 10000.0).alias("part_revenue"),
            (F.col("rev10k") * 1.0 / F.col("t")).alias("revenue_share"),
        )
    )


# ==========================================================================
# Part 2: Q8 / Q21 shapes, the IVF-PQ serving path, and a hashed-feature
# linear quality classifier (fasttext-style scoring, pure SQL).
# ==========================================================================

# Q8 analog: market-share region and the supplier nation being tracked.
SHARE_REGION = "ASIA"
SHARE_NATION = "NATION_2"


# --------------------------------------------------------------------------
# TPC-H Q8 analog: one nation's supplier market share inside a region
# --------------------------------------------------------------------------
@register(
    "regional_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           (SUM(CASE WHEN ns.n_name = '{SHARE_NATION}'
                     THEN {_sql_rev10k('li.l_extendedprice', 'li.l_discount')}
                     ELSE 0 END) * 1.0
            / SUM({_sql_rev10k('li.l_extendedprice', 'li.l_discount')})) AS mkt_share,
           (SUM({_sql_rev10k('li.l_extendedprice', 'li.l_discount')}) / 10000.0)
             AS region_revenue
    FROM lineitem li
    JOIN orders o   ON li.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN region r   ON nc.n_regionkey = r.r_regionkey AND r.r_name = '{SHARE_REGION}'
    JOIN supplier s ON li.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    GROUP BY o_year
    """,
    tags=("J5", "A1", "tpch-q8"),
)
def regional_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: of all revenue shipped to SHARE_REGION customers, the
    share supplied by SHARE_NATION suppliers, per order year — the
    deepest join tree in the TPC-H suite (fact + 5 dimension hops on
    both the customer and supplier sides).

    Scale: the nation/region hops carry explicit broadcast hints
    (bounded at 25/5 rows at any sf); the customer and supplier sides
    scale with sf (customer is 150k rows/SF, region-pruned to 1/5),
    so their joins are AQE-sized — broadcast while small, shuffle
    past the threshold. The always-shuffled join is
    lineitem-orders on orderkey (bucketing both by orderkey makes it
    shuffle-free, tests/test_bucketing.py pattern). Conditional
    rev10k sums keep the share an exact-integer ratio evaluated once
    per year group."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nc = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == SHARE_REGION)
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    region_cust = (
        c.join(F.broadcast(nc), c.c_nationkey == nc.n_nationkey)
        .join(F.broadcast(r), nc.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    rev = _rev10k("l_extendedprice", "l_discount")
    nation_rev = F.when(F.col("sn_name") == SHARE_NATION, rev).otherwise(F.lit(0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(region_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year(F.to_date("o_orderdate")).cast("long").alias("o_year"))
        .agg(
            (F.sum(nation_rev) * 1.0 / F.sum(rev)).alias("mkt_share"),
            (F.sum(rev) / 10000.0).alias("region_revenue"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q21 analog: the sole late supplier in multi-supplier orders
# --------------------------------------------------------------------------
@register(
    "sole_late_supplier_orders",
    oracle=f"""
    WITH per_os AS (
      SELECT li.l_orderkey, li.l_suppkey,
             MAX(CASE WHEN li.l_shipdate > o.o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey
      GROUP BY li.l_orderkey, li.l_suppkey
    ),
    per_o AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
      FROM per_os GROUP BY l_orderkey
    )
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
    FROM per_os
    JOIN per_o USING (l_orderkey)
    JOIN supplier s ON s.s_suppkey = per_os.l_suppkey
    WHERE per_os.late = 1 AND per_o.n_supp >= 2 AND per_o.n_late = 1
    GROUP BY s.s_suppkey, s.s_name
    """,
    tags=("J3", "A5", "tpch-q21", "semi-anti"),
)
def sole_late_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the ONLY late supplier in orders
    involving at least two suppliers (shipdate-vs-orderdate lateness —
    the testdata has no receipt/commit dates). The textbook form is an
    EXISTS (another supplier in the order) + NOT EXISTS (another LATE
    supplier) pair; both correlated subqueries decorrelate into ONE
    per-order aggregate — stated explicitly so the plan computes each
    order's supplier/late counts once instead of probing twice.

    Scale: lineitem joins orders on orderkey (the one big shuffle;
    bucketed tables make it shuffle-free), then the (orderkey,
    suppkey) aggregate shrinks to one row per order-supplier. The
    per-order supplier/late counts come from a WINDOW over l_orderkey
    on that aggregate — NOT a self-join back to a second per-order
    aggregate, which re-shuffled the big frame twice and measured
    8.6x wall at 8x orders+lineitem (the window form re-sorts within
    one repartition of the already-shrunk frame). Supplier dim is
    broadcast at the end."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # Timestamp-granular lateness, matching the oracle's INTERVAL
    # comparison by construction (ADVICE r5: a to_date() truncation
    # here only agreed because testdata timestamps are all midnight).
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_SHIP_DAYS} DAY"),
        F.lit(1),
    ).otherwise(F.lit(0))
    per_os = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    culprit = (
        per_os.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        culprit.join(s, culprit.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --------------------------------------------------------------------------
# IVF-PQ: the complete ANN serving path (coarse cells -> PQ codes -> ADC)
# --------------------------------------------------------------------------
def ivf_assign_frame(vectors: DataFrame, centroid_src: DataFrame) -> DataFrame:
    """(vec_id, cell): closed-form nearest-centroid cell assignment,
    shared by emb_ann_ivfpq and the incremental index build
    (round10_queries.emb_ann_ivfpq_increment — the increment must
    assign new vectors against the SAME frozen centroids, so the
    formula lives in exactly one place).

    Centroid table -> literals, ONCE, driver-side (16 rows, bounded —
    exactly what a trained IVF broadcasts after k-means). Corpus cell
    assignment is then a PER-ROW argmax expression: 16 inline cosine
    folds + array_position(max) — ZERO shuffle. The crossJoin +
    top-k-window form exploded the corpus 16x and sorted 8.2M rows at
    x64 embeddings (measured 40s end-to-end; this form: see SCALE.md).
    array_position returns the FIRST max index and the array is in
    cid-ascending order, so ties land on the smallest cid — the same
    (ccos DESC, cid ASC) rule the oracle's row_number spells. The
    literal doubles are bit-exact round-trips of the stored values,
    and the inline dot() folds left-to-right like the join form, so
    every rounded cosine is unchanged."""
    from .llm_queries import IVF_CENTROID_IDS

    cent_rows = sorted(
        centroid_src.filter(F.col("vec_id").isin(*IVF_CENTROID_IDS)).collect(),
        key=lambda r: r.vec_id,
    )
    if not cent_rows:
        # Empty corpus → no centroid rows → F.array() below would be
        # untyped (NULL_TYPE analysis error). No centroids means no
        # cells: every (nonexistent) vector maps to a NULL cell, and
        # the typed empty frame keeps the output schema stable
        # (tests/test_empty_input_parity.py).
        return vectors.select("vec_id", F.lit(None).cast("long").alias("cell"))

    def py_norm(vec: list[float]) -> float:
        # Python floats ARE C doubles: this left-to-right accumulate is
        # bit-identical to Spark's aggregate fold in norm(), so the
        # precomputed centroid norm multiplies exactly like the
        # join-form's norm(cvec) and every rounded cosine is unchanged.
        import math

        acc = 0.0
        for x in vec:
            acc = acc + float(x) * float(x)
        return math.sqrt(acc)

    nv = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    withn = vectors.withColumn("nv", nv)
    ccos = F.array(
        *[
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("v"),
                        F.array(*[F.lit(float(x)) for x in r.v]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (F.col("nv") * F.lit(py_norm(list(r.v)))),
                6,
            )
            for r in cent_rows
        ]
    )
    cid_arr = F.array(*[F.lit(int(r.vec_id)) for r in cent_rows])
    return withn.select(
        "vec_id",
        F.element_at(cid_arr, F.array_position(ccos, F.array_max(ccos)).cast("int"))
        .alias("cell"),
    )


@register(
    "emb_ann_ivfpq",
    oracle=None,  # assembled below (composes the IVF and PQ oracle CTEs)
    tags=("embedding", "similarity", "ann-ivf-pq"),
)
def emb_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled IVF-PQ index (Jégou et al. 2011), end to end:
    coarse quantization assigns every vector to its nearest of 16
    cells (emb_ann_ivf's inverted file), vectors at rest are ONLY
    their 8-byte PQ codes (emb_pq_quantize), and each query probes its
    nprobe=2 nearest cells scoring candidates by ADC lookup tables
    (emb_ann_adc's scorer) — the architecture FAISS ships as IndexIVFPQ,
    here as one declarative plan.

    vs the standalone pieces: emb_ann_adc scans ALL codes per query;
    this plan's ADC only touches codes in probed cells — at 100 TB,
    with the cell column persisted as a partition key, each query
    reads nprobe/ncells of the corpus (partition pruning) and 1/32 of
    the bytes (codes, not raw vectors). That product is the reason
    IVF-PQ is the standard billion-scale layout.

    Determinism: cell assignment is rounded-cosine + cid tiebreak
    (emb_ann_ivf's rule); ADC distances are exact BIGINTs on the
    integer grid; ranks tiebreak on (adc_dist, vec_id) — total order,
    full hash oracle."""
    from ..functions.vectors import cosine, to_double_array
    from ..operators.dedup import topk_per_group
    from .llm_queries import ANN_QUERY_IDS, IVF_CENTROID_IDS, IVF_NPROBE
    from .round8_queries import ADC_TOPK, PQ_DSUB, PQ_K, PQ_M, _pq_code_frame, _pq_grid

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", to_double_array(F.col("embedding")).alias("v"))
    assign = ivf_assign_frame(base, base)
    # probes: 3 query vectors x 16 cells — tiny, the window form is free
    cents_df = base.filter(F.col("vec_id").isin(*IVF_CENTROID_IDS)).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cvec")
    )
    probes = (
        topk_per_group(
            base.filter(F.col("vec_id").isin(*ANN_QUERY_IDS))
            .crossJoin(F.broadcast(cents_df))
            .select("vec_id", "cid", cosine(F.col("v"), F.col("cvec")).alias("ccos")),
            ["vec_id"],
            [F.col("ccos").desc(), F.col("cid").asc()],
            k=IVF_NPROBE,
        )
        .select(F.col("vec_id").alias("query_id"), F.col("cid").alias("cell"))
    )
    codes = (
        _pq_code_frame(emb)
        .drop("q", *[f"e{m}" for m in range(PQ_M)])
        .join(assign, "vec_id")  # persisted `cell` column at scale
    )

    def lut_m(m: int) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(PQ_K - 1)),
            lambda c: F.aggregate(
                F.slice(F.col("qarr"), m * PQ_DSUB + 1, PQ_DSUB),
                F.lit(0).cast("long"),
                lambda acc, x: acc + (x - (32 + 64 * c)) * (x - (32 + 64 * c)),
            ),
        )

    qq = (
        emb.filter(F.col("vec_id").isin(*ANN_QUERY_IDS))
        .select(
            F.col("vec_id").alias("query_id"),
            _pq_grid(F.col("embedding")).alias("qarr"),
        )
        .select("query_id", *[lut_m(m).alias(f"lut{m}") for m in range(PQ_M)])
    )
    adc = sum(
        [
            F.element_at(F.col(f"lut{m}"), (F.col(f"c{m}") + 1).cast("int"))
            for m in range(1, PQ_M)
        ],
        F.element_at(F.col("lut0"), (F.col("c0") + 1).cast("int")),
    )
    pair = (
        codes.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(qq), "query_id")
        .select("query_id", "vec_id", adc.cast("long").alias("adc_dist"))
    )
    return topk_per_group(
        pair,
        ["query_id"],
        [F.col("adc_dist").asc(), F.col("vec_id").asc()],
        k=ADC_TOPK,
        rank_col="rank",
    ).withColumn("rank", F.col("rank").cast("long"))


def _ivfpq_sql() -> str:
    # Compile-footprint-bounded: assign/probes come from the shared IVF
    # chain (2 dot expansions) instead of inlining sql_cosine twice (6).
    from .llm_queries import _Q_IDS, sql_ivf_cte_chain
    from .round8_queries import ADC_TOPK, PQ_DSUB, PQ_M, _pq_cte

    def dist(m: int) -> str:
        lo, hi = m * PQ_DSUB + 1, m * PQ_DSUB + PQ_DSUB
        return (
            f"list_sum(list_transform(qq.qarr[{lo}:{hi}], "
            f"x -> (x - (32 + 64*cv.c{m})) * (x - (32 + 64*cv.c{m}))))"
        )

    adc = " + ".join(dist(m) for m in range(PQ_M))
    return f"""
    WITH {_pq_cte()},
    {sql_ivf_cte_chain()},
    qq AS (SELECT vec_id AS query_id, q AS qarr FROM qv WHERE vec_id IN ({_Q_IDS})),
    pair AS (
      SELECT p.query_id, a.vec_id, CAST({adc} AS BIGINT) AS adc_dist
      FROM probes p
      JOIN assign a ON a.cell = p.cell AND a.vec_id != p.query_id
      JOIN cv ON cv.vec_id = a.vec_id
      JOIN qq ON qq.query_id = p.query_id
    )
    SELECT query_id, vec_id, adc_dist, rank FROM (
      SELECT query_id, vec_id, adc_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, vec_id) AS rank
      FROM pair
    ) WHERE rank <= {ADC_TOPK}
    """


REGISTRY["emb_ann_ivfpq"].oracle = _ivfpq_sql()


# --------------------------------------------------------------------------
# Hashed-feature linear quality classifier (fasttext-style scoring)
# --------------------------------------------------------------------------
# Score = sum over DISTINCT tokens of w(h(token)) / n_distinct, with
# integer milliweights w = (h mod 1001) - 500 in [-500, 500] derived
# from the portable 60-bit hash — a stand-in for trained weights that
# keeps the oracle closed-form. A real model swaps the hash-derived
# weight for a broadcast (feature_bucket -> weight) lookup; the plan
# shape (hash -> weight -> sum -> threshold) is identical.
QUALITY_CLF_THRESHOLD = 0.02  # keep docs scoring above +20 milliweights/token


@register(
    "docs_quality_classifier",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, lang,
             list_transform(
               list_distinct(string_split_regex(trim(lower(text)), '\\s+')),
               t -> (('0x' || substr(md5('qw:' || t), 1, 15))::BIGINT % 1001) - 500
             ) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    scored AS (
      SELECT doc_id, lang,
             CAST(list_sum(w) AS BIGINT) AS milli_sum,
             len(w) AS n_feat
      FROM feat WHERE len(w) > 0
    )
    SELECT doc_id, lang,
           (milli_sum * 1.0 / (1000.0 * n_feat)) AS clf_score,
           CAST(CASE WHEN milli_sum * 1.0 > {QUALITY_CLF_THRESHOLD} * 1000 * n_feat
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM scored
    """,
    tags=("llm", "quality-classifier", "hashed-features"),
)
def docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over hashed token features — the
    fasttext-shaped model-based filter step of a training-data
    pipeline (score each doc with a linear model over its bag of
    hashed features, keep above threshold). Weights here are
    hash-derived integers so the DuckDB oracle is closed-form; a
    TRAINED model replaces `w(h)` with a broadcast feature->weight
    map joined by bucket — the plan is unchanged.

    Determinism: per-token weights are exact BIGINT milliweights; the
    doc score sums them with an order-free integer fold (list order
    differs between engines — an IEEE float sum would not hash-match),
    then divides once. The keep decision is the integer
    cross-multiplication `sum*1.0 > thr*1000*n` — no accumulated
    float error can flip it.

    Scale: pure per-row map over the documents scan — tokenize,
    distinct, hash, fold; no shuffle, no explode (the fold runs inside
    the array, so a 10k-token doc never becomes 10k rows). Scan-bound
    at 100 TB exactly like docs_fingerprint; with the trained-weights
    variant the weight table broadcasts once per executor."""
    from ..functions.text import portable_hash64, tokens

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    w = F.transform(
        F.array_distinct(tokens(F.col("text"))),
        lambda t: F.pmod(portable_hash64(F.concat(F.lit("qw:"), t)), F.lit(1001))
        - 500,
    )
    feat = d.select("doc_id", "lang", w.alias("w")).filter(F.size("w") > 0)
    scored = feat.select(
        "doc_id",
        "lang",
        F.aggregate("w", F.lit(0).cast("long"), lambda a, x: a + x).alias("milli_sum"),
        F.size("w").cast("long").alias("n_feat"),
    )
    return scored.select(
        "doc_id",
        "lang",
        (F.col("milli_sum") * 1.0 / (1000.0 * F.col("n_feat"))).alias("clf_score"),
        F.when(
            F.col("milli_sum") * 1.0 > QUALITY_CLF_THRESHOLD * 1000 * F.col("n_feat"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("keep"),
    )


# --------------------------------------------------------------------------
# Streaming left-outer interval join (unmatched clicks surface as NULLs)
# --------------------------------------------------------------------------
@register(
    "streaming_click_outer_join",
    # Hash-checked against the batch equivalent WITH the watermark
    # emission rule made explicit: matched pairs are the plain interval
    # join; unmatched clicks appear with NULL purchase columns ONLY
    # when the final watermark (min of both sides' max event time minus
    # the 1h delay) has passed click_ts + 6h — clicks nearer the end of
    # the stream are still buffered awaiting a possible match, exactly
    # as an unbounded stream would leave them.
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    wm AS (
      -- NULL (not the surviving side's max) when either side is empty:
      -- DuckDB's least() ignores NULL args, but a stream with no rows
      -- on one side never advances that side's watermark, so the
      -- runtime emits NO outer rows — a NULL w makes both emission
      -- predicates NULL and matches that exactly.
      SELECT CASE WHEN (SELECT MAX(ts) FROM c) IS NULL
                    OR (SELECT MAX(ts) FROM p) IS NULL THEN NULL
             ELSE least((SELECT MAX(ts) FROM c), (SELECT MAX(ts) FROM p))
                  - INTERVAL 1 HOUR END AS w
    )
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           c.ts AS click_ts, p.ts AS purchase_ts
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
    UNION ALL
    SELECT c.user_id, c.event_id, NULL, c.ts, NULL
    FROM c, wm
    WHERE NOT EXISTS (
      SELECT 1 FROM p
      WHERE p.user_id = c.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
    )
    AND c.ts + INTERVAL 6 HOUR < wm.w
    """,
    tags=("streaming", "stream-stream-join", "outer"),
    # headline bench entry next to streaming_click_join (r5 VERDICT
    # item 4): outer interval joins with watermark-scoped NULL emission
    # are the subtlest streaming semantics in the engine — track their
    # steady-state cost, not just their parity.
    bench=True,
)
def streaming_click_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked LEFT OUTER stream-stream interval join: attribution
    pairs plus every click that provably converted to nothing — the
    runtime emits the NULL row only once the watermark passes the
    click's attribution horizon, so "unmatched" is a statement the
    stream can actually prove. Driven to completion synchronously and
    hash-checked against the batch oracle with the same emission rule
    (the no-data micro-batch after the last file advances the
    watermark and flushes expired state; end-of-horizon clicks stay
    buffered on BOTH engines' accounting).

    Scale: identical state bounds to the inner join — both sides
    watermarked, both directions of the time predicate bounded, state
    keyed and partitioned by user_id. The outer emission adds no state;
    it changes only what eviction produces."""
    from .pipeline_queries import run_click_join_stream

    return run_click_join_stream(
        spark, sf_dir, join_type="left_outer", prefix="stream_ojoin"
    )


# --------------------------------------------------------------------------
# RAG-style overlapping chunker (stride < width, per-doc)
# --------------------------------------------------------------------------
CHUNK_W = 64  # tokens per chunk
CHUNK_S = 48  # stride; W - S = 16 tokens of overlap between neighbors


@register(
    "docs_overlap_chunks",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents WHERE text IS NOT NULL
    ),
    chunks AS (
      SELECT doc_id, toks,
             UNNEST(range(0, greatest(len(toks) - {CHUNK_W - CHUNK_S}, 1),
                    {CHUNK_S})) AS start_tok
      FROM tk
    )
    SELECT doc_id,
           CAST(start_tok / {CHUNK_S} AS BIGINT) AS chunk_idx,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(least({CHUNK_W}, len(toks) - start_tok) AS BIGINT) AS chunk_len,
           md5(array_to_string(toks[start_tok + 1 : start_tok + {CHUNK_W}], ' '))
             AS chunk_md5
    FROM chunks
    """,
    tags=("llm", "chunking", "rag"),
)
def docs_overlap_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking (RAG / long-context prep):
    every document becomes ceil(max(n_tok - (W-S), 1) / S) chunks of up
    to CHUNK_W tokens starting every CHUNK_S — neighbors share W-S
    tokens so no boundary sentence is ever split across two retrieval
    units without appearing whole in one. The complement of
    docs_pack_chunks (disjoint training windows): retrieval wants
    overlap, training wants packing. Each chunk carries its md5
    fingerprint so downstream exact-dedup of chunks (shared boilerplate
    collapses across docs) needs no re-tokenization.

    Scale: per-row map — tokenize once, emit chunk structs with a
    higher-order transform over a sequence, explode. Chunk count per
    doc is n_tok/S (bounded fanout, like the Y4M frame sampler); no
    shuffle anywhere. The md5 runs on the SLICED token array joined by
    single spaces, so reflowed whitespace in the source text cannot
    split fingerprints."""
    from ..functions.text import tokens

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tk = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    n_chunks = F.ceil(
        F.greatest(F.size("toks") - (CHUNK_W - CHUNK_S), F.lit(1)) / F.lit(CHUNK_S)
    ).cast("int")
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("long").alias("chunk_idx"),
                (i * CHUNK_S).cast("long").alias("start_tok"),
                F.least(F.lit(CHUNK_W), F.size("toks") - i * CHUNK_S)
                .cast("long")
                .alias("chunk_len"),
                F.md5(
                    F.concat_ws(
                        " ", F.slice(F.col("toks"), i * CHUNK_S + 1, CHUNK_W)
                    )
                ).alias("chunk_md5"),
            ),
        )
    )
    return tk.select("doc_id", chunk.alias("c")).select(
        "doc_id", "c.chunk_idx", "c.start_tok", "c.chunk_len", "c.chunk_md5"
    )


# --------------------------------------------------------------------------
# Near-dup cluster survivorship: canonical doc = longest, then min id
# --------------------------------------------------------------------------
@register(
    "docs_cluster_canonical",
    oracle=None,  # assembled below (reuses the Jaccard-pairs CTE)
    tags=("llm", "dedup-near", "survivorship"),
)
def docs_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster survivorship — the step AFTER near-dup clustering: each
    component keeps its LONGEST member (ties: smallest doc_id), the
    policy that retains the most content when boilerplate-stripped
    variants cluster together (docs_near_dup_clusters' min-id flag is
    the simpler order-based rule; this is the content-based one real
    dedup pipelines ship). Output: every doc, its component, the
    canonical doc it dedups to, and the keep flag.

    Scale: reuses the SESSION-CACHED capped Jaccard pairs and the
    large-star/small-star connected components (diameter-independent);
    survivorship itself is one top-1-per-component window over the
    component frame (|docs| rows, shrinking) joined back broadcast-or-
    shuffled on component id. Nothing here revisits shingles."""
    from pyspark.storagelevel import StorageLevel

    from ..operators.dedup import connected_components_star, topk_per_group
    from .llm_queries import _CC_PAIRS_CACHE, _docs, _exact_jaccard, _shingles_capped_cached

    pairs = _CC_PAIRS_CACHE.get_or_build(
        (spark.sparkContext.applicationId, sf_dir, "cc_pairs"),
        lambda: _exact_jaccard(_shingles_capped_cached(spark, sf_dir))
        .select("doc_a", "doc_b")
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    members = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    comp = connected_components_star(
        members, pairs, id_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    labeled = docs.join(comp, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
    )
    canon = topk_per_group(
        labeled,
        ["component"],
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        k=1,
    ).select("component", F.col("doc_id").alias("canonical_id"))
    return (
        labeled.join(canon, "component")
        .select(
            "doc_id",
            "component",
            "canonical_id",
            (F.col("doc_id") == F.col("canonical_id")).alias("keep"),
        )
    )


def _cluster_canonical_sql() -> str:
    from .llm_queries import _SQL_JACCARD_PAIRS

    return f"""
    WITH RECURSIVE pairs AS ({_SQL_JACCARD_PAIRS}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v != r.u
    ),
    rep AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
    ),
    labeled AS (
      SELECT d.doc_id, d.n_chars,
             COALESCE(r.component, d.doc_id) AS component
      FROM documents d LEFT JOIN rep r ON d.doc_id = r.doc_id
    ),
    canon AS (
      SELECT component, doc_id AS canonical_id FROM (
        SELECT component, doc_id,
               row_number() OVER (PARTITION BY component
                                  ORDER BY n_chars DESC, doc_id ASC) AS rn
        FROM labeled
      ) WHERE rn = 1
    )
    SELECT l.doc_id, l.component, c.canonical_id,
           (l.doc_id = c.canonical_id) AS keep
    FROM labeled l JOIN canon c ON l.component = c.component
    """


REGISTRY["docs_cluster_canonical"].oracle = _cluster_canonical_sql()


# --------------------------------------------------------------------------
# Seasonal-naive forecast backtest (MAE vs naive baseline, per type)
# --------------------------------------------------------------------------
@register(
    "daily_seasonal_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, day, cents,
             lag(cents, 7) OVER (PARTITION BY event_type ORDER BY day)
               AS season_pred,
             lag(cents, 1) OVER (PARTITION BY event_type ORDER BY day)
               AS naive_pred
      FROM daily
    )
    SELECT event_type,
           COUNT(*) AS n_days,
           (SUM(abs(cents - season_pred)) * 1.0 / COUNT(*) / 100.0)
             AS seasonal_mae,
           (SUM(abs(cents - naive_pred)) * 1.0 / COUNT(*) / 100.0)
             AS naive_mae,
           (SUM(abs(cents - season_pred)) * 1.0
            / SUM(abs(cents - naive_pred))) AS mase
    FROM lagged
    WHERE season_pred IS NOT NULL AND naive_pred IS NOT NULL
    GROUP BY event_type
    """,
    tags=("timeseries", "forecast-backtest", "mase"),
)
def daily_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest without a model: score the SEASONAL-NAIVE
    predictor (value = same weekday last week) against the naive one
    (value = yesterday) on daily per-type revenue — MASE (Hyndman &
    Koehler 2006) below 1 means weekly seasonality carries real
    signal, the standard go/no-go before any fancier forecaster.

    Determinism: daily sums are integer cents; absolute errors and
    their sums stay BIGINT; each MAE/MASE is one IEEE division at the
    end. Rows where either predictor is undefined (first week) are
    excluded on both engines. days are calendar DATEs from
    TIMESTAMP_NTZ event time — session-timezone-free.

    Scale: one map-side-combinable daily aggregation of the fact
    table, then lag windows PARTITIONED BY event_type over the
    calendar-bounded daily rollup (years of days fit one partition),
    then a per-type fold. Same shape as weekly_revenue_wow/cusum —
    the window never sees raw events. NULL event time is excluded on
    both engines (a NULL day would shift the lag-7/lag-1 alignment)."""
    e = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (
        e.groupBy(
            "event_type",
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        )
        .agg(F.sum(cents(F.col("value"))).alias("cents"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "day",
        "cents",
        F.lag("cents", 7).over(w).alias("season_pred"),
        F.lag("cents", 1).over(w).alias("naive_pred"),
    ).filter(F.col("season_pred").isNotNull() & F.col("naive_pred").isNotNull())
    sa = F.sum(F.abs(F.col("cents") - F.col("season_pred")))
    na = F.sum(F.abs(F.col("cents") - F.col("naive_pred")))
    return lagged.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        (sa * 1.0 / F.count("*") / 100.0).alias("seasonal_mae"),
        (na * 1.0 / F.count("*") / 100.0).alias("naive_mae"),
        (sa * 1.0 / na).alias("mase"),
    )


# --------------------------------------------------------------------------
# Distributed PCA: top principal component by power iteration
# --------------------------------------------------------------------------
# Fixed iteration count + deterministic init -> an ITERATIVE spectral
# algorithm that still hash-matches an unrolled SQL oracle (the
# emb_kmeans_refine playbook applied to linear algebra).
PIT_ITERS = 3
PIT_Q = 1_000_000  # fixed-point quantum for order-free integer sums


def _sql_pit_parts() -> list[str]:
    """Shared unrolled power-iteration CTE chain: x (quantized unnest),
    v0 (uniform init), then per iteration s/w/m/u/n/v — ending at
    v{PIT_ITERS}, the converged unit direction both PCA oracles read."""
    from .llm_queries import EMB_DIM

    parts = [
        # one unnest pass: raw component (for the dot product) + its
        # integer quantization (for the order-free matvec sum)
        "x AS (SELECT vec_id, dim, xv, CAST(round(xv * 1000000) AS BIGINT)"
        " AS xq FROM (SELECT vec_id, generate_subscripts(embedding, 1) - 1"
        " AS dim, unnest(embedding::DOUBLE[]) AS xv FROM embeddings))",
        # v0 = uniform unit vector; 1/8 = 0.125 is exactly representable
        f"v0 AS (SELECT dim, CAST(0.125 AS DOUBLE) AS vd"
        f" FROM range({EMB_DIM}) t(dim))",
    ]
    for i in range(1, PIT_ITERS + 1):
        p = i - 1
        parts.append(
            f"s{i} AS (SELECT x.vec_id, SUM(CAST(round(x.xv * v.vd * 1000000)"
            f" AS BIGINT)) AS sq FROM x JOIN v{p} v USING (dim)"
            " GROUP BY x.vec_id)"
        )
        parts.append(
            f"w{i} AS (SELECT x.dim, SUM(x.xq * s.sq) AS ws"
            f" FROM x JOIN s{i} s USING (vec_id) GROUP BY x.dim)"
        )
        parts.append(f"m{i} AS (SELECT MAX(ABS(ws)) AS m FROM w{i})")
        parts.append(
            f"u{i} AS (SELECT dim, CAST(round(CAST(ws AS DOUBLE)"
            f" / CAST(m AS DOUBLE) * 1000000) AS BIGINT) AS uq"
            f" FROM w{i}, m{i})"
        )
        parts.append(f"n{i} AS (SELECT SUM(uq * uq) AS n2 FROM u{i})")
        parts.append(
            f"v{i} AS (SELECT dim, CAST(uq AS DOUBLE)"
            f" / sqrt(CAST(n2 AS DOUBLE)) AS vd FROM u{i}, n{i})"
        )
    return parts


def _sql_power_iteration() -> str:
    return (
        "WITH "
        + ",\n".join(_sql_pit_parts())
        + f"\nSELECT dim, vd AS loading FROM v{PIT_ITERS}"
    )


@register(
    "emb_power_iteration",
    oracle=_sql_power_iteration(),
    tags=("llm", "similarity", "pca", "iterative"),
)
def emb_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by 3 rounds of
    power iteration on the (uncentered) Gram matrix — the distributed
    spectral step under PCA whitening / spectral indexes, expressed so
    a fixed-iteration unrolled SQL oracle hash-matches it bit-for-bit:

    - per-row dot product s_i = x_i.v sums ROUNDED INTEGER terms
      (round(x*v*1e6) as BIGINT) — exact, order-free;
    - the matvec w = sum_i s_i * x_i sums integer products
      xq * sq (quantized component times quantized dot) — exact,
      order-free, one (dim)-keyed 64-group aggregate;
    - normalization re-quantizes w against its max-abs component and
      divides by sqrt of an exact integer sum of squares — every float
      op left is a single correctly-rounded IEEE op (cast, /, sqrt),
      so both engines walk bit-identical v vectors each round.

    Overflow bound: |xq| <= 1e6, |sq| <= 64e6 * max|x| => each product
    < 2.2e13; BIGINT holds corpora to ~4e5 vectors at this quantum
    (rescale PIT_Q for more — documented, not silent).

    Scale: per iteration one broadcast of the 64-double v, one
    map-only fold for s_i (no shuffle), one posexplode feeding a
    64-group map-side-combinable aggregate, and two scalar one-row
    steps. 3 iterations = 3 scans of the corpus; at real scale the
    base projection persists once and each iteration ends in a
    localCheckpoint to keep the stacked plan flat (kmeans-refine
    pattern, llm_queries.py)."""
    base, vdf, _ = _pit_v(spark, sf_dir)
    return vdf.select(F.posexplode("varr").alias("dim", "loading"))


def _pit_v(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame, list]:
    """(base projection, converged 1-row unit direction) after PIT_ITERS
    deterministic power-iteration rounds — the Spark twin of the
    _sql_pit_parts CTE chain.

    Each round ends in a BOUNDED collect of the 64-double v (the
    parquet_table partition-values precedent: bounded by EMB_DIM, never
    by data size) which re-enters the next round as a literal array.
    Left lazy, round i's plan nests rounds 1..i-1 inside stacked
    broadcast subtrees that re-execute rather than reuse (measured 22s
    vs 3s at x64); localCheckpoint flattens the plan but materializes
    through the RDD path at ~8s per 1-row checkpoint. The literal
    re-entry keeps every iteration at exactly one job and the returned
    v a plan-free 1-row frame. ALL arithmetic stays in Spark
    expressions — the collect only round-trips exact IEEE doubles — so
    oracle hash parity is untouched.

    The dot product stays a zip_with/aggregate fold against the literal
    v array (measured: the fold beats a 64-term unrolled element_at sum
    ~2x per corpus pass — the wide expression deoptimizes, the same
    family of effect as SCALE.md's IVF negative result)."""
    from .llm_queries import EMB_DIM, _emb

    base = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    vals: list[float] = [0.125] * EMB_DIM
    for _ in range(PIT_ITERS):
        s = base.select("vec_id", "x", _dot_q(vals).alias("sq"))
        w = (
            s.select(F.posexplode("x").alias("dim", "xv"), "sq")
            .select(
                "dim",
                (F.round(F.col("xv") * PIT_Q).cast("long") * F.col("sq")).alias("c"),
            )
            .groupBy("dim")
            .agg(F.sum("c").alias("ws"))
        )
        m = w.agg(F.max(F.abs(F.col("ws"))).alias("m"))
        u = w.crossJoin(F.broadcast(m)).select(
            "dim",
            F.round(F.col("ws").cast("double") / F.col("m").cast("double") * PIT_Q)
            .cast("long")
            .alias("uq"),
        )
        uqa = (
            u.groupBy()
            .agg(F.array_sort(F.collect_list(F.struct("dim", "uq"))).alias("su"))
            .select(F.transform("su", lambda t: t["uq"]).alias("uqa"))
        )
        norm = F.sqrt(
            F.aggregate(
                F.col("uqa"), F.lit(0).cast("long"), lambda acc, q: acc + q * q
            ).cast("double")
        )
        vals = [
            float(v)
            for v in uqa.select(
                F.transform(F.col("uqa"), lambda q: q.cast("double") / norm).alias(
                    "varr"
                )
            )
            .collect()[0]["varr"]
        ]
    vdf = spark.range(1).select(
        F.array(*[F.lit(v).cast("double") for v in vals]).alias("varr")
    )
    return base, vdf, vals


def _dot_q(vals: list[float]):
    """Quantized dot product of the x array against the literal
    direction `vals`: sum_d round(x[d] * v_d * 1e6) as an exact BIGINT
    fold — order-fixed AND order-free (integer terms)."""
    varr = F.array(*[F.lit(v).cast("double") for v in vals])
    return F.aggregate(
        F.zip_with("x", varr, lambda a, b: F.round(a * b * F.lit(PIT_Q)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


# PCA diagnostics: share of total variance captured by the top component
PIT_Q9 = 1_000_000_000  # finer quantum: both Rayleigh terms are <= 1 per row


def _sql_variance_explained() -> str:
    last = f"v{PIT_ITERS}"
    return (
        "WITH "
        + ",\n".join(_sql_pit_parts())
        + f""",
    sf AS (
      SELECT x.vec_id, SUM(CAST(round(x.xv * v.vd * 1000000) AS BIGINT)) AS sq
      FROM x JOIN {last} v USING (dim) GROUP BY x.vec_id
    ),
    qn AS (
      SELECT vec_id,
             CAST(round((CAST(sq AS DOUBLE) / 1000000)
                        * (CAST(sq AS DOUBLE) / 1000000)
                        * {PIT_Q9}) AS BIGINT) AS q
      FROM sf
    ),
    dn AS (
      SELECT vec_id, SUM(CAST(round(xv * xv * {PIT_Q9}) AS BIGINT)) AS d
      FROM x GROUP BY vec_id
    )
    SELECT COUNT(*) AS n_vecs,
           (SUM(q.q) * 1.0 / SUM(d.d)) AS top_share
    FROM qn q JOIN dn d USING (vec_id)
    """
    )


@register(
    "emb_variance_explained",
    oracle=_sql_variance_explained(),
    tags=("llm", "similarity", "pca", "iterative"),
)
def emb_variance_explained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rayleigh-quotient diagnostic for the power-iteration component:
    the share of total (uncentered) variance the top direction captures,
    share = sum_i (x_i.v)^2 / sum_i ||x_i||^2 — the go/no-go number
    before spending a whitening or spectral-index pass (a near-isotropic
    corpus, share ~ 1/dim, gains nothing from rank-1 treatment).

    Determinism: the dot product re-uses the iteration's integer-term
    sum; its square and each ||x||^2 term are quantized to 1e-9 units
    (both are <= 1 per row for unit-norm inputs) so BOTH Rayleigh sums
    are exact BIGINT reductions — order-free — and the share is one
    IEEE division. Scale: one map-only projection (v enters as a
    literal; both per-row sums are unrolled codegen terms, see _dot_q),
    one global 2-sum aggregate; nothing keyed, nothing quadratic."""
    base, _, vals = _pit_v(spark, sf_dir)
    s = base.select(
        _dot_q(vals).alias("sq"),
        F.aggregate(
            F.col("x"),
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.round(t * t * F.lit(PIT_Q9)).cast("long"),
        ).alias("d"),
    )
    xi_v = F.col("sq").cast("double") / PIT_Q
    return s.select(
        F.round(xi_v * xi_v * F.lit(PIT_Q9)).cast("long").alias("q"), "d"
    ).agg(
        F.count("*").alias("n_vecs"),
        (F.sum("q") * 1.0 / F.sum("d")).alias("top_share"),
    )


# --------------------------------------------------------------------------
# SimHash near-dup PAIRS: 60-bit fingerprint + pigeonhole block join
# --------------------------------------------------------------------------
# Manku/Jain/Sarma (WWW'07): if hamming(a, b) <= 3 then at least one of
# 4 disjoint 15-bit blocks of the 60-bit fingerprints is EQUAL — so the
# candidate join is a bucket equi-join on (block_idx, block_value), not
# an all-pairs scan, and the exact Hamming verify runs on candidates
# only. 60 bits (the full portable shingle-hash width) rather than the
# 32-bit fingerprint of `docs_simhash`: 15-bit blocks give 32k buckets
# per block, which is what keeps bucket occupancy — and the join —
# subquadratic as the corpus grows.
SIMHASH60_BITS = 60
SIMHASH_HAM_BLOCKS = 4
SIMHASH_HAM_T = SIMHASH_HAM_BLOCKS - 1  # pigeonhole guarantee
SIMHASH_BLOCK_BITS = SIMHASH60_BITS // SIMHASH_HAM_BLOCKS  # 15
SIMHASH_BLOCK_CAP = 1000  # degenerate-bucket kill switch (LSH_BUCKET_CAP twin)


def _sql_simhash60() -> str:
    from .llm_queries import _SQL_SHINGLE_H

    bit_sums = ",\n             ".join(
        f"SUM(CASE WHEN (sh // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH60_BITS)
    )
    assemble = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(SIMHASH60_BITS)
    )
    return f"""
    WITH sh AS ({_SQL_SHINGLE_H}),
    bits AS (
      SELECT doc_id, {bit_sums}
      FROM sh GROUP BY doc_id
    ),
    sim AS (SELECT doc_id, ({assemble}) AS simhash FROM bits)
    """


def _sql_simhash_pairs() -> str:
    mask = (1 << SIMHASH_BLOCK_BITS) - 1
    blocks = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS blk,"
        f" (simhash // {1 << (SIMHASH_BLOCK_BITS * b)}) % {mask + 1} AS bv"
        " FROM sim"
        for b in range(SIMHASH_HAM_BLOCKS)
    )
    return f"""{_sql_simhash60()},
    blocks AS ({blocks}),
    capped AS (
      SELECT doc_id, blk, bv FROM blocks
      QUALIFY COUNT(*) OVER (PARTITION BY blk, bv) <= {SIMHASH_BLOCK_CAP}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b
        ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           bit_count(xor(sa.simhash, sb.simhash)) AS hamming
    FROM cand c
    JOIN sim sa ON sa.doc_id = c.doc_a
    JOIN sim sb ON sb.doc_id = c.doc_b
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {SIMHASH_HAM_T}
    """


# The 60-bit fingerprint table is a per-(session, sf_dir) persisted
# working set like the shingle explode: the pairs query references it
# from the 4 block branches, the bucket-cap aggregate, BOTH self-join
# sides, and BOTH verify joins — unpersisted, Catalyst recomputes the
# 60-aggregate vote pass for every reference (~6x the cost, measured
# 8.2s -> 2.1s warm at sf0.1). One BIGINT per doc; at corpus scale this
# is exactly the fingerprint table a production dedup service maintains
# incrementally. Registered with clear_working_set_caches().
def _make_simhash_cache():
    from .llm_queries import register_working_set_cache

    return register_working_set_cache(__name__)


_SIMHASH60_CACHE = _make_simhash_cache()


def _simhash60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per doc over the shared cached shingle working set
    (same +-1 bit votes as docs_simhash, full hash width); persisted
    per (session, sf_dir) — see _SIMHASH60_CACHE."""
    from pyspark.storagelevel import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    return _SIMHASH60_CACHE.get_or_build(
        key,
        lambda: _simhash60_build(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK),
    )


def _simhash60_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm_queries import _shingles_cached

    sh = _shingles_cached(spark, sf_dir)
    h = F.col("sh")
    votes = sh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(SIMHASH60_BITS)
        ]
    )
    simhash = None
    for j in range(SIMHASH60_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        simhash = term if simhash is None else simhash + term
    return votes.select("doc_id", simhash.alias("simhash"))


@register(
    "docs_simhash_hamming_pairs",
    oracle=_sql_simhash_pairs(),
    tags=("llm", "dedup-near", "simhash", "hamming"),
)
def docs_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS at Hamming distance <= 3 via the
    pigeonhole block join (Manku et al., WWW'07): split each 60-bit
    fingerprint into 4 disjoint 15-bit blocks; any pair within the
    Hamming budget MUST agree on at least one block, so candidates come
    from a bucket equi-join on (block_idx, block_value) — one 8-byte-ish
    shuffle key, 32k buckets per block — and the exact popcount verify
    (bit_count of XOR) touches candidates only. Buckets wider than
    SIMHASH_BLOCK_CAP are dropped before the join (boilerplate-identical
    fingerprints would go quadratic — same kill switch as the MinHash
    LSH bands). Completes the near-dup family: MinHash ~ Jaccard,
    hyperplane-LSH ~ cosine, SimHash-blocks ~ Hamming."""
    sim = _simhash60(spark, sf_dir)
    mask = (1 << SIMHASH_BLOCK_BITS) - 1
    # one pass over the persisted fingerprints: posexplode the 4 block
    # values instead of a 4-branch union (which would scan sim 4 times)
    blocks = sim.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), SIMHASH_BLOCK_BITS * b).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(SIMHASH_HAM_BLOCKS)
                ]
            )
        ).alias("blk", "bv"),
    )
    wide = (
        blocks.groupBy("blk", "bv")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > SIMHASH_BLOCK_CAP)
        .select("blk", "bv")
    )
    capped = blocks.join(F.broadcast(wide), ["blk", "bv"], "left_anti")
    a, b = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sim.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    sb = sim.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(ha ^ hb)").alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_HAM_T)
    )


# --------------------------------------------------------------------------
# Per-source document cap (crawl-pipeline domain cap)
# --------------------------------------------------------------------------
SOURCE_CAP_K = 15


def _sql_source_cap() -> str:
    from ..functions.text import sql_portable_hash64

    h = sql_portable_hash64("'cap:' || CAST(doc_id AS VARCHAR)")
    return f"""
    SELECT doc_id, source,
           (row_number() OVER (
              PARTITION BY source
              ORDER BY {h}, doc_id
            ) <= {SOURCE_CAP_K}) AS kept
    FROM documents
    """


@register(
    "docs_source_cap",
    oracle=_sql_source_cap(),
    tags=("llm", "sampling", "source-cap"),
)
def docs_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the crawl-pipeline guard against domain
    dominance: keep at most SOURCE_CAP_K documents per source, chosen by
    a salted portable hash of doc_id (reproducible across runs, engines
    and cluster sizes; new crawls never evict previously-kept docs of
    other hashes' order — same rationale as docs_split_assign).

    Scale: sources BELOW the cap never enter a sort — they short-circuit
    through a broadcast semi-join on the per-source counts (map-only),
    so the row_number window runs ONLY over the hot tail (capped
    domains), which is precisely where per-source ordering is required.
    A uniform corpus pays one tiny count aggregate + one window; a
    skewed crawl (the realistic case: web domains are Zipfian) windows
    only the few giant domains. Tested on a skewed fixture in
    tests/test_round9_models.py."""
    from ..functions.text import portable_hash64

    d = load_table(spark, sf_dir, "documents")
    h = portable_hash64(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    # NULL-safe routing (ADVICE r5): groupBy keeps a NULL-source group
    # and the oracle's PARTITION BY treats NULL as a partition, so the
    # routing joins must be null-safe too — a plain equi-join would
    # silently drop NULL-source documents from both branches. <=> keys
    # still hash-join (broadcast), so the fast path is unchanged.
    counts = d.groupBy("source").agg(F.count("*").alias("n"))
    small_srcs = counts.filter(F.col("n") <= SOURCE_CAP_K).select(
        F.col("source").alias("cap_src")
    )
    small = d.join(
        F.broadcast(small_srcs),
        F.col("source").eqNullSafe(F.col("cap_src")),
        "left_semi",
    ).select("doc_id", "source", F.lit(True).alias("kept"))
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    hot_srcs = counts.filter(F.col("n") > SOURCE_CAP_K).select(
        F.col("source").alias("cap_src")
    )
    hot = (
        d.join(
            F.broadcast(hot_srcs),
            F.col("source").eqNullSafe(F.col("cap_src")),
            "left_semi",
        )
        .select(
            "doc_id", "source", (F.row_number().over(w) <= SOURCE_CAP_K).alias("kept")
        )
    )
    return small.unionByName(hot)


# --------------------------------------------------------------------------
# Character-diversity quality proxy (Gini-Simpson index)
# --------------------------------------------------------------------------
@register(
    "docs_char_diversity",
    oracle="""
    WITH c AS (
      SELECT doc_id, ch, COUNT(*) AS n
      FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
            FROM documents
            -- string_split('', '') is [''], not []: exclude empties so
            -- the LEFT JOIN gives them the same NULL-metrics row as
            -- NULL texts (matches the Spark length>0 guard)
            WHERE length(text) > 0)
      GROUP BY doc_id, ch
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(n * n) AS BIGINT) AS ss,
             CAST(SUM(n) AS BIGINT) AS n_chars,
             COUNT(*) AS n_distinct
      FROM c GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_chars, 0) AS n_chars,
           COALESCE(a.n_distinct, 0) AS n_distinct,
           (1.0 - (a.ss * 1.0 / (a.n_chars * a.n_chars))) AS gini_simpson
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    tags=("llm", "text-quality", "diversity"),
)
def docs_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-Simpson character diversity per document, 1 - sum_ch p_ch^2:
    a perplexity-free degenerate-text detector (keyboard mashing, long
    pad runs, single-char spam score near 0; natural text sits high) —
    complements the word-level Gopher repetition stats with a
    character-level signal.

    Rational arithmetic only — counts, squares, one IEEE division —
    because ln() is not bit-identical across engines (the entropy form
    would be; Simpson carries the same signal without it).

    Scale: ZERO exchanges — the oracle's unnest + two GROUP BYs
    re-expresses as a per-row fold over the SORTED char array (the
    repetition-stats rewrite): run lengths of the sorted array ARE the
    per-char counts, so sum-of-squared-run-lengths = sum n_ch^2. At
    100 TB this is a map-only pass over the corpus scan. NULL/empty
    texts keep their row (counts 0, diversity NULL) on both engines."""
    d = load_table(spark, sf_dir, "documents")
    chars = F.array_sort(
        F.transform(
            F.sequence(F.lit(1), F.length("text")),
            lambda i: F.col("text").substr(i, F.lit(1)),
        )
    )
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("ss"),
        zero.alias("nd"),
    )
    folded = F.aggregate(
        chars,
        acc0,
        lambda acc, c: F.struct(
            c.alias("prev"),
            F.when(c == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(c == acc["prev"], acc["ss"])
            .otherwise(acc["ss"] + acc["run"] * acc["run"])
            .alias("ss"),
            F.when(c == acc["prev"], acc["nd"]).otherwise(acc["nd"] + 1).alias("nd"),
        ),
        lambda acc: F.struct(
            (acc["ss"] + acc["run"] * acc["run"]).alias("ss"), acc["nd"].alias("nd")
        ),
    )
    has_text = F.length("text") > 0
    out = d.select(
        "doc_id",
        F.coalesce(F.length("text"), F.lit(0)).cast("long").alias("n_chars"),
        F.when(has_text, folded).alias("f"),
    )
    n = F.col("n_chars")
    return out.select(
        "doc_id",
        "n_chars",
        F.coalesce(F.col("f.nd"), F.lit(0).cast("long")).alias("n_distinct"),
        # NULL f (no/empty text) propagates to a NULL diversity
        (1.0 - (F.col("f.ss") * 1.0 / (n * n))).alias("gini_simpson"),
    )
