"""Round-13 queries (round-7 additions — staged: the driver backlog is
at its 25-query bound, so these queue in plans/staging.py under the
same strict Arrow-level parity gate until window slots free up).

Store / incremental lane: `store_mv_refresh_increment` — incremental
materialized-view maintenance driven by the merge change feed
(operators/merge.py::merge_cdf): the MV is updated from the CDF's
preimage/postimage algebra alone, never by rescanning the base table,
and hash-equality against a full-recompute oracle proves
incremental == recompute. This is the capability a training-data
pipeline needs to keep per-source corpus statistics current under
daily crawl merges without re-aggregating 100 TB.

Graph lane: `copurchase_khop_distance` — bounded k-hop BFS (multi-
source shortest distance) over the co-purchase graph, the iterative-
join traversal class (distinct from copurchase_pagerank's value
iteration and docs_near_dup_clusters' component contraction).

Privacy lane: `customer_k_anonymity` — quasi-identifier group-size
audit (k-anonymity), the privacy-side complement of docs_pii_scrub:
before a table ships as training data, every QID combination must be
shared by >= K rows or flagged for suppression.

Reference parity: the reference's sync loop maintains derived tables
under incremental merges (src/etl/price_sync.py — the MV here is
"a derived aggregate maintained the same way"); the graph/privacy
lanes extend the engine beyond the reference per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents, sql_cents
from ..operators.merge import merge_cdf
from ..sources.catalog import load_table
from .staging import stage

# --------------------------------------------------------------------------
# Incremental materialized-view refresh from a merge change feed
# --------------------------------------------------------------------------
# Deterministic slices of the (l_orderkey, l_partkey) fact rollup:
# base = keys with orderkey ≡ 0 (mod 3); the CDC batch updates the
# orderkey ≡ 0 (mod 9) subset (+5 qty, +10000 price cents) and inserts
# the orderkey ≡ 1 (mod 3) keys. All closed-form, so the refreshed
# MV equals a plain SQL recompute over the final base state.
_MV_QTY_BUMP = 5
_MV_PRICE_BUMP_CENTS = 10_000


def _make_fact_cache():
    from .llm_queries import EXTRA_WORKING_SET_CACHES, _PersistedLRU, SHINGLE_CACHE_CAP

    cache = _PersistedLRU(SHINGLE_CACHE_CAP)
    EXTRA_WORKING_SET_CACHES.append(cache)
    return cache


_MV_FACT_CACHE = _make_fact_cache()


def _mv_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, l_partkey) fact rollup, persisted per (session,
    sf_dir): stands in for the STORED base table a production MV
    maintains against — without it the self-contained query re-scans
    and re-aggregates lineitem in every branch (stale MV, CDF
    classify, delta), six scans for one refresh. Registered with
    clear_working_set_caches() like the shingle/simhash working sets."""
    from pyspark.storagelevel import StorageLevel

    def build() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull()
        )
        return (
            li.groupBy("l_orderkey", "l_partkey")
            .agg(
                F.sum(F.col("l_quantity").cast("long")).alias("qty"),
                F.sum(cents(F.col("l_extendedprice"))).alias("price_cents"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

    key = (spark.sparkContext.applicationId, sf_dir)
    return _MV_FACT_CACHE.get_or_build(key, build)


def _sql_mv_refresh() -> str:
    fact = f"""
      SELECT l_orderkey, l_partkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
             CAST(SUM({sql_cents('l_extendedprice')}) AS BIGINT) AS price_cents
      FROM lineitem
      WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
      GROUP BY 1, 2
    """
    return f"""
    WITH fact AS ({fact}),
    final AS (
      SELECT l_partkey,
             CASE WHEN l_orderkey % 9 = 0 THEN qty + {_MV_QTY_BUMP}
                  ELSE qty END AS qty,
             CASE WHEN l_orderkey % 9 = 0 THEN price_cents + {_MV_PRICE_BUMP_CENTS}
                  ELSE price_cents END AS price_cents
      FROM fact WHERE l_orderkey % 3 = 0
      UNION ALL
      SELECT l_partkey, qty, price_cents FROM fact WHERE l_orderkey % 3 = 1
    )
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_facts,
           CAST(SUM(qty) AS BIGINT) AS sum_qty,
           CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents
    FROM final GROUP BY 1
    """


@stage(
    "store_mv_refresh_increment",
    oracle=_sql_mv_refresh(),
    tags=("store", "K2", "cdf", "materialized-view", "incremental"),
)
def store_mv_refresh_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a per-partkey
    aggregate MV is refreshed from the CHANGE FEED of a base-table
    merge (merge_cdf — Delta CDF semantics) instead of recomputed.
    Each CDF row contributes a signed delta (update_preimage = -1,
    insert / update_postimage = +1); the per-partkey delta aggregate
    full-outer-joins onto the stale MV with null-safe adds. The oracle
    recomputes the MV from the closed-form final base state, so hash
    equality PROVES the incremental algebra equals recompute — the
    invariant streaming aggregation relies on.

    Scale: the base table is aggregated ONCE to seed the stale MV (in
    production that MV already exists); everything after is
    proportional to the CDC batch — the change feed shuffles on the
    merge key over changed rows only, the delta aggregate shrinks to
    touched partkeys, and the MV apply joins stale-MV rows against
    that small delta (at 100 TB: a keyed merge of |touched keys|
    rows, via K2, never a corpus rescan). The fact rollup (the stored
    base table in production) is persisted once (_mv_fact), so the
    lineitem parquet is scanned exactly once per session."""
    fact = _mv_fact(spark, sf_dir)
    base = fact.filter(F.col("l_orderkey") % 3 == 0)
    updates = base.filter(F.col("l_orderkey") % 9 == 0).select(
        "l_orderkey",
        "l_partkey",
        (F.col("qty") + _MV_QTY_BUMP).alias("qty"),
        (F.col("price_cents") + _MV_PRICE_BUMP_CENTS).alias("price_cents"),
    )
    inserts = fact.filter(F.col("l_orderkey") % 3 == 1)

    # The stale MV (exists already in production; seeded here once).
    mv = base.groupBy("l_partkey").agg(
        F.count("*").alias("n_facts"),
        F.sum("qty").alias("sum_qty"),
        F.sum("price_cents").alias("sum_price_cents"),
    )

    # CDF → signed per-partkey delta: the ONLY input to the refresh.
    cdf = merge_cdf(
        base, updates.unionByName(inserts), keys=["l_orderkey", "l_partkey"]
    )
    sign = F.when(F.col("_change_type") == "update_preimage", F.lit(-1)).otherwise(
        F.lit(1)
    )
    delta = cdf.groupBy("l_partkey").agg(
        F.sum(sign).alias("d_n"),
        F.sum(sign * F.col("qty")).alias("d_qty"),
        F.sum(sign * F.col("price_cents")).alias("d_price"),
    )

    def _add(a: str, b: str) -> F.Column:
        return F.coalesce(F.col(a), F.lit(0)) + F.coalesce(F.col(b), F.lit(0))

    refreshed = mv.join(delta, "l_partkey", "full_outer").select(
        "l_partkey",
        _add("n_facts", "d_n").alias("n_facts"),
        _add("sum_qty", "d_qty").alias("sum_qty"),
        _add("sum_price_cents", "d_price").alias("sum_price_cents"),
    )
    # A delta that zeroes a group would leave an empty shell row;
    # deletes aren't in this batch, but the guard is part of the
    # refresh algebra (and a no-op here, matching the oracle).
    return refreshed.filter(F.col("n_facts") > 0)


# --------------------------------------------------------------------------
# Bounded k-hop BFS over the co-purchase graph
# --------------------------------------------------------------------------
_KHOP_K = 3
_KHOP_SEED_MOD = 97


def _sql_khop() -> str:
    return f"""
    WITH RECURSIVE items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    ),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    seeds AS (
      SELECT DISTINCT l_partkey FROM items
      WHERE l_partkey % {_KHOP_SEED_MOD} = 0
    ),
    r AS (
      SELECT l_partkey, 0 AS d FROM seeds
      UNION
      SELECT e.dst, r.d + 1 FROM r JOIN edges e ON e.src = r.l_partkey
      WHERE r.d < {_KHOP_K}
    )
    SELECT l_partkey, CAST(MIN(d) AS INTEGER) AS dist FROM r GROUP BY 1
    """


@stage(
    "copurchase_khop_distance",
    oracle=_sql_khop(),
    tags=("graph", "bfs", "iterative", "J5"),
)
def copurchase_khop_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source k-hop BFS: shortest hop-distance (<= {K}) from the
    seed parts (partkey ≡ 0 mod {M}) through the co-purchase graph —
    the iterative-join traversal class (k rounds of relax-then-min),
    distinct from copurchase_pagerank's value iteration and the dedup
    lane's component contraction. The oracle is a bounded recursive
    CTE over (part, d) states, so the hash pins every reachable part
    AND its exact BFS distance.

    Scale: edges come from the per-order sorted-array pair expansion
    (the basket_cooccurrence_lift plan — fanout bounded by basket
    size, no self-join), symmetrized and deduplicated once, then each
    of the k rounds is one hash join frontier×edges partitioned on
    part key plus a min-aggregate — the textbook Pregel superstep as
    DataFrame ops. k is a constant (plan depth bounded); the frontier
    never exceeds |V|. At 100 TB the joins shuffle on the part key
    and AQE handles hub-part skew; for web-scale graphs the same loop
    runs over a bucketed edge table, shuffle-free."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull()
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.size("parts")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    half = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.a").alias("src"), F.col("p.b").alias("dst"))
        .distinct()
    )
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    vertices = baskets.select(F.explode("parts").alias("l_partkey")).distinct()
    dist = vertices.filter(F.col("l_partkey") % _KHOP_SEED_MOD == 0).select(
        "l_partkey", F.lit(0).alias("d")
    )
    for _ in range(_KHOP_K):
        hop = (
            dist.join(edges, dist.l_partkey == edges.src)
            .select(F.col("dst").alias("l_partkey"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.unionByName(hop)
            .groupBy("l_partkey")
            .agg(F.min("d").alias("d"))
        )
    return dist.select("l_partkey", F.col("d").cast("int").alias("dist"))


copurchase_khop_distance.__doc__ = copurchase_khop_distance.__doc__.format(
    K=_KHOP_K, M=_KHOP_SEED_MOD
)


# --------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# --------------------------------------------------------------------------
_K_ANON = 5
_BAL_BAND_CENTS = 100_000  # 1000 currency units per band


def _sql_k_anonymity() -> str:
    band = (
        f"CAST(FLOOR(({sql_cents('c_acctbal')}) * 1.0 / {_BAL_BAND_CENTS}) AS BIGINT)"
    )
    return f"""
    SELECT c_nationkey, c_mktsegment,
           {band} AS bal_band,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           (COUNT(*) >= {_K_ANON}) AS k_anonymous,
           1.0 / COUNT(*) AS reident_risk
    FROM customer
    GROUP BY 1, 2, 3
    """


@stage(
    "customer_k_anonymity",
    oracle=_sql_k_anonymity(),
    tags=("privacy", "k-anonymity", "A5", "quality"),
)
def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: group customers by their quasi-identifier
    tuple (nation, market segment, 1000-unit balance band) and flag
    every group smaller than k={K} — those rows are re-identifiable
    and must be suppressed or generalized before the table ships as
    training data. Complements docs_pii_scrub (which redacts direct
    identifiers; k-anonymity is about indirect ones). NULL QIDs form
    their own group on both engines (GROUP BY keeps NULL).

    The band is computed on exact integer cents (FLOOR of an exact-
    in-double quotient, so negative balances band correctly — integer
    division would truncate toward zero and disagree across engines).

    Scale: one map-side-combinable aggregate over the QID tuple —
    a single shuffle whose cardinality is the QID-combination count,
    not the row count. At 100 TB this is the cheapest shape in the
    engine; skewed QID combos (one giant nation×segment cell) only
    concentrate combiner output, not raw rows."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(
        cents(F.col("c_acctbal")) * F.lit(1.0) / F.lit(_BAL_BAND_CENTS)
    ).cast("long")
    return (
        c.groupBy("c_nationkey", "c_mktsegment", band.alias("bal_band"))
        .agg(F.count("*").alias("n_rows"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            "n_rows",
            (F.col("n_rows") >= _K_ANON).alias("k_anonymous"),
            (F.lit(1.0) / F.col("n_rows")).alias("reident_risk"),
        )
    )


customer_k_anonymity.__doc__ = customer_k_anonymity.__doc__.format(K=_K_ANON)
