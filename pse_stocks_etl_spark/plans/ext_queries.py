"""Extension queries beyond strict reference parity (SURVEY.md §7 M5 and
the pyspark guide's "common OLAP patterns"): as-of join, distinct/approx
aggregates, percentiles, running/moving windows, CSV source round-trip,
and the remaining small ★ edges (P4 zero-row clone, F5 concat key).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import sql_cents, sql_sum_money, sum_money
from ..sources.catalog import load_table, read_csv_dir
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "asof_click_attribution",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.click_ts <= p.ts
    """,
    tags=("asof-join", "window"),
    bench=True,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (last click before each purchase, per user) — Spark has
    no native ASOF; the scalable plan is a tagged union + last_value
    window: ONE shuffle on user_id, no per-row range probing. The DuckDB
    oracle uses its native ASOF LEFT JOIN — same semantics.

    Tie-break note: DuckDB ASOF picks the single largest click_ts <= ts;
    equal timestamps across different clicks of one user would be
    ambiguous, so the window orders by (ts, is_purchase, click_id) and
    takes the last click strictly by that total order — the events table
    has unique (user_id, ts) in practice (µs timestamps).
    """
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_p")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        "event_id", "user_id", "ts", "is_p",
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast(purchases.schema["ts"].dataType).alias("click_ts"),
    )
    c = clicks.select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        F.col("click_ts").alias("ts"),
        F.lit(0).alias("is_p"),
        "click_id",
        "click_ts",
    )
    u = p.unionByName(c)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "click_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    attributed = (
        u.withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
    )
    return attributed.select(
        "event_id",
        "user_id",
        "ts",
        F.col("last_click_id").alias("click_id"),
        F.col("last_click_ts").alias("click_ts"),
    )


@register(
    "distinct_count_per_key",
    oracle="""
    SELECT l_suppkey AS suppkey,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_suppkey
    """,
    tags=("distinct-agg",),
)
def distinct_count_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-distinct aggregation (Catalyst expands to a single
    multi-pass aggregate)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "approx_distinct_per_key",
    # FULL hash oracle via an error-bound VERDICT (round-4 review item
    # 5): the HLL++ estimates themselves are engine-specific, so the
    # query emits the exact counts plus booleans asserting the sketch
    # landed within its accuracy contract (|approx - exact| <= 2 +
    # exact/10 — rsd=0.02, so the 10% band is a ~5-sigma envelope). The
    # oracle recomputes the exact counts and asserts the verdicts TRUE:
    # a Spark upgrade that broke the sketch would hash-mismatch.
    oracle="""
    SELECT l_suppkey AS suppkey,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           TRUE AS parts_ok, TRUE AS orders_ok
    FROM lineitem GROUP BY l_suppkey
    """,
    tags=("approx-agg", "sketch", "error-bound-verdict"),
)
def approx_distinct_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counts (approx_count_distinct — HLL++): the
    at-scale form of distinct_count_per_key. Sketches merge map-side;
    no distinct shuffle of the full key set. The exact twins computed
    alongside exist to grade the sketch (integer-only error bound →
    deterministic verdict); a pure production plan would drop them."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("ao"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
    return agg.select(
        "suppkey",
        "n_parts",
        "n_orders",
        F.expr("abs(ap - n_parts) <= 2 + n_parts div 10").alias("parts_ok"),
        F.expr("abs(ao - n_orders) <= 2 + n_orders div 10").alias("orders_ok"),
    )


@register(
    "median_price_per_flag",
    oracle=f"""
    SELECT l_returnflag AS returnflag,
           (quantile_cont({sql_cents('l_extendedprice')}, 0.5) / 100.0) AS median_price,
           (quantile_cont({sql_cents('l_extendedprice')}, 0.75) / 100.0) AS p75_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("percentile",),
)
def median_price_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`). Interpolation runs on integer CENTS at dyadic
    quantiles (0.5, 0.75): every intermediate is an exact dyadic double,
    so both engines produce bit-identical results regardless of their
    interpolation formula — rounding on raw doubles splits at .xx5
    boundaries (observed: 52724.24 vs 52724.25)."""
    from ..functions.money import cents

    li = _t(spark, sf_dir, "lineitem")
    c = cents(F.col("l_extendedprice"))
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        (F.percentile(c, 0.5) / 100.0).alias("median_price"),
        (F.percentile(c, 0.75) / 100.0).alias("p75_price"),
    )


@register(
    "csv_roundtrip_counts",
    oracle="""
    SELECT l_returnflag AS returnflag, COUNT(*) AS n,
           CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
    FROM lineitem WHERE l_linenumber = 1 GROUP BY l_returnflag
    """,
    tags=("S4", "csv"),
)
def csv_roundtrip_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: schema'd CSV directory scan (reference deltalake_sync.py:229;
    the engine never uses inferSchema — SURVEY.md §7.4). The query writes
    a lossless (int/string) slice to CSV staging, reads it back through
    read_csv_dir, and aggregates; the oracle computes straight from
    parquet — equality proves the CSV path is faithful."""
    from pyspark.sql import types as T

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    slice_df = li.select("l_orderkey", "l_returnflag")
    # one staging dir per process, overwritten on every call — repeated
    # bench/parity invocations must not leak a new /tmp dir each time
    tmp = getattr(csv_roundtrip_counts, "_staging_dir", None)
    if tmp is None:
        tmp = tempfile.mkdtemp(prefix="csv_stage_")
        csv_roundtrip_counts._staging_dir = tmp
    slice_df.write.mode("overwrite").csv(os.path.join(tmp, "stage"), header=True)
    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
        ]
    )
    back = read_csv_dir(spark, os.path.join(tmp, "stage", "*.csv"), schema)
    return back.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count("*").alias("n"), F.sum("l_orderkey").alias("key_sum")
    )


@register(
    "concat_key_distinct",
    oracle="""
    SELECT COUNT(DISTINCT (l_orderkey || '::' || l_linenumber)) AS n_keys
    FROM lineitem
    """,
    tags=("F5",),
)
def concat_key_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: string-concat composite key (the reference synthesizes
    `symbol||'::'||date`, bigquery_dml__upsert_daily_stock_price.sql:20 —
    the engine prefers true multi-column keys, this op exists for
    compatibility)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct(
            F.concat_ws("::", F.col("l_orderkey"), F.col("l_linenumber"))
        ).alias("n_keys")
    )


@register(
    "empty_relation_clone",
    oracle="SELECT o_orderkey, o_orderstatus FROM orders WHERE FALSE",
    tags=("P4",),
)
def empty_relation_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: zero-row typed clone (`WHERE False` staging-schema trick,
    bigquery_dml__ingest_daily_stock_price.sql:2-3) — limit(0) keeps the
    schema and costs nothing (Catalyst folds it to an empty relation)."""
    o = _t(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderstatus").limit(0)


@register(
    "running_total_per_customer",
    oracle=f"""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           (SUM({sql_cents('o_totalprice')}) OVER (
              PARTITION BY o_custkey
              ORDER BY o_orderdate NULLS LAST, o_orderkey
              ROWS UNBOUNDED PRECEDING) / 100.0) AS running_total
    FROM orders
    """,
    tags=("window", "running-agg"),
)
def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per key (cumulative window; cents math keeps the
    running doubles exact on both engines)."""
    from ..functions.money import cents

    o = _t(spark, sf_dir, "orders")
    # NULLS LAST pinned on both engines (Spark's ASC default is
    # nulls-FIRST, DuckDB's nulls-LAST — a NULL orderdate row slotted
    # at opposite ends of the running sum; tests/test_null_tpch_parity)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc_nulls_last(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        (F.sum(cents(F.col("o_totalprice"))).over(w) / 100.0).alias("running_total"),
    )


@register(
    "moving_avg_price",
    oracle=f"""
    SELECT l_suppkey AS suppkey, l_orderkey AS orderkey, l_linenumber AS linenumber,
           (SUM({sql_cents('l_extendedprice')}) OVER w
            / (COUNT(*) OVER w) / 100.0) AS moving_avg
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate NULLS LAST, l_orderkey, l_linenumber,
                          l_extendedprice NULLS LAST, l_partkey,
                          l_quantity NULLS LAST
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "moving-agg"),
)
def moving_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average per key (rows-frame window; integer-cents
    numerator and exact row counts → cross-engine float parity).

    Ordering note: (l_orderkey, l_linenumber) is NOT unique in the
    synthetic data (456,861 distinct of 600,000 rows at sf0.1 — keys
    repeat across suppliers, and one (suppkey, shipdate, orderkey,
    linenumber) tuple even duplicates), so the window order extends to
    the value columns; remaining ties are full-row duplicates, which
    cannot change any rows-frame aggregate."""
    from ..functions.money import cents

    li = _t(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(
            F.col("l_shipdate").asc_nulls_last(),
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").asc_nulls_last(),
            "l_partkey",
            F.col("l_quantity").asc_nulls_last(),
        )
        .rowsBetween(-6, 0)
    )
    return li.select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        (
            F.sum(cents(F.col("l_extendedprice"))).over(w) / F.count("*").over(w) / 100.0
        ).alias("moving_avg"),
    )


@register(
    "json_extract_props",
    # json_valid + TRY_CAST mirror the plan's NULL-on-bad-input
    # contract: DuckDB's json_extract_string ERRORS on malformed JSON
    # and a plain CAST errors on non-numeric values, where Spark's
    # get_json_object returns NULL and try_cast absorbs the rest — a
    # regenerated feed with one bad props row must degrade identically
    # on both engines, not crash either (tests/test_null_events_parity
    # carries the hostile rows).
    oracle="""
    WITH k AS (
      SELECT event_type,
             TRY_CAST(CASE WHEN json_valid(props)
                           THEN json_extract_string(props, '$.k') END
                      AS BIGINT) AS kv
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(kv) AS BIGINT) AS k_sum,
           MAX(kv) AS k_max
    FROM k GROUP BY event_type
    """,
    tags=("json",),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (get_json_object —
    JVM-side Jackson parse, no UDF) + integer aggregation. At scale,
    prefer from_json with an explicit schema once per pipeline stage;
    get_json_object re-parses per call but needs no schema. Bad input
    degrades to NULL, never an error: get_json_object NULLs malformed
    JSON and missing keys, try_cast NULLs non-integer values (a plain
    cast THROWS under ANSI mode, Spark 4's default — one junk props
    row would kill the whole scan)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").try_cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum(k).alias("k_sum"), F.max(k).alias("k_max")
    )


@register(
    "emb_centroid_per_label",
    oracle="""
    WITH u AS (
      SELECT label, dim - 1 AS dim,
             CAST(round(v * 1000000) AS BIGINT) AS vq
      FROM (SELECT label, unnest(embedding::DOUBLE[]) AS v,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings)
    )
    SELECT label, dim,
           (SUM(vq) * 1.0 / COUNT(*) / 1000000.0) AS centroid_val,
           COUNT(*) AS n_vecs
    FROM u GROUP BY label, dim
    """,
    tags=("llm", "similarity", "centroid"),
)
def emb_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid via posexplode + (label, dim) groupBy
    — the distributed mean-vector plan (k-means assignment step shape).
    Components are quantized to integer micro-units before summing so
    the reduction is order-independent and hash-matches the oracle
    exactly (raw float sums would differ by summation order)."""
    e = _emb_table(spark, sf_dir)
    vq = F.round(F.col("v") * 1_000_000).cast("long")
    return (
        e.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v"))
        .select("label", "dim", vq.alias("vq"))
        .groupBy("label", "dim")
        .agg(
            (F.sum("vq") * 1.0 / F.count("*") / 1_000_000.0).alias("centroid_val"),
            F.count("*").alias("n_vecs"),
        )
    )


def _emb_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


@register(
    "sql_api_top_nations",
    oracle=f"""
    SELECT n.n_name AS nation, COUNT(DISTINCT c.c_custkey) AS n_customers,
           {sql_sum_money('o.o_totalprice')} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    HAVING COUNT(*) >= 5
    """,
    tags=("sql-api", "J5", "having"),
)
def sql_api_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front-end surface: temp views + spark.sql text (reference
    pattern: createOrReplaceTempView at spark_deltalake_sync.py:139).
    Catalyst produces the same plan as the DataFrame API — this query
    exists to keep the SQL entry path exercised, HAVING included."""
    from ..sources.catalog import register_views

    register_views(spark, sf_dir, tables=("orders", "customer", "nation"))
    return spark.sql(
        """
        SELECT n.n_name AS nation, COUNT(DISTINCT c.c_custkey) AS n_customers,
               -- 100.0D: in Spark SQL text a bare 100.0 is a DECIMAL
               -- literal (the DataFrame API's /100.0 is a double) — the
               -- D suffix keeps the division in double like every other
               -- money aggregate.
               (SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0D) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        HAVING COUNT(*) >= 5
        """
    )


@register(
    "pandas_median_per_segment",
    oracle="""
    SELECT c_mktsegment AS mktsegment,
           (quantile_cont(CAST(round(c_acctbal * 100) AS BIGINT), 0.5) / 100.0)
             AS median_acctbal,
           COUNT(*) AS n
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("applyInPandas", "grouped-map"),
)
def pandas_median_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (applyInPandas): per-group computation in
    Arrow-batched pandas — the engine's escape hatch for per-group logic
    built-ins can't express. The demo computes an interpolated median on
    integer cents (numpy's linear interpolation at q=0.5 is exact dyadic
    arithmetic, so it matches DuckDB quantile_cont bit-for-bit — same
    rule as median_price_per_flag). At scale this shuffles once on the
    group key; each group must fit one executor's memory."""
    import numpy as np
    import pandas as pd

    c = _t(spark, sf_dir, "customer")

    def median_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # dropna BEFORE the int64 cast: a NULL acctbal arrives as NaN,
        # and NaN.astype(int64) is garbage (-9.2e18 cents) — quantile
        # over the non-null values only, NULL when none, matching
        # quantile_cont (tests/test_null_tpch_parity.py)
        vals = pdf["c_acctbal"].dropna().to_numpy()
        if len(vals):
            cents_vals = np.round(vals * 100).astype("int64")
            med = float(np.quantile(cents_vals, 0.5, method="linear")) / 100.0
        else:
            med = None
        return pd.DataFrame(
            {
                "mktsegment": [pdf["c_mktsegment"].iloc[0]],
                "median_acctbal": [med],
                "n": [len(pdf)],
            }
        )

    return (
        c.select("c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(
            median_group, schema="mktsegment string, median_acctbal double, n long"
        )
    )


@register(
    "session_window_native",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new,
             {sql_cents('value')} AS vc
      FROM events WHERE ts IS NOT NULL
    ),
    s AS (
      SELECT user_id, ts, vc,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n,
           (SUM(vc) / 100.0) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
    tags=("session-window", "streaming-analog"),
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (gap-based session assignment inside
    the aggregation operator — usable identically in batch and
    Structured Streaming). The oracle derives the same sessions with the
    portable lag+cumsum construction, which also pins the semantics:
    session_start == min(ts) of the gap-connected component."""
    from ..functions.money import cents

    # ts IS NOT NULL on both engines: sessions are defined over rows
    # WITH event time (tests/test_null_events_parity.py pins the class)
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("win"))
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            "n",
            "sum_value",
        )
    )


@register(
    "salted_hot_key_agg",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n, {sql_sum_money('value')} AS sum_value
    FROM events GROUP BY event_type
    """,
    tags=("skew", "salted-agg"),
)
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation: events has only 5 event types — every row
    of a hot key would hit one reducer. The salted two-phase plan
    (operators/skew.py) aggregates on (key, salt) first, spreading each
    hot key over 16 reducers, then combines partials. Same result as the
    direct groupBy (the oracle computes it directly) — that equality IS
    the correctness property of salting."""
    from ..functions.money import cents
    from ..operators.skew import salted_sum_count

    ev = _t(spark, sf_dir, "events")
    out = salted_sum_count(
        ev,
        keys=("event_type",),
        sum_exprs={"sum_cents": cents(F.col("value"))},
        buckets=16,
    )
    return out.select(
        "event_type", "n", (F.col("sum_cents") / 100.0).alias("sum_value")
    )


@register(
    "except_lapsed_customers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
    """,
    tags=("set-ops", "except"),
)
def except_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): customers active before 2001 and never
    after — the set-op surface beyond the reference's union-all (Spark
    plans it as a left-anti join + distinct)."""
    o = _t(spark, sf_dir, "orders")
    before = o.filter(F.col("o_orderdate") < "2001-01-01").select(
        F.col("o_custkey").alias("custkey")
    )
    after = o.filter(F.col("o_orderdate") >= "2001-01-01").select(
        F.col("o_custkey").alias("custkey")
    )
    return before.subtract(after)


@register(
    "cube_order_stats",
    oracle=f"""
    SELECT o_orderstatus AS orderstatus, o_orderpriority AS orderpriority,
           COUNT(*) AS n, {sql_sum_money('o_totalprice')} AS sum_total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING COUNT(*) > 0  -- see rollup_orders: Spark emits no grand row on empty input
    """,
    tags=("cube",),
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations (rollup's superset)."""
    o = _t(spark, sf_dir, "orders")
    return o.cube(
        F.col("o_orderstatus").alias("orderstatus"),
        F.col("o_orderpriority").alias("orderpriority"),
    ).agg(F.count("*").alias("n"), sum_money(F.col("o_totalprice")).alias("sum_total"))


@register(
    "unpivot_event_counts",
    oracle="""
    WITH p AS (
      SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'click') AS click,
             COUNT(*) FILTER (WHERE event_type = 'view') AS view
      FROM events GROUP BY user_id
    )
    SELECT user_id, 'click' AS event_type, click AS n FROM p
    UNION ALL
    SELECT user_id, 'view', view FROM p
    """,
    tags=("unpivot", "melt"),
)
def unpivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide → long) via the native unpivot operator —
    the inverse of pivot_event_counts."""
    ev = _t(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view"])
        .count()
        .select(
            "user_id",
            F.coalesce(F.col("click"), F.lit(0)).alias("click"),
            F.coalesce(F.col("view"), F.lit(0)).alias("view"),
        )
    )
    return wide.unpivot("user_id", ["click", "view"], "event_type", "n")


@register(
    "array_agg_user_profile",
    # NULL-proof on both sides (r4 ADVICE): Spark's collect_set DROPS
    # NULL elements while DuckDB's list(DISTINCT ...) KEEPS one, so the
    # oracle filters NULLs explicitly — the two stay aligned even if the
    # testdata ever gains NULL event_type rows.
    oracle="""
    WITH sets AS (
      SELECT user_id,
             coalesce(list(DISTINCT event_type) FILTER (event_type IS NOT NULL),
                      []) AS types
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(types) AS BIGINT) AS n_types,
           coalesce(array_to_string(list_sort(types), ','), '') AS profile
    FROM sets
    """,
    tags=("array-agg", "collect"),
)
def array_agg_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/string aggregation: per-user DISTINCT event-type set,
    sorted before emission — collect_set order is partition-dependent,
    so sort_array makes the result deterministic and oracle-comparable
    (same rule as every other tie-break in this engine). The array is
    built and exercised in-plan (collect_set → sort_array) but emitted
    as scalars (size + joined string): the driver's canonicalizer
    sorts result columns with pandas, which cannot order list values —
    CORRECTNESS_r03 `unhashable type: 'list'`."""
    ev = _t(spark, sf_dir, "events")
    types = F.sort_array(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        F.size(types).cast("long").alias("n_types"),
        F.array_join(types, ",").alias("profile"),
    )


@register(
    "grouping_sets_revenue",
    oracle=f"""
    SELECT o_orderstatus AS orderstatus, o_orderpriority AS orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           COUNT(*) AS n, {sql_sum_money('o_totalprice')} AS sum_total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    HAVING COUNT(*) > 0  -- see rollup_orders: Spark emits no grand row on empty input
    """,
    tags=("grouping-sets",),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the primitive rollup/cube desugar into),
    via the SQL front-end — per-status totals, per-priority totals, and
    the grand total in one pass. GROUPING() flags disambiguate a NULL
    data value from a subtotal row; one shuffle, expand-then-aggregate,
    same plan shape Catalyst gives rollup/cube."""
    from ..sources.catalog import register_views

    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        f"""
        SELECT o_orderstatus AS orderstatus, o_orderpriority AS orderpriority,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               COUNT(*) AS n,
               (SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0D) AS sum_total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "range_interval_user_stats",
    oracle=f"""
    SELECT event_id, user_id, ts,
           (SUM({sql_cents('value')}) OVER w_range / 100.0) AS sum_30m,
           COUNT(*) OVER w_range AS n_30m,
           ({sql_cents('value')} - lag({sql_cents('value')}) OVER w_seq) / 100.0
             AS delta_prev,
           lead(event_id) OVER w_seq AS next_event_id
    FROM events
    WHERE ts IS NOT NULL
    WINDOW
      w_range AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW),
      w_seq AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window-range", "lead-lag"),
)
def range_interval_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window (trailing 30 minutes by VALUE range, not
    row count — rows-frames undercount sparse users) + lag/lead
    navigation. The range frame orders by epoch-microseconds computed
    with wall-clock NTZ arithmetic (functions/datetime.py — session-tz
    functions would shift under the driver's unknown timezone). Money
    through integer cents for exact float parity."""
    from ..functions.datetime import epoch_micros
    from ..functions.money import cents

    # NULL event time is excluded from time-ordered frames on both
    # engines (Spark sorts NULLS FIRST, DuckDB NULLS LAST — the frame
    # contents would silently differ on a regenerated feed)
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    vc = cents(F.col("value"))
    w_range = (
        Window.partitionBy("user_id")
        .orderBy(epoch_micros("ts"))
        .rangeBetween(-1_800_000_000, 0)
    )
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.sum(vc).over(w_range) / 100.0).alias("sum_30m"),
        F.count("*").over(w_range).alias("n_30m"),
        ((vc - F.lag(vc).over(w_seq)) / 100.0).alias("delta_prev"),
        F.lead("event_id").over(w_seq).alias("next_event_id"),
    )


@register(
    "window_rank_suite",
    oracle=f"""
    WITH spend AS (
      SELECT c.c_mktsegment AS mktsegment, c.c_custkey AS custkey,
             {sql_sum_money('o.o_totalprice')} AS total_spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, c.c_custkey
    )
    SELECT mktsegment, custkey, total_spend,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cdist,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM spend
    WINDOW w AS (PARTITION BY mktsegment
                 ORDER BY total_spend DESC, custkey ASC)
    """,
    tags=("window-rank",),
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function suite (rank / dense_rank / percent_rank /
    cume_dist / ntile) over per-segment customer spend. The window
    order is a total order (spend DESC, custkey ASC) so every rank —
    including the rational percent_rank/cume_dist doubles — is
    deterministic and hash-exact across engines."""
    from ..functions.money import sum_money

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("c_custkey").alias("custkey"),
        )
        .agg(sum_money(F.col("o_totalprice")).alias("total_spend"))
    )
    w = Window.partitionBy("mktsegment").orderBy(
        F.col("total_spend").desc(), F.col("custkey").asc()
    )
    return spend.select(
        "mktsegment",
        "custkey",
        "total_spend",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "approx_quantile_per_key",
    # FULL hash oracle via a RANK-error verdict (round-4 review item 5).
    # The GK estimate is engine-specific, but its contract is exact and
    # integer-checkable: the returned value's rank within the group must
    # sit inside [p - tol, p + tol]. The plan counts rows <= / < the
    # estimate (pure integers, tie-robust) and emits booleans; the
    # oracle asserts them TRUE and recomputes the exact dyadic median
    # over integer cents (cross-engine bit-exact, cf.
    # median_price_per_flag).
    oracle=f"""
    SELECT event_type, COUNT(value) AS n,
           (quantile_cont({sql_cents('value')}, 0.5) / 100.0) AS exact_p50,
           TRUE AS p50_ok, TRUE AS p90_ok
    FROM events GROUP BY event_type
    """,
    tags=("approx", "sketch", "error-bound-verdict"),
)
def approx_quantile_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles per key (percentile_approx — the
    Greenwald-Khanna sketch): mergeable partial state, so the shuffle
    moves one bounded sketch per (key, partition) instead of the raw
    values — the scale path when exact percentiles would need a
    per-group sort. With accuracy=10000 the rank error is <= n/10000;
    the verdict allows +-5% of rank (integer arithmetic only: floor /
    ceil via `div`), so any conforming sketch passes and a broken one
    hash-mismatches. The second pass that grades the estimate joins the
    tiny per-key sketch output back broadcast — no extra shuffle of the
    raw rows."""
    ev = _t(spark, sf_dir, "events")
    q = F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.9)), 10_000)
    sk = ev.groupBy("event_type").agg(
        q.getItem(0).alias("a50"), q.getItem(1).alias("a90")
    ).withColumnsRenamed({"event_type": "sk_type"})
    # NULL-SAFE join back: groupBy keeps a NULL event_type group on
    # both engines, but a plain equi-join would silently drop it here
    # (NULL != NULL) — found by tests/test_null_events_parity.py.
    graded = ev.join(
        F.broadcast(sk), F.col("event_type").eqNullSafe(F.col("sk_type"))
    ).drop("sk_type").groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum((F.col("value") <= F.col("a50")).cast("long")).alias("le50"),
        F.sum((F.col("value") < F.col("a50")).cast("long")).alias("lt50"),
        F.sum((F.col("value") <= F.col("a90")).cast("long")).alias("le90"),
        F.sum((F.col("value") < F.col("a90")).cast("long")).alias("lt90"),
        F.expr(f"percentile({sql_cents('value')}, 0.5)").alias("p50c"),
    )
    return graded.select(
        "event_type",
        "n",
        (F.col("p50c") / 100.0).alias("exact_p50"),
        F.expr("le50 >= (9 * n) div 20 AND lt50 <= (11 * n + 19) div 20").alias(
            "p50_ok"
        ),
        F.expr("le90 >= (17 * n) div 20 AND lt90 <= (19 * n + 19) div 20").alias(
            "p90_ok"
        ),
    )


KMV_K = 64
_POW60 = 1 << 60  # hash space size; exact power of two (exact as double)


@register(
    "kmv_distinct_users",
    # Unlike HLL++ (approx_distinct_per_key, engine-specific sketch →
    # rows-only), KMV built on the portable md5 hash is deterministic
    # and cross-engine EXACT: both engines see the same hash values, so
    # the k-th minimum — and therefore the estimate — hash-matches.
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             (('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15)))::BIGINT
               AS hv
      FROM events
    ),
    rk AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h
    ),
    k AS (
      SELECT event_type, count(*) AS n_seen, max(hv) AS kth
      FROM rk WHERE rn <= {KMV_K} GROUP BY event_type
    ),
    e AS (SELECT event_type, count(*) AS exact_distinct FROM h GROUP BY event_type)
    SELECT k.event_type, k.n_seen, k.kth,
           CASE WHEN k.n_seen < {KMV_K} THEN CAST(k.n_seen AS DOUBLE)
                ELSE CAST({KMV_K - 1} AS DOUBLE) * CAST({_POW60} AS DOUBLE)
                     / CAST(k.kth AS DOUBLE)
           END AS est_distinct,
           e.exact_distinct
    FROM k JOIN e ON k.event_type = e.event_type
    """,
    tags=("approx", "sketch", "kmv"),
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al.): per key,
    keep the K smallest 60-bit hashes of the values; the k-th minimum
    estimates distinct count as (K-1)·|H|/kth. Exposes the exact count
    alongside, so the query IS its own accuracy proof.

    Scale: two-phase k-smallest — rank within (key, salt=hv%32) first
    (runs on the shuffled partials, each bounded), then re-rank the
    ≤32·K survivors per key. The K smallest of the union equal the K
    smallest of the per-salt K-smallest, so the result is identical to
    the one-phase oracle while no single task ever ranks a full key's
    hash set. Every float op is a single correctly-rounded IEEE op on
    exactly-representable inputs ((K-1)·2^60 has 6 significant bits)."""
    ev = load_table(spark, sf_dir, "events")
    from ..functions.text import portable_hash64

    h = ev.select(
        "event_type",
        portable_hash64(
            F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))
        ).alias("hv"),
    ).distinct()
    w1 = Window.partitionBy("event_type", F.pmod(F.col("hv"), F.lit(32))).orderBy(
        "hv"
    )
    w2 = Window.partitionBy("event_type").orderBy("hv")
    topk = (
        h.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= KMV_K)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= KMV_K)
    )
    k = topk.groupBy("event_type").agg(
        F.count("*").alias("n_seen"), F.max("hv").alias("kth")
    )
    exact = h.groupBy("event_type").agg(F.count("*").alias("exact_distinct"))
    est = F.when(
        F.col("n_seen") < KMV_K, F.col("n_seen").cast("double")
    ).otherwise(
        F.lit(KMV_K - 1).cast("double")
        * F.lit(_POW60).cast("double")
        / F.col("kth").cast("double")
    )
    return k.join(exact, "event_type").select(
        "event_type", "n_seen", "kth", est.alias("est_distinct"), "exact_distinct"
    )


@register(
    "kmv_set_algebra",
    # KMV sketch ALGEBRA — the property that makes bounded sketches the
    # 100 TB answer for cross-shard distinct arithmetic: two per-key
    # sketches merge (K smallest of the union of the two hash sets)
    # into a sketch of the union, and the Jaccard estimator
    # |M ∩ S_A ∩ S_B| / |M| turns it into an intersection estimate —
    # no re-scan of the raw data. Portable md5 hashing keeps every
    # estimate cross-engine EXACT (same sketches → same kth → same
    # floats), and the exact union/intersection ride along so the
    # query is its own accuracy proof.
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type AS et,
             (('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15)))::BIGINT
               AS hv
      FROM events
    ),
    sk AS (
      SELECT et, hv FROM (
        SELECT et, hv, row_number() OVER (PARTITION BY et ORDER BY hv) AS rn FROM h
      ) WHERE rn <= {KMV_K}
    ),
    pairs AS (
      SELECT a.et AS type_a, b.et AS type_b
      FROM (SELECT DISTINCT et FROM h) a JOIN (SELECT DISTINCT et FROM h) b
        ON a.et < b.et
    ),
    m AS (
      SELECT type_a, type_b, hv, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
        SELECT p.type_a, p.type_b, s.hv, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN sk s ON s.et = p.type_a
        UNION ALL
        SELECT p.type_a, p.type_b, s.hv, 0 AS in_a, 1 AS in_b
        FROM pairs p JOIN sk s ON s.et = p.type_b
      ) GROUP BY type_a, type_b, hv
    ),
    mk AS (
      SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS k_used,
             MAX(hv) AS kth, CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
      FROM (
        SELECT *, row_number() OVER (PARTITION BY type_a, type_b ORDER BY hv) AS rn
        FROM m
      ) WHERE rn <= {KMV_K} GROUP BY type_a, type_b
    ),
    ca AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS c FROM h GROUP BY et),
    ei AS (
      SELECT p.type_a, p.type_b, CAST(COUNT(*) AS BIGINT) AS exact_inter
      FROM pairs p
      JOIN h x ON x.et = p.type_a
      JOIN h y ON y.et = p.type_b AND y.hv = x.hv
      GROUP BY p.type_a, p.type_b
    )
    SELECT mk.type_a, mk.type_b, mk.k_used, mk.kth, mk.n_both,
           CASE WHEN mk.k_used < {KMV_K} THEN CAST(mk.k_used AS DOUBLE)
                ELSE CAST({KMV_K - 1} AS DOUBLE) * CAST({_POW60} AS DOUBLE)
                     / CAST(mk.kth AS DOUBLE)
           END AS est_union,
           (CAST(mk.n_both AS DOUBLE) / CAST(mk.k_used AS DOUBLE))
             * (CASE WHEN mk.k_used < {KMV_K} THEN CAST(mk.k_used AS DOUBLE)
                     ELSE CAST({KMV_K - 1} AS DOUBLE) * CAST({_POW60} AS DOUBLE)
                          / CAST(mk.kth AS DOUBLE)
                END) AS est_inter,
           (ca_a.c + ca_b.c - coalesce(ei.exact_inter, 0)) AS exact_union,
           coalesce(ei.exact_inter, 0) AS exact_inter
    FROM mk
    JOIN ca ca_a ON ca_a.et = mk.type_a
    JOIN ca ca_b ON ca_b.et = mk.type_b
    LEFT JOIN ei ON ei.type_a = mk.type_a AND ei.type_b = mk.type_b
    """,
    tags=("approx", "sketch", "kmv", "set-algebra"),
)
def kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set algebra on merged KMV sketches, per event-type pair:
    |A ∪ B| from the merged sketch's k-th minimum, |A ∩ B| via the
    Jaccard estimator over the merged sketch, with exact counts
    alongside. At scale the per-key sketches are the only thing that
    crosses the wire (K·8 bytes per key per shard, mergeable
    associatively); here the sketch build reuses the two-phase
    k-smallest ranking (no full-key sort on one task) and the pair
    merge operates on ≤2K rows per pair."""
    from ..functions.text import portable_hash64

    ev = load_table(spark, sf_dir, "events")
    # The distinct hash set is a diamond: sketches, type list, exact
    # counts and exact intersections all branch from it (10+ plan
    # references). A lazy localCheckpoint materializes the post-distinct
    # working set ONCE on executor storage and truncates lineage, so
    # every branch — including the broadcast-build jobs — reuses it
    # instead of re-scanning events per reference (12 scans observed
    # without it).
    h = (
        ev.select(
            F.col("event_type").alias("et"),
            portable_hash64(
                F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))
            ).alias("hv"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    # per-type K-smallest, two-phase (cf. kmv_distinct_users)
    w1 = Window.partitionBy("et", F.pmod(F.col("hv"), F.lit(32))).orderBy("hv")
    w2 = Window.partitionBy("et").orderBy("hv")
    sk = (
        h.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= KMV_K)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= KMV_K)
        .select("et", "hv")
    )
    types = h.select("et").distinct()
    pairs = (
        types.alias("a")
        .crossJoin(F.broadcast(types.alias("b")))
        .filter(F.col("a.et") < F.col("b.et"))
        .select(F.col("a.et").alias("type_a"), F.col("b.et").alias("type_b"))
    )
    side_a = pairs.join(F.broadcast(sk), F.col("et") == F.col("type_a")).select(
        "type_a", "type_b", "hv", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    side_b = pairs.join(F.broadcast(sk), F.col("et") == F.col("type_b")).select(
        "type_a", "type_b", "hv", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    m = (
        side_a.unionAll(side_b)
        .groupBy("type_a", "type_b", "hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wm = Window.partitionBy("type_a", "type_b").orderBy("hv")
    mk = (
        m.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").alias("k_used"),
            F.max("hv").alias("kth"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
        )
    )
    ca = h.groupBy("et").agg(F.count("*").alias("c"))
    ei = (
        pairs.join(h.alias("x"), F.col("x.et") == F.col("type_a"))
        .join(
            h.alias("y"),
            (F.col("y.et") == F.col("type_b")) & (F.col("y.hv") == F.col("x.hv")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("exact_inter"))
    )
    est_union = F.when(
        F.col("k_used") < KMV_K, F.col("k_used").cast("double")
    ).otherwise(
        F.lit(KMV_K - 1).cast("double")
        * F.lit(_POW60).cast("double")
        / F.col("kth").cast("double")
    )
    jac = F.col("n_both").cast("double") / F.col("k_used").cast("double")
    return (
        mk.join(F.broadcast(ca.alias("ca_a")), F.col("ca_a.et") == F.col("type_a"))
        .join(F.broadcast(ca.alias("ca_b")), F.col("ca_b.et") == F.col("type_b"))
        .join(F.broadcast(ei), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "k_used",
            "kth",
            "n_both",
            est_union.alias("est_union"),
            (jac * est_union).alias("est_inter"),
            (
                F.col("ca_a.c") + F.col("ca_b.c")
                - F.coalesce(F.col("exact_inter"), F.lit(0))
            ).alias("exact_union"),
            F.coalesce(F.col("exact_inter"), F.lit(0)).alias("exact_inter"),
        )
    )


@register(
    "funnel_stages",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS click_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.signup_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      GROUP BY e.user_id
    )
    SELECT s.user_id, s.signup_ts, c.click_ts, p.purchase_ts,
           CAST(1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT
                AS BIGINT) AS stage
    FROM s LEFT JOIN c ON s.user_id = c.user_id
           LEFT JOIN p ON s.user_id = p.user_id
    """,
    tags=("funnel", "sequence-analytics"),
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (MATCH_RECOGNIZE-lite): per user, the
    earliest signup, the earliest click strictly after it, and the
    earliest purchase strictly after that; `stage` counts how deep the
    user got. Expressed as staged min-aggregations + joins — every
    shuffle keys on user_id, so the three stages co-partition and AQE
    collapses them onto one exchange; no per-user iteration, no window
    over the whole event stream."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "signup_ts",
            "click_ts",
            "purchase_ts",
            (
                F.lit(1)
                + F.col("click_ts").isNotNull().cast("long")
                + F.col("purchase_ts").isNotNull().cast("long")
            ).alias("stage"),
        )
    )


@register(
    "gapfill_locf_daily",
    # The TimescaleDB `time_bucket_gapfill` + `locf` analog: a dense
    # daily spine per key, missing days filled with the last
    # observation carried forward. LOCF carries the stored double
    # untouched (no float arithmetic), so the hash oracle is exact.
    oracle="""
    WITH ranked AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value,
             row_number() OVER (
               PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    ),
    daily AS (SELECT user_id, day, value FROM ranked WHERE rn = 1),
    bounds AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ),
    spine AS (
      SELECT b.user_id, CAST(u.g AS DATE) AS day
      FROM bounds b, UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS u(g)
    )
    SELECT s.user_id, s.day,
           last_value(d.value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
           (d.value IS NULL) AS is_filled
    FROM spine s
    LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
    tags=("timeseries", "gapfill", "locf"),
)
def gapfill_locf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill with last-observation-carried-forward: the
    hypertable rollup shape a daily-price store needs (the reference's
    domain — a trading calendar has holes; downstream consumers want a
    dense series). Last event of each (user, day) by (ts, event_id)
    total order → per-key min/max date spine via sequence+explode →
    left join → `last(value, ignorenulls)` running window.

    Scale: the spine explode is bounded by days-per-key (never a cross
    join against a global calendar); the fill window shuffles once on
    the key and streams with O(1) state per row. No UDFs, no driver
    involvement — a 100 TB tick store gap-fills partition-parallel."""
    from ..operators.dedup import topk_per_group

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("ts").isNotNull()
    )
    daily = topk_per_group(
        ev.select("user_id", F.to_date("ts").alias("day"), "value", "ts", "event_id"),
        keys=("user_id", "day"),
        order_by=(F.col("ts").desc(), F.col("event_id").desc()),
    ).select("user_id", "day", "value")
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("value", ignorenulls=True).over(w).alias("value_locf"),
            F.col("value").isNull().alias("is_filled"),
        )
    )


@register(
    "orc_roundtrip_counts",
    oracle="""
    SELECT o_orderstatus AS orderstatus, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    """,
    tags=("S4", "orc"),
)
def orc_roundtrip_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC staging round-trip (S4 sibling): write a lossless slice to
    ORC, read it back through read_orc_dir with a declared schema,
    aggregate; the oracle computes straight from parquet — equality
    proves the ORC path is faithful. ORC keeps parquet's pushdown and
    pruning (Spark native reader), so the staging hop costs one
    columnar write + one columnar scan at any scale."""
    from pyspark.sql import types as T

    from ..sources.catalog import read_orc_dir

    od = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    slice_df = od.select("o_orderkey", "o_orderstatus")
    tmp = getattr(orc_roundtrip_counts, "_staging_dir", None)
    if tmp is None:
        tmp = tempfile.mkdtemp(prefix="orc_stage_")
        orc_roundtrip_counts._staging_dir = tmp
    slice_df.write.mode("overwrite").orc(os.path.join(tmp, "stage"))
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
        ]
    )
    back = read_orc_dir(spark, os.path.join(tmp, "stage"), schema)
    return back.groupBy(F.col("o_orderstatus").alias("orderstatus")).agg(
        F.count("*").alias("n"), F.sum("o_orderkey").alias("key_sum")
    )


@register(
    "jsonl_roundtrip_stats",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(user_id) AS BIGINT) AS user_sum
    FROM events GROUP BY event_type
    """,
    tags=("S4", "json"),
)
def jsonl_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines staging round-trip (S4 sibling): write an int/string
    slice of events to JSON-lines, read it back through read_json_dir
    with a DECLARED schema (no inference pass — at 100 TB inference
    reads everything twice), aggregate; oracle computes from parquet."""
    from pyspark.sql import types as T

    from ..sources.catalog import read_json_dir

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    tmp = getattr(jsonl_roundtrip_stats, "_staging_dir", None)
    if tmp is None:
        tmp = tempfile.mkdtemp(prefix="jsonl_stage_")
        jsonl_roundtrip_stats._staging_dir = tmp
    ev.write.mode("overwrite").json(os.path.join(tmp, "stage"))
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("user_id", T.LongType(), True),
        ]
    )
    back = read_json_dir(spark, os.path.join(tmp, "stage"), schema)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("user_id").alias("user_sum")
    )


@register(
    "scd2_intervals",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id, event_type AS state, ts AS valid_from,
           lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           CAST(row_number() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
    FROM c WHERE prev IS NULL OR prev <> event_type
    """,
    tags=("scd2", "window", "etl"),
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change log: collapse
    consecutive identical states per key, then derive [valid_from,
    valid_to) intervals with LEAD (open interval = NULL valid_to = the
    current row). The standard warehouse dimension-history pattern.

    Scale: both windows partition by user_id — ONE shuffle; the
    change-filter runs on the first sorted pass and the interval pass
    re-sorts the (much smaller) change set within unchanged partitions.
    Deterministic total order via (ts, event_id); NULL event time is
    excluded on both engines (a versioned state needs a timestamp)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .drop("prev")
    )
    return changed.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
    )


@register(
    "user_interarrival_stats",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id, COUNT(*) AS n_events,
           MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us,
           CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(gap_us) AS DOUBLE)
             AS avg_gap_us
    FROM g GROUP BY user_id
    """,
    tags=("window", "timeseries"),
)
def user_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time statistics per key (event-cadence profiling —
    the feed-health check a market-data operator runs per symbol).

    Determinism: gaps are exact BIGINT microseconds (epoch_micros is
    wall-clock-pure on NTZ); the mean is a SINGLE IEEE division of two
    exactly-representable integers, so it hash-matches cross-engine
    (repeated double summation would not). Single-event keys yield NULL
    min/max/avg in both engines (SUM over an empty gap set is NULL).
    Scale: lag-window and groupBy share the user_id shuffle key."""
    from ..functions.datetime import epoch_micros

    # NULL event time excluded on both engines: its position in the
    # (ts, event_id) order differs (Spark NULLS FIRST, DuckDB default
    # varies), shifting every neighbouring gap.
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_micros("ts")
    g = ev.select("user_id", (us - F.lag(us).over(w)).alias("gap_us"))
    return g.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        (F.sum("gap_us").cast("double") / F.count("gap_us").cast("double")).alias(
            "avg_gap_us"
        ),
    )


@register(
    "wau_rolling_distinct",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM du)
    SELECT days.d AS day, COUNT(DISTINCT du.user_id) AS wau
    FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
    GROUP BY days.d
    """,
    tags=("rolling-distinct", "analytics"),
)
def wau_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day (WAU) — rolling COUNT
    (DISTINCT) has no window form in either engine; the scalable plan
    is a BOUNDED EXPLODE: each distinct (day, user) pair is replicated
    to the <=7 window-end days it feeds, then a plain groupBy
    count_distinct. Expansion factor = window length (a constant), all
    joins equi-joins — no range join, no per-day self-join. The oracle
    uses DuckDB's range join; same semantics. Observed-day filter keeps
    windows anchored on days that exist in the data."""
    ev = _t(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    days = du.select(F.col("d").alias("day")).distinct()
    # explode the 7 window-end offsets, then keep only observed days
    exploded = (
        du.withColumn("off", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .withColumn("day", F.expr("date_add(d, off)"))
        .join(F.broadcast(days), "day")
    )
    return exploded.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )


@register(
    "weekly_ohlc_bars",
    oracle="""
    WITH b AS (
      SELECT l_suppkey, CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
             l_orderkey, l_linenumber, l_extendedprice, l_quantity
      FROM lineitem
    ),
    wk AS (
      SELECT *, DATE '1970-01-05'
               + CAST(7 * ((d - DATE '1970-01-05') // 7) AS INT) AS week_start
      FROM b
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY l_suppkey, week_start
               ORDER BY d, l_orderkey, l_linenumber) AS ra,
             row_number() OVER (PARTITION BY l_suppkey, week_start
               ORDER BY d DESC, l_orderkey DESC, l_linenumber DESC) AS rd
      FROM wk
    )
    SELECT l_suppkey AS suppkey, week_start,
           MAX(CASE WHEN ra = 1 THEN l_extendedprice END) AS open_price,
           MAX(l_extendedprice) AS high_price,
           MIN(l_extendedprice) AS low_price,
           MAX(CASE WHEN rd = 1 THEN l_extendedprice END) AS close_price,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS volume,
           COUNT(*) AS n_trades
    FROM r GROUP BY 1, 2
    """,
    tags=("timeseries", "resample", "ohlc"),
)
def weekly_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample a daily price feed to weekly OHLC bars (the resample
    every market-data store exposes; reference domain: daily_stock_price
    rollups). open/close = argmin/argmax by a unique (day, orderkey,
    linenumber) total order; high/low = plain MIN/MAX; volume = integer
    sum.

    Week bucketing is session-timezone-free DATE arithmetic anchored on
    Monday 1970-01-05 (date_trunc('week') on NTZ would route through
    the session zone). The whole thing is ONE aggregation with map-side
    partial combine — min_by/max_by over a struct key instead of the
    oracle's two ranked window passes, so the shuffle carries one row
    per (task, suppkey, week). Spark plans it sort-based (the struct
    agg buffer is not hash-mutable) but the sort is on grouping keys
    within each task, not a global window sort."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.to_date("l_shipdate").alias("d"),
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_quantity",
    )
    wk = li.withColumn(
        "week_start",
        F.expr(
            "date_add(DATE '1970-01-05', "
            "CAST(7 * (datediff(d, DATE '1970-01-05') div 7) AS INT))"
        ),
    )
    key = F.struct("d", "l_orderkey", "l_linenumber")
    return wk.groupBy(
        F.col("l_suppkey").alias("suppkey"), "week_start"
    ).agg(
        F.min_by("l_extendedprice", key).alias("open_price"),
        F.max("l_extendedprice").alias("high_price"),
        F.min("l_extendedprice").alias("low_price"),
        F.max_by("l_extendedprice", key).alias("close_price"),
        F.sum(F.col("l_quantity").cast("long")).alias("volume"),
        F.count("*").alias("n_trades"),
    )


@register(
    "value_histogram",
    oracle=f"""
    WITH b AS (
      SELECT ({sql_cents('value')} // 1000) AS bin, value FROM events
    )
    SELECT bin, CAST(bin * 10.0 AS DOUBLE) AS lo,
           CAST((bin + 1) * 10.0 AS DOUBLE) AS hi,
           COUNT(*) AS n, {sql_sum_money('value')} AS sum_value
    FROM b GROUP BY bin
    """,
    tags=("histogram", "analytics"),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram ($10 buckets) over a money column — the
    width_bucket/histogram primitive every BI layer asks for, computed
    as one hash aggregate (integer bucket key from exact cents, so the
    bin edges are deterministic; a double division would put .xx5
    boundary values in different bins per engine). Bin edges are exact
    single IEEE multiplications of small integers."""
    from ..functions.money import cents

    ev = _t(spark, sf_dir, "events")
    bin_col = F.floor(cents(F.col("value")) / 1000)
    return (
        ev.groupBy(bin_col.alias("bin"))
        .agg(F.count("*").alias("n"), sum_money(F.col("value")).alias("sum_value"))
        .select(
            "bin",
            (F.col("bin") * 10.0).cast("double").alias("lo"),
            ((F.col("bin") + 1) * 10.0).cast("double").alias("hi"),
            "n",
            "sum_value",
        )
    )


@register(
    "vwap_weekly",
    oracle=f"""
    WITH b AS (
      SELECT l_suppkey,
             CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
             {sql_cents('l_extendedprice')} AS c,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
    ),
    wk AS (
      SELECT *, DATE '1970-01-05'
               + CAST(7 * ((d - DATE '1970-01-05') // 7) AS INT) AS week_start
      FROM b
    )
    SELECT l_suppkey AS suppkey, week_start,
           CAST(SUM(c * q) AS DOUBLE) / CAST(100 * SUM(q) AS DOUBLE) AS vwap,
           CAST(SUM(q) AS BIGINT) AS total_qty
    FROM wk GROUP BY 1, 2
    """,
    tags=("timeseries", "vwap"),
)
def vwap_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per symbol-week — the standard
    execution benchmark in market data. Numerator and denominator are
    EXACT integer sums (cents x quantity), combined by one IEEE
    division, so the result hash-matches cross-engine (a SUM over
    price*qty doubles would depend on summation order). One hash
    aggregate with map-side partial combine; same Monday-anchored
    tz-free week bucketing as weekly_ohlc_bars."""
    from ..functions.money import cents

    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.to_date("l_shipdate").alias("d"),
        cents(F.col("l_extendedprice")).alias("c"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    wk = li.withColumn(
        "week_start",
        F.expr(
            "date_add(DATE '1970-01-05', "
            "CAST(7 * (datediff(d, DATE '1970-01-05') div 7) AS INT))"
        ),
    )
    return wk.groupBy(F.col("l_suppkey").alias("suppkey"), "week_start").agg(
        (
            F.sum(F.col("c") * F.col("q")).cast("double")
            / (F.lit(100) * F.sum("q")).cast("double")
        ).alias("vwap"),
        F.sum("q").alias("total_qty"),
    )


@register(
    "rolling_volatility",
    oracle=f"""
    WITH ranked AS (
      SELECT l_suppkey,
             CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
             {sql_cents('l_extendedprice')} AS c,
             row_number() OVER (
               PARTITION BY l_suppkey, CAST(date_trunc('day', l_shipdate) AS DATE)
               ORDER BY l_orderkey DESC, l_linenumber DESC) AS rn
      FROM lineitem WHERE l_shipdate IS NOT NULL
    ),
    daily AS (SELECT l_suppkey, d, c FROM ranked WHERE rn = 1),
    rets AS (
      SELECT l_suppkey, d,
             c - lag(c) OVER (PARTITION BY l_suppkey ORDER BY d) AS ret
      FROM daily
    ),
    acc AS (
      SELECT l_suppkey, d,
             CAST(COUNT(ret) OVER w AS BIGINT) AS n_obs,
             CAST(SUM(ret) OVER w AS BIGINT) AS s1,
             CAST(SUM(ret * ret) OVER w AS BIGINT) AS s2
      FROM rets
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY d
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT l_suppkey AS suppkey, d AS day, n_obs,
           CASE WHEN n_obs > 0 THEN
             CAST(n_obs * s2 - s1 * s1 AS DOUBLE)
               / CAST(n_obs * n_obs AS DOUBLE)
           END AS var_cents2
    FROM acc
    """,
    tags=("timeseries", "volatility", "window"),
)
def rolling_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 20-observation variance of daily price changes per symbol
    (the volatility input to any risk model), with EXACT cross-engine
    parity: rolling Σx and Σx² are integer-cents window sums, and the
    population variance (n·Σx² − (Σx)²)/n² is formed from exact BIGINTs
    with one IEEE division. The engines' own var_pop/stddev are
    Welford-style accumulations whose rounding is order-dependent and
    never hash-matches (same trick as value_zscore_outliers).

    Scale: daily close (argmax within day), LAG, and both rolling sums
    all share the suppkey partition key — ONE shuffle, streaming O(1)
    window state per frame.

    NULL policy: a NULL ship date cannot sit on a time axis — filtered
    on both sides (it slotted at opposite ends of the date-ordered
    windows, shifting every trailing frame for that supplier;
    tests/test_null_tpch_parity.py)."""
    from ..functions.money import cents

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").isNotNull())
        .select(
            "l_suppkey",
            F.to_date("l_shipdate").alias("d"),
            cents(F.col("l_extendedprice")).alias("c"),
            "l_orderkey",
            "l_linenumber",
        )
    )
    daily = li.groupBy("l_suppkey", "d").agg(
        F.max_by("c", F.struct("l_orderkey", "l_linenumber")).alias("c")
    )
    wd = Window.partitionBy("l_suppkey").orderBy("d")
    rets = daily.select(
        "l_suppkey", "d", (F.col("c") - F.lag("c").over(wd)).alias("ret")
    )
    wf = wd.rowsBetween(-19, 0)
    acc = rets.select(
        "l_suppkey",
        "d",
        F.count("ret").over(wf).alias("n_obs"),
        F.sum("ret").over(wf).alias("s1"),
        F.sum(F.col("ret") * F.col("ret")).over(wf).alias("s2"),
    )
    num = F.col("n_obs") * F.col("s2") - F.col("s1") * F.col("s1")
    var = F.when(
        F.col("n_obs") > 0,
        num.cast("double") / (F.col("n_obs") * F.col("n_obs")).cast("double"),
    )
    return acc.select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("d").alias("day"),
        "n_obs",
        var.alias("var_cents2"),
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH om AS (
      SELECT o_custkey,
             (year(o_orderdate) * 12 + (month(o_orderdate) - 1)) AS m
      FROM orders
    ),
    first_m AS (SELECT o_custkey, MIN(m) AS m0 FROM om GROUP BY o_custkey)
    SELECT CAST(f.m0 // 12 AS BIGINT) AS cohort_year,
           CAST(f.m0 % 12 + 1 AS BIGINT) AS cohort_month,
           CAST(o.m - f.m0 AS BIGINT) AS month_offset,
           COUNT(DISTINCT o.o_custkey) AS n_customers
    FROM om o JOIN first_m f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2, 3
    """,
    tags=("cohort", "analytics"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: customers grouped by first-order month,
    counted per month offset — the standard product-analytics rollup.
    Month indices are pure integer arithmetic (year*12+month), immune
    to session timezone and date-diff semantics differences.

    Scale: first-order month is a groupBy on custkey, joined back on
    the same key (co-partitioned — AQE plans one shuffle for both
    sides), then a low-cardinality (cohort, offset) distinct count."""
    om = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + (F.month("o_orderdate") - 1)).alias("m"),
    )
    first_m = om.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    joined = om.join(first_m, "o_custkey")
    return joined.groupBy(
        (F.col("m0") / 12).cast("long").alias("cohort_year"),
        (F.col("m0") % 12 + 1).cast("long").alias("cohort_month"),
        (F.col("m") - F.col("m0")).cast("long").alias("month_offset"),
    ).agg(F.countDistinct("o_custkey").alias("n_customers"))


def _profile_oracle_piece(col: str, kind: str) -> str:
    """DuckDB twin of operators/profiling.py::_repr_col per type."""
    if kind == "double":
        mn = f"CAST(CAST(round(MIN({col}) * 100) AS BIGINT) AS VARCHAR)"
        mx = f"CAST(CAST(round(MAX({col}) * 100) AS BIGINT) AS VARCHAR)"
    elif kind == "timestamp":
        mn = f"CAST(epoch_us(MIN({col})) AS VARCHAR)"
        mx = f"CAST(epoch_us(MAX({col})) AS VARCHAR)"
    else:
        mn = f"CAST(MIN({col}) AS VARCHAR)"
        mx = f"CAST(MAX({col}) AS VARCHAR)"
    return f"""
    SELECT '{col}' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT({col}) AS n_nulls,
           COUNT(DISTINCT {col}) AS n_distinct,
           {mn} AS min_repr, {mx} AS max_repr
    FROM orders"""


_PROFILE_COLS = [
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "double"),
    ("o_orderdate", "timestamp"),
    ("o_orderpriority", "string"),
]


@register(
    "table_profile",
    # One UNION ALL branch per profiled column: DuckDB recomputes the
    # same six metrics per column that the Spark plan derives in its
    # single-pass aggregation. repr strings are canonical per type
    # (ints/strings verbatim, doubles as integer cents, timestamps as
    # tz-free epoch micros) so min/max hash-match bit-for-bit.
    oracle=" UNION ALL ".join(
        _profile_oracle_piece(c, k) for c, k in _PROFILE_COLS
    ),
    tags=("profiling", "data-quality"),
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of the orders table in ONE scan
    (operators/profiling.py): row count, null count, exact distinct
    count, canonical min/max reprs — the pre-flight check a pipeline
    runs on every new data drop. The oracle pays one scan per column;
    the engine pays one total (Catalyst expand covers the per-column
    distincts), which is the whole point of the operator at 100 TB."""
    from ..operators.profiling import profile_table

    return profile_table(
        _t(spark, sf_dir, "orders"), [c for c, _ in _PROFILE_COLS]
    )


@register(
    "user_time_weighted_avg",
    # TimescaleDB `time_weight('locf')` analog: each observation is
    # weighted by how long it stayed current (gap to the next event,
    # exact integer MICROSECONDS via tz-free NTZ arithmetic). All
    # accumulation is integer (cents x micros stays < 2^63 for a
    # year-scale key span); the two IEEE divisions at the end are
    # written identically in both engines.
    oracle="""
    WITH g AS (
      SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             datediff('microsecond', ts,
                      LEAD(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)) AS gap
      FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(gap) AS BIGINT) AS micros_observed,
           ((CAST(SUM(cents * gap) AS DOUBLE) / CAST(SUM(gap) AS DOUBLE))
            / 100.0) AS tw_avg
    FROM g GROUP BY user_id
    """,
    tags=("timeseries", "time-weighted", "locf"),
)
def user_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted (LOCF-integral) average value per user: irregular
    samples weighted by their holding duration — the correct mean for
    state-like series (a price that held for 3 days counts 3x a price
    that held for 1). Single-event users emit NULL (zero observed time)
    rather than a fake average.

    Scale: one window pass partitioned by user_id (10k+ keys — no
    5-key event_type skew), then a groupBy on the SAME key: AQE plans
    one shuffle for both. Tie-broken by event_id so replays are
    deterministic. NULL event time is excluded on both engines (a
    holding duration from an unknown instant is undefined)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.lead("ts").over(w).alias("next_ts"),
        "ts",
    ).withColumn(
        "gap", F.expr("timestampdiff(MICROSECOND, ts, next_ts)")
    )
    agg = g.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("cents") * F.col("gap")).alias("sum_cg"),
        F.sum("gap").alias("micros_observed"),
    )
    return agg.select(
        "user_id",
        "n_events",
        "micros_observed",
        (
            (
                F.col("sum_cg").cast("double")
                / F.col("micros_observed").cast("double")
            )
            / F.lit(100.0)
        ).alias("tw_avg"),
    )


CMS_D = 4  # hash rows
CMS_W = 1024  # counters per row


@register(
    "cms_heavy_hitters",
    # Count-Min sketch, cross-engine EXACT like the KMV queries: the
    # counter matrix is pure md5 arithmetic, so both engines build the
    # SAME sketch and the point estimates hash-match. The classic CMS
    # guarantees ride along as integer verdicts: estimates never
    # undercount (over_ok) and overcount by at most d*N/W against the
    # single-row Markov bound (bound_ok) — with exact counts alongside,
    # the query is its own accuracy proof.
    oracle=f"""
    WITH base AS (
      SELECT user_id FROM events
    ),
    keyed AS (
      SELECT b.user_id, u.r,
             (('0x' || substr(md5('cms:' || CAST(u.r AS VARCHAR) || ':'
                                  || CAST(b.user_id AS VARCHAR)), 1, 15)))::BIGINT
               % {CMS_W} AS col
      FROM base b, UNNEST(range(0, {CMS_D})) AS u(r)
    ),
    counters AS (
      SELECT r, col, CAST(COUNT(*) AS BIGINT) AS c FROM keyed GROUP BY r, col
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM base GROUP BY user_id
      ORDER BY exact_cnt DESC, user_id ASC LIMIT 20
    ),
    est AS (
      SELECT e.user_id, e.exact_cnt, MIN(c.c) AS cms_est
      FROM exact e, UNNEST(range(0, {CMS_D})) AS u(r)
      JOIN counters c
        ON c.r = u.r
       AND c.col = (('0x' || substr(md5('cms:' || CAST(u.r AS VARCHAR) || ':'
                                  || CAST(e.user_id AS VARCHAR)), 1, 15)))::BIGINT
                   % {CMS_W}
      GROUP BY e.user_id, e.exact_cnt
    )
    SELECT est.user_id, est.exact_cnt, est.cms_est,
           (est.cms_est >= est.exact_cnt) AS over_ok,
           (est.cms_est <= est.exact_cnt + (tot.n // {CMS_W})) AS bound_ok
    FROM est, tot
    """,
    tags=("approx", "sketch", "count-min", "heavy-hitters"),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters: a d x w counter sketch over user_id,
    point-estimating the top-20 users' event counts. At 100 TB the
    sketch is the whole point — d*w counters (4 KiB here) per shard,
    merged by cell-wise addition, answer frequency queries no matter
    how many distinct keys the feed carries; the exact per-key twin
    computed alongside exists only to grade the estimates.

    Plan shape: ONE map-side-combinable groupBy builds the counters
    (explode factor d), the candidate set is 20 rows, and the estimate
    join broadcasts the 4096-row counter table — no shuffle of the raw
    rows beyond the counter build."""
    from ..functions.text import portable_hash64

    ev = load_table(spark, sf_dir, "events").select("user_id")

    def col_for(r: F.Column | int, uid: F.Column) -> F.Column:
        r_str = (
            F.lit(str(r)) if isinstance(r, int) else r.cast("string")
        )
        return F.pmod(
            portable_hash64(
                F.concat(F.lit("cms:"), r_str, F.lit(":"), uid.cast("string"))
            ),
            F.lit(CMS_W),
        )

    rows = F.explode(
        F.array(*[F.lit(r) for r in range(CMS_D)])
    ).alias("r")
    keyed = ev.select("user_id", rows).select(
        "r", col_for(F.col("r"), F.col("user_id")).alias("col")
    )
    counters = keyed.groupBy("r", "col").agg(F.count("*").alias("c"))
    # total rides as a broadcast 1-row frame: no eager driver-side count
    total = ev.agg(F.count("*").alias("n"))
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("user_id").asc())
        .limit(20)
    )
    cand = exact.select(
        "user_id",
        "exact_cnt",
        F.explode(F.array(*[F.lit(r) for r in range(CMS_D)])).alias("r"),
    ).select(
        "user_id",
        "exact_cnt",
        "r",
        col_for(F.col("r"), F.col("user_id")).alias("col"),
    )
    est = (
        cand.join(F.broadcast(counters), ["r", "col"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.crossJoin(F.broadcast(total)).select(
        "user_id",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") >= F.col("exact_cnt")).alias("over_ok"),
        F.expr(f"cms_est <= exact_cnt + n div {CMS_W}").alias("bound_ok"),
    )
