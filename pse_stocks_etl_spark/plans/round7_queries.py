"""Round-7 queries: gaps-and-islands, sweep-line concurrency,
multi-touch attribution, robust (MAD) outliers, Benford digit audit,
referential-integrity audit, CUSUM changepoint, strict ordered funnel,
per-key mode, weighted sampling, and linear-interpolation gap-fill.

Analytics surfaces a warehouse user expects beyond plain rollups
(SURVEY.md §2 extensions). Every query is DataFrame-native (no Python
UDFs) and carries a FULL value-hash DuckDB oracle. Determinism rules
are repo-wide (functions/money.py, functions/text.py):

- money/aggregation arithmetic in integer cents (exact, order-free);
- ranking ties broken by a total order on both sides;
- float output columns are either pure stored values or single
  BIGINT/BIGINT divisions (one correctly-rounded IEEE op — identical
  in Spark and DuckDB);
- quantiles computed over INTEGERS so linear interpolation lands on
  exact .5/.25 steps (`a + (b-a)*f` == `(a+b)/2` bit-exactly), then
  doubled/quadrupled into BIGINTs before any cross-engine compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import sql_cents
from ..functions.text import portable_hash64, sql_portable_hash64
from ..sources.catalog import load_table
from .registry import register

_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


# --------------------------------------------------------------------------
# Gaps-and-islands: per-user activity streaks
# --------------------------------------------------------------------------
@register(
    "user_activity_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events WHERE ts IS NOT NULL
    ),
    anchored AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', day)
               - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS island
      FROM days
    ),
    islands AS (
      SELECT user_id, island, COUNT(*) AS len
      FROM anchored GROUP BY user_id, island
    )
    SELECT user_id, COUNT(*) AS n_streaks,
           MAX(len) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM islands GROUP BY user_id
    """,
    tags=("gaps-and-islands", "streaks", "window"),
)
def user_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user via
    the classic daynum-minus-row_number anchor (consecutive days share
    one anchor; any gap starts a new island). Emits per user the streak
    count, the longest streak, and total active days.

    Scale: one distinct on (user, day) — map-side combinable — then a
    user-partitioned window (row_number streams, O(1) state) and two
    same-key groupBys that AQE stacks on one exchange. No joins, no
    skew risk beyond a single user's day count (bounded by calendar).
    NULL event time is excluded on both engines (its island anchor
    would shift every later streak's row_number)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = days.select(
        "user_id",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("island"),
    )
    islands = anchored.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    return islands.groupBy("user_id").agg(
        F.count("*").alias("n_streaks"),
        F.max("len").alias("longest_streak"),
        F.sum("len").cast("long").alias("active_days"),
    )


# --------------------------------------------------------------------------
# Sweep-line: max concurrent click-TTL intervals per day
# --------------------------------------------------------------------------
_TTL = "INTERVAL 30 MINUTES"
_TTL_SQL = "INTERVAL 30 MINUTE"


@register(
    "click_max_concurrency",
    oracle=f"""
    WITH clicks AS (
      SELECT ts AS s, ts + {_TTL_SQL} AS e,
             CAST(date_trunc('day', ts) AS DATE) + INTERVAL 1 DAY AS m
      FROM events WHERE event_type = 'click'
    ),
    segs AS (
      SELECT s, LEAST(e, m) AS e, CAST(date_trunc('day', s) AS DATE) AS day
      FROM clicks
      UNION ALL
      SELECT m AS s, e, CAST(m AS DATE) AS day FROM clicks WHERE e > m
    ),
    pts AS (
      SELECT day, s AS t, 1 AS delta FROM segs
      UNION ALL
      SELECT day, e AS t, -1 AS delta FROM segs
    ),
    run AS (
      SELECT day,
             SUM(delta) OVER (
               PARTITION BY day ORDER BY t, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM pts
    )
    SELECT day, CAST(MAX(c) AS BIGINT) AS max_concurrent
    FROM run GROUP BY day
    """,
    tags=("sweep-line", "intervals", "concurrency"),
)
def click_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum concurrent live click sessions per day (each click opens
    a 30-minute half-open interval), computed with the sweep-line
    +1/-1 trick: interval endpoints become delta points, a running sum
    ordered by (t, delta) — closes before opens at equal t, matching
    half-open semantics — traces the concurrency curve, and the per-day
    max is the answer.

    Scale: intervals are split at midnight so every point belongs to
    exactly one day partition — the sweep window is partition-parallel
    by day instead of one global sort. At higher volume the same split
    refines to hour keys; the TTL bounds a segment to at most two
    partitions. The oracle replays the identical construction in SQL
    (DuckDB has no native interval-overlap aggregate either)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(_TTL)).alias("e"),
        (F.to_date("ts") + F.expr("INTERVAL 1 DAY")).alias("m"),
    )
    first_seg = clicks.select(
        "s", F.least("e", "m").alias("e"), F.to_date("s").alias("day")
    )
    spill_seg = clicks.filter(F.col("e") > F.col("m")).select(
        F.col("m").alias("s"), "e", F.to_date("m").alias("day")
    )
    segs = first_seg.unionByName(spill_seg)
    pts = segs.select("day", F.col("s").alias("t"), F.lit(1).alias("delta")).unionByName(
        segs.select("day", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("day", F.sum("delta").over(w).alias("c"))
    return run.groupBy("day").agg(F.max("c").cast("long").alias("max_concurrent"))


# --------------------------------------------------------------------------
# Multi-touch attribution: purchases split equally over prior clicks
# --------------------------------------------------------------------------
_ATTR_WINDOW_S = 6 * 3600


@register(
    "purchase_touch_attribution",
    # The oracle is the straight range join; the Spark plan buckets it.
    # share_value = cents / (n*100): one BIGINT/BIGINT IEEE division,
    # bit-identical in both engines.
    oracle=f"""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS pts,
             {sql_cents("value")} AS pcents
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'
    ),
    touched AS (
      SELECT p.purchase_id, p.user_id, p.pcents, COUNT(*) AS n_touch
      FROM p JOIN c ON p.user_id = c.user_id
       AND c.cts <= p.pts AND c.cts > p.pts - INTERVAL {_ATTR_WINDOW_S} SECOND
      GROUP BY 1, 2, 3
    )
    SELECT purchase_id, user_id, n_touch,
           (pcents / (n_touch * 100)) AS share_value
    FROM touched
    """,
    tags=("attribution", "range-join", "binning"),
    bench=True,  # scale-representative range-join shape
)
def purchase_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) multi-touch attribution: each purchase's
    value is divided equally across the user's clicks in the 6 hours
    before it; emits per attributed purchase its touch count and the
    per-click share.

    Scale: the pure range predicate would be a per-user nested loop;
    instead both sides carry a 6-hour epoch bucket and purchases
    explode to the two candidate buckets (their own + previous), so
    the join is hash-on-(user, bucket) with the exact predicate as a
    post-filter — per-bucket cost bounded by click density, the same
    lossless rewrite as range_join_binned. A click's bucket is unique,
    so no pair can match twice."""
    ev = _t(spark, sf_dir, "events")
    sec = lambda c: F.expr(f"timestampdiff(SECOND, {_EPOCH}, {c})")  # noqa: E731
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
        _cents("value").alias("pcents"),
        F.explode(
            F.array(
                (sec("ts") / _ATTR_WINDOW_S).cast("long") - 1,
                (sec("ts") / _ATTR_WINDOW_S).cast("long"),
            )
        ).alias("bucket"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("cts"),
        (sec("ts") / _ATTR_WINDOW_S).cast("long").alias("bucket"),
    )
    touched = (
        p.join(c, (p.user_id == c.c_user_id) & (p.bucket == c.bucket))
        .filter(
            (F.col("cts") <= F.col("pts"))
            & (F.col("cts") > F.col("pts") - F.expr(f"INTERVAL {_ATTR_WINDOW_S} SECONDS"))
        )
        .groupBy("purchase_id", "user_id", "pcents")
        .agg(F.count("*").alias("n_touch"))
    )
    return touched.select(
        "purchase_id",
        "user_id",
        "n_touch",
        (F.col("pcents") / (F.col("n_touch") * 100)).alias("share_value"),
    )


# --------------------------------------------------------------------------
# Robust outliers: median / MAD fences per event type
# --------------------------------------------------------------------------
@register(
    "value_mad_outliers",
    # med2 = 2*median(cents), mad4 = 2*median(2*|x-med|) = 4*MAD: both
    # exact BIGINTs (quantiles of integers interpolate on .5 steps).
    # Outlier test |x-med| > 3.5*1.4826*MAD in pure integers:
    # 20000*dev2 > 51891*mad4.
    oracle=f"""
    WITH v AS (
      SELECT event_type, {sql_cents("value")} AS cents FROM events
    ),
    med AS (
      SELECT event_type,
             CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS med2
      FROM v GROUP BY event_type
    ),
    dev AS (
      SELECT v.event_type, v.cents, m.med2,
             abs(2 * v.cents - m.med2) AS dev2
      FROM v JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type,
             CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, COUNT(*) AS n,
           CAST(SUM(CASE WHEN 20000 * d.dev2 > 51891 * a.mad4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           (MAX(d.med2) / 200.0) AS median_value,
           (MAX(a.mad4) / 400.0) AS mad_value
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY d.event_type
    """,
    tags=("robust-stats", "mad", "outliers"),
)
def value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median + MAD (median
    absolute deviation) fences at the standard 3.5 modified-z cutoff
    (|x - med| > 3.5 * 1.4826 * MAD). MAD resists the heavy tail that
    wrecks mean/stddev z-scores — the robust twin of
    value_zscore_outliers.

    All comparisons run in scaled integers (dev2 = 2|x-med| cents,
    mad4 = 4*MAD cents; cutoff 20000*dev2 > 51891*mad4 since
    3.5*1.4826 = 5.1891) so the verdict is exact on both engines.

    Scale: two grouped exact quantiles over integers (Spark sorts per
    group in-partition after a key shuffle) with the tiny per-type
    stats rejoined via broadcast; rows stream through the final
    aggregation once. Event-type cardinality is small by nature, so
    the medians' per-group sort is the only super-linear step and it
    partitions cleanly."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select("event_type", _cents("value").alias("cents"))
    med = v.groupBy("event_type").agg(
        (2 * F.percentile("cents", F.lit(0.5))).cast("long").alias("med2")
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "cents",
        "med2",
        F.abs(2 * F.col("cents") - F.col("med2")).alias("dev2"),
    )
    mad = dev.groupBy("event_type").agg(
        (2 * F.percentile("dev2", F.lit(0.5))).cast("long").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(20000 * F.col("dev2") > 51891 * F.col("mad4"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            (F.max("med2") / 200.0).alias("median_value"),
            (F.max("mad4") / 400.0).alias("mad_value"),
        )
    )


# --------------------------------------------------------------------------
# Benford first-digit audit on order totals
# --------------------------------------------------------------------------
_BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
                6: 66947, 7: 57992, 8: 51153, 9: 45757}


@register(
    "benford_first_digit",
    # First significant digit via the integer-cents STRING — no
    # log10/pow float edge cases near powers of ten. share is one
    # BIGINT/BIGINT division; expected_ppm is a shared literal table.
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST({sql_cents("o_totalprice")} AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders
    )
    SELECT digit, COUNT(*) AS n,
           (COUNT(*) / (SELECT COUNT(*) FROM orders)) AS share,
           CASE digit {' '.join(f'WHEN {k} THEN {v}' for k, v in _BENFORD_PPM.items())}
           END AS expected_ppm
    FROM d GROUP BY digit
    """,
    tags=("benford", "data-quality", "audit"),
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit: distribution of the first significant digit
    of order totals against the expected log10(1+1/d) frequencies
    (shared literal ppm table — fraud/entry-error screens compare the
    two). The digit comes from the integer-cents decimal string, which
    sidesteps log10/pow float behavior near powers of ten entirely.

    Scale: one map-side-combinable 9-group aggregation plus a scalar
    count broadcast — nothing shuffles more than 9 rows after the
    partial agg."""
    orders = _t(spark, sf_dir, "orders")
    total = orders.groupBy().count().select(F.col("count").alias("n_total"))
    digit = F.substring(_cents("o_totalprice").cast("string"), 1, 1).cast("long")
    expected = F.create_map(
        *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
    )
    return (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            (F.col("n") / F.col("n_total")).alias("share"),
            expected[F.col("digit")].alias("expected_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Referential-integrity audit across the star schema
# --------------------------------------------------------------------------
_FK_EDGES = [
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
]


@register(
    "fk_orphan_audit",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{rel}' AS relationship,
           COUNT(*) AS n_child,
           CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphan
    FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}
    """
        for rel, child, fk, parent, pk in _FK_EDGES
    ),
    tags=("data-quality", "referential-integrity", "audit"),
)
def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: for every foreign-key edge of the
    star schema, the child row count and how many children point at a
    missing parent (orphans). The verdict a pipeline needs before
    trusting joins downstream — silent orphans turn inner joins into
    row loss.

    Scale: each edge is one left join keyed on the FK followed by a
    count — the join shuffles child-side by the key it already joins
    on downstream, so a bucketed layout makes the audit shuffle-free.
    Parent keys are primary keys (unique), so the left join cannot
    inflate the child count."""
    out = None
    for rel, child, fk, parent, pk in _FK_EDGES:
        c = _t(spark, sf_dir, child).select(F.col(fk).alias("k"))
        p = _t(spark, sf_dir, parent).select(F.col(pk).alias("pk"))
        audit = (
            c.join(p, c.k == p.pk, "left")
            .agg(
                F.count("*").alias("n_child"),
                F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphan"),
            )
            .select(F.lit(rel).alias("relationship"), "n_child", "n_orphan")
        )
        out = audit if out is None else out.unionByName(audit)
    return out


# --------------------------------------------------------------------------
# CUSUM changepoint: the day each event type's level shifted most
# --------------------------------------------------------------------------
@register(
    "daily_cusum_shift",
    # cusum_scaled = ndays*cumsum - idx*total keeps the classic
    # CUSUM-vs-mean statistic in pure BIGINTs (multiply through by
    # ndays instead of subtracting the fractional mean per day).
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM({sql_cents("value")}) AS d_cents
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, day,
             COUNT(*) OVER (PARTITION BY event_type) AS ndays,
             SUM(d_cents) OVER (PARTITION BY event_type) AS total,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS idx,
             SUM(d_cents) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cums
      FROM daily
    )
    SELECT event_type, day AS shift_day,
           CAST(ndays * cums - idx * total AS BIGINT) AS cusum_scaled,
           CAST(ndays AS BIGINT) AS ndays
    FROM cum
    QUALIFY row_number() OVER (
      PARTITION BY event_type
      ORDER BY abs(ndays * cums - idx * total) DESC, day) = 1
    """,
    tags=("changepoint", "cusum", "timeseries"),
)
def daily_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan: per event type, the observed day where
    the cumulative deviation from the series mean peaks — the classic
    single-changepoint location statistic. The statistic is scaled by
    ndays (cusum*ndays = ndays*cumsum - idx*total) so it stays in
    exact integers; ties resolve to the earliest day.

    Scale: one daily pre-aggregation (map-side combinable), then
    event-type-partitioned windows whose running state is O(1) per
    row; series length per type is bounded by the calendar, so the
    per-partition sort is tiny regardless of raw event volume.
    NULL event time is excluded on both engines — a NULL day's
    position in the cumulative ORDER BY differs between Spark's
    NULLS FIRST and DuckDB's default, reshaping every running sum
    (caught as an intermittent matrix failure)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (
        ev.select("event_type", F.to_date("ts").alias("day"), _cents("value").alias("c"))
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("d_cents"))
    )
    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("day")
    cum = daily.select(
        "event_type",
        "day",
        F.count("*").over(wp).alias("ndays"),
        F.sum("d_cents").over(wp).alias("total"),
        F.row_number().over(wo).alias("idx"),
        F.sum("d_cents")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cums"),
    ).select(
        "event_type",
        "day",
        "ndays",
        (F.col("ndays") * F.col("cums") - F.col("idx") * F.col("total")).alias(
            "cusum_scaled"
        ),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.col("day")
    )
    return (
        cum.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("shift_day"),
            F.col("cusum_scaled").cast("long").alias("cusum_scaled"),
            F.col("ndays").cast("long").alias("ndays"),
        )
    )


# --------------------------------------------------------------------------
# Strict ordered funnel with per-step 24h deadline
# --------------------------------------------------------------------------
@register(
    "funnel_strict_24h",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS vts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS cts
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.vts
      WHERE e.event_type = 'click'
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS pts
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.cts
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT COUNT(*) AS n_viewers,
           CAST(SUM(CASE WHEN c.cts <= v.vts + INTERVAL 24 HOUR
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_click_24h,
           CAST(SUM(CASE WHEN c.cts <= v.vts + INTERVAL 24 HOUR
                          AND p.pts <= c.cts + INTERVAL 24 HOUR
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_24h
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
    tags=("funnel", "ordered", "analytics"),
)
def funnel_strict_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel with step deadlines: first view → first
    click AFTER that view → first purchase AFTER that click, each step
    within 24 hours of the previous. Unlike funnel_stages (unordered
    presence), the order constraint means a click before the first
    view does not count — the product-analytics semantics.

    Scale: three user-keyed groupBys chained by joins on the same key
    — AQE plans the chain on one partitioning; every aggregation is
    min(), map-side combinable. The final count is a single-row agg."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("cts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    day = "INTERVAL 24 HOURS"
    click_ok = F.col("cts") <= F.col("vts") + F.expr(day)
    purch_ok = click_ok & (F.col("pts") <= F.col("cts") + F.expr(day))
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("*").alias("n_viewers"),
            F.sum(F.when(click_ok, 1).otherwise(0)).cast("long").alias("n_click_24h"),
            F.sum(F.when(purch_ok, 1).otherwise(0)).cast("long").alias("n_purchase_24h"),
        )
    )


# --------------------------------------------------------------------------
# Mode (most frequent value) per key, deterministic tie-break
# --------------------------------------------------------------------------
@register(
    "mode_event_per_user",
    oracle="""
    SELECT user_id, event_type AS top_event_type, COUNT(*) AS n
    FROM events
    GROUP BY user_id, event_type
    QUALIFY row_number() OVER (
      PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type NULLS LAST) = 1
    """,
    tags=("mode", "topk-per-group"),
)
def mode_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user mode of event_type with a total-order tie-break
    (highest count, then lexicographically first type) — `mode()`
    built-ins in both engines leave ties implementation-defined, so
    the deterministic form is groupBy + rank, the repo-wide rule.

    Scale: count per (user, type) is map-side combinable; the pick
    window re-partitions by user only — type cardinality per user is
    tiny, so the window sort is O(types) per user."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    # NULLS LAST explicitly: Spark's ASC default is nulls-FIRST while
    # DuckDB's is nulls-LAST, so a tied NULL event_type won the mode on
    # one engine only (tests/test_null_events_parity.py). Policy: a
    # NULL type never beats a real one.
    pick = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc_nulls_last()
    )
    return (
        counts.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_event_type"), "n")
    )


# --------------------------------------------------------------------------
# Weighted Bernoulli sampling of documents, pure-integer verdict
# --------------------------------------------------------------------------
_W_PPM = 1_000_000


@register(
    "docs_weighted_sample",
    # Keep doc iff u_ppm * max_w < n_chars * 1e6 — all BIGINT, so the
    # inclusion verdict is exact on both engines (no float u, no pow).
    oracle=f"""
    SELECT doc_id, n_chars,
           ({sql_portable_hash64("text")} % {_W_PPM}) AS u_ppm
    FROM documents
    WHERE ({sql_portable_hash64("text")} % {_W_PPM})
            * (SELECT MAX(n_chars) FROM documents)
          < n_chars * {_W_PPM}
    """,
    tags=("sampling", "weighted", "deterministic"),
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic length-weighted Bernoulli sample: each document is
    kept with probability n_chars / max(n_chars), decided by a
    content-derived uniform (portable md5 hash mod 1e6) compared in
    cross-multiplied integers — replayable on any engine, no RNG state,
    no floats. The long-document-favoring sampler a mixture builder
    uses when length should drive inclusion odds (complement of the
    equal-odds docs_uniform_sample).

    Scale: embarrassingly parallel scan + one broadcast scalar
    (max weight); selection never shuffles. The same cross-multiply
    generalizes to any weight column with a known cap."""
    docs = _t(spark, sf_dir, "documents")
    maxw = docs.agg(F.max("n_chars").alias("max_w"))
    u = (portable_hash64(F.col("text")) % _W_PPM).alias("u_ppm")
    return (
        docs.select("doc_id", "n_chars", u)
        .crossJoin(F.broadcast(maxw))
        .filter(F.col("u_ppm") * F.col("max_w") < F.col("n_chars") * _W_PPM)
        .select("doc_id", "n_chars", "u_ppm")
    )


# --------------------------------------------------------------------------
# Calendar gap-fill with LINEAR interpolation (LOCF's exact sibling)
# --------------------------------------------------------------------------
@register(
    "gapfill_interp_daily",
    # Interpolated value = (prev*(den-num) + next*num) / (den*100):
    # integer numerator and denominator, one IEEE division — exact on
    # both engines. Observed days emit cents/100.0 directly.
    oracle="""
    WITH ranked AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(round(value * 100) AS BIGINT) AS cents,
             row_number() OVER (
               PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ),
    daily AS (SELECT user_id, day, cents FROM ranked WHERE rn = 1),
    bounds AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ),
    spine AS (
      SELECT b.user_id, CAST(u.g AS DATE) AS day
      FROM bounds b, UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS u(g)
    ),
    anch AS (
      SELECT s.user_id, s.day, d.cents,
             last_value(d.cents IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
             last_value(CASE WHEN d.cents IS NOT NULL THEN s.day END
                        IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(d.cents IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
             first_value(CASE WHEN d.cents IS NOT NULL THEN s.day END
                         IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM spine s
      LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    )
    SELECT user_id, day,
           CASE WHEN cents IS NOT NULL THEN cents / 100.0
                ELSE (pc * (date_diff('day', pd, nd)
                            - date_diff('day', pd, day))
                      + nc * date_diff('day', pd, day))
                     / (date_diff('day', pd, nd) * 100)
           END AS value_interp,
           (cents IS NULL) AS is_filled
    FROM anch
    """,
    tags=("timeseries", "gapfill", "interpolation"),
)
def gapfill_interp_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill with linear interpolation between the
    surrounding observations — the `interpolate` sibling of
    gapfill_locf_daily (same daily spine; interior gaps take the
    distance-weighted blend of the neighboring observed days). The
    spine spans min..max observed day per user, so every filled row
    has both anchors by construction.

    The blend is computed as an integer numerator over an integer
    denominator (cents * day-distances), so the emitted double is one
    correctly-rounded division on both engines — exact parity without
    banning fractional results.

    Scale: identical shape to LOCF — per-key bounded spine explode,
    one user-partitioned window pass for both anchor directions
    (running state O(1) per row), no UDFs."""
    from ..operators.dedup import topk_per_group

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = topk_per_group(
        ev.select(
            "user_id",
            F.to_date("ts").alias("day"),
            _cents("value").alias("cents"),
            "ts",
            "event_id",
        ),
        keys=("user_id", "day"),
        order_by=(F.col("ts").desc(), F.col("event_id").desc()),
    ).select("user_id", "day", "cents")
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("cents").isNotNull(), F.col("day"))
    anch = (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            "cents",
            F.last("cents", ignorenulls=True).over(wb).alias("pc"),
            F.last(obs_day, ignorenulls=True).over(wb).alias("pd"),
            F.first("cents", ignorenulls=True).over(wf).alias("nc"),
            F.first(obs_day, ignorenulls=True).over(wf).alias("nd"),
        )
    )
    num = F.datediff(F.col("day"), F.col("pd"))
    den = F.datediff(F.col("nd"), F.col("pd"))
    interp = (F.col("pc") * (den - num) + F.col("nc") * num) / (den * 100)
    return anch.select(
        "user_id",
        "day",
        F.when(F.col("cents").isNotNull(), F.col("cents") / 100.0)
        .otherwise(interp)
        .alias("value_interp"),
        F.col("cents").isNull().alias("is_filled"),
    )


# --------------------------------------------------------------------------
# PPJoin-style prefix-filtered similarity join (second candidate path
# beside the df-cap and MinHash-LSH strategies in llm_queries)
# --------------------------------------------------------------------------
PREFIX_JACCARD_T = 0.5  # threshold; prefix length = sz - ceil(t*sz) + 1


@register(
    "docs_prefix_jaccard_pairs",
    # Independent oracle: ALL shared-shingle pairs with exact Jaccard
    # >= t (2*i >= union in integers) — no prefix construction on the
    # oracle side, so a candidate lost by a wrong prefix is a hash
    # mismatch, proving the filter lossless (the PPJoin guarantee).
    oracle=None,  # set below (needs llm_queries' shingle SQL)
    tags=("llm", "dedup-near", "prefix-filter", "ppjoin"),
)
def docs_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-Jaccard near-dup pairs (word-3-gram shingles, J >= 0.5)
    via PPJoin-style PREFIX FILTERING: order each doc's shingles by
    (global document-frequency asc, shingle asc) and keep only the
    first sz - ceil(t*sz) + 1 as its prefix; two docs can reach J >= t
    ONLY if their prefixes share a shingle (the prefix-filter theorem),
    so the candidate join runs over prefixes — rare shingles — instead
    of full sets or capped sets. Exact verification then touches
    candidates only.

    This is the third candidate-generation strategy beside the df-cap
    self-join (docs_ngram_jaccard_pairs) and MinHash-LSH
    (docs_minhash_lsh_pairs): unlike the df-cap it is LOSSLESS for all
    pairs, and unlike LSH it has no false negatives by construction.

    Scale: the df table is a map-side-combinable agg; the per-doc
    prefix pick is a doc-partitioned window (no global sort); the
    candidate join's cost is Σ prefix-df² — prefixes are the RAREST
    shingles, so hot boilerplate never enters the join. Verification
    joins the (small) candidate list against the shared persisted
    shingle working set."""
    from .llm_queries import _shingles_cached

    sh = _shingles_cached(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "sh")
    pref = (
        sh.join(dfreq, "sh")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        .filter(F.col("rn") <= F.col("sz") - F.expr("(sz + 1) div 2") + 1)
        .select("doc_id", "sh", "sz")
    )
    pa_, pb = pref.alias("a"), pref.alias("b")
    # Length filter (the PPJoin size condition): J >= t forces
    # t*|A| <= |B| <= |A|/t, i.e. 2*sz_b >= sz_a AND 2*sz_a >= sz_b at
    # t=0.5 — candidates between very different-sized docs are pruned
    # inside the join condition, in exact integers.
    cand = (
        pa_.join(
            pb,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (2 * F.col("b.sz") >= F.col("a.sz"))
            & (2 * F.col("a.sz") >= F.col("b.sz")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    a = sh.withColumnsRenamed({"doc_id": "doc_a"})
    b = sh.withColumnsRenamed({"doc_id": "doc_b"})
    common = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.withColumnsRenamed({"doc_id": "doc_a", "sz": "sz_a"})
    sb = sizes.withColumnsRenamed({"doc_id": "doc_b", "sz": "sz_b"})
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_union", F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
        .filter(2 * F.col("n_common") >= F.col("n_union"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            "n_union",
            (F.col("n_common") / F.col("n_union")).alias("jaccard"),
        )
    )


def _set_prefix_jaccard_oracle() -> None:
    from .llm_queries import _SQL_SHINGLE_H
    from .registry import REGISTRY

    REGISTRY["docs_prefix_jaccard_pairs"].oracle = f"""
    WITH sh AS ({_SQL_SHINGLE_H}),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    it AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           CAST(sa.n + sb.n - n_common AS BIGINT) AS n_union,
           (n_common / (sa.n + sb.n - n_common)) AS jaccard
    FROM it JOIN sz sa ON it.doc_a = sa.doc_id
            JOIN sz sb ON it.doc_b = sb.doc_id
    WHERE 2 * n_common >= sa.n + sb.n - n_common
    """


_set_prefix_jaccard_oracle()


# --------------------------------------------------------------------------
# Point-in-time (as-of) enrichment against an SCD2 state log
# --------------------------------------------------------------------------
@register(
    "purchase_state_asof",
    oracle="""
    SELECT user_id, event_id AS purchase_id, ts,
           last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                      IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS state
    FROM events
    WHERE ts IS NOT NULL
    QUALIFY event_type = 'purchase'
    """,
    tags=("scd2", "asof-join", "point-in-time"),
)
def purchase_state_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each purchase tagged with the user's
    state as-of the purchase instant, where the state log is every
    non-purchase event (the SCD2 change stream scd2_intervals builds
    intervals from). Executed as the MERGE-SORTED as-of: states and
    purchases interleave in ONE user-partitioned window ordered by
    (ts, event_id), and `last(state, ignorenulls)` is the as-of value
    — no interval join, no per-row probe, no candidate explosion.

    A purchase before any state row gets NULL state (faithfully kept:
    the point-in-time contract must not invent history).

    Scale: one shuffle on user_id, O(1) running state per row — the
    shape that beats an interval join whenever both sides share a
    partition key; on a 100 TB feed the window streams each user's
    timeline once. NULL event time is excluded on both engines (an
    as-of state at an unknown instant is undefined)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    state_marker = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.last(state_marker, ignorenulls=True).over(w).alias("state"),
        )
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"), "ts", "state")
    )


# --------------------------------------------------------------------------
# Chi-square independence: market segment x order priority
# --------------------------------------------------------------------------
@register(
    "segment_priority_chisq",
    # expected = (row_total*col_total)/grand: BIGINT product, ONE IEEE
    # division; chi2 cell = (n-e)^2/e in +,-,*,/ only — correctly-
    # rounded ops on identical inputs are bit-identical cross-engine
    # (no libm calls anywhere).
    oracle="""
    WITH cells AS (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
             COUNT(*) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT segment, priority, n,
             SUM(n) OVER (PARTITION BY segment) AS row_n,
             SUM(n) OVER (PARTITION BY priority) AS col_n,
             SUM(n) OVER () AS grand
      FROM cells
    )
    SELECT segment, priority, n,
           ((row_n * col_n) / grand) AS expected,
           ((n - (row_n * col_n) / grand) * (n - (row_n * col_n) / grand)
            / ((row_n * col_n) / grand)) AS chi2_cell
    FROM tot
    """,
    tags=("chisq", "statistics", "crosstab"),
)
def segment_priority_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cross-tab: observed vs expected counts
    for customer market segment x order priority, with each cell's
    chi-square contribution (the sum is the test statistic; the cells
    show WHERE dependence lives). Expected counts come from marginal
    window sums over the tiny cell table.

    Scale: one fact-dim join (shuffles on the join key), one grouped
    count, then windows over a segments x priorities cell table —
    bounded by category cardinalities, effectively free. The float
    work is +,-,*,/ on exact integers: correctly-rounded IEEE ops,
    deterministic on any engine."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = cells.select(
        "segment",
        "priority",
        "n",
        F.sum("n").over(Window.partitionBy("segment")).alias("row_n"),
        F.sum("n").over(Window.partitionBy("priority")).alias("col_n"),
        F.sum("n").over(Window.partitionBy()).alias("grand"),
    )
    e = (F.col("row_n") * F.col("col_n")) / F.col("grand")
    return tot.select(
        "segment",
        "priority",
        "n",
        e.alias("expected"),
        ((F.col("n") - e) * (F.col("n") - e) / e).alias("chi2_cell"),
    )


# --------------------------------------------------------------------------
# Pearson correlation from exact integer sufficient statistics
# --------------------------------------------------------------------------
@register(
    "price_quantity_corr",
    # Sufficient statistics are summed EXACTLY (DECIMAL(38,0) /
    # HUGEINT — cents^2 sums overflow BIGINT at scale), cast to double
    # once, then the closed-form corr/slope are +,-,*,/,sqrt on
    # identical doubles — all correctly-rounded IEEE, bit-identical.
    # Built-in corr() is NOT used: its float accumulation is partition-
    # order-dependent.
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(CAST(round(l_quantity) AS BIGINT) AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CAST(round(l_quantity) AS BIGINT) AS HUGEINT)
                      * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
                      * CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS syy,
             CAST(SUM(CAST(CAST(round(l_quantity) AS BIGINT) AS HUGEINT)
                      * CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag AS returnflag, n,
           ((n * sxy - sx * sy)
            / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))) AS corr_qty_price,
           ((n * sxy - sx * sy) / (n * sxx - sx * sx)) AS slope_cents_per_unit
    FROM s
    """,
    tags=("correlation", "statistics", "sufficient-stats"),
)
def price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation and OLS slope of extended price (cents) vs
    quantity per return flag, from EXACT integer sufficient statistics
    (n, Σx, Σy, Σx², Σy², Σxy summed in DECIMAL(38,0) — Σcents²
    overflows BIGINT at warehouse scale) — not the built-in corr(),
    whose floating accumulation is partition-order-dependent and
    engine-divergent. One cast to double per statistic, then the
    closed forms in correctly-rounded IEEE ops only.

    Scale: a single map-side-combinable aggregation — sufficient
    statistics are the textbook distributive form, so the shuffle
    carries 6 numbers per group."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("long")
    y = _cents("l_extendedprice")
    dec = "decimal(38,0)"
    s = li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count("*").alias("n"),
        F.sum(x.cast(dec)).cast("double").alias("sx"),
        F.sum(y.cast(dec)).cast("double").alias("sy"),
        F.sum((x * x).cast(dec)).cast("double").alias("sxx"),
        F.sum((y * y).cast(dec)).cast("double").alias("syy"),
        F.sum((x * y).cast(dec)).cast("double").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "returnflag",
        "n",
        (num / (F.sqrt(vx) * F.sqrt(vy))).alias("corr_qty_price"),
        (num / vx).alias("slope_cents_per_unit"),
    )


# --------------------------------------------------------------------------
# Decile profile via two-phase global rank (no single-partition sort)
# --------------------------------------------------------------------------
_DECILE_BUCKET_CENTS = 10_000  # $100-wide rank buckets


@register(
    "order_value_deciles",
    # Rank-based deciles with an explicit formula (((rn-1)*10)//n + 1)
    # rather than NTILE, whose remainder distribution is engine-
    # specific. The oracle ranks with a plain global window; the Spark
    # plan ranks two-phase — equality proves the decomposition.
    oracle="""
    WITH r AS (
      SELECT o_totalprice,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             row_number() OVER (
               ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                        o_orderkey) AS rn,
             COUNT(*) OVER () AS n
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT CAST((rn - 1) * 10 // n + 1 AS BIGINT) AS decile,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           (SUM(cents) / 100.0) AS sum_price
    FROM r GROUP BY 1
    """,
    tags=("deciles", "two-phase", "global-rank"),
)
def order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value decile profile (count, min/max, exact sum per
    decile) with the global rank computed TWO-PHASE: bucket rows by a
    cents range, prefix-sum the per-bucket counts (a window over the
    tiny bucket table — the only intentionally single-partition step),
    broadcast the offsets back, and rank within buckets. A naive
    `row_number() OVER (ORDER BY price)` collapses the whole table
    onto one reducer — the same decomposition as docs_global_index,
    here keyed by a value range instead of an id range.

    Deciles use the explicit floor formula over (rank-1)*10/n, not
    NTILE (whose remainder allocation is engine-defined).

    NULL policy: a NULL price has no rank — filtered on both sides
    (tests/test_null_tpch_parity.py; a NULL cents bucket would also
    break the broadcast-offset equi-join silently)."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select("o_orderkey", "o_totalprice", _cents("o_totalprice").alias("cents"))
    )
    b = o.withColumn("bucket", F.expr(f"cents DIV {_DECILE_BUCKET_CENTS}"))
    counts = b.groupBy("bucket").agg(F.count("*").alias("cnt"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket",
        F.coalesce(F.sum("cnt").over(wb), F.lit(0)).alias("off"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    win = Window.partitionBy("bucket").orderBy("cents", "o_orderkey")
    ranked = b.join(F.broadcast(offsets), "bucket").withColumn(
        "rn", F.col("off") + F.row_number().over(win)
    )
    decile = ((F.col("rn") - 1) * 10 / F.col("n")).cast("long") + 1
    return (
        ranked.groupBy(decile.alias("decile"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            (F.sum("cents") / 100.0).alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# Share-of-voice: each event type's share of its day's volume
# --------------------------------------------------------------------------
@register(
    "daily_type_share",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT day, event_type, n,
           (n / SUM(n) OVER (PARTITION BY day)) AS day_share
    FROM d
    """,
    tags=("share-of-total", "window"),
)
def daily_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-voice: each event type's fraction of its day's total
    events — the percent-of-total window pattern (one BIGINT/BIGINT
    division per row; exact cross-engine).

    Scale: the window runs over the (day, type) aggregate — calendar x
    type cardinality — not the raw feed; one map-side-combinable
    groupBy then a day-partitioned window on the tiny rollup."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    return d.select(
        "day",
        "event_type",
        "n",
        (F.col("n") / F.sum("n").over(Window.partitionBy("day"))).alias("day_share"),
    )


# --------------------------------------------------------------------------
# Debounce dedup: suppress same-key events within a quiet period
# --------------------------------------------------------------------------
_DEBOUNCE_US = 5_000_000  # 5 seconds


@register(
    "events_debounce",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS gap_us
      FROM events WHERE ts IS NOT NULL
    )
    SELECT event_type, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > {_DEBOUNCE_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= {_DEBOUNCE_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed
    FROM g GROUP BY event_type
    """,
    tags=("dedup", "debounce", "ingestion"),
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce deduplication: an event is KEPT only if the previous
    event of the same (user, type) is more than 5 seconds older — the
    double-click / retry-storm suppressor every ingestion pipeline
    needs (exact-dup dedup misses retries that carry fresh event_ids).
    Reported as per-type kept/suppressed counts.

    The gap compares exact MICROSECOND integers (timestampdiff /
    epoch_us) — a seconds-granularity diff would truncate 5.5s gaps
    into the suppression window.

    Scale: one (user, type)-partitioned window, O(1) lag state per
    row, then a map-side-combinable count — one shuffle each. NULL
    event time is excluded on both engines (a gap from an unknown
    instant is undefined)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.expr(
        f"timestampdiff(MICROSECOND, lag(ts) OVER (PARTITION BY user_id, "
        "event_type ORDER BY ts, event_id), ts)"
    )
    g = ev.select("event_type", gap.alias("gap_us"))
    keep = F.col("gap_us").isNull() | (F.col("gap_us") > _DEBOUNCE_US)
    return g.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(keep.cast("long")).cast("long").alias("n_kept"),
        F.sum((~keep).cast("long")).cast("long").alias("n_suppressed"),
    )


# --------------------------------------------------------------------------
# Week-over-week revenue change (integer-ratio percent change)
# --------------------------------------------------------------------------
@register(
    "weekly_revenue_wow",
    oracle=f"""
    WITH wk AS (
      SELECT DATE '1970-01-05'
               + CAST(7 * ((CAST(o_orderdate AS DATE) - DATE '1970-01-05') // 7)
                      AS INT) AS week_start,
             SUM({sql_cents("o_totalprice")}) AS rev_cents
      FROM orders GROUP BY 1
    )
    SELECT week_start, (rev_cents / 100.0) AS revenue,
           ((rev_cents - lag(rev_cents) OVER (ORDER BY week_start))
             / lag(rev_cents) OVER (ORDER BY week_start)) AS wow_change
    FROM wk
    """,
    tags=("timeseries", "percent-change", "window"),
)
def weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue change: Monday-anchored weekly revenue
    (integer cents) with the percent change as ONE BIGINT/BIGINT
    division — exact cross-engine; first week's change is NULL, kept.

    Scale: the lag window is global but runs over the WEEKLY rollup —
    rows bounded by the calendar (decades of weeks fit one partition),
    after a map-side-combinable weekly aggregation of the fact table."""
    o = _t(spark, sf_dir, "orders")
    week = F.expr(
        "date_add(DATE '1970-01-05', "
        "CAST(7 * (datediff(to_date(o_orderdate), DATE '1970-01-05') div 7) AS INT))"
    )
    wk = o.groupBy(week.alias("week_start")).agg(
        F.sum(_cents("o_totalprice")).alias("rev_cents")
    )
    prev = F.lag("rev_cents").over(Window.orderBy("week_start"))
    return wk.select(
        "week_start",
        (F.col("rev_cents") / 100.0).alias("revenue"),
        ((F.col("rev_cents") - prev) / prev).alias("wow_change"),
    )


# --------------------------------------------------------------------------
# Key-skew profiler: distribution of per-key row counts
# --------------------------------------------------------------------------
@register(
    "custkey_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
    )
    SELECT n_orders, COUNT(*) AS n_customers,
           CAST(n_orders * COUNT(*) AS BIGINT) AS orders_covered,
           ((n_orders * COUNT(*)) / (SELECT COUNT(*) FROM orders)) AS share
    FROM per_key GROUP BY n_orders
    """,
    tags=("skew", "profiling", "data-quality"),
)
def custkey_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profiler: the distribution of orders-per-customer
    (how many keys carry how many rows, and each stratum's share of
    the table) — the diagnostic that decides whether a join/agg on
    this key needs salting before it burns a 100 TB shuffle.

    Scale: two stacked map-side-combinable groupBys (key → count,
    count → frequency); the second input is one row per key, the
    output one row per distinct count — tiny."""
    o = _t(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    total = o.groupBy().count().select(F.col("count").alias("n_total"))
    return (
        per_key.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .crossJoin(F.broadcast(total))
        .select(
            "n_orders",
            "n_customers",
            (F.col("n_orders") * F.col("n_customers")).cast("long").alias("orders_covered"),
            ((F.col("n_orders") * F.col("n_customers")) / F.col("n_total")).alias("share"),
        )
    )


# --------------------------------------------------------------------------
# Gini coefficient of supplier revenue (two-phase global rank)
# --------------------------------------------------------------------------
_GINI_BUCKET_CENTS = 1_000_000  # $10k-wide rank buckets


@register(
    "supplier_revenue_gini",
    # G = 2*Σ(rank_i*v_i)/(n*Σv) - (n+1)/n over revenues sorted
    # ascending. Σ(rank*v) is summed exactly in DECIMAL(38,0)/HUGEINT,
    # each total cast to double once, then the closed form in
    # correctly-rounded IEEE ops.
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS v
      FROM lineitem GROUP BY l_suppkey
    ),
    r AS (
      SELECT v, row_number() OVER (ORDER BY v, l_suppkey) AS rnk,
             COUNT(*) OVER () AS n
      FROM rev
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_suppliers,
           (SUM(v) / 100.0) AS total_revenue,
           (2.0 * CAST(SUM(CAST(rnk AS HUGEINT) * v) AS DOUBLE)
              / (CAST(MAX(n) AS DOUBLE) * CAST(SUM(CAST(v AS HUGEINT)) AS DOUBLE))
            - (CAST(MAX(n) AS DOUBLE) + 1.0) / CAST(MAX(n) AS DOUBLE)) AS gini
    FROM r
    """,
    tags=("gini", "inequality", "two-phase", "global-rank"),
)
def supplier_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across suppliers —
    the inequality summary behind ABC/Pareto dashboards (0 = equal,
    →1 = concentrated). Uses the rank formulation
    G = 2·Σ(rank·v)/(n·Σv) − (n+1)/n over ascending revenue.

    The global rank is computed TWO-PHASE like order_value_deciles
    (bucket by revenue range → prefix-sum bucket counts → broadcast
    offsets → rank within bucket) — no single-partition sort of the
    per-supplier rollup, which at 100 TB has millions of rows.
    Σ(rank·v) accumulates in DECIMAL(38,0) (it overflows BIGINT at
    scale), cast to double once for the closed form."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_cents("l_extendedprice")).alias("v")
    )
    b = rev.withColumn("bucket", F.expr(f"v DIV {_GINI_BUCKET_CENTS}"))
    counts = b.groupBy("bucket").agg(F.count("*").alias("cnt"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket",
        F.coalesce(F.sum("cnt").over(wb), F.lit(0)).alias("off"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    win = Window.partitionBy("bucket").orderBy("v", "l_suppkey")
    ranked = b.join(F.broadcast(offsets), "bucket").withColumn(
        "rnk", F.col("off") + F.row_number().over(win)
    )
    dec = "decimal(38,0)"
    s = ranked.agg(
        F.max("n").cast("long").alias("n_suppliers"),
        F.sum("v").alias("sum_v"),
        F.sum((F.col("rnk") * F.col("v")).cast(dec)).cast("double").alias("srv"),
    )
    n_d = F.col("n_suppliers").cast("double")
    sum_v_d = F.col("sum_v").cast(dec).cast("double")
    return s.select(
        "n_suppliers",
        (F.col("sum_v") / 100.0).alias("total_revenue"),
        (2.0 * F.col("srv") / (n_d * sum_v_d) - (n_d + 1.0) / n_d).alias("gini"),
    )


# --------------------------------------------------------------------------
# Lag-1 autocorrelation of weekly revenue (integer sufficient stats)
# --------------------------------------------------------------------------
@register(
    "weekly_autocorr_lag1",
    # Multiply the centered terms through by n (x_t - mean = (n*x_t -
    # S)/n): every product is an exact integer accumulated in
    # HUGEINT/DECIMAL(38,0); the estimator is then ONE double division.
    oracle=f"""
    WITH wk AS (
      SELECT DATE '1970-01-05'
               + CAST(7 * ((CAST(o_orderdate AS DATE) - DATE '1970-01-05') // 7)
                      AS INT) AS week_start,
             SUM({sql_cents("o_totalprice")}) AS x
      FROM orders GROUP BY 1
    ),
    lead_wk AS (
      SELECT x, lead(x) OVER (ORDER BY week_start) AS x1,
             COUNT(*) OVER () AS n, SUM(x) OVER () AS s
      FROM wk
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_weeks,
           (CAST(SUM(CASE WHEN x1 IS NOT NULL
                   THEN (CAST(n AS HUGEINT) * x - s) * (CAST(n AS HUGEINT) * x1 - s)
                   END) AS DOUBLE)
            / CAST(SUM((CAST(n AS HUGEINT) * x - s) * (CAST(n AS HUGEINT) * x - s))
                   AS DOUBLE)) AS acf1
    FROM lead_wk
    """,
    tags=("autocorrelation", "timeseries", "sufficient-stats"),
)
def weekly_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of weekly revenue — the momentum/mean-
    reversion summary of a series (ACF(1) of the weekly rollup).
    Centered terms are scaled by n so every product is an exact
    integer (n·x − Σx), accumulated in DECIMAL(38,0); the estimator is
    one double division — exact cross-engine like the corr query.

    Scale: the fact table folds into a weekly rollup map-side; the
    lead window and the sums run over calendar-bounded rows."""
    o = _t(spark, sf_dir, "orders")
    week = F.expr(
        "date_add(DATE '1970-01-05', "
        "CAST(7 * (datediff(to_date(o_orderdate), DATE '1970-01-05') div 7) AS INT))"
    )
    wk = o.groupBy(week.alias("week_start")).agg(
        F.sum(_cents("o_totalprice")).alias("x")
    )
    w_all = Window.partitionBy()
    lead_wk = wk.select(
        "x",
        F.lead("x").over(Window.orderBy("week_start")).alias("x1"),
        F.count("*").over(w_all).alias("n"),
        F.sum("x").over(w_all).alias("s"),
    )
    dec = "decimal(38,0)"
    cx = (F.col("n") * F.col("x") - F.col("s")).cast(dec)
    cx1 = (F.col("n") * F.col("x1") - F.col("s")).cast(dec)
    agg = lead_wk.agg(
        F.max("n").cast("long").alias("n_weeks"),
        F.sum(F.when(F.col("x1").isNotNull(), cx * cx1)).cast("double").alias("num"),
        F.sum(cx * cx).cast("double").alias("den"),
    )
    return agg.select("n_weeks", (F.col("num") / F.col("den")).alias("acf1"))


# --------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov: click vs purchase values
# --------------------------------------------------------------------------
@register(
    "value_ks_two_sample",
    # D is located in scaled integers: |cum1*n2 - cum2*n1| at every
    # distinct value; the statistic itself is two IEEE divisions of
    # that integer max (identical op order both sides). Tie on the
    # argmax value -> smallest value.
    oracle=f"""
    WITH v AS (
      SELECT {sql_cents("value")} AS cents,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM events WHERE event_type IN ('click', 'purchase')
        AND value IS NOT NULL
      GROUP BY 1
    ),
    cum AS (
      SELECT cents,
             SUM(c1) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             SUM(c2) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
             SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
      FROM v
    )
    SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
           CAST(MAX(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_scaled,
           ((CAST(MAX(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
             / CAST(MAX(n1) AS DOUBLE)) / CAST(MAX(n2) AS DOUBLE)) AS ks_d,
           (MIN(CASE WHEN abs(cum1 * n2 - cum2 * n1) =
                 (SELECT MAX(abs(cum1 * n2 - cum2 * n1)) FROM cum)
                 THEN cents END) / 100.0) AS ks_at_value
    FROM cum
    """,
    tags=("ks-test", "statistics", "distribution-drift"),
)
def value_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between the click
    and purchase value distributions — the drift detector a feature
    store runs between cohorts/snapshots. D = max |F1 - F2| is located
    entirely in scaled INTEGERS (|cum1*n2 - cum2*n1| at each distinct
    value), so the supremum and its location are exact; only the final
    normalization divides.

    Scale: per-value counts are a map-side-combinable groupBy on the
    (bounded-cardinality) 2-dp value domain; the cumulative window
    runs over DISTINCT values only — like the calendar windows, a
    rollup whose row count is bounded by the value range, not the
    feed. ks_at_value ties resolve to the smallest value."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        # a NULL value has no place in a CDF — and it would enter the
        # cumulative window at OPPOSITE ends on the two engines (Spark
        # sorts NULL first, DuckDB last); both sides filter
        # (tests/test_null_events_parity.py)
        & F.col("value").isNotNull()
    )
    v = ev.groupBy(_cents("value").alias("cents")).agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("c1"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("c2"),
    )
    wcum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    cum = v.select(
        "cents",
        F.sum("c1").over(wcum).alias("cum1"),
        F.sum("c2").over(wcum).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    ).withColumn(
        "d_abs", F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    )
    cum = cum.withColumn("max_d", F.max("d_abs").over(w_all))
    agg = cum.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.max("d_abs").cast("long").alias("d_scaled"),
        F.min(
            F.when(F.col("d_abs") == F.col("max_d"), F.col("cents"))
        ).alias("at_cents"),
    )
    return agg.select(
        "n1",
        "n2",
        "d_scaled",
        (
            (F.col("d_scaled").cast("double") / F.col("n1").cast("double"))
            / F.col("n2").cast("double")
        ).alias("ks_d"),
        (F.col("at_cents") / 100.0).alias("ks_at_value"),
    )
