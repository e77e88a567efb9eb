"""Round-7 operator guards beyond oracle parity (test_parity.py already
locks every registry query to its DuckDB oracle): physical-plan shape
for the bucketed attribution join / sweep-line partitioning / broadcast
stats / zero-shuffle sampling, and hand-computed edge cases — midnight-
crossing intervals, exact interpolation values, streak splits, strict
funnel ordering, and mode tie-breaks."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pse_stocks_etl_spark.plans.round7_queries import (
    click_max_concurrency,
    funnel_strict_24h,
    gapfill_interp_daily,
    mode_event_per_user,
    purchase_touch_attribution,
    user_activity_islands,
    value_mad_outliers,
)
from pse_stocks_etl_spark.plans import REGISTRY

from conftest import SF_DIR


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value)."""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


# ---------------------------------------------------------------- plans --
def test_attribution_is_hash_join_not_nested_loop(spark):
    """The 6h range predicate must run as a bucketed equi-join: a pure
    range condition would plan a nested-loop/cartesian, the scale
    failure the bucketing exists to avoid."""
    plan = _physical(purchase_touch_attribution(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sweep_line_window_partitions_by_day(spark):
    """The concurrency running sum must be a day-partitioned window —
    a global (single-partition) sort would serialize the sweep."""
    plan = _physical(click_max_concurrency(spark, SF_DIR))
    assert "SinglePartition" not in plan


def test_mad_stats_join_back_via_broadcast(spark):
    """Per-type median/MAD stats are tiny: both rejoins must broadcast
    rather than shuffle the events side twice."""
    plan = _physical(value_mad_outliers(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_weighted_sample_never_shuffles_documents(spark):
    """Selection is a scan + broadcast scalar + filter: any
    hash-partitioning exchange means the sampler shuffles data it
    never needed to move."""
    plan = _physical(REGISTRY["docs_weighted_sample"].fn(spark, SF_DIR))
    assert "Exchange hashpartitioning" not in plan


# ------------------------------------------------------------ semantics --
def test_concurrency_splits_midnight_crossing_intervals(spark, tmp_path):
    d1 = dt.datetime(2024, 3, 1)
    rows = [
        (1, d1.replace(hour=23, minute=50), 10, "click", 1.0),
        (2, d1.replace(hour=23, minute=55), 11, "click", 1.0),
        (3, d1.replace(hour=10, minute=0), 12, "click", 1.0),
    ]
    out = {
        r["day"]: r["max_concurrent"]
        for r in click_max_concurrency(spark, _write_events(tmp_path, rows)).collect()
    }
    # 23:50+30m and 23:55+30m overlap on BOTH sides of midnight: the
    # two spill segments [00:00,00:20) and [00:00,00:25) must land in
    # the next day's partition and still count as concurrent there.
    assert out == {dt.date(2024, 3, 1): 2, dt.date(2024, 3, 2): 2}


def test_interp_fills_exact_linear_values(spark, tmp_path):
    rows = [
        (1, dt.datetime(2024, 1, 1, 12), 7, "purchase", 1.00),
        (2, dt.datetime(2024, 1, 4, 12), 7, "purchase", 4.00),
    ]
    out = {
        r["day"]: (r["value_interp"], r["is_filled"])
        for r in gapfill_interp_daily(spark, _write_events(tmp_path, rows)).collect()
    }
    assert out == {
        dt.date(2024, 1, 1): (1.0, False),
        dt.date(2024, 1, 2): (2.0, True),
        dt.date(2024, 1, 3): (3.0, True),
        dt.date(2024, 1, 4): (4.0, False),
    }


def test_islands_split_on_gap(spark, tmp_path):
    days = [1, 2, 3, 5, 6]  # gap at day 4 → streaks of 3 and 2
    rows = [
        (i, dt.datetime(2024, 2, d, 9), 5, "view", 0.0) for i, d in enumerate(days)
    ]
    row = user_activity_islands(spark, _write_events(tmp_path, rows)).collect()[0]
    assert (row["n_streaks"], row["longest_streak"], row["active_days"]) == (2, 3, 5)


def test_attribution_window_and_equal_split(spark, tmp_path):
    base = dt.datetime(2024, 5, 1)
    rows = [
        (1, base.replace(hour=0), 1, "click", 0.0),  # exactly 6h before: excluded
        (2, base.replace(hour=1), 1, "click", 0.0),
        (3, base.replace(hour=5), 1, "click", 0.0),
        (4, base.replace(hour=6), 1, "purchase", 10.0),
        (5, base.replace(hour=6), 2, "purchase", 99.0),  # no clicks → absent
    ]
    out = purchase_touch_attribution(spark, _write_events(tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["purchase_id"], r["n_touch"], r["share_value"]) == (4, 2, 5.0)


def test_funnel_requires_strict_order_and_deadlines(spark, tmp_path):
    rows = [
        # user A: click BEFORE first view → no ordered click
        (1, dt.datetime(2024, 6, 1, 1), 100, "click", 0.0),
        (2, dt.datetime(2024, 6, 1, 2), 100, "view", 0.0),
        (3, dt.datetime(2024, 6, 1, 3), 100, "purchase", 0.0),
        # user B: view → click within 24h → purchase 49h later (misses)
        (4, dt.datetime(2024, 6, 1, 0), 200, "view", 0.0),
        (5, dt.datetime(2024, 6, 1, 1), 200, "click", 0.0),
        (6, dt.datetime(2024, 6, 3, 2), 200, "purchase", 0.0),
    ]
    row = funnel_strict_24h(spark, _write_events(tmp_path, rows)).collect()[0]
    assert (row["n_viewers"], row["n_click_24h"], row["n_purchase_24h"]) == (2, 1, 0)


def test_mode_tie_breaks_lexicographically(spark, tmp_path):
    rows = [
        (1, dt.datetime(2024, 7, 1, 1), 9, "view", 0.0),
        (2, dt.datetime(2024, 7, 1, 2), 9, "click", 0.0),
    ]
    row = mode_event_per_user(spark, _write_events(tmp_path, rows)).collect()[0]
    assert (row["top_event_type"], row["n"]) == ("click", 1)


def test_mad_flags_gross_outlier_only(spark, tmp_path):
    vals = [10.0, 10.5, 11.0, 10.2, 10.8, 10.4, 500.0]
    rows = [
        (i, dt.datetime(2024, 8, 1, 1 + i), 3, "purchase", v)
        for i, v in enumerate(vals)
    ]
    row = value_mad_outliers(spark, _write_events(tmp_path, rows)).collect()[0]
    assert row["n"] == 7
    assert row["n_outliers"] == 1  # only the 500.0 breaches 3.5 modified-z
    assert row["median_value"] == 10.5


# ----------------------------------------------------- second batch --
def test_prefix_holds_each_docs_rarest_shingles(spark):
    """The prefix of each doc is its RAREST sz-ceil(t*sz)+1 shingles
    (global-df-ascending order): per doc, the max document frequency
    inside the prefix must not exceed the min document frequency of
    the shingles left out — hot boilerplate is exactly what the
    candidate join never sees."""
    from pse_stocks_etl_spark.plans.llm_queries import _shingles_cached
    from pyspark.sql import Window as W

    sh = _shingles_cached(spark, SF_DIR)
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    w = W.partitionBy("doc_id").orderBy("df", "sh")
    ranked = (
        sh.join(dfreq, "sh")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        .withColumn(
            "in_prefix", F.col("rn") <= F.col("sz") - F.expr("(sz + 1) div 2") + 1
        )
    )
    per_doc = ranked.groupBy("doc_id").agg(
        F.max(F.when(F.col("in_prefix"), F.col("df"))).alias("max_pref_df"),
        F.min(F.when(~F.col("in_prefix"), F.col("df"))).alias("min_rest_df"),
        F.sum(F.col("in_prefix").cast("long")).alias("pref_len"),
        F.max("sz").alias("sz"),
    )
    bad = per_doc.filter(
        F.col("min_rest_df").isNotNull()
        & (F.col("max_pref_df") > F.col("min_rest_df"))
    ).count()
    assert bad == 0
    # prefix length formula: sz - ceil(sz/2) + 1
    wrong_len = per_doc.filter(
        F.col("pref_len") != F.col("sz") - ((F.col("sz") + 1) / 2).cast("long") + 1
    ).count()
    assert wrong_len == 0


def test_asof_state_null_before_any_state_row(spark, tmp_path):
    rows = [
        (1, dt.datetime(2024, 9, 1, 1), 4, "purchase", 5.0),  # before any state
        (2, dt.datetime(2024, 9, 1, 2), 4, "view", 0.0),
        (3, dt.datetime(2024, 9, 1, 3), 4, "purchase", 5.0),
        (4, dt.datetime(2024, 9, 1, 4), 4, "click", 0.0),
        (5, dt.datetime(2024, 9, 1, 5), 4, "purchase", 5.0),
    ]
    from pse_stocks_etl_spark.plans.round7_queries import purchase_state_asof

    out = {
        r["purchase_id"]: r["state"]
        for r in purchase_state_asof(spark, _write_events(tmp_path, rows)).collect()
    }
    assert out == {1: None, 3: "view", 5: "click"}


def test_deciles_rank_two_phase_with_broadcast_offsets(spark):
    """The fact table must never pass through a single-partition sort:
    offsets join back via broadcast, and the only windows in the plan
    partition by bucket (fact side) or run over the tiny bucket table."""
    from pse_stocks_etl_spark.plans.round7_queries import order_value_deciles

    plan = _physical(order_value_deciles(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_chisq_cells_sum_to_marginals(spark):
    """Internal consistency: expected counts per segment sum to the
    segment's observed row total (the defining property of the
    independence model)."""
    from pse_stocks_etl_spark.plans.round7_queries import segment_priority_chisq

    rows = segment_priority_chisq(spark, SF_DIR).collect()
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r["segment"], []).append(r)
    for seg, cells in by_seg.items():
        obs = sum(c["n"] for c in cells)
        exp = sum(c["expected"] for c in cells)
        assert abs(obs - exp) < 1e-6, (seg, obs, exp)


# ------------------------------------------------ statistics invariants --
def test_gini_zero_for_equal_revenues(spark, tmp_path):
    """Gini must be ~0 when every supplier earns the same (exactly
    (n-1)/n - ... = 0 in the rank formulation for equal v)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(k, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 1)) for k in range(1, 9)]
    table = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),  # 8 suppliers
            "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
            "l_quantity": pa.array([r[4] for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[5] for r in rows], pa.float64()),
            "l_discount": pa.array([r[6] for r in rows], pa.float64()),
            "l_tax": pa.array([r[7] for r in rows], pa.float64()),
            "l_returnflag": pa.array([r[8] for r in rows], pa.string()),
            "l_linestatus": pa.array([r[9] for r in rows], pa.string()),
            "l_shipdate": pa.array([r[10] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(table, str(tmp_path / "lineitem.parquet"))
    from pse_stocks_etl_spark.plans.round7_queries import supplier_revenue_gini

    row = supplier_revenue_gini(spark, str(tmp_path)).collect()[0]
    assert row["n_suppliers"] == 8
    assert abs(row["gini"]) < 1e-12


def test_ks_zero_for_identical_distributions(spark, tmp_path):
    """KS distance must be exactly 0 (integer-located) when click and
    purchase values are drawn identically."""
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append((2 * i, dt.datetime(2024, 1, 1, 1 + i), 1, "click", v))
        rows.append((2 * i + 1, dt.datetime(2024, 1, 1, 1 + i), 2, "purchase", v))
    from pse_stocks_etl_spark.plans.round7_queries import value_ks_two_sample

    row = value_ks_two_sample(spark, _write_events(tmp_path, rows)).collect()[0]
    assert (row["n1"], row["n2"], row["d_scaled"], row["ks_d"]) == (4, 4, 0, 0.0)


def test_ks_locates_full_separation(spark, tmp_path):
    """Disjoint supports → D = 1 at the boundary value."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 1), 1, "click", 1.0),
        (2, dt.datetime(2024, 1, 1, 2), 1, "click", 2.0),
        (3, dt.datetime(2024, 1, 1, 3), 2, "purchase", 10.0),
        (4, dt.datetime(2024, 1, 1, 4), 2, "purchase", 11.0),
    ]
    from pse_stocks_etl_spark.plans.round7_queries import value_ks_two_sample

    row = value_ks_two_sample(spark, _write_events(tmp_path, rows)).collect()[0]
    assert row["ks_d"] == 1.0
    assert row["ks_at_value"] == 2.0  # D first peaks at the last click value
