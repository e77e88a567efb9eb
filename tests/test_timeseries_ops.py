"""Structural invariants for the round-3 timeseries / analytics
operators (exact values are locked by the oracle parity suite —
tests/test_parity.py; these assert the properties that make the
operators *correct by construction* at any scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pse_stocks_etl_spark.plans import REGISTRY


def _run(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir)


def test_scd2_intervals_contiguous_and_collapsed(spark, sf_dir):
    """Per key: intervals tile the timeline (valid_to == next
    valid_from), versions are 1..n dense, and consecutive states
    actually differ (change-collapse worked)."""
    df = _run(spark, sf_dir, "scd2_intervals")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("version")
    checked = df.select(
        "user_id",
        "state",
        "version",
        "valid_from",
        "valid_to",
        F.lead("valid_from").over(w).alias("next_from"),
        F.lead("state").over(w).alias("next_state"),
        F.row_number().over(w).alias("rn"),
    )
    bad_tiling = checked.filter(
        F.col("next_from").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    )
    assert bad_tiling.count() == 0
    bad_collapse = checked.filter(
        F.col("next_state").isNotNull() & (F.col("state") == F.col("next_state"))
    )
    assert bad_collapse.count() == 0
    bad_version = checked.filter(F.col("version") != F.col("rn"))
    assert bad_version.count() == 0
    # exactly one open interval (NULL valid_to) per key
    opens = df.filter(F.col("valid_to").isNull()).groupBy("user_id").count()
    assert opens.filter(F.col("count") != 1).count() == 0


def test_wau_dominates_dau(spark, sf_dir):
    """The 7-day rolling distinct count is >= that day's distinct count
    and <= the global distinct count, for every day."""
    from pse_stocks_etl_spark.sources.catalog import load_table

    wau = _run(spark, sf_dir, "wau_rolling_distinct")
    ev = load_table(spark, sf_dir, "events")
    dau = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("dau"))
    )
    total = ev.select("user_id").distinct().count()
    joined = wau.join(dau, "day")
    assert joined.count() == wau.count()  # every event day present
    assert joined.filter(F.col("wau") < F.col("dau")).count() == 0
    assert joined.filter(F.col("wau") > total).count() == 0


def test_weekly_ohlc_bounds_and_monday_weeks(spark, sf_dir):
    """low <= open/close <= high, volume and trade counts positive, and
    every week_start is a Monday (tz-free bucketing)."""
    df = _run(spark, sf_dir, "weekly_ohlc_bars")
    bad = df.filter(
        (F.col("low_price") > F.col("open_price"))
        | (F.col("low_price") > F.col("close_price"))
        | (F.col("open_price") > F.col("high_price"))
        | (F.col("close_price") > F.col("high_price"))
        | (F.col("volume") <= 0)
        | (F.col("n_trades") <= 0)
        # Spark weekday(): Monday == 0
        | (F.expr("weekday(week_start)") != 0)
    )
    assert bad.count() == 0


def test_single_trade_week_ohlc_degenerate(spark, sf_dir):
    """A week with one trade has open == high == low == close."""
    df = _run(spark, sf_dir, "weekly_ohlc_bars").filter(F.col("n_trades") == 1)
    bad = df.filter(
        (F.col("open_price") != F.col("close_price"))
        | (F.col("high_price") != F.col("low_price"))
        | (F.col("open_price") != F.col("high_price"))
    )
    assert df.count() > 0  # the synthetic data has such weeks
    assert bad.count() == 0


def test_interarrival_stats_sane(spark, sf_dir):
    """Gaps non-negative (sorted input), min <= avg <= max, and
    single-event keys have NULL gap stats."""
    df = _run(spark, sf_dir, "user_interarrival_stats")
    bad = df.filter(
        (F.col("min_gap_us") < 0)
        | (F.col("min_gap_us") > F.col("max_gap_us"))
        | (F.col("avg_gap_us") < F.col("min_gap_us"))
        | (F.col("avg_gap_us") > F.col("max_gap_us"))
    )
    assert bad.count() == 0
    singles = df.filter(F.col("n_events") == 1)
    assert singles.filter(F.col("avg_gap_us").isNotNull()).count() == 0


def test_histogram_partitions_rows(spark, sf_dir):
    """Histogram bins partition the rows: counts sum to the table count,
    bin edges are [bin*10, bin*10+10)."""
    from pse_stocks_etl_spark.sources.catalog import load_table

    df = _run(spark, sf_dir, "value_histogram")
    total = load_table(spark, sf_dir, "events").count()
    rows = df.collect()
    assert sum(r["n"] for r in rows) == total
    for r in rows:
        assert r["lo"] == r["bin"] * 10.0
        assert r["hi"] == (r["bin"] + 1) * 10.0


def test_incremental_dedup_admits_subset_of_new_shard(spark, sf_dir):
    """Admitted docs are exactly the odd (new-shard) ids minus the
    verified near-dups; every admitted id is odd, and admission is
    monotone: a doc with no LSH candidate at all is always admitted."""
    from pse_stocks_etl_spark.sources.catalog import load_table

    kept = _run(spark, sf_dir, "docs_incremental_dedup")
    assert kept.filter(F.col("doc_id") % 2 == 0).count() == 0
    docs = load_table(spark, sf_dir, "documents")
    n_new = docs.filter(F.col("doc_id") % 2 == 1).count()
    n_kept = kept.count()
    assert 0 < n_kept <= n_new
    # cross-check against the symmetric pair query: any (odd, even) or
    # (even, odd) near-dup pair must have removed its odd member
    pairs = _run(spark, sf_dir, "docs_minhash_lsh_pairs")
    odd_dups = (
        pairs.filter((F.col("doc_a") % 2) != (F.col("doc_b") % 2))
        .select(
            F.when(F.col("doc_a") % 2 == 1, F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("doc_id")
        )
        .distinct()
    )
    overlap = kept.join(odd_dups, "doc_id").count()
    assert overlap == 0
