"""Round-6 operator guards beyond oracle parity (which test_parity.py
already enforces for every registry query): physical-plan shape for the
runtime-filter join, greedy-maximality of the budgeted corpus
selection, order-insensitivity of the anti-entropy checksum, and the
arithmetic invariants of the quantizer / transition matrix."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pse_stocks_etl_spark.plans.round6_queries import (
    BLOOM_K,
    CHECKSUM_KEYS,
    basket_cooccurrence_lift,
    bloom_prefilter_semi_join,
    data_expectations_check,
    docs_token_budget_select,
    emb_int8_quantize,
    event_transition_matrix,
    table_key_checksums,
)

from conftest import SF_DIR


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_probe_uses_single_broadcast_bitmap(spark):
    """The probe side must test the Bloom bitmap as ONE broadcast 1-row
    map value (a broadcast nested-loop of a single row — not k joinable
    bit tables, and never a shuffle): the whole point of the runtime
    filter is that the probe scan is only touched by map-side work
    before the exact join."""
    plan = _physical(bloom_prefilter_semi_join(spark, SF_DIR))
    assert plan.count("BroadcastNestedLoopJoin") == 1
    # all k bit tests are element_at lookups in one filter chain, with
    # no per-test join
    assert plan.count("element_at") >= BLOOM_K
    # the exact verify join exists too (semi)
    assert "LeftSemi" in plan


def test_token_budget_selection_is_greedy_maximal(spark):
    """Exactly the docs whose quality-ordered cumulative token count
    fits the budget are selected: the last selected row is <= budget
    and the next doc in quality order would overflow it. Recomputed
    against a naive single-partition window (fine at test SF)."""
    out = docs_token_budget_select(spark, SF_DIR)
    rows = out.orderBy(F.desc("quality_bp"), F.asc("doc_id")).collect()
    assert rows, "selection must not be empty at test SF"
    cums = [r.cum_tok for r in rows]
    assert cums == sorted(cums) and len(set(cums)) == len(cums)

    from pse_stocks_etl_spark.sources.catalog import load_table
    from pse_stocks_etl_spark.functions.text import token_count

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("tok"),
        F.expr(
            "(10000 * length(regexp_replace(text, '[^A-Za-z]', ''))) "
            "DIV greatest(length(text), 1)"
        ).alias("quality_bp"),
    )
    budget = docs.agg((F.sum("tok") / 2).cast("long")).collect()[0][0]
    w = (
        Window.orderBy(F.desc("quality_bp"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    naive = docs.withColumn("cum", F.sum("tok").over(w)).orderBy(
        F.desc("quality_bp"), F.asc("doc_id")
    ).collect()
    selected = {r.doc_id for r in rows}
    assert cums[-1] <= budget
    first_excluded = next((r for r in naive if r.doc_id not in selected), None)
    assert first_excluded is not None and first_excluded.cum > budget


def test_checksum_is_row_order_insensitive(spark, tmp_path):
    """Anti-entropy contract: a replica holding the same rows in a
    different physical order must report the identical checksum. Built
    by symlinking every table except events and rewriting events rows
    reversed."""
    import pyarrow.parquet as pq

    base = table_key_checksums(spark, SF_DIR)
    base_events = {
        r.table_name: (r.n_rows, r.checksum) for r in base.collect()
    }["events"]

    alt = tmp_path / "replica"
    alt.mkdir()
    for t in CHECKSUM_KEYS:
        src = os.path.join(SF_DIR, f"{t}.parquet")
        if t == "events":
            tbl = pq.read_table(src)
            pq.write_table(tbl.take(list(range(tbl.num_rows - 1, -1, -1))),
                           str(alt / "events.parquet"))
        else:
            os.symlink(src, alt / f"{t}.parquet")
    replica = {
        r.table_name: (r.n_rows, r.checksum)
        for r in table_key_checksums(spark, str(alt)).collect()
    }
    assert replica["events"] == base_events


def test_transition_matrix_counts_are_consistent(spark):
    """Per-src transition counts must sum to src_total (the window
    total), and every probability is n/src_total exactly."""
    rows = event_transition_matrix(spark, SF_DIR).collect()
    assert rows
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r)
    for src, rs in by_src.items():
        total = rs[0].src_total
        assert all(r.src_total == total for r in rs)
        assert sum(r.n for r in rs) == total
        for r in rs:
            assert r.prob == r.n / total


def test_quantize_codes_bounded(spark):
    rows = emb_int8_quantize(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.mn <= r.mx
        assert 0 <= r.sum_codes <= 255 * r.n_dims


def test_expectations_clean_testdata_has_zero_violations(spark):
    rows = {r.rule: r for r in data_expectations_check(spark, SF_DIR).collect()}
    assert len(rows) == 10
    assert "events_value_finite_nonneg" in rows  # NaN/Inf join the rule
    assert "events_ts_present" in rows  # time-ordered operators' contract
    # PK uniqueness across every fact/dim table with a surrogate key —
    # the (ts, event_id)-style total orders assume it
    for r in ("events_key_unique", "documents_key_unique",
              "embeddings_key_unique"):
        assert r in rows
    for r in rows.values():
        assert r.n_checked > 0
        assert r.n_violations == 0, f"{r.rule}: {r.n_violations}"


def test_basket_pairs_canonical_and_supported(spark):
    rows = basket_cooccurrence_lift(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_ab >= 2
        assert r.n_a >= r.n_ab and r.n_b >= r.n_ab
    # lift recomputation: exact integer ratio
    n_orders = (
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        .select("l_orderkey")
        .distinct()
        .count()
    )
    for r in rows[:50]:
        assert r.lift == (r.n_ab * n_orders) / (r.n_a * r.n_b)


def test_skyline_plan_has_no_quadratic_join(spark):
    """The skyline must be the two-phase sort plan: windows only, no
    join of the part table against itself (the oracle's NOT-EXISTS
    shape would appear as a nested-loop or cartesian join)."""
    from pse_stocks_etl_spark.plans.round6_queries import part_price_size_skyline

    plan = _physical(part_price_size_skyline(spark, SF_DIR))
    assert plan.count("Window") >= 2  # local + global passes
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_pagerank_iterations_unroll_declaratively(spark):
    """Each of the PR_ITERS supersteps contributes its own
    sender-join + receiver-aggregate — the loop must unroll into the
    plan (no driver-side collect between iterations)."""
    from pse_stocks_etl_spark.plans.round6_queries import (
        PR_ITERS,
        copurchase_pagerank,
    )

    df = copurchase_pagerank(spark, SF_DIR)
    logical = df._jdf.queryExecution().analyzed().toString()
    # every iteration joins the running rank table back to edges
    assert logical.count("Join") >= PR_ITERS * 2
