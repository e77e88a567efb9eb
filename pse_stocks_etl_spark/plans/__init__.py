"""Query plans: importing this package populates the registry."""

from . import core_queries  # noqa: F401
from .registry import REGISTRY, oracle_sql, queries  # noqa: F401

try:  # LLM-data-pipeline extension queries (documents / embeddings tables)
    from . import llm_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # pipeline queries (multimodal / streaming / stateful / sync engine)
    from . import pipeline_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # extension queries (as-of join, approx/percentile aggs, windows)
    from . import ext_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # corpus-prep queries (repetition, contamination, packing, TF-IDF)
    from . import corpus_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # store-path queries (Z-order, rollup roundtrip, CDF preview)
    from . import store_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # round-6 queries (runtime filters, ER, baskets, expectations)
    from . import round6_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # round-7 queries (islands, sweep-line, attribution, MAD, Benford)
    from . import round7_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # round-8 queries (TPC-H Q14/Q18/Q7 shapes, span/bow/containment dedup)
    from . import round8_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

# ---------------------------------------------------------------------------
# Driver-verification rotation.
#
# The correctness driver records the FIRST 50 registry entries in iteration
# order each round. The round-6 window below leads with every query that has
# NO hash-green row in any CORRECTNESS_r*.json on disk (the rotation
# contract tests/test_parity.py::test_driver_window_covers_unverified_queries
# enforces this mechanically — a no-rotation round turns the suite red).
# NOTE: no CORRECTNESS_r05.json was recorded, so the whole round-5 priority
# block (the streaming timestamp fix, the r4 rotation queue, the sketch
# oracle upgrades, and the round-5 additions) is still unverified
# and stays at the front:
#   1. the two streaming queries fixed in r5 (timestamp-unit bug —
#      the driver must confirm the fix end-to-end),
#   2. the five round-3 additions never yet inside a window,
#   3. the two sketch queries upgraded to full error-bound oracles in r5,
#   5. the eleven round-5 additions (never driver-seen by definition),
#   6. the nineteen round-6 additions,
#   7. eleven of this round's additions (fills slot 50),
#   8. positions 51+: this round's overflow queue (the rotation guard
#      requires them HERE so they enter the next window mechanically).
#
# NEXT-ROUND ROTATION RECIPE: once the driver records this window green,
# move blocks 1-7 out, promote blocks 8+9 (the 24-query declared
# next-window queue: the round-7 second batch and the round-8 additions
# incl. multimodal_bmp_decode / multimodal_y4m_frames / emb_pq_quantize /
# emb_ann_adc), PLUS the round-9 STAGING registry (plans/staging.py:
# move those stage() decorators to register(), import round9_queries
# here, append the names directly after blocks 8+9 — the guard's
# 25-query bound constrains only never-checked queries OUTSIDE the
# 50-slot window, so 24 queue + 20 promoted = 44 window slots is legal
# and leaves ~6 for stale-green refresh; the drain test in
# tests/test_round9.py then retires with the staging module). Fill the
# remaining slots with the stalest greens (array_agg_user_profile and
# the r1/r2-green refresh tail: flagship_latest_price, docs_simhash,
# emb_*, docs_near_dup_clusters, docs_top_terms, docs_bpe_token_stats,
# docs_quality_score, then the r3/r4 block). COVERAGE.md's driver map
# is the authoritative ledger.
# COVERAGE.md records the cumulative per-round driver-green map.
# ---------------------------------------------------------------------------
_DRIVER_FIRST = [
    # -- block 1: fixed in r5, driver must confirm --
    "streaming_hourly_counts",
    "streaming_click_join",
    # -- block 2: never driver-checked (r4 rotation queue) --
    "docs_incremental_dedup",
    "value_histogram",
    "vwap_weekly",
    "rolling_volatility",
    "retention_cohorts",
    # -- block 3: sketch queries with full error-bound oracles since r5 --
    "approx_distinct_per_key",
    "approx_quantile_per_key",
    # -- block 5: round-5 additions (driver-unseen by definition) --
    "streaming_user_stats",
    "kmv_set_algebra",
    "table_profile",
    "user_time_weighted_avg",
    "docs_mixture_weights",
    "streaming_sessions",
    "sliding_window_counts",
    "streaming_sliding_counts",
    "cms_heavy_hitters",
    "docs_uniform_sample",
    "streaming_dedup_counts",
    # -- block 6: round-6 additions --
    "bloom_prefilter_semi_join",
    "event_transition_matrix",
    "part_name_near_dup",
    "docs_token_budget_select",
    "basket_cooccurrence_lift",
    "streaming_static_enrich",
    "data_expectations_check",
    "emb_int8_quantize",
    "user_trend_slope",
    "table_key_checksums",
    "copurchase_triangle_count",
    "user_value_ewma",
    "copurchase_pagerank",
    "user_value_rolling_median",
    "event_trigram_paths",
    "part_price_size_skyline",
    "csv_malformed_tolerant_read",
    "variant_props_histogram",
    "customer_abc_classes",
    # -- block 7: round-7 additions (driver-unseen by definition;
    # these take the window slots the round-2-green refresh tail
    # (flagship_latest_price, docs_simhash, emb_*, docs_near_dup_*,
    # array_agg_user_profile, ...) would otherwise re-confirm — that
    # refresh queue leads the NEXT round's rotation) --
    "user_activity_islands",
    "click_max_concurrency",
    "purchase_touch_attribution",
    "value_mad_outliers",
    "benford_first_digit",
    "fk_orphan_audit",
    "daily_cusum_shift",
    "funnel_strict_24h",
    "mode_event_per_user",
    "docs_weighted_sample",
    "gapfill_interp_daily",
    # -- block 8: round-7 second batch — positions 51-56, i.e. the
    # declared NEXT-window queue (the rotation guard requires every
    # never-checked query to sit in the window OR here, bounded) --
    "docs_prefix_jaccard_pairs",
    "purchase_state_asof",
    "segment_priority_chisq",
    "price_quantity_corr",
    "order_value_deciles",
    "daily_type_share",
    "events_debounce",
    "weekly_revenue_wow",
    "custkey_skew_profile",
    "supplier_revenue_gini",
    "weekly_autocorr_lag1",
    "value_ks_two_sample",
    # -- block 9: round-8 additions — also next-window queue (positions
    # 57+). Together with block 8 this backlog is 19 queries: it drains
    # in ONE rotated window with 31 slots left for stale-green refresh
    # (the guard test bounds the backlog at half a window for exactly
    # this reason) --
    "promo_revenue_share",
    "large_order_customers",
    "nation_pair_trade",
    "docs_span_dedup",
    "docs_bow_dedup",
    "docs_rare_bigram_rate",
    "docs_containment_pairs",
    "multimodal_bmp_decode",
    "multimodal_y4m_frames",
    "customer_rfm_segments",
    "emb_pq_quantize",
    "emb_ann_adc",
    "docs_containment_prefix_pairs",
]


def _reorder_registry() -> None:
    """Re-key REGISTRY so driver-priority queries iterate first."""
    ordered = {n: REGISTRY.pop(n) for n in _DRIVER_FIRST if n in REGISTRY}
    ordered.update(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
