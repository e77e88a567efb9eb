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

try:  # round-9 queries (TPC-H subquery shapes, IVF-PQ, PCA, SimHash pairs)
    from . import round9_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # round-10 queries (store lifecycle, incremental IVF-PQ)
    from . import round10_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # round-11 queries (TPC-H sweep completion: Q2/Q12/Q20 analogs)
    from . import round11_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # round-12 queries (C4 line dedup w/ reassembly, semi stream join)
    from . import round12_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # round-13 queries (MV incremental refresh, k-hop BFS, k-anonymity)
    from . import round13_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

# ---------------------------------------------------------------------------
# Driver-verification rotation.
#
# The correctness driver records the FIRST 50 registry entries in iteration
# order each round. CORRECTNESS_r05.json came back 50/50 green (rows +
# schema + hash, zero err), draining the whole round-5 window: the
# streaming timestamp fix, the r4 rotation queue, the sketch-oracle
# upgrades, and every round-5/6/7 addition are now driver-confirmed.
# Cumulatively 145/170 pre-promotion registry queries hold a driver-green
# row (COVERAGE.md's driver map is the authoritative ledger).
#
# The round-6 window below therefore executes the promotion recipe the
# r5 rotation declared: every query that has NEVER had a hash-green row
# in any CORRECTNESS_r*.json leads the registry (the rotation contract
# tests/test_parity.py::test_driver_window_covers_unverified_queries
# enforces this mechanically — a no-rotation round turns the suite red):
#   1. the 12-query round-7 second batch (was positions 51-62),
#   2. the 13 round-8 additions (was positions 63+),
#   3. the 20 round-9 queries promoted out of plans/staging.py
#      (stage() → register(); staging is now EMPTY and stays a queue),
#   4. this round's additions (never driver-seen by definition),
#   5. any remaining slots: the stalest greens (r1/r2-green, never
#      re-confirmed since — refresh guards against silent rot beyond
#      the window, the r4 failure mode).
#
# ROUND-7 STATUS: no CORRECTNESS_r06.json was ever recorded (the
# round-6 driver run left no artifacts in the repo root — verified at
# round-7 start; the window was locally 50/50 green in 2m22s at
# sf0.01, so the miss was driver-side, not a timeout in this code).
# The window below therefore HOLDS UNCHANGED for the next driver run;
# this note is future-proof by construction — the recipe below keys on
# "the first CORRECTNESS file that drains this window", whichever
# round number it carries, and the rotation guard reads the actual
# files, never this prose.
#
# NEXT-ROUND ROTATION RECIPE — mechanical now: run
#   python scripts/plan_rotation.py
# and paste its _DRIVER_FIRST (it derives the ordering from the actual
# CORRECTNESS_r*.json files: never-checked first, staged promotions,
# stalest-green refill, 25-query overflow bound checked). In prose:
# once a CORRECTNESS file records this
# window green, the never-checked backlog is the 25-query block-6 queue below
# (positions 51+ — the round-6 second batch plus the TPC-H sweep
# completion, from discount_band_revenue through
# dominant_part_suppliers — the bound is FULL) plus the staged
# queries in the round-11/12/13 modules (see COVERAGE.md "Staged
# queries" for the authoritative, test-guarded list).
# Promote ALL of block 6 into window positions 1-25, register the
# staged queries into the positions after it (flag bench=True on
# docs_line_dedup, streaming_click_semi_join, store_mv_refresh_increment,
# events_cascade_increment and streaming_late_drop_counts when
# registering — the corpus-transform, semi-join, incremental-refresh
# and append-mode-drop costs belong in the headline set next to their
# lane twins), then fill the remaining
# slots from the stale-green refresh queue,
# oldest driver round first (the r1/r2 block: flagship_latest_price,
# pricing_summary, watermark_per_key, dedup_argmax, docs_exact_dedup,
# docs_fingerprint, emb_ann_lsh, emb_ann_ivf, emb_near_dup_pairs,
# docs_near_dup_clusters, sessionization, docs_top_terms,
# docs_bpe_token_stats, docs_quality_score, ..., then r3/r4). New
# round-7 additions go straight to REGISTRY + _DRIVER_FIRST (window
# first if refresh slots can yield, else overflow positions 51+ up to
# the 25-query bound); staging drains first and stays empty unless
# the bound is hit again.
# ---------------------------------------------------------------------------
_DRIVER_FIRST = [
    # -- block 1: round-7 second batch (never driver-checked) --
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
    # -- block 2: round-8 additions (never driver-checked) --
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
    # -- block 3: round-9 queries promoted from staging (never checked) --
    "customer_order_distribution",
    "small_quantity_revenue",
    "idle_rich_customers",
    "brand_bracket_revenue",
    "late_ship_priority_counts",
    "top_revenue_suppliers",
    "part_revenue_concentration",
    "regional_market_share",
    "sole_late_supplier_orders",
    "emb_ann_ivfpq",
    "docs_quality_classifier",
    "streaming_click_outer_join",
    "docs_overlap_chunks",
    "docs_cluster_canonical",
    "daily_seasonal_backtest",
    "emb_power_iteration",
    "emb_variance_explained",
    "docs_simhash_hamming_pairs",
    "docs_source_cap",
    "docs_char_diversity",
    # -- block 4: round-6(-of-the-build) additions (never driver-seen) --
    "store_lifecycle_preview",
    "emb_ann_ivfpq_increment",
    # -- block 5: stale-green refresh (r1/r2-green, never re-confirmed
    # since; fills the window to 50) --
    "docs_simhash",
    "emb_cosine_topk",
    "array_agg_user_profile",
    # -- block 6: round-6 second batch — positions 51+, the declared
    # next-window queue (the rotation guard requires never-checked
    # queries to sit in the window OR here, bounded at 25) --
    "discount_band_revenue",
    "nation_year_profit",
    "docs_bpe_top_merges",
    "docs_vocab_growth",
    "emb_matryoshka_recall",
    "value_mannwhitney_u",
    "bucketed_colocated_join",
    "emb_semdedup",
    "scd2_customer_merge",
    "docs_dsir_affinity",
    "docs_trending_terms",
    "events_cdc_apply",
    "brand_share_with_others",
    "emb_knn_classify",
    "brand_size_supplier_counts",
    "multimodal_wav_downsample",
    "streaming_cdc_merge",
    "emb_ann_recall_report",
    "store_version_diff",
    "multimodal_bmp_resize",
    "value_winsorized_stats",
    "cohort_ltv_matrix",
    "min_cost_regional_supplier",
    "delay_band_priority_counts",
    "dominant_part_suppliers",
]


def _reorder_registry() -> None:
    """Re-key REGISTRY so driver-priority queries iterate first."""
    ordered = {n: REGISTRY.pop(n) for n in _DRIVER_FIRST if n in REGISTRY}
    ordered.update(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
