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

# ---------------------------------------------------------------------------
# Driver-verification rotation.
#
# The correctness driver records the FIRST 50 registry entries in iteration
# order each round. The round-5 window below leads with every query that has
# NO hash-green row in any CORRECTNESS_r*.json (the rotation contract
# tests/test_parity.py::test_driver_window_covers_unverified_queries now
# enforces mechanically — a no-rotation round turns the suite red):
#   1. the two streaming queries fixed this round (timestamp-unit bug —
#      the driver must re-confirm the fix end-to-end),
#   2. the five round-3 additions that were queued for the r4 rotation but
#      never entered a window (r4 did not rotate — r4 verdict item 2),
#   3. the two sketch queries upgraded from rows-only to full error-bound
#      oracles this round (never hash-checked before by construction),
#   4. array_agg_user_profile (r4's one fix — one more confirmation),
#   4b. the eleven round-5 additions (never driver-seen by definition),
#   5. refresh: the oldest greens (last seen by the driver in round 2), in
#      registry order; the 18 that don't fit this window lead round 6's.
# COVERAGE.md records the cumulative per-round driver-green map.
# ---------------------------------------------------------------------------
_DRIVER_FIRST = [
    # -- block 1: fixed in r5, driver must re-confirm --
    "streaming_hourly_counts",
    "streaming_click_join",
    # -- block 2: never driver-checked (r4 rotation queue) --
    "docs_incremental_dedup",
    "value_histogram",
    "vwap_weekly",
    "rolling_volatility",
    "retention_cohorts",
    # -- block 3: sketch queries, now with full error-bound oracles --
    "approx_distinct_per_key",
    "approx_quantile_per_key",
    # -- block 4: r4's fix, reconfirm --
    "array_agg_user_profile",
    # -- block 4b: round-5 additions (driver-unseen by definition) --
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
    # -- block 5: refresh of the oldest (round-2) greens, registry order --
    "pricing_summary",
    "watermark_per_key",
    "dedup_argmax",
    "topk_per_group",
    "select_rename_filter",
    "distinct_dims",
    "union_all_batches",
    "classify_freshness",
    "merge_upsert_preview",
    "freshness_merge_preview",
    "semi_join_in",
    "anti_join_uptodate",
    "broadcast_watermark_join",
    "incremental_windows",
    "date_parse_format",
    "top_n_orders",
    "sessionization",
    "hourly_event_rollup",
    "rollup_orders",
    "pivot_event_counts",
    "star_join_revenue",
    "shipping_priority",
    "local_supplier_volume",
    "docs_exact_dedup",
    "docs_fingerprint",
    "docs_token_stats",
    "docs_lang_id",
    "docs_ngram_jaccard_pairs",
    "docs_minhash_lsh_pairs",
]


def _reorder_registry() -> None:
    """Re-key REGISTRY so driver-priority queries iterate first."""
    ordered = {n: REGISTRY.pop(n) for n in _DRIVER_FIRST if n in REGISTRY}
    ordered.update(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
