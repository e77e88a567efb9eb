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

try:  # round-14 queries (baseline JPEG codec — r7 VERDICT item 5)
    from . import round14_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # round-15 queries (GIF/LZW codec, BM25, RRF hybrid retrieval)
    from . import round15_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # round-16 queries (MP4 container, URL canonicalization lane,
    # end-to-end corpus build, incremental contamination)
    from . import round16_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # round-17 queries (exact substring dedup, BPE training)
    from . import round17_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # round-18 queries (mixture planning/sampling, quantile sketch)
    from . import round18_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # round-19 queries (sketch/index error audits, mixture reweight)
    from . import round19_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # round-20 queries (IVF cell split, incremental corpus build)
    from . import round20_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    # The late-bind oracles guard their own REGISTRY preconditions and
    # early-return on partial checkouts; an unexpected KeyError (typo,
    # renamed key) now raises loudly instead of being swallowed here.
    pass

try:  # round-21 queries (store-backed incremental corpus admission)
    from . import round21_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

# ---------------------------------------------------------------------------
# Driver-verification rotation.
#
# The correctness driver records the FIRST 50 registry entries in iteration
# order each round. CORRECTNESS_r10 came back 49 green + 1 err: the
# single red was docs_semdedup_increment's ORACLE OOMing the driver's
# DuckDB (an allocator-footprint problem, not a wrong answer — fixed in
# r11 by the compile-footprint-bounded oracle forms in
# functions/vectors.py, enforced by tests/test_oracle_footprint.py).
#
# The round-11 window below was WRITTEN BY `python scripts/plan_rotation.py
# --apply` (re-run after every addition batch; the planner rewrites
# this block in place). It derives from the CORRECTNESS_r*.json files
# on disk: docs_semdedup_increment leads (the one query without a
# hash-green row), the seven round-11 additions (IVF cell split + its
# recall audit, trained quality classifier + serving pass, incremental
# corpus build, epoch shard shuffle, data-constrained epoch cap
# water-fill) follow as never-checked, and the rest of the window is
# pure stalest-green refresh — the r3/r4-era roundtrip/store/window
# block whose most-recent green rows are oldest.
#
# ROTATION POLICY (standing): step zero of every round is two commands:
#   python scripts/plan_rotation.py --apply
#   python scripts/gen_driver_map.py --write
# (the planner emits never-checked first, then the 50 queries whose
# most-recent driver-green row is OLDEST, breaking ties by registry
# order). New queries go straight to REGISTRY + the front of
# _DRIVER_FIRST (they are never-checked by definition and outrank any
# refresh); staging is only for overflow beyond the 25-query
# never-checked bound. The rotation guards (tests/test_parity.py::
# test_driver_window_covers_unverified_queries and
# ::test_refresh_slots_are_the_stalest_greens) read the actual
# CORRECTNESS files, never this prose.
# ---------------------------------------------------------------------------
_DRIVER_FIRST = [
    # -- generated by scripts/plan_rotation.py --apply (never-checked=0, stale refill=50) --
    "value_mad_outliers",
    "variant_props_histogram",
    "vwap_weekly",
    "array_agg_user_profile",
    "brand_bracket_revenue",
    "custkey_skew_profile",
    "customer_order_distribution",
    "customer_rfm_segments",
    "daily_seasonal_backtest",
    "daily_type_share",
    "docs_bow_dedup",
    "docs_char_diversity",
    "docs_cluster_canonical",
    "docs_containment_prefix_pairs",
    "docs_overlap_chunks",
    "docs_prefix_jaccard_pairs",
    "docs_quality_classifier",
    "docs_rare_bigram_rate",
    "docs_simhash",
    "docs_simhash_hamming_pairs",
    "docs_source_cap",
    "docs_span_dedup",
    "emb_ann_adc",
    "emb_ann_ivfpq",
    "emb_ann_ivfpq_increment",
    "emb_cosine_topk",
    "emb_power_iteration",
    "emb_pq_quantize",
    "emb_variance_explained",
    "events_debounce",
    "idle_rich_customers",
    "large_order_customers",
    "late_ship_priority_counts",
    "multimodal_bmp_decode",
    "multimodal_y4m_frames",
    "nation_pair_trade",
    "order_value_deciles",
    "part_revenue_concentration",
    "price_quantity_corr",
    "promo_revenue_share",
    "purchase_state_asof",
    "regional_market_share",
    "segment_priority_chisq",
    "small_quantity_revenue",
    "sole_late_supplier_orders",
    "store_lifecycle_preview",
    "streaming_click_outer_join",
    "supplier_revenue_gini",
    "top_revenue_suppliers",
    "value_ks_two_sample",
]


def _reorder_registry() -> None:
    """Re-key REGISTRY so driver-priority queries iterate first."""
    ordered = {n: REGISTRY.pop(n) for n in _DRIVER_FIRST if n in REGISTRY}
    ordered.update(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
