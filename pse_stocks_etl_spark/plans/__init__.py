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

# ---------------------------------------------------------------------------
# Driver-verification rotation.
#
# The correctness driver records the FIRST 50 registry entries in iteration
# order each round. CORRECTNESS_r07.json came back 50/50 green (rows +
# schema + hash, zero err), draining the whole round-7 window: the
# round-7 second batch, every round-8/9 addition, the store-lifecycle
# and incremental-IVFPQ queries, and three stale-green refreshers are
# all driver-confirmed. Cumulatively 192/239 queries held a driver-green
# row entering round 8 (COVERAGE.md's driver map is the authoritative
# ledger).
#
# The round-8 window below was WRITTEN BY `python scripts/plan_rotation.py
# --apply` (new this round — the planner rewrites this block in place;
# no more hand-pasting). It derives from the CORRECTNESS_r*.json files
# on disk: the never-driver-checked queries lead — the 25-query
# block-6 queue (round-6 second batch + TPC-H sweep completion), the
# 22 round-11/12/13 queries promoted out of plans/staging.py this
# round (stage() → register(); staging is EMPTY again and stays a
# queue), and this round's seven additions (`multimodal_jpeg_decode`,
# then the retrieval/tokenizer batch: `multimodal_gif_decode`,
# `docs_bm25_topk`, `emb_hybrid_rrf`, `multimodal_gif_resize`,
# `docs_bpe_encode`, `docs_bm25_index_increment`). 54 never-checked
# > 50 slots, so the stale-green refill dropped to zero and the last
# four sit in the DECLARED next-window queue (4 / bound 25, drains in
# round 9) — after the r8 AND r9 CORRECTNESS files land green, every
# query the engine has will hold a driver-green row.
#
# POST-DRAIN ROTATION POLICY (round 9+): with the backlog at zero and
# staging empty, future windows are pure stale-green refresh. Step
# zero of every round is now two commands:
#   python scripts/plan_rotation.py --apply
#   python scripts/gen_driver_map.py --write
# (the planner emits the 50 queries whose most-recent driver-green row
# is OLDEST — r1/r2 first; the flagship/watermark/dedup/ANN block has
# not been re-confirmed since round 2 — breaking ties by registry
# order). New queries go straight to REGISTRY + the front of
# _DRIVER_FIRST (they are never-checked by definition and outrank any
# refresh); staging is only for overflow beyond the 25-query
# never-checked bound, which a zero backlog makes unlikely. The
# rotation guards (tests/test_parity.py::
# test_driver_window_covers_unverified_queries and
# ::test_refresh_slots_are_the_stalest_greens) read the actual
# CORRECTNESS files, never this prose.
# ---------------------------------------------------------------------------
_DRIVER_FIRST = [
    # -- generated by scripts/plan_rotation.py --apply (never-checked=24, stale refill=26) --
    "emb_hybrid_rrf",
    "multimodal_gif_resize",
    "docs_bpe_encode",
    "docs_bm25_index_increment",
    "multimodal_mp4_metadata",
    "docs_url_canonicalize",
    "docs_url_dedup",
    "docs_domain_cap",
    "corpus_build",
    "docs_incremental_contamination",
    "docs_url_filter",
    "docs_incremental_url_dedup",
    "multimodal_mp4_frame_sample",
    "docs_cdc_chunks",
    "corpus_shard_manifest",
    "docs_phrase_match",
    "docs_url_content_drift",
    "multimodal_pair_filter",
    "docs_robots_filter",
    "docs_warc_records",
    "docs_warc_gz_records",
    "docs_html_extract",
    "docs_utf8_validate",
    "docs_mime_census",
    "anti_join_uptodate",
    "asof_click_attribution",
    "broadcast_watermark_join",
    "classify_freshness",
    "datasource_price_scan",
    "date_parse_format",
    "dedup_argmax",
    "distinct_count_per_key",
    "distinct_dims",
    "docs_bpe_token_stats",
    "docs_exact_dedup",
    "docs_fingerprint",
    "docs_lang_id",
    "docs_minhash_lsh_pairs",
    "docs_near_dup_clusters",
    "docs_ngram_jaccard_pairs",
    "docs_pii_scrub",
    "docs_quality_score",
    "docs_split_assign",
    "docs_token_stats",
    "docs_top_terms",
    "emb_ann_ivf",
    "emb_ann_lsh",
    "emb_kmeans_refine",
    "emb_near_dup_pairs",
    "freshness_merge_preview",
]


def _reorder_registry() -> None:
    """Re-key REGISTRY so driver-priority queries iterate first."""
    ordered = {n: REGISTRY.pop(n) for n in _DRIVER_FIRST if n in REGISTRY}
    ordered.update(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
