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
# order each round. CORRECTNESS_r08.json came back 50/50 green (rows +
# schema + hash, zero err), draining all 25 block-6 queries, all 22
# round-11/12/13 promotions, and 3 of round-8's late additions;
# cumulatively 242/246 pre-round-9 queries hold a driver-green row
# (COVERAGE.md's driver map is the authoritative ledger).
#
# The round-9 window below was WRITTEN BY `python scripts/plan_rotation.py
# --apply` (re-run after every addition batch; the planner rewrites
# this block in place). It derives from the CORRECTNESS_r*.json files
# on disk: never-driver-checked queries lead — the 4-query r8 queue
# (`emb_hybrid_rrf`, `multimodal_gif_resize`, `docs_bpe_encode`,
# `docs_bm25_index_increment`) followed by round 9's 20 additions (MP4
# container + frame sampling, the URL lane, corpus_build + shard
# manifest, incremental contamination, CDC chunking, phrase match,
# content drift, pair filter, robots, WARC + .warc.gz, UTF-8
# validation, MIME census) — 24 never-checked, inside the 25 bound —
# and the remaining 26 slots refill with the STALEST greens (the
# r1/r2-era flagship/watermark/dedup/core block). After CORRECTNESS_r09
# lands green, the r8 queue is drained and stale-refresh resumes at
# full width.
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
