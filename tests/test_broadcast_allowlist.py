"""Broadcast-hint allowlist guard (r7 VERDICT item 3).

A forced `F.broadcast(...)` hint overrides the planner's size check —
correct ONLY when the build side's cardinality is BOUNDED by
construction (nation/region at 25/5 rows, scalar aggregates, frozen
centroid/offset tables, enum-keyed stats). Hinting an sf-scaled
relation (customer / supplier / part / documents or a per-key
aggregate over their keys) is a 100 TB scale hazard: the hint still
"works" at test scale, then OOMs the executors at the real one —
exactly the class the round-7 verdict flagged at seven sites
(docs_pipeline_keep drop sets, star_join_revenue's customer,
the Q7/Q9/Q10 analog dims, streaming_static_enrich, fk_orphan_audit).

This guard makes the class structurally red: every `F.broadcast(`
call site in the engine is extracted by AST and must appear in the
reviewed allowlist below, where each entry records WHY its frame is
bounded. Removing a hint never breaks this test; ADDING one (or
re-adding a removed one) fails until it is consciously reviewed here.
Values are never affected — broadcast vs shuffle is a physical-plan
choice — so the parity suite cannot catch this class; only a source
guard can.
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "pse_stocks_etl_spark")

# (relative path, unparsed argument) -> why the frame is bounded.
ALLOWED = {
    # --- operator contract: J4 "broadcast watermark join" (SURVEY §2.4).
    # The watermark frame is one row per merge key ALREADY AGGREGATED
    # map-side; the operator's documented contract is that the key set
    # fits (the reference syncs ~300 symbols). The registered
    # broadcast_watermark_join query is the explicit demonstration.
    ("operators/watermark.py", "wm_df"): "J4 operator contract: per-key watermark, keys fit by contract",
    ("plans/core_queries.py", "wm"): "J4 demo query: per-suppkey watermark, same contract",
    # --- fixed-cardinality dimensions: 25 nations / 5 regions at ANY sf.
    ("plans/core_queries.py", "n"): "nation: 25 rows at any sf",
    ("plans/core_queries.py", "r"): "region: 5 rows at any sf",
    ("plans/corpus_queries.py", "n"): "nation",
    ("plans/corpus_queries.py", "cn"): "nation projection (cust side)",
    ("plans/corpus_queries.py", "sn"): "nation projection (supp side)",
    ("plans/round8_queries.py", "cn"): "nation projection",
    ("plans/round8_queries.py", "sn"): "nation projection",
    ("plans/round9_queries.py", "nc"): "nation",
    ("plans/round9_queries.py", "ns"): "nation projection",
    ("plans/round9_queries.py", "r"): "region",
    ("plans/round10_queries.py", "n"): "nation",
    ("plans/round11_queries.py", "n"): "nation",
    ("plans/round11_queries.py", "r"): "region",
    # --- scalar / few-row aggregates (1 row, or rows bounded by a
    # constant: grouping over an enum column or a frozen literal set).
    ("plans/corpus_queries.py", "stats"): "global scalar stats (1 row)",
    ("plans/corpus_queries.py", "total"): "global total (1 row)",
    ("plans/corpus_queries.py", "rates"): "per-language rates (bounded language enum)",
    ("plans/corpus_queries.py", "fences"): "per-language quantile fences (bounded enum)",
    ("plans/corpus_queries.py", "offsets"): "per-bucket prefix offsets (fixed bucket count)",
    ("plans/ext_queries.py", "total"): "global total (1 row)",
    ("plans/round17_queries.py", "best"): "BPE winning merge pair (limit(1) of the pair-count agg — exactly 1 row)",
    ("plans/round17_queries.py", "counters"): "count-min counter table: d*w = 3*64 = 192 cells by construction, independent of data",
    ("plans/round18_queries.py", "tot"): "global corpus count (1 row): quantile rank targets",
    ("plans/round18_queries.py", "rates"): "per-source sampling rates: registered-source catalog is a bounded dimension (20 sources at any sf)",
    ("plans/round18_queries.py", "cum"): "cumulative log2 histogram: <= 64 buckets at any corpus size",
    ("plans/round18_queries.py", "need"): "routed quantile buckets: <= len(QUANTILES) = 3 rows",
    ("plans/round18_queries.py", "cents"): "frozen IVF coarse centroids: 16 rows by construction (same contract as llm_queries cents)",
    ("plans/ext_queries.py", "days"): "per-day frame (bounded by calendar horizon)",
    ("plans/ext_queries.py", "sk"): "per-event-type sketch (bounded event-type enum)",
    ("plans/ext_queries.py", "ei"): "event-type pair stats (bounded enum^2)",
    ("plans/ext_queries.py", "ca.alias('ca_a')"): "per-event-type aggregate (bounded enum)",
    ("plans/ext_queries.py", "ca.alias('ca_b')"): "per-event-type aggregate (bounded enum)",
    ("plans/ext_queries.py", "types.alias('b')"): "event-type list (bounded enum)",
    ("plans/ext_queries.py", "counters"): "CMS counter grid (fixed d x w)",
    ("plans/round6_queries.py", "tot"): "global total (1 row)",
    ("plans/round6_queries.py", "budget"): "scalar budget (1 row)",
    ("plans/round6_queries.py", "n_orders"): "global count (1 row)",
    ("plans/round6_queries.py", "n_tri"): "global triangle count (1 row)",
    ("plans/round6_queries.py", "offsets"): "per-bucket offsets (fixed bucket count)",
    ("plans/round6_queries.py", "bitmap"): "bloom-filter bitmap rows (fixed m bits / 64)",
    ("plans/round7_queries.py", "mad"): "per-event-type MAD (bounded enum)",
    ("plans/round7_queries.py", "med"): "per-event-type median (bounded enum)",
    ("plans/round7_queries.py", "maxw"): "scalar max week (1 row)",
    ("plans/round7_queries.py", "total"): "global total (1 row)",
    ("plans/round7_queries.py", "offsets"): "per-bucket offsets (fixed bucket count)",
    ("plans/round8_queries.py", "maxd"): "scalar max date (1 row)",
    ("plans/round8_queries.py", "offsets"): "per-bucket offsets (fixed bucket count)",
    ("plans/round8_queries.py", "qq"): "PQ codebook / query rows (frozen literals)",
    ("plans/round9_queries.py", "bal"): "scalar balance threshold (1 row)",
    ("plans/round9_queries.py", "m"): "scalar (1 row)",
    ("plans/round9_queries.py", "mx"): "scalar max (1 row)",
    ("plans/round9_queries.py", "tot"): "global total (1 row)",
    ("plans/round9_queries.py", "top"): "argmax ties (~1 row by construction)",
    ("plans/round9_queries.py", "cents_df"): "frozen 16-centroid table",
    ("plans/round9_queries.py", "probes"): "per-query probe cells (k_probe x queries, frozen)",
    ("plans/round9_queries.py", "qq"): "frozen query vectors",
    ("plans/round10_queries.py", "q"): "frozen query vectors",
    ("plans/round10_queries.py", "total"): "global total (1 row)",
    ("plans/round10_queries.py", "offsets"): "per-bucket offsets (fixed bucket count)",
    ("plans/round10_queries.py", "bc"): "per-bucket target counts (fixed DSIR bucket count)",
    ("plans/round10_queries.py", "sized"): "per-cohort-day sizes (bounded by calendar horizon)",
    ("plans/round13_queries.py", "anchor"): "scalar max ts (1 row)",
    ("plans/round13_queries.py", "theta"): "scalar CUPED theta (1 row)",
    ("plans/round13_queries.py", "tot"): "global total (1 row)",
    ("plans/round13_queries.py", "offsets"): "per-partition prefix maxima (fixed partition count)",
    ("plans/round13_queries.py", "affected_days"): "shard-touched days (bounded by shard time span)",
    ("plans/round13_queries.py", "affected_weeks"): "shard-touched weeks (bounded by shard time span)",
    ("plans/llm_queries.py", "cents"): "frozen 16-centroid table",
    ("plans/llm_queries.py", "q"): "frozen query vectors",
    ("plans/round15_queries.py", "totals"): "global corpus totals (1 row)",
    ("plans/round15_queries.py", "dfm"): "per-query-term df (bounded by the frozen 5-term list)",
    ("plans/round15_queries.py", "df_merged"): "merged per-query-term df (bounded by the frozen 5-term list)",
    ("plans/round15_queries.py", "q"): "single query vector (1 row by literal-id filter)",
    ("plans/llm_queries.py", "qvecs"): "frozen query vectors",
    ("plans/llm_queries.py", "probes"): "per-query probe cells (frozen)",
    # --- hot/skew lists: keys ABOVE a frequency cap. Cardinality is
    # bounded by corpus_size / cap (the heavy-hitter bound), which the
    # cap is chosen to keep broadcast-able — the standard skew-join
    # sidecar. If a cap changes, re-review.
    ("plans/llm_queries.py", "hot"): "LSH bucket-cap hot list (≤ n/cap keys)",
    ("plans/llm_queries.py", "wide"): "over-cap bucket list (≤ n/cap keys)",
    ("plans/corpus_queries.py", "wide"): "over-cap bucket list (≤ n/cap keys; the pipeline composition's width cap, same bound as llm_queries wide)",
    ("plans/round9_queries.py", "wide"): "over-cap block list (≤ n/cap keys)",
    ("plans/round9_queries.py", "hot_srcs"): "over-cap source list (bounded source enum)",
    ("plans/round9_queries.py", "small_srcs"): "under-cap source list (bounded source enum)",
    ("plans/round11_queries.py", "wide"): "over-cap block list (≤ n/cap keys)",
    # --- benchmark-by-contract: the contamination benchmark models an
    # EXTERNAL eval set (bounded by contract, not by the corpus); the
    # synthetic split derives it from documents only because the
    # testdata has no second table. Documented in docs_contamination.
    ("plans/corpus_queries.py", "bench"): "benchmark shingles: eval sets are bounded by contract",
    ("plans/corpus_queries.py", "bench_sh"): "benchmark shingles, distinct-text representatives (subset of the bounded-by-contract bench set)",
    ("plans/round16_queries.py", "new_bench"): "NEW benchmark slice shingles: eval sets are bounded by contract (same as corpus_queries bench)",
    # docs_domain_cap: registered domains are NOT a bounded enum (a
    # real crawl has ~1e8), so ONLY the over-cap hot list broadcasts —
    # heavy-hitter bound <= n/cap; the under-cap tail routes via
    # broadcast ANTI join against the same bounded list (r9 review).
    ("plans/round16_queries.py", "hot_doms"): "over-cap domain list (<= n/cap keys, heavy-hitter bound); used for BOTH semi and anti routing",
    # --- round-20 lanes (r11): IVF split / incremental build / training
    ("plans/round20_queries.py", "tmax"): "global max id (1 row)",
    ("plans/round20_queries.py", "n_frame"): "label count (1 row)",
    ("plans/round20_queries.py", "split_cells"): "split-cell set: <= n_cells (16 frozen) rows",
    ("plans/round20_queries.py", "cent"): "split cells' centroid vectors: <= 16 rows",
    ("plans/round20_queries.py", "centroids"): "Lloyd seeds / trained sub-centroids: <= 2 per split cell (<= 32)",
    ("plans/round20_queries.py", "over_st"): "over-cap bucket list (<= n/cap keys, same bound as llm_queries wide)",
    ("plans/round20_queries.py", "over_union"): "over-cap bucket list (<= n/cap keys)",
    ("plans/round20_queries.py", "flipped"): "buckets that crossed the cap when the batch landed: subset of over_union (<= n/cap keys)",
    ("plans/round20_queries.py", "epochs"): "epoch enum (SHUFFLE_EPOCHS = 2 rows)",
    ("plans/round20_queries.py", "probes_tbl"): "probe vectors: <= 16 centroids + 2 per split cell (<= 48 rows)",
    ("plans/round20_queries.py", "q"): "frozen query vectors (3 rows)",
    ("plans/round20_queries.py", "qprobe"): "per-query probed sub-cells (3 x nprobe rows)",
    ("plans/round20_queries.py", "rep_sh"): "benchmark-rep shingles (subset of the bounded-by-contract bench set, same as corpus_queries bench_sh)",
    ("plans/round20_queries.py", "w"): "trained weight vector: <= QTRAIN_BUCKETS+1 = 65 rows",
    # --- round-21 lanes (r12): store-backed admission / iterated split /
    # epoch plan / DSIR / classifier-distilled build
    ("plans/round21_queries.py", "tmax"): "global max id (1 row; three sites: store seed, batch featurize, DSIR increment split)",
    ("plans/round21_queries.py", "bt_hash.select('h')"): "batch content hashes: one row per BATCH doc — the admission contract's small side; broadcasting it is the point (matched-then-anti, so the 100 TB keeper table never shuffles). A batch too big to broadcast is a re-seed event, not an admission",
    ("plans/round21_queries.py", "matched"): "keeper hashes hit by the batch: subset of the batch hash set above",
    ("plans/round21_queries.py", "bt_bench.select('h')"): "batch's benchmark-slice hashes: subset of the batch hash set",
    ("plans/round21_queries.py", "matched_rep"): "standing reps hit by the batch: subset of the batch bench hashes",
    ("plans/round21_queries.py", "over_st"): "over-cap bucket list from the persisted widths (<= n/cap keys)",
    ("plans/round21_queries.py", "over_union"): "over-cap ∪ flipped buckets (<= n/cap keys)",
    ("plans/round21_queries.py", "flipped"): "buckets the batch pushed over the cap: subset of batch-touched buckets, <= n/cap keys",
    ("plans/round21_queries.py", "rep_sh"): "benchmark-rep shingles (bounded-by-contract bench set, same as corpus_queries bench_sh; two sites: store seed + admission)",
    ("plans/round21_queries.py", "over"): "overloaded cell keys per iterate round: <= current cell count (<= 16·2^ROUNDS = 64)",
    ("plans/round21_queries.py", "chot"): "hot cells' centroid vectors: subset of `over`",
    ("plans/round21_queries.py", "centroids"): "Lloyd seeds / trained sub-centroids: <= 2 per hot cell (<= 128)",
    ("plans/round21_queries.py", "alloc"): "per-source epoch allocation: bounded source enum (the mixture-lane bound)",
    ("plans/round21_queries.py", "wt"): "DSIR weight table: <= DSIR_BUCKETS = 4096 rows by construction",
    ("plans/round21_queries.py", "w"): "trained quality-classifier weight vector: <= QTRAIN_BUCKETS+1 = 65 rows",
    ("plans/round6_queries.py", "du"): None,  # REMOVED r8 — left as tombstone
    ("plans/round6_queries.py", "dv"): None,  # REMOVED r8 — tombstone
}
# Tombstones (value None) document hints that were removed; they must
# NOT exist in the source anymore.
ALLOWED_LIVE = {k for k, v in ALLOWED.items() if v is not None}
TOMBSTONES = {k for k, v in ALLOWED.items() if v is None}


def _broadcast_sites() -> set[tuple[str, str]]:
    sites = set()
    for root, _, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            tree = ast.parse(open(path).read())
            rel = os.path.relpath(path, PKG)
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "broadcast"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "F"
                ):
                    sites.add((rel, ast.unparse(node.args[0])))
    return sites


def test_every_broadcast_hint_is_reviewed():
    sites = _broadcast_sites()
    unreviewed = sites - ALLOWED_LIVE
    assert not unreviewed, (
        "F.broadcast() hints not in the reviewed allowlist "
        f"(tests/test_broadcast_allowlist.py): {sorted(unreviewed)}. "
        "A forced broadcast is only safe on a BOUNDED-cardinality frame; "
        "if this side scales with sf, drop the hint and let AQE size it "
        "(r7 VERDICT item 3). If it is genuinely bounded, add it with a "
        "why."
    )


def test_removed_hints_stay_removed():
    sites = _broadcast_sites()
    resurrected = sites & TOMBSTONES
    assert not resurrected, (
        f"broadcast hints re-added after removal: {sorted(resurrected)}"
    )


def test_allowlist_has_no_stale_live_entries():
    """Allowlist rot guard: every live entry must still exist in the
    source (so the list stays the real inventory, not a graveyard)."""
    sites = _broadcast_sites()
    stale = ALLOWED_LIVE - sites
    assert not stale, f"allowlist entries no longer in source: {sorted(stale)}"
