"""Round-21 tests: store-backed incremental corpus admission.

The oracle gate (corpus_build's full-rebuild SQL, strict value-hash)
covers the natural fixtures; these tests pin what the fixtures cannot:
the flipped-bucket revision path against the PERSISTED store state, the
array-form MinHash/bucket helpers against their explode-groupBy twins,
and the durability contract (memory-cache clears must not lose the
on-disk store).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def flip_corpus(spark, tmp_path_factory):
    """Same engineered corpus as tests/test_round20.py: LSH bucket
    widths cross a cap of 33 exactly when the batch lands."""
    import os

    CORE = " ".join(f"w{i}" for i in range(20))
    rows = [
        (i, f"{CORE} uniq{i}", "en", "srcA", 100) for i in range(40)
    ] + [
        (40, "totally different text about other things entirely", "en", "srcB", 50),
        (41, "another unrelated document body with its own words", "en", "srcB", 50),
    ]
    sf = str(tmp_path_factory.mktemp("flip_sf21"))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    return sf


def _drop_store(sf_dir):
    """Forget any durable store seeded for sf_dir (cap monkeypatches
    change the standing state, so a store seeded under one cap must not
    leak into tests running under another)."""
    from pse_stocks_etl_spark.plans.round21_queries import _STORE_ROOTS

    for key in [k for k in _STORE_ROOTS if k[1] == sf_dir]:
        _STORE_ROOTS.pop(key)


def test_array_minhash_equals_grouped_form(spark):
    """minhash_sig_array / band_bucket_array == the explode-groupBy
    _minhash_sig / _band_buckets, doc for doc, on the natural fixture —
    the equality the featurized batch projection rests on."""
    from pse_stocks_etl_spark.plans.llm_queries import (
        _band_buckets,
        _minhash_sig,
        _shingle_explode,
        band_bucket_array,
        minhash_sig_array,
        shingle_array,
    )

    docs = (
        spark.read.parquet(SF_DIR + "/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    grouped = _band_buckets(_minhash_sig(_shingle_explode(spark, SF_DIR)))
    arr = (
        docs.select("doc_id", shingle_array(F.col("text")).alias("sh_arr"))
        .filter(F.size("sh_arr") > 0)
        .select(
            "doc_id",
            F.explode(
                band_bucket_array(minhash_sig_array(F.col("sh_arr")))
            ).alias("bk"),
        )
    )
    a = {(r.doc_id, r.bk) for r in grouped.collect()}
    b = {(r.doc_id, r.bk) for r in arr.collect()}
    assert a == b and len(a) > 0


def test_store_increment_matches_rebuild_on_natural_data(spark):
    """Spark-vs-Spark equality at the natural test SF (covers the
    new-reps contamination path: the fixture's batch carries unseen
    benchmark text)."""
    from pse_stocks_etl_spark import plans

    rebuild = sorted(
        map(tuple, plans.REGISTRY["corpus_build"].fn(spark, SF_DIR).collect())
    )
    incr = sorted(
        map(
            tuple,
            plans.REGISTRY["corpus_build_increment_store"].fn(spark, SF_DIR).collect(),
        )
    )
    assert incr == rebuild and len(rebuild) > 0


def test_store_increment_equals_rebuild_under_bucket_flips(
    spark, flip_corpus, monkeypatch
):
    """The store-backed admission must revoke persisted near-dup flags
    exactly where the union-width cap kills their witness buckets —
    the revision path is dead at natural SFs, so this is where it
    executes against REAL persisted state."""
    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans import llm_queries
    from pse_stocks_etl_spark.plans.llm_queries import clear_working_set_caches

    monkeypatch.setattr(llm_queries, "LSH_BUCKET_CAP", 33)
    clear_working_set_caches()
    _drop_store(flip_corpus)
    try:
        rebuild = sorted(
            map(tuple, plans.REGISTRY["corpus_build"].fn(spark, flip_corpus).collect())
        )
        incr = sorted(
            map(
                tuple,
                plans.REGISTRY["corpus_build_increment_store"]
                .fn(spark, flip_corpus)
                .collect(),
            )
        )
        assert incr == rebuild and len(rebuild) > 0
    finally:
        clear_working_set_caches()
        _drop_store(flip_corpus)


def test_store_root_survives_cache_clear(spark):
    """Durability contract: clearing the MEMORY working-set caches must
    not delete the on-disk store — the next context re-READS the same
    root instead of re-deriving the standing build."""
    from pse_stocks_etl_spark.plans import round21_queries as r21
    from pse_stocks_etl_spark.plans.llm_queries import clear_working_set_caches

    ctx1 = r21._standing_ctx(spark, SF_DIR)
    root1 = ctx1.root
    clear_working_set_caches()
    ctx2 = r21._standing_ctx(spark, SF_DIR)
    assert ctx2.root == root1, "store was re-seeded after a memory-cache clear"
    assert ctx2 is not ctx1, "handle must be rebuilt (frames were unpersisted)"


def test_store_tables_are_versioned_parquet_tables(spark):
    """The standing state is a real ParquetTable store (versioned
    commit protocol), not loose parquet files."""
    import os

    from pse_stocks_etl_spark.plans import round21_queries as r21
    from pse_stocks_etl_spark.store.parquet_table import ParquetTable
    from pyspark.sql import types as T

    root = r21._standing_ctx(spark, SF_DIR).root
    for name in (r21._T_KEEPERS, r21._T_KCAND, r21._T_BK, r21._T_SH_ARR):
        t = ParquetTable(spark, os.path.join(root, name), T.StructType([]))
        assert t.exists()
        assert t.current_version() >= 1


def _iter_members(spark):
    """Synthetic 2-cell frame engineered so the overload bar (n*2 >
    3*ideal) splits cell A in round 1, leaves sub-cell A.0 overloaded,
    and round 2 clears it — the iterate-to-quiescence behaviour the
    natural fixture (one shallow split) cannot exercise."""
    rows = []
    vid = 0
    # cell A: 4 docs near [1, ~0], 4 near [0.7, 0.71], 4 near [0.05, 1]
    for i in range(4):
        rows.append((vid, "A", [1.0, 0.02 + 0.01 * i])); vid += 1
    for i in range(4):
        rows.append((vid, "A", [0.70 + 0.01 * i, 0.71])); vid += 1
    for i in range(4):
        rows.append((vid, "A", [0.05 + 0.01 * i, 1.0])); vid += 1
    # cell B: 2 docs
    rows.append((vid, "B", [-1.0, 0.1])); vid += 1
    rows.append((vid, "B", [-1.0, 0.2])); vid += 1
    member = spark.createDataFrame(
        [(v, 0, ck, vec) for v, ck, vec in rows],
        "vec_id long, cell long, ck string, v array<double>",
    )
    cents = spark.createDataFrame(
        [("A", [1.0, 0.0]), ("B", [-1.0, 0.0])], "ck string, cvec array<double>"
    )
    return member, cents


def test_split_iterate_clears_overloaded_subcell_in_round2(spark):
    """Round 1 splits the overloaded cell but leaves an over-bar
    sub-cell; round 2 splits exactly that sub-cell; a third round is a
    pure pass-through (quiescence). Max cell population is monotone
    non-increasing across rounds."""
    from pse_stocks_etl_spark.plans.round21_queries import ivf_split_iterate_parts

    member, cents = _iter_members(spark)
    states = ivf_split_iterate_parts(member, cents, rounds=3)

    def pops(m):
        out = {}
        for r in m.groupBy("ck").count().collect():
            out[r.ck] = r["count"]
        return out

    p0, p1, p2, p3 = (pops(s[0]) for s in states)
    assert p0 == {"A": 12, "B": 2}
    # round 1: A (12 > 1.5*7) splits 4 + 8; B untouched. The [0.7,0.71]
    # band lands with the furthest-point seed (sub 1): cos to the
    # [0.05,1] seed ~0.746 beats cos to the old [1,0] centroid ~0.702,
    # and the trained sub-centroids only sharpen that margin.
    assert p1 == {"A.0": 4, "A.1": 8, "B": 2}
    # round 2: A.1 (8 > 1.5*4) splits into 4 + 4; everything else stands
    assert p2 == {"A.0": 4, "A.1.0": 4, "A.1.1": 4, "B": 2}
    # round 3: overload set empty (max 4 <= 1.5*3) -> exact pass-through
    assert p3 == p2
    assert max(p0.values()) >= max(p1.values()) >= max(p2.values()) >= max(p3.values())
    # membership is conserved: no vec lost or duplicated, ever
    n0 = states[0][0].count()
    for m, _ in states[1:]:
        assert m.count() == n0
        assert m.select("vec_id").distinct().count() == n0


def test_split_iterate_registry_splits_at_fixture(spark):
    """The maintenance bar genuinely engages on the natural fixture:
    the final cell-key set is strictly larger than the frozen 16 and
    every member is preserved."""
    from pse_stocks_etl_spark import plans

    out = plans.REGISTRY["emb_ivf_split_iterate"].fn(spark, SF_DIR)
    rows = out.collect()
    keys = {r.cell_key for r in rows}
    assert len(keys) > 16, "no cell split at the fixture — bar never engaged"
    assert any("." in k for k in keys)
    # populations are consistent with the emitted n_cell
    from collections import Counter

    pop = Counter(r.cell_key for r in rows)
    assert all(pop[r.cell_key] == r.n_cell for r in rows)


def test_epoch_plan_conservation(spark):
    """The dataloader cursor sequence conserves the allocation: per
    source, Σ take_tokens == min(alloc_tokens, available tokens across
    the shuffled epochs); no chunk draw exceeds the chunk; cursor
    positions are 1..K consecutive over admitted chunks per epoch."""
    from collections import defaultdict

    from pse_stocks_etl_spark import plans

    rows = plans.REGISTRY["corpus_epoch_plan"].fn(spark, SF_DIR).collect()
    assert rows
    alloc = {
        r.source: r.alloc_tokens
        for r in plans.REGISTRY["docs_epoch_cap_redistribute"].fn(spark, SF_DIR).collect()
    }
    taken, avail = defaultdict(int), defaultdict(int)
    for r in rows:
        assert 0 <= r.take_tokens <= r.chunk_tokens
        taken[r.source] += r.take_tokens
        avail[r.source] += r.chunk_tokens
    for src, t in taken.items():
        assert t == min(alloc.get(src, 0), avail[src]), (src, t, alloc.get(src), avail[src])
    # cursor: consecutive 1..K per epoch over admitted chunks, ordered
    # by shuffle_pos; skipped chunks carry NULL
    by_epoch = defaultdict(list)
    for r in rows:
        by_epoch[r.epoch].append(r)
    for ep, rs in by_epoch.items():
        rs.sort(key=lambda r: r.shuffle_pos)
        want = 1
        for r in rs:
            if r.take_tokens > 0:
                assert r.cursor_pos == want, (ep, r.shuffle_pos, r.cursor_pos, want)
                want += 1
            else:
                assert r.cursor_pos is None


def _dsir_corpus(spark):
    """Engineered corpus: the target slice speaks vocab A; raw docs are
    either in-distribution (vocab A — DSIR should uprank) or
    off-distribution (vocab B — downrank)."""
    a = "alpha beta gamma delta epsilon zeta"
    b = "zork quux blorp fnord grue wumpus"
    rows = (
        [(i, "tgt", a) for i in range(10)]
        + [(100 + i, "rawsrc", a) for i in range(5)]  # in-distribution
        + [(200 + i, "rawsrc", b) for i in range(5)]  # off-distribution
    )
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_dsir_separates_in_from_off_distribution(spark):
    """Every in-distribution raw doc outscores every off-distribution
    raw doc, and the target slice's own scores sit at/above the
    in-distribution raw scores (it IS the target sample)."""
    from pse_stocks_etl_spark.plans.round21_queries import dsir_scored

    rows = dsir_scored(_dsir_corpus(spark), target_sources=("tgt",)).collect()
    by_id = {r.doc_id: r for r in rows}
    in_dist = [by_id[100 + i].score_ppm for i in range(5)]
    off_dist = [by_id[200 + i].score_ppm for i in range(5)]
    assert min(in_dist) > max(off_dist), (in_dist, off_dist)
    tgt = [by_id[i].score_ppm for i in range(10)]
    assert min(tgt) >= min(in_dist)
    # smoothing keeps everything finite and positive
    assert all(r.score_ppm > 0 for r in rows)
    assert all(r.n_toks == 6 for r in rows)


def test_dsir_select_contract(spark):
    """Selection invariants on the registry fixture: acceptance is the
    capped half-score, the coin is the doc's own hash (re-run gives
    identical decisions), and keep == hash < accept exactly."""
    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans.round18_queries import PPM

    out = plans.REGISTRY["docs_dsir_select"].fn(spark, SF_DIR)
    rows = out.collect()
    assert rows
    for r in rows:
        assert 0 <= r.accept_ppm <= PPM
        assert r.accept_ppm == min(PPM, r.score_ppm // 2)
        assert 0 <= r.hash_ppm < PPM
        assert r.keep == (r.hash_ppm < r.accept_ppm)
    again = {r.doc_id: r.keep for r in out.collect()}
    assert again == {r.doc_id: r.keep for r in rows}


def test_dsir_target_slice_outscores_raw_at_fixture(spark):
    """On the driver fixture the curated slice's mean score must beat
    the raw mean — the lane's self-diagnostic (if this fails, the
    weight table learned nothing)."""
    from pse_stocks_etl_spark import plans

    rows = plans.REGISTRY["docs_dsir_weights"].fn(spark, SF_DIR).collect()
    tgt = [r.score_ppm for r in rows if r.is_target]
    raw = [r.score_ppm for r in rows if not r.is_target]
    assert tgt and raw
    assert sum(tgt) / len(tgt) > sum(raw) / len(raw)


def test_build_quality_is_gate_intersection(spark):
    """corpus_build_quality packs exactly the docs BOTH gates keep —
    its doc set is the intersection, a strict subset check against the
    plain build, and the packing arithmetic agrees doc-for-doc with
    corpus_build on the shared survivors' (split, source) windows."""
    from pse_stocks_etl_spark import plans

    q = plans.REGISTRY["corpus_build_quality"].fn(spark, SF_DIR).collect()
    b = {r.doc_id for r in plans.REGISTRY["corpus_build"].fn(spark, SF_DIR).collect()}
    clf = {
        r.doc_id
        for r in plans.REGISTRY["docs_quality_train_score"].fn(spark, SF_DIR).collect()
        if r.pred_keep
    }
    got = {r.doc_id for r in q}
    assert got == (b & clf) and got
    assert got <= b


def test_resume_is_suffix_of_full_plan(spark):
    """corpus_resume_cursor == the full plan's admitted stream minus
    the consumed prefix — the resumability claim as a set equality."""
    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans.round21_queries import RESUME_CURSOR, RESUME_EPOCH

    full = plans.REGISTRY["corpus_epoch_plan"].fn(spark, SF_DIR).collect()
    admitted = [
        r
        for r in full
        if r.take_tokens > 0
        and (
            r.epoch > RESUME_EPOCH
            or (r.epoch == RESUME_EPOCH and r.cursor_pos > RESUME_CURSOR)
        )
    ]
    want = {
        (r.epoch, r.source, r.chunk_no, r.shuffle_pos, r.take_tokens, r.cursor_pos)
        for r in admitted
    }
    got = {
        tuple(r)
        for r in plans.REGISTRY["corpus_resume_cursor"].fn(spark, SF_DIR).collect()
    }
    assert got == want and got


def test_crossdoc_rate_ignores_internal_repeats(spark, tmp_path_factory):
    """The lane's entire point vs docs_substring_dedup: a window
    repeated only WITHIN one doc is not a cross-doc dup; shared
    boilerplate across two docs is."""
    import os

    from pse_stocks_etl_spark import plans

    boiler = " ".join(f"b{i}" for i in range(12))  # exactly one L-window
    internal = " ".join(f"r{i}" for i in range(12))
    rows = [
        (1, f"{boiler} xxa xxb xxc", "en", "s", 10),      # shares boiler with 2
        (2, f"{boiler} yya yyb yyc", "en", "s", 10),      # shares boiler with 1
        (3, f"{internal} zza {internal}", "en", "s", 10), # internal repeat only
        (4, "short words only here", "en", "s", 10),      # < L tokens: 0 windows
    ]
    sf = str(tmp_path_factory.mktemp("cross_sf"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {r.doc_id: r for r in
           plans.REGISTRY["docs_crossdoc_dup_rate"].fn(spark, sf).collect()}
    assert out[1].n_cross_windows >= 1 and out[2].n_cross_windows >= 1
    assert out[3].n_cross_windows == 0, "internal repetition must not count"
    assert out[3].n_windows > 0
    assert out[4].n_windows == 0 and out[4].cross_ppm == 0
    assert out[1].flag_doc is not None


def test_dsir_increment_scores_under_frozen_standing_weights(spark, tmp_path_factory):
    """The increment's contract: batch docs score under weights fitted
    on STANDING docs only. An in-target-distribution batch doc scores
    far above ppm-neutral; a batch doc whose vocabulary the standing
    fit never saw falls to (near) the conservative 0 floor."""
    import os

    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans.round18_queries import PPM

    a = "alpha beta gamma delta epsilon zeta"
    b = "zork quux blorp fnord grue wumpus"
    c = "xylem phloem quasar nebula meson boson"  # unseen in standing
    rows = (
        [(i, a, "en", "src0", 10) for i in range(10)]        # standing target
        + [(10 + i, b, "en", "raw", 10) for i in range(10)]  # standing raw
        + [(95, a, "en", "raw", 10), (100, c, "en", "raw", 10)]  # batch
    )
    sf = str(tmp_path_factory.mktemp("dsir_inc_sf"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {r.doc_id: r for r in
           plans.REGISTRY["docs_dsir_increment"].fn(spark, sf).collect()}
    assert set(out) == {95, 100}, "batch = ids past 9/10 of the id range only"
    assert out[95].score_ppm > PPM, "in-target-distribution doc must uprank"
    assert out[100].score_ppm < PPM // 10, "unseen vocabulary ~ the 0 floor"
    assert out[95].score_ppm > out[100].score_ppm
    for r in out.values():
        assert r.keep == (r.hash_ppm < r.accept_ppm)


def test_ccnet_terciles_are_balanced_and_ordered(spark):
    """Within every source: tercile sizes differ by <= 1 (the ntile
    contract) and max(head) <= min(middle) <= ... up to tie values
    (scores are ordered across the cut points)."""
    from collections import defaultdict

    from pse_stocks_etl_spark import plans

    rows = plans.REGISTRY["docs_ccnet_buckets"].fn(spark, SF_DIR).collect()
    assert rows
    by_src = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_src[r.source][r.tercile].append(r.avg_ip_micro)
        assert r.bucket == {1: "head", 2: "middle", 3: "tail"}[r.tercile]
        assert r.train_keep == (r.tercile <= 2)
    for src, ts in by_src.items():
        sizes = [len(ts.get(t, [])) for t in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1, (src, sizes)
        if ts.get(1) and ts.get(2):
            assert max(ts[1]) <= min(ts[2]), src
        if ts.get(2) and ts.get(3):
            assert max(ts[2]) <= min(ts[3]), src


def test_pack_nosplit_invariants(spark):
    """Folded pairing: every doc lands in exactly one pack; a pack
    holds 1-2 docs of one (split, source); 2-doc packs fit the
    capacity and their pack_tokens is the member sum; overfull packs
    are single overlong docs."""
    from collections import defaultdict

    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans.corpus_queries import PACK_CAPACITY

    rows = plans.REGISTRY["corpus_pack_nosplit"].fn(spark, SF_DIR).collect()
    assert rows
    packs = defaultdict(list)
    for r in rows:
        packs[(r.split, r.source, r.pack_no)].append(r)
    for key, ms in packs.items():
        assert 1 <= len(ms) <= 2, key
        tot = sum(m.n_tokens for m in ms)
        for m in ms:
            assert m.pack_tokens == tot, key
        if len(ms) == 2:
            assert tot <= PACK_CAPACITY, key
        if tot > PACK_CAPACITY:
            assert len(ms) == 1, "overfull pack must be a single overlong doc"
    # every doc exactly once
    assert sum(len(v) for v in packs.values()) == len(rows)
    assert len({r.doc_id for r in rows}) == len(rows)


def test_pack_efficiency_bounds(spark):
    """The audit's own laws: n_packs >= lower_bound always (no packer
    can beat bin packing's volume bound), fill <= 1e6 unless the shard
    has an overlong doc, and totals reconcile with the per-doc
    packer."""
    from collections import defaultdict

    from pse_stocks_etl_spark import plans

    eff = plans.REGISTRY["corpus_pack_efficiency"].fn(spark, SF_DIR).collect()
    assert eff
    per = plans.REGISTRY["corpus_pack_nosplit"].fn(spark, SF_DIR).collect()
    tok = defaultdict(int)
    for r in per:
        tok[(r.split, r.source)] += r.n_tokens
    for e in eff:
        assert e.n_packs >= e.lower_bound, (e.split, e.source)
        assert e.packs_over_bound == e.n_packs - e.lower_bound
        if e.n_overlong == 0:
            assert e.mean_fill_ppm <= 1_000_000
        assert e.total_tokens == tok[(e.split, e.source)]
