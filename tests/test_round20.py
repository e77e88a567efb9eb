"""Round-20 lane tests: the IVF cell split acts on (not just measures)
the overload signal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _member_row(vec_id: int, cell: int, v: list[float]):
    return (vec_id, cell, [float(x) for x in v])


@pytest.fixture(scope="module")
def hot_cell_split(spark):
    """A synthetic hot cell with two clear lobes: 40 members around
    [1, ±0.6, 0, 0] plus the centroid itself, next to a small cold
    cell — the shape emb_ivf_cell_stats flags (one cell holds ~87% of
    the corpus, way past 4x the ideal share)."""
    from pse_stocks_etl_spark.plans.round20_queries import ivf_cell_split_frame

    rows = [_member_row(100, 100, [1.0, 0.0, 0.0, 0.0])]
    for i in range(20):
        # lobe A: tilted +y, tiny deterministic spread so vectors are
        # distinct (identical clones cannot be split by any method)
        rows.append(_member_row(200 + i, 100, [1.0, 0.6 + i * 0.001, 0.0, 0.0]))
        # lobe B: tilted -y
        rows.append(_member_row(300 + i, 100, [1.0, -0.6 - i * 0.001, 0.0, 0.0]))
    # cold cell: centroid + 5 members
    rows.append(_member_row(500, 500, [0.0, 0.0, 1.0, 0.0]))
    for i in range(5):
        rows.append(_member_row(600 + i, 500, [0.0, 0.0, 1.0, 0.1 * (i + 1)]))
    member = spark.createDataFrame(
        rows, "vec_id long, cell long, v array<double>"
    )
    out = ivf_cell_split_frame(member).collect()
    return {r.vec_id: r for r in out}


def test_split_halves_the_hot_cell(hot_cell_split):
    """The r10 VERDICT's done-bar: a hot-cell clone shows the split
    halves the max cell. 41 members → two sub-cells of 21/20 (the
    centroid rides with lobe A)."""
    hot = [r for r in hot_cell_split.values() if r.cell == 100]
    assert len(hot) == 41
    sizes = {r.n_sub for r in hot}
    max_sub = max(sizes)
    assert max_sub <= 21, f"split left a {max_sub}-member sub-cell of 41"
    # both sub-cells materialized and partition the cell exactly
    by_sub = {}
    for r in hot:
        by_sub.setdefault(r.sub_cell, 0)
        by_sub[r.sub_cell] += 1
    assert set(by_sub) == {0, 1}
    assert sum(by_sub.values()) == 41
    for r in hot:
        assert r.n_sub == by_sub[r.sub_cell]


def test_split_separates_the_lobes(hot_cell_split):
    """Lobe A (vec 200..219) and lobe B (vec 300..319) land in
    different sub-cells — the furthest-point seed + one Lloyd step
    actually learns the structure, it doesn't just halve arbitrarily."""
    lobe_a = {hot_cell_split[200 + i].sub_cell for i in range(20)}
    lobe_b = {hot_cell_split[300 + i].sub_cell for i in range(20)}
    assert len(lobe_a) == 1 and len(lobe_b) == 1
    assert lobe_a != lobe_b


def test_only_hot_cells_are_touched(hot_cell_split):
    """The cold cell's members never appear in the output: the split
    reads and rewrites ONLY the flagged cells (the partition-pruned /
    hardlink-carry contract at a real store)."""
    touched_cells = {r.cell for r in hot_cell_split.values()}
    assert touched_cells == {100}
    assert 500 not in touched_cells
    for vid in [500, 600, 601, 602, 603, 604]:
        assert vid not in hot_cell_split


def test_widest_cell_splits_even_without_overload(spark):
    """Two near-equal cells, neither past 4x ideal: the widest still
    splits (a production rebalancer always works the widest first),
    and exactly one cell is in the output."""
    from pse_stocks_etl_spark.plans.round20_queries import ivf_cell_split_frame

    rows = [
        _member_row(1, 1, [1.0, 0.0]),
        _member_row(2, 2, [0.0, 1.0]),
    ]
    for i in range(6):
        rows.append(_member_row(10 + i, 1, [1.0, 0.1 * (i - 3)]))
    for i in range(5):
        rows.append(_member_row(30 + i, 2, [0.1 * (i - 2), 1.0]))
    member = spark.createDataFrame(rows, "vec_id long, cell long, v array<double>")
    out = ivf_cell_split_frame(member).collect()
    assert {r.cell for r in out} == {1}  # widest (7 members incl. centroid)
    assert len(out) == 7


@pytest.fixture(scope="module")
def flip_corpus(spark, tmp_path_factory):
    """A synthetic corpus engineered so LSH bucket widths CROSS the
    cap exactly when the batch lands (40 near-identical docs + 2
    unrelated ones; with cap=33 the clone buckets are under-cap for
    the standing 90% and over-cap for the union) — the flipped-bucket
    revision path corpus_build_increment carries is dead at the
    natural test SFs (widths never approach 1000), so this is the only
    place it executes."""
    import os

    CORE = " ".join(f"w{i}" for i in range(20))
    rows = [
        (i, f"{CORE} uniq{i}", "en", "srcA", 100) for i in range(40)
    ] + [
        (40, "totally different text about other things entirely", "en", "srcB", 50),
        (41, "another unrelated document body with its own words", "en", "srcB", 50),
    ]
    sf = str(tmp_path_factory.mktemp("flip_sf"))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    return sf


def test_increment_equals_rebuild_under_bucket_flips(spark, flip_corpus, monkeypatch):
    """corpus_build_increment == corpus_build even when buckets flip
    over the cap as the batch lands: standing near-dup flags must be
    REVOKED exactly where the rebuild's union-width cap kills their
    witness buckets. (At natural SFs the two agree trivially because
    no bucket flips; this pins the revision algebra itself.)"""
    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans import llm_queries
    from pse_stocks_etl_spark.plans.llm_queries import (
        _band_buckets,
        _minhash_sig,
        _shingles_cached,
        clear_working_set_caches,
    )

    monkeypatch.setattr(llm_queries, "LSH_BUCKET_CAP", 33)
    clear_working_set_caches()
    try:
        # precondition: at least one bucket is under-cap for standing
        # (standing <= 36, batch >= 37: doc_id*10 > 41*9 first holds at 37)
        # but over-cap for the union — otherwise this test regressed
        # into the trivial no-flip case.
        sh = _shingles_cached(spark, flip_corpus)
        b = _band_buckets(_minhash_sig(sh))
        is_b = F.col("doc_id") * 10 > 41 * 9
        docs = spark.read.parquet(flip_corpus + "/documents.parquet")
        w = (
            b.join(docs.select("doc_id", is_b.alias("ib")), "doc_id")
            .groupBy("bk")
            .agg(
                F.count("*").alias("w_all"),
                F.sum(F.col("ib").cast("int")).alias("w_b"),
            )
        )
        flips = w.filter(
            (F.col("w_all") - F.col("w_b") <= 33) & (F.col("w_all") > 33)
        ).count()
        assert flips > 0, "synthetic corpus no longer flips any bucket"

        rebuild = sorted(
            map(tuple, plans.REGISTRY["corpus_build"].fn(spark, flip_corpus).collect())
        )
        incr = sorted(
            map(
                tuple,
                plans.REGISTRY["corpus_build_increment"].fn(spark, flip_corpus).collect(),
            )
        )
        assert incr == rebuild and len(rebuild) > 0
    finally:
        clear_working_set_caches()


def test_increment_equals_rebuild_on_natural_data(spark):
    """Spark-vs-Spark equality at the natural test SF (the driver's
    oracle check proves Spark-vs-DuckDB; this pins the two REGISTRY
    entries against each other directly)."""
    from pse_stocks_etl_spark import plans

    a = sorted(
        map(tuple, plans.REGISTRY["corpus_build"].fn(spark, SF_DIR).collect())
    )
    b = sorted(
        map(
            tuple,
            plans.REGISTRY["corpus_build_increment"].fn(spark, SF_DIR).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_cell_split_store_merge_is_surgical(spark, tmp_path):
    """The r10 VERDICT's phrasing made literal: applying the cell
    split to a cell-partitioned assignment index rewrites ONLY the
    split cells' partitions — every untouched cell directory is
    carried into the new version as hardlinks (same inodes, zero data
    movement), exactly the emb_ann_ivfpq_increment contract."""
    import os

    from pse_stocks_etl_spark.plans.round18_queries import _semdedup_members
    from pse_stocks_etl_spark.plans.round20_queries import ivf_cell_split_frame
    from pse_stocks_etl_spark.store.parquet_table import ParquetTable

    member = _semdedup_members(spark, SF_DIR).select("vec_id", "cell", "v")
    base_idx = member.select(
        F.col("cell").cast("long").alias("cell"),
        "vec_id",
        F.lit(0).cast("long").alias("sub_cell"),
    )
    root = str(tmp_path / "ivf_index")
    table = ParquetTable(spark, root, base_idx.schema, partition_by=("cell",))
    table.overwrite(base_idx)  # v1: the standing assignment index

    split = ivf_cell_split_frame(member).select("cell", "vec_id", "sub_cell")
    split_cells = {r.cell for r in split.select("cell").distinct().collect()}
    assert split_cells, "fixture degenerate: nothing split"
    table.merge(split, keys=["cell", "vec_id"])  # v2: the rebalance

    def inodes(vdir):
        out = {}
        for entry in os.listdir(vdir):
            if entry.startswith("cell="):
                d = os.path.join(vdir, entry)
                out[entry] = {
                    os.stat(os.path.join(d, f)).st_ino
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                }
        return out

    v1 = inodes(os.path.join(root, "_versions", "v00001"))
    v2 = inodes(os.path.join(root, "_versions", "v00002"))
    touched = {f"cell={int(c)}" for c in split_cells}
    untouched = set(v1) - touched
    assert untouched, "fixture degenerate: every cell was split"
    for cell in untouched:
        assert v2[cell] == v1[cell], f"{cell} rewritten but not split"
    for cell in touched & set(v1):
        assert v2[cell].isdisjoint(v1[cell]), f"{cell} not re-merged"
    # and the rebalanced index actually carries the sub-cell labels
    got = {
        (r.cell, r.vec_id): r.sub_cell
        for r in table.read().filter(F.col("cell").isin(*split_cells)).collect()
    }
    want = {(r.cell, r.vec_id): r.sub_cell for r in split.collect()}
    assert got == want


def test_quality_train_learns_separable_signal(spark):
    """On a corpus with genuine vocabulary signal the trained
    classifier beats the majority baseline (the natural fixture is
    token-homogeneous, so there it can only match base rate — see
    docs_quality_train's docstring). 60 docs: 20 positives over
    buckets {1,2,3}, 40 negatives over {10,11,12}, shared noise bucket
    {30}; the 2-step integer GD must classify all 60 correctly while
    always-predict-majority scores 2/3."""
    from pse_stocks_etl_spark.plans.round20_queries import (
        QTRAIN_BIAS,
        _qtrain_weights,
    )

    feat_rows, label_rows = [], []
    for i in range(60):
        pos = i < 20
        bks = ([1, 2, 3] if pos else [10, 11, 12]) + [30, QTRAIN_BIAS]
        feat_rows += [(i, b) for b in bks]
        label_rows.append((i, 1 if pos else -1))
    feat = spark.createDataFrame(feat_rows, "doc_id long, bucket long")
    labels = spark.createDataFrame(label_rows, "doc_id long, y long")
    w = {r.bucket: r.w_scaled for r in _qtrain_weights(feat, labels).collect()}
    correct = 0
    for i in range(60):
        pos = i < 20
        bks = ([1, 2, 3] if pos else [10, 11, 12]) + [30, QTRAIN_BIAS]
        margin = sum(w[b] for b in bks)
        correct += (margin > 0) == pos
    assert correct == 60, f"separable corpus only {correct}/60 correct"
    # positive-vocabulary buckets learned positive weights, negative
    # ones negative — the weights are interpretable, not just lucky
    assert all(w[b] > 0 for b in (1, 2, 3))
    assert all(w[b] < 0 for b in (10, 11, 12))


def test_quality_train_beats_majority_on_fixture(spark):
    """The r12 feature swap (Gopher-statistic grid cells instead of
    unigram hashes over a homogeneous vocabulary) must deliver GENUINE
    lift on the registry fixture — the r11 pin asserted equality with
    the majority baseline and its own docstring said to flip it the
    moment the features could separate anything. Measured: 0.930 vs
    0.884 at sf0.01; assert a conservative margin."""
    from pse_stocks_etl_spark import plans

    rows = plans.REGISTRY["docs_quality_train_score"].fn(spark, SF_DIR).collect()
    n = len(rows)
    acc = sum(r.agree for r in rows) / n
    keep_rate = sum(r.label_keep for r in rows) / n
    base = max(keep_rate, 1 - keep_rate)
    assert acc >= base + 0.02, (
        f"fixture agreement {acc} no longer beats majority baseline {base} "
        "by the asserted margin — the feature grid lost its signal"
    )


def test_registry_query_runs_and_is_deterministic(spark):
    """The registered query returns stable results across invocations
    (cache-cleared) at the test SF."""
    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans.llm_queries import clear_working_set_caches

    q = plans.REGISTRY["emb_ivf_cell_split"]
    a = sorted(map(tuple, q.fn(spark, SF_DIR).collect()))
    clear_working_set_caches()
    b = sorted(map(tuple, q.fn(spark, SF_DIR).collect()))
    assert a == b and len(a) > 0


def test_split_recall_is_measured_and_sane(spark):
    """The split-index recall audit emits one row per probe query with
    recall in [0, 1]; brute-force always contains the query's true
    neighbors, so n_overlap ≤ k and the mean recall is meaningfully
    positive on the fixture (the probed sub-cells cover the nearest
    region)."""
    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans.llm_queries import ANN_QUERY_IDS, TOPK

    rows = plans.REGISTRY["emb_ivf_split_recall"].fn(spark, SF_DIR).collect()
    assert {r.query_id for r in rows} == set(ANN_QUERY_IDS)
    for r in rows:
        assert 0 <= r.n_overlap <= TOPK
        assert abs(r[f"recall_at_{TOPK}"] - r.n_overlap / TOPK) < 1e-12
    assert sum(r.n_overlap for r in rows) > 0, "split index found nothing"


def test_epoch_shuffle_orders_differ_and_are_deterministic(spark):
    """Different epochs produce genuinely different shard orders (the
    point of reshuffling), each a permutation of the same chunk set,
    and a re-run reproduces positions exactly (resumability without
    RNG state)."""
    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans.round20_queries import SHUFFLE_EPOCHS

    fn = plans.REGISTRY["corpus_epoch_shuffle"].fn
    rows = fn(spark, SF_DIR).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, {})[(r.split, r.source, r.chunk_no)] = (
            r.shuffle_pos
        )
    assert set(by_epoch) == set(range(1, SHUFFLE_EPOCHS + 1))
    e1, e2 = by_epoch[1], by_epoch[2]
    assert set(e1) == set(e2)  # same chunk universe each epoch
    assert any(e1[k] != e2[k] for k in e1), "epochs produced identical order"
    # positions within (epoch, split) are a 1..n permutation
    per_split = {}
    for (split, src, chunk), pos in e1.items():
        per_split.setdefault(split, []).append(pos)
    for split, poss in per_split.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    again = {
        (r.epoch, r.split, r.source, r.chunk_no): r.shuffle_pos
        for r in fn(spark, SF_DIR).collect()
    }
    first = {
        (r.epoch, r.split, r.source, r.chunk_no): r.shuffle_pos for r in rows
    }
    assert again == first


def test_epoch_cap_redistribute_conserves_budget(spark):
    """Water-fill invariants: allocation never exceeds the repeat cap,
    total allocated + unallocated == total targeted (token conservation
    across the redistribution), and the fixture genuinely engages the
    cap (some sources capped, some receiving redistributed surplus)."""
    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans.round20_queries import EPOCH_CAP_MILLI

    rows = plans.REGISTRY["docs_epoch_cap_redistribute"].fn(spark, SF_DIR).collect()
    assert rows
    total_target = sum(r.target_tokens for r in rows)
    total_alloc = sum(r.alloc_tokens for r in rows)
    unalloc = {r.unalloc_tokens for r in rows}
    assert len(unalloc) == 1  # global value, same on every row
    assert total_alloc + unalloc.pop() == total_target
    for r in rows:
        assert r.alloc_tokens <= r.cap_tokens
        assert r.epochs_milli <= EPOCH_CAP_MILLI
        assert r.capped == (r.alloc_tokens == r.cap_tokens)
    assert any(r.capped for r in rows), "cap never engaged on the fixture"
    # redistribution actually moved surplus onto at least one source
    assert any(
        r.alloc_tokens > r.target_tokens for r in rows
    ), "no source received redistributed budget"


def test_overlap_runs_thunks_propagates_labels_and_errors(spark):
    """r13 (guide §2.6): the overlap helper must (a) return results in
    argument order, (b) propagate the caller's thread-local job
    description into worker threads — bench.py and the profilers
    attribute jobs by it — and (c) re-raise a thunk's exception."""
    import pytest

    from pse_stocks_etl_spark.plans.concurrency import overlap

    sc = spark.sparkContext
    sc.setJobDescription("overlap-test")
    try:
        seen: dict[str, str | None] = {}

        def a():
            seen["a"] = sc.getLocalProperty("spark.job.description")
            return "ra"

        def b():
            seen["b"] = sc.getLocalProperty("spark.job.description")
            return "rb"

        assert overlap(spark, a, b) == ["ra", "rb"]
        assert seen == {"a": "overlap-test", "b": "overlap-test"}

        def boom():
            raise RuntimeError("thunk failed")

        with pytest.raises(RuntimeError, match="thunk failed"):
            overlap(spark, a, boom)

        # single-thunk fast path runs inline (same thread, no pool)
        assert overlap(spark, lambda: 42) == [42]
    finally:
        sc.setJobDescription(None)
