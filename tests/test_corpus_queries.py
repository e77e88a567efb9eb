"""Corpus-prep operator tests (plans/corpus_queries.py): semantics on
crafted documents plus the physical-plan posture each docstring
promises (broadcasts, partitioned windows, no global single-partition
sort on the big side)."""

from __future__ import annotations

import re

from pyspark.sql import Row

from pse_stocks_etl_spark import plans


def _plan(spark, sf_dir, name: str) -> str:
    df = plans.REGISTRY[name].fn(spark, sf_dir)
    jvm = spark.sparkContext._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lang, source=src, n_chars=len(t))
         for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


# ---- repetition ----------------------------------------------------------

def test_repetition_flags_bigram_loop(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "spam ham " * 20, "en", "s0"),          # one bigram dominates
            (2, " ".join(f"w{i}" for i in range(40)), "en", "s0"),  # all unique
        ],
    )
    out = {
        r["doc_id"]: r
        for r in plans.REGISTRY["docs_repetition_stats"].fn(spark, sf).collect()
    }
    assert out[1]["repetitive"] and out[1]["dup_word_frac"] > 0.9
    # "spam ham" appears 20× in 40 tokens → covers every token.
    assert out[1]["top_bigram_frac"] > 0.9
    assert not out[2]["repetitive"] and out[2]["dup_word_frac"] == 0.0


# ---- contamination -------------------------------------------------------

def test_contamination_catches_copied_benchmark_doc(spark, tmp_path):
    leaked = "alpha beta gamma delta epsilon zeta eta theta"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (7, leaked, "en", "bench"),                 # 7 % 10 == 7 → benchmark
            (1, leaked, "en", "train"),                 # verbatim leak
            (2, "totally different words entirely here now", "en", "train"),
        ],
    )
    rows = plans.REGISTRY["docs_contamination"].fn(spark, sf).collect()
    assert [(r["doc_id"], r["bench_doc_id"]) for r in rows] == [(1, 7)]
    assert rows[0]["n_shared"] == 6  # 8 tokens → 6 distinct 3-gram shingles


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "docs_contamination")
    assert "BroadcastHashJoin" in plan, plan[:2000]


# ---- sequence packing ----------------------------------------------------

def test_pack_chunks_offsets_and_spans(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "w " * 300, "a", "a"),   # 300 tokens → chunk 0
            (2, "w " * 300, "a", "a"),   # offsets 300..599 → chunks 0-1
            (3, "w " * 100, "a", "a"),   # offsets 600..699 → chunk 1
            (4, "w " * 50, "b", "b"),    # separate source packs from 0
        ],
    )
    out = {
        r["doc_id"]: r
        for r in plans.REGISTRY["docs_pack_chunks"].fn(spark, sf).collect()
    }
    assert (out[1]["start_off"], out[1]["first_chunk"], out[1]["last_chunk"]) == (0, 0, 0)
    assert (out[2]["start_off"], out[2]["first_chunk"], out[2]["last_chunk"]) == (300, 0, 1)
    assert out[2]["n_chunks"] == 2
    assert (out[3]["start_off"], out[3]["first_chunk"], out[3]["last_chunk"]) == (600, 1, 1)
    assert out[4]["start_off"] == 0  # source b packs independently


def test_pack_chunks_window_is_source_partitioned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "docs_pack_chunks")
    # The running sum must hash-partition on source — never a global
    # single-partition sort of the corpus.
    assert re.search(r"hashpartitioning\(source", plan), plan[:2000]
    assert "SinglePartition" not in plan


# ---- stratified sampling -------------------------------------------------

def test_stratified_sample_rates_and_weights(spark, sf_dir):
    q = plans.REGISTRY["docs_stratified_sample"]
    docs = plans.corpus_queries._docs(spark, sf_dir)
    n_en = docs.filter("lang = 'en'").count()
    rows = q.fn(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
        bp = plans.corpus_queries.SAMPLE_RATES_BP[r["lang"]]
        assert r["sample_key"] < bp
        assert r["weight"] == 10000.0 / bp
    assert len(by_lang["en"]) == n_en  # rate 1.0 keeps everything
    # Deterministic: a second run returns the identical sample.
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in q.fn(spark, sf_dir).collect()
    )


# ---- TF-IDF --------------------------------------------------------------

def test_tfidf_ranks_distinctive_term_first(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "common common xylophone", "en", "s"),
            (2, "common trumpet trumpet", "en", "s"),
            (3, "common words only", "en", "s"),
        ],
    )
    rows = plans.REGISTRY["docs_tfidf_top_terms"].fn(spark, sf).collect()
    top = {r["doc_id"]: r["term"] for r in rows if r["rk"] == 1}
    assert top[1] == "xylophone" and top[2] == "trumpet"
    assert all(r["rk"] <= 3 for r in rows)
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    assert all(v <= 3 for v in per_doc.values())


# ---- global index --------------------------------------------------------

def test_global_index_matches_sorted_enumeration(spark, tmp_path):
    # Non-contiguous ids straddling bucket boundaries (bucket = id DIV 100).
    ids = [5, 99, 100, 250, 999, 1000, 1001]
    sf = _write_docs(spark, tmp_path, [(i, f"doc {i}", "en", "s") for i in ids])
    rows = plans.REGISTRY["docs_global_index"].fn(spark, sf).collect()
    got = {r["doc_id"]: r["idx"] for r in rows}
    assert got == {doc_id: i for i, doc_id in enumerate(sorted(ids))}


def test_global_index_avoids_global_sort_on_rows(spark, sf_dir):
    plan = _plan(spark, sf_dir, "docs_global_index")
    # The per-row window partitions by bucket; the only rangepartitioning
    # (global sort) allowed is over the tiny bucket-counts table.
    assert re.search(r"hashpartitioning\(bucket", plan), plan[:2000]
    assert "BroadcastHashJoin" in plan


# ---- OLAP gap queries ----------------------------------------------------

def test_intersect_plans_as_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "intersect_trading_nations")
    assert "LeftSemi" in plan


def test_above_avg_orders_decorrelates_to_single_agg_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "above_avg_orders")
    # Catalyst must rewrite both correlated scalar subqueries into
    # (at most two) grouped aggregates joined back — never a per-row
    # re-scan of orders.
    assert "Subquery" not in plan, plan[:2000]
    # Formatted explain lists each scan twice (tree + detail section):
    # 3 scan nodes = orders itself + one grouped agg per subquery.
    assert plan.count("Scan parquet") <= 6


def test_lateral_top_orders_is_per_customer_topk(spark, sf_dir):
    rows = plans.REGISTRY["lateral_top_orders"].fn(spark, sf_dir).collect()
    per_cust = {}
    for r in rows:
        per_cust.setdefault(r["c_custkey"], []).append(r["price_cents"])
    assert all(len(v) <= 2 for v in per_cust.values())
    # Each customer's rows are its two largest orders.
    orders = plans.corpus_queries.load_table(spark, sf_dir, "orders")
    import pyspark.sql.functions as F

    best = {
        r["o_custkey"]: r["mx"]
        for r in orders.groupBy("o_custkey")
        .agg(F.max(F.round(F.col("o_totalprice") * 100).cast("long")).alias("mx"))
        .collect()
    }
    for cust, cents in per_cust.items():
        assert max(cents) == best[cust]


def test_range_join_binned_is_hash_join_not_nested_loop(spark, sf_dir):
    plan = _plan(spark, sf_dir, "range_join_binned")
    # The binning rewrite must give the range join an equality key:
    # a pure range predicate would plan as BroadcastNestedLoopJoin /
    # CartesianProduct — the quadratic plan binning exists to avoid.
    assert "NestedLoop" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert re.search(r"hashpartitioning\(bucket|BroadcastHashJoin", plan)


def test_q7_and_q10_broadcast_all_dimensions(spark, sf_dir):
    for q in ("returned_items_topn", "nation_trade_volume"):
        plan = _plan(spark, sf_dir, q)
        assert "BroadcastHashJoin" in plan, q
        # the only sort-merge allowed is the fact-to-orders join
        assert plan.count("SortMergeJoin") <= 1, q


def test_pipeline_keep_invariants(spark, sf_dir):
    """Composition invariants: kept docs are unique by content hash and
    never the dropped side of a verified near-dup pair; every doc gets
    exactly one verdict (reason XOR keep)."""
    import pyspark.sql.functions as F

    out = plans.REGISTRY["docs_pipeline_keep"].fn(spark, sf_dir)
    rows = out.collect()
    assert all((r.drop_reason is None) == r.keep for r in rows)
    kept_ids = {r.doc_id for r in rows if r.keep}
    docs = plans.corpus_queries._docs(spark, sf_dir)
    hashes = [
        r.h for r in docs.filter(F.col("doc_id").isin(kept_ids))
        .select(F.md5("text").alias("h")).collect()
    ]
    assert len(hashes) == len(set(hashes))  # exact-dup free
    dropped_b = {
        r.doc_b
        for r in plans.REGISTRY["docs_minhash_lsh_pairs"].fn(spark, sf_dir).collect()
    }
    assert not (kept_ids & dropped_b)  # near-dup free (pairwise rule)


def test_mixture_weights_shares_normalize_and_damp(spark, sf_dir):
    from pse_stocks_etl_spark import plans

    rows = plans.REGISTRY["docs_mixture_weights"].fn(spark, sf_dir).collect()
    assert rows
    total_share = sum(r.sample_share for r in rows)
    assert abs(total_share - 1.0) < 1e-9
    assert sum(r.weight_units for r in rows) > 0
    # temperature damping: the biggest stratum's share of the sample is
    # strictly below its share of the raw corpus; the smallest is above
    n_total = sum(r.n_docs for r in rows)
    big = max(rows, key=lambda r: r.n_docs)
    small = min(rows, key=lambda r: r.n_docs)
    if big.n_docs != small.n_docs:
        assert big.sample_share < big.n_docs / n_total
        assert small.sample_share > small.n_docs / n_total


def test_pipeline_keep_twin_dense_fixture_r10(spark, tmp_path):
    """The r10 composition fix (near-dup on exact-dedup survivors,
    contamination on survivors x bench representatives) must preserve
    the composed semantics on a corpus that actually HAS exact twins —
    the sf corpora carry zero exact-text dups, so the survivor routing
    is otherwise only exercised by its equivalence proof, never by the
    matrices. Fixture: an exact triple, a near-dup of it, a
    contaminated doc, a bench doc, and a clean doc."""
    t1 = " ".join(f"a{i}" for i in range(20))
    near = t1 + " extra"  # one appended word: Jaccard 18/19 ≈ 0.947
    phrase = " ".join(f"c{i}" for i in range(6))  # >= 4 shared shingles
    rows = [
        (1, t1, "en", "s"),
        (2, t1, "en", "s"),              # exact twin of 1
        (3, t1, "en", "s"),              # exact twin of 1
        (4, near, "en", "s"),            # near-dup of the group
        (5, "intro words then " + phrase + " tail words here", "en", "s"),
        (6, " ".join(f"z{i}" for i in range(25)), "en", "s"),
        (7, phrase + " " + " ".join(f"b{i}" for i in range(15)), "en", "s"),  # bench (7 % 10 == 7)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in plans.REGISTRY["docs_pipeline_keep"].fn(spark, sf).collect()}
    assert len(out) == 7
    assert out[1].keep and out[1].drop_reason is None
    for d in (2, 3):
        assert out[d].drop_reason == "exact_dup" and not out[d].keep
    assert out[4].drop_reason == "near_dup" and not out[4].keep
    assert out[5].drop_reason == "contaminated" and not out[5].keep
    assert out[6].keep
    # the DuckDB composed oracle (full-corpus formulation) agrees
    import duckdb

    con = duckdb.connect()
    con.execute(
        # Spark wrote a parquet DIRECTORY; DuckDB needs the part glob
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            plans.REGISTRY["docs_pipeline_keep"].oracle
        ).fetchall()
    }
    assert {d: (r.drop_reason, r.keep) for d, r in out.items()} == oracle


# ---- r12: the featurized-corpus working set -------------------------------

def test_featurized_corpus_matches_legacy_derivations(spark, sf_dir):
    """featurize_docs over the corpus must reproduce, column for
    column, the legacy per-pass derivations the r12 optimization
    replaced: exploded shingle working set (_shingle_explode), LSH band
    membership (_band_buckets over _minhash_sig), the Gopher verdict
    (repetition_frame), and the md5/token-count metadata — the
    equalities corpus_build / docs_pipeline_keep /
    corpus_build_increment now rest on."""
    import pyspark.sql.functions as F

    from pse_stocks_etl_spark.functions.text import token_count
    from pse_stocks_etl_spark.plans.corpus_queries import (
        featurize_docs,
        repetition_frame,
    )
    from pse_stocks_etl_spark.plans.llm_queries import (
        _band_buckets,
        _docs,
        _minhash_sig,
        _shingle_explode,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    feat = featurize_docs(docs)

    # exploded shingles: identical row multiset
    legacy_sh = sorted(
        map(tuple, _shingle_explode(spark, sf_dir).collect())
    )
    feat_sh = sorted(
        map(
            tuple,
            feat.select("doc_id", F.explode("sh_arr").alias("sh")).collect(),
        )
    )
    assert feat_sh == legacy_sh and len(feat_sh) > 0

    # band membership: identical (doc_id, bk) set, empty-shingle docs
    # excluded exactly as the groupBy form excludes them
    legacy_bk = {
        (r.doc_id, r.bk)
        for r in _band_buckets(
            _minhash_sig(_shingle_explode(spark, sf_dir))
        ).collect()
    }
    feat_bk = {
        (r.doc_id, r.bk)
        for r in feat.filter(F.size("sh_arr") > 0)
        .select("doc_id", F.explode("bk_arr").alias("bk"))
        .collect()
    }
    assert feat_bk == legacy_bk and len(feat_bk) > 0

    # repetition verdict + metadata: equal per doc (null-text docs are
    # absent from feat and carry NULL verdicts in the legacy frame)
    legacy_rep = {
        r.doc_id: r.repetitive
        for r in repetition_frame(docs).collect()
        if r.repetitive is not None
    }
    feat_rep = {r.doc_id: r.repetitive for r in feat.collect()}
    assert feat_rep == legacy_rep

    legacy_meta = {
        r.doc_id: (r.h, r.n)
        for r in docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.md5("text").alias("h"),
            token_count(F.col("text")).cast("long").alias("n"),
        )
        .collect()
    }
    feat_meta = {r.doc_id: (r.h, r.n) for r in feat.select("doc_id", "h", "n").collect()}
    assert feat_meta == legacy_meta
