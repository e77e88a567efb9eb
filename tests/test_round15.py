"""Round-15 queries: BM25 retrieval + RRF hybrid fusion.

The GIF codec's tests live in tests/test_multimodal.py next to the
other codecs; this module pins the retrieval lane against an
INDEPENDENT pure-Python BM25 implementation (not the DuckDB oracle —
that cross-check runs in the parity suite) and the RRF algebra.
"""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest

from pse_stocks_etl_spark.plans.round15_queries import (
    BM25_TERMS,
    BM25_TOPK,
    RRF_K,
    RRF_POOL,
    _BM25_SCALE,
    _bm25_docs,
    docs_bm25_topk,
    emb_hybrid_rrf,
)


def _py_bm25(sf_dir: str) -> dict[int, tuple[int, float]]:
    """Plain-Python BM25 over the parquet corpus: the same tokenizer
    contract (trim/lower/whitespace), rational idf, and dyadic
    floor-quantized sum — written independently of both the Spark plan
    and the SQL oracle."""
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = {
        int(i): (t or "").strip().lower().split()
        for i, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }
    n_docs = len(docs)
    avgdl = sum(len(tk) for tk in docs.values()) / n_docs
    df = {
        term: sum(1 for tk in docs.values() if term in tk) for term in BM25_TERMS
    }
    out: dict[int, tuple[int, float]] = {}
    for doc_id, tk in docs.items():
        dl = len(tk)
        total, n_terms = 0, 0
        for term in BM25_TERMS:
            tf = tk.count(term)
            if not tf:
                continue
            n_terms += 1
            idf = (n_docs - df[term] + 0.5) / (df[term] + 0.5)
            s = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
            total += math.floor(s * float(_BM25_SCALE))
        if n_terms:
            out[doc_id] = (n_terms, total / float(_BM25_SCALE))
    return out


def test_bm25_docs_match_pure_python_reference(spark, sf_dir):
    expected = _py_bm25(sf_dir)
    got = {
        r["doc_id"]: (r["n_terms"], r["score"])
        for r in _bm25_docs(spark, sf_dir).collect()
    }
    assert got == expected  # exact: dyadic quantization makes sums exact


def test_bm25_topk_ranks_against_reference(spark, sf_dir):
    expected = sorted(
        _py_bm25(sf_dir).items(), key=lambda kv: (-kv[1][1], kv[0])
    )[:BM25_TOPK]
    rows = docs_bm25_topk(spark, sf_dir).collect()
    assert [r["doc_id"] for r in rows] == [d for d, _ in expected]
    assert [r["rk"] for r in rows] == list(range(1, len(expected) + 1))


def test_bm25_plan_is_take_ordered_not_global_sort(spark, sf_dir):
    """The top-k must compile to TakeOrderedAndProject (per-partition
    heap + driver merge), not a global Sort — the difference between a
    constant-size driver merge and a single-reducer sort at 100 TB."""
    plan = docs_bm25_topk(spark, sf_dir)._jdf.queryExecution().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_postings_filter_lands_before_the_aggregate(spark, sf_dir):
    """The query-term filter must prune the exploded postings BEFORE
    the (doc,term) shuffle — at 100 TB the shuffle carries only
    matching postings, not the whole corpus."""
    plan = docs_bm25_topk(spark, sf_dir)._jdf.queryExecution().toString()
    opt = plan.split("== Optimized Logical Plan ==")[1]
    first_agg = opt.index("Aggregate")
    assert "Filter" in opt[first_agg:], "term filter missing below the aggregate"


def test_rrf_algebra_and_pool_bounds(spark, sf_dir):
    rows = emb_hybrid_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= 2 * RRF_POOL
    lex_ranks = [r["lex_rank"] for r in rows if r["lex_rank"] is not None]
    sem_ranks = [r["sem_rank"] for r in rows if r["sem_rank"] is not None]
    # both rankers contribute their full pool exactly once
    assert sorted(lex_ranks) == list(range(1, RRF_POOL + 1))
    assert sorted(sem_ranks) == list(range(1, RRF_POOL + 1))
    for r in rows:
        expect = (
            (1.0 / (RRF_K + r["lex_rank"]) if r["lex_rank"] is not None else 0.0)
            + (1.0 / (RRF_K + r["sem_rank"]) if r["sem_rank"] is not None else 0.0)
        )
        assert r["rrf_score"] == pytest.approx(expect, abs=0.0)
    # fused order: rrf desc, item_id asc, ranks contiguous from 1
    ordered = sorted(rows, key=lambda r: (-r["rrf_score"], r["item_id"]))
    assert [r["rk"] for r in ordered] == list(range(1, len(rows) + 1))


def test_rrf_rewards_items_surfaced_by_both_rankers(spark, sf_dir):
    rows = emb_hybrid_rrf(spark, sf_dir).collect()
    both = [r for r in rows if r["lex_rank"] is not None and r["sem_rank"] is not None]
    single = [r for r in rows if (r["lex_rank"] is None) != (r["sem_rank"] is None)]
    if both and single:  # data-dependent, but holds on the testdata
        assert max(r["rrf_score"] for r in both) > min(
            r["rrf_score"] for r in single
        )


# ---------------------------------------------------------------------------
# BPE encode (the apply half) + GIF resize round-trip
# ---------------------------------------------------------------------------


def _py_bpe_encode(word: str) -> list[str]:
    """Independent greedy BPE apply — symbol lists and explicit
    leftmost merging, no string replacement tricks."""
    from pse_stocks_etl_spark.plans.round15_queries import BPE_MERGES

    sym = list(word)
    for a, b in BPE_MERGES:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_encode_matches_pure_python_tokenizer(spark, sf_dir):
    from pse_stocks_etl_spark.plans.round15_queries import docs_bpe_encode

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    expected = {}
    for doc_id, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        if text is None:
            continue
        words = [w for w in text.strip().lower().split() if w]
        if not words:
            continue
        n_chars = sum(len(w) for w in words)
        n_tok = sum(len(_py_bpe_encode(w)) for w in words)
        expected[int(doc_id)] = (len(words), n_chars, n_tok, n_tok / n_chars)
    got = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_bpe_tokens"], r["bpe_ratio"])
        for r in docs_bpe_encode(spark, sf_dir).collect()
    }
    assert got == expected


def test_bpe_sentinel_wrapping_blocks_cross_symbol_merges(spark):
    """The known failure mode of replace()-based BPE: a bare
    'a<sep>r' pattern would merge the boundary of ('ba','r') under the
    ('a','r') rule. 'bar' tokenizes as b + ar under BPE_MERGES (rule 9
    fires on the ORIGINAL a,r adjacency) while 'star' must come out as
    st + ar (rule 5 consumed the s,t pair first) — and a word ending
    in 'a' followed by one starting with 'r' stays un-merged across
    the word boundary by construction (words explode to separate
    rows)."""
    from pse_stocks_etl_spark.plans.round15_queries import _bpe_encoded, _BPE_SEP
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("bar",), ("star",), ("merger",), ("aaa",)], ["w"]
    ).select("w", _bpe_encoded(F.col("w")).alias("enc"))
    got = {r["w"]: r["enc"].strip(_BPE_SEP).split(_BPE_SEP * 2) for r in df.collect()}
    assert got["bar"] == ["b", "ar"]
    assert got["star"] == ["st", "ar"]
    # m+er then mer... no 'mer' merge rule beyond ('m','er'): merger ->
    # m er g er -> (m er) g (er) -> mer g er
    assert got["merger"] == ["mer", "g", "er"]
    assert got["aaa"] == ["a", "a", "a"]  # no ('a','a') rule: untouched
    for w, sym in got.items():
        assert sym == _py_bpe_encode(w), w


def test_gif_resize_roundtrip_matches_floor_lattice():
    import numpy as np

    from pse_stocks_etl_spark.operators.multimodal import (
        parse_gif,
        resize_gif_nearest,
        synth_gif,
    )

    OW, OH = 4, 3
    for d in list(range(12)) + [333, 499]:
        got = parse_gif(resize_gif_nearest(synth_gif(d), OW, OH))
        w, h = 5 + d % 6, 4 + d % 5
        y, x = np.mgrid[0:OH, 0:OW]
        sx, sy = (x * w) // OW, (y * h) // OH
        i = (11 * d + 37 * sx + 59 * sy) % 256
        r, g, b = (7 * i + 13) % 256, (11 * i + 5) % 256, (13 * i + 3) % 256
        wgt = 1 + x + 7 * y
        assert got == {
            "width": OW,
            "height": OH,
            "n_pixels": OW * OH,
            "interlaced": d % 2 == 1,
            "sum_r": int(r.sum()),
            "sum_g": int(g.sum()),
            "sum_b": int(b.sum()),
            "wsum_r": int((wgt * r).sum()),
            "wsum_g": int((wgt * g).sum()),
            "wsum_b": int((wgt * b).sum()),
        }


def test_gif_encode_small_palettes_and_odd_sizes():
    """_gif_encode must hold for palettes below 256 (table-size
    exponent + the min-code-size floor of 2) — decode back bit-exact."""
    import numpy as np

    from pse_stocks_etl_spark.operators.multimodal import (
        _gif_encode,
        _gif_first_raster,
    )

    rng = np.random.default_rng(3)
    for n_colors in (2, 3, 4, 16, 100, 256):
        pal = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
        for shape in ((1, 1), (3, 7), (8, 5)):
            idx = rng.integers(0, n_colors, shape).astype(np.uint8)
            for interlaced in (False, True):
                out = _gif_first_raster(_gif_encode(idx, pal, interlaced))
                assert (out[0] == idx).all(), (n_colors, shape, interlaced)
                assert (out[1][:n_colors] == pal).all()
                assert out[2] == interlaced


# ---------------------------------------------------------------------------
# Incremental BM25 index maintenance
# ---------------------------------------------------------------------------


def test_bm25_increment_equals_from_scratch_bit_for_bit(spark, sf_dir):
    """The merge algebra (postings union, df adds, totals add) must
    reproduce the from-scratch ranking EXACTLY — same doubles, not just
    same order (the emb_ann_ivfpq_increment contract)."""
    from pse_stocks_etl_spark.plans.round15_queries import (
        docs_bm25_index_increment,
        docs_bm25_topk,
    )

    inc = [tuple(r) for r in docs_bm25_index_increment(spark, sf_dir).collect()]
    scratch = [tuple(r) for r in docs_bm25_topk(spark, sf_dir).collect()]
    assert inc == scratch


def test_bm25_increment_base_side_is_algebraically_separable(spark, sf_dir):
    """The base corpus reaches the merged ranking ONLY through
    (postings, df, totals) — recompute the merge from MATERIALIZED base
    aggregates (simulating a persisted index: the base text is gone)
    and check the ranking still comes out identical."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pse_stocks_etl_spark.plans.round15_queries import (
        BM25_TOPK,
        _BM25_SHARD_MOD,
        _bm25_fold_scores,
        _bm25_postings,
        _bm25_s20_expr,
        docs_bm25_topk,
    )
    from pse_stocks_etl_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    is_shard = (F.col("doc_id") % _BM25_SHARD_MOD) == (_BM25_SHARD_MOD - 1)
    _bdl, b_tot, b_tf = _bm25_postings(d.filter(~is_shard))
    # materialize the standing index as plain local data — no lineage
    # back to the base text can survive createDataFrame (the postings
    # carry dl inline, so the index is two frames: totals + postings)
    base_tot = spark.createDataFrame(b_tot.collect(), b_tot.schema)
    base_tf = spark.createDataFrame(b_tf.collect(), b_tf.schema)

    _ndl, n_tot, n_tf = _bm25_postings(d.filter(is_shard))
    totals = (
        base_tot.select(F.col("n_docs").alias("nb"), F.col("sum_dl").alias("sb"))
        .crossJoin(n_tot.select(F.col("n_docs").alias("nn"), F.col("sum_dl").alias("sn")))
        .select((F.col("nb") + F.col("nn")).alias("n_docs"),
                (F.col("sb") + F.col("sn")).alias("sum_dl"))
    )
    dfm = (
        base_tf.groupBy("term").agg(F.count("*").alias("db"))
        .join(n_tf.groupBy("term").agg(F.count("*").alias("dn")), "term", "full_outer")
        .select("term", (F.coalesce("db", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("df"))
    )
    joined = (
        base_tf.unionByName(n_tf)
        .join(dfm, "term")
        .crossJoin(F.broadcast(totals))
    )
    scored = _bm25_fold_scores(joined.select("doc_id", _bm25_s20_expr().alias("s20")))
    ranked = (
        scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(BM25_TOPK)
        .withColumn("rk", F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc("doc_id"))).cast("long"))
    )
    assert [tuple(r) for r in ranked.collect()] == [
        tuple(r) for r in docs_bm25_topk(spark, sf_dir).collect()
    ]


def test_bm25_postings_are_never_shuffled_on_term(spark, sf_dir):
    """The hot-term guard, pinned at the PLAN level: df reaches the
    postings via broadcast (bounded by the frozen query-term list), so
    the only term-keyed exchanges carry PARTIAL AGGREGATES (at most
    one row per term per partition), never the postings themselves —
    with a 5-term query a postings shuffle on term would funnel every
    posting through at most five reducers (one of them corpus-sized if
    a query term is hot)."""
    from pse_stocks_etl_spark.plans.round15_queries import (
        docs_bm25_index_increment,
        docs_bm25_topk,
    )

    for q in (docs_bm25_topk, docs_bm25_index_increment):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, q.__name__
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange hashpartitioning(term" not in line:
                continue
            # the exchange's input is the next (deeper) line: it must
            # be a partial aggregate, i.e. only term-rollup rows move
            assert i + 1 < len(lines), (q.__name__, line.strip())
            child = lines[i + 1]
            assert "HashAggregate" in child and "partial_" in child, (
                q.__name__,
                line.strip(),
                child.strip(),
            )


def test_working_set_cache_registration_is_reload_safe():
    # VERDICT r9: all module-level caches must register through the
    # shared owner-tagged helper so importlib.reload never stacks a
    # second cache for the same module.
    import importlib

    from pse_stocks_etl_spark.plans import llm_queries
    from pse_stocks_etl_spark.plans import round13_queries, round15_queries
    from pse_stocks_etl_spark.plans import round9_queries  # noqa: F401

    def owners():
        return sorted(
            getattr(c, "_owner", "<untagged>")
            for c in llm_queries.EXTRA_WORKING_SET_CACHES
        )

    before = owners()
    assert "<untagged>" not in before
    assert len(before) == len(set(before))  # one cache per owner module
    importlib.reload(round13_queries)
    importlib.reload(round15_queries)
    assert owners() == before
