"""Round-8 operator guards beyond oracle parity: hand-computed edge
cases for the corpus dedup/quality operators (internal repetition,
cross-doc shared spans, short-doc exclusion, word-order collapse,
subset containment), hypothesis property tests against pure-python
models, and physical-plan shape checks for the three TPC-H-shaped
join-aggregation queries."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pse_stocks_etl_spark import plans
from pse_stocks_etl_spark.plans.round8_queries import (
    LARGE_ORDER_MIN_QTY,
    RARE_DF,
    SPAN_S,
    SPAN_W,
    docs_bow_dedup,
    docs_rare_bigram_rate,
    docs_span_dedup,
)

from conftest import SF_DIR


def _write_docs(path, texts):
    """Write a documents.parquet matching the testdata schema."""
    table = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["test"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, str(path / "documents.parquet"))
    return str(path)


def _plan(spark, name: str) -> str:
    df = plans.REGISTRY[name].fn(spark, SF_DIR)
    jvm = spark.sparkContext._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


# ------------------------------------------------------- pure-py models --
def _windows(tk: list[str]) -> list[str]:
    return [
        " ".join(tk[i : i + SPAN_W]) for i in range(0, len(tk) - SPAN_W + 1, SPAN_S)
    ]


def _span_model(docs: dict[int, list[str]]) -> dict[int, tuple[int, int]]:
    sites = Counter(w for tk in docs.values() for w in _windows(tk))
    out = {}
    for d, tk in docs.items():
        ws = _windows(tk)
        if ws:
            out[d] = (len(ws), sum(1 for w in ws if sites[w] > 1))
    return out


def _bigram_model(docs: dict[int, list[str]]) -> dict[int, tuple[int, int]]:
    grams = {
        d: [" ".join(tk[i : i + 2]) for i in range(len(tk) - 1)]
        for d, tk in docs.items()
    }
    df = Counter()
    for d, gs in grams.items():
        for g in set(gs):
            df[g] += 1
    return {
        d: (len(gs), sum(1 for g in gs if df[g] <= RARE_DF))
        for d, gs in grams.items()
        if gs
    }


# ------------------------------------------------------------ span dedup --
def test_span_dedup_internal_repetition_counts(spark, tmp_path):
    # One doc that is the same 4-word phrase repeated: with W=8/S=4 every
    # window is the identical string -> all sites duplicated.
    rep = " ".join(["x y z w"] * 6)  # 24 tokens, 5 windows, all equal
    uniq = " ".join(f"u{i}" for i in range(24))  # all windows unique
    d = _write_docs(tmp_path, [rep, uniq])
    rows = {r["doc_id"]: r for r in docs_span_dedup(spark, d).collect()}
    assert rows[1]["n_windows"] == 5
    assert rows[1]["n_dup_windows"] == 5
    assert rows[1]["drop_doc"] is True
    assert rows[2]["n_dup_windows"] == 0
    assert rows[2]["drop_doc"] is False


def test_span_dedup_cross_doc_shared_span(spark, tmp_path):
    shared = " ".join(f"s{i}" for i in range(SPAN_W))
    a = shared + " " + " ".join(f"a{i}" for i in range(8))
    b = shared + " " + " ".join(f"b{i}" for i in range(8))
    d = _write_docs(tmp_path, [a, b])
    rows = {r["doc_id"]: r for r in docs_span_dedup(spark, d).collect()}
    # Window at position 1 is the shared span in both docs -> flagged.
    assert rows[1]["n_dup_windows"] >= 1
    assert rows[2]["n_dup_windows"] >= 1


def test_span_dedup_short_docs_excluded(spark, tmp_path):
    d = _write_docs(tmp_path, ["too short", " ".join(f"w{i}" for i in range(12))])
    got = {r["doc_id"] for r in docs_span_dedup(spark, d).collect()}
    assert got == {2}  # doc 1 has < SPAN_W tokens -> no windows -> absent


# ------------------------------------------------------------- bow dedup --
def test_bow_dedup_collapses_word_order_and_repetition(spark, tmp_path):
    d = _write_docs(
        tmp_path,
        [
            "alpha beta gamma",
            "gamma alpha beta",        # same vocab, shuffled order
            "beta beta gamma alpha",   # same vocab, repetition
            "alpha beta delta",        # different vocab
        ],
    )
    rows = {r["doc_id"]: r for r in docs_bow_dedup(spark, d).collect()}
    assert rows[1]["group_size"] == 3
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False and rows[3]["keep"] is False
    assert rows[4]["group_size"] == 1 and rows[4]["keep"] is True
    assert rows[1]["bow_key"] == rows[2]["bow_key"] == rows[3]["bow_key"]
    assert rows[4]["bow_key"] != rows[1]["bow_key"]


# ----------------------------------------------------------- rare bigram --
def test_rare_bigram_rate_hand_computed(spark, tmp_path):
    # "a b" appears in 3 docs (df=3 > RARE_DF=2) -> common; every other
    # bigram lives in a single doc (df=1) -> rare.
    d = _write_docs(tmp_path, ["a b c", "a b d", "a b e"])
    rows = {r["doc_id"]: r for r in docs_rare_bigram_rate(spark, d).collect()}
    for doc_id in (1, 2, 3):
        assert rows[doc_id]["n_bigrams"] == 2
        assert rows[doc_id]["n_rare"] == 1  # ("b c") rare, ("a b") common
        assert rows[doc_id]["rare_rate"] == 0.5
        assert rows[doc_id]["low_quality"] is True  # 5*1 > 2


# -------------------------------------------------------------- property --
_WORDS = st.sampled_from(["aa", "bb", "cc", "dd"])
_DOCS = st.lists(
    st.lists(_WORDS, min_size=1, max_size=20), min_size=1, max_size=6
)
SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(docs=_DOCS)
@SETTINGS
def test_span_dedup_matches_python_model(spark, tmp_path_factory, docs):
    path = tmp_path_factory.mktemp("span")
    d = _write_docs(path, [" ".join(tk) for tk in docs])
    model = _span_model({i + 1: tk for i, tk in enumerate(docs)})
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in docs_span_dedup(spark, d).collect()
    }
    assert got == model


@given(docs=_DOCS)
@SETTINGS
def test_rare_bigram_matches_python_model(spark, tmp_path_factory, docs):
    path = tmp_path_factory.mktemp("bg")
    d = _write_docs(path, [" ".join(tk) for tk in docs])
    model = _bigram_model({i + 1: tk for i, tk in enumerate(docs)})
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_rare"])
        for r in docs_rare_bigram_rate(spark, d).collect()
    }
    assert got == model


# ------------------------------------------------------------ plan shape --
def test_promo_share_broadcasts_part(spark):
    plan = _plan(spark, "promo_revenue_share")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_large_orders_aggregates_before_join(spark):
    plan = _plan(spark, "large_order_customers")
    # partial agg on lineitem precedes the joins; surviving keys broadcast
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_nation_pair_trade_single_big_join(spark):
    import re

    plan = _plan(spark, "nation_pair_trade")
    # dims broadcast; at most ONE non-broadcast (shuffle) join: li-orders.
    # "formatted" explain prints each node twice (tree + details), so
    # count the numbered node headers, not raw substring hits.
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 4
    big = re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)
    assert len(big) <= 1, plan[:2000]


def test_containment_threshold_holds(spark):
    # The capped screen is a non-registry helper since r10 (the lossy
    # df-cap demoted it; docs_containment_prefix_pairs is canonical).
    from pse_stocks_etl_spark.plans.round8_queries import containment_pairs_capped

    rows = containment_pairs_capped(spark, SF_DIR).collect()
    assert rows, "sf0.001 corpus should contain subset-duplicates"
    assert all(r["containment"] >= 0.9 for r in rows)
    # directional: a pair may appear in one orientation only
    keys = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert all(a != b for a, b in keys)


def test_large_order_threshold_matches_constant(spark):
    rows = plans.REGISTRY["large_order_customers"].fn(spark, SF_DIR).collect()
    assert all(r["sum_qty"] > LARGE_ORDER_MIN_QTY for r in rows)


def test_span_and_bigram_plans_scan_once(spark):
    """The round-8 rewrite locked in: site/df counts come from window
    aggregates over ONE scan — an agg-and-join formulation re-scans the
    corpus and broadcasts a corpus-sized aggregate (dead at 100 TB)."""
    import re

    for name in ("docs_span_dedup", "docs_rare_bigram_rate"):
        plan = _plan(spark, name)
        scans = re.findall(r"\(\d+\) Scan parquet", plan)
        assert len(scans) == 1, f"{name}: {len(scans)} scans"
        assert "BroadcastExchange" not in plan, f"{name} broadcasts an aggregate"


def test_rfm_matches_python_model(spark):
    """Quintile scores recomputed in pure python from the raw orders
    table (global sort + explicit floor formula) must equal the
    two-phase ranks exactly."""
    import duckdb

    con = duckdb.connect()
    raw = con.sql(
        f"""
        SELECT o_custkey,
               date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                         (SELECT CAST(MAX(o_orderdate) AS DATE)
                          FROM '{SF_DIR}/orders.parquet')) AS rec,
               COUNT(*) AS freq,
               CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS mon
        FROM '{SF_DIR}/orders.parquet' GROUP BY o_custkey
        """
    ).fetchall()

    def quintile(vals, key):
        order = sorted(vals, key=key)
        n = len(order)
        return {
            row[0]: (i * 5) // n + 1 for i, row in enumerate(order)
        }

    r_q = quintile(raw, lambda r: (r[1], r[0]))
    f_q = quintile(raw, lambda r: (r[2], r[0]))
    m_q = quintile(raw, lambda r: (r[3], r[0]))
    got = {
        r["custkey"]: (r["r_score"], r["f_score"], r["m_score"])
        for r in plans.REGISTRY["customer_rfm_segments"].fn(spark, SF_DIR).collect()
    }
    want = {c: (6 - r_q[c], f_q[c], m_q[c]) for c, *_ in raw}
    assert got == want


def test_pq_quantize_is_shuffle_free(spark):
    """PQ is a pure per-row map: the plan must contain no Exchange at
    all (scan-bound at 100 TB, like emb_int8_quantize)."""
    plan = _plan(spark, "emb_pq_quantize")
    assert "Exchange" not in plan, plan[:1500]


def test_pq_code_roundtrip_hand_example(spark, tmp_path):
    """A vector sitting exactly on lattice centroids quantizes with
    zero error and the expected packed code."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pse_stocks_etl_spark.plans.round8_queries import (
        PQ_DSUB,
        PQ_K,
        PQ_M,
        emb_pq_quantize,
    )

    # subspace m gets centroid c=m exactly: q = 32 + 64*m on the 0..1024
    # grid -> x = (32 + 64*m)/512 - 1
    vec = []
    for m in range(PQ_M):
        vec += [(32 + 64 * m) / 512.0 - 1.0] * PQ_DSUB
    table = pa.table(
        {
            "vec_id": pa.array([1], pa.int64()),
            "embedding": pa.array([vec], pa.list_(pa.float32())),
            "label": pa.array([0], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    row = emb_pq_quantize(spark, str(tmp_path)).collect()[0]
    assert row["quant_err"] == 0
    assert row["pq_code"] == sum(m * 16**m for m in range(PQ_M))


def test_adc_agrees_with_exact_on_self_neighbors(spark, tmp_path):
    """Vectors planted exactly on distinct centroid lattices quantize
    losslessly, so ADC distance equals true grid distance and the
    nearest neighbor of a planted twin is its twin."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pse_stocks_etl_spark.plans.round8_queries import (
        PQ_DSUB,
        PQ_M,
        emb_ann_adc,
    )

    def lattice_vec(c):  # all subspaces at centroid c
        return [(32 + 64 * c) / 512.0 - 1.0] * (PQ_M * PQ_DSUB)

    # vec 0 (query) at centroid 3; vec 5 also at centroid 3 (its twin);
    # vecs 6..9 progressively farther lattices
    vecs = {0: 3, 5: 3, 6: 4, 7: 5, 8: 6, 9: 7}
    ids = sorted(vecs)
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [lattice_vec(vecs[i]) for i in ids], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(ids), pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    rows = [
        r
        for r in emb_ann_adc(spark, str(tmp_path)).collect()
        if r["query_id"] == 0
    ]
    by_rank = sorted(rows, key=lambda r: r["rank"])
    assert by_rank[0]["vec_id"] == 5 and by_rank[0]["adc_dist"] == 0
    # farther lattices rank strictly by distance
    assert [r["vec_id"] for r in by_rank[1:]] == [6, 7, 8, 9]


def test_adc_plan_broadcasts_queries(spark):
    plan = _plan(spark, "emb_ann_adc")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_pq_midpoint_tie_breaks_to_smaller_code(spark, tmp_path):
    """Grid value 64 sits exactly between centroids L_0=32 and L_1=96:
    the assignment must pick the SMALLER code (the oracle's
    first-minimum list_position semantics)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pse_stocks_etl_spark.plans.round8_queries import (
        PQ_DSUB,
        PQ_M,
        emb_pq_quantize,
    )

    vec = [64 / 512.0 - 1.0] * (PQ_M * PQ_DSUB)  # exact in float32
    table = pa.table(
        {
            "vec_id": pa.array([1], pa.int64()),
            "embedding": pa.array([vec], pa.list_(pa.float32())),
            "label": pa.array([0], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    row = emb_pq_quantize(spark, str(tmp_path)).collect()[0]
    assert row["pq_code"] == 0  # every subspace -> code 0, not 1
    # err = DSUB * (64-32)^2 per subspace
    assert row["quant_err"] == PQ_M * PQ_DSUB * 32 * 32


def test_containment_prefix_finds_planted_excerpt(spark, tmp_path):
    """A doc that is a contiguous excerpt of a much longer doc has
    containment 1.0 in one direction only — the asymmetric case
    Jaccard misses and the prefix filter must not lose."""
    from pse_stocks_etl_spark.plans.round8_queries import (
        docs_containment_prefix_pairs,
    )

    excerpt = " ".join(f"e{i}" for i in range(12))
    long_doc = excerpt + " " + " ".join(f"x{i}" for i in range(60))
    other = " ".join(f"z{i}" for i in range(30))
    d = _write_docs(tmp_path, [excerpt, long_doc, other])
    rows = {(r["doc_a"], r["doc_b"]): r["containment"]
            for r in docs_containment_prefix_pairs(spark, d).collect()}
    assert rows.get((1, 2)) == 1.0      # excerpt contained in long doc
    assert (2, 1) not in rows           # not the other way round
    assert not any(3 in k for k in rows)


def _containment_model(docs):
    """All-pairs exact containment >= 0.9 over distinct 3-shingles."""
    sh = {
        d: {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}
        for d, tk in docs.items()
    }
    out = {}
    for a, sa in sh.items():
        for b, sb in sh.items():
            if a != b and sa and len(sa & sb) * 10 >= 9 * len(sa):
                out[(a, b)] = len(sa & sb) / len(sa)
    return out


@given(docs=_DOCS)
@SETTINGS
def test_containment_prefix_matches_python_model(spark, tmp_path_factory, docs):
    from pse_stocks_etl_spark.plans.round8_queries import (
        docs_containment_prefix_pairs,
    )

    path = tmp_path_factory.mktemp("cont")
    d = _write_docs(path, [" ".join(tk) for tk in docs])
    model = _containment_model({i + 1: tk for i, tk in enumerate(docs)})
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in docs_containment_prefix_pairs(spark, d).collect()
    }
    assert got == model


def test_docs_queries_null_text_parity(spark, tmp_path):
    """A NULL text row must not split the engines (ADVICE r4 class:
    concat_ws('') vs array_to_string(NULL) diverge unless both sides
    exclude NULL text explicitly). Runs Spark AND the DuckDB oracle on
    a corpus containing a NULL text and compares exactly."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pse_stocks_etl_spark.testing import compare

    texts = ["alpha beta gamma delta", None, "alpha beta gamma delta"]
    table = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["t"] * 3, pa.string()),
            "n_chars": pa.array([22, 0, 22], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    for name in ("docs_span_dedup", "docs_bow_dedup", "docs_rare_bigram_rate"):
        q = plans.REGISTRY[name]
        sdf = q.fn(spark, str(tmp_path))
        rel = con.sql(q.oracle)
        problems = compare(
            sdf.columns,
            [tuple(r) for r in sdf.collect()],
            rel.columns,
            rel.fetchall(),
        )
        assert not problems, (name, problems)
        # and the NULL doc is excluded, not hashed as empty
        assert all(r["doc_id"] != 2 for r in sdf.collect()), name

def test_repetition_and_tfidf_single_scan_forms(spark, monkeypatch):
    """Round-9 rewrites locked in: repetition stats are a ZERO-exchange
    per-row projection (longest-run fold over sorted bigrams — any
    Exchange beyond the r12 scale-adaptive spread means someone
    reintroduced the explode/agg/join); TF-IDF computes df as a window
    over the collapsed (doc,term) frame, one scan of documents and no
    broadcast of a corpus-sized aggregate.

    The r12 parallelism floor (load_table_spread, commit 1b45c79) adds
    ONE repartition exchange of the raw scan when the file is small
    relative to the machine — a structural no-op at real scan widths —
    so the per-row-projection invariant is pinned with the floor
    disabled ($SPARK_GRAFT_SPREAD=1), and the spread form is separately
    pinned to exactly that one exchange."""
    import re

    # the spread form: exactly ONE exchange (the floor's repartition of
    # the raw scan), nothing reduce-side
    plan = _plan(spark, "docs_repetition_stats")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1
    assert "HashAggregate" not in plan and "Join" not in plan

    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "1")  # floor off -> pure form
    plan = _plan(spark, "docs_repetition_stats")
    assert "Exchange" not in plan, "docs_repetition_stats gained a shuffle"
    monkeypatch.delenv("SPARK_GRAFT_SPREAD")

    plan = _plan(spark, "docs_tfidf_top_terms")
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    # one scan computes tf+df; the 1-row corpus total may scan again
    assert len(scans) <= 2, f"docs_tfidf_top_terms: {len(scans)} scans"
    assert "SortMergeJoin" not in plan, "df join-back reintroduced"
