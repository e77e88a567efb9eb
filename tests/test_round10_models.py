"""Round-10 semantics beyond oracle parity: pure-python / numpy models
and hand fixtures for the Mann-Whitney ranks, CDC replay, BPE pair
counts, vocabulary growth, kNN voting, Matryoshka recall, the SemDeDup
pairwise rule, the Others-rollup boundary, and SCD2 row structure.
Each model re-derives the answer with a different algorithm than both
the Spark plan AND the DuckDB oracle, so a shared misreading of the
spec cannot pass."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pse_stocks_etl_spark.plans.round10_queries import (
    BPE_TOP_PAIRS,
    KNN_HELDOUT_MOD,
    KNN_K,
    MRL_PREFIX_DIM,
    MRL_TOPK,
    SCD2_BUMP_CENTS,
    SEMDEDUP_TAU,
    VOCAB_BATCHES,
    brand_share_with_others,
    docs_bpe_top_merges,
    docs_vocab_growth,
    emb_knn_classify,
    emb_matryoshka_recall,
    emb_semdedup,
    events_cdc_apply,
    scd2_customer_merge,
    value_mannwhitney_u,
)

_HYP = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------------------------------------------ fixtures --
def _write_events(path, rows):
    """rows: [(event_id, hours, user_id, event_type, value)]"""
    base = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(hours=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(path / "events.parquet"),
    )
    return str(path)


def _write_docs(path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
            }
        ),
        str(path / "documents.parquet"),
    )
    return str(path)


def _write_embeddings(path, vecs, labels=None):
    """vecs: {vec_id: [float]*64}"""
    ids = sorted(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [vecs[i] for i in ids], pa.list_(pa.float32())
                ),
                "label": pa.array(
                    [labels[i] if labels else i % 10 for i in ids], pa.int32()
                ),
            }
        ),
        str(path / "embeddings.parquet"),
    )
    return str(path)


def _cos6(a, b):
    """Rounded cosine with the engine's left-to-right float64 folds."""
    d = na = nb = 0.0
    for x, y in zip(a, b):
        d += float(x) * float(y)
        na += float(x) * float(x)
        nb += float(y) * float(y)
    return round(d / (math.sqrt(na) * math.sqrt(nb)), 6)


def _f32(vals):
    import numpy as np

    return [float(np.float32(v)) for v in vals]


# ------------------------------------------------- Mann-Whitney ranks --
@given(
    clicks=st.lists(st.integers(0, 12).map(float), min_size=1, max_size=20),
    purchases=st.lists(st.integers(0, 12).map(float), min_size=1, max_size=20),
)
@settings(**_HYP)
def test_mannwhitney_matches_python_rank_model(spark, tmp_path_factory, clicks, purchases):
    """Average-rank model with heavy ties (values drawn from 13 levels):
    2x-rank of value v = 2*(#strictly below) + (#at v) + 1."""
    rows = [(i, i, 1, "click", v) for i, v in enumerate(clicks)]
    rows += [
        (1000 + i, i, 2, "purchase", v) for i, v in enumerate(purchases)
    ]
    d = _write_events(tmp_path_factory.mktemp("mw"), rows)
    got = value_mannwhitney_u(spark, d).collect()[0]
    allv = [(v, 1) for v in clicks] + [(v, 0) for v in purchases]
    cnt = Counter(v for v, _ in allv)
    below, run = {}, 0
    for v in sorted(cnt):
        below[v], run = run, run + cnt[v]
    r1_2x = sum(2 * below[v] + cnt[v] + 1 for v, g in allv if g == 1)
    n1, n2 = len(clicks), len(purchases)
    u2x = r1_2x - n1 * (n1 + 1)
    assert (got.n_click, got.n_purchase, got.u_click_2x) == (n1, n2, u2x)
    assert got.auc_click == u2x * 1.0 / (2 * n1 * n2)


# ------------------------------------------------------- CDC replay --
@given(
    ops=st.lists(
        st.tuples(
            st.integers(0, 3),  # user
            st.integers(0, 5),  # hour
            st.booleans(),  # upsert?
            st.integers(0, 9).map(float),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_HYP)
def test_cdc_apply_matches_dict_replay(spark, tmp_path_factory, ops):
    rows = [
        (i, h, u, "purchase" if up else "error", v)
        for i, (u, h, up, v) in enumerate(ops)
    ]
    d = _write_events(tmp_path_factory.mktemp("cdc"), rows)
    got = {
        r.user_id: (r.value, r.applied_ts, r.n_ops)
        for r in events_cdc_apply(spark, d).collect()
    }
    state, counts = {}, Counter()
    base = dt.datetime(2024, 1, 1)
    for i, (u, h, up, v) in sorted(enumerate(ops), key=lambda t: (t[1][1], t[0])):
        counts[u] += 1
        state[u] = (v, base + dt.timedelta(hours=h)) if up else None
    want = {
        u: (s[0], s[1], counts[u]) for u, s in state.items() if s is not None
    }
    assert got == want


# ---------------------------------------------------- BPE pair model --
def test_bpe_top_merges_counter_model(spark, tmp_path):
    texts = ["low lower lowest", "new newer newest low", "ab", "a", ""]
    d = _write_docs(tmp_path, texts)
    got = [(r.pair, r.n, r.rank) for r in
           docs_bpe_top_merges(spark, d).orderBy("rank").collect()]
    c = Counter()
    for t in texts:
        for w in t.split():
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    c[w[i : i + 2]] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_PAIRS]
    assert got == [(p, n, i + 1) for i, (p, n) in enumerate(want)]


# ------------------------------------------------- vocab growth model --
def test_vocab_growth_set_model(spark, tmp_path):
    # doc_id 0..9 -> batch = doc_id % VOCAB_BATCHES; craft texts so new
    # tokens appear in batches 0, 1 and 4 only
    texts = ["a b", "b c", "a", "c b", "d e a", "e", "a d", "b", "c", "a e"]
    d = _write_docs(tmp_path, texts)
    got = {
        r.batch: (r.new_tokens, r.cum_vocab)
        for r in docs_vocab_growth(spark, d).collect()
    }
    first = {}
    for i, t in enumerate(texts):
        for w in t.split():
            first.setdefault(w, i % VOCAB_BATCHES)
    per = Counter(first.values())
    cum, want = 0, {}
    for b in sorted(per):
        cum += per[b]
        want[b] = (per[b], cum)
    assert got == want


# ------------------------------------------------------- kNN + MRL --
def _seeded_vecs(n, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    return {
        i: _f32([round(float(x), 4) for x in rng.standard_normal(64)])
        for i in range(n)
    }


def test_knn_matches_python_vote_model(spark, tmp_path):
    vecs = _seeded_vecs(60)
    d = _write_embeddings(tmp_path, vecs)
    got = {
        r.query_id: (r.predicted, r.n_votes, r.actual, r.correct)
        for r in emb_knn_classify(spark, d).collect()
    }
    heldout = [i for i in vecs if i % KNN_HELDOUT_MOD == 0]
    train = [i for i in vecs if i % KNN_HELDOUT_MOD != 0]
    want = {}
    for q in heldout:
        scored = sorted(
            ((-_cos6(vecs[t], vecs[q]), t) for t in train)
        )[:KNN_K]
        votes = Counter(t % 10 for _, t in scored)
        pred, n = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want[q] = (pred, n, q % 10, pred == q % 10)
    assert got == want


def test_matryoshka_recall_python_model(spark, tmp_path):
    vecs = _seeded_vecs(40, seed=11)
    d = _write_embeddings(tmp_path, vecs)
    got = {
        r.query_id: r.n_overlap for r in emb_matryoshka_recall(spark, d).collect()
    }
    from pse_stocks_etl_spark.plans.llm_queries import ANN_QUERY_IDS

    want = {}
    for q in ANN_QUERY_IDS:
        others = [i for i in vecs if i != q]
        full = {
            t
            for _, t in sorted(
                ((-_cos6(vecs[t], vecs[q]), t) for t in others)
            )[:MRL_TOPK]
        }
        pre = {
            t
            for _, t in sorted(
                (
                    (
                        -_cos6(
                            vecs[t][:MRL_PREFIX_DIM], vecs[q][:MRL_PREFIX_DIM]
                        ),
                        t,
                    )
                    for t in others
                )
            )[:MRL_TOPK]
        }
        want[q] = len(full & pre)
    assert got == want


def test_semdedup_pairwise_rule_model(spark, tmp_path):
    vecs = _seeded_vecs(40, seed=3)
    # force two exact duplicate groups so the rule actually fires
    vecs[30] = vecs[5]
    vecs[31] = vecs[5]
    vecs[32] = vecs[8]
    d = _write_embeddings(tmp_path, vecs)
    got = {r.vec_id: (r.cell, r.kept) for r in emb_semdedup(spark, d).collect()}
    from pse_stocks_etl_spark.plans.llm_queries import IVF_CENTROID_IDS

    cents = sorted(IVF_CENTROID_IDS)
    cell = {
        v: max(
            ((_cos6(vecs[v], vecs[c]), -c) for c in cents),
        )
        for v in vecs
    }
    cell = {v: -t[1] for v, t in cell.items()}
    want = {}
    for v in vecs:
        dup = any(
            u < v
            and cell[u] == cell[v]
            and _cos6(vecs[u], vecs[v]) >= SEMDEDUP_TAU
            for u in vecs
        )
        want[v] = (cell[v], not dup)
    assert got == want
    # the duplicate groups must have lost their larger ids
    assert got[30][1] is False and got[31][1] is False and got[32][1] is False
    assert got[5][1] is True and got[8][1] is True


# ------------------------------------------- Others-rollup boundary --
def test_brand_share_others_is_bottom_tail(spark, tmp_path):
    """7 brands with strictly increasing revenue: the top 5 keep their
    names, the bottom 2 roll into Others, shares sum to 1."""
    brands = [f"B{i}" for i in range(7)]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(7), pa.int64()),
                "p_name": pa.array(brands, pa.string()),
                "p_brand": pa.array(brands, pa.string()),
                "p_type": pa.array(["STANDARD"] * 7, pa.string()),
                "p_size": pa.array([1] * 7, pa.int32()),
                "p_retailprice": pa.array([1.0] * 7, pa.float64()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    li = [(k, float(k + 1)) for k in range(7)]  # revenue grows with key
    n = len(li)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(n), pa.int64()),
                "l_partkey": pa.array([k for k, _ in li], pa.int64()),
                "l_suppkey": pa.array([1] * n, pa.int64()),
                "l_linenumber": pa.array([1] * n, pa.int64()),
                "l_quantity": pa.array([1.0] * n, pa.float64()),
                "l_extendedprice": pa.array([p for _, p in li], pa.float64()),
                "l_discount": pa.array([0.0] * n, pa.float64()),
                "l_tax": pa.array([0.0] * n, pa.float64()),
                "l_returnflag": pa.array(["N"] * n, pa.string()),
                "l_linestatus": pa.array(["O"] * n, pa.string()),
                "l_shipdate": pa.array(
                    [dt.datetime(2020, 1, 1)] * n, pa.timestamp("us")
                ),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    rows = {r.brand: r for r in brand_share_with_others(spark, str(tmp_path)).collect()}
    # top-5 by revenue are B6..B2; Others = B0 + B1 = 100 + 200 cents
    assert set(rows) == {"B2", "B3", "B4", "B5", "B6", "Others"}
    assert rows["Others"].revenue_cents == 300
    assert abs(sum(r.share for r in rows.values()) - 1.0) < 1e-12


# ----------------------------------------------------- SCD2 structure --
def test_scd2_changed_customers_have_two_versions(spark, tmp_path):
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([5, 7], pa.int64()),
                "c_name": pa.array(["five", "seven"], pa.string()),
                "c_nationkey": pa.array([0, 0], pa.int64()),
                "c_acctbal": pa.array([10.0, 20.0], pa.float64()),
                "c_mktsegment": pa.array(["A", "B"], pa.string()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    rows = sorted(
        (
            (r.c_custkey, r.acctbal_cents, r.is_current, r.valid_to is None)
            for r in scd2_customer_merge(spark, str(tmp_path)).collect()
        )
    )
    # custkey 5 (changed): closed D0 row + open bumped D1 row;
    # custkey 7 (unchanged): one open row
    assert rows == [
        (5, 1000, False, False),
        (5, 1000 + SCD2_BUMP_CENTS, True, True),
        (7, 2000, True, True),
    ]
