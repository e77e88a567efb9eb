"""Round-17 queries: exact substring dedup (suffix-array semantics)
and BPE training.

Semantics pinned against tiny pure-Python reference models on
hand-built corpora — arbitrary-offset repeats the stride-4 span lane
misses, interval-union coverage arithmetic (adjacent / overlapping /
gapped spans), and greedy simultaneous BPE merges including the
odd-run leftover case ('aaaa' -> [aa][aa], 'aaa' -> [aa][a]). Plan
guards pin the shapes the 100-TB story depends on: one window-hash
exchange for site counts (no agg+join re-shuffle) and no more than
one corpus scan feeding the BPE word-frequency table.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

from pse_stocks_etl_spark import plans
from pse_stocks_etl_spark.plans.round17_queries import (
    BPE_TRAIN_MERGES,
    SUB_L,
    docs_bpe_train,
    docs_substring_dedup,
)

from conftest import SF_DIR


def _write_docs(path, texts):
    table = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["test"] * len(texts), pa.string()),
            "n_chars": pa.array(
                [len(t) if t is not None else None for t in texts], pa.int64()
            ),
        }
    )
    pq.write_table(table, str(path / "documents.parquet"))
    return str(path)


# ---------------------------------------------------------------- models --
def _substring_model(docs: dict[int, list[str]]) -> dict[int, dict]:
    """Brute-force reference: hash every stride-1 L-window, count sites,
    take per-doc interval union of repeated windows."""
    wins = {
        d: [" ".join(tk[i : i + SUB_L]) for i in range(len(tk) - SUB_L + 1)]
        for d, tk in docs.items()
    }
    sites = Counter(w for ws in wins.values() for w in ws)
    out = {}
    for d, tk in docs.items():
        dup_pos = [i for i, w in enumerate(wins[d]) if sites[w] > 1]
        covered: set[int] = set()
        for p in dup_pos:
            covered.update(range(p, p + SUB_L))
        spans = 0
        prev = None
        for p in dup_pos:
            if prev is None or p - prev > SUB_L:
                spans += 1
            prev = p
        out[d] = {
            "n_tokens": len(tk),
            "n_windows": max(len(tk) - SUB_L + 1, 0),
            "n_dup_windows": len(dup_pos),
            "dup_tokens": len(covered),
            "n_dup_spans": spans,
            "drop_doc": 5 * len(covered) >= len(tk),
        }
    return out


def _bpe_model(word_freq: dict[str, int], n_merges: int):
    """Reference BPE trainer: simultaneous left-to-right merge, ties by
    (count desc, pair asc)."""
    states = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, f in states.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (x, y), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((x, y, c))
        new_states: dict[tuple, int] = {}
        for syms, f in states.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_states[tuple(out)] = new_states.get(tuple(out), 0) + f
        states = new_states
    return merges


# ------------------------------------------------- substring dedup -------
def test_substring_dedup_arbitrary_offset_repeat(spark, tmp_path):
    # A 14-token phrase repeated at DIFFERENT offsets in two docs —
    # phase-shifted so stride-4 sampling would see different windows,
    # but stride-1 exact matching must flag every covered token.
    phrase = " ".join(f"p{i}" for i in range(14))
    texts = [
        "a b c " + phrase + " x y z",
        "q r s t u " + phrase + " v w",
        " ".join(f"u{i}" for i in range(20)),  # unique filler
    ]
    sf = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r.asDict() for r in docs_substring_dedup(spark, sf).collect()}
    docs = {i + 1: t.split() for i, t in enumerate(texts)}
    model = _substring_model(docs)
    for d, m in model.items():
        for k, v in m.items():
            assert rows[d][k] == v, (d, k, rows[d], m)
    # the repeat is 14 tokens -> 3 repeated windows covering 14 tokens
    assert rows[1]["n_dup_windows"] == 3
    assert rows[1]["dup_tokens"] == 14
    assert rows[1]["n_dup_spans"] == 1
    assert rows[3]["n_dup_windows"] == 0 and not rows[3]["drop_doc"]


def test_substring_dedup_internal_repeat_and_gap(spark, tmp_path):
    # One doc containing the SAME 12-token run twice (internal
    # repetition counts: both sites flagged) separated by a gap longer
    # than L -> exactly 2 maximal spans, 24 covered tokens.
    run = " ".join(f"r{i}" for i in range(SUB_L))
    gap = " ".join(f"g{i}" for i in range(SUB_L + 5))
    texts = [run + " " + gap + " " + run, " ".join(f"z{i}" for i in range(15))]
    sf = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r.asDict() for r in docs_substring_dedup(spark, sf).collect()}
    model = _substring_model({i + 1: t.split() for i, t in enumerate(texts)})
    assert rows[1]["n_dup_spans"] == 2
    assert rows[1]["dup_tokens"] == 2 * SUB_L
    for k, v in model[1].items():
        assert rows[1][k] == v, (k, rows[1], model[1])


def test_substring_dedup_overlapping_repeats_union_not_sum(spark, tmp_path):
    # Doc 1 = 13-token slide of a repeated 12-window family: windows at
    # pos 0 and 1 both repeat (doc 2 and doc 3 each carry one), their
    # intervals overlap in 11 tokens -> union is 13, never 24.
    base = [f"s{i}" for i in range(13)]
    texts = [
        " ".join(base),
        " ".join(base[:12]) + " " + " ".join(f"f{i}" for i in range(5)),
        " ".join(f"h{i}" for i in range(5)) + " " + " ".join(base[1:13]),
    ]
    sf = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r.asDict() for r in docs_substring_dedup(spark, sf).collect()}
    assert rows[1]["n_dup_windows"] == 2
    assert rows[1]["dup_tokens"] == 13  # union, not 2 * 12
    assert rows[1]["n_dup_spans"] == 1
    model = _substring_model({i + 1: t.split() for i, t in enumerate(texts)})
    for d, m in model.items():
        for k, v in m.items():
            assert rows[d][k] == v, (d, k)


def test_substring_dedup_short_docs_have_no_windows(spark, tmp_path):
    texts = ["one two three", " ".join(f"w{i}" for i in range(SUB_L - 1))]
    sf = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r.asDict() for r in docs_substring_dedup(spark, sf).collect()}
    for d in (1, 2):
        assert rows[d]["n_windows"] == 0
        assert rows[d]["n_dup_windows"] == 0
        assert rows[d]["dup_tokens"] == 0
        assert not rows[d]["drop_doc"]


def test_substring_dedup_matches_model_on_sf(spark):
    # Full-corpus agreement with the brute-force model at sf0.001.
    import duckdb

    texts = (
        duckdb.connect()
        .execute(f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' WHERE text IS NOT NULL")
        .fetchall()
    )
    docs = {d: t.strip().lower().split() for d, t in texts}
    model = _substring_model(docs)
    rows = {r["doc_id"]: r.asDict() for r in docs_substring_dedup(spark, SF_DIR).collect()}
    assert set(rows) == set(model)
    for d, m in model.items():
        for k, v in m.items():
            assert rows[d][k] == v, (d, k, rows[d], m)


def test_substring_dedup_one_exchange_for_site_counts(spark):
    # The site count must ride a single window-hash exchange (count
    # over Window.partitionBy(w)), not an aggregate-and-join that
    # shuffles the window stream twice.
    df = docs_substring_dedup(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") <= 1, plan  # only the doc-level left join


# --------------------------------------------------------- BPE training --
def test_bpe_train_matches_reference_model(spark, tmp_path):
    texts = [
        "low lower lowest newer newest wider wide widest",
        "low low lower newer newer newest new new new",
        "banana bandana ananas",
    ]
    sf = _write_docs(tmp_path, texts)
    freq = Counter(w for t in texts for w in t.split())
    expect = _bpe_model(dict(freq), BPE_TRAIN_MERGES)
    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in docs_bpe_train(spark, sf).orderBy("step").collect()
    ]
    assert got == expect, (got, expect)


def test_bpe_train_odd_run_leftover_semantics(spark, tmp_path):
    # 'aaa' with merge (a,a): simultaneous left-to-right gives [aa][a],
    # so after merge 1 the pair (aa, a) exists but (a, a) is gone.
    # 7 copies to dominate merge 1; 'bb' * 4 forces a deterministic
    # later merge. The second merge must then be (aa, a) from the
    # leftovers, never (a, a) again.
    texts = ["aaa aaa aaa aaa aaa aaa aaa bb bb bb bb"]
    sf = _write_docs(tmp_path, texts)
    rows = docs_bpe_train(spark, sf).orderBy("step").collect()
    assert (rows[0]["left_sym"], rows[0]["right_sym"]) == ("a", "a")
    assert rows[0]["pair_count"] == 14  # 2 per 'aaa' word, 7 words
    assert (rows[1]["left_sym"], rows[1]["right_sym"]) == ("aa", "a")
    assert rows[1]["pair_count"] == 7
    freq = Counter(w for t in texts for w in t.split())
    expect = _bpe_model(dict(freq), BPE_TRAIN_MERGES)
    got = [(r["left_sym"], r["right_sym"], r["pair_count"]) for r in rows]
    assert got == expect[: len(got)]


def test_bpe_train_tie_breaks_lexicographically(spark, tmp_path):
    # 'zx' and 'ab' both appear exactly 3 times -> tie on count, and
    # the (left asc, right asc) order must pick (a, b).
    texts = ["zx ab zx ab zx ab"]
    sf = _write_docs(tmp_path, texts)
    rows = docs_bpe_train(spark, sf).orderBy("step").collect()
    assert (rows[0]["left_sym"], rows[0]["right_sym"]) == ("a", "b")


def test_bpe_train_on_sf_matches_model(spark):
    import duckdb

    texts = (
        duckdb.connect()
        .execute(f"SELECT text FROM '{SF_DIR}/documents.parquet' WHERE text IS NOT NULL")
        .fetchall()
    )
    import re

    freq = Counter(
        w
        for (t,) in texts
        for w in t.strip().lower().split()
        if re.fullmatch(r"[a-z]+", w)
    )
    expect = _bpe_model(dict(freq), BPE_TRAIN_MERGES)
    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in docs_bpe_train(spark, SF_DIR).orderBy("step").collect()
    ]
    assert got == expect


def test_bpe_train_encode_matches_model(spark, tmp_path):
    # Encoding with the LEARNED table must equal the reference
    # trainer's final word states (token counts AND symbol sequence).
    from pse_stocks_etl_spark.plans.round17_queries import docs_bpe_train_encode

    texts = [
        "low lower lowest newer newest wider wide widest",
        "low low lower newer newer newest new new new",
    ]
    sf = _write_docs(tmp_path, texts)
    freq = Counter(w for t in texts for w in t.split())
    # replay the reference trainer, tracking per-word states
    states = {w: tuple(w) for w in freq}
    merges = _bpe_model(dict(freq), BPE_TRAIN_MERGES)
    for x, y, _ in merges:
        for w, syms in states.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            states[w] = tuple(out)
    rows = {r["word"]: r for r in docs_bpe_train_encode(spark, sf).collect()}
    assert set(rows) == set(freq)
    for w, syms in states.items():
        assert rows[w]["n_tokens"] == len(syms), (w, rows[w], syms)
        assert rows[w]["encoded"] == "".join(f"({s})" for s in syms), w
        assert rows[w]["f"] == freq[w]
        assert rows[w]["n_chars"] == len(w)


def test_bpe_train_registered_with_oracle():
    q = plans.REGISTRY["docs_bpe_train"]
    assert q.oracle is not None
    assert "replace(s" in q.oracle  # merge application is plain replace
    q2 = plans.REGISTRY["docs_substring_dedup"]
    assert q2.oracle is not None


# ----------------------------------------- incremental substring dedup --
def test_incremental_substring_matches_full_model(spark, tmp_path):
    # New docs (odd ids) measured against standing (even) + batch;
    # expected values derived from the SAME brute-force model as the
    # full lane, restricted to odd docs.
    phrase = " ".join(f"p{i}" for i in range(SUB_L + 2))
    texts = [
        None,  # doc 1 (new) — null text drops out
        "a b " + phrase + " c d",              # doc 2 standing, carries phrase
        "x y z " + phrase + " q r",            # doc 3 NEW: hits standing
        " ".join(f"u{i}" for i in range(20)),  # doc 4 standing unique
        "m n " + " ".join(f"b{i}" for i in range(SUB_L)) + " o",   # doc 5 NEW
        " ".join(f"v{i}" for i in range(18)),  # doc 6 standing unique
        " ".join(f"b{i}" for i in range(SUB_L)) + " w1 w2 w3",     # doc 7 NEW: batch-internal pair with doc 5
    ]
    sf = _write_docs(tmp_path, texts)
    from pse_stocks_etl_spark.plans.round17_queries import (
        docs_incremental_substring_dedup,
    )

    rows = {
        r["doc_id"]: r.asDict()
        for r in docs_incremental_substring_dedup(spark, sf).collect()
    }
    assert set(rows) == {3, 5, 7}  # odd ids with non-null text
    docs = {
        i + 1: t.strip().lower().split()
        for i, t in enumerate(texts)
        if t is not None
    }
    model = _substring_model(docs)
    for d in (3, 5, 7):
        for k in ("n_tokens", "n_dup_windows", "dup_tokens", "n_dup_spans"):
            assert rows[d][k] == model[d][k], (d, k, rows[d], model[d])
    # doc 3's dup evidence is the standing phrase; docs 5/7 are
    # batch-internal only
    assert rows[3]["n_hit_standing"] == rows[3]["n_dup_windows"] > 0
    assert rows[5]["n_dup_windows"] == 1 and rows[5]["n_hit_standing"] == 0
    assert rows[7]["n_dup_windows"] == 1 and rows[7]["n_hit_standing"] == 0


def test_incremental_substring_consistent_with_full_lane(spark):
    # On the real corpus: for every odd doc, the incremental verdict
    # must equal the full lane's (same site universe, restricted output).
    full = {
        r["doc_id"]: r.asDict()
        for r in plans.REGISTRY["docs_substring_dedup"].fn(spark, SF_DIR).collect()
    }
    inc = {
        r["doc_id"]: r.asDict()
        for r in plans.REGISTRY["docs_incremental_substring_dedup"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(inc) == {d for d in full if d % 2 == 1}
    for d, r in inc.items():
        for k in ("n_tokens", "n_dup_windows", "dup_tokens", "n_dup_spans", "drop_doc"):
            assert r[k] == full[d][k], (d, k)
        assert 0 <= r["n_hit_standing"] <= r["n_dup_windows"]


# ------------------------------------------------------- ANN recall -----
def test_ann_recall_matches_component_queries(spark):
    from pse_stocks_etl_spark.plans.llm_queries import TOPK

    rec = {r["query_id"]: r.asDict()
           for r in plans.REGISTRY["emb_ann_recall"].fn(spark, SF_DIR).collect()}
    exact = plans.REGISTRY["emb_cosine_topk"].fn(spark, SF_DIR).collect()
    lsh = plans.REGISTRY["emb_ann_lsh"].fn(spark, SF_DIR).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    ls = {}
    for r in lsh:
        ls.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(rec) == set(ex)
    for q, s in ex.items():
        assert rec[q]["n_exact"] == len(s) == TOPK
        hits = len(s & ls.get(q, set()))
        assert rec[q]["n_hit_lsh"] == hits
        assert rec[q]["recall_lsh"] == hits * 1.0 / len(s)
        assert 0 <= rec[q]["n_hit_ivf"] <= len(s)


# ------------------------------------------------------ count-min -------
def test_cms_matches_model_on_skewed_events(spark, tmp_path):
    """Pure-Python CMS replay on a fixture with a genuinely heavy key
    (the sf events are uniform, so the interesting regime — a dominant
    key plus collision overcounts — needs its own data)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pse_stocks_etl_spark.functions.text import portable_hash64  # noqa: F401
    from pse_stocks_etl_spark.plans.round17_queries import (
        CMS_D,
        CMS_TOP,
        CMS_W,
        heavy_hitters_cms,
    )

    # key 7 owns half the stream; 200 tail keys share the rest
    uids = [7] * 500 + [100 + i % 200 for i in range(500)] + [None] * 3
    n = len(uids)
    import datetime

    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1, 0, 0, i % 60) for i in range(n)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    rows = {r["user_id"]: r.asDict()
            for r in heavy_hitters_cms(spark, str(tmp_path)).collect()}
    assert len(rows) == CMS_TOP

    # replay the sketch in Python with the same portable hash
    import hashlib

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def bucket(r: int, uid: int) -> int:
        return ((h64(f"cms{r}:{uid}") % CMS_W) + CMS_W) % CMS_W

    from collections import Counter

    true = Counter(u for u in uids if u is not None)
    counters = Counter()
    for u, c in true.items():
        for r in range(CMS_D):
            counters[(r, bucket(r, u))] += c
    est = {
        u: min(counters[(r, bucket(r, u))] for r in range(CMS_D))
        for u in true
    }
    top = sorted(est, key=lambda u: (-est[u], u))[:CMS_TOP]
    assert set(rows) == set(top)
    for rank, u in enumerate(top, start=1):
        assert rows[u]["hh_rank"] == rank
        assert rows[u]["cms_est"] == est[u]
        assert rows[u]["true_n"] == true[u]
        assert rows[u]["overcount"] == est[u] - true[u]
        assert rows[u]["never_undercounts"]
    # the heavy key must surface at rank 1 with an exact-ish estimate
    assert rows[7]["hh_rank"] == 1 and rows[7]["true_n"] == 500
