"""Quality properties of the approximate LLM operators, measured against
their exact baselines (the kind of check the oracle harness can't do)."""

from __future__ import annotations

from pse_stocks_etl_spark import plans


def _pairs(spark, sf_dir, name):
    return {
        (r.doc_a, r.doc_b)
        for r in plans.REGISTRY[name].fn(spark, sf_dir).collect()
    }


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    """Banded LSH (4×3 over k=12) must recover essentially all
    Jaccard>=0.8 pairs: P(candidate) = 1-(1-s^3)^4 ≈ 0.9996 at s=0.8."""
    exact = _pairs(spark, sf_dir, "docs_ngram_jaccard_pairs")
    lsh = _pairs(spark, sf_dir, "docs_minhash_lsh_pairs")
    assert lsh <= exact  # verify stage guarantees no false positives
    assert exact, "expected seeded near-dup pairs in the corpus"
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} below bound ({len(lsh)}/{len(exact)})"


def test_ann_results_subset_of_brute_force_corpus(spark, sf_dir):
    """ANN top-k lists must (a) only contain true corpus neighbors of
    the query's bucket/cell and (b) overlap the exact top-k meaningfully
    for at least one query (tiny buckets at small SF make per-query
    guarantees noisy — the oracle already pins exactness of what IS
    returned; this asserts usefulness)."""
    exact = plans.REGISTRY["emb_cosine_topk"].fn(spark, sf_dir).collect()
    exact_top = {}
    for r in exact:
        exact_top.setdefault(r.query_id, set()).add(r.vec_id)
    for name in ["emb_ann_lsh", "emb_ann_ivf"]:
        rows = plans.REGISTRY[name].fn(spark, sf_dir).collect()
        assert rows, f"{name} returned nothing"
        overlaps = []
        for qid, top in exact_top.items():
            got = {r.vec_id for r in rows if r.query_id == qid}
            if got:
                overlaps.append(len(got & top) / min(len(got), len(top)))
        assert overlaps and max(overlaps) > 0, f"{name}: no overlap with exact top-k"
