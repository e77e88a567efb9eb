"""Oracle compile-footprint budget — the guard VERDICT r10 item 3 asked
for.

sql_dot expands a vector-vector dot product to EMB_DIM multiply terms;
an oracle that re-inlines sql_cosine (3 such expansions) in SELECT +
window ORDER BY + WHERE per pair site compiles a parse tree DuckDB's
allocator cannot sustain after hundreds of large oracle compiles in one
process — the docs_semdedup_increment driver OOM in CORRECTNESS_r10.
The bounded forms (functions/vectors.py sql_norms_cte /
sql_cosine_prenorm) precompute per-row norms once and expand each pair
dot exactly once in an inner projection; this test pins the budget so a
future oracle cannot silently regress into the OOM class.

Two metrics over every registered oracle's text:
  * vector-vector dot expansions — first-term pattern
    `x[1]::DOUBLE * y[1]::DOUBLE` where y is a column reference (a
    literal-plane dot multiplies by a parenthesized constant instead,
    so it never matches);
  * total expansion markers (`[1]::DOUBLE` occurrences) — vec-vec dots
    contribute 2, literal-plane dots 1; bounds the whole tree including
    the irreducible LSH plane/band buckets.
"""

from __future__ import annotations

import re

from pse_stocks_etl_spark import plans

# x[1]::DOUBLE * y[1]::DOUBLE with y a column path — the char class
# excludes spaces, '+' and '-', so a plane dot's literal factor
# `(0.1234)` followed by ` + ` can never bridge to the next term.
_VEC_VEC_DOT = re.compile(r"\[1\]::DOUBLE\s*\*\s*[\w.()\[\]:]*?\[1\]::DOUBLE")
_MARKER = re.compile(r"\[1\]::DOUBLE")

# Budgets: the worst remaining cases after the r11 rewrite are
# emb_ivf_split_recall (the split chain + probe scoring + candidate
# re-rank + an embedded brute-force subquery: 10 vec-vec dots, 20
# markers — every dot still expands exactly once in a projection) and
# emb_ann_recall (a composite of cosine_topk + ann_lsh + ann_ivf
# subqueries: 7 vec-vec dots, 22 markers incl. 8 plane dots).
# Pre-rewrite, docs_semdedup_increment alone sat at 21 vec-vec dots
# with 3x re-inlining — the tree that OOM'd the driver harness; the
# budget forbids the RE-INLINING class, not honest composites.
MAX_VEC_VEC_DOTS = 10
MAX_MARKERS = 24
# Registry-wide creep guard: r11 total is ~178 markers across all
# embedding oracles (146 + the two new split lanes); pre-rewrite the
# OLD registry already sat at ~198 and grew every round.
MAX_TOTAL_MARKERS = 215


def _oracle_texts() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in plans.REGISTRY.items()
        if spec.oracle
    }


def test_no_oracle_exceeds_dot_expansion_budget():
    over = {}
    for name, sql in _oracle_texts().items():
        n = len(_VEC_VEC_DOT.findall(sql))
        if n > MAX_VEC_VEC_DOTS:
            over[name] = n
    assert not over, (
        f"oracles exceeding the {MAX_VEC_VEC_DOTS} vec-vec dot-expansion "
        f"budget (rewrite with sql_norms_cte + sql_cosine_prenorm, "
        f"compute-once inner projection): {over}"
    )


def test_no_oracle_exceeds_marker_budget():
    over = {}
    for name, sql in _oracle_texts().items():
        n = len(_MARKER.findall(sql))
        if n > MAX_MARKERS:
            over[name] = n
    assert not over, (
        f"oracles exceeding the {MAX_MARKERS} expansion-marker budget: {over}"
    )


def test_registry_total_marker_creep():
    total = sum(len(_MARKER.findall(sql)) for sql in _oracle_texts().values())
    assert total <= MAX_TOTAL_MARKERS, (
        f"registry-wide expansion markers grew to {total} "
        f"(budget {MAX_TOTAL_MARKERS}) — new embedding oracles must use "
        f"the bounded prenorm forms"
    )


def test_metric_detects_the_oom_class():
    """The vec-vec metric actually counts what it claims: a synthetic
    oracle in the pre-r11 shape (sql_cosine inlined 3x) measures 9, the
    bounded rewrite measures 2, and plane dots measure 0."""
    from pse_stocks_etl_spark.functions.vectors import (
        sql_cosine,
        sql_cosine_prenorm,
        sql_norms_cte,
    )

    cos = sql_cosine("a.embedding", "b.embedding", 64)
    bad = f"SELECT {cos} AS c FROM t WHERE {cos} > 0 ORDER BY {cos}"
    assert len(_VEC_VEC_DOT.findall(bad)) == 9

    good = (
        f"WITH {sql_norms_cte(64)} SELECT c FROM (SELECT "
        f"{sql_cosine_prenorm('a.embedding', 'b.embedding', 'na.nrm', 'nb.nrm', 64)}"
        f" AS c FROM t) WHERE c > 0"
    )
    assert len(_VEC_VEC_DOT.findall(good)) == 2

    plane = " + ".join(f"(v[{i + 1}]::DOUBLE * (0.5))" for i in range(64))
    assert len(_VEC_VEC_DOT.findall(f"SELECT {plane} + {plane} FROM t")) == 0
