"""Hypothesis property suites for the round-18 curation arithmetic —
pure-Python, no Spark session, so the example budget is generous
(the Spark-vs-oracle equivalence is the parity suite's job; THESE pin
the semantics both engines implement).

Properties:
- the split multiply-divide is EXACTLY floor(a*b/d) (not merely
  close), and its intermediates respect the documented 2^63 headroom;
- the temperature mixture never over-allocates the budget, caps rates
  at 1e6 ppm, and orders weights monotonically with token counts;
- the log2-bucket quantile routing always lands the exact order
  statistic inside the routed bucket's bounds;
- the Bloom filter has NO false negatives for any gram/benchmark split
  (claimed set is a superset of true membership);
- bigram-LM inverse-probability scores are bounded below by 1e6 ppm
  (every conditional probability is <= 1) and hit exactly 1e6 on a
  fully-determined corpus.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pse_stocks_etl_spark.plans.round18_queries import (
    BLOOM_M,
    BLOOM_SALTS,
    BUDGET_DIV,
    PPM,
    QUANTILES,
)

SETTINGS = settings(max_examples=300, deadline=None)


def _muldiv(a: int, b: int, d: int) -> int:
    return (a // d) * b + ((a % d) * b) // d


# ------------------------------------------------------------- muldiv --

@SETTINGS
@given(
    a=st.integers(min_value=0, max_value=2**62),
    d=st.integers(min_value=1, max_value=PPM),
    data=st.data(),
)
def test_muldiv_is_exact_floor(a, d, data):
    b = data.draw(st.integers(min_value=0, max_value=d))
    assert _muldiv(a, b, d) == (a * b) // d


@SETTINGS
@given(
    a=st.integers(min_value=0, max_value=2**62),
    d=st.integers(min_value=1, max_value=PPM),
    data=st.data(),
)
def test_muldiv_intermediates_fit_int64(a, d, data):
    b = data.draw(st.integers(min_value=0, max_value=d))
    assert (a // d) * b < 2**63
    assert (a % d) * b < 2**63


# ------------------------------------------------------------ mixture --

def _mixture(tokens_by_source: dict[str, int]):
    sqrt_micro = {
        s: math.floor(math.sqrt(n) * PPM) for s, n in tokens_by_source.items()
    }
    total_sqrt = sum(sqrt_micro.values())
    total_tokens = sum(tokens_by_source.values())
    budget = total_tokens // BUDGET_DIV
    out = {}
    for s, n in tokens_by_source.items():
        w = (sqrt_micro[s] * PPM) // total_sqrt
        target = _muldiv(budget, w, PPM)
        out[s] = (w, target, min(PPM, _muldiv(target, PPM, n)))
    return budget, out


@SETTINGS
@given(
    tokens=st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=4),
        st.integers(min_value=1, max_value=10**12),
        min_size=1,
        max_size=20,
    )
)
def test_mixture_budget_weights_rates(tokens):
    budget, out = _mixture(tokens)
    weights = {s: w for s, (w, _, _) in out.items()}
    # floor normalization: never exceeds 1e6, loses < 1 ppm per source
    assert sum(weights.values()) <= PPM
    # allocation never exceeds the budget
    assert sum(t for (_, t, _) in out.values()) <= budget
    # rates are capped and non-negative
    for _, (_, _, rate) in out.items():
        assert 0 <= rate <= PPM
    # monotone: more tokens -> no smaller temperature weight
    ranked = sorted(tokens, key=tokens.__getitem__)
    for lo, hi in zip(ranked, ranked[1:]):
        assert weights[lo] <= weights[hi]


# ----------------------------------------------------------- quantile --

@SETTINGS
@given(
    lengths=st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300
    )
)
def test_quantile_routing_lands_in_bucket(lengths):
    vals = sorted(lengths)
    n = len(vals)
    for q in QUANTILES:
        rnk = (q * n + 99) // 100
        exact = vals[rnk - 1]
        bucket = max(exact.bit_length(), 1)
        lo = 0 if bucket == 1 else 1 << (bucket - 1)
        hi = (1 << bucket) - 1
        assert 1 <= rnk <= n
        assert lo <= exact <= hi  # the within_bound verdict is a theorem


# -------------------------------------------------------------- bloom --

def _pos(sh_val: int, salt: int) -> int:
    return int(
        hashlib.md5(f"{salt}|{sh_val}".encode()).hexdigest()[:15], 16
    ) % BLOOM_M


@SETTINGS
@given(
    grams=st.sets(st.integers(min_value=0, max_value=2**60), max_size=120),
    data=st.data(),
)
def test_bloom_never_misses(grams, data):
    bench = data.draw(st.sets(st.sampled_from(sorted(grams)) if grams else st.nothing(), max_size=len(grams)) if grams else st.just(set()))
    bits = {_pos(g, j) for g in bench for j in BLOOM_SALTS}
    claimed = {
        g for g in grams if all(_pos(g, j) in bits for j in BLOOM_SALTS)
    }
    assert bench <= claimed  # zero false negatives, the Bloom guarantee


# ----------------------------------------------------------------- lm --

@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=2, max_size=30),
        min_size=1,
        max_size=20,
    )
)
def test_lm_scores_bounded_below(docs):
    from collections import Counter

    bigrams = [
        [(tk[i], tk[i + 1]) for i in range(len(tk) - 1)] for tk in docs
    ]
    c2 = Counter(b for bs in bigrams for b in bs)
    c1 = Counter()
    for (w1, _), k in c2.items():
        c1[w1] += k
    for bs in bigrams:
        total = sum((c1[b[0]] * PPM) // c2[b] for b in bs)
        avg = total // len(bs)
        assert avg >= PPM  # P(w2|w1) <= 1 for every bigram


def test_lm_fully_determined_corpus_scores_exactly_one():
    # one bigram, always followed the same way -> avg == exactly 1e6
    from collections import Counter

    bs = [("a", "b")] * 7
    c2 = Counter(bs)
    c1 = Counter({"a": 7})
    total = sum((c1[b[0]] * PPM) // c2[b] for b in bs)
    assert total // len(bs) == PPM
