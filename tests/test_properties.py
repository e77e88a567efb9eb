"""Property-based tests (hypothesis): the merge and dedup operators are
checked against a pure-python reference model on randomized inputs —
strictly stronger than the reference's golden-value tests (SURVEY.md §5)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pse_stocks_etl_spark.operators.dedup import argmax_dedup
from pse_stocks_etl_spark.operators.merge import merge_dataframes

ROW_SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("v", T.IntegerType(), False),
        T.StructField("fresh", T.IntegerType(), False),
    ]
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),   # key — small domain forces collisions
        st.integers(0, 99),  # value
        st.integers(0, 9),   # freshness
    ),
    max_size=12,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _unique_by_key(rows):
    out = {}
    for k, v, f in rows:
        out[k] = (k, v, f)
    return list(out.values())


@given(target=rows_strategy, source=rows_strategy)
@SETTINGS
def test_merge_matches_python_model(spark, target, source):
    target = _unique_by_key(target)
    source = _unique_by_key(source)
    tdf = spark.createDataFrame(target, ROW_SCHEMA)
    sdf = spark.createDataFrame(source, ROW_SCHEMA)
    got = sorted(
        map(tuple, merge_dataframes(tdf, sdf, ["k"], freshness_col="fresh").collect())
    )
    # model: source wins iff new key OR source.fresh >= target.fresh
    model = {k: row for row in target for k in [row[0]]}
    for row in source:
        k = row[0]
        if k not in model or row[2] >= model[k][2]:
            model[k] = row
    assert got == sorted(model.values())


@given(rows=rows_strategy)
@SETTINGS
def test_merge_is_idempotent(spark, rows):
    source = _unique_by_key(rows)
    tdf = spark.createDataFrame([], ROW_SCHEMA)
    sdf = spark.createDataFrame(source, ROW_SCHEMA)
    once = merge_dataframes(tdf, sdf, ["k"], freshness_col="fresh")
    twice = merge_dataframes(once, sdf, ["k"], freshness_col="fresh")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(target=rows_strategy, source=rows_strategy)
@SETTINGS
def test_merge_cdf_agrees_with_merge_result(spark, target, source):
    """The CDF view must be exactly the delta of the merge: target rows
    minus preimages plus postimages/inserts == merge_dataframes result,
    and every update key contributes one preimage and one postimage."""
    from pse_stocks_etl_spark.operators.merge import merge_cdf

    target = _unique_by_key(target)
    source = _unique_by_key(source)
    tdf = spark.createDataFrame(target, ROW_SCHEMA)
    sdf = spark.createDataFrame(source, ROW_SCHEMA)
    cdf = merge_cdf(tdf, sdf, ["k"], freshness_col="fresh").collect()
    pre = {r.k: (r.k, r.v, r.fresh) for r in cdf if r._change_type == "update_preimage"}
    post = {r.k: (r.k, r.v, r.fresh) for r in cdf if r._change_type == "update_postimage"}
    ins = {r.k: (r.k, r.v, r.fresh) for r in cdf if r._change_type == "insert"}
    assert set(pre) == set(post)  # paired before/after images
    assert not (set(ins) & {row[0] for row in target})  # inserts are new keys
    applied = {row[0]: row for row in target}
    applied.update(post)
    applied.update(ins)
    merged = sorted(
        map(tuple, merge_dataframes(tdf, sdf, ["k"], freshness_col="fresh").collect())
    )
    assert merged == sorted(applied.values())
    # preimages really are the target's current rows for those keys
    tmap = {row[0]: row for row in target}
    assert all(pre[k] == tmap[k] for k in pre)


@given(rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=15))
@SETTINGS
def test_argmax_dedup_picks_max_with_deterministic_tiebreak(spark, rows):
    df = spark.createDataFrame(rows, ROW_SCHEMA)
    got = {r.k: (r.v, r.fresh) for r in argmax_dedup(df, ["k"], "v", tiebreak=["fresh"]).collect()}
    # model: max v; among ties smallest fresh
    model = {}
    for k, v, f in rows:
        cur = model.get(k)
        if cur is None or (v, -f) > (cur[0], -cur[1]):
            model[k] = (v, f)
    assert got == model


pack_strategy = st.lists(
    st.tuples(
        st.integers(0, 999),      # doc_id
        st.integers(1, 60),       # token count (words in text)
        st.sampled_from(["a", "b", "c"]),  # source shard
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)


@given(docs=pack_strategy)
@SETTINGS
def test_pack_chunks_invariants(spark, tmp_path_factory, docs):
    """Packing invariants, independent of the SQL oracle: per source,
    token spans are contiguous and gap-free in doc_id order; chunk ids
    are exactly the integer spans the offsets dictate; every doc spans
    >= 1 chunk."""
    from pse_stocks_etl_spark.plans.corpus_queries import PACK_CAPACITY
    from pse_stocks_etl_spark.plans.registry import REGISTRY

    tmp = tmp_path_factory.mktemp("pack")
    df = spark.createDataFrame(
        [(i, "w " * n, "en", src, 2 * n) for i, n, src in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    rows = REGISTRY["docs_pack_chunks"].fn(spark, str(tmp)).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    n_by_id = {i: n for i, n, _ in docs}
    for src, rs in by_source.items():
        rs.sort(key=lambda r: r.doc_id)
        expect_off = 0
        for r in rs:
            assert r.n_tokens == n_by_id[r.doc_id]
            assert r.start_off == expect_off          # contiguous, gap-free
            assert r.first_chunk == r.start_off // PACK_CAPACITY
            assert r.last_chunk == (r.start_off + r.n_tokens - 1) // PACK_CAPACITY
            assert r.n_chunks == r.last_chunk - r.first_chunk + 1 >= 1
            expect_off += r.n_tokens
