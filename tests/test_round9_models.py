"""Round-9 semantics beyond oracle parity: hand-computed fixtures for
the Q21 sole-late rule and the streaming outer-join emission horizon,
plus hypothesis property tests of the quality classifier and Q13
distribution against pure-python models."""

from __future__ import annotations

import datetime as dt
import hashlib
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pse_stocks_etl_spark.plans.round9_queries import (
    LATE_SHIP_DAYS,
    QUALITY_CLF_THRESHOLD,
    customer_order_distribution,
    docs_quality_classifier,
    sole_late_supplier_orders,
    streaming_click_outer_join,
)


# ------------------------------------------------------------ fixtures --
def _write_orders_lineitem(path, orders, lineitems):
    """orders: [(orderkey, orderdate)]; lineitems: [(orderkey, suppkey,
    shipdate)] — minimal columns the Q4/Q21 analogs touch, padded to
    the testdata schema."""
    ok = [o[0] for o in orders]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "o_custkey": pa.array([1] * len(ok), pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(ok), pa.string()),
                "o_totalprice": pa.array([1.0] * len(ok), pa.float64()),
                "o_orderdate": pa.array(
                    [dt.datetime(2020, 1, 1) + dt.timedelta(days=o[1]) for o in orders],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(["3-MEDIUM"] * len(ok), pa.string()),
            }
        ),
        str(path / "orders.parquet"),
    )
    n = len(lineitems)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([li[0] for li in lineitems], pa.int64()),
                "l_partkey": pa.array([1] * n, pa.int64()),
                "l_suppkey": pa.array([li[1] for li in lineitems], pa.int64()),
                "l_linenumber": pa.array(range(1, n + 1), pa.int64()),
                "l_quantity": pa.array([1.0] * n, pa.float64()),
                "l_extendedprice": pa.array([1.0] * n, pa.float64()),
                "l_discount": pa.array([0.0] * n, pa.float64()),
                "l_tax": pa.array([0.0] * n, pa.float64()),
                "l_returnflag": pa.array(["N"] * n, pa.string()),
                "l_linestatus": pa.array(["O"] * n, pa.string()),
                "l_shipdate": pa.array(
                    [
                        dt.datetime(2020, 1, 1) + dt.timedelta(days=li[0 + 2])
                        for li in lineitems
                    ],
                    pa.timestamp("us"),
                ),
            }
        ),
        str(path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
                "s_nationkey": pa.array([0, 0, 0], pa.int64()),
                "s_acctbal": pa.array([0.0, 0.0, 0.0], pa.float64()),
            }
        ),
        str(path / "supplier.parquet"),
    )
    return str(path)


def _write_events(path, rows):
    """rows: [(event_id, user_id, event_type, hours_from_base)]."""
    base = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(hours=r[3]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
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
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["test"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
            }
        ),
        str(path / "documents.parquet"),
    )
    return str(path)


# ---------------------------------------------------- Q21 hand fixtures --
def test_q21_sole_late_multi_supplier(spark, tmp_path):
    """Order 1: suppliers 1 (late) and 2 (on time) -> supplier 1 counted.
    Order 2: suppliers 1 and 2 BOTH late -> nobody counted.
    Order 3: supplier 3 alone and late -> single-supplier, not counted.
    Order 4: supplier 2 late, supplier 3 on time -> supplier 2 counted."""
    d = _write_orders_lineitem(
        tmp_path,
        orders=[(1, 0), (2, 0), (3, 0), (4, 0)],
        lineitems=[
            (1, 1, LATE_SHIP_DAYS + 1),
            (1, 2, 1),
            (2, 1, LATE_SHIP_DAYS + 5),
            (2, 2, LATE_SHIP_DAYS + 5),
            (3, 3, LATE_SHIP_DAYS + 9),
            (4, 2, LATE_SHIP_DAYS + 2),
            (4, 3, 2),
        ],
    )
    rows = {
        (r.s_suppkey, r.numwait)
        for r in sole_late_supplier_orders(spark, d).collect()
    }
    assert rows == {(1, 1), (2, 1)}


def test_q21_boundary_day_not_late(spark, tmp_path):
    """Shipping exactly LATE_SHIP_DAYS after the order date is ON TIME
    (strict >): the boundary order must produce no culprit."""
    d = _write_orders_lineitem(
        tmp_path,
        orders=[(1, 0)],
        lineitems=[(1, 1, LATE_SHIP_DAYS), (1, 2, 0)],
    )
    assert sole_late_supplier_orders(spark, d).count() == 0


# ------------------------------------- streaming outer join: horizon --
def test_outer_join_emission_horizon(spark, tmp_path):
    """Unmatched clicks split by the watermark horizon: a click early in
    the stream (horizon passed) emits a NULL row; an unmatched click
    within (attribution window + delay) of the stream end stays
    buffered and does NOT emit. Matched pairs always emit."""
    # user 1: click at h0 matched by purchase at h2   -> pair row
    # user 2: click at h0, no purchase                -> NULL row (0+6h < wm)
    # user 3: click at h95, no purchase               -> buffered, absent
    # purchases at h2 (user 1) and h100 (user 4) set the purchase-side
    # max; watermark = min(95, 100) - 1h = 94h; user2: 0+6 < 94 emits,
    # user3: 95+6 > 94 buffered.
    d = _write_events(
        tmp_path,
        [
            (1, 1, "click", 0),
            (2, 1, "purchase", 2),
            (3, 2, "click", 0),
            (4, 3, "click", 95),
            (5, 4, "purchase", 100),
        ],
    )
    out = streaming_click_outer_join(spark, d).collect()
    by_click = {r.click_id: r for r in out}
    assert set(by_click) == {1, 3}
    assert by_click[1].purchase_id == 2
    assert by_click[3].purchase_id is None


# ------------------------------------------- classifier vs python model --
def _py_classifier(texts):
    out = {}
    for i, t in enumerate(texts, start=1):
        if t is None:
            continue
        # Spark's trim() (and DuckDB's) strips SPACES only — a trailing
        # tab survives and the \s+ split then yields a trailing empty
        # token; regex-split of "" also yields [""]. Mirror both.
        import re

        t2 = t.lower().strip(" ")
        toks = list(dict.fromkeys(re.split(r"\s+", t2)))
        ws = [
            (int(hashlib.md5(f"qw:{tok}".encode()).hexdigest()[:15], 16) % 1001) - 500
            for tok in toks
        ]
        if not ws:
            continue
        s = sum(ws)
        out[i] = (
            s / (1000.0 * len(ws)),
            1 if s > QUALITY_CLF_THRESHOLD * 1000 * len(ws) else 0,
        )
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.sampled_from("ab cd\tx"),
                max_size=40,
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_classifier_matches_python_model(spark, tmp_path_factory, texts):
    d = _write_docs(tmp_path_factory.mktemp("clf"), texts)
    got = {
        r.doc_id: (r.clf_score, r.keep)
        for r in docs_quality_classifier(spark, d).collect()
    }
    want = _py_classifier(texts)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k][0] - want[k][0]) < 1e-12
        assert got[k][1] == want[k][1]


# --------------------------------------------- Q13 vs python model --
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_orders_per_cust=st.lists(st.integers(min_value=0, max_value=4),
                               min_size=1, max_size=6)
)
def test_q13_distribution_matches_python_model(
    spark, tmp_path_factory, n_orders_per_cust
):
    path = tmp_path_factory.mktemp("q13")
    custkeys = list(range(1, len(n_orders_per_cust) + 1))
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(custkeys, pa.int64()),
                "c_name": pa.array([f"C{k}" for k in custkeys], pa.string()),
                "c_nationkey": pa.array([0] * len(custkeys), pa.int64()),
                "c_acctbal": pa.array([0.0] * len(custkeys), pa.float64()),
                "c_mktsegment": pa.array(["BUILDING"] * len(custkeys), pa.string()),
            }
        ),
        str(path / "customer.parquet"),
    )
    orders = []
    oid = 1
    for k, n in zip(custkeys, n_orders_per_cust):
        for _ in range(n):
            orders.append((oid, k))
            oid += 1
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(orders), pa.string()),
                "o_totalprice": pa.array([1.0] * len(orders), pa.float64()),
                "o_orderdate": pa.array(
                    [dt.datetime(2020, 1, 1)] * len(orders), pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["3-MEDIUM"] * len(orders), pa.string()),
            }
        ),
        str(path / "orders.parquet"),
    )
    got = {
        r.n_orders: r.custdist
        for r in customer_order_distribution(spark, str(path)).collect()
    }
    want = dict(Counter(n_orders_per_cust))
    assert got == want


# ------------------------------------------- overlap chunker invariants --
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_toks=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=5)
)
def test_overlap_chunks_invariants(spark, tmp_path_factory, n_toks):
    """Per doc: chunk starts advance by the stride; every token is
    covered; consecutive full chunks overlap by exactly W-S tokens; the
    md5 of each chunk equals the md5 of the corresponding token slice
    (python model)."""
    from pse_stocks_etl_spark.plans.round9_queries import (
        CHUNK_S,
        CHUNK_W,
        docs_overlap_chunks,
    )

    texts = [" ".join(f"t{i}_{j}" for j in range(n)) for i, n in enumerate(n_toks)]
    d = _write_docs(tmp_path_factory.mktemp("chunks"), texts)
    rows = docs_overlap_chunks(spark, d).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(1, len(n_toks) + 1))
    for doc_id, chunks in by_doc.items():
        toks = texts[doc_id - 1].split()
        chunks.sort(key=lambda r: r.chunk_idx)
        # starts advance by the stride from 0
        assert [c.start_tok for c in chunks] == [
            i * CHUNK_S for i in range(len(chunks))
        ]
        # full coverage: last chunk reaches the end
        last = chunks[-1]
        assert last.start_tok + last.chunk_len == len(toks)
        for c in chunks:
            assert c.chunk_len == min(CHUNK_W, len(toks) - c.start_tok)
            want = hashlib.md5(
                " ".join(toks[c.start_tok : c.start_tok + CHUNK_W]).encode()
            ).hexdigest()
            assert c.chunk_md5 == want
        # neighbor overlap is W-S tokens whenever the left chunk is full
        for a, b in zip(chunks, chunks[1:]):
            if a.chunk_len == CHUNK_W:
                assert a.start_tok + a.chunk_len - b.start_tok == CHUNK_W - CHUNK_S


# --------------------------------------------- per-source cap model --
def test_source_cap_skewed_matches_python_model(spark, tmp_path_factory):
    """Skewed fixture exercising BOTH plan paths (the uniform testdata
    only hits the hot-tail window): a 40-doc source goes through the
    row_number window, a 5-doc source through the broadcast fast path.
    Kept set must equal the python model of the same salted hash order,
    and the small source must keep everything."""
    import hashlib

    from pse_stocks_etl_spark.plans.round9_queries import (
        SOURCE_CAP_K,
        docs_source_cap,
    )

    n_big, n_small = 40, 5
    texts = [f"doc number {i}" for i in range(n_big + n_small)]
    path = tmp_path_factory.mktemp("srccap")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(
                    ["big"] * n_big + ["small"] * n_small, pa.string()
                ),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(path / "documents.parquet"),
    )
    rows = docs_source_cap(spark, str(path)).collect()
    assert len(rows) == n_big + n_small
    got_kept = {r.doc_id for r in rows if r.kept}

    def h(doc_id: int) -> int:
        return int(hashlib.md5(f"cap:{doc_id}".encode()).hexdigest()[:15], 16)

    big_ids = list(range(1, n_big + 1))
    small_ids = list(range(n_big + 1, n_big + n_small + 1))
    want_kept = set(sorted(big_ids, key=lambda i: (h(i), i))[:SOURCE_CAP_K])
    want_kept |= set(small_ids)  # below the cap: everything kept
    assert got_kept == want_kept
    assert sum(1 for r in rows if r.source == "big" and r.kept) == SOURCE_CAP_K
