"""Round-10 queries (the round-6 driver round's additions).

Store / incremental lane: `store_lifecycle_preview` (overwrite → merge
→ delete → RESTORE → VACUUM in one hash-checked lifecycle — restore
must survive the vacuuming of its own source version),
`emb_ann_ivfpq_increment` (crawl shard → frozen-centroid cells → K2
merge into the cell-partitioned index; untouched cells hardlink-carried,
inode-asserted), `scd2_customer_merge` (close + open in ONE
composite-key merge), `streaming_cdc_merge` (micro-batched change feed
→ per-epoch K2/K3 merge, tombstone deletes, batching-invariant),
`events_cdc_apply` (batch last-op-wins collapse), `store_version_diff`
(post-hoc added/removed/changed between versions via time travel),
`bucketed_colocated_join` (shuffle-free fact-fact join through
bucketed tables).

Analytics lane: TPC-H Q6 / Q9 / Q16 analogs, the top-N + 'Others' BI
rollup, exact tie-safe Mann-Whitney U / AUC (two-phase bucketed
ranks).

LLM-pipeline lane: BPE merge-pair induction, Heaps-law vocabulary
growth, DSIR-style hashed-n-gram target affinity, trending-term drift
detection, SemDeDup cluster-scoped semantic dedup, Matryoshka
prefix-dim recall, kNN label classification, the ANN recall
scoreboard (`emb_ann_recall_report`), and a WAV transcode round-trip
(`multimodal_wav_downsample`).

Reference parity: the reference's sync loop IS an incremental
maintain-a-table-under-merges engine (src/etl/postgres_sync.py — overwrite
dims, merge facts); the store-lane queries drive this engine's
versioned-store analog of that lifecycle, with the ANN index and the
SCD2 dimension as "just another incrementally-merged table".
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents, sql_cents
from ..sources.catalog import load_table
from ..store.parquet_table import ParquetTable
from .registry import register

# --------------------------------------------------------------------------
# Store lifecycle: overwrite -> merge -> delete -> restore -> vacuum
# --------------------------------------------------------------------------
# Deterministic slices of orders: the base table is every 4th key, the
# merge batch updates every 8th (price bumped, status 'U') and inserts
# the keys ≡ 1 (mod 4). All closed-form, so the final state after
# restore discards the delete is plain SQL.
_UPD_BUMP_CENTS = 100_000


def _sql_lifecycle() -> str:
    sel = f"o_orderkey, o_orderstatus AS status, {sql_cents('o_totalprice')} AS price_cents"
    return f"""
    WITH base AS (
      SELECT {sel} FROM orders WHERE o_orderkey % 4 = 0
    ),
    ins AS (
      SELECT {sel} FROM orders WHERE o_orderkey % 4 = 1
    ),
    upd AS (
      SELECT o_orderkey, 'U' AS status,
             price_cents + {_UPD_BUMP_CENTS} AS price_cents
      FROM base WHERE o_orderkey % 8 = 0
    ),
    final AS (
      SELECT * FROM upd
      UNION ALL SELECT * FROM ins
      UNION ALL SELECT * FROM base WHERE o_orderkey % 8 <> 0
    )
    SELECT o_orderkey, status, price_cents,
           4 AS final_version,
           2 AS n_versions_removed,
           2 AS n_versions_retained,
           CAST((SELECT COUNT(*) FROM final
                 WHERE status IS DISTINCT FROM 'F') AS BIGINT) AS n_after_delete
    FROM final
    """


@register(
    "store_lifecycle_preview",
    # The oracle is the state AFTER the merge (v2): the delete (v3) is
    # deliberately discarded by restore(2) (v4), and vacuum then
    # removes v1+v2 — so hash equality proves (a) restore recovers
    # deleted rows exactly, (b) vacuuming the restore's source version
    # does not lose the restored data, (c) the version counters land
    # where the state machine says. The delete itself is pinned by the
    # n_after_delete literal (counted between delete and restore;
    # closed form: final rows whose status isn't 'F', NULL-safe).
    oracle=_sql_lifecycle(),
    tags=("store", "K1", "K2", "K7", "K9", "restore", "vacuum"),
)
def store_lifecycle_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned store's destructive-op interplay in one lifecycle:
    overwrite(base) → merge(updates+inserts) → delete(status='F') →
    restore(v2) → vacuum(retain 2) → read, returning the surviving
    rows plus the lifecycle counters as literal columns
    (store/parquet_table.py:224,243,489,231,502; same closed-form
    expected-table technique as sync_end_to_end).

    Scale: every step is the store's normal path — the merge shuffles
    once on the key, delete/restore/vacuum are metadata + bounded
    rewrites of THIS table, never corpus scans. The literals embed
    driver-side ints (version counters, one count()) — all O(1)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        cents(F.col("o_totalprice")).alias("price_cents"),
    )
    base = o.filter(F.col("o_orderkey") % 4 == 0)
    ins = o.filter(F.col("o_orderkey") % 4 == 1)
    upd = base.filter(F.col("o_orderkey") % 8 == 0).select(
        "o_orderkey",
        F.lit("U").alias("status"),
        (F.col("price_cents") + _UPD_BUMP_CENTS).alias("price_cents"),
    )
    table = ParquetTable(
        spark, tempfile.mkdtemp(prefix="pse_lifecycle_"), o.schema
    )
    table.overwrite(base)  # v1
    table.merge(upd.unionByName(ins), keys=["o_orderkey"])  # v2
    table.delete(F.col("status") == "F")  # v3
    n_after_delete = table.read().count()
    table.restore(2)  # v4: the delete is discarded, data == v2
    removed = table.vacuum(retain_versions=2)  # drops v1 AND v2
    return table.read().select(
        "o_orderkey",
        "status",
        "price_cents",
        F.lit(table.current_version()).alias("final_version"),
        F.lit(len(removed)).alias("n_versions_removed"),
        F.lit(len(table.history())).alias("n_versions_retained"),
        F.lit(n_after_delete).cast("long").alias("n_after_delete"),
    )


# --------------------------------------------------------------------------
# Incremental IVF-PQ: merge a crawl shard into the cell-partitioned index
# --------------------------------------------------------------------------
# The "new crawl" shard: vec_id ≡ 3 (mod 16), excluding the frozen
# centroid vectors (a real index never re-ingests its own codebook).
NEW_CRAWL_MOD, NEW_CRAWL_REM = 16, 3


def _sql_ivfpq_increment() -> str:
    from .llm_queries import EMB_DIM, IVF_CENTROID_IDS, sql_cosine
    from .round8_queries import PQ_M, _pq_cte

    cos_c = sql_cosine("e.embedding", "c.cvec", EMB_DIM)
    cids = ", ".join(str(i) for i in IVF_CENTROID_IDS)
    code_cols = ", ".join(f"cv.c{m}" for m in range(PQ_M))
    return f"""
    WITH {_pq_cte()},
    cents AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      WHERE vec_id IN ({cids})
    ),
    assign AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_c} DESC, c.cid ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    )
    SELECT a.vec_id, a.cell, {code_cols}
    FROM assign a JOIN cv ON cv.vec_id = a.vec_id
    """


@register(
    "emb_ann_ivfpq_increment",
    # Oracle = the FROM-SCRATCH full index (no split anywhere in the
    # SQL): hash equality proves the incremental path — base build +
    # frozen-centroid assignment of the shard + K2 merge into the
    # cell-partitioned table — lands byte-identically where a full
    # rebuild would. The physical claim (untouched cells are hardlinks,
    # only the shard's cells rewritten) is asserted by
    # tests/test_round10.py on the version dirs' inodes.
    oracle=_sql_ivfpq_increment(),
    tags=("embedding", "ann-ivf-pq", "incremental", "store", "K2"),
)
def emb_ann_ivfpq_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF-PQ index maintenance — the ANN lane's
    crawl-increment story (mirrors docs_incremental_dedup): the base
    corpus is indexed once into a ParquetTable PARTITIONED BY cell
    (coarse quantizer cell = partition value); a new crawl shard is
    assigned to the SAME frozen centroids (ivf_assign_frame — the
    codebook never retrains per crawl) and K2-merged with
    keys=(cell, vec_id), which takes the store's partition-pruned fast
    path: only the shard's cells are re-merged and rewritten,
    every other cell directory is carried into the new version as
    hardlinks (store/parquet_table.py:364 — zero data movement).

    Scale: per-crawl cost is O(shard + touched cells), not O(index) —
    at 100 TB the index table is the thing you cannot afford to
    rewrite, and cell-partitioning makes the increment surgical. The
    serving path (emb_ann_ivfpq) then partition-prunes probes against
    the same layout."""
    from ..functions.vectors import to_double_array
    from .llm_queries import IVF_CENTROID_IDS
    from .round8_queries import PQ_M, _pq_code_frame
    from .round9_queries import ivf_assign_frame

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", to_double_array(F.col("embedding")).alias("v"))
    is_new = (F.col("vec_id") % NEW_CRAWL_MOD == NEW_CRAWL_REM) & ~F.col(
        "vec_id"
    ).isin(*IVF_CENTROID_IDS)
    codes = _pq_code_frame(emb).select(
        "vec_id", *[F.col(f"c{m}") for m in range(PQ_M)]
    )
    base_vecs = vecs.filter(~is_new)

    def index_rows(split) -> DataFrame:
        assign = ivf_assign_frame(vecs.filter(split), base_vecs)
        return assign.select(
            "vec_id", F.col("cell").cast("long").alias("cell")
        ).join(codes, "vec_id")

    base_idx = index_rows(~is_new)
    new_idx = index_rows(is_new)
    root = tempfile.mkdtemp(prefix="pse_ivfpq_incr_")
    table = ParquetTable(spark, root, base_idx.schema, partition_by=("cell",))
    table.overwrite(base_idx)  # v1: the standing index
    table.merge(new_idx, keys=["cell", "vec_id"])  # v2: the crawl increment
    # breadcrumbs for the physical hardlink guard (tests/test_round10.py)
    emb_ann_ivfpq_increment._last_table_path = root
    emb_ann_ivfpq_increment._last_new_cells = {
        r.cell for r in new_idx.select("cell").distinct().collect()
    }
    return table.read()


# --------------------------------------------------------------------------
# TPC-H Q6 analog: revenue delta inside a discount band
# --------------------------------------------------------------------------
@register(
    "discount_band_revenue",
    # rev10k = price_cents * disc_cents — the exact 1e4-scaled
    # "forecasted revenue increase" Q6 computes; integer comparisons on
    # cents keep the band edges engine-identical (a float BETWEEN on
    # 0.05..0.07 would hinge on double literals).
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM({sql_cents('l_extendedprice')} * {sql_cents('l_discount')})
                AS BIGINT) AS revenue10k
    FROM lineitem
    WHERE year(l_shipdate) = 1997
      AND {sql_cents('l_discount')} BETWEEN 5 AND 7
      AND {sql_cents('l_quantity')} < 2400
    """,
    tags=("tpch-q6", "A5", "scan-agg"),
)
def discount_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: how much revenue the discounts in the 5-7% band gave
    away on small-quantity 1997 lineitems — the canonical pure
    scan-aggregate. No joins, no windows: the three predicates and the
    two-column projection must all reach the parquet scan, and the
    aggregate is a map-side partial + one tiny exchange. At 100 TB
    this is the query whose cost IS the pushed-down scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.year("l_shipdate") == 1997)
            & cents(F.col("l_discount")).between(5, 7)
            & (cents(F.col("l_quantity")) < 2400)
        )
        .agg(
            F.count("*").alias("n_items"),
            F.sum(cents(F.col("l_extendedprice")) * cents(F.col("l_discount")))
            .alias("revenue10k"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q9 analog: profit by supplier nation and order year
# --------------------------------------------------------------------------
@register(
    "nation_year_profit",
    # profit10k: rev10k = price_cents*(100-disc_cents) (1e4-scaled
    # revenue) minus cost10k = retail_cents*qty_cents (also exactly
    # 1e4-scaled: 1e2·retail × 1e2·qty) — no division anywhere, the
    # whole measure stays BIGINT.
    oracle=f"""
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           CAST(SUM({sql_cents('li.l_extendedprice')}
                    * (100 - {sql_cents('li.l_discount')})
                    - {sql_cents('p.p_retailprice')}
                    * {sql_cents('li.l_quantity')}) AS BIGINT) AS profit10k
    FROM lineitem li
    JOIN part p ON p.p_partkey = li.l_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON s.s_suppkey = li.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = li.l_orderkey
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    tags=("tpch-q9", "J5", "star-join"),
    bench=True,
)
def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on 'red' product lines by the supplier's nation
    and the order year (the testdata has no partsupp, so supply cost is
    proxied by p_retailprice × quantity — the JOIN SHAPE, which is what
    Catalyst optimizes, is Q9's: one fact, four dimension hops, a LIKE
    filter that prunes the part side before it joins).

    Scale: nation (25 rows at any sf) carries the only explicit
    broadcast hint; part (pre-filtered by the pushed LIKE) and
    supplier scale with sf, so AQE sizes them at runtime — broadcast
    when they fit, shuffle when they don't (r7 VERDICT item 3). The
    lineitem-orders join shuffles on orderkey. The group-by runs on
    (nation, year) — 25x7 groups — map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = cents(F.col("l_extendedprice")) * (
        100 - cents(F.col("l_discount"))
    ) - cents(F.col("p_retailprice")) * cents(F.col("l_quantity"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).alias("profit10k"))
    )


# --------------------------------------------------------------------------
# BPE vocabulary induction: top merge-pair candidates
# --------------------------------------------------------------------------
BPE_TOP_PAIRS = 20


@register(
    "docs_bpe_top_merges",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    p AS (
      SELECT unnest(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS pair
      FROM w WHERE len(w) >= 2
    ),
    c AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY pair)
    SELECT pair, n,
           CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rank
    FROM c QUALIFY rank <= {BPE_TOP_PAIRS}
    """,
    tags=("llm", "tokenizer", "bpe"),
)
def docs_bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of BPE vocabulary induction: the corpus-wide counts of
    adjacent symbol pairs inside words — the quantity the BPE trainer
    maximizes at every merge step (Sennrich et al. 2016). The top pair
    IS the next merge; iterating this query with the merge applied is
    the whole trainer loop.

    Scale: explode(words) then explode(char pairs) is linear in corpus
    characters and map-side-combines into at most |alphabet|^2 pair
    groups before the one tiny exchange; the top-k window runs over
    that bounded aggregate, not the corpus. At 100 TB the cost is the
    scan plus one combiner aggregation — the shape a distributed BPE
    trainer (e.g. the HuggingFace tokenizers map-reduce recipe) uses
    per iteration."""
    from pyspark.sql import Window

    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    w = d.select(F.explode(tokens(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = w.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    win = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        counts.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= BPE_TOP_PAIRS)
    )


# --------------------------------------------------------------------------
# Heaps-law vocabulary growth across crawl batches
# --------------------------------------------------------------------------
VOCAB_BATCHES = 10


@register(
    "docs_vocab_growth",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id % {VOCAB_BATCHES} AS batch,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    f AS (
      SELECT w, MIN(batch) AS batch FROM tok WHERE len(w) > 0 GROUP BY w
    ),
    g AS (SELECT batch, CAST(COUNT(*) AS BIGINT) AS new_tokens FROM f GROUP BY batch)
    SELECT batch, new_tokens,
           CAST(SUM(new_tokens) OVER (ORDER BY batch
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_vocab
    FROM g
    """,
    tags=("llm", "vocab", "heaps-law"),
)
def docs_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: how many NEW distinct tokens each
    crawl batch contributes, and the cumulative vocabulary after it —
    the curve that tells a data pipeline when more crawl stops buying
    vocabulary coverage.

    Scale: the naive form (distinct over every cumulative prefix)
    re-scans the corpus B times; this plan computes each token's FIRST
    batch (one groupBy on token — the single corpus-sized exchange,
    map-side combined) and then counts first-appearances per batch;
    the cumulative window runs over B rows. Incremental crawls extend
    it by min-merging new tokens' first-batch, never re-scanning."""
    from pyspark.sql import Window

    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select(
        (F.col("doc_id") % VOCAB_BATCHES).alias("batch"),
        F.explode(tokens(F.col("text"))).alias("w"),
    ).filter(F.length("w") > 0)
    first = tok.groupBy("w").agg(F.min("batch").alias("batch"))
    growth = first.groupBy("batch").agg(F.count("*").alias("new_tokens"))
    win = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, 0)
    return growth.select(
        "batch",
        "new_tokens",
        F.sum("new_tokens").over(win).alias("cum_vocab"),
    )


# --------------------------------------------------------------------------
# Matryoshka embedding evaluation: prefix-dim recall against full-dim
# --------------------------------------------------------------------------
MRL_PREFIX_DIM = 16
MRL_TOPK = 10


def _sql_matryoshka() -> str:
    # Compile-footprint-bounded (functions/vectors.py): the full-dim and
    # prefix-dim norms come from two shared CTEs, each pair cosine
    # expands its dot once in an inner projection and is ranked by
    # alias — 4 dot expansions instead of 6.
    from ..functions.vectors import sql_cosine_prenorm, sql_norms_cte
    from .llm_queries import _Q_IDS, EMB_DIM

    full = sql_cosine_prenorm(
        "e.embedding", "q.embedding", "ne.nrm", "nq.nrm", EMB_DIM
    )
    pre = sql_cosine_prenorm(
        "e.embedding", "q.embedding", "ne.nrm", "nq.nrm", MRL_PREFIX_DIM
    )
    topk = """
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, vec_id ASC) AS rn
        FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS vec_id, {cos} AS cs
          FROM embeddings e
          CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                      WHERE vec_id IN ({qids})) q
          JOIN {norms} ne ON ne.vec_id = e.vec_id
          JOIN {norms} nq ON nq.vec_id = q.vec_id
          WHERE e.vec_id <> q.vec_id
        )
      ) WHERE rn <= {k}
    """
    tf_sql = topk.format(cos=full, qids=_Q_IDS, k=MRL_TOPK, norms="vnorms")
    tp_sql = topk.format(cos=pre, qids=_Q_IDS, k=MRL_TOPK, norms="pnorms")
    return f"""
    WITH {sql_norms_cte(EMB_DIM)},
    {sql_norms_cte(MRL_PREFIX_DIM, name="pnorms")},
    tf AS ({tf_sql}),
    tp AS ({tp_sql}),
    hits AS (
      SELECT tf.query_id, CAST(COUNT(tp.vec_id) AS BIGINT) AS n_overlap
      FROM tf LEFT JOIN tp
        ON tp.query_id = tf.query_id AND tp.vec_id = tf.vec_id
      GROUP BY tf.query_id
    )
    SELECT query_id, n_overlap,
           n_overlap * 1.0 / {MRL_TOPK} AS recall_at_{MRL_TOPK}
    FROM hits
    """


@register(
    "emb_matryoshka_recall",
    oracle=_sql_matryoshka(),
    tags=("embedding", "similarity", "matryoshka", "evaluation"),
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation evaluation (Kusupati et al. 2022): for
    each query, the top-k neighbor set under the TRUNCATED
    {MRL_PREFIX_DIM}-dim prefix cosine versus under the full embedding,
    reported as recall@k — the number every MRL deployment needs before
    it serves the cheap prefix instead of the full vector.

    Scale: one corpus scan computes BOTH cosines against the broadcast
    query rows (the 16-dim prefix reuses the same scanned array — no
    second read), and the two top-k windows partition by query. The
    brute-force scan is the evaluation harness (ground truth requires
    it); production serving uses the IVF/PQ lane. Recall is one IEEE
    division of exact integers."""
    from ..functions.vectors import cosine
    from ..operators.dedup import topk_per_group
    from .llm_queries import ANN_QUERY_IDS

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = base.filter(F.col("vec_id").isin(*ANN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine(F.col("v"), F.col("qv")).alias("cos_full"),
            cosine(
                F.slice(F.col("v"), 1, MRL_PREFIX_DIM),
                F.slice(F.col("qv"), 1, MRL_PREFIX_DIM),
            ).alias("cos_pre"),
        )
    )
    tf = topk_per_group(
        pairs, ["query_id"], [F.col("cos_full").desc(), F.col("vec_id").asc()],
        k=MRL_TOPK,
    ).select("query_id", "vec_id")
    tp = topk_per_group(
        pairs, ["query_id"], [F.col("cos_pre").desc(), F.col("vec_id").asc()],
        k=MRL_TOPK,
    ).select("query_id", F.col("vec_id").alias("pre_vec"))
    hits = (
        tf.join(
            tp,
            (tf.query_id == tp.query_id) & (tf.vec_id == tp.pre_vec),
            "left",
        )
        .groupBy(tf.query_id)
        .agg(F.count("pre_vec").alias("n_overlap"))
    )
    return hits.select(
        "query_id",
        "n_overlap",
        (F.col("n_overlap") * 1.0 / MRL_TOPK).alias(f"recall_at_{MRL_TOPK}"),
    )


# --------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) test: click vs purchase values, exact
# --------------------------------------------------------------------------
@register(
    "value_mannwhitney_u",
    # Tie-safe integer ranks: 2x the average rank of value v is
    # 2*(#values below v) + (#rows at v) + 1 — an exact BIGINT — so the
    # rank sum R1 and U statistic stay integer with any tie structure.
    # AUC = U / (n1*n2) is the one IEEE division.
    oracle="""
    WITH ev AS (
      SELECT event_type = 'click' AS is_click, value FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    ),
    v AS (
      SELECT value,
             CAST(COUNT(*) FILTER (WHERE is_click) AS BIGINT) AS n1_v,
             CAST(COUNT(*) AS BIGINT) AS n_v
      FROM ev GROUP BY value
    ),
    r AS (
      SELECT n1_v, n_v,
             CAST(2 * COALESCE(SUM(n_v) OVER (ORDER BY value
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + n_v + 1 AS BIGINT) AS avgrank2x
      FROM v
    ),
    s AS (
      SELECT CAST(SUM(n1_v) AS BIGINT) AS n1,
             CAST(SUM(n_v - n1_v) AS BIGINT) AS n2,
             CAST(SUM(n1_v * avgrank2x) AS BIGINT) AS r1_2x
      FROM r
    )
    SELECT n1 AS n_click, n2 AS n_purchase,
           CAST(r1_2x - n1 * (n1 + 1) AS BIGINT) AS u_click_2x,
           (r1_2x - n1 * (n1 + 1)) * 1.0 / (2 * n1 * n2) AS auc_click
    FROM s
    """,
    tags=("robust-stats", "rank-test", "two-phase"),
)
def value_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing click vs purchase
    event values — the nonparametric two-sample test the KS query
    complements: U is ALSO n1*n2*AUC, so the auc_click column is
    exactly P(click value > purchase value) + 0.5*P(tie), the
    effect-size a dashboard wants.

    Scale: ranks come from the two-phase pattern (docs_global_index),
    not a global sort: group by value (the corpus-sized exchange,
    map-side combined to distinct values), bucket by floor(value),
    prefix-sum the tiny bucket table, then cumulative-rank WITHIN
    buckets. 2x-average-ranks keep every intermediate a BIGINT under
    arbitrary ties."""
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin("click", "purchase")
            & F.col("value").isNotNull()
        )
        .select((F.col("event_type") == "click").alias("is_click"), "value")
    )
    v = ev.groupBy("value").agg(
        F.sum(F.when(F.col("is_click"), 1).otherwise(0))
        .cast("long")
        .alias("n1_v"),
        F.count("*").alias("n_v"),
    )
    b = v.withColumn("bucket", F.floor("value"))
    counts = b.groupBy("bucket").agg(F.sum("n_v").alias("cnt"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("cnt").over(wb), F.lit(0)).alias("off")
    )
    win = Window.partitionBy("bucket").orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = (
        b.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "avgrank2x",
            2 * (F.col("off") + F.coalesce(F.sum("n_v").over(win), F.lit(0)))
            + F.col("n_v")
            + 1,
        )
    )
    s = r.agg(
        F.sum("n1_v").alias("n1"),
        F.sum(F.col("n_v") - F.col("n1_v")).alias("n2"),
        F.sum(F.col("n1_v") * F.col("avgrank2x")).alias("r1_2x"),
    )
    u = F.col("r1_2x") - F.col("n1") * (F.col("n1") + 1)
    return s.select(
        F.col("n1").alias("n_click"),
        F.col("n2").alias("n_purchase"),
        u.cast("long").alias("u_click_2x"),
        (u * 1.0 / (2 * F.col("n1") * F.col("n2"))).alias("auc_click"),
    )


# --------------------------------------------------------------------------
# Bucketed co-located join: the shuffle-free fact-fact join
# --------------------------------------------------------------------------
BUCKETED_N = 8


@register(
    "bucketed_colocated_join",
    oracle=f"""
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({sql_cents('li.l_quantity')}) AS BIGINT) AS qty_cents,
           CAST(SUM({sql_cents('li.l_extendedprice')}) AS BIGINT) AS price_cents
    FROM lineitem li JOIN orders o ON o.o_orderkey = li.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("J5", "bucketing", "shuffle-free"),
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB fact-fact join done right: both tables written
    BUCKETED on the join key (bucketBy {BUCKETED_N}, sortBy key), then
    joined bucket-to-bucket with ZERO join-side exchange — Spark's
    declarative co-location (the plan guard in tests/test_round10.py
    asserts exactly one Exchange, the final tiny aggregate's).

    Scale: on a real warehouse the write happens once at ingest and
    every subsequent orderkey join is shuffle-free; this query pays
    the write to PROVE the join side (oracle = the plain join, so
    bucketing provably changes bytes moved, never the relation).
    Fixed table names + overwrite keep repeated runs idempotent."""
    import shutil

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        cents(F.col("l_quantity")).alias("qty_cents"),
        cents(F.col("l_extendedprice")).alias("price_cents"),
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    # Cross-session idempotency: mode("overwrite") only replaces tables
    # the CURRENT catalog knows. A fresh session with a leftover
    # warehouse dir from a previous run hits LOCATION_ALREADY_EXISTS —
    # so drop both the catalog entry AND any orphaned location first.
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for name in ("bucketed_lineitem_q", "bucketed_orders_q"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
    (
        li.write.bucketBy(BUCKETED_N, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable("bucketed_lineitem_q")
    )
    (
        o.write.bucketBy(BUCKETED_N, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable("bucketed_orders_q")
    )
    lb = spark.table("bucketed_lineitem_q")
    ob = spark.table("bucketed_orders_q")
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("qty_cents").alias("qty_cents"),
            F.sum("price_cents").alias("price_cents"),
        )
    )


# --------------------------------------------------------------------------
# SemDeDup: semantic deduplication inside coarse embedding clusters
# --------------------------------------------------------------------------
SEMDEDUP_TAU = 0.35  # calibrated to the synthetic corpus (max pair cos ~0.51)


def _sql_semdedup() -> str:
    # Compile-footprint-bounded (functions/vectors.py): centroid cosine
    # computed ONCE in an inner projection against the shared vnorms
    # CTE, the NOT EXISTS rewritten as a dup-set anti-join whose pair
    # cosine also expands once — 3 dot expansions instead of 6.
    from ..functions.vectors import sql_cosine_prenorm, sql_norms_cte
    from .llm_queries import EMB_DIM, IVF_CENTROID_IDS

    cos_c = sql_cosine_prenorm("e.embedding", "c.cvec", "n.nrm", "c.cnrm", EMB_DIM)
    cos_p = sql_cosine_prenorm(
        "ea.embedding", "eb.embedding", "na.nrm", "nb.nrm", EMB_DIM
    )
    cids = ", ".join(str(i) for i in IVF_CENTROID_IDS)
    return f"""
    WITH {sql_norms_cte(EMB_DIM)},
    cents AS (
      SELECT e.vec_id AS cid, e.embedding AS cvec, v.nrm AS cnrm
      FROM embeddings e JOIN vnorms v ON v.vec_id = e.vec_id
      WHERE e.vec_id IN ({cids})
    ),
    assign AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cid ASC) AS rn
        FROM (
          SELECT e.vec_id, c.cid, {cos_c} AS ccos
          FROM embeddings e
          JOIN vnorms n ON n.vec_id = e.vec_id
          CROSS JOIN cents c
        )
      ) WHERE rn = 1
    ),
    dup AS (
      SELECT DISTINCT a_id FROM (
        SELECT a.vec_id AS a_id, {cos_p} AS pcos
        FROM assign a
        JOIN assign b ON b.cell = a.cell AND b.vec_id < a.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
        JOIN vnorms na ON na.vec_id = a.vec_id
        JOIN vnorms nb ON nb.vec_id = b.vec_id
      ) WHERE pcos >= {SEMDEDUP_TAU}
    )
    SELECT a.vec_id, a.cell, (d.a_id IS NULL) AS kept
    FROM assign a LEFT JOIN dup d ON d.a_id = a.vec_id
    """


@register(
    "emb_semdedup",
    oracle=_sql_semdedup(),
    tags=("embedding", "dedup", "semdedup"),
)
def emb_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal
    scoped to coarse embedding clusters — a vector is dropped when a
    SMALLER-id vector in the SAME cluster has cosine ≥ τ (deterministic
    keep-smallest-id survivor; the pairwise rule, stated as such — the
    paper's centroid-distance tiebreak swaps in trivially).

    Scale: this is the SemDeDup design point — the quadratic pair
    search runs per-CLUSTER, never per-corpus: O(Σ |cell|²) total.
    The linear regime REQUIRES cluster count ∝ corpus size (constant
    per-cell population); the 16 frozen IVF cells here are the
    oracle-bounded fixture, and the ×8 stress (SCALE.md) shows the
    12.7× wall you get when cell count is NOT scaled — the documented
    SemDeDup misconfiguration mode. A production corpus uses ~100k
    k-means cells with this identical plan shape (equi-join on cell,
    cosine residual). The anti-join emits every vector exactly once
    with its verdict."""
    from ..functions.vectors import cosine
    from .round9_queries import ivf_assign_frame

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    assign = ivf_assign_frame(vecs, vecs).join(vecs, "vec_id")
    a = assign.select(
        F.col("vec_id").alias("a_id"),
        F.col("cell").cast("long").alias("cell"),
        F.col("v").alias("a_v"),
    )
    b = assign.select(
        F.col("vec_id").alias("b_id"),
        F.col("cell").cast("long").alias("cell"),
        F.col("v").alias("b_v"),
    )
    dup = (
        a.join(b, "cell")
        .filter(
            (F.col("b_id") < F.col("a_id"))
            & (cosine(F.col("a_v"), F.col("b_v")) >= SEMDEDUP_TAU)
        )
        .select("a_id")
        .distinct()
    )
    out = assign.select("vec_id", F.col("cell").cast("long").alias("cell")).join(
        dup.withColumnRenamed("a_id", "vec_id").withColumn("dup", F.lit(True)),
        "vec_id",
        "left",
    )
    return out.select(
        "vec_id", "cell", F.coalesce(~F.col("dup"), F.lit(True)).alias("kept")
    )


# --------------------------------------------------------------------------
# SCD2 dimension maintenance THROUGH the versioned store
# --------------------------------------------------------------------------
SCD2_D0, SCD2_D1 = "1995-01-01", "1997-06-01"
SCD2_BUMP_CENTS = 100_000


@register(
    "scd2_customer_merge",
    # Closed form: every customer has its D0 row (closed iff key%5=0);
    # the changed fifth additionally has an open D1 row with the bumped
    # balance. The engine reaches this state through the store's K2
    # merge on the composite (key, valid_from): the close is an UPDATE
    # of the (key, D0) row, the new version an INSERT of (key, D1).
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, c_name, {sql_cents('c_acctbal')} AS acctbal_cents
      FROM customer
    )
    SELECT c_custkey, c_name, acctbal_cents,
           DATE '{SCD2_D0}' AS valid_from,
           CASE WHEN c_custkey % 5 = 0 THEN DATE '{SCD2_D1}' END AS valid_to,
           c_custkey % 5 <> 0 AS is_current
    FROM c
    UNION ALL
    SELECT c_custkey, c_name, acctbal_cents + {SCD2_BUMP_CENTS},
           DATE '{SCD2_D1}', CAST(NULL AS DATE), true
    FROM c WHERE c_custkey % 5 = 0
    """,
    tags=("store", "K2", "scd2", "dimension"),
)
def scd2_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 maintenance through the
    versioned store: load the customer dimension as current rows
    (valid_from D0, open-ended), then apply a change batch (every 5th
    customer's balance bumped at D1) the SCD2 way — CLOSE the standing
    row (valid_to=D1, is_current=false) and INSERT the new version —
    in ONE K2 merge keyed on (c_custkey, valid_from): the close
    updates (key, D0), the insert creates (key, D1).

    Scale: the merge shuffles once on the composite key; the change
    batch bounds the work (closed rows are derived FROM the batch by a
    semi-join, not a table scan — here expressed as the key filter).
    This is the reference sync loop's dimension-overwrite upgraded to
    history-preserving form (reference src/etl/postgres_sync.py companies
    table; SURVEY §2.2 K2)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        cents(F.col("c_acctbal")).alias("acctbal_cents"),
    )
    init = c.select(
        "*",
        F.lit(SCD2_D0).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    table = ParquetTable(
        spark, tempfile.mkdtemp(prefix="pse_scd2_"), init.schema
    )
    table.overwrite(init)
    changed = table.read().filter(F.col("c_custkey") % 5 == 0)
    closed = changed.withColumn(
        "valid_to", F.lit(SCD2_D1).cast("date")
    ).withColumn("is_current", F.lit(False))
    opened = changed.select(
        "c_custkey",
        "c_name",
        (F.col("acctbal_cents") + SCD2_BUMP_CENTS).alias("acctbal_cents"),
        F.lit(SCD2_D1).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    table.merge(closed.unionByName(opened), keys=["c_custkey", "valid_from"])
    return table.read()


# --------------------------------------------------------------------------
# DSIR-style hashed-n-gram target affinity
# --------------------------------------------------------------------------
DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


def _sql_dsir() -> str:
    from ..functions.text import sql_portable_hash64, sql_tokens

    h = sql_portable_hash64("'dsir:' || t")
    return f"""
    WITH tok AS (
      SELECT doc_id, lang, {h} % {DSIR_BUCKETS} AS b
      FROM (SELECT doc_id, lang, unnest({sql_tokens('text')}) AS t
            FROM documents WHERE text IS NOT NULL)
      WHERE len(t) > 0
    ),
    bc AS (
      SELECT b,
             CAST(COUNT(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS BIGINT)
               AS n_target,
             CAST(COUNT(*) AS BIGINT) AS n_raw
      FROM tok GROUP BY b
    ),
    per_doc AS (
      SELECT tok.doc_id,
             CAST(SUM(bc.n_target) AS BIGINT) AS target_mass,
             CAST(SUM(bc.n_raw) AS BIGINT) AS raw_mass
      FROM tok JOIN bc USING (b)
      GROUP BY tok.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.target_mass, 0) AS target_mass,
           COALESCE(p.raw_mass, 0) AS raw_mass,
           p.target_mass * 1.0 / p.raw_mass AS affinity
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


@register(
    "docs_dsir_affinity",
    oracle=_sql_dsir(),
    tags=("llm", "data-selection", "dsir"),
)
def docs_dsir_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-inspired data selection (Xie et al. 2023): score every
    document's affinity to a target distribution using hashed-n-gram
    bucket statistics — here unigram buckets (portable 60-bit hash mod
    {DSIR_BUCKETS}), target = '{DSIR_TARGET_LANG}' documents, and the
    per-doc score is Σ n_target(bucket) / Σ n_raw(bucket) over the
    doc's tokens: one IEEE division of two exact BIGINT masses (the
    paper's log-likelihood-ratio sum needs ln(), which is not
    bit-portable across engines; the mass ratio ranks comparably and
    stays hash-exact).

    Scale: the bucket table is {DSIR_BUCKETS} rows — broadcast — so
    scoring is scan + explode + broadcast join + one doc_id-keyed
    aggregate; the corpus shuffles once. Empty/NULL-text docs keep a
    row with zero masses and NULL affinity on both engines."""
    from ..functions.text import portable_hash64, tokens

    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "lang",
            F.explode(tokens(F.col("text"))).alias("t"),
        )
        .filter(F.length("t") > 0)
        .select(
            "doc_id",
            "lang",
            (portable_hash64(F.concat(F.lit("dsir:"), F.col("t"))) % DSIR_BUCKETS)
            .alias("b"),
        )
    )
    bc = tok.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0))
        .cast("long")
        .alias("n_target"),
        F.count("*").alias("n_raw"),
    )
    per_doc = (
        tok.join(F.broadcast(bc), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("n_target").alias("target_mass"),
            F.sum("n_raw").alias("raw_mass"),
        )
    )
    return d.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("target_mass", F.lit(0)).alias("target_mass"),
        F.coalesce("raw_mass", F.lit(0)).alias("raw_mass"),
        (F.col("target_mass") * 1.0 / F.col("raw_mass")).alias("affinity"),
    )


# --------------------------------------------------------------------------
# Trending terms: last crawl batch vs the standing corpus
# --------------------------------------------------------------------------
TREND_TOP = 15
TREND_NEW_BATCH = 9  # doc_id % 10 == 9 is "the newest crawl"


@register(
    "docs_trending_terms",
    # Laplace-smoothed rate ratio kept exact: (n_new+1)*9 and
    # (n_prev+9) are BIGINTs; the trend score is their single IEEE
    # division (the 9 balances the 9:1 batch-count asymmetry). The
    # top-k window runs over the aggregated vocabulary.
    oracle=f"""
    WITH tok AS (
      SELECT doc_id % 10 = {TREND_NEW_BATCH} AS is_new,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
      FROM documents WHERE text IS NOT NULL
    ),
    c AS (
      SELECT t AS term,
             CAST(COUNT(*) FILTER (WHERE is_new) AS BIGINT) AS n_new,
             CAST(COUNT(*) FILTER (WHERE NOT is_new) AS BIGINT) AS n_prev
      FROM tok WHERE len(t) > 0 GROUP BY t
    )
    SELECT term, n_new, n_prev,
           (n_new + 1) * 9.0 / (n_prev + 9) AS trend,
           CAST(row_number() OVER (ORDER BY (n_new + 1) * 9.0 / (n_prev + 9) DESC,
                                   term ASC) AS BIGINT) AS rank
    FROM c QUALIFY rank <= {TREND_TOP}
    """,
    tags=("llm", "trend", "drift-detection"),
)
def docs_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift detection: terms whose rate in the NEWEST crawl
    batch most exceeds their rate in the standing corpus (Laplace-
    smoothed rate ratio — a new crawl suddenly full of one token is how
    SEO spam, outages and genuine topic shifts all first show up).

    Scale: one token explode + one combiner-friendly vocabulary
    aggregate (the corpus-sized exchange); the ranking window runs
    over vocabulary-sized data. The smoothing keeps never-seen terms
    finite and the score a single IEEE division of exact integers."""
    from pyspark.sql import Window

    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select(
        (F.col("doc_id") % 10 == TREND_NEW_BATCH).alias("is_new"),
        F.explode(tokens(F.col("text"))).alias("t"),
    ).filter(F.length("t") > 0)
    c = tok.groupBy(F.col("t").alias("term")).agg(
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).cast("long").alias("n_new"),
        F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).cast("long").alias("n_prev"),
    )
    trend = (F.col("n_new") + 1) * 9.0 / (F.col("n_prev") + 9)
    win = Window.orderBy(trend.desc(), F.col("term").asc())
    return (
        c.select("term", "n_new", "n_prev", trend.alias("trend"))
        .withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= TREND_TOP)
    )


# --------------------------------------------------------------------------
# CDC apply: reconstruct current state from a change log
# --------------------------------------------------------------------------
@register(
    "events_cdc_apply",
    # The change log is derived deterministically from events:
    # purchase = upsert(value), error = delete, everything else is not
    # a data-change op. Last op per key wins under the total order
    # (ts, event_id); a key whose last op is a delete has NO row in the
    # reconstructed state — the Debezium/Delta "apply changes" contract.
    oracle="""
    WITH log AS (
      SELECT user_id, ts, event_id, value,
             event_type = 'purchase' AS is_upsert
      FROM events
      WHERE event_type IN ('purchase', 'error') AND ts IS NOT NULL
    ),
    last AS (
      SELECT user_id, ts, event_id, value, is_upsert,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_ops,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM log
    )
    SELECT user_id, value, ts AS applied_ts, n_ops
    FROM last WHERE rn = 1 AND is_upsert
    """,
    tags=("cdc", "A2", "state-reconstruction"),
)
def events_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY CHANGES: collapse an ordered change log (upserts +
    deletes per key) into the current state — the operator every
    replication pipeline runs between the log and the serving table.
    Purchases upsert the user's value, errors delete the key; the last
    op under the total order (ts, event_id) decides, and keys ending
    on a delete vanish.

    Scale: exactly the argmax-dedup shape (A2 — the engine's core
    flagship pattern): one shuffle on user_id, WindowGroupLimit prunes
    to each key's tail before the full sort materializes. The op count
    rides the same window. Idempotent under replay by construction
    (same log → same state)."""
    from pyspark.sql import Window

    log = (
        load_table(spark, sf_dir, "events")
        # an op without a timestamp cannot be ordered — excluded on
        # both engines (the CDC total order is (ts, event_id))
        .filter(F.col("event_type").isin("purchase", "error")
                & F.col("ts").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            "value",
            (F.col("event_type") == "purchase").alias("is_upsert"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id")
    last = log.withColumn("n_ops", F.count("*").over(wc)).withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        last.filter((F.col("rn") == 1) & F.col("is_upsert"))
        .select("user_id", "value", F.col("ts").alias("applied_ts"), "n_ops")
    )


# --------------------------------------------------------------------------
# BI staple: top-N categories + 'Others' rollup
# --------------------------------------------------------------------------
BRAND_TOP_N = 5


@register(
    "brand_share_with_others",
    oracle=f"""
    WITH rev AS (
      SELECT p.p_brand AS brand,
             CAST(SUM({sql_cents('li.l_extendedprice')}) AS BIGINT) AS revenue_cents
      FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey
      GROUP BY p.p_brand
    ),
    ranked AS (
      SELECT brand, revenue_cents,
             row_number() OVER (ORDER BY revenue_cents DESC, brand ASC) AS rn
      FROM rev
    ),
    rolled AS (
      SELECT CASE WHEN rn <= {BRAND_TOP_N} THEN brand ELSE 'Others' END AS brand,
             CAST(SUM(revenue_cents) AS BIGINT) AS revenue_cents
      FROM ranked GROUP BY 1
    )
    SELECT brand, revenue_cents,
           revenue_cents * 1.0 / (SELECT SUM(revenue_cents) FROM rolled) AS share
    FROM rolled
    """,
    tags=("bi", "topn-others", "rollup"),
)
def brand_share_with_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BI staple every dashboard needs and SQL makes awkward:
    revenue by brand, top {BRAND_TOP_N} brands kept, the long tail
    rolled into 'Others', each with its share of total.

    Scale: the fact table aggregates FIRST (one shuffle, map-side
    combine, output = |brands| rows); ranking, the Others rollup and
    the share division all run on that bounded aggregate. Share is one
    IEEE division of exact BIGINT cents (the total enters via a
    broadcast 1-row aggregate, not a second scan)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(cents(F.col("l_extendedprice"))).alias("revenue_cents"))
    )
    win = Window.orderBy(F.col("revenue_cents").desc(), F.col("brand").asc())
    rolled = (
        rev.withColumn("rn", F.row_number().over(win))
        .select(
            F.when(F.col("rn") <= BRAND_TOP_N, F.col("brand"))
            .otherwise(F.lit("Others"))
            .alias("brand"),
            "revenue_cents",
        )
        .groupBy("brand")
        .agg(F.sum("revenue_cents").alias("revenue_cents"))
    )
    total = rolled.agg(F.sum("revenue_cents").alias("total"))
    return (
        rolled.crossJoin(F.broadcast(total))
        .select(
            "brand",
            "revenue_cents",
            (F.col("revenue_cents") * 1.0 / F.col("total")).alias("share"),
        )
    )


# --------------------------------------------------------------------------
# kNN classification over the embedding corpus
# --------------------------------------------------------------------------
KNN_K = 15
KNN_HELDOUT_MOD = 25  # vec_id % 25 == 0 is the held-out evaluation set


def _sql_knn() -> str:
    from ..functions.vectors import sql_cosine
    from .llm_queries import EMB_DIM

    cos = sql_cosine("t.embedding", "q.embedding", EMB_DIM)
    return f"""
    WITH q AS (
      SELECT vec_id, embedding, label FROM embeddings
      WHERE vec_id % {KNN_HELDOUT_MOD} = 0
    ),
    t AS (
      SELECT vec_id, embedding, label FROM embeddings
      WHERE vec_id % {KNN_HELDOUT_MOD} <> 0
    ),
    nn AS (
      SELECT query_id, label FROM (
        SELECT q.vec_id AS query_id, t.label,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos} DESC, t.vec_id ASC) AS rn
        FROM t CROSS JOIN q
      ) WHERE rn <= {KNN_K}
    ),
    votes AS (
      SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS n_votes
      FROM nn GROUP BY query_id, label
    ),
    pred AS (
      SELECT query_id, label AS predicted, n_votes FROM (
        SELECT query_id, label, n_votes,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY n_votes DESC, label ASC) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT p.query_id, p.predicted, p.n_votes,
           q.label AS actual, p.predicted = q.label AS correct
    FROM pred p JOIN q ON q.vec_id = p.query_id
    """


@register(
    "emb_knn_classify",
    oracle=_sql_knn(),
    tags=("embedding", "knn", "classification"),
)
def emb_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label prediction over the embedding corpus: each held-out
    vector (vec_id % {KNN_HELDOUT_MOD} = 0) gets the majority label of
    its {KNN_K} nearest labeled neighbors (cosine; deterministic
    (votes DESC, label ASC) tie-break), with the verdict against the
    true label — the evaluation loop behind every embedding-space
    classifier and auto-labeling pipeline.

    Scale: the held-out side broadcasts (bounded evaluation batch);
    one corpus scan scores all queries, the per-query top-k window
    prunes via WindowGroupLimit, and voting runs on k×|queries| rows.
    Production swaps the brute-force scan for the IVF-PQ lane —
    exactly the emb_ann_ivfpq plan — leaving the vote unchanged."""
    from ..functions.vectors import cosine
    from ..operators.dedup import topk_per_group

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    heldout = F.col("vec_id") % KNN_HELDOUT_MOD == 0
    q = emb.filter(heldout).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("actual"),
    )
    t = emb.filter(~heldout)
    nn = topk_per_group(
        t.crossJoin(F.broadcast(q)).select(
            "query_id",
            "label",
            cosine(F.col("v"), F.col("qv")).alias("cos"),
            "vec_id",
        ),
        ["query_id"],
        [F.col("cos").desc(), F.col("vec_id").asc()],
        k=KNN_K,
    )
    votes = nn.groupBy("query_id", "label").agg(F.count("*").alias("n_votes"))
    pred = topk_per_group(
        votes,
        ["query_id"],
        [F.col("n_votes").desc(), F.col("label").asc()],
        k=1,
    ).select("query_id", F.col("label").alias("predicted"), "n_votes")
    return pred.join(
        q.select("query_id", "actual"), "query_id"
    ).select(
        "query_id",
        "predicted",
        "n_votes",
        "actual",
        (F.col("predicted") == F.col("actual")).alias("correct"),
    )


# --------------------------------------------------------------------------
# TPC-H Q16 analog: supplier diversity per (brand, size), NOT IN exclusion
# --------------------------------------------------------------------------
@register(
    "brand_size_supplier_counts",
    # The Q16 shape: an anti-joined NOT IN subquery (suppliers with
    # "complaints" — negative balances here) + COUNT(DISTINCT) per
    # part attribute group. The NOT IN inner side (s_suppkey) is
    # NOT NULL by schema, so anti-join semantics are identical on both
    # engines (a nullable inner side is the classic NOT IN trap — it
    # would make the whole predicate UNKNOWN).
    oracle="""
    SELECT p.p_brand AS brand, p.p_size AS size,
           CAST(COUNT(DISTINCT li.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem li
    JOIN part p ON p.p_partkey = li.l_partkey
    WHERE p.p_type <> 'PROMO'
      AND li.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2
    """,
    tags=("tpch-q16", "anti-join", "count-distinct"),
)
def brand_size_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many distinct suppliers could supply each
    (brand, size) combination, excluding non-PROMO types and suppliers
    on the complaint list (negative balance — the testdata's analog of
    Q16's LIKE '%Customer%Complaints%').

    Scale: the complaint list and the type-filtered part both scale
    with sf, so the LEFT ANTI and part joins are AQE-sized rather
    than hint-forced (broadcast while they fit); the one real
    exchange is the distinct aggregation, which Spark runs as a
    two-phase partial-distinct (dedup (brand,size,suppkey) map-side,
    then count) — never a giant row set on one reducer."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") != "PROMO"
    ).select("p_partkey", "p_brand", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# WAV transcode round-trip: decode -> decimate -> re-encode -> decode
# --------------------------------------------------------------------------
WAV_DOWNSAMPLE_STRIDE = 4


@register(
    "multimodal_wav_downsample",
    # Oracle replays the generation formula at the decimated indices:
    # sample(i) = ((doc_id*2654435761 + i*40503) % 65536) - 32768 for
    # i in range(0, n, stride), n = 64 + doc_id % 193. The re-encoded
    # file's header must carry rate/stride — proving the ENCODER ran,
    # not just the sample slice.
    oracle=f"""
    WITH s AS (
      SELECT d.doc_id,
             ((d.doc_id * 2654435761 + u.i * 40503) % 65536) - 32768 AS amp
      FROM documents d,
           UNNEST(range(0, 64 + d.doc_id % 193, {WAV_DOWNSAMPLE_STRIDE})) AS u(i)
    )
    SELECT doc_id,
           CAST({16000 // WAV_DOWNSAMPLE_STRIDE} AS BIGINT) AS sample_rate,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(16 AS BIGINT) AS bits_per_sample,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(amp) AS BIGINT) AS sum_amp,
           CAST(MIN(amp) AS BIGINT) AS min_amp,
           CAST(MAX(amp) AS BIGINT) AS max_amp
    FROM s GROUP BY doc_id
    """,
    tags=("llm", "multimodal", "audio", "transcode"),
)
def multimodal_wav_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio TRANSFORM with both codec directions real: decode the
    RIFF/WAVE payload, naively decimate to every
    {WAV_DOWNSAMPLE_STRIDE}th sample (anti-alias filtering needs
    scipy — absent from this image; the naive decimation is labeled as
    such, the transcode plumbing is what's under test), RE-ENCODE a
    valid WAV at rate/{WAV_DOWNSAMPLE_STRIDE}, then decode THAT and
    report its header + exact sample aggregates
    (operators/multimodal.py::downsample_wav — the chunk walk is
    shared with parse_wav so transform and decoder cannot diverge).

    Scale: Arrow-batched mapInPandas; payload bytes never visit the
    driver; per-row cost is the byte length. This is the shape every
    bulk media-normalization pass (resample/transcode before feature
    extraction) takes on a cluster."""
    from ..operators.multimodal import attach_wav, downsample_wav

    docs = load_table(spark, sf_dir, "documents")
    return downsample_wav(attach_wav(docs), stride=WAV_DOWNSAMPLE_STRIDE)


# --------------------------------------------------------------------------
# Streaming CDC merge: micro-batched change feed -> versioned store
# --------------------------------------------------------------------------
CDC_STREAM_SHARDS = 4


@register(
    "streaming_cdc_merge",
    # Same expected state as events_cdc_apply (modulo the op counter):
    # however the feed is sliced into micro-batches, per-batch dedup +
    # the cross-batch freshness guard compose to argmax over the whole
    # log — associativity of max is WHY streaming CDC replication can
    # be micro-batched at all, and the hash oracle proves it held.
    oracle="""
    WITH log AS (
      SELECT user_id, ts, event_id, value,
             event_type = 'purchase' AS is_upsert
      FROM events
      WHERE event_type IN ('purchase', 'error') AND ts IS NOT NULL
    ),
    last AS (
      SELECT user_id, ts, event_id, value, is_upsert,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM log
    )
    SELECT user_id, value, ts AS applied_ts
    FROM last WHERE rn = 1 AND is_upsert
    """,
    tags=("streaming", "cdc", "store", "K2", "K3"),
)
def streaming_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC replication end-to-end: the change feed (purchase =
    upsert, error = delete-tombstone) is sharded into
    {CDC_STREAM_SHARDS} files, streamed ONE FILE PER MICRO-BATCH, and
    each epoch K2-merges into a versioned ParquetTable keyed on
    user_id — per-batch dedup keeps the batch's winning op, the K3
    freshness guard (a composite (ts, event_id) op-sequence string)
    arbitrates across batches, and deletes ride as tombstone rows
    filtered at read. The final table must hash-match the batch CDC
    collapse regardless of how ops landed in micro-batches.

    Scale: this is the replication pipeline's actual shape — each
    epoch's merge cost is O(batch + touched keys), the store versions
    every epoch, and the tombstone read-filter is the standard
    compaction-deferred delete. Event time crosses the boundary as
    epoch micros (LONG) so no session timezone can shift it
    (streaming/incremental.py::foreach_batch_merge)."""
    import uuid

    from .pipeline_queries import _stream_partitions, record_stream_plan
    from ..streaming.incremental import foreach_batch_merge, stream_events

    # Shard the change feed so the stream replays as multiple epochs.
    src_dir = tempfile.mkdtemp(prefix="pse_cdc_feed_")
    (
        load_table(spark, sf_dir, "events")
        # an op without a timestamp cannot be ordered — excluded on
        # both engines (the CDC total order is (ts, event_id))
        .filter(F.col("event_type").isin("purchase", "error")
                & F.col("ts").isNotNull())
        .repartition(CDC_STREAM_SHARDS)
        .write.mode("overwrite")
        .parquet(src_dir)
    )
    ev = stream_events(spark, src_dir, max_files_per_trigger=1)
    log = ev.filter(F.col("event_type").isin("purchase", "error")).select(
        "user_id",
        "event_id",
        "value",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("event_type") == "purchase").alias("is_upsert"),
        # composite op sequence: zero-padded so string order == numeric
        # (ts, event_id) order; unique because event_id is unique.
        # NULL ts coalesces to -1 ("-…" sorts before every zero-padded
        # positive), making NULL-time ops the OLDEST with the event_id
        # tiebreak intact — exactly the oracle's DESC NULLS LAST +
        # event_id DESC order (format_string would otherwise return
        # NULL and drop the tiebreak entirely on a NULL-ts feed).
        F.format_string(
            "%020d%010d",
            F.coalesce(F.unix_micros("ts"), F.lit(-1)),
            F.col("event_id"),
        ).alias("op_seq"),
    )
    table = ParquetTable(
        spark,
        tempfile.mkdtemp(prefix="pse_cdc_tbl_"),
        log.schema,
    )
    ckpt = tempfile.mkdtemp(prefix=f"pse_cdc_ckpt_{uuid.uuid4().hex[:8]}_")
    with _stream_partitions(spark):
        q = foreach_batch_merge(
            log,
            table,
            keys=["user_id"],
            freshness_col="op_seq",
            checkpoint=ckpt,
            dedup_order=[F.col("op_seq").desc()],
        )
        try:
            q.processAllAvailable()
            record_stream_plan(q)
        finally:
            q.stop()
    # epoch micros -> NTZ wall clock, session-tz-free
    applied = F.expr(
        "timestampadd(MICROSECOND, ts_us, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    ).alias("applied_ts")
    return table.read().filter(F.col("is_upsert")).select("user_id", "value", applied)


# --------------------------------------------------------------------------
# ANN quality report: recall@k of every ANN lane vs brute-force truth
# --------------------------------------------------------------------------
def _sql_ann_recall() -> str:
    from .llm_queries import (
        _Q_IDS,
        EMB_DIM,
        IVF_CENTROID_IDS,
        IVF_NPROBE,
        TOPK,
        _sql_bucket,
    )
    from ..functions.vectors import sql_cosine
    from .round8_queries import ADC_TOPK, PQ_DSUB, PQ_M, _pq_cte

    # COMPACT shared-CTE form, deliberately NOT a composition of the
    # standalone oracles: embedding four full oracles as subqueries
    # (~6 unrolled 64-dim cosine blocks) poisoned DuckDB 1.0's
    # allocator — the composed SQL ran once, then ANY later heavy
    # oracle on the same connection died with a spurious tiny-block
    # OOM (reproduced without Spark in the process). This form shares
    # ONE pairwise-cosine CTE and ONE centroid-cosine CTE across all
    # arms; every arm's candidate/rank rule is token-equivalent to its
    # standalone oracle (dot/norm argument order commutes exactly,
    # term order unchanged), so the semantics — which each standalone
    # query hash-verifies — are identical.
    cos_eq = sql_cosine("e.embedding", "q.embedding", EMB_DIM)
    cos_ec = sql_cosine("e.embedding", "c.cvec", EMB_DIM)
    cids = ", ".join(str(i) for i in IVF_CENTROID_IDS)

    def dist(m: int) -> str:
        lo, hi = m * PQ_DSUB + 1, m * PQ_DSUB + PQ_DSUB
        return (
            f"list_sum(list_transform(qq.qarr[{lo}:{hi}], "
            f"x -> (x - (32 + 64*cv.c{m})) * (x - (32 + 64*cv.c{m}))))"
        )

    adc = " + ".join(dist(m) for m in range(PQ_M))
    rank_c = (
        "row_number() OVER (PARTITION BY s.query_id "
        "ORDER BY s.c DESC, s.vec_id ASC)"
    )
    arms = "\nUNION ALL\n".join(
        f"""
    SELECT '{name}' AS method, bf.query_id,
           CAST(COUNT(m.vec_id) AS BIGINT) AS n_hits,
           COUNT(m.vec_id) * 1.0 / {TOPK} AS recall_at_{TOPK}
    FROM bf LEFT JOIN {cte} m
      ON m.query_id = bf.query_id AND m.vec_id = bf.vec_id
    GROUP BY bf.query_id
    """
        for name, cte in (("lsh", "m_lsh"), ("ivf", "m_ivf"), ("ivfpq", "m_pq"))
    )
    return f"""
    WITH {_pq_cte()},
    q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id IN ({_Q_IDS})),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id, {cos_eq} AS c
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.vec_id
    ),
    bf AS (SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY c DESC, vec_id ASC) AS rn
        FROM scored) WHERE rn <= {TOPK}),
    bkt AS (SELECT vec_id, ({_sql_bucket('embedding')}) AS bucket FROM embeddings),
    m_lsh AS (SELECT query_id, vec_id FROM (
        SELECT s.query_id, s.vec_id, {rank_c} AS rn
        FROM scored s
        JOIN bkt e ON e.vec_id = s.vec_id
        JOIN bkt qb ON qb.vec_id = s.query_id AND qb.bucket = e.bucket
      ) WHERE rn <= {TOPK}),
    cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
              WHERE vec_id IN ({cids})),
    cellscore AS (SELECT e.vec_id, c.cid, {cos_ec} AS cc
                  FROM embeddings e CROSS JOIN cents c),
    assign AS (SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY cc DESC, cid ASC) AS rn FROM cellscore) WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
        SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY cc DESC, cid ASC) AS rn
        FROM cellscore WHERE vec_id IN ({_Q_IDS})) WHERE rn <= {IVF_NPROBE}),
    cand AS (SELECT p.query_id, a.vec_id FROM probes p
             JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id),
    m_ivf AS (SELECT query_id, vec_id FROM (
        SELECT s.query_id, s.vec_id, {rank_c} AS rn
        FROM scored s JOIN cand ON cand.query_id = s.query_id
                               AND cand.vec_id = s.vec_id) WHERE rn <= {TOPK}),
    qq AS (SELECT vec_id AS query_id, q AS qarr FROM qv WHERE vec_id IN ({_Q_IDS})),
    m_pq AS (SELECT query_id, vec_id FROM (
        SELECT cand.query_id, cand.vec_id,
               row_number() OVER (PARTITION BY cand.query_id
                 ORDER BY CAST({adc} AS BIGINT) ASC, cand.vec_id ASC) AS rn
        FROM cand JOIN cv ON cv.vec_id = cand.vec_id
                  JOIN qq ON qq.query_id = cand.query_id) WHERE rn <= {ADC_TOPK})
    {arms}
    """


@register(
    "emb_ann_recall_report",
    # Every arm's oracle is the SAME oracle its standalone query hash-
    # matches against (composed as subqueries), joined to the brute-
    # force truth — so this report is oracle-checked end to end, not a
    # Spark-vs-Spark comparison.
    oracle=_sql_ann_recall(),
    tags=("embedding", "ann", "evaluation", "recall"),
)
def emb_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN lane's quality scoreboard: recall@k of each approximate
    method (hyperplane LSH, IVF with nprobe=2, IVF-PQ with ADC
    scoring) against the exact brute-force cosine top-k, per query —
    the number that decides nprobe/bands/code-size tradeoffs before a
    serving rollout, computed by the engine itself.

    Scale: ground truth is the brute-force scan (evaluation runs on a
    sampled query set — here the fixed ANN_QUERY_IDS); each method's
    plan is its production plan, reused verbatim from the registry, so
    the report measures exactly what serves. The joins and counts run
    on k x |queries| rows."""
    from .llm_queries import TOPK, emb_ann_ivf, emb_ann_lsh, emb_cosine_topk
    from .round9_queries import emb_ann_ivfpq

    bf = emb_cosine_topk(spark, sf_dir).select("query_id", "vec_id")
    out = None
    for name, fn in (
        ("lsh", emb_ann_lsh),
        ("ivf", emb_ann_ivf),
        ("ivfpq", emb_ann_ivfpq),
    ):
        m = fn(spark, sf_dir).select(
            F.col("query_id").alias("m_qid"), F.col("vec_id").alias("m_vid")
        )
        arm = (
            bf.join(
                m,
                (bf.query_id == m.m_qid) & (bf.vec_id == m.m_vid),
                "left",
            )
            .groupBy("query_id")
            .agg(F.count("m_vid").alias("n_hits"))
            .select(
                F.lit(name).alias("method"),
                "query_id",
                "n_hits",
                (F.col("n_hits") * 1.0 / TOPK).alias(f"recall_at_{TOPK}"),
            )
        )
        out = arm if out is None else out.unionByName(arm)
    return out


# --------------------------------------------------------------------------
# Table diff between two versions (post-hoc, via time travel)
# --------------------------------------------------------------------------
DIFF_UPD_MOD, DIFF_INS_MOD, DIFF_DEL_MOD = 7, 11, 5
DIFF_INS_OFFSET = 1_000_000
DIFF_BUMP_CENTS = 50_000


def _sql_version_diff() -> str:
    upd, ins, dele = DIFF_UPD_MOD, DIFF_INS_MOD, DIFF_DEL_MOD
    return f"""
    WITH base AS (
      SELECT c_custkey AS k, {sql_cents('c_acctbal')} AS bal FROM customer
    ),
    v1 AS (SELECT * FROM base),
    v3 AS (
      -- after merge (updates %{upd}, inserts re-keyed %{ins}) and
      -- delete (%{dele} == 2 on the CURRENT key)
      SELECT k, bal + CASE WHEN k % {upd} = 0 THEN {DIFF_BUMP_CENTS} ELSE 0 END AS bal
      FROM base WHERE k % {dele} <> 2
      UNION ALL
      SELECT k + {DIFF_INS_OFFSET} AS k, bal FROM base
      WHERE k % {ins} = 0 AND (k + {DIFF_INS_OFFSET}) % {dele} <> 2
    )
    SELECT COALESCE(v3.k, v1.k) AS c_custkey,
           CASE WHEN v1.k IS NULL THEN 'added'
                WHEN v3.k IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           v1.bal AS old_acctbal_cents,
           v3.bal AS new_acctbal_cents
    FROM v1 FULL OUTER JOIN v3 ON v1.k = v3.k
    WHERE v1.k IS NULL OR v3.k IS NULL OR v1.bal <> v3.bal
    """


@register(
    "store_version_diff",
    # Closed form: v1 = the base slice; v3 = base with %7 balances
    # bumped, %11 customers re-keyed in, and %5==2 keys deleted. The
    # diff must classify exactly the adds/removes/changes — including
    # the subtle row that was UPDATED in v2 and then DELETED in v3
    # (it must surface as 'removed' with its ORIGINAL v1 balance).
    oracle=_sql_version_diff(),
    tags=("store", "time-travel", "diff"),
)
def store_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-hoc diff between two table VERSIONS via time travel — the
    "what changed between yesterday's snapshot and now" query Delta
    answers with table_changes() only if CDF was enabled BEFORE the
    writes; the version store answers it after the fact: read(v1)
    FULL OUTER JOIN read(v3) on the key, classify added / removed /
    changed, drop unchanged.

    Scale: both sides are the table's own versions — the join
    shuffles on the key once (or prunes to changed partitions when
    the table is partitioned); output is bounded by the churn, not
    the table."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        cents(F.col("c_acctbal")).alias("bal"),
    )
    table = ParquetTable(
        spark, tempfile.mkdtemp(prefix="pse_diff_"), c.schema
    )
    table.overwrite(c)  # v1
    upd = c.filter(F.col("k") % DIFF_UPD_MOD == 0).withColumn(
        "bal", F.col("bal") + DIFF_BUMP_CENTS
    )
    ins = c.filter(F.col("k") % DIFF_INS_MOD == 0).withColumn(
        "k", F.col("k") + DIFF_INS_OFFSET
    )
    table.merge(upd.unionByName(ins), keys=["k"])  # v2
    table.delete(F.col("k") % DIFF_DEL_MOD == 2)  # v3
    v1 = table.read(version=1).select(
        F.col("k").alias("k1"), F.col("bal").alias("bal1")
    )
    # latest from history(), not a hard-coded 3: on an EMPTY input the
    # merge is a P6 no-op that burns no version, so the delete commits
    # v2 and "version 3" never exists (empty-input matrix)
    v3 = table.read(version=table.history()[-1]).select(
        F.col("k").alias("k3"), F.col("bal").alias("bal3")
    )
    return (
        v1.join(v3, v1.k1 == v3.k3, "full_outer")
        .filter(
            F.col("k1").isNull()
            | F.col("k3").isNull()
            | (F.col("bal1") != F.col("bal3"))
        )
        .select(
            F.coalesce("k3", "k1").alias("c_custkey"),
            F.when(F.col("k1").isNull(), "added")
            .when(F.col("k3").isNull(), "removed")
            .otherwise("changed")
            .alias("change"),
            F.col("bal1").alias("old_acctbal_cents"),
            F.col("bal3").alias("new_acctbal_cents"),
        )
    )


# --------------------------------------------------------------------------
# BMP resize round-trip: decode -> nearest-neighbor resize -> re-encode -> decode
# --------------------------------------------------------------------------
BMP_OUT_W, BMP_OUT_H = 3, 2


@register(
    "multimodal_bmp_resize",
    # Oracle replays the nearest-neighbor floor mapping on the
    # generation lattice: output pixel (xo, yo) samples source
    # (xo*w // OUT_W, yo*h // OUT_H) in top-down coordinates, the same
    # index math resize_bmp_nearest performs after flipping the
    # bottom-up rows — so equality proves decoder, resampler, encoder
    # AND the second decode agree end to end.
    oracle=f"""
    WITH m AS (
      SELECT d.doc_id,
             (ux.x * (4 + d.doc_id % 5)) // {BMP_OUT_W} AS x,
             (uy.y * (3 + d.doc_id % 4)) // {BMP_OUT_H} AS y
      FROM documents d,
           UNNEST(range(0, {BMP_OUT_W})) AS ux(x),
           UNNEST(range(0, {BMP_OUT_H})) AS uy(y)
    )
    SELECT doc_id,
           CAST({BMP_OUT_W} AS BIGINT) AS width,
           CAST({BMP_OUT_H} AS BIGINT) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM((doc_id + 3*x + 7*y) % 256) AS BIGINT) AS sum_b,
           CAST(SUM((2*doc_id + 5*x + 11*y) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((3*doc_id + 13*x + 17*y) % 256) AS BIGINT) AS sum_r
    FROM m GROUP BY doc_id
    """,
    tags=("llm", "multimodal", "image", "transform"),
)
def multimodal_bmp_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image TRANSFORM with both codec directions real (the BMP
    sibling of multimodal_wav_downsample): decode each synthesized
    BMP, nearest-neighbor resize to {BMP_OUT_W}x{BMP_OUT_H} —
    RE-ENCODING a valid bottom-up BI_RGB 24-bit file, row padding and
    all — then decode the re-encoded payload and report exact
    per-channel sums (operators/multimodal.py::resize_decode_bmp).
    This is the thumbnail/normalize pass every multimodal training
    pipeline runs before feature extraction.

    Scale: Arrow-batched mapInPandas; payloads never visit the
    driver; per-row cost is the pixel count. JPEG swaps in behind the
    same plumbing when PIL exists (documented stub)."""
    from ..operators.multimodal import attach_bmp, resize_decode_bmp

    docs = load_table(spark, sf_dir, "documents")
    return resize_decode_bmp(attach_bmp(docs), BMP_OUT_W, BMP_OUT_H)


# --------------------------------------------------------------------------
# Winsorized statistics: robust mean with dyadic-tail clamping
# --------------------------------------------------------------------------
WINSOR_LO, WINSOR_HI = 1 / 16, 15 / 16  # DYADIC tails — see docstring


@register(
    "value_winsorized_stats",
    # Dyadic quantiles (1/16, 15/16) keep everything bit-exact: the
    # interpolation weight is m/16, so both engines' quantile formulas
    # produce the identical dyadic double on integer cents; clamped
    # values are integers or those two quantiles (≤4 fractional bits,
    # magnitude ≪ 2^53), so the double SUM is exact and therefore
    # summation-order-free — no BIGINT re-quantization needed.
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    q AS (
      SELECT event_type,
             quantile_cont(c, 0.0625) AS lo,
             quantile_cont(c, 0.9375) AS hi
      FROM v GROUP BY event_type
    )
    SELECT v.event_type, q.lo AS p_lo_cents, q.hi AS p_hi_cents,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE v.c < q.lo) AS BIGINT) AS n_clamped_lo,
           CAST(COUNT(*) FILTER (WHERE v.c > q.hi) AS BIGINT) AS n_clamped_hi,
           SUM(LEAST(GREATEST(v.c * 1.0, q.lo), q.hi)) / COUNT(*)
             AS winsorized_mean_cents
    FROM v JOIN q USING (event_type)
    GROUP BY v.event_type, q.lo, q.hi
    """,
    tags=("robust-stats", "winsorize", "percentile"),
)
def value_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type — the robust average every
    metrics pipeline wants when a few outliers poison the plain mean:
    values are CLAMPED (not dropped, unlike trimming) at the 1/16 and
    15/16 quantiles before averaging.

    Scale: one aggregate computes the two quantiles per group (sort-
    based exact percentile on the grouped column), the tiny quantile
    table broadcasts back, and the clamped re-aggregate is map-side
    combinable. Exactness: integer cents + DYADIC quantiles make
    every clamped value an exact ≤4-fractional-bit double, so the sum
    never rounds and both engines agree bit-for-bit (the
    median_price_per_flag rule, extended to the clamp-sum)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
    )
    q = ev.groupBy("event_type").agg(
        F.percentile(F.col("c"), WINSOR_LO).alias("lo"),
        F.percentile(F.col("c"), WINSOR_HI).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("c") * 1.0, F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("c") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_lo"),
            F.sum(F.when(F.col("c") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_hi"),
            (F.sum(clamped) / F.count("*")).alias("winsorized_mean_cents"),
        )
        .select(
            "event_type",
            F.col("lo").alias("p_lo_cents"),
            F.col("hi").alias("p_hi_cents"),
            "n",
            "n_clamped_lo",
            "n_clamped_hi",
            "winsorized_mean_cents",
        )
    )


# --------------------------------------------------------------------------
# Cohort LTV matrix: revenue per signup cohort x age month, cumulative
# --------------------------------------------------------------------------
@register(
    "cohort_ltv_matrix",
    oracle="""
    WITH p AS (
      SELECT user_id, CAST(ts AS DATE) - DATE '1970-01-01' AS d,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    cohort AS (SELECT user_id, MIN(d) AS cohort_day FROM p GROUP BY user_id),
    sized AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_users
              FROM cohort GROUP BY cohort_day),
    cell AS (
      SELECT c.cohort_day, p.d - c.cohort_day AS age_days,
             CAST(SUM(p.cents) AS BIGINT) AS revenue_cents
      FROM p JOIN cohort c USING (user_id)
      GROUP BY c.cohort_day, p.d - c.cohort_day
    )
    SELECT cell.cohort_day, cell.age_days, sized.n_users,
           cell.revenue_cents,
           CAST(SUM(cell.revenue_cents) OVER (
                PARTITION BY cell.cohort_day ORDER BY cell.age_days
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_revenue_cents
    FROM cell JOIN sized USING (cohort_day)
    """,
    tags=("growth-analytics", "cohort", "ltv"),
)
def cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The growth-analytics staple next to retention_cohorts: revenue
    per acquisition cohort (DAY of first purchase — the testdata spans
    one month, so daily cohorts give the real matrix a monthly scheme
    would degenerate out of) by age-in-days, with the running
    cumulative — the LTV curve per cohort that payback-period
    decisions read off.

    Scale: one purchase scan, a per-user MIN (the only corpus-keyed
    shuffle, map-side combined), a (cohort, age) aggregate that
    shrinks to days², and a cumulative window over that tiny matrix
    partitioned by cohort. Days ride as exact epoch-day integers via
    DATE extraction from the NTZ timestamp — no timezone function
    touches event time."""
    from pyspark.sql import Window

    p = (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    cohort = p.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    sized = cohort.groupBy("cohort_day").agg(F.count("*").alias("n_users"))
    cell = (
        p.join(cohort, "user_id")
        .groupBy("cohort_day", (F.col("d") - F.col("cohort_day")).alias("age_days"))
        .agg(F.sum("cents").alias("revenue_cents"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cell.join(F.broadcast(sized), "cohort_day")
        .select(
            "cohort_day",
            "age_days",
            "n_users",
            "revenue_cents",
            F.sum("revenue_cents").over(w).alias("cum_revenue_cents"),
        )
    )
