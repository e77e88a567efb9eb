"""Round-10 queries: the two store-path additions the r5 review asked
for (VERDICT items 5 and 6).

- `store_lifecycle_preview` — destructive-op interplay under the
  driver: overwrite → keyed merge → delete → RESTORE → VACUUM in one
  lifecycle, hash-checked against the closed-form expected table (the
  `sync_end_to_end` technique). The subtle part is restore-then-vacuum:
  the restore's SOURCE version is vacuumed away, and the restored data
  must survive because restore re-commits data, never re-points.
- `emb_ann_ivfpq_increment` — the ANN lane's crawl-increment story
  (mirroring `docs_incremental_dedup`): new vectors are assigned to the
  EXISTING frozen cells and K2-merged into the cell-partitioned index
  table, so per-crawl cost scales with the shard, and untouched cells
  are carried as hardlinks (zero data movement — the physical guard
  tests/test_round10.py asserts inode identity). Equality with the
  from-scratch full-index oracle proves increment == rebuild.

Reference parity: the reference's sync loop IS an incremental
maintain-a-table-under-merges engine (src/etl/price_sync — overwrite
dims, merge facts); these queries drive this engine's versioned-store
analog of that lifecycle plus the ANN index as "just another
incrementally-merged table".
"""

from __future__ import annotations

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
