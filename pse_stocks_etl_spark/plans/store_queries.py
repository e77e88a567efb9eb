"""Store-path queries: the versioned ParquetTable exercised END-TO-END
under the correctness driver (round-2 review items 5 and the CDF idea).

`sync_end_to_end` already drives the store through the sync engine;
these queries drive the remaining store surfaces — OPTIMIZE ZORDER,
partitioned overwrite+merge roundtrip, and the change-data-feed view of
a merge — each with a full DuckDB value-hash oracle over the SAME
testdata, so "the storage layer did not corrupt, drop, or duplicate a
row" is driver-checked, not just pytest-checked.

Each query materializes its table under a fresh tempfile.mkdtemp (the
driver may run queries in any order / any session; nothing may collide
or depend on prior state).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents, sql_cents, sql_sum_money, sum_money
from ..operators.merge import merge_cdf
from ..sources.catalog import load_table
from ..store.parquet_table import ParquetTable
from .registry import register


@register(
    "zorder_pruned_scan",
    # The oracle is a PLAIN scan of the source table: OPTIMIZE ZORDER
    # may only reorder rows across files, never change the relation.
    # Equality after write → optimize → predicate read proves the whole
    # clustering rewrite (quantile ranks, Morton interleave, range
    # repartition, commit) is a pure physical transform. The predicate
    # hits the SECOND cluster key alone — the case plain lexicographic
    # sort cannot skip files for, i.e. the point of Z-order
    # (file-skipping stats proof: tests/test_plans_physical.py).
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           {sql_cents('l_quantity')} AS qty_cents,
           {sql_cents('l_extendedprice')} AS price_cents
    FROM lineitem WHERE l_partkey BETWEEN 100 AND 140
    """,
    tags=("store", "K9", "zorder"),
)
def zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K9 companion under the driver: write lineitem into a versioned
    ParquetTable, OPTIMIZE ZORDER BY (l_suppkey, l_partkey), then read
    back through a predicate on the second cluster key only
    (store/parquet_table.py::optimize — Morton-interleaved quantile
    ranks; reference analog: BigQuery `CLUSTER BY symbol`,
    db/bigquery/daily_stock_price.sql:17)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        cents(F.col("l_quantity")).alias("qty_cents"),
        cents(F.col("l_extendedprice")).alias("price_cents"),
    )
    table = ParquetTable(
        spark, tempfile.mkdtemp(prefix="pse_zorder_"), li.schema
    )
    table.overwrite(li)
    table.optimize(cluster_by=["l_suppkey", "l_partkey"], target_files=8)
    return table.read().filter(F.col("l_partkey").between(100, 140))


@register(
    "grouped_rollup_store_roundtrip",
    # Oracle = the one-shot full rollup. The engine builds the same
    # relation INCREMENTALLY through the store: overwrite the history
    # (months < 1997-06), then MERGE the tail months into the
    # priority-partitioned table — so equality proves the partitioned
    # overwrite, the keyed upsert (partition-pruned fast path: the
    # partition column is a merge key), and the declared-schema read
    # compose to exactly the batch answer.
    oracle=f"""
    SELECT o_orderpriority AS priority,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_sum_money('o_totalprice')} AS revenue
    FROM orders GROUP BY 1, 2
    """,
    tags=("store", "K1", "K2", "rollup"),
)
def grouped_rollup_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+K2 through the store on an aggregate: monthly revenue rollup
    per order priority, committed as overwrite(history) +
    merge(recent), read back from the partitioned versioned table."""
    o = load_table(spark, sf_dir, "orders")
    rollup = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.trunc(F.to_date("o_orderdate"), "month").alias("month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            sum_money(F.col("o_totalprice")).alias("revenue"),
        )
    )
    table = ParquetTable(
        spark,
        tempfile.mkdtemp(prefix="pse_rollup_"),
        rollup.schema,
        partition_by=("priority",),
    )
    cut = "1997-06-01"
    # NULL months route to the history branch explicitly: a plain
    # month < cut / month >= cut split silently drops the NULL-month
    # group from BOTH writes (NULL fails both predicates) — found by
    # tests/test_null_tpch_parity.py. This also exercises the store's
    # NULL-partition-value path (priority is the partition column).
    table.overwrite(rollup.filter((F.col("month") < cut) | F.col("month").isNull()))
    table.merge(rollup.filter(F.col("month") >= cut), keys=["priority", "month"])
    return table.read()


@register(
    "delta_cdf_preview",
    # CDF rows derived in closed form: updates are custkey % 7 == 0
    # (acctbal bumped 1000 cents), inserts are custkey % 11 == 0
    # re-keyed past the live range. The oracle rebuilds the exact
    # insert / update_preimage / update_postimage set with plain SQL.
    oracle=f"""
    WITH t AS (
      SELECT c_custkey, c_name, {sql_cents('c_acctbal')} AS acctbal_cents
      FROM customer
    )
    SELECT c_custkey + 10000000 AS c_custkey, 'NEW#' || c_custkey AS c_name,
           acctbal_cents, 'insert' AS _change_type
    FROM t WHERE c_custkey % 11 = 0
    UNION ALL
    SELECT c_custkey, c_name, acctbal_cents, 'update_preimage'
    FROM t WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey, c_name, acctbal_cents + 1000, 'update_postimage'
    FROM t WHERE c_custkey % 7 = 0
    """,
    tags=("store", "K2", "cdf"),
)
def delta_cdf_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta change-data-feed analog (`table_changes()` for one MERGE
    commit): the engine's merge classifies each source row, then emits
    insert rows plus before/after images for every updated key
    (operators/merge.py::merge_cdf). Downstream incremental consumers
    (a training-data refresh, a cache invalidator) subscribe to exactly
    this relation instead of diffing table versions."""
    target = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", cents(F.col("c_acctbal")).alias("acctbal_cents")
    )
    updates = target.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "acctbal_cents", F.col("acctbal_cents") + 1000
    )
    inserts = target.filter(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"),
        F.concat(F.lit("NEW#"), F.col("c_custkey").cast("string")).alias("c_name"),
        "acctbal_cents",
    )
    return merge_cdf(target, updates.unionByName(inserts), keys=["c_custkey"])
