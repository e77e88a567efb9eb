"""Keyed upsert (MERGE) semantics as pure relational algebra.

Reference semantics (SURVEY.md §2.2 K2/K3, §2.4 J1/J2/J3, §2.3 P4/P5):
- K2 plain upsert: matched → update all cols, not matched → insert all
  (reference spark_deltalake_sync.py:296-300 Delta MERGE;
  deltalake_sync.py:239-248; bigquery_dml__upsert_company.sql:7-27).
- K3 freshness-guarded upsert: only replace a matched target row when
  `source.extracted_at >= target.extracted_at` or the target row is new
  (bigquery_dml__upsert_daily_stock_price.sql:15-16) — the property that
  makes replays idempotent (T4).
- J1 left-outer classify, J3 semi-join delete — the reference's staged
  delete+insert dance collapses into one relational expression here.

Delta MERGE is not available in this image, so the engine computes the
*post-merge relation* declaratively (anti-join the replaced keys out of
the target, union the winning source rows in) and the storage layer
(store/parquet_table.py) commits it atomically. On a Delta-enabled
cluster the same plan maps 1:1 onto
`DeltaTable.merge(...).whenMatchedUpdateAll(condition).whenNotMatchedInsertAll()`.

Scale notes: the anti-join and the classify join shuffle on the merge
keys; at 100 TB the win is file pruning — the storage layer partitions
the fact by date so a merge of a trailing window only rewrites recent
partitions (mirrors BigQuery `PARTITION BY date`, SURVEY.md §4).

Invariant (SURVEY.md §7.5 risk 4): the source must be key-unique before
merging — Delta MERGE throws on duplicate source keys, and the reference
always pre-dedups (A2). `merge_dataframes` enforces it via argmax dedup
when `dedup_order` is given.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import topk_per_group


def _keys_may_be_null(df: DataFrame, keys: Sequence[str]) -> bool:
    nullable = {f.name: f.nullable for f in df.schema.fields}
    return any(nullable.get(k, True) for k in keys)


def _null_safe_key_cond(left: DataFrame, right: DataFrame, keys: Sequence[str], right_names: Sequence[str]):
    """AND of key equalities, null-safe (<=>) only when the schema says a
    key may actually be NULL: plain `=` never matches a NULL key (which
    would make merges of NULL-keyed rows insert a duplicate on every
    replay), but null-safe comparisons block Catalyst's constraint
    propagation — so proven-non-nullable keys keep the plain form."""
    use_null_safe = _keys_may_be_null(left, keys) or _keys_may_be_null(right, right_names)
    cond = None
    for k, rk in zip(keys, right_names):
        c = left[k].eqNullSafe(right[rk]) if use_null_safe else (left[k] == right[rk])
        cond = c if cond is None else cond & c
    return cond


def classify_merge(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    freshness_col: str | None = None,
) -> DataFrame:
    """J1+P5: tag each source row 'insert' / 'update' / 'skip'.

    Left-outer join source→target on the composite key (null-safe); a
    source row is an insert when no target key matches, an update when
    it matches and passes the freshness guard (or there is no guard),
    else a skip. This is the relational form of the reference's staged
    classify (bigquery_dml__upsert_daily_stock_price.sql:10-16).
    """
    tcols = list(keys) + ([freshness_col] if freshness_col else [])
    tgt_cols = (
        target.select(*tcols)
        .withColumnsRenamed({c: f"__t_{c}" for c in tcols})
        .withColumn("__matched", F.lit(True))
    )
    cond = _null_safe_key_cond(source, tgt_cols, keys, [f"__t_{k}" for k in keys])
    joined = source.join(tgt_cols, on=cond, how="left")
    is_new = F.col("__matched").isNull()
    if freshness_col:
        fresh = F.col(freshness_col) >= F.col(f"__t_{freshness_col}")
        action = (
            F.when(is_new, F.lit("insert"))
            .when(fresh | F.col(f"__t_{freshness_col}").isNull(), F.lit("update"))
            .otherwise(F.lit("skip"))
        )
    else:
        action = F.when(is_new, F.lit("insert")).otherwise(F.lit("update"))
    return joined.withColumn("merge_action", action).drop(
        "__matched", *[f"__t_{c}" for c in tcols]
    )


def merge_dataframes(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    freshness_col: str | None = None,
    dedup_order: Sequence[Column | str] | None = None,
    set_on_write: dict[str, Column] | None = None,
) -> DataFrame:
    """K2/K3: the post-merge relation.

    result = (target ⟕ keys-not-being-replaced)  ∪  winning source rows
    where a source row wins per K3 iff new-key OR freshness passes.
    Column set follows the target's schema (whenMatchedUpdateAll /
    whenNotMatchedInsertAll semantics — all columns replaced).

    `set_on_write` assigns columns on every written (inserted/updated)
    row — the engine's replacement for the reference's audit-column
    triggers (`updated_at` DEFAULT NOW(), company.sql:14-15,
    trigger_set_timestamp.sql:3-9): e.g.
    `set_on_write={"updated_at": F.current_timestamp()}`. Untouched
    target rows keep their existing values.
    """
    cols = target.columns
    if dedup_order is not None:
        source = topk_per_group(source, keys, dedup_order, k=1)
    classified = classify_merge(target, source, keys, freshness_col)
    winners = classified.filter(F.col("merge_action") != "skip")
    if set_on_write:
        winners = winners.withColumns(dict(set_on_write))
    winners = winners.select(*cols)
    # Replaced keys leave the target; winning source rows come in.
    # Null-safe anti-join so NULL-keyed target rows are replaced (not
    # duplicated) when the source carries the same NULL key.
    wkeys = winners.select(
        *[F.col(k).alias(f"__w_{k}") for k in keys]
    )
    kept = target.join(
        wkeys, on=_null_safe_key_cond(target, wkeys, keys, [f"__w_{k}" for k in keys]),
        how="left_anti",
    )
    return kept.unionByName(winners)


def merge_cdf(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    freshness_col: str | None = None,
) -> DataFrame:
    """Change-data-feed view of a merge (Delta CDF semantics: the rows
    `table_changes()` would emit for this MERGE commit): every insert
    row tagged `insert`, every updated key contributing BOTH its
    before-row (`update_preimage`, from the target) and its after-row
    (`update_postimage`, from the source). Skipped rows (freshness
    guard) emit nothing — they are not part of the commit.

    Columns = target columns + `_change_type` (Delta's reserved name).

    One full-outer join on the merge keys, then a per-row branch
    exploded into 0/1/2 CDF rows (r12 optimization): the earlier form
    (classify join + a second target semi-join, unioned three ways)
    re-executed the classify join in EVERY union branch — the physical
    plan carried it three times and each branch was a full pass over
    both inputs (plans/r12/store_mv_refresh_increment_before.txt shows
    8 passes over the cached fact for one CDF). Here each side is
    read and shuffled exactly once; `explode` (non-outer) drops the
    NULL branch rows (skips and untouched target rows), so no second
    pass filters them. Both inputs are key-unique by the MERGE
    contract (Delta throws on duplicate source keys; the property
    suite pins agreement with merge_dataframes on key-unique inputs),
    under which the matched pairs here are exactly the classify
    matches of the previous form.
    """
    cols = list(target.columns)
    t = target.select(
        *[F.col(c).alias(f"__t_{c}") for c in cols],
        F.lit(True).alias("__t_matched"),
    )
    s = source.select(*cols, F.lit(True).alias("__s_matched"))
    cond = _null_safe_key_cond(s, t, keys, [f"__t_{k}" for k in keys])
    joined = s.join(t, on=cond, how="full_outer")

    def _row(prefix: str, change: str):
        return F.struct(
            *[F.col(f"{prefix}{c}").alias(c) for c in cols],
            F.lit(change).alias("_change_type"),
        )

    if freshness_col:
        fresh_ok = (
            F.col(freshness_col) >= F.col(f"__t_{freshness_col}")
        ) | F.col(f"__t_{freshness_col}").isNull()
    else:
        fresh_ok = F.lit(True)
    branch = (
        F.when(
            F.col("__t_matched").isNull(), F.array(_row("", "insert"))
        )
        .when(
            F.col("__s_matched").isNotNull() & fresh_ok,
            F.array(
                _row("__t_", "update_preimage"), _row("", "update_postimage")
            ),
        )
        # else NULL: freshness skip, or target-only row — explode drops it
    )
    return joined.select(F.explode(branch).alias("__r")).select("__r.*")


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """U1: union-all of homogeneous batches by column name (reference
    pd.concat at pse_edge.py:104; glob CSV read at deltalake_sync.py:229)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)
