"""Round-10 physical guards: the incremental IVF-PQ merge must be
surgical — only the crawl shard's cells rewritten, every untouched
cell directory carried into the new version as hardlinks (same inode,
zero data movement). Parity for both round-10 queries runs through
tests/test_parity.py like every registry query; this file asserts the
PHYSICAL claim the oracle cannot see."""

from __future__ import annotations

import os

from pse_stocks_etl_spark.plans.registry import REGISTRY
from pse_stocks_etl_spark.plans import round10_queries  # noqa: F401

from conftest import SF_DIR


def _inodes(vdir: str) -> dict[str, set[int]]:
    """cell-partition dir name -> set of data-file inodes."""
    out: dict[str, set[int]] = {}
    for entry in os.listdir(vdir):
        if not entry.startswith("cell="):
            continue
        d = os.path.join(vdir, entry)
        out[entry] = {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }
    return out


def test_increment_rewrites_only_new_cells(spark):
    fn = round10_queries.emb_ann_ivfpq_increment
    REGISTRY["emb_ann_ivfpq_increment"].fn(spark, SF_DIR).count()
    root = fn._last_table_path
    new_cells = {f"cell={int(c)}" for c in fn._last_new_cells}
    assert new_cells, "fixture degenerate: the crawl shard touched no cells"
    v1 = _inodes(os.path.join(root, "_versions", "v00001"))
    v2 = _inodes(os.path.join(root, "_versions", "v00002"))
    # every cell of the standing index survives into v2
    assert set(v1) <= set(v2)
    untouched = set(v1) - new_cells
    assert untouched, "fixture degenerate: every cell was touched by the shard"
    for cell in untouched:
        # hardlink carry: identical inodes, no bytes rewritten
        assert v2[cell] == v1[cell], f"{cell} was rewritten but not touched"
    for cell in new_cells & set(v1):
        # merged cells must be fresh files, not carried links
        assert v2[cell].isdisjoint(v1[cell]), f"{cell} was not re-merged"


def test_lifecycle_counters_are_the_state_machine(spark):
    """The literal columns pin the version counters: v4 current, two
    versions vacuumed (v1, v2 — including the restore's own source),
    two retained (v3, v4)."""
    row = (
        REGISTRY["store_lifecycle_preview"]
        .fn(spark, SF_DIR)
        .select("final_version", "n_versions_removed", "n_versions_retained")
        .first()
    )
    assert tuple(row) == (4, 2, 2)
