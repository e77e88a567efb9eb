"""ParquetTable storage-layer semantics: K1/K2/K3/K7/K9/K10 plus the
pre-merge dedup invariant and replay idempotency (SURVEY.md §2.2, §7.5)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pse_stocks_etl_spark.store.parquet_table import ParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("d", T.DateType(), False),
        T.StructField("v", T.DoubleType(), True),
        T.StructField("extracted_at", T.TimestampType(), True),
    ]
)


def _rows(*specs):
    return [
        (k, dt.date.fromisoformat(d), v, dt.datetime.fromisoformat(ts))
        for k, d, v, ts in specs
    ]


@pytest.fixture
def table(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), SCHEMA)
    t.init_empty()
    return t


def test_init_empty_and_read(table):
    assert table.exists()
    assert table.read().count() == 0
    assert [f.name for f in table.read().schema.fields] == ["k", "d", "v", "extracted_at"]


def test_overwrite_replaces_everything(spark, table):
    a = spark.createDataFrame(_rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00")), SCHEMA)
    b = spark.createDataFrame(_rows(("B", "2024-01-02", 2.0, "2024-01-02T00:00:00")), SCHEMA)
    table.overwrite(a)
    table.overwrite(b)
    got = table.read().collect()
    assert [r.k for r in got] == ["B"]


def test_merge_insert_update(spark, table):
    t0 = spark.createDataFrame(
        _rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00"),
              ("B", "2024-01-01", 2.0, "2024-01-01T00:00:00")), SCHEMA)
    table.overwrite(t0)
    src = spark.createDataFrame(
        _rows(("B", "2024-01-01", 20.0, "2024-01-02T00:00:00"),   # update
              ("C", "2024-01-01", 3.0, "2024-01-02T00:00:00")),   # insert
        SCHEMA)
    table.merge(src, keys=("k", "d"))
    got = {r.k: r.v for r in table.read().collect()}
    assert got == {"A": 1.0, "B": 20.0, "C": 3.0}


def test_merge_freshness_guard_keeps_newer_target(spark, table):
    t0 = spark.createDataFrame(
        _rows(("A", "2024-01-01", 1.0, "2024-01-05T00:00:00")), SCHEMA)
    table.overwrite(t0)
    stale = spark.createDataFrame(
        _rows(("A", "2024-01-01", 99.0, "2024-01-02T00:00:00")), SCHEMA)
    table.merge(stale, keys=("k", "d"), freshness_col="extracted_at")
    assert table.read().collect()[0].v == 1.0  # stale source skipped (K3)


def test_merge_dedups_source_before_upsert(spark, table):
    src = spark.createDataFrame(
        _rows(("A", "2024-01-01", 5.0, "2024-01-01T00:00:00"),
              ("A", "2024-01-01", 9.0, "2024-01-01T00:00:00")), SCHEMA)
    table.merge(src, keys=("k", "d"), dedup_order=[F.col("v").desc()])
    got = table.read().collect()
    assert len(got) == 1 and got[0].v == 9.0  # A2: max-v row wins


def test_merge_replay_is_idempotent(spark, table):
    src = spark.createDataFrame(
        _rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00"),
              ("B", "2024-01-02", 2.0, "2024-01-01T00:00:00")), SCHEMA)
    table.merge(src, keys=("k", "d"), freshness_col="extracted_at")
    v1 = sorted(map(tuple, table.read().collect()))
    table.merge(src, keys=("k", "d"), freshness_col="extracted_at")
    assert sorted(map(tuple, table.read().collect())) == v1  # T4


def test_delete_condition_and_all(spark, table):
    t0 = spark.createDataFrame(
        _rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00"),
              ("B", "2024-01-02", 2.0, "2024-01-01T00:00:00")), SCHEMA)
    table.overwrite(t0)
    table.delete(F.col("k") == "A")
    assert [r.k for r in table.read().collect()] == ["B"]
    table.delete()
    assert table.read().count() == 0  # K7 delete-all


def test_vacuum_keeps_current(spark, table):
    for i in range(4):
        table.overwrite(
            spark.createDataFrame(_rows(("A", "2024-01-01", float(i), "2024-01-01T00:00:00")), SCHEMA)
        )
    removed = table.vacuum(retain_versions=2)
    assert removed  # old versions gone
    assert table.read().collect()[0].v == 3.0  # current still readable


def test_empty_source_merge_noop(spark, table):
    t0 = spark.createDataFrame(_rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00")), SCHEMA)
    table.overwrite(t0)
    before = table.history()
    empty = spark.createDataFrame([], SCHEMA)
    table.merge(empty, keys=("k", "d"))
    assert table.read().count() == 1  # empty-input edge (SURVEY §7.5 risk 5)
    # and no version burned: a no-op sync poll must not commit
    assert table.history() == before


PART_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("d", T.DateType(), False),
        T.StructField("v", T.DoubleType(), True),
        T.StructField("extracted_at", T.TimestampType(), True),
    ]
)


def test_partitioned_merge_rewrites_only_affected_partitions(spark, tmp_path):
    import os

    t = ParquetTable(spark, str(tmp_path / "pt"), PART_SCHEMA, partition_by=("d",))
    t.overwrite(
        spark.createDataFrame(
            _rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00"),
                  ("B", "2024-01-02", 2.0, "2024-01-01T00:00:00"),
                  ("C", "2024-01-03", 3.0, "2024-01-01T00:00:00")), PART_SCHEMA)
    )
    v1_dir = os.path.join(str(tmp_path / "pt"), "_versions", "v00001")
    inodes_before = {
        fn: os.stat(os.path.join(v1_dir, "d=2024-01-01", fn)).st_ino
        for fn in os.listdir(os.path.join(v1_dir, "d=2024-01-01"))
        if fn.endswith(".parquet")
    }
    # merge touches only 2024-01-02 and 2024-01-03
    src = spark.createDataFrame(
        _rows(("B", "2024-01-02", 20.0, "2024-01-02T00:00:00"),
              ("D", "2024-01-03", 4.0, "2024-01-02T00:00:00")), PART_SCHEMA)
    t.merge(src, keys=("k", "d"), freshness_col="extracted_at")
    got = {(r.k, str(r.d)): r.v for r in t.read().collect()}
    assert got == {
        ("A", "2024-01-01"): 1.0,
        ("B", "2024-01-02"): 20.0,
        ("C", "2024-01-03"): 3.0,
        ("D", "2024-01-03"): 4.0,
    }
    # untouched partition carried over as hardlinks (same inodes)
    v2_dir = os.path.join(str(tmp_path / "pt"), "_versions", "v00002")
    inodes_after = {
        fn: os.stat(os.path.join(v2_dir, "d=2024-01-01", fn)).st_ino
        for fn in os.listdir(os.path.join(v2_dir, "d=2024-01-01"))
        if fn.endswith(".parquet")
    }
    assert inodes_after == inodes_before


def test_optimize_clusters_and_preserves_content(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "opt"), PART_SCHEMA)
    t.overwrite(
        spark.createDataFrame(
            _rows(("B", "2024-01-02", 2.0, "2024-01-01T00:00:00"),
                  ("A", "2024-01-01", 1.0, "2024-01-01T00:00:00"),
                  ("C", "2024-01-03", 3.0, "2024-01-01T00:00:00")), PART_SCHEMA)
    )
    before = sorted(map(tuple, t.read().collect()))
    t.optimize(cluster_by=("k",))
    assert sorted(map(tuple, t.read().collect())) == before


def test_partitioned_merge_null_partition_falls_back(spark, tmp_path):
    """Source rows with NULL partition values must take the full-merge
    path (isin() pruning never matches NULL) and still merge correctly."""
    nullable = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("d", T.DateType(), True),
            T.StructField("v", T.DoubleType(), True),
            T.StructField("extracted_at", T.TimestampType(), True),
        ]
    )
    t = ParquetTable(spark, str(tmp_path / "np"), nullable, partition_by=("d",))
    t.overwrite(
        spark.createDataFrame(
            _rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00")), nullable)
    )
    src = spark.createDataFrame(
        [("B", None, 2.0, dt.datetime(2024, 1, 2))], nullable
    )
    t.merge(src, keys=("k", "d"))
    got = sorted((r.k, r.d, r.v) for r in t.read().collect())
    assert got == [("A", dt.date(2024, 1, 1), 1.0), ("B", None, 2.0)]
    # replay converges (the NULL-key row matches itself)
    t.merge(src, keys=("k", "d"))
    assert t.read().count() == 2


def test_merge_set_on_write_audit_column(spark, table):
    """Audit columns set inside the merge (the engine's replacement for
    the reference's updated_at triggers, SURVEY §1.5)."""
    t0 = spark.createDataFrame(
        _rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00"),
              ("B", "2024-01-01", 2.0, "2024-01-01T00:00:00")), SCHEMA)
    table.overwrite(t0)
    src = spark.createDataFrame(
        _rows(("B", "2024-01-01", 20.0, "2024-01-05T00:00:00")), SCHEMA)
    audit_ts = dt.datetime(2024, 2, 1)
    table.merge(
        src, keys=("k", "d"),
        set_on_write={"extracted_at": F.lit(audit_ts).cast("timestamp")},
    )
    got = {r.k: r.extracted_at for r in table.read().collect()}
    assert got["B"] == audit_ts            # written row stamped
    assert got["A"] == dt.datetime(2024, 1, 1)  # untouched row keeps its value


def test_delete_keeps_null_predicate_rows(spark, table):
    """SQL/Delta DELETE removes only predicate-TRUE rows; a NULL
    predicate (v IS NULL here) must keep the row (ADVICE r1)."""
    t0 = spark.createDataFrame(
        _rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00"))
        + [("N", dt.date(2024, 1, 2), None, dt.datetime(2024, 1, 1))],
        SCHEMA,
    )
    table.overwrite(t0)
    table.delete(F.col("v") > 5.0)  # NULL > 5.0 evaluates NULL, not TRUE
    assert sorted(r.k for r in table.read().collect()) == ["A", "N"]
    table.delete(F.col("v") <= 5.0)
    assert [r.k for r in table.read().collect()] == ["N"]


def test_partitioned_merge_hive_escaped_partition_values(spark, tmp_path):
    """String partition values with characters Spark Hive-escapes in dir
    names (':' -> %3A) must not resurrect the stale pre-merge partition
    via the hardlink carry (ADVICE r1: exclusion set now derives from
    the dirs Spark actually wrote, not str(v))."""
    schema = T.StructType(
        [
            T.StructField("sym", T.StringType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    t = ParquetTable(spark, str(tmp_path / "esc"), schema, partition_by=("sym",))
    t.overwrite(
        spark.createDataFrame([("a:b", 1.0), ("plain", 2.0), ("x%y", 3.0)], schema)
    )
    src = spark.createDataFrame([("a:b", 10.0), ("x%y", 30.0)], schema)
    t.merge(src, keys=("sym",))
    got = sorted((r.sym, r.v) for r in t.read().collect())
    # the old a:b / x%y rows must NOT be duplicated alongside the merged ones
    assert got == [("a:b", 10.0), ("plain", 2.0), ("x%y", 30.0)]
    # replay converges too
    t.merge(src, keys=("sym",))
    assert t.read().count() == 3


def test_time_travel_read_and_history(table, spark):
    v1 = _rows(("a", "2024-01-01", 1.0, "2024-01-01T00:00:00"))
    v2 = _rows(("a", "2024-01-01", 2.0, "2024-01-02T00:00:00"),
               ("b", "2024-01-02", 3.0, "2024-01-02T00:00:00"))
    table.overwrite(spark.createDataFrame(v1, SCHEMA))
    table.overwrite(spark.createDataFrame(v2, SCHEMA))
    assert table.history() == [1, 2, 3]  # init_empty is v1
    assert table.read().count() == 2
    assert table.read(version=2).collect()[0].v == 1.0
    assert table.read(version=1).count() == 0
    # vacuum reclaims old versions; time travel then reports what's left
    table.vacuum(retain_versions=1)
    with pytest.raises(ValueError, match="not retained"):
        table.read(version=1)
    assert table.read(version=3).count() == 2


def test_merge_schema_evolution(table, spark, tmp_path):
    table.overwrite(
        spark.createDataFrame(
            _rows(("a", "2024-01-01", 1.0, "2024-01-01T00:00:00")), SCHEMA
        )
    )
    evolved = T.StructType(
        SCHEMA.fields + [T.StructField("note", T.StringType(), True)]
    )
    src = spark.createDataFrame(
        [
            ("a", dt.date(2024, 1, 1), 9.0, dt.datetime(2024, 1, 2), "upd"),
            ("b", dt.date(2024, 1, 2), 2.0, dt.datetime(2024, 1, 2), "new"),
        ],
        evolved,
    )
    table.merge(src, keys=("k", "d"), evolve_schema=True)
    out = {r.k: r for r in table.read().collect()}
    assert set(table.read().columns) == {"k", "d", "v", "extracted_at", "note"}
    assert out["a"].note == "upd" and out["a"].v == 9.0
    assert out["b"].note == "new"
    # A fresh handle constructed with the ORIGINAL schema sees the
    # evolved one (the table owns its schema, like the Delta log).
    t2 = ParquetTable(spark, table.path, SCHEMA)
    assert "note" in t2.read().columns
    # Time travel replays the schema AS OF that version (Delta
    # versionAsOf semantics): the pre-evolution version has no `note`.
    old = t2.read(version=2)
    assert "note" not in old.columns
    assert old.count() == 1


def test_schema_evolution_atomic_on_failed_commit(spark, tmp_path):
    t = ParquetTable(
        spark, str(tmp_path / "evo"), SCHEMA, constraints={"v_pos": "v > 0"}
    )
    t.overwrite(
        spark.createDataFrame(
            _rows(("a", "2024-01-01", 1.0, "2024-01-01T00:00:00")), SCHEMA
        )
    )
    evolved = T.StructType(
        SCHEMA.fields + [T.StructField("note", T.StringType(), True)]
    )
    bad = spark.createDataFrame(
        [("b", dt.date(2024, 1, 2), -5.0, dt.datetime(2024, 1, 2), "boom")],
        evolved,
    )
    with pytest.raises(ValueError, match="v_pos"):
        t.merge(bad, keys=("k", "d"), evolve_schema=True)
    # the failed commit must not leave an evolved schema behind —
    # neither in memory, on disk, nor visible to a fresh handle
    assert "note" not in {f.name for f in t.schema.fields}
    assert "note" not in t.read().columns
    assert "note" not in ParquetTable(spark, t.path, SCHEMA).read().columns


def test_history_ignores_stray_version_artifacts(spark, tmp_path):
    import os

    t = ParquetTable(spark, str(tmp_path / "stray"), SCHEMA)
    t.overwrite(
        spark.createDataFrame(
            _rows(("a", "2024-01-01", 1.0, "2024-01-01T00:00:00")), SCHEMA
        )
    )
    # a partial artifact and a stray file must not break history/vacuum
    os.makedirs(os.path.join(t.path, "_versions", "v_tmp"))
    with open(os.path.join(t.path, "_versions", "junk.txt"), "w") as f:
        f.write("x")
    assert t.history() == [1]
    assert t.read().count() == 1
    assert t.vacuum(retain_versions=1) == []


def test_check_constraint_blocks_bad_commit(spark, tmp_path):
    t = ParquetTable(
        spark, str(tmp_path / "c"), SCHEMA, constraints={"v_pos": "v > 0"}
    )
    t.init_empty()
    ok = _rows(("a", "2024-01-01", 1.0, "2024-01-01T00:00:00"))
    t.overwrite(spark.createDataFrame(ok, SCHEMA))
    assert t.read().count() == 1
    bad = _rows(("b", "2024-01-02", -5.0, "2024-01-02T00:00:00"))
    with pytest.raises(ValueError, match="v_pos"):
        t.overwrite(spark.createDataFrame(bad, SCHEMA))
    assert t.read().count() == 1  # failed commit left the table untouched
    # NULL predicate passes (SQL CHECK semantics), like Delta.
    nullv = [("c", dt.date(2024, 1, 3), None, dt.datetime(2024, 1, 3))]
    t.merge(spark.createDataFrame(nullv, SCHEMA), keys=("k", "d"))
    assert t.read().count() == 2


def test_commit_is_atomic_for_concurrent_readers(table, spark):
    """Pointer-swap atomicity: a reader that resolved the CURRENT
    pointer before a new commit keeps reading its complete old version
    (never a half-written directory), and a fresh resolve sees the new
    one. This is the single-writer Delta-log-style guarantee the store
    documents."""
    v1 = _rows(("a", "2024-01-01", 1.0, "2024-01-01T00:00:00"))
    table.overwrite(spark.createDataFrame(v1, SCHEMA))
    old_reader = table.read()  # plan bound to the old version dir
    old_version = table.current_version()
    v2 = _rows(
        ("b", "2024-01-02", 2.0, "2024-01-02T00:00:00"),
        ("c", "2024-01-03", 3.0, "2024-01-03T00:00:00"),
    )
    table.overwrite(spark.createDataFrame(v2, SCHEMA))
    # The pre-commit reader still sees exactly the old snapshot...
    assert [r.k for r in old_reader.collect()] == ["a"]
    # ...while a new resolve sees the new version, fully.
    assert table.current_version() == old_version + 1
    assert sorted(r.k for r in table.read().collect()) == ["b", "c"]


# ----------------------------------------------------- restore / OCC --
def test_restore_recommits_old_version(spark, table):
    a = spark.createDataFrame(_rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00")), SCHEMA)
    b = spark.createDataFrame(_rows(("B", "2024-01-02", 2.0, "2024-01-02T00:00:00")), SCHEMA)
    table.overwrite(a)           # v2 (v1 = init_empty)
    v_a = table.current_version()
    table.overwrite(b)           # v3
    table.restore(v_a)           # v4 == v2's content
    assert [r.k for r in table.read().collect()] == ["A"]
    # history preserved: restore is a commit, nothing deleted
    assert table.history() == [1, 2, 3, 4]
    # the bad state is still retained and can be restored away again
    table.restore(3)
    assert [r.k for r in table.read().collect()] == ["B"]


def test_restore_replays_pre_evolution_schema(spark, table):
    a = spark.createDataFrame(_rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00")), SCHEMA)
    table.overwrite(a)
    v_before = table.current_version()
    evolved = T.StructType(list(SCHEMA.fields) + [T.StructField("extra", T.LongType(), True)])
    src = spark.createDataFrame(
        [("A", dt.date(2024, 1, 1), 9.0, dt.datetime(2024, 1, 2), 7)], evolved
    )
    table.merge(src, keys=["k", "d"], evolve_schema=True)
    assert "extra" in [f.name for f in table.read().schema.fields]
    table.restore(v_before)
    assert "extra" not in [f.name for f in table.read().schema.fields]


def test_concurrent_overwrite_with_expected_version_conflicts(spark, tmp_path):
    from pse_stocks_etl_spark.store.parquet_table import ConcurrentWriteError

    path = str(tmp_path / "occ")
    t1 = ParquetTable(spark, path, SCHEMA)
    t1.init_empty()
    t2 = ParquetTable(spark, path, SCHEMA)
    base = t2.current_version()
    a = spark.createDataFrame(_rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00")), SCHEMA)
    b = spark.createDataFrame(_rows(("B", "2024-01-02", 2.0, "2024-01-02T00:00:00")), SCHEMA)
    t1.overwrite(a)  # advances past t2's snapshot
    with pytest.raises(ConcurrentWriteError):
        t2.overwrite(b, expected_version=base)
    # blind overwrite (no expected_version) still allowed by design
    t2.overwrite(b)
    assert [r.k for r in t2.read().collect()] == ["B"]


def test_concurrent_merge_retries_and_preserves_both_writes(spark, tmp_path):
    """Two handles merge different keys concurrently: the second commit
    sees the version advance, re-reads, re-merges, and both rows land —
    Delta's retry semantics for non-overlapping writers."""
    from pse_stocks_etl_spark.store import parquet_table as ptmod

    path = str(tmp_path / "occ2")
    t1 = ParquetTable(spark, path, SCHEMA)
    t1.init_empty()
    t2 = ParquetTable(spark, path, SCHEMA)

    a = spark.createDataFrame(_rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00")), SCHEMA)
    b = spark.createDataFrame(_rows(("B", "2024-01-02", 2.0, "2024-01-02T00:00:00")), SCHEMA)

    # Interleave: t2 snapshots, then t1 commits, then t2 tries to commit.
    orig_claim = ptmod.ParquetTable._claim_version
    state = {"interposed": False}

    def racing_claim(self, expected_version):
        if self is t2 and not state["interposed"]:
            state["interposed"] = True
            t1.merge(a, keys=["k", "d"])  # concurrent writer wins first
        return orig_claim(self, expected_version)

    ptmod.ParquetTable._claim_version = racing_claim
    try:
        t2.merge(b, keys=["k", "d"])  # retries internally
    finally:
        ptmod.ParquetTable._claim_version = orig_claim
    got = sorted(r.k for r in t2.read().collect())
    assert got == ["A", "B"]


def test_conflict_without_retries_raises(spark, tmp_path):
    from pse_stocks_etl_spark.store import parquet_table as ptmod
    from pse_stocks_etl_spark.store.parquet_table import ConcurrentWriteError

    path = str(tmp_path / "occ3")
    t1 = ParquetTable(spark, path, SCHEMA)
    t1.init_empty()
    t2 = ParquetTable(spark, path, SCHEMA)
    a = spark.createDataFrame(_rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00")), SCHEMA)
    b = spark.createDataFrame(_rows(("B", "2024-01-02", 2.0, "2024-01-02T00:00:00")), SCHEMA)

    orig_claim = ptmod.ParquetTable._claim_version
    state = {"interposed": False}

    def racing_claim(self, expected_version):
        if self is t2 and not state["interposed"]:
            state["interposed"] = True
            t1.merge(a, keys=["k", "d"])
        return orig_claim(self, expected_version)

    ptmod.ParquetTable._claim_version = racing_claim
    try:
        with pytest.raises(ConcurrentWriteError):
            t2.merge(b, keys=["k", "d"], conflict_retries=0)
    finally:
        ptmod.ParquetTable._claim_version = orig_claim


def test_version_claim_is_exclusive(spark, tmp_path):
    """The O_CREAT|O_EXCL claim marker: a pre-existing claim for the
    next version makes the commit fail instead of silently stacking a
    second writer onto the same version number."""
    import os

    from pse_stocks_etl_spark.store.parquet_table import ConcurrentWriteError

    path = str(tmp_path / "claim")
    t = ParquetTable(spark, path, SCHEMA)
    t.init_empty()
    nxt = t.current_version() + 1
    open(os.path.join(path, "_versions", f".claim_v{nxt:05d}"), "w").close()
    a = spark.createDataFrame(_rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00")), SCHEMA)
    with pytest.raises(ConcurrentWriteError):
        t.overwrite(a)


def test_partitioned_merge_conflict_retry_preserves_both(spark, tmp_path):
    """OCC on the partition-pruned merge path: a concurrent writer on a
    DIFFERENT partition lands between snapshot and commit; the retry
    re-reads and both partitions' rows survive (including the
    hardlinked untouched one)."""
    from pse_stocks_etl_spark.store import parquet_table as ptmod

    path = str(tmp_path / "ptocc")
    t1 = ParquetTable(spark, path, PART_SCHEMA, partition_by=("d",))
    t1.overwrite(
        spark.createDataFrame(
            _rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00"),
                  ("B", "2024-01-02", 2.0, "2024-01-01T00:00:00")), PART_SCHEMA)
    )
    t2 = ParquetTable(spark, path, PART_SCHEMA, partition_by=("d",))
    s1 = spark.createDataFrame(
        _rows(("A", "2024-01-01", 10.0, "2024-01-02T00:00:00")), PART_SCHEMA)
    s2 = spark.createDataFrame(
        _rows(("B", "2024-01-02", 20.0, "2024-01-02T00:00:00")), PART_SCHEMA)

    orig_claim = ptmod.ParquetTable._claim_version
    state = {"interposed": False}

    def racing_claim(self, expected_version):
        if self is t2 and not state["interposed"]:
            state["interposed"] = True
            t1.merge(s1, keys=("k", "d"), freshness_col="extracted_at")
        return orig_claim(self, expected_version)

    ptmod.ParquetTable._claim_version = racing_claim
    try:
        t2.merge(s2, keys=("k", "d"), freshness_col="extracted_at")
    finally:
        ptmod.ParquetTable._claim_version = orig_claim
    got = {(r.k, str(r.d)): r.v for r in t2.read().collect()}
    assert got == {("A", "2024-01-01"): 10.0, ("B", "2024-01-02"): 20.0}


def test_restore_partitioned_version_with_hardlinked_dirs(spark, tmp_path):
    """RESTORE of a version whose partition dirs were carried by
    hardlink: the restored commit must materialize the full table
    content of that version."""
    t = ParquetTable(spark, str(tmp_path / "ptr"), PART_SCHEMA, partition_by=("d",))
    t.overwrite(
        spark.createDataFrame(
            _rows(("A", "2024-01-01", 1.0, "2024-01-01T00:00:00"),
                  ("B", "2024-01-02", 2.0, "2024-01-01T00:00:00")), PART_SCHEMA)
    )
    v_good = t.current_version()
    t.merge(
        spark.createDataFrame(
            _rows(("B", "2024-01-02", 99.0, "2024-01-02T00:00:00")), PART_SCHEMA),
        keys=("k", "d"),
        freshness_col="extracted_at",
    )  # pruned commit: d=2024-01-01 hardlinked into the new version
    t.restore(v_good)
    got = {(r.k, str(r.d)): r.v for r in t.read().collect()}
    assert got == {("A", "2024-01-01"): 1.0, ("B", "2024-01-02"): 2.0}
