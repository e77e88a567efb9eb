"""Round-21 tests: store-backed incremental corpus admission.

The oracle gate (corpus_build's full-rebuild SQL, strict value-hash)
covers the natural fixtures; these tests pin what the fixtures cannot:
the flipped-bucket revision path against the PERSISTED store state, the
array-form MinHash/bucket helpers against their explode-groupBy twins,
and the durability contract (memory-cache clears must not lose the
on-disk store).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def flip_corpus(spark, tmp_path_factory):
    """Same engineered corpus as tests/test_round20.py: LSH bucket
    widths cross a cap of 33 exactly when the batch lands."""
    import os

    CORE = " ".join(f"w{i}" for i in range(20))
    rows = [
        (i, f"{CORE} uniq{i}", "en", "srcA", 100) for i in range(40)
    ] + [
        (40, "totally different text about other things entirely", "en", "srcB", 50),
        (41, "another unrelated document body with its own words", "en", "srcB", 50),
    ]
    sf = str(tmp_path_factory.mktemp("flip_sf21"))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    return sf


def _drop_store(sf_dir):
    """Forget any durable store seeded for sf_dir (cap monkeypatches
    change the standing state, so a store seeded under one cap must not
    leak into tests running under another)."""
    from pse_stocks_etl_spark.plans.round21_queries import _STORE_ROOTS

    for key in [k for k in _STORE_ROOTS if k[1] == sf_dir]:
        _STORE_ROOTS.pop(key)


def test_array_minhash_equals_grouped_form(spark):
    """minhash_sig_array / band_bucket_array == the explode-groupBy
    _minhash_sig / _band_buckets, doc for doc, on the natural fixture —
    the equality the featurized batch projection rests on."""
    from pse_stocks_etl_spark.plans.llm_queries import (
        _band_buckets,
        _minhash_sig,
        _shingle_explode,
        band_bucket_array,
        minhash_sig_array,
        shingle_array,
    )

    docs = (
        spark.read.parquet(SF_DIR + "/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    grouped = _band_buckets(_minhash_sig(_shingle_explode(spark, SF_DIR)))
    arr = (
        docs.select("doc_id", shingle_array(F.col("text")).alias("sh_arr"))
        .filter(F.size("sh_arr") > 0)
        .select(
            "doc_id",
            F.explode(
                band_bucket_array(minhash_sig_array(F.col("sh_arr")))
            ).alias("bk"),
        )
    )
    a = {(r.doc_id, r.bk) for r in grouped.collect()}
    b = {(r.doc_id, r.bk) for r in arr.collect()}
    assert a == b and len(a) > 0


def test_store_increment_matches_rebuild_on_natural_data(spark):
    """Spark-vs-Spark equality at the natural test SF (covers the
    new-reps contamination path: the fixture's batch carries unseen
    benchmark text)."""
    from pse_stocks_etl_spark import plans

    rebuild = sorted(
        map(tuple, plans.REGISTRY["corpus_build"].fn(spark, SF_DIR).collect())
    )
    incr = sorted(
        map(
            tuple,
            plans.REGISTRY["corpus_build_increment_store"].fn(spark, SF_DIR).collect(),
        )
    )
    assert incr == rebuild and len(rebuild) > 0


def test_store_increment_equals_rebuild_under_bucket_flips(
    spark, flip_corpus, monkeypatch
):
    """The store-backed admission must revoke persisted near-dup flags
    exactly where the union-width cap kills their witness buckets —
    the revision path is dead at natural SFs, so this is where it
    executes against REAL persisted state."""
    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans import llm_queries
    from pse_stocks_etl_spark.plans.llm_queries import clear_working_set_caches

    monkeypatch.setattr(llm_queries, "LSH_BUCKET_CAP", 33)
    clear_working_set_caches()
    _drop_store(flip_corpus)
    try:
        rebuild = sorted(
            map(tuple, plans.REGISTRY["corpus_build"].fn(spark, flip_corpus).collect())
        )
        incr = sorted(
            map(
                tuple,
                plans.REGISTRY["corpus_build_increment_store"]
                .fn(spark, flip_corpus)
                .collect(),
            )
        )
        assert incr == rebuild and len(rebuild) > 0
    finally:
        clear_working_set_caches()
        _drop_store(flip_corpus)


def test_store_root_survives_cache_clear(spark):
    """Durability contract: clearing the MEMORY working-set caches must
    not delete the on-disk store — the next context re-READS the same
    root instead of re-deriving the standing build."""
    from pse_stocks_etl_spark.plans import round21_queries as r21
    from pse_stocks_etl_spark.plans.llm_queries import clear_working_set_caches

    ctx1 = r21._standing_ctx(spark, SF_DIR)
    root1 = ctx1.root
    clear_working_set_caches()
    ctx2 = r21._standing_ctx(spark, SF_DIR)
    assert ctx2.root == root1, "store was re-seeded after a memory-cache clear"
    assert ctx2 is not ctx1, "handle must be rebuilt (frames were unpersisted)"


def test_store_tables_are_versioned_parquet_tables(spark):
    """The standing state is a real ParquetTable store (versioned
    commit protocol), not loose parquet files."""
    import os

    from pse_stocks_etl_spark.plans import round21_queries as r21
    from pse_stocks_etl_spark.store.parquet_table import ParquetTable
    from pyspark.sql import types as T

    root = r21._standing_ctx(spark, SF_DIR).root
    for name in (r21._T_KEEPERS, r21._T_KCAND, r21._T_BK, r21._T_SH_ARR):
        t = ParquetTable(spark, os.path.join(root, name), T.StructType([]))
        assert t.exists()
        assert t.current_version() >= 1
