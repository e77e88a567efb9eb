"""Physical-plan assertions: the scale properties SURVEY.md §4/§7.5
promise must be visible in `explain` output — filters reach the parquet
scan, small dimensions broadcast, scans prune columns. These lock the
100 TB posture so a refactor can't silently regress it."""

from __future__ import annotations

import re

from pse_stocks_etl_spark import plans


def _plan(spark, sf_dir, name: str) -> str:
    df = plans.REGISTRY[name].fn(spark, sf_dir)
    jvm = spark.sparkContext._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_pricing_summary_pushes_filter_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    # The shipdate predicate must appear in the parquet scan's pushed
    # filters, not only as a post-scan Filter node.
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters:.*l_shipdate", plan), plan[:2000]


def test_pricing_summary_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in plan"
    cols = m.group(1)
    assert "l_comment" not in cols
    assert "l_partkey" not in cols  # unused by the query → pruned


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "star_join_revenue")
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_flagship_broadcasts_dimension(spark, sf_dir):
    plan = _plan(spark, sf_dir, "flagship_latest_price")
    assert "BroadcastHashJoin" in plan


def test_semi_and_anti_joins_planned(spark, sf_dir):
    semi = _plan(spark, sf_dir, "semi_join_in")
    anti = _plan(spark, sf_dir, "anti_join_uptodate")
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_watermark_agg_has_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "watermark_per_key")
    assert "partial_max" in plan  # map-side combine before the shuffle


def test_sessionization_single_exchange(spark, sf_dir):
    # Both windows + the final agg must reuse ONE hash exchange on
    # user_id (orderBy-compatible windows share the sort).
    plan = _plan(spark, sf_dir, "sessionization")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:3000]


def test_dedup_argmax_prunes_topk_before_shuffle(spark, sf_dir):
    # row_number()<=k is planned as WindowGroupLimit on BOTH sides of the
    # exchange — the map-side instance prunes each partition to its local
    # top-k before shuffling (the partial-aggregation analog for windows).
    plan = _plan(spark, sf_dir, "dedup_argmax")
    limits = re.findall(r"\(\d+\) WindowGroupLimit", plan)
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(limits) == 2 and len(exchanges) == 1, plan[:3000]


def test_parquet_table_partition_pruning(spark, tmp_path):
    """A date filter on the partitioned fact table must prune partitions
    at planning time (PartitionFilters), not scan-and-filter."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pse_stocks_etl_spark.store.parquet_table import ParquetTable

    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("d", T.DateType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    t = ParquetTable(spark, str(tmp_path / "pp"), schema, partition_by=("d",))
    rows = [
        ("A", dt.date(2024, 1, 1), 1.0),
        ("B", dt.date(2024, 1, 2), 2.0),
        ("C", dt.date(2024, 1, 3), 3.0),
    ]
    t.overwrite(spark.createDataFrame(rows, schema))
    df = t.read().filter(F.col("d") == "2024-01-02")
    jvm = spark.sparkContext._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert re.search(r"PartitionFilters:.*d.*2024-01-02|PartitionFilters:.*isnotnull\(d", plan), plan[:2000]
    assert df.count() == 1


def test_zorder_optimize_skips_files_on_both_keys(spark, tmp_path):
    """Z-order proof (VERDICT r1 item 8): after optimize on (a, b), a
    point predicate on EITHER key alone must be satisfiable from a
    strict subset of files via parquet footer min/max — lexicographic
    (a, b) sort would cluster only `a`, leaving `b` unprunable."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from pse_stocks_etl_spark.store.parquet_table import ParquetTable

    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    grid = [(a, b, float(a * 64 + b)) for a in range(64) for b in range(64)]
    t = ParquetTable(spark, str(tmp_path / "z"), schema)
    # shuffled initial layout: every file spans ~the full range of both keys
    t.overwrite(spark.createDataFrame(grid, schema).repartition(16))
    t.optimize(cluster_by=("a", "b"), target_files=32)

    vdir = os.path.join(str(tmp_path / "z"), "_versions", "v00002")
    files = sorted(glob.glob(os.path.join(vdir, "*.parquet")))
    assert len(files) >= 16

    def n_candidate_files(col: str, val: int) -> int:
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    c = row_group.column(ci)
                    if c.path_in_schema == col:
                        s = c.statistics
                        if s is not None and s.min <= val <= s.max:
                            hit += 1
                            break
                else:
                    continue
                break
        return hit

    n = len(files)
    for col in ("a", "b"):
        cand = n_candidate_files(col, 17)
        assert cand < n // 2, f"{col}: {cand}/{n} files remain after pruning"


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """DPP proof: a fact table partitioned on the join key, joined to a
    small dimension with a selective filter, must plan a dynamic
    pruning subquery on the fact scan — at 100 TB this is what keeps a
    star join from reading every date partition when the dim filter
    only selects a few."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pse_stocks_etl_spark.store.parquet_table import ParquetTable

    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("d", T.DateType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    t = ParquetTable(spark, str(tmp_path / "dpp"), schema, partition_by=("d",))
    days = [dt.date(2024, 1, i + 1) for i in range(10)]
    t.overwrite(
        spark.createDataFrame([(f"k{i}", d, float(i)) for i, d in enumerate(days)], schema)
    )
    dim = spark.createDataFrame(
        [(d, "keep" if d.day <= 2 else "drop") for d in days], "d date, tag string"
    )
    fact = t.read()
    joined = fact.join(dim.filter(F.col("tag") == "keep"), "d").agg(F.sum("v"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_no_python_udf_in_any_registered_plan(spark, sf_dir):
    """Registry-wide §2.10 guard at the PLAN level (stronger than the
    source grep): no registered query may contain a row-at-a-time
    Python eval node, and Arrow-batched Python nodes are allowed only
    in the queries that declare them (grouped-map medians, multimodal
    decode plumbing, the Python DataSource scan)."""
    arrow_ok = {
        "pandas_median_per_segment",   # applyInPandas grouped-map
        "multimodal_decode",           # mapInPandas decode plumbing
        "multimodal_frame_sample",     # mapInPandas frame expansion
        "multimodal_wav_decode",       # mapInPandas REAL WAV codec
        "multimodal_bmp_decode",       # mapInPandas REAL BMP codec
        "multimodal_y4m_frames",       # mapInPandas REAL Y4M frame sampling
        "multimodal_wav_downsample",   # mapInPandas WAV transcode round-trip
        "multimodal_bmp_resize",       # mapInPandas BMP resize round-trip
        "multimodal_png_decode",       # mapInPandas REAL PNG codec (r8 promotion)
        "multimodal_jpeg_decode",      # mapInPandas REAL baseline JPEG codec (r8)
        "multimodal_gif_decode",       # mapInPandas REAL GIF/LZW codec (r8)
        "multimodal_gif_resize",       # mapInPandas GIF resize round-trip (r8)
        "multimodal_mp4_metadata",     # mapInPandas REAL MP4 container parse (r9)
        "multimodal_mp4_frame_sample", # mapInPandas MP4 sample-table explode (r9)
        "multimodal_pair_filter",      # joins the MP4 container parse (r9)
        "docs_warc_records",           # mapInPandas REAL WARC record walk (r9)
        "docs_warc_gz_records",        # mapInPandas gzip-member .warc.gz walk (r9)
        "docs_utf8_validate",          # mapInPandas byte-level UTF-8 validation (r9)
        "docs_mime_census",            # mapInPandas magic-sniff + parser routing (r9)
        "datasource_price_scan",       # Python DataSource scan
        "datasource_stream_prices",    # Python streaming DataSource (r8 promotion)
    }
    # r13: the sweep builds 301 plans and was the suite's second-
    # slowest test (~200s solo — fn() pays expression construction,
    # Catalyst analysis and any checkpoint-materialization jobs per
    # query). Plan building is JVM-side work, the working-set caches
    # are thread-safe with in-flight build dedup (_PersistedLRU), and
    # the drives' memory sinks are uuid-named, so the sweep
    # parallelizes cleanly on driver threads (~4x).
    from concurrent.futures import ThreadPoolExecutor

    def check(name: str):
        plan = _plan(spark, sf_dir, name)
        if "BatchEvalPython" in plan:
            return name, "BatchEvalPython (row-at-a-time UDF)"
        if name not in arrow_ok and re.search(
            r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan
        ):
            return name, "undeclared Arrow python node"
        return None

    with ThreadPoolExecutor(max_workers=8) as pool:
        offenders = dict(r for r in pool.map(check, plans.REGISTRY) if r)
    assert not offenders, offenders
