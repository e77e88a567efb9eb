"""S6 JDBC scan coverage (VERDICT r1 item 9): a real round-trip through
Spark's JDBC source using the Derby embedded driver that ships inside
pyspark's own jars — no external database or network needed. Proves the
partitioned reader generates one task per stride predicate and returns
the full, correct table."""

from __future__ import annotations

import pytest

from pse_stocks_etl_spark.sources.catalog import read_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_partitioned_scan_roundtrip(spark, derby_url):
    src = spark.range(0, 1000).selectExpr("id", "id % 7 AS grp")
    src.write.format("jdbc").option("url", derby_url).option(
        "dbtable", "events"
    ).option("driver", DRIVER).mode("overwrite").save()

    got = read_jdbc(
        spark,
        derby_url,
        "events",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=1000,
        driver=DRIVER,
    )
    # the partitioned reader must fan the scan out into one task per
    # stride predicate — that's the whole point of S6 at scale
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 1000
    assert got.agg({"id": "sum"}).collect()[0][0] == 499500
    # stride predicates must not drop or duplicate boundary rows
    assert got.select("id").distinct().count() == 1000


def test_jdbc_unpartitioned_scan_single_connection(spark, derby_url):
    got = read_jdbc(spark, derby_url, "events", driver=DRIVER)
    assert got.rdd.getNumPartitions() == 1  # documented single-connection path
    assert got.count() == 1000
