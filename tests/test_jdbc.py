"""JDBC connector round-trip tests (S4's database half) against the
Derby engine embedded in the Spark JVM — write a fixture slice out
over JDBC, read it back plain AND range-partitioned, and check that
filters push down to the remote side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.sources.catalog import load_table
from efiche_data_pipeline_spark.sources.jdbc import derby_url, read_jdbc, write_jdbc

from .conftest import SMOKE_SF_DIR


@pytest.fixture(scope="module")
def jdbc_db(spark, tmp_path_factory):
    """An embedded Derby database seeded with the orders fixture."""
    url = derby_url(str(tmp_path_factory.mktemp("derby") / "db"))
    orders = load_table(spark, SMOKE_SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    write_jdbc(
        orders,
        url,
        "orders",
        mode="overwrite",
        column_types="o_orderstatus VARCHAR(4)",
    )
    return url, orders


def _normalized(df):
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def test_jdbc_roundtrip(spark, jdbc_db):
    url, orders = jdbc_db
    back = read_jdbc(spark, url, "orders")
    # Derby uppercases unquoted identifiers; compare case-insensitively.
    back = back.toDF(*[c.lower() for c in back.columns])
    assert _normalized(back) == _normalized(orders)


def test_jdbc_partitioned_read_equals_plain(spark, jdbc_db):
    url, orders = jdbc_db
    part = read_jdbc(
        spark, url, "orders", partition_col="o_orderkey", num_partitions=4
    )
    part = part.toDF(*[c.lower() for c in part.columns])
    assert part.rdd.getNumPartitions() == 4
    assert _normalized(part) == _normalized(orders)


def test_jdbc_filter_pushdown(spark, jdbc_db):
    url, orders = jdbc_db
    df = read_jdbc(spark, url, "orders").filter(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The equality filter must reach the JDBC scan (remote WHERE), not
    # run as a post-scan Spark filter only.
    assert "EqualTo(o_orderstatus,F)" in plan
    want = orders.filter(F.col("o_orderstatus") == "F").count()
    assert df.count() == want
