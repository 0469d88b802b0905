"""Bucketed-table support: co-located joins without a shuffle.

At 100 TB the dominant recurring cost of the star schema is shuffling
fact and bridge tables onto their join keys for every query. Bucketing
(`bucketBy` at write time) pre-partitions both sides identically ON
DISK, so an equi-join on the bucket key compiles to a zero-Exchange
sort-merge join — the Spark replacement for the reference's secondary
indexes on join columns (reference: sql/03_warehouse.sql:90-92,126,143)
that actually removes work at scale rather than accelerating lookups.

Bucketed tables must live in the session catalog (`saveAsTable`) —
bucket metadata is catalog state, not parquet metadata; that is the
one structural difference from the path-based `Store` tables.
tests/test_bucketing.py asserts the join plan is exchange-free and the
result identical to the path-based join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog
    table. Sorting within buckets lets the sort-merge join skip its
    sort step too (plan shows neither Exchange nor Sort)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A previous session may have left the managed location behind with
    # no catalog entry (the in-memory catalog dies with the session);
    # saveAsTable refuses to reuse such an orphan dir.
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(wh, table.lower()), ignore_errors=True)

    w = (
        df.repartition(buckets, key)  # one file per bucket, not per task
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left: str, right: str, key: str) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    compiles shuffle-free when bucket specs match."""
    return spark.table(left).join(spark.table(right), key)
