"""Bucketed co-located join tests: the join of two same-bucketed
tables must compile WITHOUT a shuffle (no Exchange in the executed
plan) and produce exactly the path-based join's result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.pipeline.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark):
    fact = spark.range(20_000).select(
        F.col("id").alias("encounter_key"),
        (F.pmod(F.col("id") * 7, F.lit(100))).alias("patient_key"),
    )
    bridge = spark.range(60_000).select(
        F.pmod(F.col("id"), F.lit(20_000)).alias("encounter_key"),
        F.pmod(F.col("id") * 13, F.lit(500)).alias("procedure_key"),
    )
    write_bucketed(fact, "fact_b", "encounter_key", buckets=8)
    write_bucketed(bridge, "bridge_b", "encounter_key", buckets=8)
    return fact, bridge


def test_bucketed_join_is_shuffle_free(spark, bucketed):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "fact_b", "bridge_b", "encounter_key")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_unbucketed(spark, bucketed):
    fact, bridge = bucketed
    expected = fact.join(bridge, "encounter_key")
    got = bucketed_join(spark, "fact_b", "bridge_b", "encounter_key")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
