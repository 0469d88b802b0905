"""KMV distinct-count sketch tests (operators/sketch.py): exact below
k, statistically sane above k, and the bounded-state plan shape
(partial WindowGroupLimit before the shuffle — the sketch's
mergeability, executed by Catalyst)."""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.sketch import kmv_distinct


def _est(spark, n_distinct, k):
    df = spark.range(n_distinct * 3).select(
        F.lit("g").alias("g"),
        (F.col("id") % n_distinct).cast("string").alias("v"),  # 3x dupes
    )
    return kmv_distinct(df, ["g"], "v", k=k).collect()[0].kmv_estimate


def test_kmv_exact_below_k(spark):
    assert _est(spark, 40, k=64) == 40


def test_kmv_estimates_above_k(spark):
    got = _est(spark, 5000, k=256)
    # stderr ≈ 1/sqrt(k-2) ≈ 6.3%; 4σ bound keeps this deterministic
    # in practice (the hash is fixed, so this is a fixed number — the
    # bound documents the accuracy contract, not flakiness).
    assert abs(got - 5000) / 5000 < 0.25, got


def test_kmv_plan_bounds_shuffle(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("g"), F.col("id").cast("string").alias("v")
    )
    plan = (
        kmv_distinct(df, ["g"], "v", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Partial WindowGroupLimit = map-side k-truncation per group.
    assert plan.count("WindowGroupLimit") >= 2, plan[:2000]


def test_kmv_partition_independent(spark):
    """The estimate must not depend on physical partitioning — the
    mergeability property that makes a bottom-k sketch a sketch."""
    df = spark.range(20_000).select(
        (F.col("id") % 5).alias("g"), (F.col("id") % 3_000).cast("string").alias("v")
    )
    a = sorted(map(tuple, kmv_distinct(df, ["g"], "v", k=64).collect()))
    b = sorted(
        map(tuple, kmv_distinct(df.repartition(17), ["g"], "v", k=64).collect())
    )
    c = sorted(
        map(tuple, kmv_distinct(df.coalesce(1), ["g"], "v", k=64).collect())
    )
    assert a == b == c
