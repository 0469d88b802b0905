"""Salted-join and merge-upsert tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.skew import salted_join
from efiche_data_pipeline_spark.pipeline.store import Store


def _skewed_frames(spark):
    # 90% of rows share one hot key
    skewed = spark.range(20_000).select(
        F.col("id"),
        F.when(F.pmod("id", F.lit(10)) < 9, F.lit(7))
        .otherwise(F.pmod("id", F.lit(100)))
        .alias("k"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), F.format_string("v-%d", F.col("id")).alias("v")
    )
    return skewed, small


def test_salted_join_matches_plain_join(spark):
    skewed, small = _skewed_frames(spark)
    plain = skewed.join(small, "k")
    salted = salted_join(skewed, small, on="k", salt_from="id", n_salts=8)
    assert salted.count() == plain.count()
    assert salted.select("k", "id", "v").exceptAll(plain.select("k", "id", "v")).count() == 0


def test_salted_join_left_outer(spark):
    skewed, small = _skewed_frames(spark)
    plain = skewed.join(small, "k", "left")
    salted = salted_join(skewed, small, on="k", salt_from="id", n_salts=8, how="left")
    assert salted.count() == plain.count()


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must actually land in several salt groups."""
    skewed, _ = _skewed_frames(spark)
    hot = skewed.filter(F.col("k") == 7).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("id")), F.lit(8))
    )
    n_groups = hot.select("_salt").distinct().count()
    assert n_groups == 8


def test_merge_upsert(spark, tmp_path):
    store = Store(spark, str(tmp_path / "m"))
    base = spark.createDataFrame(
        [("a", 1, 10), ("b", 1, 20)], "k string, b int, v int"
    )
    store.merge_upsert(base, "t", keys=["k", "b"])
    # update one key, insert one new
    upd = spark.createDataFrame(
        [("b", 1, 99), ("c", 2, 30)], "k string, b int, v int"
    )
    store.merge_upsert(upd, "t", keys=["k", "b"])
    got = {(r.k, r.b): r.v for r in store.read("t").collect()}
    assert got == {("a", 1): 10, ("b", 1): 99, ("c", 2): 30}
    # idempotent replay
    store.merge_upsert(upd, "t", keys=["k", "b"])
    again = {(r.k, r.b): r.v for r in store.read("t").collect()}
    assert again == got
