"""Token-budget mixture sampling (plans/corpus.py q130) and the
grouped two-level prefix sum it rides on
(operators/packing.py:global_prefix_sum with group_cols) — beyond the
oracle differential:

- the grouped two-level scheme is bit-identical to the naive
  ``SUM() OVER (PARTITION BY g ORDER BY …)`` window it replaces;
- it is invariant to physical partitioning (the bucketing is
  value-derived, never partition-id-derived);
- the budget is tight: every source fills to the last document that
  fits, and the first excluded document would overflow.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.functions.hashing import portable_hash60
from efiche_data_pipeline_spark.functions.text import token_count
from efiche_data_pipeline_spark.operators.packing import global_prefix_sum
from efiche_data_pipeline_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"
_BUDGET = 1000  # matches plans/corpus.py _MIX_TOKEN_BUDGET


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _synthetic(spark):
    # groups of very different sizes, order values spanning buckets
    rows = [
        (i, "g%d" % (i % 3 if i < 60 else 0), (i * 37) % 101, 1 + i % 7)
        for i in range(90)
    ]
    return spark.createDataFrame(rows, "id long, g string, ord long, v long")


def test_grouped_two_level_equals_naive_window(spark):
    df = _synthetic(spark)
    two = global_prefix_sum(
        df, "ord", "v", "p", bucket_size=16, group_cols=["g"]
    ).select("id", "p")
    naive_w = (
        W.partitionBy("g").orderBy("ord").rowsBetween(W.unboundedPreceding, -1)
    )
    naive = df.select(
        "id", F.coalesce(F.sum("v").over(naive_w), F.lit(0)).cast("long").alias("p")
    )
    assert _rows(two) == _rows(naive)


def test_grouped_prefix_partition_invariant(spark):
    df = _synthetic(spark)
    a = global_prefix_sum(
        df.repartition(1), "ord", "v", "p", bucket_size=16, group_cols=["g"]
    )
    b = global_prefix_sum(
        df.repartition(13, "v"), "ord", "v", "p", bucket_size=16, group_cols=["g"]
    )
    assert _rows(a.select("id", "p")) == _rows(b.select("id", "p"))


def test_budget_is_tight(spark):
    kept = QUERIES["q130_token_budget_sample"](spark, SF_DIR)
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "doc_id",
            "source",
            token_count("text").cast("long").alias("n_tokens"),
            portable_hash60(F.col("doc_id").cast("string")).alias("h"),
        )
    )
    w = (
        W.partitionBy("source")
        .orderBy(F.col("h").asc(), F.col("doc_id").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    full = docs.withColumn("cum", F.sum("n_tokens").over(w))
    by_src_kept = {
        r["source"]: r["mx"]
        for r in kept.groupBy("source").agg(F.max("cum_tokens").alias("mx")).collect()
    }
    first_dropped = {
        r["source"]: r["mn"]
        for r in full.filter(F.col("cum") > _BUDGET)
        .groupBy("source")
        .agg(F.min("cum").alias("mn"))
        .collect()
    }
    assert by_src_kept, "sample must be non-empty"
    for src, mx in by_src_kept.items():
        assert mx <= _BUDGET
    # every source in the fixture overflows the budget, and the first
    # document past the cut genuinely would not have fit
    for src, mn in first_dropped.items():
        assert mn > _BUDGET
        assert src in by_src_kept


def test_temperature_budgets_follow_sqrt_mass(spark):
    """q154's α=1/2 split: a source with 100× the token mass gets only
    10× the budget (√ ratio), and the int64 split is exact —
    budget_s == TOTAL·w_s div Σw for the hand-computed weights."""
    from efiche_data_pipeline_spark.plans.corpus import (
        _TEMP_FIXED,
        _TEMP_TOTAL_BUDGET,
        q154_temperature_mixture,
    )
    import math
    import os
    import tempfile

    # big: 100 docs × 100 tokens = 10_000; small: 10 docs × 10 = 100.
    rows = [(i, "big", " ".join(["tok"] * 100)) for i in range(100)]
    rows += [(1000 + i, "small", " ".join(["tok"] * 10)) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["source"]: r["source_budget"]
            for r in q154_temperature_mixture(spark, d)
            .select("source", "source_budget")
            .distinct()
            .collect()
        }
    w_big = round(math.sqrt(10_000) * _TEMP_FIXED)
    w_small = round(math.sqrt(100) * _TEMP_FIXED)
    tot = w_big + w_small
    assert got == {
        "big": _TEMP_TOTAL_BUDGET * w_big // tot,
        "small": _TEMP_TOTAL_BUDGET * w_small // tot,
    }
    # α = 1/2 semantics: 100× the mass ⇒ exactly 10× the weight
    assert w_big == 10 * w_small


def test_incremental_temperature_mixture_folds_equal_global(spark, tmp_path):
    """q156: two folds ≡ one-shot, replay no-ops, and a fold that
    grows one source's mass reshapes the OTHER source's budget too
    (the non-monotonicity that forces derive-at-read)."""
    from efiche_data_pipeline_spark.operators.sketch import (
        incremental_temperature_mixture,
    )
    from efiche_data_pipeline_spark.pipeline.store import Store

    rows = [(i, "big", " ".join(["tok"] * 40)) for i in range(30)]
    rows += [(100 + i, "small", " ".join(["tok"] * 8)) for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budget = 400

    g = Store(spark, str(tmp_path / "g"))
    want = sorted(
        tuple(r) for r in incremental_temperature_mixture(docs, g, budget).collect()
    )

    s = Store(spark, str(tmp_path / "s"))
    r1 = incremental_temperature_mixture(
        docs.filter(F.col("doc_id") < 15), s, budget
    )
    mid = sorted(tuple(r) for r in r1.collect())
    got = sorted(
        tuple(r)
        for r in incremental_temperature_mixture(
            docs.filter(F.col("doc_id") >= 15), s, budget
        ).collect()
    )
    assert got == want
    # fold 2 changed the masses, so fold 1's interim budgets differ —
    # the selection genuinely re-derives rather than appends
    assert mid != want
    # replay: state keyed on doc_id no-ops, selection stable
    again = sorted(
        tuple(r)
        for r in incremental_temperature_mixture(docs, s, budget).collect()
    )
    assert again == want
    n = s.read("mixture_doc_stats").count()
    incremental_temperature_mixture(docs, s, budget)
    assert s.read("mixture_doc_stats").count() == n
