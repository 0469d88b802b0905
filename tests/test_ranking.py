"""Differential tests for operators/ranking.py: the bucketed global
row_number / ntile must be bit-identical to the single-partition
window forms on any input where the order columns form a total order —
including skewed, duplicate-heavy, and tiny (< n_tiles) inputs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.ranking import (
    global_ntile,
    global_row_number,
)


def _frame(spark, values):
    # id is the unique tiebreaker; v deliberately carries duplicates.
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v long"
    )


@given(
    values=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60),
    buckets=st.sampled_from([1, 2, 7]),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_global_row_number_matches_window(spark, values, buckets):
    df = _frame(spark, values)
    got = global_row_number(df, ["v", "id"], "rn", buckets=buckets)
    want = df.withColumn("rn", F.row_number().over(W.orderBy("v", "id")))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@given(
    values=st.lists(st.integers(min_value=-9, max_value=9), min_size=1, max_size=45),
    n_tiles=st.sampled_from([1, 3, 10]),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_global_ntile_matches_window(spark, values, n_tiles):
    df = _frame(spark, values)
    got = global_ntile(df, ["v", "id"], n_tiles, out_col="t", buckets=4)
    want = df.withColumn("t", F.ntile(n_tiles).over(W.orderBy("v", "id")))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_no_unbounded_single_partition_window(spark):
    """The executed plan's only single-partition exchange feeds the
    bucket-offsets frame (≤ buckets rows), never the data itself: the
    data-side window is partitioned by the bucket id."""
    df = _frame(spark, list(range(1000)))
    plan = (
        global_row_number(df, ["v", "id"], "rn", buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The per-row window must be hash-partitioned on the bucket id.
    assert "hashpartitioning(_b" in plan


def test_global_row_number_partition_independent(spark):
    """Ranks must be a pure function of the data, not of physical
    partitioning (the boundary-sampling pitfall assign_surrogate_key's
    docstring warns about, verified here for the ranking operator)."""
    df = _frame(spark, [v % 37 for v in range(500)])
    a = sorted(map(tuple, global_row_number(df, ["v", "id"], "rn", buckets=8).collect()))
    b = sorted(
        map(
            tuple,
            global_row_number(df.repartition(13), ["v", "id"], "rn", buckets=8).collect(),
        )
    )
    c = sorted(
        map(
            tuple,
            global_row_number(df.coalesce(1), ["v", "id"], "rn", buckets=8).collect(),
        )
    )
    assert a == b == c


def test_incremental_weighted_sample_equals_direct_and_replays(spark, tmp_path):
    """Folding batches one at a time must reproduce the one-shot top-N
    exactly (A-ES merge property), and replaying a batch must leave
    the sample unchanged."""
    from efiche_data_pipeline_spark.operators.ranking import (
        incremental_weighted_sample,
    )
    from efiche_data_pipeline_spark.pipeline.store import Store

    rows = spark.createDataFrame(
        [(i, (i * 37) % 101 + 1) for i in range(1, 301)], "k long, w long"
    ).select(
        "k",
        "w",
        (-F.log((F.xxhash64("k").bitwiseAND(F.lit((1 << 40) - 1)) + 1)
                / F.lit(float(1 << 40))) / F.col("w")).alias("p"),
    )
    direct = [
        (r["k"], r["w"]) for r in rows.orderBy("p", "k").limit(50).collect()
    ]
    store = Store(spark, str(tmp_path / "s"))
    for lo, hi in ((1, 100), (101, 200), (201, 300)):
        batch = rows.filter(F.col("k").between(lo, hi))
        sample, _ = incremental_weighted_sample(batch, store, 50, "k", "p")
    got = [(r["k"], r["w"]) for r in sample.orderBy("p", "k").collect()]
    assert got == direct
    replay, _ = incremental_weighted_sample(
        rows.filter(F.col("k").between(101, 200)), store, 50, "k", "p"
    )
    assert [
        (r["k"], r["w"]) for r in replay.orderBy("p", "k").collect()
    ] == direct


def test_incremental_weighted_sample_partition_independent(spark, tmp_path):
    """Deterministic priorities + key tie-break make the maintained
    sample layout-independent."""
    from efiche_data_pipeline_spark.operators.ranking import (
        incremental_weighted_sample,
    )
    from efiche_data_pipeline_spark.pipeline.store import Store

    rows = spark.createDataFrame(
        [(i, (i * 31) % 97 + 1) for i in range(1, 500)], "k long, w long"
    ).select(
        "k",
        "w",
        (-F.log((F.xxhash64("k").bitwiseAND(F.lit((1 << 40) - 1)) + 1)
                / F.lit(float(1 << 40))) / F.col("w")).alias("p"),
    )

    def run(nparts):
        store = Store(spark, str(tmp_path / f"s{nparts}"))
        for lo, hi in ((1, 250), (251, 499)):
            sample, _ = incremental_weighted_sample(
                rows.filter(F.col("k").between(lo, hi)).repartition(nparts),
                store, 40, "k", "p",
            )
        return sorted((r["k"], r["w"]) for r in sample.collect())

    assert run(1) == run(8) == run(32)


# ---------------------------------------------------------------------------
# Epoch-shuffled training order (epoch_shuffle)
# ---------------------------------------------------------------------------
def test_epoch_shuffle_is_per_epoch_permutation(spark):
    from efiche_data_pipeline_spark.operators.ranking import epoch_shuffle

    docs = spark.range(0, 97).select(F.col("id").alias("doc_id"))
    pdf = epoch_shuffle(docs, "doc_id", 3).toPandas()
    assert len(pdf) == 97 * 3
    for e in (1, 2, 3):
        assert sorted(pdf[pdf.epoch == e].position) == list(range(1, 98))
    # distinct epochs are genuinely different permutations
    o1 = pdf[pdf.epoch == 1].sort_values("doc_id").position.tolist()
    o2 = pdf[pdf.epoch == 2].sort_values("doc_id").position.tolist()
    assert o1 != o2
    # the same seed reproduces the order bit-identically
    again = epoch_shuffle(docs, "doc_id", 3).toPandas()
    key = ["epoch", "doc_id"]
    assert (
        pdf.sort_values(key).reset_index(drop=True).position
        == again.sort_values(key).reset_index(drop=True).position
    ).all()
    # a different seed is a different shuffle
    other = epoch_shuffle(docs, "doc_id", 3, seed="other").toPandas()
    assert (
        pdf.sort_values(key).reset_index(drop=True).position.tolist()
        != other.sort_values(key).reset_index(drop=True).position.tolist()
    )


def test_epoch_shuffle_matches_first_principles_md5_rank(spark):
    """Differential against a from-scratch Python replay of the
    portable order hash (md5(seed#ep<e>#id) → first 15 hex chars),
    independently of Spark's conv/global_prefix_sum machinery."""
    import hashlib

    from efiche_data_pipeline_spark.operators.ranking import epoch_shuffle

    n, epochs = 157, 2
    docs = spark.range(0, n).select(F.col("id").alias("doc_id"))
    got = {
        (r["epoch"], r["doc_id"]): r["position"]
        for r in epoch_shuffle(docs, "doc_id", epochs).collect()
    }

    def h(e, i):
        d = hashlib.md5(f"seed42#ep{e}#{i}".encode()).hexdigest()
        return int(d[:15], 16)

    for e in range(1, epochs + 1):
        order = sorted(range(n), key=lambda i: (h(e, i), i))
        for pos, i in enumerate(order, start=1):
            assert got[(e, i)] == pos
