"""Physical-plan assertions for the round-4 corpus operators: the
scale posture documented in docs/PLAN_AUDIT.md, pinned as tests so a
regression (an accidental shuffle, a lost broadcast, a lost pushdown)
fails loudly instead of silently degrading at 100×.

Plans are inspected POST-execution (AQE finalizes exchange reuse and
join strategies only at runtime).
"""

from __future__ import annotations

from efiche_data_pipeline_spark.plans.corpus import (
    q84_weighted_order_sample,
    q86_zorder_orders,
    q88_char_entropy,
    q92_bloom_semi_join,
    q94_embedding_quantization,
)

from .conftest import SF_DIR


def _executed(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q84_weighted_sample_has_no_exchange(spark):
    """Weighted Bernoulli sampling must stay a pure map-side
    scan→project→filter — the whole point vs ORDER BY random()."""
    plan = _executed(q84_weighted_order_sample(spark, SF_DIR))
    assert "Exchange" not in plan
    # `*(n)` is toString's whole-stage-codegen marker; the filter must
    # also reach the scan as a data filter (row-group stats can't help
    # an md5 predicate, but IsNotNull pushes).
    assert "*(1)" in plan
    assert "PushedFilters: [IsNotNull(o_orderkey)]" in plan


def test_q94_quantization_has_no_exchange(spark):
    plan = _executed(q94_embedding_quantization(spark, SF_DIR))
    assert "Exchange" not in plan


def test_q86_zorder_scan_prunes_columns(spark):
    """The Morton-key aggregate must read only the two key columns."""
    plan = _executed(q86_zorder_orders(spark, SF_DIR))
    assert "o_custkey" in plan and "o_orderdate" in plan
    assert "o_totalprice" not in plan  # pruned
    assert "o_orderpriority" not in plan  # pruned


def test_q92_bloom_probe_is_broadcast_and_semi(spark):
    """The 1-row bitmap must broadcast (never shuffle the probe side
    for it) and the verify join must be a semi join."""
    plan = _executed(q92_bloom_semi_join(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_q88_entropy_single_stage_after_repartition(spark):
    """Entropy is map-side: the only exchange is the explicit
    small-fixture repartition (a no-op on real multi-split scans)."""
    plan = _executed(q88_char_entropy(spark, SF_DIR))
    assert plan.count("Exchange") <= 2  # repartition (+AQE read)
    assert "Window" not in plan
