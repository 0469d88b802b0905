"""Declarative expectations engine (operators/expectations.py) — the
planted-dirty-data properties beyond the q208 oracle differential:
every rule kind counts its violations exactly on a frame with known
defects, NULL ownership is not_null's alone, and malformed rule
sheets are refused up front."""

from __future__ import annotations

import pytest

from efiche_data_pipeline_spark.operators.expectations import (
    Rule,
    check_expectations,
)

_ROWS = [
    # (id, price, status, code)
    (1, 50.0, "F", "1-URGENT"),
    (1, 150.0, "O", "2-HIGH"),      # dup id
    (2, None, "F", "9-BAD"),        # null price, bad code prefix
    (3, -10.0, "X", "3-MEDIUM"),    # out of range, bad status
    (None, 20.0, "O", None),        # null id, null code
    (4, 999.0, "F", "1-URGENT"),    # price above hi
]
_SCHEMA = "id long, price double, status string, code string"


def _df(spark):
    return spark.createDataFrame(_ROWS, _SCHEMA)


def _audit(spark, rules, df=None):
    out = check_expectations(df if df is not None else _df(spark), rules)
    return {r["rule_id"]: r for r in out.collect()}


def test_each_kind_counts_exactly(spark):
    ref = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    got = _audit(
        spark,
        [
            Rule("r_null", "not_null", "id"),
            Rule("r_uni", "unique", "id"),
            Rule("r_rng", "range", "price", lo=0.0, hi=200.0),
            Rule("r_set", "in_set", "status", values=("F", "O")),
            Rule("r_rex", "regex", "code", pattern="^[1-3]-"),
            Rule("r_ref", "ref", "id", ref=ref, ref_col="k"),
        ],
    )
    assert all(r["n_rows"] == 6 for r in got.values())
    # one NULL id
    assert (got["r_null"]["n_violations"], got["r_null"]["ok"]) == (1, False)
    # ids non-null: [1,1,2,3,4] -> 5 rows, 4 distinct -> 1 excess
    assert got["r_uni"]["n_violations"] == 1
    # prices non-null: [50,150,-10,20,999] -> -10 and 999 out of range
    assert got["r_rng"]["n_violations"] == 2
    # statuses: one 'X'
    assert got["r_set"]["n_violations"] == 1
    # codes non-null: [1-,2-,9-,3-,1-] -> one bad prefix (NULL not counted)
    assert got["r_rex"]["n_violations"] == 1
    # non-null ids not in {1,2,3}: the 4 -> 1 orphan (NULL not counted)
    assert got["r_ref"]["n_violations"] == 1
    # every planted rule has violations, so no rule reports ok
    assert not any(r["ok"] for r in got.values())


def test_clean_frame_all_ok(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    got = _audit(
        spark,
        [
            Rule("a", "not_null", "id"),
            Rule("b", "unique", "id"),
            Rule("c", "range", "v", lo=0.0, hi=100.0),
        ],
        df=df,
    )
    assert all(r["n_violations"] == 0 and r["ok"] for r in got.values())


def test_malformed_rule_sheets_refused(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="empty rule"):
        check_expectations(df, [])
    with pytest.raises(ValueError, match="duplicate rule_id"):
        check_expectations(
            df, [Rule("x", "not_null", "id"), Rule("x", "unique", "id")]
        )
    with pytest.raises(ValueError, match="unknown rule kind"):
        check_expectations(df, [Rule("x", "median", "price")]).collect()
    with pytest.raises(ValueError, match="needs ref"):
        check_expectations(df, [Rule("x", "ref", "id")]).collect()


def test_row_local_rules_share_one_aggregate(spark):
    """All row-local rules fold into a single pass: the audit for N
    row-local rules runs exactly one aggregate over the input (the
    plan shows one scan chain), not N."""
    df = _df(spark)
    out = check_expectations(
        df,
        [
            Rule("a", "not_null", "id"),
            Rule("b", "range", "price", lo=0.0, hi=200.0),
            Rule("c", "in_set", "status", values=("F", "O")),
        ],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one LocalRelation/scan feeding one Aggregate; no join in sight
    assert "Join" not in plan
    rows = {r["rule_id"]: r["n_violations"] for r in out.collect()}
    assert rows == {"a": 1, "b": 2, "c": 1}


def test_dataset_metric_bounds(spark):
    """r11 metric tier: min/max/mean/row-count bounds audit as single
    rows with 0/1 violations; all fold into the one aggregate pass
    (no join); a NULL metric (all-NULL column) fails closed."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double"
    )
    out = check_expectations(
        df,
        [
            Rule("vmin", "min_ge", "v", lo=5.0),
            Rule("vmax", "max_le", "v", hi=25.0),
            Rule("vmean", "mean_between", "v", lo=15.0, hi=25.0),
            Rule("nrows", "row_count_between", "id", lo=1, hi=10),
            Rule("vnn", "not_null", "v"),
        ],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan  # metric + row-local share the one pass
    got = {r["rule_id"]: r["n_violations"] for r in out.collect()}
    # min 10 >= 5 ok; max 30 > 25 broken; mean 20 in [15,25] ok;
    # 3 rows in [1,10] ok
    assert got == {"vmin": 0, "vmax": 1, "vmean": 0, "nrows": 0, "vnn": 0}
    # fail-closed on a NULL metric
    empty = spark.createDataFrame([(1, None)], "id long, v double")
    got2 = {
        r["rule_id"]: r["n_violations"]
        for r in check_expectations(
            empty, [Rule("m", "mean_between", "v", lo=0.0, hi=1.0)]
        ).collect()
    }
    assert got2 == {"m": 1}


def test_metric_rules_refused_as_hard(spark, tmp_path):
    from efiche_data_pipeline_spark.pipeline.store import Store
    from efiche_data_pipeline_spark.streaming.expectations_stream import (
        expectations_gate_fold,
    )

    store = Store(spark, str(tmp_path / "store"))
    df = spark.createDataFrame([(1, 10.0)], "id long, v double")
    rules = [Rule("m", "mean_between", "v", lo=0.0, hi=1.0)]
    with pytest.raises(ValueError, match="row-decidable"):
        expectations_gate_fold(df, store, rules, ("m",), "id")


def test_rule_id_alias_collisions_refused(spark):
    """ADVICE r12: rule ids colliding with the single-pass aggregate's
    internal aliases ('_n', a mean_between rule's '_s'/'_c'
    companions) are rejected up front with the colliding ids named."""
    import pytest as _pytest

    from efiche_data_pipeline_spark.operators.expectations import (
        Rule,
        check_expectations,
    )

    from pyspark.sql import functions as F

    df = spark.range(5).select(F.col("id").alias("v"))
    with _pytest.raises(ValueError, match="_n"):
        check_expectations(df, [Rule("_n", "not_null", "v")])
    with _pytest.raises(ValueError, match="collide"):
        check_expectations(
            df,
            [
                Rule("m", "mean_between", "v", lo=0.0, hi=10.0),
                Rule("m_s", "not_null", "v"),
            ],
        )
