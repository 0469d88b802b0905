"""Data-quality rule tests (pipeline/quality.py): planted violations
per rule kind, the single-pass plan shape, and the FK contract on the
real generated operational tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.pipeline.generate import generate_operational
from efiche_data_pipeline_spark.pipeline.quality import (
    assert_quality,
    check_fk,
    check_rules,
    in_range,
    in_set,
    matches,
    not_null,
)


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(
        [
            (1, 44, "M", "IMG_1"),
            (2, 130, "F", "IMG_2"),  # age out of range
            (3, None, "X", "IMG_3"),  # null age (ignored by range), bad sex
            (1, 30, "F", "bad id"),  # dup id, bad image pattern
        ],
        "id long, age int, sex string, image_id string",
    )


def test_rules_count_planted_violations(spark, dirty):
    report = check_rules(
        dirty,
        [
            not_null("age"),
            in_range("age", 0, 120),
            in_set("sex", ["M", "F", "Unknown"]),
            matches("image_id", r"^IMG_\d+$"),
        ],
        unique_key=["id"],
    )
    assert report == {
        "not_null(age)": 1,
        "in_range(age,0,120)": 1,  # the NULL age is NOT a range violation
        "in_set(sex)": 1,
        "matches(image_id)": 1,
        "unique(id)": 1,
    }
    with pytest.raises(ValueError, match="in_set"):
        assert_quality(report)
    assert_quality({k: 0 for k in report})  # clean report passes


def test_rules_single_pass_plan(spark, tmp_path):
    """All row-level rules (plus uniqueness) must compile into ONE
    aggregate over ONE scan of the table — no per-rule jobs. Asserted
    on a parquet-backed frame so the scan is countable in the plan."""
    src = str(tmp_path / "t.parquet")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 120).cast("int").alias("age")
    ).write.parquet(src)
    df = spark.read.parquet(src)
    rules = [not_null("age"), in_range("age", 0, 120)]
    aggs = [
        F.sum(F.when(~cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in rules
    ] + [(F.count(F.lit(1)) - F.countDistinct("id")).alias("uniq")]
    plan = df.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_fk_contract_on_generated_tables(spark):
    tables = generate_operational(spark, n_patients=100, seed=7)
    enc, pat = tables["encounters"], tables["patients"]
    assert check_fk(enc, "patient_id", pat, "patient_id") == 0
    # break it: drop some parents
    broken = pat.filter(F.col("patient_id").isNotNull()).limit(60)
    orphans = check_fk(enc, "patient_id", broken, "patient_id")
    assert orphans > 0
    # null child keys are not orphans
    enc_null = enc.withColumn(
        "patient_id",
        F.when(F.rand(1) < 0.5, None).otherwise(F.col("patient_id")),
    )
    assert check_fk(enc_null, "patient_id", pat, "patient_id") == 0
