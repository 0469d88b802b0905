"""Report runner (K6) tests: every section runs over a freshly-built
warehouse, the rendered report is stable across renders (golden
property), and section shapes/invariants hold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.pipeline.generate import generate_operational
from efiche_data_pipeline_spark.pipeline.report import (
    SECTIONS,
    overall_metrics,
    patient_demographics,
    render_report,
    top_diagnoses_by_age_group,
)
from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.pipeline.warehouse import build_warehouse


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    store = Store(spark, str(tmp_path_factory.mktemp("wh_report")))
    for name, df in generate_operational(spark, n_patients=250, seed=11).items():
        store.overwrite(df, name)
    build_warehouse(store)
    return store


def test_all_sections_run_nonempty(wh):
    for title, fn in SECTIONS:
        assert fn(wh).count() > 0, f"section {title!r} empty"


def test_overall_metrics_consistent(wh):
    row = overall_metrics(wh).first()
    assert row.total_patients <= 250
    assert row.total_encounters >= row.total_patients  # >=1 encounter each
    assert row.avg_encounters_per_patient == round(
        row.total_encounters / row.total_patients, 2
    )


def test_demographics_percentages_sum_to_100(wh):
    total = patient_demographics(wh).agg(F.sum("percentage")).first()[0]
    assert abs(total - 100.0) < 0.5  # rounding slack across groups


def test_top_diagnoses_per_group_bounded(wh):
    per_group = (
        top_diagnoses_by_age_group(wh, k=3).groupBy("age_group").count().collect()
    )
    assert all(r["count"] <= 3 for r in per_group)


def test_report_renders_and_is_stable(wh):
    a = render_report(wh)
    b = render_report(wh)
    assert a == b  # deterministic golden property
    assert "Analytics Report Complete!" in a
    for i in range(1, 9):
        assert f"QUERY {i}:" in a
