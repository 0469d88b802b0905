"""Generator tests: deterministic, correct cardinality ratios, zero
per-row Python (the frames are pure expression pipelines — asserted by
construction), matching the reference's documented volumes
(reference: README.md:24-29, config.py:17-22)."""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.pipeline.generate import (
    gen_staging,
    generate_operational,
)

N_PATIENTS = 400


def test_operational_cardinalities(spark):
    t = generate_operational(spark, n_patients=N_PATIENTS, seed=42)
    assert t["patients"].count() == N_PATIENTS
    assert t["facilities"].count() == max(N_PATIENTS // 500, 1)
    assert t["diagnosis_codes"].count() == 10

    # 1-8 encounters per patient (reference: config.py:20)
    per_patient = t["encounters"].groupBy("patient_id").count()
    mn, mx, total = per_patient.agg(
        F.min("count"), F.max("count"), F.sum("count")
    ).first()
    assert 1 <= mn and mx <= 8
    assert total == t["encounters"].count()
    assert per_patient.count() == N_PATIENTS  # every patient has >= 1

    # 1-3 procedures, 1-2 diagnoses per encounter (config.py:21)
    per_enc = t["procedures"].groupBy("encounter_id").count()
    mn, mx = per_enc.agg(F.min("count"), F.max("count")).first()
    assert 1 <= mn and mx <= 3
    per_diag = t["diagnoses"].groupBy("encounter_id").count()
    mn, mx = per_diag.agg(F.min("count"), F.max("count")).first()
    assert 1 <= mn and mx <= 2

    # ~70% of encounters have a report
    ratio = t["reports"].count() / t["encounters"].count()
    assert 0.6 < ratio < 0.8


def test_referential_integrity(spark):
    t = generate_operational(spark, n_patients=N_PATIENTS, seed=42)
    orphans = t["encounters"].join(t["patients"], "patient_id", "left_anti")
    assert orphans.count() == 0
    orphans = t["procedures"].join(t["encounters"], "encounter_id", "left_anti")
    assert orphans.count() == 0
    orphans = t["diagnoses"].join(t["diagnosis_codes"], "code_id", "left_anti")
    assert orphans.count() == 0


def test_generation_is_deterministic(spark):
    a = generate_operational(spark, n_patients=N_PATIENTS, seed=42)
    b = generate_operational(spark, n_patients=N_PATIENTS, seed=42)
    for name in a:
        assert a[name].exceptAll(b[name]).count() == 0, f"{name} not deterministic"
    # a different seed actually changes the data
    c = generate_operational(spark, n_patients=N_PATIENTS, seed=7)
    assert a["encounters"].exceptAll(c["encounters"]).count() > 0


def test_staging_has_malformed_dates_and_dupes(spark):
    raw = gen_staging(spark, n=2000, seed=42)
    assert raw.count() == 2000
    bad = raw.filter(F.col("study_date") == "NOT_A_DATE").count()
    assert 0 < bad < 100  # ~1%
    dupes = 2000 - raw.select("image_id").distinct().count()
    assert 0 < dupes < 120  # ~2%
