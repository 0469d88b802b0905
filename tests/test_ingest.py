"""Ingest pipeline tests: P2 date parsing, K1 idempotent staging load,
incremental batch consumption (S5/P8), parent→child key integrity
(K5), and the incremental-completeness property (N micro-batches ≡ one
big batch — SURVEY §5.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.pipeline.generate import (
    gen_facilities,
    gen_patients,
    gen_staging,
)
from efiche_data_pipeline_spark.pipeline.ingest import (
    clean_staging,
    load_to_staging,
    pipeline_stats,
    process_staging_to_production,
    run_ingest,
    sample_exact,
)
from efiche_data_pipeline_spark.pipeline.store import Store

N_STAGING = 1000


@pytest.fixture()
def store(spark, tmp_path):
    s = Store(spark, str(tmp_path / "wh"))
    s.overwrite(gen_patients(spark, 200, seed=1), "patients")
    s.overwrite(gen_facilities(spark, 8, seed=1), "facilities")
    return s


def test_clean_staging_parses_dates_errors_to_null(spark):
    raw = spark.createDataFrame(
        [
            ("IMG_1", 44, "M", "20240115", "PA", "DX", "normal", "ok"),
            ("IMG_2", 51, "F", "NOT_A_DATE", "AP", "DX", "edema", "bad date"),
            ("IMG_3", None, None, None, None, None, None, None),
        ],
        "image_id string, patient_age int, patient_sex string, study_date string,"
        " projection string, modality string, labels string, report_text string",
    )
    out = {r.image_id: r for r in clean_staging(raw).collect()}
    assert str(out["IMG_1"].study_date) == "2024-01-15"
    assert out["IMG_2"].study_date is None  # P2: errors -> null
    assert out["IMG_3"].study_date is None
    assert out["IMG_3"].patient_sex == "Unknown"  # P1 defaults
    assert out["IMG_3"].projection == "PA"


def test_load_to_staging_idempotent(spark, store):
    raw = gen_staging(spark, N_STAGING, seed=42)
    first = load_to_staging(store, raw)
    assert first["loaded"] == raw.select("image_id").distinct().count()
    assert first["loaded"] + first["duplicates"] == N_STAGING
    # K1: the same input again loads nothing (run twice ≡ run once)
    again = load_to_staging(store, raw)
    assert again["loaded"] == 0
    assert store.count("staging") == first["loaded"]


def test_incremental_batches_consume_everything(spark, store):
    load_to_staging(store, gen_staging(spark, N_STAGING, seed=42))
    total = store.count("staging")
    consumed = []
    while True:
        n = process_staging_to_production(store, batch_limit=300)
        if n == 0:
            break
        consumed.append(n)
    assert sum(consumed) == total
    assert all(n == 300 for n in consumed[:-1])  # full batches then remainder
    stats = pipeline_stats(store)
    assert stats["unprocessed_staging"] == 0
    assert stats["total_encounters"] == total

    # K5 parent→child integrity: exactly one procedure and one report
    # per encounter, all keys resolving.
    enc = store.read("encounters_raw")
    for child in ("procedures_raw", "reports_raw"):
        c = store.read(child)
        assert c.count() == total
        assert c.join(enc, "encounter_id", "left_anti").count() == 0

    # every encounter references a pool patient/facility
    assert enc.join(store.read("patients"), "patient_id", "left_anti").count() == 0


def test_incremental_completeness_property(spark, tmp_path):
    """N micro-batches ≡ one big batch (SURVEY §5.3): the same staging
    rows are consumed, regardless of batch size."""
    raw = gen_staging(spark, 600, seed=9)

    def consume(root: str, batch_limit: int) -> set[str]:
        s = Store(spark, root)
        s.overwrite(gen_patients(spark, 100, seed=1), "patients")
        s.overwrite(gen_facilities(spark, 5, seed=1), "facilities")
        load_to_staging(s, raw)
        while process_staging_to_production(s, batch_limit=batch_limit):
            pass
        return {r.source_image_id for r in s.read("encounters_raw").collect()}

    many = consume(str(tmp_path / "many"), 150)
    one = consume(str(tmp_path / "one"), 10**6)
    assert many == one


def test_crash_recovery_converges(spark, store):
    """Simulate a run that died after writing parents+procedures but
    before reports/markers: re-running the batch must not duplicate
    parents or children, and must complete the missing writes."""
    import shutil

    load_to_staging(store, gen_staging(spark, 200, seed=4))
    total = store.count("staging")
    process_staging_to_production(store, batch_limit=10**6)
    n_enc = store.count("encounters_raw")
    assert n_enc == total

    # wind back to the mid-crash state
    shutil.rmtree(store.path("reports_raw"))
    shutil.rmtree(store.path("staging_markers"))

    process_staging_to_production(store, batch_limit=10**6)
    assert store.count("encounters_raw") == n_enc  # no duplicate parents
    assert store.count("procedures_raw") == n_enc  # no duplicate children
    assert store.count("reports_raw") == n_enc  # missing write completed
    assert pipeline_stats(store)["unprocessed_staging"] == 0


def test_replay_after_staging_crash_drains_staging(spark, store):
    """A crash after the staging append but before the production batch
    leaves staged-but-unconsumed rows. Replaying the SAME input loads 0
    new staging rows — run_ingest must still attempt the production
    batch so those rows drain instead of waiting for the next
    non-empty load."""
    raw = gen_staging(spark, 200, seed=5)
    # Crash point: staging written, production batch never ran.
    load_to_staging(store, raw)
    assert pipeline_stats(store)["unprocessed_staging"] > 0

    # Operator replays the identical input end-to-end.
    stats = run_ingest(store, raw, batch_limit=10**6)
    assert stats["loaded"] == 0  # dedup: nothing new staged
    assert stats["consumed"] > 0  # but the stranded batch drained
    assert stats["unprocessed_staging"] == 0


def test_sample_exact_deterministic(spark):
    df = gen_patients(spark, 500, seed=3)
    a = sample_exact(df, 50, seed=7)
    b = sample_exact(df, 50, seed=7)
    assert a.count() == 50
    assert a.exceptAll(b).count() == 0
    c = sample_exact(df, 50, seed=8)
    assert a.exceptAll(c).count() > 0  # different seed, different sample
    # explicit key_col must agree with the positional default when the
    # key IS the first column (determinism is keyed, not positional)
    d = sample_exact(df, 50, seed=7, key_col=df.columns[0])
    assert a.exceptAll(d).count() == 0
