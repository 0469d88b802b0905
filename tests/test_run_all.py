"""End-to-end pipeline test: generate → external-fallback ingest →
promotion → warehouse → report, on a small scale, with cross-stage
consistency checks and rerun idempotency."""

from __future__ import annotations

import pytest

from efiche_data_pipeline_spark.pipeline.run import run_all
from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.sources.external import (
    fetch_external,
    materialize_snapshot,
)


def test_external_source_falls_back_to_synthetic(spark):
    df, kind = fetch_external(spark, sample_size=200, seed=7)
    assert kind == "synthetic"  # no snapshot, no datasets lib here
    assert df.count() == 200
    assert set(df.columns) == {
        "image_id", "patient_age", "patient_sex", "study_date",
        "projection", "modality", "labels", "report_text",
    }


def test_external_source_prefers_snapshot(spark, tmp_path):
    snap = str(tmp_path / "snapshot")
    base, _ = fetch_external(spark, sample_size=50, seed=7)
    base.write.parquet(snap)
    df, kind = fetch_external(spark, sample_size=999, snapshot_dir=snap)
    assert kind == "snapshot"
    assert df.count() == 50


def test_materialize_snapshot_roundtrip(spark, tmp_path):
    snap = str(tmp_path / "snapshot")
    kind = materialize_snapshot(spark, snap, sample_size=80, seed=11)
    assert kind == "synthetic"  # no datasets lib in this container
    df, read_kind = fetch_external(spark, sample_size=999, snapshot_dir=snap)
    assert read_kind == "snapshot"
    rows = sorted(map(tuple, df.collect()))  # pin before any overwrite
    # snapshot content ≡ a direct fetch with the same inputs
    direct, _ = fetch_external(spark, sample_size=80, seed=11)
    assert rows == sorted(map(tuple, direct.collect()))
    # re-materializing is idempotent (overwrite, same deterministic rows)
    assert materialize_snapshot(spark, snap, sample_size=80, seed=11) == "synthetic"
    again, _ = fetch_external(spark, sample_size=999, snapshot_dir=snap)
    assert sorted(map(tuple, again.collect())) == rows


@pytest.fixture(scope="module")
def full_run(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    out = run_all(spark, root, n_patients=120, sample_size=300, batch_limit=100)
    return Store(spark, root), out


def test_run_all_consumes_everything(full_run):
    store, out = full_run
    assert out["ingest"]["unprocessed_staging"] == 0
    assert out["ingest"]["batches"] >= 3  # 300 rows / 100 per batch
    assert out["ingest"]["source"] == "synthetic"


def test_run_all_warehouse_covers_base_plus_ingested(full_run):
    store, out = full_run
    base_plus_ingested = store.count("encounters")
    assert out["warehouse"]["fact_encounters"] == base_plus_ingested
    # ingested encounters actually arrived in the canonical table
    assert base_plus_ingested > store.count("encounters_raw")
    assert store.count("encounters_raw") == out["ingest"]["loaded"]


def test_run_all_report_renders(full_run):
    _, out = full_run
    assert "Analytics Report Complete!" in out["report"]
