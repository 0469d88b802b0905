"""External dataset source (S1) — the Spark re-design of the
reference's HuggingFace ingest with synthetic fallback (reference:
etl_pipeline.py:20-63, config PADCHEST_CONFIG config.py:25-29).

Resolution order:

1. a pre-materialized parquet snapshot (the production path at scale:
   a 100 TB external dataset is snapshotted to object storage once and
   scanned columnar — never pulled through a Python driver);
2. the ``datasets`` library, if importable (driver-side fetch of a
   bounded sample, exactly like the reference — explicitly NOT the
   scale path, which is why ``sample_size`` is mandatory here);
3. the deterministic synthetic generator (the reference's
   ``create_sample_padchest_data`` fallback, etl_pipeline.py:44-63).

Every path returns the same staging-shaped frame, so the ingest
pipeline is source-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..pipeline.generate import gen_staging

STAGING_COLUMNS = [
    "image_id",
    "patient_age",
    "patient_sex",
    "study_date",
    "projection",
    "modality",
    "labels",
    "report_text",
]


def fetch_external(
    spark: SparkSession,
    dataset_name: str = "external/cxr-sample",
    sample_size: int = 10_000,
    seed: int = 42,
    snapshot_dir: str | None = None,
) -> tuple[DataFrame, str]:
    """Staging-shaped frame from the best available source. Returns
    (frame, source_kind) with source_kind in
    {"snapshot", "datasets", "synthetic"}."""
    if snapshot_dir and os.path.exists(snapshot_dir):
        df = spark.read.parquet(snapshot_dir)
        missing = set(STAGING_COLUMNS) - set(df.columns)
        if missing:
            raise ValueError(f"snapshot at {snapshot_dir} missing columns {missing}")
        return df.select(*STAGING_COLUMNS), "snapshot"

    try:  # pragma: no cover - the library is not in this container
        from datasets import load_dataset

        ds = load_dataset(dataset_name, split="train")
        if len(ds) > sample_size:
            ds = ds.shuffle(seed=seed).select(range(sample_size))
        pdf = ds.to_pandas()
        pdf = pdf.rename(
            columns={
                "ImageID": "image_id",
                "PatientAge": "patient_age",
                "PatientSex": "patient_sex",
                "StudyDate": "study_date",
                "Projection": "projection",
                "Modality": "modality",
                "Labels": "labels",
                "ReportText": "report_text",
            }
        )
        return spark.createDataFrame(pdf[STAGING_COLUMNS]), "datasets"
    except ImportError:
        pass
    except Exception:
        # network/dataset failure → fall back, like the reference
        pass

    return gen_staging(spark, n=sample_size, seed=seed), "synthetic"


def materialize_snapshot(
    spark: SparkSession,
    snapshot_dir: str,
    dataset_name: str = "external/cxr-sample",
    sample_size: int = 10_000,
    seed: int = 42,
) -> str:
    """Resolve the external dataset once and persist it as a parquet
    snapshot at ``snapshot_dir`` — the scale path's *write* half: at
    100 TB the external corpus is snapshotted to object storage exactly
    once, and every subsequent :func:`fetch_external` call resolves to
    a columnar scan (predicate pushdown, column pruning, parallel
    splits) instead of a driver-side library fetch. Returns the source
    kind the snapshot was materialized FROM ("datasets" or
    "synthetic"). Overwrite-idempotent: re-materializing with the same
    inputs produces an identical snapshot."""
    df, kind = fetch_external(
        spark, dataset_name=dataset_name, sample_size=sample_size, seed=seed
    )
    df.write.mode("overwrite").parquet(snapshot_dir)
    return kind
