"""End-to-end pipeline orchestrator — the four reference entry points
(generate → ingest → warehouse → report; reference README.md:130-146
run order) as one composable driver.

Runnable demo:

    python -m efiche_data_pipeline_spark.pipeline.run --root /tmp/efiche_demo

Stage order mirrors the reference: synthetic operational base
(generate_synthetic_data.py), external/staging ingest in incremental
micro-batches (etl_pipeline.py), star-schema warehouse + MV refresh
(populate_warehouse.py), analytics report (run_analytics.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pyspark.sql import functions as F

from ..sources.external import fetch_external
from .generate import generate_operational
from .ingest import BATCH_LIMIT, load_to_staging, pipeline_stats, process_staging_to_production
from .quality import assert_quality, check_fk, check_rules, in_range, in_set, not_null
from .report import render_report
from .store import Store
from .warehouse import build_warehouse


def verify_contracts(store: Store) -> dict[str, int]:
    """The reference's DDL contracts (CHECK age 0-120, CHECK sex IN
    set — sql/01_schema.sql:11-12; FK REFERENCES :33-35,50-51) as
    executed assertion steps: one aggregate pass per table plus one
    anti-join per FK. Raises on any violation; returns the (all-zero)
    report otherwise."""
    patients = store.read("patients")
    report = check_rules(
        patients,
        [
            not_null("patient_id"),
            in_range("age", 0, 120),
            in_set("sex", ["M", "F", "Other", "Unknown"]),
        ],
        unique_key=["patient_id"],
    )
    enc = store.read("encounters")
    report["fk_encounters.patient_id"] = check_fk(
        enc, "patient_id", patients, "patient_id"
    )
    report["fk_procedures.encounter_id"] = check_fk(
        store.read("procedures"), "encounter_id", enc, "encounter_id"
    )
    assert_quality(report)
    return report


def promote_ingested(store: Store) -> None:
    """Fold the ingest outputs (``*_raw``, which carry lineage columns)
    into the canonical operational tables the warehouse reads — the
    reference's ETL inserts into those tables directly
    (etl_pipeline.py:163-181). ``append_new`` on the PK keeps the
    promotion idempotent across reruns."""
    if not store.exists("encounters_raw"):
        return
    enc = store.read("encounters_raw").select(
        "encounter_id", "patient_id", "facility_id",
        "encounter_date", "encounter_type", "status",
    )
    store.append_new(enc, "encounters", "encounter_id")
    proc = store.read("procedures_raw").select(
        "procedure_id", "encounter_id", "procedure_name",
        "modality", "projection",
        F.col("procedure_date").cast("date").alias("procedure_date"),
    )
    store.append_new(proc, "procedures", "procedure_id")
    rep = store.read("reports_raw").select(
        "report_id", "encounter_id", "report_type", "report_text", "language"
    )
    store.append_new(rep, "reports", "report_id")


def run_all(
    spark: SparkSession,
    root: str,
    n_patients: int = 5000,
    sample_size: int = 10_000,
    batch_limit: int = BATCH_LIMIT,
    seed: int = 42,
) -> dict:
    """Full pipeline. Returns a stats dict per stage."""
    store = Store(spark, root)

    # 1. operational base (reference: generate_synthetic_data.py:163-193)
    for name, df in generate_operational(spark, n_patients=n_patients, seed=seed).items():
        store.overwrite(df, name)

    # 2. ingest: external → staging → production micro-batches
    #    (reference: etl_pipeline.py:236-273)
    raw, source_kind = fetch_external(spark, sample_size=sample_size, seed=seed)
    load_stats = load_to_staging(store, raw)
    batches = 0
    while process_staging_to_production(store, batch_limit=batch_limit, seed=seed):
        batches += 1
    ingest_stats = {**load_stats, "source": source_kind, "batches": batches}
    promote_ingested(store)

    # 3. contract gate: CHECK + FK assertions before the warehouse
    #    consumes the operational tables (raises on violation).
    quality = verify_contracts(store)

    # 4. warehouse + MV refresh (reference: populate_warehouse.py:255-297)
    warehouse_stats = build_warehouse(store)

    # 5. report (reference: run_analytics.py:25-173)
    report = render_report(store)

    return {
        "ingest": {**ingest_stats, **pipeline_stats(store)},
        "quality": quality,
        "warehouse": warehouse_stats,
        "report": report,
    }


def main() -> None:  # pragma: no cover - CLI convenience
    import argparse

    from ..session import get_spark

    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--patients", type=int, default=5000)
    p.add_argument("--sample-size", type=int, default=10_000)
    args = p.parse_args()
    spark = get_spark(app_name="efiche-pipeline")
    out = run_all(spark, args.root, n_patients=args.patients, sample_size=args.sample_size)
    print(out["ingest"])
    print(out["warehouse"])
    print(out["report"])


if __name__ == "__main__":  # pragma: no cover
    main()
