"""Analytics report runner (K6) — the Spark re-design of the
reference's 8-query stdout report (reference: src/run_analytics.py:25-173).

Each report section is a pure DataFrame function over the warehouse
store; :func:`render_report` formats them into the same fixed-width
text report the reference prints via ``pandas.to_string``. Formatting
collects only the (bounded) report rows — every section ends in a
small aggregate or top-K.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .store import Store


def monthly_trends(store: Store) -> DataFrame:
    """Report 1 (run_analytics.py:35-44): latest 12 months from the MV."""
    mv = store.read("mv_monthly_encounters")
    return (
        mv.select(
            "year",
            "month",
            "month_name",
            "total_encounters",
            "unique_patients",
            F.round("avg_procedures_per_encounter", 2).alias("avg_procedures"),
        )
        .orderBy(F.desc("year"), F.desc("month"))
        .limit(12)
        .drop("month")
    )


def top_diagnoses_by_age_group(store: Store, k: int = 3) -> DataFrame:
    """Report 2 (run_analytics.py:50-63): per-group top-K via
    row_number (W1)."""
    mv = store.read("mv_diagnosis_by_age_group")
    w = Window.partitionBy("age_group").orderBy(
        F.desc("diagnosis_count"), "code", "description"
    )
    return (
        mv.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("age_group", "rank")
        .select("age_group", "code", "description", "diagnosis_count")
    )


def procedure_volume(store: Store) -> DataFrame:
    """Report 3 (run_analytics.py:69-77)."""
    return (
        store.read("mv_procedure_volume")
        .select(
            "modality",
            "procedure_count",
            "unique_patients",
            F.round(
                F.col("procedure_count") / F.col("unique_patients"), 2
            ).alias("procedures_per_patient"),
        )
        .orderBy(F.desc("procedure_count"))
    )


def overall_metrics(store: Store) -> DataFrame:
    """Report 4 (run_analytics.py:83-92): global aggregate (A4/A8)."""
    fe = store.read("fact_encounters")
    return fe.agg(
        F.countDistinct("patient_key").alias("total_patients"),
        F.countDistinct("encounter_key").alias("total_encounters"),
        F.round(F.avg("num_procedures"), 2).alias("avg_procedures_per_encounter"),
        F.round(
            F.countDistinct("encounter_key") / F.countDistinct("patient_key"), 2
        ).alias("avg_encounters_per_patient"),
    )


def weekend_vs_weekday(store: Store) -> DataFrame:
    """Report 5 (run_analytics.py:98-110): boolean→label CASE (P6)."""
    fe = store.read("fact_encounters")
    dt = store.read("dim_time").select("date_key", "is_weekend")
    return (
        fe.join(F.broadcast(dt), "date_key")
        .groupBy("is_weekend")
        .agg(
            F.countDistinct("encounter_key").alias("total_encounters"),
            F.round(F.avg("num_procedures"), 2).alias("avg_procedures"),
            F.countDistinct("patient_key").alias("unique_patients"),
        )
        .orderBy("is_weekend")
        .select(
            F.when(F.col("is_weekend"), "Weekend").otherwise("Weekday").alias("day_type"),
            "total_encounters",
            "avg_procedures",
            "unique_patients",
        )
    )


def patient_demographics(store: Store) -> DataFrame:
    """Report 6 (run_analytics.py:116-125): percent-of-total window (W3)."""
    counts = store.read("dim_patient").groupBy("age_group", "sex").agg(
        F.count(F.lit(1)).alias("patient_count")
    )
    total = F.sum("patient_count").over(Window.partitionBy())
    return counts.select(
        "age_group",
        "sex",
        "patient_count",
        F.round(F.col("patient_count") * 100.0 / total, 2).alias("percentage"),
    ).orderBy("age_group", "sex")


def facility_performance(store: Store, k: int = 5) -> DataFrame:
    """Report 7 (run_analytics.py:131-143)."""
    fe = store.read("fact_encounters")
    df_ = store.read("dim_facility").select("facility_key", "facility_name", "facility_type")
    return (
        fe.join(F.broadcast(df_), "facility_key")
        .groupBy("facility_name", "facility_type")
        .agg(
            F.countDistinct("encounter_key").alias("total_encounters"),
            F.sum("num_procedures").alias("total_procedures"),
        )
        .orderBy(F.desc("total_encounters"), "facility_name")
        .limit(k)
    )


def high_utilization_patients(store: Store, k: int = 10) -> DataFrame:
    """Report 8 (run_analytics.py:149-163): HAVING post-filter (A6)."""
    fe = store.read("fact_encounters")
    dp = store.read("dim_patient").select("patient_key", "age_group", "sex")
    return (
        fe.join(F.broadcast(dp), "patient_key")
        .groupBy("patient_key", "age_group", "sex")
        .agg(
            F.countDistinct("encounter_key").alias("encounter_count"),
            F.sum("num_procedures").alias("total_procedures"),
        )
        .filter(F.col("encounter_count") >= 5)
        .orderBy(F.desc("encounter_count"), "patient_key")
        .limit(k)
        .drop("patient_key")
    )


SECTIONS = [
    ("Monthly Encounter Trends", monthly_trends),
    ("Top 3 Diagnoses by Age Group", top_diagnoses_by_age_group),
    ("Procedure Volume by Modality", procedure_volume),
    ("Overall Patient Metrics", overall_metrics),
    ("Weekend vs Weekday Activity", weekend_vs_weekday),
    ("Patient Demographics", patient_demographics),
    ("Top 5 Facilities by Volume", facility_performance),
    ("Top 10 High Utilization Patients", high_utilization_patients),
]


def render_report(store: Store) -> str:
    """The formatted text report (reference: run_analytics.py:25-173 —
    same 8 sections, pandas fixed-width rendering)."""
    bar = "=" * 70
    out = [bar, "eFiche Data Warehouse - Analytics Report", bar, ""]
    for i, (title, fn) in enumerate(SECTIONS, start=1):
        out.append(f"QUERY {i}: {title}")
        out.append("-" * 70)
        out.append(fn(store).toPandas().to_string(index=False))
        out.append("")
    out += [bar, "Analytics Report Complete!", bar]
    return "\n".join(out)
