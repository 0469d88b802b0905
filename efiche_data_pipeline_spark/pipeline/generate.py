"""Deterministic synthetic data generator — the Spark re-design of the
reference's Faker loop (reference: src/generate_synthetic_data.py:19-161
and the staging fallback etl_pipeline.py:44-63, config
src/config.py:17-43).

Every frame is built from ``spark.range`` plus seeded-hash arithmetic
(``pmod(xxhash64(seed, id), n)``) — zero per-row Python, zero
``collect``, and bit-reproducible across runs and cluster layouts,
which the reference's ``random``/Faker generation is not. Per-parent
fan-out (1-8 encounters per patient, 1-3 procedures per encounter,
1-2 diagnoses — reference: generate_synthetic_data.py:109,142 and
config.py:20-21) is ``explode(sequence(1, n))``, so cardinality
ratios match the reference's documented volumes (README.md:24-29).

The date anchor is a fixed literal (not ``datetime.now()`` as in the
reference) so fixtures are stable; pass ``anchor`` to move it. At
100 TB-scale generation, ``spark.range(n)`` already yields
``defaultParallelism`` splits and every derivation is map-side — the
only shuffles are the hash-pick pool joins, which broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Reference: config.py:32-43 (COMMON_DIAGNOSES, ICD-10 seed list).
COMMON_DIAGNOSES: list[tuple[str, str]] = [
    ("J18.9", "Pneumonia, unspecified organism"),
    ("J98.11", "Atelectasis"),
    ("I50.9", "Heart failure, unspecified"),
    ("J81.0", "Acute pulmonary edema"),
    ("J44.1", "COPD with acute exacerbation"),
    ("R91.8", "Other nonspecific abnormal finding of lung field"),
    ("J96.00", "Acute respiratory failure"),
    ("J18.1", "Lobar pneumonia"),
    ("I27.20", "Pulmonary hypertension, unspecified"),
    ("J84.10", "Pulmonary fibrosis, unspecified"),
]

FACILITY_TYPES = ["Hospital", "Clinic", "Medical Center", "Urgent Care"]
CITIES = ["Springfield", "Riverton", "Lakewood", "Fairview", "Greenville"]
LABELS = ["pneumonia", "edema", "atelectasis", "normal", "pleural effusion"]
PROJECTIONS = ["PA", "AP", "L"]
ENCOUNTER_TYPES = ["Outpatient", "Inpatient", "Emergency"]

ANCHOR = "2024-06-01"  # fixed date anchor (reference uses now())


def _pick(seed: int, key: Column, n: int) -> Column:
    """Deterministic uniform choice index in [0, n): the set-oriented
    replacement for ``random.choice`` / ``random.randint``
    (reference: generate_synthetic_data.py:73-75,113-115)."""
    return F.pmod(F.xxhash64(F.lit(seed), key), F.lit(n))


def _choice(seed: int, key: Column, values: list[str]) -> Column:
    return F.element_at(
        F.array(*[F.lit(v) for v in values]), (_pick(seed, key, len(values)) + 1).cast("int")
    )


def _fanout(df: DataFrame, seed: int, key: Column, lo: int, hi: int) -> DataFrame:
    """1..k child rows per parent with k uniform in [lo, hi] —
    ``explode(sequence())`` replaces the reference's per-parent Python
    loop (generate_synthetic_data.py:109-151)."""
    k = (_pick(seed, key, hi - lo + 1) + lo).cast("int")
    return df.withColumn("seq", F.explode(F.sequence(F.lit(1), k)))


def gen_facilities(spark: SparkSession, n: int = 10, seed: int = 42) -> DataFrame:
    i = F.col("id")
    return spark.range(n).select(
        F.format_string("fac-%04d", i).alias("facility_id"),
        F.format_string("%s Medical Center %d", _choice(seed + 1, i, CITIES), i).alias(
            "facility_name"
        ),
        _choice(seed + 2, i, FACILITY_TYPES).alias("facility_type"),
        F.format_string("%s, ST", _choice(seed + 3, i, CITIES)).alias("location"),
    )


def gen_diagnosis_codes(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(f"code-{i:04d}", c, d, "ICD-10") for i, (c, d) in enumerate(COMMON_DIAGNOSES)],
        "code_id string, code string, description string, code_system string",
    )


def gen_patients(spark: SparkSession, n: int = 5000, seed: int = 42) -> DataFrame:
    i = F.col("id")
    return spark.range(n).select(
        F.format_string("pat-%08d", i).alias("patient_id"),
        (_pick(seed + 10, i, 83) + 18).cast("int").alias("age"),
        _choice(seed + 11, i, ["M", "F"]).alias("sex"),
        F.format_string("%s, ST", _choice(seed + 12, i, CITIES)).alias("location"),
        F.timestamp_seconds(F.lit(1717200000)).alias("created_at"),
    )


def gen_encounters(
    patients: DataFrame, facilities: DataFrame, seed: int = 42
) -> DataFrame:
    """1-8 encounters per patient (reference: config.py:20), facility
    hash-picked from the pool via broadcast join on a computed index."""
    fac_idx = facilities.select(
        F.col("facility_id"),
        (F.row_number().over(_order_w("facility_id")) - 1).alias("fac_i"),
    )
    n_fac = facilities.count()
    key = F.concat(F.col("patient_id"), F.lit("#"), F.col("seq"))
    enc = (
        _fanout(patients.select("patient_id"), seed + 20, F.col("patient_id"), 1, 8)
        .withColumn("encounter_id", F.format_string("enc-%s-%d", F.col("patient_id"), F.col("seq")))
        .withColumn("fac_i", _pick(seed + 21, key, n_fac))
        .withColumn(
            "encounter_date",
            F.date_sub(F.lit(ANCHOR).cast("date"), _pick(seed + 22, key, 730).cast("int")),
        )
        .withColumn("encounter_type", _choice(seed + 23, key, ENCOUNTER_TYPES))
        .withColumn("status", F.lit("completed"))
    )
    return enc.join(F.broadcast(fac_idx), "fac_i").select(
        "encounter_id", "patient_id", "facility_id", "encounter_date", "encounter_type", "status"
    )


def gen_procedures(encounters: DataFrame, seed: int = 42) -> DataFrame:
    """1-3 procedures per encounter (reference: config.py:21)."""
    key = F.concat(F.col("encounter_id"), F.lit("#"), F.col("seq"))
    return (
        _fanout(
            encounters.select("encounter_id", "encounter_date"),
            seed + 30,
            F.col("encounter_id"),
            1,
            3,
        )
        .select(
            F.format_string("proc-%s-%d", F.col("encounter_id"), F.col("seq")).alias(
                "procedure_id"
            ),
            F.col("encounter_id"),
            F.format_string("%s Chest Imaging", _choice(seed + 31, key, ["DX", "CT", "MR"])).alias(
                "procedure_name"
            ),
            _choice(seed + 31, key, ["DX", "CT", "MR"]).alias("modality"),
            _choice(seed + 32, key, PROJECTIONS).alias("projection"),
            F.col("encounter_date").alias("procedure_date"),
        )
    )


def gen_diagnoses(encounters: DataFrame, codes: DataFrame, seed: int = 42) -> DataFrame:
    """1-2 diagnoses per encounter, first one primary (reference:
    generate_synthetic_data.py:142-151); code hash-picked from the
    (broadcast) code pool."""
    code_idx = codes.select(
        F.col("code_id"), (F.row_number().over(_order_w("code_id")) - 1).alias("code_i")
    )
    n_codes = codes.count()
    key = F.concat(F.col("encounter_id"), F.lit("#"), F.col("seq"))
    d = (
        _fanout(
            encounters.select("encounter_id", "encounter_date"),
            seed + 40,
            F.col("encounter_id"),
            1,
            2,
        )
        .withColumn("code_i", _pick(seed + 41, key, n_codes))
        .withColumn("is_primary", F.col("seq") == 1)
    )
    return d.join(F.broadcast(code_idx), "code_i").select(
        F.format_string("diag-%s-%d", F.col("encounter_id"), F.col("seq")).alias("diagnosis_id"),
        F.col("encounter_id"),
        F.col("code_id"),
        F.col("is_primary"),
        F.col("encounter_date").alias("diagnosis_date"),
    )


def gen_reports(encounters: DataFrame, seed: int = 42) -> DataFrame:
    """A radiology report for ~70% of encounters — drives the
    ``has_report`` fact flag (reference: populate_warehouse.py:178-185)."""
    key = F.col("encounter_id")
    return (
        encounters.filter(_pick(seed + 50, key, 10) < 7)
        .select(
            F.format_string("rep-%s", key).alias("report_id"),
            key.alias("encounter_id"),
            F.lit("radiology").alias("report_type"),
            F.format_string(
                "Chest X-ray shows %s", _choice(seed + 51, key, LABELS)
            ).alias("report_text"),
            F.lit("en").alias("language"),
        )
    )


def gen_staging(spark: SparkSession, n: int = 10000, seed: int = 42) -> DataFrame:
    """Raw staging-shaped records — the synthetic fallback source
    (reference: etl_pipeline.py:44-63). ``study_date`` is a yyyyMMdd
    *string* with ~1% malformed values so the P2 errors→null parse
    path is exercised; ~2% of image ids repeat so staging dedup (K1)
    has work to do."""
    i = F.col("id")
    base_id = F.when(_pick(seed + 60, i, 50) == 0, (i / 2).cast("long")).otherwise(i)
    date = F.date_sub(F.lit(ANCHOR).cast("date"), _pick(seed + 61, i, 730).cast("int"))
    date_str = F.when(_pick(seed + 62, i, 100) == 0, F.lit("NOT_A_DATE")).otherwise(
        F.date_format(date, "yyyyMMdd")
    )
    return spark.range(n).select(
        F.format_string("IMG_%06d", base_id).alias("image_id"),
        (_pick(seed + 63, i, 66) + 20).cast("int").alias("patient_age"),
        _choice(seed + 64, i, ["M", "F"]).alias("patient_sex"),
        date_str.alias("study_date"),
        _choice(seed + 65, i, PROJECTIONS).alias("projection"),
        F.lit("DX").alias("modality"),
        _choice(seed + 66, i, LABELS).alias("labels"),
        F.format_string(
            "Chest X-ray shows %s", _choice(seed + 67, i, LABELS)
        ).alias("report_text"),
    ).drop("id")


def _order_w(col: str):
    from pyspark.sql import Window

    return Window.orderBy(col)


def generate_operational(spark: SparkSession, n_patients: int = 5000, seed: int = 42):
    """All operational tables in dependency order — the Spark
    equivalent of the reference's ``main()``
    (generate_synthetic_data.py:163-193). Returns a dict of frames;
    callers persist via :class:`~.store.Store`."""
    facilities = gen_facilities(spark, max(n_patients // 500, 1), seed)
    codes = gen_diagnosis_codes(spark)
    patients = gen_patients(spark, n_patients, seed)
    encounters = gen_encounters(patients, facilities, seed)
    return {
        "facilities": facilities,
        "diagnosis_codes": codes,
        "patients": patients,
        "encounters": encounters,
        "procedures": gen_procedures(encounters, seed),
        "diagnoses": gen_diagnoses(encounters, codes, seed),
        "reports": gen_reports(encounters, seed),
    }
