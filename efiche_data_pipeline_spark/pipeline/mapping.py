"""Map the driver's TPC-H-ish fixture tables onto the operational
healthcare schema, so the *write-side* pipeline (warehouse build, MV
refresh) can be differentially verified against a DuckDB oracle that
only sees the raw fixture tables.

Every derived attribute is plain integer arithmetic / CASE over fixture
columns — expressible identically in ANSI SQL — so a DuckDB query can
recompute what the warehouse tables *should* contain without running
any of our code. The entity correspondence:

==============  =======================  =============================
operational     fixture                  notes
==============  =======================  =============================
patients        customer                 age = (c_custkey*37) % 83 + 18
facilities      nation                   facility per nation
encounters      orders ⋈ customer        facility = customer's nation
procedures      lineitem                 modality = pmod(l_partkey, 3)
diagnosis_codes part                     code = p_brand, desc = p_type
diagnoses       lineitem                 code_id = l_partkey
reports         orders (URGENT/HIGH)     drives has_report
==============  =======================  =============================
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Window

from ..sources.catalog import load_table

MODALITIES = ["DX", "CT", "MR"]
PROJECTIONS = ["PA", "AP", "L"]
FACILITY_TYPES = ["Hospital", "Clinic", "Medical Center", "Urgent Care"]

# The same derivations, as SQL fragments the oracles compose.
SQL_AGE = "(c_custkey * 37) % 83 + 18"
SQL_MODALITY = (
    "CASE l_partkey % 3 WHEN 0 THEN 'DX' WHEN 1 THEN 'CT' ELSE 'MR' END"
)
SQL_AGE_GROUP = f"""CASE
    WHEN {SQL_AGE} BETWEEN 18 AND 30 THEN '18-30'
    WHEN {SQL_AGE} BETWEEN 31 AND 50 THEN '31-50'
    WHEN {SQL_AGE} BETWEEN 51 AND 70 THEN '51-70'
    WHEN {SQL_AGE} > 70 THEN '71+'
    ELSE 'Unknown' END"""


def _choice_by_mod(key, values: list[str]):
    c = F.when(F.pmod(key, F.lit(len(values))) == 0, values[0])
    for i, v in enumerate(values[1:], start=1):
        c = c.when(F.pmod(key, F.lit(len(values))) == i, v)
    return c


def map_operational(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    patients = customer.select(
        F.col("c_custkey").alias("patient_id"),
        (F.pmod(F.col("c_custkey") * 37, F.lit(83)) + 18).cast("int").alias("age"),
        _choice_by_mod(F.col("c_custkey"), ["M", "F"]).alias("sex"),
        F.col("c_mktsegment").alias("location"),
    )
    facilities = nation.select(
        F.col("n_nationkey").alias("facility_id"),
        F.col("n_name").alias("facility_name"),
        _choice_by_mod(F.col("n_nationkey"), FACILITY_TYPES).alias("facility_type"),
        F.col("n_name").alias("location"),
    )
    encounters = orders.join(
        customer.select("c_custkey", "c_nationkey"),
        orders["o_custkey"] == F.col("c_custkey"),
    ).select(
        F.col("o_orderkey").alias("encounter_id"),
        F.col("o_custkey").alias("patient_id"),
        F.col("c_nationkey").alias("facility_id"),
        F.col("o_orderdate").alias("encounter_date"),
        F.col("o_orderpriority").alias("encounter_type"),
        F.col("o_orderstatus").alias("status"),
    )
    # The fixture's lineitem is TPC-H-*ish*: (l_orderkey, l_linenumber)
    # is NOT unique, but the operational schema requires a unique
    # procedure/diagnosis PK (UUID in the reference). line_id*64 + a
    # per-line_id row_number uniquifies with one partitioned window
    # (parallel in |distinct line_id|); identical source rows are
    # interchangeable, so the result is deterministic as a multiset and
    # no oracle ever references these ids.
    line_id = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("line_id")
    uniq_w = Window.partitionBy("line_id").orderBy("line_id")
    procedures = (
        lineitem.select(
            line_id,
            F.col("l_orderkey").alias("encounter_id"),
            _choice_by_mod(F.col("l_partkey"), MODALITIES).alias("procedure_name"),
            _choice_by_mod(F.col("l_partkey"), MODALITIES).alias("modality"),
            _choice_by_mod(F.col("l_suppkey"), PROJECTIONS).alias("projection"),
            F.col("l_shipdate").alias("procedure_date"),
        )
        .withColumn(
            "procedure_id", F.col("line_id") * 64 + F.row_number().over(uniq_w)
        )
        .drop("line_id")
    )
    diagnosis_codes = part.select(
        F.col("p_partkey").alias("code_id"),
        F.col("p_brand").alias("code"),
        F.col("p_type").alias("description"),
        F.lit("ICD-10").alias("code_system"),
    )
    diagnoses = (
        lineitem.select(
            line_id,
            F.col("l_orderkey").alias("encounter_id"),
            F.col("l_partkey").alias("code_id"),
            (F.col("l_linenumber") == 1).alias("is_primary"),
            F.col("l_shipdate").alias("diagnosis_date"),
        )
        .withColumn(
            "diagnosis_id", F.col("line_id") * 64 + F.row_number().over(uniq_w)
        )
        .drop("line_id")
    )
    reports = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(
        F.col("o_orderkey").alias("report_id"),
        F.col("o_orderkey").alias("encounter_id"),
        F.lit("radiology").alias("report_type"),
        F.format_string("Report for priority %s", F.col("o_orderpriority")).alias(
            "report_text"
        ),
        F.lit("en").alias("language"),
    )
    return {
        "patients": patients,
        "facilities": facilities,
        "encounters": encounters,
        "procedures": procedures,
        "diagnosis_codes": diagnosis_codes,
        "diagnoses": diagnoses,
        "reports": reports,
    }
