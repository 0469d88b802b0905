"""Incremental fact load (pipeline/warehouse.py::load_fact_incremental):
loading batch B into a warehouse built from batch A must converge to
the same state as a full rebuild over A ∪ B — up to surrogate-key
numbering, which is load-order dependent by design (keys carry no
semantics). Fact content is therefore compared through natural keys;
MV tables must match exactly. Replay of an already-loaded batch must
be a no-op (K1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.pipeline.generate import generate_operational
from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.pipeline.warehouse import (
    build_warehouse,
    load_fact_incremental,
)

CHILDREN = ("procedures", "diagnoses", "reports")


def _split(tables):
    """Deterministic ~80/20 split of the world by encounter, children
    following their encounter; patients split by whether they have an
    A-encounter (so batch B introduces genuinely new patients)."""
    enc = tables["encounters"]
    in_a = F.pmod(F.xxhash64("encounter_id"), F.lit(5)) != 0
    enc_a, enc_b = enc.filter(in_a), enc.filter(~in_a)
    a, b = {"encounters": enc_a}, {"encounters": enc_b}
    for name in CHILDREN:
        a[name] = tables[name].join(
            enc_a.select("encounter_id"), "encounter_id", "left_semi"
        )
        b[name] = tables[name].join(
            enc_b.select("encounter_id"), "encounter_id", "left_semi"
        )
    a["patients"] = tables["patients"].join(
        enc_a.select("patient_id").distinct(), "patient_id", "left_semi"
    )
    return a, b


def _fact_natural(store):
    """Fact rows projected to natural keys (surrogate keys resolved
    through their dims), comparable across stores with different key
    numbering."""
    fact = store.read("fact_encounters")
    pat = store.read("dim_patient").select("patient_key", "patient_id")
    return sorted(
        map(
            tuple,
            fact.join(pat, "patient_key")
            .select(
                "encounter_id",
                "patient_id",
                "facility_key",
                "date_key",
                "encounter_type",
                "num_procedures",
                "num_diagnoses",
                "has_report",
            )
            .collect(),
        )
    )


def _mv_rows(store, name):
    return sorted(map(tuple, store.read(name).collect()))


@pytest.fixture()
def world(spark, tmp_path):
    tables = generate_operational(spark, n_patients=120, seed=11)
    a, b = _split(tables)

    full = Store(spark, str(tmp_path / "full"))
    for name, df in tables.items():
        full.overwrite(df, name)
    build_warehouse(full, stats=False)

    inc = Store(spark, str(tmp_path / "inc"))
    for name, df in tables.items():
        inc.overwrite(df, name)
    for name, df in a.items():  # initial world knows only batch A
        inc.overwrite(df, name)
    build_warehouse(inc, stats=False)
    return full, inc, tables, b


def test_incremental_load_converges_to_full_rebuild(spark, world):
    full, inc, tables, b = world

    # the ingest contract: operational tables already carry the batch
    inc.overwrite(tables["patients"], "patients")

    stats = load_fact_incremental(
        inc, b["encounters"], b["procedures"], b["diagnoses"], b["reports"]
    )
    assert stats["new_fact_rows"] == b["encounters"].count() > 0
    assert stats["new_patients"] > 0  # split guarantees B-only patients
    assert stats["touched_years"] >= 1 and stats["refreshed_months"] >= 1

    assert _fact_natural(inc) == _fact_natural(full)
    for mv in (
        "mv_monthly_encounters",
        "mv_diagnosis_by_age_group",
        "mv_procedure_volume",
    ):
        assert _mv_rows(inc, mv) == _mv_rows(full, mv), mv

    # surrogate keys stay dense and unique after the merge
    fact = inc.read("fact_encounters")
    n = fact.count()
    keys = fact.agg(
        F.countDistinct("encounter_key").alias("d"),
        F.min("encounter_key").alias("lo"),
        F.max("encounter_key").alias("hi"),
    ).collect()[0]
    assert (keys.d, keys.lo, keys.hi) == (n, 1, n)

    # bridge multiplicity: every fact row's child count equals its
    # bridge fan-out (keys resolved per-store, so compare totals)
    bep = inc.read("bridge_encounter_procedure").count()
    assert bep == full.read("bridge_encounter_procedure").count()
    bed = inc.read("bridge_encounter_diagnosis").count()
    assert bed == full.read("bridge_encounter_diagnosis").count()


def test_incremental_load_replay_is_noop(spark, world):
    _, inc, tables, b = world
    inc.overwrite(tables["patients"], "patients")
    load_fact_incremental(
        inc, b["encounters"], b["procedures"], b["diagnoses"], b["reports"]
    )
    before_fact = _fact_natural(inc)
    before_mv = _mv_rows(inc, "mv_monthly_encounters")

    stats = load_fact_incremental(
        inc, b["encounters"], b["procedures"], b["diagnoses"], b["reports"]
    )
    assert stats["new_fact_rows"] == 0
    assert stats["new_patients"] == 0
    assert stats["touched_years"] == 0
    assert _fact_natural(inc) == before_fact
    assert _mv_rows(inc, "mv_monthly_encounters") == before_mv


def test_overwrite_partitions_replaces_only_present(spark, tmp_path):
    store = Store(spark, str(tmp_path / "p"))
    df = spark.createDataFrame(
        [(1, 2020, "a"), (2, 2020, "b"), (3, 2021, "c")], "id long, y int, v string"
    )
    store.overwrite(df, "t", partition_by=["y"])
    # replace ONLY 2021 with new content; 2020 must be untouched
    upd = spark.createDataFrame([(9, 2021, "z")], "id long, y int, v string")
    store.overwrite_partitions(upd, "t", partition_by=["y"])
    got = sorted(map(tuple, store.read("t").select("id", "y", "v").collect()))
    assert got == [(1, 2020, "a"), (2, 2020, "b"), (9, 2021, "z")]
