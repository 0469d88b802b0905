"""Incremental MV refresh: refreshing only the changed months must
yield a table identical to a full recompute — the
continuous-aggregate contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.pipeline.generate import generate_operational
from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.pipeline.warehouse import (
    build_warehouse,
    refresh_mv_monthly_incremental,
    refresh_views,
)


@pytest.fixture()
def wh(spark, tmp_path):
    store = Store(spark, str(tmp_path / "wh"))
    tables = generate_operational(spark, n_patients=150, seed=3)
    for name, df in tables.items():
        store.overwrite(df, name)
    build_warehouse(store)
    return store, tables


def test_incremental_equals_full_refresh(spark, wh):
    store, tables = wh

    # Simulate late-arriving facts: clone some encounters into new ids
    # and rebuild the fact (fact build is the already-tested path; the
    # unit under test is the MV refresh strategy).
    extra = (
        tables["encounters"]
        .limit(40)
        .withColumn("encounter_id", F.concat(F.col("encounter_id"), F.lit("-late")))
    )
    store.append(extra, "encounters")
    build_warehouse(store)  # full rebuild: fact now includes the extras

    # Corrupt the monthly MV rows for the affected months so a no-op
    # "refresh" can't pass by accident.
    mv = store.read("mv_monthly_encounters")
    stale = mv.withColumn("total_encounters", F.lit(-1))
    store.overwrite(stale.localCheckpoint(eager=True), "mv_monthly_encounters")

    n = refresh_mv_monthly_incremental(store, extra)
    assert n == extra.select(
        F.year("encounter_date"), F.month("encounter_date")
    ).distinct().count()

    months = {
        (r.y, r.m)
        for r in extra.select(
            F.year("encounter_date").alias("y"), F.month("encounter_date").alias("m")
        ).distinct().collect()
    }
    got_rows = store.read("mv_monthly_encounters").collect()
    # months NOT touched keep their (corrupted) rows — proof the
    # refresh really was partial
    assert any(r.total_encounters == -1 for r in got_rows)

    # a full refresh must agree exactly on the refreshed months
    refresh_views(store)
    full_rows = store.read("mv_monthly_encounters").collect()
    got_m = sorted(tuple(r) for r in got_rows if (r.year, r.month) in months)
    full_m = sorted(tuple(r) for r in full_rows if (r.year, r.month) in months)
    assert got_m == full_m


def test_incremental_refresh_empty_increment(spark, wh):
    store, tables = wh
    before = sorted(map(tuple, store.read("mv_monthly_encounters").collect()))
    empty = tables["encounters"].limit(0)
    assert refresh_mv_monthly_incremental(store, empty) == 0
    after = sorted(map(tuple, store.read("mv_monthly_encounters").collect()))
    assert after == before
