"""SQL-surface differential tests: every SQL_QUERIES entry must return
exactly what its DataFrame-API twin returns (same Catalyst engine,
two front-ends)."""

from __future__ import annotations

import pytest

from efiche_data_pipeline_spark.plans.registry import QUERIES
from efiche_data_pipeline_spark.plans.sql_api import SQL_QUERIES, run_sql

from .conftest import SF_DIR, assert_frames_match


@pytest.mark.parametrize("name", sorted(SQL_QUERIES))
def test_sql_surface_matches_dataframe_surface(spark, name):
    sql_pdf = run_sql(spark, SF_DIR, name).toPandas()
    df_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    assert_frames_match(sql_pdf, df_pdf, f"sql:{name}")
