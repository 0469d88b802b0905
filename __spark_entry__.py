"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in ``efiche_data_pipeline_spark``;
this module just re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from efiche_data_pipeline_spark.plans.registry import FLAGSHIP, ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (4-way star join + multi-distinct aggregate) on
    the sf0.001 fixtures; driver checks rows > 0."""
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query. 212 of the 214 registered
    queries have one; the two exceptions are q171_compression_ratio
    and q172_incremental_compression_ratio, whose zlib
    compression-ratio signal runs in an Arrow ``mapInPandas`` pass
    DuckDB cannot reproduce — those two are verified instead by a
    determinism pytest pair that cross-checks the same rows against
    Python's zlib (tests/test_quality.py). The former Spark-only
    operators, MinHash-LSH and IVF search, have had portable
    pinned-seed / pinned-centroid DuckDB oracles since round 4."""
    return dict(ORACLES)
