"""Single source of truth for the engine's query surface.

``QUERIES`` maps name -> (spark, sf_dir) -> DataFrame.
``ORACLES`` maps name -> DuckDB SQL (absent for the genuinely
non-SQL-expressible operators: seeded-hash MinHash-LSH and IVF cell
routing — those are covered by unit tests with planted data).

__spark_entry__.py re-exports these for the driver; the pytest suite
runs the same pairs differentially.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import extensions, pipeline_queries, relational

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {
    **relational.QUERIES,
    **extensions.QUERIES,
    **pipeline_queries.QUERIES,
}
ORACLES: dict[str, str] = {
    **relational.ORACLES,
    **extensions.ORACLES,
    **pipeline_queries.ORACLES,
}

# Every oracle must belong to a registered query.
_orphans = set(ORACLES) - set(QUERIES)
assert not _orphans, f"oracle_sql entries without queries: {_orphans}"

FLAGSHIP = "q07_star_join_revenue"
