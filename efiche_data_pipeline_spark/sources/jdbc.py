"""JDBC source/sink — the second half of S4 (SURVEY §2.1).

The reference reads its live tables over a database connection
(reference: src/run_analytics.py:16-23 ``pd.read_sql_query`` against
PostgreSQL, docker-compose.yml:5); this is the Spark-native form:
``spark.read.jdbc`` pulls the table through the JVM driver with
predicate pushdown (filters become WHERE clauses on the remote side)
and optional partitioned reads — N concurrent range-bounded SELECTs
instead of one cursor, which is the difference between a connector
and a bottleneck when the operational store is large.

Scale notes:
- An unpartitioned JDBC read is ONE task regardless of cluster size.
  Always pass ``partition_col`` (+ bounds) for anything bigger than a
  dim table; bounds default to the remote MIN/MAX fetched with one
  tiny bounds query.
- Pushdown: Catalyst sends ``filter``s down as SQL WHERE and prunes
  columns into the SELECT list — verified in tests by asserting the
  scan's ``PushedFilters``.
- Writes go through ``df.write.jdbc`` with controlled parallelism
  (``coalesce``) — the remote database, not Spark, is the contention
  point for insert throughput.

Tests run against the Derby engine embedded in the Spark JVM (no
server process) — the same code path talks to PostgreSQL/MySQL by
swapping the URL/driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def derby_url(db_dir: str) -> str:
    """Embedded-Derby JDBC URL (in-JVM database at ``db_dir``,
    created on first use) — the zero-infrastructure stand-in for a
    real database server in tests/demos."""
    return f"jdbc:derby:{db_dir};create=true"


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_col: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Read ``table`` over JDBC.

    With ``partition_col`` (numeric), the read fans out into
    ``num_partitions`` range-bounded SELECTs; missing bounds are
    fetched with a single MIN/MAX query first. Without it, the read is
    a single task — fine for dims, wrong for facts."""
    props = dict(properties or {})
    if partition_col is None:
        return spark.read.jdbc(url, table, properties=props)
    if lower_bound is None or upper_bound is None:
        # ANSI-quote the column: Spark's JDBC writer creates quoted
        # (case-preserved) identifiers, which an unquoted reference
        # would be case-folded away from by the remote engine.
        bounds = spark.read.jdbc(
            url,
            f'(SELECT MIN("{partition_col}") lo, MAX("{partition_col}") hi '
            f"FROM {table}) b",
            properties=props,
        ).first()
        lower_bound, upper_bound = bounds[0], bounds[1]
    if lower_bound is None:  # empty table
        return spark.read.jdbc(url, table, properties=props)
    return spark.read.jdbc(
        url,
        table,
        column=partition_col,
        lowerBound=int(lower_bound),
        upperBound=int(upper_bound) + 1,
        numPartitions=num_partitions,
        properties=props,
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    max_connections: int = 4,
    properties: dict[str, str] | None = None,
    column_types: str | None = None,
) -> None:
    """Write ``df`` to a JDBC table with bounded connection fan-out —
    each partition opens one connection/INSERT stream, so parallelism
    is capped at ``max_connections`` rather than the cluster's task
    slots (the remote database is the throughput ceiling).

    ``column_types`` ("col VARCHAR(10), ..." DDL fragment) overrides
    the dialect's default type mapping on table creation — needed e.g.
    on Derby, whose default StringType mapping (CLOB) rejects the
    equality comparisons that pushed-down filters compile to."""
    writer = df.coalesce(max_connections).write
    if column_types:
        writer = writer.option("createTableColumnTypes", column_types)
    writer.jdbc(url, table, mode=mode, properties=dict(properties or {}))
