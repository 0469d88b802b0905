"""Data-quality assertion steps — the enforcement half of the schema
contracts the reference delegates to PostgreSQL DDL (CHECK constraints
sql/01_schema.sql:11-12,25,37 and FK REFERENCES :33-35,50-51; Spark
has neither), as declarative rules over DataFrames.

Scale shape: every ROW-LEVEL rule (not-null, range, set membership,
regex, uniqueness) for one table compiles into a SINGLE aggregate pass
— one scan, one row out, no matter how many rules — because each rule
is a conditional count and uniqueness is ``count(*) − count(distinct
key)`` in the same aggregate. Referential rules are one left-anti join
each (orphans = child keys absent from the parent), keyed exactly like
the warehouse joins they guard.

Usage::

    report = check_rules(df, [not_null("age"), in_range("age", 0, 120)])
    orphans = check_fk(encounters, "patient_id", patients, "patient_id")
    assert_quality({**report, "fk_patient": orphans})  # raises on violation
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.col(col).isNotNull()


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """CHECK (lo <= col <= hi) — NULLs are ignored (compose with
    not_null to forbid them), matching SQL CHECK semantics where NULL
    comparisons are not violations."""
    c = F.col(col)
    return f"in_range({col},{lo},{hi})", c.isNull() | c.between(lo, hi)


def in_set(col: str, allowed: list) -> tuple[str, Column]:
    c = F.col(col)
    return f"in_set({col})", c.isNull() | c.isin(*allowed)


def matches(col: str, pattern: str) -> tuple[str, Column]:
    c = F.col(col)
    return f"matches({col})", c.isNull() | c.rlike(pattern)


def check_rules(
    df: DataFrame, rules: list[tuple[str, Column]], unique_key: list[str] | None = None
) -> dict[str, int]:
    """Violation count per rule, all computed in ONE aggregate pass.
    ``unique_key`` adds a duplicate-rows count (PK uniqueness) to the
    same pass."""
    aggs = [
        F.sum(F.when(~cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in rules
    ]
    if unique_key:
        aggs.append(
            (
                F.count(F.lit(1))
                - F.countDistinct(*[F.col(k) for k in unique_key])
            )
            .cast("long")
            .alias(f"unique({','.join(unique_key)})")
        )
    row = df.agg(*aggs).collect()[0]
    return {k: int(v or 0) for k, v in row.asDict().items()}


def check_fk(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> int:
    """Orphan count: child rows (with non-null key) whose key has no
    parent — the FK REFERENCES contract as a left-anti join. The
    parent side is pruned to its key column before the join."""
    return (
        child.select(F.col(child_key))
        .filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
        )
        .count()
    )


def assert_quality(report: dict[str, int]) -> None:
    """Raise ``ValueError`` naming every violated rule (count > 0)."""
    bad = {k: v for k, v in report.items() if v > 0}
    if bad:
        raise ValueError(f"data-quality violations: {bad}")
