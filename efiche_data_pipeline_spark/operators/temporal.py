"""Temporal join operators Spark lacks as built-ins: as-of join and
bucketized range join.

Neither exists in the reference (SURVEY §2.4: "No sort-merge-specific,
range, as-of, or interval joins") — they are engine capabilities a
time-series/event workload needs, implemented as compositions of
existing DataFrame ops (option (a) of the custom-operator ladder), so
Catalyst still sees plain shuffles/windows/joins it can optimize.

Scale notes:

- :func:`asof_join` is the union + ordered-window "last known value"
  formulation: ONE shuffle by the join key, state bounded by the
  window frame, no time-range blow-up. The naive alternative
  (theta-join on ``l.ts >= r.ts`` + argmax) is quadratic per key.
- :func:`range_join` equi-joins on a time bucket and post-filters the
  residual — the standard rewrite that turns an unbounded
  BroadcastNestedLoopJoin into a hash join. Bucket width should be on
  the order of the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward inclusive as-of join: every left row gains the
    ``value_cols`` of the latest right row with
    ``right.ts <= left.ts`` and equal ``on`` keys (null if none).

    DuckDB twin (the oracle): ``l ASOF LEFT JOIN r ON l.k = r.k AND
    l.ts >= r.ts``.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols {clash} collide with left columns; rename first")

    lrow_type = "struct<" + ",".join(
        f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields
    ) + ">"
    l2 = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        *value_cols,
    )
    # Right rows sort before left rows at equal ts (0 < 1), so an
    # exactly-simultaneous right row is visible to the left row —
    # backward *inclusive*, matching ASOF's l.ts >= r.ts.
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).select(
        "_is_left",
        "_lrow",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col("_is_left") == 1).select("_lrow.*", *value_cols)


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    left_ts: str = "ts",
    start_col: str = "win_start",
    end_col: str = "win_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join each left row to every interval containing its timestamp
    (half-open ``[start, end)``), via time-bucket equi-join + residual
    filter. Intervals may span multiple buckets (they explode to one
    row per covered bucket); each (row, interval) pair matches in
    exactly the row's bucket, so no dedup is needed."""
    b = F.lit(bucket_seconds)
    l2 = left.withColumn("_b", F.floor(F.unix_timestamp(F.col(left_ts)) / b))
    i2 = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                # end is exclusive: a zero-length or bucket-aligned end
                # must not add an extra bucket
                F.floor((F.unix_timestamp(F.col(end_col)) - 1) / b),
            )
        ),
    )
    return (
        l2.join(i2, "_b")
        .filter(
            (F.col(left_ts) >= F.col(start_col)) & (F.col(left_ts) < F.col(end_col))
        )
        .drop("_b")
    )
