"""Dimension versioning (SCD Type-2) and CDC log compaction — the two
change-management primitives a star-schema warehouse needs once its
dimensions stop being static.

The reference keeps dimensions insert-only (``INSERT … ON CONFLICT DO
NOTHING``, reference: src/populate_warehouse.py:61-125) and marks
processed staging rows with an UPDATE (reference:
src/etl_pipeline.py:184-188) — i.e. it has change *capture* but no
change *history*. These operators add the history side, Spark-first:

- :func:`scd2_apply` — merge a batch of attribute updates into a
  versioned dimension (valid_from / valid_to / is_current), closing
  changed rows and inserting new versions. Pure DataFrame ops: one
  equi-join of the update batch against the *current* slice, a
  change-hash comparison, and a union — at 100 TB the join key is the
  natural key, the history slice is never joined (only unioned back),
  and the update batch is typically broadcast-sized.
- :func:`cdc_compact` — collapse an ordered change log (upserts +
  deletes) to its latest-state snapshot: one window per key, keep
  rank 1, drop rows whose final operation is a delete. The shuffle
  carries only the log (not the snapshot), partitioned by key.

Both are deterministic (no timestamps read from the clock — the batch
supplies its own effective date) so merges are replayable, and both are
oracle-checked end-to-end (q62/q63 in plans/extensions.py) plus
unit-tested on planted scenarios (tests/test_scd.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _attr_hash(attrs: list[str]) -> Column:
    # Null-safe change detector: a real NULL never collides with the
    # literal sentinel because the sentinel is paired with a 0/1 flag.
    parts: list[Column] = []
    for a in attrs:
        c = F.col(a)
        parts.append(F.coalesce(c.cast("string"), F.lit("")))
        parts.append(c.isNull().cast("string"))
    return F.md5(F.concat_ws("", *parts))


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective_date: str | Column,
) -> DataFrame:
    """Merge ``updates`` (one row per ``key``, columns ``[key] +
    attrs``) into the SCD2 dimension ``dim`` (columns ``[key] + attrs +
    [valid_from, valid_to, is_current]``), all versions retained:

    - key absent from ``dim``          → insert a new current version;
    - key present, any attr changed    → close the current row
      (``valid_to = effective_date``, ``is_current = false``) and
      insert the new version (``valid_from = effective_date``);
    - key present, attrs identical     → no-op (re-applying the same
      batch is idempotent);
    - history rows (``is_current = false``) pass through untouched.

    Returns the full new dimension frame (history + current). The
    caller persists it (e.g. ``Store.overwrite``); pairing with
    ``Store.merge_upsert`` keyed on (key, valid_from) gives the same
    result incrementally.
    """
    eff = F.lit(effective_date).cast("date") if isinstance(effective_date, str) else effective_date
    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))

    upd = updates.select(key, *attrs).withColumn("_h_new", _attr_hash(attrs))
    cur = current.withColumn("_h_old", _attr_hash(attrs))

    joined = cur.alias("c").join(
        upd.select(key, "_h_new").alias("u"), on=key, how="left"
    )
    unchanged = joined.filter(
        F.col("_h_new").isNull() | (F.col("_h_new") == F.col("_h_old"))
    ).select(*dim.columns)
    closed = (
        joined.filter(F.col("_h_new").isNotNull() & (F.col("_h_new") != F.col("_h_old")))
        .select(*dim.columns)
        .withColumn("valid_to", eff)
        .withColumn("is_current", F.lit(False))
    )

    changed_or_new = upd.alias("u").join(
        cur.select(key, "_h_old").alias("c"), on=key, how="left"
    ).filter(F.col("_h_old").isNull() | (F.col("_h_old") != F.col("_h_new")))
    inserted = changed_or_new.select(
        key,
        *attrs,
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    ).select(*dim.columns)

    return history.unionByName(unchanged).unionByName(closed).unionByName(inserted)


def scd2_init(
    snapshot: DataFrame, key: str, attrs: list[str], valid_from: str | Column
) -> DataFrame:
    """Bootstrap a versioned dimension from a plain snapshot: every row
    becomes version 1, current, open-ended."""
    vf = F.lit(valid_from).cast("date") if isinstance(valid_from, str) else valid_from
    return snapshot.select(
        key,
        *attrs,
        vf.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_as_of(dim: DataFrame, as_of: str | Column) -> DataFrame:
    """Point-in-time slice of an SCD2 dimension: rows whose
    ``[valid_from, valid_to)`` interval covers ``as_of``. A scan-side
    filter — with the dimension range-clustered on ``valid_from``
    (``Store.overwrite_sorted``) this prunes row groups at scale."""
    ts = F.lit(as_of).cast("date") if isinstance(as_of, str) else as_of
    return dim.filter(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    )


def cdc_compact(
    log: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a CDC log to its latest-state snapshot: for each key,
    keep the row with the highest ``seq_cols`` (total order — include a
    unique tiebreaker like an event id), then drop keys whose final
    operation is ``delete_op``. Output columns = input minus ``op_col``.

    Single hash-shuffle on ``keys``; the per-key window is a
    rank-1 ``row_number`` which Spark executes as a partial + final
    ``WindowGroupLimit`` (no per-key full sort materialization).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in seq_cols])
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn", op_col)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    attrs: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Derive a CDC change feed from two table snapshots — the inverse
    of :func:`cdc_compact`, and the bridge from the Store's versioned
    snapshots (pipeline/store.py:write_version) to every downstream
    change consumer (SCD2 merges, incremental MV refresh, streaming
    replication).

    Output: ``key`` + ``attrs`` (the NEW image; the OLD image for
    deletes) + ``op_col`` ∈ {I, U, D}. Unchanged rows are absent, so
    the feed size scales with the change set. One full-outer equi-join
    on ``key``; change detection is the same map-side null-safe
    attr-hash SCD2 uses, so NULL↔sentinel confusions can't happen."""
    o = old.select(key, *attrs).alias("o")
    n = new.select(key, *attrs).alias("n")
    oh = _attr_hash([f"o.{a}" for a in attrs])
    nh = _attr_hash([f"n.{a}" for a in attrs])
    j = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    op = (
        F.when(F.col(f"o.{key}").isNull(), "I")
        .when(F.col(f"n.{key}").isNull(), "D")
        .when(oh != nh, "U")
    )
    picked = [
        F.coalesce(F.col(f"n.{key}"), F.col(f"o.{key}")).alias(key),
        *[
            F.when(F.col(f"n.{key}").isNull(), F.col(f"o.{a}"))
            .otherwise(F.col(f"n.{a}"))
            .alias(a)
            for a in attrs
        ],
    ]
    return (
        j.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(*picked, op_col)
    )
