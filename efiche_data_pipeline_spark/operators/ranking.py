"""Scalable global ranking — row_number / ntile over a total order
WITHOUT a single-partition window.

``ROW_NUMBER() OVER (ORDER BY …)`` (and ntile, which is row_number
plus arithmetic) funnels every row through one task — the
classic unbounded-window scale-killer. The shape here is the
order-preserving cousin of the hash-bucketed surrogate-key assigner
(pipeline/warehouse.py:assign_surrogate_key) and the prefix-sum
bucketing in operators/packing.py:

1. Approximate quantile boundaries of the leading order column split
   the value axis into ``buckets`` intervals (percentile_approx — a
   deterministic aggregate returning actual data values, so bucket
   assignment is reproducible and near-uniform even on skewed
   distributions).
2. Each row's bucket id = how many boundaries lie strictly below its
   value (a per-row higher-order fold over the broadcast boundary
   array — no shuffle). Equal values always share a bucket, so bucket
   order extends the value order.
3. Rows get ``row_number`` within their bucket (bounded window), and
   the per-bucket counts — a ``buckets``-row frame — turn into
   broadcast cumulative offsets. Global rank = offset + local rank.

The result is bit-identical to the single-window form whenever the
composite ``order_cols`` is a total order (ties would make both forms
nondeterministic). Cost: one bounded window + two tiny broadcasts; the
only single-partition window runs over ≤ ``buckets`` rows.

Reference analogue: none (the reference's ntile-style analytics run
inside PostgreSQL); this is the 100 TB re-design of that capability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket_ids(df: DataFrame, lead_col: str, buckets: int) -> DataFrame:
    """Attach an order-preserving ``_b`` bucket id derived from
    approx-quantile boundaries of ``lead_col``. Ties on a boundary
    value stay in one bucket (strict ``>`` comparison)."""
    if buckets <= 1:
        # Degenerate single bucket — no boundaries to compute (an empty
        # percentile list returns NULL, which would null out _b and
        # drop every row at the offsets join).
        return df.withColumn("_b", F.lit(0))
    probs = [i / buckets for i in range(1, buckets)]
    bnds = df.agg(
        F.percentile_approx(lead_col, probs, 10_000).alias("_bnds")
    )
    return (
        df.join(F.broadcast(bnds))
        .withColumn(
            "_b",
            F.aggregate(
                "_bnds",
                F.lit(0),
                lambda acc, x: acc
                + F.when(F.col(lead_col) > x, 1).otherwise(0),
            ),
        )
        .drop("_bnds")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    buckets: int = 64,
    total_col: str | None = None,
) -> DataFrame:
    """1-based dense global rank over ``order_cols`` (ascending; must
    form a total order — include a unique tiebreaker column).

    ``total_col`` additionally attaches the TOTAL row count to every
    row, computed inside the same bucket-counts window the offsets
    already pay for (the ``buckets``-row frame) — order-statistic
    consumers (percentile thresholds: rank k of n) then read rank,
    value, and n in ONE job instead of paying a separate count."""
    lead = order_cols[0]
    with_b = _bucket_ids(df, lead, buckets)
    counts = with_b.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    keep = ["_b", "_off"]
    if total_col is not None:
        offsets = offsets.withColumn(
            total_col,
            F.sum("_n").over(
                Window.orderBy("_b").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        keep.append(total_col)
    offsets = offsets.select(*keep)
    local = F.row_number().over(
        Window.partitionBy("_b").orderBy(*[F.col(c).asc() for c in order_cols])
    )
    return (
        with_b.join(F.broadcast(offsets), "_b")
        .withColumn(out_col, (F.col("_off") + local).cast("long"))
        .drop("_b", "_off")
    )


def ntile_from_rank(rn: Column, n_rows: Column, n_tiles: int) -> Column:
    """SQL NTILE bucket from a 1-based global rank and the total row
    count — pure arithmetic, no window. The first ``n_rows % n_tiles``
    tiles hold ``ceil(n/k)`` rows, the rest ``floor(n/k)`` (the
    standard NTILE split Spark and DuckDB share)."""
    size = F.floor(n_rows / n_tiles)
    rem = n_rows % n_tiles
    big_span = rem * (size + 1)
    return (
        F.when(rn <= big_span, F.ceil(rn / (size + 1)))
        .otherwise(rem + F.ceil((rn - big_span) / size))
        .cast("int")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    n_tiles: int,
    out_col: str = "tile",
    buckets: int = 64,
) -> DataFrame:
    """NTILE(``n_tiles``) over a global ``order_cols`` order with no
    single-partition pass over the data — global_row_number plus a
    broadcast total count and the closed-form tile assignment."""
    ranked = global_row_number(df, order_cols, "_rn", buckets)
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    return (
        ranked.join(F.broadcast(total))
        .withColumn(out_col, ntile_from_rank(F.col("_rn"), F.col("_total"), n_tiles))
        .drop("_rn", "_total")
    )


# ---------------------------------------------------------------------------
# Incremental weighted exact-N sampling: maintain the sample as
# persisted state, folding each new batch in O(batch + n).
# ---------------------------------------------------------------------------
def incremental_weighted_sample(
    new_rows: DataFrame,
    store,
    n: int,
    key_col: str,
    priority_col: str,
    table: str = "weighted_sample",
) -> tuple[DataFrame, int]:
    """Fold a batch into a persisted Efraimidis–Spirakis exact-N
    weighted sample of EVERYTHING seen so far.

    Why this is exact and cheap: A-ES priorities (-ln(u)/w, u a
    deterministic per-key hash) are a pure function of the row, and
    "the N smallest priorities of a union" can be computed from "the
    N smallest of A" ∪ B — rows outside A's top N can never re-enter.
    So the state is just the current N sample rows (+ priorities), and
    each batch costs one TakeOrdered over (state ∪ batch): O(batch+n),
    never a rescan of history. Merging is idempotent (same rows ⇒ same
    priorities ⇒ same top-N), which makes replays safe with no seen-set
    bookkeeping — the dropDuplicates on the key only guards the replay
    case where state and batch carry the same row.

    ``new_rows`` must already carry ``priority_col`` (deterministic —
    e.g. the q99 portable-hash construction; determinism is what makes
    the maintained sample ≡ the one-shot global sample, oracle-checked
    by q105). Returns (sample DataFrame, committed version) — the
    state is tiny (n rows), so each commit is a full write_version
    snapshot, not a layered delta.
    """
    cur = store.current_version(table)
    batch = new_rows
    if cur is not None:
        batch = store.read_version(table).unionByName(batch).dropDuplicates(
            [key_col]
        )
    sample = (
        batch.orderBy(priority_col, key_col).limit(n).localCheckpoint(eager=True)
    )
    version = store.write_version(sample, table)
    return sample, version


# ---------------------------------------------------------------------------
# Epoch-shuffled training order: the loader-side artifact a
# pretraining run derives per epoch — a fresh deterministic
# permutation of the release for every pass over the data, WITHOUT
# rewriting a byte of it.
# ---------------------------------------------------------------------------
def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    n_epochs: int,
    seed: str = "seed42",
    hash_buckets: int = 64,
) -> DataFrame:
    """Assign every row its global position under a seeded per-epoch
    permutation: ``(epoch, id, position)`` for epoch 1..``n_epochs``,
    where position is the 1-based rank of the portable order hash
    ``md5(seed#ep<e>#id)`` within the epoch (ties — cryptographically
    negligible at 60 bits — break by id). Re-running with the same
    seed reproduces the order bit-identically on any engine and any
    partitioning, which is what makes a training run resumable and a
    data-order ablation reportable.

    Scale shape: the epoch fan-out is an in-task Expand (explode over
    a literal array — zero shuffle, the q77 unpivot lever), and the
    per-epoch rank is the grouped two-level prefix-COUNT over the
    order hash (operators/packing.py:global_prefix_sum with
    ``group_cols=[epoch]``): rows bucket by hash magnitude, the
    bounded window runs per (epoch, bucket), so no epoch ever funnels
    through a single task — the q162 curriculum argument, with epoch
    playing stage."""
    from ..functions.hashing import portable_hash60
    from .packing import global_prefix_sum

    # int literals make the exploded column IntegerType directly — a
    # generator cannot be nested inside a cast expression
    epochs = F.array(*[F.lit(e).cast("int") for e in range(1, n_epochs + 1)])
    fanned = df.select(
        id_col, F.explode(epochs).alias("epoch")
    ).withColumn(
        "_h",
        portable_hash60(
            F.concat(
                F.lit(f"{seed}#ep"),
                F.col("epoch").cast("string"),
                F.lit("#"),
                F.col(id_col).cast("string"),
            )
        ),
    )
    ranked = global_prefix_sum(
        fanned.withColumn("_one", F.lit(1)),
        order_col="_h",
        value_col="_one",
        out_col="_rk",
        bucket_size=2**60 // hash_buckets,
        group_cols=["epoch"],
    )
    return ranked.select(
        "epoch", id_col, (F.col("_rk") + 1).cast("long").alias("position")
    )
