"""Sequence packing — the "concat-and-chunk" dataloader step of LLM
pretraining: documents are concatenated in a deterministic order and
the token stream is cut into fixed-size packs; each document needs to
know its global token offset and which packs it lands in.

The core is a GLOBAL prefix sum, which naively is a window over
``ORDER BY order_col`` — a single-partition sort that funnels the
whole corpus through one task. :func:`global_prefix_sum` is the
scalable form (same two-level scheme as the surrogate-key assigner,
pipeline/warehouse.py): rows bucket by ``floor(order_col /
bucket_size)`` (a *value-derived*, order-preserving bucketing — never
a physical partition id), each bucket prefix-sums independently under
a bounded window, and the tiny per-bucket totals frame turns into
broadcast offsets. Cost: one bounded window + one broadcast join; no
global sort, no driver loop.

No oracle compromise: the result is bit-identical to the plain
``SUM() OVER (ORDER BY …)`` a single-node engine runs (q64's DuckDB
oracle does exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix",
    bucket_size: int = 4096,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``value_col`` over ``order_col`` order
    (first row gets 0). ``order_col`` must be numeric with distinct
    values — bucketing uses its magnitude, so order across buckets is
    preserved by construction. ``bucket_size`` bounds the per-bucket
    window; per-bucket totals (``n_rows / bucket_size`` of them) must
    fit a broadcast, which at 100 B rows and the default size is a
    ~25 M-row offsets frame — raise ``bucket_size`` accordingly.

    With ``group_cols`` the prefix sum restarts per group (the ``SUM()
    OVER (PARTITION BY group ORDER BY …)`` shape) under the same
    two-level scheme — crucially WITHOUT putting any whole group into
    one task: rows still bucket by ``order_col`` magnitude, the
    bounded window runs per (group, bucket), and only the tiny
    per-bucket totals are windowed per group. A skewed group (one
    source holding half a 100 TB corpus) costs its share of bounded
    buckets, never a single-task sort."""
    group = list(group_cols or [])
    with_b = df.withColumn("_pb", F.floor(F.col(order_col) / F.lit(bucket_size)))
    w_in = (
        Window.partitionBy(*group, "_pb")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    inner = F.coalesce(F.sum(value_col).over(w_in), F.lit(0)).cast("long")
    w_off = (
        Window.partitionBy(*group)
        .orderBy("_pb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        with_b.groupBy(*group, "_pb")
        .agg(F.sum(value_col).alias("_t"))
        .withColumn(
            "_off",
            F.coalesce(F.sum("_t").over(w_off), F.lit(0)).cast("long"),
        )
        .select(*group, "_pb", "_off")
    )
    return (
        with_b.join(F.broadcast(offsets), [*group, "_pb"])
        .withColumn(out_col, (F.col("_off") + inner).cast("long"))
        .drop("_pb", "_off")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    bucket_size: int = 4096,
) -> DataFrame:
    """Assign every document its place in the packed token stream:
    ``start_offset`` (exclusive prefix sum of ``len_col`` in ``id_col``
    order), the first and last pack of size ``budget`` it occupies, and
    how many packs it spans (documents straddle pack boundaries — the
    standard concat-then-chunk semantics, not bin packing)."""
    pref = global_prefix_sum(df, id_col, len_col, "start_offset", bucket_size)
    end = F.col("start_offset") + F.greatest(F.col(len_col).cast("long"), F.lit(1)) - 1
    return (
        pref.withColumn(
            "pack_first", F.floor(F.col("start_offset") / F.lit(budget)).cast("long")
        )
        .withColumn("pack_last", F.floor(end / F.lit(budget)).cast("long"))
        .withColumn("n_packs", (F.col("pack_last") - F.col("pack_first") + 1))
    )
