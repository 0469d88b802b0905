"""Stream-stream interval joins — the streaming twin of the batch
as-of / range-join family (operators/temporal.py), for correlating two
live event feeds (e.g. purchase↔click attribution) without landing
either one first.

Why this shape scales: a stream-stream inner join buffers BOTH sides
in keyed state, and without time bounds that state grows forever. The
two levers here are (a) the watermark on each side's event-time column
and (b) the interval condition tying the two event times together —
given both, Spark derives how long a row can still find a partner and
evicts state past ``watermark + max_gap``. State is therefore bounded
by (join-key cardinality × window length), independent of stream
length — the same argument that makes the windowed aggregate in
incremental.py viable on an unbounded stream.

The reference has no streaming runtime at all (its incremental loop is
a processed-flag poll, reference: etl_pipeline.py:125-132); this is
engine capability the Spark re-design adds. Verified by the
stream ≡ batch equivalence test (tests/test_stream_join.py): the
streamed join over N micro-batches must equal the identical batch join
over the union of the inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .incremental import ensure_event_time


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join two event streams on ``key`` where the right event
    falls in ``[left_ts - max_gap, left_ts]`` (right happened at most
    ``max_gap`` before left — the attribution direction). Column names
    other than ``key`` must be disjoint between the sides. Works
    unchanged on batch frames (the watermark is a no-op there), which
    is what the equivalence test exploits."""
    l = ensure_event_time(left, left_ts).withWatermark(left_ts, watermark).alias("l")
    r = ensure_event_time(right, right_ts).withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {max_gap}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.join(r, cond, "inner").drop(F.col(f"r.{key}"))


def purchase_click_attribution(
    events: DataFrame, max_gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Attribution pairs from ONE event stream self-joined: every
    (purchase, click) of the same user with the click at most
    ``max_gap`` before the purchase. Unlike the batch as-of join (q44,
    most-recent click only), the interval join emits ALL qualifying
    clicks — dedup to most-recent is a downstream batch concern
    (streaming global per-key top-1 would need its own stateful op).

    Output: event_id, user_id, ts (purchase), click_id, click_ts,
    gap_seconds.
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = stream_interval_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="click_ts",
        max_gap=max_gap,
        watermark=watermark,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "click_id",
        "click_ts",
        (F.unix_timestamp("ts") - F.unix_timestamp("click_ts")).alias("gap_seconds"),
    )
