"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2.11's "custom stateful operator"
slot — the streaming twin of the batch lag/cumulative-sum
sessionization, plans/extensions.py::q35 and :func:`sessionize_batch`).

Why a hand-rolled stateful operator instead of ``F.session_window``:
the built-in session window only supports aggregations over the
window; emitting one *row per closed session* with arbitrary derived
columns (and the option to extend to per-session sequences later)
needs explicit per-key state. This is exactly the pattern the
instructions call out for semantics the built-in operators can't
express: Arrow-batched ``applyInPandasWithState``, never row-at-a-time
Python.

Scale properties:

- State per key is three scalars (session start, last event, count) —
  O(active users), not O(events).
- Event-time timeout + watermark closes idle sessions and frees their
  state, so state stays bounded on an unbounded stream; rows older
  than the watermark are dropped before reaching the operator.
- The operator runs after the shuffle that co-locates each user's
  rows; each micro-batch sorts only its own rows per key (bounded by
  micro-batch size), never a global sort.

Reference parity: the reference has no streaming runtime — its
closest analogue is the batched ``processed``-flag loop
(etl_pipeline.py:125-188); the *sessionization semantics* mirror the
batch q35 (30-minute inactivity gap).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_SECONDS = 1800

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "start_us long, last_us long, n long"

_US = 1_000_000


def _session_rows(user_id: int, closed: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(closed), dtype="int64"),
            "session_start": pd.to_datetime(
                pd.Series([c[0] for c in closed], dtype="int64"), unit="us"
            ),
            "session_end": pd.to_datetime(
                pd.Series([c[1] for c in closed], dtype="int64"), unit="us"
            ),
            "n_events": pd.Series([c[2] for c in closed], dtype="int64"),
        }
    )


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any, gap_seconds: int
) -> Iterator[pd.DataFrame]:
    """Per-key stateful transition: fold this micro-batch's rows (sorted
    by event time) into the open session carried in ``state``; emit every
    session closed by a gap, keep the still-open one in state, and arm an
    event-time timeout that will flush it once the watermark passes
    last_event + gap."""
    (user_id,) = key
    gap_us = gap_seconds * _US

    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield _session_rows(user_id, [(start_us, last_us, n)])
        return

    rows = pd.concat(list(pdfs), ignore_index=True)
    # Micro-batch delivery order within a key is not sorted; order by
    # event time (ns-resolution pandas datetimes → integer micros).
    ts_us = (
        rows["ts"].astype("datetime64[us]").astype("int64").sort_values().to_numpy()
    )

    open_session = state.get if state.exists else None
    closed: list[tuple[int, int, int]] = []
    for t in ts_us:
        if open_session is None:
            open_session = (int(t), int(t), 1)
        else:
            start_us, last_us, n = open_session
            if t - last_us > gap_us:
                closed.append(open_session)
                open_session = (int(t), int(t), 1)
            else:
                open_session = (start_us, int(t), n + 1)

    state.update(open_session)
    # Flush the open session when event time moves past its gap window.
    state.setTimeoutTimestamp((open_session[1] + gap_us) // 1000)
    if closed:
        yield _session_rows(user_id, closed)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming gap sessionization: one output row per *closed*
    session (append mode). ``events`` must be a streaming frame with
    ``user_id`` and an event-time ``ts`` column."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        return _sessionize_group(key, pdfs, state, gap_seconds)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def run_session_stream(
    stream: DataFrame, sink_dir: str, checkpoint_dir: str
) -> None:
    """Drive a sessionized stream into a parquet sink with
    ``availableNow`` (bounded replay of whatever files exist)."""
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sessionize_batch(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Batch twin with identical semantics and output schema: lag-gap
    session starts, cumulative-sum session ids, one row per session.
    Used both as the q48 detail query and as the differential oracle
    for the streaming operator (test_sessions.py asserts stream ≡
    batch on the same events)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    sid = F.sum(new_s).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.select("user_id", "ts", "event_id")
        .withColumn("_sid", sid)
        .groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_sid")
    )
