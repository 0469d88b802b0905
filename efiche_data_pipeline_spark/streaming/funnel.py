"""Custom stateful streaming operator #2: incremental funnel-stage
tracking with ``applyInPandasWithState`` — the streaming twin of the
batch ordered-funnel q74 (plans/extensions.py): per user, the earliest
view, the earliest click at-or-after that view, and the earliest
purchase at-or-after that click.

Emission model: APPEND one row per stage ADVANCEMENT (user_id, stage,
stage_ts) the moment it happens — the shape a live conversion
dashboard consumes (counts per stage = COUNT(*) GROUP BY stage over
the advancement log, exactly q74's n_view/n_click/n_purchase).

Scale properties:

- State per user is three int64 micros (view/click/purchase, -1 =
  unreached) — O(users), the same boundedness class as any per-user
  dimension, and independent of event volume. A stage can only
  advance forward, so each user emits at most 3 rows ever.
- The operator runs after the shuffle that co-locates each user's
  rows; each micro-batch folds only its own rows per key, sorted by
  (event time, event_id) — bounded by micro-batch size, never a
  global sort.

Ordering contract (same as streaming/sessions.py): rows are folded in
event-time order WITHIN each micro-batch; across micro-batches the
fold is arrival-ordered. A qualifying view arriving in a later batch
than its click (cross-batch event-time inversion) is therefore not
retroactively matched — full retroactivity would require buffering
events in state until the watermark passes (O(in-flight window)
state), which this operator deliberately trades away for O(1)-per-user
state; the stream≡batch test pins the contract on time-sliced input.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

FUNNEL_STAGE_SCHEMA = "user_id long, stage string, stage_ts timestamp"
_STATE_SCHEMA = "v long, c long, p long"


def _fold_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    order = pd.DataFrame(
        {
            "_us": rows["ts"].astype("datetime64[us]").astype("int64"),
            "_id": rows["event_id"],
            "_et": rows["event_type"],
        }
    ).sort_values(["_us", "_id"])
    v, c, p = state.get if state.exists else (-1, -1, -1)
    emitted: list[tuple[str, int]] = []
    for t, et in zip(order["_us"], order["_et"]):
        t = int(t)
        if et == "view" and v < 0:
            v = t
            emitted.append(("view", t))
        elif et == "click" and v >= 0 and c < 0 and t >= v:
            c = t
            emitted.append(("click", t))
        elif et == "purchase" and c >= 0 and p < 0 and t >= c:
            p = t
            emitted.append(("purchase", t))
    state.update((v, c, p))
    if emitted:
        yield pd.DataFrame(
            {
                "user_id": pd.Series([user_id] * len(emitted), dtype="int64"),
                "stage": pd.Series([e[0] for e in emitted], dtype="object"),
                "stage_ts": pd.to_datetime(
                    pd.Series([e[1] for e in emitted], dtype="int64"), unit="us"
                ),
            }
        )


def funnel_stream(events: DataFrame) -> DataFrame:
    """Streaming funnel advancement log: one append row per (user,
    stage) the first time that stage is reached. ``events`` must be a
    streaming frame with user_id, event_id, event_type and event-time
    ``ts``.

    Deliberately NO ``withWatermark``: with ``timeoutConf='NoTimeout'``
    a watermark would neither filter late rows before the user
    function nor evict state, so declaring one would only *suggest* a
    late-data tolerance that does not exist. The real contract is
    arrival-order folding (module docstring); if state TTL is ever
    needed, switch to ``EventTimeTimeout`` and reintroduce the
    watermark together with eviction logic."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _fold_group,
            outputStructType=FUNNEL_STAGE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
