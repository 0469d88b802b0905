"""Unit tests for the temporal join operators on hand-checked frames:
as-of backward-inclusive semantics (ties, no-match nulls, per-key
isolation) and range-join boundary behavior (half-open intervals,
bucket-spanning, multi-interval overlap)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.temporal import asof_join, range_join


def _ts(df, *cols):
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = _ts(
        spark.createDataFrame(
            [
                (1, "A", "2024-01-01 10:00:05"),
                (2, "A", "2024-01-01 10:00:10"),
                (3, "B", "2024-01-01 10:00:07"),
                (4, "C", "2024-01-01 10:00:07"),  # no quotes for C
            ],
            "trade_id long, sym string, ts string",
        ),
        "ts",
    )
    quotes = _ts(
        spark.createDataFrame(
            [
                ("A", "2024-01-01 10:00:00", 100.0),
                ("A", "2024-01-01 10:00:05", 101.0),  # tie with trade 1
                ("A", "2024-01-01 10:00:09", 102.0),
                ("B", "2024-01-01 10:00:08", 50.0),  # after B's trade
            ],
            "sym string, ts string, px double",
        ),
        "ts",
    )
    return trades, quotes


def test_asof_backward_inclusive(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = {
        r.trade_id: r.px
        for r in asof_join(trades, quotes, on=["sym"], value_cols=["px"]).collect()
    }
    assert out[1] == 101.0  # tie: quote at the same instant is visible
    assert out[2] == 102.0  # latest prior quote
    assert out[3] is None  # B's only quote is in the future
    assert out[4] is None  # no quotes at all for C
    assert len(out) == 4  # left rows always survive


def test_asof_rejects_column_collisions(spark, quotes_trades):
    trades, quotes = quotes_trades
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes.withColumnRenamed("px", "ts2").withColumnRenamed("ts2", "trade_id"),
                  on=["sym"], value_cols=["trade_id"])


def test_range_join_half_open_boundaries(spark):
    events = _ts(
        spark.createDataFrame(
            [
                (1, "2024-01-01 10:00:00"),  # == start: in
                (2, "2024-01-01 10:29:59"),  # in
                (3, "2024-01-01 10:30:00"),  # == end: out
                (4, "2024-01-01 09:59:59"),  # before: out
            ],
            "event_id long, ts string",
        ),
        "ts",
    )
    wins = _ts(
        spark.createDataFrame(
            [(10, "2024-01-01 10:00:00", "2024-01-01 10:30:00")],
            "window_id long, win_start string, win_end string",
        ),
        "win_start",
        "win_end",
    )
    got = sorted(
        r.event_id for r in range_join(events, wins, bucket_seconds=600).collect()
    )
    assert got == [1, 2]


def test_range_join_interval_spanning_buckets(spark):
    """An interval longer than the bucket width must still catch rows
    in every covered bucket, exactly once."""
    events = _ts(
        spark.createDataFrame(
            [(i, f"2024-01-01 {10 + i}:15:00") for i in range(6)],
            "event_id long, ts string",
        ),
        "ts",
    )
    wins = _ts(
        spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", "2024-01-01 14:00:00")],
            "window_id long, win_start string, win_end string",
        ),
        "win_start",
        "win_end",
    )
    rows = range_join(events, wins, bucket_seconds=3600).collect()
    assert sorted(r.event_id for r in rows) == [0, 1, 2, 3]  # 10:15..13:15
    assert len(rows) == len({r.event_id for r in rows})  # no duplicates


def test_range_join_overlapping_intervals(spark):
    events = _ts(
        spark.createDataFrame([(1, "2024-01-01 10:10:00")], "event_id long, ts string"),
        "ts",
    )
    wins = _ts(
        spark.createDataFrame(
            [
                (1, "2024-01-01 10:00:00", "2024-01-01 10:30:00"),
                (2, "2024-01-01 10:05:00", "2024-01-01 10:15:00"),
            ],
            "window_id long, win_start string, win_end string",
        ),
        "win_start",
        "win_end",
    )
    got = sorted(
        r.window_id for r in range_join(events, wins, bucket_seconds=60).collect()
    )
    assert got == [1, 2]  # one output row per containing interval


def test_q45_windows_are_timezone_independent(spark):
    """q45's window bounds must be TIMESTAMP_NTZ like events.ts — the
    earlier LTZ construction coerced through the session timezone, so
    the join shifted (and the oracle mismatched) anywhere outside UTC.
    Pin: identical results under UTC and a DST-observing zone."""
    from efiche_data_pipeline_spark.plans.registry import QUERIES

    from .conftest import SMOKE_SF_DIR

    tz_key = "spark.sql.session.timeZone"
    orig = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "UTC")
        utc = sorted(
            map(tuple, QUERIES["q45_range_join_windows"](spark, SMOKE_SF_DIR).collect())
        )
        spark.conf.set(tz_key, "America/New_York")
        ny = sorted(
            map(tuple, QUERIES["q45_range_join_windows"](spark, SMOKE_SF_DIR).collect())
        )
    finally:
        spark.conf.set(tz_key, orig)
    assert utc == ny
    assert utc  # non-empty: the windows actually cover fixture events
