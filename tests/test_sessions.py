"""Differential test for the applyInPandasWithState sessionization:
the streamed result (chronological micro-batches + watermark-driven
timeout flush) must equal the batch lag/cumulative-sum sessionization
over the same events."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.sources.catalog import load_table
from efiche_data_pipeline_spark.streaming.sessions import (
    run_session_stream,
    sessionize_batch,
    sessionize_stream,
)

from .conftest import SMOKE_SF_DIR

SENTINEL_USER = -1


def _write_chunk(df, src_dir: str, name: str, mtime: float) -> None:
    """One chunk → one parquet file with a controlled mtime (the file
    stream picks files up in modification-time order)."""
    staging = os.path.join(src_dir, f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    dst = os.path.join(src_dir, f"{name}.parquet")
    shutil.move(os.path.join(staging, part), dst)
    shutil.rmtree(staging)
    os.utime(dst, (mtime, mtime))


@pytest.fixture(scope="module")
def session_source(spark, tmp_path_factory):
    """Events split into 4 chronological chunks (so micro-batches
    arrive in event-time order and nothing is late), plus two sentinel
    files far in the future: the first advances the watermark past
    every real session's gap window, the second gives the engine a
    batch in which those timeouts fire."""
    src = str(tmp_path_factory.mktemp("session_src"))
    events = (
        load_table(spark, SMOKE_SF_DIR, "events")
        .select("user_id", "event_id", "ts")
        .localCheckpoint(eager=True)
    )
    hi = events.agg(F.max("ts")).first()[0]

    # Chronological split on ts: rank rows by ts and cut into 4.
    ordered = events.withColumn(
        "_r", F.percent_rank().over(Window.orderBy("ts", "event_id"))
    )
    base = 1_000_000_000
    for i, (a, b) in enumerate([(0.0, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.01)]):
        chunk = ordered.filter((F.col("_r") >= a) & (F.col("_r") < b)).drop("_r")
        _write_chunk(chunk, src, f"chunk{i}", base + i * 100)

    for j, days in enumerate((365, 730)):
        sentinel = spark.createDataFrame(
            [(SENTINEL_USER, -(j + 1))], "user_id long, event_id long"
        ).withColumn("ts", F.lit(hi) + F.expr(f"interval {days} days"))
        _write_chunk(sentinel, src, f"sentinel{j}", base + 1000 + j * 100)

    return src, events


def test_stream_sessions_equal_batch(spark, tmp_path, session_source):
    src, events = session_source
    stream = spark.readStream.schema(
        "user_id long, event_id long, ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(src)

    sink = str(tmp_path / "sessions_out")
    run_session_stream(
        sessionize_stream(stream, watermark="10 seconds"),
        sink,
        str(tmp_path / "ckpt"),
    )

    got = spark.read.parquet(sink).filter(F.col("user_id") != SENTINEL_USER)
    want = sessionize_batch(events)

    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_batch_sessionize_counts_match_q35(spark):
    """The per-session detail must roll up to exactly q35's per-user
    (n_events, n_sessions)."""
    from efiche_data_pipeline_spark.plans.extensions import q35_user_sessions

    events = load_table(spark, SMOKE_SF_DIR, "events")
    detail = sessionize_batch(events)
    rollup = detail.groupBy("user_id").agg(
        F.sum("n_events").alias("n_events"),
        F.count(F.lit(1)).alias("n_sessions"),
    )
    q35 = q35_user_sessions(spark, SMOKE_SF_DIR)
    assert rollup.exceptAll(q35).count() == 0
    assert q35.exceptAll(rollup).count() == 0
