"""Streaming quantile dashboard (streaming/quantile_stream.py):
stream-folded estimates must equal one global fold over every file
seen; a checkpoint restart consumes only new files but still merges
against the full sample; a rerun with no new files changes nothing
(the fold is idempotent set-union bottom-k)."""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.sketch import incremental_quantiles
from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.streaming.quantile_stream import (
    run_quantile_stream,
)

_SCHEMA = "event_id long, event_type string, value double"


def _rows(lo, hi):
    return [
        (i, "click" if i % 2 == 0 else "view", float((i * 37) % 100))
        for i in range(lo, hi)
    ]


def _write(spark, src, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _estimates(df):
    return {tuple(r)[:1] + tuple(r)[1:] for r in map(tuple, df.collect())}


def _global(spark, tmp_path, rows, name):
    store = Store(spark, str(tmp_path / name))
    est, _ = incremental_quantiles(
        spark.createDataFrame(rows, _SCHEMA),
        store, ["event_type"], "event_id", "value", k=64,
    )
    return _estimates(est)


def test_quantile_stream_equals_global_and_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    _write(spark, src, _rows(0, 40))
    _write(spark, src, _rows(40, 90))
    r = run_quantile_stream(
        spark, src, _SCHEMA, store, ckpt,
        ["event_type"], "event_id", "value", k=64,
    )
    assert r.n_batches >= 2
    assert _estimates(r.estimates) == _global(
        spark, tmp_path, _rows(0, 90), "g1"
    )
    # restart: only the new file is consumed, estimates still global
    _write(spark, src, _rows(90, 130))
    r2 = run_quantile_stream(
        spark, src, _SCHEMA, store, ckpt,
        ["event_type"], "event_id", "value", k=64,
    )
    assert r2.n_batches == 1
    assert _estimates(r2.estimates) == _global(
        spark, tmp_path, _rows(0, 130), "g2"
    )
    # no new files: nothing consumed, sample version unchanged
    v = store.current_version("quantile_sample")
    r3 = run_quantile_stream(
        spark, src, _SCHEMA, store, ckpt,
        ["event_type"], "event_id", "value", k=64,
    )
    assert r3.n_batches == 0
    assert store.current_version("quantile_sample") == v
