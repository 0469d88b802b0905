"""Streaming chunk-index intake (streaming/chunk_stream.py): the
stream-derived boilerplate report must equal the one-shot q127 report
over every file seen; a checkpoint restart consumes only new files but
reports over the full corpus; a rerun with no new files folds nothing
(the id-keyed append is idempotent)."""

from __future__ import annotations

from efiche_data_pipeline_spark.operators.dedup import (
    boilerplate_report,
    content_chunks,
)
from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.streaming.chunk_stream import run_chunk_stream

_SCHEMA = "doc_id long, text string"

_SHARED = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)


def _doc(i):
    if i % 10 == 0:
        return _SHARED  # planted cross-file duplicates
    words = ["w%d" % ((i * 31 + j * 7) % 211) for j in range(30)]
    return " ".join(words)


def _rows(lo, hi):
    return [(i, _doc(i)) for i in range(lo, hi)]


def _write(spark, src, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _report_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _global(spark, rows):
    docs = spark.createDataFrame(rows, _SCHEMA)
    return _report_rows(boilerplate_report(content_chunks(docs)))


def test_chunk_stream_equals_global_and_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    _write(spark, src, _rows(0, 25))
    _write(spark, src, _rows(25, 60))
    r = run_chunk_stream(spark, src, _SCHEMA, store, ckpt)
    assert r.n_batches >= 2
    assert r.n_docs_folded == 60
    assert _report_rows(r.report) == _global(spark, _rows(0, 60))
    # the planted duplicates (ids 0,10,20,...) were flagged across
    # FILE boundaries — the cross-batch property the stream must keep
    flagged = {
        row[0] for row in _report_rows(r.report) if row[2] > 0  # n_boiler
    }
    assert {0, 10, 20, 30, 40, 50} <= flagged
    # restart: only the new file is consumed, report still global
    _write(spark, src, _rows(60, 80))
    r2 = run_chunk_stream(spark, src, _SCHEMA, store, ckpt)
    assert r2.n_batches == 1
    assert r2.n_docs_folded == 20
    assert _report_rows(r2.report) == _global(spark, _rows(0, 80))
    # no new files: nothing consumed, nothing folded
    before = store.read("chunk_index").count()
    r3 = run_chunk_stream(spark, src, _SCHEMA, store, ckpt)
    assert r3.n_batches == 0
    assert r3.n_docs_folded == 0
    assert store.read("chunk_index").count() == before


def test_empty_source_yields_no_report(spark, tmp_path):
    """A fresh store + a source directory the checkpoint has nothing
    new in must return report=None, not crash on a missing table."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    # parquet stream sources need at least one file to infer nothing —
    # we pass an explicit schema, so an empty dir is legal input
    r = run_chunk_stream(
        spark, src, _SCHEMA, Store(spark, str(tmp_path / "store")),
        str(tmp_path / "ckpt"),
    )
    assert r.n_batches == 0 and r.n_docs_folded == 0 and r.report is None
