"""Streaming split-leakage monitor (streaming/leakage_stream.py):
the stream-maintained leakage report must equal the one-shot q132
pass over every file seen — including a cross-FILE cross-split
near-dup pair, the case a per-file check would miss; a checkpoint
restart consumes only new files; a rerun with no new files changes
nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.functions.hashing import portable_hash60
from efiche_data_pipeline_spark.operators.dedup import (
    incremental_split_leakage,
)
from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.streaming.leakage_stream import (
    run_leakage_stream,
)

_SCHEMA = "doc_id long, text string"

_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the late afternoon sun"
)


def _splits(spark, n=400):
    rows = (
        spark.range(n)
        .select(
            "id",
            F.pmod(
                portable_hash60(F.col("id").cast("string")), F.lit(100)
            ).alias("b"),
        )
        .collect()
    )
    return {
        r["id"]: ("train" if r["b"] < 80 else "val" if r["b"] < 90 else "test")
        for r in rows
    }


def _write(spark, src, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_leakage_stream_equals_one_shot_and_restarts(spark, tmp_path):
    sp = _splits(spark)
    train = [i for i, s in sp.items() if s == "train"]
    a = train[0]
    b = next(i for i, s in sp.items() if s != "train" and i > a)
    c = next(i for i in train if i > b)
    rows1 = [(a, _BASE)]
    rows2 = [(b, _BASE + " tail")]  # cross-file, cross-split near-dup
    rows3 = [(c, _BASE + " coda")]  # later train doc pairs with both

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    _write(spark, src, rows1)
    _write(spark, src, rows2)
    r = run_leakage_stream(spark, src, _SCHEMA, store, ckpt, threshold=0.5)
    assert r.n_batches >= 2
    got = {(x["doc_a"], x["doc_b"]) for x in r.report.collect()}
    assert (a, b) in got  # found although the pair straddles files
    # one-shot equivalence over everything seen so far
    one = Store(spark, str(tmp_path / "one"))
    docs12 = spark.createDataFrame(rows1 + rows2, _SCHEMA)
    direct = incremental_split_leakage(docs12, one, threshold=0.5)
    assert _rows(r.report) == _rows(direct)
    # restart: only the new file is consumed; report still global
    _write(spark, src, rows3)
    r2 = run_leakage_stream(spark, src, _SCHEMA, store, ckpt, threshold=0.5)
    assert r2.n_batches == 1
    two = Store(spark, str(tmp_path / "two"))
    incremental_split_leakage(docs12, two, threshold=0.5)
    direct2 = incremental_split_leakage(
        spark.createDataFrame(rows3, _SCHEMA), two, threshold=0.5
    )
    assert _rows(r2.report) == _rows(direct2)
    # (b, c) crosses the boundary and was found cross-file as well
    assert (b, c) in {(x["doc_a"], x["doc_b"]) for x in r2.report.collect()}
    # no new files: nothing consumed, report unchanged
    r3 = run_leakage_stream(spark, src, _SCHEMA, store, ckpt, threshold=0.5)
    assert r3.n_batches == 0
    assert _rows(r3.report) == _rows(r2.report)
