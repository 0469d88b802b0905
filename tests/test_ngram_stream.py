"""Streaming n-gram count intake (streaming/ngram_stream.py):

- the heavy-hitter read after the stream equals the one-shot q185
  operator over everything seen;
- a checkpoint restart consumes only new files and re-running with
  no new files is a pure no-op (layer count unchanged);
- an out-of-order file (lower ids arriving after higher ones, not a
  crash-replay) raises with zero state committed, and a batch
  straddling the watermark raises too — the no-sink monotone guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.sketch import heavy_hitter_ngrams
from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.streaming.ngram_stream import run_ngram_stream

_SCHEMA = "doc_id long, text string"
_DEN = 10

_PHRASES = ["hot pepper", "cold stone", "warm milk"]


def _doc(i):
    if i % 3 == 0:
        return " ".join([_PHRASES[i % len(_PHRASES)]] * 12)
    return f"tail{i}a tail{i}b tail{i}c tail{i}d"


def _rows(lo, hi):
    return [(i, _doc(i)) for i in range(lo, hi)]


def _write(spark, src, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _hh_rows(df):
    return sorted((r["gram"], r["n_occurrences"]) for r in df.collect())


def test_ngram_stream_equals_one_shot_and_restarts(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    _write(spark, src, _rows(0, 8))
    _write(spark, src, _rows(8, 16))
    rep = run_ngram_stream(spark, src, _SCHEMA, store, ckpt, den=_DEN)
    assert rep.n_batches >= 2 and rep.n_docs_folded == 16
    want = _hh_rows(
        heavy_hitter_ngrams(
            spark.createDataFrame(_rows(0, 16), _SCHEMA), "text", den=_DEN
        )
    )
    assert _hh_rows(rep.heavy_hitters) == want and want
    # restart with one new file: only it folds, report is global
    _write(spark, src, _rows(16, 20))
    rep2 = run_ngram_stream(spark, src, _SCHEMA, store, ckpt, den=_DEN)
    assert rep2.n_docs_folded == 4
    want2 = _hh_rows(
        heavy_hitter_ngrams(
            spark.createDataFrame(_rows(0, 20), _SCHEMA), "text", den=_DEN
        )
    )
    assert _hh_rows(rep2.heavy_hitters) == want2
    # no new files: pure no-op (same layers, same read)
    layers = store.read_union("ngram_counts").count()
    rep3 = run_ngram_stream(spark, src, _SCHEMA, store, ckpt, den=_DEN)
    assert rep3.n_docs_folded == 0
    assert store.read_union("ngram_counts").count() == layers
    assert _hh_rows(rep3.heavy_hitters) == want2


def test_ngram_stream_guards_out_of_order_and_straddle(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    _write(spark, src, _rows(10, 20))
    run_ngram_stream(spark, src, _SCHEMA, store, ckpt, den=_DEN)
    layers = store.read_union("ngram_counts").count()
    # an OUT-OF-ORDER file: ids entirely below the watermark, not a
    # replay (fresh checkpoint so the file is genuinely delivered)
    _write(spark, src, _rows(0, 5))
    with pytest.raises(Exception, match="out-of-order file"):
        run_ngram_stream(
            spark, src, _SCHEMA, store, str(tmp_path / "ckpt2"), den=_DEN
        )
    assert store.read_union("ngram_counts").count() == layers
    # a STRADDLING file: min below the watermark, max above
    src3 = str(tmp_path / "src3")
    _write(spark, src3, _rows(15, 30))
    with pytest.raises(Exception, match="straddles the fold watermark"):
        run_ngram_stream(
            spark, src3, _SCHEMA, store, str(tmp_path / "ckpt3"), den=_DEN
        )
    assert store.read_union("ngram_counts").count() == layers
    # crash-replay shape: the SAME already-committed file redelivered
    # under a fresh checkpoint skips cleanly (its max is a committed
    # layer watermark)
    src4 = str(tmp_path / "src4")
    _write(spark, src4, _rows(10, 20))
    rep = run_ngram_stream(
        spark, src4, _SCHEMA, store, str(tmp_path / "ckpt4"), den=_DEN
    )
    assert rep.n_docs_folded == 0
    assert store.read_union("ngram_counts").count() == layers


def test_ngram_stream_guards_overlapping_partial_file(spark, tmp_path):
    """ADVICE r09: a file sharing a COMMITTED layer's watermark but
    dipping below the PREVIOUS layer's watermark is an overlapping
    partial file, not a replay — it must raise with zero state
    committed, while a true bit-identical replay of the same layer
    still skips cleanly."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    _write(spark, src, _rows(0, 10))
    _write(spark, src, _rows(10, 20))
    run_ngram_stream(spark, src, _SCHEMA, store, ckpt, den=_DEN)
    layers = store.read_union("ngram_counts").count()
    # overlapping partial file: max = committed watermark 19, min = 5
    # is at/below the previous layer's watermark 9
    src2 = str(tmp_path / "src2")
    _write(spark, src2, _rows(5, 20))
    with pytest.raises(Exception, match="overlapping partial file"):
        run_ngram_stream(
            spark, src2, _SCHEMA, store, str(tmp_path / "ckpt2"), den=_DEN
        )
    assert store.read_union("ngram_counts").count() == layers
    # the true replay (ids 10..19, strictly above the previous
    # watermark) still skips as a replay
    src3 = str(tmp_path / "src3")
    _write(spark, src3, _rows(10, 20))
    rep = run_ngram_stream(
        spark, src3, _SCHEMA, store, str(tmp_path / "ckpt3"), den=_DEN
    )
    assert rep.n_docs_folded == 0
    assert store.read_union("ngram_counts").count() == layers
