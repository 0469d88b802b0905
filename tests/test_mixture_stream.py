"""Streaming temperature-mixture intake (streaming/mixture_stream.py):

- the derived selection over everything seen equals the one-shot
  global q154-style selection (including budgets reshaped by later
  files — the non-monotone property);
- checkpoint restart consumes only new files but selects globally;
- no-new-files rerun is a pure no-op on state and selection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.sketch import (
    incremental_temperature_mixture,
)
from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.streaming.mixture_stream import (
    run_mixture_stream,
)

_SCHEMA = "doc_id long, source string, text string"
_BUDGET = 400


def _rows(lo, hi):
    out = []
    for i in range(lo, hi):
        src = "big" if i % 4 else "small"
        n = 40 if src == "big" else 8
        out.append((i, src, " ".join(["tok"] * n)))
    return out


def _write(spark, src, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _sel(df):
    return sorted(tuple(r) for r in df.collect())


def _global(spark, tmp_path, rows, tag):
    store = Store(spark, str(tmp_path / f"g{tag}"))
    docs = spark.createDataFrame(rows, _SCHEMA)
    return _sel(incremental_temperature_mixture(docs, store, _BUDGET))


def test_stream_selection_equals_one_shot(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write(spark, src, _rows(0, 12))
    _write(spark, src, _rows(12, 24))
    store = Store(spark, str(tmp_path / "store"))
    rep = run_mixture_stream(spark, src, _SCHEMA, store, ckpt, _BUDGET)
    assert rep.n_batches >= 2 and rep.n_docs_seen == 24
    assert _sel(rep.selection) == _global(spark, tmp_path, _rows(0, 24), "a")


def test_restart_and_noop(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    _write(spark, src, _rows(0, 12))
    rep1 = run_mixture_stream(spark, src, _SCHEMA, store, ckpt, _BUDGET)
    sel1 = _sel(rep1.selection)
    _write(spark, src, _rows(12, 20))
    rep2 = run_mixture_stream(spark, src, _SCHEMA, store, ckpt, _BUDGET)
    assert rep2.n_docs_seen == 20
    want = _global(spark, tmp_path, _rows(0, 20), "b")
    assert _sel(rep2.selection) == want
    # the late file reshaped the earlier selection (non-monotone)
    assert sel1 != want
    # no new files: state and selection unchanged
    n = store.read("mixture_doc_stats").count()
    rep3 = run_mixture_stream(spark, src, _SCHEMA, store, ckpt, _BUDGET)
    assert store.read("mixture_doc_stats").count() == n
    assert _sel(rep3.selection) == want
