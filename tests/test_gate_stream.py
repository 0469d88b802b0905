"""Streaming calibrated-gate intake (streaming/gate_stream.py):

- the derived report equals the one-shot q170/q159 gate over
  everything seen, even when reference and pool docs INTERLEAVE
  across files (the final calibration is order-free);
- checkpoint restart consumes only new files but reports globally;
- online verdicts are version-tagged and stand unchanged across
  later re-calibrations;
- a pool batch arriving before any calibration raises with zero
  state committed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.lm import (
    lm_count_delta,
    ngram_lm_score,
)
from efiche_data_pipeline_spark.operators.ranking import global_row_number
from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.streaming.gate_stream import run_gate_stream

_SCHEMA = "doc_id long, text string"
_MOD = 3

_REF_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "a brown dog and a quick fox play in the sun",
    "the quick dog runs in the sun while the fox sleeps",
]
_BAD = "zxqv wvut plomb krzn zxqv fnord wvut plomb"


def _doc(i):
    # ids % 3 == 0 are reference; pool docs alternate between exact
    # reference re-treads (should pass) and gibberish (should fail)
    if i % _MOD == 0:
        return _REF_TEXTS[(i // _MOD) % len(_REF_TEXTS)]
    if i % 2 == 0:
        return _REF_TEXTS[i % len(_REF_TEXTS)]
    return _BAD + f" tail{i}"


def _rows(lo, hi):
    return [(i, _doc(i)) for i in range(lo, hi)]


def _write(spark, src, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _one_shot(spark, rows, pct_num=9, pct_den=10):
    docs = spark.createDataFrame(rows, _SCHEMA)
    ref = docs.filter(F.col("doc_id") % _MOD == 0)
    model = lm_count_delta(ref, "doc_id", "text").localCheckpoint(eager=True)
    scores = ngram_lm_score(docs, model, "doc_id", "text").localCheckpoint(
        eager=True
    )
    rs = scores.join(ref.select("doc_id"), "doc_id", "left_semi")
    n = rs.count()
    k = (n * pct_num + pct_den - 1) // pct_den
    thr = (
        global_row_number(rs.select("doc_id", "xent"), ["xent", "doc_id"], out_col="rn")
        .filter(F.col("rn") == k)
        .first()["xent"]
    )
    kept = scores.join(ref.select("doc_id"), "doc_id", "left_anti").filter(
        F.col("xent") <= thr
    )
    return thr, sorted((r["doc_id"], r["xent"]) for r in kept.collect())


def _report_rows(df):
    return sorted((r["doc_id"], r["xent"]) for r in df.collect())


def test_stream_report_equals_one_shot_interleaved(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    # refs and pool INTERLEAVE across files (ids stay monotone)
    _write(spark, src, _rows(0, 8))
    _write(spark, src, _rows(8, 16))
    store = Store(spark, str(tmp_path / "store"))
    rep = run_gate_stream(spark, src, _SCHEMA, store, ckpt, ref_mod=_MOD)
    assert rep.n_batches >= 2 and rep.n_docs_seen == 16
    want_thr, want = _one_shot(spark, _rows(0, 16))
    assert rep.calibration.threshold == want_thr
    assert _report_rows(rep.report) == want
    # online verdicts exist and are version-tagged
    tags = {r["model_version"] for r in rep.online_kept.collect()}
    assert tags and all(isinstance(t, int) for t in tags)


def test_restart_consumes_only_new_files_reports_globally(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    _write(spark, src, _rows(0, 8))
    rep1 = run_gate_stream(spark, src, _SCHEMA, store, ckpt, ref_mod=_MOD)
    online1 = {
        r["doc_id"]: (r["xent"], r["model_version"], r["threshold"])
        for r in rep1.online_kept.collect()
    }
    _write(spark, src, _rows(8, 14))
    rep2 = run_gate_stream(spark, src, _SCHEMA, store, ckpt, ref_mod=_MOD)
    assert rep2.n_docs_seen == 14
    want_thr, want = _one_shot(spark, _rows(0, 14))
    assert rep2.calibration.threshold == want_thr
    assert _report_rows(rep2.report) == want
    # earlier online verdicts stand byte-identical after re-calibration
    online2 = {
        r["doc_id"]: (r["xent"], r["model_version"], r["threshold"])
        for r in rep2.online_kept.collect()
    }
    assert {k: online2[k] for k in online1} == online1
    # re-run with no new files: a pure no-op
    rep3 = run_gate_stream(spark, src, _SCHEMA, store, ckpt, ref_mod=_MOD)
    assert rep3.n_docs_seen == 14
    assert _report_rows(rep3.report) == want


def test_pool_before_any_calibration_fails_loudly(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    # a file with ONLY pool docs (no id % 3 == 0)
    _write(spark, src, [(1, _doc(1)), (2, _doc(2))])
    with pytest.raises(StreamingQueryException, match="no calibration"):
        run_gate_stream(spark, src, _SCHEMA, store, ckpt, ref_mod=_MOD)
    assert not store.exists("gate_scores")
