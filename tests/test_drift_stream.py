"""Streaming drift monitor (streaming/drift.py): a micro-batch drawn
from the reference law scores calm; a batch with a shifted language
mix raises the alarm on exactly that column; reports are keyed by
(batch, column) so a re-run with no new files changes nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.streaming.drift import run_drift_monitor

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _doc_rows(start_id, n, lang="en", words=120):
    text = " ".join(f"w{i % 97}" for i in range(words))
    return [
        (start_id + i, text, lang, f"src{i % 4}", len(text)) for i in range(n)
    ]


def _write(spark, src, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def test_drift_monitor_flags_shifted_batch_only(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    reference = spark.createDataFrame(_doc_rows(0, 400, "en"), _SCHEMA)
    # file 1 follows the reference law; file 2 flips the language mix
    _write(spark, src, _doc_rows(1000, 100, "en"))
    _write(spark, src, _doc_rows(2000, 100, "de"))
    report = run_drift_monitor(
        spark, src, reference, store, ckpt, threshold=0.25
    )
    assert report.n_batches >= 2
    rows = {
        (r["batch_id"], r["column_name"]): (r["psi"], r["alarm"])
        for r in store.read("drift_reports").collect()
    }
    by_col = {}
    for (bid, col), (psi, alarm) in rows.items():
        by_col.setdefault(col, []).append((bid, psi, alarm))
    lang = sorted(by_col["lang"])
    assert lang[0][2] is False and lang[0][1] < 0.1  # en batch: calm
    assert lang[1][2] is True and lang[1][1] > 0.25  # de batch: alarm
    # token distribution identical in every batch -> never alarms
    assert all(not a for _, _, a in by_col["token_bucket"])
    assert report.n_alarms >= 1

    # no new files: re-run consumes nothing and reports are unchanged
    n_rows = store.read("drift_reports").count()
    r2 = run_drift_monitor(spark, src, reference, store, ckpt)
    assert r2.n_batches == 0
    assert store.read("drift_reports").count() == n_rows


# ---------------------------------------------------------------------------
# Streaming embedding (cell-histogram) drift monitor.
# ---------------------------------------------------------------------------
def _vec_rows(start_id, n, axis, dim=8):
    """n vectors clustered on one axis (deterministic jitter-free)."""
    rows = []
    for i in range(n):
        v = [0.0] * dim
        v[(axis + (i % 4)) % dim] = 1.0  # spread over 4 axes from base
        rows.append((start_id + i, v))
    return rows


def test_embedding_drift_monitor_flags_shifted_batch_only(spark, tmp_path):
    from efiche_data_pipeline_spark.streaming.drift import (
        run_embedding_drift_monitor,
    )

    schema = "vec_id long, embedding array<double>"
    src = str(tmp_path / "vsrc")
    ckpt = str(tmp_path / "vckpt")
    store = Store(spark, str(tmp_path / "vstore"))
    # centroids: one per axis -> cell k+1 captures axis k exactly
    cents = spark.createDataFrame(
        [(k + 1, [1.0 if j == k else 0.0 for j in range(8)]) for k in range(8)],
        "cell_id int, embedding array<double>",
    )
    reference = spark.createDataFrame(_vec_rows(0, 400, axis=0), schema)
    # file 1 follows the reference law (axes 0-3); file 2 collapses to
    # the never-seen axes 4-7
    spark.createDataFrame(_vec_rows(1000, 100, axis=0), schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    spark.createDataFrame(_vec_rows(2000, 100, axis=4), schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    report = run_embedding_drift_monitor(
        spark, src, cents, reference, store, ckpt, threshold=0.25
    )
    assert report.n_batches >= 2
    rows = sorted(
        (r["batch_id"], r["psi"], r["alarm"])
        for r in store.read("embedding_drift_reports").collect()
    )
    assert rows[0][2] is False and rows[0][1] < 0.1, rows  # calm batch
    assert rows[1][2] is True and rows[1][1] > 0.25, rows  # shifted batch
    assert report.n_alarms == 1

    # replay-stable: no new files -> nothing consumed, reports unchanged
    n_rows = store.read("embedding_drift_reports").count()
    r2 = run_embedding_drift_monitor(
        spark, src, cents, reference, store, ckpt
    )
    assert r2.n_batches == 0
    assert store.read("embedding_drift_reports").count() == n_rows
