"""Streaming incremental dedup (streaming/dedup_stream.py): the union
of per-micro-batch kept sets must equal one global LSH dedup of every
file seen (stream ≡ batch), survivors accumulate in an id-keyed sink,
the index version grows per productive batch, and a checkpoint restart
consumes only new files while still deduping them against the FULL
history."""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.dedup import minhash_lsh_pairs
from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.streaming.dedup_stream import (
    run_incremental_dedup_stream,
)

from .test_incremental_dedup import _BASE, _OTHER, _TAU, _THIRD

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_file(spark, src, rows):
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows], _SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)


def _global_kept(spark, all_rows):
    docs = spark.createDataFrame(
        [(i, t) for i, t in all_rows], "doc_id long, text string"
    )
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=16, bands=4, min_est_sim=_TAU
    )
    dropped = {r["doc_b"] for r in pairs.collect()}
    return {i for i, _ in all_rows} - dropped


def test_stream_dedup_equals_global_and_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    f1 = [(0, _BASE), (1, _BASE + " extra"), (2, _OTHER)]
    f2 = [(3, _BASE + " tail"), (4, _THIRD), (5, _THIRD + " appended")]
    _write_file(spark, src, f1)
    _write_file(spark, src, f2)
    r = run_incremental_dedup_stream(spark, src, store, ckpt)
    assert r.n_batches >= 2
    kept = {row["doc_id"] for row in store.read("dedup_kept_docs").collect()}
    assert kept == _global_kept(spark, f1 + f2)
    assert r.n_new == 6 and r.n_dropped == len(f1 + f2) - len(kept)
    v1 = r.index_version
    assert v1 >= 2  # one committed version per productive batch

    # Restart from the checkpoint with one new file: doc 6 near-dups
    # the very FIRST file's doc 0 (cross-restart history), doc 7 is
    # fresh. Only the new file is consumed; history still dominates.
    f3 = [(6, _BASE + " zz"), (7, "totally novel words about alpine skiing trails")]
    _write_file(spark, src, f3)
    r2 = run_incremental_dedup_stream(spark, src, store, ckpt)
    kept2 = {row["doc_id"] for row in store.read("dedup_kept_docs").collect()}
    assert kept2 == _global_kept(spark, f1 + f2 + f3)
    assert 6 not in kept2 and 7 in kept2
    assert r2.n_new == 2 and r2.index_version > v1


def test_stream_dedup_rerun_without_new_files_is_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    _write_file(spark, src, [(0, _BASE), (1, _BASE + " extra")])
    r1 = run_incremental_dedup_stream(spark, src, store, ckpt)
    n_kept = store.read("dedup_kept_docs").count()
    r2 = run_incremental_dedup_stream(spark, src, store, ckpt)
    assert r2.n_batches == 0 or r2.n_new == 0
    assert store.read("dedup_kept_docs").count() == n_kept
    assert r2.index_version == r1.index_version


def test_stream_dedup_auto_compaction_preserves_semantics(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    f1 = [(0, _BASE), (1, _BASE + " extra")]
    f2 = [(2, _OTHER)]
    f3 = [(3, _BASE + " tail"), (4, _THIRD)]
    for f in (f1, f2, f3):
        _write_file(spark, src, f)
    r = run_incremental_dedup_stream(spark, src, store, ckpt, compact_every=2)
    kept = {row["doc_id"] for row in store.read("dedup_kept_docs").collect()}
    assert kept == _global_kept(spark, f1 + f2 + f3)
    v = store.current_version("minhash_sig_index")
    assert len(store._layers("minhash_sig_index", v)) < 3
    assert {
        row["doc_id"]
        for row in store.read_union("minhash_sig_index").collect()
    } == {0, 1, 2, 3, 4}
