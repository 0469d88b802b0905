"""Streaming incremental embedding dedup
(streaming/embedding_stream.py): the union of per-micro-batch kept
sets must equal one global dominated-rule pass over every file seen
(stream ≡ batch, frozen centroids), survivors accumulate in an
id-keyed sink, and a checkpoint restart consumes only new files while
still deduping them against the FULL history."""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.similarity import (
    incremental_embedding_dedup,
)
from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.streaming.embedding_stream import (
    run_incremental_embedding_stream,
)

_TAU = 0.9

# Three planted clusters on coordinate axes + jitter: members of one
# cluster are mutual near-dups at tau=0.9; cross-cluster cosine ~ 0.
_BASES = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0], 2: [0.0, 0.0, 1.0]}


def _vec(cluster, i):
    base = list(_BASES[cluster])
    base[(cluster + 1) % 3] += 0.01 * (i % 5)  # tiny deterministic jitter
    return base


def _rows(ids_clusters):
    return [(vid, _vec(c, vid)) for vid, c in ids_clusters]


def _pinned(spark):
    return spark.createDataFrame(
        [(c + 1, _BASES[c]) for c in range(3)],
        "cell_id int, embedding array<double>",
    )


def _write_file(spark, src, rows):
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(
        1
    ).write.mode("append").parquet(src)


def _global_kept(spark, tmp_path, all_rows, name):
    store = Store(spark, str(tmp_path / name))
    r = incremental_embedding_dedup(
        spark.createDataFrame(all_rows, "vec_id long, embedding array<double>"),
        store,
        centroids=_pinned(spark),
        tau=_TAU,
        nprobe=2,
    )
    return {row["vec_id"] for row in r.kept.collect()}


def test_embedding_stream_equals_global_and_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    f1 = _rows([(0, 0), (1, 0), (2, 1)])  # 1 dups 0 within the file
    f2 = _rows([(3, 0), (4, 2)])  # 3 dups history (cluster 0)
    for f in (f1, f2):
        _write_file(spark, src, f)
    r = run_incremental_embedding_stream(
        spark, src, store, ckpt, centroids=_pinned(spark), tau=_TAU, nprobe=2
    )
    kept = {row["vec_id"] for row in store.read("embdedup_kept_vecs").collect()}
    assert kept == _global_kept(spark, tmp_path, f1 + f2, "g1")
    assert r.n_batches >= 2
    assert r.n_new == 5
    assert r.n_kept_total == len(kept)
    assert r.n_indexed_total == 5  # kept AND dropped are indexed

    # restart from the checkpoint: only the NEW file is consumed, and
    # its near-dup-of-history rows still drop
    f3 = _rows([(5, 1), (6, 2)])  # both dup history clusters
    f4 = [(7, [1.0, 1.0, 1.0])]  # genuinely new direction: kept
    _write_file(spark, src, f3)
    _write_file(spark, src, f4)
    r2 = run_incremental_embedding_stream(
        spark, src, store, ckpt, tau=_TAU, nprobe=2
    )
    kept2 = {row["vec_id"] for row in store.read("embdedup_kept_vecs").collect()}
    assert kept2 == _global_kept(spark, tmp_path, f1 + f2 + f3 + f4, "g2")
    assert r2.n_new == 3  # only the post-checkpoint files
    assert r2.n_indexed_total == 8


def test_embedding_stream_rerun_is_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = Store(spark, str(tmp_path / "store"))
    _write_file(spark, src, _rows([(0, 0), (1, 1)]))
    r1 = run_incremental_embedding_stream(
        spark, src, store, ckpt, centroids=_pinned(spark), tau=_TAU
    )
    r2 = run_incremental_embedding_stream(spark, src, store, ckpt, tau=_TAU)
    assert r2.n_batches == 0 or r2.n_new == 0
    assert r2.n_kept_total == r1.n_kept_total == 2
    assert r2.n_indexed_total == r1.n_indexed_total == 2


def test_embedding_stream_crash_between_sink_and_index_converges(
    spark, tmp_path
):
    """Simulated crash AFTER the sink write but BEFORE the index
    append (the window the write order protects): rerunning the stream
    re-processes the file, finds the sink rows present (no-op keyed
    append) and completes the index — sink and index converge to the
    single-run state."""
    src = str(tmp_path / "src")
    store = Store(spark, str(tmp_path / "store"))
    rows = _rows([(0, 0), (1, 0), (2, 1)])
    _write_file(spark, src, rows)
    # manual first "run" that crashes mid-batch: sink written, index not
    res = incremental_embedding_dedup(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        store,
        centroids=_pinned(spark),
        tau=_TAU,
        nprobe=2,
        commit=False,
    )
    store.append_new(res.kept.select("vec_id"), "embdedup_kept_vecs", key="vec_id")
    # crash here: index_delta never appended. Fresh stream run (new
    # checkpoint — the old run's offsets died with it) must converge.
    r = run_incremental_embedding_stream(
        spark, src, store, str(tmp_path / "ckpt2"), tau=_TAU, nprobe=2
    )
    kept = {row["vec_id"] for row in store.read("embdedup_kept_vecs").collect()}
    assert kept == _global_kept(spark, tmp_path, rows, "g3")
    assert store.count("embdedup_kept_vecs") == len(kept)  # no double-insert
    assert r.n_indexed_total == 3
