"""Chunk-level boilerplate removal (operators/dedup.py:content_chunks /
boilerplate_report / incremental_chunk_index) — the properties beyond
the q127/q128 oracle differentials:

- the chunk decomposition partitions each document exactly (token
  counts sum back, chunk ids are dense from 0);
- an exactly-duplicated document is ALL boilerplate: every chunk
  flagged, cleaned fingerprint = md5(''), full token mass removed —
  while a unique doc sharing no chunk keeps everything;
- incremental three-fold maintenance ≡ the one-shot global report
  (the decomposition is a pure per-document function);
- replaying a committed batch folds nothing and changes nothing;
- the report is invariant to the physical partitioning of the index.
"""

from __future__ import annotations

from hashlib import md5

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.dedup import (
    boilerplate_report,
    content_chunks,
    incremental_chunk_index,
)
from efiche_data_pipeline_spark.pipeline.store import Store

_MD5_EMPTY = md5(b"").hexdigest()

_SHARED = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)
_UNIQUE = (
    "one two three four five six seven eight nine ten eleven "
    "twelve thirteen fourteen fifteen sixteen seventeen"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _report_rows(df):
    return sorted(
        (
            r["doc_id"],
            r["n_chunks"],
            r["n_boiler"],
            r["kept_tokens"],
            r["removed_tokens"],
            r["cleaned_fp"],
        )
        for r in df.collect()
    )


def test_chunks_partition_each_document(spark):
    docs = _docs(spark, [(1, _SHARED), (2, _UNIQUE)])
    chunks = content_chunks(docs).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        n_tok = len((_SHARED if doc_id == 1 else _UNIQUE).split())
        assert sum(r["n_tokens"] for r in rows) == n_tok
        assert sorted(r["chunk_id"] for r in rows) == list(range(len(rows)))
        assert all(len(r["chunk_fp"]) == 32 for r in rows)


def test_duplicated_doc_is_all_boilerplate(spark):
    # ids 1 and 2 are byte-identical -> every chunk occurs in 2 docs;
    # id 3 shares nothing -> every chunk unique.
    docs = _docs(spark, [(1, _SHARED), (2, _SHARED), (3, _UNIQUE)])
    rep = {
        r["doc_id"]: r
        for r in boilerplate_report(content_chunks(docs), min_docs=2).collect()
    }
    for dup_id in (1, 2):
        r = rep[dup_id]
        assert r["n_boiler"] == r["n_chunks"] > 0
        assert r["kept_tokens"] == 0
        assert r["removed_tokens"] == len(_SHARED.split())
        assert r["cleaned_fp"] == _MD5_EMPTY
    r = rep[3]
    assert r["n_boiler"] == 0
    assert r["removed_tokens"] == 0
    assert r["kept_tokens"] == len(_UNIQUE.split())
    assert r["cleaned_fp"] != _MD5_EMPTY


def test_incremental_three_folds_equal_global(spark, tmp_path):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 90)
    )
    store = Store(spark, str(tmp_path))
    for lo, hi in ((0, 30), (30, 60), (60, 90)):
        n = incremental_chunk_index(
            docs.filter(F.col("doc_id").between(lo, hi - 1)), store
        )
        assert n > 0
    maintained = boilerplate_report(store.read("chunk_index"), min_docs=2)
    direct = boilerplate_report(content_chunks(docs), min_docs=2)
    assert _report_rows(maintained) == _report_rows(direct)


def test_replay_is_noop(spark, tmp_path):
    docs = _docs(spark, [(1, _SHARED), (2, _UNIQUE)])
    store = Store(spark, str(tmp_path))
    assert incremental_chunk_index(docs, store) == 2
    before = store.read("chunk_index").count()
    assert incremental_chunk_index(docs, store) == 0
    assert store.read("chunk_index").count() == before


def test_report_partition_invariant(spark, tmp_path):
    docs = _docs(spark, [(1, _SHARED), (2, _SHARED), (3, _UNIQUE)])
    chunks = content_chunks(docs)
    one = boilerplate_report(chunks.repartition(1), min_docs=2)
    many = boilerplate_report(chunks.repartition(7, "chunk_fp"), min_docs=2)
    assert _report_rows(one) == _report_rows(many)


def test_duplicate_rows_within_batch_fold_cleanly(spark, tmp_path):
    """A batch carrying the same (doc_id, text) row twice must fold
    the doc ONCE with clean fingerprints — not merge the copies'
    exploded tokens into a corrupted chunk fold."""
    docs = _docs(spark, [(1, _SHARED), (1, _SHARED), (2, _UNIQUE)])
    store = Store(spark, str(tmp_path))
    assert incremental_chunk_index(docs, store) == 2
    got = store.read("chunk_index")
    clean = content_chunks(_docs(spark, [(1, _SHARED), (2, _UNIQUE)]))
    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert key(got) == key(clean)
