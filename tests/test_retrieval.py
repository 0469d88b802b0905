"""BM25 retrieval estate (operators/retrieval.py) — the properties
beyond the q194-q196 oracle differentials:

- index two folds ≡ one-shot over the union (exact rows, fixed-point
  law shared);
- replaying a committed batch folds nothing and changes no read;
- the crash windows converge: a crash between the postings and
  doc-length commits makes queries REFUSE (orphan postings are
  corruption, not a scorable state) until the batch replays; a crash
  before the seen commit leaves tolerated multisets that every read
  collapses exactly;
- the postings point-read prunes to the query terms' tp directory
  prefixes (plan-pinned PartitionFilters — the 100 TB contract);
- forget purges the estate and every later read equals the one-shot
  over the survivors; the blind retry is a no-op.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.retrieval import (
    bm25_index_query,
    bm25_topk,
    forget_term_documents,
    incremental_term_postings,
)
from efiche_data_pipeline_spark.pipeline.store import Store

_DOCS = [
    (0, "vector join stream vector vector"),
    (1, "hash table scan hash"),
    (2, "slow window merge window"),
    (3, "vector stream"),
    (4, "join join join table"),
    (5, "unrelated words entirely"),
]
_QUERIES = [(0, "vector join"), (1, "hash scan")]


def _docs(spark, rows=_DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _qf(spark):
    return spark.createDataFrame(_QUERIES, "query_id long, query string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_index_two_folds_equals_one_shot(spark, tmp_path):
    docs = _docs(spark)
    store = Store(spark, str(tmp_path / "bm"))
    assert (
        incremental_term_postings(docs.filter(F.col("doc_id") <= 2), store)
        == 3
    )
    assert (
        incremental_term_postings(docs.filter(F.col("doc_id") > 2), store) == 3
    )
    got = _rows(bm25_index_query(store, _qf(spark), k=4))
    want = _rows(bm25_topk(docs, _qf(spark), k=4))
    assert got == want and want
    # replay: folds nothing, read unchanged
    assert incremental_term_postings(docs, store) == 0
    assert _rows(bm25_index_query(store, _qf(spark), k=4)) == want


def test_index_read_prunes_to_term_prefixes(spark, tmp_path):
    import re

    from efiche_data_pipeline_spark.operators.retrieval import (
        _pruned_postings,
        _query_terms,
    )

    docs = _docs(spark)
    store = Store(spark, str(tmp_path / "bmplan"))
    incremental_term_postings(docs, store)
    assert store.partitioning("term_postings") == ["tp"]
    # the operator's actual read path (the helper bm25_index_query
    # checkpoints): the term prefixes reach the FileScan as a
    # PARTITION filter, and the term cut broadcasts
    terms = _query_terms(_qf(spark), "query_id", "query").select("term").distinct()
    tf = _pruned_postings(store, "term_postings", terms)
    tf.collect()
    plan = tf._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*tp#\d+", plan), plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # and the full query result is unchanged by the prune
    got = _rows(bm25_index_query(store, _qf(spark), k=4))
    assert got == _rows(bm25_topk(docs, _qf(spark), k=4))


class _CrashBeforeDoclenStore(Store):
    """Crash between the postings and doc-length commits — the window
    where queries must REFUSE rather than silently drop the orphaned
    postings docs from scoring."""

    def __init__(self, spark, root):
        super().__init__(spark, root)
        self.armed = False

    def append(self, df, table, partition_by=None):
        if self.armed and table == "doc_lengths":
            self.armed = False
            raise RuntimeError("injected crash before doclen commit")
        return super().append(df, table, partition_by=partition_by)


class _CrashBeforeSeenStore(Store):
    """Crash between the doc-length and seen-watermark commits — the
    replay re-appends the batch into both tables (tolerated
    multisets; reads collapse by max-per-key)."""

    def __init__(self, spark, root):
        super().__init__(spark, root)
        self.armed = False

    def append_new(self, df, table, key, partition_by=None):
        if self.armed and table == "postings_seen_docs":
            self.armed = False
            raise RuntimeError("injected crash before seen commit")
        return super().append_new(df, table, key, partition_by=partition_by)


def test_crash_before_doclen_refuses_then_converges(spark, tmp_path):
    docs = _docs(spark)
    store = _CrashBeforeDoclenStore(spark, str(tmp_path / "bmc1"))
    incremental_term_postings(docs.filter(F.col("doc_id") <= 2), store)
    store.armed = True
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_term_postings(docs.filter(F.col("doc_id") > 2), store)
    # postings landed without lengths: scoring must refuse loudly
    with pytest.raises(RuntimeError, match="no committed doc_lengths"):
        bm25_index_query(store, _qf(spark), k=4).collect()
    assert (
        incremental_term_postings(docs.filter(F.col("doc_id") > 2), store)
        == 3
    )
    got = _rows(bm25_index_query(store, _qf(spark), k=4))
    assert got == _rows(bm25_topk(docs, _qf(spark), k=4))


def test_crash_before_seen_multiset_converges(spark, tmp_path):
    docs = _docs(spark)
    store = _CrashBeforeSeenStore(spark, str(tmp_path / "bmc2"))
    incremental_term_postings(docs.filter(F.col("doc_id") <= 2), store)
    store.armed = True
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_term_postings(docs.filter(F.col("doc_id") > 2), store)
    assert (
        incremental_term_postings(docs.filter(F.col("doc_id") > 2), store)
        == 3
    )
    # the crash window left the batch twice in postings + doclens
    dup = store.read("doc_lengths").filter("_id = 4").count()
    assert dup == 2  # duplicated, not lost
    got = _rows(bm25_index_query(store, _qf(spark), k=4))
    assert got == _rows(bm25_topk(docs, _qf(spark), k=4))
    assert incremental_term_postings(docs, store) == 0


def test_forget_equals_survivor_one_shot(spark, tmp_path):
    docs = _docs(spark)
    store = Store(spark, str(tmp_path / "bmf"))
    incremental_term_postings(docs, store)
    gone = spark.createDataFrame([(0,), (4,)], "doc_id long")
    forget_term_documents(store, gone)
    for t in ("term_postings", "doc_lengths", "postings_seen_docs"):
        assert store.read(t).filter("_id in (0, 4)").count() == 0, t
    survivors = docs.filter(~F.col("doc_id").isin(0, 4))
    got = _rows(bm25_index_query(store, _qf(spark), k=4))
    assert got == _rows(bm25_topk(survivors, _qf(spark), k=4)) and got
    # blind retry: pure deletes, nothing changes
    forget_term_documents(store, gone)
    assert _rows(bm25_index_query(store, _qf(spark), k=4)) == got
    # forgotten docs may RE-ENTER later (seen purged too)
    assert incremental_term_postings(docs, store) == 2
    assert _rows(bm25_index_query(store, _qf(spark), k=4)) == _rows(
        bm25_topk(docs, _qf(spark), k=4)
    )


def test_rrf_fuse_semantics(spark):
    """RRF: items in both lists outrank single-list items at equal
    ranks, single-list items still score, exact fixed-point ties
    break by item id, and c shifts weights without reordering
    equal-structure lists."""
    from efiche_data_pipeline_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, item_id long, rank long",
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id long, item_id long, rank long",
    )
    got = {
        r["item_id"]: (r["rank"], r["rrf_score"])
        for r in rrf_fuse([a, b], k=10).collect()
    }
    # 11 appears rank2+rank1 -> top; 10 (1 list, rank 1) next;
    # 13 (rank 2) beats 12 (rank 3)
    assert [i for i, _ in sorted(got.items(), key=lambda kv: kv[1][0])] == [
        11, 10, 13, 12,
    ]
    fp = lambda r: round(1e9 / (60.0 + r))
    assert got[11][1] == round((fp(2) + fp(1)) / 1e9, 6)
    assert got[10][1] == round(fp(1) / 1e9, 6)
    # exact tie (same rank, single list each) -> item id order
    c = spark.createDataFrame(
        [(1, 21, 1)], "query_id long, item_id long, rank long"
    )
    d = spark.createDataFrame(
        [(1, 20, 1)], "query_id long, item_id long, rank long"
    )
    tied = rrf_fuse([c, d], k=2).collect()
    assert [(r["item_id"], r["rank"]) for r in sorted(tied, key=lambda r: r["rank"])] == [
        (20, 1), (21, 2),
    ]


def test_postings_compaction_preserves_reads(spark, tmp_path):
    """Store.compact on the tp-bucketed postings table preserves the
    layout, the sidecar, and every estate read (BM25 result and the
    replay watermark: a re-fold is still a no-op)."""
    docs = _docs(spark)
    store = Store(spark, str(tmp_path / "bmcmp"))
    incremental_term_postings(docs.filter(F.col("doc_id") <= 2), store)
    incremental_term_postings(docs.filter(F.col("doc_id") > 2), store)
    want = _rows(bm25_index_query(store, _qf(spark), k=4))
    store.compact("term_postings", 4)
    assert store.partitioning("term_postings") == ["tp"]
    assert store.read_layout_meta("term_postings") is not None
    assert _rows(bm25_index_query(store, _qf(spark), k=4)) == want
    assert incremental_term_postings(docs, store) == 0
