"""Incremental cluster-representative selection
(operators/dedup.py:incremental_representatives) — the maintenance
properties beyond the q131 oracle differential:

- two-fold maintenance ≡ the one-shot run over the union;
- replaying a committed batch changes nothing;
- a crash between the quality commit and the components fold (the
  operator's only multi-commit window) converges on replay;
- the cluster-merge case keeps exactly one representative for the
  merged cluster, and it is the best-quality member.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.dedup import (
    incremental_representatives,
    representatives_report,
)
from efiche_data_pipeline_spark.pipeline.store import Store

_TAU = 0.5

_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the late afternoon sun"
)
_OTHER = (
    "completely unrelated content about distributed query engines "
    "shuffling partitioned columnar data across many executor nodes"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(spark):
    """0≈1 within batch 1; 3≈0 cross-batch (joins the {0,1} cluster);
    2 and 4 singletons. Split at id <= 2."""
    return _docs(
        spark,
        [
            (0, _BASE),
            (1, _BASE + " extra"),
            (2, _OTHER),
            (3, _BASE + " tail"),
            (4, _OTHER.replace("columnar", "arrow").replace("nodes", "hosts")
             + " entirely different ending about gardening tomatoes"),
        ],
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_two_folds_equal_one_shot(spark, tmp_path):
    docs = _corpus(spark)
    inc = Store(spark, str(tmp_path / "inc"))
    incremental_representatives(
        docs.filter(F.col("doc_id") <= 2), inc, threshold=_TAU
    )
    folded = incremental_representatives(
        docs.filter(F.col("doc_id") > 2), inc, threshold=_TAU
    )
    one = Store(spark, str(tmp_path / "one"))
    direct = incremental_representatives(docs, one, threshold=_TAU)
    assert _rows(folded) == _rows(direct)
    # the {0,1,3} cluster has exactly one keeper, and it maximizes
    # (quality, -id)
    rows = {r["doc_id"]: r for r in folded.collect()}
    cluster = [r for r in rows.values() if r["component_id"] == 0]
    assert len(cluster) == 3
    kept = [r for r in cluster if r["kept"] == 1]
    best = min(cluster, key=lambda r: (-r["quality_score"], r["doc_id"]))
    assert len(kept) == 1 and kept[0]["doc_id"] == best["doc_id"]


def test_replay_is_noop(spark, tmp_path):
    docs = _corpus(spark)
    store = Store(spark, str(tmp_path))
    incremental_representatives(docs, store, threshold=_TAU)
    before = _rows(representatives_report(store))
    again = incremental_representatives(docs, store, threshold=_TAU)
    assert _rows(again) == before


def test_crash_between_quality_and_components_converges(spark, tmp_path):
    """Inject the crash in the operator's only multi-commit window:
    batch 2's quality rows land (commit 1) but the components fold
    (commit 2 — whose signature index is the batch watermark) never
    runs. The replayed batch must converge to the uninterrupted
    state: the quality append replays as a keyed no-op and the
    un-indexed batch re-derives its pairs."""
    from efiche_data_pipeline_spark.functions.text import quality_score_raw

    docs = _corpus(spark)
    b1 = docs.filter(F.col("doc_id") <= 2)
    b2 = docs.filter(F.col("doc_id") > 2)

    crashed = Store(spark, str(tmp_path / "crashed"))
    incremental_representatives(b1, crashed, threshold=_TAU)
    # simulate: commit 1 only (exactly what the operator writes first)
    partial = (
        b2.select(
            "doc_id",
            F.round(quality_score_raw(F.col("text")), 4).alias("quality_score"),
        )
        .dropDuplicates(["doc_id"])
        .localCheckpoint(eager=True)
    )
    crashed.append_new(partial, "doc_quality", key="doc_id")
    # replay the whole batch through the operator
    replayed = incremental_representatives(b2, crashed, threshold=_TAU)

    clean = Store(spark, str(tmp_path / "clean"))
    incremental_representatives(b1, clean, threshold=_TAU)
    uninterrupted = incremental_representatives(b2, clean, threshold=_TAU)
    assert _rows(replayed) == _rows(uninterrupted)
    # quality sink was not double-appended
    assert crashed.read("doc_quality").count() == 5
