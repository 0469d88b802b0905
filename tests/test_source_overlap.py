"""Cross-source overlap matrix (q147) + its incremental maintenance
(operators/sketch.py:incremental_source_overlap, q153) — planted
overlap fractions beyond the oracle differential:

- exact Jaccard on hand-built source pairs, zero-overlap pairs
  included;
- incremental folds ≡ one-shot global, replay no-ops (set union is
  its own watermark), cross-fold overlap attributed correctly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.sketch import (
    incremental_source_overlap,
    source_overlap_result,
)
from efiche_data_pipeline_spark.pipeline.store import Store

# 3-gram shingles for compact fixtures.
_N = 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _matrix(df):
    return {
        (r["source_a"], r["source_b"]): (
            r["n_shingles_a"],
            r["n_shingles_b"],
            r["n_common"],
            r["jaccard"],
        )
        for r in df.collect()
    }


def test_overlap_exact_and_zero_pairs(spark, tmp_path):
    # srcA: shingles of "p q r s"  -> {p q r, q r s}           (2)
    # srcB: "p q r t"              -> {p q r, q r t}           (2)
    # srcC: "x y z w"              -> {x y z, y z w}           (2)
    # A∩B = {p q r} -> J = 1/3; A∩C = B∩C = 0.
    docs = _docs(
        spark,
        [
            (1, "srcA", "p q r s"),
            (2, "srcB", "p q r t"),
            (3, "srcC", "x y z w"),
        ],
    )
    store = Store(spark, str(tmp_path / "ovl"))
    out = _matrix(incremental_source_overlap(docs, store, n=_N))
    assert out[("srcA", "srcB")] == (2, 2, 1, 0.3333)
    assert out[("srcA", "srcC")] == (2, 2, 0, 0.0)
    assert out[("srcB", "srcC")] == (2, 2, 0, 0.0)


def test_incremental_folds_equal_global_and_replay(spark, tmp_path):
    docs = _docs(
        spark,
        [
            (1, "srcA", "p q r s"),
            (2, "srcB", "p q r t"),
            (3, "srcA", "u v w x"),   # grows A's set in fold 2
            (4, "srcB", "u v w y"),   # cross-FOLD overlap with doc 3
        ],
    )
    g_store = Store(spark, str(tmp_path / "glob"))
    want = _matrix(incremental_source_overlap(docs, g_store, n=_N))

    store = Store(spark, str(tmp_path / "inc"))
    incremental_source_overlap(docs.filter(F.col("doc_id") <= 2), store, n=_N)
    got = _matrix(
        incremental_source_overlap(docs.filter(F.col("doc_id") > 2), store, n=_N)
    )
    assert got == want
    # the doc-3/doc-4 shingle overlap spans the fold boundary:
    # A = {pqr,qrs,uvw,vwx}, B = {pqr,qrt,uvw,vwy} -> common 2, J=2/6
    assert got[("srcA", "srcB")] == (4, 4, 2, 0.3333)
    # replay: set union no-ops, matrix unchanged
    after = _matrix(incremental_source_overlap(docs, store, n=_N))
    assert after == want
    # and the state did not grow (idempotent keyed append)
    n_rows = store.read("source_shingles").count()
    incremental_source_overlap(docs, store, n=_N)
    assert store.read("source_shingles").count() == n_rows


def test_overlap_result_reads_state_only(spark, tmp_path):
    # the report derives from the persisted set alone — no text access
    docs = _docs(spark, [(1, "a", "p q r s"), (2, "b", "p q r s")])
    store = Store(spark, str(tmp_path / "ro"))
    incremental_source_overlap(docs, store, n=_N)
    out = _matrix(source_overlap_result(store))
    assert out[("a", "b")] == (2, 2, 2, 1.0)
