"""Dedup savings reports (q165/q166/q167/q168) — planted cross-source
semantics beyond the oracle differential: the keep-first rule is
GLOBAL, so a copy duplicated across sources is credited to its
keeper's source and the other source pays the full loss."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.plans.corpus import (
    q165_dedup_savings,
    q166_incremental_dedup_savings,
    q167_neardup_savings,
)


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    ).write.parquet(os.path.join(d, "documents.parquet"))


def _by_source(df):
    return {
        r["source"]: (
            r["docs_before"],
            r["docs_after"],
            r["tokens_before"],
            r["tokens_after"],
            r["tokens_saved_frac"],
        )
        for r in df.collect()
    }


def test_exact_savings_cross_source_attribution(spark):
    # doc 1 (srcA) and doc 10 (srcB) are byte-identical: the keeper is
    # doc 1, so srcB loses the copy and srcA keeps everything.
    rows = [
        (1, "srcA", "en", "alpha beta gamma delta"),
        (2, "srcA", "en", "unique text one two"),
        (10, "srcB", "en", "alpha beta gamma delta"),
        (11, "srcB", "en", "other unique text here"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, d, rows)
        got = _by_source(q165_dedup_savings(spark, d))
        inc = _by_source(q166_incremental_dedup_savings(spark, d))
    assert got["srcA"] == (2, 2, 8, 8, 0.0)
    assert got["srcB"] == (2, 1, 8, 4, 0.5)
    assert inc == got  # maintained ≡ one-shot on the same fixture


def test_neardup_savings_subsumes_exact(spark):
    # the identical pair is also an LSH pair (all bands agree), so the
    # fuzzy report shows at least the exact loss.
    rows = [
        (1, "srcA", "en", "alpha beta gamma delta epsilon zeta eta theta"),
        (10, "srcB", "en", "alpha beta gamma delta epsilon zeta eta theta"),
        (11, "srcB", "en", "completely different words appear in this second document"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, d, rows)
        got = _by_source(q167_neardup_savings(spark, d))
    assert got["srcA"][:2] == (1, 1)
    assert got["srcB"][:2] == (2, 1)  # the cross-source copy dropped
    assert got["srcB"][4] == 0.5  # both srcB docs are 8 tokens
