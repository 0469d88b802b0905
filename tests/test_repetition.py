"""WITHIN-document repetition metrics (operators/quality.py) —
hand-checkable semantics beyond the q146/q151 oracle differential:

- exact metrics on planted looping / clean / tiny docs, including the
  overlapping-gram coverage cap and the lexicographic tie-break;
- incremental_repetition: folds ≡ global, replay no-ops, and the
  one-commit protocol (report table is its own watermark).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.quality import (
    incremental_repetition,
    repetition_report,
)
from efiche_data_pipeline_spark.pipeline.store import Store


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _rows(df):
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["top_2gram"],
            r["top_2gram_count"],
            r["top_2gram_frac"],
            r["dup_3gram_frac"],
            r["repetitive"],
        )
        for r in df.collect()
    }


def test_repetition_planted_looping_doc(spark):
    # "spam ham " * 4: 8 tokens, 7 2-grams — "spam ham" ×4,
    # "ham spam" ×3; top 2-gram covers min(1, 2*4/8) = 1.0.
    # 6 3-grams: "spam ham spam" ×3, "ham spam ham" ×3 → all 6
    # positions duplicated → dup_3gram_frac = 1.0.
    looping = " ".join(["spam", "ham"] * 4)
    # 12 distinct tokens: a unique top 2-gram covers 2/12 < 0.20, so
    # a genuinely clean doc stays below the Gopher threshold (at 8
    # tokens even a unique gram covers 0.25 — doc must be long enough
    # for the fraction filter to be meaningful, as in the paper).
    clean = "the quick brown fox jumps over two lazy dogs near old barns"
    got = _rows(repetition_report(_docs(spark, [looping, clean])))
    assert got[0] == (8, "spam ham", 4, 1.0, 1.0, True)
    # clean doc: every gram unique → top 2-gram count 1, frac 2/12,
    # dup3 0.0, not repetitive.
    n, g, c, f2, f3, rep = got[1]
    assert (n, c, f3, rep) == (12, 1, 0.0, False)
    assert f2 == 0.1667


def test_repetition_overlap_cap_and_ties(spark):
    # "a a a a": 3 2-grams all "a a" → 2*3/4 = 1.5, capped at 1.0.
    got = _rows(repetition_report(_docs(spark, ["a a a a"])))
    assert got[0][1:4] == ("a a", 3, 1.0)
    # tie on count → lexicographically smallest gram wins in both
    # engines' binary order: "b c" and "c b" both appear twice.
    got = _rows(repetition_report(_docs(spark, ["b c b c b"])))
    assert got[0][1] == "b c" and got[0][2] == 2


def test_repetition_tiny_docs_zeroed(spark):
    # 1-token and 2-token docs: no 3-grams (and no 2-grams for the
    # single token) → coalesced zeros, never nulls or divide-by-zero.
    got = _rows(repetition_report(_docs(spark, ["one", "two words"])))
    assert got[0] == (1, None, 0, 0.0, 0.0, False)
    assert got[1][0] == 2 and got[1][4] == 0.0


def test_incremental_repetition_folds_equal_global(spark, tmp_path):
    texts = [
        " ".join(["spam", "ham"] * 4),
        "the quick brown fox jumps over lazy dogs",
        "x y x y x y x y",
        "alpha beta gamma delta",
    ]
    docs = _docs(spark, texts)
    store = Store(spark, str(tmp_path / "rep"))
    n1 = incremental_repetition(docs.filter(F.col("doc_id") <= 1), store)
    n2 = incremental_repetition(docs.filter(F.col("doc_id") > 1), store)
    assert (n1, n2) == (2, 2)
    got = _rows(store.read("repetition_reports"))
    want = _rows(repetition_report(docs))
    assert got == want
    # replay: pure no-op (the report table is its own watermark)
    n3 = incremental_repetition(docs, store)
    assert n3 == 0
    assert _rows(store.read("repetition_reports")) == want


# ---------------------------------------------------------------------------
# zlib compression-ratio signal (operators/quality.py:compression_ratio)
# ---------------------------------------------------------------------------
def test_compression_ratio_discriminates_planted_texts(spark):
    """The Dolma-style discrimination property: repetitive text
    compresses far below natural prose, random-ish gibberish sits
    above it; byte counts are exact and empty text yields NULL."""
    import zlib

    from efiche_data_pipeline_spark.operators.quality import compression_ratio

    natural = (
        "the quick brown fox jumps over the lazy dog while a calm "
        "river bends past granite cliffs and evening light settles "
        "quietly over the sleeping harbor town below the old bridge"
    )
    repetitive = "spam ham " * 60
    gibberish = "qzj vkx bwp dfg hmn rtl cys aeo uqi zxv " * 5
    rows = [(0, natural), (1, repetitive), (2, gibberish), (3, "")]
    out = {
        r["doc_id"]: r
        for r in compression_ratio(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    # exact byte accounting against python zlib at the same level
    for i, txt in rows[:3]:
        raw = txt.encode("utf-8")
        assert out[i]["n_bytes"] == len(raw)
        assert out[i]["n_compressed"] == len(zlib.compress(raw, 6))
        assert out[i]["ratio"] == round(len(zlib.compress(raw, 6)) / len(raw), 4)
    # discrimination: heavy repetition collapses the ratio far below
    # both natural prose and looser (5x-repeated) filler — the signal
    # the Dolma-style gate thresholds on
    assert out[1]["ratio"] < 0.25 * out[0]["ratio"]
    assert out[1]["ratio"] < 0.25 * out[2]["ratio"]
    # empty text: defined byte counts, NULL ratio (no div-by-zero)
    assert out[3]["n_bytes"] == 0 and out[3]["ratio"] is None
    # determinism (the Spark-only differential the driver records)
    again = {
        r["doc_id"]: r["ratio"]
        for r in compression_ratio(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert again == {k: v["ratio"] for k, v in out.items()}


def test_incremental_compression_ratio_folds_equal_one_shot(spark, tmp_path):
    from efiche_data_pipeline_spark.operators.quality import (
        compression_ratio,
        incremental_compression_ratio,
    )
    from efiche_data_pipeline_spark.pipeline.store import Store

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "spam ham " * 40,
        "a calm river bends past granite cliffs at dusk",
        "tick tock " * 25,
    ]
    docs = _docs(spark, texts)
    store = Store(spark, str(tmp_path / "zlib"))
    n1 = incremental_compression_ratio(docs.filter("doc_id <= 1"), store)
    n2 = incremental_compression_ratio(docs.filter("doc_id > 1"), store)
    assert (n1, n2) == (2, 2)
    want = sorted(tuple(r) for r in compression_ratio(docs).collect())
    got = sorted(tuple(r) for r in store.read("zlib_scores").collect())
    assert got == want
    # replay is a pure no-op
    assert incremental_compression_ratio(docs, store) == 0
    assert sorted(tuple(r) for r in store.read("zlib_scores").collect()) == want


# ---------------------------------------------------------------------------
# PII detection / redaction (operators/quality.py:pii_report,
# incremental_pii_flags)
# ---------------------------------------------------------------------------
def test_pii_report_planted_counts_and_fingerprint(spark):
    import hashlib
    import re

    from efiche_data_pipeline_spark.operators.quality import (
        PII_EMAIL_RE,
        PII_PHONE_RE,
        pii_report,
    )

    texts = [
        "write a@b.co and carol.d+x@e.org or call 555-1234 now",
        "no personal data here at all",
        "just a phone 123-4567",
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in pii_report(_docs(spark, texts)).collect()
    }
    assert (got[0]["n_emails"], got[0]["n_phones"], got[0]["has_pii"]) == (
        2, 1, True,
    )
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["has_pii"]) == (
        0, 0, False,
    )
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["has_pii"]) == (
        0, 1, True,
    )
    # fingerprint = md5 of the redacted text, emails masked first
    for i, t in enumerate(texts):
        red = re.sub(
            PII_PHONE_RE, "<PHONE>", re.sub(PII_EMAIL_RE, "<EMAIL>", t)
        )
        assert got[i]["redacted_fp"] == hashlib.md5(red.encode()).hexdigest()


def test_incremental_pii_flags_folds_equal_global(spark, tmp_path):
    from efiche_data_pipeline_spark.operators.quality import (
        incremental_pii_flags,
        pii_report,
    )

    texts = [
        "mail me x@y.io",
        "clean text",
        "call 555-0000",
        "two a@b.cd c@d.ef and 999-9999",
    ]
    docs = _docs(spark, texts)
    store = Store(spark, str(tmp_path / "pii"))
    n1 = incremental_pii_flags(docs.filter(F.col("doc_id") <= 1), store)
    n2 = incremental_pii_flags(docs.filter(F.col("doc_id") > 1), store)
    assert (n1, n2) == (2, 2)
    tup = lambda r: tuple(r.asDict()[c] for c in sorted(r.asDict()))
    got = sorted(map(tup, store.read("pii_flags").collect()))
    want = sorted(map(tup, pii_report(docs).collect()))
    assert got == want
    # replay: pure no-op (the flags table is its own watermark)
    assert incremental_pii_flags(docs, store) == 0
    assert sorted(map(tup, store.read("pii_flags").collect())) == want
