"""Planted-value tests for the repetition metrics (q67's in-row
run-length fold) and the word_ngrams/word_shingles split — the oracle
parity test covers the fixture distribution; these pin the arithmetic
on documents whose right answers are known by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.functions.text import word_ngrams, word_shingles


CASES = [
    # (text, n_tokens, dup_word_frac, top_bigram_frac)
    ("a b c d", 4, 0.0, 0.3333),  # all unique: top bigram appears 1 of 3
    ("a a a a", 4, 0.75, 1.0),  # one word: every bigram is "a a"
    ("a b a b a", 5, 0.6, 0.5),  # "a b" twice of 4 bigrams
    ("x", 1, 0.0, 0.0),  # no bigrams at all
]


@pytest.mark.parametrize("text,n_tok,dup,top", CASES)
def test_repetition_metrics_planted(spark, tmp_path, text, n_tok, dup, top):
    from efiche_data_pipeline_spark.plans.extensions import q67_repetition_metrics

    # Route the planted doc through the real query by materializing a
    # one-row documents table in the q67 input schema.
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, text, "en", "unit", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    row = q67_repetition_metrics(spark, sf_dir).collect()[0]
    assert row.n_tokens == n_tok
    assert row.dup_word_frac == pytest.approx(dup, abs=1e-9)
    assert row.top_bigram_frac == pytest.approx(top, abs=1e-9)


def test_decontamination_planted(spark, tmp_path):
    """q66 on a constructed corpus: doc 20 (benchmark — id % 20 == 0)
    shares a full 5-gram with doc 1, doc 2 shares none. Only doc 1 may
    be flagged, with exactly one overlapping shingle."""
    from efiche_data_pipeline_spark.plans.extensions import (
        q66_benchmark_decontamination,
    )

    leak = "alpha bravo charlie delta echo"
    rows = [
        (20, leak + " foxtrot golf", "en", "bench", 0),
        (1, "intro words " + leak, "en", "train", 0),
        (2, "totally unrelated text with many different words here", "en", "train", 0),
    ]
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    got = {r.doc_id: r for r in q66_benchmark_decontamination(spark, sf_dir).collect()}
    assert set(got) == {1, 2}  # doc 20 is benchmark-side, not scored
    assert got[1].contaminated and got[1].n_overlap_ngrams == 1
    assert not got[2].contaminated and got[2].n_overlap_ngrams == 0


def test_bpe_ish_count_planted(spark):
    from efiche_data_pipeline_spark.functions.text import bpe_ish_count

    cases = [
        ("hello world", 2),  # two letter runs
        ("don't stop", 4),  # don / ' / t / stop
        ("v2.0-beta", 6),  # v / 2 / . / 0 / - / beta
        ("a1b2", 4),  # alternating letter/digit runs
        ("", 0),
    ]
    df = spark.createDataFrame(cases, "text string, want int").select(
        "want", bpe_ish_count("text").alias("got")
    )
    for r in df.collect():
        assert r.got == r.want


def test_word_ngrams_keeps_repeats_shingles_dedup(spark):
    df = spark.createDataFrame([("a b a b",)], "text string").select(
        word_ngrams("text", 2).alias("all"),
        word_shingles("text", 2).alias("distinct"),
    )
    row = df.collect()[0]
    assert row["all"] == ["a b", "b a", "a b"]
    assert sorted(row["distinct"]) == ["a b", "b a"]
