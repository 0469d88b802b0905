"""Planted-duplicate unit tests for the dedup operator family.

The corpus is constructed so every true near-dup pair has a *known*
shingle-set Jaccard: a base document of L distinct words and a variant
with its last m words replaced shares (L-m-2) of its 3-shingles, giving
J = (L-m-2) / (L+m-2). Families use disjoint vocabularies so there are
no cross-family shared shingles at all.

All hash functions involved (xxhash64, md5) are deterministic, so every
assertion here is exact and stable — including the MinHash-LSH recall,
which would only be probabilistic over a *random* choice of hash
functions.
"""

from __future__ import annotations

import pytest

from efiche_data_pipeline_spark.operators.dedup import (
    bow_dedup,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
)

L = 30  # words per doc; 3-shingles per doc = L - 2


def _doc(family: int, replaced: int = 0) -> str:
    """A document of L distinct family-specific words, with the last
    ``replaced`` words swapped for variant-specific ones."""
    words = [f"f{family}w{j}" for j in range(L - replaced)]
    words += [f"f{family}x{j}" for j in range(replaced)]
    return " ".join(words)


def true_jaccard(m: int) -> float:
    """Shingle-set Jaccard between a base doc and its m-word variant."""
    shared = L - m - 2
    union = 2 * (L - 2) - shared
    return shared / union


N_FAMILIES = 12


@pytest.fixture(scope="module")
def planted(spark):
    """N_FAMILIES families, each: base doc (id 10f), near-dup variant
    with 2 words replaced (id 10f+1, J≈0.867). Family 0 additionally
    has an exact copy (id 1000) and a token-shuffled copy (id 1001)."""
    rows = []
    for fam in range(N_FAMILIES):
        rows.append((10 * fam, _doc(fam)))
        rows.append((10 * fam + 1, _doc(fam, replaced=2)))
    rows.append((1000, _doc(0)))  # exact copy of doc 0
    shuffled = _doc(0).split()
    shuffled = " ".join(shuffled[15:] + shuffled[:15])
    rows.append((1001, shuffled))  # reordered copy of doc 0
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_identical_docs(planted):
    groups = {
        r.keeper_doc_id: r.n_copies
        for r in exact_dedup(planted, "doc_id", "text").collect()
    }
    assert groups[0] == 2  # doc 0 + its exact copy 1000
    assert groups[1001] == 1  # the shuffled copy is NOT an exact dup
    assert sum(groups.values()) == N_FAMILIES * 2 + 2


def test_bow_dedup_catches_reordered_docs(planted):
    groups = {
        r.keeper_doc_id: r.n_docs
        for r in bow_dedup(planted, "doc_id", "text").collect()
    }
    assert groups[0] == 3  # doc 0 + exact copy + shuffled copy
    assert 1001 not in groups


def test_jaccard_pairs_recovers_planted_values(planted):
    out = {
        (r.doc_a, r.doc_b): r
        for r in jaccard_pairs(
            planted, "doc_id", "text", n=3, max_freq=20, min_shared=2
        ).collect()
    }
    expected_j = round(true_jaccard(2), 4)
    for fam in range(N_FAMILIES):
        pair = (10 * fam, 10 * fam + 1)
        assert pair in out, f"planted pair {pair} missing"
        assert out[pair].jaccard == expected_j
        assert out[pair].n_shared == L - 2 - 2
    # identical docs: J = 1.0
    assert out[(0, 1000)].jaccard == 1.0
    # no cross-family pairs (disjoint vocabularies)
    for (a, b) in out:
        fam_a = 0 if a >= 1000 else a // 10
        fam_b = 0 if b >= 1000 else b // 10
        assert fam_a == fam_b, f"false positive across families: {(a, b)}"


def test_minhash_lsh_recovers_planted_pairs(planted):
    """The claim from plans/extensions.py: planted near-duplicates are
    recovered at (at least) the predicted banded-LSH collision rate.

    For J=0.867, r=4 rows, b=4 bands: P(candidate) = 1-(1-J^4)^4 ≈ 0.96,
    so over 12 planted pairs the expected recall is ≈0.96; we assert
    the deterministic outcome clears the 0.8 floor, and that the
    est_sim of every recovered pair is within 0.25 of true Jaccard
    (σ of a 16-hash estimate at J=0.867 is ≈0.085)."""
    out = {
        (r.doc_a, r.doc_b): r.est_sim
        for r in minhash_lsh_pairs(
            planted, "doc_id", "text", n_hashes=16, bands=4, min_est_sim=0.5
        ).collect()
    }
    planted_pairs = [(10 * f, 10 * f + 1) for f in range(N_FAMILIES)]
    found = [p for p in planted_pairs if p in out]
    recall = len(found) / len(planted_pairs)
    assert recall >= 0.8, f"LSH recall {recall} below predicted rate"
    tj = true_jaccard(2)
    for p in found:
        assert abs(out[p] - tj) <= 0.25, f"est_sim {out[p]} far from {tj}"
    # identical docs always collide (every band agrees) with est_sim 1.0
    assert out[(0, 1000)] == 1.0
    # no cross-family candidates survive the similarity floor
    for (a, b) in out:
        fam_a = 0 if a >= 1000 else a // 10
        fam_b = 0 if b >= 1000 else b // 10
        assert fam_a == fam_b


def test_minhash_lsh_rejects_indivisible_bands(planted):
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs(planted, "doc_id", "text", n_hashes=16, bands=5)


def test_portable_signatures_match_chunk_hash_reference(planted):
    """The hoisted-digest projection inside minhash_signatures(portable
    =True) must stay value-identical to the canonical per-seed
    portable_chunk_hash (functions/hashing.py) — the form the DuckDB
    oracle renders. Guards the inlined optimization."""
    from pyspark.sql import functions as F

    from efiche_data_pipeline_spark.functions.hashing import portable_chunk_hash
    from efiche_data_pipeline_spark.functions.text import word_shingles
    from efiche_data_pipeline_spark.operators.dedup import minhash_signatures

    fast = minhash_signatures(planted, "doc_id", "text", 8, 3, portable=True)
    sh = planted.select(
        F.col("doc_id"), F.explode(word_shingles("text", 3)).alias("shingle")
    )
    ref = sh.groupBy("doc_id").agg(
        *[
            F.min(portable_chunk_hash("shingle", s)).alias(f"mh_{s}")
            for s in range(8)
        ]
    )
    a = {r.doc_id: tuple(r)[1:] for r in fast.collect()}
    b = {r.doc_id: tuple(r)[1:] for r in ref.collect()}
    assert a == b


def test_simhash_identical_docs_equal_fingerprints(planted):
    out = {r.doc_id: r.simhash for r in simhash(planted, "doc_id", "text").collect()}
    assert out[0] == out[1000]  # exact copy
    assert out[0] == out[1001]  # simhash is bag-of-words: order-blind
    # near-dup differs in few bits; unrelated family differs in many
    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    assert hamming(out[0], out[1]) <= 6
    assert hamming(out[0], out[110]) > hamming(out[0], out[1])


def test_dedup_components_chain_and_isolated_pair(spark):
    from efiche_data_pipeline_spark.operators.dedup import dedup_components

    # Chain 1-2-3-4 (1~2, 2~3, 3~4 but 1 NOT directly ~ 4) plus an
    # isolated pair 10-11: transitive closure must pull the whole chain
    # into component 1 without merging the 10-11 pair into it.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        (r["node"], r["component"]) for r in dedup_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_dedup_components_direction_independent(spark):
    from efiche_data_pipeline_spark.operators.dedup import dedup_components

    # Min label must propagate AGAINST edge direction too: (5,1) with
    # doc_a > doc_b handed in reversed order.
    pairs = spark.createDataFrame([(5, 1), (5, 9)], "doc_a long, doc_b long")
    got = {
        (r["node"], r["component"]) for r in dedup_components(pairs).collect()
    }
    assert got == {(1, 1), (5, 1), (9, 1)}


# ---------------------------------------------------------------------------
# Unicode canonicalization front-end (q111/q112).
# ---------------------------------------------------------------------------
def test_canonicalization_collapses_planted_confusables(spark):
    """Case / punctuation / whitespace / NFC-vs-decomposed variants of
    one document canonicalize identically — and a genuinely different
    document does not."""
    from efiche_data_pipeline_spark.functions.text import canonical_text
    from efiche_data_pipeline_spark.operators.dedup import nfc_normalize_docs

    docs = spark.createDataFrame(
        [
            (0, "Café visits, rose 10%!"),  # NFC e-acute
            (1, "café   visits rose 10"),  # decomposed e + U+0301
            (2, "CAFÉ VISITS;ROSE\t10"),  # decomposed + case + punct
            (3, "cafe visits rose 10"),  # ascii-folded: DIFFERENT doc
        ],
        "doc_id long, text string",
    )
    out = nfc_normalize_docs(docs).select(
        "doc_id", canonical_text("text").alias("c")
    )
    got = {r["doc_id"]: r["c"] for r in out.collect()}
    assert got[0] == got[1] == got[2] == "café visits rose 10"
    assert got[3] == "cafe visits rose 10" != got[0]


def test_canonical_exact_dedup_merges_variant_groups(spark):
    """exact_dedup over the canonical form groups the confusables the
    raw-text form misses."""
    from efiche_data_pipeline_spark.functions.text import canonical_text
    from efiche_data_pipeline_spark.operators.dedup import (
        exact_dedup,
        nfc_normalize_docs,
    )

    docs = spark.createDataFrame(
        [
            (0, "Hello,   World!"),
            (1, "hello world"),
            (2, "HELLO\tWORLD"),
            (3, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    raw = exact_dedup(docs, "doc_id", "text")
    assert raw.count() == 4  # raw text sees four distinct docs
    canon = nfc_normalize_docs(docs).withColumn(
        "text", canonical_text("text")
    )
    out = {
        r["keeper_doc_id"]: r["n_copies"]
        for r in exact_dedup(canon, "doc_id", "text").collect()
    }
    assert out == {0: 3, 3: 1}


# ---------------------------------------------------------------------------
# duplicated_span_report (q144): exact span boundaries on planted text
# ---------------------------------------------------------------------------
def test_duplicated_spans_planted(spark):
    from efiche_data_pipeline_spark.operators.dedup import duplicated_span_report

    sh1 = "s1 s2 s3 s4 s5 s6 s7 s8"  # 8 tokens -> one merged span of 8
    sh2 = "t1 t2 t3 t4 t5 t6"  # exactly k=6 -> single-gram span of 6
    docs = spark.createDataFrame(
        [
            (0, "u01 u02 u03 u04 u05 " + sh1 + " v01 v02 v03 v04 v05 "
             + sh2 + " w01 w02 w03"),
            (1, "x01 x02 x03 x04 " + sh1 + " y01 y02 y03 y04 y05 y06"),
            (2, "z01 z02 z03 z04 z05 z06 z07 " + sh2 + " q01 q02 q03 q04"),
            (3, " ".join("solo%02d" % i for i in range(12))),  # no dup grams
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in duplicated_span_report(docs, k=6, min_docs=2).collect()
    }
    assert set(rows) == {0, 1, 2}
    assert (rows[0]["n_tokens"], rows[0]["n_dup_spans"], rows[0]["dup_tokens"]) \
        == (27, 2, 14)
    assert rows[0]["dup_frac"] == round(14 / 27, 4)
    assert (rows[1]["n_tokens"], rows[1]["n_dup_spans"], rows[1]["dup_tokens"]) \
        == (18, 1, 8)
    assert (rows[2]["n_tokens"], rows[2]["n_dup_spans"], rows[2]["dup_tokens"]) \
        == (17, 1, 6)


def test_containment_catches_lifted_passage_jaccard_misses(spark):
    """The asymmetry containment exists for: a small document lifted
    verbatim into a much larger one has near-1 containment on the
    small side while Jaccard stays low (the union is huge)."""
    from efiche_data_pipeline_spark.operators.dedup import containment_pairs

    small = " ".join(f"core{i:02d}" for i in range(12))  # 10 tri-shingles
    big = (
        " ".join(f"pad{i:03d}" for i in range(60))
        + " " + small + " "
        + " ".join(f"tail{i:03d}" for i in range(60))
    )
    docs = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id long, text string"
    )
    got = containment_pairs(docs, "doc_id", "text", n=3, max_freq=20).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    # all 10 of the small doc's shingles appear in the big doc
    assert r["n_shared"] == 10 and r["containment_a"] == 1.0
    assert r["max_containment"] == 1.0
    # while the symmetric measures stay small: the big doc's 132
    # tokens give 130 tri-shingles, so containment_b = 10/130
    assert r["containment_b"] == round(10 / 130, 4)


def test_simhash_hamming_pairs_planted(spark):
    from efiche_data_pipeline_spark.operators.dedup import (
        simhash,
        simhash_hamming_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog near the old "
        "stone bridge while evening light settles on the harbor"
    )
    rows = [
        (1, base),
        (2, base + " tonight"),  # near-identical: few bit flips
        (3, "completely different content about distributed shuffle "
            "exchanges and columnar parquet readers in query engines"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_hamming_pairs(
            docs, "doc_id", "text", bits=48, bands=8, max_hamming=3
        ).collect()
    }
    # the near-identical pair is found with the EXACT fingerprint
    # distance; the unrelated doc pairs with nobody
    fps = {
        r["doc_id"]: r["simhash"]
        for r in simhash(docs, "doc_id", "text", bits=48).collect()
    }
    want = bin(fps[1] ^ fps[2]).count("1")
    assert got == {(1, 2): want} and want <= 3

    # pigeonhole guard: tolerating >= bands bit flips loses pairs
    import pytest

    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_hamming_pairs(docs, "doc_id", "text", bands=4, max_hamming=4)
