"""Intake-time split-leakage monitor
(operators/dedup.py:incremental_split_leakage) — beyond the q132
oracle differential:

- two-fold maintenance ≡ the one-shot run (cross-BATCH leakage pairs
  are found when the later document arrives);
- replaying a committed batch appends nothing;
- a crash between the leakage commit and the index commit converges
  on replay (sink-first / watermark-last discipline);
- a planted near-dup pair straddling the split boundary is flagged,
  a same-split near-dup pair is not.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.functions.hashing import portable_hash60
from efiche_data_pipeline_spark.operators.dedup import (
    incremental_minhash_dedup,
    incremental_split_leakage,
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


def _splits(spark, n=400):
    """id -> q56 split label for 0..n-1."""
    rows = (
        spark.range(n)
        .select(
            "id",
            F.pmod(
                portable_hash60(F.col("id").cast("string")), F.lit(100)
            ).alias("b"),
        )
        .collect()
    )
    return {
        r["id"]: (
            "train" if r["b"] < 80 else "val" if r["b"] < 90 else "test"
        )
        for r in rows
    }


def _pick_ids(spark):
    """a < c < d all 'train'; b > d in a DIFFERENT split (monotone-id
    contract: the cross-split doc arrives last)."""
    sp = _splits(spark)
    train = [i for i, s in sp.items() if s == "train"]
    a, c, d = train[0], train[1], train[2]
    b = next(i for i, s in sp.items() if s != "train" and i > d)
    return a, c, d, b, sp


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cross_batch_cross_split_pair_flagged(spark, tmp_path):
    a, c, d, b, _ = _pick_ids(spark)
    docs = spark.createDataFrame(
        [
            (a, _BASE),  # near-dups with b (cross-split, cross-batch)
            (c, _OTHER),  # near-dups with d (same split)
            (d, _OTHER + " extra tail"),
            (b, _BASE + " tail"),
        ],
        "doc_id long, text string",
    )
    store = Store(spark, str(tmp_path / "s1"))
    incremental_split_leakage(
        docs.filter(F.col("doc_id") != b), store, threshold=_TAU
    )
    rep = incremental_split_leakage(
        docs.filter(F.col("doc_id") == b), store, threshold=_TAU
    )
    got = {(r["doc_a"], r["doc_b"]) for r in rep.collect()}
    assert (min(a, b), max(a, b)) in got  # cross-split pair flagged
    assert (min(c, d), max(c, d)) not in got  # same-split pair not
    # two-fold ≡ one-shot
    one = Store(spark, str(tmp_path / "one"))
    direct = incremental_split_leakage(docs, one, threshold=_TAU)
    assert _rows(rep) == _rows(direct)
    # replay no-op
    again = incremental_split_leakage(
        docs.filter(F.col("doc_id") == b), store, threshold=_TAU
    )
    assert _rows(again) == _rows(rep)


def test_crash_between_sink_and_index_converges(spark, tmp_path):
    a, _, _, b, sp = _pick_ids(spark)
    docs = spark.createDataFrame(
        [(a, _BASE), (b, _BASE + " tail")], "doc_id long, text string"
    )
    b1 = docs.filter(F.col("doc_id") == a)
    b2 = docs.filter(F.col("doc_id") == b)

    crashed = Store(spark, str(tmp_path / "crashed"))
    incremental_split_leakage(b1, crashed, threshold=_TAU)
    # simulate: batch 2's leakage rows commit (exactly what the
    # operator writes first, real split labels included) but the
    # index append — the watermark — is lost
    ded = incremental_minhash_dedup(b2, crashed, threshold=_TAU, commit=False)
    crossing = (
        ded.sim_pairs.select("doc_a", "doc_b")
        .withColumn("split_a", F.lit(sp[a]))
        .withColumn("split_b", F.lit(sp[b]))
        .withColumn("pair_key", F.concat_ws("_", "doc_a", "doc_b"))
        .dropDuplicates(["pair_key"])
        .localCheckpoint(eager=True)
    )
    crashed.append_new(crossing, "split_leakage", key="pair_key")
    # replay the whole batch through the operator
    replayed = incremental_split_leakage(b2, crashed, threshold=_TAU)

    clean = Store(spark, str(tmp_path / "clean"))
    incremental_split_leakage(b1, clean, threshold=_TAU)
    uninterrupted = incremental_split_leakage(b2, clean, threshold=_TAU)
    assert _rows(replayed) == _rows(uninterrupted)
    # the sink holds the pair exactly once
    assert crashed.read("split_leakage").count() == 1


def test_cluster_safe_split_has_zero_leakage(spark):
    """q136's guarantee: EVERY near-dup pair (the LSH relation q132
    monitors) lands whole in one split — zero boundary-crossing pairs
    by construction — while q56's doc-hash split leaks on the same
    fixture (which is exactly what q132 flags)."""
    from efiche_data_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from efiche_data_pipeline_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=16, bands=4,
        min_est_sim=0.5, portable=True,
    ).select("doc_a", "doc_b").collect()
    assert pairs, "fixture must contain near-dup pairs"
    safe = {
        r["doc_id"]: r["split"]
        for r in QUERIES["q136_cluster_safe_split"](spark, sf).collect()
    }
    naive = {
        r["doc_id"]: r["split"]
        for r in QUERIES["q56_train_val_test_split"](spark, sf).collect()
    }
    safe_leaks = [
        (p["doc_a"], p["doc_b"])
        for p in pairs
        if safe[p["doc_a"]] != safe[p["doc_b"]]
    ]
    naive_leaks = [
        (p["doc_a"], p["doc_b"])
        for p in pairs
        if naive[p["doc_a"]] != naive[p["doc_b"]]
    ]
    assert safe_leaks == []  # zero by construction
    assert naive_leaks  # the doc-hash split does leak here


def test_dataset_release_invariants(spark):
    """q137's three stage guarantees on the fixture release: nothing
    from the benchmark set or overlapping it, zero split leakage
    (released docs' near-dup partners are never in val/test), and no
    source over its token budget."""
    from efiche_data_pipeline_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    rel = QUERIES["q137_dataset_release"](spark, sf).toPandas()
    assert len(rel) > 0
    assert (rel["doc_id"] % 20 != 0).all()  # no benchmark docs
    contaminated = set(
        r["doc_id"]
        for r in QUERIES["q66_benchmark_decontamination"](spark, sf)
        .filter("contaminated")
        .collect()
    )
    assert not (set(rel["doc_id"]) & contaminated)
    per_source = rel.groupby("source")["cum_tokens"].max()
    assert (per_source <= 800).all()
    # split correctness (train-only, cluster-safe over the survivor
    # set) is proven by the oracle hash-match, which replays the same
    # labeling globally; here pin the output contract
    assert set(rel.columns) == {"doc_id", "source", "n_tokens", "cum_tokens"}
