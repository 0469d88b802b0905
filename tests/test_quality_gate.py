"""Incremental calibrated quality gate (operators/lm.py:
calibrate_quality_gate + gate_pool_batch) — q170's family-discipline
properties beyond the oracle differential:

- maintained (two reference folds, then batch-by-batch pool gating)
  equals the one-shot q159 computation;
- calibration replays are no-ops and crash windows converge (sink
  FIRST, model delta SECOND, calibration snapshot LAST);
- out-of-order reference drops raise BEFORE any commit;
- version-tagged re-calibration: a later calibration changes only
  FUTURE pool batches, and the sink records which version judged
  each doc;
- gating an already-scored batch is a pure no-op (the sink is its
  own watermark).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.lm import (
    calibrate_quality_gate,
    gate_pool_batch,
    lm_count_delta,
    ngram_lm_score,
)
from efiche_data_pipeline_spark.operators.ranking import global_row_number
from efiche_data_pipeline_spark.pipeline.store import Store

# ids ending in 0 are the trusted reference slice (mod-10 split)
_REF = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (10, "the lazy dog sleeps while the quick fox runs"),
    (20, "a brown dog and a quick fox play in the sun"),
    (30, "the quick dog runs in the sun while the fox sleeps"),
    (40, "a lazy fox and the brown dog sleep in the sun"),
]
# pool docs that re-tread the reference register (exact re-uses of
# reference texts — their xent equals that reference doc's, so they
# sit at or below the p90 threshold) interleaved with gibberish that
# must be gated out; a tiny 5-doc reference leaves no room for
# "similar but distinct" passing docs, so copies are the planted form
_POOL = [
    (1, _REF[0][1]),
    (2, _REF[1][1]),
    (11, "zxqv wvut plomb krzn zxqv fnord wvut plomb"),
    (12, _REF[2][1]),
    (21, "qqzz verlx muntha korrig zzap beldo nixum"),
    (22, _REF[3][1]),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _one_shot(spark, pct_num=9, pct_den=10):
    """The q159 computation, inlined: final model over the whole
    reference slice, exact k-th order-statistic threshold, gate the
    pool."""
    ref = _docs(spark, _REF)
    model = lm_count_delta(ref, "doc_id", "text").localCheckpoint(eager=True)
    all_docs = _docs(spark, sorted(_REF + _POOL))
    scores = ngram_lm_score(all_docs, model, "doc_id", "text").localCheckpoint(
        eager=True
    )
    ref_ids = {i for i, _ in _REF}
    rs = scores.filter(F.col("doc_id").isin(sorted(ref_ids)))
    n = rs.count()
    k = (n * pct_num + pct_den - 1) // pct_den
    thr = (
        global_row_number(rs.select("doc_id", "xent"), ["xent", "doc_id"], out_col="rn")
        .filter(F.col("rn") == k)
        .first()["xent"]
    )
    kept = scores.filter(
        (~F.col("doc_id").isin(sorted(ref_ids))) & (F.col("xent") <= thr)
    )
    return thr, {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["xent"]) for r in kept.collect()
    }


def test_maintained_gate_equals_one_shot(spark, tmp_path):
    store = Store(spark, str(tmp_path / "gate"))
    ref = _docs(spark, _REF)
    pool = _docs(spark, _POOL)
    calibrate_quality_gate(store, ref.filter("doc_id <= 20"))
    c = calibrate_quality_gate(store, ref.filter("doc_id > 20"))
    n1 = gate_pool_batch(pool.filter("doc_id <= 11"), store)
    n2 = gate_pool_batch(pool.filter("doc_id > 11"), store)
    want_thr, want = _one_shot(spark)
    assert c.threshold == want_thr and c.n_ref == len(_REF)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["xent"])
        for r in store.read("gate_scores").collect()
    }
    assert got == want and n1 + n2 == len(want)
    # every row is tagged with the calibration that judged it
    tags = store.read("gate_scores").select("model_version", "threshold").distinct()
    assert tags.collect() == [
        tags.sparkSession.createDataFrame(
            [(c.model_version, c.threshold)], "model_version int, threshold double"
        ).first()
    ]
    # replaying a gated batch is a pure no-op
    assert gate_pool_batch(pool.filter("doc_id <= 11"), store) == 0
    # re-calibrating with no new docs recomputes the same row
    c2 = calibrate_quality_gate(store)
    assert c2 == c


def test_calibration_crash_windows_converge(spark, tmp_path, monkeypatch):
    """Crash after the ref-sink append but before the model delta,
    then a blind retry: the fold must complete exactly once (no
    double counts); crash before the calibration snapshot heals on
    the next calibrate call."""
    import efiche_data_pipeline_spark.operators.lm as lm_mod

    store = Store(spark, str(tmp_path / "gatecrash"))
    ref = _docs(spark, _REF)
    calibrate_quality_gate(store, ref.filter("doc_id <= 20"))

    real = lm_mod.incremental_lm

    def boom(*a, **k):
        raise RuntimeError("injected crash after the ref-sink append")

    monkeypatch.setattr(lm_mod, "incremental_lm", boom)
    with pytest.raises(RuntimeError, match="injected"):
        calibrate_quality_gate(store, ref.filter("doc_id > 20"))
    monkeypatch.setattr(lm_mod, "incremental_lm", real)
    # half-done: sink has all 5 refs, model still at fold-1 counts
    assert store.read("gate_ref_docs").count() == 5

    # blind retry converges to the full-model calibration
    c = calibrate_quality_gate(store, ref.filter("doc_id > 20"))
    want_thr, _ = _one_shot(spark)
    assert c.threshold == want_thr and c.n_ref == 5
    # the model folded the second batch exactly once: its unigram
    # totals equal the one-shot count over the whole slice
    from efiche_data_pipeline_spark.operators.lm import lm_model_from_store

    want_n = (
        lm_count_delta(ref, "doc_id", "text")
        .filter("kind = 'uni'")
        .agg(F.sum("cnt"))
        .first()[0]
    )
    got_n = (
        lm_model_from_store(store, "gate_lm")
        .filter("kind = 'uni'")
        .agg(F.sum("cnt"))
        .first()[0]
    )
    assert got_n == want_n


def test_out_of_order_reference_drop_commits_nothing(spark, tmp_path):
    store = Store(spark, str(tmp_path / "gateooo"))
    ref = _docs(spark, _REF)
    calibrate_quality_gate(store, ref.filter("doc_id >= 20"))
    v = store.current_version("gate_lm")
    with pytest.raises(ValueError, match="monotone"):
        calibrate_quality_gate(store, ref.filter("doc_id < 20"))
    assert store.current_version("gate_lm") == v
    assert store.read("gate_ref_docs").count() == 3


def test_recalibration_changes_only_future_batches(spark, tmp_path):
    """Version-tagged semantics: batch 1 gated under calibration v1,
    then more reference arrives and re-calibrates; batch 2 is judged
    under v2 while batch 1's verdicts stand unchanged."""
    store = Store(spark, str(tmp_path / "gatev"))
    ref = _docs(spark, _REF)
    pool = _docs(spark, _POOL)
    c1 = calibrate_quality_gate(store, ref.filter("doc_id <= 20"))
    gate_pool_batch(pool.filter("doc_id <= 12"), store)
    first = {
        r["doc_id"]: (r["xent"], r["model_version"], r["threshold"])
        for r in store.read("gate_scores").collect()
    }
    assert first and all(v[1] == c1.model_version for v in first.values())
    c2 = calibrate_quality_gate(store, ref.filter("doc_id > 20"))
    assert c2.model_version > c1.model_version
    gate_pool_batch(pool.filter("doc_id > 12"), store)
    after = {
        r["doc_id"]: (r["xent"], r["model_version"], r["threshold"])
        for r in store.read("gate_scores").collect()
    }
    # batch-1 rows byte-stable, batch-2 rows tagged with v2
    assert {k: after[k] for k in first} == first
    new_rows = {k: v for k, v in after.items() if k not in first}
    assert new_rows and all(v[1] == c2.model_version for v in new_rows.values())


def test_sampled_calibration_equals_exact_when_sample_covers(spark, tmp_path):
    """max_ref_sample >= the reference slice: the maintained bottom-k
    hash sample IS the slice, so the sampled path reproduces the exact
    calibration bit-for-bit (the maintained≡global equivalence of
    VERDICT r08 Next #7)."""
    store_e = Store(spark, str(tmp_path / "exact"))
    store_s = Store(spark, str(tmp_path / "sampled"))
    ref = _docs(spark, _REF)
    calibrate_quality_gate(store_e, ref.filter("doc_id <= 20"))
    ce = calibrate_quality_gate(store_e, ref.filter("doc_id > 20"))
    calibrate_quality_gate(
        store_s, ref.filter("doc_id <= 20"), max_ref_sample=100
    )
    cs = calibrate_quality_gate(
        store_s, ref.filter("doc_id > 20"), max_ref_sample=100
    )
    assert cs == ce
    # the sample table is committed and bounded
    assert store_s.read_version("gate_ref_sample").count() == len(_REF)


def test_sampled_calibration_bounds_rescore_state(spark, tmp_path):
    """With a small max_ref_sample the maintained sample stays at k
    rows regardless of how much reference history accumulates, equals
    the global bottom-k-by-id-hash draw (the q118 closure), and the
    threshold is the percentile of exactly that sample's xents."""
    from efiche_data_pipeline_spark.functions.hashing import portable_hash60

    store = Store(spark, str(tmp_path / "small"))
    ref = _docs(spark, _REF)
    calibrate_quality_gate(store, ref.filter("doc_id <= 20"), max_ref_sample=3)
    c = calibrate_quality_gate(store, ref.filter("doc_id > 20"), max_ref_sample=3)
    sample = store.read_version("gate_ref_sample")
    assert sample.count() == 3
    # maintained ≡ global draw: the 3 smallest id-hashes of the slice
    want_ids = [
        r["doc_id"]
        for r in _docs(spark, _REF)
        .withColumn("_h", portable_hash60(F.col("doc_id").cast("string")))
        .orderBy("_h", "doc_id")
        .limit(3)
        .collect()
    ]
    assert sorted(r["doc_id"] for r in sample.collect()) == sorted(want_ids)
    # threshold = ceil(0.9*3)=3rd smallest xent of the sampled docs
    # under the full maintained model
    from efiche_data_pipeline_spark.operators.lm import lm_model_from_store

    model = lm_model_from_store(store, "gate_lm")
    xents = sorted(
        r["xent"]
        for r in ngram_lm_score(
            _docs(spark, [t for t in _REF if t[0] in set(want_ids)]),
            model,
            "doc_id",
            "text",
        ).collect()
    )
    assert c.n_ref == 3 and c.threshold == xents[2]
    # replaying a committed batch leaves the sample untouched
    c2 = calibrate_quality_gate(store, max_ref_sample=3)
    assert c2 == c
    assert store.read_version("gate_ref_sample").count() == 3


def test_sampled_calibration_seeds_from_legacy_sink(spark, tmp_path):
    """Turning sampling ON for a store whose reference sink predates
    it must seed the sample from the FULL sink (one O(ref) pass), not
    just from batches folded after the switch — otherwise the sample
    would not be the global draw."""
    store = Store(spark, str(tmp_path / "legacy"))
    ref = _docs(spark, _REF)
    calibrate_quality_gate(store, ref.filter("doc_id <= 20"))  # exact era
    c = calibrate_quality_gate(
        store, ref.filter("doc_id > 20"), max_ref_sample=100
    )
    # the sample covers the WHOLE slice, pre-switch batches included
    assert store.read_version("gate_ref_sample").count() == len(_REF)
    ce = calibrate_quality_gate(store)  # exact recompute, same state
    assert c == ce


def test_forget_gate_documents_equals_survivor_training(spark, tmp_path):
    """GDPR for the gate family: after forgetting a reference doc and
    a pool doc, the maintained model equals training on the surviving
    references alone (negative-delta subtraction + the cnt>0 cancel
    filter), the re-committed calibration equals a from-scratch gate
    over the survivors, every sink stops naming the ids, surviving
    verdicts stand, and a blind retry is a no-op."""
    from efiche_data_pipeline_spark.operators.lm import (
        forget_gate_documents,
        lm_model_from_store,
    )

    store = Store(spark, str(tmp_path / "gforget"))
    ref = _docs(spark, _REF)
    pool = _docs(spark, _POOL)
    calibrate_quality_gate(store, ref.filter("doc_id <= 20"))
    calibrate_quality_gate(store, ref.filter("doc_id > 20"))
    gate_pool_batch(pool, store)
    kept_before = {
        r["doc_id"] for r in store.read("gate_scores").collect()
    }
    assert 1 in kept_before  # the pool id we will forget was kept

    c = forget_gate_documents(store, [10, 1])

    # model ≡ survivor-trained (fresh store, survivors only)
    twin = Store(spark, str(tmp_path / "gtwin"))
    ct = calibrate_quality_gate(twin, ref.filter("doc_id != 10"))
    got_model = sorted(
        tuple(r)
        for r in lm_model_from_store(store, "gate_lm").collect()
    )
    want_model = sorted(
        tuple(r)
        for r in lm_model_from_store(twin, "gate_lm").collect()
    )
    assert got_model == want_model
    assert (c.n_ref, c.k, c.threshold) == (ct.n_ref, ct.k, ct.threshold)
    # sinks purged; surviving verdicts stand verbatim
    assert store.read("gate_ref_docs").filter("doc_id = 10").count() == 0
    # (gate_docs is the STREAM's intake sink — absent here, and forget
    # skips missing tables by contract)
    assert store.read("gate_scores").filter("doc_id = 1").count() == 0
    assert {
        r["doc_id"] for r in store.read("gate_scores").collect()
    } == kept_before - {1}
    # blind retry converges (negative delta NOT applied twice)
    c2 = forget_gate_documents(store, [10, 1])
    assert (c2.n_ref, c2.k, c2.threshold) == (c.n_ref, c.k, c.threshold)
    assert sorted(
        tuple(r) for r in lm_model_from_store(store, "gate_lm").collect()
    ) == want_model


def test_forget_gate_documents_reseeds_sample(spark, tmp_path):
    """Sampled-mode forget: the bounded sample redraws as the global
    bottom-k over the SURVIVOR sink (a hole-punched sample would no
    longer be the closure draw), the configured cap survives via the
    sidecar even when the slice is smaller than k, and the re-committed
    calibration matches a from-scratch sampled gate over survivors."""
    from efiche_data_pipeline_spark.functions.hashing import portable_hash60
    from efiche_data_pipeline_spark.operators.lm import forget_gate_documents

    store = Store(spark, str(tmp_path / "sforget"))
    ref = _docs(spark, _REF)
    calibrate_quality_gate(store, ref, max_ref_sample=3)
    in_sample = {
        r["doc_id"] for r in store.read_version("gate_ref_sample").collect()
    }
    victim = sorted(in_sample)[0]
    c = forget_gate_documents(store, [victim])
    # redraw equals bottom-3-by-id-hash over the survivors
    want = {
        r["doc_id"]
        for r in ref.filter(F.col("doc_id") != victim)
        .withColumn("_h", portable_hash60(F.col("doc_id").cast("string")))
        .orderBy("_h", "doc_id")
        .limit(3)
        .collect()
    }
    got = {
        r["doc_id"] for r in store.read_version("gate_ref_sample").collect()
    }
    assert got == want and victim not in got
    assert store.read_layout_meta("gate_ref_sample")["sample_k"] == 3
    twin = Store(spark, str(tmp_path / "stwin"))
    ct = calibrate_quality_gate(
        twin, ref.filter(F.col("doc_id") != victim), max_ref_sample=3
    )
    assert (c.n_ref, c.k, c.threshold) == (ct.n_ref, ct.k, ct.threshold)


def test_forget_gate_documents_refuses_emptying_the_slice(spark, tmp_path):
    import pytest

    from efiche_data_pipeline_spark.operators.lm import forget_gate_documents

    store = Store(spark, str(tmp_path / "gempty"))
    calibrate_quality_gate(store, _docs(spark, _REF))
    v = store.current_version("gate_lm")
    with pytest.raises(ValueError, match="entire reference slice"):
        forget_gate_documents(store, [i for i, _ in _REF])
    # zero mutation: model version and sink untouched
    assert store.current_version("gate_lm") == v
    assert store.read("gate_ref_docs").count() == len(_REF)


def test_all_rejected_first_batch_keeps_downstream_behavior(spark, tmp_path):
    """An all-rejected FIRST pool batch appends an empty frame, which
    CREATES an empty scores sink where the pre-Observation code left
    no table at all (r12's one-job-fewer gate). Pin that the existence
    flip is harmless end-to-end: the empty sink still watermarks
    nothing, a later batch gates normally, and the final sink equals
    gating both batches in one call."""
    store = Store(spark, str(tmp_path / "g1"))
    calibrate_quality_gate(store, _docs(spark, _REF))
    gib_only = [r for r in _POOL if r[0] in (11, 21)]
    rest = [r for r in _POOL if r[0] not in (11, 21)]
    assert gate_pool_batch(_docs(spark, gib_only), store) == 0
    # downstream existence branch: an (empty) committed sink is fine —
    # readers see zero rows, not a missing table
    if store.exists("gate_scores"):
        assert store.read("gate_scores").count() == 0
    n2 = gate_pool_batch(_docs(spark, rest), store)
    assert n2 > 0
    # equivalence with one combined batch on a fresh store
    store2 = Store(spark, str(tmp_path / "g2"))
    calibrate_quality_gate(store2, _docs(spark, _REF))
    assert gate_pool_batch(_docs(spark, _POOL), store2) == n2
    a = sorted(tuple(r) for r in store.read("gate_scores").collect())
    b = sorted(tuple(r) for r in store2.read("gate_scores").collect())
    assert a == b
