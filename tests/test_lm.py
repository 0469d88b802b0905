"""N-gram LM quality scoring (operators/lm.py) — the properties
beyond the q139/q140 oracle differentials:

- the trained model discriminates: an out-of-distribution document
  scores strictly higher cross-entropy than an in-distribution one,
  and OOV / bigram-hit counters are exact on planted data;
- maintained model (three folds) == one-shot global counts;
- replaying a committed batch is a no-op (single-commit design:
  the watermark travels inside the delta layer);
- fold result is invariant to the batch's partitioning;
- the scoring plan BROADCASTS all three model joins (no shuffle
  join keyed on the corpus).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.lm import (
    incremental_lm,
    lm_count_delta,
    lm_model_from_store,
    ngram_lm_score,
)
from efiche_data_pipeline_spark.pipeline.store import Store

_TRAIN = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the lazy dog sleeps while the quick fox runs"),
    (2, "a brown dog and a quick fox play in the sun"),
]
_IN_DIST = (10, "the quick brown fox sleeps in the sun")
_GIBBERISH = (11, "zxqv wvut plomb krzn zxqv fnord wvut plomb")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _model_rows(df):
    return sorted(tuple(r) for r in df.select("kind", "w1", "w2", "cnt").collect())


def test_score_discriminates_and_counters_exact(spark):
    train = _docs(spark, _TRAIN)
    model = lm_count_delta(train).localCheckpoint(eager=True)
    scored = ngram_lm_score(_docs(spark, [_IN_DIST, _GIBBERISH]), model)
    rows = {r["doc_id"]: r for r in scored.collect()}
    in_d, gib = rows[10], rows[11]
    assert gib["xent"] > in_d["xent"] + 1.0
    # planted gibberish: every one of its 8 tokens is OOV, no bigram hits
    assert gib["n_tokens"] == 8 and gib["n_oov"] == 8 and gib["n_hit_bigrams"] == 0
    # in-distribution doc: all tokens in vocab; "the quick", "in the",
    # "the sun" are trained bigrams
    assert in_d["n_oov"] == 0
    assert in_d["n_tokens"] == 8
    assert in_d["n_hit_bigrams"] >= 3


def test_three_folds_equal_one_shot(spark, tmp_path):
    docs = _docs(spark, _TRAIN + [_IN_DIST, _GIBBERISH])
    store = Store(spark, str(tmp_path / "lm"))
    for lo, hi in [(0, 0), (1, 2), (10, 11)]:
        r = incremental_lm(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)), store
        )
        assert r.n_new > 0
    maintained = lm_model_from_store(store)
    one_shot = lm_count_delta(docs)
    assert _model_rows(maintained) == _model_rows(one_shot)


def test_replay_is_noop(spark, tmp_path):
    docs = _docs(spark, _TRAIN)
    store = Store(spark, str(tmp_path / "lm"))
    b1 = docs.filter(F.col("doc_id") <= 1)
    assert incremental_lm(b1, store).n_new == 2
    layers_before = store.layer_count("lm_model")
    replay = incremental_lm(b1, store)
    assert replay.n_new == 0
    assert store.layer_count("lm_model") == layers_before
    assert _model_rows(lm_model_from_store(store)) == _model_rows(lm_count_delta(b1))


def test_fold_partition_invariance(spark, tmp_path):
    docs = _docs(spark, _TRAIN + [_IN_DIST])
    s1 = Store(spark, str(tmp_path / "a"))
    s2 = Store(spark, str(tmp_path / "b"))
    incremental_lm(docs, s1)
    incremental_lm(docs.repartition(7), s2)
    assert _model_rows(lm_model_from_store(s1)) == _model_rows(
        lm_model_from_store(s2)
    )


def test_empty_first_batch_returns_no_version(spark, tmp_path):
    store = Store(spark, str(tmp_path / "lm"))
    r = incremental_lm(_docs(spark, []), store)
    assert r.n_new == 0 and r.version is None


def test_dsir_prefers_target_like(spark):
    from efiche_data_pipeline_spark.operators.lm import dsir_select

    # pool: ids 0-2 define the target register (reference slice);
    # 10-13 written in it; 20-23 written in a different register that
    # dominates the SOURCE pool
    other = [
        (20 + i,
         " ".join("srv%d log%d" % ((i * 3 + j) % 5, (i + j) % 4) for j in range(10)))
        for i in range(4)
    ]
    docs = _docs(
        spark,
        _TRAIN
        + [(10 + i, _TRAIN[i % 3][1]) for i in range(4)]
        + other,
    )
    target = lm_count_delta(
        docs.filter(F.col("doc_id") <= 2)
    ).localCheckpoint(eager=True)
    source = lm_count_delta(docs).localCheckpoint(eager=True)
    top = dsir_select(docs, target, source, n_select=7)
    picked = {r["doc_id"] for r in top.collect()}
    assert {0, 1, 2, 10, 11, 12, 13} == picked
    # ranks are 1..7, log_weight decreasing in rank order
    rows = sorted(top.collect(), key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, 8))
    assert all(
        rows[i]["log_weight"] >= rows[i + 1]["log_weight"]
        for i in range(len(rows) - 1)
    )


def test_quality_drift_composition_alarms_on_register_shift(spark):
    """The q143 shape with a PLANTED shift: reference population in
    the training register, current population gibberish — the
    xent-bucket PSI must alarm; and with both populations identical
    it must stay calm."""
    from pyspark.sql import functions as F

    from efiche_data_pipeline_spark.operators.drift import psi_from_bucket_counts
    from efiche_data_pipeline_spark.operators.lm import ngram_lm_score

    model = lm_count_delta(_docs(spark, _TRAIN)).localCheckpoint(eager=True)
    in_dist = [(100 + i, _TRAIN[i % 3][1] + " the quick fox") for i in range(12)]
    gib = [(200 + i, " ".join("qq%dzz" % ((i * 7 + j) % 50) for j in range(10)))
           for i in range(12)]

    def psi_of(ref_rows, cur_rows):
        scored = ngram_lm_score(
            _docs(spark, ref_rows + cur_rows), model
        ).withColumn("is_ref", F.col("doc_id") < 200)
        pb = (
            scored.select(
                F.lit("lm_xent").alias("column_name"),
                F.floor(F.col("xent") * F.lit(4)).cast("int").alias("bucket"),
                "is_ref",
            )
            .groupBy("column_name", "bucket")
            .agg(
                F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("c_ref"),
                F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("c_cur"),
            )
        )
        return psi_from_bucket_counts(pb).first()["psi"]

    assert psi_of(in_dist, gib) > 0.25
    calm = [(200 + i, text) for i, (_, text) in enumerate(in_dist)]
    assert psi_of(in_dist, calm) < 0.1


def test_scoring_plan_broadcasts_model(spark):
    train = _docs(spark, _TRAIN)
    model = lm_count_delta(train).localCheckpoint(eager=True)
    scored = ngram_lm_score(_docs(spark, [_IN_DIST]), model)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_null_text_docs_emit_no_lag_rows(spark):
    """The in-row _lag_frame must reproduce the old posexplode
    semantics for NULL text — zero rows — independent of the
    sizeOfNull config (legacy size(NULL) = -1 would otherwise turn
    sequence(0, -2) into a descending junk triple that inflates
    lm_count_delta's unigram counts)."""
    clean = _docs(spark, _TRAIN)
    with_null = _docs(spark, _TRAIN + [(99, None)])
    legacy = spark.conf.get("spark.sql.legacy.sizeOfNull", "false")
    try:
        for flag in ("false", "true"):
            spark.conf.set("spark.sql.legacy.sizeOfNull", flag)
            assert _model_rows(lm_count_delta(with_null)) == _model_rows(
                lm_count_delta(clean)
            ), f"NULL-text doc changed LM counts under sizeOfNull={flag}"
    finally:
        spark.conf.set("spark.sql.legacy.sizeOfNull", legacy)
