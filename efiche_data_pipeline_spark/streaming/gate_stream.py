"""Streaming calibrated-gate intake: the live q170 — CCNet's quality
gate run where production runs it, on the stream. Arriving
reference-slice documents (``id % ref_mod == 0``) keep re-calibrating
the percentile threshold; every other arriving document is judged
ONCE, at intake, under the calibration then in force, each verdict
tagged with the model version that made it.

Per micro-batch, three commits, each independently replay-safe, in
this order:

1. **Calibration fold** (`calibrate_quality_gate`): the batch's
   reference docs run the pinned protocol — pre-commit monotone
   guard, ref sink FIRST (idempotent), atomic model delta, 1-row
   calibration snapshot LAST (a pure function of (model, ref sink),
   so replays recompute it bit-identically). Skipped when the batch
   carries no reference docs.
2. **Docs sink** (``append_new`` keyed): the intake record of
   everything seen — idempotent.
3. **Online gate** (`gate_pool_batch`): the batch's pool docs scored
   under the CURRENT calibration (model read at its pinned version)
   and the keepers appended id-keyed — idempotent, and because the
   calibration fold no-ops on replay, a crashed batch re-judges under
   the SAME version and writes the SAME rows: exact convergence.

Contract: the first file(s) must carry reference documents — a pool
batch arriving before any calibration raises (a gate cannot judge
without a threshold), exactly like the family's monotone-id guards:
loud, with zero state committed.

The DERIVED report re-judges every pool document seen under the
FINAL calibration — equal to the one-shot q159 over everything seen
REGARDLESS of arrival order (the final calibration is a pure function
of the complete reference set; gating is a pure per-doc function),
which is what the tests pin. The online sink is the production
record: version-tagged verdicts made with what was known at arrival.

Reference analogue: none — beyond-reference production tier, same
family as streaming/lm_stream.py / vocab_stream.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.lm import (
    GateCalibration,
    calibrate_quality_gate,
    gate_pool_batch,
)
from ..pipeline.store import Store


@dataclass(frozen=True)
class GateStreamReport:
    n_batches: int
    n_ref_folded: int
    n_docs_seen: int
    n_kept_online: int
    calibration: GateCalibration | None
    # version-tagged verdicts made at intake (None before any pool doc)
    online_kept: DataFrame | None
    # q159-shaped re-judgment of every pool doc under the FINAL
    # calibration — equals the one-shot gate over everything seen
    report: DataFrame | None


def run_gate_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    store: Store,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_mod: int = 3,
    model_table: str = "gate_lm",
    ref_table: str = "gate_ref_docs",
    calib_table: str = "gate_calibration",
    scores_table: str = "gate_scores",
    docs_table: str = "gate_docs",
    max_files_per_trigger: int = 1,
) -> GateStreamReport:
    """availableNow consumption of parquet document files under
    ``source_dir``; the returned report reflects every file seen
    across all runs of this checkpoint."""
    totals = {"batches": 0, "ref": 0, "kept": 0}

    def fold(batch: DataFrame, batch_id: int) -> None:
        totals["batches"] += 1
        docs = batch.select(id_col, text_col).localCheckpoint(eager=True)
        ref = docs.filter(F.col(id_col) % ref_mod == 0)
        pool = docs.filter(F.col(id_col) % ref_mod != 0)
        has_ref = ref.limit(1).count() > 0
        # contract check BEFORE any commit: a pool doc cannot be
        # judged with no calibration in force and none arriving in
        # this batch — raise with zero state committed
        if (
            not has_ref
            and store.current_version(calib_table) is None
            and pool.limit(1).count() > 0
        ):
            raise ValueError(
                f"batch {batch_id}: no calibration committed and the "
                "batch carries no reference documents — feed a "
                "reference-bearing file first"
            )
        if has_ref:
            c = calibrate_quality_gate(
                store,
                ref,
                id_col=id_col,
                text_col=text_col,
                model_table=model_table,
                ref_table=ref_table,
                calib_table=calib_table,
            )
            totals["ref"] = c.n_ref
        store.append_new(docs, docs_table, id_col)
        if pool.limit(1).count() > 0:
            totals["kept"] += gate_pool_batch(
                pool,
                store,
                id_col=id_col,
                text_col=text_col,
                model_table=model_table,
                calib_table=calib_table,
                scores_table=scores_table,
            )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .foreachBatch(fold)
        .start()
    )
    q.awaitTermination()
    if not store.exists(docs_table):
        return GateStreamReport(totals["batches"], 0, 0, 0, None, None, None)
    # final re-calibration derives nothing new (no docs passed) but
    # returns the current state for the report
    calib = calibrate_quality_gate(
        store,
        None,
        id_col=id_col,
        text_col=text_col,
        model_table=model_table,
        ref_table=ref_table,
        calib_table=calib_table,
    )
    seen = store.read(docs_table)
    pool_seen = seen.filter(F.col(id_col) % ref_mod != 0)
    # re-judge everything under the FINAL calibration: a fresh sink
    # table keyed like the online one, derived via the same operator
    # (pure function of (docs, calibration)), no state mutated
    from ..operators.lm import lm_model_from_store, ngram_lm_score

    model = lm_model_from_store(store, model_table).localCheckpoint(eager=True)
    report = (
        ngram_lm_score(pool_seen, model, id_col, text_col)
        .filter(F.col("xent") <= F.lit(calib.threshold))
        .withColumn("threshold", F.lit(calib.threshold))
    )
    online = (
        store.read(scores_table) if store.exists(scores_table) else None
    )
    return GateStreamReport(
        n_batches=totals["batches"],
        n_ref_folded=totals["ref"],
        n_docs_seen=seen.count(),
        n_kept_online=totals["kept"],
        calibration=calib,
        online_kept=online,
        report=report,
    )
