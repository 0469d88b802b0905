"""Stream ≡ batch equivalence for the curation chain: the streamed
intake (N micro-batches, first-arrival dedup) must keep exactly the
same fingerprint SET (and hence count) as the batch q51 chain, whose
keep-min-doc_id tie-break only changes WHICH duplicate survives."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.plans.extensions import q51_curation_pipeline
from efiche_data_pipeline_spark.sources.catalog import load_table
from efiche_data_pipeline_spark.streaming.curation import (
    curated_stream,
    stream_documents,
)

from .conftest import SMOKE_SF_DIR


@pytest.fixture(scope="module")
def doc_files(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("docs_src"))
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    return src


def test_curation_stream_keeps_batch_fingerprint_set(spark, tmp_path, doc_files):
    rows: list = []
    stream = curated_stream(stream_documents(spark, doc_files))

    def sink(batch, batch_id):
        rows.extend(batch.collect())

    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination()

    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    batch = q51_curation_pipeline(spark, SMOKE_SF_DIR).join(
        docs.select("doc_id", F.md5("text").alias("fp")), "doc_id"
    )
    batch_rows = batch.collect()

    assert len(rows) == len(batch_rows) > 0
    assert {r.fp for r in rows} == {r.fp for r in batch_rows}
    # Per-fingerprint metrics are content-derived, so they agree even
    # when a different duplicate survived.
    stream_metrics = {r.fp: (r.n_tokens, r.quality_score) for r in rows}
    batch_metrics = {r.fp: (r.n_tokens, r.quality_score) for r in batch_rows}
    assert stream_metrics == batch_metrics
