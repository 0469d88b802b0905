"""Audit-log and streaming-dedup tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.pipeline.store import Store
from efiche_data_pipeline_spark.streaming.incremental import deduped_event_stream


def test_store_audit_log(spark, tmp_path):
    store = Store(spark, str(tmp_path / "a"), audit=True)
    df = spark.range(5).select(F.col("id"))
    store.overwrite(df, "t1")
    store.append(df, "t1")
    store.append_new(df, "t1", key="id")  # appends 0 new rows but is a write
    log = store.read("audit_log").collect()
    ops = sorted((r.table_name, r.operation) for r in log)
    assert ops == [("t1", "append"), ("t1", "append"), ("t1", "overwrite")]
    assert all(len(r.audit_id) == 36 and r.changed_at is not None for r in log)


def test_merge_upsert_row_images(spark, tmp_path):
    """merge_upsert with audit on records one before/after image per
    affected key (reference: audit_log.old_values/new_values JSONB,
    sql/01_schema.sql:129-130): updated keys carry both images,
    inserted keys a NULL old image, untouched keys no row at all."""
    import json

    store = Store(spark, str(tmp_path / "ri"), audit=True)
    store.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), "t"
    )
    store.merge_upsert(
        spark.createDataFrame([(1, "a2"), (3, "c")], "id long, v string"),
        "t",
        keys=["id"],
    )
    imgs = {
        json.loads(r.row_key)["id"]: r
        for r in store.read("audit_row_images").collect()
    }
    assert set(imgs) == {1, 3}  # key 2 untouched -> unlogged
    assert json.loads(imgs[1].old_values)["v"] == "a"
    assert json.loads(imgs[1].new_values)["v"] == "a2"
    assert imgs[3].old_values is None
    assert json.loads(imgs[3].new_values)["v"] == "c"
    assert all(r.operation == "merge_upsert" for r in imgs.values())


def test_store_audit_disabled_by_default(spark, tmp_path):
    store = Store(spark, str(tmp_path / "b"))
    store.overwrite(spark.range(3), "t1")
    assert not store.exists("audit_log")


def test_deduped_event_stream(spark, tmp_path):
    """Duplicate event ids arriving across micro-batches within the
    watermark are emitted exactly once."""
    src = str(tmp_path / "src")
    base = "2024-03-01 10:{:02d}:00"
    rows1 = [(i, base.format(i)) for i in range(10)]
    rows2 = [(i, base.format(i)) for i in range(5, 15)]  # 5-9 duplicated
    for i, rows in enumerate((rows1, rows2)):
        spark.createDataFrame(rows, "event_id long, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = deduped_event_stream(stream, ["event_id"], watermark="1 hour")
    out: list = []

    def sink(batch, _):
        out.extend(r.event_id for r in batch.collect())

    q = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination()
    assert sorted(out) == list(range(15))  # each id exactly once
