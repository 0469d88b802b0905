"""Storage-management primitives: compaction, sorted (data-skipping)
writes, and schema-evolution appends — the table-maintenance surface a
long-lived 100 TB store needs beyond plain overwrite/append."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.pipeline.store import Store


@pytest.fixture()
def store(spark, tmp_path):
    return Store(spark, str(tmp_path))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_compact_reduces_files_preserves_content(spark, store):
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    # simulate small-file accumulation: many appends
    for lo in range(0, 10_000, 2_000):
        store.append(df.filter((F.col("id") >= lo) & (F.col("id") < lo + 2_000)), "t")
    before_files = sum(
        1 for f in os.listdir(store.path("t")) if f.endswith(".parquet")
    )
    before = _rows(store.read("t"))
    got = store.compact("t", target_files=2)
    assert got <= 2 < before_files
    assert _rows(store.read("t")) == before  # content unchanged as a multiset
    assert store.exists("t")  # _SUCCESS preserved by the swap


def test_overwrite_sorted_clusters_ranges(spark, store):
    df = spark.range(0, 5_000).withColumn(
        "k", F.pmod(F.xxhash64("id"), F.lit(5_000))
    )
    store.overwrite_sorted(df, "s", sort_by=["k"], partitions=8)
    assert _rows(store.read("s")) == _rows(df)
    # each file covers a narrow, non-overlapping k interval
    import pyarrow.parquet as pq

    spans = []
    for f in os.listdir(store.path("s")):
        if f.endswith(".parquet"):
            md = pq.ParquetFile(os.path.join(store.path("s"), f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            st = md.row_group(0).column(idx["k"]).statistics
            spans.append((st.min, st.max))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "sorted write produced overlapping file ranges"


def test_append_evolved_adds_column_nulls_for_old_rows(spark, store):
    v1 = spark.range(0, 10).withColumn("a", F.lit("x"))
    store.overwrite(v1, "e")
    v2 = spark.range(10, 20).withColumn("a", F.lit("y")).withColumn(
        "b", F.lit(1)
    )
    store.append_evolved(v2, "e")
    merged = store.read_merged("e")
    assert set(merged.columns) == {"id", "a", "b"}
    old = merged.filter(F.col("id") < 10)
    assert old.count() == 10
    assert old.filter(F.col("b").isNull()).count() == 10
    assert merged.filter(F.col("b") == 1).count() == 10


def test_append_evolved_rejects_dropped_columns(spark, store):
    store.overwrite(spark.range(0, 5).withColumn("a", F.lit("x")), "e2")
    with pytest.raises(ValueError, match="missing stored columns"):
        store.append_evolved(spark.range(5, 10), "e2")  # no column a
