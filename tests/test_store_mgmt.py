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


def test_zorder_write_gives_2d_selective_file_stats(spark, store):
    """The Z-order WRITE path: cluster a 64×64 grid by the q86 Morton
    key via overwrite_sorted, then read each parquet file's (x, y)
    min/max statistics. Z-ordered files must cover small 2-D tiles
    (BOTH dimensions selective), while the same data sorted by x alone
    leaves every file spanning the full y range — the reason a
    y-predicate prunes nothing on linear layouts. This is the
    data-skipping contract Delta/Iceberg's OPTIMIZE ZORDER BY sells,
    assembled here from q86's key + the store's range-clustered
    write."""
    import pyarrow.parquet as pq

    from efiche_data_pipeline_spark.plans.corpus import _morton16

    grid = spark.range(0, 64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )

    def spans(table):
        out = []
        for f in os.listdir(store.path(table)):
            if f.endswith(".parquet"):
                md = pq.ParquetFile(os.path.join(store.path(table), f)).metadata
                idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                xs = md.row_group(0).column(idx["x"]).statistics
                ys = md.row_group(0).column(idx["y"]).statistics
                out.append((xs.max - xs.min, ys.max - ys.min))
        return out

    store.overwrite_sorted(
        grid.withColumn("z", _morton16(F.col("x"), F.col("y"))),
        "zorder",
        sort_by=["z"],
        partitions=16,
    )
    store.overwrite_sorted(grid, "xsort", sort_by=["x", "y"], partitions=16)
    z_spans = spans("zorder")
    x_spans = spans("xsort")
    assert len(z_spans) >= 8
    # every z file is a bounded 2-D tile (≤ ~2 Morton 16×16 tiles)
    assert max(s[0] for s in z_spans) <= 40
    assert max(s[1] for s in z_spans) <= 40
    # linear sort: files are selective in x but span (almost) all of y
    assert max(s[1] for s in x_spans) >= 48


def test_compact_preserves_partition_layout(spark, store):
    """Compacting a hive-partitioned table (the IVF/SemDeDup cell
    store shape) must keep the col=value directory layout — and with
    it the readers' partition pruning — while merging the small files
    inside each partition. The naive whole-table coalesce silently
    flattened the layout."""
    import os

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, i % 4) for i in range(80)], "id long, cell_id int"
    ).repartition(8)
    store.append(df, "cells", partition_by=["cell_id"])
    store.append(df.withColumn("id", F.col("id") + 100), "cells",
                 partition_by=["cell_id"])
    root = store.path("cells")
    parts_before = sorted(d for d in os.listdir(root) if d.startswith("cell_id="))
    assert len(parts_before) == 4

    n_files = store.compact("cells", target_files=1)
    parts_after = sorted(d for d in os.listdir(root) if d.startswith("cell_id="))
    assert parts_after == parts_before  # layout preserved
    # one file per partition after compaction
    for d in parts_after:
        files = [
            f
            for f in os.listdir(os.path.join(root, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)
    assert n_files == 4
    got = store.read("cells")
    assert got.count() == 160
    # pruning still works: a literal filter reaches PartitionFilters
    pruned = got.filter(F.col("cell_id") == 2)
    pruned.collect()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cell_id" in plan or \
        "PartitionFilters: [cell_id" in plan, plan


def test_compact_partitioned_respects_target_files_cap(spark, store):
    """target_files on a PARTITIONED compact caps the per-partition
    file count (salted shuffle key): many small appended files fold to
    at most target_files per cell_id directory, content unchanged."""
    import os

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(90)], "id long, cell_id int"
    )
    for k in range(5):  # 5 appends x several files each
        store.append(
            df.filter(F.col("id") % 5 == k).repartition(4),
            "pc",
            partition_by=["cell_id"],
        )
    root = store.path("pc")

    def files_per_part():
        return {
            d: sum(
                1
                for f in os.listdir(os.path.join(root, d))
                if f.endswith(".parquet")
            )
            for d in os.listdir(root)
            if d.startswith("cell_id=")
        }

    assert max(files_per_part().values()) > 2
    store.compact("pc", target_files=2)
    per = files_per_part()
    assert set(per) == {"cell_id=0", "cell_id=1", "cell_id=2"}
    assert all(1 <= n <= 2 for n in per.values()), per
    assert store.read("pc").count() == 90
    assert {r["id"] for r in store.read("pc").collect()} == set(range(90))
