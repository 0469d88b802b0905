"""SCD2 merge + CDC compaction unit tests on planted scenarios
(pipeline/scd.py). The q62/q63 oracle-parity checks cover the
fixture-scale differential; these pin the per-row semantics: version
closing, no-op updates, new-key inserts, delete-wins compaction, and
replay idempotency."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.pipeline.scd import (
    cdc_compact,
    scd2_apply,
    scd2_as_of,
    scd2_init,
)

ATTRS = ["segment", "nation"]


def _dim(spark):
    snap = spark.createDataFrame(
        [(1, "A", 10), (2, "B", 20), (3, "C", 30)],
        "id long, segment string, nation int",
    )
    return scd2_init(snap, "id", ATTRS, "2020-01-01")


def test_scd2_apply_closes_and_inserts(spark):
    dim = _dim(spark)
    updates = spark.createDataFrame(
        # id 1: changed attr; id 2: no-op (identical); id 4: brand new
        [(1, "A2", 10), (2, "B", 20), (4, "D", 40)],
        "id long, segment string, nation int",
    )
    out = scd2_apply(dim, updates, "id", ATTRS, "2021-06-01")
    rows = {(r.id, r.valid_from, r.valid_to, r.is_current): r for r in out.collect()}

    # id 1: closed v1 + open v2
    closed = rows[(1, date(2020, 1, 1), date(2021, 6, 1), False)]
    assert closed.segment == "A"
    opened = rows[(1, date(2021, 6, 1), None, True)]
    assert opened.segment == "A2"
    # id 2 (no-op) and id 3 (absent from batch): single untouched version
    assert rows[(2, date(2020, 1, 1), None, True)].segment == "B"
    assert rows[(3, date(2020, 1, 1), None, True)].segment == "C"
    # id 4: fresh insert
    assert rows[(4, date(2021, 6, 1), None, True)].segment == "D"
    # 5 versions total: id 1 closed + id 1 reopened, id 2, id 3, id 4.
    assert len(rows) == 5


def test_scd2_apply_is_idempotent_on_replay(spark):
    dim = _dim(spark)
    updates = spark.createDataFrame(
        [(1, "A2", 10), (4, "D", 40)], "id long, segment string, nation int"
    )
    once = scd2_apply(dim, updates, "id", ATTRS, "2021-06-01")
    twice = scd2_apply(once, updates, "id", ATTRS, "2021-06-01")
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_scd2_null_attr_change_detected(spark):
    # NULL -> "" must register as a change (null-safe hash), and
    # NULL -> NULL as a no-op.
    dim = scd2_init(
        spark.createDataFrame(
            [(1, None, 10), (2, None, 20)], "id long, segment string, nation int"
        ),
        "id",
        ATTRS,
        "2020-01-01",
    )
    updates = spark.createDataFrame(
        [(1, "", 10), (2, None, 20)], "id long, segment string, nation int"
    )
    out = scd2_apply(dim, updates, "id", ATTRS, "2021-01-01")
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r.id, []).append(r)
    assert len(by_id[1]) == 2  # NULL -> "" closed + reopened
    assert len(by_id[2]) == 1  # NULL -> NULL untouched


def test_scd2_as_of_slices(spark):
    dim = scd2_apply(
        _dim(spark),
        spark.createDataFrame([(1, "A2", 10)], "id long, segment string, nation int"),
        "id",
        ATTRS,
        "2021-06-01",
    )
    before = {(r.id, r.segment) for r in scd2_as_of(dim, "2020-12-31").collect()}
    after = {(r.id, r.segment) for r in scd2_as_of(dim, "2021-06-01").collect()}
    assert ((1, "A") in before) and ((1, "A2") not in before)
    assert ((1, "A2") in after) and ((1, "A") not in after)
    # exactly one version per id in any slice
    assert len(before) == 3 and len(after) == 3


def test_cdc_compact_latest_wins_and_deletes_drop(spark):
    log = spark.createDataFrame(
        [
            # user 1: U then U -> latest U survives
            (1, 101, 1, "a", "U"),
            (1, 102, 2, "b", "U"),
            # user 2: U then D -> dropped entirely
            (2, 201, 1, "c", "U"),
            (2, 202, 2, "d", "D"),
            # user 3: D then U (re-insert after delete) -> survives
            (3, 301, 1, "e", "D"),
            (3, 302, 2, "f", "U"),
            # user 4: same seq ties broken by id
            (4, 401, 5, "g", "U"),
            (4, 402, 5, "h", "U"),
        ],
        "user_id long, event_id long, seq int, payload string, op string",
    )
    out = cdc_compact(log, keys=["user_id"], seq_cols=["seq", "event_id"])
    got = {r.user_id: (r.event_id, r.payload) for r in out.collect()}
    assert got == {1: (102, "b"), 3: (302, "f"), 4: (402, "h")}
    assert "op" not in out.columns and "_rn" not in out.columns


def test_cdc_compact_partition_independent(spark):
    log = spark.createDataFrame(
        [(u, u * 10 + s, s, f"p{u}{s}", "D" if (u + s) % 3 == 0 else "U")
         for u in range(1, 8) for s in range(1, 6)],
        "user_id long, event_id long, seq int, payload string, op string",
    )
    a = sorted(map(tuple, cdc_compact(log, ["user_id"], ["seq", "event_id"]).collect()))
    b = sorted(
        map(
            tuple,
            cdc_compact(log.repartition(13), ["user_id"], ["seq", "event_id"]).collect(),
        )
    )
    assert a == b


def test_snapshot_diff_classifies_and_roundtrips(spark):
    from efiche_data_pipeline_spark.pipeline.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
        "id long, segment string, nation int",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 updated, 3 NULL->"" (must be a change), 4 deleted,
        # 5 inserted
        [(1, "a", 10), (2, "b2", 20), (3, "", 30), (5, "e", 50)],
        "id long, segment string, nation int",
    )
    diff = snapshot_diff(old, new, "id", ["segment", "nation"])
    ops = {r.id: r.op for r in diff.collect()}
    assert ops == {2: "U", 3: "U", 4: "D", 5: "I"}  # id 1 absent

    # Applying the feed to `old` must reproduce `new` exactly.
    changed_keys = diff.filter(F.col("op").isin("U", "D")).select("id")
    applied = old.join(changed_keys, "id", "left_anti").unionByName(
        diff.filter(F.col("op").isin("I", "U")).drop("op")
    )
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_snapshot_diff_roundtrip_property(spark):
    """Property (randomized frames): for ANY old/new snapshots keyed by
    id, old + snapshot_diff(old, new) reproduces new exactly."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from efiche_data_pipeline_spark.pipeline.scd import snapshot_diff

    vals = st.one_of(st.none(), st.sampled_from(["", "x", "y"]))
    frame = st.dictionaries(
        st.integers(min_value=0, max_value=12), st.tuples(vals, vals), max_size=10
    )

    @given(old_d=frame, new_d=frame)
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(old_d, new_d):
        schema = "id long, a string, b string"
        old = spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in old_d.items()], schema
        )
        new = spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in new_d.items()], schema
        )
        diff = snapshot_diff(old, new, "id", ["a", "b"])
        changed = diff.filter(F.col("op").isin("U", "D")).select("id")
        applied = old.join(changed, "id", "left_anti").unionByName(
            diff.filter(F.col("op").isin("I", "U")).drop("op")
        )
        assert sorted(map(tuple, applied.collect())) == sorted(
            map(tuple, new.collect())
        )
        # unchanged keys never appear in the feed
        same = {
            k for k in old_d.keys() & new_d.keys() if old_d[k] == new_d[k]
        }
        assert not same & {r.id for r in diff.collect()}

    check()
