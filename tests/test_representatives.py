"""Near-dup cluster representative selection (plans/corpus.py q129) —
the selection invariants beyond the oracle differential: exactly one
keeper per cluster, the keeper maximizes quality (ties to the smallest
id), singleton docs are their own kept cluster."""

from __future__ import annotations

from efiche_data_pipeline_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_representative_invariants(spark):
    rows = QUERIES["q129_neardup_representatives"](spark, SF_DIR).collect()
    assert len(rows) > 0
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r["component_id"], []).append(r)
    multi = [m for m in by_comp.values() if len(m) > 1]
    assert multi, "fixture must contain at least one non-trivial cluster"
    for members in by_comp.values():
        kept = [r for r in members if r["kept"] == 1]
        assert len(kept) == 1
        best = min(members, key=lambda r: (-r["quality_score"], r["doc_id"]))
        assert kept[0]["doc_id"] == best["doc_id"]
        assert all(r["rep_doc"] == best["doc_id"] for r in members)
    singletons = [m[0] for m in by_comp.values() if len(m) == 1]
    assert all(
        r["kept"] == 1 and r["component_id"] == r["doc_id"] for r in singletons
    )
