"""Per-action profiling harness (guide §1: measure first).

Monkeypatches the DataFrame action surface (collect / count / first /
toPandas / localCheckpoint) and the DataFrameWriter terminals
(parquet / save) to record wall time + the repo-side call site of every
Spark action fired while a query runs.  Output: one line per call site,
sorted by total seconds, so a multi-job operator (incremental folds,
warehouse build) shows exactly which internal action its time goes to.

Usage:
    python tools/profile_actions.py q121_forget_compliance [--sf-dir ...]
    python tools/profile_actions.py q174_fold              # bench-split entry
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import time
import traceback

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

RECORDS: list[tuple[str, str, float]] = []  # (action, site, sec)


def _site() -> str:
    """Innermost repo frame that is not this file."""
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if fn.startswith(_REPO_ROOT) and "profile_actions" not in fn and "/tests/" not in fn:
            rel = os.path.relpath(fn, _REPO_ROOT)
            return f"{rel}:{fr.lineno}"
    return "<external>"


def _wrap(cls, name: str, label: str | None = None):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            RECORDS.append((label or name, _site(), time.perf_counter() - t0))

    setattr(cls, name, timed)


def install() -> None:
    # Spark 4: sessions hand out pyspark.sql.classic.dataframe.DataFrame,
    # which OVERRIDES the base-class actions — patch the concrete class.
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    for m in ("collect", "count", "first", "toPandas", "localCheckpoint"):
        _wrap(DataFrame, m)
    for m in ("parquet", "save", "csv", "json"):
        _wrap(DataFrameWriter, m, f"write.{m}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    install()

    from efiche_data_pipeline_spark.plans.registry import QUERIES
    from efiche_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="efiche-profile")

    # Warm-up (uninstrumented timing noise absorbed; records cleared).
    t_warm = time.perf_counter()
    if args.query in ("q174_fold", "q174_query"):
        import bench

        state = bench._q174_build(spark, "/root/testdata/sf0.001")
        bench._q174_query(spark, state).collect()
        import shutil

        shutil.rmtree(state["tmp_root"], ignore_errors=True)
    elif args.query == "q36_wh_build":
        from efiche_data_pipeline_spark.plans.pipeline_queries import warehouse_store

        warehouse_store(spark, "/root/testdata/sf0.001")
    else:
        QUERIES[args.query](spark, "/root/testdata/sf0.001").collect()
    warm_sec = time.perf_counter() - t_warm
    RECORDS.clear()
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    if args.query in ("q174_fold", "q174_query"):
        import bench

        state = bench._q174_build(spark, args.sf_dir)
        fold_done = time.perf_counter()
        if args.query == "q174_query":
            RECORDS.clear()
            bench._q174_query(spark, state).collect()
        import shutil

        shutil.rmtree(state["tmp_root"], ignore_errors=True)
        total = (fold_done - t0) if args.query == "q174_fold" else (
            time.perf_counter() - fold_done
        )
    elif args.query == "q36_wh_build":
        from efiche_data_pipeline_spark.plans.pipeline_queries import warehouse_store

        warehouse_store(spark, args.sf_dir)
        total = time.perf_counter() - t0
    else:
        QUERIES[args.query](spark, args.sf_dir).collect()
        total = time.perf_counter() - t0

    agg: dict[tuple[str, str], list[float]] = collections.defaultdict(list)
    for action, site, sec in RECORDS:
        agg[(action, site)].append(sec)
    rows = sorted(agg.items(), key=lambda kv: -sum(kv[1]))
    print(f"# {args.query}  total={total:.2f}s  warm={warm_sec:.2f}s  "
          f"actions={len(RECORDS)}  attributed={sum(sum(v) for v in agg.values()):.2f}s")
    for (action, site), secs in rows[: args.top]:
        print(f"{sum(secs):8.2f}s  n={len(secs):<4d} {action:<18s} {site}")
    spark.stop()


if __name__ == "__main__":
    main()
