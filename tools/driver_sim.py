"""Simulate the verify driver: run ``__spark_entry__.queries()`` in
registration order (optionally only the first N / a name subset),
compare each against ``oracle_sql()`` via DuckDB with driver-style
normalization, and print one status line per query.

Usage:
    python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01]
        [--limit 50] [--only q36,q54] [--json out.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

# `python tools/driver_sim.py` puts tools/ (not the repo root) on
# sys.path, so the `import __spark_entry__` below would fail without
# PYTHONPATH=. — make the script location-independent instead.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    # No float_format: the real driver's hash is type-sensitive
    # (int64 123 vs float64 123.0 must NOT collide — the r03 q64 RED
    # was masked locally by a "%.6g" here).
    body = pdf.to_csv(index=False)
    return hashlib.sha256(body.encode()).hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument("--only", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    # Deliberately VANILLA (like the external verify driver): default
    # shuffle partitions, default session timezone, none of
    # session.get_spark's configs — so config dependencies surface here.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    queries = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{args.sf_dir}/{name}.parquet'"
        )

    if args.only:
        # --only searches ALL registered names (not the --limit prefix):
        # targeting a query past position 50 must run it, not silently
        # match nothing and exit 0.
        only = set(args.only.split(","))
        names = [n for n in queries if any(n.startswith(o) for o in only)]
        if not names:
            raise SystemExit(f"--only matched no registered query: {args.only}")
    else:
        names = list(queries)[: args.limit]
        # The driver's smoke check: entry(spark) must run on the
        # sf0.001 fixtures and yield rows under a vanilla session.
        smoke = entry.entry(spark).collect()
        print(f"entry  smoke: {len(smoke)} rows")
        assert len(smoke) > 0, "entry() returned no rows"

    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        row: dict = {}
        try:
            spdf = queries[name](spark, args.sf_dir).toPandas()
            if name in oracles:
                opdf = con.execute(oracles[name]).fetchdf()
                row = {
                    "rows_match": len(spdf) == len(opdf),
                    "schema_match": sorted(spdf.columns) == sorted(opdf.columns),
                    "hash_match": value_hash(spdf) == value_hash(opdf),
                    "spark_rows": len(spdf),
                    "oracle_rows": len(opdf),
                    "err": None,
                }
            else:
                row = {"spark_rows": len(spdf), "err": "no_oracle"}
        except Exception as exc:  # noqa: BLE001 - report, keep going
            row = {"err": f"{type(exc).__name__}: {exc}"[:300]}
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        ok = row.get("hash_match")
        status = "PASS" if ok else ("weak" if row.get("err") == "no_oracle" else "FAIL")
        print(f"{status:5s} {name:35s} {row['sec']:7.2f}s {row.get('err') or ''}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    n_fail = sum(
        1
        for r in results.values()
        if r.get("err") not in (None, "no_oracle") or r.get("hash_match") is False
    )
    print(f"\n{len(results)} run, {n_fail} failing")
    raise SystemExit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
