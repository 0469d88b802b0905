"""Dump .explain("formatted") for registered queries (guide §7.2).

Usage: python tools/dump_plan.py q26_jaccard_pairs [q28_...] [--sf-dir ...]
       [--out plans/r13/suffix]   # writes <out>/<query>_<suffix>.txt
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None, help="dir/suffix, e.g. plans/r13:before")
    args = ap.parse_args()

    from efiche_data_pipeline_spark.plans.registry import QUERIES
    from efiche_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="efiche-plan")
    for name in args.queries:
        df = QUERIES[name](spark, args.sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        if args.out:
            d, suffix = args.out.split(":", 1)
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({txt.count('Exchange')} Exchange refs)")
        else:
            print(f"==== {name} ====")
            print(txt)
    spark.stop()


if __name__ == "__main__":
    main()
