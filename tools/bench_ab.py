"""Interleaved bench A/B runner (guide §1; the r12 discipline).

Runs `python bench.py` alternating between config arms passed as
NAME=SPARK_GRAFT_AB_CONF-value pairs, N rounds each, and reports the
per-entry MIN per arm plus the delta table.

Usage:
  python tools/bench_ab.py --rounds 2 \
      base= \
      pf='spark.sql.adaptive.coalescePartitions.parallelismFirst=false'
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(ab_conf: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_AB_CONF"] = ab_conf
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("arms", nargs="+", help="name=ab_conf_string")
    args = ap.parse_args()
    arms = [a.split("=", 1) for a in args.arms]
    best: dict[str, dict[str, float]] = {n: {} for n, _ in arms}
    for rnd in range(args.rounds):
        for name, conf in arms:
            r = run_bench(conf)
            for q, s in r["queries"].items():
                best[name][q] = min(best[name].get(q, 9e9), s)
            print(
                f"round {rnd} arm {name}: total={r['value']:.2f}s "
                f"load={r['env'].get('loadavg_start')}", flush=True,
            )
    base_name = arms[0][0]
    print(f"\n{'query':<36s}" + "".join(f"{n:>10s}" for n, _ in arms) + "   delta_vs_" + base_name)
    for q in sorted(best[base_name]):
        row = f"{q:<36s}"
        for n, _ in arms:
            row += f"{best[n].get(q, float('nan')):>10.3f}"
        d = best[arms[-1][0]].get(q, 0) - best[base_name][q]
        row += f"   {d:+.3f}"
        print(row)
    for n, _ in arms:
        print(f"TOTAL {n}: {sum(best[n].values()):.2f}s")


if __name__ == "__main__":
    main()
