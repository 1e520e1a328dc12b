"""A/B the in-round dedup winner encodings on the frontier workload.

Round-3 verdict item 2: the frontier half of the north metric has never
cleared 0.8 efficiency at 2->8 cores; the in-round dedup executes as
SortAggregate because the packed winner is a string. This runs
jobs/frontier_bench.py with winner=packed_string vs winner=numeric
(HashAggregate, see admission._dedup_in_round_numeric) at two core counts,
fresh JVM per cell, ALTERNATING trials so the VM's hour-scale throughput
drift cannot masquerade as a winner-encoding effect.

Usage: python tools/frontier_ab.py [--n 4000000] [--trials 2] [--cores 2,8]
Writes tools/frontier_ab_result.json and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SNIPPET = """
import json
from webcrawler_spark.session import get_spark
from jobs.frontier_bench import run_frontier_workload
spark = get_spark("frontier-ab")
run_frontier_workload(spark, 100_000, dedup_winner="{winner}")  # warm
out = run_frontier_workload(spark, {n}, dedup_winner="{winner}")
spark.stop()
print("RESULT " + json.dumps(out))
"""


def run_cell(winner: str, cores: int, n: int) -> dict:
    import os

    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    code = SNIPPET.format(winner=winner, n=n)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(REPO), env=env, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"cell failed ({winner}@{cores}):\n{p.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--cores", default="2,8")
    args = ap.parse_args()
    cores = [int(c) for c in args.cores.split(",")]

    results: dict[str, dict[int, list[float]]] = {
        w: {c: [] for c in cores} for w in ("packed_string", "numeric")
    }
    for t in range(args.trials):
        for c in cores:
            for w in ("packed_string", "numeric"):  # alternate within trial
                out = run_cell(w, c, args.n)
                results[w][c].append(out["urls_per_sec"])
                print(f"trial {t} {w}@{c}: {out['urls_per_sec']:.0f} urls/s "
                      f"({out['wall_s']}s, admitted={out['admitted']})",
                      flush=True)

    summary: dict = {"n": args.n, "trials": args.trials, "cells": {}}
    for w, per_core in results.items():
        best = {c: max(v) for c, v in per_core.items()}
        summary["cells"][w] = {
            "urls_per_sec": best,
            "all": per_core,
        }
        if len(cores) == 2:
            lo, hi = cores
            summary["cells"][w]["scaling_eff"] = round(
                best[hi] / best[lo] / (hi / lo), 3
            )
    print(json.dumps(summary, indent=2))
    (REPO / "tools" / "frontier_ab_result.json").write_text(
        json.dumps(summary, indent=2)
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
