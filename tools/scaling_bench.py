"""N → 4N cores scaling evidence (sandbox stand-in for N → 4N executors).

The north_rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors; no real cluster exists here, so per driver instruction we run
the SAME jobs at local[8] and local[32] on the SAME deterministic input
and report throughput at both plus efficiency = (T_8 / T_32) / 4.

Workloads:
  * frontier — admission+politeness round over N synthetic URLs
    (jobs/frontier_bench.py), the frontier-URLs-processed/sec metric;
  * crawl    — full batch-iterative crawl of the fixture web,
    the pages-fetched/sec metric.

Each (workload, cores) cell runs in a fresh subprocess/JVM, best of
--trials runs (the sandbox carries background load). Results are printed
and appended to BENCH_SCALING.json.

Usage: python tools/scaling_bench.py [--frontier-n 4000000]
       [--crawl-pages 1000] [--trials 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_FRONTIER_SNIPPET = """
import json
from webcrawler_spark.session import get_spark
from jobs.frontier_bench import run_frontier_workload
spark = get_spark("scaling-frontier")
run_frontier_workload(spark, 100_000)  # warm
out = run_frontier_workload(spark, {n})
spark.stop()
print("RESULT " + json.dumps(out))
"""

_CRAWL_SNIPPET = """
import json, time, tempfile, shutil
from webcrawler_spark.session import get_spark
from webcrawler_spark import fixtures
from webcrawler_spark.plans.crawl import CrawlConfig, run_crawl
tmp = tempfile.mkdtemp()
paths = fixtures.write_parquet(tmp + "/web", n_pages={n}, seed=42)
spark = get_spark("scaling-crawl")
t0 = time.time()
res = run_crawl(spark, spark.read.parquet(paths["pages"]),
                spark.read.parquet(paths["seeds"]),
                CrawlConfig(whitelist=fixtures.WHITELIST, max_depth=3, max_rounds=8),
                checkpoint_dir=tmp + "/ckpt")
wall = time.time() - t0
fetched = sum(m.get("fetched", 0) for m in res.metrics)
spark.stop()
shutil.rmtree(tmp, ignore_errors=True)
print("RESULT " + json.dumps({"wall_s": round(wall, 3), "fetched": fetched,
                              "pages_per_sec": round(fetched / wall, 2)}))
"""


def run_cell(snippet: str, cores: int, trials: int) -> dict:
    best = None
    for _ in range(trials):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        proc = subprocess.run(
            [sys.executable, "-c", snippet], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            raise RuntimeError(f"no RESULT (cores={cores}): {proc.stderr[-2000:]}")
        out = json.loads(line[-1][len("RESULT "):])
        if best is None or out["wall_s"] < best["wall_s"]:
            best = out
    best["cores"] = cores
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frontier-n", type=int, default=4_000_000)
    ap.add_argument("--crawl-pages", type=int, default=1000)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    report: dict = {"config": vars(args), "workloads": {}}
    for name, snippet in (
        ("frontier", _FRONTIER_SNIPPET.replace("{n}", str(args.frontier_n))),
        ("crawl", _CRAWL_SNIPPET.replace("{n}", str(args.crawl_pages))),
    ):
        cells = {}
        for cores in (8, 32):
            cells[str(cores)] = run_cell(snippet, cores, args.trials)
            print(f"{name}@local[{cores}]: {cells[str(cores)]}")
        t8, t32 = cells["8"]["wall_s"], cells["32"]["wall_s"]
        eff = round((t8 / t32) / 4.0, 3)
        cells["speedup_8_to_32"] = round(t8 / t32, 3)
        cells["efficiency"] = eff
        report["workloads"][name] = cells
        print(f"{name}: speedup {t8 / t32:.2f}x, efficiency {eff}")

    out_path = REPO / "BENCH_SCALING.json"
    history = []
    if out_path.exists():
        history = json.loads(out_path.read_text())
    history.append(report)
    out_path.write_text(json.dumps(history, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
