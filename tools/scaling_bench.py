"""N → 4N cores scaling evidence (sandbox stand-in for N → 4N executors).

The north_rule requires pages-fetched/sec scaling efficiency >= 0.8 from N
to 4N executors; no real cluster exists here, so per driver instruction we
run the SAME jobs at two parallelism levels on the SAME deterministic
input and report throughput at both plus efficiency = (T_N / T_4N) / 4.

Transitions measured: local[2] -> local[8] (N=2, 4N=8) and
local[8] -> local[32]. The machine control (pure-Python multiprocessing
parse of the same pages, no Spark) shows this VM itself tops out at ~0.73
efficiency for 8->32 on allocation-heavy work, so the 2->8 transition is
the meaningful one; both are reported.

Workloads:
  * parse    — fetch-join + HTML-parse mega round (jobs/parse_bench.py):
               pages-fetched/sec, THE north metric (parse dominates real
               crawl cost);
  * frontier — admission+politeness round over synthetic URLs
               (jobs/frontier_bench.py): frontier-URLs-processed/sec;
  * crawl    — full batch-iterative crawl of the fixture web.

Each (workload, cores) cell runs in a fresh subprocess/JVM, best of
--trials runs. Results go to stdout and BENCH_SCALING.json.

Usage: python tools/scaling_bench.py [--parse-pages 150000]
       [--frontier-n 4000000] [--crawl-pages 4000] [--trials 2]
       [--cores 2,8,32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_PARSE_SNIPPET = """
import json
from webcrawler_spark.session import get_spark
from jobs.parse_bench import run_parse_workload
spark = get_spark("scaling-parse")
run_parse_workload(spark, 2000)  # warm
out = run_parse_workload(spark, {n})
spark.stop()
print("RESULT " + json.dumps(out))
"""

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
print("RESULT " + json.dumps(dict(wall_s=round(wall, 3), fetched=fetched,
                                  pages_per_sec=round(fetched / wall, 2))))
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
    ap.add_argument("--parse-pages", type=int, default=150_000)
    ap.add_argument("--frontier-n", type=int, default=4_000_000)
    ap.add_argument("--crawl-pages", type=int, default=4000)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--cores", default="2,8,32")
    args = ap.parse_args()
    cores_list = [int(c) for c in args.cores.split(",")]

    report: dict = {"config": vars(args), "workloads": {}}
    for name, snippet in (
        ("parse", _PARSE_SNIPPET.replace("{n}", str(args.parse_pages))),
        ("frontier", _FRONTIER_SNIPPET.replace("{n}", str(args.frontier_n))),
        ("crawl", _CRAWL_SNIPPET.replace("{n}", str(args.crawl_pages))),
    ):
        cells: dict = {}
        for cores in cores_list:
            cells[str(cores)] = run_cell(snippet, cores, args.trials)
            print(f"{name}@local[{cores}]: {cells[str(cores)]}", flush=True)
        for lo, hi in zip(cores_list, cores_list[1:]):
            t_lo, t_hi = cells[str(lo)]["wall_s"], cells[str(hi)]["wall_s"]
            factor = hi / lo
            eff = round((t_lo / t_hi) / factor, 3)
            cells[f"speedup_{lo}_to_{hi}"] = round(t_lo / t_hi, 3)
            cells[f"efficiency_{lo}_to_{hi}"] = eff
            print(f"{name}: {lo}->{hi} cores speedup {t_lo / t_hi:.2f}x, "
                  f"efficiency {eff}", flush=True)
        report["workloads"][name] = cells

    out_path = REPO / "BENCH_SCALING.json"
    history = []
    if out_path.exists():
        history = json.loads(out_path.read_text())
    history.append(report)
    out_path.write_text(json.dumps(history, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
