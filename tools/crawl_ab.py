"""crawl_e2e A/B across git revisions — drift-resistant protocol.

This VM's absolute throughput drifts 2-5x between sessions, so cross-round
wall-time comparisons are only honest back-to-back: check out the old
revision into a git worktree and ALTERNATE runs old/new within the same
minutes, fresh JVM per run, then compare MEDIANS (round-3 verdict item 10
asks for >=5 runs per tree).

Usage: python tools/crawl_ab.py --old <rev> [--runs 5] [--pages 2000]
Writes tools/crawl_ab_result.json.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SNIPPET = """
import json, time, tempfile, shutil
from webcrawler_spark.session import get_spark
from webcrawler_spark import fixtures
from webcrawler_spark.plans.crawl import CrawlConfig, run_crawl
tmp = tempfile.mkdtemp()
paths = fixtures.write_parquet(tmp + "/web", n_pages={pages}, seed=42)
spark = get_spark("crawl-ab")
t0 = time.time()
res = run_crawl(spark, spark.read.parquet(paths["pages"]),
                spark.read.parquet(paths["seeds"]),
                CrawlConfig(whitelist=fixtures.WHITELIST, max_depth=3,
                            max_rounds=8),
                checkpoint_dir=tmp + "/ckpt")
wall = time.time() - t0
fetched = sum(m.get("fetched", 0) for m in res.metrics)
spark.stop()
shutil.rmtree(tmp, ignore_errors=True)
print("RESULT " + json.dumps(dict(wall_s=round(wall, 3), fetched=fetched)))
"""


def run_cell(tree: Path, pages: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", SNIPPET.format(pages=pages)],
        capture_output=True, text=True, cwd=str(tree), timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"cell failed in {tree}:\n{p.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--pages", type=int, default=2000)
    args = ap.parse_args()

    wt = Path("/tmp/crawl_ab_old")
    subprocess.run(["git", "worktree", "remove", "--force", str(wt)],
                   cwd=REPO, capture_output=True)
    subprocess.run(
        ["git", "worktree", "add", "--force", str(wt), args.old],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        walls: dict[str, list[float]] = {"old": [], "new": []}
        fetched: dict[str, set] = {"old": set(), "new": set()}
        for i in range(args.runs):
            for tag, tree in (("old", wt), ("new", REPO)):
                out = run_cell(tree, args.pages)
                walls[tag].append(out["wall_s"])
                fetched[tag].add(out["fetched"])
                print(f"run {i} {tag} ({args.old if tag=='old' else 'HEAD'}): "
                      f"{out['wall_s']}s fetched={out['fetched']}", flush=True)
        summary = {
            "old_rev": args.old,
            "pages": args.pages,
            "runs": args.runs,
            "walls": walls,
            "fetched": {k: sorted(v) for k, v in fetched.items()},
            "median_old": round(statistics.median(walls["old"]), 2),
            "median_new": round(statistics.median(walls["new"]), 2),
        }
        summary["new_over_old"] = round(
            summary["median_new"] / summary["median_old"], 3
        )
        print(json.dumps(summary, indent=2))
        (REPO / "tools" / "crawl_ab_result.json").write_text(
            json.dumps(summary, indent=2)
        )
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", str(wt)],
                       cwd=REPO, capture_output=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
