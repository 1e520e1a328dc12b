"""Pin the dedup_simhash_pairs r3->r4 wall doubling (4.0s -> 8.3s on
byte-identical code) on VM drift vs a regression: N fresh-JVM runs of the
same query, alternating with a fixed-machine control (the same shuffle
micro-benchmark BASELINE.md uses), at sf0.1 on local[32].

Each run is a separate `python -c` subprocess (fresh JVM, fresh codegen
cache) so runs are independent samples of the session-level drift this VM
is documented to have (BASELINE.md; 2-5x between sessions).

Usage: python tools/simhash_drift_ab.py [n_runs] [sf_dir]
Writes tools/simhash_drift_result.json and prints a summary line.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

SNIPPET = r"""
import time, sys
sys.path.insert(0, "{repo}")
from webcrawler_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark("drift-ab")
qs = e.queries()
df = qs["dedup_simhash_pairs"](spark, "{sf}")
df.write.format("noop").mode("overwrite").save()  # warm (codegen/JIT), untimed — bench.py times best-of-2 the same way
t0 = time.time()
df.write.format("noop").mode("overwrite").save()
print("WALL", time.time() - t0)
spark.stop()
"""


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = str(Path(__file__).resolve().parent.parent)
    walls = []
    for i in range(n):
        out = subprocess.run(
            [sys.executable, "-c", SNIPPET.format(repo=repo, sf=sf)],
            capture_output=True, text=True, cwd=repo,
        )
        wall = None
        for line in out.stdout.splitlines():
            if line.startswith("WALL"):
                wall = float(line.split()[1])
        if wall is None:
            print(out.stdout[-2000:])
            print(out.stderr[-2000:])
            return 1
        walls.append(round(wall, 2))
        print(f"run {i}: {wall:.2f}s", flush=True)
    res = {
        "query": "dedup_simhash_pairs",
        "sf_dir": sf,
        "mode": "fresh-JVM per run, warm (2nd execution) timed",
        "runs": walls,
        "median_s": round(statistics.median(walls), 2),
        "min_s": min(walls),
        "max_s": max(walls),
        "spread": round(max(walls) / min(walls), 2),
    }
    Path(repo, "tools", "simhash_drift_result.json").write_text(
        json.dumps(res, indent=1)
    )
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
