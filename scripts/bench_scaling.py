"""Two-parallelism scaling benchmark (north_rule: ≥0.8 efficiency N→4N).

Sandbox proxy per driver instruction: the same build job at local[8] and
local[32] on identical input (fresh JVM each, run sequentially), reporting
throughput at both plus efficiency = (thr32 / thr8) / 4.

Writes BENCH_SCALING.json at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "build_once.py"), str(cpus), sf],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "0.1"
    lo = run(8, sf)
    hi = run(32, sf)
    eff = (hi["files_per_sec"] / lo["files_per_sec"]) / 4.0
    result = {
        "corpus_sf": sf,
        "n_files": lo["n_files"],
        "local8": lo,
        "local32": hi,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
