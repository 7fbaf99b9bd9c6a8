#!/usr/bin/env python
"""Two-parallelism scaling evidence (north rule: N vs 4N, eff >= 0.8).

Runs scripts/pagerank_job.py at local[8] and local[32] on the SAME
pre-generated pages input, computes throughput scaling efficiency

    eff = (eps_32 / eps_8) / (32 / 8)

and writes scripts/scaling_results.json (picked up by bench.py) plus a
markdown table for BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(cores: int, pages: int, pages_path: str) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "pagerank_job.py"),
            "--cores",
            str(cores),
            "--pages",
            str(pages),
            "--pages-path",
            pages_path,
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    pages_path = f"/tmp/gs_bench_pages_{pages}"
    # generate once at 32 cores so both runs read identical input
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        subprocess.run(
            [sys.executable, os.path.join(HERE, "pagerank_job.py"),
             "--cores", "32", "--pages", str(pages)],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
    lo = run(8, pages, pages_path)
    hi = run(32, pages, pages_path)
    ratio = hi["edges_per_sec_per_superstep"] / lo["edges_per_sec_per_superstep"]
    eff = ratio / (32 / 8)
    result = {
        "pages": pages,
        "edges": hi["edges"],
        "local8": lo,
        "local32": hi,
        "throughput_ratio_32_over_8": round(ratio, 3),
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    with open(os.path.join(HERE, "scaling_results.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
