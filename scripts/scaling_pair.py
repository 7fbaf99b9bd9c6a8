#!/usr/bin/env python
"""One interleaved 2↔8-core scaling pair; appends to scaling_r3_pairs.jsonl.

Usage: python scripts/scaling_pair.py <pair_index> [vertices] [rounds] [lo] [hi]
Even pair_index runs lo-cores first, odd runs hi first (interleaving
cancels slow host drift).  Efficiency = (eps_hi / eps_lo) / (hi / lo).
Default lo=2 hi=8; on a neighbor-contended sandbox lo=1 hi=4 keeps both
levels inside the idle-core budget so the ratio measures the ENGINE.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import run  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    i = int(sys.argv[1])
    vertices = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    lo = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    hi = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    order = (lo, hi) if i % 2 == 0 else (hi, lo)
    res = {}
    loads = []
    for cores in order:
        loads.append(float(open("/proc/loadavg").read().split()[0]))
        r = run(cores, vertices, rounds)
        res[cores] = r
        print(
            f"pair{i} local[{cores}]: {r['edges_per_sec_per_superstep']:.0f} eps "
            f"(pagerank {r['pagerank_sec']}s, checksum {r['rank_checksum']})",
            flush=True,
        )
    eff = (
        res[hi]["edges_per_sec_per_superstep"]
        / res[lo]["edges_per_sec_per_superstep"]
    ) / (hi / lo)
    rec = {
        "pair": i,
        "vertices": vertices,
        "rounds": rounds,
        "lo": lo,
        "hi": hi,
        "eps_lo": res[lo]["edges_per_sec_per_superstep"],
        "eps_hi": res[hi]["edges_per_sec_per_superstep"],
        "sec_lo": res[lo]["pagerank_sec"],
        "sec_hi": res[hi]["pagerank_sec"],
        "checksum": res[lo]["rank_checksum"],
        "checksum_match": res[lo]["rank_checksum"] == res[hi]["rank_checksum"],
        "eff": round(eff, 3),
        "loadavg_before": loads,  # external host load (sandbox neighbors)
    }
    with open(os.path.join(HERE, "scaling_r3_pairs.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
