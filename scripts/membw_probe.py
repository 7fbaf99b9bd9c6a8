"""Ambient memory-bandwidth probe for this shared host.

BENCH.md documents >2.5x same-code wall-time swings caused by co-tenant
bandwidth pressure that loadavg cannot see.  This probe makes the
regime measurable: a numpy triad run single-threaded and 8-way
concurrently.  On a healthy socket the 8-way AGGREGATE is several times
the 1-way figure; in the capped regime the aggregate EQUALS the 1-way
figure (~5-6 GB/s total observed), i.e. 32 Spark threads share one
thread's worth of bandwidth and parallel throughput numbers say nothing
about the engine.

Prints one JSON line: {"bw1": GB/s single, "bw8": GB/s aggregate,
"ratio": bw8/bw1, "capped": ratio < 2, "load": loadavg1}.
Every perf measurement taken this round records this line alongside.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np


def triad(_arg=None, n: int = 20_000_000, reps: int = 5) -> float:
    a = np.ones(n)
    b = np.ones(n)
    c = np.ones(n)
    t0 = time.time()
    for _ in range(reps):
        a = b + 1.5 * c
    return reps * 3 * n * 8 / (time.time() - t0) / 1e9


def probe() -> dict:
    bw1 = triad()
    with mp.Pool(8) as p:
        bw8 = sum(p.map(triad, range(8)))
    return {
        "bw1": round(bw1, 1),
        "bw8": round(bw8, 1),
        "ratio": round(bw8 / bw1, 2),
        "capped": bw8 / bw1 < 2.0,
        "load": round(os.getloadavg()[0], 1),
        "ts": round(time.time()),
    }


if __name__ == "__main__":
    print(json.dumps(probe()))
