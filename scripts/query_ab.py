"""Interleaved quiet-window A/B timing for individual driver queries
(VERDICT r3 task 3: settle whether the BENCH_r03 mis/ktruss regressions
are real or ambient-bandwidth noise).

Usage: python scripts/query_ab.py <sf_dir> <reps> <query> [query ...]

Runs the named queries() entries round-robin <reps> times each on
local[32], printing one JSON line per run with wall seconds and the
1-minute loadavg before/after — the same evidence format as
scripts/scaling_pair.py.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from graphscope_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="query_ab", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # warm the JVM/session once with the cheapest target
    qs[names[0]](spark, sf_dir).count()
    for r in range(reps):
        for name in names:
            la0 = os.getloadavg()[0]
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            wall = time.time() - t0
            print(
                json.dumps(
                    {
                        "query": name,
                        "rep": r,
                        "sec": round(wall, 2),
                        "rows": n,
                        "load_before": round(la0, 1),
                        "load_after": round(os.getloadavg()[0], 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
