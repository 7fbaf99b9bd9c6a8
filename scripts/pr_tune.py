"""Interleaved A/B of PageRank engine configs under ambient-bandwidth
gating (VERDICT r3 task 4).

Each rep: run fixed-round PageRank at the given size in a FRESH
subprocess with one named config variant, preceded by the membw probe
(scripts/membw_probe.py) so capped-regime reps are identifiable.
Variants interleave round-robin, cancelling slow host drift.

Usage: python scripts/pr_tune.py <vertices> <rounds> <cores> <reps> [variant ...]
Variants: base | nocompress | bigbatch | parts2x | parts4x | g1region
Prints one JSON line per rep; checksums must match across variants.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

VARIANTS = {
    "base": {},
    "nocompress": {"spark.sql.inMemoryColumnarStorage.compressed": "false"},
    "bigbatch": {"spark.sql.inMemoryColumnarStorage.batchSize": "100000"},
    "parts2x": {"_parts_mult": "2"},
    "parts4x": {"_parts_mult": "4"},
    "g1region": {"_java_opts": "-XX:G1HeapRegionSize=32m"},
    "noadj": {"_noadj": "1"},
    # round-5 serialization levers (VERDICT r4 task 8): shuffle codec
    # A/B now that narrow state types are ruled out by the r4
    # event-log experiment
    "zstd": {"spark.io.compression.codec": "zstd"},
    "snappy": {"spark.io.compression.codec": "snappy"},
    "shufflenocomp": {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    },
}

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
conf = json.loads(sys.argv[1])
vertices, rounds, cores = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
parts = max(cores, 8) * int(conf.pop("_parts_mult", "1"))
noadj = conf.pop("_noadj", None)
jo = conf.pop("_java_opts", None)
extra = dict(conf)
extra["spark.driver.memory"] = os.environ.get("SPARK_DRIVER_MEMORY", "80g")
if jo:
    extra["spark.driver.extraJavaOptions"] = jo
from graphscope_spark.session import get_spark
spark = get_spark(app_name="pr_tune", master=f"local[{cores}]",
                  shuffle_partitions=parts, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from graphscope_spark.algorithms import pagerank
from graphscope_spark.graph import Graph
from graphscope_spark.sources.synthetic import powerlaw_edges
from graphscope_spark.superstep import SuperstepRunner
g = Graph.from_edges(powerlaw_edges(spark, vertices, partitions=parts),
                     num_partitions=parts).cache()
n_edges = g.num_edges()
runner = SuperstepRunner(spark, "pagerank", resume=False)
t0 = time.time()
res = pagerank(g, tol=None, max_iter=rounds, runner=runner, sync_every=rounds,
               adjacency=not noadj)
chk = res.select(F.sum(F.col("vid") * F.col("rank")).alias("c")).collect()[0][0]
wall = time.time() - t0
loop = sum(m["seconds"] for m in runner.metrics)
print(json.dumps({"edges": n_edges, "wall": round(wall, 2),
                  "loop": round(loop, 2),
                  "eps_loop": round(n_edges * rounds / loop) if loop else None,
                  "checksum": round(chk, 4)}), flush=True)
"""


def main() -> None:
    vertices = int(sys.argv[1])
    rounds = int(sys.argv[2])
    cores = int(sys.argv[3])
    reps = int(sys.argv[4])
    names = sys.argv[5:] or ["base", "bigbatch"]
    sys.path.insert(0, HERE)
    from membw_probe import probe

    for r in range(reps):
        for name in names:
            bw = probe()
            out = subprocess.run(
                [sys.executable, "-c", CHILD % {"repo": REPO},
                 json.dumps(VARIANTS[name]), str(vertices), str(rounds), str(cores)],
                capture_output=True, text=True, cwd=REPO,
            )
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
            try:
                rec = json.loads(line)
            except ValueError:
                rec = {"error": out.stderr[-300:]}
            rec.update({"variant": name, "rep": r, "bw": bw})
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
