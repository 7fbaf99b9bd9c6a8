#!/usr/bin/env python
"""Headline benchmark — one JSON line for the driver.

Two parts:

1. **North-star metric**: PageRank on the synthetic Common-Crawl-style
   link graph (pages → vectorized link extraction → edge table), run to
   1e-6 L1 convergence; reports wall seconds plus
   ``edges_per_sec_per_superstep`` (the BASELINE.md metric).
2. **Query sweep**: every ``queries()`` entry from ``__spark_entry__``
   timed once at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

If ``scripts/scaling_results.json`` exists (produced by
``scripts/scaling_bench.py``, the local[8]-vs-local[32] evidence for the
north rule's N→4N scaling-efficiency criterion), it is embedded under
``"scaling"``.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "60000"))


def main() -> None:
    from graphscope_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- part 1: north-star PageRank on the link graph --------------
    from graphscope_spark.algorithms import pagerank
    from graphscope_spark.sources.linkgraph import graph_from_pages
    from graphscope_spark.sources.pages import write_pages
    from graphscope_spark.superstep import SuperstepRunner

    pages_path = f"/tmp/gs_bench_pages_{N_PAGES}"
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        write_pages(spark, N_PAGES, pages_path, partitions=max(CPUS, 8))

    g, _ = graph_from_pages(spark.read.parquet(pages_path), num_partitions=max(CPUS, 8))
    g = g.cache()
    n_edges = g.num_edges()
    runner = SuperstepRunner(spark, "pagerank", checkpoint_dir=None, resume=False)
    t0 = time.time()
    # batched convergence: 4 chained rounds per job, stop decision per
    # batch — sound for the contractive iteration (see pagerank.py)
    pagerank(g, tol=1e-6, max_iter=60, runner=runner, sync_every=4).count()
    pr_wall = time.time() - t0
    supersteps = len(runner.metrics)
    eps = n_edges * supersteps / pr_wall if pr_wall > 0 else 0.0
    g.unpersist()

    # ---- part 1b: throughput-regime PageRank ------------------------
    # The 60k-page link graph above is superstep-count-dominated (per-job
    # floor ≫ per-edge work), so its eps says nothing about throughput.
    # The north-star eps number comes from a graph big enough that edge
    # volume dominates: the same 4M-vertex/13.1M-edge power-law graph the
    # scaling harness uses, fixed 10 rounds chained into one job
    # (eps/superstep is round-count-invariant).
    synth = None
    synth_v = int(os.environ.get("SPARK_GRAFT_BENCH_SYNTH_V", "4000000"))
    if synth_v > 0:
        from graphscope_spark.graph import Graph
        from graphscope_spark.sources.synthetic import powerlaw_edges

        nparts = max(CPUS, 8)
        sg = Graph.from_edges(
            powerlaw_edges(spark, synth_v, partitions=nparts), num_partitions=nparts
        ).cache()
        s_edges = sg.num_edges()
        srunner = SuperstepRunner(spark, "pagerank", checkpoint_dir=None, resume=False)
        rounds = 10
        t0 = time.time()
        pagerank(
            sg, tol=None, max_iter=rounds, runner=srunner, sync_every=rounds
        ).count()
        s_wall = time.time() - t0
        synth = {
            "edges": s_edges,
            "rounds": rounds,
            "sec": round(s_wall, 1),
            "eps": int(round(s_edges * rounds / s_wall)) if s_wall > 0 else 0,
        }
        sg.unpersist()

    # ---- part 2: driver-contract query sweep ------------------------
    import __spark_entry__ as entrymod

    def _compact(sec: float) -> float | int:
        # adaptive precision: the driver's stdout capture keeps ~2000
        # chars; 89 query entries only fit with short numbers
        if sec < 0:
            return -1.0
        if sec < 10:
            return round(sec, 2)
        if sec < 100:
            return round(sec, 1)
        return int(round(sec))

    qtimes: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            fn(spark, SF_DIR).count()
            qtimes[name] = _compact(time.time() - t0)
            print(f"# query {name}: {time.time() - t0:.1f}s", file=sys.stderr)
        except Exception as exc:  # record the failure, keep benching
            qtimes[name] = -1.0
            print(f"# query {name} failed: {exc}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "pagerank_linkgraph_to_1e-6_sec",
        "value": round(pr_wall, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "linkgraph": {
            "edges": n_edges,
            "supersteps": supersteps,
            "eps": int(round(eps)),
        },
        "cores": CPUS,
    }
    if synth is not None:
        out["synth"] = synth
    # Scaling evidence, COMPACT: the driver's log capture keeps only the
    # tail of stdout, and round 1's full embedded blob pushed the line
    # past that window — the driver recorded "parsed: null".  Keep the
    # headline numbers only; full prose + raw runs live in BENCH.md and
    # scripts/scaling_results.json.
    scaling_path = os.path.join(REPO, "scripts", "scaling_results.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as fh:
            s = json.load(fh)
        try:
            out["scaling"] = s["compact"]
        except KeyError:
            pass
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1950:  # degrade precision before the capture window cuts us
        out["queries"] = {
            k: (round(v, 1) if 0 <= v < 10 else (int(round(v)) if v >= 10 else v))
            for k, v in out["queries"].items()
        }
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1950:  # last resort: whole seconds for every query
        out["queries"] = {
            k: (int(round(v)) if v >= 0 else v) for k, v in out["queries"].items()
        }
        line = json.dumps(out, separators=(",", ":"))
    # If the sweep still doesn't fit, it's the QUERY LIST that gives way
    # (per-query times also live in BENCH.md), never the scaling/synth
    # headline evidence: keep failures + the slowest entries that fit.
    if len(line) > 1950:
        ranked = sorted(qtimes.items(), key=lambda kv: (kv[1] >= 0, -kv[1]))
        while len(line) > 1950 and len(ranked) > 10:
            ranked = ranked[:-10]
            out["queries"] = dict(sorted(ranked))
            out["q_total"] = len(qtimes)
            out["q_sweep_sec"] = int(round(sum(v for v in qtimes.values() if v > 0)))
            line = json.dumps(out, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
