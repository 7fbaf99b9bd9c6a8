"""Round-5 adoption A/B: packed-adjacency gather vs edge-join gather
for the six algorithms converted this round (hits, salsa, eigenvector,
katz, articlerank, lpa_u2i — VERDICT r4 task 4).

Interleaved reps (A B A B ...) with membw probes bracketing each pair,
checksums compared for bit-equality, appended to
scripts/adj_ab_r5.jsonl.  Same discipline as query_ab.py: a time
difference only counts if the bracketing probes show comparable
ambient bandwidth.

Usage: python scripts/adj_ab_r5.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

from membw_probe import probe  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from graphscope_spark.session import get_spark  # noqa: E402

OUT = os.path.join(HERE, "adj_ab_r5.jsonl")


def _checksum(df, cols):
    row = df.agg(
        *[F.sum(F.round(F.col(c), 8)).alias(c) for c in cols]
    ).collect()[0]
    return [round(float(row[c]), 6) for c in cols]


def units(spark, sf_dir):
    from graphscope_spark.algorithms import (
        articlerank,
        eigenvector_centrality,
        hits,
        katz_centrality,
        salsa,
    )
    from graphscope_spark.algorithms.lpa_u2i import lpa_u2i
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    g.edges.cache().count()

    def lpa_unit(adj):
        import __spark_entry__ as entry

        users = entry._lpa_u2i_users(spark, sf_dir)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        edges = (
            orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
            .groupBy(
                F.col("o_custkey").alias("src"),
                (F.lit(1000000) + F.col("l_partkey")).alias("dst"),
            )
            .agg(F.sum("l_quantity").alias("w"))
        )
        return lpa_u2i(
            users, edges, ["p0", "p1"], max_round=entry.LPAU2I_ROUNDS,
            adjacency=adj,
        ), ["p0", "p1"]

    from graphscope_spark.algorithms import pagerank, wcc

    units_pr = {
        "pagerank": lambda adj: (
            pagerank(g, tol=None, max_iter=12, sync_every=12, adjacency=adj),
            ["rank"],
        ),
        "wcc": lambda adj: (wcc(g, adjacency=adj), ["comp"]),
    }
    return {
        **units_pr,
        "hits": lambda adj: (hits(g, max_iter=12, sync_every=12, adjacency=adj), ["hub", "auth"]),
        "salsa": lambda adj: (salsa(g, rounds=8, adjacency=adj), ["hub", "auth"]),
        "eigenvector": lambda adj: (
            eigenvector_centrality(g, max_iter=12, tol=None, sync_every=12, adjacency=adj),
            ["centrality"],
        ),
        "katz": lambda adj: (
            katz_centrality(g, max_iter=12, tol=None, sync_every=12, adjacency=adj),
            ["centrality"],
        ),
        "articlerank": lambda adj: (articlerank(g, max_iter=12, adjacency=adj), ["rank"]),
        "lpa_u2i": lambda adj: lpa_unit(adj),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = set(sys.argv[3:])
    spark = get_spark("adj_ab_r5", master="local[32]", shuffle_partitions=32)
    us = units(spark, sf_dir)
    for name, fn in us.items():
        if only and name not in only:
            continue
        rec = {"unit": name, "sf_dir": sf_dir, "pairs": []}
        for rep in range(reps):
            p0 = probe()
            pair = {}
            for label, adj in (("adj", True), ("edge", False)):
                t0 = time.time()
                df, cols = fn(adj)
                cs = _checksum(df, cols)
                pair[label] = {"sec": round(time.time() - t0, 2), "checksum": cs}
            p1 = probe()
            pair["bw8_before"] = p0["bw8"]
            pair["bw8_after"] = p1["bw8"]
            pair["checksums_equal"] = (
                pair["adj"]["checksum"] == pair["edge"]["checksum"]
            )
            rec["pairs"].append(pair)
        rec["ts"] = round(time.time())
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
