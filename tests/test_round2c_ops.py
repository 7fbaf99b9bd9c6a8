"""sssp_path / lcc_directed / random_multi_bfs vs pure-Python oracles."""

from __future__ import annotations

import hashlib
import math

from graphscope_spark.algorithms import lcc_directed, random_multi_bfs, sssp_path
from graphscope_spark.graph import Graph
from tests import oracle


def test_sssp_path_rand(spark, rand_graph_data):
    vertices, edges = rand_graph_data
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in vertices], "vid long")
    g = Graph.from_edges(e, v, directed=False, num_partitions=8)
    source = min(s for s, _ in edges)

    wedges = [(s, d, 1.0) for s, d in edges]
    dist = oracle.sssp_oracle(wedges, vertices, source, directed=False)
    sym = set(edges) | {(d, s) for s, d in edges}
    exp = {}
    for vid, dv in dist.items():
        if math.isinf(dv):
            continue
        if vid == source:
            exp[vid] = (source, 0.0)
            continue
        preds = [u for (u, w) in sym if w == vid and dist[u] + 1.0 == dv]
        exp[vid] = (min(preds), dv)

    got = {
        r["vid"]: (r["pred"], r["dist"])
        for r in sssp_path(g, source=source, weight=None).collect()
    }
    assert got == exp


def test_lcc_directed_rand(spark, rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    es = set(edges)
    nbr: dict[int, set[int]] = {}
    for s, d in es:
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    exp = {}
    for v, ns in nbr.items():
        deg = len(ns)
        if deg < 2:
            exp[v] = 0.0
            continue
        t = sum(1 for u in ns for w in ns if u != w and (u, w) in es)
        exp[v] = t / (deg * (deg - 1))

    got = {r["vid"]: r["lcc"] for r in lcc_directed(rand_graph).collect()}
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-12, v


def test_random_multi_bfs_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    # the deterministic 'random' sample: k smallest md5(str(vid)) digests
    roots = sorted(
        vertices, key=lambda v: hashlib.md5(str(v).encode()).hexdigest()
    )[:8]
    pairs = oracle.multi_source_bfs_oracle(edges, roots, directed=False)
    exp = {v: -1 for v in vertices}
    for (_root, vid), d in pairs.items():
        exp[vid] = max(exp[vid], d)

    got = {
        r["vid"]: r["res"]
        for r in random_multi_bfs(rand_graph, k=8, directed=False).collect()
    }
    assert got == exp
