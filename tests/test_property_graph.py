"""Property-graph (labeled) WCC/SSSP, numeric assortativity, NX
traversal wrappers, consolidate_columns — vs pure-Python oracles.

Reference semantics: apps/property/wcc_property.h (union-of-labels min
propagation), apps/property/sssp_property.h (union-of-labels
relaxation), apps/assortativity/attribute_assortativity.h numeric path,
python/graphscope/nx/algorithms/builtin.py traversal surface.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.property_graph import (
    MAX_LABELS,
    PropertyGraph,
    sssp_property,
    wcc_property,
)


@pytest.fixture(scope="module")
def pgraph(spark):
    # two labels: user(0), item(1); edges: bought(user→item, weighted),
    # follows(user→user).  user 5 and item 9 are isolated.
    users = spark.createDataFrame([(i,) for i in range(6)], "oid long")
    items = spark.createDataFrame([(i,) for i in range(10)], "oid long")
    bought = spark.createDataFrame(
        [(0, 1, 2.0), (1, 1, 1.0), (1, 2, 4.0), (2, 7, 1.5), (3, 7, 0.5)],
        "src long, dst long, weight double",
    )
    follows = spark.createDataFrame(
        [(0, 1, 1.0), (3, 4, 1.0)], "src long, dst long, weight double"
    )
    return PropertyGraph(
        vertices={"user": users, "item": items},
        edges={
            "bought": ("user", "item", bought),
            "follows": ("user", "user", follows),
        },
    )


def _py_union(pg_edges):
    # label indices: item=0, user=1 (sorted alphabetically)
    li = {"item": 0, "user": 1}
    out = []
    for slabel, dlabel, rows in pg_edges:
        for s, d, w in rows:
            out.append((s * MAX_LABELS + li[slabel], d * MAX_LABELS + li[dlabel], w))
    return out


PY_EDGES = _py_union(
    [
        ("user", "item", [(0, 1, 2.0), (1, 1, 1.0), (1, 2, 4.0), (2, 7, 1.5), (3, 7, 0.5)]),
        ("user", "user", [(0, 1, 1.0), (3, 4, 1.0)]),
    ]
)
PY_VERTS = [u * MAX_LABELS + 1 for u in range(6)] + [i * MAX_LABELS + 0 for i in range(10)]


def test_wcc_property(pgraph):
    res = {
        (r["vlabel"], r["oid"]): r["comp"] for r in wcc_property(pgraph).collect()
    }
    # python oracle: min gvid per component over the undirected union
    comp = {v: v for v in PY_VERTS}
    changed = True
    while changed:
        changed = False
        for s, d, _ in PY_EDGES:
            m = min(comp[s], comp[d])
            for x in (s, d):
                if comp[x] > m:
                    comp[x] = m
                    changed = True
    li = {0: "item", 1: "user"}
    expect = {(li[v % MAX_LABELS], v // MAX_LABELS): comp[v] for v in PY_VERTS}
    assert res == expect
    # isolated vertices are their own components
    assert res[("user", 5)] == 5 * MAX_LABELS + 1
    assert res[("item", 9)] == 9 * MAX_LABELS + 0


def test_sssp_property(pgraph):
    res = {
        (r["vlabel"], r["oid"]): r["dist"]
        for r in sssp_property(pgraph, "user", 0).collect()
    }
    # python Bellman-Ford over the undirected union from user 0
    src = 0 * MAX_LABELS + 1
    dist = {v: (0.0 if v == src else math.inf) for v in PY_VERTS}
    for _ in range(len(PY_VERTS)):
        for s, d, w in PY_EDGES:
            if dist[s] + w < dist[d]:
                dist[d] = dist[s] + w
            if dist[d] + w < dist[s]:
                dist[s] = dist[d] + w
    li = {0: "item", 1: "user"}
    for v in PY_VERTS:
        key = (li[v % MAX_LABELS], v // MAX_LABELS)
        if math.isinf(dist[v]):
            assert res[key] >= 1e17  # engine INF sentinel
        else:
            assert res[key] == pytest.approx(dist[v], abs=1e-9)


def test_numeric_assortativity(spark):
    import numpy as np

    from graphscope_spark.algorithms import numeric_assortativity

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)], "src long, dst long"
    )
    g = Graph.from_edges(edges, directed=True, num_partitions=4)
    vals = {0: 1.0, 1: 2.0, 2: 2.0, 3: 5.0}
    attrs = spark.createDataFrame(
        [(k, v) for k, v in vals.items()], "vid long, attr double"
    )
    got = numeric_assortativity(g, attrs).collect()[0][0]
    pairs = [(s, d) for s, d in [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]]
    sym = pairs + [(d, s) for s, d in pairs]
    xs = np.array([vals[s] for s, _ in sym])
    ys = np.array([vals[d] for _, d in sym])
    expect = float(np.corrcoef(xs, ys)[0, 1])
    assert got == pytest.approx(expect, abs=1e-12)


def test_nx_traversal_wrappers(spark):
    from graphscope_spark import nx as gnx

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    g = Graph.from_edges(edges, directed=True, num_partitions=4)
    assert gnx.bfs_successors(g, 0) == {0: [1, 2], 1: [3], 3: [4]}
    assert gnx.bfs_edges(g, 0) == [(0, 1), (0, 2), (1, 3), (3, 4)]
    tree = gnx.bfs_tree(g, 0)
    assert sorted((r["src"], r["dst"]) for r in tree.edges.collect()) == [
        (0, 1),
        (0, 2),
        (1, 3),
        (3, 4),
    ]
    assert gnx.in_degree_centrality(g)[3] == pytest.approx(2 / 4)
    assert gnx.out_degree_centrality(g)[0] == pytest.approx(2 / 4)
    # two simple paths 0→3: 0-1-3 and 0-2-3
    assert gnx.all_simple_edge_paths(g, 0, 3, cutoff=3) == [
        [(0, 1), (1, 3)],
        [(0, 2), (2, 3)],
    ]
    wg = Graph.from_edges(
        spark.createDataFrame(
            [(0, 1, 5.0), (0, 2, 1.0), (2, 1, 1.0)], "src long, dst long, weight double"
        ),
        directed=True,
        num_partitions=4,
        weight="weight",
    )
    assert gnx.single_source_dijkstra_path_length(wg, 0) == {0: 0.0, 1: 2.0, 2: 1.0}


def test_consolidate_columns(spark):
    from graphscope_spark.persistence import consolidate_columns

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    verts = spark.createDataFrame(
        [(0, 1.0, 2.0), (1, 3.0, 4.0)], "vid long, a double, b double"
    )
    g = Graph.from_edges(edges, vertices=verts, num_partitions=2)
    g2 = consolidate_columns(g, ["a", "b"], "ab")
    rows = {r["vid"]: r["ab"] for r in g2.vertices.collect()}
    assert rows == {0: [1.0, 2.0], 1: [3.0, 4.0]}
    assert set(g2.vertices.columns) == {"vid", "ab"}
