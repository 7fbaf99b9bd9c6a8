"""Eigenvector / Katz / closeness / clustering-stats / assortativity /
core-number vs pure-Python oracles (same golden strategy as the rest)."""

from __future__ import annotations

import numpy as np

from graphscope_spark.algorithms import (
    average_degree_connectivity,
    avg_clustering,
    closeness_centrality,
    core_number,
    degree_assortativity,
    eigenvector_centrality,
    katz_centrality,
    transitivity,
)
from tests.conftest import TINY_EDGES, TINY_VERTICES
from tests import oracle


def _dict(df, key="vid"):
    rows = df.collect()
    cols = [c for c in df.columns if c != key]
    if len(cols) == 1:
        return {r[key]: r[cols[0]] for r in rows}
    return {r[key]: tuple(r[c] for c in cols) for r in rows}


def _allclose(got: dict, exp: dict, atol=1e-6):
    assert set(got) == set(exp)
    g = np.array([got[v] for v in sorted(got)])
    e = np.array([exp[v] for v in sorted(exp)])
    assert np.allclose(g, e, atol=atol), np.abs(g - e).max()


def test_eigenvector_tiny(tiny_graph):
    exp = oracle.eigenvector_oracle(TINY_EDGES, TINY_VERTICES, max_iter=50)
    got = _dict(eigenvector_centrality(tiny_graph, max_iter=50))
    _allclose(got, exp, atol=1e-5)


def test_katz_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.katz_oracle(edges, vertices, max_iter=50)
    got = _dict(katz_centrality(rand_graph, max_iter=50))
    _allclose(got, exp, atol=1e-6)


def test_closeness_tiny(tiny_graph):
    exp = oracle.closeness_oracle(TINY_EDGES, TINY_VERTICES)
    got = _dict(closeness_centrality(tiny_graph))
    _allclose(got, exp, atol=1e-9)


def test_closeness_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.closeness_oracle(edges, vertices)
    got = _dict(closeness_centrality(rand_graph))
    _allclose(got, exp, atol=1e-9)


def test_avg_clustering_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.avg_clustering_oracle(edges, vertices)
    got = avg_clustering(rand_graph).collect()[0]["avg_clustering"]
    assert abs(got - exp) < 1e-9


def test_transitivity_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.transitivity_oracle(edges, vertices)
    got = transitivity(rand_graph).collect()[0]["transitivity"]
    assert abs(got - exp) < 1e-9


def test_degree_assortativity_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.degree_assortativity_oracle(edges, vertices)
    got = degree_assortativity(rand_graph).collect()[0]["assortativity"]
    assert abs(got - exp) < 1e-6


def test_average_degree_connectivity_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.average_degree_connectivity_oracle(edges, vertices)
    got = _dict(average_degree_connectivity(rand_graph), key="degree")
    _allclose(got, exp, atol=1e-9)


def test_attribute_assortativity_random(spark, rand_graph, rand_graph_data):
    from graphscope_spark.algorithms import attribute_assortativity

    vertices, edges = rand_graph_data
    attr = {v: v % 4 for v in vertices}
    exp = oracle.attribute_assortativity_oracle(edges, vertices, attr)
    attrs = spark.createDataFrame(list(attr.items()), "vid long, attr long")
    got = attribute_assortativity(rand_graph, attrs).collect()[0][
        "attr_assortativity"
    ]
    assert abs(got - exp) < 1e-9


def test_graph_ops_project_subgraph(spark, tiny_graph):
    """PROJECT / TO_UNDIRECTED / INDUCE_SUBGRAPH surface."""
    sub = tiny_graph.induce_subgraph(
        spark.createDataFrame([(0,), (1,), (2,)], "vid long")
    )
    assert sub.num_vertices() == 3
    got = sorted(map(tuple, sub.edges.select("src", "dst").collect()))
    assert got == [(0, 1), (0, 1), (0, 2), (1, 2), (2, 0)]
    und = tiny_graph.to_undirected()
    assert not und.directed
    # symmetrized: every edge in both directions, no self-loops
    pairs = set(map(tuple, und.edges.collect()))
    assert (1, 0) in pairs and (0, 1) in pairs and (4, 4) not in pairs
    proj = tiny_graph.project()
    assert proj.vertices.columns == ["vid"]


def test_core_number_tiny(tiny_graph):
    exp = oracle.core_number_oracle(TINY_EDGES, TINY_VERTICES)
    assert _dict(core_number(tiny_graph)) == exp


def test_core_number_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.core_number_oracle(edges, vertices)
    assert _dict(core_number(rand_graph)) == exp
    # distributed h-index supersteps pinned equal to the cascade-peel
    # single-task finisher (core numbers are unique)
    assert _dict(core_number(rand_graph, local_finish_rows=0)) == exp
