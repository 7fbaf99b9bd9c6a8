"""NetworkX-compat facade smoke + semantics tests (reference:
python/graphscope/nx/algorithms/builtin.py surface)."""

from __future__ import annotations

import math

from graphscope_spark import nx as gnx
from tests.conftest import TINY_EDGES, TINY_VERTICES
from tests import oracle


def test_pagerank_dict(tiny_graph):
    pr = gnx.pagerank(tiny_graph, max_iter=50)
    exp = oracle.pagerank_oracle(TINY_EDGES, TINY_VERTICES, max_iter=50)
    assert set(pr) == set(TINY_VERTICES)
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    for v in exp:
        assert abs(pr[v] - exp[v]) < 1e-6


def test_connected_components_shape(tiny_graph):
    comps = gnx.connected_components(tiny_graph)
    assert isinstance(comps, list) and all(isinstance(c, set) for c in comps)
    # {0,1,2,3} and {4,5,6} connect; 7 isolated
    assert sorted(len(c) for c in comps) == [1, 3, 4]
    assert gnx.number_connected_components(tiny_graph) == 3


def test_scc_sets(tiny_graph):
    comps = gnx.strongly_connected_components(tiny_graph)
    exp = oracle.scc_oracle(TINY_EDGES)
    groups: dict[int, set] = {}
    for v, c in exp.items():
        groups.setdefault(c, set()).add(v)
    # vertices with no edges (7) are singleton SCCs in the engine but
    # absent from the edge-derived oracle
    expected = {frozenset(c) for c in groups.values()}
    expected |= {frozenset({v}) for v in TINY_VERTICES if v not in exp}
    assert {frozenset(c) for c in comps} == expected


def test_shortest_paths_and_has_path(tiny_graph):
    d = gnx.single_source_shortest_path_length(tiny_graph, 0)
    exp = {
        v: dd
        for (v, dd) in oracle.bfs_oracle(TINY_EDGES, TINY_VERTICES, 0).items()
        if dd >= 0
    }
    assert d == exp
    assert gnx.has_path(tiny_graph, 0, 3)
    assert not gnx.has_path(tiny_graph, 0, 7)


def test_k_core_and_mis(tiny_graph):
    core = gnx.core_number(tiny_graph)
    exp = oracle.core_number_oracle(TINY_EDGES, TINY_VERTICES)
    assert core == exp
    mis = gnx.maximal_independent_set(tiny_graph)
    exp_mis = {v for v, f in oracle.mis_oracle(TINY_EDGES, TINY_VERTICES).items() if f}
    assert mis == exp_mis


def test_boundary_lists(tiny_graph):
    g = tiny_graph.to_undirected()
    nb = gnx.node_boundary(g, [0, 1])
    assert nb == {2}
    eb = gnx.edge_boundary(g, [0, 1])
    assert eb == [(0, 2), (1, 2)]


def test_scalars(tiny_graph):
    t = gnx.transitivity(tiny_graph)
    exp = oracle.transitivity_oracle(TINY_EDGES, TINY_VERTICES)
    assert abs(t - exp) < 1e-9
    avg = gnx.average_clustering(tiny_graph)
    exp_avg = oracle.avg_clustering_oracle(TINY_EDGES, TINY_VERTICES)
    assert abs(avg - exp_avg) < 1e-9
