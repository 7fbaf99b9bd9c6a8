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


def test_k_core_and_mis(tiny_graph, spark):
    import pytest as _pytest

    from graphscope_spark import Graph

    # nx convention (mirrored since round 4): core_number REJECTS
    # graphs with self-loops — tiny_graph carries (4, 4)
    with _pytest.raises(ValueError, match="self loops"):
        gnx.core_number(tiny_graph)
    clean_edges = [(s, d) for (s, d) in TINY_EDGES if s != d]
    clean = Graph.from_edges(
        spark.createDataFrame(clean_edges, "src long, dst long"),
        spark.createDataFrame([(i,) for i in TINY_VERTICES], "vid long"),
        directed=True,
        num_partitions=4,
    )
    core = gnx.core_number(clean)
    exp = oracle.core_number_oracle(clean_edges, TINY_VERTICES)
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


# -- round 3: shortest-path variants, structure scalars, bipartite ------

def _tiny_adj(directed: bool) -> dict:
    adj: dict[int, set] = {v: set() for v in TINY_VERTICES}
    for s, d in TINY_EDGES:
        adj[s].add(d)
        if not directed:
            adj[d].add(s)
    return adj


def _py_bfs(adj: dict, src: int) -> dict:
    dist, frontier = {src: 0}, [src]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def test_shortest_path_list(tiny_graph):
    path = gnx.shortest_path(tiny_graph, 0, 3)
    dist = _py_bfs(_tiny_adj(True), 0)
    assert path[0] == 0 and path[-1] == 3
    assert len(path) - 1 == dist[3]
    adj = _tiny_adj(True)
    for a, b in zip(path, path[1:]):
        assert b in adj[a]
    assert gnx.bidirectional_shortest_path(tiny_graph, 0, 3) == path
    import pytest

    with pytest.raises(ValueError, match="no path"):
        gnx.shortest_path(tiny_graph, 0, 7)


def test_single_target_and_all_pairs(tiny_graph):
    adj = _tiny_adj(True)
    # u -> target distances = BFS from target over reversed adjacency
    radj: dict[int, set] = {v: set() for v in TINY_VERTICES}
    for s, d in TINY_EDGES:
        radj[d].add(s)
    exp_t = _py_bfs(radj, 3)
    assert gnx.single_target_shortest_path_length(tiny_graph, 3) == exp_t

    ap = gnx.all_pairs_shortest_path_length(tiny_graph)
    for u in TINY_VERTICES:
        assert ap.get(u, {}) == _py_bfs(adj, u)


def test_structure_scalars(tiny_graph):
    n = len(TINY_VERTICES)
    distinct = {(s, d) for s, d in TINY_EDGES if s != d}
    # nx convention (mirrored since round 4): density's m INCLUDES
    # self-loops
    with_loops = {(s, d) for s, d in TINY_EDGES}
    assert abs(gnx.density(tiny_graph) - len(with_loops) / (n * (n - 1))) < 1e-12
    assert gnx.number_of_selfloops(tiny_graph) == 1
    assert not gnx.is_connected(tiny_graph)
    # nx overall_reciprocity convention (mirrored since round 5): the
    # denominator is ALL distinct directed edges (self-loops included),
    # reciprocated = 2·(m − undirected-collapsed m)
    und_all = {(min(s, d), max(s, d)) for s, d in TINY_EDGES}
    assert abs(
        gnx.reciprocity(tiny_graph)
        - 2 * (len(with_loops) - len(und_all)) / len(with_loops)
    ) < 1e-12
    hist = gnx.degree_histogram(tiny_graph)
    und = {(min(s, d), max(s, d)) for s, d in TINY_EDGES if s != d}
    deg = {v: 0 for v in TINY_VERTICES}
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    exp_hist = [0] * (max(deg.values()) + 1)
    for v, dd in deg.items():
        exp_hist[dd] += 1
    assert hist == exp_hist


def test_greedy_color_proper(tiny_graph):
    colors = gnx.greedy_color(tiny_graph)
    und = {(min(s, d), max(s, d)) for s, d in TINY_EDGES if s != d}
    for a, b in und:
        assert colors[a] != colors[b]


def test_bipartite_module(spark):
    from graphscope_spark.graph import Graph

    # C4 plus a pendant: bipartite
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edges(df, directed=False, num_partitions=4)
    assert gnx.is_bipartite(g)
    s0, s1 = gnx.bipartite_sets(g)
    assert s0 == {0, 2, 4} and s1 == {1, 3}
    col = gnx.bipartite_color(g)
    for a, b in edges:
        assert col[a] != col[b]
    assert abs(gnx.bipartite_density(g, [1, 3]) - 5 / (2 * 3)) < 1e-12
    other, mine = gnx.bipartite_degrees(g, [1, 3])
    assert mine == {1: 2, 3: 3} and other == {0: 2, 2: 2, 4: 1}
    proj = gnx.bipartite_projected_graph(g, [0, 2, 4])
    got = {(r["src"], r["dst"]) for r in proj.edges.collect()}
    # 0-2 share {1,3}; 0-4 and 2-4 share {3}
    assert got == {(0, 2), (0, 4), (2, 4)}

    # triangle: not bipartite
    tri = Graph.from_edges(
        spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long"),
        directed=False,
        num_partitions=4,
    )
    assert not gnx.is_bipartite(tri)
    import pytest

    with pytest.raises(ValueError, match="not bipartite"):
        gnx.bipartite_sets(tri)


def test_louvain_communities_shape(tiny_graph):
    comms = gnx.louvain_communities(tiny_graph)
    assert isinstance(comms, list) and all(isinstance(c, set) for c in comms)
    seen = set().union(*comms)
    assert seen == set(TINY_VERTICES)
    assert sum(len(c) for c in comms) == len(TINY_VERTICES)
