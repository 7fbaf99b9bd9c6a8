"""Differential parity: the NX-compat facade vs REAL NetworkX on the
seeded 300-vertex power-law digraph (and the tiny edge-case graph).

This is the reference's own test strategy for its NX layer
(python/graphscope/nx/ vendors the NetworkX suite); here every facade
function with deterministic semantics is checked against networkx
itself, not a hand replica."""

from __future__ import annotations

import math

import pytest

nx = pytest.importorskip("networkx")

from graphscope_spark import nx as gnx
from tests.conftest import TINY_EDGES, TINY_VERTICES


@pytest.fixture(scope="module")
def nxd(rand_graph_data):
    vertices, edges = rand_graph_data
    g = nx.DiGraph()
    g.add_nodes_from(vertices)
    g.add_edges_from(edges)
    return g


@pytest.fixture(scope="module")
def nxu(nxd):
    return nxd.to_undirected()


@pytest.fixture(scope="module")
def nxt():
    g = nx.DiGraph()
    g.add_nodes_from(TINY_VERTICES)
    g.add_edges_from(TINY_EDGES)
    return g


def _close(got: dict, exp: dict, tol=1e-6):
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=tol), k


def test_pagerank(rand_graph, nxd):
    # nx.pagerank proper requires scipy (absent here); _pagerank_python
    # is networkx's own reference implementation of the same semantics
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

    _close(gnx.pagerank(rand_graph, max_iter=100, tol=1e-10),
           _pagerank_python(nxd, alpha=0.85, max_iter=100, tol=1e-10), 1e-7)


def test_hits(rand_graph, nxd):
    from networkx.algorithms.link_analysis.hits_alg import _hits_python

    hub, auth = gnx.hits(rand_graph, max_iter=200, tol=1e-12)
    nh, na = _hits_python(nxd, max_iter=500, tol=1e-14)
    _close(hub, nh, 1e-6)
    _close(auth, na, 1e-6)


def test_degree_centrality_family(rand_graph, nxd):
    _close(gnx.degree_centrality(rand_graph), nx.degree_centrality(nxd))
    _close(gnx.in_degree_centrality(rand_graph), nx.in_degree_centrality(nxd))
    _close(gnx.out_degree_centrality(rand_graph), nx.out_degree_centrality(nxd))


def test_eigenvector_centrality(rand_graph, nxd):
    _close(gnx.eigenvector_centrality(rand_graph, max_iter=200, tol=1e-10),
           nx.eigenvector_centrality(nxd, max_iter=500, tol=1e-12), 1e-5)


def test_katz_centrality(rand_graph, nxd):
    _close(gnx.katz_centrality(rand_graph, alpha=0.05, max_iter=500, tol=1e-12),
           nx.katz_centrality(nxd, alpha=0.05, max_iter=2000, tol=1e-14), 1e-6)


def test_closeness_centrality(rand_graph, nxd):
    _close(gnx.closeness_centrality(rand_graph), nx.closeness_centrality(nxd))


def test_harmonic_centrality(rand_graph, nxd):
    _close(gnx.harmonic_centrality(rand_graph), nx.harmonic_centrality(nxd))


def test_betweenness_centrality_tiny(tiny_graph, nxt):
    # facade betweenness follows the reference's undirected convention
    _close(gnx.betweenness_centrality(tiny_graph, normalized=True),
           nx.betweenness_centrality(nxt.to_undirected(), normalized=True), 1e-9)


def test_triangles_clustering(rand_graph, nxu):
    _close(gnx.triangles(rand_graph), nx.triangles(nxu), 0)
    _close(gnx.clustering(rand_graph), nx.clustering(nxu), 1e-9)
    assert gnx.average_clustering(rand_graph) == pytest.approx(
        nx.average_clustering(nxu), abs=1e-9)
    assert gnx.transitivity(rand_graph) == pytest.approx(
        nx.transitivity(nxu), abs=1e-9)


def test_core_number_kcore(rand_graph, nxu):
    _close(gnx.core_number(rand_graph), nx.core_number(nxu), 0)
    for k in (2, 3):
        assert gnx.k_core(rand_graph, k) == set(nx.k_core(nxu, k).nodes)


def test_components(rand_graph, nxu, nxd):
    got = {frozenset(c) for c in gnx.connected_components(rand_graph)}
    exp = {frozenset(c) for c in nx.connected_components(nxu)}
    assert got == exp
    gots = {frozenset(c) for c in gnx.strongly_connected_components(rand_graph)}
    exps = {frozenset(c) for c in nx.strongly_connected_components(nxd)}
    assert gots == exps


def test_shortest_paths(rand_graph, nxd, rand_graph_data):
    vertices, _ = rand_graph_data
    src = vertices[1]
    _close(gnx.single_source_shortest_path_length(rand_graph, src),
           dict(nx.single_source_shortest_path_length(nxd, src)), 0)
    # validity + length parity for a concrete path
    tgt = max(nx.single_source_shortest_path_length(nxd, src))
    p = gnx.shortest_path(rand_graph, src, tgt)
    assert p[0] == src and p[-1] == tgt
    assert len(p) - 1 == nx.shortest_path_length(nxd, src, tgt)
    assert all(nxd.has_edge(a, b) for a, b in zip(p, p[1:]))


def test_eccentricity_diameter(spark, rand_graph, nxu):
    # nx.eccentricity (and since round 5, the facade too) raises on a
    # disconnected graph — compare on the induced giant component
    giant = max(nx.connected_components(nxu), key=len)
    sub = nxu.subgraph(giant)
    gsub = rand_graph.induce_subgraph(
        spark.createDataFrame([(int(v),) for v in giant], "vid long")
    )
    got = gnx.eccentricity(gsub)
    exp = nx.eccentricity(sub)
    for v in exp:
        assert got[v] == exp[v], v
    assert gnx.diameter(rand_graph) == nx.diameter(sub)


def test_assortativity(rand_graph, nxu):
    # undirected-degree convention (reference LDBC analytics semantics)
    assert gnx.degree_assortativity_coefficient(rand_graph) == pytest.approx(
        nx.degree_assortativity_coefficient(nxu), abs=1e-9)


def test_average_degree_connectivity(rand_graph, nxu):
    _close(gnx.average_degree_connectivity(rand_graph),
           nx.average_degree_connectivity(nxu), 1e-9)


def test_boundaries(rand_graph, nxd, rand_graph_data):
    vertices, _ = rand_graph_data
    s = [v for v in vertices if v % 10 == 0]
    assert gnx.node_boundary(rand_graph, s) == nx.node_boundary(nxd, s)
    assert set(gnx.edge_boundary(rand_graph, s)) == set(nx.edge_boundary(nxd, s))


def test_density_reciprocity_selfloops(rand_graph, nxd, tiny_graph, nxt):
    assert gnx.density(rand_graph) == pytest.approx(nx.density(nxd), abs=1e-12)
    assert gnx.reciprocity(rand_graph) == pytest.approx(
        nx.reciprocity(nxd), abs=1e-12)
    assert gnx.number_of_selfloops(tiny_graph) == nx.number_of_selfloops(nxt)


def test_degree_histogram(rand_graph, nxu):
    assert gnx.degree_histogram(rand_graph) == nx.degree_histogram(nxu)


def test_is_connected(rand_graph, nxu):
    assert gnx.is_connected(rand_graph) == nx.is_connected(nxu)


def test_has_path_average_length(rand_graph, nxd, rand_graph_data):
    vertices, _ = rand_graph_data
    a, b = vertices[1], vertices[5]
    assert gnx.has_path(rand_graph, a, b) == nx.has_path(nxd, a, b)


def test_bfs_tree_levels(rand_graph, nxd, rand_graph_data):
    # BFS trees are not unique; parity check is on the level structure
    vertices, _ = rand_graph_data
    src = vertices[1]
    exp = dict(nx.single_source_shortest_path_length(nxd, src))
    tree = gnx.bfs_tree(rand_graph, src)
    tree_edges = {(r["src"], r["dst"]) for r in tree.edges.collect()}
    assert len(tree_edges) == len(exp) - 1  # spanning tree of reachable set
    for a, b in tree_edges:
        assert nxd.has_edge(a, b)
        assert exp[b] == exp[a] + 1


def test_voterank(rand_graph, nxu):
    # undirected voting convention (reference kcore/voterank family)
    assert gnx.voterank(rand_graph, 5) == nx.voterank(nxu, 5)


def test_k_shell_truss(rand_graph, nxu):
    for k in (2, 3):
        assert gnx.k_shell(rand_graph, k) == set(nx.k_shell(nxu, k).nodes)
    got = set(gnx.k_truss(rand_graph, 4))
    exp = {tuple(sorted(e)) for e in nx.k_truss(nxu, 4).edges
           if nx.k_truss(nxu, 4).degree(e[0]) > 0}
    assert got == {tuple(sorted(p)) for p in exp}


def test_link_prediction(rand_graph, nxu):
    # our candidate set: non-adjacent pairs with >=1 common neighbor;
    # hand nx the same ebunch so conventions align
    got_j = gnx.jaccard_coefficient(rand_graph)
    pairs = [(a, b) for a, b, _ in got_j]
    exp_j = {(a, b): v for a, b, v in nx.jaccard_coefficient(nxu, pairs)}
    exp_aa = {(a, b): v for a, b, v in nx.adamic_adar_index(nxu, pairs)}
    exp_pa = {(a, b): v for a, b, v in nx.preferential_attachment(nxu, pairs)}
    for a, b, v in got_j:
        assert v == pytest.approx(exp_j[(a, b)], abs=1e-9)
    for a, b, v in gnx.adamic_adar_index(rand_graph):
        assert v == pytest.approx(exp_aa[(a, b)], abs=1e-9)
    for a, b, v in gnx.preferential_attachment(rand_graph):
        assert v == exp_pa[(a, b)]
    # completeness of the candidate set itself
    n_exp = sum(
        1 for a, b in nx.non_edges(nxu)
        if len(list(nx.common_neighbors(nxu, a, b))) > 0)
    assert len(got_j) == n_exp


def test_minimum_spanning_edges(rand_graph_data, spark, nxu):
    # deterministic weights on the undirected edge set
    from graphscope_spark.graph import Graph

    _, edges = rand_graph_data
    und = sorted({tuple(sorted(e)) for e in edges})
    w_edges = [(a, b, float((a * 7 + b * 13) % 101 + 1)) for a, b in und]
    e = spark.createDataFrame(w_edges, "src long, dst long, weight double")
    g = Graph.from_edges(e, directed=False, num_partitions=8, weight="weight")
    wg = nx.Graph()
    wg.add_nodes_from(nxu.nodes)
    wg.add_weighted_edges_from(w_edges)
    got = gnx.minimum_spanning_edges(g)
    exp = list(nx.minimum_spanning_edges(wg, data=True))
    # MSF is unique up to equal-weight swaps; compare count + total weight
    assert len(got) == len(exp)
    assert sum(w for _, _, w in got) == pytest.approx(
        sum(d["weight"] for _, _, d in exp), abs=1e-9)


def test_all_pairs_and_target_paths(tiny_graph, nxt):
    got = gnx.all_pairs_shortest_path_length(tiny_graph)
    exp = {s: dict(d) for s, d in nx.all_pairs_shortest_path_length(nxt)}
    assert got == exp
    t = 2
    assert gnx.single_target_shortest_path_length(tiny_graph, t) == dict(
        nx.single_target_shortest_path_length(nxt, t))


def test_dijkstra(spark, rand_graph_data, nxd):
    from graphscope_spark.graph import Graph

    _, edges = rand_graph_data
    w_edges = [(a, b, float((a * 3 + b * 5) % 17 + 1)) for a, b in edges]
    e = spark.createDataFrame(w_edges, "src long, dst long, weight double")
    g = Graph.from_edges(e, directed=True, num_partitions=8, weight="weight")
    wd = nx.DiGraph()
    wd.add_weighted_edges_from(w_edges)
    src = 1
    got = gnx.single_source_dijkstra_path_length(g, src)
    exp = nx.single_source_dijkstra_path_length(wd, src)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9)


def test_average_shortest_path_length_component(spark, nxu):
    # facade computes over the giant undirected component
    giant = max(nx.connected_components(nxu), key=len)
    sub = nxu.subgraph(giant)
    exp = nx.average_shortest_path_length(sub)
    from graphscope_spark.graph import Graph

    e = spark.createDataFrame(sorted(sub.edges), "src long, dst long")
    g = Graph.from_edges(e, directed=False, num_partitions=8)
    assert gnx.average_shortest_path_length(g) == pytest.approx(exp, abs=1e-9)


def test_bfs_successors_predecessors(tiny_graph, nxt):
    src = 0
    exp_pred = dict(nx.bfs_predecessors(nxt, src))
    got_pred = gnx.bfs_predecessors(tiny_graph, src)
    assert set(got_pred) == set(exp_pred)
    lv = dict(nx.single_source_shortest_path_length(nxt, src))
    for child, parent in got_pred.items():
        assert nxt.has_edge(parent, child) and lv[child] == lv[parent] + 1
    got_succ = gnx.bfs_successors(tiny_graph, src)
    assert {c for cs in got_succ.values() for c in cs} == set(exp_pred)


def test_all_simple_edge_paths(tiny_graph, nxt):
    got = gnx.all_simple_edge_paths(tiny_graph, 0, 3, cutoff=5)
    exp = sorted(nx.all_simple_edge_paths(nxt, 0, 3, cutoff=5))
    assert sorted(got) == exp


def test_bipartite_family(spark):
    from graphscope_spark.graph import Graph

    edges = [(u, 100 + i) for u in range(6) for i in range(4) if (u + i) % 3]
    e = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edges(e, directed=False, num_partitions=4)
    b = nx.Graph(edges)
    assert gnx.is_bipartite(g) == nx.is_bipartite(b)
    s0, s1 = gnx.bipartite_sets(g)
    es0, es1 = nx.bipartite.sets(b)
    assert {frozenset(s0), frozenset(s1)} == {frozenset(es0), frozenset(es1)}
    nodes = sorted(es0)
    assert gnx.bipartite_density(g, nodes) == pytest.approx(
        nx.bipartite.density(b, es0), abs=1e-12)
    proj = gnx.bipartite_projected_graph(g, nodes)
    eproj = nx.bipartite.projected_graph(b, es0)
    got_edges = {tuple(sorted((r["src"], r["dst"]))) for r in proj.edges.collect()}
    assert got_edges == {tuple(sorted(e)) for e in eproj.edges}


def test_greedy_color_is_proper(rand_graph, nxu):
    colors = gnx.greedy_color(rand_graph)
    for a, b in nxu.edges:
        if a != b:
            assert colors[a] != colors[b]


# -- DAG family --------------------------------------------------------


@pytest.fixture(scope="module")
def dag_pair(spark, rand_graph_data):
    # DAG-ify the random digraph: keep only src < dst edges
    from graphscope_spark.graph import Graph

    vertices, edges = rand_graph_data
    dag_edges = sorted({(a, b) for a, b in edges if a < b})
    e = spark.createDataFrame(dag_edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in vertices], "vid long")
    g = Graph.from_edges(e, v, directed=True, num_partitions=8)
    nd = nx.DiGraph()
    nd.add_nodes_from(vertices)
    nd.add_edges_from(dag_edges)
    return g, nd


def test_descendants_ancestors(rand_graph, nxd, rand_graph_data):
    vertices, _ = rand_graph_data
    for v in (vertices[1], vertices[42]):
        assert gnx.descendants(rand_graph, v) == nx.descendants(nxd, v)
        assert gnx.ancestors(rand_graph, v) == nx.ancestors(nxd, v)


def test_is_dag(rand_graph, nxd, dag_pair):
    g, nd = dag_pair
    assert gnx.is_directed_acyclic_graph(g) == nx.is_directed_acyclic_graph(nd)
    assert gnx.is_directed_acyclic_graph(rand_graph) == nx.is_directed_acyclic_graph(nxd)


def test_topological_generations_and_sort(dag_pair):
    g, nd = dag_pair
    got = gnx.topological_generations(g)
    exp = [set(layer) for layer in nx.topological_generations(nd)]
    assert got == exp
    order = gnx.topological_sort(g)
    pos = {v: i for i, v in enumerate(order)}
    assert len(order) == nd.number_of_nodes()
    for a, b in nd.edges:
        assert pos[a] < pos[b]


def test_topological_generations_raises_on_cycle(rand_graph, nxd):
    if not nx.is_directed_acyclic_graph(nxd):
        with pytest.raises(ValueError):
            gnx.topological_generations(rand_graph)


def test_condensation(rand_graph, nxd):
    qg, mapping = gnx.condensation(rand_graph)
    exp = nx.condensation(nxd)
    exp_members = {frozenset(exp.nodes[c]["members"]) for c in exp.nodes}
    got_members: dict[int, set] = {}
    for v, c in mapping.items():
        got_members.setdefault(c, set()).add(v)
    assert {frozenset(s) for s in got_members.values()} == exp_members
    # quotient edges match under the member-set relabeling
    exp_edges = {
        (frozenset(exp.nodes[a]["members"]), frozenset(exp.nodes[b]["members"]))
        for a, b in exp.edges
    }
    got_edges = {
        (frozenset(got_members[r["src"]]), frozenset(got_members[r["dst"]]))
        for r in qg.edges.collect()
    }
    assert got_edges == exp_edges
    # and the condensation is a DAG
    assert gnx.is_directed_acyclic_graph(qg)


def test_common_neighbors(rand_graph, nxu, rand_graph_data):
    vertices, _ = rand_graph_data
    pairs = [(vertices[0], vertices[1]), (vertices[3], vertices[7])]
    for u, v in pairs:
        assert gnx.common_neighbors(rand_graph, u, v) == set(
            nx.common_neighbors(nxu, u, v))
