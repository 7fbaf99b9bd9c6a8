"""NX long-tail edge-case parity (VERDICT r3 task 6): the reference
vendors the whole NetworkX suite (python/graphscope/nx/tests/); this
file ports the highest-traffic EDGE-CASE behaviors — self-loops,
disconnected inputs, empty graphs, isolated vertices, cyclic DAG
inputs — for the most-used facade functions, differentially against
real networkx 3.6."""

from __future__ import annotations

import pytest

nx = pytest.importorskip("networkx")

from graphscope_spark import Graph
from graphscope_spark import nx as gnx

# -- fixture graphs ----------------------------------------------------

LOOP_EDGES = [(0, 1), (1, 2), (2, 0), (2, 2), (3, 3), (1, 3)]
LOOP_VERTICES = [0, 1, 2, 3, 4]           # 4 isolated

DISC_EDGES = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12)]
DISC_VERTICES = [0, 1, 2, 10, 11, 12, 20]  # 20 isolated


def _g(spark, edges, vertices, directed=True):
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in vertices], "vid long")
    return Graph.from_edges(e, v, directed=directed, num_partitions=4)


@pytest.fixture(scope="module")
def loop_g(spark):
    return _g(spark, LOOP_EDGES, LOOP_VERTICES)


@pytest.fixture(scope="module")
def loop_nxd():
    g = nx.DiGraph()
    g.add_nodes_from(LOOP_VERTICES)
    g.add_edges_from(LOOP_EDGES)
    return g


@pytest.fixture(scope="module")
def disc_g(spark):
    return _g(spark, DISC_EDGES, DISC_VERTICES)


@pytest.fixture(scope="module")
def disc_nxd():
    g = nx.DiGraph()
    g.add_nodes_from(DISC_VERTICES)
    g.add_edges_from(DISC_EDGES)
    return g


@pytest.fixture(scope="module")
def empty_g(spark):
    return _g(spark, [], [0, 1, 2])


@pytest.fixture(scope="module")
def empty_nxd():
    g = nx.DiGraph()
    g.add_nodes_from([0, 1, 2])
    return g


# -- self-loop conventions --------------------------------------------


def test_selfloop_count(loop_g, loop_nxd):
    assert gnx.number_of_selfloops(loop_g) == nx.number_of_selfloops(loop_nxd)


def test_selfloop_degree_centrality(loop_g, loop_nxd):
    got = gnx.degree_centrality(loop_g)
    exp = nx.degree_centrality(loop_nxd)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9), k


def test_selfloop_in_out_degree_centrality(loop_g, loop_nxd):
    for gf, nf in (
        (gnx.in_degree_centrality, nx.in_degree_centrality),
        (gnx.out_degree_centrality, nx.out_degree_centrality),
    ):
        got, exp = gf(loop_g), nf(loop_nxd)
        assert set(got) == set(exp)
        for k in exp:
            assert got[k] == pytest.approx(exp[k], abs=1e-9), k


def test_selfloops_ignored_by_triangles(loop_g, loop_nxd):
    u = loop_nxd.to_undirected()
    assert gnx.triangles(loop_g) == nx.triangles(u)
    got, exp = gnx.clustering(loop_g), nx.clustering(u)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9), k


def test_selfloop_density(loop_g, loop_nxd):
    assert gnx.density(loop_g) == pytest.approx(nx.density(loop_nxd), abs=1e-12)


# -- disconnected inputs ----------------------------------------------


def test_disconnected_components(disc_g, disc_nxd):
    got = {frozenset(c) for c in gnx.connected_components(disc_g)}
    exp = {frozenset(c) for c in nx.connected_components(disc_nxd.to_undirected())}
    assert got == exp
    assert gnx.number_connected_components(disc_g) == nx.number_connected_components(
        disc_nxd.to_undirected()
    )


def test_disconnected_is_connected(disc_g, disc_nxd):
    assert gnx.is_connected(disc_g) is False
    assert nx.is_connected(disc_nxd.to_undirected()) is False


def test_disconnected_sssp_reaches_only_component(disc_g, disc_nxd):
    got = gnx.single_source_shortest_path_length(disc_g, 0)
    exp = dict(nx.single_source_shortest_path_length(disc_nxd, 0))
    assert got == exp  # no inf entries for the other component


def test_disconnected_has_path(disc_g, disc_nxd):
    assert gnx.has_path(disc_g, 0, 12) is nx.has_path(disc_nxd, 0, 12) is False
    assert gnx.has_path(disc_g, 10, 12) is nx.has_path(disc_nxd, 10, 12) is True


def test_disconnected_average_shortest_path_length_raises(disc_g, disc_nxd):
    with pytest.raises(nx.NetworkXError):
        nx.average_shortest_path_length(disc_nxd)
    with pytest.raises(Exception):
        gnx.average_shortest_path_length(disc_g)


def test_isolated_vertex_in_degree_histogram(disc_g, disc_nxd):
    assert gnx.degree_histogram(disc_g) == nx.degree_histogram(
        disc_nxd.to_undirected()
    )


def test_isolated_source_bfs(disc_g, disc_nxd):
    assert gnx.single_source_shortest_path_length(disc_g, 20) == dict(
        nx.single_source_shortest_path_length(disc_nxd, 20)
    )
    t = gnx.bfs_tree(disc_g, 20)
    nt = nx.bfs_tree(disc_nxd, 20)
    assert {r["vid"] for r in t.vertices.collect()} == set(nt.nodes)
    assert t.edges.count() == nt.number_of_edges() == 0


# -- empty / trivial graphs -------------------------------------------


def test_empty_graph_basics(empty_g, empty_nxd):
    assert gnx.density(empty_g) == nx.density(empty_nxd) == 0.0
    assert gnx.number_of_selfloops(empty_g) == 0
    assert gnx.triangles(empty_g) == nx.triangles(empty_nxd.to_undirected())
    assert gnx.transitivity(empty_g) == nx.transitivity(empty_nxd.to_undirected()) == 0


def test_empty_graph_components(empty_g, empty_nxd):
    got = {frozenset(c) for c in gnx.connected_components(empty_g)}
    exp = {frozenset(c) for c in nx.connected_components(empty_nxd.to_undirected())}
    assert got == exp == {frozenset({0}), frozenset({1}), frozenset({2})}


def test_empty_graph_degree_centrality(empty_g, empty_nxd):
    assert gnx.degree_centrality(empty_g) == nx.degree_centrality(empty_nxd)


def test_empty_graph_pagerank_uniform(empty_g, empty_nxd):
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

    got = gnx.pagerank(empty_g, max_iter=50, tol=1e-10)
    exp = _pagerank_python(empty_nxd)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9)


# -- directed-vs-undirected and DAG kwarg/exception conventions -------


def test_reciprocity(disc_g, disc_nxd):
    assert gnx.reciprocity(disc_g) == pytest.approx(
        nx.reciprocity(disc_nxd), abs=1e-12
    )


def test_cyclic_graph_is_not_dag(disc_g, disc_nxd):
    assert gnx.is_directed_acyclic_graph(disc_g) is nx.is_directed_acyclic_graph(
        disc_nxd
    ) is False


def test_topological_sort_on_cycle_raises(disc_g, disc_nxd):
    with pytest.raises(nx.NetworkXUnfeasible):
        list(nx.topological_sort(disc_nxd))
    with pytest.raises(Exception):
        gnx.topological_sort(disc_g)


def test_dag_topological_generations(spark):
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    g = _g(spark, edges, [0, 1, 2, 3, 4])
    d = nx.DiGraph(edges)
    assert [set(s) for s in gnx.topological_generations(g)] == [
        set(s) for s in nx.topological_generations(d)
    ]


def test_k_core_above_degeneracy_is_empty(disc_g, disc_nxd):
    u = disc_nxd.to_undirected()
    assert gnx.k_core(disc_g, 5) == set(nx.k_core(u, 5).nodes) == set()


def test_odd_even_cycle_bipartite(spark):
    odd = _g(spark, [(0, 1), (1, 2), (2, 0)], [0, 1, 2])
    even = _g(spark, [(0, 1), (1, 2), (2, 3), (3, 0)], [0, 1, 2, 3])
    assert gnx.is_bipartite(odd) is nx.is_bipartite(nx.cycle_graph(3)) is False
    assert gnx.is_bipartite(even) is nx.is_bipartite(nx.cycle_graph(4)) is True


def test_shortest_path_trivial_and_missing(disc_g, disc_nxd):
    assert gnx.shortest_path(disc_g, 0, 0) == nx.shortest_path(disc_nxd, 0, 0) == [0]
    with pytest.raises(nx.NetworkXNoPath):
        nx.shortest_path(disc_nxd, 0, 12)
    with pytest.raises(Exception):
        gnx.shortest_path(disc_g, 0, 12)


def test_core_number_rejects_selfloops(loop_g, loop_nxd):
    with pytest.raises(nx.NetworkXNotImplemented):
        nx.core_number(loop_nxd)
    with pytest.raises(Exception):
        gnx.core_number(loop_g)


def test_radius_center_periphery_connected(spark):
    # path graph 0-1-2-3-4 (undirected semantics via symmetrized facade)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    g = _g(spark, edges, [0, 1, 2, 3, 4])
    u = nx.Graph(edges)
    assert gnx.radius(g) == nx.radius(u)
    assert gnx.center(g) == set(nx.center(u))
    assert gnx.periphery(g) == set(nx.periphery(u))


def test_radius_raises_on_disconnected(disc_g, disc_nxd):
    with pytest.raises(nx.NetworkXError):
        nx.radius(disc_nxd.to_undirected())
    with pytest.raises(Exception):
        gnx.radius(disc_g)


def test_isolates(disc_g, disc_nxd, loop_g, loop_nxd):
    assert gnx.isolates(disc_g) == set(nx.isolates(disc_nxd))
    assert gnx.number_of_isolates(disc_g) == nx.number_of_isolates(disc_nxd)
    # a self-loop vertex is NOT isolated
    assert gnx.isolates(loop_g) == set(nx.isolates(loop_nxd)) == {4}
