"""Biconnectivity + matching-family kernels vs pure-Python oracles."""

from __future__ import annotations

import pytest

from graphscope_spark.graph import Graph

from tests import oracle
from tests.conftest import make_random_graph


def make_bridgy_graph() -> tuple[list[int], list[tuple[int, int]]]:
    """Thinned random graph + pendant path/triangle appendages —
    guarantees a healthy crop of bridges, cut vertices, and small
    biconnected components."""
    vertices, edges = make_random_graph()
    edges = [(s, d) for (s, d) in edges if (s * 7 + d) % 3 != 0]
    vertices = vertices + [300, 301, 302, 303, 304, 305]
    edges += [
        (0, 300),
        (300, 301),
        (301, 302),
        (302, 303),
        (303, 304),
        (304, 302),
    ]
    return vertices, sorted(set(edges))


@pytest.fixture(scope="module")
def bridgy(spark):
    vertices, edges = make_bridgy_graph()
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in vertices], "vid long")
    g = Graph.from_edges(e, v, directed=False, num_partitions=8)
    return g, vertices, edges


def test_bridges(bridgy):
    from graphscope_spark.algorithms.biconnectivity import bridges

    g, vertices, edges = bridgy
    _, exp_bridges, _ = oracle.biconnectivity_oracle(edges, vertices)
    got = {(r["src"], r["dst"]) for r in bridges(g).collect()}
    assert got == exp_bridges, (len(got), len(exp_bridges))


def test_articulation_points(bridgy):
    from graphscope_spark.algorithms.biconnectivity import articulation_points

    g, vertices, edges = bridgy
    _, _, exp_arts = oracle.biconnectivity_oracle(edges, vertices)
    got = {r["vid"] for r in articulation_points(g).collect()}
    assert got == exp_arts, (sorted(got ^ exp_arts))


def test_biconnected_components(bridgy):
    from graphscope_spark.algorithms.biconnectivity import biconnected_components

    g, vertices, edges = bridgy
    exp_comps, _, _ = oracle.biconnectivity_oracle(edges, vertices)
    exp = {frozenset(c) for c in exp_comps}
    rows = biconnected_components(g).collect()
    by_label: dict[tuple[int, int], set] = {}
    for r in rows:
        by_label.setdefault((r["bcc_u"], r["bcc_v"]), set()).add((r["src"], r["dst"]))
    got = {frozenset(c) for c in by_label.values()}
    assert got == exp
    # the label is the component's lexicographically smallest edge
    for (bu, bv), es in by_label.items():
        assert (bu, bv) == min(es)


def test_bicon_family_distributed_pinned(bridgy):
    """Set-based distributed derivation == single-task Hopcroft–Tarjan
    finisher for all three outputs (they are unique graph properties)."""
    from graphscope_spark.algorithms.biconnectivity import (
        articulation_points,
        biconnected_components,
        bridges,
    )

    g, vertices, edges = bridgy
    assert {tuple(r) for r in bridges(g).collect()} == {
        tuple(r) for r in bridges(g, local_finish_rows=0).collect()
    }
    assert {r["vid"] for r in articulation_points(g).collect()} == {
        r["vid"] for r in articulation_points(g, local_finish_rows=0).collect()
    }
    assert {tuple(r) for r in biconnected_components(g).collect()} == {
        tuple(r) for r in biconnected_components(g, local_finish_rows=0).collect()
    }


def test_bridges_rand(rand_graph, rand_graph_data):
    from graphscope_spark.algorithms.biconnectivity import bridges

    vertices, edges = rand_graph_data
    _, exp_bridges, _ = oracle.biconnectivity_oracle(edges, vertices)
    got = {(r["src"], r["dst"]) for r in bridges(rand_graph).collect()}
    assert got == exp_bridges


def test_articulation_rand(rand_graph, rand_graph_data):
    from graphscope_spark.algorithms.biconnectivity import articulation_points

    vertices, edges = rand_graph_data
    _, _, exp_arts = oracle.biconnectivity_oracle(edges, vertices)
    got = {r["vid"] for r in articulation_points(rand_graph).collect()}
    assert got == exp_arts


def test_maximal_matching(rand_graph, rand_graph_data):
    from graphscope_spark.algorithms.matching import maximal_matching

    vertices, edges = rand_graph_data
    exp = oracle.maximal_matching_oracle(edges, vertices)
    got = {r["vid"]: r["mate"] for r in maximal_matching(rand_graph).collect()}
    assert got == exp
    # sanity: it IS a maximal matching
    adj, _ = oracle._simple_undirected(edges, vertices)
    for v, m in got.items():
        if m != -1:
            assert got[m] == v
    for v in vertices:
        if got[v] == -1:
            assert all(got[u] != -1 for u in adj[v])


def test_min_vertex_cover(rand_graph, rand_graph_data):
    from graphscope_spark.algorithms.matching import min_vertex_cover

    vertices, edges = rand_graph_data
    exp = oracle.min_vertex_cover_oracle(edges, vertices)
    got = {r["vid"] for r in min_vertex_cover(rand_graph).collect()}
    assert got == exp
    # sanity: every edge covered
    for s, d in edges:
        if s != d:
            assert s in got or d in got


def test_min_dominating_set(rand_graph, rand_graph_data):
    from graphscope_spark.algorithms.matching import min_dominating_set

    vertices, edges = rand_graph_data
    exp = oracle.min_dominating_set_oracle(edges, vertices)
    got = {r["vid"] for r in min_dominating_set(rand_graph).collect()}
    assert got == exp
    adj, _ = oracle._simple_undirected(edges, vertices)
    for v in vertices:
        assert v in got or any(u in got for u in adj[v])


def test_min_dominating_set_tail_finisher_matches_distributed(
    rand_graph, rand_graph_data
):
    # the single-task tail replay must be bit-identical to the
    # fully-distributed rounds (local_finish_rows=0 disables it)
    from graphscope_spark.algorithms.matching import min_dominating_set

    vertices, edges = rand_graph_data
    exp = oracle.min_dominating_set_oracle(edges, vertices)
    dist = {
        r["vid"]
        for r in min_dominating_set(rand_graph, local_finish_rows=0).collect()
    }
    assert dist == exp


def test_min_dominating_set_mid_switch(rand_graph, rand_graph_data):
    # force the switch AFTER some distributed batches (threshold sized
    # so the first check fails but a later shrunken state passes)
    from graphscope_spark.algorithms.matching import min_dominating_set

    vertices, edges = rand_graph_data
    exp = oracle.min_dominating_set_oracle(edges, vertices)
    n0 = len(vertices) + 2 * len({(min(s, d), max(s, d)) for s, d in edges if s != d})
    got = {
        r["vid"]
        for r in min_dominating_set(
            rand_graph, local_finish_rows=max(n0 // 2, 8)
        ).collect()
    }
    assert got == exp


def test_maximal_matching_distributed_matches_finisher(rand_graph, rand_graph_data):
    # local_finish_rows=0 forces the fully-distributed rounds; the
    # single-task replay (default) must be bit-identical
    from graphscope_spark.algorithms.matching import maximal_matching

    vertices, edges = rand_graph_data
    exp = oracle.maximal_matching_oracle(edges, vertices)
    dist = {
        r["vid"]: r["mate"]
        for r in maximal_matching(rand_graph, local_finish_rows=0).collect()
    }
    assert dist == exp


def test_maximal_matching_mid_switch(rand_graph, rand_graph_data):
    # threshold sized so the first check fails but a later shrunken
    # frontier passes — exercises matched-state merge at the switch
    from graphscope_spark.algorithms.matching import maximal_matching

    vertices, edges = rand_graph_data
    exp = oracle.maximal_matching_oracle(edges, vertices)
    n0 = len(vertices) + 2 * len({(min(s, d), max(s, d)) for s, d in edges if s != d})
    got = {
        r["vid"]: r["mate"]
        for r in maximal_matching(
            rand_graph, local_finish_rows=max(n0 // 2, 8)
        ).collect()
    }
    assert got == exp


def test_maximal_matching_max_iter_cap(rand_graph, rand_graph_data):
    # when max_iter binds, the finisher replays exactly that many
    # rounds — same partial matching as the distributed loop
    from graphscope_spark.algorithms.matching import maximal_matching

    fin = {
        r["vid"]: r["mate"]
        for r in maximal_matching(rand_graph, max_iter=1).collect()
    }
    dist = {
        r["vid"]: r["mate"]
        for r in maximal_matching(
            rand_graph, max_iter=1, local_finish_rows=0
        ).collect()
    }
    assert fin == dist
