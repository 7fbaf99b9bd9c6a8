"""Coloring, fluid communities, k-center, min edge cover vs oracles."""

from __future__ import annotations

from graphscope_spark.algorithms import (
    fluid_communities,
    graph_coloring,
    k_center,
    min_edge_cover,
)
from tests.conftest import TINY_EDGES, TINY_VERTICES
from tests import oracle


def test_coloring_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.coloring_oracle(edges, vertices)
    got = {r["vid"]: r["color"] for r in graph_coloring(rand_graph).collect()}
    assert got == exp
    # proper coloring: no monochromatic edge
    adj, es = oracle._simple_undirected(edges, vertices)
    assert all(got[a] != got[b] for a, b in es)
    # distributed speculative rounds pinned equal to the sequential
    # single-task finisher (the fixpoint is unique)
    dist = {
        r["vid"]: r["color"]
        for r in graph_coloring(rand_graph, local_finish_rows=0).collect()
    }
    assert dist == exp


def test_coloring_tiny(tiny_graph):
    exp = oracle.coloring_oracle(TINY_EDGES, TINY_VERTICES)
    got = {r["vid"]: r["color"] for r in graph_coloring(tiny_graph).collect()}
    assert got == exp


def test_min_edge_cover_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp, _ = oracle.min_edge_cover_oracle(edges, vertices)
    assert min_edge_cover(rand_graph).collect()[0]["size"] == exp


def test_min_edge_cover_tiny(tiny_graph):
    exp, _ = oracle.min_edge_cover_oracle(TINY_EDGES, TINY_VERTICES)
    assert min_edge_cover(tiny_graph).collect()[0]["size"] == exp


def test_k_center_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp, _ = oracle.k_center_oracle(edges, vertices, k=3)
    got = {r["vid"]: r["dis"] for r in k_center(rand_graph, k=3).collect()}
    assert got == exp
    dist = {
        r["vid"]: r["dis"]
        for r in k_center(rand_graph, k=3, local_finish_rows=0).collect()
    }
    assert dist == exp


def test_k_center_tiny(tiny_graph):
    exp, _ = oracle.k_center_oracle(TINY_EDGES, TINY_VERTICES, k=2)
    got = {r["vid"]: r["dis"] for r in k_center(tiny_graph, k=2).collect()}
    assert got == exp


def test_fluid_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    seeds = sorted(vertices)[:10]
    exp = oracle.fluid_community_oracle(edges, vertices, seeds, rounds=5)
    got = {
        r["vid"]: r["lab"]
        for r in fluid_communities(rand_graph, seeds=seeds, rounds=5).collect()
    }
    assert got == exp
    dist = {
        r["vid"]: r["lab"]
        for r in fluid_communities(
            rand_graph, seeds=seeds, rounds=5, local_finish_rows=0
        ).collect()
    }
    assert dist == exp


def test_fluid_tiny(tiny_graph):
    seeds = [0, 4]
    exp = oracle.fluid_community_oracle(TINY_EDGES, TINY_VERTICES, seeds, rounds=4)
    got = {
        r["vid"]: r["lab"]
        for r in fluid_communities(tiny_graph, seeds=seeds, rounds=4).collect()
    }
    assert got == exp


def test_lpa_by_color_rand(rand_graph, rand_graph_data):
    from graphscope_spark.algorithms import lpa_by_color

    vertices, edges = rand_graph_data
    exp = oracle.lpa_by_color_oracle(edges, vertices)
    got = {r["vid"]: r["label"] for r in lpa_by_color(rand_graph).collect()}
    assert got == exp
    dist = {
        r["vid"]: r["label"]
        for r in lpa_by_color(rand_graph, local_finish_rows=0).collect()
    }
    assert dist == exp


def test_lpa_by_color_tiny(tiny_graph):
    from graphscope_spark.algorithms import lpa_by_color

    exp = oracle.lpa_by_color_oracle(TINY_EDGES, TINY_VERTICES)
    got = {r["vid"]: r["label"] for r in lpa_by_color(tiny_graph).collect()}
    assert got == exp


def test_min_edge_cover_distributed_matches_finisher(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp, _ = oracle.min_edge_cover_oracle(edges, vertices)
    assert (
        min_edge_cover(rand_graph, local_finish_rows=0).collect()[0]["size"] == exp
    )


def test_min_edge_cover_mid_switch(rand_graph, rand_graph_data):
    # switch to the single-task replay after some distributed rounds:
    # pending picks (p) must transfer into the replay state intact
    vertices, edges = rand_graph_data
    exp, _ = oracle.min_edge_cover_oracle(edges, vertices)
    n0 = len(vertices) + 2 * len({(min(s, d), max(s, d)) for s, d in edges if s != d})
    got = min_edge_cover(
        rand_graph, local_finish_rows=max(n0 // 2, 8)
    ).collect()[0]["size"]
    assert got == exp
