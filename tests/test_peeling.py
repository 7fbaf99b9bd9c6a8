"""ArticleRank + peel-ordering family vs pure-Python oracles."""

from __future__ import annotations

from graphscope_spark.algorithms import (
    articlerank,
    degeneracy,
    degeneracy_ordering,
    kcore_size,
    onion_layers,
)
from tests.conftest import TINY_EDGES, TINY_VERTICES
from tests import oracle


def test_articlerank_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.articlerank_oracle(edges, vertices, rounds=10)
    got = {r["vid"]: r["rank"] for r in articlerank(rand_graph, max_iter=10).collect()}
    assert set(got) == set(exp)
    assert all(abs(got[v] - exp[v]) < 1e-9 for v in exp)


def test_articlerank_tiny(tiny_graph):
    exp = oracle.articlerank_oracle(TINY_EDGES, TINY_VERTICES, rounds=7)
    got = {r["vid"]: r["rank"] for r in articlerank(tiny_graph, max_iter=7).collect()}
    assert all(abs(got[v] - exp[v]) < 1e-9 for v in exp)


def test_degeneracy_ordering_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.degeneracy_ordering_oracle(edges, vertices)
    got = {r["vid"]: r["rank"] for r in degeneracy_ordering(rand_graph).collect()}
    assert got == exp
    core = oracle.core_number_oracle(edges, vertices)
    assert degeneracy(rand_graph).collect()[0]["degeneracy"] == max(core.values())


def test_onion_layers_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.onion_layers_oracle(edges, vertices)
    got = {r["vid"]: r["layer"] for r in onion_layers(rand_graph).collect()}
    assert got == exp


def test_onion_layers_tiny(tiny_graph):
    exp = oracle.onion_layers_oracle(TINY_EDGES, TINY_VERTICES)
    got = {r["vid"]: r["layer"] for r in onion_layers(tiny_graph).collect()}
    assert got == exp


def test_kcore_size_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = sum(oracle.kcore_oracle(edges, vertices, 3).values())
    assert kcore_size(rand_graph, 3).collect()[0]["size"] == exp


def test_peel_tail_matches_distributed(rand_graph, rand_graph_data):
    # the single-task tail replay must be bit-identical to the fully
    # distributed rounds (local_finish_rows=0 disables the tail), and a
    # mid-peel switch (tiny threshold forces distributed rounds first)
    # must land on the same ranks
    vertices, edges = rand_graph_data
    for fn, key in ((degeneracy_ordering, "rank"), (onion_layers, "layer")):
        dist = {r["vid"]: r[key] for r in fn(rand_graph, local_finish_rows=0).collect()}
        tail = {r["vid"]: r[key] for r in fn(rand_graph).collect()}
        n0 = len(vertices) + 2 * len(
            {(min(s, d), max(s, d)) for s, d in edges if s != d}
        )
        mid = {
            r["vid"]: r[key]
            for r in fn(rand_graph, local_finish_rows=max(n0 // 2, 8)).collect()
        }
        assert dist == tail == mid
