"""Louvain (synchronous, integer-score) vs the Python oracle."""

from __future__ import annotations

from graphscope_spark.algorithms import louvain
from graphscope_spark.graph import Graph
from tests.conftest import TINY_EDGES, TINY_VERTICES, make_random_graph
from tests import oracle


def _dict(df):
    return {r["vid"]: r["community"] for r in df.collect()}


def test_louvain_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge → two communities."""
    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7),
        (3, 4),
    ]
    vertices = list(range(8))
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in vertices], "vid long")
    g = Graph.from_edges(e, v, directed=False, num_partitions=4)
    got = _dict(louvain(g))
    exp = oracle.louvain_oracle(edges, vertices)
    assert got == exp
    # sanity: the two cliques end up in different communities
    assert got[0] == got[1] == got[2]
    assert got[5] == got[6] == got[7]
    assert got[0] != got[7]


def test_louvain_tiny(tiny_graph):
    got = _dict(louvain(tiny_graph))
    exp = oracle.louvain_oracle(TINY_EDGES, TINY_VERTICES)
    assert got == exp


def test_louvain_random(spark):
    vertices, edges = make_random_graph(n=120, seed=11)
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in vertices], "vid long")
    g = Graph.from_edges(e, v, directed=True, num_partitions=4)
    got = _dict(louvain(g))
    exp = oracle.louvain_oracle(edges, vertices)
    assert got == exp


def test_louvain_finisher_matches_distributed(spark):
    """The single-task numpy finisher replays the distributed rounds
    bit-identically (integer scores make this exact, not allclose)."""
    vertices, edges = make_random_graph(n=150, seed=23)
    # duplicate some edges so multiplicities > 1 exercise the fold
    edges = edges + edges[::5]
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in vertices], "vid long")
    g = Graph.from_edges(e, v, directed=True, num_partitions=4)
    local = _dict(louvain(g))  # small graph -> finisher path
    dist = _dict(louvain(g, local_finish_rows=0))  # forced distributed
    assert local == dist
    assert local == oracle.louvain_oracle(edges, vertices)
