"""Betweenness (Brandes multi-source DataFrame form) vs Python oracle."""

from __future__ import annotations

import numpy as np

from graphscope_spark.algorithms import betweenness_centrality
from tests.conftest import TINY_EDGES, TINY_VERTICES
from tests import oracle


def _allclose(df, exp, atol=1e-9):
    got = {r["vid"]: r["betweenness"] for r in df.collect()}
    assert set(got) == set(exp)
    g = np.array([got[v] for v in sorted(got)])
    e = np.array([exp[v] for v in sorted(exp)])
    assert np.allclose(g, e, atol=atol), np.abs(g - e).max()


def test_betweenness_tiny(tiny_graph):
    exp = oracle.betweenness_oracle(TINY_EDGES, TINY_VERTICES)
    _allclose(betweenness_centrality(tiny_graph), exp)


def test_betweenness_random_small(spark):
    """50-vertex seeded graph — exact all-sources Brandes."""
    from graphscope_spark.graph import Graph
    from tests.conftest import make_random_graph

    vertices, edges = make_random_graph(n=50, seed=7)
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in vertices], "vid long")
    g = Graph.from_edges(e, v, directed=True, num_partitions=4)
    exp = oracle.betweenness_oracle(edges, vertices)
    # distributed wide-column kernel (the 10^12-scale path), oracle-pinned
    _allclose(betweenness_centrality(g, local_finish_rows=0), exp)


def test_betweenness_local_matches_distributed(spark):
    """The size-gated single-task finisher replays the distributed
    sweeps: same scores to 1e-9, with and without endpoints, sampled
    roots included."""
    from pyspark.sql import functions as F

    from graphscope_spark.graph import Graph
    from tests.conftest import make_random_graph

    vertices, edges = make_random_graph(n=60, seed=23)
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in vertices], "vid long")
    g = Graph.from_edges(e, v, directed=True, num_partitions=4)
    roots = g.vertices.where(F.col("vid") % 3 == 0)
    for ep in (False, True):
        dist = betweenness_centrality(
            g, roots=roots, endpoints=ep, local_finish_rows=0
        )
        exp = {r["vid"]: r["betweenness"] for r in dist.collect()}
        loc = betweenness_centrality(g, roots=roots, endpoints=ep)
        _allclose(loc, exp)


def test_betweenness_endpoints(spark):
    """endpoints=True (betweenness_centrality_generic.h ctx.endpoints /
    NX endpoints) vs the endpoint-counting oracle."""
    from graphscope_spark.graph import Graph
    from tests.conftest import make_random_graph

    vertices, edges = make_random_graph(n=40, seed=11)
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in vertices], "vid long")
    g = Graph.from_edges(e, v, directed=True, num_partitions=4)
    exp = oracle.betweenness_endpoints_oracle(edges, vertices)
    _allclose(betweenness_centrality(g, endpoints=True), exp)


def test_betweenness_weighted(spark):
    """weight= → Dijkstra-DAG Brandes (betweenness_centrality_generic.h
    dijkstra path) vs the weighted Python oracle.  Integer-valued
    weights keep float comparisons exact on both sides."""
    import random

    from graphscope_spark.graph import Graph

    rng = random.Random(5)
    n = 30
    wedges = []
    seen = set()
    for v in range(n):
        for _ in range(3):
            d = rng.randrange(n)
            if d != v and (v, d) not in seen:
                seen.add((v, d))
                wedges.append((v, d, float(rng.choice([1, 2, 3, 5, 8]))))
    e = spark.createDataFrame(wedges, "src long, dst long, weight double")
    v = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    g = Graph.from_edges(e, v, directed=True, num_partitions=4, weight="weight")
    exp = oracle.betweenness_weighted_oracle(wedges, list(range(n)))
    _allclose(betweenness_centrality(g, weight="weight"), exp)
    exp_ep = oracle.betweenness_weighted_oracle(
        wedges, list(range(n)), endpoints=True
    )
    _allclose(
        betweenness_centrality(g, weight="weight", endpoints=True), exp_ep
    )


def test_betweenness_sampled_scales(tiny_graph, spark):
    """Sampled roots scale by n/|roots|; with all roots explicitly
    passed the result equals the default."""
    roots = spark.createDataFrame([(v,) for v in TINY_VERTICES], "vid long")
    exp = oracle.betweenness_oracle(TINY_EDGES, TINY_VERTICES)
    _allclose(betweenness_centrality(tiny_graph, roots=roots), exp)
