"""Shared fixtures: one SparkSession per test run, seeded test graphs.

Graph fixtures mirror the reference's strategy (SURVEY.md §5): tiny
handcrafted graphs with dangling vertices / self-loops / duplicate
edges, plus a seeded p2p-31-style random graph with a power-law-ish
degree distribution so skew paths are exercised.
"""

from __future__ import annotations

import random

import pytest

from graphscope_spark.graph import Graph
from graphscope_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("graphscope_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


# tiny handcrafted digraph: 8 vertices; 7 is isolated+dangling; 3 is a
# dangling sink; contains a self-loop (4,4) and a duplicate edge (0,1).
TINY_VERTICES = list(range(8))
TINY_EDGES = [
    (0, 1),
    (0, 1),
    (0, 2),
    (1, 2),
    (2, 0),
    (2, 3),
    (4, 4),
    (4, 5),
    (5, 6),
    (6, 4),
    (5, 4),
]


def make_random_graph(n: int = 300, seed: int = 42) -> tuple[list[int], list[tuple[int, int]]]:
    """Seeded power-law-ish digraph: a few hubs receive ~10% of edges."""
    rng = random.Random(seed)
    vertices = list(range(n))
    hubs = vertices[:3]
    edges = set()
    for v in vertices:
        deg = rng.choice([1, 1, 2, 2, 3, 5, 8])
        for _ in range(deg):
            if rng.random() < 0.10:
                d = rng.choice(hubs)
            else:
                d = rng.randrange(n)
            if d != v:
                edges.add((v, d))
    # leave some vertices dangling (no out-edges)
    edges = {(s, d) for (s, d) in edges if s % 17 != 0}
    return vertices, sorted(edges)


@pytest.fixture(scope="session")
def tiny_graph(spark):
    e = spark.createDataFrame(TINY_EDGES, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in TINY_VERTICES], "vid long")
    return Graph.from_edges(e, v, directed=True, num_partitions=4)


@pytest.fixture(scope="session")
def rand_graph_data():
    return make_random_graph()


@pytest.fixture(scope="session")
def rand_graph(spark, rand_graph_data):
    vertices, edges = rand_graph_data
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in vertices], "vid long")
    return Graph.from_edges(e, v, directed=True, num_partitions=8)
