"""Skew-aware packed adjacency (skew.packed_adjacency): hub split
correctness and gather equivalence across the adjacency/edge-join
plans for PageRank, WCC, CDLP, SSSP."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from graphscope_spark import Graph
from graphscope_spark.skew import packed_adjacency
from tests.conftest import make_random_graph


@pytest.fixture(scope="module")
def hub_graph(spark):
    """Random graph + one 40-out-degree hub (vertex 999)."""
    vertices, edges = make_random_graph(n=120, seed=13)
    hub_edges = [(999, v) for v in vertices[:40]]
    all_edges = sorted(set(edges) | set(hub_edges))
    e = spark.createDataFrame(all_edges, "src long, dst long")
    v = spark.createDataFrame(
        [(i,) for i in vertices + [999]], "vid long"
    )
    return Graph.from_edges(e, v, directed=True, num_partitions=4)


def test_hub_split(spark, hub_graph):
    adj, rest = packed_adjacency(hub_graph.edges, cap=30)
    adj_srcs = {r["src"] for r in adj.select("src").collect()}
    rest_srcs = {r["src"] for r in rest.select("src").distinct().collect()}
    assert 999 not in adj_srcs           # über-degree source stays row-form
    assert rest_srcs == {999}
    # the two parts partition the edge multiset exactly
    n_adj = adj.select(F.explode("_nbrs")).count()
    assert n_adj + rest.count() == hub_graph.edges.count()


def test_weighted_struct_packing(spark):
    e = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 3.0), (1, 2, 4.0)], "src long, dst long, w double"
    )
    adj, rest = packed_adjacency(e, extra=["w"], cap=10)
    assert rest.count() == 0
    rows = {
        (r["src"], r["_nb"]["d"]): r["_nb"]["w"]
        for r in adj.select("src", F.explode("_nbrs").alias("_nb")).collect()
    }
    assert rows == {(0, 1): 2.0, (0, 2): 3.0, (1, 2): 4.0}


def test_pagerank_gather_paths_bit_equal(spark, hub_graph):
    from graphscope_spark.algorithms import pagerank

    a = {r["vid"]: r["rank"] for r in pagerank(
        hub_graph, tol=None, max_iter=5, adjacency=True).collect()}
    b = {r["vid"]: r["rank"] for r in pagerank(
        hub_graph, tol=None, max_iter=5, adjacency=False).collect()}
    assert set(a) == set(b)
    for v in a:  # order-insensitive to 1e-12; sums may reorder
        assert a[v] == pytest.approx(b[v], abs=1e-12), v


def test_wcc_gather_paths_identical(spark, hub_graph):
    from graphscope_spark.algorithms import wcc

    a = {r["vid"]: r["comp"] for r in wcc(
        hub_graph, local_finish_rows=0, adjacency=True).collect()}
    b = {r["vid"]: r["comp"] for r in wcc(
        hub_graph, local_finish_rows=0, adjacency=False).collect()}
    assert a == b  # min labels: exactly identical
