"""MutableGraph — NX-style in-place mutation surface
(reference dynamic_fragment.h:72,1505 ModifyVertices/ModifyEdges)."""

from __future__ import annotations

from graphscope_spark.graph import Graph
from graphscope_spark.mutable import MutableGraph


def test_mutable_build_and_read(spark):
    g = MutableGraph(spark, directed=False, num_partitions=4)
    g.add_edges_from([(0, 1), (1, 2), (2, 0), (2, 3)])
    g.add_node(9)
    assert g.number_of_nodes() == 5
    assert g.number_of_edges() == 4
    assert g.has_edge(1, 0)  # undirected
    assert g.has_node(9) and not g.has_node(4)
    assert g.edges() == [(0, 1), (0, 2), (1, 2), (2, 3)]


def test_mutable_ordered_ops(spark):
    """Op order matters: add → remove → re-add must land as present."""
    g = MutableGraph(spark, directed=True, num_partitions=4)
    g.add_edge(0, 1)
    g.remove_edge(0, 1)
    assert not g.has_edge(0, 1)
    g.add_edge(0, 1)
    assert g.has_edge(0, 1)
    g.add_edge(1, 2)
    g.remove_node(1)  # removes 1 and both incident edges
    assert g.nodes() == [0, 2]
    assert g.edges() == []


def test_mutable_algorithms_between_mutations(spark):
    from graphscope_spark import nx as gnx

    g = MutableGraph(spark, directed=False, num_partitions=4)
    g.add_edges_from([(0, 1), (1, 2), (3, 4)])
    assert gnx.number_connected_components(g.graph) == 2
    g.add_edge(2, 3)
    assert gnx.number_connected_components(g.graph) == 1
    g.remove_edge(2, 3)
    assert gnx.number_connected_components(g.graph) == 2


def test_mutable_from_graph(spark, tiny_graph):
    mg = MutableGraph.from_graph(tiny_graph)
    n0 = mg.number_of_nodes()
    mg.add_node(100)
    assert mg.number_of_nodes() == n0 + 1
    assert isinstance(mg.graph, Graph)
