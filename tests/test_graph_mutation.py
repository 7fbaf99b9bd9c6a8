"""Functional MODIFY_VERTICES / MODIFY_EDGES analogs
(dag_utils.py:359-412,639-708 — NX mutable-graph ops, here as
immutable Graph→Graph updates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphscope_spark.graph import Graph


def _g(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    verts = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "vid long, tag string")
    return Graph.from_edges(edges, vertices=verts, num_partitions=4)


def test_add_vertices(spark):
    g = _g(spark)
    g2 = g.add_vertices(spark.createDataFrame([(2,), (5,)], "vid long"))
    rows = {r["vid"]: r["tag"] for r in g2.vertices.collect()}
    assert rows == {0: "a", 1: "b", 2: "c", 5: None}  # existing row kept


def test_add_edges_adds_endpoints(spark):
    g = _g(spark)
    g2 = g.add_edges(spark.createDataFrame([(2, 7)], "src long, dst long"))
    assert sorted((r["src"], r["dst"]) for r in g2.edges.collect()) == [
        (0, 1),
        (1, 2),
        (2, 7),
    ]
    assert 7 in {r["vid"] for r in g2.vertices.collect()}


def test_remove_edges_and_vertices(spark):
    g = _g(spark)
    g2 = g.remove_edges(spark.createDataFrame([(0, 1)], "src long, dst long"))
    assert [(r["src"], r["dst"]) for r in g2.edges.collect()] == [(1, 2)]
    g3 = g.remove_vertices(spark.createDataFrame([(1,)], "vid long"))
    assert g3.edges.count() == 0  # both edges touched vid 1
    assert {r["vid"] for r in g3.vertices.collect()} == {0, 2}


def test_algorithms_run_on_mutated_graph(spark):
    from graphscope_spark.algorithms import wcc

    g = _g(spark).add_edges(spark.createDataFrame([(7, 8)], "src long, dst long"))
    comp = {r["vid"]: r["comp"] for r in wcc(g).collect()}
    assert comp[8] == 7 and comp[2] == 0


def test_partition_report_matches_python(spark):
    from graphscope_spark.graph import Graph, partition_report

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 1), (5, 5), (6, 2), (7, 0)]
    g = Graph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), directed=True
    )
    p = 3
    got = {
        r["part"]: (r["vertices"], r["owned_edges"], r["cut_edges"], r["cut_frac"])
        for r in partition_report(g, p=p).collect()
    }
    verts = sorted({v for e in edges for v in e})
    exp = {}
    for part in range(p):
        vs = [v for v in verts if v % p == part]
        owned = [(s, d) for s, d in edges if s % p == part]
        cut = [(s, d) for s, d in owned if s % p != d % p]
        if vs or owned:
            exp[part] = (
                len(vs),
                len(owned),
                len(cut),
                round(len(cut) / max(len(owned), 1), 8),
            )
    assert got == exp
