"""BFS-parent / SSSP variants / voterank / kshell / persistence tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphscope_spark.algorithms import (
    bfs_parent,
    kshell,
    sssp_average_length,
    sssp_has_path,
    voterank,
)
from graphscope_spark.graph import Graph
from graphscope_spark.persistence import add_column, load_graph, save_graph
from tests.conftest import TINY_EDGES, TINY_VERTICES
from tests import oracle


def _dict(df, key="vid"):
    rows = df.collect()
    cols = [c for c in df.columns if c != key]
    if len(cols) == 1:
        return {r[key]: r[cols[0]] for r in rows}
    return {r[key]: tuple(r[c] for c in cols) for r in rows}


def test_bfs_parent_tiny(tiny_graph):
    exp = oracle.bfs_parent_oracle(TINY_EDGES, TINY_VERTICES, source=0, directed=True)
    assert _dict(bfs_parent(tiny_graph, source=0)) == exp


def test_bfs_parent_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.bfs_parent_oracle(edges, vertices, source=0, directed=False)
    assert _dict(bfs_parent(rand_graph, source=0, directed=False)) == exp


def test_sssp_has_path(tiny_graph):
    # 0→3 reachable; 0→7 (isolated) not
    assert sssp_has_path(tiny_graph, 0, 3, weight=None).collect()[0]["has_path"]
    assert not sssp_has_path(tiny_graph, 0, 7, weight=None).collect()[0]["has_path"]


def test_sssp_average_length_tiny(spark, tiny_graph):
    roots = spark.createDataFrame([(0,), (4,)], "vid long")
    got = sssp_average_length(tiny_graph, sources=roots, weight=None).collect()[0][
        "avg_length"
    ]
    wedges = [(s, d, 1.0) for s, d in TINY_EDGES]
    exp = oracle.sssp_average_length_oracle(
        wedges, TINY_VERTICES, sources=[0, 4], directed=True
    )
    assert abs(got - exp) < 1e-9


def test_voterank_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.voterank_oracle(edges, vertices, num_seeds=5)
    got = [r["vid"] for r in voterank(rand_graph, num_seeds=5).orderBy("rank").collect()]
    assert got == exp
    # distributed path pinned bit-equal to the single-task finisher
    dist = [
        r["vid"]
        for r in voterank(rand_graph, num_seeds=5, local_finish_rows=0)
        .orderBy("rank")
        .collect()
    ]
    assert dist == exp


def test_kshell_tiny(tiny_graph):
    cores = oracle.core_number_oracle(TINY_EDGES, TINY_VERTICES)
    exp = {v: cores[v] == 2 for v in TINY_VERTICES}
    assert _dict(kshell(tiny_graph, k=2)) == exp


def test_graph_save_load_roundtrip(spark, tiny_graph, tmp_path):
    path = str(tmp_path / "g")
    save_graph(tiny_graph, path)
    g2 = load_graph(spark, path)
    assert g2.directed == tiny_graph.directed
    assert sorted(map(tuple, g2.edges.select("src", "dst").collect())) == sorted(
        map(tuple, tiny_graph.edges.select("src", "dst").collect())
    )
    assert g2.num_vertices() == tiny_graph.num_vertices()


def test_add_column(tiny_graph):
    from graphscope_spark.algorithms import wcc

    res = wcc(tiny_graph)
    g2 = add_column(tiny_graph, res, prefix="wcc_")
    assert "wcc_comp" in g2.vertices.columns
    assert g2.vertices.where(F.col("wcc_comp").isNull()).count() == 0


def test_graphar_roundtrip(spark, rand_graph, rand_graph_data, tmp_path):
    """GraphAr-layout export/import preserves the exact edge set,
    vertex set, and CSR offsets are consistent with per-chunk degrees."""
    import json
    import os

    from pyspark.sql import functions as F

    from graphscope_spark.persistence import load_graphar, save_graphar

    vertices, edges = rand_graph_data
    path = str(tmp_path / "gar")
    save_graphar(rand_graph, path, chunk_size=64)
    meta = json.load(open(os.path.join(path, "graphar.json")))
    assert meta["vertex_count"] == len(vertices)
    assert meta["vertex_chunks"] == (len(vertices) + 63) // 64

    g2 = load_graphar(spark, path)
    got_edges = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert got_edges == set(edges)
    assert {r["vid"] for r in g2.vertices.collect()} == set(vertices)

    # offsets: within each chunk, offset == running sum of degrees
    offs = spark.read.parquet(os.path.join(path, "edge", "offsets")).collect()
    by_chunk = {}
    for r in offs:
        by_chunk.setdefault(r["chunk"], []).append((r["src_index"], r["offset"], r["deg"]))
    for chunk, rows in by_chunk.items():
        rows.sort()
        acc = 0
        for _si, off, deg in rows:
            assert off == acc
            acc += deg
