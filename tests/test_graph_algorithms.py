"""WCC / CDLP / triangles / LCC / BFS / SSSP / HITS / k-core vs oracles.

Mirrors the reference's golden-comparison strategy: exact equality for
integer outputs, allclose for floats (test_app.py:136-234)."""

from __future__ import annotations

import numpy as np

from graphscope_spark.algorithms import (
    bfs,
    cdlp,
    degree_centrality,
    hits,
    kcore,
    lcc,
    sssp,
    triangle_count,
    triangles,
    wcc,
)
from tests.conftest import TINY_EDGES, TINY_VERTICES
from tests import oracle


def _dict(df, key="vid"):
    rows = df.collect()
    cols = [c for c in df.columns if c != key]
    if len(cols) == 1:
        return {r[key]: r[cols[0]] for r in rows}
    return {r[key]: tuple(r[c] for c in cols) for r in rows}


def test_wcc_tiny(tiny_graph):
    assert _dict(wcc(tiny_graph)) == oracle.wcc_oracle(TINY_EDGES, TINY_VERTICES)


def test_wcc_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.wcc_oracle(edges, vertices)
    assert _dict(wcc(rand_graph)) == exp
    # distributed frontier supersteps pinned equal to the finisher
    assert _dict(wcc(rand_graph, local_finish_rows=0)) == exp


def test_wcc_log_tiny(tiny_graph):
    from graphscope_spark.algorithms.wcc import wcc_log

    assert _dict(wcc_log(tiny_graph)) == oracle.wcc_oracle(TINY_EDGES, TINY_VERTICES)


def test_wcc_log_random(rand_graph, rand_graph_data):
    # star contraction must agree with frontier propagation bit-for-bit,
    # including isolated vertices (comp = own vid)
    from graphscope_spark.algorithms.wcc import wcc_log

    vertices, edges = rand_graph_data
    assert _dict(wcc_log(rand_graph)) == oracle.wcc_oracle(edges, vertices)


def test_cdlp_tiny(tiny_graph):
    exp = oracle.cdlp_oracle(TINY_EDGES, TINY_VERTICES, max_round=10, directed=True)
    assert _dict(cdlp(tiny_graph, max_round=10)) == exp


def test_cdlp_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.cdlp_oracle(edges, vertices, max_round=10, directed=True)
    assert _dict(cdlp(rand_graph, max_round=10)) == exp


def test_triangles_tiny(tiny_graph):
    exp = oracle.triangles_oracle(TINY_EDGES, TINY_VERTICES)
    got = _dict(triangles(tiny_graph))
    assert got == exp
    # Σ per-vertex = 3 × global (triangles.h:129-131; test_app.py:224-234)
    assert sum(got.values()) == 3 * triangle_count(tiny_graph)


def test_triangles_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.triangles_oracle(edges, vertices)
    got = _dict(triangles(rand_graph))
    assert got == exp
    assert sum(got.values()) == 3 * triangle_count(rand_graph)


def test_lcc_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.lcc_oracle(edges, vertices)
    got = _dict(lcc(rand_graph))
    assert set(got) == set(exp)
    g = np.array([got[v] for v in sorted(got)])
    e = np.array([exp[v] for v in sorted(exp)])
    assert np.allclose(g, e, atol=1e-9)


def test_bfs_tiny(tiny_graph):
    exp = oracle.bfs_oracle(TINY_EDGES, TINY_VERTICES, source=0, directed=True)
    assert _dict(bfs(tiny_graph, source=0)) == exp


def test_bfs_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.bfs_oracle(edges, vertices, source=1, directed=True)
    assert _dict(bfs(rand_graph, source=1)) == exp
    assert _dict(bfs(rand_graph, source=1, local_finish_rows=0)) == exp


def test_sssp_unit_weights(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.sssp_oracle([(s, d, 1.0) for s, d in edges], vertices, source=1)
    got = _dict(sssp(rand_graph, source=1))
    assert got == exp
    assert _dict(sssp(rand_graph, source=1, local_finish_rows=0)) == exp


def test_sssp_weighted(spark):
    edges = [(0, 1, 2.0), (0, 2, 5.0), (1, 2, 1.0), (2, 3, 1.0), (1, 3, 10.0)]
    from graphscope_spark.graph import Graph

    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    v = spark.createDataFrame([(i,) for i in range(5)], "vid long")
    g = Graph.from_edges(e, v, directed=True, num_partitions=4, weight="weight")
    exp = oracle.sssp_oracle(edges, list(range(5)), source=0)
    assert _dict(sssp(g, source=0)) == exp


def test_hits_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.hits_oracle(edges, vertices, max_iter=15)
    got = _dict(hits(rand_graph, max_iter=15))
    for v in vertices:
        assert abs(got[v][0] - exp[v][0]) < 1e-9, ("hub", v)
        assert abs(got[v][1] - exp[v][1]) < 1e-9, ("auth", v)


def test_kcore_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.kcore_oracle(edges, vertices, k=3)
    assert _dict(kcore(rand_graph, k=3)) == exp


def test_degree_centrality(tiny_graph):
    n = len(TINY_VERTICES)
    from collections import Counter

    ind = Counter(d for _, d in TINY_EDGES)
    outd = Counter(s for s, _ in TINY_EDGES)
    exp = {v: (ind[v] + outd[v]) / (n - 1) for v in TINY_VERTICES}
    got = _dict(degree_centrality(tiny_graph))
    for v in TINY_VERTICES:
        assert abs(got[v] - exp[v]) < 1e-12


def test_wcc_resume(tiny_graph, tmp_path):
    """Interrupted WCC resumes from checkpoint and matches the oracle."""
    ck = str(tmp_path / "wcc_ck")
    wcc(tiny_graph, max_iter=1, checkpoint_dir=ck)  # "crash" after iter 0
    got = _dict(wcc(tiny_graph, checkpoint_dir=ck))  # resume to convergence
    assert got == oracle.wcc_oracle(TINY_EDGES, TINY_VERTICES)


def test_sssp_delta_stepping_finisher_pinned(rand_graph, rand_graph_data):
    from graphscope_spark.algorithms.sssp import sssp_delta_stepping

    got = _dict(sssp_delta_stepping(rand_graph, source=1))
    dist = _dict(sssp_delta_stepping(rand_graph, source=1, local_finish_rows=0))
    assert got == dist


def test_sssp_delta_stepping_rand(rand_graph, rand_graph_data):
    from graphscope_spark.algorithms.sssp import sssp_delta_stepping

    vertices, edges = rand_graph_data
    exp = oracle.sssp_oracle([(s, d, 1.0) for s, d in edges], vertices, source=1)
    got = _dict(sssp_delta_stepping(rand_graph, source=1))
    assert got == exp


def test_sssp_delta_stepping_weighted(spark):
    from graphscope_spark.algorithms.sssp import sssp_delta_stepping
    from graphscope_spark.graph import Graph

    edges = [(0, 1, 2.0), (0, 2, 5.0), (1, 2, 1.0), (2, 3, 1.0), (1, 3, 10.0)]
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    v = spark.createDataFrame([(i,) for i in range(5)], "vid long")
    g = Graph.from_edges(e, v, directed=True, num_partitions=4, weight="weight")
    exp = oracle.sssp_oracle(edges, list(range(5)), source=0)
    assert _dict(sssp_delta_stepping(g, source=0)) == exp
    # explicit tiny delta exercises many buckets, same answer
    assert _dict(sssp_delta_stepping(g, source=0, delta=1.5)) == exp
