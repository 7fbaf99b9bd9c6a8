"""Path family (sampling/simple/DFS) vs pure-Python oracles."""

from __future__ import annotations

from graphscope_spark.algorithms import (
    all_simple_paths,
    dfs_preorder,
    is_simple_path,
    sampling_path,
)
from tests.conftest import TINY_EDGES, TINY_VERTICES
from tests import oracle


def test_sampling_path_tiny(tiny_graph):
    exp = oracle.sampling_path_oracle(TINY_EDGES, length=2, limit=5)
    got = [tuple(r) for r in sampling_path(tiny_graph, length=2, limit=5).collect()]
    assert got == exp


def test_sampling_path_rand(rand_graph, rand_graph_data):
    _, edges = rand_graph_data
    exp = oracle.sampling_path_oracle(edges, length=3, limit=50)
    got = [tuple(r) for r in sampling_path(rand_graph, length=3, limit=50).collect()]
    assert got == exp


def test_is_simple_path(tiny_graph):
    # 0→1→2→3 is a simple directed path in the tiny graph
    assert is_simple_path(tiny_graph, [0, 1, 2, 3]).collect()[0]["is_simple"]
    # 2→0 exists but 0→1→2→0 repeats vertex 0
    assert not is_simple_path(tiny_graph, [0, 1, 2, 0]).collect()[0]["is_simple"]
    # 1→0 is not an edge
    assert not is_simple_path(tiny_graph, [1, 0]).collect()[0]["is_simple"]
    assert is_simple_path(tiny_graph, [4]).collect()[0]["is_simple"]
    assert not is_simple_path(tiny_graph, [99]).collect()[0]["is_simple"]


def test_all_simple_paths_tiny(tiny_graph):
    exp = sorted(
        oracle.all_simple_paths_oracle(TINY_EDGES, TINY_VERTICES, 0, 3, cutoff=3)
    )
    got = sorted(
        (r["path"], r["hops"])
        for r in all_simple_paths(tiny_graph, 0, 3, cutoff=3).collect()
    )
    assert got == exp


def test_all_simple_paths_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = sorted(
        oracle.all_simple_paths_oracle(edges, vertices, 0, 1, cutoff=3)
    )
    got = sorted(
        (r["path"], r["hops"])
        for r in all_simple_paths(rand_graph, 0, 1, cutoff=3).collect()
    )
    assert got == exp


def test_dfs_preorder_tiny(tiny_graph):
    exp = oracle.dfs_preorder_oracle(TINY_EDGES, TINY_VERTICES)
    got = {r["vid"]: r["rank"] for r in dfs_preorder(tiny_graph).collect()}
    assert got == exp


def test_dfs_preorder_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.dfs_preorder_oracle(edges, vertices)
    got = {r["vid"]: r["rank"] for r in dfs_preorder(rand_graph).collect()}
    assert got == exp
