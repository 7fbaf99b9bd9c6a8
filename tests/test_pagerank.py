"""PageRank vs the pure-Python oracle (pagerank_networkx.h semantics).

Mirrors the reference's allclose comparison (test_app.py:206-215)."""

from __future__ import annotations

import numpy as np

from graphscope_spark.algorithms import pagerank
from tests.conftest import TINY_EDGES, TINY_VERTICES
from tests.oracle import pagerank_oracle


def _compare(df, expected, tol=1e-6):
    got = {r["vid"]: r["rank"] for r in df.collect()}
    assert set(got) == set(expected)
    g = np.array([got[v] for v in sorted(got)])
    e = np.array([expected[v] for v in sorted(expected)])
    assert np.allclose(g, e, atol=tol), np.abs(g - e).max()


def test_pagerank_tiny(tiny_graph):
    expected = pagerank_oracle(TINY_EDGES, TINY_VERTICES)
    _compare(pagerank(tiny_graph), expected)


def test_pagerank_tiny_sums_to_one(tiny_graph):
    total = sum(r["rank"] for r in pagerank(tiny_graph).collect())
    assert abs(total - 1.0) < 1e-9


def test_pagerank_random(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    expected = pagerank_oracle(edges, vertices)
    _compare(pagerank(rand_graph), expected)


def test_pagerank_fixed_rounds(tiny_graph):
    # LDBC fixed-round convention: tol=None, exactly max_iter rounds
    expected = pagerank_oracle(TINY_EDGES, TINY_VERTICES, max_iter=10, tol=None)
    _compare(pagerank(tiny_graph, max_iter=10, tol=None), expected)


def test_pagerank_salted_hubs_matches_unsalted(rand_graph, rand_graph_data):
    """Explicit hub salting (graphscope_spark.skew) must not change the
    math — two-stage salted sums equal single-stage sums at any scale."""
    vertices, edges = rand_graph_data
    expected = pagerank_oracle(edges, vertices)
    # threshold low enough that the rand_graph hubs (vertices 0..2,
    # ~10% of all edges) definitely take the salted path
    _compare(pagerank(rand_graph, salt_hot_threshold=10, salt_n=4), expected)


def test_pagerank_chained_fixed_rounds(rand_graph, rand_graph_data):
    """sync_every>1 chains supersteps lazily into one job — results
    must be identical to the per-round-materialized run."""
    vertices, edges = rand_graph_data
    expected = pagerank_oracle(edges, vertices, max_iter=10, tol=None)
    _compare(pagerank(rand_graph, max_iter=10, tol=None, sync_every=5), expected)


def test_pagerank_checkpoint_resume(tiny_graph, tmp_path):
    """Kill after iteration k, resume from checkpoint → same output."""
    ckdir = str(tmp_path / "pr_ck")
    # run only 3 iterations by limiting max_iter, leaving checkpoints
    partial = pagerank(tiny_graph, max_iter=3, tol=None, checkpoint_dir=ckdir)
    partial.collect()
    # resume: same checkpoint dir, full iteration budget
    resumed = pagerank(tiny_graph, max_iter=10, tol=None, checkpoint_dir=ckdir)
    expected = pagerank_oracle(TINY_EDGES, TINY_VERTICES, max_iter=10, tol=None)
    _compare(resumed, expected)
