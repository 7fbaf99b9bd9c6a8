"""Incremental (streaming) PageRank: warm-started refresh must match a
cold batch run on the accumulated graph (streaming/incremental.py)."""

from __future__ import annotations

import numpy as np
import pytest

from graphscope_spark.algorithms import pagerank
from graphscope_spark.graph import Graph
from graphscope_spark.streaming.incremental import (
    IncrementalPageRank,
    stream_edges,
)
from tests.conftest import make_random_graph


def _edge_batches(n=200, seed=7, k=3):
    _, edges = make_random_graph(n=n, seed=seed)
    per = (len(edges) + k - 1) // k
    return [edges[i * per : (i + 1) * per] for i in range(k)]


def test_incremental_matches_batch(spark, tmp_path):
    batches = _edge_batches()
    inc = IncrementalPageRank(spark, str(tmp_path / "state"), tol=1e-9)
    for i, b in enumerate(batches):
        df = spark.createDataFrame(b, "src long, dst long")
        inc.process_batch(df, i)
    got = {r["vid"]: r["rank"] for r in inc.current_ranks().collect()}

    all_edges = [e for b in batches for e in b]
    g = Graph.from_edges(
        spark.createDataFrame(all_edges, "src long, dst long"), directed=True
    )
    exp = {r["vid"]: r["rank"] for r in pagerank(g, tol=1e-9).collect()}
    assert set(got) == set(exp)
    gv = np.array([got[v] for v in sorted(got)])
    ev = np.array([exp[v] for v in sorted(exp)])
    assert np.allclose(gv, ev, atol=1e-6)


def test_incremental_via_stream(spark, tmp_path):
    batches = _edge_batches(n=120, seed=11, k=2)
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    for i, b in enumerate(batches):
        spark.createDataFrame(b, "src long, dst long").coalesce(1).write.parquet(
            str(in_dir / f"batch_{i}")
        )
    inc = IncrementalPageRank(spark, str(tmp_path / "state"), tol=1e-8)
    q = inc.attach(stream_edges(spark, str(in_dir / "batch_*")))
    q.awaitTermination(120)
    assert inc.batches_seen >= 1
    ranks = inc.current_ranks()
    assert ranks is not None
    total = sum(r["rank"] for r in ranks.collect())
    assert abs(total - 1.0) < 1e-6
    metrics = (tmp_path / "state" / "metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) == inc.batches_seen


def test_incremental_wcc_matches_batch(spark, tmp_path):
    """Warm-started incremental WCC must EXACTLY equal a cold wcc run
    on the accumulated edges after every batch (min-vid contract)."""
    from graphscope_spark.algorithms import wcc
    from graphscope_spark.streaming.incremental import IncrementalWCC

    batches = _edge_batches(n=200, seed=13, k=3)
    inc = IncrementalWCC(spark, str(tmp_path / "state"))
    seen = []
    for i, b in enumerate(batches):
        seen.extend(b)
        inc.process_batch(spark.createDataFrame(b, "src long, dst long"), i)
        got = {r["vid"]: r["comp"] for r in inc.current_components().collect()}
        g = Graph.from_edges(
            spark.createDataFrame(seen, "src long, dst long"), directed=True
        )
        exp = {r["vid"]: r["comp"] for r in wcc(g).collect()}
        assert got == exp, f"divergence after batch {i}"


def test_incremental_wcc_via_stream(spark, tmp_path):
    from graphscope_spark.algorithms import wcc
    from graphscope_spark.streaming.incremental import IncrementalWCC

    batches = _edge_batches(n=120, seed=17, k=2)
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    for i, b in enumerate(batches):
        spark.createDataFrame(b, "src long, dst long").coalesce(1).write.parquet(
            str(in_dir / f"batch_{i}")
        )
    inc = IncrementalWCC(spark, str(tmp_path / "state"))
    q = inc.attach(stream_edges(spark, str(in_dir / "batch_*")))
    q.awaitTermination(300)
    got = {r["vid"]: r["comp"] for r in inc.current_components().collect()}
    all_edges = [e for b in batches for e in b]
    g = Graph.from_edges(
        spark.createDataFrame(all_edges, "src long, dst long"), directed=True
    )
    exp = {r["vid"]: r["comp"] for r in wcc(g).collect()}
    assert got == exp


def test_incremental_triangles_matches_batch(spark, tmp_path):
    from graphscope_spark.algorithms import triangles
    from graphscope_spark.streaming.incremental import IncrementalTriangles

    batches = _edge_batches(n=120, seed=3, k=3)
    inc = IncrementalTriangles(spark, str(tmp_path / "tri_state"))
    seen: list = []
    for i, b in enumerate(batches):
        inc.process_batch(spark.createDataFrame(b, "src long, dst long"), i)
        seen.extend(b)
        # exact per-vertex parity with a cold run after EVERY batch
        g = Graph.from_edges(
            spark.createDataFrame(seen, "src long, dst long"), directed=True
        )
        exp = {r["vid"]: r["tri"] for r in triangles(g).collect()}
        got = {r["vid"]: r["tri"] for r in inc.current_counts().collect()}
        for v, t in exp.items():
            assert got.get(v, 0) == t, (i, v, t, got.get(v, 0))
        # no spurious nonzero counts outside the vertex set
        assert all(t == 0 for v, t in got.items() if v not in exp)


def test_incremental_triangles_via_stream(spark, tmp_path):
    from graphscope_spark.algorithms import triangles
    from graphscope_spark.streaming.incremental import (
        IncrementalTriangles,
        stream_edges,
    )

    batches = _edge_batches(n=100, seed=19, k=2)
    in_dir = tmp_path / "tri_incoming"
    in_dir.mkdir()
    for i, b in enumerate(batches):
        spark.createDataFrame(b, "src long, dst long").coalesce(1).write.parquet(
            str(in_dir / f"batch_{i}")
        )
    inc = IncrementalTriangles(spark, str(tmp_path / "tri_state2"))
    q = inc.attach(stream_edges(spark, str(in_dir / "batch_*")))
    q.awaitTermination(120)
    all_edges = [e for b in batches for e in b]
    g = Graph.from_edges(
        spark.createDataFrame(all_edges, "src long, dst long"), directed=True
    )
    exp = {r["vid"]: r["tri"] for r in triangles(g).collect()}
    got = {r["vid"]: r["tri"] for r in inc.current_counts().collect()}
    for v, t in exp.items():
        assert got.get(v, 0) == t


def test_triangles_retry_is_idempotent(spark, tmp_path):
    """ADVICE r3: foreachBatch is at-least-once — replaying a batch
    (same batch_id, same data) must leave counts IDENTICAL, even after
    the earlier attempt completed fully (and, by the strictly-before
    read discipline, also after any partial write)."""
    from graphscope_spark.streaming.incremental import IncrementalTriangles
    from graphscope_spark.algorithms import triangles

    batches = _edge_batches(n=150, seed=23, k=3)
    inc = IncrementalTriangles(spark, str(tmp_path / "tstate"))
    for i, b in enumerate(batches):
        df = spark.createDataFrame(b, "src long, dst long")
        inc.process_batch(df, i)
        if i == 1:  # replay the middle batch — the double-apply repro
            inc.process_batch(df, i)
    got = {
        r["vid"]: r["tri"]
        for r in inc.current_counts().where("tri > 0").collect()
    }
    all_edges = [e for b in batches for e in b]
    g = Graph.from_edges(
        spark.createDataFrame(all_edges, "src long, dst long"), directed=True
    )
    exp = {
        r["vid"]: r["tri"]
        for r in triangles(g).where("tri > 0").collect()
    }
    assert got == exp


def test_pagerank_retry_is_idempotent(spark, tmp_path):
    batches = _edge_batches(n=120, seed=5, k=2)
    inc = IncrementalPageRank(spark, str(tmp_path / "pstate"), tol=1e-9)
    for i, b in enumerate(batches):
        df = spark.createDataFrame(b, "src long, dst long")
        inc.process_batch(df, i)
    inc.process_batch(
        spark.createDataFrame(batches[-1], "src long, dst long"), len(batches) - 1
    )
    got = {r["vid"]: r["rank"] for r in inc.current_ranks().collect()}
    all_edges = [e for b in batches for e in b]
    g = Graph.from_edges(
        spark.createDataFrame(all_edges, "src long, dst long"), directed=True
    )
    exp = {r["vid"]: r["rank"] for r in pagerank(g, tol=1e-9).collect()}
    assert set(got) == set(exp)
    gv = np.array([got[v] for v in sorted(got)])
    ev = np.array([exp[v] for v in sorted(exp)])
    assert np.allclose(gv, ev, atol=1e-6)


def test_replay_beyond_gc_window_raises(spark, tmp_path):
    """ADVICE r4: a checkpoint rollback of more than one batch must
    fail loudly, not silently cold-start (which would change the
    fixed-round result)."""
    batches = [
        spark.createDataFrame(b, "src long, dst long")
        for b in _edge_batches(n=60, seed=11, k=4)
    ]
    pr = IncrementalPageRank(spark, str(tmp_path / "st"), tol=None, max_iter=3)
    for i, b in enumerate(batches):
        pr.process_batch(b, i)
    # snapshots keep the last 2 (snap=2, snap=3); replaying batch 1
    # needs snap=0 which is GC'd, and batch=0 exists -> hard error
    with pytest.raises(RuntimeError, match="garbage-collected"):
        pr.process_batch(batches[1], 1)
    # replaying the CURRENT batch (one-batch window) still works
    pr.process_batch(batches[3], 3)
    # a genuine cold start on a fresh dir still works
    pr2 = IncrementalPageRank(spark, str(tmp_path / "st2"), tol=None, max_iter=3)
    pr2.process_batch(batches[0], 0)
