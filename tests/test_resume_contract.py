"""The checkpoint/resume driver contract (north rule: resumable
mid-algorithm): a fresh runner pointed at a populated checkpoint dir
must CONTINUE from the latest on-disk iteration — provably skipping the
completed rounds — and the final state must equal the straight run
bit-for-bit (same floats, not just approx)."""

from __future__ import annotations

import pytest

from graphscope_spark.algorithms import pagerank
from graphscope_spark.graph import Graph
from graphscope_spark.superstep import SuperstepRunner


@pytest.fixture(scope="module")
def g(spark):
    edges = [(i, (i * 3 + 1) % 40) for i in range(40)] + [
        (i, (i * 7 + 2) % 40) for i in range(40)
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    return Graph.from_edges(e, directed=True, num_partitions=4)


def test_resume_skips_completed_rounds_and_matches_straight_run(spark, g, tmp_path):
    ck = str(tmp_path / "ck")
    r1 = SuperstepRunner(spark, "pagerank", checkpoint_dir=ck, resume=False)
    pagerank(g, alpha=0.85, max_iter=2, tol=None, runner=r1, sync_every=1).count()
    assert len(r1.metrics) == 2
    assert r1.latest_checkpoint() == 1

    r2 = SuperstepRunner(spark, "pagerank", checkpoint_dir=ck, resume=True)
    resumed = {
        r["vid"]: r["rank"]
        for r in pagerank(
            g, alpha=0.85, max_iter=5, tol=None, runner=r2, sync_every=1
        ).collect()
    }
    # resumed leg ran ONLY rounds 2-4 — the resume really resumed
    assert len(r2.metrics) == 3
    assert [m["iteration"] for m in r2.metrics] == [2, 3, 4]

    r3 = SuperstepRunner(spark, "pagerank", resume=False)
    straight = {
        r["vid"]: r["rank"]
        for r in pagerank(
            g, alpha=0.85, max_iter=5, tol=None, runner=r3, sync_every=1
        ).collect()
    }
    # bit-equality: the parquet round-trip preserves doubles exactly
    assert resumed == straight


def test_resume_ignores_dir_without_success_marker(spark, g, tmp_path):
    """An iteration directory missing _SUCCESS (a crashed write) must
    not be resumed from."""
    import os

    ck = str(tmp_path / "ck2")
    r1 = SuperstepRunner(spark, "pagerank", checkpoint_dir=ck, resume=False)
    pagerank(g, alpha=0.85, max_iter=2, tol=None, runner=r1, sync_every=1).count()
    os.remove(os.path.join(ck, "iter_00001", "_SUCCESS"))
    r2 = SuperstepRunner(spark, "pagerank", checkpoint_dir=ck, resume=True)
    assert r2.latest_checkpoint() == 0
