"""CSR-block kernel parity: gather == SQL join+agg, pagerank_csr ==
pagerank (allclose 1e-12), on the seeded power-law graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark.csr import CsrGraph, pagerank_csr
from graphscope_spark.graph import VID


@pytest.fixture(scope="module")
def csr(rand_graph, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csr") / "blocks")
    return CsrGraph.build(rand_graph.edges.select("src", "dst"), path, 8)


def test_gather_matches_sql(spark, rand_graph, csr):
    values = rand_graph.vertices.select(
        VID, (F.col(VID) % 7 + 1).cast("double").alias("c")
    ).repartition(8, VID)
    got = {
        r[VID]: r["contrib"] for r in csr.gather(values).collect()
    }
    vals = values.select(F.col(VID).alias("src"), "c")
    expect = {
        r["dst"]: r["s"]
        for r in rand_graph.edges.join(vals, "src")
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
        .collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == pytest.approx(expect[k], rel=1e-12)


def test_pagerank_csr_matches_sql(spark, rand_graph, tmp_path):
    sql_ranks = {
        r[VID]: r["rank"]
        for r in __import__(
            "graphscope_spark.algorithms", fromlist=["pagerank"]
        ).pagerank(rand_graph, max_iter=10, tol=None).collect()
    }
    csr_ranks = {
        r[VID]: r["rank"]
        for r in pagerank_csr(
            rand_graph, max_iter=10, tol=None, blocks_path=str(tmp_path / "b")
        ).collect()
    }
    assert set(csr_ranks) == set(sql_ranks)
    for k, v in sql_ranks.items():
        assert csr_ranks[k] == pytest.approx(v, abs=1e-12)


def test_pagerank_csr_chained_and_tol(spark, rand_graph, tmp_path):
    # chained fixed rounds == per-round materialization
    a = {
        r[VID]: r["rank"]
        for r in pagerank_csr(
            rand_graph, max_iter=6, tol=None, sync_every=3,
            blocks_path=str(tmp_path / "b1"),
        ).collect()
    }
    b = {
        r[VID]: r["rank"]
        for r in pagerank_csr(
            rand_graph, max_iter=6, tol=None, blocks_path=str(tmp_path / "b2")
        ).collect()
    }
    for k, v in b.items():
        assert a[k] == pytest.approx(v, abs=1e-12)
