"""Pregel declarative API + Context surface tests."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from graphscope_spark.context import VertexDataContext
from graphscope_spark.pregel import pregel
from tests.conftest import TINY_EDGES, TINY_VERTICES
from tests import oracle


def test_pregel_sssp(tiny_graph):
    """SSSP expressed as a Pregel program matches the SSSP oracle
    (reference SSSP_Pregel, test_udf_app.py:104-140)."""
    src = 0
    res = pregel(
        tiny_graph,
        init=F.when(F.col("vid") == src, 0.0).otherwise(float("inf")),
        msg=F.col("value") + F.col("weight"),
        agg=F.min,
        apply=F.least(F.col("value"), F.coalesce("msg", F.lit(float("inf")))),
        name="pregel_sssp",
    )
    got = {r["vid"]: r["value"] for r in res.collect()}
    wedges = [(s, d, 1.0) for s, d in TINY_EDGES]
    exp = oracle.sssp_oracle(wedges, TINY_VERTICES, src, directed=True)
    for v in TINY_VERTICES:
        if math.isinf(exp[v]):
            assert math.isinf(got[v])
        else:
            assert abs(got[v] - exp[v]) < 1e-9


def test_pregel_min_label(tiny_graph):
    """Min-label flood = WCC on the symmetrized graph."""
    from graphscope_spark.graph import Graph

    g = Graph(
        tiny_graph.symmetrized(),
        tiny_graph.vertices,
        directed=True,
        num_partitions=4,
    )
    res = pregel(
        g,
        init=F.col("vid").cast("double"),
        msg=F.col("value"),
        agg=F.min,
        apply=F.least(F.col("value"), F.coalesce("msg", F.col("value"))),
        name="pregel_minlabel",
    )
    got = {r["vid"]: int(r["value"]) for r in res.collect()}
    assert got == oracle.wcc_oracle(TINY_EDGES, TINY_VERTICES)


def test_context_selectors(tiny_graph):
    from graphscope_spark.algorithms import wcc

    ctx = VertexDataContext(wcc(tiny_graph))
    pdf = ctx.to_dataframe({"node": "v.id", "r": "r"})
    assert list(pdf.columns) == ["node", "r"]
    assert len(pdf) == len(TINY_VERTICES)
    arr = ctx.to_numpy("r")
    exp = oracle.wcc_oracle(TINY_EDGES, TINY_VERTICES)
    assert np.array_equal(arr, np.array([exp[v] for v in sorted(exp)]))


def test_context_output(tiny_graph, tmp_path, spark):
    from graphscope_spark.algorithms import wcc

    ctx = VertexDataContext(wcc(tiny_graph))
    path = str(tmp_path / "out")
    ctx.output(path, format="parquet")
    back = spark.read.parquet(path)
    assert back.count() == len(TINY_VERTICES)
