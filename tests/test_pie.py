"""@pie decorator-parity API tests (reference decorators.py:51-116,
SSSP_PIE acceptance example test_udf_app.py:570-618)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphscope_spark.pie import pie, run_pie
from tests import oracle
from tests.conftest import TINY_EDGES, TINY_VERTICES


@pie(vd_type="double", md_type="double")
class SSSP_PIE:
    """The reference's SSSP_PIE program, DataFrame-native: Init
    registers init values + min-aggregate, PEval relaxes from the
    source, IncEval relaxes every settled vertex."""

    @staticmethod
    def Init(frag, context):
        src = context.get_config("src")
        context.init_value(
            F.when(F.col("vid") == src, 0.0).otherwise(float("inf")),
            aggregate="min",
        )

    @staticmethod
    def PEval(frag, context):
        src = context.get_config("src")
        e = frag.weighted_edges()
        return e.where(e["src"] == src).select(
            F.col("dst").alias("vid"), F.col("w").alias("msg")
        )

    @staticmethod
    def IncEval(frag, context):
        e = frag.weighted_edges()
        st = context.values
        return e.join(st, e["src"] == st["vid"]).select(
            e["dst"].alias("vid"), (st["value"] + e["w"]).alias("msg")
        )


def test_pie_sssp(tiny_graph):
    res = run_pie(tiny_graph, SSSP_PIE, config={"src": 0}, name="pie_sssp")
    got = {r["vid"]: r["value"] for r in res.collect()}
    wedges = [(s, d, 1.0) for s, d in TINY_EDGES]
    exp = oracle.sssp_oracle(wedges, TINY_VERTICES, 0, directed=True)
    for v in TINY_VERTICES:
        if math.isinf(exp[v]):
            assert math.isinf(got[v])
        else:
            assert abs(got[v] - exp[v]) < 1e-9


def test_pie_sssp_matches_sssp_app(tiny_graph):
    """@pie SSSP agrees exactly with the library sssp app."""
    from graphscope_spark.algorithms.sssp import sssp

    res = {r["vid"]: r["value"] for r in run_pie(
        tiny_graph, SSSP_PIE, config={"src": 2}, name="pie_sssp2"
    ).collect()}
    lib = {r["vid"]: r["dist"] for r in sssp(tiny_graph, source=2).collect()}
    assert set(res) == set(lib)
    for v, d in lib.items():
        if math.isinf(d):
            assert math.isinf(res[v])
        else:
            assert abs(res[v] - d) < 1e-9


def test_pie_min_label_wcc(tiny_graph):
    """Min-label flood as a PIE program = WCC."""
    from graphscope_spark.graph import Graph

    @pie(vd_type="double", md_type="double")
    class MinLabel_PIE:
        @staticmethod
        def Init(frag, context):
            context.init_value(F.col("vid").cast("double"), aggregate="min")

        @staticmethod
        def PEval(frag, context):
            e = frag.weighted_edges()
            st = context.values
            return e.join(st, e["src"] == st["vid"]).select(
                e["dst"].alias("vid"), st["value"].alias("msg")
            )

        IncEval = PEval

    g = Graph(
        tiny_graph.symmetrized(),
        tiny_graph.vertices,
        directed=True,
        num_partitions=4,
    )
    got = {
        r["vid"]: int(r["value"])
        for r in run_pie(g, MinLabel_PIE, name="pie_minlabel").collect()
    }
    assert got == oracle.wcc_oracle(TINY_EDGES, TINY_VERTICES)


def test_pie_decorator_validation():
    with pytest.raises(ValueError, match="missing necessary"):
        @pie()
        class Incomplete:
            @staticmethod
            def Init(frag, context):
                pass

    with pytest.raises(RuntimeError, match="decorated"):
        @pie()
        @pie()
        class Twice:
            @staticmethod
            def Init(frag, context):
                pass

            @staticmethod
            def PEval(frag, context):
                pass

            @staticmethod
            def IncEval(frag, context):
                pass

    with pytest.raises(ValueError, match="class definition"):
        pie()(lambda: None)

    with pytest.raises(ValueError, match="@pie"):
        run_pie(None, object)


def test_pie_unknown_aggregate(tiny_graph):
    @pie()
    class BadAgg:
        @staticmethod
        def Init(frag, context):
            context.init_value(F.lit(0.0), aggregate="median")

        @staticmethod
        def PEval(frag, context):
            return None

        IncEval = PEval

    with pytest.raises(ValueError, match="unknown aggregate"):
        run_pie(tiny_graph, BadAgg)
