"""@pie decorator-parity API — PEval/IncEval programs on DataFrames.

Reference analog: the ``@pie(vd_type, md_type)`` decorator surface
(python/graphscope/analytical/udf/decorators.py:51-116): a class with
static ``Init(frag, context)`` / ``PEval(frag, context)`` /
``IncEval(frag, context)`` methods, vertex values updated through a
registered aggregate (``PIEAggregateType.kMinAggregate`` etc.), run
until no value changes.  Acceptance example: SSSP_PIE
(tests/unittest/test_udf_app.py:570-618).

The reference compiles the user's Python through Cython into a C++
GRAPE app; here the program DECLARES DataFrame plans and the "compile"
is Catalyst.  The fragment loops of the reference (``for v in
inner_nodes: for e in outgoing_edges``) become message DataFrames:
``PEval`` / ``IncEval`` return (vid, msg) DataFrames; the runtime
combines messages per vertex with the registered aggregate and applies
them to the state with the same aggregate (exactly the reference's
aggregate-on-sync contract), checkpointing per superstep via
SuperstepRunner so runs resume mid-algorithm.

Example — SSSP as a PIE program::

    @pie(vd_type="double", md_type="double")
    class SSSP_PIE:
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

    result = run_pie(g, SSSP_PIE, config={"src": 3})   # (vid, value)
"""

from __future__ import annotations

import inspect
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import StepResult, SuperstepRunner

PIE_NECESSARY_DEFS = ("Init", "PEval", "IncEval")

# PIEAggregateType analogs (grape::PIEAggregateType, decorators.py usage)
_AGGREGATES: dict[str, tuple[Callable, Callable[[Column, Column], Column]]] = {
    "min": (F.min, lambda value, msg: F.least(value, msg)),
    "max": (F.max, lambda value, msg: F.greatest(value, msg)),
    "sum": (F.sum, lambda value, msg: value + F.coalesce(msg, F.lit(0))),
}


def pie(vd_type: str = "double", md_type: str = "double"):
    """Decorator marking a class as a PIE program.

    Mirrors the reference's validation (decorators.py:86-116): must
    decorate a class, the class must define Init / PEval / IncEval,
    and double decoration is rejected."""

    def _wrapper(algo):
        if hasattr(algo, "__decorated__"):
            raise RuntimeError("Can't decorate on decorated class.")
        if not inspect.isclass(algo):
            raise ValueError('The decorator "pie" must be used on a class definition')
        for need in PIE_NECESSARY_DEFS:
            member = getattr(algo, need, None)
            if member is None or not inspect.isroutine(member):
                raise ValueError(f"PIE program missing necessary definition: {need}")
        algo.__decorated__ = "pie"
        algo.__pie_types__ = (vd_type, md_type)
        return algo

    return _wrapper


class PIEFragment:
    """The ``frag`` handle a PIE program sees — a thin view over the
    Graph (the reference's fragment; adjacency loops there are edge
    DataFrames here)."""

    def __init__(self, g: Graph):
        self.graph = g
        self.directed = g.directed

    def vertices(self) -> DataFrame:
        return self.graph.vertices

    def edges(self) -> DataFrame:
        e = self.graph.edges if self.graph.directed else self.graph.symmetrized()
        return e

    def weighted_edges(self, weight: str = "weight") -> DataFrame:
        """(src, dst, w): edge table with a double weight column
        (1.0 when the graph is unweighted), symmetrized when the
        graph is undirected."""
        cols = self.graph.edges.columns
        if weight in cols:
            e = self.graph.edges.select(
                SRC, DST, F.col(weight).cast("double").alias("w")
            )
        else:
            e = self.graph.edges.select(SRC, DST, F.lit(1.0).alias("w"))
        if not self.graph.directed:
            e = e.unionByName(
                e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w")
            )
        return e


class PIEContext:
    """The ``context`` handle: config access + vertex-state surface.

    ``init_value(expr, aggregate)`` is the analog of the reference's
    ``context.init_value(nodes, label, v, PIEAggregateType.k*)``;
    ``values`` is the current (vid, value) state DataFrame the
    program reads where the reference calls ``get_node_value``."""

    def __init__(self, config: dict | None):
        self._config = dict(config or {})
        self._init_expr: Column | None = None
        self._agg_name: str | None = None
        self.values: DataFrame | None = None
        self.superstep: int = 0

    def get_config(self, key: str, default=None):
        return self._config.get(key, default)

    def init_value(self, expr: Column | float, aggregate: str = "min") -> None:
        if aggregate not in _AGGREGATES:
            raise ValueError(
                f"unknown aggregate {aggregate!r}; one of {sorted(_AGGREGATES)}"
            )
        self._init_expr = expr if isinstance(expr, Column) else F.lit(expr)
        self._agg_name = aggregate


def run_pie(
    g: Graph,
    algo,
    config: dict | None = None,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    name: str | None = None,
) -> DataFrame:
    """Execute a ``@pie`` program; returns (vid, value).

    Superstep 0 runs ``PEval``; supersteps 1.. run ``IncEval`` until no
    vertex value changes (the reference's all-converged condition) or
    ``max_iter``.  Each superstep: program returns a (vid, msg)
    DataFrame → combine per vertex with the registered aggregate →
    apply with the same aggregate → checkpoint via SuperstepRunner
    (resume + per-round metrics come for free)."""
    if getattr(algo, "__decorated__", None) != "pie":
        raise ValueError("run_pie expects a class decorated with @pie")
    spark = g.edges.sparkSession
    frag = PIEFragment(g)
    ctx = PIEContext(config)
    algo.Init(frag, ctx)
    if ctx._init_expr is None:
        raise ValueError("PIE Init must call context.init_value(...)")
    combine, apply_fn = _AGGREGATES[ctx._agg_name]

    def _init() -> DataFrame:
        return g.vertices.select(VID, ctx._init_expr.alias("value"))

    def step(state: DataFrame, k: int) -> StepResult:
        ctx.values = state.select(VID, "value")
        ctx.superstep = k
        msgs_raw = algo.PEval(frag, ctx) if k == 0 else algo.IncEval(frag, ctx)
        if msgs_raw is None:
            msgs_raw = spark.createDataFrame([], "vid long, msg double")
        msgs = msgs_raw.groupBy(VID).agg(combine("msg").alias("msg"))
        nxt = state.join(msgs, VID, "left").select(
            VID,
            F.when(
                F.col("msg").isNull(), F.col("value")
            ).otherwise(apply_fn(F.col("value"), F.col("msg"))).alias("value"),
            state["value"].alias("_old"),
        )

        def delta_fn(m: DataFrame) -> float:
            return float(m.where(~F.col("value").eqNullSafe(F.col("_old"))).count())

        return StepResult(nxt.select(VID, "value", "_old"), delta_fn=delta_fn)

    run = SuperstepRunner(
        spark, name or f"pie_{algo.__name__}", checkpoint_dir=checkpoint_dir
    )
    final = run.run(_init, step, max_iterations=max_iter, tol=0.0)
    return final.select(VID, "value")
