"""Declarative Pregel-style vertex-program API.

Reference analog: the ``@pregel(vd_type, md_type)`` decorator surface —
``Init(v, context)`` / ``Compute(messages, v, context)`` / optional
``Combine`` (python/graphscope/analytical/udf/decorators.py:124-160,
example SSSP_Pregel in tests/unittest/test_udf_app.py:104-140).  The
reference compiles user Python through Cython into a C++ app; here the
user's program is declared as **column expressions** and the "compile"
is Catalyst — no codegen machinery, no per-row Python.

A program is four pieces:

- ``init``: Column expression over the vertices DF → initial vertex value
- ``msg``: Column expression over (edge ⋈ src-state) → message value;
  reference ``send_msg_through_edges``
- ``agg``: an aggregate function combining messages per dst (F.min,
  F.sum, ...); reference ``Combine``
- ``apply``: Column expression over (old value ``value``, combined
  message ``msg``) → new value; vote-to-halt = value unchanged

Termination: when no vertex value changes (the reference's all-halted
condition) or ``max_iter``.

Example — SSSP as a Pregel program (mirrors SSSP_Pregel):

    res = pregel(
        g,
        init=F.when(F.col("vid") == src, 0.0).otherwise(float("inf")),
        msg=F.col("value") + F.col("weight"),
        agg=F.min,
        apply=F.least(F.col("value"), F.col("msg")),
    )
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import StepResult, SuperstepRunner


def pregel(
    g: Graph,
    init: Column,
    msg: Column,
    agg: Callable[[Column | str], Column],
    apply: Column,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    name: str = "pregel",
) -> DataFrame:
    """Run the vertex program; returns (vid, value).

    Expression contexts:
    - ``init`` sees the vertices DF columns (at least ``vid``).
    - ``msg`` sees edge columns (``src``, ``dst``, ``weight`` if any)
      plus the source vertex's current ``value``.
    - ``apply`` sees ``value`` (current) and ``msg`` (combined incoming,
      NULL if none).
    """
    spark = g.edges.sparkSession
    edges = g.edges if g.directed else g.symmetrized()
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1.0))
    edges = edges.cache()

    def _init() -> DataFrame:
        return g.vertices.select(VID, init.alias("value"))

    def step(state: DataFrame, k: int) -> StepResult:
        msgs = (
            edges.join(state, edges[SRC] == state[VID])
            .select(F.col(DST).alias(VID), msg.alias("m"))
            .groupBy(VID)
            .agg(agg("m").alias("msg"))
        )
        nxt = state.join(msgs, VID, "left").select(
            VID,
            apply.alias("value"),
            state["value"].alias("_old"),
        )

        def delta_fn(m: DataFrame) -> float:
            changed = m.where(
                ~F.col("value").eqNullSafe(F.col("_old"))
            ).count()
            return float(changed)

        return StepResult(nxt.select(VID, "value", "_old"), delta_fn=delta_fn)

    run = SuperstepRunner(spark, name, checkpoint_dir=checkpoint_dir)
    final = run.run(_init, step, max_iterations=max_iter, tol=0.0)
    edges.unpersist()
    return final.select(VID, "value")
