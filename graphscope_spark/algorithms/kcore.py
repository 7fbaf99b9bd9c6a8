"""k-core — iterative degree pruning.

Reference: grape kcore (.gs_conf.yaml:156-161, apps/kcore/kcore.h):
repeatedly remove vertices with degree < k (undirected) until the
remaining subgraph is stable; output = membership of the k-core.

Spark plan: state (vid, active); each round recomputes degrees among
active vertices (join both endpoints against the active set) and
deactivates those below k.  Converged when nothing was removed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import StepResult, SuperstepRunner


def kcore(
    g: Graph, k: int, max_iter: int = 100, checkpoint_dir: str | None = None
) -> DataFrame:
    """Returns (vid long, in_core boolean)."""
    spark = g.edges.sparkSession
    sym = g.symmetrized().cache()

    def init() -> DataFrame:
        return g.vertices.select(VID, F.lit(True).alias("active"))

    def step(state: DataFrame, it: int) -> StepResult:
        active = state.where(F.col("active")).select(VID)
        live = (
            sym.join(active.withColumnRenamed(VID, SRC), SRC)
            .join(active.withColumnRenamed(VID, DST), DST)
        )
        deg = live.groupBy(F.col(SRC).alias(VID)).agg(F.count(F.lit(1)).alias("deg"))
        nxt = state.select(VID, "active").join(deg, VID, "left").select(
            VID,
            (F.col("active") & (F.coalesce("deg", F.lit(0)) >= k)).alias("active"),
            F.col("active").alias("was"),
        )
        def delta_fn(m: DataFrame) -> float:
            return float(m.where(F.col("was") & ~F.col("active")).count())

        return StepResult(nxt, delta_fn=delta_fn)

    run = SuperstepRunner(spark, f"kcore_{k}", checkpoint_dir=checkpoint_dir)
    final = run.run(init, step, max_iterations=max_iter, tol=0.0)
    sym.unpersist()
    return final.select(VID, F.col("active").alias("in_core"))
