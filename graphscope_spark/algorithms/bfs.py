"""BFS — level-synchronous frontier expansion.

Reference: grape::BFSOpt (.gs_conf.yaml:42-49) / bfs_generic
(apps/bfs/bfs_generic.h): per-vertex depth from a source vertex;
unreachable vertices get depth -1 in our output (the reference leaves
them at INT_MAX; -1 is the documented convention here and in the
oracle).

Spark plan: frontier DF of vertices discovered last round; one join
per level; newly discovered = dst's not yet labeled.  The frontier is
broadcast when small (FLASH sparse mode, api.h:272-338).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import StepResult, SuperstepRunner


def bfs(
    g: Graph,
    source: int,
    max_depth: int = 100,
    directed: bool | None = None,
    checkpoint_dir: str | None = None,
    sync_every: int = 4,
) -> DataFrame:
    """Returns (vid long, depth long); -1 for unreachable.

    ``sync_every`` levels chain lazily into ONE Spark job (frontier
    expansion past quiescence is idempotent — an empty frontier
    discovers nothing — so the termination check runs once per batch);
    the per-level job floor, not data volume, dominates BFS wall time
    on high-diameter graphs once |frontier| ≪ |V|.
    """
    spark = g.edges.sparkSession
    use_directed = g.directed if directed is None else directed
    edges = (g.distinct_edges() if use_directed else g.symmetrized()).cache()

    def init() -> DataFrame:
        return g.vertices.select(
            VID,
            F.when(F.col(VID) == source, F.lit(0)).otherwise(F.lit(-1)).cast("long").alias("depth"),
        )

    def step(state: DataFrame, k: int) -> StepResult:
        frontier = state.where(F.col("depth") == k).select(VID)
        nbrs = (
            edges.join(F.broadcast(frontier) if k < 2 else frontier, edges[SRC] == frontier[VID])
            .select(F.col(DST).alias(VID))
            .distinct()
        )
        nxt = state.join(nbrs.withColumn("hit", F.lit(1)), VID, "left").select(
            VID,
            F.when((F.col("depth") == -1) & F.col("hit").isNotNull(), F.lit(k + 1))
            .otherwise(F.col("depth"))
            .cast("long")
            .alias("depth"),
        )
        def delta_fn(m: DataFrame) -> float:
            # anything discovered in the final chained level of this
            # batch? 0 iff the whole batch quiesced (levels are monotone)
            return float(m.where(F.col("depth") == k + 1).count())

        return StepResult(nxt, delta_fn=delta_fn)

    run = SuperstepRunner(spark, "bfs", checkpoint_dir=checkpoint_dir)
    final = run.run(
        init,
        step,
        max_iterations=max_depth,
        tol=0.0,
        sync_every=max(1, sync_every),
        idempotent=True,
    )
    edges.unpersist()
    return final.select(VID, "depth")
