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


def _bfs_local_pdf_factory(source: int):
    """Single-task level BFS (hop depths are a unique graph property).
    Rows: tag=1 → (a=vid); tag=0 → (a=src, b=dst) in traversal
    direction."""

    def _pdf(pdf):
        import numpy as np
        import pandas as pd

        v = pdf[pdf["tag"] == 1]
        e = pdf[pdf["tag"] == 0]
        vids = np.sort(v["a"].to_numpy(np.int64))
        n = vids.size
        if n == 0:
            return pd.DataFrame(
                {"vid": np.empty(0, np.int64), "depth": np.empty(0, np.int64)}
            )
        se = np.searchsorted(vids, e["a"].to_numpy(np.int64))
        de = np.searchsorted(vids, e["b"].to_numpy(np.int64))
        depth = np.full(n, -1, np.int64)
        sp = np.searchsorted(vids, source)
        frontier = np.zeros(n, bool)
        if sp < n and vids[sp] == source:
            depth[sp] = 0
            frontier[sp] = True
        k = 0
        while frontier.any():
            k += 1
            nxt = np.zeros(n, bool)
            nxt[de[frontier[se]]] = True
            nxt &= depth == -1
            depth[nxt] = k
            frontier = nxt
        return pd.DataFrame({"vid": vids, "depth": depth})

    return _pdf


def bfs(
    g: Graph,
    source: int,
    max_depth: int = 100,
    directed: bool | None = None,
    checkpoint_dir: str | None = None,
    sync_every: int = 4,
    local_finish_rows: int = 4_000_000,
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

    # single-task finisher (depths are unique); distributed levels are
    # the scale path, and the only path under checkpointing or a
    # deliberately truncated max_depth
    if checkpoint_dir is None and max_depth >= 100 and local_finish_rows > 0:
        if g.vertices.count() + edges.count() <= local_finish_rows:
            packed = g.vertices.select(
                F.lit(1).alias("tag"), F.col(VID).alias("a"), F.lit(0).cast("long").alias("b")
            ).unionByName(
                edges.select(F.lit(0).alias("tag"), F.col(SRC).alias("a"), F.col(DST).alias("b"))
            )
            return (
                packed.withColumn("g", F.lit(1))
                .groupBy("g")
                .applyInPandas(_bfs_local_pdf_factory(source), f"{VID} long, depth long")
            )

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
