"""SSSP — Bellman-Ford-style frontier relaxation.

Reference: grape::SSSPOpt / gs::SSSPProjected
(apps/projected/sssp_projected.h, .gs_conf.yaml:34-41): single-source
shortest paths over non-negative edge weights; distance DOUBLE;
unreachable = +inf (we emit NULL→infinity as a literal
``double('inf')``).

Spark plan: state (vid, dist); each round relaxes only edges out of
vertices improved last round (frontier-incremental, matching the
reference's curr_modified set), groupBy(dst).min(dist+w), keep the
smaller.  Converges when no distance improves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import StepResult, SuperstepRunner

INF = float("inf")


def sssp(
    g: Graph,
    source: int,
    weight: str | None = "weight",
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    sync_every: int = 4,
) -> DataFrame:
    """Returns (vid long, dist double); inf for unreachable.

    ``sync_every`` relaxation rounds chain lazily into ONE Spark job —
    min-relaxation past the fixpoint is idempotent, so the termination
    check (any distance changed in the batch's final round) legally
    runs once per batch; this is the same job-floor amortization as the
    multi-source wide sweep (multisource.py).
    """
    spark = g.edges.sparkSession
    cols = g.edges.columns
    if weight and weight in cols:
        edges = g.edges.select(SRC, DST, F.col(weight).cast("double").alias("w"))
    else:
        edges = g.edges.select(SRC, DST, F.lit(1.0).alias("w"))
    if not g.directed:
        edges = edges.unionByName(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w")
        )
    edges = edges.cache()

    def init() -> DataFrame:
        return g.vertices.select(
            VID,
            F.when(F.col(VID) == source, F.lit(0.0)).otherwise(F.lit(INF)).alias("dist"),
            (F.col(VID) == source).alias("changed"),
        )

    def step(state: DataFrame, k: int) -> StepResult:
        frontier = state.where(F.col("changed")).select(VID, "dist")
        relaxed = (
            edges.join(frontier, edges[SRC] == frontier[VID])
            .select(F.col(DST).alias(VID), (F.col("dist") + F.col("w")).alias("cand"))
            .groupBy(VID)
            .agg(F.min("cand").alias("cand"))
        )
        nxt = state.select(VID, "dist").join(relaxed, VID, "left").select(
            VID,
            F.least(F.col("dist"), F.coalesce("cand", F.lit(INF))).alias("dist"),
            (F.coalesce("cand", F.lit(INF)) < F.col("dist")).alias("changed"),
        )
        def delta_fn(m: DataFrame) -> float:
            updated = m.agg(F.sum(F.col("changed").cast("long"))).collect()[0][0] or 0
            return float(updated)

        return StepResult(nxt, delta_fn=delta_fn)

    run = SuperstepRunner(spark, "sssp", checkpoint_dir=checkpoint_dir)
    final = run.run(
        init,
        step,
        max_iterations=max_iter,
        tol=0.0,
        sync_every=max(1, sync_every),
        idempotent=True,
    )
    edges.unpersist()
    return final.select(VID, "dist")


def sssp_delta_stepping(
    g: Graph,
    source: int,
    weight: str | None = "weight",
    delta: float | None = None,
    max_inner: int = 1000,
) -> DataFrame:
    """Delta-stepping SSSP (apps/flash/traversal/sssp-dlt-step.h:43-92):
    distances settle bucket [a, a+Δ) at a time; within a bucket, light
    relaxations iterate to fixpoint; Δ defaults to 2·avg edge weight
    (:50-57).  Returns (vid long, dist double) — identical output to
    ``sssp`` (the driver oracle for both is the same SQL), but the
    bucketed sweep bounds the number of times any long-tail edge is
    re-relaxed, the property that matters when one shuffle per
    superstep costs minutes at 10^12-edge scale.
    """
    from graphscope_spark.superstep import stats_barrier

    cols = g.edges.columns
    if weight and weight in cols:
        edges = g.edges.select(SRC, DST, F.col(weight).cast("double").alias("w"))
    else:
        edges = g.edges.select(SRC, DST, F.lit(1.0).alias("w"))
    if not g.directed:
        edges = edges.unionByName(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w")
        )
    edges = edges.cache()
    if delta is None:
        row = edges.agg(F.sum("w").alias("s"), F.count(F.lit(1)).alias("m")).collect()[0]
        delta = 2.0 * float(row["s"]) / float(row["m"])

    state = stats_barrier(
        g.vertices.select(
            VID,
            F.when(F.col(VID) == source, F.lit(0.0))
            .otherwise(F.lit(INF))
            .alias("dist"),
        )
    )
    a = 0.0
    while True:
        b = a + delta
        frontier = state.where((F.col("dist") >= a) & (F.col("dist") < b)).select(
            VID, "dist"
        )
        for _ in range(max_inner):
            if frontier.limit(1).count() == 0:
                break
            relaxed = (
                edges.join(frontier.withColumnRenamed(VID, SRC), SRC)
                .select(
                    F.col(DST).alias(VID),
                    (F.col("dist") + F.col("w")).alias("cand"),
                )
                .groupBy(VID)
                .agg(F.min("cand").alias("cand"))
            )
            nxt = state.join(relaxed, VID, "left").select(
                VID,
                F.least(F.col("dist"), F.coalesce("cand", F.lit(INF))).alias("dist"),
                (F.coalesce("cand", F.lit(INF)) < F.col("dist")).alias("chg"),
            )
            state = stats_barrier(nxt.select(VID, "dist"))
            frontier = (
                nxt.where(F.col("chg") & (F.col("dist") >= a) & (F.col("dist") < b))
                .select(VID, "dist")
            )
        maxd = state.where(F.col("dist") < INF).agg(F.max("dist")).collect()[0][0]
        a = b
        if maxd is None or a > maxd:
            break
    edges.unpersist()
    return state.select(VID, "dist")
