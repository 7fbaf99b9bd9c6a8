"""Fluid communities — synchronous density-based label propagation.

Reference semantics (apps/flash/clustering/fluid-community.h:73-106;
Parés et al., "Fluid Communities", 2017): s seed vertices start one
community each; every round a vertex evaluates the density
d_i = Σ_{u ∈ {v} ∪ N(v), lab(u)=i} 1/cnt_i of each community i in its
closed neighborhood (cnt_i = community size at round start) and moves
to the best community when it strictly beats its current one.

Determinism notes (deviations from the reference, which seeds from
``rand_r(time(NULL))`` and updates counts mid-sweep):
- seeds are a parameter (driver queries use the s smallest vertex ids);
- cnt_i is frozen at round start (synchronous), not sequentially
  updated during the sweep;
- every per-community density is the single exact IEEE division
  m_i / cnt_i (all members of community i contribute the same 1/cnt_i,
  so the sum collapses to one division) — bit-identical in Spark and
  any SQL oracle, so no epsilon is needed where the reference uses
  1e-10;
- ties pick the smallest community index; a vertex keeps its label
  unless strictly beaten (reference scan order, :82-84).

Spark plan per round: one (edges ⋈ labels) join, a groupBy
(dst, lab) count, a broadcast join against the s-row community-size
table, and a struct-max argmax — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import stats_barrier


def fluid_communities(
    g: Graph, seeds: list[int] | None = None, s: int = 10, rounds: int = 6
) -> DataFrame:
    """Returns (vid long, lab int): community index in [0, s) or -1 for
    vertices no fluid reached within ``rounds`` synchronous rounds."""
    sym = g.symmetrized().select(SRC, DST).cache()
    if seeds is None:
        seeds = [
            r[0]
            for r in g.vertices.select(VID).orderBy(VID).limit(s).collect()
        ]
    spark = g.edges.sparkSession
    seed_df = spark.createDataFrame(
        [(int(v), i) for i, v in enumerate(seeds)], f"{VID} long, seed_lab int"
    )
    state = stats_barrier(
        g.vertices.select(VID)
        .join(seed_df, VID, "left")
        .select(VID, F.coalesce("seed_lab", F.lit(-1)).alias("lab"))
    )
    for _ in range(rounds):
        cnt = (
            state.where(F.col("lab") >= 0)
            .groupBy("lab")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        members = state.where(F.col("lab") >= 0)
        # m_i per vertex: self + labeled neighbors, per community
        nbm = sym.join(
            members.select(F.col(VID).alias(SRC), F.col("lab").alias("nl")), SRC
        ).select(F.col(DST).alias(VID), F.col("nl").alias("lab"))
        selfm = members.select(VID, "lab")
        m = (
            nbm.unionByName(selfm)
            .groupBy(VID, "lab")
            .agg(F.count(F.lit(1)).alias("m"))
        )
        d = m.join(F.broadcast(cnt), "lab").select(
            VID, "lab", (F.col("m").cast("double") / F.col("cnt")).alias("dens")
        )
        # argmax by (dens, -lab): max density, ties to smallest index
        best = d.groupBy(VID).agg(
            F.max(F.struct(F.col("dens"), (-F.col("lab")).alias("nl"))).alias("b")
        ).select(VID, (-F.col("b.nl")).alias("blab"), F.col("b.dens").alias("bd"))
        cur = d.select(
            F.col(VID).alias("cv"), F.col("lab").alias("cl"), F.col("dens").alias("cd")
        )
        nxt = (
            state.join(best, VID, "left")
            .join(
                cur,
                (F.col(VID) == F.col("cv")) & (F.col("lab") == F.col("cl")),
                "left",
            )
            .select(
                VID,
                F.when(
                    F.col("blab").isNotNull()
                    & (
                        (F.col("lab") < 0)
                        | (F.col("bd") > F.coalesce("cd", F.lit(0.0)))
                    ),
                    F.col("blab"),
                )
                .otherwise(F.col("lab"))
                .cast("int")
                .alias("lab"),
            )
        )
        state = stats_barrier(nxt)
    sym.unpersist()
    return state
