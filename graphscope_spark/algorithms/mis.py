"""Maximal independent set — deterministic parallel greedy.

Reference: FLASH `mis` / `mis-2` (.gs_conf.yaml:307-817,
apps/flash/matching/mis.h) — Luby-style rounds.  This implementation
uses vertex id as the priority, which makes the parallel rounds compute
EXACTLY the lexicographically-first MIS (the result of the sequential
greedy scan in increasing vid order) — deterministic across runs and
parallelism levels, hence oracle-checkable.

Per round (two joins over the active edge set):
  winners  = active vertices with vid < every active neighbor's vid
  losers   = active neighbors of winners
  active  -= winners ∪ losers
Terminates in O(log V) rounds w.h.p. on random orders; on real graphs
a handful.  Message volume is the active adjacency, which shrinks
geometrically — the frontier-shrinking pattern of wcc_projected.h:140-166.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.superstep import stats_barrier
from graphscope_spark.graph import DST, SRC, VID, Graph


def maximal_independent_set(g: Graph, max_rounds: int = 100) -> DataFrame:
    """Returns (vid long, in_mis boolean) — the lexicographically-first
    maximal independent set of the undirected (symmetrized) graph."""
    sym = g.symmetrized().select(SRC, DST)
    active_edges = sym.transform(stats_barrier)
    active = g.vertices.select(VID).transform(stats_barrier)
    chosen: DataFrame | None = None

    for _ in range(max_rounds):
        if active.isEmpty():
            break
        # min active-neighbor id per active vertex (isolated → none)
        min_nbr = active_edges.groupBy(F.col(SRC).alias(VID)).agg(
            F.min(DST).alias("mn")
        )
        winners = (
            active.join(min_nbr, VID, "left")
            .where(F.col("mn").isNull() | (F.col(VID) < F.col("mn")))
            .select(VID)
        ).transform(stats_barrier)
        chosen = winners if chosen is None else chosen.unionByName(winners)
        losers = (
            active_edges.join(
                winners.select(F.col(VID).alias(SRC)), SRC, "semi"
            )
            .select(F.col(DST).alias(VID))
            .distinct()
        )
        removed = winners.unionByName(losers)
        active = active.join(removed, VID, "anti").transform(stats_barrier)
        active_edges = (
            active_edges.join(removed.select(F.col(VID).alias(SRC)), SRC, "anti")
            .join(removed.select(F.col(VID).alias(DST)), DST, "anti")
        ).transform(stats_barrier)

    if chosen is None:
        return g.vertices.select(VID, F.lit(False).alias("in_mis"))
    flag = chosen.withColumn("in_mis", F.lit(True))
    return g.vertices.select(VID).join(flag, VID, "left").select(
        VID, F.coalesce("in_mis", F.lit(False)).alias("in_mis")
    )
