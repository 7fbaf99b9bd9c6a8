"""Strongly connected components — trim + forward/backward coloring.

Reference: FLASH `scc` / `scc-2` (.gs_conf.yaml:307-817,
apps/flash/connectivity/scc.h) — the standard parallel SCC scheme
(Orzan/FB-coloring, public): no sequential Tarjan pass, everything is
label propagation.

Rounds of three phases, all join+groupBy supersteps:
  1. TRIM: peel vertices with zero in- or out-degree within the active
     subgraph — each is its own singleton SCC.  (Removes the long
     acyclic tails that dominate real link graphs.)
  2. COLOR: propagate max vertex id FORWARD to a fixed point; color(v)
     = max id that can reach v.
  3. CAPTURE: within each color class, propagate reachability BACKWARD
     from the color's root along same-color edges; vertices reached
     form one SCC (id = root), and are removed.
Every phase touches only the active edge set, which shrinks
monotonically.  SCC id convention: MIN member vid (relabeled at the
end), matching the WCC component-id convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph


def strongly_connected_components(
    g: Graph, max_outer: int = 50, max_prop: int = 200
) -> DataFrame:
    """Returns (vid long, scc long) — scc = min vid in the component."""
    spark = g.edges.sparkSession
    edges = g.distinct_edges().select(SRC, DST).localCheckpoint(eager=True)
    active = g.vertices.select(VID).localCheckpoint(eager=True)
    assigned: list[DataFrame] = []  # (vid, root) pieces

    for _ in range(max_outer):
        # ---- 1. trim: in/out-degree-0 vertices are singleton SCCs ----
        while True:
            outs = edges.select(F.col(SRC).alias(VID)).distinct()
            ins = edges.select(F.col(DST).alias(VID)).distinct()
            keep = active.join(outs, VID, "semi").join(ins, VID, "semi")
            trimmed = active.join(keep, VID, "anti").localCheckpoint(eager=True)
            if trimmed.isEmpty():
                break
            assigned.append(trimmed.select(VID, F.col(VID).alias("root")))
            active = keep.localCheckpoint(eager=True)
            edges = (
                edges.join(active.select(F.col(VID).alias(SRC)), SRC, "semi")
                .join(active.select(F.col(VID).alias(DST)), DST, "semi")
            ).localCheckpoint(eager=True)
        if active.isEmpty():
            break

        # ---- 2. color: forward max-id propagation to fixed point -----
        color = active.select(VID, F.col(VID).alias("color")).localCheckpoint(
            eager=True
        )
        for _ in range(max_prop):
            msgs = (
                edges.join(color, edges[SRC] == color[VID])
                .groupBy(DST)
                .agg(F.max("color").alias("mc"))
            )
            nxt = color.join(msgs, color[VID] == msgs[DST], "left").select(
                color[VID],
                F.greatest(F.col("color"), F.coalesce("mc", F.lit(-1))).alias("color"),
                (F.coalesce("mc", F.lit(-1)) > F.col("color")).alias("_ch"),
            ).localCheckpoint(eager=True)
            changed = nxt.agg(F.sum(F.col("_ch").cast("long"))).collect()[0][0] or 0
            color = nxt.select(VID, "color")
            if changed == 0:
                break

        # ---- 3. capture: backward reach from root within color -------
        # colored edges (same color on both ends), reversed
        ce = (
            edges.join(color.select(F.col(VID).alias(SRC), F.col("color").alias("cs")), SRC)
            .join(color.select(F.col(VID).alias(DST), F.col("color").alias("cd")), DST)
            .where(F.col("cs") == F.col("cd"))
            .select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))  # reversed
        ).localCheckpoint(eager=True)
        scc = color.where(F.col(VID) == F.col("color")).select(
            VID, F.col("color").alias("root")
        ).localCheckpoint(eager=True)
        frontier = scc
        for _ in range(max_prop):
            nxt = (
                ce.join(frontier, ce[SRC] == frontier[VID])
                .select(F.col(DST).alias(VID), "root")
                .distinct()
                .join(scc.select(VID), VID, "anti")
            ).localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            scc = scc.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        assigned.append(scc)
        active = active.join(scc.select(VID), VID, "anti").localCheckpoint(eager=True)
        if active.isEmpty():
            break
        edges = (
            edges.join(active.select(F.col(VID).alias(SRC)), SRC, "semi")
            .join(active.select(F.col(VID).alias(DST)), DST, "semi")
        ).localCheckpoint(eager=True)

    parts = assigned[0]
    for p in assigned[1:]:
        parts = parts.unionByName(p)
    # relabel each SCC by its minimum member id (the root from the
    # coloring phase is the MAX-id member)
    relabel = parts.groupBy("root").agg(F.min(VID).alias("scc"))
    return parts.join(relabel, "root").select(VID, "scc")
