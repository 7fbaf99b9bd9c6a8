"""Strongly connected components — trim + forward/backward coloring
with pointer-doubling shortcuts.

Reference: FLASH `scc` / `scc-2` (.gs_conf.yaml:307-817,
apps/flash/connectivity/scc.h) — the standard parallel SCC scheme
(Orzan/FB-coloring, public): no sequential Tarjan pass, everything is
label propagation.

Rounds of three phases, all join+groupBy supersteps:
  1. TRIM: peel vertices with zero in- or out-degree within the active
     subgraph — each is its own singleton SCC.  (Removes the long
     acyclic tails that dominate real link graphs.)
  2. COLOR: color(v) = max vertex id that REACHES v, propagated
     forward to a fixed point.
  3. CAPTURE: within each color class, compute reach(v) = max same-
     class id REACHABLE FROM v; v belongs to the root's SCC iff
     reach(v) == color(v) (v both is reached by and reaches the class
     root).  Captured vertices are removed; the loop repeats.

Convergence trick (the scale-critical part): both propagations add a
POINTER-DOUBLING shortcut each round — color(v) also absorbs
color(color(v)) via a self-join on the label, so label information
hops 2^k vertices after k rounds instead of k.  A long path / big SCC
converges in O(log V) materialized rounds, not O(diameter); each round
stays one edge join + one label self-join.  Every phase touches only
the active edge set, which shrinks monotonically.

SCC id convention: MIN member vid (relabeled at the end), matching the
WCC component-id convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.superstep import stats_barrier
from graphscope_spark.graph import DST, SRC, VID, Graph


def _max_label_prop(
    edges: DataFrame,
    init: DataFrame,
    label: str,
    reverse: bool,
    max_prop: int,
) -> DataFrame:
    """Fixed point of label(v) = max(label(v), labels of in-neighbors
    [out-neighbors when reverse], label(label(v))).  ``init`` is
    (vid, <label>); edges flow src -> dst."""
    a, b = (DST, SRC) if reverse else (SRC, DST)
    state = init.transform(stats_barrier)
    for _ in range(max_prop):
        msgs = (
            edges.join(state, edges[a] == state[VID])
            .groupBy(edges[b].alias("_to"))
            .agg(F.max(label).alias("_m"))
        )
        sa = state.alias("sa")
        sj = state.alias("sj")
        nxt = (
            sa.join(msgs, F.col(f"sa.{VID}") == msgs["_to"], "left")
            .join(sj, F.col(f"sa.{label}") == F.col(f"sj.{VID}"), "left")
            .select(
                F.col(f"sa.{VID}").alias(VID),
                F.greatest(
                    F.col(f"sa.{label}"),
                    F.coalesce("_m", F.lit(-1)),
                    F.coalesce(F.col(f"sj.{label}"), F.lit(-1)),
                ).alias(label),
                (
                    F.greatest(
                        F.coalesce("_m", F.lit(-1)),
                        F.coalesce(F.col(f"sj.{label}"), F.lit(-1)),
                    )
                    > F.col(f"sa.{label}")
                ).alias("_ch"),
            )
            .transform(stats_barrier)
        )
        changed = nxt.agg(F.sum(F.col("_ch").cast("long"))).collect()[0][0] or 0
        state = nxt.select(VID, label)
        if changed == 0:
            break
    return state


def _scc_local_pdf(pdf):
    """Single-task whole-graph SCC: the same trim / forward-max-color /
    backward-capture scheme, vectorized in numpy (scatter-max over the
    edge arrays + pointer-doubling through the label array).  The output
    contract (vid, min member vid) is a pure graph property, so the
    replay is exact by definition; the numpy loop converges in the same
    O(log V) doubled rounds.  Rows: tag=1 → (a=vid); tag=0 → (a=src,
    b=dst)."""
    import numpy as np
    import pandas as pd

    v = pdf[pdf["tag"] == 1]
    e = pdf[pdf["tag"] == 0]
    vids = np.sort(v["a"].to_numpy(np.int64))
    n = vids.size
    if n == 0:
        return pd.DataFrame(
            {"vid": np.empty(0, np.int64), "scc": np.empty(0, np.int64)}
        )
    se = np.searchsorted(vids, e["a"].to_numpy(np.int64))
    de = np.searchsorted(vids, e["b"].to_numpy(np.int64))
    root = np.full(n, -1, np.int64)  # assigned component root POSITION
    active = np.ones(n, bool)
    while active.any():
        # trim: drop vertices with no in- or out-edge in the active set
        while True:
            has_out = np.zeros(n, bool)
            has_in = np.zeros(n, bool)
            has_out[se] = True
            has_in[de] = True
            keep = active & has_out & has_in
            trimmed = active & ~keep
            if not trimmed.any():
                break
            root[trimmed] = np.flatnonzero(trimmed)
            active = keep
            ek = active[se] & active[de]
            se, de = se[ek], de[ek]
        if not active.any():
            break
        # color: max position that reaches v (forward + doubling)
        idx = np.arange(n, dtype=np.int64)
        color = np.where(active, idx, np.int64(-1))
        while True:
            prev = color
            color = color.copy()
            np.maximum.at(color, de, color[se])
            color[active] = np.maximum(color[active], color[color[active]])
            if np.array_equal(color, prev):
                break
        # capture: max same-color position reachable FROM v
        samec = color[se] == color[de]
        cs, cd = se[samec], de[samec]
        reach = np.where(active, idx, np.int64(-1))
        while True:
            prev = reach
            reach = reach.copy()
            np.maximum.at(reach, cs, reach[cd])
            reach[active] = np.maximum(reach[active], reach[reach[active]])
            if np.array_equal(reach, prev):
                break
        captured = active & (reach == color)
        root[captured] = color[captured]
        active &= ~captured
        ek = active[se] & active[de]
        se, de = se[ek], de[ek]
    # relabel: min member vid per root
    lab = np.full(n, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(lab, root, vids)
    return pd.DataFrame({"vid": vids, "scc": lab[root]})


def strongly_connected_components(
    g: Graph, max_outer: int = 50, max_prop: int = 64, local_finish_rows: int = 4_000_000
) -> DataFrame:
    """Returns (vid long, scc long) — scc = min vid in the component."""
    edges = g.distinct_edges().select(SRC, DST).transform(stats_barrier)
    active = g.vertices.select(VID).transform(stats_barrier)

    # whole-graph single-task finisher: the (vid, min-member-vid) output
    # is algorithm-independent, so when the graph fits one executor task
    # the ~8 label-prop supersteps × outer rounds collapse into one
    # applyInPandas; the distributed path below remains the scale path
    # (local_finish_rows=0 forces it) and tests pin equality.
    if local_finish_rows > 0:
        if active.count() + edges.count() <= local_finish_rows:
            packed = active.select(
                F.lit(1).alias("tag"), F.col(VID).alias("a"), F.lit(0).cast("long").alias("b")
            ).unionByName(
                edges.select(
                    F.lit(0).alias("tag"), F.col(SRC).alias("a"), F.col(DST).alias("b")
                )
            )
            return (
                packed.withColumn("g", F.lit(1))
                .groupBy("g")
                .applyInPandas(_scc_local_pdf, f"{VID} long, scc long")
            )
    assigned: list[DataFrame] = []  # (vid, root) pieces

    for _ in range(max_outer):
        # ---- 1. trim: in/out-degree-0 vertices are singleton SCCs ----
        while True:
            outs = edges.select(F.col(SRC).alias(VID)).distinct()
            ins = edges.select(F.col(DST).alias(VID)).distinct()
            keep = active.join(outs, VID, "semi").join(ins, VID, "semi")
            trimmed = active.join(keep, VID, "anti").transform(stats_barrier)
            if trimmed.isEmpty():
                break
            assigned.append(trimmed.select(VID, F.col(VID).alias("root")))
            active = keep.transform(stats_barrier)
            edges = (
                edges.join(active.select(F.col(VID).alias(SRC)), SRC, "semi")
                .join(active.select(F.col(VID).alias(DST)), DST, "semi")
            ).transform(stats_barrier)
        if active.isEmpty():
            break

        # ---- 2. color: max id that reaches v (forward, doubled) ------
        color = _max_label_prop(
            edges,
            active.select(VID, F.col(VID).alias("color")),
            "color",
            reverse=False,
            max_prop=max_prop,
        )

        # ---- 3. capture: max same-class id reachable FROM v ----------
        ce = (
            edges.join(
                color.select(F.col(VID).alias(SRC), F.col("color").alias("cs")), SRC
            )
            .join(
                color.select(F.col(VID).alias(DST), F.col("color").alias("cd")), DST
            )
            .where(F.col("cs") == F.col("cd"))
            .select(SRC, DST)
        ).transform(stats_barrier)
        reach = _max_label_prop(
            ce,
            active.select(VID, F.col(VID).alias("reach")),
            "reach",
            reverse=True,
            max_prop=max_prop,
        )
        scc = (
            color.join(reach, VID)
            .where(F.col("reach") == F.col("color"))
            .select(VID, F.col("color").alias("root"))
        ).transform(stats_barrier)
        assigned.append(scc)
        active = active.join(scc.select(VID), VID, "anti").transform(stats_barrier)
        if active.isEmpty():
            break
        edges = (
            edges.join(active.select(F.col(VID).alias(SRC)), SRC, "semi")
            .join(active.select(F.col(VID).alias(DST)), DST, "semi")
        ).transform(stats_barrier)

    parts = assigned[0]
    for p in assigned[1:]:
        parts = parts.unionByName(p)
    # relabel each SCC by its minimum member id (the root from the
    # coloring phase is the MAX-id member)
    relabel = parts.groupBy("root").agg(F.min(VID).alias("scc"))
    return parts.join(relabel, "root").select(VID, "scc")
