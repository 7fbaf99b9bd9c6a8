"""Greedy graph coloring — FLASH speculative recoloring.

Reference semantics (apps/flash/clustering/color.h:48-82): every round,
every vertex recomputes c[v] = mex{c[u] : u ∈ N(v), pri(u) > pri(v)}
with priority pri = (degree, id); the loop runs until no vertex changes
color.  The fixpoint equals the sequential greedy coloring in
descending-priority order (Jones–Plassmann), reached in at most
priority-path-length rounds.

Spark plan per superstep: one (priority-filtered edges ⋈ state) join on
src, a collect_set per dst, and a JVM-side mex via
filter(sequence(0, |used|), x → x ∉ used)[0] — no Python UDF.  The
priority-filtered edge set (pri(src) > pri(dst)) is computed once and
cached: it halves message volume vs the full symmetric edge set and is
what makes the fixpoint a DAG iteration.  ``stats_barrier`` resets
Catalyst size estimates each round so planning cost stays constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import stats_barrier


def _coloring_local_pdf(pdf):
    """Single-task greedy coloring.  The speculative-recoloring fixpoint
    is UNIQUE — it equals the sequential greedy coloring in descending
    (degree, id) priority (Jones–Plassmann) — so computing that order
    directly is exact, no round replay needed.  Rows: tag=1 → (a=vid);
    tag=0 → (a=src, b=dst) of the symmetrized edge set."""
    import numpy as np
    import pandas as pd

    v = pdf[pdf["tag"] == 1]
    e = pdf[pdf["tag"] == 0]
    vids = np.sort(v["a"].to_numpy(np.int64))
    n = vids.size
    if n == 0:
        return pd.DataFrame(
            {"vid": np.empty(0, np.int64), "color": np.empty(0, np.int64)}
        )
    se = np.searchsorted(vids, e["a"].to_numpy(np.int64))
    de = np.searchsorted(vids, e["b"].to_numpy(np.int64))
    deg = np.bincount(se, minlength=n)
    # CSR over the symmetrized edges
    order = np.argsort(se, kind="stable")
    nbr = de[order]
    off = np.zeros(n + 1, np.int64)
    np.cumsum(deg, out=off[1:])
    # descending (degree, id): higher-priority vertices colored first
    pri = np.lexsort((-vids, -deg))
    color = np.zeros(n, np.int64)
    done = np.zeros(n, bool)
    stamp = np.full(n + 2, -1, np.int64)  # color -> last vertex using it
    for v_ in pri:
        for u in nbr[off[v_] : off[v_ + 1]]:
            if done[u]:
                stamp[color[u]] = v_
        c = 0
        while stamp[c] == v_:
            c += 1
        color[v_] = c
        done[v_] = True
    return pd.DataFrame({"vid": vids, "color": color})


def graph_coloring(
    g: Graph, max_rounds: int = 10000, local_finish_rows: int = 2_000_000
) -> DataFrame:
    """Returns (vid long, color long): greedy color by (degree, id)
    priority (color.h:56-58 check, :60-71 mex)."""
    sym = g.symmetrized().select(SRC, DST)

    # single-task finisher: the fixpoint is unique (sequential greedy in
    # priority order), so one task computes it exactly when the graph
    # fits; the cap is lower than elsewhere because the mex loop is
    # per-vertex Python, not vectorized numpy.  Distributed rounds below
    # remain the scale path (local_finish_rows=0) and tests pin equality.
    if local_finish_rows > 0:
        sym = stats_barrier(sym)
        if g.vertices.count() + sym.count() <= local_finish_rows:
            packed = g.vertices.select(
                F.lit(1).alias("tag"), F.col(VID).alias("a"), F.lit(0).cast("long").alias("b")
            ).unionByName(
                sym.select(F.lit(0).alias("tag"), F.col(SRC).alias("a"), F.col(DST).alias("b"))
            )
            return (
                packed.withColumn("g", F.lit(1))
                .groupBy("g")
                .applyInPandas(_coloring_local_pdf, f"{VID} long, color long")
            )

    deg = sym.groupBy(F.col(SRC).alias(VID)).agg(F.count(F.lit(1)).alias("d"))
    # edges whose source outranks the destination: (d, id) lexicographic
    pe = (
        sym.join(deg.select(F.col(VID).alias(SRC), F.col("d").alias("sd")), SRC)
        .join(deg.select(F.col(VID).alias(DST), F.col("d").alias("dd")), DST)
        .where(
            F.struct(F.col("sd"), F.col(SRC))
            > F.struct(F.col("dd"), F.col(DST))
        )
        .select(SRC, DST)
        .cache()
    )
    state = stats_barrier(
        g.vertices.select(VID, F.lit(0).cast("long").alias("color"))
    )
    for _ in range(max_rounds):
        used = (
            pe.join(
                state.select(F.col(VID).alias(SRC), F.col("color").alias("uc")),
                SRC,
            )
            .groupBy(F.col(DST).alias(VID))
            .agg(F.collect_set("uc").alias("used"))
        )
        # mex: smallest i in [0, |used|] not present (pigeonhole)
        nxt = state.join(used, VID, "left").select(
            VID,
            F.coalesce(
                F.element_at(
                    F.filter(
                        F.sequence(F.lit(0).cast("long"), F.size("used").cast("long")),
                        lambda x: ~F.array_contains(F.col("used"), x),
                    ),
                    1,
                ),
                F.lit(0).cast("long"),
            ).alias("color"),
        )
        nxt = stats_barrier(nxt)
        changed = (
            nxt.alias("n")
            .join(state.alias("o"), VID)
            .where(F.col("n.color") != F.col("o.color"))
        )
        state = nxt
        if changed.limit(1).count() == 0:
            break
    pe.unpersist()
    return state
