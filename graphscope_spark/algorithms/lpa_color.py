"""Color-scheduled label propagation — FLASH ``lpa_by_color``.

Reference semantics (apps/flash/clustering/lpa-by-color.h:44-146,
registry .gs_conf.yaml `flash_lpa_by_color`): first greedy-color the
graph by (degree, id) priority (same fixpoint as clustering/color.h,
`lpa-by-color.h:52-82`), then run label propagation where, within each
sweep, the color classes are processed SEQUENTIALLY in ascending color
order (`lpa-by-color.h:120-131` — `cset[j]` loop): class j's update
sees the labels already rewritten by classes 0..j-1 of the same sweep.
Because a color class is an independent set, updates within a class
never read each other — this is the classic "asynchronous LPA made
deterministic by coloring" schedule, which converges where synchronous
LPA can oscillate on bipartite structures.

Per-vertex rule (`lpa-by-color.h:109-118` `relabel`): adopt the most
frequent label over ALL neighbors (undirected); isolated vertices keep
their label.  The reference breaks frequency ties by adjacency-iteration
order (first neighbor to reach the max count — order-dependent across
partitionings); this rebuild uses the deterministic LDBC tie-break
(max count, then MINIMUM label), the same convention the reference
itself adopted for CDLP (docs/performance_and_benchmark.md:14).
The staleness filter (`lpa-by-color.h:123-143` `t`/`nowt` bookkeeping)
is a work-skipping heuristic — classes whose neighborhoods have not
changed recompute to the same labels — so it is omitted; the fixpoint
reached (no label changes over a full sweep) is the same.

Spark shape: message edges are pre-joined with the destination's color
ONCE and cached; each class stage is then a pushed-filter slice of that
cached table (`color = c`) joined with the current labels + ONE hash
aggregate picking max(struct(cnt, -label)) — the stages of a sweep
chain lazily (localCheckpoint(eager=False)) into few jobs, and the
sweep ends with a stats barrier + one changed-row check.  Classes
partition the vertices, so a full sweep ships exactly |E| message rows
total, the same volume as one synchronous CDLP round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.algorithms.coloring import graph_coloring
from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import stats_barrier


def _lpa_color_local_pdf_factory(max_sweeps: int):
    """Single-task replay: sequential-greedy coloring (the unique
    speculative-recoloring fixpoint — see coloring._coloring_local_pdf)
    then the identical ascending-color-class sweeps with the LDBC
    (max count, min label) tie-break, all integer ops, bit-equal to the
    distributed stages.  Rows: tag=1 → (a=vid); tag=0 → (a=src, b=dst)
    symmetrized."""

    def _pdf(pdf):
        import numpy as np
        import pandas as pd

        from graphscope_spark.algorithms.coloring import _coloring_local_pdf

        col = _coloring_local_pdf(pdf)
        vids = col["vid"].to_numpy(np.int64)  # sorted ascending
        color = col["color"].to_numpy(np.int64)
        n = vids.size
        if n == 0:
            return pd.DataFrame(
                {"vid": vids, "label": np.empty(0, np.int64)}
            )
        e = pdf[pdf["tag"] == 0]
        se = np.searchsorted(vids, e["a"].to_numpy(np.int64))
        de = np.searchsorted(vids, e["b"].to_numpy(np.int64))
        n_colors = int(color.max()) + 1 if n else 0
        # label values are vids; work on positions via rank: labels are
        # always existing vids, and vid order == position order, so the
        # min-label tie-break is a min-position one
        label = np.arange(n, dtype=np.int64)
        dcol = color[de]
        for _sweep in range(max_sweeps):
            before = label.copy()
            for c in range(n_colors):
                m = dcol == c
                dv, sl = de[m], label[se[m]]
                if dv.size == 0:
                    continue
                # count (dv, sl) pairs; pick per dv max count, min label
                key = dv * n + sl
                uk, cnt = np.unique(key, return_counts=True)
                kv, kl = uk // n, uk % n
                o = np.lexsort((kl, -cnt, kv))
                kv_o, kl_o = kv[o], kl[o]
                first = np.ones(kv_o.size, bool)
                first[1:] = kv_o[1:] != kv_o[:-1]
                label[kv_o[first]] = kl_o[first]
            if np.array_equal(label, before):
                break
        return pd.DataFrame({"vid": vids, "label": vids[label]})

    return _pdf


def lpa_by_color(
    g: Graph, max_sweeps: int = 50, local_finish_rows: int = 2_000_000
) -> DataFrame:
    """Returns (vid long, label long) at the no-change fixpoint (or
    after ``max_sweeps`` full sweeps)."""
    if local_finish_rows > 0:
        sym0 = stats_barrier(g.symmetrized().select(SRC, DST))
        if g.vertices.count() + sym0.count() <= local_finish_rows:
            packed = g.vertices.select(
                F.lit(1).alias("tag"), F.col(VID).alias("a"), F.lit(0).cast("long").alias("b")
            ).unionByName(
                sym0.select(F.lit(0).alias("tag"), F.col(SRC).alias("a"), F.col(DST).alias("b"))
            )
            return (
                packed.withColumn("g", F.lit(1))
                .groupBy("g")
                .applyInPandas(
                    _lpa_color_local_pdf_factory(max_sweeps),
                    f"{VID} long, label long",
                )
            )

    colors = stats_barrier(graph_coloring(g))
    sym = g.symmetrized().select(SRC, DST)
    n_colors = int(colors.agg(F.max("color")).collect()[0][0] or 0) + 1
    # each message edge tagged with its DESTINATION's color: a sweep's
    # class-c stage reads the `color = c` slice (pushed filter on the
    # cached table), so per-sweep message volume is exactly |E|
    edges_c = stats_barrier(
        sym.join(colors.select(F.col(VID).alias(DST), "color"), DST)
        .select(SRC, DST, "color")
    )
    state = stats_barrier(g.vertices.select(VID, F.col(VID).alias("label")))
    for _ in range(max_sweeps):
        prev = state
        for c in range(n_colors):
            counts = (
                edges_c.where(F.col("color") == c)
                .join(
                    state.select(F.col(VID).alias(SRC), "label"), SRC
                )
                .groupBy(F.col(DST).alias(VID), "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            picked = (
                counts.groupBy(VID)
                .agg(
                    F.max(
                        F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))
                    ).alias("top")
                )
                .select(VID, (-F.col("top.neg")).alias("nl"))
            )
            state = (
                state.join(picked, VID, "left")
                .select(VID, F.coalesce("nl", "label").alias("label"))
                .localCheckpoint(eager=False)
            )
        state = stats_barrier(state)
        changed = (
            state.alias("n")
            .join(prev.alias("o"), VID)
            .where(F.col("n.label") != F.col("o.label"))
        )
        if changed.limit(1).count() == 0:
            break
    return state.select(VID, "label")
