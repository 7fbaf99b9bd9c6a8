"""Greedy k-center over hop distance.

Reference semantics (apps/flash/measurement/k-center.h:48-74): the
first center is the argmax-(degree, id) vertex; each subsequent center
is the argmax-(current min hop distance, id) vertex; after k rounds
every vertex reports its min hop distance to the chosen centers
(farthest-first traversal, the classic 2-approximation).

Spark plan: k sequential BFS sweeps over the symmetric edge table, each
a frontier-join + groupBy(dst) min with the monotone prune
``new_dist < dist`` so message volume tracks the shrinking frontier.
The argmax center picks are single-row aggregations (struct max), not
collect()s of the vertex set.  Unreachable vertices report -1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import stats_barrier

INF = 2**62


def _kcenter_local_pdf_factory(k: int):
    """Single-task replay: same (key, max vid) center picks, same BFS
    hop relaxations — all integer, bit-equal to the distributed sweeps.
    Rows: tag=1 → (a=vid); tag=0 → (a=src, b=dst) symmetrized."""

    def _pdf(pdf):
        import numpy as np
        import pandas as pd

        v = pdf[pdf["tag"] == 1]
        e = pdf[pdf["tag"] == 0]
        vids = np.sort(v["a"].to_numpy(np.int64))
        n = vids.size
        if n == 0:
            return pd.DataFrame(
                {"vid": np.empty(0, np.int64), "dis": np.empty(0, np.int64)}
            )
        se = np.searchsorted(vids, e["a"].to_numpy(np.int64))
        de = np.searchsorted(vids, e["b"].to_numpy(np.int64))
        d = np.bincount(se, minlength=n).astype(np.int64)
        dis = np.full(n, INF, np.int64)
        for i in range(k):
            key = d if i == 0 else dis
            # argmax (key, vid); vids ascend with position
            best = np.flatnonzero(key == key.max())[-1]
            if dis[best] > 0:
                dis[best] = 0
                frontier = np.zeros(n, bool)
                frontier[best] = True
                depth = 0
                while frontier.any():
                    depth += 1
                    nxt = np.zeros(n, bool)
                    nxt[de[frontier[se]]] = True
                    nxt &= dis > depth
                    dis[nxt] = depth
                    frontier = nxt
        return pd.DataFrame(
            {"vid": vids, "dis": np.where(dis >= INF, -1, dis)}
        )

    return _pdf


def k_center(
    g: Graph, k: int, max_depth: int = 10000, local_finish_rows: int = 4_000_000
) -> DataFrame:
    """Returns (vid long, dis long): min hop distance to the k greedily
    chosen centers; -1 if unreachable from all of them."""
    sym = g.symmetrized().select(SRC, DST).cache()

    # single-task finisher: k sequential BFS sweeps collapse into one
    # applyInPandas when the graph fits one executor task; distributed
    # sweeps below stay the scale path (local_finish_rows=0 forces them)
    if local_finish_rows > 0:
        if g.vertices.count() + sym.count() <= local_finish_rows:
            packed = g.vertices.select(
                F.lit(1).alias("tag"), F.col(VID).alias("a"), F.lit(0).cast("long").alias("b")
            ).unionByName(
                sym.select(F.lit(0).alias("tag"), F.col(SRC).alias("a"), F.col(DST).alias("b"))
            )
            return (
                packed.withColumn("g", F.lit(1))
                .groupBy("g")
                .applyInPandas(_kcenter_local_pdf_factory(k), f"{VID} long, dis long")
            )
    deg = sym.groupBy(F.col(SRC).alias(VID)).agg(F.count(F.lit(1)).alias("d"))
    state = stats_barrier(
        g.vertices.select(VID)
        .join(deg, VID, "left")
        .select(
            VID,
            F.coalesce("d", F.lit(0)).cast("long").alias("d"),
            F.lit(INF).cast("long").alias("dis"),
        )
    )
    for i in range(k):
        key = "d" if i == 0 else "dis"
        center = (
            state.agg(F.max(F.struct(F.col(key), F.col(VID))).alias("m"))
            .select(F.col("m." + VID).alias("c"))
            .collect()[0]["c"]
        )
        frontier = state.where(F.col(VID) == center).select(
            VID, F.lit(0).cast("long").alias("nd")
        )
        state = stats_barrier(
            state.alias("s")
            .join(frontier.select(VID, "nd"), VID, "left")
            .select(
                VID, "d", F.least(F.col("dis"), F.coalesce("nd", F.lit(INF))).alias("dis")
            )
        )
        for depth in range(1, max_depth + 1):
            msgs = (
                sym.join(frontier.withColumnRenamed(VID, SRC).select(SRC), SRC)
                .groupBy(F.col(DST).alias(VID))
                .agg(F.lit(depth).cast("long").alias("nd"))
            )
            improved = msgs.join(state, VID).where(F.col("nd") < F.col("dis"))
            frontier = improved.select(VID, "nd")
            state = stats_barrier(
                state.alias("s")
                .join(frontier.alias("f"), VID, "left")
                .select(
                    VID,
                    "d",
                    F.least(
                        F.col("s.dis"), F.coalesce(F.col("f.nd"), F.lit(INF))
                    ).alias("dis"),
                )
            )
            if frontier.limit(1).count() == 0:
                break
    sym.unpersist()
    return state.select(
        VID,
        F.when(F.col("dis") >= INF, F.lit(-1)).otherwise(F.col("dis"))
        .cast("long")
        .alias("dis"),
    )
