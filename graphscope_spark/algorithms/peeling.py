"""Peel-ordering family: degeneracy ordering, onion layers, k-core search.

Reference (FLASH core apps):
  degeneracy-ordering.h:43-105 — core fixpoint, dg = max core, then
      synchronous ranking rounds: round i ranks every unranked vertex
      whose remaining degree (original degree minus already-ranked
      neighbors) is ≤ dg; ranked vertices decrement their unranked
      neighbors (:91-103).
  onion-layer-ordering.h:44-100 — same peel, but per-vertex threshold
      core(v), d initialized to |{u ∈ N(v): core(u) ≥ core(v)}|, and
      only SAME-core ranked neighbors decrement (:78-97) — the onion
      layers of Hébert-Dufresne et al. within each k-core shell.
  k-core-search.h:44-66 — size of the k-core (global scalar).

All three run as synchronous frontier peels: round i's newly-ranked
set drives one join + groupBy(dst) count; message volume tracks the
frontier, not |E|.  ``stats_barrier`` resets Catalyst size estimates
each round (see superstep.py) so planning cost stays constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import stats_barrier, unpersist_barrier


def degeneracy(g: Graph) -> DataFrame:
    """One row (degeneracy long): max core number
    (degeneracy-ordering.h:85-88 GetMax over converged cores)."""
    from graphscope_spark.algorithms.corenum import core_number

    return core_number(g).agg(F.max("core").cast("long").alias("degeneracy"))


def kcore_size(g: Graph, k: int) -> DataFrame:
    """One row (size long): number of vertices in the k-core
    (k-core-search.h:44-66 GlobalRes)."""
    from graphscope_spark.algorithms.kcore import kcore

    return (
        kcore(g, k)
        .where(F.col("in_core"))
        .agg(F.count(F.lit(1)).cast("long").alias("size"))
    )


def _peel_tail_factory(same_core_only: bool):
    """Single-task replay of the identical synchronous peel rounds over
    the unranked-induced subgraph.  Rows: tag=1 → (vid, d, thr) with
    c2 = the next round index; tag=0 → (src, dst) of the SYMMETRIZED
    unranked-induced edge set.  Pure numpy — same rank/decrement order
    as the distributed rounds, so output is bit-identical."""

    def _pdf(pdf):
        import numpy as np
        import pandas as pd

        v = pdf[pdf["tag"] == 1].sort_values("a")
        e = pdf[pdf["tag"] == 0]
        vids = v["a"].to_numpy(np.int64)
        d = v["b"].to_numpy(np.int64)
        thr = v["c"].to_numpy(np.int64)
        n = vids.size
        if n == 0:
            return pd.DataFrame(
                {"vid": np.empty(0, np.int64), "rank": np.empty(0, np.int64)}
            )
        r = int(v["c2"].iloc[0])
        se = np.searchsorted(vids, e["a"].to_numpy(np.int64))
        de = np.searchsorted(vids, e["b"].to_numpy(np.int64))
        alive = np.ones(n, dtype=bool)
        rank = np.full(n, -1, dtype=np.int64)
        while True:
            sel = alive & (d <= thr)
            if not sel.any():
                break
            rank[sel] = r
            alive &= ~sel
            if se.size:
                mask = sel[se] & alive[de]
                if same_core_only:
                    mask &= thr[se] == thr[de]
                d = d - np.bincount(de[mask], minlength=n)
            r += 1
        return pd.DataFrame({"vid": vids, "rank": rank})

    return _pdf


def _peel_tail(
    unranked: DataFrame, ind_sym: DataFrame, threshold_col: str,
    same_core_only: bool, next_round: int,
) -> DataFrame:
    packed = unranked.select(
        F.lit(1).alias("tag"),
        F.col(VID).alias("a"),
        F.col("d").alias("b"),
        F.col(threshold_col).cast("long").alias("c"),
        F.lit(next_round).alias("c2"),
    ).unionByName(
        ind_sym.select(
            F.lit(0).alias("tag"),
            F.col(SRC).alias("a"),
            F.col(DST).alias("b"),
            F.lit(0).alias("c"),
            F.lit(0).alias("c2"),
        )
    )
    return (
        packed.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(_peel_tail_factory(same_core_only), f"{VID} long, rank long")
    )


def _peel(
    state: DataFrame,
    sym: DataFrame,
    threshold_col: str,
    same_core_only: bool,
    max_rounds: int,
    local_finish_rows: int = 4_000_000,
) -> DataFrame:
    """Synchronous peel: state (vid, core?, d, rank=-1).  Round i ranks
    unranked vertices with d ≤ threshold, then newly-ranked vertices
    decrement unranked neighbors' d (optionally same-core only).

    **Tail finisher** (same lever as matching.min_dominating_set): the
    peel retires one layer per round — dozens of Spark jobs each doing
    shrinking work.  Once unranked vertices + their induced symmetrized
    edges fit one executor task (``local_finish_rows`` rows ≈ 100 MB at
    4M), the remaining rounds replay bit-identically in numpy inside a
    single ``applyInPandas`` task.  At 10¹²-scale the distributed
    rounds run until the tail fits; ``local_finish_rows=0`` forces the
    fully-distributed path (tested equal)."""
    for i in range(max_rounds):
        prev = state
        unranked = state.where(F.col("rank") < 0)
        if local_finish_rows > 0:
            n_un = unranked.count()
            if n_un == 0:
                break
            if n_un <= local_finish_rows:
                uv = unranked.select(F.col(VID).alias("_uv"))
                ind = sym.join(
                    uv.withColumnRenamed("_uv", SRC), SRC, "semi"
                ).join(uv.withColumnRenamed("_uv", DST), DST, "semi")
                ind = ind.transform(stats_barrier)
                if n_un + ind.count() <= local_finish_rows:
                    tail = _peel_tail(
                        unranked, ind, threshold_col, same_core_only, i
                    )
                    done = state.where(F.col("rank") >= 0).select(VID, "rank")
                    return done.unionByName(tail)
                unpersist_barrier(ind)
        newly = state.where(
            (F.col("rank") < 0) & (F.col("d") <= F.col(threshold_col))
        )
        if newly.limit(1).count() == 0:
            break
        ranked = state.select(
            VID,
            "d",
            *([threshold_col] if threshold_col != "d" else []),
            F.when(
                (F.col("rank") < 0) & (F.col("d") <= F.col(threshold_col)),
                F.lit(i),
            )
            .otherwise(F.col("rank"))
            .alias("rank"),
        )
        src_cols = [F.col(SRC).alias("_nv")]
        if same_core_only:
            src_cols.append(F.col("_score").alias("_ncore"))
            msgs_base = sym.join(
                newly.select(
                    F.col(VID).alias(SRC), F.col(threshold_col).alias("_score")
                ),
                SRC,
            )
        else:
            msgs_base = sym.join(newly.select(F.col(VID).alias(SRC)), SRC, "semi")
        dec = (
            msgs_base.select(F.col(DST).alias(VID), *(
                [F.col("_score").alias("_ncore")] if same_core_only else []
            ))
        )
        if same_core_only:
            dec = dec.join(
                ranked.select(VID, F.col(threshold_col).alias("_vcore"), "rank"),
                VID,
            ).where((F.col("rank") < 0) & (F.col("_ncore") == F.col("_vcore")))
        cnt = dec.groupBy(VID).agg(F.count(F.lit(1)).alias("_c"))
        state = (
            ranked.join(cnt, VID, "left")
            .select(
                VID,
                *([threshold_col] if threshold_col != "d" else []),
                F.when(
                    F.col("rank") < 0,
                    F.col("d") - F.coalesce("_c", F.lit(0)),
                )
                .otherwise(F.col("d"))
                .alias("d"),
                "rank",
            )
        ).transform(stats_barrier)
        unpersist_barrier(prev)  # new round materialized; last one dead
    return state


def degeneracy_ordering(
    g: Graph, max_rounds: int = 10000, local_finish_rows: int = 4_000_000
) -> DataFrame:
    """Returns (vid long, rank long): synchronous degeneracy-peel round
    per vertex (degeneracy-ordering.h:90-105; round i ranks unranked
    vertices with remaining degree ≤ degeneracy)."""
    from graphscope_spark.algorithms.corenum import core_number

    sym = g.symmetrized().select(SRC, DST).cache()
    deg = sym.groupBy(F.col(SRC).alias(VID)).agg(F.count(F.lit(1)).alias("d"))
    dg = core_number(g).agg(F.max("core")).collect()[0][0] or 0
    state = (
        g.vertices.select(VID)
        .join(deg, VID, "left")
        .select(
            VID,
            F.coalesce("d", F.lit(0)).cast("long").alias("d"),
            F.lit(int(dg)).alias("thr"),
            F.lit(-1).alias("rank"),
        )
    ).transform(stats_barrier)
    out = _peel(
        state, sym, "thr", same_core_only=False, max_rounds=max_rounds,
        local_finish_rows=local_finish_rows,
    )
    sym.unpersist()
    return out.select(VID, F.col("rank").cast("long").alias("rank"))


def onion_layers(
    g: Graph, max_rounds: int = 10000, local_finish_rows: int = 4_000_000
) -> DataFrame:
    """Returns (vid long, layer long): onion layer = within-core peel
    round (onion-layer-ordering.h:73-97)."""
    from graphscope_spark.algorithms.corenum import core_number

    sym = g.symmetrized().select(SRC, DST).cache()
    core = core_number(g)
    # d0 = |{u in N(v): core(u) >= core(v)}| (onion-layer-ordering.h:74-77)
    cu = core.select(F.col(VID).alias(SRC), F.col("core").alias("_score"))
    cv = core.select(F.col(VID).alias(DST), F.col("core").alias("_vcore"))
    d0 = (
        sym.join(cu, SRC)
        .join(cv, DST)
        .where(F.col("_score") >= F.col("_vcore"))
        .groupBy(F.col(DST).alias(VID))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    state = (
        core.join(d0, VID, "left")
        .select(
            VID,
            F.coalesce("d", F.lit(0)).cast("long").alias("d"),
            F.col("core").alias("thr"),
            F.lit(-1).alias("rank"),
        )
    ).transform(stats_barrier)
    out = _peel(
        state, sym, "thr", same_core_only=True, max_rounds=max_rounds,
        local_finish_rows=local_finish_rows,
    )
    sym.unpersist()
    return out.select(VID, F.col("rank").cast("long").alias("layer"))
