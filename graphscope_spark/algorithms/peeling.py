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


def _peel(
    state: DataFrame,
    sym: DataFrame,
    threshold_col: str,
    same_core_only: bool,
    max_rounds: int,
) -> DataFrame:
    """Synchronous peel: state (vid, core?, d, rank=-1).  Round i ranks
    unranked vertices with d ≤ threshold, then newly-ranked vertices
    decrement unranked neighbors' d (optionally same-core only)."""
    for i in range(max_rounds):
        prev = state
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


def degeneracy_ordering(g: Graph, max_rounds: int = 10000) -> DataFrame:
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
    out = _peel(state, sym, "thr", same_core_only=False, max_rounds=max_rounds)
    sym.unpersist()
    return out.select(VID, F.col("rank").cast("long").alias("rank"))


def onion_layers(g: Graph, max_rounds: int = 10000) -> DataFrame:
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
    out = _peel(state, sym, "thr", same_core_only=True, max_rounds=max_rounds)
    sym.unpersist()
    return out.select(VID, F.col("rank").cast("long").alias("layer"))
