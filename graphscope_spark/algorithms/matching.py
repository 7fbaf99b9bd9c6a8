"""Matching family — maximal matching, greedy min vertex cover,
2-hop-greedy min dominating set.

Reference semantics:

- apps/flash/matching/mm.h:49-77 — handshake maximal matching: each
  round every unmatched vertex proposes to its MAX-id unmatched
  neighbor; an edge whose endpoints propose to each other is matched;
  repeat until no unmatched vertex has an unmatched neighbor.  Fully
  deterministic (progress is guaranteed: the max-id endpoint of any
  active edge always lands a mutual proposal).
- apps/flash/matching/min-cover-greedy.h:46-87 — greedy vertex cover:
  a vertex joins the cover when it is a local max by (remaining-degree,
  id) among its not-yet-covered neighbors; covered vertices decrement
  their neighbors' remaining degree; a vertex leaves the active set
  when covered or its remaining degree hits 0.
- apps/flash/matching/min-dominating-set.h:48-103 — each round every
  non-dominated vertex takes the max (non-dominated-degree, id) over
  its 2-hop non-dominated neighborhood (two folds of a 1-hop max);
  2-hop local maxima enter the set and dominate themselves + their
  neighbors; survivors recount their non-dominated neighbors.  The
  first round uses the FULL degree as the count (reference init).

Spark plan: each round is one or two (edges ⋈ state) hash joins + a
groupBy max/count — the FLASH EdgeMapDense pattern.  The shrinking
active set keeps join sizes falling; states chain through
``stats_barrier`` so plan size stays constant.  Tie-breaks are on
struct(count, vid) — Spark's struct ordering matches the reference's
lexicographic (cnt, id) compare and the SQL oracle's row compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import stats_barrier


def maximal_matching(g: Graph, max_iter: int = 200) -> DataFrame:
    """Returns (vid, mate); mate = -1 for unmatched vertices."""
    sym = g.symmetrized().cache()
    state = stats_barrier(
        g.vertices.select(VID, F.lit(-1).cast("long").alias("mate"))
    )
    for _ in range(max_iter):
        un = state.where(F.col("mate") == -1).select(VID)
        active = (
            sym.join(un.withColumnRenamed(VID, SRC), SRC)
            .join(un.withColumnRenamed(VID, DST), DST)
        )
        prop = active.groupBy(F.col(DST).alias(VID)).agg(F.max(SRC).alias("p"))
        p1 = prop.select(F.col(VID).alias("a"), F.col("p").alias("b"))
        p2 = prop.select(F.col("p").alias("a"), F.col(VID).alias("b"))
        mutual = p1.intersect(p2)  # a's proposal returned by b
        matched = mutual.select(F.col("a").alias(VID), F.col("b").alias("new_mate"))
        state = stats_barrier(
            state.join(matched, VID, "left").select(
                VID, F.coalesce("new_mate", "mate").alias("mate")
            )
        )
        if matched.limit(1).count() == 0:
            break
    return state


def min_vertex_cover(g: Graph, max_iter: int = 500) -> DataFrame:
    """Greedy vertex cover; returns (vid) rows — the cover members."""
    sym = g.symmetrized().cache()
    deg = sym.groupBy(F.col(SRC).alias(VID)).agg(F.count(F.lit(1)).alias("d"))
    state = stats_barrier(
        g.vertices.select(VID)
        .join(deg, VID, "left")
        .select(
            VID,
            F.coalesce("d", F.lit(0)).cast("long").alias("d"),
            F.lit(False).alias("c"),
            (F.coalesce("d", F.lit(0)) > 0).alias("active"),
        )
    )
    for _ in range(max_iter):
        # max (d, id) among non-cover neighbors — blockers
        ncov = state.where(~F.col("c")).select(
            F.col(VID).alias(SRC), F.struct("d", F.col(VID).alias("v")).alias("k")
        )
        blk = (
            sym.join(ncov, SRC)
            .groupBy(F.col(DST).alias(VID))
            .agg(F.max("k").alias("mk"))
        )
        st = state.join(blk, VID, "left")
        newc = st.where(
            F.col("active")
            & (
                F.col("mk").isNull()
                | (F.col("mk") <= F.struct(F.col("d"), F.col(VID).alias("v")))
            )
        ).select(VID)
        # decrement remaining degree of non-cover neighbors of newc
        dec = (
            sym.join(newc.withColumnRenamed(VID, SRC), SRC)
            .groupBy(F.col(DST).alias(VID))
            .agg(F.count(F.lit(1)).alias("dec"))
        )
        nc = newc.withColumn("hit", F.lit(True))
        nxt = (
            state.join(nc, VID, "left")
            .join(dec, VID, "left")
            .select(
                VID,
                F.when(F.col("c") | F.col("hit").isNotNull(), F.col("d"))
                .otherwise(F.col("d") - F.coalesce("dec", F.lit(0)))
                .alias("d"),
                (F.col("c") | F.col("hit").isNotNull()).alias("c"),
            )
        )
        nxt = nxt.withColumn(
            "active", ~F.col("c") & (F.col("d") > 0)
        )
        state = stats_barrier(nxt)
        if state.where(F.col("active")).limit(1).count() == 0:
            break
    return state.where(F.col("c")).select(VID)


def min_dominating_set(g: Graph, max_iter: int = 500) -> DataFrame:
    """2-hop greedy dominating set; returns (vid) rows — the members."""
    sym = g.symmetrized().cache()
    deg = sym.groupBy(F.col(SRC).alias(VID)).agg(F.count(F.lit(1)).alias("cnt"))
    state = stats_barrier(
        g.vertices.select(VID)
        .join(deg, VID, "left")
        .select(
            VID,
            F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
            F.lit(False).alias("b"),
            F.lit(False).alias("dom"),
        )
    )

    def hop_max(cur: DataFrame) -> DataFrame:
        """One fold: max struct(cnt, vid-of-max) over self + non-dominated
        neighbors; cur has (vid, k struct, dom)."""
        msgs = (
            sym.join(
                cur.where(~F.col("dom")).select(F.col(VID).alias(SRC), F.col("k").alias("nk")),
                SRC,
            )
            .groupBy(F.col(DST).alias(VID))
            .agg(F.max("nk").alias("mk"))
        )
        return cur.join(msgs, VID, "left").select(
            VID,
            F.when(F.col("mk").isNotNull() & (F.col("mk") > F.col("k")), F.col("mk"))
            .otherwise(F.col("k"))
            .alias("k"),
            "dom",
        )

    for _ in range(max_iter):
        cur = state.where(~F.col("dom")).select(
            VID, F.struct("cnt", F.col(VID).alias("m")).alias("k"), "dom"
        )
        cur = hop_max(hop_max(cur))
        sel = cur.where(F.col("k.m") == F.col(VID)).select(VID)
        # dominate: selected + their neighbors
        dominated = (
            sym.join(sel.withColumnRenamed(VID, SRC), SRC)
            .select(F.col(DST).alias(VID))
            .unionByName(sel)
            .distinct()
            .withColumn("hit", F.lit(True))
        )
        st2 = (
            state.join(sel.withColumn("s", F.lit(True)), VID, "left")
            .join(dominated, VID, "left")
            .select(
                VID,
                "cnt",
                (F.col("b") | F.col("s").isNotNull()).alias("b"),
                (F.col("dom") | F.col("hit").isNotNull()).alias("dom"),
            )
        )
        # recount non-dominated neighbors for survivors
        ndcnt = (
            sym.join(
                st2.where(~F.col("dom")).select(F.col(VID).alias(SRC)), SRC
            )
            .groupBy(F.col(DST).alias(VID))
            .agg(F.count(F.lit(1)).alias("nd"))
        )
        state = stats_barrier(
            st2.join(ndcnt, VID, "left").select(
                VID,
                F.when(F.col("dom"), F.col("cnt"))
                .otherwise(F.coalesce("nd", F.lit(0)))
                .cast("long")
                .alias("cnt"),
                "b",
                "dom",
            )
        )
        if state.where(~F.col("dom")).limit(1).count() == 0:
            break
    return state.where(F.col("b")).select(VID)


def min_edge_cover(g: Graph, max_iter: int = 200) -> DataFrame:
    """Greedy min edge cover size (min-edge-cover.h:47-99): handshake
    matching with min-(degree, id) preference, then cover size =
    |matched|/2 + |unmatched with deg>0|.  Returns one row (size long).

    Per round: unmatched vertices needing a pick take the min
    struct(deg, vid) over unmatched neighbors (one join + groupBy min);
    mutual picks match (self-join of the pick table); picks pointing at
    newly-matched vertices reset.  Same shrinking-frontier shape as
    ``maximal_matching`` but degree-ordered, matching the reference's
    preference for covering low-degree vertices first.
    """
    sym = g.symmetrized().select(SRC, DST).cache()
    deg = sym.groupBy(F.col(SRC).alias(VID)).agg(
        F.count(F.lit(1)).alias("d")
    )
    degv = g.vertices.select(VID).join(deg, VID, "left").select(
        VID, F.coalesce("d", F.lit(0)).cast("long").alias("d")
    )
    # state: (vid, d, mate, p); p = -1 means "needs a (re)pick"
    state = stats_barrier(
        degv.select(
            VID, "d",
            F.lit(-1).cast("long").alias("mate"),
            F.lit(-1).cast("long").alias("p"),
        )
    )
    for _ in range(max_iter):
        un = state.where(F.col("mate") == -1)
        pickers = un.where(F.col("p") == -1).select(VID)
        # min (deg, id) over unmatched neighbors of each picker
        cand = (
            sym.join(pickers.withColumnRenamed(VID, DST), DST)
            .join(
                un.select(
                    F.col(VID).alias(SRC),
                    F.struct("d", F.col(VID).alias("v")).alias("k"),
                ),
                SRC,
            )
            .groupBy(F.col(DST).alias(VID))
            .agg(F.min("k").alias("mk"))
            .select(VID, F.col("mk.v").alias("newp"))
        )
        st = state.join(cand, VID, "left").select(
            VID, "d", "mate",
            F.when(
                (F.col("mate") == -1) & (F.col("p") == -1),
                F.coalesce("newp", F.lit(-1)),
            )
            .otherwise(F.col("p"))
            .alias("p"),
        )
        picks = st.where((F.col("mate") == -1) & (F.col("p") >= 0)).select(
            F.col(VID).alias("a"), F.col("p").alias("b")
        )
        mutual = picks.intersect(
            picks.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        matched = mutual.select(F.col("a").alias(VID), F.col("b").alias("nm"))
        st2 = st.join(matched, VID, "left").select(
            VID, "d", F.coalesce("nm", "mate").alias("mate"), "p"
        )
        # picks aimed at newly-matched vertices reset to -1
        reset = matched.select(F.col(VID).alias("p")).distinct()
        state = stats_barrier(
            st2.join(reset.withColumn("hit", F.lit(True)), "p", "left").select(
                VID, "d", "mate",
                F.when(
                    (F.col("mate") == -1) & F.col("hit").isNotNull(),
                    F.lit(-1).cast("long"),
                )
                .otherwise(F.col("p"))
                .alias("p"),
            )
        )
        if matched.limit(1).count() == 0:
            break
    matched_n = state.where(F.col("mate") >= 0).agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("nm")
    )
    single_n = state.where((F.col("mate") == -1) & (F.col("d") > 0)).agg(
        F.count(F.lit(1)).alias("ns")
    )
    out = matched_n.crossJoin(single_n).select(
        (F.col("nm") + F.col("ns")).cast("long").alias("size")
    )
    sym.unpersist()
    return out
