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


def _mm_tail_pdf_factory(rounds_left: int):
    """Single-task replay of the handshake rounds over the unmatched
    induced subgraph, capped at ``rounds_left`` so the replay stops
    exactly where the distributed loop's ``max_iter`` would.  Rows:
    tag=1 → (vid, _); tag=0 → (src, dst) of the SYMMETRIZED
    unmatched-induced edges.  Max-id proposals work on ranks because
    vids are sorted (rank order == id order)."""

    def _pdf(pdf):
        import numpy as np
        import pandas as pd

        v = pdf[pdf["tag"] == 1].sort_values("a")
        e = pdf[pdf["tag"] == 0]
        vids = v["a"].to_numpy(np.int64)
        n = vids.size
        if n == 0:
            return pd.DataFrame(
                {"vid": np.empty(0, np.int64), "mate": np.empty(0, np.int64)}
            )
        se = np.searchsorted(vids, e["a"].to_numpy(np.int64))
        de = np.searchsorted(vids, e["b"].to_numpy(np.int64))
        mate = np.full(n, -1, np.int64)
        for _ in range(rounds_left):
            if not se.size:
                break
            prop = np.full(n, -1, np.int64)
            np.maximum.at(prop, de, se)  # max-id unmatched neighbor (as rank)
            idx = np.nonzero(prop >= 0)[0]
            mut = np.zeros(n, dtype=bool)
            mut[idx] = prop[prop[idx]] == idx
            if not mut.any():  # cannot happen (global-max endpoint always
                break  # lands a mutual proposal) — safeguard only
            mate[mut] = vids[prop[mut]]
            alive = mate == -1
            keep = alive[se] & alive[de]
            se, de = se[keep], de[keep]
        return pd.DataFrame({"vid": vids, "mate": mate})

    return _pdf


def maximal_matching(
    g: Graph, max_iter: int = 200, local_finish_rows: int = 4_000_000
) -> DataFrame:
    """Returns (vid, mate); mate = -1 for unmatched vertices.

    **Tail finisher**: the handshake retires edges gradually, so late
    rounds pay Spark's per-job floor on a collapsing frontier.  Whenever
    `unmatched vertices + unmatched-induced sym edges ≤
    local_finish_rows` (bounded one-task memory), the remaining rounds
    replay bit-identically in numpy inside ONE ``applyInPandas`` —
    identical max-id proposals and mutual-match order, so the result is
    the same as the distributed loop (pinned by tests).  At 10^12-scale
    the distributed rounds run until the frontier fits;
    ``local_finish_rows=0`` forces the fully-distributed path.
    """
    sym = g.symmetrized().cache()
    state = stats_barrier(
        g.vertices.select(VID, F.lit(-1).cast("long").alias("mate"))
    )
    for it in range(max_iter):
        un = state.where(F.col("mate") == -1).select(VID)
        active = (
            sym.join(un.withColumnRenamed(VID, SRC), SRC)
            .join(un.withColumnRenamed(VID, DST), DST)
        )
        if local_finish_rows > 0:
            active = active.cache()
            if un.count() + active.count() <= local_finish_rows:
                packed = un.select(
                    F.lit(1).alias("tag"), F.col(VID).alias("a"), F.lit(0).alias("b")
                ).unionByName(
                    active.select(
                        F.lit(0).alias("tag"),
                        F.col(SRC).alias("a"),
                        F.col(DST).alias("b"),
                    )
                )
                fin = (
                    packed.withColumn("g", F.lit(1))
                    .groupBy("g")
                    .applyInPandas(
                        _mm_tail_pdf_factory(max_iter - it), f"{VID} long, mate long"
                    )
                )
                out = state.where(F.col("mate") != -1).unionByName(fin)
                out = stats_barrier(out)
                active.unpersist()
                sym.unpersist()
                return out
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
        done = matched.limit(1).count() == 0
        if local_finish_rows > 0:
            active.unpersist()  # after the count — it reads the cache
        if done:
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


def _domset_tail_pdf(pdf):
    """Single-task replay of the identical greedy rounds over the alive
    induced subgraph.  Rows: tag=1 → (vid, cnt); tag=0 → (src, dst) of
    the SYMMETRIZED alive-induced edge set.  Pure numpy; the struct
    (cnt, vid) max is packed as cnt*(n+1)+rank(vid), which preserves
    lexicographic order because ranks are dense in [0, n)."""
    import numpy as np
    import pandas as pd

    v = pdf[pdf["tag"] == 1].sort_values("a")
    e = pdf[pdf["tag"] == 0]
    vids = v["a"].to_numpy(np.int64)
    cnt = v["b"].to_numpy(np.int64)
    n = vids.size
    if n == 0:
        return pd.DataFrame({"vid": np.empty(0, np.int64)})
    ar = np.arange(n, dtype=np.int64)
    se = np.searchsorted(vids, e["a"].to_numpy(np.int64))
    de = np.searchsorted(vids, e["b"].to_numpy(np.int64))
    alive = np.ones(n, dtype=bool)
    big = np.int64(n + 1)
    chosen = []
    while alive.any():
        # k = (cnt, vid) for alive vertices; two hop-max folds = the
        # 2-hop neighborhood max (edges are alive-alive only)
        key = np.where(alive, cnt * big + ar, np.int64(-1))
        k1 = key.copy()
        if se.size:
            np.maximum.at(k1, de, key[se])
        k2 = k1.copy()
        if se.size:
            np.maximum.at(k2, de, k1[se])
        sel = alive & ((k2 % big) == ar)
        chosen.append(vids[sel])
        dom = sel.copy()
        if se.size:
            dom[de[sel[se]]] = True
        alive &= ~dom
        if se.size:
            keep = alive[se] & alive[de]
            se, de = se[keep], de[keep]
        cnt = np.bincount(se, minlength=n).astype(np.int64)
    out = np.concatenate(chosen) if chosen else np.empty(0, np.int64)
    return pd.DataFrame({"vid": out})


def _domset_tail(act: DataFrame, sym_edges: DataFrame) -> DataFrame:
    """Ship the (bounded) alive subgraph to ONE executor task and finish
    the greedy there — one shuffle instead of ~7 per remaining round."""
    packed = act.select(
        F.lit(1).alias("tag"), F.col(VID).alias("a"), F.col("cnt").alias("b")
    ).unionByName(
        sym_edges.select(
            F.lit(0).alias("tag"), F.col(SRC).alias("a"), F.col(DST).alias("b")
        )
    )
    return (
        packed.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(_domset_tail_pdf, f"{VID} long")
    )


def min_dominating_set(
    g: Graph,
    max_iter: int = 500,
    sync_every: int = 4,
    local_finish_rows: int = 4_000_000,
) -> DataFrame:
    """2-hop greedy dominating set; returns (vid) rows — the members.

    Scale notes (this converges in ~n/Δ-ish rounds on hub-heavy graphs —
    observed 49 rounds on the thinned sf0.1 order graph — so per-round
    overhead dominates, not data volume):
    - ``sync_every`` rounds chain LAZILY into one Catalyst plan between
      materializations; the termination check runs once per batch (extra
      rounds past quiescence select nothing and are idempotent).  This
      cuts driver job count ~4× for the long low-degree cleanup tail.
    - The alive state holds ONLY still-undominated vertices, and the
      edge set is re-induced on the alive set once per batch, so late
      rounds join a collapsing edge table instead of the full |E|.
    - **Tail finisher**: the greedy retires only a few % of vertices per
      round, so most wall time is dozens of near-empty rounds paying
      Spark's per-job floor.  Once `alive vertices + induced edges ≤
      local_finish_rows` (rows, i.e. bounded memory on one executor
      task: 4M rows ≈ 100 MB), the remaining rounds are replayed
      bit-identically inside ONE `applyInPandas` task — same
      (cnt, vid) struct-max, same domination/recount order — turning
      the O(rounds) job tail into a single shuffle.  At 10^12-document
      scale the distributed rounds run until the tail fits; set
      ``local_finish_rows=0`` to force the fully-distributed path.
    """
    sym = g.symmetrized().select(SRC, DST)
    deg = sym.groupBy(F.col(SRC).alias(VID)).agg(F.count(F.lit(1)).alias("cnt"))
    # reference init quirk (min-dominating-set.h:48-56): round 1 ranks by
    # FULL degree, not the non-dominated count
    act = stats_barrier(
        g.vertices.select(VID)
        .join(deg, VID, "left")
        .select(VID, F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"))
    )
    asym = stats_barrier(sym)
    spark = g.edges.sparkSession
    selected = spark.createDataFrame([], f"{VID} long")

    def hop_max(cur: DataFrame, edges: DataFrame) -> DataFrame:
        """One fold: max struct over self + alive neighbors."""
        msgs = (
            edges.join(
                cur.select(F.col(VID).alias(SRC), F.col("k").alias("nk")), SRC
            )
            .groupBy(F.col(DST).alias(VID))
            .agg(F.max("nk").alias("mk"))
        )
        return cur.join(msgs, VID, "left").select(
            VID,
            F.when(F.col("mk").isNotNull() & (F.col("mk") > F.col("k")), F.col("mk"))
            .otherwise(F.col("k"))
            .alias("k"),
        )

    for _ in range(0, max_iter, sync_every):
        if local_finish_rows > 0:
            n_alive = act.count()
            if n_alive == 0:
                break
            if n_alive + asym.count() <= local_finish_rows:
                selected = selected.unionByName(_domset_tail(act, asym))
                break
        edges = asym
        for _ in range(sync_every):
            cur = act.select(VID, F.struct("cnt", F.col(VID).alias("m")).alias("k"))
            cur = hop_max(hop_max(cur, edges), edges)
            sel = cur.where(F.col("k.m") == F.col(VID)).select(VID)
            dominated = (
                edges.join(sel.withColumnRenamed(VID, SRC), SRC)
                .select(F.col(DST).alias(VID))
                .unionByName(sel)
                .distinct()
            )
            selected = selected.unionByName(sel)
            # lazily shrink within the batch so chained rounds don't
            # message through freshly-dominated vertices
            edges = edges.join(
                dominated.withColumnRenamed(VID, SRC), SRC, "anti"
            ).join(dominated.withColumnRenamed(VID, DST), DST, "anti")
            ndcnt = edges.groupBy(F.col(SRC).alias(VID)).agg(
                F.count(F.lit(1)).alias("nd")
            )
            act = (
                act.join(dominated, VID, "anti")
                .join(ndcnt, VID, "left")
                .select(VID, F.coalesce("nd", F.lit(0)).cast("long").alias("cnt"))
            )
            # lazy checkpoints make each frame a plan LEAF for the next
            # round — without them the plan TREE (not DAG) quintuples
            # per chained round and the analyzer melts — while deferring
            # actual materialization to the batch-end barrier
            edges = edges.localCheckpoint(eager=False)
            act = act.localCheckpoint(eager=False)
            selected = selected.localCheckpoint(eager=False)
        act = stats_barrier(act)
        selected = stats_barrier(selected)
        if act.limit(1).count() == 0:
            break
        asym = stats_barrier(
            asym.join(act.select(F.col(VID).alias(SRC)), SRC, "semi").join(
                act.select(F.col(VID).alias(DST)), DST, "semi"
            )
        )
    return selected.select(VID)


def _mec_tail_pdf_factory(rounds_left: int):
    """Single-task replay of the min-(deg,id) handshake with pick
    persistence/reset, capped at ``rounds_left`` to stop exactly where
    the distributed loop's ``max_iter`` would.  Rows: tag=1 → (vid, d,
    p) for unmatched vertices (p = pending pick vid or -1); tag=0 →
    (src, dst, _) of the SYMMETRIZED unmatched-induced edges.  The
    struct-min (d, vid) is packed as d·(n+1)+rank — lexicographic
    because ranks are dense."""

    def _pdf(pdf):
        import numpy as np
        import pandas as pd

        v = pdf[pdf["tag"] == 1].sort_values("a")
        e = pdf[pdf["tag"] == 0]
        vids = v["a"].to_numpy(np.int64)
        d = v["b"].to_numpy(np.int64)
        p0 = v["c"].to_numpy(np.int64)
        n = vids.size
        if n == 0:
            return pd.DataFrame(
                {"vid": np.empty(0, np.int64), "mate": np.empty(0, np.int64)}
            )
        se = np.searchsorted(vids, e["a"].to_numpy(np.int64))
        de = np.searchsorted(vids, e["b"].to_numpy(np.int64))
        p = np.full(n, -1, np.int64)
        hasp = p0 >= 0
        p[hasp] = np.searchsorted(vids, p0[hasp])  # targets are unmatched → present
        mate = np.full(n, -1, np.int64)
        big = np.int64(n + 1)
        sent = np.iinfo(np.int64).max
        for _ in range(rounds_left):
            pickers = (mate == -1) & (p == -1)
            mk = np.full(n, sent, np.int64)
            if se.size:
                sel = pickers[de]
                np.minimum.at(mk, de[sel], d[se[sel]] * big + se[sel])
            newp = np.where(mk != sent, mk % big, np.int64(-1))
            p = np.where(pickers, newp, p)
            idx = np.nonzero((mate == -1) & (p >= 0))[0]
            ok = idx[p[p[idx]] == idx]
            if ok.size == 0:
                break
            mate[ok] = vids[p[ok]]
            alive = mate == -1
            rs = np.nonzero(alive & (p >= 0))[0]
            p[rs[mate[p[rs]] != -1]] = -1  # picks at newly-matched reset
            keep = alive[se] & alive[de]
            se, de = se[keep], de[keep]
        return pd.DataFrame({"vid": vids, "mate": mate})

    return _pdf


def min_edge_cover(
    g: Graph, max_iter: int = 200, local_finish_rows: int = 4_000_000
) -> DataFrame:
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
    for it in range(max_iter):
        un = state.where(F.col("mate") == -1)
        ind = None
        if local_finish_rows > 0:
            ind = (
                sym.join(
                    un.select(F.col(VID).alias(SRC)), SRC
                ).join(un.select(F.col(VID).alias(DST)), DST)
            ).cache()
            if un.count() + ind.count() <= local_finish_rows:
                packed = un.select(
                    F.lit(1).alias("tag"),
                    F.col(VID).alias("a"),
                    F.col("d").alias("b"),
                    F.col("p").alias("c"),
                ).unionByName(
                    ind.select(
                        F.lit(0).alias("tag"),
                        F.col(SRC).alias("a"),
                        F.col(DST).alias("b"),
                        F.lit(-1).cast("long").alias("c"),
                    )
                )
                fin = (
                    packed.withColumn("g", F.lit(1))
                    .groupBy("g")
                    .applyInPandas(
                        _mec_tail_pdf_factory(max_iter - it),
                        f"{VID} long, mate long",
                    )
                    .select(VID, F.col("mate").alias("nm2"))
                )
                state = stats_barrier(
                    state.join(fin, VID, "left").select(
                        VID, "d", F.coalesce("nm2", "mate").alias("mate"), "p"
                    )
                )
                ind.unpersist()
                break
        pickers = un.where(F.col("p") == -1).select(VID)
        # min (deg, id) over unmatched neighbors of each picker — reuse
        # the cached unmatched-induced edge table from the finisher
        # check when available (it IS sym ⋈ un ⋈ un)
        cand_edges = ind if ind is not None else (
            sym.join(un.select(F.col(VID).alias(SRC)), SRC, "semi")
        )
        cand = (
            cand_edges.join(pickers.withColumnRenamed(VID, DST), DST)
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
