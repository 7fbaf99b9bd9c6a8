"""Louvain modularity communities — synchronous, exact-integer scores.

Reference: `louvain` (.gs_conf.yaml:206-213,
apps/pregel/louvain/louvain_app_base.h) — a parallel (Pregel-based)
variant of Blondel et al.'s method; like the reference, this is a
deterministic *parallel* formulation, not the sequential original.

Semantics (identical to tests/oracle.louvain_oracle — parity is by
construction, the only sound approach since every parallel Louvain
defines its own move schedule):

- Local-moving rounds are synchronous: every vertex evaluates its
  neighbor communities against the CURRENT assignment and all moves
  apply at once.  Candidate score S(C) = m2·k_{v,C} − k_v·Σtot_C,
  stay score S_stay = m2·k_{v,D} − k_v·(Σtot_D − k_v); move to the
  argmax (ties → min community id) iff S > S_stay.  All quantities are
  INTEGERS (weights are edge multiplicities), so the comparison is
  exact — no float-order nondeterminism across partitionings.
- After the rounds quiesce (or ``max_rounds``), communities contract
  into a weighted supergraph (inter-community weights summed,
  intra-community mass becoming self-loop weight that feeds k_v), and
  the next phase runs.  ``max_phases`` bounds the hierarchy.
- Output: (vid, community) with community = min original vid in the
  final community (stable labels).

Spark shape: one join + two aggregations per round over (vid, comm)
state — the same scatter/gather skeleton as every other superstep —
plus a groupBy contraction per phase.  Driver holds only per-phase
scalars (m2) and the loop; per-phase vertex→community maps compose
lazily via joins and are localCheckpointed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.superstep import stats_barrier, unpersist_barrier
from graphscope_spark.graph import DST, SRC, VID, Graph


def _louvain_local_pdf_factory(max_rounds: int, max_phases: int):
    """Single-task replay of the ENTIRE synchronous Louvain (all phases,
    all rounds) over the folded undirected weighted edge table.  All
    scores are int64 (requires total weight W < 2^31.5 so that
    m2·k_{v,C} ≤ 2W² stays in int64 — guaranteed by the caller's
    ``local_finish_rows`` cap), so the replay is bit-identical to the
    distributed rounds: same synchronous move rule, same
    (score desc, community-id asc) tie-break, same contraction.
    Positions index the CURRENT phase's supernodes; supernode ids stay
    sorted ascending, so min-position tie-breaks equal min-id ones."""

    def _pdf(pdf):
        import numpy as np
        import pandas as pd

        v = pdf[pdf["tag"] == 1]
        e = pdf[pdf["tag"] == 0]
        vids = np.sort(v["a"].to_numpy(np.int64))
        n0 = vids.size
        if n0 == 0:
            return pd.DataFrame(
                {"vid": np.empty(0, np.int64), "community": np.empty(0, np.int64)}
            )
        pa = np.searchsorted(vids, e["a"].to_numpy(np.int64))
        pb = np.searchsorted(vids, e["b"].to_numpy(np.int64))
        ew = e["w"].to_numpy(np.int64)

        n = n0
        node_of = np.arange(n0, dtype=np.int64)  # original pos -> supernode pos
        selfw = np.zeros(n, np.int64)

        for _phase in range(max_phases):
            k = np.zeros(n, np.int64)
            np.add.at(k, pa, ew)
            np.add.at(k, pb, ew)
            k += 2 * selfw
            m2 = int(k.sum())
            if m2 == 0:
                break
            comm = np.arange(n, dtype=np.int64)
            # per-(v, neighbor-community) weights recompute each round
            vv = np.concatenate([pa, pb])
            uu = np.concatenate([pb, pa])
            ww = np.concatenate([ew, ew])
            for _round in range(max_rounds):
                tot = np.zeros(n, np.int64)
                np.add.at(tot, comm, k)
                key = vv * n + comm[uu]
                uk, inv = np.unique(key, return_inverse=True)
                ksum = np.zeros(uk.size, np.int64)
                np.add.at(ksum, inv, ww)
                kv = uk // n
                kc = uk % n
                own = kc == comm[kv]
                s_stay = -k * (tot[comm] - k)
                s_stay[kv[own]] += m2 * ksum[own]
                cand = ~own
                cv, cc = kv[cand], kc[cand]
                if cv.size == 0:
                    break
                cs = m2 * ksum[cand] - k[cv] * tot[cc]
                order = np.lexsort((cc, -cs, cv))
                cv_o, cc_o, cs_o = cv[order], cc[order], cs[order]
                first = np.ones(cv_o.size, bool)
                first[1:] = cv_o[1:] != cv_o[:-1]
                bv, bc, bs = cv_o[first], cc_o[first], cs_o[first]
                mv = bs > s_stay[bv]
                if not mv.any():
                    break
                comm = comm.copy()
                comm[bv[mv]] = bc[mv]
            uc, inv = np.unique(comm, return_inverse=True)
            node_of = inv[node_of]
            if uc.size == n:
                break
            # contract: intra mass + carried selfs -> self weight
            newn = uc.size
            new_self = np.zeros(newn, np.int64)
            np.add.at(new_self, inv, selfw)
            ca, cb = inv[pa], inv[pb]
            intra = ca == cb
            np.add.at(new_self, ca[intra], ew[intra])
            lo = np.minimum(ca[~intra], cb[~intra])
            hi = np.maximum(ca[~intra], cb[~intra])
            ekey, einv = np.unique(lo * newn + hi, return_inverse=True)
            new_ew = np.zeros(ekey.size, np.int64)
            np.add.at(new_ew, einv, ew[~intra])
            pa, pb, ew = ekey // newn, ekey % newn, new_ew
            selfw = new_self
            n = newn

        lab = np.full(n, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(lab, node_of, vids)
        return pd.DataFrame({"vid": vids, "community": lab[node_of]})

    return _pdf


def louvain(
    g: Graph,
    max_rounds: int = 10,
    max_phases: int = 3,
    local_finish_rows: int = 4_000_000,
) -> DataFrame:
    """Returns (vid long, community long)."""
    spark = g.edges.sparkSession

    # undirected weighted edges, unordered (a < b); parallel edges fold
    # into integer multiplicity weights (matching the NX/oracle
    # convention — a duplicate edge doubles the coupling)
    e0 = g.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
    edges = (
        e0.select(
            F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    ).transform(stats_barrier)

    # Whole-graph single-task finisher: every score is an INTEGER, so a
    # numpy replay of the identical synchronous rounds is bit-equal to
    # the distributed supersteps (pinned in tests).  ~35 barrier'd wide
    # joins collapse into one applyInPandas task when the folded graph
    # fits bounded executor memory; the distributed path below remains
    # the 10^12-edge path (local_finish_rows=0 forces it).
    if local_finish_rows > 0:
        n_v = g.vertices.count()
        if n_v + edges.count() <= local_finish_rows:
            packed = g.vertices.select(
                F.lit(1).alias("tag"),
                F.col(VID).alias("a"),
                F.lit(0).cast("long").alias("b"),
                F.lit(0).cast("long").alias("w"),
            ).unionByName(
                edges.select(F.lit(0).alias("tag"), "a", "b", "w")
            )
            # NOTE: edges stays persisted — the returned plan reads it
            # (its lineage is truncated, an unpersist would orphan it)
            return (
                packed.withColumn("g", F.lit(1))
                .groupBy("g")
                .applyInPandas(
                    _louvain_local_pdf_factory(max_rounds, max_phases),
                    f"{VID} long, community long",
                )
            )

    selfs = (
        edges.sparkSession.createDataFrame([], "v long, sw long")
    )

    # mapping original vid -> current supernode
    mapping = g.vertices.select(VID, F.col(VID).alias("node"))
    mapping = mapping.transform(stats_barrier)
    nodes = g.vertices.select(F.col(VID).alias("v"))

    for _phase in range(max_phases):
        sym = edges.select(F.col("a").alias("v"), F.col("b").alias("u"), "w").unionByName(
            edges.select(F.col("b").alias("v"), F.col("a").alias("u"), "w")
        )
        deg = (
            sym.groupBy("v").agg(F.sum("w").alias("kd"))
            .join(nodes, "v", "right")
            .join(selfs, "v", "left")
            .select(
                "v",
                (F.coalesce("kd", F.lit(0)) + 2 * F.coalesce("sw", F.lit(0)))
                .cast("long")
                .alias("k"),
            )
        ).transform(stats_barrier)
        m2 = deg.agg(F.sum("k")).collect()[0][0] or 0
        if m2 == 0:
            break

        comm = nodes.select("v", F.col("v").alias("comm")).transform(stats_barrier)
        # barrier'd state of the PREVIOUS round — dead (and released)
        # as soon as the next round's state is materialized; a stale
        # round otherwise stays in block storage for the whole phase
        prev_comm_state = comm
        for _round in range(max_rounds):
            tot = (
                comm.join(deg, "v").groupBy("comm").agg(F.sum("k").alias("tot"))
            )
            # k_{v,C}: weight from v to each neighbor community
            kvc = (
                sym.join(comm.select(F.col("v").alias("u"), F.col("comm").alias("cu")), "u")
                .groupBy("v", "cu")
                .agg(F.sum("w").alias("kvc"))
            )
            scored = (
                kvc.join(comm, "v")
                .join(deg, "v")
                .join(tot.select(F.col("comm").alias("cu"), F.col("tot").alias("tot_cu")), "cu")
            )
            stay = scored.where(F.col("cu") == F.col("comm")).select(
                "v", (F.lit(m2) * F.col("kvc")).alias("s_stay_base")
            )
            # S_stay = m2*k_{v,D} - k_v*(tot_D - k_v); vertices with no
            # intra-community neighbor weight get k_{v,D} = 0
            tot_own = (
                comm.join(deg, "v")
                .join(tot, "comm")
                .select("v", "comm", "k", (F.col("tot") - F.col("k")).alias("tot_minus_k"))
            )
            s_stay = (
                tot_own.join(stay, "v", "left")
                .select(
                    "v",
                    "comm",
                    (
                        F.coalesce("s_stay_base", F.lit(0))
                        - F.col("k") * F.col("tot_minus_k")
                    ).cast("long").alias("s_stay"),
                )
            )
            cands = scored.where(F.col("cu") != F.col("comm")).select(
                "v",
                "cu",
                (F.lit(m2) * F.col("kvc") - F.col("k") * F.col("tot_cu"))
                .cast("long")
                .alias("s"),
            )
            best = (
                cands.groupBy("v")
                .agg(F.max(F.struct(F.col("s"), (-F.col("cu")).alias("negc"))).alias("top"))
                .select("v", F.col("top.s").alias("s_best"), (-F.col("top.negc")).alias("c_best"))
            )
            nxt = (
                s_stay.join(best, "v", "left")
                .select(
                    "v",
                    F.when(
                        F.col("s_best").isNotNull() & (F.col("s_best") > F.col("s_stay")),
                        F.col("c_best"),
                    )
                    .otherwise(F.col("comm"))
                    .cast("long")
                    .alias("comm"),
                    F.col("comm").alias("old_comm"),
                )
            ).transform(stats_barrier)
            moved = nxt.where(F.col("comm") != F.col("old_comm")).count()
            comm = nxt.select("v", "comm")
            unpersist_barrier(prev_comm_state)
            prev_comm_state = nxt
            if moved == 0:
                break

        n_nodes = nodes.count()
        n_comms = comm.select("comm").distinct().count()
        old_mapping = mapping
        mapping = (
            mapping.join(comm.select(F.col("v").alias("node"), "comm"), "node")
            .select(VID, F.col("comm").alias("node"))
        ).transform(stats_barrier)
        unpersist_barrier(old_mapping)
        if n_comms == n_nodes:
            break

        # contract: inter-community weights; intra mass -> self-loops
        ec = (
            edges.join(comm.select(F.col("v").alias("a"), F.col("comm").alias("ca")), "a")
            .join(comm.select(F.col("v").alias("b"), F.col("comm").alias("cb")), "b")
            .select("ca", "cb", "w")
        )
        new_self = (
            ec.where(F.col("ca") == F.col("cb"))
            .groupBy(F.col("ca").alias("v"))
            .agg(F.sum("w").alias("iw"))
        )
        carried_self = (
            selfs.join(comm, "v")
            .groupBy(F.col("comm").alias("v"))
            .agg(F.sum("sw").alias("cw"))
        )
        old_selfs, old_edges, old_nodes = selfs, edges, nodes
        selfs = (
            new_self.join(carried_self, "v", "full")
            .select(
                "v",
                (F.coalesce("iw", F.lit(0)) + F.coalesce("cw", F.lit(0)))
                .cast("long")
                .alias("sw"),
            )
        ).transform(stats_barrier)
        edges = (
            ec.where(F.col("ca") != F.col("cb"))
            .select(
                F.least("ca", "cb").alias("a"),
                F.greatest("ca", "cb").alias("b"),
                "w",
            )
            .groupBy("a", "b")
            .agg(F.sum("w").cast("long").alias("w"))
        ).transform(stats_barrier)
        nodes = comm.select(F.col("comm").alias("v")).distinct().transform(stats_barrier)
        # the contracted graph is materialized; the previous level's
        # graph, this phase's degree table and last round's comm state
        # are all dead now
        for dead in (old_selfs, old_edges, old_nodes, deg, prev_comm_state):
            unpersist_barrier(dead)

    # stable labels: min original vid per final community
    labels = mapping.groupBy("node").agg(F.min(VID).alias("community"))
    return mapping.join(labels, "node").select(VID, "community")
