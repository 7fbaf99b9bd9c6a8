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


def louvain(
    g: Graph,
    max_rounds: int = 10,
    max_phases: int = 3,
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
