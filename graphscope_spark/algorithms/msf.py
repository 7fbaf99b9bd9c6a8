"""Minimum spanning forest — parallel Borůvka.

Reference: FLASH `msf` / `msf-block` (.gs_conf.yaml:307-817,
apps/flash/matching/msf.h) — Borůvka rounds over the undirected
weighted graph.

Per round (all join+groupBy supersteps):
  1. each component picks its minimum outgoing edge — deterministic
     total order (w, src, dst) so ties cannot diverge across runs or
     partitionings;
  2. picked edges join components (min-label hook + pointer-jumping
     contraction to the component root);
  3. edges are relabeled to component endpoints; intra-component edges
     drop out.  O(log V) rounds, each touching the shrinking edge set.

Output: the forest's edge list in ORIGINAL endpoint ids.  The forest is
unique when all weights are distinct; with ties it is the
deterministic (w, src, dst)-lexicographic forest, which a sequential
Kruskal with the same tie-break reproduces exactly (tests/oracle.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.superstep import stats_barrier
from graphscope_spark.graph import DST, SRC, VID, Graph


def _msf_tail_pdf(pdf):
    """Single-task Kruskal over the surviving inter-component edges,
    ordered by the SAME (w, oa, ob) total order the distributed picks
    use.  Borůvka and Kruskal both yield the unique minimum forest
    under a total edge order (ties broken lexicographically make
    weights effectively distinct), so the tail is exact — pinned
    against the fully-distributed rounds in tests."""
    import numpy as np
    import pandas as pd

    if len(pdf) == 0:
        return pd.DataFrame(
            {
                "src": np.empty(0, np.int64),
                "dst": np.empty(0, np.int64),
                "w": np.empty(0, np.float64),
            }
        )
    order = np.lexsort(
        (pdf["ob"].to_numpy(), pdf["oa"].to_numpy(), pdf["w"].to_numpy())
    )
    ca = pdf["ca"].to_numpy(np.int64)[order]
    cb = pdf["cb"].to_numpy(np.int64)[order]
    oa = pdf["oa"].to_numpy(np.int64)[order]
    ob = pdf["ob"].to_numpy(np.int64)[order]
    w = pdf["w"].to_numpy(np.float64)[order]
    comp = np.unique(np.concatenate([ca, cb]))
    pa = np.searchsorted(comp, ca)
    pb = np.searchsorted(comp, cb)
    parent = np.arange(comp.size)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    keep = np.zeros(pa.size, dtype=bool)
    for i in range(pa.size):
        ra, rb = find(pa[i]), find(pb[i])
        if ra != rb:
            parent[rb] = ra
            keep[i] = True
    return pd.DataFrame({"src": oa[keep], "dst": ob[keep], "w": w[keep]})


def minimum_spanning_forest(
    g: Graph, weight: str = "weight", max_rounds: int = 50,
    local_finish_rows: int = 2_000_000,
) -> DataFrame:
    """Returns (src long, dst long, weight double): the MSF edges,
    canonical src < dst orientation."""
    w = (
        F.col(weight).cast("double")
        if weight in g.edges.columns
        else F.lit(1.0)
    )
    base = (
        g.edges.select(
            F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b"), w.alias("w")
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    ).transform(stats_barrier)

    # work: edges between current components, carrying original
    # endpoints (the output needs original ids, not supernode ids)
    work = base.select(
        F.col("a").alias("ca"), F.col("b").alias("cb"), "w",
        F.col("a").alias("oa"), F.col("b").alias("ob"),
    ).transform(stats_barrier)
    chosen: DataFrame | None = None

    for rnd in range(max_rounds):
        # single-task tail: Borůvka's per-round job count (picks +
        # pointer-jumping contraction + relabel ≈ 8 jobs/round) pays
        # Spark's floor on a shrinking edge set; once the surviving
        # inter-component edges fit one task, one Kruskal with the same
        # (w, oa, ob) order finishes the forest in ONE shuffle.
        # Kruskal runs to COMPLETION, so it is only equivalent to the
        # distributed continuation when the remaining round budget
        # would also complete: Borůvka at least halves the component
        # count per round, so ceil(log2(components)) ≤
        # ceil(log2(n_work + 1)) rounds always suffice.
        if local_finish_rows > 0:
            n_work = work.count()
            if n_work == 0:
                break
            rounds_needed = max(1, (n_work + 1).bit_length())
            if n_work <= local_finish_rows and max_rounds - rnd >= rounds_needed:
                fin = (
                    work.withColumn("g", F.lit(1))
                    .groupBy("g")
                    .applyInPandas(_msf_tail_pdf, "src long, dst long, w double")
                )
                fin = stats_barrier(fin)
                chosen = (
                    fin
                    if chosen is None
                    else chosen.unionByName(fin).transform(stats_barrier)
                )
                break
        elif work.isEmpty():
            break
        # 1. min outgoing edge per component, deterministic order
        sym = work.unionByName(
            work.select(
                F.col("cb").alias("ca"), F.col("ca").alias("cb"), "w", "oa", "ob"
            )
        )
        pick = (
            sym.groupBy("ca")
            .agg(
                F.min(F.struct("w", "oa", "ob", "cb")).alias("m")
            )
            .select(
                F.col("ca"),
                F.col("m.cb").alias("cb"),
                F.col("m.w").alias("w"),
                F.col("m.oa").alias("oa"),
                F.col("m.ob").alias("ob"),
            )
        )
        # dedupe: the same edge picked from both sides appears twice
        new_edges = pick.select(
            F.least("oa", "ob").alias("src"),
            F.greatest("oa", "ob").alias("dst"),
            "w",
        ).distinct().transform(stats_barrier)
        # with COMPLETE contraction (below), chosen edges become
        # intra-component and leave `work`, so picks are always fresh —
        # a plain union suffices, no cross-round dedup
        chosen = (
            new_edges
            if chosen is None
            else chosen.unionByName(new_edges).transform(stats_barrier)
        )

        # 2. contract: connected components of the picked-edge
        # supergraph, COMPLETE min-label propagation (an incomplete
        # contraction is unsound — two sub-components of one true
        # component could later pick a fresh edge between themselves
        # and close a cycle).  Min-label + pointer-doubling shortcut
        # converges in O(log) rounds.
        links = pick.select(F.col("ca").alias("x"), F.col("cb").alias("y"))
        links = links.unionByName(
            links.select(F.col("y").alias("x"), F.col("x").alias("y"))
        ).transform(stats_barrier)
        parent = (
            links.select("x").distinct().select("x", F.col("x").alias("p"))
        ).transform(stats_barrier)
        for _j in range(40):
            lk = links.alias("lk")
            pr = parent.alias("pr")
            msgs = (
                lk.join(pr, F.col("lk.y") == F.col("pr.x"))
                .groupBy(F.col("lk.x").alias("_to"))
                .agg(F.min(F.col("pr.p")).alias("_m"))
            )
            pa = parent.alias("pa")
            pj = parent.alias("pj")
            nxt = (
                pa.join(msgs, F.col("pa.x") == msgs["_to"], "left")
                .join(pj, F.col("pa.p") == F.col("pj.x"), "left")
                .select(
                    F.col("pa.x").alias("x"),
                    F.least(
                        F.col("pa.p"),
                        F.coalesce("_m", F.col("pa.p")),
                        F.coalesce(F.col("pj.p"), F.col("pa.p")),
                    ).alias("p"),
                    (
                        F.least(
                            F.coalesce("_m", F.col("pa.p")),
                            F.coalesce(F.col("pj.p"), F.col("pa.p")),
                        )
                        < F.col("pa.p")
                    ).alias("_ch"),
                )
            ).transform(stats_barrier)
            changed = nxt.agg(F.sum(F.col("_ch").cast("long"))).collect()[0][0] or 0
            parent = nxt.select("x", "p")
            if changed == 0:
                break

        # 3. relabel work edges to new components; drop internals
        pmap_a = parent.select(F.col("x").alias("ca"), F.col("p").alias("na"))
        pmap_b = parent.select(F.col("x").alias("cb"), F.col("p").alias("nb"))
        work = (
            work.join(pmap_a, "ca", "left")
            .join(pmap_b, "cb", "left")
            .select(
                F.coalesce("na", F.col("ca")).alias("ca"),
                F.coalesce("nb", F.col("cb")).alias("cb"),
                "w",
                "oa",
                "ob",
            )
            .where(F.col("ca") != F.col("cb"))
            # keep one minimal representative edge per component pair —
            # the weight-pruning that keeps Borůvka's edge set shrinking
            .groupBy(
                F.least("ca", "cb").alias("ca"), F.greatest("ca", "cb").alias("cb")
            )
            .agg(F.min(F.struct("w", "oa", "ob")).alias("m"))
            .select(
                "ca", "cb", F.col("m.w").alias("w"),
                F.col("m.oa").alias("oa"), F.col("m.ob").alias("ob"),
            )
        ).transform(stats_barrier)

    if chosen is None:
        return g.edges.sparkSession.createDataFrame(
            [], "src long, dst long, weight double"
        )
    return chosen.select("src", "dst", F.col("w").alias("weight"))
