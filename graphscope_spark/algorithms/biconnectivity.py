"""Biconnectivity — bridges, articulation points, biconnected components.

Reference semantics:

- apps/flash/connectivity/bridge.h:46-146 — BFS forest per component,
  then every non-tree edge (u,v) "covers" the tree edges on the two
  tree paths u→lca and v→lca; a tree edge is a bridge iff never
  covered.
- apps/flash/connectivity/cut-point.h:45-155 — same forest; contract
  the covered tree edges *strictly below each cycle's LCA* plus the
  non-tree edges themselves (the reference's `union_f(f, pa, a)` calls,
  guarded by `pa != pb`, are exactly this set); a vertex is a cut point
  iff (non-root) some tree child's class differs from its own, or
  (root) its children span ≥2 classes.
- apps/flash/connectivity/bcc.h — per-edge biconnected-component
  labels; with the contraction classes above, the BCC of a covered
  tree edge (p,c) is the class of the CHILD c (each class is "one
  biconnected component minus its top vertex"), the BCC of a non-tree
  edge (u,v) is the shared class of u/v, and every uncovered tree edge
  (a bridge) is its own singleton BCC.

Spark plan — set-based, no per-edge climbing.  The reference walks
each non-tree edge up the tree sequentially (bridge.h:108-131, a
driver-side loop over global arrays); at 10^12-edge scale that walk
becomes the bottleneck, so we derive the same sets relationally:

1. forest:    comp = WCC min-label; depth = multi-source BFS from the
              per-component min-vid roots; parent(v) = min neighbor at
              depth-1 (deterministic ⇒ replicable by the SQL oracle).
2. ancestors: transitive closure of `parent`, built by pointer
              doubling — ⌈log2(max_depth)⌉ self-joins, |V|·depth rows
              (web graphs are shallow; depth ≲ 20 ⇒ a few rounds).
3. lca(u,v):  max-depth common ancestor — one join of the two
              ancestor chains per non-tree edge.
4. coverage / contraction: pure projections of the (non-tree ×
              ancestor) join — every path vertex strictly below the
              LCA, exactly the set the reference's climb marks.
5. classes:   min-label components over the contraction edge set
              (reuses the WCC kernel; the reference uses a sequential
              union-find, cut-point.h:110-136).

All heavy steps are hash joins on vertex ids ⇒ co-partitioned by the
graph's `num_partitions`; the only iteration is WCC/BFS (frontier
supersteps with stats barriers) and the log-depth doubling loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import stats_barrier
from graphscope_spark.algorithms.wcc import wcc


def _forest(g: Graph) -> tuple[DataFrame, int]:
    """BFS spanning forest: (vid, comp, depth, parent); parent is null
    for roots (the per-component min vid).  Returns (tree, max_depth)."""
    sym = g.symmetrized().cache()
    comp = wcc(g)

    state = stats_barrier(
        comp.select(
            VID,
            "comp",
            F.when(F.col(VID) == F.col("comp"), F.lit(0))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("depth"),
        )
    )
    k = 0
    while True:
        frontier = state.where(F.col("depth") == k).select(VID)
        nbrs = (
            sym.join(frontier, sym[SRC] == frontier[VID])
            .select(F.col(DST).alias(VID))
            .distinct()
        )
        nxt = state.alias("s").join(
            nbrs.withColumn("hit", F.lit(1)).alias("h"), VID, "left"
        ).select(
            F.col(f"s.{VID}").alias(VID),
            "comp",
            F.when((F.col("depth") == -1) & F.col("hit").isNotNull(), F.lit(k + 1))
            .otherwise(F.col("depth"))
            .cast("long")
            .alias("depth"),
        )
        state = stats_barrier(nxt)
        k += 1
        if state.where(F.col("depth") == k).limit(1).count() == 0:
            break
    max_depth = k
    # deterministic parent: min neighbor one level up
    depths = state.select(VID, "depth")
    par = (
        sym.join(depths.withColumnRenamed(VID, SRC).withColumnRenamed("depth", "pd"), SRC)
        .join(depths.withColumnRenamed(VID, DST).withColumnRenamed("depth", "cd"), DST)
        .where(F.col("pd") == F.col("cd") - 1)
        .groupBy(F.col(DST).alias(VID))
        .agg(F.min(SRC).alias("parent"))
    )
    tree = state.join(par, VID, "left").select(VID, "comp", "depth", "parent")
    return stats_barrier(tree).cache(), max_depth


def _ancestors(tree: DataFrame, max_depth: int) -> DataFrame:
    """(vid, anc, adepth): every tree ancestor of vid including itself,
    with the ancestor's depth.  Pointer-doubling closure: log2(depth)
    self-joins instead of depth sequential parent hops."""
    rel = tree.select(
        F.col(VID).alias("v"), F.col(VID).alias("anc"), F.col("depth").alias("adepth")
    ).unionByName(
        tree.where(F.col("parent").isNotNull()).select(
            F.col(VID).alias("v"),
            F.col("parent").alias("anc"),
            (F.col("depth") - 1).alias("adepth"),
        )
    )
    rel = stats_barrier(rel)
    span = 1
    while span < max_depth:
        a = rel.alias("a")
        b = rel.alias("b")
        rel = stats_barrier(
            a.join(b, F.col("a.anc") == F.col("b.v"))
            .select(F.col("a.v").alias("v"), F.col("b.anc").alias("anc"), F.col("b.adepth").alias("adepth"))
            .distinct()
        )
        span *= 2
    return rel


def _analysis(g: Graph) -> dict[str, DataFrame]:
    """Shared tables: tree, canonical undirected edges, non-tree edges,
    coverage (covered tree-edge children), contraction classes."""
    tree, max_depth = _forest(g)
    und = g.symmetrized().where(F.col(SRC) < F.col(DST)).cache()
    tree_e = tree.where(F.col("parent").isNotNull()).select(
        F.least("parent", VID).alias(SRC),
        F.greatest("parent", VID).alias(DST),
        F.col(VID).alias("child"),
    )
    nontree = und.join(tree_e.select(SRC, DST), [SRC, DST], "left_anti")

    anc = _ancestors(tree, max_depth).cache()
    au = anc.select(F.col("v").alias(SRC), F.col("anc").alias("a"), F.col("adepth").alias("ad"))
    av = anc.select(F.col("v").alias(DST), F.col("anc").alias("a"), F.col("adepth").alias("ad"))
    lca = (
        nontree.join(au, SRC)
        .join(av.withColumnRenamed("ad", "ad2"), [DST, "a"])
        .groupBy(SRC, DST)
        .agg(F.max(F.struct(F.col("ad"), F.col("a"))).alias("m"))
        .select(SRC, DST, F.col("m.a").alias("lca"), F.col("m.ad").alias("lca_depth"))
    )
    pathkids = (
        lca.join(au, SRC)
        .where(F.col("ad") > F.col("lca_depth"))
        .select(SRC, DST, "lca", F.col("a").alias("c"))
        .unionByName(
            lca.join(av, DST)
            .where(F.col("ad") > F.col("lca_depth"))
            .select(SRC, DST, "lca", F.col("a").alias("c"))
        )
        .distinct()
    )
    pathkids = stats_barrier(pathkids).cache()
    coverage = pathkids.select("c").distinct().cache()

    contraction = (
        pathkids.join(
            tree.select(F.col(VID).alias("c"), F.col("parent").alias("cp")), "c"
        )
        .where(F.col("cp") != F.col("lca"))
        .select(F.col("c").alias(SRC), F.col("cp").alias(DST))
        .unionByName(nontree.select(SRC, DST))
        .distinct()
    )
    cg = Graph.from_edges(
        contraction,
        g.vertices.select(VID),
        directed=False,
        num_partitions=g.num_partitions,
    )
    cls = wcc(cg).withColumnRenamed("comp", "cls").cache()
    return {
        "tree": tree,
        "und": und,
        "tree_e": tree_e,
        "nontree": nontree,
        "coverage": coverage,
        "cls": cls,
    }


def _bicon_compute(n, eu, ev):
    """Iterative Hopcroft–Tarjan over CSR arrays.  Returns
    (bcc id per canonical edge, bridge mask per edge, cut mask per
    vertex).  Bridges, cut vertices, and BCC edge-sets are unique graph
    properties, so this matches the distributed derivation exactly on
    simple graphs (the only inputs either path defines)."""
    import numpy as np

    m = eu.size
    # adjacency over both directions, carrying the canonical edge id
    heads = np.concatenate([eu, ev])
    tails = np.concatenate([ev, eu])
    eids = np.concatenate([np.arange(m), np.arange(m)])
    order = np.argsort(heads, kind="stable")
    tails, eids = tails[order], eids[order]
    off = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(heads, minlength=n), out=off[1:])

    disc = np.full(n, -1, np.int64)
    low = np.zeros(n, np.int64)
    cut = np.zeros(n, bool)
    bridge = np.zeros(m, bool)
    bcc = np.full(m, -1, np.int64)
    on_stack = np.zeros(m, bool)
    timer = 0
    n_bcc = 0
    estack: list[int] = []
    for root in range(n):
        if disc[root] >= 0:
            continue
        root_children = 0
        # frames: (vertex, incoming canonical edge id, next CSR ptr)
        stack = [[root, -1, off[root]]]
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            fr = stack[-1]
            v, in_eid, ptr = fr
            if ptr < off[v + 1]:
                fr[2] += 1
                u, eid = int(tails[ptr]), int(eids[ptr])
                if eid == in_eid:
                    continue
                if disc[u] < 0:
                    estack.append(eid)
                    on_stack[eid] = True
                    disc[u] = low[u] = timer
                    timer += 1
                    stack.append([u, eid, off[u]])
                elif disc[u] < disc[v]:
                    if not on_stack[eid]:
                        estack.append(eid)
                        on_stack[eid] = True
                    if disc[u] < low[v]:
                        low[v] = disc[u]
            else:
                stack.pop()
                if not stack:
                    break
                p = stack[-1][0]
                if v != root and low[v] < low[p]:
                    low[p] = low[v]
                if p == root:
                    root_children += 1
                # articulation / component pop on the tree edge (p, v)
                if low[v] >= disc[p]:
                    if p != root:
                        cut[p] = True
                    while True:
                        e = estack.pop()
                        bcc[e] = n_bcc
                        if e == in_eid:
                            break
                    n_bcc += 1
                if low[v] > disc[p]:
                    bridge[in_eid] = True
        if root_children >= 2:
            cut[root] = True
    return bcc, bridge, cut


def _bicon_packed(g: Graph, und: DataFrame) -> DataFrame:
    """(tag, a, b) rows: vertices then canonical undirected edges."""
    return g.vertices.select(
        F.lit(1).alias("tag"), F.col(VID).alias("a"), F.lit(0).cast("long").alias("b")
    ).unionByName(
        und.select(F.lit(0).alias("tag"), F.col(SRC).alias("a"), F.col(DST).alias("b"))
    )


def _bicon_fits(g: Graph, und: DataFrame, local_finish_rows: int) -> bool:
    return (
        local_finish_rows > 0
        and g.vertices.count() + und.count() <= local_finish_rows
    )


def _bicon_unpack(pdf):
    import numpy as np

    v = pdf[pdf["tag"] == 1]
    e = pdf[pdf["tag"] == 0]
    vids = np.sort(v["a"].to_numpy(np.int64))
    eu = np.searchsorted(vids, e["a"].to_numpy(np.int64))
    ev = np.searchsorted(vids, e["b"].to_numpy(np.int64))
    return vids, eu, ev


def _bridges_local_pdf(pdf):
    import numpy as np
    import pandas as pd

    vids, eu, ev = _bicon_unpack(pdf)
    if vids.size == 0 or eu.size == 0:
        return pd.DataFrame(
            {"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)}
        )
    _, bridge, _ = _bicon_compute(vids.size, eu, ev)
    return pd.DataFrame({"src": vids[eu[bridge]], "dst": vids[ev[bridge]]})


def _aps_local_pdf(pdf):
    import numpy as np
    import pandas as pd

    vids, eu, ev = _bicon_unpack(pdf)
    if vids.size == 0:
        return pd.DataFrame({"vid": np.empty(0, np.int64)})
    _, _, cut = _bicon_compute(vids.size, eu, ev)
    return pd.DataFrame({"vid": vids[cut]})


def _bcc_local_pdf(pdf):
    import numpy as np
    import pandas as pd

    vids, eu, ev = _bicon_unpack(pdf)
    if eu.size == 0:
        z = np.empty(0, np.int64)
        return pd.DataFrame({"src": z, "dst": z, "bcc_u": z, "bcc_v": z})
    bcc, _, _ = _bicon_compute(vids.size, eu, ev)
    src, dst = vids[eu], vids[ev]
    # canonical id: lexicographically smallest (src, dst) in the BCC
    order = np.lexsort((dst, src))
    k = bcc.max() + 1
    bu = np.full(k, np.iinfo(np.int64).max, np.int64)
    bv = np.full(k, np.iinfo(np.int64).max, np.int64)
    for i in order[::-1]:  # ascending overwrite leaves the minimum
        bu[bcc[i]] = src[i]
        bv[bcc[i]] = dst[i]
    return pd.DataFrame(
        {"src": src, "dst": dst, "bcc_u": bu[bcc], "bcc_v": bv[bcc]}
    )


def bridges(g: Graph, local_finish_rows: int = 4_000_000) -> DataFrame:
    """All bridge edges, canonical (src < dst).  bridge.h semantics:
    a tree edge never covered by a non-tree cycle path; non-tree edges
    are never bridges.  Bridges are a unique graph property, so the
    single-task Hopcroft–Tarjan finisher is exact when the graph fits
    one executor task; the set-based distributed derivation below is
    the scale path (local_finish_rows=0 forces it)."""
    und = g.symmetrized().where(F.col(SRC) < F.col(DST))
    if _bicon_fits(g, und, local_finish_rows):
        return (
            _bicon_packed(g, und)
            .withColumn("g", F.lit(1))
            .groupBy("g")
            .applyInPandas(_bridges_local_pdf, f"{SRC} long, {DST} long")
        )
    t = _analysis(g)
    return (
        t["tree_e"]
        .join(t["coverage"], t["tree_e"]["child"] == t["coverage"]["c"], "left_anti")
        .select(SRC, DST)
    )


def articulation_points(g: Graph, local_finish_rows: int = 4_000_000) -> DataFrame:
    """(vid) rows: the cut vertices.  cut-point.h:138-150 test over the
    contraction classes: non-root v is cut iff some tree child's class
    differs from v's; a root is cut iff its children span ≥2 classes.
    Cut vertices are a unique graph property — single-task finisher as
    in :func:`bridges`."""
    und0 = g.symmetrized().where(F.col(SRC) < F.col(DST))
    if _bicon_fits(g, und0, local_finish_rows):
        return (
            _bicon_packed(g, und0)
            .withColumn("g", F.lit(1))
            .groupBy("g")
            .applyInPandas(_aps_local_pdf, f"{VID} long")
        )
    t = _analysis(g)
    tree, cls = t["tree"], t["cls"]
    children = tree.where(F.col("parent").isNotNull()).select(
        F.col("parent").alias("p"), F.col(VID).alias("c")
    )
    chcls = children.join(cls.select(F.col(VID).alias("c"), F.col("cls").alias("ccls")), "c")
    own = tree.join(cls, VID).select(VID, "parent", F.col("cls").alias("vcls"))
    nonroot = (
        chcls.join(own, chcls["p"] == own[VID])
        .where(F.col("parent").isNotNull() & (F.col("ccls") != F.col("vcls")))
        .select(F.col("p").alias(VID))
        .distinct()
    )
    root = (
        chcls.join(own.where(F.col("parent").isNull()).select(VID), chcls["p"] == F.col(VID))
        .groupBy("p")
        .agg(F.countDistinct("ccls").alias("nc"))
        .where(F.col("nc") >= 2)
        .select(F.col("p").alias(VID))
    )
    return nonroot.unionByName(root).distinct()


def biconnected_components(g: Graph, local_finish_rows: int = 4_000_000) -> DataFrame:
    """Per-edge BCC labels: (src, dst, bcc_u, bcc_v) where
    (bcc_u, bcc_v) is the lexicographically smallest canonical edge of
    the component — a deterministic, spanning-tree-independent id.

    Covered tree edge (p,c) → class(c); non-tree edge (u,v) →
    class(u) (= class(v)); bridge → its own singleton.  Assumes
    non-negative vids (bridge pre-labels use the negative range).
    BCC edge-sets and their canonical min-edge ids are spanning-tree
    independent — single-task finisher as in :func:`bridges`."""
    und0 = g.symmetrized().where(F.col(SRC) < F.col(DST))
    if _bicon_fits(g, und0, local_finish_rows):
        return (
            _bicon_packed(g, und0)
            .withColumn("g", F.lit(1))
            .groupBy("g")
            .applyInPandas(
                _bcc_local_pdf, f"{SRC} long, {DST} long, bcc_u long, bcc_v long"
            )
        )
    t = _analysis(g)
    cls = t["cls"]
    tree_lbl = (
        t["tree_e"]
        .join(t["coverage"], t["tree_e"]["child"] == t["coverage"]["c"], "left")
        .join(cls.select(F.col(VID).alias("child"), "cls"), "child")
        .select(
            SRC,
            DST,
            F.when(F.col("c").isNotNull(), F.col("cls"))
            .otherwise(-(F.col("child") + 1))
            .alias("pre"),
        )
    )
    nontree_lbl = t["nontree"].join(
        cls.select(F.col(VID).alias(SRC), "cls"), SRC
    ).select(SRC, DST, F.col("cls").alias("pre"))
    lbl = tree_lbl.unionByName(nontree_lbl)
    canon = lbl.groupBy("pre").agg(F.min(F.struct(SRC, DST)).alias("m"))
    return lbl.join(canon, "pre").select(
        SRC, DST, F.col(f"m.{SRC}").alias("bcc_u"), F.col(f"m.{DST}").alias("bcc_v")
    )
