"""Betweenness centrality — Brandes' algorithm, multi-source DataFrame form.

Reference: `betweenness_centrality` / `betweenness_centrality_generic`
(.gs_conf.yaml:286-298, apps/centrality/betweenness/*) — NX semantics
on the undirected graph, unweighted shortest paths.

Brandes (public algorithm, Journal of Mathematical Sociology 2001):
for each source s,
  forward BFS computing depth d(v) and path counts σ(v);
  backward sweep by decreasing depth accumulating
      δ(v) = Σ_{w: v ∈ pred(w)} σ(v)/σ(w) · (1 + δ(w));
  bc(v) += δ(v) for v ≠ s.

Spark-native shape: state keyed by (root, vid) so ALL sources run
simultaneously — each BFS level is one join + groupBy over the
(root, vid) pair table, and the backward sweep reuses the same
level-synchronous structure in reverse.  Exact betweenness is O(V·E);
pass a sampled/landmark ``roots`` DataFrame at scale (the standard
Brandes-sampling estimator: scale results by n/|roots|).

Undirected convention: each pair counted twice (once per direction),
so final scores are halved; NX ``normalized=False`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph


def betweenness_centrality(
    g: Graph,
    roots: DataFrame | None = None,
    max_depth: int = 64,
    normalized: bool = False,
) -> DataFrame:
    """Returns (vid long, betweenness double).

    ``roots=None`` uses every vertex (exact; small graphs only).
    With a sampled root set, scores are scaled by n/|roots|.
    """
    spark = g.edges.sparkSession
    sym = g.symmetrized().cache()
    n = g.num_vertices()
    root_df = (roots or g.vertices).select(F.col(VID).alias("root"))
    n_roots = root_df.count()

    # ---- forward phase: (root, vid, depth, sigma) ---------------------
    # frontier carries the newly-settled level; sigma sums path counts
    settled = root_df.select(
        "root", F.col("root").alias(VID), F.lit(0).alias("depth"),
        F.lit(1.0).alias("sigma"),
    ).localCheckpoint(eager=True)
    frontier = settled
    levels = [settled]  # per-level slices for the backward sweep
    depth = 0
    while depth < max_depth:
        depth += 1
        expanded = (
            frontier.join(sym, frontier[VID] == sym[SRC])
            .select("root", F.col(DST).alias(VID), F.col("sigma"))
            .groupBy("root", VID)
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = (
            expanded.join(
                settled.select("root", VID, F.lit(1).alias("_seen")),
                ["root", VID],
                "left",
            )
            .where(F.col("_seen").isNull())
            .select("root", VID, F.lit(depth).alias("depth"), "sigma")
        ).localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        levels.append(nxt)
        frontier = nxt

    # ---- backward phase: accumulate dependencies level by level -------
    # delta(v) per root, processed from the deepest level upwards.
    # edge (v -> w) is a DAG edge iff depth(w) = depth(v) + 1.
    delta = None  # (root, vid, delta) for levels processed so far
    for lvl in range(len(levels) - 1, 0, -1):
        w_level = levels[lvl].select(
            "root", F.col(VID).alias("w"), F.col("sigma").alias("sigma_w")
        )
        if delta is not None:
            w_level = w_level.join(
                delta.select("root", F.col(VID).alias("w"), F.col("delta").alias("dw")),
                ["root", "w"],
                "left",
            ).select(
                "root", "w", "sigma_w", F.coalesce("dw", F.lit(0.0)).alias("dw")
            )
        else:
            w_level = w_level.select("root", "w", "sigma_w", F.lit(0.0).alias("dw"))
        v_level = levels[lvl - 1].select(
            "root", F.col(VID).alias("v"), F.col("sigma").alias("sigma_v")
        )
        contrib = (
            sym.select(F.col(SRC).alias("v"), F.col(DST).alias("w"))
            .join(w_level, "w")
            .join(v_level, ["root", "v"])
            .select(
                "root",
                F.col("v").alias(VID),
                (F.col("sigma_v") / F.col("sigma_w") * (1.0 + F.col("dw"))).alias("c"),
            )
            .groupBy("root", VID)
            .agg(F.sum("c").alias("delta"))
        ).localCheckpoint(eager=True)
        delta = contrib if delta is None else (
            delta.unionByName(contrib)
            .groupBy("root", VID)
            .agg(F.sum("delta").alias("delta"))
            .localCheckpoint(eager=True)
        )

    if delta is None:  # no edges reachable from any root
        sym.unpersist()
        return g.vertices.select(VID, F.lit(0.0).alias("betweenness"))

    scale = 0.5  # undirected: each pair counted in both directions
    if n_roots < n:
        scale *= n / n_roots  # Brandes sampling estimator
    if normalized and n > 2:
        scale *= 2.0 / ((n - 1) * (n - 2))
    bc = (
        delta.where(F.col(VID) != F.col("root"))
        .groupBy(VID)
        .agg((F.sum("delta") * scale).alias("betweenness"))
    )
    out = g.vertices.select(VID).join(bc, VID, "left").select(
        VID, F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )
    sym.unpersist()
    return out
