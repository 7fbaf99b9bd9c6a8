"""BFS/SSSP variants: parents, reachability, average path length.

Reference registry: `bfs_generic` (apps/bfs/bfs_generic.h — parent /
depth / successor outputs), `sssp_has_path`, `sssp_average_length`
(.gs_conf.yaml:103-122,198-205).  All built on the same
frontier-relaxation supersteps as bfs.py / sssp.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.algorithms.bfs import bfs
from graphscope_spark.algorithms.sssp import sssp
from graphscope_spark.graph import DST, SRC, VID, Graph


def bfs_parent(
    g: Graph, source: int, directed: bool | None = None, max_depth: int = 100
) -> DataFrame:
    """Returns (vid long, depth long, parent long).

    parent = the minimum-id neighbor at depth-1 (deterministic choice
    among equally-deep predecessors); source's parent is itself;
    unreachable → depth -1, parent -1.

    Plan: one BFS for depths, then a single join assigning parents —
    cheaper than carrying parents through every superstep.
    """
    depths = bfs(g, source=source, directed=directed, max_depth=max_depth)
    use_directed = g.directed if directed is None else directed
    edges = g.distinct_edges() if use_directed else g.symmetrized()
    dsrc = depths.select(F.col(VID).alias(SRC), F.col("depth").alias("sd"))
    ddst = depths.select(F.col(VID).alias(DST), F.col("depth").alias("dd"))
    parents = (
        edges.join(dsrc, SRC)
        .join(ddst, DST)
        .where((F.col("sd") >= 0) & (F.col("dd") == F.col("sd") + 1))
        .groupBy(F.col(DST).alias(VID))
        .agg(F.min(SRC).alias("parent"))
    )
    return depths.join(parents, VID, "left").select(
        VID,
        "depth",
        F.when(F.col(VID) == source, F.lit(source))
        .when(F.col("depth") == -1, F.lit(-1))
        .otherwise(F.col("parent"))
        .cast("long")
        .alias("parent"),
    )


def sssp_has_path(g: Graph, source: int, target: int, weight: str | None = "weight") -> DataFrame:
    """Returns a single row (has_path boolean)."""
    d = sssp(g, source=source, weight=weight)
    return d.where(F.col(VID) == target).select(
        (~F.isnan("dist") & (F.col("dist") != float("inf"))).alias("has_path")
    )


def sssp_path(g: Graph, source: int, weight: str | None = "weight") -> DataFrame:
    """Shortest-path tree: (pred long, vid long, dist double), one row
    per REACHABLE vertex; the source's predecessor is itself.

    Reference `sssp_path` (apps/sssp/sssp_path.h:33-41) emits
    [predecessor, node, sssp_length]; its tie-break among equal-distance
    predecessors is message-arrival order (sssp_path.h:96-103), which is
    partition-dependent — here the canonical deterministic choice: the
    minimum-id u with dist(u) + w(u,v) = dist(v).  At the fixpoint every
    non-source vertex has at least one such u, and both equality sides
    are identical IEEE double additions, so the float comparison is
    exact.

    Plan: one SSSP for distances, then a single edges⋈dist⋈dist join
    assigning predecessors — cheaper than carrying parent pointers
    through every superstep (same shape as bfs_parent above).
    """
    inf = float("inf")
    d = sssp(g, source=source, weight=weight)
    cols = g.edges.columns
    if weight and weight in cols:
        edges = g.edges.select(SRC, DST, F.col(weight).cast("double").alias("w"))
    else:
        edges = g.edges.select(SRC, DST, F.lit(1.0).alias("w"))
    if not g.directed:
        edges = edges.unionByName(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w")
        )
    dsrc = d.select(F.col(VID).alias(SRC), F.col("dist").alias("sd"))
    ddst = d.select(F.col(VID).alias(DST), F.col("dist").alias("dd"))
    preds = (
        edges.join(dsrc, SRC)
        .join(ddst, DST)
        .where((F.col("sd") < inf) & (F.col("sd") + F.col("w") == F.col("dd")))
        .groupBy(F.col(DST).alias(VID))
        .agg(F.min(SRC).alias("pred"))
    )
    return (
        d.where(F.col("dist") < inf)
        .join(preds, VID, "left")
        .select(
            F.when(F.col(VID) == source, F.lit(source))
            .otherwise(F.col("pred"))
            .cast("long")
            .alias("pred"),
            VID,
            "dist",
        )
    )


def sssp_average_length(
    g: Graph,
    sources: DataFrame | None = None,
    weight: str | None = "weight",
) -> DataFrame:
    """Average shortest-path length from each source to its reachable
    vertices (excluding self), averaged over sources: single row
    (avg_length double).

    ``sources=None`` averages over every vertex (exact average path
    length — O(V·E), only for small/sampled graphs; pass a landmark
    sample at scale, mirroring closeness_centrality).
    """
    from graphscope_spark.algorithms.multisource import multi_source_distances

    roots = (sources or g.vertices).select(F.col(VID).alias("root"))
    # wide-column multi-source Bellman-Ford (multisource.py): one
    # distance column per source, |E| message rows per round
    pairs = multi_source_distances(g, roots, weight=weight, directed=g.directed)
    per_root = pairs.where(F.col(VID) != F.col("root")).groupBy("root").agg(
        F.avg("dist").alias("avg_d")
    )
    return per_root.agg(F.avg("avg_d").alias("avg_length"))
