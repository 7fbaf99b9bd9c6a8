"""Distance-statistics operators over the multi-source kernel.

Reference registry analogs:
- `all_pairs_shortest_path_length` (.gs_conf.yaml:220-225, apps/apsp/) —
  here in its scale-sane sampled form: exact lengths from a designated
  root sample (the all-pairs form is O(V·E) and only for tiny graphs).
- FLASH `diameter-approx` (.gs_conf.yaml:307-817, apps/flash/measurement/) —
  max sampled eccentricity lower-bounds the diameter.
- FLASH `harmonic` centrality (apps/flash/centrality/) — NX harmonic:
  c(v) = Σ_{u≠v} 1/d(u,v), 0 for unreachable.

All of these are one final groupBy over the wide multi-source BFS
(multisource.py): |E| message rows per level regardless of root count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.algorithms.multisource import multi_source_distances
from graphscope_spark.graph import VID, Graph


def apsp_sampled(
    g: Graph,
    roots: DataFrame | list[int] | None = None,
    weight: str | None = None,
    directed: bool | None = False,
) -> DataFrame:
    """Exact shortest-path lengths from each sampled root:
    (root long, vid long, dist double), reachable pairs only."""
    return multi_source_distances(g, roots, weight=weight, directed=directed)


def eccentricity(
    g: Graph,
    roots: DataFrame | list[int] | None = None,
    directed: bool | None = False,
) -> DataFrame:
    """BFS eccentricity of each root over the undirected view:
    (vid long, ecc long) — max hop distance to any reachable vertex."""
    pairs = multi_source_distances(g, roots, weight=None, directed=directed)
    return pairs.groupBy(F.col("root").alias(VID)).agg(
        F.max("dist").cast("long").alias("ecc")
    )


def diameter_approx(
    g: Graph,
    roots: DataFrame | list[int] | None = None,
) -> DataFrame:
    """Sampled-eccentricity diameter lower bound: single row
    (diameter long).  With roots=None (all vertices) this is the exact
    diameter of the largest reachable sets."""
    return eccentricity(g, roots).agg(F.max("ecc").alias("diameter"))


def harmonic_centrality(
    g: Graph,
    roots: DataFrame | list[int] | None = None,
    directed: bool = False,
) -> DataFrame:
    """NX harmonic centrality restricted to ``roots`` (undirected BFS
    distances): (vid long, centrality double) = Σ_{u≠v} 1/d(v,u).

    ``directed=True`` = NX DiGraph convention (incoming distances),
    run as the same sweep on the reversed-arc view."""
    pairs = multi_source_distances(
        g.reverse() if directed else g, roots, weight=None, directed=directed
    )
    root_df = (
        (roots if isinstance(roots, DataFrame) else g.vertices)
        .select(F.col(VID).alias("root"))
        if roots is None or isinstance(roots, DataFrame)
        else g.edges.sparkSession.createDataFrame(
            [(int(r),) for r in roots], "root long"
        )
    )
    per_root = (
        pairs.where(F.col(VID) != F.col("root"))
        .groupBy("root")
        .agg(F.sum(1.0 / F.col("dist")).alias("centrality"))
    )
    return root_df.join(per_root, "root", "left").select(
        F.col("root").alias(VID),
        F.coalesce("centrality", F.lit(0.0)).alias("centrality"),
    )


def random_multi_bfs(
    g: Graph,
    k: int = 8,
    roots: list[int] | None = None,
    directed: bool | None = False,
) -> DataFrame:
    """FLASH random-multi-bfs (apps/flash/traversal/random-multi-bfs.h:42-90):
    BFS from k random roots; per-vertex result = MAX over roots of the
    BFS depth (the reference inits every slot to -1 and takes the max,
    so a vertex unreached by every root reports -1).  Used as a cheap
    eccentricity / diameter probe.

    The reference seeds rand_r with time() (:49-52) — irreproducible by
    design.  Here the "random" sample is the k smallest md5(vid) hex
    strings: deterministic, uniformly pseudo-random, and computable
    bit-identically in any engine with md5().

    Returns (vid long, res long).
    """
    if roots is None:
        roots = [
            r[0]
            for r in g.vertices.select(VID)
            .orderBy(F.md5(F.col(VID).cast("string")))
            .limit(k)
            .collect()
        ]
    pairs = multi_source_distances(g, roots, weight=None, directed=directed)
    res = pairs.groupBy(VID).agg(F.max("dist").cast("long").alias("res"))
    return (
        g.vertices.select(VID)
        .join(res, VID, "left")
        .select(VID, F.coalesce("res", F.lit(-1)).cast("long").alias("res"))
    )
