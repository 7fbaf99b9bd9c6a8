"""Local clustering coefficient (LDBC LCC, undirected convention).

Reference: grape::LCCOpt registered at .gs_conf.yaml:87-94, documented
in docs/analytical_engine/builtin_algorithms.md:248-256 — per-vertex
ratio of closed wedges: lcc(v) = 2·triangles(v) / (deg(v)·(deg(v)−1))
on the undirected graph, 0 when deg(v) < 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import VID, Graph
from graphscope_spark.algorithms.triangles import triangles


def lcc(g: Graph) -> DataFrame:
    """Returns (vid long, lcc double)."""
    tri = triangles(g)
    deg = g.degrees()
    return tri.join(deg, VID).select(
        VID,
        F.when(
            F.col("deg") >= 2,
            2.0 * F.col("tri") / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(0.0)
        .alias("lcc"),
    )
