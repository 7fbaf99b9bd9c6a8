"""Graph-level clustering statistics: average clustering & transitivity.

Reference: `avg_clustering` and `transitivity`
(.gs_conf.yaml:174-191; apps/clustering/{avg_clustering,transitivity}.h)
— NetworkX semantics on the undirected simple graph:

- avg_clustering = (1/n) Σ_v lcc(v)
- transitivity   = 3·(#triangles) / (#wedges),
  #wedges = Σ_v deg(v)·(deg(v)−1)/2  (open + closed triads)

Both reuse the per-vertex triangle machinery (triangles.py, the
degree-oriented 3-way join of apps/clustering/triangles.h:43-158) and
reduce to a single scalar — returned as 1-row DataFrames so they
compose with the rest of the API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.algorithms.lcc import lcc
from graphscope_spark.algorithms.triangles import triangles
from graphscope_spark.graph import VID, Graph


def avg_clustering(g: Graph) -> DataFrame:
    """Returns a single row (avg_clustering double)."""
    return lcc(g).agg(F.avg("lcc").alias("avg_clustering"))


def transitivity(g: Graph) -> DataFrame:
    """Returns a single row (transitivity double)."""
    tri = triangles(g)
    deg = g.degrees()
    stats = tri.join(deg, VID).agg(
        F.sum("tri").alias("tri3"),  # Σ per-vertex counts = 3·#triangles
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("wedges"),
    )
    return stats.select(
        F.when(F.col("wedges") > 0, F.col("tri3") / F.col("wedges"))
        .otherwise(0.0)
        .alias("transitivity")
    )
