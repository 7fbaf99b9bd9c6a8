"""Degree centrality family.

Reference: grape degree_centrality (.gs_conf.yaml:131-137,
apps/centrality/degree/degree_centrality.h): centrality =
degree / (n - 1), NetworkX convention, with in/out/both variants
(nx/algorithms/builtin.py:174).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import VID, Graph


def degree_centrality(g: Graph, centrality_type: str = "both") -> DataFrame:
    """Returns (vid long, centrality double).  ``centrality_type`` in
    {"in", "out", "both"}; "both" uses in+out degree on the directed
    multigraph view (NX: degree counts each direction)."""
    n = g.num_vertices()
    denom = float(max(n - 1, 1))
    if centrality_type == "in":
        deg = g.in_degrees().withColumnRenamed("in_deg", "d")
    elif centrality_type == "out":
        deg = g.out_degrees().withColumnRenamed("out_deg", "d")
    else:
        deg = (
            g.in_degrees()
            .join(g.out_degrees(), VID)
            .select(VID, (F.col("in_deg") + F.col("out_deg")).alias("d"))
        )
    return deg.select(VID, (F.col("d") / denom).alias("centrality"))
