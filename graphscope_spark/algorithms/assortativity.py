"""Assortativity / mixing statistics.

Reference: `degree_assortativity_coefficient` and
`average_degree_connectivity` (.gs_conf.yaml:234-269,
apps/assortativity/*) — NetworkX semantics, computed here on the
undirected (symmetrized, deduplicated, self-loop-free) graph:

- degree assortativity = Pearson correlation of (deg(u), deg(v)) over
  all ORDERED edge endpoints (each undirected edge contributes both
  (u,v) and (v,u), making the correlation symmetric).
- average degree connectivity: knn(k) = mean over vertices of degree k
  of the average neighbor degree.

Both are single-pass: one join to attach degrees to edge endpoints,
then built-in covariance/average aggregates — no iteration, fully
Catalyst-planned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph


def _edge_degrees(g: Graph) -> DataFrame:
    """(src, dst, deg_src, deg_dst) over the symmetrized edge set."""
    sym = g.symmetrized()
    deg = g.degrees()
    return (
        sym.join(deg.select(F.col(VID).alias(SRC), F.col("deg").alias("deg_src")), SRC)
        .join(deg.select(F.col(VID).alias(DST), F.col("deg").alias("deg_dst")), DST)
        .select(SRC, DST, "deg_src", "deg_dst")
    )


def degree_assortativity(g: Graph) -> DataFrame:
    """Returns a single row (assortativity double) — Pearson r of
    endpoint degrees over ordered symmetrized edges."""
    ed = _edge_degrees(g)
    return ed.agg(
        F.coalesce(
            F.corr(F.col("deg_src").cast("double"), F.col("deg_dst").cast("double")),
            F.lit(0.0),
        ).alias("assortativity")
    )


def average_degree_connectivity(g: Graph) -> DataFrame:
    """Returns (degree long, knn double): for each degree value, the
    mean over vertices of that degree of their average neighbor degree."""
    ed = _edge_degrees(g)
    per_vertex = ed.groupBy(F.col(SRC).alias(VID)).agg(
        F.first("deg_src").alias("degree"),
        F.avg(F.col("deg_dst").cast("double")).alias("avg_nbr_deg"),
    )
    return (
        per_vertex.groupBy("degree")
        .agg(F.avg("avg_nbr_deg").alias("knn"))
        .select(F.col("degree").cast("long").alias("degree"), "knn")
    )
