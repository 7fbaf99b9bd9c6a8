"""Node / edge boundary operators.

Reference: `node_boundary` / `edge_boundary` (.gs_conf.yaml:242-255,
apps/boundary/{node_boundary.h,edge_boundary.h}) — NX semantics:

- node_boundary(G, S):  vertices NOT in S with at least one in-edge
  from S (directed: successors of S outside S).
- edge_boundary(G, S):  edges (u, v) with u ∈ S and v ∉ S.

Pure one-pass relational plans: a broadcast semi/anti-join pair against
the (small) vertex set — no iteration, no custom machinery.  At scale
the S set is broadcast and the edge scan is the only large side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph


def node_boundary(g: Graph, s: DataFrame) -> DataFrame:
    """Returns (vid long): successors of S outside S."""
    sv = F.broadcast(s.select(F.col(s.columns[0]).alias(VID)).distinct())
    edges = g.edges if g.directed else g.symmetrized()
    return (
        edges.join(sv.select(F.col(VID).alias(SRC)), SRC, "semi")
        .select(F.col(DST).alias(VID))
        .distinct()
        .join(sv, VID, "anti")
        .select(VID)
    )


def edge_boundary(g: Graph, s: DataFrame) -> DataFrame:
    """Returns (src long, dst long): edges leaving S."""
    sv = F.broadcast(s.select(F.col(s.columns[0]).alias(VID)).distinct())
    edges = g.distinct_edges() if g.directed else g.symmetrized()
    return (
        edges.join(sv.select(F.col(VID).alias(SRC)), SRC, "semi")
        .join(sv.select(F.col(VID).alias(DST)), DST, "anti")
        .select(SRC, DST)
    )
