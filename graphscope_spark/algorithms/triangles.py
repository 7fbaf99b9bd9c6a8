"""Triangle counting — degree-ordered orientation + wedge closing.

Reference semantics (apps/clustering/triangles.h:43-158): undirected
graph; (1) compute global degrees, (2) orient every edge from the
lower (degree, id) endpoint to the higher (:78-91), (3) intersect
oriented neighbor lists; each triangle found once adds 1 to all three
corners (:119-139), so per-vertex counts sum to 3× the global count
(verified by the reference's own test, test_app.py:224-234).  FLASH's
global variant uses the same orientation (apps/flash/subgraph/
triangle.h:54-56).

Spark plan (set intersection → joins):
    e_or   = oriented edge list (a, b) with key(a) < key(b),
             key = struct(degree, vid) — lexicographic, matching :78-91
    wedges = e_or ⋈ e_or on a        (co-partitioned self-join: both
                                      sides hash-partitioned by a — no
                                      extra shuffle at scale)
    tri    = wedges ⋈ e_or on the closing pair (b1, b2) ordered by key
Skew note: high-degree hubs appear as `a` in few oriented edges (the
orientation pushes hubs to the `b` side), which is exactly why the
reference orients by degree — the same trick bounds our wedge-join fan
-out; residual skew is split by AQE skew-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph


def _oriented(g: Graph) -> DataFrame:
    """Oriented edges (a, b, kb) with key(a) < key(b); kb = key struct of b."""
    sym = g.symmetrized()
    deg = sym.groupBy(F.col(SRC).alias(VID)).agg(F.count(F.lit(1)).alias("deg"))
    e = (
        sym.join(deg.select(F.col(VID).alias(SRC), F.col("deg").alias("deg_s")), SRC)
        .join(deg.select(F.col(VID).alias(DST), F.col("deg").alias("deg_d")), DST)
    )
    ks = F.struct(F.col("deg_s").alias("d"), F.col(SRC).alias("v"))
    kd = F.struct(F.col("deg_d").alias("d"), F.col(DST).alias("v"))
    return e.where(ks < kd).select(
        F.col(SRC).alias("a"), F.col(DST).alias("b"), kd.alias("kb")
    )


def _triangle_corners(g: Graph) -> DataFrame:
    """One row (u, v, w) per triangle, found exactly once."""
    e_or = _oriented(g).cache()
    e1 = e_or.alias("e1")
    e2 = e_or.alias("e2")
    wedges = (
        e1.join(e2, F.col("e1.a") == F.col("e2.a"))
        .where(F.col("e1.kb") < F.col("e2.kb"))
        .select(
            F.col("e1.a").alias("u"), F.col("e1.b").alias("v"), F.col("e2.b").alias("w")
        )
    )
    closing = e_or.select(F.col("a").alias("v"), F.col("b").alias("w"))
    return wedges.join(closing, ["v", "w"], "inner")  # leftsemi would drop columns


def triangles(g: Graph) -> DataFrame:
    """Per-vertex triangle counts: (vid long, tri long), 0 for
    triangle-free vertices.  Σ tri = 3 × global count
    (triangles.h:129-131)."""
    tri = _triangle_corners(g)
    corners = (
        tri.select(F.col("u").alias(VID))
        .unionAll(tri.select(F.col("v").alias(VID)))
        .unionAll(tri.select(F.col("w").alias(VID)))
    )
    counts = corners.groupBy(VID).agg(F.count(F.lit(1)).alias("tri"))
    return g.vertices.select(VID).join(counts, VID, "left").select(
        VID, F.coalesce("tri", F.lit(0)).cast("long").alias("tri")
    )


def triangle_count(g: Graph) -> int:
    """Global triangle count (flash/subgraph/triangle.h:42-74)."""
    return _triangle_corners(g).count()
