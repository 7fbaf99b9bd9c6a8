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
from graphscope_spark.graph import DST, SRC, VID, Graph


def avg_clustering(g: Graph) -> DataFrame:
    """Returns a single row (avg_clustering double)."""
    return lcc(g).agg(F.avg("lcc").alias("avg_clustering"))


def lcc_directed(g: Graph) -> DataFrame:
    """LDBC directed local clustering coefficient: (vid long, lcc double).

    Reference `lcc_directed` (grape::LCCDirected, registry
    .gs_conf.yaml:95-102; LDBC Graphalytics LCC spec): the neighborhood
    N(v) ignores edge direction, the numerator counts DIRECTED edges
    among members of N(v), the denominator is |N(v)|·(|N(v)|−1); 0 when
    |N(v)| < 2.

    Plan: nbr = distinct symmetrized adjacency; for every directed edge
    (u,w), each vertex v adjacent to both u and w gains 1 — expressed as
    edges ⋈ nbr(u) ⋈ nbr(w) with the count grouped by v.  Both joins
    shuffle on vertex ids; at web scale the heavy side is the hub
    adjacency, handled by the same salting used for triangles.
    """
    edges = g.distinct_edges().select(SRC, DST)
    nbr = (
        edges.unionByName(edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
        .distinct()
        .select(F.col(SRC).alias(VID), F.col(DST).alias("u"))
    )
    deg = nbr.groupBy(VID).agg(F.count(F.lit(1)).alias("d"))
    n1 = nbr.select(F.col(VID).alias("v"), F.col("u").alias(SRC))
    n2 = nbr.select(F.col(VID).alias("v"), F.col("u").alias(DST))
    tri = (
        edges.join(n1, SRC)
        .join(n2, ["v", DST])
        .groupBy(F.col("v").alias(VID))
        .agg(F.count(F.lit(1)).alias("t"))
    )
    verts = nbr.select(VID).distinct()
    return (
        verts.join(deg, VID, "left")
        .join(tri, VID, "left")
        .select(
            VID,
            F.when(
                F.coalesce("d", F.lit(0)) >= 2,
                F.coalesce(F.col("t").cast("double"), F.lit(0.0))
                / (F.col("d") * (F.col("d") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def clustering_directed(g: Graph) -> DataFrame:
    """Directed clustering coefficient, NX semantics (Fagiolo 2007) —
    the reference's `clustering` app is directed-aware
    (apps/clustering/clustering.h, .gs_conf.yaml:168-173):

        c(v) = T(v) / (d_tot(v)·(d_tot(v)−1) − 2·d_recip(v))
        T(v)  = ½ [(A+Aᵀ)³]_vv

    where d_tot = in+out degree, d_recip = #reciprocal neighbors.
    Returns (vid long, clustering double), 0 where the denominator is 0.

    Plan: build B = A+Aᵀ as a weighted edge table (w=2 when the edge is
    reciprocated), then T(v) = ½·Σ over closed 3-walks v→j→k→v of
    w₁w₂w₃ — two hash joins + one groupBy, the same shape as the
    triangle plan but weighted.
    """
    e = g.distinct_edges().select("src", "dst")
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    b = (
        e.withColumn("w", F.lit(1))
        .unionByName(rev.withColumn("w", F.lit(1)))
        .groupBy("src", "dst")
        .agg(F.sum("w").cast("long").alias("w"))
    )
    b1 = b.select(F.col("src").alias("v"), F.col("dst").alias("j"), F.col("w").alias("w1"))
    b2 = b.select(F.col("src").alias("j"), F.col("dst").alias("k"), F.col("w").alias("w2"))
    b3 = b.select(F.col("src").alias("k"), F.col("dst").alias("v2"), F.col("w").alias("w3"))
    t = (
        b1.join(b2, "j")
        .join(b3, "k")
        .where(F.col("v2") == F.col("v"))
        .groupBy(F.col("v").alias(VID))
        .agg((F.sum(F.col("w1") * F.col("w2") * F.col("w3")) / 2.0).alias("t"))
    )
    din = e.groupBy(F.col("dst").alias(VID)).agg(F.count(F.lit(1)).alias("din"))
    dout = e.groupBy(F.col("src").alias(VID)).agg(F.count(F.lit(1)).alias("dout"))
    drec = (
        b.where(F.col("w") == 2)
        .groupBy(F.col("src").alias(VID))
        .agg(F.count(F.lit(1)).alias("drec"))
    )
    return (
        g.vertices.select(VID)
        .join(t, VID, "left")
        .join(din, VID, "left")
        .join(dout, VID, "left")
        .join(drec, VID, "left")
        .select(
            VID,
            F.coalesce("t", F.lit(0.0)).alias("t"),
            (F.coalesce("din", F.lit(0)) + F.coalesce("dout", F.lit(0))).alias("dt"),
            F.coalesce("drec", F.lit(0)).alias("dr"),
        )
        .select(
            VID,
            F.when(
                (F.col("dt") * (F.col("dt") - 1) - 2 * F.col("dr")) > 0,
                F.col("t") / (F.col("dt") * (F.col("dt") - 1) - 2 * F.col("dr")),
            )
            .otherwise(0.0)
            .alias("clustering"),
        )
    )


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
