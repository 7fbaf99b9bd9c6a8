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
