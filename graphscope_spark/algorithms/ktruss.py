"""k-truss decomposition — iterative edge-support pruning.

Reference: FLASH `k-truss` / `truss` family (.gs_conf.yaml:307-817,
apps/flash/subgraph/) — the k-truss is the maximal subgraph in which
every edge participates in at least k-2 triangles (public definition,
Cohen 2008).

Per round, support is recomputed by DEGREE-ORIENTED triangle
enumeration (the same orientation trick as triangles.py /
apps/clustering/triangles.h:78-91): orient each surviving edge from
the lower (degree, id) endpoint to the higher, wedge-join at the
lowest corner, close with the oriented third edge — each triangle is
found exactly ONCE — then explode every triangle into its three
canonical edges and count.  An unoriented wedge join probes
Σ_v deg(v)² pairs (hub-quadratic); the oriented form probes
Σ_v (out-deg≤√|E|-ish)² — the standard |E|^1.5 bound — which is what
keeps the recount viable on skewed co-purchase/link graphs.  Edges
below k-2 drop; repeat until quiet.  The edge set shrinks
monotonically, so per-round cost tracks the surviving subgraph — the
same peel-until-stable shape as kcore.py, one level up (edges instead
of vertices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.superstep import stats_barrier, unpersist_barrier
from graphscope_spark.graph import DST, SRC, VID, Graph


def k_truss(g: Graph, k: int, max_rounds: int = 100) -> DataFrame:
    """Returns (src long, dst long): edges of the k-truss, canonical
    src < dst orientation."""
    cur = (
        g.symmetrized()
        .where(F.col(SRC) < F.col(DST))
        .select(F.col(SRC).alias("a"), F.col(DST).alias("b"))
    ).transform(stats_barrier)

    for _ in range(max_rounds):
        # degrees WITHIN the surviving subgraph, then orient lo→hi by
        # (deg, vid) so each triangle is enumerated exactly once at its
        # lowest-key corner
        deg = (
            cur.select(F.col("a").alias(VID))
            .unionAll(cur.select(F.col("b").alias(VID)))
            .groupBy(VID)
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        e = cur.join(
            deg.select(F.col(VID).alias("a"), F.col("deg").alias("da")), "a"
        ).join(deg.select(F.col(VID).alias("b"), F.col("deg").alias("db")), "b")
        ka = F.struct(F.col("da").alias("d"), F.col("a").alias("v"))
        kb = F.struct(F.col("db").alias("d"), F.col("b").alias("v"))
        eo = e.select(
            F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("x"),
            F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("y"),
            F.greatest(ka, kb).alias("ky"),
        ).localCheckpoint(eager=False)  # reused 3×: wedge sides + closing
        e1, e2 = eo.alias("e1"), eo.alias("e2")
        tri = (
            e1.join(e2, F.col("e1.x") == F.col("e2.x"))
            .where(F.col("e1.ky") < F.col("e2.ky"))
            .select(
                F.col("e1.x").alias("u"),
                F.col("e1.y").alias("v"),
                F.col("e2.y").alias("w"),
            )
            .join(eo.select(F.col("x").alias("v"), F.col("y").alias("w")), ["v", "w"])
        )
        pairs = tri.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
                    ),
                    F.struct(
                        F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b")
                    ),
                    F.struct(
                        F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")
                    ),
                )
            ).alias("e")
        ).select("e.a", "e.b")
        sup = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("t"))
        nxt = (
            cur.join(sup, ["a", "b"], "left")
            .where(F.coalesce("t", F.lit(0)) >= k - 2)
            .select("a", "b")
        ).transform(stats_barrier)
        dropped = cur.count() - nxt.count()
        unpersist_barrier(cur)  # nxt is materialized; last round is dead
        unpersist_barrier(eo)
        cur = nxt
        if dropped == 0:
            break
    return cur.select(F.col("a").alias(SRC), F.col("b").alias(DST))
