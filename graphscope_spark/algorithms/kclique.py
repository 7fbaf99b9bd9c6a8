"""k-clique counting (k = 4) by degree-ordered orientation joins.

Reference: FLASH `k-clique` / `k-clique-2` (.gs_conf.yaml:307-817,
apps/flash/subgraph/k-clique.h) — global clique count over the
undirected graph.

Spark plan extends the triangle orientation trick
(apps/clustering/triangles.h:78-91; algorithms/triangles.py): orient
every edge from the (degree, vid)-smaller endpoint to the larger, so
each clique is enumerated exactly once in sorted orientation order.
4-cliques = oriented triangles (a<b<c) extended by a fourth vertex d
adjacent to all three — three hash joins on the oriented edge table,
each shuffling on a vertex key; no explosion beyond the true wedge/
triangle counts (the orientation bounds each join's fan-out by the
max oriented out-degree, which is O(sqrt(E)) after degree ordering —
the standard bound that makes this plan safe on power-law graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph


def _oriented(g: Graph, eo: DataFrame | None = None) -> DataFrame:
    """Degree-oriented DAG edges as (a, b) — thin shim over the shared
    oriented.oriented_edges table (pass a cached ``eo`` to reuse it
    across clique/census queries in one session)."""
    from graphscope_spark.algorithms.oriented import oriented_edges

    if eo is None:
        eo = oriented_edges(g)
    return eo.select(F.col("x").alias("a"), F.col("y").alias("b"))


def four_clique_count(g: Graph, eo: DataFrame | None = None) -> DataFrame:
    """Returns a single row (k4 long) — the number of 4-cliques."""
    eor = _oriented(g, eo).cache()
    e_ab = eor
    e_ac = eor.select(F.col("a"), F.col("b").alias("c"))
    e_bc = eor.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tri = (
        e_ab.join(e_ac, "a")
        .where(F.col("b") != F.col("c"))
        .join(e_bc, ["b", "c"], "semi")
    )
    # extend triangle (a, b, c) by d adjacent FROM all three (oriented).
    # Generate candidates from c — the highest-rank corner, whose
    # oriented out-degree is the SMALLEST of the three on power-law
    # degree sequences (hubs sort last and have few higher-rank
    # neighbors) — then semi-check the a→d and b→d edges.
    e_ad = eor.select(F.col("a"), F.col("b").alias("d"))
    e_bd = eor.select(F.col("a").alias("b"), F.col("b").alias("d"))
    e_cd = eor.select(F.col("a").alias("c"), F.col("b").alias("d"))
    k4 = (
        tri.join(e_cd, "c")
        .join(e_ad, ["a", "d"], "semi")
        .join(e_bd, ["b", "d"], "semi")
    )
    out = k4.agg(F.count(F.lit(1)).alias("k4"))
    return out


def k_clique_count(g: Graph, k: int, eo: DataFrame | None = None) -> DataFrame:
    """Returns one row (kc long) — the number of k-cliques (k ≥ 3),
    the generic form of k-clique.h: cliques enumerate exactly once as
    chains v0 < v1 < … < v_{k-1} in the degree-orientation DAG; the
    i-th vertex extends via the tight v_{i-1}→v_i edge and semi-join
    checks of the remaining v_j→v_i edges (each join's fan-out bounded
    by the max oriented out-degree, O(sqrt(E)))."""
    eor = _oriented(g, eo).cache()
    cliques = eor.select(F.col("a").alias("v0"), F.col("b").alias("v1"))
    for i in range(2, k):
        ext = eor.select(
            F.col("a").alias(f"v{i - 1}"), F.col("b").alias(f"v{i}")
        )
        cand = cliques.join(ext, f"v{i - 1}")
        for j in range(i - 1):
            cand = cand.where(F.col(f"v{i}") != F.col(f"v{j}"))
        for j in range(i - 1):
            cand = cand.join(
                eor.select(
                    F.col("a").alias(f"v{j}"), F.col("b").alias(f"v{i}")
                ),
                [f"v{j}", f"v{i}"],
                "semi",
            )
        cliques = cand.select(*[f"v{t}" for t in range(i + 1)])
    out = cliques.agg(F.count(F.lit(1)).alias("kc"))
    return out
