"""VoteRank — iterative influencer election.

Reference: `voterank` (.gs_conf.yaml:299-306, apps/voterank/voterank.h),
NetworkX semantics on the (symmetrized) graph:

- every vertex starts with voting ability 1;
- repeat ``num_seeds`` times: score[v] = Σ ability[u] over neighbors u;
  elect the max-score unelected vertex (tie → minimum vid, making the
  reference's order-dependent pick deterministic); the elected vertex's
  ability drops to 0 and each of its neighbors loses 1/⟨k⟩ ability
  (⟨k⟩ = average degree), floored at 0.

Each election round is one join-agg plus a 1-row argmax collect — the
inherently sequential part (pick one winner per round) stays on the
driver, everything data-sized stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph


def voterank(g: Graph, num_seeds: int = 10) -> DataFrame:
    """Returns (vid long, rank int) for the elected seeds, rank 1-based
    in election order."""
    sym = g.symmetrized().cache()
    n_edges = sym.count()
    n = g.num_vertices()
    avg_deg = n_edges / n if n else 1.0
    dec = 1.0 / avg_deg if avg_deg > 0 else 1.0

    ability = g.vertices.select(VID, F.lit(1.0).alias("ability"))
    ability = ability.localCheckpoint(eager=True)
    elected: list[tuple[int, int]] = []
    elected_ids: set[int] = set()

    for round_no in range(1, min(num_seeds, n) + 1):
        scores = (
            sym.join(
                ability.select(F.col(VID).alias(SRC), F.col("ability").alias("a")), SRC
            )
            .groupBy(F.col(DST).alias(VID))
            .agg(F.sum("a").alias("score"))
        )
        if elected_ids:
            scores = scores.where(~F.col(VID).isin(list(elected_ids)))
        top = (
            scores.orderBy(F.col("score").desc(), F.col(VID).asc()).limit(1).collect()
        )
        if not top or top[0]["score"] <= 0:
            break
        winner = top[0][VID]
        elected.append((winner, round_no))
        elected_ids.add(winner)
        nbrs = sym.where(F.col(SRC) == winner).select(F.col(DST).alias(VID))
        ability = (
            ability.join(nbrs.withColumn("_nb", F.lit(1)), VID, "left")
            .select(
                VID,
                F.when(F.col(VID) == winner, F.lit(0.0))
                .when(
                    F.col("_nb").isNotNull(),
                    F.greatest(F.col("ability") - dec, F.lit(0.0)),
                )
                .otherwise(F.col("ability"))
                .alias("ability"),
            )
        ).localCheckpoint(eager=True)

    sym.unpersist()
    spark = g.edges.sparkSession
    return spark.createDataFrame(elected or [], "vid long, rank int")
