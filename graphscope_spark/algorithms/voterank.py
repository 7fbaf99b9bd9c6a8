"""VoteRank — iterative influencer election.

Reference: `voterank` (.gs_conf.yaml:299-306, apps/voterank/voterank.h),
NetworkX semantics on the (symmetrized) graph:

- every vertex starts with voting ability 1;
- repeat ``num_seeds`` times: score[v] = Σ ability[u] over neighbors u;
  elect the max-score unelected vertex (tie → minimum vid, making the
  reference's order-dependent pick deterministic); the elected vertex's
  ability drops to 0 and each of its neighbors loses 1/⟨k⟩ ability
  (⟨k⟩ = average degree = m/n), floored at 0.

All abilities are **integers scaled by m** (ability·m: init m, decrement
n, floor 0) — exactly equivalent to the real-valued recurrence (every
comparison is the float one multiplied by the positive constant m) but
with no float-rounding or sum-order sensitivity, so the distributed
aggregation, the DuckDB oracle, and the single-task numpy finisher are
bit-identical by construction.

Each election round is one join-agg plus a 1-row argmax collect — the
inherently sequential part (pick one winner per round) stays on the
driver, everything data-sized stays distributed.  When the symmetrized
graph fits one executor task (``local_finish_rows``), all elections
replay in numpy inside one ``applyInPandas`` instead of paying
~3 Spark jobs per seat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph


def _voterank_local_pdf_factory(num_seeds: int, m: int, n: int):
    """Replay every election in one task.  Rows: tag=1 → (a=vid);
    tag=0 → (a=src, b=dst) of the symmetrized edge set.  Integer
    (score, -vid) argmax == the distributed (score desc, vid asc)."""

    def _pdf(pdf):
        import numpy as np
        import pandas as pd

        v = pdf[pdf["tag"] == 1]
        e = pdf[pdf["tag"] == 0]
        vids = np.sort(v["a"].to_numpy(np.int64))
        nn = vids.size
        if nn == 0 or m == 0:
            return pd.DataFrame(
                {"vid": np.empty(0, np.int64), "rank": np.empty(0, np.int32)}
            )
        se = np.searchsorted(vids, e["a"].to_numpy(np.int64))
        de = np.searchsorted(vids, e["b"].to_numpy(np.int64))
        ability = np.full(nn, np.int64(m))
        elected_mask = np.zeros(nn, bool)
        out_v, out_r = [], []
        for rank in range(1, min(num_seeds, nn) + 1):
            score = np.zeros(nn, np.int64)
            np.add.at(score, de, ability[se])
            score[elected_mask] = 0
            w = int(np.argmax(score))  # ties -> lowest index == lowest vid
            if score[w] <= 0:
                break
            out_v.append(vids[w])
            out_r.append(rank)
            elected_mask[w] = True
            ability[w] = 0
            nbrs = np.unique(de[se == w])  # one decrement per winner
            ability[nbrs] = np.maximum(ability[nbrs] - np.int64(n), 0)
        return pd.DataFrame(
            {"vid": np.asarray(out_v, np.int64), "rank": np.asarray(out_r, np.int32)}
        )

    return _pdf


def voterank(
    g: Graph, num_seeds: int = 10, local_finish_rows: int = 4_000_000
) -> DataFrame:
    """Returns (vid long, rank int) for the elected seeds, rank 1-based
    in election order."""
    sym = g.symmetrized().select(SRC, DST).cache()
    n_edges = sym.count()
    n = g.num_vertices()
    m = n_edges  # scaled-ability constants: init m, decrement n

    if local_finish_rows > 0 and n + n_edges <= local_finish_rows:
        packed = g.vertices.select(
            F.lit(1).alias("tag"), F.col(VID).alias("a"), F.lit(0).cast("long").alias("b")
        ).unionByName(
            sym.select(F.lit(0).alias("tag"), F.col(SRC).alias("a"), F.col(DST).alias("b"))
        )
        return (
            packed.withColumn("g", F.lit(1))
            .groupBy("g")
            .applyInPandas(
                _voterank_local_pdf_factory(num_seeds, m, n), f"{VID} long, rank int"
            )
        )

    ability = g.vertices.select(VID, F.lit(m).cast("long").alias("ability"))
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
        nbrs = sym.where(F.col(SRC) == winner).select(F.col(DST).alias(VID)).distinct()
        ability = (
            ability.join(nbrs.withColumn("_nb", F.lit(1)), VID, "left")
            .select(
                VID,
                F.when(F.col(VID) == winner, F.lit(0).cast("long"))
                .when(
                    F.col("_nb").isNotNull(),
                    F.greatest(F.col("ability") - n, F.lit(0).cast("long")),
                )
                .otherwise(F.col("ability"))
                .alias("ability"),
            )
        ).localCheckpoint(eager=True)

    sym.unpersist()
    spark = g.edges.sparkSession
    return spark.createDataFrame(elected or [], "vid long, rank int")
