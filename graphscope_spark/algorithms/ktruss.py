"""k-truss decomposition — iterative edge-support pruning.

Reference: FLASH `k-truss` / `truss` family (.gs_conf.yaml:307-817,
apps/flash/subgraph/) — the k-truss is the maximal subgraph in which
every edge participates in at least k-2 triangles (public definition,
Cohen 2008).

Per round (two joins over the shrinking edge set):
  support(a,b) = |N(a) ∩ N(b)| within the current subgraph, computed
  as a wedge join (edge ⋈ sym ⋈ sym on the shared third vertex) with
  map-side partial counts; edges below k-2 drop; repeat until quiet.
The edge set shrinks monotonically, so per-round cost tracks the
surviving subgraph — the same peel-until-stable shape as kcore.py, one
level up (edges instead of vertices).
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
        sym = cur.unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        p = sym.select(F.col("a").alias("pa"), F.col("b").alias("c"))
        q = sym.select(F.col("a").alias("qa"), F.col("b").alias("qc"))
        sup = (
            cur.join(p, cur["a"] == p["pa"])
            .join(q, (cur["b"] == q["qa"]) & (p["c"] == q["qc"]))
            .groupBy(cur["a"], cur["b"])
            .agg(F.count(F.lit(1)).alias("t"))
        )
        nxt = (
            cur.join(sup, ["a", "b"], "left")
            .where(F.coalesce("t", F.lit(0)) >= k - 2)
            .select("a", "b")
        ).transform(stats_barrier)
        dropped = cur.count() - nxt.count()
        unpersist_barrier(cur)  # nxt is materialized; last round is dead
        cur = nxt
        if dropped == 0:
            break
    return cur.select(F.col("a").alias(SRC), F.col("b").alias(DST))
