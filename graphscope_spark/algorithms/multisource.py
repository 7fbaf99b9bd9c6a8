"""Wide-column multi-source BFS / SSSP kernel.

Reference analog: the multi-source landmark sweeps behind
`closeness_centrality` / `sssp_average_length` / `betweenness_centrality`
(apps/centrality/closeness/*, .gs_conf.yaml:198-205,286-298) — the
reference runs one source per MPI round-trip; here ALL sources advance
simultaneously.

Scale design (the whole point of this module): a (root, vid) pair-table
multi-source BFS ships |roots|x|E| message rows per superstep.  This
kernel instead keys state by ``vid`` with ONE DISTANCE COLUMN PER ROOT
(roots are batched, <=128 per pass), so every superstep is a single
join + groupBy over |E| rows regardless of how many sources run —
message volume drops by |roots|x and all per-root arithmetic happens
inside whole-stage codegen.  This is the Spark shape of "landmark"
centrality at 10^12-vertex scale: the root sample is small by design,
the edge table is the only big thing, and it is scanned once per level.

The frontier refinement mirrors wcc_projected.h:140-166: only vertices
whose distance vector improved last round send messages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.superstep import stats_barrier, unpersist_barrier
from graphscope_spark.graph import DST, SRC, VID, Graph

INF = float("inf")
DEFAULT_BATCH = 128
DEFAULT_SYNC = 4


def _collect_roots(g: Graph, roots: DataFrame | list[int] | None) -> list[int]:
    """Root set as a Python list — landmark sets are small by contract
    (the sampled/designated-source scale path); all-vertex sweeps on big
    graphs should not come through the wide kernel."""
    if roots is None:
        roots = g.vertices
    if isinstance(roots, DataFrame):
        return [r[0] for r in roots.select(roots.columns[0]).distinct().collect()]
    return sorted(set(int(r) for r in roots))


def _edge_table(g: Graph, weight: str | None, directed: bool | None) -> DataFrame:
    use_directed = g.directed if directed is None else directed
    if weight and weight in g.edges.columns:
        e = g.edges.select(SRC, DST, F.col(weight).cast("double").alias("w"))
    else:
        e = g.edges.select(SRC, DST, F.lit(1.0).alias("w"))
    if not use_directed:
        e = e.unionByName(
            e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w")
        )
    return e.where(F.col(SRC) != F.col(DST)).groupBy(SRC, DST).agg(
        F.min("w").alias("w")
    )


def _wide_sweep(
    edges: DataFrame,
    vertices: DataFrame,
    chunk: list[int],
    max_rounds: int,
    sync_every: int = DEFAULT_SYNC,
) -> tuple[DataFrame, list[str]]:
    """One batched sweep: returns (state, dist_cols) where state has a
    double distance column per root in ``chunk`` (inf = unreachable).

    Per round (one shuffle): frontier rows (improved last round) join
    edges, candidate dists min-aggregate per dst, merge with least().

    ``sync_every`` rounds chain LAZILY (localCheckpoint(eager=False)
    keeps each round a plan LEAF for the next) into ONE Spark job per
    batch; the improved-row all-reduce (the reference's ToTerminate())
    runs once per batch.  Rounds past quiescence are idempotent no-ops
    (empty frontier → no messages → least()/`_fr` unchanged), so the
    batched termination check is exact.  This matters because weighted
    min-plus sweeps quiesce in 10-30 rounds and the per-job floor — not
    data volume — dominates at landmark-sample message sizes;
    superseded states are released as soon as a newer batch lands."""
    cols = [f"d{i}" for i in range(len(chunk))]
    state = vertices.select(
        VID,
        *[
            F.when(F.col(VID) == F.lit(r), 0.0).otherwise(F.lit(INF)).alias(c)
            for c, r in zip(cols, chunk)
        ],
        F.lit(True).alias("_fr"),
    ).transform(stats_barrier)

    def one_round(cur: DataFrame) -> DataFrame:
        frontier = cur.where(F.col("_fr"))
        msgs = (
            edges.join(frontier, edges[SRC] == frontier[VID])
            .groupBy(DST)
            .agg(*[F.min(F.col(c) + F.col("w")).alias(f"m{i}")
                   for i, c in enumerate(cols)])
        )
        return cur.join(
            msgs, cur[VID] == msgs[DST], "left"
        ).select(
            cur[VID],
            *[F.least(F.col(c), F.col(f"m{i}")).alias(c)
              for i, c in enumerate(cols)],
            F.greatest(
                *[
                    (F.coalesce(F.col(f"m{i}"), F.lit(INF)) < F.col(c))
                    for i, c in enumerate(cols)
                ]
            ).alias("_fr")
            if len(cols) > 1
            else (F.coalesce(F.col("m0"), F.lit(INF)) < F.col(cols[0])).alias("_fr"),
        )

    done = 0
    while done < max_rounds:
        batch = min(max(sync_every, 1), max_rounds - done)
        cur = state
        intermediates: list[DataFrame] = []
        for _ in range(batch):
            cur = one_round(cur).localCheckpoint(eager=False)
            intermediates.append(cur)
        nxt = stats_barrier(cur)
        improved = nxt.agg(F.sum(F.col("_fr").cast("long"))).collect()[0][0] or 0
        unpersist_barrier(state)
        for frame in intermediates:  # persisted on first compute; dead now
            unpersist_barrier(frame)
        state = nxt
        done += batch
        if improved == 0:
            break
    return state, cols


def multi_source_distances(
    g: Graph,
    roots: DataFrame | list[int] | None = None,
    weight: str | None = None,
    directed: bool | None = None,
    max_rounds: int = 200,
    batch: int = DEFAULT_BATCH,
) -> DataFrame:
    """Shortest-path distances from each root: (root long, vid long,
    dist double) — REACHABLE pairs only.

    Unweighted (weight=None) distances are BFS hop counts; pass a weight
    column for Bellman-Ford min-plus distances.  ``directed=None``
    follows the graph; ``False`` forces the symmetrized view (the usual
    centrality convention).
    """
    root_list = _collect_roots(g, roots)
    if not root_list:
        return g.edges.sparkSession.createDataFrame(
            [], "root long, vid long, dist double"
        )
    edges = _edge_table(g, weight, directed).cache()
    verts = g.vertices.select(VID)
    out: DataFrame | None = None
    for lo in range(0, len(root_list), batch):
        chunk = root_list[lo : lo + batch]
        state, cols = _wide_sweep(edges, verts, chunk, max_rounds)
        # explode wide -> long once, at the end (not per round)
        pairs = state.select(
            VID,
            F.explode(
                F.map_from_arrays(
                    F.array(*[F.lit(r).cast("long") for r in chunk]),
                    F.array(*[F.col(c) for c in cols]),
                )
            ).alias("root", "dist"),
        ).where(F.col("dist") != F.lit(INF))
        part = pairs.select("root", VID, "dist").transform(stats_barrier)
        out = part if out is None else out.unionByName(part)
    edges.unpersist()
    return out
