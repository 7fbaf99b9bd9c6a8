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


def _distances_local(
    edges: DataFrame,
    verts: DataFrame,
    root_list: list[int],
    max_rounds: int,
) -> DataFrame:
    """Single-task replay once vertices + edge table fit one executor
    task (the same size-gated finisher pattern as betweenness /
    min_dominating_set): per-root frontier Bellman-Ford in numpy CSR.
    The fixpoint is identical to the distributed sweep — both compute
    min over paths of the forward-accumulated float sum, and min is
    order-independent — so results are bit-equal (pinned in tests).
    Returns (root, vid, dist), reachable pairs only."""
    roots = sorted(set(root_list))

    def _pdf(pdf):
        import numpy as np
        import pandas as pd

        vids = np.sort(pdf.loc[pdf["tag"] == 1, "a"].to_numpy(np.int64))
        e = pdf[pdf["tag"] == 0]
        n = vids.size
        if n == 0:
            return pd.DataFrame({"root": [], "vid": [], "dist": []})
        es = np.searchsorted(vids, e["a"].to_numpy(np.int64))
        ed = np.searchsorted(vids, e["b"].to_numpy(np.int64))
        ew = e["w"].to_numpy(np.float64)
        order = np.argsort(es, kind="stable")
        indptr = np.concatenate(
            ([0], np.bincount(es, minlength=n).cumsum())
        ).astype(np.int64)
        indices, weights = ed[order], ew[order]

        out_r, out_v, out_d = [], [], []
        rks = np.searchsorted(vids, np.array(roots, dtype=np.int64))
        for root, rk in zip(roots, rks):
            dist = np.full(n, np.inf)
            dist[rk] = 0.0
            frontier = np.array([rk], dtype=np.int64)
            for _ in range(max_rounds):
                st, en = indptr[frontier], indptr[frontier + 1]
                cnt = en - st
                tot = int(cnt.sum())
                if tot == 0:
                    break
                idx = np.repeat(st, cnt) + (
                    np.arange(tot, dtype=np.int64)
                    - np.repeat(np.cumsum(cnt) - cnt, cnt)
                )
                old = dist.copy()
                np.minimum.at(
                    dist, indices[idx], dist[np.repeat(frontier, cnt)] + weights[idx]
                )
                frontier = np.flatnonzero(dist < old)
                if frontier.size == 0:
                    break
            reach = np.flatnonzero(np.isfinite(dist))
            out_r.append(np.full(reach.size, root, dtype=np.int64))
            out_v.append(vids[reach])
            out_d.append(dist[reach])
        return pd.DataFrame(
            {
                "root": np.concatenate(out_r) if out_r else [],
                "vid": np.concatenate(out_v) if out_v else [],
                "dist": np.concatenate(out_d) if out_d else [],
            }
        )

    packed = verts.select(
        F.lit(1).alias("tag"),
        F.col(VID).alias("a"),
        F.lit(0).cast("long").alias("b"),
        F.lit(0.0).alias("w"),
    ).unionByName(
        edges.select(
            F.lit(0).alias("tag"),
            F.col(SRC).alias("a"),
            F.col(DST).alias("b"),
            "w",
        )
    )
    return (
        packed.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(_pdf, f"root long, {VID} long, dist double")
    )


def _csr_pack(edges_pdf, vid_arr):
    """CSR arrays (vids, indptr, indices, weights) from an edge pandas
    frame with columns (src, dst, w) over the sorted vid universe."""
    import numpy as np

    vids = np.sort(np.unique(vid_arr))
    n = vids.size
    es = np.searchsorted(vids, edges_pdf["src"].to_numpy(np.int64))
    ed = np.searchsorted(vids, edges_pdf["dst"].to_numpy(np.int64))
    ew = edges_pdf["w"].to_numpy(np.float64)
    order = np.argsort(es, kind="stable")
    indptr = np.concatenate(([0], np.bincount(es, minlength=n).cumsum())).astype(
        np.int64
    )
    return vids, indptr, ed[order], ew[order]


def _bf_from_root(rk, indptr, indices, weights, n, max_rounds):
    """Frontier Bellman-Ford distances from one root over a CSR graph —
    the same fixpoint as the distributed wide sweep (min over forward
    float sums, order-independent)."""
    import numpy as np

    dist = np.full(n, np.inf)
    dist[rk] = 0.0
    frontier = np.array([rk], dtype=np.int64)
    for _ in range(max_rounds):
        st, en = indptr[frontier], indptr[frontier + 1]
        cnt = en - st
        tot = int(cnt.sum())
        if tot == 0:
            break
        idx = np.repeat(st, cnt) + (
            np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        )
        old = dist.copy()
        np.minimum.at(
            dist, indices[idx], dist[np.repeat(frontier, cnt)] + weights[idx]
        )
        frontier = np.flatnonzero(dist < old)
        if frontier.size == 0:
            break
    return dist


def all_pairs_digest(
    g: Graph,
    weight: str | None = None,
    directed: bool | None = None,
    max_rounds: int = 200,
    broadcast_rows: int = 8_000_000,
    batch: int = DEFAULT_BATCH,
) -> DataFrame:
    """FULL all-pairs shortest-path DIGEST: one row per root vertex —
    (vid, ecc double, sum_dist double, reachable long; self excluded
    from reachable, included in sums as 0) — without ever materializing
    the |V|x|V| pair table.

    Reference analog: apps/apsp/ (registry .gs_conf.yaml:220-225) runs
    one BFS per vertex across workers.  The Spark shape exploits the
    same structure — the ROOT axis is embarrassingly parallel:

    * graph fits an executor (edge rows <= ``broadcast_rows``): the edge
      table is collected once, packed to CSR, ``sc.broadcast`` to every
      executor, and the VERTEX table (tiny) is what gets partitioned —
      each task sweeps its root slice with vectorized numpy frontier
      Bellman-Ford and emits only digest rows.  On a 1000-executor
      cluster this scales linearly in cores with zero shuffle.
    * larger graphs: falls back to batched wide-column sweeps
      (``_wide_sweep``) with the digest aggregated per batch — still
      never wider than |V| rows at a time.  (At true web scale full
      APSP is O(V*E) and off the table regardless; the sampled
      ``multi_source_distances`` is the scale path.)
    """
    edges = _edge_table(g, weight, directed).cache()
    verts = g.vertices.select(VID)
    e_rows = edges.count()
    spark = g.edges.sparkSession
    if e_rows <= broadcast_rows:
        import numpy as np

        e_pdf = edges.toPandas()
        v_arr = np.concatenate(
            [
                verts.toPandas()[VID].to_numpy(np.int64),
                e_pdf["src"].to_numpy(np.int64),
                e_pdf["dst"].to_numpy(np.int64),
            ]
        )
        csr = spark.sparkContext.broadcast(_csr_pack(e_pdf, v_arr))
        edges.unpersist()
        nparts = g.num_partitions

        def _digest(batches):
            import numpy as np
            import pandas as pd

            vids, indptr, indices, weights = csr.value
            n = vids.size
            for pdf in batches:
                roots = pdf[VID].to_numpy(np.int64)
                rks = np.searchsorted(vids, roots)
                ecc = np.empty(roots.size)
                sd = np.empty(roots.size)
                rc = np.empty(roots.size, dtype=np.int64)
                for i, rk in enumerate(rks):
                    dist = _bf_from_root(rk, indptr, indices, weights, n, max_rounds)
                    reach = dist[np.isfinite(dist)]
                    ecc[i] = reach.max()
                    sd[i] = reach.sum()
                    rc[i] = reach.size - 1
                yield pd.DataFrame(
                    {VID: roots, "ecc": ecc, "sum_dist": sd, "reachable": rc}
                )

        return verts.repartition(nparts, VID).mapInPandas(
            _digest, f"{VID} long, ecc double, sum_dist double, reachable long"
        ).transform(stats_barrier)

    # too big to broadcast: batched wide sweeps, digested per batch
    root_list = _collect_roots(g, None)
    out: DataFrame | None = None
    for lo in range(0, len(root_list), batch):
        chunk = root_list[lo : lo + batch]
        state, cols = _wide_sweep(edges, verts, chunk, max_rounds)
        part = (
            state.select(
                F.explode(
                    F.map_from_arrays(
                        F.array(*[F.lit(r).cast("long") for r in chunk]),
                        F.array(*[F.col(c) for c in cols]),
                    )
                ).alias("root", "dist")
            )
            .where(F.col("dist") != F.lit(INF))
            .groupBy(F.col("root").alias(VID))
            .agg(
                F.max("dist").alias("ecc"),
                F.sum("dist").alias("sum_dist"),
                (F.count(F.lit(1)) - 1).alias("reachable"),
            )
            .transform(stats_barrier)
        )
        out = part if out is None else out.unionByName(part)
    edges.unpersist()
    return out


def multi_source_distances(
    g: Graph,
    roots: DataFrame | list[int] | None = None,
    weight: str | None = None,
    directed: bool | None = None,
    max_rounds: int = 200,
    batch: int = DEFAULT_BATCH,
    local_finish_rows: int = 4_000_000,
) -> DataFrame:
    """Shortest-path distances from each root: (root long, vid long,
    dist double) — REACHABLE pairs only.

    Unweighted (weight=None) distances are BFS hop counts; pass a weight
    column for Bellman-Ford min-plus distances.  ``directed=None``
    follows the graph; ``False`` forces the symmetrized view (the usual
    centrality convention).  ``local_finish_rows``: graphs whose vertex
    + edge tables fit one executor task run in a single applyInPandas
    task (see _distances_local); 0 forces the distributed wide sweep,
    which remains the 10¹²-scale path.
    """
    root_list = _collect_roots(g, roots)
    if not root_list:
        return g.edges.sparkSession.createDataFrame(
            [], "root long, vid long, dist double"
        )
    edges = _edge_table(g, weight, directed).cache()
    verts = g.vertices.select(VID)
    if (
        local_finish_rows > 0
        and len(root_list) * g.num_vertices() <= 32_000_000
        and g.num_vertices() + edges.count() <= local_finish_rows
    ):
        out = _distances_local(edges, verts, root_list, max_rounds).transform(
            stats_barrier
        )
        edges.unpersist()
        return out
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
