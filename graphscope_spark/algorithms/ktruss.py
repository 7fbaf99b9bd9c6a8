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


def _ktruss_local_pdf_factory(k: int):
    """Single-task k-truss: the same oriented-enumeration + prune rounds
    vectorized in numpy (the k-truss is the unique maximal subgraph
    where every edge closes ≥ k-2 triangles, so the replay is exact by
    definition).  Rows: (a, b) canonical edges."""

    def _pdf(pdf):
        import numpy as np
        import pandas as pd

        ea = pdf["a"].to_numpy(np.int64)
        eb = pdf["b"].to_numpy(np.int64)
        vids = np.unique(np.concatenate([ea, eb]))
        n = vids.size
        pa = np.searchsorted(vids, ea)
        pb = np.searchsorted(vids, eb)
        while pa.size:
            m = pa.size
            deg = np.bincount(pa, minlength=n) + np.bincount(pb, minlength=n)
            # orient low (deg, id) -> high; rank = deg * (n+1) + pos
            ra = deg[pa].astype(np.int64) * (n + 1) + pa
            rb = deg[pb].astype(np.int64) * (n + 1) + pb
            x = np.where(ra < rb, pa, pb)
            y = np.where(ra < rb, pb, pa)
            ry = np.maximum(ra, rb)
            # group oriented edges by x; enumerate wedge pairs with
            # ry1 < ry2 via sorted runs
            o = np.lexsort((ry, x))
            xs, ys, eid = x[o], y[o], np.arange(m)[o]
            runs = np.flatnonzero(np.diff(xs, prepend=-1))
            lens = np.diff(np.append(runs, m))
            # pairs within each run: first index i, second j>i
            L = lens
            npairs = (L * (L - 1)) // 2
            tot = int(npairs.sum())
            if tot == 0:
                sup = np.zeros(m, np.int64)
            else:
                # FULLY vectorized (i, j) pair expansion per run — no
                # Python loop over runs (a list-comprehension here was
                # the single-task path's bottleneck: O(#runs) Python
                # iterations per prune round).
                # slots: one entry per (run, i) with i in [0, l-2]
                li = L[L > 1]  # runs contributing pairs
                starts_li = runs[L > 1]
                nslots = li - 1
                slot_run_start = np.repeat(starts_li, nslots)
                slot_cum = np.cumsum(nslots) - nslots
                ii = np.arange(int(nslots.sum()), dtype=np.int64) - np.repeat(
                    slot_cum, nslots
                )
                rc = np.repeat(li, nslots) - 1 - ii  # j-count per slot
                pos_rc = np.cumsum(rc) - rc
                off_in = np.repeat(ii, rc)
                jj = (
                    np.arange(tot, dtype=np.int64)
                    - np.repeat(pos_rc, rc)
                    + off_in
                    + 1
                )
                base = np.repeat(slot_run_start, rc)
                i_abs = base + off_in
                j_abs = base + jj
                # wedge (x; y_i, y_j) with ry_i < ry_j (sorted run order);
                # closes iff oriented edge (y_i -> y_j) exists
                wkey = ys[i_abs] * n + ys[j_abs]
                okey_edge = xs * n + ys
                so = np.argsort(okey_edge)
                sk = okey_edge[so]
                pos = np.searchsorted(sk, wkey)
                pos = np.minimum(pos, sk.size - 1)
                hit = sk[pos] == wkey
                if hit.any():
                    closing = so[pos[hit]]
                    sup = np.bincount(
                        np.concatenate(
                            [eid[i_abs[hit]], eid[j_abs[hit]], eid[closing]]
                        ),
                        minlength=m,
                    ).astype(np.int64)
                else:
                    sup = np.zeros(m, np.int64)
            keep = sup >= k - 2
            if keep.all():
                break
            pa, pb = pa[keep], pb[keep]
        return pd.DataFrame({"src": vids[pa], "dst": vids[pb]})

    return _pdf


def k_truss(
    g: Graph, k: int, max_rounds: int = 100, local_finish_rows: int = 4_000_000
) -> DataFrame:
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
        # single-task finisher — switch on edges + ORIENTED WEDGE PAIRS,
        # not edge count: the replay's per-round work is the pair
        # expansion (Σ_x c_x·(c_x−1)/2), and a dense first round (41M
        # pairs at sf0.1 co-purchase) is faster on 32 distributed
        # threads than in one numpy task.  Once the surviving subgraph's
        # pair count fits the one-task budget, the remaining prune
        # rounds replay exactly (the k-truss is unique) in ONE shuffle.
        if local_finish_rows > 0:
            est = eo.groupBy("x").agg(F.count(F.lit(1)).alias("c")).agg(
                F.coalesce(
                    F.sum(F.col("c") * (F.col("c") - 1) / 2), F.lit(0.0)
                ).alias("p"),
                F.coalesce(F.sum("c"), F.lit(0)).alias("m"),
            ).collect()[0]
            if est["m"] + int(est["p"]) <= local_finish_rows:
                out = (
                    cur.withColumn("g", F.lit(1))
                    .groupBy("g")
                    .applyInPandas(
                        _ktruss_local_pdf_factory(k), f"{SRC} long, {DST} long"
                    )
                )
                out = stats_barrier(out)
                unpersist_barrier(cur)
                unpersist_barrier(eo)
                return out.select(SRC, DST)
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
