"""Fluid communities — synchronous density-based label propagation.

Reference semantics (apps/flash/clustering/fluid-community.h:73-106;
Parés et al., "Fluid Communities", 2017): s seed vertices start one
community each; every round a vertex evaluates the density
d_i = Σ_{u ∈ {v} ∪ N(v), lab(u)=i} 1/cnt_i of each community i in its
closed neighborhood (cnt_i = community size at round start) and moves
to the best community when it strictly beats its current one.

Determinism notes (deviations from the reference, which seeds from
``rand_r(time(NULL))`` and updates counts mid-sweep):
- seeds are a parameter (driver queries use the s smallest vertex ids);
- cnt_i is frozen at round start (synchronous), not sequentially
  updated during the sweep;
- every per-community density is the single exact IEEE division
  m_i / cnt_i (all members of community i contribute the same 1/cnt_i,
  so the sum collapses to one division) — bit-identical in Spark and
  any SQL oracle, so no epsilon is needed where the reference uses
  1e-10;
- ties pick the smallest community index; a vertex keeps its label
  unless strictly beaten (reference scan order, :82-84).

Spark plan per round: one (edges ⋈ labels) join, a groupBy
(dst, lab) count, a broadcast join against the s-row community-size
table, and a struct-max argmax — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import stats_barrier


def _fluid_local_pdf_factory(seeds: list[int], rounds: int):
    """Single-task replay of the synchronous density rounds.  Every
    density is the single exact IEEE division m/cnt on both paths, so
    comparisons (and therefore labels) are bit-identical.  Rows: tag=1 →
    (a=vid); tag=0 → (a=src, b=dst) symmetrized."""

    def _pdf(pdf):
        import numpy as np
        import pandas as pd

        v = pdf[pdf["tag"] == 1]
        e = pdf[pdf["tag"] == 0]
        vids = np.sort(v["a"].to_numpy(np.int64))
        n = vids.size
        if n == 0:
            return pd.DataFrame(
                {"vid": np.empty(0, np.int64), "lab": np.empty(0, np.int32)}
            )
        se = np.searchsorted(vids, e["a"].to_numpy(np.int64))
        de = np.searchsorted(vids, e["b"].to_numpy(np.int64))
        s = len(seeds)
        lab = np.full(n, -1, np.int64)
        sp = np.searchsorted(vids, np.asarray(seeds, np.int64))
        lab[sp] = np.arange(s, dtype=np.int64)
        for _ in range(rounds):
            cnt = np.bincount(lab[lab >= 0], minlength=s).astype(np.int64)
            lm = lab >= 0
            msk = lm[se]
            vv = np.concatenate([de[msk], np.flatnonzero(lm)])
            ll = np.concatenate([lab[se[msk]], lab[lm]])
            if vv.size == 0:
                break
            key = vv * s + ll
            uk, m = np.unique(key, return_counts=True)
            kv, kl = uk // s, uk % s
            dens = m.astype(np.float64) / cnt[kl]
            o = np.lexsort((kl, -dens, kv))
            kv_o, kl_o, kd_o = kv[o], kl[o], dens[o]
            first = np.ones(kv_o.size, bool)
            first[1:] = kv_o[1:] != kv_o[:-1]
            bv, blab, bd = kv_o[first], kl_o[first], kd_o[first]
            # current-community density (0.0 when v is unlabeled)
            cd = np.zeros(bv.size, np.float64)
            labeled = lab[bv] >= 0
            ck = bv[labeled] * s + lab[bv[labeled]]
            pos = np.searchsorted(uk, ck)
            cd[labeled] = dens[pos]
            upd = (lab[bv] < 0) | (bd > cd)
            lab[bv[upd]] = blab[upd]
        return pd.DataFrame({"vid": vids, "lab": lab.astype(np.int32)})

    return _pdf


def fluid_communities(
    g: Graph,
    seeds: list[int] | None = None,
    s: int = 10,
    rounds: int = 6,
    local_finish_rows: int = 4_000_000,
) -> DataFrame:
    """Returns (vid long, lab int): community index in [0, s) or -1 for
    vertices no fluid reached within ``rounds`` synchronous rounds."""
    sym = g.symmetrized().select(SRC, DST).cache()
    if seeds is None:
        seeds = [
            r[0]
            for r in g.vertices.select(VID).orderBy(VID).limit(s).collect()
        ]

    if local_finish_rows > 0:
        if g.vertices.count() + sym.count() <= local_finish_rows:
            packed = g.vertices.select(
                F.lit(1).alias("tag"), F.col(VID).alias("a"), F.lit(0).cast("long").alias("b")
            ).unionByName(
                sym.select(F.lit(0).alias("tag"), F.col(SRC).alias("a"), F.col(DST).alias("b"))
            )
            return (
                packed.withColumn("g", F.lit(1))
                .groupBy("g")
                .applyInPandas(
                    _fluid_local_pdf_factory([int(x) for x in seeds], rounds),
                    f"{VID} long, lab int",
                )
            )
    spark = g.edges.sparkSession
    seed_df = spark.createDataFrame(
        [(int(v), i) for i, v in enumerate(seeds)], f"{VID} long, seed_lab int"
    )
    state = stats_barrier(
        g.vertices.select(VID)
        .join(seed_df, VID, "left")
        .select(VID, F.coalesce("seed_lab", F.lit(-1)).alias("lab"))
    )
    for _ in range(rounds):
        cnt = (
            state.where(F.col("lab") >= 0)
            .groupBy("lab")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        members = state.where(F.col("lab") >= 0)
        # m_i per vertex: self + labeled neighbors, per community
        nbm = sym.join(
            members.select(F.col(VID).alias(SRC), F.col("lab").alias("nl")), SRC
        ).select(F.col(DST).alias(VID), F.col("nl").alias("lab"))
        selfm = members.select(VID, "lab")
        m = (
            nbm.unionByName(selfm)
            .groupBy(VID, "lab")
            .agg(F.count(F.lit(1)).alias("m"))
        )
        d = m.join(F.broadcast(cnt), "lab").select(
            VID, "lab", (F.col("m").cast("double") / F.col("cnt")).alias("dens")
        )
        # argmax by (dens, -lab): max density, ties to smallest index
        best = d.groupBy(VID).agg(
            F.max(F.struct(F.col("dens"), (-F.col("lab")).alias("nl"))).alias("b")
        ).select(VID, (-F.col("b.nl")).alias("blab"), F.col("b.dens").alias("bd"))
        cur = d.select(
            F.col(VID).alias("cv"), F.col("lab").alias("cl"), F.col("dens").alias("cd")
        )
        nxt = (
            state.join(best, VID, "left")
            .join(
                cur,
                (F.col(VID) == F.col("cv")) & (F.col("lab") == F.col("cl")),
                "left",
            )
            .select(
                VID,
                F.when(
                    F.col("blab").isNotNull()
                    & (
                        (F.col("lab") < 0)
                        | (F.col("bd") > F.coalesce("cd", F.lit(0.0)))
                    ),
                    F.col("blab"),
                )
                .otherwise(F.col("lab"))
                .cast("int")
                .alias("lab"),
            )
        )
        state = stats_barrier(nxt)
    sym.unpersist()
    return state
