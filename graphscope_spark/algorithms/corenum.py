"""Core numbers (k-core decomposition) via iterated neighbor h-index.

Reference: `kcore`/`kshell` (.gs_conf.yaml:156-167, apps/kcore/kcore.h)
expose fixed-k membership; the full decomposition (core number per
vertex = the largest k such that v belongs to the k-core) is what
`kshell` enumerates shell-by-shell.

The sequential peeling algorithm is inherently serial; the
Spark-native formulation is the **iterated h-index** fixpoint
(Lü et al., "The H-index of a network node", Nature Comm. 2016 —
public result): init c₀(v) = deg(v); repeat
    c_{t+1}(v) = H({c_t(u) : u ∈ N(v)})
where H is the h-index (largest h with ≥h neighbors of value ≥h).
The sequence is monotonically non-increasing and converges exactly to
the core number.  Each round is one join + window aggregation —
message-passing-friendly, no global ordering, scales like every other
superstep here.

The per-round h-index is pure SQL: rank each vertex's neighbor values
descending and take max(min(value, rank)).

Frontier restriction: a vertex's h-input changes only if some
neighbor's core changed last round, so each round recomputes h ONLY
for neighbors-of-changed (over their FULL neighborhoods — the h-index
needs the whole multiset, unlike min/sum kernels which can consume
deltas).  Per-round message volume is Σ deg over the candidate set,
which collapses as the fixpoint quiesces — the same curr_modified
frontier discipline as wcc_projected.h:140-166.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import StepResult, SuperstepRunner, stats_barrier


def _core_local_pdf(pdf):
    """Single-task core decomposition: vectorized ascending-k cascade
    peel (core numbers are a unique graph property, so any correct
    algorithm matches the h-index fixpoint exactly).  Rows: tag=1 →
    (a=vid); tag=0 → (a=src, b=dst) symmetrized."""
    import numpy as np
    import pandas as pd

    v = pdf[pdf["tag"] == 1]
    e = pdf[pdf["tag"] == 0]
    vids = np.sort(v["a"].to_numpy(np.int64))
    n = vids.size
    if n == 0:
        return pd.DataFrame(
            {"vid": np.empty(0, np.int64), "core": np.empty(0, np.int64)}
        )
    se = np.searchsorted(vids, e["a"].to_numpy(np.int64))
    de = np.searchsorted(vids, e["b"].to_numpy(np.int64))
    d = np.bincount(se, minlength=n).astype(np.int64)
    core = np.zeros(n, np.int64)
    alive = np.ones(n, bool)
    k = 0
    while alive.any():
        k = max(k, int(d[alive].min()))
        while True:
            sel = alive & (d <= k)
            if not sel.any():
                break
            core[sel] = k
            alive &= ~sel
            if se.size:
                mask = sel[se] & alive[de]
                d = d - np.bincount(de[mask], minlength=n)
                keep = alive[se] & alive[de]
                se, de = se[keep], de[keep]
    return pd.DataFrame({"vid": vids, "core": core})


# session-scoped memo of the (deterministic, unique) decomposition —
# the same materialized-view reuse discipline as tpch_graph._memo_graph:
# kshell / degeneracy / kcore-search / densest-subgraph all consume the
# SAME core numbers of the same memoized Graph object, and recomputing
# the fixpoint per caller is pure waste.  Keyed on the identity of the
# graph's frames plus every semantics-affecting argument (so a forced
# local_finish_rows=0 test run never returns a memoized finisher
# result); the value is a materialized leaf, not live lineage.
_CORE_MEMO: dict[tuple, tuple[object, DataFrame]] = {}


def core_number(
    g: Graph,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    local_finish_rows: int = 4_000_000,
) -> DataFrame:
    """Returns (vid long, core long); converges when no value changes.

    Whole-graph single-task finisher: core numbers are unique, so when
    vertices + symmetrized edges fit one executor task the cascade peel
    runs in numpy inside one applyInPandas; the h-index supersteps below
    remain the 10^12-edge path (local_finish_rows=0 forces them, tests
    pin equality).  This also lifts every consumer of the decomposition
    (kshell, degeneracy/onion orderings, k-core search, densest-subgraph
    2-approx)."""
    memo_key = (
        id(g.edges), id(g.vertices), max_iter, checkpoint_dir, local_finish_rows
    )
    hit = _CORE_MEMO.get(memo_key)
    # pin BOTH frames and verify BOTH identities: a dict keyed on id()
    # alone could hand back a stale decomposition after CPython recycles
    # a freed frame's id for a different vertices/edges object
    if hit is not None and hit[0] is g.edges and hit[1] is g.vertices:
        return hit[2]

    def _memoize(df: DataFrame) -> DataFrame:
        out = stats_barrier(df)
        _CORE_MEMO[memo_key] = (g.edges, g.vertices, out)
        return out

    spark = g.edges.sparkSession
    sym = g.symmetrized().cache()

    if local_finish_rows > 0:
        if g.vertices.count() + sym.count() <= local_finish_rows:
            packed = g.vertices.select(
                F.lit(1).alias("tag"), F.col(VID).alias("a"), F.lit(0).cast("long").alias("b")
            ).unionByName(
                sym.select(F.lit(0).alias("tag"), F.col(SRC).alias("a"), F.col(DST).alias("b"))
            )
            out = (
                packed.withColumn("g", F.lit(1))
                .groupBy("g")
                .applyInPandas(_core_local_pdf, f"{VID} long, core long")
            )
            out = _memoize(out)
            sym.unpersist()
            return out

    deg = sym.groupBy(F.col(SRC).alias(VID)).agg(F.count(F.lit(1)).alias("deg"))

    def init() -> DataFrame:
        return g.vertices.select(VID).join(deg, VID, "left").select(
            VID,
            F.coalesce("deg", F.lit(0)).cast("long").alias("core"),
            F.lit(True).alias("changed"),
        )

    def step(state: DataFrame, k: int) -> StepResult:
        # candidates = vertices with ≥1 changed neighbor; h-index of
        # each candidate's FULL neighbor core multiset:
        #   rank neighbor values desc, h = max(min(value, rank))
        chg = state.where(F.col("changed")).select(F.col(VID).alias(SRC))
        cands = (
            sym.join(chg, SRC, "semi")
            .select(F.col(DST).alias("_cand"))
            .distinct()
        )
        nbr_vals = (
            sym.join(cands.withColumnRenamed("_cand", DST), DST, "semi")
            .join(state.select(F.col(VID).alias(SRC), F.col("core").alias("cv")), SRC)
            .select(F.col(DST).alias(VID), "cv")
        )
        w = Window.partitionBy(VID).orderBy(F.col("cv").desc())
        h = (
            nbr_vals.withColumn("rn", F.row_number().over(w))
            .select(VID, F.least(F.col("cv"), F.col("rn")).alias("m"))
            .groupBy(VID)
            .agg(F.max("m").alias("h"))
        )
        nxt = state.join(h, VID, "left").select(
            VID,
            F.least(F.col("core"), F.coalesce("h", F.col("core")))
            .cast("long")
            .alias("core"),
            (F.least(F.col("core"), F.coalesce("h", F.col("core"))) != F.col("core"))
            .alias("changed"),
        )

        def delta_fn(m: DataFrame) -> float:
            return float(m.where(F.col("changed")).count())

        return StepResult(nxt.select(VID, "core", "changed"), delta_fn=delta_fn)

    run = SuperstepRunner(spark, "core_number", checkpoint_dir=checkpoint_dir)
    final = run.run(init, step, max_iterations=max_iter, tol=0.0)
    sym.unpersist()
    return _memoize(final.select(VID, "core"))


def kshell(g: Graph, k: int, checkpoint_dir: str | None = None) -> DataFrame:
    """k-shell membership: vertices whose core number is exactly ``k``
    (reference `kshell`, .gs_conf.yaml:162-167)."""
    return core_number(g, checkpoint_dir=checkpoint_dir).select(
        VID, (F.col("core") == k).alias("in_shell")
    )
