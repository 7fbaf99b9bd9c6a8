"""Deterministic random walks — the DeepWalk/node2vec sampling
primitive (uniform-neighbor walk, p=q=1) over a directed edge table.

Reference parity: GraphScope ships walk-based sampling through its
learning engine's samplers (``learning_engine/graph-learn`` random-walk
negative sampling; the analytical registry's ``sampling_path`` is the
pattern-walk analog, apps/sampling_path/sampling_path.h:43-135).  The
reference seeds its walkers with per-thread RNG, which is not
reproducible across engines; here the "randomness" is an explicit LCG
hash of (node, step, seed) so ANY engine — including the DuckDB oracle
via a recursive CTE — replays the identical walk:

    idx(node, step) = ((node % P) * A + step * B + seed) % P
    next = neighbor with rank idx % outdeg(node)

where neighbors are ranked by ascending dst (rank 0-based), A =
1103515245, B = 12345, P = 2147483647 (the classic glibc LCG
multipliers — quality is adequate for walk sampling and the point is
cross-engine determinism, not cryptographic mixing).  Walks truncate
at dead ends (no out-neighbors); self-loops and duplicate edges are
dropped (Graph.distinct_edges semantics).

Spark plan (default, ``adjacency="array"``): neighbors are grouped
into one sorted array per source (the CSR row GraphScope's fragments
store natively) with ONE shuffle, persisted, and each step is a single
left join + ``element_at`` pick — the walk grows WIDE (one column per
step, no union fan), and a final ``posexplode`` emits (start, step,
node).  L steps = L joins against the same persisted adjacency, one
output pass; walkers are embarrassingly parallel, no cross-walker
state.  ``adjacency="edges"`` keeps the per-edge (row_number, count)
ranking instead and selects the hop with a join-residual rank filter —
one row per edge, no per-vertex array, for graphs whose hub
out-degrees are too large to hold as a single array cell (≳10^7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph

WALK_A = 1103515245
WALK_B = 12345
WALK_P = 2147483647


def _lcg_idx(node_col, step: int, seed: int):
    return (
        (node_col % WALK_P) * F.lit(WALK_A) + F.lit(step * WALK_B + seed)
    ) % WALK_P


def random_walks(
    g: Graph,
    length: int,
    seed: int = 7,
    starts: DataFrame | None = None,
    adjacency: str = "array",
) -> DataFrame:
    """Walk ``length`` steps from every start vertex; returns
    (start, step, node) rows including step 0.  ``starts`` is a
    1-column (``start``) DataFrame; default = every distinct source
    vertex.  Deterministic: the LCG index above picks each hop."""
    edges = g.distinct_edges().select(SRC, DST)
    if starts is None:
        starts = edges.select(F.col(SRC).alias("start")).distinct()
    if adjacency == "array":
        return _walks_array(edges, starts, length, seed)
    return _walks_edges(edges, starts, length, seed)


def _walks_array(
    edges: DataFrame, starts: DataFrame, length: int, seed: int
) -> DataFrame:
    adj = (
        edges.groupBy(SRC)
        .agg(F.sort_array(F.collect_list(DST)).alias("nbrs"))
        .persist()
    )
    cur = starts.select("start", F.col("start").alias("v0"))
    for t in range(length):
        nxt = F.element_at(
            "nbrs",
            (_lcg_idx(F.col(f"v{t}"), t, seed) % F.size("nbrs") + 1).cast(
                "int"
            ),
        )
        cur = cur.join(adj, cur[f"v{t}"] == adj[SRC], "left").select(
            *cur.columns, nxt.alias(f"v{t + 1}")
        )
    walk = F.array(*[F.col(f"v{i}") for i in range(length + 1)])
    return cur.select(
        "start", F.posexplode(walk).alias("step", "node")
    ).where(F.col("node").isNotNull())


def node2vec_walks(
    g: Graph,
    length: int,
    wr: int = 1,
    wc: int = 2,
    wf: int = 1,
    seed: int = 7,
    starts: DataFrame | None = None,
) -> DataFrame:
    """Second-order (node2vec, Grover & Leskovec 2016) biased walks
    with INTEGER transition weights so the walk is exactly replayable
    cross-engine: stepping from ``prev`` at ``cur``, neighbor ``x``
    weighs ``wr`` if x == prev (return, 1/p), ``wc`` if x is also a
    neighbor of prev (common, 1), else ``wf`` (far, 1/q) — i.e.
    p = wc/wr, q = wc/wf.  The hop draws r = idx(cur, step, seed) %
    total_weight and takes the first neighbor whose cumulative weight
    exceeds r (neighbors in ascending order); step 0 has no prev and
    is the uniform first-order pick.  ``wf`` must be ≥ 1 so every
    neighbor list has positive total weight.

    Spark plan: same wide chained-join shape as ``random_walks``; the
    bias is computed per row with higher-order array functions
    (transform / zip_with / aggregate) over the persisted CSR-row
    adjacency — entirely JVM-side, no UDF, no extra shuffle beyond
    the one adjacency groupBy.  Each step joins the walk to the
    adjacency twice (cur's row and prev's row); at 100 TB both joins
    shuffle only the live-walker rows."""
    if wf < 1:
        raise ValueError("wf must be >= 1")
    edges = g.distinct_edges().select(SRC, DST)
    if starts is None:
        starts = edges.select(F.col(SRC).alias("start")).distinct()
    adj = (
        edges.groupBy(SRC)
        .agg(F.sort_array(F.collect_list(DST)).alias("nbrs"))
        .persist()
    )
    cur = starts.select("start", F.col("start").alias("v0"))
    for t in range(length):
        idx = _lcg_idx(F.col(f"v{t}"), t, seed)
        a = adj.select(F.col(SRC).alias("_c"), F.col("nbrs").alias("_cn"))
        cur = cur.join(a, cur[f"v{t}"] == F.col("_c"), "left")
        if t == 0:
            nxt = F.element_at(
                "_cn", (idx % F.size("_cn") + 1).cast("int")
            )
        else:
            p = adj.select(
                F.col(SRC).alias("_p"), F.col("nbrs").alias("_pn")
            )
            cur = cur.join(p, cur[f"v{t - 1}"] == F.col("_p"), "left")
            prev = F.col(f"v{t - 1}")
            pn = F.coalesce(F.col("_pn"), F.array().cast("array<long>"))
            weights = F.transform(
                "_cn",
                lambda x: F.when(x == prev, F.lit(wr))
                .when(F.array_contains(pn, x), F.lit(wc))
                .otherwise(F.lit(wf))
                .cast("long"),
            )
            tot = F.aggregate(
                weights, F.lit(0).cast("long"), lambda acc, w: acc + w
            )
            r = idx % tot
            pairs = F.zip_with(
                "_cn",
                weights,
                lambda n, w: F.struct(n.alias("n"), w.alias("w")),
            )
            nxt = F.aggregate(
                pairs,
                F.struct(
                    F.lit(0).cast("long").alias("cum"),
                    F.lit(None).cast("long").alias("sel"),
                ),
                lambda acc, x: F.struct(
                    (acc["cum"] + x["w"]).alias("cum"),
                    F.when(acc["sel"].isNotNull(), acc["sel"])
                    .when(acc["cum"] + x["w"] > r, x["n"])
                    .alias("sel"),
                ),
                lambda acc: acc["sel"],
            )
        keep = [c for c in cur.columns if not c.startswith("_")]
        cur = cur.select(*keep, nxt.alias(f"v{t + 1}"))
    walk = F.array(*[F.col(f"v{i}") for i in range(length + 1)])
    return cur.select(
        "start", F.posexplode(walk).alias("step", "node")
    ).where(F.col("node").isNotNull())


def _walks_edges(
    edges: DataFrame, starts: DataFrame, length: int, seed: int
) -> DataFrame:
    by_src = Window.partitionBy(SRC)
    adj = (
        edges.withColumn(
            "rnk", F.row_number().over(by_src.orderBy(DST)) - F.lit(1)
        )
        .withColumn("deg", F.count(F.lit(1)).over(by_src))
        .persist()
    )
    cur = starts.select(
        "start", F.lit(0).alias("step"), F.col("start").alias("node")
    )
    levels = [cur]
    for t in range(length):
        nxt = (
            cur.join(adj, cur["node"] == adj[SRC])
            .where(
                F.col("rnk") == _lcg_idx(F.col("node"), t, seed) % F.col("deg")
            )
            .select(
                "start",
                F.lit(t + 1).alias("step"),
                F.col(DST).alias("node"),
            )
        )
        # Lazy barrier: without it each union branch re-derives the
        # whole join prefix (O(L^2) joins); with it level k reuses
        # level k-1's computed RDD, so the union costs O(L) joins.
        nxt = nxt.localCheckpoint(eager=False)
        levels.append(nxt)
        cur = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def khop_neighbor_sample(
    g: Graph,
    seeds: DataFrame,
    fanouts: tuple[int, ...] = (3, 2),
) -> DataFrame:
    """GNN-style k-hop neighbor sampling (the GLE `NeighborSampler`
    analog — graphlearn's per-layer fanout sampling, re-expressed as
    DataFrame ops): for each frontier vertex sample up to ``fanouts[i]``
    out-neighbors at layer i, the next frontier being the sampled
    neighbors.  Returns (layer int, src long, dst long) — the sampled
    block structure a GNN mini-batch trainer consumes.

    Deterministic: the per-vertex neighbor choice ranks by
    md5(src ':' dst) (ties impossible — edges are distinct), so the
    same seeds always yield the same blocks and a DuckDB oracle
    replays the sample exactly; swap the hash for a salted one to get
    fresh epochs, same plan.

    Scale shape per layer: one join of the (shrinking or bounded)
    frontier against the src-partitioned edge table + one per-src
    window over candidate neighbors — the window rides the join's
    hash(src) partitioning, so a layer is ONE shuffle of the frontier's
    adjacency, never the full edge table; total sampled rows are
    bounded by Π fanouts · |seeds| regardless of graph size."""
    e = g.distinct_edges().select(SRC, DST)
    frontier = seeds.select(F.col(seeds.columns[0]).alias(SRC)).distinct()
    outs: list[DataFrame] = []
    for layer, f in enumerate(fanouts):
        cand = e.join(frontier, SRC)
        w = Window.partitionBy(SRC).orderBy(
            F.md5(F.concat_ws(":", F.col(SRC).cast("string"), F.col(DST).cast("string"))),
            F.col(DST),
        )
        pick = (
            cand.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= f)
            .select(F.lit(layer).cast("int").alias("layer"), SRC, DST)
        )
        outs.append(pick)
        frontier = pick.select(F.col(DST).alias(SRC)).distinct()
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def negative_sample(
    g: Graph,
    seeds: DataFrame,
    k: int = 5,
    trials: int = 32,
) -> DataFrame:
    """GNN-style negative edge sampling (the GLE negative-sampler
    analog: graphlearn's `negative_sample` produces per-seed non-
    neighbor ids for contrastive loss): for each seed vertex, the
    first ``k`` NON-neighbors drawn from a deterministic per-seed
    trial sequence.  Returns (src, neg, rank) with rank 1..k in trial
    order.

    Deterministic: trial t of seed s proposes the vertex whose dense
    index is md5-uniform(s ':' t) scaled to |V| (the dense index is
    the vid dictionary's sort rank — the loaders' dense-vid guarantee,
    graph.py); proposals that hit a real out-neighbor of s (or s
    itself, or an earlier duplicate proposal) are rejected and the
    trial order advances — rejection sampling with a replayable tape,
    so a DuckDB oracle reproduces every pick exactly.

    Scale shape: |seeds|·trials proposal rows (bounded, never |V|·
    |seeds|), one broadcast-join onto the dense index, one anti-ish
    left join against the seed's adjacency on (src, dst) — the
    edge-table side is partitioned by src exactly like every other
    sampler here — and one per-seed window that rides that join's
    partitioning.  With trials ≈ 6·k the chance a degree-bounded seed
    exhausts its tape is negligible; raise ``trials`` for hub seeds.
    """
    verts = g.vertices.select(VID)
    n = verts.count()
    w_ix = Window.orderBy(VID)
    # dense index 0..n-1 by vid order — the vid dictionary's rank.
    # Single-ordered-window on the VERTEX table: at cluster scale
    # replace with the dictionary's own stored rank (sources build one)
    ix = verts.select(VID, (F.row_number().over(w_ix) - 1).alias("_ix"))
    s = seeds.select(F.col(seeds.columns[0]).alias(SRC)).distinct()
    t = s.select(
        SRC, F.explode(F.sequence(F.lit(0), F.lit(trials - 1))).alias("t")
    )
    # md5-uniform proposal index: first 12 hex digits as 48-bit int
    h = F.md5(F.concat_ws(":", F.col(SRC).cast("string"), F.col("t").cast("string")))
    b = None
    for i in range(12):
        d = (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, i + 1, 1)) - 1
        ).cast("long")
        b = d if b is None else b * 16 + d
    props = t.select(SRC, "t", (b % F.lit(n)).alias("_ix"))
    cand = props.join(F.broadcast(ix), "_ix").select(
        SRC, "t", F.col(VID).alias("neg")
    )
    e = g.distinct_edges().select(
        F.col(SRC).alias(SRC), F.col(DST).alias("neg"), F.lit(1).alias("_hit")
    )
    ok = (
        cand.join(e, [SRC, "neg"], "left")
        .where(F.col("_hit").isNull() & (F.col(SRC) != F.col("neg")))
        .select(SRC, "t", "neg")
    )
    # drop duplicate proposals of the same neg for a seed (keep the
    # earliest trial), then take the first k surviving trials
    w_dup = Window.partitionBy(SRC, "neg").orderBy("t")
    w_rk = Window.partitionBy(SRC).orderBy("t")
    return (
        ok.withColumn("_d", F.row_number().over(w_dup))
        .where(F.col("_d") == 1)
        .withColumn("rank", F.row_number().over(w_rk))
        .where(F.col("rank") <= k)
        .select(SRC, "neg", F.col("rank").cast("int").alias("rank"))
    )
