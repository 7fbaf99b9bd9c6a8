"""Path family — pattern-path sampling, simple-path checks/enumeration,
depth-first preorder.

Reference semantics:

- apps/sampling_path/sampling_path.h:43-135 — BFS-style enumeration of
  label-pattern paths (v0-e0-v1-…), truncated once a global path limit
  is reached.  The reference's truncation is arrival-order (whatever
  accumulated when the limit tripped); here the cut is DETERMINISTIC:
  the lexicographically smallest ``limit`` paths.
- apps/simple_path/is_simple_path.h:44-96 — a vertex list is a simple
  path iff every consecutive pair is an edge (checked by adjacency
  scan, counted via an all-reduce) and the list has no repeats.
- apps/simple_path/all_simple_paths.h — NetworkX parity: every simple
  path source→target with ≤ cutoff edges.
- apps/dfs/dfs.h:49-150 — depth-first preorder by sequential token
  passing (ONE active vertex per superstep; rank = visit order).  The
  reference is inherently serial across the whole graph; the Spark
  version keeps the only available parallelism — independent
  components run concurrently via ``applyInPandas`` over WCC groups —
  and fixes the reference's fragment-order-dependent neighbor order to
  ascending vid, rooted at each component's min vid.

Spark plans: path enumeration is iterative self-equi-joins of the edge
table (each extension one hash join, Catalyst-pushed filters); the
simple-path constraint is an inequality conjunction, JVM-side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph


def sampling_path(g: Graph, length: int, limit: int = 1000) -> DataFrame:
    """Directed paths with exactly ``length`` edges (vertices may
    repeat, per the reference's pattern walk); returns the
    lexicographically smallest ``limit`` rows (v0 … v{length})."""
    edges = g.distinct_edges().select(SRC, DST)
    paths = edges.select(F.col(SRC).alias("v0"), F.col(DST).alias("v1"))
    for i in range(2, length + 1):
        nxt = edges.select(
            F.col(SRC).alias(f"v{i - 1}"), F.col(DST).alias(f"v{i}")
        )
        paths = paths.join(nxt, f"v{i - 1}").select(
            *[f"v{j}" for j in range(i + 1)]
        )
    cols = [f"v{j}" for j in range(length + 1)]
    return paths.orderBy(*cols).limit(limit)


def is_simple_path(g: Graph, path: list[int]) -> DataFrame:
    """One row (is_simple boolean): ``path`` is a simple path in the
    directed graph (every consecutive pair an edge, no repeated
    vertices, and every vertex present).  Mirrors
    is_simple_path.h:49-83 with the counter logic collapsed."""
    spark = g.edges.sparkSession
    if len(path) == 0:
        return spark.createDataFrame([(False,)], "is_simple boolean")
    edges = g.distinct_edges().select(SRC, DST)
    if len(set(path)) != len(path):
        return spark.createDataFrame([(False,)], "is_simple boolean")
    present = (
        g.vertices.where(F.col(VID).isin([int(v) for v in set(path)]))
        .agg((F.count(F.lit(1)) == len(set(path))).alias("ok"))
    )
    if len(path) == 1:
        return present.select(F.col("ok").alias("is_simple"))
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(path, path[1:])],
        f"{SRC} long, {DST} long",
    )
    hits = pairs.join(edges, [SRC, DST], "semi").agg(
        (F.count(F.lit(1)) == len(path) - 1).alias("all_edges")
    )
    return present.crossJoin(hits).select(
        (F.col("ok") & F.col("all_edges")).alias("is_simple")
    )


def all_simple_paths(
    g: Graph, source: int, target: int, cutoff: int
) -> DataFrame:
    """All simple paths source→target over the SYMMETRIZED edge set with
    ≤ cutoff edges (NetworkX semantics, all_simple_paths.h).  Returns
    (path string 'v0-v1-…', hops int), one row per path."""
    sym = g.symmetrized().select(SRC, DST)
    results: list[DataFrame] = []
    # frontier: paths from source not yet at target, vertices distinct
    frontier = sym.where(F.col(SRC) == source).select(
        F.col(SRC).alias("v0"), F.col(DST).alias("v1")
    )
    for k in range(1, cutoff + 1):
        cols = [f"v{j}" for j in range(k + 1)]
        results.append(
            frontier.where(F.col(f"v{k}") == target).select(
                F.concat_ws("-", *cols).alias("path"),
                F.lit(k).cast("int").alias("hops"),
            )
        )
        if k == cutoff:
            break
        ext = sym.select(F.col(SRC).alias(f"v{k}"), F.col(DST).alias(f"v{k + 1}"))
        nxt = frontier.where(F.col(f"v{k}") != target).join(ext, f"v{k}")
        distinct_cond = F.lit(True)
        for j in range(k + 1):
            distinct_cond = distinct_cond & (F.col(f"v{k + 1}") != F.col(f"v{j}"))
        frontier = nxt.where(distinct_cond).select(
            *[f"v{j}" for j in range(k + 2)]
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def dfs_preorder(g: Graph) -> DataFrame:
    """Returns (vid long, rank long): depth-first preorder index within
    each weakly-connected component, rooted at the component's min vid,
    neighbors visited in ascending vid order (deterministic rendering
    of dfs.h's token-passing order).  Components run in parallel via
    ``applyInPandas``; the walk within a component is sequential, as in
    the reference (one token).

    SCALE LIMIT (by construction, not a bug): each component's edge
    list must fit one executor task — DFS preorder is inherently
    sequential (the reference's dfs.h passes a single token too), so
    there is no distributed formulation to fall back to.  On a web-scale
    graph the giant component will NOT fit; keep this operator off any
    100×-scale path and use bfs/wcc/sssp for traversal-order needs
    there."""
    from graphscope_spark.algorithms import wcc

    comp = wcc(g)
    sym = g.symmetrized().select(SRC, DST)
    tagged = sym.join(
        comp.select(F.col(VID).alias(SRC), F.col("comp")), SRC
    ).select("comp", SRC, DST)
    # isolated vertices: no edges, rank 0 in their own component
    iso = comp.join(
        sym.select(F.col(SRC).alias(VID)).distinct(), VID, "anti"
    ).select(VID, F.lit(0).cast("long").alias("rank"))

    def per_comp(pdf: pd.DataFrame) -> pd.DataFrame:
        adj: dict[int, list[int]] = {}
        for s, d in zip(pdf["src"], pdf["dst"]):
            adj.setdefault(int(s), []).append(int(d))
        for v in adj:
            adj[v].sort()
        root = min(adj)
        seen = {root}
        order = []
        stack = [(root, iter(adj[root]))]
        order.append(root)
        while stack:
            v, it = stack[-1]
            advanced = False
            for u in it:
                if u not in seen:
                    seen.add(u)
                    order.append(u)
                    stack.append((u, iter(adj.get(u, []))))
                    advanced = True
                    break
            if not advanced:
                stack.pop()
        return pd.DataFrame(
            {"vid": order, "rank": list(range(len(order)))}
        )

    ranked = tagged.groupBy("comp").applyInPandas(
        per_comp, schema=f"{VID} long, rank long"
    )
    return ranked.unionByName(iso)
