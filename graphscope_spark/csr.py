"""CSR-encoded adjacency blocks + routing-table supersteps.

The north-star execution model calls for "hash-partitioned CSR-encoded
adjacency partitions" — the reference's fragments are exactly that
(grape's ImmutableEdgecutFragment CSR arrays; loader hash-partitions by
vid, arrow_fragment_loader.h:351-390).  The SQL superstep (pagerank.py)
re-derives the adjacency from the edge table every round via a hash
join; this module instead FREEZES the adjacency once into per-partition
CSR blocks and runs each gather as vectorized numpy over Arrow batches:

- block build (once): edges are bucketed by ``q = pmod(hash(dst), P)``
  (gather-side partitioning: a block owns all in-edges of its vertices)
  and each bucket is packed into ONE row of arrays
  ``(q, srcs sorted-unique, indptr, dst_idx, uniq_dst)`` — a CSR over
  the bucket's sources.  Blocks are written as parquet partitioned by
  ``q`` (local disk here; HDFS/S3 on a real cluster) and memoized in
  the Python workers across supersteps (spark.python.worker.reuse).
- routing table (once): ``routes = distinct (src, q)`` — a source
  sends ONE message per target block per round, not one per edge; a
  hub with 10^6 out-edges sends ≤ P rows (this is GraphX's routing
  table / the vertex-cut mirror optimization, and the explicit
  skew story for scatter).
- per superstep: ``state ⋈ routes`` (co-partitioned, no exchange) →
  ONE |routes|-row exchange by q → ``mapInPandas`` gather: for each
  block, scatter the incoming per-source values over the CSR with
  ``np.repeat`` + ``np.bincount`` (C speed, no per-row Python) →
  (vid, contrib) rows for the apply join.

Per-superstep shuffle volume: |routes| + |V| rows, vs the SQL plan's
map-side-combined |E|→(partition×dst) rows; per-superstep CPU: numpy
bincount vs JVM hash-agg.  ``bench.py``/BENCH.md records which wins at
which scale (the SQL plan keeps whole-stage codegen and zero Python).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID

# worker-side block cache: (blocks_path, q) -> _Block; survives across
# supersteps because Spark reuses Python workers within an app
_BLOCK_CACHE: dict = {}


@dataclass
class _Block:
    srcs: np.ndarray      # sorted unique source gids with edges into this block
    indptr: np.ndarray    # len(srcs)+1 offsets into dst_idx
    dst_idx: np.ndarray   # per-edge index into uniq_dst
    uniq_dst: np.ndarray  # sorted unique destination gids owned by this block


def _load_block(path: str, q: int) -> _Block:
    key = (path, q)
    blk = _BLOCK_CACHE.get(key)
    if blk is None:
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(path, f"q={q}"))
        row = {c: t.column(c).combine_chunks() for c in t.column_names}
        blk = _Block(
            srcs=np.asarray(row["srcs"][0].values, dtype=np.int64),
            indptr=np.asarray(row["indptr"][0].values, dtype=np.int64),
            dst_idx=np.asarray(row["dst_idx"][0].values, dtype=np.int64),
            uniq_dst=np.asarray(row["uniq_dst"][0].values, dtype=np.int64),
        )
        _BLOCK_CACHE[key] = blk
    return blk


class CsrGraph:
    """Frozen gather-side CSR blocks + routing table for one edge set."""

    def __init__(self, spark: SparkSession, path: str, routes: DataFrame, p: int):
        self.spark = spark
        self.path = path
        self.routes = routes
        self.p = p

    @staticmethod
    def build(edges: DataFrame, path: str, num_partitions: int) -> "CsrGraph":
        """``edges``: (src, dst) DataFrame (already symmetrized if the
        algorithm is undirected).  Writes blocks under ``path`` and
        caches the routing table."""
        spark = edges.sparkSession
        p = num_partitions
        eq = edges.select(
            F.col(SRC).cast("long"),
            F.col(DST).cast("long"),
            F.pmod(F.hash(F.col(DST)), F.lit(p)).alias("q"),
        )

        import pandas as pd

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            q = int(pdf["q"].iloc[0])
            pdf = pdf.sort_values([SRC, DST], kind="mergesort")
            src = pdf[SRC].to_numpy(dtype=np.int64)
            dst = pdf[DST].to_numpy(dtype=np.int64)
            srcs, counts = np.unique(src, return_counts=True)
            indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
            uniq_dst, dst_idx = np.unique(dst, return_inverse=True)
            return pd.DataFrame(
                {
                    "q": [q],
                    "srcs": [srcs],
                    "indptr": [indptr],
                    "dst_idx": [dst_idx.astype(np.int64)],
                    "uniq_dst": [uniq_dst],
                }
            )

        schema = (
            "q int, srcs array<long>, indptr array<long>, "
            "dst_idx array<long>, uniq_dst array<long>"
        )
        blocks = eq.groupBy("q").applyInPandas(pack, schema=schema)
        blocks.write.mode("overwrite").partitionBy("q").parquet(path)
        routes = (
            eq.select(SRC, "q").distinct().repartition(p, SRC).cache()
        )
        routes.count()
        return CsrGraph(spark, path, routes, p)

    def gather(self, values: DataFrame, value_col: str = "c") -> DataFrame:
        """One gather superstep: ``values`` = (vid, c) per-source values
        (co-partitioned hash(vid, P)); returns (vid, contrib) =
        Σ_{u→v} c[u] for every v with at least one in-edge.

        Plan: values ⋈ routes (zero-exchange) → repartition(q) (THE
        per-round exchange, |routes| rows) → numpy CSR scatter-add.
        """
        path, p = self.path, self.p
        hv = values.hint("shuffle_hash")
        msgs = (
            self.routes.join(hv, self.routes[SRC] == hv[VID])
            .select(self.routes[SRC].alias("s"), "q", F.col(value_col).alias("c"))
            .repartition(p, "q")
        )

        import pandas as pd

        def run(batches):
            per_q: dict[int, list] = {}
            for pdf in batches:
                for q, grp in pdf.groupby("q"):
                    per_q.setdefault(int(q), []).append(grp)
            for q, grps in per_q.items():
                blk = _load_block(path, q)
                g = pd.concat(grps) if len(grps) > 1 else grps[0]
                vals = np.zeros(len(blk.srcs), dtype=np.float64)
                pos = np.searchsorted(blk.srcs, g["s"].to_numpy(dtype=np.int64))
                vals[pos] = g["c"].to_numpy(dtype=np.float64)
                edge_c = np.repeat(vals, np.diff(blk.indptr))
                out = np.bincount(
                    blk.dst_idx, weights=edge_c, minlength=len(blk.uniq_dst)
                )
                yield pd.DataFrame({VID: blk.uniq_dst, "contrib": out})

        return msgs.mapInPandas(run, schema=f"{VID} long, contrib double")


def pagerank_csr(
    g,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float | None = 1e-6,
    blocks_path: str | None = None,
    sync_every: int = 1,
    runner=None,
) -> DataFrame:
    """PageRank over frozen CSR blocks — same semantics as
    algorithms.pagerank (pagerank_networkx.h recurrence incl. dangling
    pool), different physical plan: the |E|-row join+hash-agg gather is
    replaced by the CsrGraph routing-table gather.

    Returns (vid long, rank double).
    """
    import tempfile

    from graphscope_spark.graph import Graph  # noqa: F401 (doc type)
    from graphscope_spark.superstep import StepResult, SuperstepRunner, one_shuffle_mode

    spark = g.edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (g.edges if g.directed else g.symmetrized()).select(SRC, DST)
    n = g.num_vertices()
    if n == 0:
        return g.vertices.select(VID, F.lit(0.0).alias("rank"))
    path = blocks_path or os.path.join(
        tempfile.gettempdir(), f"gs_csr_{abs(hash((id(g), p)))}"
    )
    csr = CsrGraph.build(edges, path, p)

    degrees = (
        edges.groupBy(F.col(SRC).alias(VID))
        .agg(F.count(F.lit(1)).cast("long").alias("out_deg"))
        .join(g.vertices.select(VID), VID, "right")
        .select(VID, F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
    )

    def init() -> DataFrame:
        r0 = F.lit(1.0 / n)
        return degrees.select(
            VID, r0.alias("rank"), r0.alias("old_rank"), "out_deg"
        ).repartition(p, VID)

    has_dangling = degrees.where(F.col("out_deg") == 0).limit(1).count() > 0

    def step(state: DataFrame, k: int) -> StepResult:
        dang = (
            state.agg(
                F.coalesce(
                    F.sum(F.when(F.col("out_deg") == 0, F.col("rank"))), F.lit(0.0)
                ).alias("_dang")
            )
            if has_dangling
            else None
        )
        values = state.select(
            VID, (F.col("rank") / F.col("out_deg")).alias("c"), "out_deg"
        ).where(F.col("out_deg") > 0)
        contribs = csr.gather(values.select(VID, "c"))
        joined = state.hint("shuffle_hash").join(contribs, VID, "left")
        if dang is not None:
            joined = joined.crossJoin(F.broadcast(dang))
            rank_expr = (
                alpha * F.coalesce("contrib", F.lit(0.0))
                + (1.0 - alpha) / n
                + alpha * F.col("_dang") / n
            )
        else:
            rank_expr = alpha * F.coalesce("contrib", F.lit(0.0)) + (1.0 - alpha) / n
        nxt = joined.select(
            VID,
            rank_expr.alias("rank"),
            state["rank"].alias("old_rank"),
            "out_deg",
        )

        def delta_fn(m: DataFrame) -> float:
            return (
                m.agg(F.sum(F.abs(F.col("rank") - F.col("old_rank")))).collect()[0][0]
                or 0.0
            )

        return StepResult(nxt, delta_fn=delta_fn)

    run = runner or SuperstepRunner(spark, "pagerank_csr")
    with one_shuffle_mode(spark):
        final = run.run(
            init,
            step,
            max_iterations=max_iter,
            tol=(tol * n if tol is not None else None),
            sync_every=sync_every if tol is None else 1,
        )
    return final.select(VID, "rank")
