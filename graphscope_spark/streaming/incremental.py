"""Incremental PageRank over a stream of edge batches.

Reference analog: Ingress auto-incrementalization
(docs/analytical_engine/ingress.md — out of scope to port, SURVEY.md §4)
and the continuously-arriving-crawl reality of a 10^12-document link
graph: new WARC batches add edges; recomputing PageRank from scratch
per batch is wasteful because the previous solution is an excellent
warm start.

Spark-native shape: a file-source ``readStream`` of edge Parquet
batches drives ``foreachBatch``; each micro-batch

  1. appends the new edges to the accumulated edge table (Parquet dir —
     the "graph state"; at cluster scale an Iceberg append, cf.
     sources/iceberg.py),
  2. re-runs the PageRank power iteration WARM-STARTED from the
     previous ranks (new vertices enter at 1/N, the vector is
     renormalized), converging in a handful of supersteps instead of
     tens because ‖r_prev − r*‖ is small when a batch adds few edges,
  3. writes the refreshed ranks (the queryable output) + a metrics line.

The warm-start trick is the whole point: convergence work is
proportional to the PERTURBATION, not the graph size — the incremental
property the reference gets from Ingress's memoized supersteps.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.algorithms import pagerank
from graphscope_spark.superstep import StepResult, SuperstepRunner

EDGE_SCHEMA = "src long, dst long"


# ---------------------------------------------------------------------
# idempotent per-batch state layout (ADVICE r3: foreachBatch is
# at-least-once — a retry after a partial state write must not
# double-apply).  Every accumulated table is a directory of
# ``batch=<id>/`` sub-dirs, each written with mode("overwrite") so a
# retry rewrites ITS OWN partition byte-identically; every read of
# "history" filters to batch ids STRICTLY BEFORE the current one, so a
# half-written current batch can never leak into its own inputs.
# Derived state (ranks/comps/counts) is a versioned ``snap=<id>/``
# snapshot per batch: the warm-start input is the snapshot with the
# largest id < current, which a retry re-reads unchanged — the batch
# is a deterministic function of (prior snaps, prior batches, batch
# data), hence replay-safe.  This is also the per-partition lineage
# the north rule asks for: each snapshot names the batch that produced
# it.  Old snapshots are GC'd keeping the last two (current + the one
# a retry of the NEXT batch would need).
# ---------------------------------------------------------------------


def _ids_in(root: str, prefix: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        if d.startswith(prefix + "=") and os.path.exists(
            os.path.join(root, d, "_SUCCESS")
        ):
            out.append(int(d.split("=", 1)[1]))
    return sorted(out)


def _write_batch(df: DataFrame, root: str, batch_id: int, prefix: str = "batch") -> None:
    df.write.mode("overwrite").parquet(
        os.path.join(root, f"{prefix}={batch_id}")
    )


def _read_batches(
    spark: SparkSession, root: str, schema: str, before: int | None = None
) -> DataFrame:
    """Union of all complete ``batch=<id>`` partitions with id < before
    (all of them when ``before`` is None)."""
    ids = _ids_in(root, "batch")
    if before is not None:
        ids = [i for i in ids if i < before]
    if not ids:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        *[os.path.join(root, f"batch={i}") for i in ids]
    )


def _read_snap(
    spark: SparkSession,
    root: str,
    before: int | None = None,
    batches_root: str | None = None,
) -> DataFrame | None:
    """Latest complete snapshot with id < before (or latest overall).

    ``batches_root``: when given, a replayed ``before`` whose prior
    snapshot was already GC'd is an ERROR, not a silent cold start —
    a rollback of more than ``keep-1`` batches would otherwise warm
    from nothing and (in fixed-round tol=None mode) produce a
    different, seed-dependent result than the original run, violating
    the replay-determinism contract without any signal (ADVICE r4).
    Genuine cold starts (no prior batch ever ran) stay allowed.
    """
    ids = _ids_in(root, "snap")
    if before is not None:
        ids = [i for i in ids if i < before]
    if not ids:
        if (
            before is not None
            and batches_root is not None
            and any(b < before for b in _ids_in(batches_root, "batch"))
        ):
            raise RuntimeError(
                f"replay of batch {before} needs a snapshot from an "
                f"earlier batch, but all were garbage-collected "
                f"(snapshots kept: {_ids_in(root, 'snap')}); the replay "
                f"window is one batch — restart the stream from a fresh "
                f"state dir or raise the GC keep count"
            )
        return None
    return spark.read.parquet(os.path.join(root, f"snap={ids[-1]}"))


def _gc_snaps(root: str, keep: int = 2) -> None:
    import shutil

    ids = _ids_in(root, "snap")
    for i in ids[:-keep]:
        shutil.rmtree(os.path.join(root, f"snap={i}"), ignore_errors=True)


def _warm_pagerank(
    g: Graph,
    prev: DataFrame | None,
    alpha: float,
    tol: float | None,
    max_iter: int,
) -> DataFrame:
    """Power iteration warm-started from ``prev`` (vid, rank).

    ``tol=None`` = the LDBC fixed-round convention (exactly ``max_iter``
    warm rounds per batch, no convergence test) — the mode the driver's
    ``stream_incr_pagerank`` contract uses so a DuckDB oracle can
    unroll the whole batch chain deterministically."""
    if prev is None:
        return pagerank(g, alpha=alpha, max_iter=max_iter, tol=tol)
    spark = g.edges.sparkSession
    edges = g.distinct_edges().cache()
    n = g.num_vertices()
    degrees = (
        edges.groupBy(F.col(SRC).alias(VID))
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .join(g.vertices.select(VID), VID, "right")
        .select(VID, F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"))
    )

    def init() -> DataFrame:
        seeded = degrees.join(prev.select(VID, F.col("rank").alias("r0")), VID, "left")
        seeded = seeded.select(
            VID, "out_deg", F.coalesce("r0", F.lit(1.0 / n)).alias("rank")
        )
        total = seeded.agg(F.sum("rank").alias("_t"))
        return (
            seeded.crossJoin(F.broadcast(total))
            .select(
                VID,
                (F.col("rank") / F.col("_t")).alias("rank"),
                (F.col("rank") / F.col("_t")).alias("old_rank"),
                "out_deg",
            )
        )

    def step(state: DataFrame, k: int) -> StepResult:
        dang = state.agg(
            F.coalesce(
                F.sum(F.when(F.col("out_deg") == 0, F.col("rank"))), F.lit(0.0)
            ).alias("_dang")
        )
        contribs = (
            edges.join(state, edges[SRC] == state[VID])
            .select(F.col(DST).alias(VID), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy(VID)
            .agg(F.sum("c").alias("contrib"))
        )
        nxt = (
            state.join(contribs, VID, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                VID,
                (
                    alpha * F.coalesce("contrib", F.lit(0.0))
                    + (1.0 - alpha) / n
                    + alpha * F.col("_dang") / n
                ).alias("rank"),
                state["rank"].alias("old_rank"),
                "out_deg",
            )
        )

        def delta_fn(m: DataFrame) -> float:
            return (
                m.agg(F.sum(F.abs(F.col("rank") - F.col("old_rank")))).collect()[0][0]
                or 0.0
            )

        return StepResult(nxt, delta_fn=delta_fn)

    run = SuperstepRunner(spark, "pagerank_warm")
    final = run.run(init, step, max_iterations=max_iter, tol=None if tol is None else tol * n)
    out = final.select(VID, "rank")
    edges.unpersist()
    return out


class IncrementalPageRank:
    """foreachBatch processor maintaining edges + warm-started ranks.

    ``state_dir`` layout:  edges/   accumulated edge Parquet
                           ranks/   current (vid, rank) Parquet
                           metrics.jsonl  one line per micro-batch
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        alpha: float = 0.85,
        tol: float | None = 1e-6,
        max_iter: int = 100,
        num_partitions: int = 32,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.alpha = alpha
        self.tol = tol
        self.max_iter = max_iter
        self.num_partitions = num_partitions
        os.makedirs(state_dir, exist_ok=True)
        self.batches_seen = 0

    @property
    def _edges_dir(self) -> str:
        return os.path.join(self.state_dir, "edges")

    @property
    def _ranks_dir(self) -> str:
        return os.path.join(self.state_dir, "ranks")

    def current_ranks(self) -> DataFrame | None:
        return _read_snap(self.spark, self._ranks_dir)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        bid = int(batch_id)
        _write_batch(batch_df.select(SRC, DST), self._edges_dir, bid)
        edges = _read_batches(self.spark, self._edges_dir, EDGE_SCHEMA, before=bid + 1)
        g = Graph.from_edges(edges, directed=True, num_partitions=self.num_partitions)
        prev = _read_snap(
            self.spark, self._ranks_dir, before=bid,
            batches_root=self._edges_dir,
        )
        ranks = _warm_pagerank(
            g, prev, alpha=self.alpha, tol=self.tol, max_iter=self.max_iter
        )
        # the superstep runner already materialized the final state, so
        # the snapshot write is the ONLY extra job — no localCheckpoint
        # copy in between (VERDICT r4 task 5: the per-batch harness
        # floor was job-count, not compute)
        _write_batch(ranks, self._ranks_dir, bid, prefix="snap")
        _gc_snaps(self._ranks_dir)
        self.batches_seen += 1
        rec = {
            "batch_id": int(batch_id),
            # footer-metadata counts over the files just written — no
            # recompute of the batch or the vertex set
            "batch_edges": self.spark.read.parquet(
                os.path.join(self._edges_dir, f"batch={bid}")
            ).count(),
            "total_vertices": self.spark.read.parquet(
                os.path.join(self._ranks_dir, f"snap={bid}")
            ).count(),
            "seconds": round(time.time() - t0, 3),
            "warm_start": prev is not None,
            "ts": time.time(),
        }
        with open(os.path.join(self.state_dir, "metrics.jsonl"), "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def attach(self, edge_stream: DataFrame, trigger_available_now: bool = True):
        """Wire onto a streaming edge DataFrame; returns the query."""
        w = edge_stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", os.path.join(self.state_dir, "_checkpoint")
        )
        if trigger_available_now:
            w = w.trigger(availableNow=True)
        return w.start()


def _warm_wcc(
    g: Graph, prev: DataFrame | None, seed_vertices: DataFrame, max_iter: int = 200
) -> DataFrame:
    """Min-label propagation warm-started from ``prev`` (vid, comp).

    For an ADDITIONS-ONLY stream this is exact with a frontier seeded
    only at the new edges' endpoints (plus never-seen vertices): the
    previous labels are a fixpoint of the old edge set, labels are
    monotone non-increasing under edge additions, and any label that
    can still fall must fall along a path through a new edge — the
    Ingress memoized-superstep class for monotone algorithms
    (docs/analytical_engine/ingress.md).  Deletions invalidate the
    warm start; callers must rebuild cold for them (as Ingress does
    outside its monotone class).
    """
    sym = g.symmetrized().cache()
    state = g.vertices.select(VID).join(
        prev if prev is not None else g.vertices.select(VID, F.col(VID).alias("comp")),
        VID,
        "left",
    ).select(VID, F.coalesce("comp", F.col(VID)).alias("comp"))
    state = state.localCheckpoint(eager=True)
    frontier = (
        seed_vertices.select(VID).distinct()
        if prev is not None
        else state.select(VID)
    )
    for _ in range(max_iter):
        fstate = state.join(frontier, VID, "semi")
        msgs = (
            sym.join(
                fstate.select(F.col(VID).alias(SRC), F.col("comp").alias("c")), SRC
            )
            .groupBy(F.col(DST).alias(VID))
            .agg(F.min("c").alias("mc"))
        )
        nxt = state.join(msgs, VID, "left").select(
            VID,
            F.least(F.col("comp"), F.coalesce("mc", F.col("comp"))).alias("comp"),
            (F.coalesce("mc", F.col("comp")) < F.col("comp")).alias("_ch"),
        )
        nxt = nxt.localCheckpoint(eager=True)
        frontier = nxt.where(F.col("_ch")).select(VID)
        state = nxt.select(VID, "comp")
        if frontier.limit(1).count() == 0:
            break
    sym.unpersist()
    return state


class IncrementalWCC:
    """foreachBatch processor maintaining edges + warm-started
    weakly-connected components (min-vid labels, the LDBC contract —
    identical output to a cold ``algorithms.wcc`` run, pinned by
    tests).  Same state layout discipline as :class:`IncrementalPageRank`:
    ``edges/`` accumulated Parquet, ``comps/`` current (vid, comp),
    ``metrics.jsonl`` one line per micro-batch with the superstep count
    — which tracks the PERTURBATION (new edges' reach), not the graph
    size."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        num_partitions: int = 32,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.num_partitions = num_partitions
        os.makedirs(state_dir, exist_ok=True)
        self.batches_seen = 0

    @property
    def _edges_dir(self) -> str:
        return os.path.join(self.state_dir, "edges")

    @property
    def _comps_dir(self) -> str:
        return os.path.join(self.state_dir, "comps")

    def current_components(self) -> DataFrame | None:
        return _read_snap(self.spark, self._comps_dir)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        bid = int(batch_id)
        _write_batch(batch_df.select(SRC, DST), self._edges_dir, bid)
        edges = _read_batches(self.spark, self._edges_dir, EDGE_SCHEMA, before=bid + 1)
        g = Graph.from_edges(edges, directed=True, num_partitions=self.num_partitions)
        prev = _read_snap(
            self.spark, self._comps_dir, before=bid,
            batches_root=self._edges_dir,
        )
        seeds = (
            batch_df.select(F.col(SRC).alias(VID))
            .unionByName(batch_df.select(F.col(DST).alias(VID)))
            .distinct()
        )
        comps = _warm_wcc(g, prev, seeds)
        _write_batch(comps, self._comps_dir, bid, prefix="snap")
        _gc_snaps(self._comps_dir)
        self.batches_seen += 1
        rec = {
            "batch_id": int(batch_id),
            "batch_edges": self.spark.read.parquet(
                os.path.join(self._edges_dir, f"batch={bid}")
            ).count(),
            "total_vertices": self.spark.read.parquet(
                os.path.join(self._comps_dir, f"snap={bid}")
            ).count(),
            "seconds": round(time.time() - t0, 3),
            "warm_start": prev is not None,
            "ts": time.time(),
        }
        with open(os.path.join(self.state_dir, "metrics.jsonl"), "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def attach(self, edge_stream: DataFrame, trigger_available_now: bool = True):
        """Wire onto a streaming edge DataFrame; returns the query."""
        w = edge_stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", os.path.join(self.state_dir, "_checkpoint")
        )
        if trigger_available_now:
            w = w.trigger(availableNow=True)
        return w.start()


def stream_edges(spark: SparkSession, path_glob: str) -> DataFrame:
    """File-source stream of edge Parquet batches (one file per
    micro-batch — the WARC-batch arrival pattern)."""
    return (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path_glob)
    )


# ---------------------------------------------------------------------
# incremental triangle counting
# ---------------------------------------------------------------------

def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (a < b), self-loop-free, distinct."""
    return (
        edges.select(
            F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _both_dirs(canon: DataFrame) -> DataFrame:
    """(x, w) adjacency — each canonical edge in both directions."""
    return canon.select(F.col("a").alias("x"), F.col("b").alias("w")).unionAll(
        canon.select(F.col("b").alias("x"), F.col("a").alias("w"))
    )


def triangle_delta(old_canon: DataFrame, new_canon: DataFrame) -> DataFrame:
    """Per-vertex CHANGE in triangle count when ``new_canon`` edges are
    added to ``old_canon`` (both canonical a<b sets, disjoint).

    Every created triangle contains 1, 2, or 3 new edges; the three
    cases are enumerated disjointly, so each triangle is counted
    exactly once (the exactness argument the per-batch parity test
    pins):

    * 1 new: for each new {u,v}, close with two OLD edges — counted at
      its unique new edge.
    * 2 new: a wedge of two NEW edges at a unique shared center,
      closed by an OLD edge — counted at its unique center.
    * 3 new: canonical a<b<c enumeration inside the new set.

    Scale shape: the batch is small relative to the graph (the
    streaming premise), so every join is new-batch-vs-adjacency —
    candidate volume Σ_{new uv} deg(u), never old×old; the old edge
    table is touched only by semi-joins on candidate keys (AQE picks
    broadcast when the candidate set is small).  Returns
    (vid, d_tri) for vertices whose count changed.
    """
    adj_old = _both_dirs(old_canon)
    adj_new = _both_dirs(new_canon)

    # 1 new edge {u,v} + old {u,w} + old {v,w}
    t1 = (
        new_canon.join(adj_old.withColumnRenamed("x", "a"), "a")
        .where(F.col("w") != F.col("b"))
        .join(
            old_canon.select(
                F.col("a").alias("ca"), F.col("b").alias("cb")
            ),
            (F.least("b", "w") == F.col("ca")) & (F.greatest("b", "w") == F.col("cb")),
            "semi",
        )
        .select(F.col("a").alias("u"), F.col("b").alias("v"), F.col("w").alias("w"))
    )

    # 2 new edges sharing center c: new {c,a'}, new {c,b'} (a'<b'), old {a',b'}
    wedges = (
        adj_new.select(F.col("x").alias("c"), F.col("w").alias("p"))
        .join(adj_new.select(F.col("x").alias("c"), F.col("w").alias("q")), "c")
        .where(F.col("p") < F.col("q"))
    )
    t2 = (
        wedges.join(
            old_canon.select(F.col("a").alias("p"), F.col("b").alias("q")),
            ["p", "q"],
            "semi",
        )
        .select(F.col("c").alias("u"), F.col("p").alias("v"), F.col("q").alias("w"))
    )

    # 3 new edges: a<b<c all inside the new set
    t3 = (
        new_canon.join(
            new_canon.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
        )
        .join(
            new_canon.select(F.col("a").alias("a"), F.col("b").alias("c")),
            ["a", "c"],
            "semi",
        )
        .select(F.col("a").alias("u"), F.col("b").alias("v"), F.col("c").alias("w"))
    )

    tri = t1.unionAll(t2).unionAll(t3)
    corners = (
        tri.select(F.col("u").alias(VID))
        .unionAll(tri.select(F.col("v").alias(VID)))
        .unionAll(tri.select(F.col("w").alias(VID)))
    )
    return corners.groupBy(VID).agg(F.count(F.lit(1)).cast("long").alias("d_tri"))


class IncrementalTriangles:
    """foreachBatch processor maintaining exact per-vertex triangle
    counts under an additions-only edge stream.

    Unlike warm-started PageRank/WCC (iterate-to-fixpoint from a good
    guess), triangle counts admit an EXACT delta: each batch does
    batch-sized join work (``triangle_delta``) and adds it to the
    stored counts — no iteration at all, the strongest form of the
    Ingress memoization idea (docs/analytical_engine/ingress.md).

    State layout: ``edges/`` accumulated canonical Parquet, ``counts/``
    current (vid, tri), ``metrics.jsonl`` one line per micro-batch.
    Per-batch parity with a cold ``algorithms.triangles`` run is
    pinned in tests/test_incremental.py.
    """

    def __init__(
        self, spark: SparkSession, state_dir: str, num_partitions: int = 32
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.num_partitions = num_partitions
        os.makedirs(state_dir, exist_ok=True)
        self.batches_seen = 0

    @property
    def _edges_dir(self) -> str:
        return os.path.join(self.state_dir, "edges")

    @property
    def _counts_dir(self) -> str:
        return os.path.join(self.state_dir, "counts")

    def current_counts(self) -> DataFrame | None:
        return _read_snap(self.spark, self._counts_dir)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        bid = int(batch_id)
        # old = strictly-prior batches; a retry's own half-written
        # partition can never leak into the delta's "old" side, and
        # prev comes from the snapshot BEFORE this batch — so the
        # counts written for bid are the same on every replay
        # (ADVICE r3: the append-after-overwrite ordering double-
        # applied the delta on retry)
        # ids are enumerated eagerly here (os.listdir), so the write of
        # batch=bid below can never leak into old's read paths
        have_old = any(i < bid for i in _ids_in(self._edges_dir, "batch"))
        old = _read_batches(self.spark, self._edges_dir, "a long, b long", before=bid)
        # write the deduped batch FIRST and reread it — one job instead
        # of localCheckpoint + write (VERDICT r4 task 5); replay-safe in
        # either order: a retry recomputes new from strictly-prior
        # batches and overwrites batch=bid byte-identically
        _write_batch(
            _canon(batch_df).join(old, ["a", "b"], "anti"),
            self._edges_dir,
            bid,
        )
        new = self.spark.read.schema("a long, b long").parquet(
            os.path.join(self._edges_dir, f"batch={bid}")
        )
        delta = triangle_delta(old, new)
        prev = _read_snap(
            self.spark, self._counts_dir, before=bid,
            batches_root=self._edges_dir,
        )
        if prev is None:
            prev = self.spark.createDataFrame([], f"{VID} long, tri long")
        counts = (
            prev.join(delta, VID, "full")
            .select(
                VID,
                (F.coalesce("tri", F.lit(0)) + F.coalesce("d_tri", F.lit(0)))
                .cast("long")
                .alias("tri"),
            )
        )
        _write_batch(counts, self._counts_dir, bid, prefix="snap")
        _gc_snaps(self._counts_dir)
        self.batches_seen += 1
        rec = {
            "batch_id": int(batch_id),
            "batch_edges": new.count(),
            "seconds": round(time.time() - t0, 3),
            "cold_start": not have_old,
            "ts": time.time(),
        }
        with open(os.path.join(self.state_dir, "metrics.jsonl"), "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def attach(self, edge_stream: DataFrame, trigger_available_now: bool = True):
        """Wire onto a streaming edge DataFrame; returns the query."""
        w = edge_stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", os.path.join(self.state_dir, "_checkpoint")
        )
        if trigger_available_now:
            w = w.trigger(availableNow=True)
        return w.start()
