"""JVM-side deterministic synthetic link-graph edge tables.

For scale benchmarks the pages pipeline is the wrong generator — HTML
rendering is Python-bound.  This produces the same *shape* of graph
(power-law-ish out-degree, hub vertices receiving ~10% of all links)
entirely with Catalyst expressions (``spark.range`` + ``xxhash64``),
so 10^7–10^9 edges materialize in seconds and benchmarks measure the
superstep machinery, not the generator.

Deterministic per (seed, vertex, k): every value derives from
``xxhash64`` of literals — identical at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_HUBS = 3
HUB_SHARE_MOD = 10  # 1/10 of links rerouted to hubs


def powerlaw_edges(
    spark: SparkSession,
    n_vertices: int,
    max_deg: int = 12,
    seed: int = 42,
    partitions: int = 32,
) -> DataFrame:
    """(src long, dst long) edge table; expected |E| ≈ n · (max_deg/2 · 0.37 + 1).

    Out-degree pattern mirrors sources/pages.py: 70% of vertices get
    1-3 links, 30% get up to ``max_deg``; 10% of all links point at
    vertices 0..N_HUBS-1 (the skew hubs).
    """
    ids = spark.range(0, n_vertices, 1, partitions).select(F.col("id").alias("src"))
    h = lambda tag, col: F.abs(F.xxhash64(F.lit(seed), F.lit(tag), col))
    degsel = h("deg", F.col("src")) % 100
    odeg = (
        F.when(degsel < 70, F.lit(1) + degsel % 3)
        .otherwise(F.lit(1) + degsel % max_deg)
        .cast("int")
    )
    exploded = ids.select(
        "src", F.explode(F.sequence(F.lit(0), odeg - 1)).alias("k")
    )
    r = h("t", F.concat(F.col("src").cast("string"), F.lit(":"), F.col("k").cast("string")))
    # self-loop-free by construction (dst walks off src), which also
    # means every vertex keeps its out-edges — no dangling vertices, so
    # pagerank's dangling-pool fast path applies (pagerank.py)
    hub = r % N_HUBS
    hub = F.when(hub == F.col("src"), (hub + 1) % n_vertices).otherwise(hub)
    uni = (F.col("src") + 1 + r % (n_vertices - 1)) % n_vertices
    dst = F.when(r % HUB_SHARE_MOD == 0, hub).otherwise(uni).cast("long")
    return exploded.select("src", dst.alias("dst")).repartition(partitions, "src")
