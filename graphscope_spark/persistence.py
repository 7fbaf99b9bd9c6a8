"""Graph persistence + result attachment.

Reference analogs:
- SERIALIZE_GRAPH / DESERIALIZE_GRAPH and GraphAr ``save_to``/
  ``load_from`` (framework/dag_utils.py:1085-1160, graph.py:1171-1347)
  → Parquet round-trip of vertices + edges + a small JSON descriptor.
- ADD_COLUMN (dag_utils.py:973-995): attach an algorithm's result
  context to the graph as a new vertex property → a join.

Layout (Iceberg-compatible directory-of-parquet):
    <path>/meta.json            {"directed":…, "num_partitions":…}
    <path>/vertices/*.parquet
    <path>/edges/*.parquet

Edges are written partitioned as loaded (hash edge-cut by src), so a
reloaded graph resumes with the same co-location properties.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphscope_spark.graph import VID, Graph


def save_graph(g: Graph, path: str) -> None:
    g.edges.write.mode("overwrite").parquet(os.path.join(path, "edges"))
    g.vertices.write.mode("overwrite").parquet(os.path.join(path, "vertices"))
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(
            {"directed": g.directed, "num_partitions": g.num_partitions}, fh
        )


def load_graph(spark: SparkSession, path: str) -> Graph:
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    edges = spark.read.parquet(os.path.join(path, "edges"))
    vertices = spark.read.parquet(os.path.join(path, "vertices"))
    return Graph(
        edges.repartition(meta["num_partitions"], "src"),
        vertices,
        directed=meta["directed"],
        num_partitions=meta["num_partitions"],
    )


def save_graphar(g: Graph, path: str, chunk_size: int = 262144) -> None:
    """GraphAr-style export (reference: GraphAr ``save_to``/``load_from``,
    python/graphscope/framework/graph.py:1171-1347).

    The public GraphAr spec organizes a graph as vertex chunks (rows
    ordered by an internal index, fixed chunk size) plus edge chunks
    grouped by source-vertex chunk with CSR-style offsets, described by
    YAML metadata.  This writer follows that layout shape with Parquet
    chunks and a JSON descriptor (the GraphAr C++/Java tooling is not
    available here; the layout semantics — deterministic index order,
    chunked files, offset tables — are what matter for parity):

        <path>/graphar.json                     descriptor
        <path>/vertex/<chunk k>.parquet         (index, vid, props)
        <path>/edge/adj_list/<chunk k>.parquet  (src_index, dst_index)
        <path>/edge/offsets/<chunk k>.parquet   per-src-index CSR offsets
    """
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from graphscope_spark.graph import build_vertex_ids

    # deterministic dense index = rank of vid (GraphAr internal id)
    idx = build_vertex_ids(
        g.vertices.select(VID), VID, out="index", num_partitions=g.num_partitions
    ).select(F.col(VID), F.col("index"))
    verts = (
        g.vertices.join(idx, VID)
        .withColumn("chunk", (F.col("index") / chunk_size).cast("long"))
    )
    verts.write.mode("overwrite").partitionBy("chunk").parquet(
        os.path.join(path, "vertex")
    )
    e = (
        g.edges.select("src", "dst")
        .join(idx.select(F.col(VID).alias("src"), F.col("index").alias("src_index")), "src")
        .join(idx.select(F.col(VID).alias("dst"), F.col("index").alias("dst_index")), "dst")
        .select("src_index", "dst_index")
        .withColumn("chunk", (F.col("src_index") / chunk_size).cast("long"))
    )
    e.repartition("chunk").sortWithinPartitions("src_index", "dst_index").write.mode(
        "overwrite"
    ).partitionBy("chunk").parquet(os.path.join(path, "edge", "adj_list"))
    # CSR offsets per chunk: cumulative edge counts by src_index
    counts = e.groupBy("chunk", "src_index").agg(F.count(F.lit(1)).alias("deg"))
    w = Window.partitionBy("chunk").orderBy("src_index")
    offsets = counts.select(
        "chunk",
        "src_index",
        (F.sum("deg").over(w) - F.col("deg")).alias("offset"),
        "deg",
    )
    offsets.write.mode("overwrite").partitionBy("chunk").parquet(
        os.path.join(path, "edge", "offsets")
    )
    n_verts = g.num_vertices()
    with open(os.path.join(path, "graphar.json"), "w") as fh:
        json.dump(
            {
                "version": "gar/v1-layout",
                "vertex_count": n_verts,
                "chunk_size": chunk_size,
                "directed": g.directed,
                "vertex_chunks": (n_verts + chunk_size - 1) // chunk_size,
            },
            fh,
        )


def load_graphar(spark: SparkSession, path: str) -> Graph:
    """Rebuild a Graph from a :func:`save_graphar` directory; vids are
    the ORIGINAL ids (the index dictionary is inverted on load)."""
    import pyspark.sql.functions as F

    with open(os.path.join(path, "graphar.json")) as fh:
        meta = json.load(fh)
    verts = spark.read.parquet(os.path.join(path, "vertex"))
    idx = verts.select("index", VID)
    e = spark.read.parquet(os.path.join(path, "edge", "adj_list"))
    edges = (
        e.join(idx.select(F.col("index").alias("src_index"), F.col(VID).alias("src")), "src_index")
        .join(idx.select(F.col("index").alias("dst_index"), F.col(VID).alias("dst")), "dst_index")
        .select("src", "dst")
    )
    return Graph.from_edges(
        edges,
        verts.drop("index", "chunk"),
        directed=meta["directed"],
    )


def consolidate_columns(
    g: Graph, columns: list[str], name: str, as_struct: bool = False
) -> Graph:
    """CONSOLIDATE_COLUMNS (dag_utils.py:232-280, graph.py:715-762):
    merge several vertex property columns into one array (or struct)
    column — pure column rewriting, no shuffle."""
    merged = (
        F.struct(*[F.col(c) for c in columns])
        if as_struct
        else F.array(*[F.col(c).cast("double") for c in columns])
    )
    from dataclasses import replace

    return replace(
        g, vertices=g.vertices.withColumn(name, merged).drop(*columns)
    )


def add_column(g: Graph, result: DataFrame, prefix: str | None = None) -> Graph:
    """Attach a (vid, ...) result DataFrame as vertex properties.

    Column name collisions are resolved by ``prefix`` (reference
    validates selectors instead, dag_utils.py:973-995)."""
    cols = [c for c in result.columns if c != VID]
    r = result
    if prefix:
        for c in cols:
            r = r.withColumnRenamed(c, f"{prefix}{c}")
    from dataclasses import replace

    return replace(g, vertices=g.vertices.join(r, VID, "left"))
