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
