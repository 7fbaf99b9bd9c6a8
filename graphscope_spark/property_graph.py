"""Labeled property-graph algorithms over the union graph.

Reference analog: the `apps/property/` family — WCC and SSSP written
directly against the *labeled* property graph rather than a projected
simple graph:

- `apps/property/wcc_property.h:27-176` — per-label vertex arrays
  `comp_id[label][v]`, propagation sweeps over every (src-label,
  edge-label, dst-label) triple; i.e. connected components of the
  UNION of all labels' vertices and edges, component id = min global
  vertex id.
- `apps/property/sssp_property.h:29-200` — same structure for
  single-source shortest paths with per-edge `data()` as the weight
  (PEval relaxes from `source`, IncEval continues).

Spark-native translation: a labeled graph is a dict of vertex
DataFrames and a dict of typed edge DataFrames.  The union graph is
ONE edge DataFrame over globally-unique vids obtained with a
deterministic label-offset encoding

    gvid = oid * MAX_LABELS + label_index

(dense, SQL-expressible, so DuckDB oracles can reproduce it verbatim).
The algorithms then reuse the simple-graph kernels — label-blind
propagation is exactly what the reference's per-label sweep computes,
because it visits every label pair each round.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph

MAX_LABELS = 4


@dataclass(frozen=True)
class PropertyGraph:
    """Vertex labels → (oid, ...props); edge labels → (src_label,
    dst_label, src oid, dst oid [, weight])."""

    vertices: dict[str, DataFrame]  # label -> DataFrame(oid [, props])
    edges: dict[str, tuple[str, str, DataFrame]]  # elabel -> (slabel, dlabel, df)

    def label_index(self, label: str) -> int:
        return sorted(self.vertices).index(label)

    def union_graph(self, directed: bool = True, num_partitions: int = 32) -> Graph:
        """Union of all labels as one simple graph on gvids.

        gvid = oid * MAX_LABELS + label_index(label); vertices carry
        (vid, vlabel, oid) so results can be reported per label, the
        shape of the reference's `LabeledVertexDataContext` output
        (wcc_property.h:59-67 prints every label's inner vertices).
        """
        if len(self.vertices) > MAX_LABELS:
            raise ValueError(f"at most {MAX_LABELS} vertex labels supported")
        verts = None
        for label in sorted(self.vertices):
            li = self.label_index(label)
            v = self.vertices[label].select(
                (F.col("oid").cast("long") * MAX_LABELS + li).alias(VID),
                F.lit(label).alias("vlabel"),
                F.col("oid").cast("long").alias("oid"),
            )
            verts = v if verts is None else verts.unionByName(v)
        edges = None
        for _, (slabel, dlabel, e) in sorted(self.edges.items()):
            si, di = self.label_index(slabel), self.label_index(dlabel)
            cols = [
                (F.col(SRC).cast("long") * MAX_LABELS + si).alias(SRC),
                (F.col(DST).cast("long") * MAX_LABELS + di).alias(DST),
            ]
            if "weight" in e.columns:
                cols.append(F.col("weight").cast("double").alias("weight"))
            else:
                cols.append(F.lit(1.0).alias("weight"))
            e2 = e.select(*cols)
            edges = e2 if edges is None else edges.unionByName(e2)
        return Graph.from_edges(
            edges,
            vertices=verts,
            directed=directed,
            num_partitions=num_partitions,
            weight="weight",
        )


def wcc_property(pg: PropertyGraph, num_partitions: int = 32) -> DataFrame:
    """(vlabel string, oid long, comp long): component id = min gvid,
    per the reference's min-propagation (wcc_property.h:88-130)."""
    from graphscope_spark.algorithms.wcc import wcc

    g = pg.union_graph(directed=False, num_partitions=num_partitions)
    comp = wcc(g)
    return (
        g.vertices.join(comp, VID)
        .select("vlabel", "oid", F.col("comp").cast("long").alias("comp"))
    )


def sssp_property(
    pg: PropertyGraph, source_label: str, source_oid: int, num_partitions: int = 32
) -> DataFrame:
    """(vlabel string, oid long, dist double); unreachable vertices are
    dropped, matching the projected-SSSP output convention.  Relaxation
    over every edge label each round = sssp_property.h:110-131's loop
    over `e_label_num`."""
    from graphscope_spark.algorithms.sssp import sssp

    g = pg.union_graph(directed=False, num_partitions=num_partitions)
    gsource = source_oid * MAX_LABELS + pg.label_index(source_label)
    dist = sssp(g, source=gsource)
    return g.vertices.join(dist, VID).select("vlabel", "oid", "dist")


def tpch_property_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    """Three-label TPC-H property graph used by the driver queries:

    vertex labels: customer (oid=c_custkey), orders (oid=o_orderkey),
    part (oid=p_partkey); edge labels: placed (orders→customer via
    o_custkey) and contains (orders→part via lineitem, weight =
    min l_quantity per pair — deterministic and SQL-reproducible).
    """
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    placed = o.select(F.col("o_orderkey").alias(SRC), F.col("o_custkey").alias(DST))
    contains = (
        l.groupBy(
            F.col("l_orderkey").alias(SRC), F.col("l_partkey").alias(DST)
        ).agg(F.min("l_quantity").cast("double").alias("weight"))
    )
    return PropertyGraph(
        vertices={
            "customer": c.select(F.col("c_custkey").alias("oid")),
            "orders": o.select(F.col("o_orderkey").alias("oid")),
            "part": p.select(F.col("p_partkey").alias("oid")),
        },
        edges={
            "placed": ("orders", "customer", placed),
            "contains": ("orders", "part", contains),
        },
    )
