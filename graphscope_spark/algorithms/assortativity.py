"""Assortativity / mixing statistics.

Reference: `degree_assortativity_coefficient` and
`average_degree_connectivity` (.gs_conf.yaml:234-269,
apps/assortativity/*) — NetworkX semantics, computed here on the
undirected (symmetrized, deduplicated, self-loop-free) graph:

- degree assortativity = Pearson correlation of (deg(u), deg(v)) over
  all ORDERED edge endpoints (each undirected edge contributes both
  (u,v) and (v,u), making the correlation symmetric).
- average degree connectivity: knn(k) = mean over vertices of degree k
  of the average neighbor degree.

Both are single-pass: one join to attach degrees to edge endpoints,
then built-in covariance/average aggregates — no iteration, fully
Catalyst-planned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph


def _edge_degrees(g: Graph) -> DataFrame:
    """(src, dst, deg_src, deg_dst) over the symmetrized edge set."""
    sym = g.symmetrized()
    deg = g.degrees()
    return (
        sym.join(deg.select(F.col(VID).alias(SRC), F.col("deg").alias("deg_src")), SRC)
        .join(deg.select(F.col(VID).alias(DST), F.col("deg").alias("deg_dst")), DST)
        .select(SRC, DST, "deg_src", "deg_dst")
    )


def degree_assortativity(g: Graph) -> DataFrame:
    """Returns a single row (assortativity double) — Pearson r of
    endpoint degrees over ordered symmetrized edges."""
    ed = _edge_degrees(g)
    return ed.agg(
        F.coalesce(
            F.corr(F.col("deg_src").cast("double"), F.col("deg_dst").cast("double")),
            F.lit(0.0),
        ).alias("assortativity")
    )


def attribute_assortativity(g: Graph, attrs: DataFrame) -> DataFrame:
    """NX ``attribute_assortativity_coefficient`` for a categorical
    vertex attribute: r = (tr(e) − Σ(e²)) / (1 − Σ(e²)) over the edge
    mixing matrix e (fractions of ordered symmetrized edge endpoints by
    attribute pair).  Σ(e²) reduces to Σ_k rowsum_k·colsum_k — three
    aggregates, no matrix materialized.

    ``attrs``: (vid, attr) DataFrame.  Reference:
    apps/assortativity/attribute_assortativity.h (.gs_conf.yaml:242-249).
    """
    sym = g.symmetrized()
    pairs = (
        sym.join(attrs.select(F.col(VID).alias(SRC), F.col("attr").alias("a_src")), SRC)
        .join(attrs.select(F.col(VID).alias(DST), F.col("attr").alias("a_dst")), DST)
        .select("a_src", "a_dst")
    ).cache()
    m = pairs.count()
    if m == 0:
        pairs.unpersist()
        spark = g.edges.sparkSession
        return spark.createDataFrame([(0.0,)], "attr_assortativity double")
    tr = (
        pairs.where(F.col("a_src") == F.col("a_dst")).count() / m
    )
    rows = pairs.groupBy(F.col("a_src").alias("k")).agg(
        (F.count(F.lit(1)) / m).alias("rowsum")
    )
    cols = pairs.groupBy(F.col("a_dst").alias("k")).agg(
        (F.count(F.lit(1)) / m).alias("colsum")
    )
    sumsq = (
        rows.join(cols, "k")
        .agg(F.sum(F.col("rowsum") * F.col("colsum")).alias("s"))
        .collect()[0]["s"]
        or 0.0
    )
    pairs.unpersist()
    # sumsq == 1 (single attribute category) is 0/0: nan in nx AND in
    # the reference's C++ IEEE division — not a defined 1.0
    r = (tr - sumsq) / (1.0 - sumsq) if sumsq < 1.0 else float("nan")
    spark = g.edges.sparkSession
    return spark.createDataFrame([(float(r),)], "attr_assortativity double")


def numeric_assortativity(g: Graph, attrs: DataFrame) -> DataFrame:
    """NX ``numeric_assortativity_coefficient``: Pearson r of a NUMERIC
    vertex attribute at the endpoints of ordered symmetrized edges.

    Reference: apps/assortativity/attribute_assortativity.h:76-81 with
    ctx.numeric=true builds the value mixing matrix and evaluates
    utils.h ProcessMatrix — algebraically the same Pearson correlation
    (Σ x·y weighting via the normalized matrix / marginal variances),
    so one `corr` aggregate replaces the whole matrix.

    ``attrs``: (vid, attr numeric) DataFrame; returns a single row
    (numeric_assortativity double).
    """
    sym = g.symmetrized()
    pairs = (
        sym.join(attrs.select(F.col(VID).alias(SRC), F.col("attr").alias("a_src")), SRC)
        .join(attrs.select(F.col(VID).alias(DST), F.col("attr").alias("a_dst")), DST)
    )
    return pairs.agg(
        F.coalesce(
            F.corr(F.col("a_src").cast("double"), F.col("a_dst").cast("double")),
            F.lit(0.0),
        ).alias("numeric_assortativity")
    )


def average_degree_connectivity(g: Graph) -> DataFrame:
    """Returns (degree long, knn double): for each degree value, the
    mean over vertices of that degree of their average neighbor degree."""
    ed = _edge_degrees(g)
    per_vertex = ed.groupBy(F.col(SRC).alias(VID)).agg(
        F.first("deg_src").alias("degree"),
        F.avg(F.col("deg_dst").cast("double")).alias("avg_nbr_deg"),
    )
    return (
        per_vertex.groupBy("degree")
        .agg(F.avg("avg_nbr_deg").alias("knn"))
        .select(F.col("degree").cast("long").alias("degree"), "knn")
    )
