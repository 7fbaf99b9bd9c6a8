"""Link-prediction scores: common neighbors, Jaccard, Adamic-Adar,
preferential attachment.

Reference analog: the NetworkX-parity algorithm facade
(python/graphscope/nx/algorithms/builtin.py) exposes NX link-prediction
semantics over projected simple graphs; the underlying computation is
the same wedge enumeration as the clustering family
(apps/clustering/clustering.h).

Spark plan — pure relational, no iteration:
  wedges:  sym ⋈ sym on the shared middle vertex  →  candidate (a, b)
  scores:  one groupBy(a, b) computing
              cn  = count(middle)
              aa  = Σ 1/log(deg(middle))
           then a broadcast-joined degree lookup for jaccard / pa.
The wedge join is the heavy op; it shuffles on the middle vertex (the
same key distribution as triangle counting) and AQE's skew-join
splitting covers hub middles.  Candidates are restricted to
NON-adjacent pairs (an anti-join) and optionally to a sampled a-side —
the 100TB-scale form, since all-pairs output is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph


def link_prediction(
    g: Graph,
    a_filter: F.Column | None = None,
) -> DataFrame:
    """Returns (a long, b long, cn long, jaccard double, adamic_adar
    double, pref_attach long) for every non-adjacent pair a < b with at
    least one common neighbor (optionally restricted by ``a_filter`` on
    the a-side vertex id — pass e.g. ``F.col("a") % 10 == 0`` to sample).
    """
    sym = g.symmetrized().select(SRC, DST).cache()
    deg = sym.groupBy(F.col(SRC).alias(VID)).agg(F.count(F.lit(1)).alias("deg"))

    # wedges through middle m: (a=m.nbr1, b=m.nbr2), a < b
    left = sym.select(F.col(SRC).alias("m"), F.col(DST).alias("a"))
    right = sym.select(F.col(SRC).alias("m"), F.col(DST).alias("b"))
    wedges = left.join(right, "m").where(F.col("a") < F.col("b"))
    if a_filter is not None:
        wedges = wedges.where(a_filter)
    wedges = wedges.join(
        deg.select(F.col(VID).alias("m"), F.col("deg").alias("mdeg")), "m"
    )
    scored = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum(1.0 / F.log("mdeg")).alias("adamic_adar"),
    )
    # drop already-adjacent pairs (canonical a < b orientation)
    adj = sym.where(F.col(SRC) < F.col(DST)).select(
        F.col(SRC).alias("a"), F.col(DST).alias("b")
    )
    cand = scored.join(adj, ["a", "b"], "anti")
    out = (
        cand.join(deg.select(F.col(VID).alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col(VID).alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a",
            "b",
            "cn",
            (F.col("cn") / (F.col("da") + F.col("db") - F.col("cn"))).alias("jaccard"),
            "adamic_adar",
            (F.col("da") * F.col("db")).cast("long").alias("pref_attach"),
        )
    )
    return out


def cocitation(
    g: Graph,
    max_citing_outdeg: int = 64,
    top_k: int = 100,
) -> DataFrame:
    """(a, b, common) — top-k page pairs by CO-CITATION count: the
    number of distinct pages citing both (Small 1973, the classic
    link-graph relatedness signal; reference analog: the NX-facade
    wedge family, same enumeration as clustering.h).

    Scale guard: a citing page with outdegree o contributes o² pairs,
    so pages above ``max_citing_outdeg`` are excluded from the middle —
    the standard frequency cap (a directory page citing 10⁵ urls says
    nothing about relatedness anyway; same reasoning as dropping
    boilerplate shingles).  The join shuffles on the citing page; the
    final top-k is a distributed TakeOrderedAndProject, never a global
    sort."""
    e = g.distinct_edges().select(SRC, DST)
    odeg = e.groupBy(SRC).agg(F.count(F.lit(1)).alias("od"))
    bounded = e.join(odeg.where(F.col("od") <= max_citing_outdeg), SRC)
    l = bounded.select(F.col(SRC).alias("m"), F.col(DST).alias("a"))
    r = bounded.select(F.col(SRC).alias("m"), F.col(DST).alias("b"))
    pairs = (
        l.join(r, "m")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return pairs.orderBy(F.desc("common"), F.asc("a"), F.asc("b")).limit(top_k)


def bib_coupling(
    g: Graph,
    max_cited_indeg: int = 64,
    top_k: int = 100,
) -> DataFrame:
    """(a, b, common) — top-k page pairs by BIBLIOGRAPHIC COUPLING:
    the number of distinct pages both cite (Kessler 1963).  Mirror of
    :func:`cocitation` with the indegree cap on the shared CITED page
    (a page cited by everyone — a home page — carries no signal and
    contributes indeg² pairs)."""
    e = g.distinct_edges().select(SRC, DST)
    ideg = e.groupBy(DST).agg(F.count(F.lit(1)).alias("id_"))
    bounded = e.join(ideg.where(F.col("id_") <= max_cited_indeg), DST)
    l = bounded.select(F.col(DST).alias("m"), F.col(SRC).alias("a"))
    r = bounded.select(F.col(DST).alias("m"), F.col(SRC).alias("b"))
    pairs = (
        l.join(r, "m")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return pairs.orderBy(F.desc("common"), F.asc("a"), F.asc("b")).limit(top_k)
