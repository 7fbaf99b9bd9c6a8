"""Subgraph-counting family — global pattern counts via orientation joins.

Reference: FLASH subgraph apps (.gs_conf.yaml:307-817):
  rectangle.h      — 4-cycles, counted once at the max-(deg,id) corner
                     opposite pair (rectangle.h:54-76)
  diamond.h        — per adjacent ranked pair (v,o): C(common(v,o), 2)
                     (diamond.h:59-80)
  3-path.h         — per undirected edge: (deg(s)-1)(deg(d)-1) - support
                     (3-path.h:59-69)
  tailed-triangle.h— per undirected edge: (deg(s)+deg(d)-4) * support
                     (tailed-triangle.h:59-69)
  densest-sub-2-approx.h — core decomposition, then density of the
                     max-core subgraph (ne counts BOTH directions of
                     each undirected edge, :88-92)
  acyclic/cyclic/in/out/cycle-plus-triangle.h — directed triangle
                     census (see directed_triangle_census)

Spark plan: everything reduces to degree tables, one wedge join
(edge ⋈ sym ⋈ sym on the shared third vertex = per-edge triangle
support, the same shape ktruss.py iterates), and a global agg.  The
(degree, vid) orientation bounds the oriented out-degree by O(sqrt(E)),
so the wedge joins never blow past the true wedge count — the standard
trick that keeps these plans safe on power-law graphs.  All counting
is JVM-side joins + aggregations; nothing leaves whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, SRC, VID, Graph


def _sym_deg(g: Graph) -> tuple[DataFrame, DataFrame]:
    """Symmetrized edges and undirected degrees (deduped, self-loop-free)."""
    sym = g.symmetrized().select(SRC, DST)
    deg = sym.groupBy(F.col(SRC).alias(VID)).agg(F.count(F.lit(1)).alias("d"))
    return sym, deg


def _rank_gt(da, a, db, b):
    """(deg, vid)-lexicographic rank(a) > rank(b) — FLASH's orientation
    predicate (rectangle.h:55-57 and siblings)."""
    return (da > db) | ((da == db) & (a > b))


def edge_support(g: Graph, eo: DataFrame | None = None) -> DataFrame:
    """(a, b, da, db, sup): canonical a<b undirected edges with endpoint
    degrees and triangle support |N(a) ∩ N(b)| (0 kept).

    Support comes from DEGREE-ORIENTED triangle enumeration
    (oriented.triangles_once, same trick as ktruss.py /
    apps/clustering/triangles.h:78-91): each triangle found ONCE, then
    exploded to its 3 canonical edges.  An unoriented wedge join probes
    Σ deg² pairs (hub-quadratic); the oriented form is the standard
    |E|^1.5 bound that survives power-law hubs.  Pass a cached ``eo``
    (oriented.oriented_edges) to share the orientation across queries."""
    from graphscope_spark.algorithms.oriented import triangles_once

    sym, deg = _sym_deg(g)
    und = (
        sym.where(F.col(SRC) < F.col(DST))
        .select(F.col(SRC).alias("a"), F.col(DST).alias("b"))
        .join(deg.select(F.col(VID).alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col(VID).alias("b"), F.col("d").alias("db")), "b")
    )
    tri = triangles_once(g, eo)
    pairs = tri.select(
        F.explode(
            F.array(
                F.struct(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")),
                F.struct(F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b")),
                F.struct(F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    sup = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("sup"))
    return und.join(sup, ["a", "b"], "left").select(
        "a", "b", "da", "db", F.coalesce("sup", F.lit(0)).alias("sup")
    )


def rectangle_count(g: Graph) -> DataFrame:
    """One row (rectangles long): number of 4-cycles.

    FLASH counts wedges v—m—o with rank(o) > rank(m) and
    rank(o) > rank(v), grouped by the opposite pair (v, o); each
    4-cycle contributes C(w,2) exactly once at its max-rank corner
    (rectangle.h:63-76)."""
    sym, deg = _sym_deg(g)
    e_vm = (
        sym.select(F.col(SRC).alias("v"), F.col(DST).alias("m"))
        .join(deg.select(F.col(VID).alias("v"), F.col("d").alias("dv")), "v")
    )
    hi = (
        sym.select(F.col(SRC).alias("m"), F.col(DST).alias("o"))
        .join(deg.select(F.col(VID).alias("m"), F.col("d").alias("dm")), "m")
        .join(deg.select(F.col(VID).alias("o"), F.col("d").alias("do")), "o")
        .where(_rank_gt(F.col("do"), F.col("o"), F.col("dm"), F.col("m")))
        .select("m", "o", "do")
    )
    wedges = e_vm.join(hi, "m").where(
        _rank_gt(F.col("do"), F.col("o"), F.col("dv"), F.col("v"))
    )
    pairs = wedges.groupBy("v", "o").agg(F.count(F.lit(1)).alias("w"))
    return pairs.agg(
        F.coalesce(F.sum(F.col("w") * (F.col("w") - 1) / 2), F.lit(0))
        .cast("long")
        .alias("rectangles")
    )


def diamond_count(g: Graph) -> DataFrame:
    """One row (diamonds long): Σ over undirected edges of C(support, 2)
    — each diamond counted once at its chord (diamond.h:59-80; the
    ranked-pair iteration there visits each undirected edge once, and
    the common-neighbor count is orientation-independent)."""
    return edge_support(g).agg(
        F.coalesce(F.sum(F.col("sup") * (F.col("sup") - 1) / 2), F.lit(0))
        .cast("long")
        .alias("diamonds")
    )


def three_path_count(g: Graph) -> DataFrame:
    """One row (paths3 long): simple 3-edge paths, counted at the middle
    edge as (deg(a)-1)(deg(b)-1) - support (3-path.h:59-69)."""
    return edge_support(g).agg(
        F.coalesce(
            F.sum((F.col("da") - 1) * (F.col("db") - 1) - F.col("sup")), F.lit(0)
        )
        .cast("long")
        .alias("paths3")
    )


def tailed_triangle_count(g: Graph) -> DataFrame:
    """One row (tailed long): triangles with a pendant edge, counted at
    each triangle edge as (deg(a)+deg(b)-4)·support
    (tailed-triangle.h:59-69)."""
    return edge_support(g).agg(
        F.coalesce(
            F.sum((F.col("da") + F.col("db") - 4) * F.col("sup")), F.lit(0)
        )
        .cast("long")
        .alias("tailed")
    )


def densest_subgraph_2approx(g: Graph) -> DataFrame:
    """One row (nv long, ne long, density double): the max-core subgraph
    — Charikar's peeling 2-approximation of the densest subgraph.

    Matches densest-sub-2-approx.h:49-92: core numbers via the
    h-index fixpoint, cmax = max core, subgraph = vertices with
    core == cmax; ne counts each undirected edge from BOTH endpoints
    (:85-89), density = ne / nv."""
    from graphscope_spark.algorithms.corenum import core_number

    core = core_number(g)
    cmax = core.agg(F.max("core").alias("cmax"))
    top = (
        core.join(F.broadcast(cmax), core["core"] == cmax["cmax"], "semi")
        .select(VID)
    )
    sym, _ = _sym_deg(g)
    ne_df = (
        sym.join(top.select(F.col(VID).alias(SRC)), SRC, "semi")
        .join(top.select(F.col(VID).alias(DST)), DST, "semi")
        .agg(F.count(F.lit(1)).alias("ne"))
    )
    nv_df = top.agg(F.count(F.lit(1)).alias("nv"))
    return (
        nv_df.crossJoin(F.broadcast(ne_df))
        .select(
            F.col("nv").cast("long"),
            F.col("ne").cast("long"),
            (F.col("ne") / F.col("nv")).alias("density"),
        )
    )


def subgraph_census(g: Graph, eo: DataFrame | None = None) -> DataFrame:
    """(kind string, cnt long), 4 rows — rectangles/diamonds/paths3/
    tailed in one pass: diamonds, 3-paths and tailed triangles all read
    the same per-edge support table, so it is computed once."""
    es = edge_support(g, eo).cache()

    def _row(col, kind):
        return es.agg(
            F.coalesce(F.sum(col), F.lit(0)).cast("long").alias("cnt")
        ).select(F.lit(kind).alias("kind"), "cnt")

    out = (
        rectangle_count(g)
        .select(F.lit("rectangles").alias("kind"), F.col("rectangles").alias("cnt"))
        .unionByName(_row(F.col("sup") * (F.col("sup") - 1) / 2, "diamonds"))
        .unionByName(
            _row((F.col("da") - 1) * (F.col("db") - 1) - F.col("sup"), "paths3")
        )
        .unionByName(_row((F.col("da") + F.col("db") - 4) * F.col("sup"), "tailed"))
    )
    return out


def directed_triangle_census(g: Graph, eo: DataFrame | None = None) -> DataFrame:
    """(kind string, cnt long), 5 rows: the FLASH directed-triangle
    census over the distinct self-loop-free directed edge set E, with
    R = reciprocal pairs (u→v and v→u):

      acyclic    — triples s→d, s→x, d→x (acyclic-triangle.h:57-66)
      cyclic     — 3-cycles s→d→x→s, each directed 3-cycle once
                   (cyclic-triangle.h:60-73)
      in         — per unordered reciprocal pair {s,d}: common
                   out-neighbors x (s→x, d→x) (in-triangle.h:63-71)
      out        — per unordered reciprocal pair {s,d}: common
                   in-neighbors x (x→s, x→d) (out-triangle.h:59-70)
      cycle_plus — per ORDERED reciprocal pair (s,d): x with d→x and
                   x→s (cycle-plus-triangle.h:59-72)

    Plan (round 3 rewrite): every contribution to all five counts lives
    inside an undirected triangle, so enumerate each triangle ONCE via
    the degree-oriented |E|^1.5 probe (oriented.triangles_once), join
    the three edges' direction flags, and evaluate each count as a
    closed-form polynomial of the six flag bits — replacing the old
    Σ outdeg(s)² unoriented fan-out joins (hub-quadratic, the round-2
    sweep's most expensive plan) with one bounded enumeration."""
    from graphscope_spark.algorithms.oriented import oriented_edges

    e = g.distinct_edges().select(SRC, DST)
    # direction flags per unordered pair p<q: fpq = [p→q ∈ E], fqp = [q→p ∈ E]
    flags = e.groupBy(
        F.least(SRC, DST).alias("p"), F.greatest(SRC, DST).alias("q")
    ).agg(
        F.max(F.when(F.col(SRC) < F.col(DST), 1).otherwise(0)).alias("fpq"),
        F.max(F.when(F.col(SRC) > F.col(DST), 1).otherwise(0)).alias("fqp"),
    )
    # attach flags to the oriented edges BEFORE enumeration (one |E|-size
    # join) so the wedge join carries them for free and only the closing
    # edge needs a lookup — instead of 3 joins on the (larger) triangle set
    if eo is None:
        eo = oriented_edges(g)
    eof = (
        eo.join(
            flags,
            (F.least("x", "y") == F.col("p")) & (F.greatest("x", "y") == F.col("q")),
        )
        .select(
            "x",
            "y",
            "ky",
            F.when(F.col("x") < F.col("y"), F.col("fpq")).otherwise(F.col("fqp")).alias("fxy"),
            F.when(F.col("x") < F.col("y"), F.col("fqp")).otherwise(F.col("fpq")).alias("fyx"),
        )
        .localCheckpoint(eager=False)
    )
    e1, e2 = eof.alias("e1"), eof.alias("e2")
    t = (
        e1.join(e2, F.col("e1.x") == F.col("e2.x"))
        .where(F.col("e1.ky") < F.col("e2.ky"))
        .select(
            F.col("e1.x").alias("u"),
            F.col("e1.y").alias("v"),
            F.col("e2.y").alias("w"),
            F.col("e1.fxy").alias("f_uv"),
            F.col("e1.fyx").alias("f_vu"),
            F.col("e2.fxy").alias("f_uw"),
            F.col("e2.fyx").alias("f_wu"),
        )
        .join(
            eof.select(
                F.col("x").alias("v"),
                F.col("y").alias("w"),
                F.col("fxy").alias("f_vw"),
                F.col("fyx").alias("f_wv"),
            ),
            ["v", "w"],
        )
    )
    uv, vu = F.col("f_uv"), F.col("f_vu")
    uw, wu = F.col("f_uw"), F.col("f_wu")
    vw, wv = F.col("f_vw"), F.col("f_wv")

    # per-triangle contributions, derived by expanding each census
    # definition over the 3 vertices (6 ordered / 3 unordered roles):
    acyclic = uv * uw * (vw + wv) + vu * vw * (uw + wu) + wu * wv * (uv + vu)
    cyclic = uv * vw * wu + uw * wv * vu
    in_t = uv * vu * uw * vw + uw * wu * uv * wv + vw * wv * vu * wu
    out_t = uv * vu * wu * wv + uw * wu * vu * vw + vw * wv * uv * uw
    cycle_plus = (
        uv * vu * (vw * wu + uw * wv)
        + uw * wu * (wv * vu + uv * vw)
        + vw * wv * (wu * uv + vu * uw)
    )

    def _tot(expr, name):
        return F.coalesce(F.sum(expr), F.lit(0)).cast("long").alias(name)

    sums = t.agg(
        _tot(acyclic, "acyclic_c"),
        _tot(cyclic, "cyclic_c"),
        _tot(in_t, "in_c"),
        _tot(out_t, "out_c"),
        _tot(cycle_plus, "cycle_plus_c"),
    )
    return sums.select(
        F.expr(
            "stack(5, 'acyclic', acyclic_c, 'cyclic', cyclic_c, 'in', in_c, "
            "'out', out_c, 'cycle_plus', cycle_plus_c) as (kind, cnt)"
        )
    )
