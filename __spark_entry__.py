"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 over
the driver's testdata tables; ``oracle_sql()`` provides DuckDB-runnable
ANSI SQL computing the SAME result.  Parity strategy:

- Graph inputs are derived from TPC-H tables by identical relational
  definitions on both sides (customer→supplier order graph, part
  co-purchase graph) — see graphscope_spark/sources/tpch_graph.py.
- Iterative algorithms are verified either at full convergence with an
  unrolled-CTE oracle run past the empirical quiesce depth (WCC ≤4
  rounds at sf0.01, BFS ecc ≤3, SSSP ≤5, k-core ≤3 — probed on the
  actual data, unrolled with ≥2 rounds of margin), or as fixed-round
  variants (PageRank/CDLP/HITS, matching the reference's fixed-round
  LDBC forms).
- Every hash-based op (fingerprint/MinHash/SimHash) is built from
  md5() hex strings, which Spark and DuckDB compute identically.
- Float columns are rounded on both sides (8 decimals for rank-scale
  values, 6 for cosines) so summation-order noise (~1e-15) cannot flip
  the driver's value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALPHA = 0.85
PR_ROUNDS = 5
CDLP_ROUNDS = 5
LPAU2I_ROUNDS = 5      # lpa_u2i round budget: stages u2i@2, i2u@3, u2i@4, i2u@5
HITS_ROUNDS = 5
WCC_UNROLL = 8
BFS_UNROLL = 6
SSSP_UNROLL = 8
PWCC_UNROLL = 11       # property union graph min-propagation (probed 8 @ sf0.01)
PSSSP_UNROLL = 26      # property union graph Bellman-Ford (probed 22 @ sf0.01)
BETW_UNROLL = 5        # Brandes BFS depth from supplier roots (probed 3 @ sf0.01)
LOUVAIN_ROUNDS = 5     # louvain: fixed unroll == the query's max_rounds
LOUVAIN_PHASES = 2     # and max_phases (extra quiesced rounds are no-ops)
KCORE_K = 30
KCORE_UNROLL = 6
KNN_K = 3
KNN_QUERIES = 10
LSH_PLANES = 4
EMB_BANDS = 4            # multi-band sign-LSH for embedding near-dup:
EMB_PLANES_PER_BAND = 4  # 4 bands x 4 sign planes over dims 1..16
IVF_STRIDE = 37        # seed centroid every 37th vec_id (~n/37 cells)
IVF_NPROBE = 2
EV_ROUNDS = 5
KATZ_ROUNDS = 5
KATZ_ALPHA = 0.1
CLOSE_UNROLL = 6
CORE_UNROLL = 10
KSHELL_K = 3
AVGLEN_UNROLL = 10
VOTERANK_SEEDS = 5
MSBFS_UNROLL = 6       # multi-source BFS quiesce depth (probed, margin incl.)
MIS_UNROLL = 9         # Luby-by-id quiesces in 6 rounds at sf0.01 (probed)
PPR_ROUNDS = 5
NEARDUP_T = 0.6        # n-gram Jaccard near-dup verification threshold
NEARDUP_CC_UNROLL = 6  # component depth over the tiny verified-pair graph
EMB_NEARDUP_T = 0.4    # synthetic embeddings are near-orthogonal (max
                       # bucketed cosine 0.513 at sf0.01); real corpora ~0.9
KHOP_FANOUTS = (3, 2)  # GNN sampler: per-layer neighbor fanouts
KHOP_SEED_MOD = 100    # seeds: customer vids % 100 == 0
KMEANS_ITERS = 2       # Lloyd rounds for the trained-quantizer query
EMB_DIM = 64           # embeddings table vector width (TESTDATA.md)
LM_K = 0.5             # add-k smoothing for the bigram LM filter
SALSA_ROUNDS = 4       # salsa: fixed alternations (no normalization agg)
COCIT_CAP = 64         # co-citation/coupling frequency cap on the shared page
COCIT_K = 100          # top-k relatedness pairs returned
SEMDEDUP_TAU = 0.35    # SemDeDup cosine ball (synthetic vecs near-orthogonal;
                       # real embedding corpora use ~0.9 — same plan shape)
SEMDEDUP_CAP = 35      # skew-guard cluster cap: 7/14 sf0.01 cells exceed it,
SEMDEDUP_BANDS = 4     # so the capped query exercises BOTH the exact-small
SEMDEDUP_PLANES = 4    # and the 4x4 sign-banded big-cluster paths
CMS_D, CMS_W = 4, 1024  # count-min sketch depth x width
CMS_THRESHOLD = 500    # heavy-hitter token estimate cutoff
BLOOM_K, BLOOM_M = 3, 8192  # Bloom decontamination bits
LINKPRED_MOD = 100     # sample: a-side vertices with vid % 100 == 0
BOUNDARY_MOD = 20      # S = parts with vid % 20 == 0
DLG_MOD = 7            # linenumber-graph thinning modulus (tpch_graph.py)
KTRUSS_K = 12          # quiesces in 5 rounds at sf0.01 (probed)
KTRUSS_UNROLL = 7
BIC_MOD = 7            # thinned order graph for biconnectivity/matching
BIC_ENC = 10000000     # (count, vid) lexicographic keys: count*ENC + vid
BIC_WCC_UNROLL = 6     # probed quiesce 4 at sf0.01 (+margin)
BIC_BFS_UNROLL = 6     # probed max depth 4
BIC_ANC_UNROLL = 6     # ancestor closure hops = max depth
BIC_CLS_UNROLL = 7     # contraction-class label prop, probed 4
MM_UNROLL = 9          # handshake matching, probed 7 rounds
COVER_UNROLL = 3       # greedy cover, probed 1 round
DOMSET_UNROLL = 14     # 2-hop greedy dominating set, probed 11
AR_ROUNDS = 5          # ArticleRank fixed rounds (FLASH articlerank.h)
DGO_UNROLL = 7         # degeneracy-ordering peel, probed 4 rounds at sf0.01
ONION_UNROLL = 6       # onion-layer peel, probed 3 rounds at sf0.01
COLOR_MOD = 7          # thinned co-purchase graph for greedy coloring
COLOR_UNROLL = 17      # coloring fixpoint probed 14 rounds at sf0.01
LPAC_COLORS = 10       # lpa_by_color classes: probed 9 at sf0.01 (+1 no-op margin)
LPAC_SWEEPS = 6        # lpa_by_color sweeps: probed fixpoint at 5 (+margin)
MEC_UNROLL = 5         # min-edge-cover handshake, probed 3 rounds
KC_K = 3               # k-center count
KC_UNROLL = 6          # per-center BFS relax depth, probed 3
FLUID_ROUNDS = 6       # fluid communities fixed synchronous rounds
FLUID_S = 10           # fluid seed count (s smallest vertex ids)
ENC = 10000000         # (value, vid) lexicographic key: value*ENC + vid
SPATH_LEN = 3          # sampling_path walk length (edges)
SPATH_LIMIT = 1000     # deterministic lexicographic path cap
ASP_CUTOFF = 4         # all_simple_paths max hops
HASPATH_UNROLL = 15    # directed dlg reachability, probed quiesce 12
RWALK_LEN = 6          # random_walks steps per walker
RWALK_MOD = 41         # walker start set: src % RWALK_MOD == 0
RWALK_SEED = 7         # LCG seed shared by Spark and the SQL oracle
RMB_K = 8              # random-multi-bfs root count (md5-ordered sample)
RMB_UNROLL = 7         # md5-root BFS quiesce, probed 5 at sf0.01
SPLIT_SEED = 11        # corpus_split md5 bucket seed
RESAMPLE_SEED = 13     # quality_resample md5 bucket seed
CONTAM_MOD = 23        # benchmark set for contamination: doc_id % 23 == 0
MIX_SEED = 29          # domain_mix md5 bucket seed
MIX_ALPHA = 0.7        # domain_mix temperature (count^alpha target share)
PART_P = 8             # partition_report modulo partition count
NEG_K = 5              # negative_sample negatives per seed
NEG_TRIALS = 32        # negative_sample rejection tape length
NEG_SEED_MOD = 37      # seeds: customer vids % 37 == 0
PACK_BUDGET = 256      # pack_sequences tokens per bin
PACK_SHARDS = 8        # pack_sequences deterministic shard count

# ---------------------------------------------------------------------
# shared SQL building blocks (DuckDB dialect; tables pre-registered)
# ---------------------------------------------------------------------

SQL_EDGES = """
  select distinct o_custkey as src, 1000000 + l_suppkey as dst
  from orders join lineitem on o_orderkey = l_orderkey
"""
SQL_WEDGES = """
  select o_custkey as src, 1000000 + l_suppkey as dst,
         cast(count(*) as double) as w
  from orders join lineitem on o_orderkey = l_orderkey
  group by 1, 2
"""
SQL_VERTS = "select src as vid from edges union select dst from edges"
SQL_SYM = "select src, dst from edges union select dst, src from edges"

SQL_CP_EDGES = """
  select distinct a.l_partkey as src, b.l_partkey as dst
  from lineitem a join lineitem b
    on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey
"""

SQL_SHINGLES = r"""
  toks as (select doc_id, regexp_split_to_array(trim(text), '\s+') as t
           from documents),
  sh as (
    select distinct doc_id, array_to_string(t[i:i+2], ' ') as shingle
    from toks, unnest(generate_series(1, len(t)-2)) as g(i)
    where len(t) >= 3
    union
    select doc_id, array_to_string(t, ' ') from toks where len(t) < 3
  )
"""


def _pagerank_sql() -> str:
    """Unrolled NetworkX-style PageRank (dangling pool), PR_ROUNDS rounds."""
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        "nn as materialized (select cast(count(*) as double) as n from verts)",
        "deg as materialized (select src as vid, cast(count(*) as double) as od from edges group by 1)",
        "dangv as materialized (select v.vid from verts v left join deg d using(vid) where d.od is null)",
        "r0 as materialized (select vid, (select 1.0/n from nn) as pr from verts)",
    ]
    for k in range(PR_ROUNDS):
        parts.append(
            f"d{k} as materialized (select coalesce(sum(pr), 0.0) as s from r{k} "
            f"where vid in (select vid from dangv))"
        )
        parts.append(
            f"""r{k + 1} as materialized (
              select v.vid,
                     (1.0 - {ALPHA})/(select n from nn)
                     + {ALPHA} * (select s from d{k})/(select n from nn)
                     + {ALPHA} * coalesce(c.s, 0.0) as pr
              from verts v left join (
                select e.dst as vid, sum(r.pr / dg.od) as s
                from edges e
                join r{k} r on e.src = r.vid
                join deg dg on dg.vid = e.src
                group by 1
              ) c using(vid)
            )"""
        )
    parts_sql = ",\n".join(parts)
    return f"{parts_sql}\nselect vid, round(pr, 8) as pr from r{PR_ROUNDS}"


def _wcc_sql() -> str:
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        f"sym as materialized ({SQL_SYM})",
        "c0 as materialized (select vid, vid as comp from verts)",
    ]
    for k in range(WCC_UNROLL):
        parts.append(
            f"""c{k + 1} as materialized (
              select c.vid, least(c.comp, coalesce(m.mc, c.comp)) as comp
              from c{k} c left join (
                select s.dst as vid, min(c2.comp) as mc
                from sym s join c{k} c2 on s.src = c2.vid
                group by 1
              ) m using(vid)
            )"""
        )
    return ",\n".join(parts) + f"\nselect vid, comp from c{WCC_UNROLL}"


def _cdlp_sql() -> str:
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        f"sym as materialized ({SQL_SYM})",
        "l0 as materialized (select vid, vid as label from verts)",
    ]
    for k in range(CDLP_ROUNDS):
        parts.append(
            f"""l{k + 1} as materialized (
              select l.vid, coalesce(p.label, l.label) as label
              from l{k} l left join (
                select vid, label from (
                  select s.dst as vid, r.label, count(*) as c
                  from sym s join l{k} r on s.src = r.vid
                  group by 1, 2
                ) qualify row_number() over (
                  partition by vid order by c desc, label asc) = 1
              ) p using(vid)
            )"""
        )
    return ",\n".join(parts) + f"\nselect vid, label from l{CDLP_ROUNDS}"


def _lpa_u2i_sql() -> str:
    """Unrolled LPA-U2I (apps/lpa/lpa_u2i.h): alternating u2i / i2u
    stages for steps 2..LPAU2I_ROUNDS over the customer→part quantity
    graph; clamp-on-{0,1} + degree-normalised update per property."""
    parts = [
        """with e as materialized (
          select o_custkey as src, 1000000 + l_partkey as dst,
                 sum(l_quantity) as w
          from orders join lineitem on o_orderkey = l_orderkey
          group by 1, 2
        )""",
        """u1 as materialized (
          select c_custkey as vid,
                 case when c_custkey % 4 = 0 then 0.0
                      when c_custkey % 4 = 1 then 1.0
                      else (c_custkey % 7) / 10.0 + 0.2 end as p0,
                 case when c_custkey % 3 = 0 then 1.0
                      else (c_custkey % 9) / 20.0 + 0.3 end as p1
          from customer
        )""",
        "ideg as materialized (select dst, cast(count(*) as double) as id_ from e group by 1)",
        """stat as materialized (
          select u.vid, coalesce(o.od, 0.0) as od, coalesce(o.onids, 0.0) as onids
          from u1 u left join (
            select e.src as vid, cast(count(*) as double) as od,
                   sum(i.id_) as onids
            from e join ideg i using(dst)
            group by 1
          ) o using(vid)
        )""",
    ]
    prev_u = "u1"
    for step in range(2, LPAU2I_ROUNDS + 1):
        if step % 2 == 0:
            parts.append(
                f"""i{step} as materialized (
                  select e.dst as vid, sum(e.w * u.p0) as p0, sum(e.w * u.p1) as p1
                  from e join {prev_u} u on e.src = u.vid
                  group by 1
                )"""
            )
            prev_i = f"i{step}"
        else:
            branches = []
            for c in ("p0", "p1"):
                branches.append(
                    f"""case when u.{c} = 0.0 or u.{c} = 1.0 then u.{c}
                             when s.onids != s.od
                               then (coalesce(t.t_{c}, 0.0) - s.od * u.{c})
                                    / (s.onids - s.od)
                             else u.{c} end as {c}"""
                )
            parts.append(
                f"""u{step} as materialized (
                  select s.vid, {', '.join(branches)}
                  from stat s join {prev_u} u using(vid)
                  left join (
                    select e.src as vid, sum(e.w * i.p0) as t_p0,
                           sum(e.w * i.p1) as t_p1
                    from e join {prev_i} i on e.dst = i.vid
                    group by 1
                  ) t using(vid)
                )"""
            )
            prev_u = f"u{step}"
    return (
        ",\n".join(parts)
        + f"\nselect vid, round(p0, 4) as p0, round(p1, 4) as p1 from {prev_u}"
    )


def _triangles_sql() -> str:
    return f"""
      with cpe as materialized ({SQL_CP_EDGES}),
      verts as materialized (select src as vid from cpe union select dst from cpe),
      sym as materialized (select src, dst from cpe union select dst, src from cpe),
      deg as materialized (select src as vid, count(*) as d from sym group by 1),
      eor as materialized (
        select e.src as a, e.dst as b, dd.d as db
        from cpe e
        join deg ds on ds.vid = e.src
        join deg dd on dd.vid = e.dst
        where (ds.d < dd.d) or (ds.d = dd.d and e.src < e.dst)
        union all
        select e.dst as a, e.src as b, ds.d as db
        from cpe e
        join deg ds on ds.vid = e.src
        join deg dd on dd.vid = e.dst
        where (dd.d < ds.d) or (dd.d = ds.d and e.dst < e.src)
      ),
      tri as materialized (
        select e1.a as u, e1.b as v, e2.b as w
        from eor e1
        join eor e2 on e1.a = e2.a
          and ((e1.db < e2.db) or (e1.db = e2.db and e1.b < e2.b))
        join eor e3 on e3.a = e1.b and e3.b = e2.b
      ),
      corners as materialized (
        select u as vid from tri
        union all select v from tri
        union all select w from tri
      )
      select v.vid, coalesce(c.t, 0) as tri
      from verts v left join (
        select vid, count(*) as t from corners group by 1
      ) c using(vid)
    """


def _lcc_sql() -> str:
    tri = _triangles_sql().strip()
    # reuse the triangle query as a subselect; add degrees
    return f"""
      with tpv as materialized ({tri}),
      cpe as materialized ({SQL_CP_EDGES}),
      sym as materialized (select src, dst from cpe union select dst, src from cpe),
      deg as materialized (select src as vid, count(*) as d from sym group by 1)
      select t.vid,
             round(case when dg.d >= 2
                   then 2.0 * t.tri / (dg.d * (dg.d - 1))
                   else 0.0 end, 8) as lcc
      from tpv t join deg dg using(vid)
    """


def _bfs_sql() -> str:
    inf = 999999
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        f"sym as materialized ({SQL_SYM})",
        "srcv as materialized (select min(src) as s from edges)",
        f"b0 as materialized (select vid, case when vid = (select s from srcv) then 0 else {inf} end as d from verts)",
    ]
    for k in range(BFS_UNROLL):
        parts.append(
            f"""b{k + 1} as materialized (
              select b.vid, least(b.d, coalesce(m.md, {inf})) as d
              from b{k} b left join (
                select s.dst as vid, min(b2.d) + 1 as md
                from sym s join b{k} b2 on s.src = b2.vid
                group by 1
              ) m using(vid)
            )"""
        )
    return (
        ",\n".join(parts)
        + f"\nselect vid, cast(case when d >= {inf} then -1 else d end as bigint) as depth from b{BFS_UNROLL}"
    )


def _sssp_sql() -> str:
    inf = "1e18"
    parts = [
        f"with wedges as materialized ({SQL_WEDGES})",
        "verts as materialized (select src as vid from wedges union select dst from wedges)",
        "sym as materialized (select src, dst, w from wedges union all select dst, src, w from wedges)",
        "srcv as materialized (select min(src) as s from wedges)",
        f"s0 as materialized (select vid, case when vid = (select s from srcv) then 0.0 else {inf} end as dist from verts)",
    ]
    for k in range(SSSP_UNROLL):
        parts.append(
            f"""s{k + 1} as materialized (
              select s.vid, least(s.dist, coalesce(m.md, {inf})) as dist
              from s{k} s left join (
                select e.dst as vid, min(s2.dist + e.w) as md
                from sym e join s{k} s2 on e.src = s2.vid
                where s2.dist < {inf}
                group by 1
              ) m using(vid)
            )"""
        )
    return ",\n".join(parts) + f"\nselect vid, dist from s{SSSP_UNROLL}"


SQL_PROP_EDGES = """
  select o_orderkey*4+1 as src, o_custkey*4+0 as dst, 1.0 as w from orders
  union all
  select l_orderkey*4+1 as src, l_partkey*4+2 as dst,
         cast(min(l_quantity) as double) as w
  from lineitem group by l_orderkey, l_partkey
"""
SQL_PROP_VERTS = """
  select c_custkey*4+0 as vid from customer
  union all select o_orderkey*4+1 from orders
  union all select p_partkey*4+2 from part
"""
SQL_PROP_LABEL = (
    "case when vid % 4 = 0 then 'customer' "
    "when vid % 4 = 1 then 'orders' else 'part' end"
)


def _louvain_phase_sql(parts: list[str], p: int, rounds: int) -> None:
    """One Louvain phase (louvain.py semantics, all-integer scores):
    inputs e{p}(a,b,w), s{p}(v,sw), n{p}(v); emits c{p}_{rounds}."""
    parts.append(
        f"""sym{p} as materialized (
      select a as v, b as u, w from e{p} union all select b, a, w from e{p})"""
    )
    parts.append(
        f"""deg{p} as materialized (
      select n.v, cast(coalesce(d.kd,0) + 2*coalesce(s.sw,0) as bigint) as k
      from n{p} n
      left join (select v, sum(w) as kd from sym{p} group by 1) d on d.v = n.v
      left join s{p} s on s.v = n.v)"""
    )
    parts.append(f"m2_{p} as materialized (select sum(k) as m2 from deg{p})")
    parts.append(f"c{p}_0 as materialized (select v, v as comm from n{p})")
    for r in range(1, rounds + 1):
        pr = f"c{p}_{r - 1}"
        parts.append(
            f"""tot{p}_{r} as materialized (
          select c.comm, sum(d.k) as tot from {pr} c join deg{p} d on d.v=c.v group by 1)"""
        )
        parts.append(
            f"""kvc{p}_{r} as materialized (
          select s.v, c.comm as cu, sum(s.w) as kvc
          from sym{p} s join {pr} c on c.v = s.u group by 1, 2)"""
        )
        parts.append(
            f"""c{p}_{r} as materialized (
          select base.v,
                 case when b.s_best is not null and b.s_best > base.s_stay
                      then b.c_best else base.comm end as comm
          from (
            select c.v, c.comm,
                   (select m2 from m2_{p}) * coalesce(kd.kvc, 0)
                   - d.k * (t.tot - d.k) as s_stay
            from {pr} c
            join deg{p} d on d.v = c.v
            join tot{p}_{r} t on t.comm = c.comm
            left join kvc{p}_{r} kd on kd.v = c.v and kd.cu = c.comm
          ) base
          left join (
            select v, s as s_best, cu as c_best from (
              select kv.v, kv.cu,
                     (select m2 from m2_{p}) * kv.kvc - d.k * t.tot as s,
                     row_number() over (partition by kv.v order by
                       ((select m2 from m2_{p}) * kv.kvc - d.k * t.tot) desc,
                       kv.cu asc) as rn
              from kvc{p}_{r} kv
              join {pr} c on c.v = kv.v
              join deg{p} d on d.v = kv.v
              join tot{p}_{r} t on t.comm = kv.cu
              where kv.cu <> c.comm
            ) where rn = 1
          ) b on b.v = base.v)"""
        )


def _louvain_sql() -> str:
    """Fully-unrolled deterministic synchronous Louvain over the
    co-purchase graph: LOUVAIN_PHASES phases of LOUVAIN_ROUNDS
    synchronous local-moving rounds each (S(C) = m2·k_{v,C} − k_v·tot_C
    argmax with min-id tie-break, move iff strictly better than
    S_stay — all integer arithmetic, louvain.py:1-31 semantics), with
    the exact contraction between phases (inter-community weights
    summed, intra mass to self-loops feeding k).  Quiesced extra rounds
    are no-ops, so the fixed unroll equals the Spark query's
    early-breaking loop.  Output: (vid, community=min original vid)."""
    R = LOUVAIN_ROUNDS
    parts = [
        f"with cpe as materialized ({SQL_CP_EDGES})",
        "e1 as materialized (select src as a, dst as b, cast(count(*) as bigint) as w "
        "from cpe where src <> dst group by 1,2)",
        "n1 as materialized (select a as v from e1 union select b from e1)",
        "s1 as materialized (select cast(null as bigint) as v, "
        "cast(null as bigint) as sw where false)",
    ]
    _louvain_phase_sql(parts, 1, R)
    parts.append(
        f"""ec1 as materialized (
      select ca.comm as ca, cb.comm as cb, e.w
      from e1 e join c1_{R} ca on ca.v = e.a join c1_{R} cb on cb.v = e.b)"""
    )
    parts.append(
        "s2 as materialized (select ca as v, cast(sum(w) as bigint) as sw "
        "from ec1 where ca = cb group by 1)"
    )
    parts.append(
        "e2 as materialized (select least(ca,cb) as a, greatest(ca,cb) as b, "
        "cast(sum(w) as bigint) as w from ec1 where ca <> cb group by 1,2)"
    )
    parts.append(f"n2 as materialized (select distinct comm as v from c1_{R})")
    _louvain_phase_sql(parts, 2, R)
    return (
        ",\n".join(parts)
        + f""",
      fmap as materialized (
        select c1.v as vid, c2.comm as node
        from c1_{R} c1 join c2_{R} c2 on c2.v = c1.comm)
      select m.vid, l.community
      from fmap m join (
        select node, min(vid) as community from fmap group by node
      ) l on l.node = m.node"""
    )


def _betweenness_sql(endpoints: bool = False) -> str:
    """Fully-unrolled sampled Brandes over the order graph: forward
    level-synchronous BFS accumulating path counts σ (levels 1..D,
    cumulative CTEs with a NOT EXISTS frontier guard), then the
    backward dependency sweep δ(v) += σ_v·Σ_w (1+δ_w)/σ_w for
    successors w one level deeper (betweenness.py _chunk_delta
    recurrence; apps/centrality/betweenness semantics).  Scores scaled
    by 0.5·n/|roots| (undirected halving × Brandes sampling
    estimator), matching the Spark query bit-for-bit at 6 decimals.

    ``endpoints=True`` (NX endpoints convention, betweenness.py:119-127):
    per root r every reached w≠r contributes δ_w + 1 instead of δ_w,
    and r itself contributes |reached|−1 (the root row IS in the level
    CTEs, so that's count(*)−1 per r)."""
    D = BETW_UNROLL
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"sym as materialized ({SQL_SYM})",
        f"verts as materialized ({SQL_VERTS})",
        "roots as materialized (select 1000000+s_suppkey as r from supplier "
        "where (1000000+s_suppkey)%10=0)",
        "l0 as materialized (select r, r as vid, 0 as d, 1.0 as sig from roots)",
    ]
    for k in range(1, D + 1):
        parts.append(
            f"""l{k} as materialized (
          select * from l{k - 1}
          union all
          select m.r, m.vid, {k} as d, m.sig from (
            select p.r, s.dst as vid, sum(p.sig) as sig
            from sym s join l{k - 1} p on s.src = p.vid and p.d = {k - 1}
            group by 1, 2
          ) m where not exists (
            select 1 from l{k - 1} x where x.r = m.r and x.vid = m.vid)
        )"""
        )
    parts.append(
        f"b{D + 1} as materialized (select r, vid, d, sig, 0.0 as delta from l{D})"
    )
    j = D + 1
    for lvl in range(D, 0, -1):
        parts.append(
            f"""b{j + 1} as materialized (
          select t.r, t.vid, t.d, t.sig,
                 case when t.d = {lvl - 1}
                      then t.delta + t.sig * coalesce(c.coef, 0.0)
                      else t.delta end as delta
          from b{j} t left join (
            select w.r, s.src as vid, sum((1.0 + w.delta) / w.sig) as coef
            from sym s join b{j} w on s.dst = w.vid and w.d = {lvl}
            group by 1, 2
          ) c on c.vid = t.vid and c.r = t.r
        )"""
        )
        j += 1
    if endpoints:
        contrib = f"""
        select vid, sum(contrib) as bsum from (
          select vid, delta + 1.0 as contrib from b{j} where vid <> r
          union all
          select r as vid, cast(count(*) - 1 as double) as contrib
          from b{j} group by r
        ) group by 1"""
    else:
        contrib = f"select vid, sum(delta) as bsum from b{j} where vid <> r group by 1"
    return (
        ",\n".join(parts)
        + f"""
      select v.vid,
             round(0.5 * (select count(*) from verts) / (select count(*) from roots)
                   * coalesce(s.bsum, 0.0), 6) as betweenness
      from verts v left join ({contrib}) s on s.vid = v.vid"""
    )


def _wcc_property_sql() -> str:
    """Union-graph WCC over the 3-label TPC-H property graph
    (apps/property/wcc_property.h semantics: min-gvid propagation over
    every label pair)."""
    parts = [
        f"with pedges as materialized ({SQL_PROP_EDGES})",
        f"verts as materialized ({SQL_PROP_VERTS})",
        "sym as materialized (select src, dst from pedges union select dst, src from pedges)",
        "c0 as materialized (select vid, vid as comp from verts)",
    ]
    for k in range(PWCC_UNROLL):
        parts.append(
            f"""c{k + 1} as materialized (
              select c.vid, least(c.comp, coalesce(m.mc, c.comp)) as comp
              from c{k} c left join (
                select s.dst as vid, min(c2.comp) as mc
                from sym s join c{k} c2 on s.src = c2.vid
                group by 1
              ) m using(vid)
            )"""
        )
    return (
        ",\n".join(parts)
        + f"""
        select {SQL_PROP_LABEL} as vlabel, vid // 4 as oid, comp
        from c{PWCC_UNROLL}"""
    )


def _sssp_property_sql() -> str:
    """Union-graph SSSP (apps/property/sssp_property.h: relax every
    edge label each round) from the min-custkey customer vertex."""
    inf = "1e18"
    parts = [
        f"with pedges as materialized ({SQL_PROP_EDGES})",
        f"verts as materialized ({SQL_PROP_VERTS})",
        "sym as materialized (select src, dst, w from pedges union all select dst, src, w from pedges)",
        "srcv as materialized (select min(c_custkey)*4 as s from customer)",
        f"s0 as materialized (select vid, case when vid = (select s from srcv) then 0.0 else {inf} end as dist from verts)",
    ]
    for k in range(PSSSP_UNROLL):
        parts.append(
            f"""s{k + 1} as materialized (
              select s.vid, least(s.dist, coalesce(m.md, {inf})) as dist
              from s{k} s left join (
                select e.dst as vid, min(s2.dist + e.w) as md
                from sym e join s{k} s2 on e.src = s2.vid
                where s2.dist < {inf}
                group by 1
              ) m using(vid)
            )"""
        )
    return (
        ",\n".join(parts)
        + f"""
        select {SQL_PROP_LABEL} as vlabel, vid // 4 as oid,
               round(dist, 6) as dist
        from s{PSSSP_UNROLL}"""
    )


def _kcore_sql() -> str:
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        f"sym as materialized ({SQL_SYM})",
        "a0 as materialized (select vid, true as active from verts)",
    ]
    for k in range(KCORE_UNROLL):
        parts.append(
            f"""a{k + 1} as materialized (
              select a.vid,
                     a.active and coalesce(d.cnt, 0) >= {KCORE_K} as active
              from a{k} a left join (
                select s.src as vid, count(*) as cnt
                from sym s
                join a{k} x on x.vid = s.src and x.active
                join a{k} y on y.vid = s.dst and y.active
                group by 1
              ) d using(vid)
            )"""
        )
    return ",\n".join(parts) + f"\nselect vid, active as in_core from a{KCORE_UNROLL}"


def _hits_sql() -> str:
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        "nn as materialized (select cast(count(*) as double) as n from verts)",
        "h0 as materialized (select vid, (select 1.0/n from nn) as hub, (select 1.0/n from nn) as auth from verts)",
    ]
    for k in range(HITS_ROUNDS):
        parts.append(
            f"""ar{k} as materialized (
              select e.dst as vid, sum(h.hub) as s
              from edges e join h{k} h on e.src = h.vid group by 1
            )"""
        )
        parts.append(
            f"a{k} as materialized (select vid, s / (select coalesce(sum(s), 1.0) from ar{k}) as auth from ar{k})"
        )
        parts.append(
            f"""hr{k} as materialized (
              select e.src as vid, sum(a.auth) as s
              from edges e join a{k} a on e.dst = a.vid group by 1
            )"""
        )
        parts.append(
            f"""h{k + 1} as materialized (
              select v.vid,
                     coalesce(hh.s / (select coalesce(sum(s), 1.0) from hr{k}), 0.0) as hub,
                     coalesce(aa.auth, 0.0) as auth
              from verts v
              left join hr{k} hh using(vid)
              left join a{k} aa using(vid)
            )"""
        )
    return (
        ",\n".join(parts)
        + f"\nselect vid, round(hub, 8) as hub, round(auth, 8) as auth from h{HITS_ROUNDS}"
    )


def _negsample_sql() -> str:
    """Negative-sample replay: same md5-uniform proposal tape, dense
    vid index, rejection of real out-neighbors, trial-order windows."""
    h = "md5(cast(t.src as varchar) || ':' || cast(t.t as varchar))"
    digits = " + ".join(
        f"(instr('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (11 - i)}"
        for i in range(12)
    )
    return f"""
      with edges as materialized ({SQL_EDGES}),
      verts as materialized ({SQL_VERTS}),
      nn as (select count(*) as n from verts),
      ix as materialized (
        select vid, row_number() over (order by vid) - 1 as _ix from verts
      ),
      s as (
        select vid as src from verts
        where vid < 1000000 and vid % {NEG_SEED_MOD} = 0
      ),
      t as (
        select s.src, g.t
        from s cross join unnest(generate_series(0, {NEG_TRIALS - 1})) as g(t)
      ),
      props as (
        select t.src, t.t,
               cast(({digits}) as bigint) % (select n from nn) as _ix
        from t
      ),
      cand as (
        select p.src, p.t, ix.vid as neg from props p join ix using(_ix)
      ),
      ok as (
        select c.src, c.t, c.neg
        from cand c
        left join edges e on c.src = e.src and c.neg = e.dst
        where e.src is null and c.src <> c.neg
      ),
      d as (
        select src, t, neg,
               row_number() over (partition by src, neg order by t) as _d
        from ok
      ),
      r as (
        select src, neg,
               row_number() over (partition by src order by t) as rank
        from d where _d = 1
      )
      select src, neg, cast(rank as int) as rank from r where rank <= {NEG_K}
    """


def _khop_sql() -> str:
    """Unrolled k-hop sample replay: identical md5 neighbor ranking."""
    rk = (
        "row_number() over (partition by e.src order by "
        "md5(cast(e.src as varchar) || ':' || cast(e.dst as varchar)), e.dst)"
    )
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"""f0 as materialized (
          select distinct src from edges
          where src < 1000000 and src % {KHOP_SEED_MOD} = 0
        )""",
    ]
    layers = []
    for i, f in enumerate(KHOP_FANOUTS):
        parts.append(
            f"""l{i} as materialized (
              select cast({i} as int) as layer, src, dst from (
                select e.src, e.dst, {rk} as rk
                from edges e join f{i} using(src)
              ) where rk <= {f}
            )"""
        )
        parts.append(
            f"f{i + 1} as materialized (select distinct dst as src from l{i})"
        )
        layers.append(f"select layer, src, dst from l{i}")
    return ",\n".join(parts) + "\n" + " union all ".join(layers)


def _kmeans_sql() -> str:
    """Unrolled Lloyd k-means replay, KMEANS_ITERS rounds: squared-L2
    argmin assignment (ties → min cid, same index-by-index fold order
    as the Spark zip_with aggregate) + per-dim mean update."""
    d2 = (
        "list_sum(list_transform(generate_series(1, {dim}),"
        " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )

    def assign(name: str, cent: str) -> str:
        expr = d2.format(dim=EMB_DIM, a="c.v", b=f"{cent}.cv")
        return f"""{name} as (
          select vec_id, v, cluster, d2 from (
            select c.vec_id, c.v, {cent}.cid as cluster, {expr} as d2,
                   row_number() over (
                     partition by c.vec_id
                     order by {expr} asc, {cent}.cid asc) as rk
            from c cross join {cent}
          ) where rk = 1
        )"""

    parts = [
        "with c as (select vec_id, embedding::DOUBLE[] as v from embeddings)",
        f"cent0 as (select vec_id as cid, v as cv from c where vec_id % {IVF_STRIDE} = 0)",
    ]
    for it in range(KMEANS_ITERS):
        parts.append(assign(f"a{it}", f"cent{it}"))
        parts.append(
            f"""m{it} as (
              select cluster, i, avg(v[i]) as cval
              from a{it}, unnest(generate_series(1, {EMB_DIM})) as g(i)
              group by 1, 2
            )"""
        )
        parts.append(
            f"cent{it + 1} as (select cluster as cid, list(cval order by i) as cv "
            f"from m{it} group by 1)"
        )
    parts.append(assign("afinal", f"cent{KMEANS_ITERS}"))
    return (
        ",\n".join(parts)
        + "\nselect vec_id, cluster, round(d2, 6) as dist from afinal"
    )


def _salsa_sql() -> str:
    """Unrolled SALSA (degree-normalized HITS), SALSA_ROUNDS rounds:
    auth' = Σ hub/od over in-edges, hub' = Σ auth'/id over out-edges;
    no normalization step (mass is conserved by construction)."""
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        "od as materialized (select src, cast(count(*) as double) as od from edges group by 1)",
        "idg as materialized (select dst, cast(count(*) as double) as idg from edges group by 1)",
        "nh as materialized (select cast(count(*) as double) as n from od)",
        """h0 as materialized (
          select v.vid, case when o.src is not null
                             then 1.0 / (select n from nh) else 0.0 end as hub
          from verts v left join od o on v.vid = o.src)""",
    ]
    for k in range(SALSA_ROUNDS):
        parts.append(
            f"""a{k} as materialized (
              select e.dst as vid, sum(h.hub / o.od) as auth
              from edges e
              join h{k} h on e.src = h.vid
              join od o on e.src = o.src
              group by 1
            )"""
        )
        parts.append(
            f"""h{k + 1} as materialized (
              select v.vid, coalesce(hh.hub, 0.0) as hub
              from verts v left join (
                select e.src as vid, sum(a.auth / i.idg) as hub
                from edges e
                join a{k} a on e.dst = a.vid
                join idg i on e.dst = i.dst
                group by 1
              ) hh using(vid)
            )"""
        )
    r = SALSA_ROUNDS
    return (
        ",\n".join(parts)
        + f"""
        select v.vid, round(h.hub, 8) as hub,
               round(coalesce(a.auth, 0.0), 8) as auth
        from verts v
        join h{r} h using(vid)
        left join a{r - 1} a on v.vid = a.vid
        """
    )


def _eigenvector_sql() -> str:
    """Unrolled NX eigenvector power iteration, EV_ROUNDS rounds:
    x' = (x + Aᵀx) / ‖·‖₂  (directed in-edges)."""
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        "nn as materialized (select cast(count(*) as double) as n from verts)",
        "x0 as materialized (select vid, (select 1.0/n from nn) as x from verts)",
    ]
    for k in range(EV_ROUNDS):
        parts.append(
            f"""raw{k} as materialized (
              select v.vid, x.x + coalesce(c.s, 0.0) as raw
              from verts v
              join x{k} x using(vid)
              left join (
                select e.dst as vid, sum(x2.x) as s
                from edges e join x{k} x2 on e.src = x2.vid
                group by 1
              ) c using(vid)
            )"""
        )
        parts.append(
            f"""x{k + 1} as materialized (
              select vid, raw / (select coalesce(sqrt(sum(raw*raw)), 1.0) from raw{k}) as x
              from raw{k}
            )"""
        )
    return ",\n".join(parts) + f"\nselect vid, round(x, 8) as centrality from x{EV_ROUNDS}"


def _katz_sql() -> str:
    """Unrolled NX Katz: x init 0; x' = α·Aᵀx + β; final L2 normalize."""
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        "k0 as materialized (select vid, 0.0 as x from verts)",
    ]
    for k in range(KATZ_ROUNDS):
        parts.append(
            f"""k{k + 1} as materialized (
              select v.vid, {KATZ_ALPHA} * coalesce(c.s, 0.0) + 1.0 as x
              from verts v left join (
                select e.dst as vid, sum(x2.x) as s
                from edges e join k{k} x2 on e.src = x2.vid
                group by 1
              ) c using(vid)
            )"""
        )
    last = f"k{KATZ_ROUNDS}"
    return (
        ",\n".join(parts)
        + f"""
        select vid,
               round(x / (select coalesce(sqrt(sum(x*x)), 1.0) from {last}), 8)
               as centrality
        from {last}"""
    )


def _closeness_sql() -> str:
    """WF-improved closeness for supplier-side roots (vid >= 1000000) —
    multi-source BFS over the symmetrized graph, unrolled."""
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        f"sym as materialized ({SQL_SYM})",
        "nn as materialized (select cast(count(*) as double) as n from verts)",
        "roots as materialized (select vid from verts where vid >= 1000000 and vid % 10 = 0)",
        "d0 as materialized (select vid as root, vid, 0 as d from roots)",
    ]
    for k in range(CLOSE_UNROLL):
        parts.append(
            f"""d{k + 1} as materialized (
              select root, vid, min(d) as d from (
                select root, vid, d from d{k}
                union all
                select x.root, s.dst as vid, x.d + 1 as d
                from d{k} x join sym s on x.vid = s.src
              ) group by root, vid
            )"""
        )
    last = f"d{CLOSE_UNROLL}"
    return (
        ",\n".join(parts)
        + f"""
        select root as vid,
               round(case when sum(d) > 0 and (select n from nn) > 1
                     then ((count(*) - 1) / ((select n from nn) - 1))
                          * ((count(*) - 1) / cast(sum(d) as double))
                     else 0.0 end, 8) as centrality
        from {last} group by root"""
    )


def _avg_clustering_sql() -> str:
    lcc = _lcc_sql().strip()
    return f"with lccq as materialized ({lcc}) select round(avg(lcc), 8) as avg_clustering from lccq"


def _transitivity_sql() -> str:
    tri = _triangles_sql().strip()
    return f"""
      with tpv as materialized ({tri}),
      cpe as materialized ({SQL_CP_EDGES}),
      sym as materialized (select src, dst from cpe union select dst, src from cpe),
      deg as materialized (select src as vid, count(*) as d from sym group by 1)
      select round(
        sum(t.tri) / nullif(sum(dg.d * (dg.d - 1) / 2.0), 0), 8
      ) as transitivity
      from tpv t join deg dg using(vid)
    """


def _assortativity_sql() -> str:
    return f"""
      with cpe as materialized ({SQL_CP_EDGES}),
      sym as materialized (select src, dst from cpe union select dst, src from cpe),
      deg as materialized (select src as vid, count(*) as d from sym group by 1)
      select round(corr(cast(ds.d as double), cast(dd.d as double)), 8) as assortativity
      from sym s
      join deg ds on ds.vid = s.src
      join deg dd on dd.vid = s.dst
    """


def _adc_sql() -> str:
    return f"""
      with cpe as materialized ({SQL_CP_EDGES}),
      sym as materialized (select src, dst from cpe union select dst, src from cpe),
      deg as materialized (select src as vid, count(*) as d from sym group by 1),
      pv as materialized (
        select s.src as vid, any_value(ds.d) as degree,
               avg(cast(dd.d as double)) as avg_nbr_deg
        from sym s
        join deg ds on ds.vid = s.src
        join deg dd on dd.vid = s.dst
        group by s.src
      )
      select cast(degree as bigint) as degree, round(avg(avg_nbr_deg), 8) as knn
      from pv group by degree
    """


def _core_number_sql() -> str:
    """Iterated neighbor h-index (converges to core number), unrolled.
    Per round: c'[v] = min(c[v], H({c[u] : u∈N(v)})) with
    H = max(min(value, desc-rank))."""
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        f"sym as materialized ({SQL_SYM})",
        """c0 as materialized (
          select v.vid, cast(coalesce(d.c, 0) as bigint) as core
          from verts v left join (
            select src as vid, count(*) as c from sym group by 1
          ) d using(vid)
        )""",
    ]
    for k in range(CORE_UNROLL):
        parts.append(
            f"""c{k + 1} as materialized (
              select c.vid,
                     least(c.core, coalesce(h.h, 0)) as core
              from c{k} c left join (
                select vid, max(least(cv, rn)) as h from (
                  select s.dst as vid, x.core as cv,
                         row_number() over (
                           partition by s.dst order by x.core desc) as rn
                  from sym s join c{k} x on s.src = x.vid
                ) group by vid
              ) h using(vid)
            )"""
        )
    return ",\n".join(parts) + f"\nselect vid, cast(core as bigint) as core from c{CORE_UNROLL}"


def _articlerank_sql() -> str:
    """FLASH ArticleRank (articlerank.h:41-72), AR_ROUNDS fixed rounds:
    val'[d] = (1-a) + a * Σ_{s→d} val[s]/(outdeg[s] + avg_outdeg)."""
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        "nn as materialized (select cast(count(*) as double) as n from verts)",
        "mm as materialized (select cast(count(*) as double) as m from edges)",
        "deg as materialized (select src as vid, cast(count(*) as double) as od from edges group by 1)",
        "r0 as materialized (select vid, 0.0 as ar from verts)",
    ]
    for k in range(AR_ROUNDS):
        parts.append(
            f"""r{k + 1} as materialized (
              select v.vid,
                     (1.0 - {ALPHA}) + {ALPHA} * coalesce(c.s, 0.0) as ar
              from verts v left join (
                select e.dst as vid,
                       sum(r.ar / (dg.od + (select m from mm)/(select n from nn))) as s
                from edges e
                join r{k} r on e.src = r.vid
                join deg dg on dg.vid = e.src
                group by 1
              ) c using(vid)
            )"""
        )
    return ",\n".join(parts) + f"\nselect vid, round(ar, 8) as ar from r{AR_ROUNDS}"


def _degeneracy_ordering_sql() -> str:
    """Synchronous degeneracy peel (degeneracy-ordering.h:90-105),
    unrolled: round i ranks unranked vertices whose remaining degree
    ≤ degeneracy; newly-ranked decrement unranked neighbors."""
    core_body = _core_number_sql().strip()
    parts = [
        f"with cores as materialized ({core_body})",
        f"edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        f"sym as materialized ({SQL_SYM})",
        "dgv as materialized (select max(core) as dg from cores)",
        "deg as materialized (select src as vid, count(*) as d from sym group by 1)",
        """s0 as materialized (
          select v.vid, cast(coalesce(deg.d, 0) as bigint) as d,
                 cast(-1 as bigint) as rnk
          from verts v left join deg using(vid)
        )""",
    ]
    for k in range(DGO_UNROLL):
        parts.append(
            f"""n{k} as materialized (
              select vid from s{k}
              where rnk < 0 and d <= (select dg from dgv)
            )""",
        )
        parts.append(
            f"""s{k + 1} as materialized (
              select s.vid,
                     case when s.rnk < 0 and s.vid in (select vid from n{k})
                          then s.d
                          when s.rnk < 0
                          then s.d - coalesce(c.cnt, 0)
                          else s.d end as d,
                     case when s.rnk < 0 and s.vid in (select vid from n{k})
                          then {k} else s.rnk end as rnk
              from s{k} s left join (
                select y.dst as vid, count(*) as cnt
                from sym y join n{k} nn on y.src = nn.vid
                group by 1
              ) c using(vid)
            )"""
        )
    return (
        ",\n".join(parts)
        + f"\nselect vid, cast(rnk as bigint) as rnk from s{DGO_UNROLL}"
    )


def _onion_layers_sql() -> str:
    """Within-core synchronous peel (onion-layer-ordering.h:73-97):
    d0 = |{{u∈N(v): core(u) ≥ core(v)}}|; round i ranks unranked with
    d ≤ core(v); only same-core newly-ranked neighbors decrement."""
    core_body = _core_number_sql().strip()
    parts = [
        f"with cores as materialized ({core_body})",
        f"edges as materialized ({SQL_EDGES})",
        f"sym as materialized ({SQL_SYM})",
        """d0 as materialized (
          select s.dst as vid, count(*) as d
          from sym s
          join cores cu on s.src = cu.vid
          join cores cv on s.dst = cv.vid
          where cu.core >= cv.core
          group by 1
        )""",
        """s0 as materialized (
          select c.vid, cast(coalesce(d0.d, 0) as bigint) as d,
                 c.core as thr, cast(-1 as bigint) as rnk
          from cores c left join d0 using(vid)
        )""",
    ]
    for k in range(ONION_UNROLL):
        parts.append(
            f"""n{k} as materialized (
              select vid, thr from s{k} where rnk < 0 and d <= thr
            )""",
        )
        parts.append(
            f"""s{k + 1} as materialized (
              select s.vid,
                     case when s.rnk < 0 and s.vid in (select vid from n{k})
                          then s.d
                          when s.rnk < 0
                          then s.d - coalesce(c.cnt, 0)
                          else s.d end as d,
                     s.thr,
                     case when s.rnk < 0 and s.vid in (select vid from n{k})
                          then {k} else s.rnk end as rnk
              from s{k} s left join (
                select y.dst as vid, count(*) as cnt
                from sym y
                join n{k} nn on y.src = nn.vid
                join s{k} sv on y.dst = sv.vid
                where sv.thr = nn.thr
                group by 1
              ) c using(vid)
            )"""
        )
    return (
        ",\n".join(parts)
        + f"\nselect vid, cast(rnk as bigint) as layer from s{ONION_UNROLL}"
    )


def _coloring_parts() -> list[str]:
    """Shared CTE list: FLASH greedy coloring fixpoint (clustering/
    color.h:48-82) over the thinned co-purchase graph, unrolled past the
    probed fixpoint: per round c[v] = mex of colors of
    higher-(degree, id)-priority neighbors.  Final frame:
    ``c{COLOR_UNROLL}`` (vid, color)."""
    parts = [
        f"with edges as materialized (select src, dst from ({SQL_CP_EDGES}) "
        f"where (src + dst) % {COLOR_MOD} = 0)",
        "verts as materialized (select src as vid from edges union select dst from edges)",
        "sym as materialized (select src, dst from edges union select dst, src from edges)",
        "deg as materialized (select src as vid, count(*) as d from sym group by 1)",
        """pe as materialized (
          select s.src, s.dst from sym s
          join deg a on a.vid = s.src
          join deg b on b.vid = s.dst
          where a.d > b.d or (a.d = b.d and s.src > s.dst)
        )""",
        "c0 as materialized (select vid, 0 as color from verts)",
    ]
    for k in range(COLOR_UNROLL):
        parts.append(
            f"""u{k} as materialized (
              select distinct p.dst as vid, c.color as col
              from pe p join c{k} c on p.src = c.vid
            )"""
        )
        parts.append(
            f"""cand{k} as materialized (
              select vid, g.i
              from (select vid, count(*) as ncl from u{k} group by 1),
                   unnest(generate_series(0, ncl)) as g(i)
            )"""
        )
        parts.append(
            f"""c{k + 1} as materialized (
              select v.vid, coalesce(mx.cc, 0) as color
              from verts v left join (
                select c.vid, min(c.i) as cc
                from cand{k} c left join u{k} u
                  on u.vid = c.vid and u.col = c.i
                where u.vid is null
                group by 1
              ) mx using(vid)
            )"""
        )
    return parts


def _coloring_sql() -> str:
    return (
        ",\n".join(_coloring_parts())
        + f"\nselect vid, cast(color as bigint) as color from c{COLOR_UNROLL}"
    )


def _lpa_by_color_sql() -> str:
    """FLASH lpa_by_color (flash/clustering/lpa-by-color.h:44-146, LDBC
    min-label tie-break): the coloring fixpoint CTEs, then
    LPAC_SWEEPS × LPAC_COLORS sequential class stages — class c of a
    sweep updates only color-c vertices (an independent set) using the
    labels as rewritten by classes 0..c-1 of the same sweep."""
    parts = _coloring_parts()
    parts.append(
        f"colors as materialized (select vid, color from c{COLOR_UNROLL})"
    )
    parts.append("ls0 as materialized (select vid, vid as label from verts)")
    n = 0
    for _ in range(LPAC_SWEEPS):
        for c in range(LPAC_COLORS):
            parts.append(
                f"""ls{n + 1} as materialized (
                  select l.vid,
                         case when col.color = {c} and p.nl is not null
                              then p.nl else l.label end as label
                  from ls{n} l
                  join colors col using(vid)
                  left join (
                    select vid, label as nl from (
                      select s.dst as vid, r.label, count(*) as cnt
                      from sym s
                      join ls{n} r on s.src = r.vid
                      join colors cd on cd.vid = s.dst and cd.color = {c}
                      group by 1, 2
                    ) qualify row_number() over (
                      partition by vid order by cnt desc, label asc) = 1
                  ) p using(vid)
                )"""
            )
            n += 1
    return (
        ",\n".join(parts)
        + f"\nselect vid, cast(label as bigint) as label from ls{n}"
    )


def _min_edge_cover_sql() -> str:
    """Min-(degree, id) handshake matching over the thinned order graph,
    then cover size = matched/2 + unmatched-with-degree
    (min-edge-cover.h:47-99), unrolled past the probed quiesce."""
    parts = [
        f"with edges as materialized (select src, dst from ({SQL_EDGES}) "
        f"where (src + dst) % {BIC_MOD} = 0)",
        "verts as materialized (select src as vid from edges union select dst from edges)",
        "sym as materialized (select src, dst from edges union select dst, src from edges)",
        "deg as materialized (select src as vid, count(*) as d from sym group by 1)",
        """s0 as materialized (
          select v.vid, cast(deg.d as bigint) as d,
                 cast(-1 as bigint) as mate, cast(-1 as bigint) as p
          from verts v join deg using(vid)
        )""",
    ]
    for k in range(MEC_UNROLL):
        parts.append(
            f"""cand{k} as materialized (
              select y.dst as vid, min(u.d * {ENC} + u.vid) as mk
              from sym y
              join s{k} pk on y.dst = pk.vid and pk.mate = -1 and pk.p = -1
              join s{k} u on y.src = u.vid and u.mate = -1
              group by 1
            )"""
        )
        parts.append(
            f"""t{k} as materialized (
              select s.vid, s.d, s.mate,
                     case when s.mate = -1 and s.p = -1
                          then coalesce(c.mk % {ENC}, -1)
                          else s.p end as p
              from s{k} s left join cand{k} c using(vid)
            )"""
        )
        parts.append(
            f"""mut{k} as materialized (
              select x.vid as a, x.p as b
              from t{k} x join t{k} y on x.p = y.vid and y.p = x.vid
              where x.mate = -1 and x.p >= 0 and y.mate = -1
            )"""
        )
        parts.append(
            f"""s{k + 1} as materialized (
              select t.vid, t.d, coalesce(m.b, t.mate) as mate,
                     case when coalesce(m.b, t.mate) = -1
                               and t.p in (select b from mut{k})
                          then -1 else t.p end as p
              from t{k} t left join mut{k} m on t.vid = m.a
            )"""
        )
    return (
        ",\n".join(parts)
        + f"""
        select cast(
          (select count(*) from s{MEC_UNROLL} where mate >= 0) / 2
          + (select count(*) from s{MEC_UNROLL} where mate = -1 and d > 0)
          as bigint) as size"""
    )


def _k_center_sql() -> str:
    """Greedy k-center (measurement/k-center.h:48-74): first center
    argmax (degree, id), then k-1 rounds of full min-relax BFS +
    argmax (dis, id); output min hop distance, -1 unreachable."""
    inf = 999999
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        f"sym as materialized ({SQL_SYM})",
        "deg as materialized (select src as vid, count(*) as d from sym group by 1)",
        f"""d0_0 as materialized (
          select v.vid, cast(coalesce(deg.d, 0) as bigint) as d,
                 cast({inf} as bigint) as dis
          from verts v left join deg using(vid)
        )""",
    ]
    prev = "d0_0"
    for i in range(KC_K):
        key = "d" if i == 0 else "dis"
        parts.append(
            f"""cen{i} as materialized (
              select max({key} * {ENC} + vid) % {ENC} as c from {prev}
            )"""
        )
        parts.append(
            f"""t{i}_0 as materialized (
              select vid, d,
                     case when vid = (select c from cen{i}) then 0
                          else dis end as dis
              from {prev}
            )"""
        )
        for j in range(1, KC_UNROLL + 1):
            parts.append(
                f"""t{i}_{j} as materialized (
                  select s.vid, s.d,
                         least(s.dis, coalesce(m.md, {inf})) as dis
                  from t{i}_{j - 1} s left join (
                    select y.dst as vid, min(x.dis) + 1 as md
                    from sym y join t{i}_{j - 1} x on y.src = x.vid
                    group by 1
                  ) m using(vid)
                )"""
            )
        prev = f"t{i}_{KC_UNROLL}"
    return (
        ",\n".join(parts)
        + f"""
        select vid, cast(case when dis >= {inf} then -1 else dis end
                         as bigint) as dis
        from {prev}"""
    )


def _fluid_sql() -> str:
    """Synchronous fluid communities (clustering/fluid-community.h:73-106)
    with deterministic seeds (FLUID_S smallest vids), FLUID_ROUNDS fixed
    rounds; density = one exact double division m_i/cnt_i per candidate
    (see graphscope_spark/algorithms/fluid.py)."""
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        f"sym as materialized ({SQL_SYM})",
        f"""seeds as materialized (
          select vid, cast(row_number() over (order by vid) - 1 as int) as slab
          from (select vid from verts order by vid limit {FLUID_S})
        )""",
        """s0 as materialized (
          select v.vid, coalesce(s.slab, -1) as lab
          from verts v left join seeds s using(vid)
        )""",
    ]
    for k in range(FLUID_ROUNDS):
        parts.append(
            f"""cnt{k} as materialized (
              select lab, count(*) as c from s{k} where lab >= 0 group by 1
            )"""
        )
        parts.append(
            f"""d{k} as materialized (
              select t.vid, t.lab, cast(count(*) as double) / any_value(c.c) as dens
              from (
                select y.dst as vid, x.lab
                from sym y join s{k} x on y.src = x.vid
                where x.lab >= 0
                union all
                select vid, lab from s{k} where lab >= 0
              ) t join cnt{k} c using(lab)
              group by t.vid, t.lab
            )"""
        )
        parts.append(
            f"""best{k} as materialized (
              select d.vid, min(d.lab) as blab, any_value(b.md) as bd
              from d{k} d
              join (select vid, max(dens) as md from d{k} group by 1) b
                on d.vid = b.vid and d.dens = b.md
              group by d.vid
            )"""
        )
        parts.append(
            f"""s{k + 1} as materialized (
              select s.vid,
                     cast(case when b.blab is not null
                               and (s.lab < 0 or b.bd > coalesce(c2.dens, 0.0))
                          then b.blab else s.lab end as int) as lab
              from s{k} s
              left join best{k} b using(vid)
              left join d{k} c2 on s.vid = c2.vid and s.lab = c2.lab
            )"""
        )
    return (
        ",\n".join(parts)
        + f"\nselect vid, lab from s{FLUID_ROUNDS}"
    )


SQL_CPD_THIN_EDGES = """
  select src, dst from (
    select distinct a.l_partkey as src, b.l_partkey as dst
    from lineitem a join lineitem b
      on a.l_orderkey = b.l_orderkey
     and a.l_linenumber < b.l_linenumber
     and a.l_partkey != b.l_partkey
  ) where (src + dst) % 7 = 0
"""


def _sampling_path_sql() -> str:
    """Deterministic pattern-walk sample (sampling_path.h:43-135):
    lexicographically smallest SPATH_LIMIT directed walks of SPATH_LEN
    edges over the thinned line-number-ordered co-purchase graph."""
    joins = []
    for i in range(2, SPATH_LEN + 1):
        joins.append(f"join edges e{i} on e{i - 1}.dst = e{i}.src")
    cols = ["e1.src as v0"] + [
        f"e{i}.dst as v{i}" for i in range(1, SPATH_LEN + 1)
    ]
    order = ", ".join(f"v{i}" for i in range(SPATH_LEN + 1))
    return f"""
      with edges as materialized ({SQL_CPD_THIN_EDGES})
      select {", ".join(cols)}
      from edges e1
      {" ".join(joins)}
      order by {order}
      limit {SPATH_LIMIT}
    """


def _random_walks_sql() -> str:
    """Recursive-CTE replay of the LCG-seeded uniform walks
    (walks.py): neighbors ranked by ascending dst, hop index =
    ((node % P) * A + step * B + seed) % P % outdeg."""
    return f"""
      with recursive edges as (
        {SQL_CPD_THIN_EDGES}
      ), adj as (
        select src, dst,
               row_number() over (partition by src order by dst) - 1 as rnk,
               count(*) over (partition by src) as deg
        from edges
      ), starts as (
        select distinct src as start from edges where src % {RWALK_MOD} = 0
      ), walk as (
        select start, 0 as step, start as node from starts
        union all
        select w.start, w.step + 1, a.dst
        from walk w
        join adj a on a.src = w.node
         and a.rnk = (((w.node % 2147483647) * 1103515245
                       + w.step * 12345 + {RWALK_SEED}) % 2147483647) % a.deg
        where w.step < {RWALK_LEN}
      )
      select start, step, node from walk
    """


def _node2vec_sql(wr: int = 1, wc: int = 2, wf: int = 1) -> str:
    """Unrolled replay of the node2vec biased walks (walks.py
    node2vec_walks): step 0 is the uniform rank pick; each later step
    weighs every neighbor (wr return / wc common / wf far) and takes
    the first whose windowed cumulative weight exceeds
    lcg(node, step) % total."""
    A, B, P = 1103515245, 12345, 2147483647
    parts = [
        f"edges as materialized ({SQL_CPD_THIN_EDGES})",
        """adjr as materialized (
          select src, dst,
                 row_number() over (partition by src order by dst) - 1 as rnk,
                 count(*) over (partition by src) as deg
          from edges
        )""",
        f"s0 as (select distinct src as start, cast(null as bigint) as prev, "
        f"src as node from edges where src % {RWALK_MOD} = 0)",
        f"""s1 as (
          select w.start, w.node as prev, a.dst as node
          from s0 w join adjr a on a.src = w.node
           and a.rnk = (((w.node % {P}) * {A} + {RWALK_SEED}) % {P}) % a.deg
        )""",
    ]
    for t in range(1, RWALK_LEN):
        parts.append(
            f"""s{t + 1} as (
          select start, prev, node from (
            select start, prev, node, wt,
                   sum(wt) over (partition by start order by node) as cum,
                   sum(wt) over (partition by start) as tot, h
            from (
              select w.start, w.node as prev, a.dst as node,
                     case when a.dst = w.prev then {wr}
                          when exists (select 1 from edges e2
                                       where e2.src = w.prev
                                         and e2.dst = a.dst) then {wc}
                          else {wf} end as wt,
                     (((w.node % {P}) * {A} + {t * B + RWALK_SEED}) % {P}) as h
              from s{t} w join adjr a on a.src = w.node
            )
          ) where cum - wt <= h % tot and h % tot < cum
        )"""
        )
    selects = [
        f"select start, {t} as step, node from s{t}"
        for t in range(RWALK_LEN + 1)
    ]
    return (
        "with " + ",\n".join(parts) + "\n" + "\nunion all\n".join(selects)
    )


def _is_simple_path_sql() -> str:
    """Whether the lexicographically-first SPATH_LEN-edge walk is a
    simple path (is_simple_path.h:44-96): pairwise-distinct check over
    the deterministic first walk."""
    body = _sampling_path_sql().strip()
    n = SPATH_LEN + 1
    pairs = " and ".join(
        f"v{i} != v{j}" for i in range(n) for j in range(i + 1, n)
    )
    return f"""
      with walks as materialized ({body})
      select ({pairs}) as is_simple
      from (select * from walks order by {", ".join(f"v{i}" for i in range(n))}
            limit 1)
    """


def _all_simple_paths_sql() -> str:
    """All simple paths min(vid)→max(vid) over the symmetrized thinned
    order graph with ≤ ASP_CUTOFF hops (all_simple_paths.h, NX
    semantics), as unrolled join enumeration."""
    parts = [
        f"with edges as materialized (select src, dst from ({SQL_EDGES}) "
        f"where (src + dst) % {BIC_MOD} = 0)",
        "verts as materialized (select src as vid from edges union select dst from edges)",
        "sym as materialized (select src, dst from edges union select dst, src from edges)",
        "st as materialized (select min(vid) as s, "
        "(select max(dst) from sym where src = (select min(vid) from verts)) as t "
        "from verts)",
    ]
    # source-anchored progressive extension: pk = simple walks of k
    # edges from s whose interior never touches t — each CTE stays
    # tiny (fan-out from ONE vertex), unlike an unanchored k-way
    # self-join of sym that the planner may enumerate globally.
    parts.append(
        "p1 as materialized (select st.t as t, e.src as v0, e.dst as v1 "
        "from sym e join st on e.src = st.s)"
    )
    for k in range(2, ASP_CUTOFF + 1):
        vs = [f"p.v{i}" for i in range(k)]
        conds = [f"e.src = p.v{k - 1}", f"p.v{k - 1} != p.t"] + [
            f"e.dst != {v}" for v in vs
        ]
        parts.append(
            f"p{k} as materialized (select p.t, {', '.join(vs)}, "
            f"e.dst as v{k} from p{k - 1} p join sym e on "
            f"{' and '.join(conds)})"
        )
    selects = []
    for k in range(1, ASP_CUTOFF + 1):
        vs = ", ".join(f"v{i}" for i in range(k + 1))
        selects.append(
            f"""select concat_ws('-', {vs}) as path,
                       cast({k} as int) as hops
                from p{k} where v{k} = t"""
        )
    return ",\n".join(parts) + "\n" + "\nunion all\n".join(selects)


def _kclique_sql(k: int) -> str:
    """Generic k-clique count over the thinned co-purchase graph:
    degree-orientation DAG chains, i-th vertex checked against all
    prior via EXISTS (k-clique.h generic form)."""
    parts = [
        f"with cpe as materialized (select src, dst from ({SQL_CP_EDGES}) "
        f"where (src + dst) % {COLOR_MOD} = 0)",
        "sym as materialized (select src, dst from cpe union select dst, src from cpe)",
        "deg as materialized (select src as vid, count(*) as d from sym group by 1)",
        """eor as materialized (
          select s.src as a, s.dst as b
          from sym s
          join deg ds on ds.vid = s.src
          join deg dd on dd.vid = s.dst
          where (ds.d < dd.d) or (ds.d = dd.d and s.src < s.dst)
        )""",
        "c1 as materialized (select a as v0, b as v1 from eor)",
    ]
    for i in range(2, k):
        conds = [f"e.a = c.v{i - 1}"] + [
            f"e.b != c.v{j}" for j in range(i - 1)
        ]
        exists = " and ".join(
            f"exists (select 1 from eor x where x.a = c.v{j} and x.b = e.b)"
            for j in range(i - 1)
        )
        cols = ", ".join(f"c.v{j}" for j in range(i))
        parts.append(
            f"""c{i} as materialized (
              select {cols}, e.b as v{i}
              from c{i - 1} c join eor e on {" and ".join(conds)}
              where {exists}
            )"""
        )
    return (
        ",\n".join(parts)
        + f"\nselect cast(count(*) as bigint) as kc from c{k - 1}"
    )


def _kcore_size_sql() -> str:
    kc_body = _kcore_sql().strip()
    return f"""
      with kc as materialized ({kc_body})
      select cast(count(*) filter (where in_core) as bigint) as size from kc
    """


def _bfs_parent_sql() -> str:
    """Depths via the unrolled BFS, then parent = min-id predecessor at
    depth-1 over the symmetrized edge set."""
    inf = 999999
    bfs_body = _bfs_sql().strip()
    return f"""
      with depths as materialized ({bfs_body}),
      edges as materialized ({SQL_EDGES}),
      sym as materialized ({SQL_SYM}),
      srcv as materialized (select min(src) as s from edges),
      par as materialized (
        select s.dst as vid, min(s.src) as parent
        from sym s
        join depths a on a.vid = s.src
        join depths b on b.vid = s.dst
        where a.depth >= 0 and b.depth = a.depth + 1
        group by s.dst
      )
      select d.vid, d.depth,
             cast(case when d.vid = (select s from srcv) then d.vid
                  when d.depth = -1 then -1
                  else p.parent end as bigint) as parent
      from depths d left join par p using(vid)
    """


def _kshell_sql() -> str:
    core_body = _core_number_sql().strip()
    return f"""
      with cores as materialized ({core_body})
      select vid, core = {KSHELL_K} as in_shell from cores
    """


def _dfs_preorder_sql() -> str:
    """Exact DFS-preorder oracle: a recursive CTE replays the
    sequential walk of algorithms/paths.py dfs_preorder one stack
    operation per iteration — state row = (stack, visited-bitmap
    string over dense vertex indexes, emitted vid, component-local
    rank).  Min-unvisited-neighbor per step equals the Spark kernel's
    resumed ascending iterator because the visited set only grows.
    New components start at the globally smallest unvisited vid
    (= that component's min vid, since components are exhausted before
    the stack empties); recursion ends when no unvisited vertex
    remains.  NOTE: inside ``WITH RECURSIVE`` DuckDB does not
    deduplicate plain ``union`` in helper CTEs — the explicit
    ``distinct`` wrappers below are load-bearing."""
    return f"""
with recursive
tedges as materialized (
  select src, dst from ({SQL_EDGES}) where (src + dst) % {BIC_MOD} = 0
),
tverts as materialized (
  select distinct vid from (
    select src as vid from tedges union all select dst as vid from tedges)),
idx as materialized (select vid, row_number() over (order by vid) as i from tverts),
nv as materialized (select count(*) as n from idx),
tsym as materialized (
  select distinct src, dst from (
    select src, dst from tedges
    union all select dst as src, src as dst from tedges)),
adj as materialized (
  select si.i as v, list(di.i order by di.i) as ds
  from tsym e
  join idx si on si.vid = e.src
  join idx di on di.vid = e.dst
  group by 1
),
walk(stack, visited, cur, rnk) as (
  select cast([] as bigint[]), repeat('0', (select cast(n as int) from nv)),
         cast(null as bigint), cast(-1 as bigint)
  union all
  select
    case when s.top is null then [s.newroot]
         when s.nxt is not null then list_append(s.stack, s.nxt)
         else list_slice(s.stack, 1, len(s.stack) - 1) end,
    case when s.top is null then
           substr(s.visited, 1, cast(s.newroot as int) - 1) || '1' ||
           substr(s.visited, cast(s.newroot as int) + 1)
         when s.nxt is not null then
           substr(s.visited, 1, cast(s.nxt as int) - 1) || '1' ||
           substr(s.visited, cast(s.nxt as int) + 1)
         else s.visited end,
    case when s.top is null then s.newroot
         when s.nxt is not null then s.nxt end,
    case when s.top is null then 0
         when s.nxt is not null then s.rnk + 1
         else s.rnk end
  from (
    select w.stack, w.visited, w.rnk,
           case when len(w.stack) > 0 then w.stack[len(w.stack)] end as top,
           list_min(list_filter(coalesce(a.ds, []),
                    d -> substr(w.visited, cast(d as int), 1) = '0')) as nxt,
           cast(nullif(strpos(w.visited, '0'), 0) as bigint) as newroot
    from walk w
    left join adj a
      on a.v = (case when len(w.stack) > 0 then w.stack[len(w.stack)] end)
  ) s
  where s.top is not null or s.newroot is not null
)
select i.vid as vid, s.rnk as "rank"
from walk s join idx i on i.i = s.cur
where s.cur is not null"""


MSF_PHASES = 8  # Borůvka halves components per phase; fixpoint by phase 3 at sf0.01
MSF_JUMPS = 14  # min-label + pointer-doubling contraction; fixpoint by 6 at sf0.01


def _msf_sql() -> str:
    """Fully-unrolled Borůvka MSF, mirroring algorithms/msf.py
    step-for-step: per phase, each component picks its minimum outgoing
    edge under the deterministic (w, oa, ob) total order, the picked
    supergraph is contracted to completion (min-label hook +
    pointer-doubling, ``MSF_JUMPS`` unrolled rounds), and surviving
    inter-component edges are relabeled keeping one minimal
    representative per pair.  Extra phases past convergence run on
    empty tables and are no-ops, so ``MSF_PHASES``/``MSF_JUMPS`` carry
    large safety margins (verified vs a sequential Kruskal with the
    identical tie-break at sf0.001 and sf0.01)."""
    parts = [
        f"with wedges as materialized ({SQL_WEDGES})",
        """w0 as materialized (
          select least(src, dst) as ca, greatest(src, dst) as cb, min(w) as w,
                 least(src, dst) as oa, greatest(src, dst) as ob
          from wedges where src <> dst group by 1, 2, 4, 5)""",
        """ch0 as materialized (
          select cast(null as bigint) as src, cast(null as bigint) as dst,
                 cast(null as double) as w where false)""",
    ]
    for p in range(1, MSF_PHASES + 1):
        q = p - 1
        parts.append(
            f"""pick{p} as materialized (
          select ca, cb, w, oa, ob from (
            select *, row_number() over (partition by ca order by w, oa, ob) as rn
            from (select ca, cb, w, oa, ob from w{q}
                  union all
                  select cb, ca, w, oa, ob from w{q})
          ) where rn = 1)"""
        )
        parts.append(
            f"""ch{p} as materialized (
          select src, dst, w from ch{q}
          union
          select least(oa, ob) as src, greatest(oa, ob) as dst, w from pick{p})"""
        )
        parts.append(
            f"""lk{p} as materialized (
          select ca as x, cb as y from pick{p}
          union all select cb, ca from pick{p})"""
        )
        parts.append(
            f"""pt{p}_0 as materialized (
          select x, x as p from (select distinct x from lk{p}))"""
        )
        for j in range(MSF_JUMPS):
            parts.append(
                f"""pt{p}_{j + 1} as materialized (
              select pa.x,
                     least(pa.p,
                           coalesce(m.mn, pa.p),
                           coalesce(pj.p, pa.p)) as p
              from pt{p}_{j} pa
              left join (
                select lk.x as x, min(pr.p) as mn
                from lk{p} lk join pt{p}_{j} pr on lk.y = pr.x
                group by 1
              ) m on m.x = pa.x
              left join pt{p}_{j} pj on pa.p = pj.x)"""
            )
        parts.append(
            f"""w{p} as materialized (
          select ca, cb, w, oa, ob from (
            select least(nca, ncb) as ca, greatest(nca, ncb) as cb, w, oa, ob,
                   row_number() over (
                     partition by least(nca, ncb), greatest(nca, ncb)
                     order by w, oa, ob) as rn
            from (
              select coalesce(na.p, e.ca) as nca, coalesce(nb.p, e.cb) as ncb,
                     e.w, e.oa, e.ob
              from w{q} e
              left join pt{p}_{MSF_JUMPS} na on na.x = e.ca
              left join pt{p}_{MSF_JUMPS} nb on nb.x = e.cb
            )
            where nca <> ncb
          ) where rn = 1)"""
        )
    return (
        ",\n".join(parts)
        + f"\nselect src, dst, round(w, 8) as weight from ch{MSF_PHASES}"
    )


def _sssp_avg_length_sql() -> str:
    """Average shortest weighted path from supplier roots over the
    symmetrized weighted graph, multi-source min-plus unrolled."""
    parts = [
        f"with wedges as materialized ({SQL_WEDGES})",
        "verts as materialized (select src as vid from wedges union select dst from wedges)",
        "symw as materialized (select src, dst, w from wedges union all select dst, src, w from wedges)",
        "roots as materialized (select vid from verts where vid >= 1000000 and vid % 10 = 0)",
        "s0 as materialized (select vid as root, vid, 0.0 as dist from roots)",
    ]
    for k in range(AVGLEN_UNROLL):
        parts.append(
            f"""s{k + 1} as materialized (
              select root, vid, min(dist) as dist from (
                select root, vid, dist from s{k}
                union all
                select x.root, e.dst as vid, x.dist + e.w as dist
                from s{k} x join symw e on x.vid = e.src
              ) group by root, vid
            )"""
        )
    last = f"s{AVGLEN_UNROLL}"
    return (
        ",\n".join(parts)
        + f""",
        per_root as materialized (
          select root, avg(dist) as avg_d from {last}
          where vid != root group by root
        )
        select round(avg(avg_d), 8) as avg_length from per_root"""
    )


def _voterank_sql() -> str:
    """Unrolled deterministic VoteRank over the symmetrized co-purchase
    graph: per round score = Σ neighbor ability; winner = (max score,
    min vid); winner ability → 0, neighbor abilities −1/⟨k⟩ floored.
    Abilities are integers scaled by m (init m, decrement n, floor 0) —
    exactly the float recurrence times the positive constant m, with no
    float sum-order sensitivity — mirroring algorithms/voterank.py."""
    parts = [
        f"with cpe as materialized ({SQL_CP_EDGES})",
        "verts as materialized (select src as vid from cpe union select dst from cpe)",
        "sym as materialized (select src, dst from cpe union select dst, src from cpe)",
        """params as materialized (
          select cast((select count(*) from sym) as bigint) as m,
                 cast((select count(*) from verts) as bigint) as n
        )""",
        "a0 as materialized (select vid, (select m from params) as ability from verts)",
        "e0 as materialized (select cast(null as bigint) as vid, 0 as rank where false)",
    ]
    for r in range(1, VOTERANK_SEEDS + 1):
        parts.append(
            f"""sc{r} as materialized (
              select s.dst as vid, sum(a.ability) as score
              from sym s join a{r - 1} a on a.vid = s.src
              where s.dst not in (select vid from e{r - 1})
              group by s.dst
            )"""
        )
        parts.append(
            f"""w{r} as materialized (
              select vid from sc{r} where score > 0
              order by score desc, vid asc limit 1
            )"""
        )
        parts.append(
            f"""e{r} as materialized (
              select vid, rank from e{r - 1}
              union all select vid, {r} as rank from w{r}
            )"""
        )
        parts.append(
            f"""a{r} as materialized (
              select a.vid,
                     case when a.vid in (select vid from w{r}) then cast(0 as bigint)
                          when exists (
                            select 1 from sym s
                            where s.src in (select vid from w{r})
                              and s.dst = a.vid)
                          then greatest(a.ability - (select n from params), cast(0 as bigint))
                          else a.ability end as ability
              from a{r - 1} a
            )"""
        )
    return (
        ",\n".join(parts)
        + f"\nselect vid, cast(rank as int) as rank from e{VOTERANK_SEEDS}"
    )


SQL_DLG_EDGES = f"""
  select distinct a.l_partkey as src, b.l_partkey as dst
  from lineitem a join lineitem b
    on a.l_orderkey = b.l_orderkey and a.l_linenumber + 1 = b.l_linenumber
  where a.l_partkey != b.l_partkey
    and (a.l_partkey + b.l_partkey) % {DLG_MOD} = 0
"""


def _msbfs_parts(unroll: int) -> list[str]:
    """Shared multi-source BFS CTE chain over the order graph from the
    supplier-side landmark roots; final table d{unroll}(root, vid, d)."""
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        f"sym as materialized ({SQL_SYM})",
        "roots as materialized (select vid from verts where vid >= 1000000 and vid % 10 = 0)",
        "d0 as materialized (select vid as root, vid, 0 as d from roots)",
    ]
    for k in range(unroll):
        parts.append(
            f"""d{k + 1} as materialized (
              select root, vid, min(d) as d from (
                select root, vid, d from d{k}
                union all
                select x.root, s.dst as vid, x.d + 1 as d
                from d{k} x join sym s on x.vid = s.src
              ) group by root, vid
            )"""
        )
    return parts


def _harmonic_sql() -> str:
    parts = _msbfs_parts(MSBFS_UNROLL)
    return (
        ",\n".join(parts)
        + f"""
        select root as vid,
               round(sum(case when vid = root then 0.0 else 1.0/d end), 8)
               as centrality
        from d{MSBFS_UNROLL} group by root"""
    )


def _eccentricity_sql() -> str:
    parts = _msbfs_parts(MSBFS_UNROLL)
    return (
        ",\n".join(parts)
        + f"\nselect root as vid, cast(max(d) as bigint) as ecc from d{MSBFS_UNROLL} group by root"
    )


def _apsp_sql() -> str:
    parts = _msbfs_parts(MSBFS_UNROLL)
    return (
        ",\n".join(parts)
        + f"\nselect root, vid, cast(d as double) as dist from d{MSBFS_UNROLL}"
    )


def _diameter_sql() -> str:
    parts = _msbfs_parts(MSBFS_UNROLL)
    return (
        ",\n".join(parts)
        + f"\nselect cast(max(d) as bigint) as diameter from d{MSBFS_UNROLL}"
    )


APSP_UNROLL = 8  # thin order graph BFS depth is 4 at sf0.01; 2x margin


def _apsp_full_sql() -> str:
    """Full APSP over the thinned order graph: multi-source BFS from
    ALL vertices, unrolled to quiescence, digested per root."""
    parts = [
        f"""with tedges as materialized (
          select src, dst from ({SQL_EDGES}) where (src + dst) % {BIC_MOD} = 0
        )""",
        """tverts as materialized (
          select distinct vid from (
            select src as vid from tedges union all select dst as vid from tedges)
        )""",
        """tsym as materialized (
          select distinct src, dst from (
            select src, dst from tedges
            union all select dst as src, src as dst from tedges)
        )""",
        "d0 as materialized (select vid as root, vid, 0 as d from tverts)",
    ]
    for k in range(APSP_UNROLL):
        parts.append(
            f"""d{k + 1} as materialized (
              select root, vid, min(d) as d from (
                select root, vid, d from d{k}
                union all
                select x.root, s.dst as vid, x.d + 1 as d
                from d{k} x join tsym s on x.vid = s.src
              ) group by root, vid
            )"""
        )
    return (
        ",\n".join(parts)
        + f"""
        select root as vid,
               cast(max(d) as bigint) as ecc,
               cast(sum(d) as bigint) as sum_dist,
               cast(count(*) - 1 as bigint) as reachable
        from d{APSP_UNROLL} group by root"""
    )


def _ppr_sql() -> str:
    """Unrolled personalized PageRank: teleport + dangling mass return
    to the uniform distribution over the supplier-side landmark set."""
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        "srcs as materialized (select vid from verts where vid >= 1000000 and vid % 10 = 0)",
        "ns as materialized (select cast(count(*) as double) as k from srcs)",
        "deg as materialized (select src as vid, cast(count(*) as double) as od from edges group by 1)",
        """pv as materialized (
          select v.vid,
                 case when v.vid in (select vid from srcs)
                      then 1.0/(select k from ns) else 0.0 end as p
          from verts v
        )""",
        "r0 as materialized (select vid, p as pr from pv)",
    ]
    for k in range(PPR_ROUNDS):
        parts.append(
            f"""d{k} as materialized (
              select coalesce(sum(r.pr), 0.0) as s
              from r{k} r left join deg d using(vid) where d.od is null
            )"""
        )
        parts.append(
            f"""r{k + 1} as materialized (
              select v.vid,
                     ((1.0 - {ALPHA}) + {ALPHA} * (select s from d{k})) * pv.p
                     + {ALPHA} * coalesce(c.s, 0.0) as pr
              from verts v
              join pv on pv.vid = v.vid
              left join (
                select e.dst as vid, sum(r.pr / dg.od) as s
                from edges e
                join r{k} r on e.src = r.vid
                join deg dg on dg.vid = e.src
                group by 1
              ) c on c.vid = v.vid
            )"""
        )
    return ",\n".join(parts) + f"\nselect vid, round(pr, 8) as pr from r{PPR_ROUNDS}"


def _mis_sql() -> str:
    """Unrolled deterministic Luby-by-id MIS over the co-purchase graph
    (= the lexicographically-first MIS)."""
    parts = [
        f"with cpe as materialized ({SQL_CP_EDGES})",
        "verts as materialized (select src as vid from cpe union select dst from cpe)",
        "sym as materialized (select src, dst from cpe union select dst, src from cpe)",
        "a0 as materialized (select vid from verts)",
        "m0 as materialized (select vid from verts where false)",
    ]
    for k in range(MIS_UNROLL):
        parts.append(
            f"""w{k} as materialized (
              select a.vid from a{k} a left join (
                select s.src as vid, min(s.dst) as mn
                from sym s
                join a{k} x on x.vid = s.src
                join a{k} y on y.vid = s.dst
                group by s.src
              ) n using(vid)
              where n.mn is null or a.vid < n.mn
            )"""
        )
        parts.append(
            f"""l{k} as materialized (
              select distinct s.dst as vid from sym s
              join w{k} w on w.vid = s.src
              join a{k} y on y.vid = s.dst
            )"""
        )
        parts.append(
            f"m{k + 1} as materialized (select vid from m{k} union select vid from w{k})"
        )
        parts.append(
            f"""a{k + 1} as materialized (
              select vid from a{k}
              where vid not in (select vid from w{k})
                and vid not in (select vid from l{k})
            )"""
        )
    return (
        ",\n".join(parts)
        + f"\nselect v.vid, v.vid in (select vid from m{MIS_UNROLL}) as in_mis from verts v"
    )


def _scc_sql() -> str:
    """SCC oracle: transitive closure via recursive CTE; scc id = min
    vid among mutually-reachable vertices (incl. self)."""
    return f"""
      with recursive dedges as materialized ({SQL_DLG_EDGES}),
      -- NB: inside a RECURSIVE with-list DuckDB treats any UNION-bodied
      -- CTE as recursive (no plain dedup), so spell out DISTINCT
      verts as materialized (
        select distinct vid from (
          select src as vid from dedges union all select dst from dedges
        )
      ),
      reach(src, dst) as (
        select src, dst from dedges
        union
        select r.src, e.dst from reach r join dedges e on r.dst = e.src
      ),
      mutual as materialized (
        select a.src as v, a.dst as u
        from reach a join reach b on a.src = b.dst and a.dst = b.src
      ),
      mn as materialized (select v, min(u) as mu from mutual group by v)
      select v.vid, least(v.vid, coalesce(m.mu, v.vid)) as scc
      from verts v left join mn m on m.v = v.vid
    """


def _k4_sql() -> str:
    """Global 4-clique count by degree-ordered orientation (the
    triangle orientation extended one level)."""
    return f"""
      with cpe as materialized ({SQL_CP_EDGES}),
      sym as materialized (select src, dst from cpe union select dst, src from cpe),
      deg as materialized (select src as vid, count(*) as d from sym group by 1),
      eor as materialized (
        select e.src as a, e.dst as b
        from cpe e
        join deg ds on ds.vid = e.src
        join deg dd on dd.vid = e.dst
        where (ds.d < dd.d) or (ds.d = dd.d and e.src < e.dst)
        union all
        select e.dst as a, e.src as b
        from cpe e
        join deg ds on ds.vid = e.src
        join deg dd on dd.vid = e.dst
        where (dd.d < ds.d) or (dd.d = ds.d and e.dst < e.src)
      ),
      tri as materialized (
        select e1.a, e1.b, e2.b as c
        from eor e1
        join eor e2 on e1.a = e2.a and e1.b != e2.b
        where exists (select 1 from eor e3 where e3.a = e1.b and e3.b = e2.b)
      ),
      k4 as (
        select count(*) as cnt
        from tri t
        join eor e4 on e4.a = t.a and e4.b != t.b and e4.b != t.c
        where exists (select 1 from eor e5 where e5.a = t.b and e5.b = e4.b)
          and exists (select 1 from eor e6 where e6.a = t.c and e6.b = e4.b)
      )
      select cast(cnt as bigint) as k4 from k4
    """


def _clustering_directed_sql() -> str:
    """Fagiolo directed clustering over the linenumber digraph."""
    return f"""
      with de as materialized ({SQL_DLG_EDGES}),
      verts as materialized (
        select distinct vid from (
          select src as vid from de union all select dst from de
        )
      ),
      b as materialized (
        select src, dst, cast(sum(w) as bigint) as w from (
          select src, dst, 1 as w from de
          union all
          select dst as src, src as dst, 1 as w from de
        ) group by src, dst
      ),
      t as materialized (
        select b1.src as vid, sum(b1.w * b2.w * b3.w) / 2.0 as t
        from b b1
        join b b2 on b2.src = b1.dst
        join b b3 on b3.src = b2.dst and b3.dst = b1.src
        where b2.dst != b1.src
        group by b1.src
      ),
      din as materialized (select dst as vid, count(*) as c from de group by 1),
      dout as materialized (select src as vid, count(*) as c from de group by 1),
      drec as materialized (select src as vid, count(*) as c from b where w = 2 group by 1)
      select v.vid,
             round(case when (coalesce(i.c,0)+coalesce(o.c,0))
                        * (coalesce(i.c,0)+coalesce(o.c,0)-1)
                        - 2*coalesce(r.c,0) > 0
                   then coalesce(t.t, 0.0)
                        / ((coalesce(i.c,0)+coalesce(o.c,0))
                           * (coalesce(i.c,0)+coalesce(o.c,0)-1)
                           - 2*coalesce(r.c,0))
                   else 0.0 end, 8) as clustering
      from verts v
      left join t on t.vid = v.vid
      left join din i on i.vid = v.vid
      left join dout o on o.vid = v.vid
      left join drec r on r.vid = v.vid
    """


def _bic_prefix() -> str:
    """Shared CTE chain for the biconnectivity family over the thinned
    order graph: WCC → min-parent multi-source BFS forest → ancestor
    closure → per-non-tree-edge LCA → coverage → contraction classes.
    Mirrors algorithms/biconnectivity.py step for step (bridge.h /
    cut-point.h semantics); src < dst holds by construction (customer
    ids < supplier offset), so tedges is already canonical."""
    parts = [
        f"""with tedges as materialized (
          select src, dst from ({SQL_EDGES}) where (src + dst) % {BIC_MOD} = 0
        )""",
        "tverts as materialized (select src as vid from tedges union select dst from tedges)",
        "tsym as materialized (select src, dst from tedges union select dst, src from tedges)",
        "w0 as materialized (select vid, vid as comp from tverts)",
    ]
    for k in range(BIC_WCC_UNROLL):
        parts.append(
            f"""w{k + 1} as materialized (
              select c.vid, least(c.comp, coalesce(m.mc, c.comp)) as comp
              from w{k} c left join (
                select s.dst as vid, min(c2.comp) as mc
                from tsym s join w{k} c2 on s.src = c2.vid group by 1
              ) m using(vid)
            )"""
        )
    inf = 999999
    parts.append(
        f"""b0 as materialized (
          select vid, case when vid = comp then 0 else {inf} end as d
          from w{BIC_WCC_UNROLL}
        )"""
    )
    for k in range(BIC_BFS_UNROLL):
        parts.append(
            f"""b{k + 1} as materialized (
              select b.vid, least(b.d, coalesce(m.md, {inf})) as d
              from b{k} b left join (
                select s.dst as vid, min(b2.d) + 1 as md
                from tsym s join b{k} b2 on s.src = b2.vid group by 1
              ) m using(vid)
            )"""
        )
    parts.append(
        f"""tree as materialized (
          select b.vid, b.d, p.parent
          from b{BIC_BFS_UNROLL} b left join (
            select s.dst as vid, min(s.src) as parent
            from tsym s
            join b{BIC_BFS_UNROLL} bs on s.src = bs.vid
            join b{BIC_BFS_UNROLL} bd on s.dst = bd.vid
            where bs.d = bd.d - 1
            group by s.dst
          ) p using(vid)
        )"""
    )
    parts.append(
        """a0 as materialized (
          select vid as v, vid as anc, d as ad from tree
          union all
          select vid as v, parent as anc, d - 1 as ad from tree where parent is not null
        )"""
    )
    for k in range(BIC_ANC_UNROLL):
        parts.append(
            f"""a{k + 1} as materialized (
              select distinct v, anc, ad from (
                select v, anc, ad from a{k}
                union all
                select a.v, t.parent as anc, a.ad - 1 as ad
                from a{k} a join tree t on t.vid = a.anc
                where t.parent is not null
              )
            )"""
        )
    anc = f"a{BIC_ANC_UNROLL}"
    parts.append(
        """nontree as materialized (
          select src, dst from tedges
          except
          select least(parent, vid), greatest(parent, vid)
          from tree where parent is not null
        )"""
    )
    parts.append(
        f"""lcat as materialized (
          select n.src, n.dst, arg_max(au.anc, au.ad) as lca, max(au.ad) as lca_depth
          from nontree n
          join {anc} au on au.v = n.src
          join {anc} av on av.v = n.dst and av.anc = au.anc
          group by n.src, n.dst
        )"""
    )
    parts.append(
        f"""pk as materialized (
          select l.src, l.dst, l.lca, au.anc as c
          from lcat l join {anc} au on au.v = l.src where au.ad > l.lca_depth
          union
          select l.src, l.dst, l.lca, av.anc as c
          from lcat l join {anc} av on av.v = l.dst where av.ad > l.lca_depth
        )"""
    )
    parts.append("coverage as materialized (select distinct c from pk)")
    parts.append(
        """csym as materialized (
          select src, dst from (
            select distinct least(p.c, t.parent) as src, greatest(p.c, t.parent) as dst
            from pk p join tree t on t.vid = p.c
            where t.parent != p.lca
            union
            select src, dst from nontree
          )
          union all
          select dst, src from (
            select distinct least(p.c, t.parent) as src, greatest(p.c, t.parent) as dst
            from pk p join tree t on t.vid = p.c
            where t.parent != p.lca
            union
            select src, dst from nontree
          )
        )"""
    )
    parts.append("cl0 as materialized (select vid, vid as cls from tverts)")
    for k in range(BIC_CLS_UNROLL):
        parts.append(
            f"""cl{k + 1} as materialized (
              select c.vid, least(c.cls, coalesce(m.mc, c.cls)) as cls
              from cl{k} c left join (
                select s.dst as vid, min(c2.cls) as mc
                from csym s join cl{k} c2 on s.src = c2.vid group by 1
              ) m using(vid)
            )"""
        )
    parts.append(f"cls as materialized (select vid, cls from cl{BIC_CLS_UNROLL})")
    return ",\n".join(parts)


def _bridges_sql() -> str:
    return (
        _bic_prefix()
        + """
        select least(parent, vid) as src, greatest(parent, vid) as dst
        from tree
        where parent is not null and vid not in (select c from coverage)
        """
    )


def _articulation_sql() -> str:
    return (
        _bic_prefix()
        + """
        select distinct vid from (
          select t.parent as vid
          from tree t
          join tree tp on tp.vid = t.parent
          join cls ct on ct.vid = t.vid
          join cls cp on cp.vid = t.parent
          where t.parent is not null and tp.parent is not null
            and ct.cls != cp.cls
          union
          select vid from (
            select t.parent as vid, count(distinct ct.cls) as nc
            from tree t
            join tree tp on tp.vid = t.parent
            join cls ct on ct.vid = t.vid
            where t.parent is not null and tp.parent is null
            group by t.parent
          ) where nc >= 2
        )
        """
    )


def _bcc_sql() -> str:
    return (
        _bic_prefix()
        + f""",
        lbl as materialized (
          select e.src, e.dst,
                 case when cov.c is not null then c1.cls else -(e.child + 1) end as pre
          from (
            select least(parent, vid) as src, greatest(parent, vid) as dst, vid as child
            from tree where parent is not null
          ) e
          left join coverage cov on cov.c = e.child
          join cls c1 on c1.vid = e.child
          union all
          select n.src, n.dst, c2.cls as pre
          from nontree n join cls c2 on c2.vid = n.src
        ),
        canon as materialized (
          select pre, min(src * {BIC_ENC} + dst) as me from lbl group by pre
        )
        select l.src, l.dst,
               c.me // {BIC_ENC} as bcc_u, c.me % {BIC_ENC} as bcc_v
        from lbl l join canon c using(pre)
        """
    )


def _bic_graph_prefix() -> str:
    """Thinned-graph base only (matching family)."""
    return f"""with tedges as materialized (
      select src, dst from ({SQL_EDGES}) where (src + dst) % {BIC_MOD} = 0
    ),
    tverts as materialized (select src as vid from tedges union select dst from tedges),
    tsym as materialized (select src, dst from tedges union select dst, src from tedges)"""


def _mm_sql() -> str:
    """Unrolled FLASH handshake matching (mm.h)."""
    parts = [
        _bic_graph_prefix(),
        "m0 as materialized (select vid, cast(-1 as bigint) as mate from tverts)",
    ]
    for k in range(1, MM_UNROLL + 1):
        parts.append(
            f"u{k} as materialized (select vid from m{k - 1} where mate = -1)"
        )
        parts.append(
            f"""pr{k} as materialized (
              select s.dst as vid, max(s.src) as p
              from tsym s
              join u{k} a on s.src = a.vid
              join u{k} b on s.dst = b.vid
              group by s.dst
            )"""
        )
        parts.append(
            f"""m{k} as materialized (
              select m.vid, coalesce(x.p, m.mate) as mate
              from m{k - 1} m left join (
                select a.vid, a.p from pr{k} a join pr{k} b
                  on b.vid = a.p and b.p = a.vid
              ) x using(vid)
            )"""
        )
    return ",\n".join(parts) + f"\nselect vid, mate from m{MM_UNROLL}"


def _min_cover_sql() -> str:
    """Unrolled greedy vertex cover (min-cover-greedy.h)."""
    parts = [
        _bic_graph_prefix(),
        """c0 as materialized (
          select v.vid, cast(coalesce(dg.d, 0) as bigint) as d, false as c
          from tverts v left join (
            select src as vid, count(*) as d from tsym group by 1
          ) dg using(vid)
        )""",
    ]
    for k in range(1, COVER_UNROLL + 1):
        parts.append(
            f"""bl{k} as materialized (
              select s.dst as vid, max(n.d * {BIC_ENC} + n.vid) as mk
              from tsym s join c{k - 1} n on n.vid = s.src and not n.c
              group by s.dst
            )"""
        )
        parts.append(
            f"""sel{k} as materialized (
              select c.vid from c{k - 1} c left join bl{k} b using(vid)
              where not c.c and c.d > 0
                and (b.mk is null or b.mk <= c.d * {BIC_ENC} + c.vid)
            )"""
        )
        parts.append(
            f"""dec{k} as materialized (
              select s.dst as vid, count(*) as dec
              from tsym s join sel{k} x on x.vid = s.src
              group by s.dst
            )"""
        )
        parts.append(
            f"""c{k} as materialized (
              select c.vid,
                     case when c.c or s.vid is not null then c.d
                          else c.d - coalesce(d.dec, 0) end as d,
                     (c.c or s.vid is not null) as c
              from c{k - 1} c
              left join sel{k} s using(vid)
              left join dec{k} d using(vid)
            )"""
        )
    return ",\n".join(parts) + f"\nselect vid from c{COVER_UNROLL} where c"


def _domset_sql() -> str:
    """Unrolled 2-hop greedy dominating set (min-dominating-set.h)."""
    parts = [
        _bic_graph_prefix(),
        """s0 as materialized (
          select v.vid, cast(coalesce(dg.d, 0) as bigint) as cnt,
                 false as b, false as dom
          from tverts v left join (
            select src as vid, count(*) as d from tsym group by 1
          ) dg using(vid)
        )""",
    ]
    for k in range(1, DOMSET_UNROLL + 1):
        parts.append(
            f"""k1_{k} as materialized (
              select s.vid, greatest(s.cnt * {BIC_ENC} + s.vid, coalesce(m.mx, 0)) as k1
              from s{k - 1} s left join (
                select e.dst as vid, max(n.cnt * {BIC_ENC} + n.vid) as mx
                from tsym e join s{k - 1} n on n.vid = e.src and not n.dom
                group by e.dst
              ) m using(vid)
              where not s.dom
            )"""
        )
        parts.append(
            f"""k2_{k} as materialized (
              select s.vid, greatest(s.k1, coalesce(m.mx, 0)) as k2
              from k1_{k} s left join (
                select e.dst as vid, max(n.k1) as mx
                from tsym e join k1_{k} n on n.vid = e.src
                group by e.dst
              ) m using(vid)
            )"""
        )
        parts.append(
            f"sel{k} as materialized (select vid from k2_{k} where k2 % {BIC_ENC} = vid)"
        )
        parts.append(
            f"""dd{k} as materialized (
              select distinct vid from (
                select e.dst as vid from tsym e join sel{k} x on x.vid = e.src
                union all
                select vid from sel{k}
              )
            )"""
        )
        parts.append(
            f"""sh{k} as materialized (
              select s.vid, s.cnt,
                     (s.b or x.vid is not null) as b,
                     (s.dom or d.vid is not null) as dom
              from s{k - 1} s
              left join sel{k} x using(vid)
              left join dd{k} d using(vid)
            )"""
        )
        parts.append(
            f"""s{k} as materialized (
              select s.vid,
                     case when s.dom then s.cnt else coalesce(n.nd, 0) end as cnt,
                     s.b, s.dom
              from sh{k} s left join (
                select e.dst as vid, count(*) as nd
                from tsym e join sh{k} x on x.vid = e.src and not x.dom
                group by e.dst
              ) n using(vid)
            )"""
        )
    return ",\n".join(parts) + f"\nselect vid from s{DOMSET_UNROLL} where b"


SQL_CPD_EDGES = """
  select distinct a.l_partkey as src, b.l_partkey as dst
  from lineitem a join lineitem b
    on a.l_orderkey = b.l_orderkey
   and a.l_linenumber < b.l_linenumber
   and a.l_partkey <> b.l_partkey
"""


def _subgraph_census_sql() -> str:
    """Rectangles / diamonds / 3-paths / tailed triangles over the
    co-purchase graph.  Rectangles use the pair identity
    C4 = 1/2 Σ_{u<v} C(codeg,2) — an independent formulation of the
    FLASH wedge-orientation count (rectangle.h)."""
    return f"""
      with cpe as materialized ({SQL_CP_EDGES}),
      sym as materialized (select src, dst from cpe union select dst, src from cpe),
      deg as materialized (select src as vid, count(*) as d from sym group by 1),
      sup as materialized (
        select u.src as a, u.dst as b, count(*) as sup
        from cpe u
        join sym p on p.src = u.src
        join sym q on q.src = u.dst and q.dst = p.dst
        group by 1, 2
      ),
      es as materialized (
        select u.src as a, u.dst as b, da.d as da, db.d as db,
               coalesce(s.sup, 0) as sup
        from cpe u
        join deg da on da.vid = u.src
        join deg db on db.vid = u.dst
        left join sup s on s.a = u.src and s.b = u.dst
      ),
      cod as materialized (
        select p.dst as u, q.dst as v, count(*) as w
        from sym p join sym q on p.src = q.src and p.dst < q.dst
        group by 1, 2
      )
      select 'rectangles' as kind,
             cast(coalesce(sum(w * (w - 1) / 2), 0) / 2 as bigint) as cnt
      from cod
      union all
      select 'diamonds',
             cast(coalesce(sum(sup * (sup - 1) / 2), 0) as bigint) from es
      union all
      select 'paths3',
             cast(coalesce(sum((da - 1) * (db - 1) - sup), 0) as bigint) from es
      union all
      select 'tailed',
             cast(coalesce(sum((da + db - 4) * sup), 0) as bigint) from es
    """


def _triangle_census_directed_sql() -> str:
    """FLASH directed-triangle census over the directed co-purchase
    graph (cyclic counted at the max-vid corner; order-invariant)."""
    return f"""
      with e as materialized ({SQL_CPD_EDGES}),
      recip as materialized (
        select e.src as s, e.dst as d
        from e join e r on r.src = e.dst and r.dst = e.src
      )
      select 'acyclic' as kind, cast(count(*) as bigint) as cnt
      from e sd
      join e sx on sx.src = sd.src
      join e dx on dx.src = sd.dst and dx.dst = sx.dst
      union all
      select 'cyclic', cast(count(*) as bigint)
      from e sd
      join e xs on xs.dst = sd.src and xs.src > sd.src and xs.src > sd.dst
      join e dx on dx.src = sd.dst and dx.dst = xs.src
      union all
      select 'in', cast(count(*) as bigint)
      from recip r
      join e sx on sx.src = r.s
      join e dx on dx.src = r.d and dx.dst = sx.dst
      where r.s < r.d
      union all
      select 'out', cast(count(*) as bigint)
      from recip r
      join e xs on xs.dst = r.s
      join e xd on xd.src = xs.src and xd.dst = r.d
      where r.s < r.d
      union all
      select 'cycle_plus', cast(count(*) as bigint)
      from recip r
      join e dx on dx.src = r.d
      join e xs on xs.src = dx.dst and xs.dst = r.s
    """


def _densest_sql() -> str:
    """Max-core subgraph density over the order graph; core numbers
    from the same unrolled h-index fixpoint as the core_number oracle
    (densest-sub-2-approx.h: ne counts both edge directions)."""
    core_body = _core_number_sql().strip()
    return f"""
      with cores as materialized ({core_body}),
      edges as materialized ({SQL_EDGES}),
      sym as materialized ({SQL_SYM}),
      top as materialized (
        select vid from cores where core = (select max(core) from cores)
      ),
      nv as materialized (select count(*) as nv from top),
      ne as materialized (
        select count(*) as ne from sym
        where src in (select vid from top) and dst in (select vid from top)
      )
      select cast(nv as bigint) as nv, cast(ne as bigint) as ne,
             round(ne * 1.0 / nv, 8) as density
      from nv, ne
    """


def _ktruss_sql() -> str:
    """Unrolled k-truss pruning over the co-purchase graph."""
    parts = [
        f"with cpe as materialized ({SQL_CP_EDGES})",
        "e0 as materialized (select src as a, dst as b from cpe)",
    ]
    for k in range(KTRUSS_UNROLL):
        parts.append(
            f"s{k} as materialized (select a, b from e{k} union all select b as a, a as b from e{k})"
        )
        parts.append(
            f"""t{k} as materialized (
              select x.a, x.b, count(*) as t
              from e{k} x
              join s{k} p on p.a = x.a
              join s{k} q on q.a = x.b and q.b = p.b
              group by x.a, x.b
            )"""
        )
        parts.append(
            f"""e{k + 1} as materialized (
              select x.a, x.b from e{k} x
              left join t{k} t on t.a = x.a and t.b = x.b
              where coalesce(t.t, 0) >= {KTRUSS_K - 2}
            )"""
        )
    return (
        ",\n".join(parts)
        + f"\nselect a as src, b as dst from e{KTRUSS_UNROLL}"
    )


def _linkpred_sql() -> str:
    return f"""
      with cpe as materialized ({SQL_CP_EDGES}),
      sym as materialized (select src, dst from cpe union select dst, src from cpe),
      deg as materialized (select src as vid, count(*) as d from sym group by 1),
      wedges as materialized (
        select l.dst as a, r.dst as b, l.src as m
        from sym l join sym r on l.src = r.src
        where l.dst < r.dst and l.dst % {LINKPRED_MOD} = 0
      ),
      scored as materialized (
        select a, b, count(*) as cn, sum(1.0/ln(d.d)) as aa
        from wedges w join deg d on d.vid = w.m
        group by a, b
      ),
      cand as materialized (
        select s.* from scored s
        where not exists (
          select 1 from cpe where cpe.src = s.a and cpe.dst = s.b
        )
      )
      select c.a, c.b, c.cn,
             round(c.cn / (da.d + db.d - c.cn), 8) as jaccard,
             round(c.aa, 8) as adamic_adar,
             cast(da.d * db.d as bigint) as pref_attach
      from cand c
      join deg da on da.vid = c.a
      join deg db on db.vid = c.b
    """


def _node_boundary_sql() -> str:
    return f"""
      with cpe as materialized ({SQL_CP_EDGES}),
      sym as materialized (select src, dst from cpe union select dst, src from cpe),
      s as materialized (
        select distinct src as vid from sym where src % {BOUNDARY_MOD} = 0
      )
      select distinct e.dst as vid from sym e
      where e.src in (select vid from s) and e.dst not in (select vid from s)
    """


def _edge_boundary_sql() -> str:
    return f"""
      with cpe as materialized ({SQL_CP_EDGES}),
      sym as materialized (select src, dst from cpe union select dst, src from cpe),
      s as materialized (
        select distinct src as vid from sym where src % {BOUNDARY_MOD} = 0
      )
      select e.src, e.dst from sym e
      where e.src in (select vid from s) and e.dst not in (select vid from s)
    """


def _dedup_near_sql() -> str:
    """LSH candidates -> exact Jaccard >= threshold -> min-label
    connected components (unrolled) -> canonical = min doc_id."""
    parts = [
        f"with {SQL_SHINGLES}",
        f"sig as materialized (select doc_id, {_minhash_cols_sql()} from sh group by doc_id)",
        """banded as materialized (
          select doc_id, unnest([
            concat_ws('|', '0', mh_0, mh_1),
            concat_ws('|', '1', mh_2, mh_3),
            concat_ws('|', '2', mh_4, mh_5),
            concat_ws('|', '3', mh_6, mh_7)
          ]) as band from sig
        )""",
        """cand as materialized (
          select distinct x.doc_id as a, y.doc_id as b
          from banded x join banded y using(band)
          where x.doc_id < y.doc_id
        )""",
        "sizes as materialized (select doc_id, count(*) as sz from sh group by 1)",
        """inter as materialized (
          select c.a, c.b, count(*) as ni
          from cand c
          join sh x on x.doc_id = c.a
          join sh y on y.doc_id = c.b and y.shingle = x.shingle
          group by c.a, c.b
        )""",
        f"""ver as materialized (
          select i.a, i.b
          from inter i
          join sizes sa on sa.doc_id = i.a
          join sizes sb on sb.doc_id = i.b
          where i.ni / (sa.sz + sb.sz - i.ni) >= {NEARDUP_T}
        )""",
        "symp as materialized (select a, b from ver union select b, a from ver)",
        "pverts as materialized (select distinct a as vid from symp)",
        "c0 as materialized (select vid, vid as comp from pverts)",
    ]
    for k in range(NEARDUP_CC_UNROLL):
        parts.append(
            f"""c{k + 1} as materialized (
              select c.vid, least(c.comp, coalesce(m.mc, c.comp)) as comp
              from c{k} c left join (
                select s.b as vid, min(x.comp) as mc
                from symp s join c{k} x on s.a = x.vid
                group by s.b
              ) m using(vid)
            )"""
        )
    parts.append(
        f"canon as materialized (select comp, min(vid) as canonical_id from c{NEARDUP_CC_UNROLL} group by comp)"
    )
    parts.append(
        f"grp as materialized (select c.vid, canon.canonical_id from c{NEARDUP_CC_UNROLL} c join canon using(comp))"
    )
    return (
        ",\n".join(parts)
        + """
        select d.doc_id,
               coalesce(g.canonical_id, d.doc_id) as canonical_id,
               coalesce(g.canonical_id, d.doc_id) != d.doc_id as is_duplicate
        from documents d left join grp g on g.vid = d.doc_id"""
    )


def _emb_neardup_sql() -> str:
    """Multi-band sign-LSH twin of similarity.cosine_near_duplicates:
    band j's key = 'j|' + Σ 2^i·[v[j·r+i+1] ≥ 0] over its r planes."""
    band_keys = ", ".join(
        "concat('{j}|', cast({bits} as varchar))".format(
            j=j,
            bits=" + ".join(
                f"(case when embedding[{j * EMB_PLANES_PER_BAND + i + 1}] >= 0 "
                f"then {2 ** i} else 0 end)"
                for i in range(EMB_PLANES_PER_BAND)
            ),
        )
        for j in range(EMB_BANDS)
    )
    return f"""
      with e as (
        select vec_id, embedding::DOUBLE[] as v from embeddings
      ),
      keyed as (
        select vec_id, unnest([{band_keys}]) as bk from embeddings
      ),
      cand as (
        select distinct x.vec_id as a, y.vec_id as b
        from keyed x join keyed y using(bk)
        where x.vec_id < y.vec_id
      ),
      p as (
        select c.a, c.b,
               list_dot_product(ea.v, eb.v)
               / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) as cos
        from cand c
        join e ea on ea.vec_id = c.a
        join e eb on eb.vec_id = c.b
      )
      select a, b, round(cos, 6) as cosine from p where cos >= {EMB_NEARDUP_T}
    """


def _simhash_neardup_sql(max_hamming: int = 3) -> str:
    """SimHash near-dups: chunk-equality candidates (pigeonhole over
    max_hamming+1 chunks), then exact Hamming via bit_count(xor)."""
    from graphscope_spark.functions import specs

    bits = specs.SIMHASH_BITS
    sim = _simhash_sql().strip()
    n_chunks = max_hamming + 1
    width = bits // n_chunks
    chunk_exprs = ", ".join(
        f"concat('{c}:', cast((simhash // {2 ** (c * width)}) % {2 ** width} as varchar))"
        for c in range(n_chunks)
    )
    return f"""
      with simh as materialized ({sim}),
      keyed as materialized (
        select doc_id, simhash, unnest([{chunk_exprs}]) as ck from simh
      ),
      cand as materialized (
        select distinct x.doc_id as a, y.doc_id as b,
               x.simhash as ha, y.simhash as hb
        from keyed x join keyed y using(ck)
        where x.doc_id < y.doc_id
      )
      select a, b, cast(bit_count(xor(ha, hb)) as bigint) as hamming
      from cand where bit_count(xor(ha, hb)) <= {max_hamming}
    """


def _minhash_cols_sql() -> str:
    from graphscope_spark.functions import specs

    return ",\n".join(
        f"min(md5('{j}:' || shingle)) as mh_{j}" for j in range(specs.MINHASH_K)
    )


def _simhash_sql() -> str:
    from graphscope_spark.functions import specs

    bits = specs.SIMHASH_BITS
    sums = []
    for j in range(bits):
        pos = j // 4 + 1
        p = 2 ** (j % 4)
        sums.append(
            f"sum((((instr('0123456789abcdef', substr(hx, {pos}, 1)) - 1) // {p}) % 2) * 2 - 1) as s{j}"
        )
    fp = " + ".join(f"(case when s{j} > 0 then {2**j} else 0 end)" for j in range(bits))
    return rf"""
      with tok as (
        select distinct doc_id,
               unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) as t
        from documents
      ),
      h as (select doc_id, md5(t) as hx from tok),
      sums as (select doc_id, {", ".join(sums)} from h group by doc_id)
      select doc_id, cast({fp} as bigint) as simhash from sums
    """


def _lang_markers_values() -> str:
    from graphscope_spark.functions import specs

    vals = ", ".join(
        f"('{lang}', '{w}')"
        for lang, ws in sorted(specs.LANG_MARKERS.items())
        for w in ws
    )
    return vals


# ---------------------------------------------------------------------
# Spark-side query implementations
# ---------------------------------------------------------------------


def _q_partition_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash edge-cut quality report (graph.partition_report): per
    modulo-partition vertex/edge balance + cut fraction — the shuffle
    price and skew exposure of the engine's own partitioning."""
    from graphscope_spark.graph import partition_report
    from graphscope_spark.sources.tpch_graph import order_graph

    return partition_report(order_graph(spark, sf_dir), p=PART_P)


_URLF_HOSTS = ["site3.example.com", "site5.example.com"]


def _q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl blocklist gate (urls.url_filter) over deterministically
    synthesized URLs: blocked-host suffixes (incl. a www. subdomain
    case), ad-path / utm / binary-extension patterns; per
    (host, block_reason) counts."""
    from graphscope_spark.functions.urls import url_filter

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    url = F.concat(
        F.lit("http://"),
        F.when(F.col("o_custkey") % 13 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Site"),
        (F.col("o_custkey") % 8).cast("string"),
        F.lit(".example.com"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("/ads/x")).otherwise(
            F.concat(F.lit("/p/"), F.col("o_orderkey").cast("string"))
        ),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("?utm_source=1")).otherwise(
            F.lit("")
        ),
        F.when(F.col("o_orderkey") % 17 == 0, F.lit("/file.zip")).otherwise(
            F.lit("")
        ),
    )
    flagged = url_filter(
        o.select(url.alias("url")), blocked_hosts=_URLF_HOSTS
    )
    return flagged.groupBy("host", "block_reason").agg(
        F.count(F.lit(1)).alias("n")
    )


def _q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    return (
        g.out_degrees()
        .join(g.in_degrees(), "vid")
        .select("vid", "out_deg", "in_deg")
    )


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import pagerank
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    return pagerank(g, alpha=ALPHA, max_iter=PR_ROUNDS, tol=None, sync_every=PR_ROUNDS).select(
        "vid", F.round("rank", 8).alias("pr")
    )


def _q_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation-contracted order graph —
    exercises Graph.contract (the host-graph/Louvain-phase quotient op)
    + the weighted PageRank recurrence end-to-end."""
    from graphscope_spark.algorithms import pagerank
    from graphscope_spark.sources.tpch_graph import SUPPLIER_OFFSET, order_graph

    g = order_graph(spark, sf_dir)
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            F.col("c_custkey").cast("long").alias("vid"),
            F.col("c_nationkey").cast("long").alias("gid"),
        )
    )
    supp = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .select(
            (F.lit(SUPPLIER_OFFSET) + F.col("s_suppkey")).cast("long").alias("vid"),
            F.col("s_nationkey").cast("long").alias("gid"),
        )
    )
    ng = g.contract(cust.unionByName(supp))
    return pagerank(
        ng, alpha=ALPHA, max_iter=PR_ROUNDS, tol=None,
        sync_every=PR_ROUNDS, weight="weight",
    ).select(F.col("vid").alias("nation"), F.round("rank", 8).alias("pr"))


def _nation_pagerank_sql() -> str:
    """Unrolled weighted PageRank over the nation-contracted order
    graph: edge weight = lineitem count between the two nations,
    contribution = r·w/Σ_out w, dangling = zero outgoing weight."""
    parts = [
        """with ne as materialized (
          select c.c_nationkey as src, s.s_nationkey as dst,
                 cast(count(*) as double) as w
          from orders o
          join lineitem l on o.o_orderkey = l.l_orderkey
          join customer c on o.o_custkey = c.c_custkey
          join supplier s on l.l_suppkey = s.s_suppkey
          group by 1, 2
        )""",
        """verts as materialized (
          select distinct c_nationkey as vid from customer
          union
          select distinct s_nationkey from supplier
        )""",
        "nn as materialized (select cast(count(*) as double) as n from verts)",
        "deg as materialized (select src as vid, sum(w) as ow from ne group by 1)",
        "dangv as materialized (select v.vid from verts v left join deg d using(vid) where d.ow is null)",
        "r0 as materialized (select vid, (select 1.0/n from nn) as pr from verts)",
    ]
    for k in range(PR_ROUNDS):
        parts.append(
            f"d{k} as materialized (select coalesce(sum(pr), 0.0) as s from r{k} "
            f"where vid in (select vid from dangv))"
        )
        parts.append(
            f"""r{k + 1} as materialized (
              select v.vid,
                     (1.0 - {ALPHA})/(select n from nn)
                     + {ALPHA} * (select s from d{k})/(select n from nn)
                     + {ALPHA} * coalesce(c.s, 0.0) as pr
              from verts v left join (
                select e.dst as vid, sum(r.pr * e.w / dg.ow) as s
                from ne e
                join r{k} r on e.src = r.vid
                join deg dg on dg.vid = e.src
                group by 1
              ) c using(vid)
            )"""
        )
    parts_sql = ",\n".join(parts)
    return (
        f"{parts_sql}\n"
        f"select vid as nation, round(pr, 8) as pr from r{PR_ROUNDS}"
    )


def _q_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import wcc
    from graphscope_spark.sources.tpch_graph import order_graph

    return wcc(order_graph(spark, sf_dir)).select("vid", "comp")


def _q_wcc_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-contraction CC (flash_cc_log, apps/flash/connectivity/
    cc-log.h): large-star/small-star alternation, identical output
    contract to wcc (comp = min vid) so it shares the oracle."""
    from graphscope_spark.algorithms.wcc import wcc_log
    from graphscope_spark.sources.tpch_graph import order_graph

    return wcc_log(order_graph(spark, sf_dir)).select("vid", "comp")


def _q_cdlp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import cdlp
    from graphscope_spark.sources.tpch_graph import order_graph

    return cdlp(order_graph(spark, sf_dir), max_round=CDLP_ROUNDS, sync_every=CDLP_ROUNDS).select("vid", "label")


def _lpa_u2i_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed labels exercising all three i2u branches: exact 0/1 clamps
    and free values (integer-mod arithmetic → identical doubles in
    Spark and DuckDB)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    return cust.select(
        k.alias("vid"),
        F.when(k % 4 == 0, 0.0)
        .when(k % 4 == 1, 1.0)
        .otherwise((k % 7) / F.lit(10.0) + 0.2)
        .alias("p0"),
        F.when(k % 3 == 0, 1.0)
        .otherwise((k % 9) / F.lit(20.0) + 0.3)
        .alias("p1"),
    )


def _q_lpa_u2i(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import lpa_u2i

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.lit(1000000) + F.col("l_partkey")).alias("dst"),
        )
        .agg(F.sum("l_quantity").alias("w"))  # integer-valued ⇒ exact
    )
    out = lpa_u2i(_lpa_u2i_users(spark, sf_dir), edges, ["p0", "p1"], max_round=LPAU2I_ROUNDS)
    # labels grow ~650× per u2i+i2u cycle (≈4e5 after 2 cycles); round
    # to 4 decimals so cross-engine sum-order noise (~1e-8 abs) can't
    # flip the value hash.
    return out.select("vid", F.round("p0", 4).alias("p0"), F.round("p1", 4).alias("p1"))


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import triangles
    from graphscope_spark.sources.tpch_graph import copurchase_graph

    return triangles(copurchase_graph(spark, sf_dir)).select("vid", "tri")


def _q_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import lcc
    from graphscope_spark.sources.tpch_graph import copurchase_graph

    return lcc(copurchase_graph(spark, sf_dir)).select(
        "vid", F.round("lcc", 8).alias("lcc")
    )


def _q_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import bfs
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    source = g.edges.agg(F.min("src")).collect()[0][0]
    return bfs(g, source=source, directed=False).select("vid", "depth")


def _q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import sssp
    from graphscope_spark.sources.tpch_graph import order_graph
    from graphscope_spark.graph import Graph

    g0 = order_graph(spark, sf_dir)
    g = Graph(g0.edges, g0.vertices, directed=False, num_partitions=g0.num_partitions)
    source = g.edges.agg(F.min("src")).collect()[0][0]
    return sssp(g, source=source, weight="weight").select("vid", "dist")


def _q_pie_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSSP expressed through the @pie decorator surface (reference
    decorators.py:51-116, acceptance example test_udf_app.py:570-618) —
    same graph/source/oracle as the sssp query, exercising the
    PEval/IncEval runtime end-to-end."""
    from graphscope_spark.graph import Graph
    from graphscope_spark.pie import pie, run_pie
    from graphscope_spark.sources.tpch_graph import order_graph

    g0 = order_graph(spark, sf_dir)
    g = Graph(g0.edges, g0.vertices, directed=False, num_partitions=g0.num_partitions)
    source = g.edges.agg(F.min("src")).collect()[0][0]

    @pie(vd_type="double", md_type="double")
    class SSSP_PIE:
        @staticmethod
        def Init(frag, context):
            src = context.get_config("src")
            context.init_value(
                F.when(F.col("vid") == src, 0.0).otherwise(float("inf")),
                aggregate="min",
            )

        @staticmethod
        def PEval(frag, context):
            src = context.get_config("src")
            e = frag.weighted_edges()
            return e.where(e["src"] == src).select(
                F.col("dst").alias("vid"), F.col("w").alias("msg")
            )

        @staticmethod
        def IncEval(frag, context):
            e = frag.weighted_edges()
            st = context.values
            return e.join(st, e["src"] == st["vid"]).select(
                e["dst"].alias("vid"), (st["value"] + e["w"]).alias("msg")
            )

    return run_pie(g, SSSP_PIE, config={"src": source}, name="pie_sssp").select(
        "vid", F.col("value").alias("dist")
    )


def _q_load_app_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same SSSP/graph/oracle as pie_sssp, but the PIE program is
    LOADED from a user package dir via load_app (the AppAssets analog,
    reference framework/app.py:149-326) instead of being defined
    inline — exercising the packaging shim end-to-end."""
    import os
    import tempfile
    import textwrap

    from graphscope_spark.app import load_app
    from graphscope_spark.graph import Graph
    from graphscope_spark.sources.tpch_graph import order_graph

    pkg = tempfile.mkdtemp(prefix="gs_app_pkg_")
    with open(os.path.join(pkg, "sssp_pie.py"), "w") as fh:
        fh.write(
            textwrap.dedent(
                '''
                from pyspark.sql import functions as F

                from graphscope_spark.pie import pie


                @pie(vd_type="double", md_type="double")
                class SSSP_PIE:
                    @staticmethod
                    def Init(frag, context):
                        src = context.get_config("src")
                        context.init_value(
                            F.when(F.col("vid") == src, 0.0)
                            .otherwise(float("inf")),
                            aggregate="min",
                        )

                    @staticmethod
                    def PEval(frag, context):
                        src = context.get_config("src")
                        e = frag.weighted_edges()
                        return e.where(e["src"] == src).select(
                            F.col("dst").alias("vid"), F.col("w").alias("msg")
                        )

                    @staticmethod
                    def IncEval(frag, context):
                        e = frag.weighted_edges()
                        st = context.values
                        return e.join(st, e["src"] == st["vid"]).select(
                            e["dst"].alias("vid"),
                            (st["value"] + e["w"]).alias("msg"),
                        )
                '''
            )
        )
    app = load_app(pkg)
    g0 = order_graph(spark, sf_dir)
    g = Graph(g0.edges, g0.vertices, directed=False, num_partitions=g0.num_partitions)
    source = g.edges.agg(F.min("src")).collect()[0][0]
    return app(g, config={"src": source}).select(
        "vid", F.col("value").alias("dist")
    )


def _q_degree_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import degree_centrality
    from graphscope_spark.sources.tpch_graph import order_graph

    return degree_centrality(order_graph(spark, sf_dir)).select(
        "vid", F.round("centrality", 8).alias("centrality")
    )


def _q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import hits
    from graphscope_spark.sources.tpch_graph import order_graph

    return hits(order_graph(spark, sf_dir), max_iter=HITS_ROUNDS, sync_every=HITS_ROUNDS).select(
        "vid", F.round("hub", 8).alias("hub"), F.round("auth", 8).alias("auth")
    )


def _q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import kcore
    from graphscope_spark.sources.tpch_graph import order_graph

    return kcore(order_graph(spark, sf_dir), k=KCORE_K).select("vid", "in_core")


def _q_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import eigenvector_centrality
    from graphscope_spark.sources.tpch_graph import order_graph

    return eigenvector_centrality(
        order_graph(spark, sf_dir), max_iter=EV_ROUNDS, tol=None, sync_every=EV_ROUNDS
    ).select("vid", F.round("centrality", 8).alias("centrality"))


def _q_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import katz_centrality
    from graphscope_spark.sources.tpch_graph import order_graph

    return katz_centrality(
        order_graph(spark, sf_dir), alpha=KATZ_ALPHA, max_iter=KATZ_ROUNDS, tol=None, sync_every=KATZ_ROUNDS
    ).select("vid", F.round("centrality", 8).alias("centrality"))


def _q_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # WF-improved closeness over the shared landmark BFS pair table
    # (same formula as algorithms.closeness_centrality)
    pairs, n = _ms_pairs(spark, sf_dir)
    stats = pairs.groupBy("root").agg(
        F.count(F.lit(1)).alias("r"), F.sum("dist").alias("sd")
    )
    return stats.select(
        F.col("root").alias("vid"),
        F.round(
            F.when(
                (F.col("sd") > 0) & (F.lit(n) > 1),
                ((F.col("r") - 1) / F.lit(float(max(n - 1, 1))))
                * ((F.col("r") - 1) / F.col("sd")),
            ).otherwise(0.0),
            8,
        ).alias("centrality"),
    )


def _q_avg_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import avg_clustering
    from graphscope_spark.sources.tpch_graph import copurchase_graph

    return avg_clustering(copurchase_graph(spark, sf_dir)).select(
        F.round("avg_clustering", 8).alias("avg_clustering")
    )


def _q_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import transitivity
    from graphscope_spark.sources.tpch_graph import copurchase_graph

    return transitivity(copurchase_graph(spark, sf_dir)).select(
        F.round("transitivity", 8).alias("transitivity")
    )


def _q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import degree_assortativity
    from graphscope_spark.sources.tpch_graph import copurchase_graph

    return degree_assortativity(copurchase_graph(spark, sf_dir)).select(
        F.round("assortativity", 8).alias("assortativity")
    )


def _q_avg_degree_connectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import average_degree_connectivity
    from graphscope_spark.sources.tpch_graph import copurchase_graph

    return average_degree_connectivity(copurchase_graph(spark, sf_dir)).select(
        "degree", F.round("knn", 8).alias("knn")
    )


def _q_core_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import core_number
    from graphscope_spark.sources.tpch_graph import order_graph

    return core_number(order_graph(spark, sf_dir)).select("vid", "core")


def _q_attr_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import attribute_assortativity
    from graphscope_spark.sources.tpch_graph import SUPPLIER_OFFSET, order_graph

    g = order_graph(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("vid"), F.col("c_nationkey").alias("attr")
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        (F.lit(SUPPLIER_OFFSET) + F.col("s_suppkey")).alias("vid"),
        F.col("s_nationkey").alias("attr"),
    )
    return attribute_assortativity(g, cust.unionByName(supp)).select(
        F.round("attr_assortativity", 8).alias("attr_assortativity")
    )


def _q_numeric_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import numeric_assortativity
    from graphscope_spark.sources.tpch_graph import SUPPLIER_OFFSET, order_graph

    g = order_graph(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("vid"), F.col("c_nationkey").alias("attr")
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        (F.lit(SUPPLIER_OFFSET) + F.col("s_suppkey")).alias("vid"),
        F.col("s_nationkey").alias("attr"),
    )
    return numeric_assortativity(g, cust.unionByName(supp)).select(
        F.round("numeric_assortativity", 8).alias("numeric_assortativity")
    )


def _q_wcc_property(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.property_graph import tpch_property_graph, wcc_property

    pg = tpch_property_graph(spark, sf_dir)
    return wcc_property(pg).select("vlabel", "oid", "comp")


def _q_sssp_property(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.property_graph import sssp_property, tpch_property_graph

    pg = tpch_property_graph(spark, sf_dir)
    src = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .agg(F.min("c_custkey"))
        .collect()[0][0]
    )
    return sssp_property(pg, "customer", int(src)).select(
        "vlabel", "oid", F.round("dist", 6).alias("dist")
    )


def _q_bfs_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import bfs_parent
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    source = g.edges.agg(F.min("src")).collect()[0][0]
    return bfs_parent(g, source=source, directed=False).select("vid", "depth", "parent")


def _q_kshell(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import kshell
    from graphscope_spark.sources.tpch_graph import order_graph

    return kshell(order_graph(spark, sf_dir), k=KSHELL_K).select("vid", "in_shell")


def _q_sssp_avg_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import sssp_average_length
    from graphscope_spark.graph import Graph
    from graphscope_spark.sources.tpch_graph import order_graph

    g0 = order_graph(spark, sf_dir)
    g = Graph(g0.edges, g0.vertices, directed=False, num_partitions=g0.num_partitions)
    roots = g.vertices.where((F.col("vid") >= 1000000) & (F.col("vid") % 10 == 0))
    return sssp_average_length(g, sources=roots, weight="weight").select(
        F.round("avg_length", 8).alias("avg_length")
    )


def _q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled Brandes betweenness (supplier-side roots), exact vs the
    fully-unrolled forward(σ)+backward(δ) SQL oracle."""
    from graphscope_spark.algorithms import betweenness_centrality
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    roots = g.vertices.where((F.col("vid") >= 1000000) & (F.col("vid") % 10 == 0))
    return betweenness_centrality(g, roots=roots).select(
        "vid", F.round("betweenness", 6).alias("betweenness")
    )


def _q_betweenness_endpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled Brandes with NX ``endpoints=True`` accounting
    (betweenness.py:119-127 / :269-280;
    betweenness_centrality_generic.h:155-165 ctx.endpoints) — the
    round-5 driver contract for the previously pytest-only endpoints
    surface."""
    from graphscope_spark.algorithms import betweenness_centrality
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    roots = g.vertices.where((F.col("vid") >= 1000000) & (F.col("vid") % 10 == 0))
    return betweenness_centrality(g, roots=roots, endpoints=True).select(
        "vid", F.round("betweenness", 6).alias("betweenness")
    )


def _q_graphar_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphAr-layout round-trip (persistence.save_graphar/load_graphar,
    reference python/graphscope/framework/graph.py:1171-1347
    save_to/load_from): write the order graph as chunked
    vertex/adj-list/offset parquet + JSON descriptor, reload it, and
    emit per-vertex out-degree + neighbor-sum FROM THE RELOADED graph —
    exact equality with the oracle (computed from the raw tables)
    proves the round-trip preserved the vertex set and edge multiset."""
    import os
    import tempfile

    from graphscope_spark.persistence import load_graphar, save_graphar
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    path = os.path.join(
        tempfile.gettempdir(),
        f"gs_graphar_rt_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    save_graphar(g, path, chunk_size=4096)
    g2 = load_graphar(spark, path)
    deg = g2.edges.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("out_deg"), F.sum("dst").alias("nbr_sum")
    )
    return g2.vertices.select("vid").join(deg, "vid", "left").select(
        "vid",
        F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
        F.coalesce("nbr_sum", F.lit(0)).cast("long").alias("nbr_sum"),
    )


def _q_graph_serde_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERIALIZE/DESERIALIZE round-trip (persistence.save_graph/
    load_graph; reference graph.py save_to/load_from parquet path):
    in-degree + src-sum per vertex from the RELOADED graph."""
    import os
    import tempfile

    from graphscope_spark.persistence import load_graph, save_graph
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    path = os.path.join(
        tempfile.gettempdir(),
        f"gs_serde_rt_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    save_graph(g, path)
    g2 = load_graph(spark, path)
    deg = g2.edges.groupBy(F.col("dst").alias("vid")).agg(
        F.count(F.lit(1)).alias("in_deg"), F.sum("src").alias("src_sum")
    )
    return g2.vertices.select("vid").join(deg, "vid", "left").select(
        "vid",
        F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        F.coalesce("src_sum", F.lit(0)).cast("long").alias("src_sum"),
    )


def _q_consolidate_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONSOLIDATE_COLUMNS (persistence.py:143; reference
    dag_utils.py:232-280): merge two vertex property columns into one
    array column, then read the elements back out — proves the rewrite
    is lossless and ordered."""
    from graphscope_spark.graph import Graph
    from graphscope_spark.persistence import consolidate_columns

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    verts = cust.select(
        F.col("c_custkey").alias("vid"),
        F.col("c_acctbal").cast("double").alias("bal"),
        (F.col("c_custkey") % 7).cast("double").alias("m7"),
    )
    edges = spark.createDataFrame([], "src long, dst long")
    g = Graph(edges, verts, directed=True)
    g2 = consolidate_columns(g, ["bal", "m7"], "props")
    assert set(g2.vertices.columns) == {"vid", "props"}
    return g2.vertices.select(
        "vid",
        F.element_at("props", 1).alias("bal"),
        F.element_at("props", 2).alias("m7"),
        F.size("props").alias("n_props"),
    )


def _q_mutable_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MutableGraph mutation log (mutable.py:30; NX-style
    add/remove node/edge over the functional Graph): supplier→nation
    graph + a deterministic script of adds and removals, per-vertex
    degrees of the final graph.  remove_nodes_from must cascade to
    incident edges (graph.py:363-374), add_edges must add missing
    endpoints (graph.py:321-335)."""
    from graphscope_spark.graph import Graph
    from graphscope_spark.mutable import MutableGraph

    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    edges = sup.select(
        F.col("s_suppkey").alias("src"),
        (F.lit(100000) + F.col("s_nationkey")).alias("dst"),
    )
    g = Graph.from_edges(edges, directed=True)
    mg = MutableGraph.from_graph(g)
    mg.add_node(999999)                                     # isolated
    mg.add_edges_from([(999990, 100000 + i) for i in range(5)])
    mg.remove_nodes_from([100003])                          # nation 3 + cascade
    mg.remove_edge(999990, 100004)                          # one added edge back out
    out = mg.graph
    odeg = out.edges.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ideg = out.edges.groupBy(F.col("dst").alias("vid")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        out.vertices.select("vid")
        .join(odeg, "vid", "left")
        .join(ideg, "vid", "left")
        .select(
            "vid",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


def _q_pregel_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSSP through the declarative @pregel vertex-program surface
    (pregel.py:46; reference decorators.py:124-160, SSSP_Pregel example
    test_udf_app.py:104-140): init/msg/agg/apply column expressions,
    vote-to-halt when no value changes.  Same weighted order graph and
    oracle as pie_sssp/load_app_sssp, so all three program surfaces are
    pinned to one SQL contract."""
    from graphscope_spark.graph import Graph
    from graphscope_spark.pregel import pregel
    from graphscope_spark.sources.tpch_graph import order_graph

    g0 = order_graph(spark, sf_dir)
    e = g0.edges.select("src", "dst", "weight")
    sym = e.unionByName(
        e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight")
        )
    )
    g = Graph.from_edges(
        sym, directed=True, num_partitions=g0.num_partitions, weight="weight"
    )
    source = g0.edges.agg(F.min("src")).collect()[0][0]
    res = pregel(
        g,
        init=F.when(F.col("vid") == source, 0.0).otherwise(float("inf")),
        msg=F.col("value") + F.col("weight"),
        agg=F.min,
        apply=F.least(F.col("value"), F.col("msg")),
        name="pregel_sssp",
    )
    return res.select("vid", F.col("value").alias("dist"))


def _q_induced_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDUCE_SUBGRAPH driver contract (graph.py:250; reference
    dag_utils.py:709-737): restrict the order graph to even vids via
    endpoint semi-joins, then per-vertex in/out degrees of the induced
    graph — checks both the vertex restriction and the edge filter."""
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    keep = g.vertices.where(F.col("vid") % 2 == 0)
    sub = g.induce_subgraph(keep)
    return (
        sub.out_degrees()
        .join(sub.in_degrees(), "vid")
        .select("vid", "out_deg", "in_deg")
    )


def _q_graph_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quotient/contract graph op (graph.py:265; reference analog: the
    Louvain phase-2 community contraction and the Common-Crawl
    host-graph product): customers bucket to vid % 97, suppliers to
    1000000 + vid % 53; parallel-edge weights sum."""
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    mapping = g.vertices.select(
        "vid",
        F.when(F.col("vid") < 1000000, F.col("vid") % 97)
        .otherwise(F.lit(1000000) + F.col("vid") % 53)
        .alias("gid"),
    )
    cg = g.contract(mapping)
    return cg.edges.select(
        "src", "dst", F.col("weight").cast("double").alias("w")
    )


def _q_pagerank_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint/resume contract (north rule: runs resume
    mid-algorithm; superstep.py:301-316): rounds 0-1 run into a
    checkpoint dir, then a FRESH runner resumes from the latest
    on-disk iteration (validated by _SUCCESS) and completes rounds
    2-4.  The final ranks must be bit-equal to the straight 5-round
    run, i.e. the same oracle as the plain pagerank key."""
    import tempfile

    from graphscope_spark.algorithms import pagerank
    from graphscope_spark.sources.tpch_graph import order_graph
    from graphscope_spark.superstep import SuperstepRunner

    g = order_graph(spark, sf_dir)
    ck = tempfile.mkdtemp(prefix="gs_resume_")
    r1 = SuperstepRunner(spark, "pagerank", checkpoint_dir=ck, resume=False)
    pagerank(g, alpha=ALPHA, max_iter=2, tol=None, runner=r1, sync_every=1).count()
    r2 = SuperstepRunner(spark, "pagerank", checkpoint_dir=ck, resume=True)
    res = pagerank(g, alpha=ALPHA, max_iter=PR_ROUNDS, tol=None, runner=r2, sync_every=1)
    return res.select("vid", F.round("rank", 8).alias("pr"))


def _q_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous Louvain (integer modularity scores),
    exact vs the fully-unrolled 2-phase/5-round SQL oracle (also pinned
    vs the Python twin in tests/test_louvain.py)."""
    from graphscope_spark.algorithms import louvain
    from graphscope_spark.sources.tpch_graph import copurchase_graph

    return louvain(
        copurchase_graph(spark, sf_dir), max_rounds=5, max_phases=2
    ).select("vid", "community")


def _q_voterank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import voterank
    from graphscope_spark.sources.tpch_graph import copurchase_graph

    return voterank(copurchase_graph(spark, sf_dir), num_seeds=VOTERANK_SEEDS).select(
        "vid", F.col("rank").cast("int").alias("rank")
    )


def _supplier_roots(g):
    return g.vertices.where((F.col("vid") >= 1000000) & (F.col("vid") % 10 == 0))


# Five queries (closeness, harmonic, eccentricity, apsp_sampled,
# diameter) aggregate the SAME unweighted multi-source BFS from the
# same landmark set.  Compute the (root, vid, dist) pair table once per
# (session, sf_dir) and share it — the driver runs all queries in one
# session, so this is a legitimate materialized intermediate, the same
# reuse a production pipeline would get from caching the landmark
# sweep.  Keyed by session id so a fresh session rebuilds.
_MS_CACHE: dict = {}


def _ms_pairs(spark: SparkSession, sf_dir: str) -> "DataFrame":
    from graphscope_spark.algorithms import multi_source_distances
    from graphscope_spark.sources.tpch_graph import order_graph

    key = (id(spark), sf_dir)
    if key not in _MS_CACHE:
        g = order_graph(spark, sf_dir)
        pairs = multi_source_distances(
            g, _supplier_roots(g), weight=None, directed=False
        ).localCheckpoint(eager=True)
        n = g.num_vertices()
        _MS_CACHE.clear()  # hold at most one sf_dir's sweep
        _MS_CACHE[key] = (pairs, n)
    return _MS_CACHE[key]


def _q_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs, _n = _ms_pairs(spark, sf_dir)
    per = pairs.groupBy("root").agg(
        F.sum(
            F.when(F.col("vid") == F.col("root"), 0.0).otherwise(1.0 / F.col("dist"))
        ).alias("c")
    )
    return per.select(
        F.col("root").alias("vid"), F.round("c", 8).alias("centrality")
    )


def _q_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs, _n = _ms_pairs(spark, sf_dir)
    per = pairs.groupBy("root").agg(F.max("dist").cast("long").alias("ecc"))
    return per.select(F.col("root").alias("vid"), "ecc")


def _q_apsp(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs, _n = _ms_pairs(spark, sf_dir)
    return pairs.select("root", "vid", "dist")


def _q_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs, _n = _ms_pairs(spark, sf_dir)
    return pairs.agg(F.max("dist").cast("long").alias("diameter"))


def _q_apsp_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL unsampled APSP (reference apps/apsp/, registry
    .gs_conf.yaml:220-225): exact BFS distances from EVERY vertex of
    the thinned order graph, digested per root as (ecc, sum_dist,
    reachable) so the contract row count stays |V| while the underlying
    computation is genuinely all-pairs.  Runs root-parallel over a
    broadcast CSR (all_pairs_digest) — the |V|x|V| pair table is never
    materialized.  Raw (root, vid, dist) pairs, if needed:
    multi_source_distances(g, roots=None)."""
    from graphscope_spark.algorithms import all_pairs_digest
    from graphscope_spark.sources.tpch_graph import thin_order_graph

    g = thin_order_graph(spark, sf_dir, BIC_MOD)
    return all_pairs_digest(g, weight=None, directed=False).select(
        "vid",
        F.col("ecc").cast("long").alias("ecc"),
        F.col("sum_dist").cast("long").alias("sum_dist"),
        F.col("reachable").alias("reachable"),
    )


def _q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import personalized_pagerank
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    return personalized_pagerank(
        g, sources=_supplier_roots(g), alpha=ALPHA, max_iter=PPR_ROUNDS,
        sync_every=PPR_ROUNDS,
    ).select("vid", F.round("rank", 8).alias("pr"))


def _q_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import maximal_independent_set
    from graphscope_spark.sources.tpch_graph import copurchase_graph

    return maximal_independent_set(copurchase_graph(spark, sf_dir)).select(
        "vid", "in_mis"
    )


def _q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import strongly_connected_components
    from graphscope_spark.sources.tpch_graph import linenumber_graph

    return strongly_connected_components(linenumber_graph(spark, sf_dir)).select(
        "vid", "scc"
    )


def _q_four_clique(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import four_clique_count
    from graphscope_spark.sources.tpch_graph import copurchase_graph, memo_oriented

    g = copurchase_graph(spark, sf_dir)
    return four_clique_count(
        g, eo=memo_oriented(spark, sf_dir, "copurchase", g)
    ).select("k4")


def _q_clustering_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms.clustering import clustering_directed
    from graphscope_spark.sources.tpch_graph import linenumber_graph

    return clustering_directed(linenumber_graph(spark, sf_dir)).select(
        "vid", F.round("clustering", 8).alias("clustering")
    )


def _q_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms.biconnectivity import bridges
    from graphscope_spark.sources.tpch_graph import thin_order_graph

    return bridges(thin_order_graph(spark, sf_dir, BIC_MOD))


def _q_articulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms.biconnectivity import articulation_points
    from graphscope_spark.sources.tpch_graph import thin_order_graph

    return articulation_points(thin_order_graph(spark, sf_dir, BIC_MOD))


def _q_bcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms.biconnectivity import biconnected_components
    from graphscope_spark.sources.tpch_graph import thin_order_graph

    return biconnected_components(thin_order_graph(spark, sf_dir, BIC_MOD))


def _q_mm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms.matching import maximal_matching
    from graphscope_spark.sources.tpch_graph import thin_order_graph

    return maximal_matching(thin_order_graph(spark, sf_dir, BIC_MOD))


def _q_min_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms.matching import min_vertex_cover
    from graphscope_spark.sources.tpch_graph import thin_order_graph

    return min_vertex_cover(thin_order_graph(spark, sf_dir, BIC_MOD))


def _q_domset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms.matching import min_dominating_set
    from graphscope_spark.sources.tpch_graph import thin_order_graph

    return min_dominating_set(thin_order_graph(spark, sf_dir, BIC_MOD))


def _q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import k_truss
    from graphscope_spark.sources.tpch_graph import copurchase_graph

    return k_truss(copurchase_graph(spark, sf_dir), k=KTRUSS_K).select("src", "dst")


def _q_subgraph_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import subgraph_census
    from graphscope_spark.sources.tpch_graph import copurchase_graph, memo_oriented

    g = copurchase_graph(spark, sf_dir)
    return subgraph_census(
        g, eo=memo_oriented(spark, sf_dir, "copurchase", g)
    ).select("kind", "cnt")


def _q_triangle_census_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direction flags come from the directed graph; the oriented
    triangle table is SHARED with four/five_clique + subgraph_census
    under the "copurchase" memo key: the directed graph's undirected
    support is exactly the co-purchase pair set (two distinct parts
    co-occur in an order iff some line ordering between them exists),
    and orientation depends only on that support's degrees."""
    from graphscope_spark.algorithms import directed_triangle_census
    from graphscope_spark.sources.tpch_graph import (
        copurchase_directed_graph,
        copurchase_graph,
        memo_oriented,
    )

    g = copurchase_directed_graph(spark, sf_dir)
    eo = memo_oriented(
        spark, sf_dir, "copurchase", copurchase_graph(spark, sf_dir)
    )
    return directed_triangle_census(g, eo=eo).select("kind", "cnt")


def _q_densest_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import densest_subgraph_2approx
    from graphscope_spark.sources.tpch_graph import order_graph

    return densest_subgraph_2approx(order_graph(spark, sf_dir)).select(
        "nv", "ne", F.round("density", 8).alias("density")
    )


def _q_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import link_prediction
    from graphscope_spark.sources.tpch_graph import copurchase_graph

    return link_prediction(
        copurchase_graph(spark, sf_dir),
        a_filter=(F.col("a") % LINKPRED_MOD == 0),
    ).select(
        "a",
        "b",
        "cn",
        F.round("jaccard", 8).alias("jaccard"),
        F.round("adamic_adar", 8).alias("adamic_adar"),
        "pref_attach",
    )


def _q_node_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import node_boundary
    from graphscope_spark.sources.tpch_graph import copurchase_graph

    g = copurchase_graph(spark, sf_dir)
    s = g.vertices.where(F.col("vid") % BOUNDARY_MOD == 0)
    return node_boundary(g, s).select("vid")


def _q_edge_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import edge_boundary
    from graphscope_spark.sources.tpch_graph import copurchase_graph

    g = copurchase_graph(spark, sf_dir)
    s = g.vertices.where(F.col("vid") % BOUNDARY_MOD == 0)
    return edge_boundary(g, s).select("src", "dst")


def _q_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest of the weighted order graph.  Exact
    DuckDB oracle: fully-unrolled Borůvka (``_msf_sql``) mirroring the
    Spark kernel's deterministic (w, src, dst) tie-break; also pinned
    vs a sequential Kruskal in tests/test_round2_ops.py."""
    from graphscope_spark.algorithms import minimum_spanning_forest
    from graphscope_spark.sources.tpch_graph import order_graph

    return minimum_spanning_forest(order_graph(spark, sf_dir)).select(
        "src", "dst", F.round("weight", 8).alias("weight")
    )


def _q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.dedup import near_duplicate_groups

    return near_duplicate_groups(_docs(spark, sf_dir), threshold=NEARDUP_T).select(
        "doc_id", "canonical_id", "is_duplicate"
    )


def _q_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.similarity import cosine_near_duplicates

    return cosine_near_duplicates(
        _emb(spark, sf_dir),
        threshold=EMB_NEARDUP_T,
        bands=EMB_BANDS,
        planes_per_band=EMB_PLANES_PER_BAND,
    ).select("a", "b", F.round("cosine", 6).alias("cosine"))


def _q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.dedup import simhash_near_duplicates

    return simhash_near_duplicates(_docs(spark, sf_dir), max_hamming=3).select(
        "a", "b", F.col("hamming").cast("long").alias("hamming")
    )


def _q_doc_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.text import bpe_token_count

    return _docs(spark, sf_dir).select(
        "doc_id", bpe_token_count("text").alias("n_bpe_tokens")
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _q_iceberg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents written through the Iceberg-layout table format
    (create one half, append the other — two snapshots), then scanned
    back via manifest planning and aggregated.  The oracle aggregates
    the source table directly, so any loss/dup/corruption in the
    snapshot+manifest round-trip breaks parity."""
    import shutil
    import tempfile

    from graphscope_spark.sources.iceberg import IcebergishTable

    docs = _docs(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="gs_iceberg_")
    shutil.rmtree(tmp, ignore_errors=True)
    path = f"{tmp}/documents"
    t = IcebergishTable.create(
        spark, path, docs.where(F.col("doc_id") % 2 == 0), partition_by=["lang"]
    )
    t.append(docs.where(F.col("doc_id") % 2 == 1))
    return (
        t.scan()
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_id"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select("lang", "n_docs", "sum_id", "sum_chars")
    )


def _q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.text import repetition_features

    return repetition_features(_docs(spark, sf_dir)).select(
        "doc_id",
        F.round("top_bigram_frac", 8).alias("top_bigram_frac"),
        F.round("dup_trigram_frac", 8).alias("dup_trigram_frac"),
    )


def _q_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.corpus import training_corpus

    return training_corpus(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", F.round("quality_score", 8).alias("quality_score")
    )


def _q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization over deterministically-synthesized messy
    URLs (mixed case, default ports, fragments, bare-authority slashes)
    — both engines build the identical strings from orders, so the
    parity check isolates the canonicalization semantics."""
    from graphscope_spark.functions.urls import canonical_url

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    url = F.concat(
        F.lit("HTTP://Site"),
        (F.col("o_custkey") % 50).cast("string"),
        F.lit(".Example.com"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("/")).otherwise(
            F.concat(F.lit("/P/"), F.col("o_orderkey").cast("string"))
        ),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("#Frag")).otherwise(F.lit("")),
    )
    return (
        o.select(canonical_url(url).alias("cu"))
        .groupBy("cu")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_URL_CANONICAL_SQL = r"""
  with u as (
    select 'HTTP://Site' || cast(o_custkey % 50 as varchar) || '.Example.com'
           || case when o_orderkey % 3 = 0 then ':80' else '' end
           || case when o_orderkey % 5 = 0 then '/'
                   else '/P/' || cast(o_orderkey as varchar) end
           || case when o_orderkey % 2 = 0 then '#Frag' else '' end as url
    from orders
  ),
  nf as (select regexp_replace(url, '#.*$', '') as nfu from u),
  parts as (
    select nfu,
           lower(regexp_extract(nfu,
             '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$', 1)) as scheme,
           lower(regexp_extract(nfu,
             '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$', 2)) as host,
           regexp_extract(nfu,
             '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$', 3) as rest
    from nf
  ),
  canon as (
    select case when scheme = '' then nfu
                else scheme || '://' ||
                     case when scheme = 'http'
                          then regexp_replace(host, ':80$', '')
                          when scheme = 'https'
                          then regexp_replace(host, ':443$', '')
                          else host end ||
                     regexp_replace(rest, '^/$', '') end as cu
    from parts
  )
  select cu, count(*) as n from canon group by 1
"""


def _q_doc_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction over documents augmented with deterministic
    synthetic emails/urls/number runs built from doc_id — both engines
    build the identical augmented string, so parity isolates the
    ordered url→email→number redaction chain and its counts."""
    from graphscope_spark.functions.text import redact, redaction_counts

    d = _docs(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
        F.lit(" visit https://site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example/p/"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" ref 123456"), F.col("doc_id").cast("string")),
        ).otherwise(F.lit("")),
    )
    base = d.select("doc_id", aug.alias("t"))
    nu, ne, nn = redaction_counts("t")
    return base.select(
        "doc_id",
        nu.cast("long").alias("n_urls"),
        ne.cast("long").alias("n_emails"),
        nn.cast("long").alias("n_nums"),
        F.md5(redact("t")).alias("fp"),
    )


def _doc_redact_sql() -> str:
    from graphscope_spark.functions import specs

    u, e, n = specs.REDACT_URL_RE, specs.REDACT_EMAIL_RE, specs.REDACT_NUM_RE
    tu, te, tn = (
        specs.REDACT_TOKENS["url"],
        specs.REDACT_TOKENS["email"],
        specs.REDACT_TOKENS["num"],
    )
    return rf"""
      with a as (
        select doc_id,
               text || ' contact user' || cast(doc_id as varchar)
                    || '@example.com'
                    || ' visit https://site' || cast(doc_id % 7 as varchar)
                    || '.example/p/' || cast(doc_id as varchar)
                    || case when doc_id % 3 = 0
                            then ' ref 123456' || cast(doc_id as varchar)
                            else '' end as t
        from documents
      ),
      s1 as (
        select doc_id,
               len(regexp_extract_all(t, '{u}')) as n_urls,
               regexp_replace(t, '{u}', '{tu}', 'g') as t1
        from a
      ),
      s2 as (
        select doc_id, n_urls,
               len(regexp_extract_all(t1, '{e}')) as n_emails,
               regexp_replace(t1, '{e}', '{te}', 'g') as t2
        from s1
      ),
      s3 as (
        select doc_id, n_urls, n_emails,
               len(regexp_extract_all(t2, '{n}')) as n_nums,
               regexp_replace(t2, '{n}', '{tn}', 'g') as t3
        from s2
      )
      select doc_id,
             cast(n_urls as bigint) as n_urls,
             cast(n_emails as bigint) as n_emails,
             cast(n_nums as bigint) as n_nums,
             md5(t3) as fp
      from s3
    """


def _q_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.text import token_count

    return _docs(spark, sf_dir).select(
        "doc_id", token_count("text").alias("n_tokens")
    )


def _q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.text import fingerprint

    return _docs(spark, sf_dir).select("doc_id", fingerprint("text").alias("fp"))


def _q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.text import quality_features

    return quality_features(_docs(spark, sf_dir)).select(
        "doc_id",
        "n_tokens",
        F.round("uniq_token_ratio", 8).alias("uniq_token_ratio"),
        F.round("stopword_ratio", 8).alias("stopword_ratio"),
        F.round("quality_score", 8).alias("quality_score"),
    )


def _q_doc_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.text import lang_id

    return lang_id(_docs(spark, sf_dir)).select("doc_id", "pred_lang")


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.dedup import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir)).select(
        "doc_id", "canonical_id", "is_duplicate"
    )


def _q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions import specs
    from graphscope_spark.functions.dedup import minhash_signatures, shingles

    sig = minhash_signatures(shingles(_docs(spark, sf_dir)))
    return sig.select("doc_id", *[f"mh_{j}" for j in range(specs.MINHASH_K)])


def _q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    sig = minhash_signatures(shingles(_docs(spark, sf_dir)))
    return lsh_candidate_pairs(sig).select("a", "b")


def _q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe n-gram Jaccard: exact verification restricted to LSH
    candidate pairs (dedup.jaccard_pairs) — the 10^12-document plan.
    The all-pairs variant (dedup.jaccard_all_pairs) stays available as
    a library call but is never the exported contract query: a single
    boilerplate shingle shared by k docs costs k² join rows there."""
    from graphscope_spark.functions.dedup import jaccard_pairs

    return jaccard_pairs(_docs(spark, sf_dir)).select(
        "a", "b", F.round("jaccard", 8).alias("jaccard")
    )


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.dedup import simhash

    return simhash(_docs(spark, sf_dir)).select("doc_id", "simhash")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.similarity import cosine_topk

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < KNN_QUERIES)
    return cosine_topk(emb, q, k=KNN_K).select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("int").alias("rank"),
        F.round("cosine", 6).alias("cosine"),
    )


def _q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.similarity import lsh_topk

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < KNN_QUERIES)
    return lsh_topk(emb, q, k=KNN_K, planes=LSH_PLANES).select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("int").alias("rank"),
        F.round("cosine", 6).alias("cosine"),
    )


def _q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.similarity import ivf_topk

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < KNN_QUERIES)
    return ivf_topk(emb, q, k=KNN_K, stride=IVF_STRIDE, nprobe=IVF_NPROBE).select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("int").alias("rank"),
        F.round("cosine", 6).alias("cosine"),
    )


def _q_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.streaming.events import windowed_event_counts

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_event_counts(events).select(
        "win_start",
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


def _q_articlerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import articlerank
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    return articlerank(
        g, damping=ALPHA, max_iter=AR_ROUNDS, sync_every=AR_ROUNDS
    ).select("vid", F.round("rank", 8).alias("ar"))


def _q_degeneracy_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import degeneracy_ordering
    from graphscope_spark.sources.tpch_graph import order_graph

    return degeneracy_ordering(order_graph(spark, sf_dir)).select(
        "vid", F.col("rank").alias("rnk")
    )


def _q_onion_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import onion_layers
    from graphscope_spark.sources.tpch_graph import order_graph

    return onion_layers(order_graph(spark, sf_dir)).select("vid", "layer")


def _q_kcore_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import kcore_size
    from graphscope_spark.sources.tpch_graph import order_graph

    return kcore_size(order_graph(spark, sf_dir), k=KCORE_K)


def _q_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import graph_coloring
    from graphscope_spark.sources.tpch_graph import thin_copurchase_graph

    return graph_coloring(thin_copurchase_graph(spark, sf_dir, COLOR_MOD)).select(
        "vid", "color"
    )


def _q_lpa_by_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import lpa_by_color
    from graphscope_spark.sources.tpch_graph import thin_copurchase_graph

    return lpa_by_color(thin_copurchase_graph(spark, sf_dir, COLOR_MOD)).select(
        "vid", "label"
    )


def _q_min_edge_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import min_edge_cover
    from graphscope_spark.sources.tpch_graph import thin_order_graph

    return min_edge_cover(thin_order_graph(spark, sf_dir, BIC_MOD))


def _q_k_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import k_center
    from graphscope_spark.sources.tpch_graph import order_graph

    return k_center(order_graph(spark, sf_dir), k=KC_K).select("vid", "dis")


def _q_fluid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import fluid_communities
    from graphscope_spark.sources.tpch_graph import order_graph

    return fluid_communities(
        order_graph(spark, sf_dir), s=FLUID_S, rounds=FLUID_ROUNDS
    ).select("vid", "lab")


def _thin_cpd_graph(spark: SparkSession, sf_dir: str):
    from graphscope_spark.graph import Graph
    from graphscope_spark.sources.tpch_graph import (
        _memo_graph,
        copurchase_directed_edges,
    )
    from graphscope_spark.superstep import stats_barrier

    def build() -> Graph:
        e = copurchase_directed_edges(spark, sf_dir).where(
            (F.col("src") + F.col("dst")) % 7 == 0
        )
        return Graph.from_edges(
            stats_barrier(e), directed=True, num_partitions=32
        )

    return _memo_graph(spark, sf_dir, "thin_cpd:7", build)


def _q_five_clique(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms.kclique import k_clique_count
    from graphscope_spark.sources.tpch_graph import (
        memo_oriented,
        thin_copurchase_graph,
    )

    g = thin_copurchase_graph(spark, sf_dir, COLOR_MOD)
    return k_clique_count(
        g, k=5, eo=memo_oriented(spark, sf_dir, f"thin_copurchase:{COLOR_MOD}", g)
    ).select("kc")


def _q_sssp_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms.sssp import sssp_delta_stepping
    from graphscope_spark.sources.tpch_graph import order_graph
    from graphscope_spark.graph import Graph

    g0 = order_graph(spark, sf_dir)
    g = Graph(g0.edges, g0.vertices, directed=False, num_partitions=g0.num_partitions)
    source = g.edges.agg(F.min("src")).collect()[0][0]
    return sssp_delta_stepping(g, source=source, weight="weight").select(
        "vid", "dist"
    )


def _q_sampling_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import sampling_path

    return sampling_path(
        _thin_cpd_graph(spark, sf_dir), length=SPATH_LEN, limit=SPATH_LIMIT
    )


def _q_node2vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node2vec p/q-biased second-order walks (walks.py) with integer
    weights wr=1, wc=2, wf=1 (p = q = 2): higher-order array functions
    compute the biased pick JVM-side; the DuckDB oracle replays it
    with per-step windowed cumulative weights."""
    from graphscope_spark.algorithms.walks import node2vec_walks

    g = _thin_cpd_graph(spark, sf_dir)
    starts = (
        g.distinct_edges()
        .where(F.col("src") % RWALK_MOD == 0)
        .select(F.col("src").alias("start"))
        .distinct()
    )
    return node2vec_walks(
        g, length=RWALK_LEN, wr=1, wc=2, wf=1, seed=RWALK_SEED, starts=starts
    )


def _q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk/node2vec-style uniform walk sampling (walks.py) — LCG
    hash picks each hop so the DuckDB recursive-CTE oracle replays the
    identical walks."""
    from graphscope_spark.algorithms import random_walks

    g = _thin_cpd_graph(spark, sf_dir)
    starts = (
        g.distinct_edges()
        .where(F.col("src") % RWALK_MOD == 0)
        .select(F.col("src").alias("start"))
        .distinct()
    )
    return random_walks(g, length=RWALK_LEN, seed=RWALK_SEED, starts=starts)


def _q_is_simple_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import is_simple_path, sampling_path

    g = _thin_cpd_graph(spark, sf_dir)
    first = sampling_path(g, length=SPATH_LEN, limit=1).collect()[0]
    return is_simple_path(g, [first[f"v{i}"] for i in range(SPATH_LEN + 1)])


def _q_all_simple_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import all_simple_paths
    from graphscope_spark.sources.tpch_graph import thin_order_graph

    g = thin_order_graph(spark, sf_dir, BIC_MOD)
    lo = g.vertices.agg(F.min("vid")).collect()[0][0]
    sym = g.symmetrized()
    hi = sym.where(F.col("src") == lo).agg(F.max("dst")).collect()[0][0]
    return all_simple_paths(g, lo, hi, cutoff=ASP_CUTOFF)


def _q_dfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFS preorder over the thinned order graph.  Exact DuckDB
    oracle: a recursive CTE replays the sequential walk step-for-step
    (``_dfs_preorder_sql``)."""
    from graphscope_spark.algorithms import dfs_preorder
    from graphscope_spark.sources.tpch_graph import thin_order_graph

    return dfs_preorder(thin_order_graph(spark, sf_dir, BIC_MOD)).select(
        "vid", "rank"
    )


def _sssp_path_sql() -> str:
    """Shortest-path tree over the weighted order graph: the sssp
    distance chain, then pred(v) = min u with dist(u)+w = dist(v)
    (exact double equality — both sides are the same IEEE additions)."""
    inf = "1e18"
    body = _sssp_sql()
    head, _tail = body.rsplit("\nselect", 1)
    return (
        head
        + f""",
        d as materialized (select vid, dist from s{SSSP_UNROLL}),
        preds as materialized (
          select e.dst as vid, min(e.src) as pred
          from sym e
          join d ds on ds.vid = e.src
          join d dd on dd.vid = e.dst
          where ds.dist < {inf} and ds.dist + e.w = dd.dist
          group by e.dst
        )
        select case when d.vid = (select s from srcv) then d.vid
                    else p.pred end as pred,
               d.vid, d.dist
        from d left join preds p using(vid)
        where d.dist < {inf}"""
    )


def _has_path_sql() -> str:
    """Directed reachability on the linenumber digraph from min(src):
    frontier closure unrolled past the probed quiesce depth (12 rounds
    at sf0.01), then two membership probes."""
    parts = [
        f"with de as materialized ({SQL_DLG_EDGES})",
        "srcv as materialized (select min(src) as s from de)",
        "r0 as materialized (select s as vid from srcv)",
    ]
    for k in range(HASPATH_UNROLL):
        parts.append(
            f"""r{k + 1} as materialized (
              select distinct vid from (
                select vid from r{k}
                union all
                select e.dst from r{k} x join de e on e.src = x.vid
              )
            )"""
        )
    last = f"r{HASPATH_UNROLL}"
    return (
        ",\n".join(parts)
        + f""",
        t1 as materialized (
          select max(dst) as t from de where src = (select s from srcv)
        ),
        t2 as materialized (select max(dst) as t from de)
        select 'direct' as which,
               exists(select 1 from {last} where vid = (select t from t1)) as has_path
        union all
        select 'far',
               exists(select 1 from {last} where vid = (select t from t2))"""
    )


def _lcc_directed_sql() -> str:
    """LDBC directed LCC over the linenumber digraph: undirected
    neighborhood, directed edges among neighbors, denominator d(d-1)."""
    return f"""
      with de as materialized ({SQL_DLG_EDGES}),
      nbr as materialized (
        select src as vid, dst as u from de union select dst, src from de
      ),
      verts as materialized (select distinct vid from nbr),
      deg as materialized (select vid, count(*) as d from nbr group by vid),
      tri as materialized (
        select n1.vid, count(*) as t
        from de e
        join nbr n1 on n1.u = e.src
        join nbr n2 on n2.vid = n1.vid and n2.u = e.dst
        group by n1.vid
      )
      select v.vid,
             round(case when coalesce(g.d, 0) >= 2
                   then coalesce(t.t, 0) * 1.0 / (g.d * (g.d - 1))
                   else 0.0 end, 8) as lcc
      from verts v
      left join deg g using(vid)
      left join tri t using(vid)
    """


def _random_multi_bfs_sql() -> str:
    """Multi-source BFS from the RMB_K pseudo-random (md5-ordered)
    roots over the symmetrized order graph; per-vertex max depth over
    roots, -1 when unreached by all (random-multi-bfs.h res = max d[i])."""
    parts = [
        f"with edges as materialized ({SQL_EDGES})",
        f"verts as materialized ({SQL_VERTS})",
        f"sym as materialized ({SQL_SYM})",
        f"""roots as materialized (
          select vid from verts order by md5(cast(vid as varchar)) limit {RMB_K}
        )""",
        "d0 as materialized (select vid as root, vid, 0 as d from roots)",
    ]
    for k in range(RMB_UNROLL):
        parts.append(
            f"""d{k + 1} as materialized (
              select root, vid, min(d) as d from (
                select root, vid, d from d{k}
                union all
                select x.root, s.dst as vid, x.d + 1 as d
                from d{k} x join sym s on x.vid = s.src
              ) group by root, vid
            )"""
        )
    return (
        ",\n".join(parts)
        + f""",
        res as materialized (
          select vid, max(d) as res from d{RMB_UNROLL} group by vid
        )
        select v.vid, cast(coalesce(r.res, -1) as bigint) as res
        from verts v left join res r using(vid)"""
    )


def _q_sssp_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import sssp_path
    from graphscope_spark.graph import Graph
    from graphscope_spark.sources.tpch_graph import order_graph

    g0 = order_graph(spark, sf_dir)
    g = Graph(g0.edges, g0.vertices, directed=False, num_partitions=g0.num_partitions)
    source = g.edges.agg(F.min("src")).collect()[0][0]
    return sssp_path(g, source=source, weight="weight").select("pred", "vid", "dist")


def _q_has_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.sources.tpch_graph import linenumber_graph

    g = linenumber_graph(spark, sf_dir)
    row = g.edges.agg(F.min("src").alias("s"), F.max("dst").alias("far")).collect()[0]
    source, far = row["s"], row["far"]
    direct = (
        g.edges.where(F.col("src") == source).agg(F.max("dst")).collect()[0][0]
    )
    from graphscope_spark.algorithms import sssp

    d = sssp(g, source=source, weight=None)
    a = d.where(F.col("vid") == direct).select(
        F.lit("direct").alias("which"),
        (F.col("dist") != float("inf")).alias("has_path"),
    )
    b = d.where(F.col("vid") == far).select(
        F.lit("far").alias("which"),
        (F.col("dist") != float("inf")).alias("has_path"),
    )
    return a.unionByName(b)


def _q_lcc_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import lcc_directed
    from graphscope_spark.sources.tpch_graph import linenumber_graph

    return lcc_directed(linenumber_graph(spark, sf_dir)).select(
        "vid", F.round("lcc", 8).alias("lcc")
    )


def _q_random_multi_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.algorithms import random_multi_bfs
    from graphscope_spark.sources.tpch_graph import order_graph

    return random_multi_bfs(
        order_graph(spark, sf_dir), k=RMB_K, directed=False
    ).select("vid", "res")


# ---------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the customer→supplier order graph."""
    return _q_pagerank(spark, "/root/testdata/sf0.001")


def _q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style segment-level boilerplate removal (dedup.segment_dedup):
    5-token segments, drop those present in >1 distinct documents,
    reassemble survivors in document order."""
    from graphscope_spark.functions.dedup import segment_dedup

    return segment_dedup(
        _docs(spark, sf_dir), seg_tokens=5, max_doc_freq=1
    ).select("doc_id", "clean_text", "kept_segs", "dropped_segs")


def _q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test hash split (sampling.corpus_split):
    md5-bucket thresholds, pure column expression — no shuffle."""
    from graphscope_spark.functions.sampling import corpus_split

    return corpus_split(_docs(spark, sf_dir), seed=SPLIT_SEED).select(
        "doc_id", "split"
    )


def _q_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli-by-quality importance sampling
    (sampling.quality_resample): keep each doc with probability equal
    to its 8-decimal-rounded quality score."""
    from graphscope_spark.functions.sampling import quality_resample
    from graphscope_spark.functions.text import quality_features

    scored = quality_features(_docs(spark, sf_dir)).select(
        "doc_id", F.round("quality_score", 8).alias("quality_score")
    )
    return quality_resample(scored, seed=RESAMPLE_SEED).select(
        "doc_id", "quality_score"
    )


def _q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixture sampling (sampling.domain_mix):
    re-weight per-language shares toward count^MIX_ALPHA; the dominant
    language is downsampled by (c_min/c_d)^(1-alpha), decided per-doc
    by the deterministic md5 bucket."""
    from graphscope_spark.functions.sampling import domain_mix

    return domain_mix(
        _docs(spark, sf_dir), alpha=MIX_ALPHA, domain_col="lang", seed=MIX_SEED
    ).select("doc_id", "lang", "domain_rate")


def _q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination scan (sampling.contamination): corpus
    docs sharing a 3-word shingle with the benchmark slice
    (doc_id % CONTAM_MOD == 0); benchmark shingles broadcast."""
    from graphscope_spark.functions.sampling import contamination

    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % CONTAM_MOD == 0)
    rest = docs.where(F.col("doc_id") % CONTAM_MOD != 0)
    return contamination(rest, bench)


def _q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concatenate-and-chunk packing
    (sampling.pack_sequences): per-shard token stream chunked every
    PACK_BUDGET tokens; bin = chunk of the doc's first token."""
    from graphscope_spark.functions.sampling import pack_sequences

    return pack_sequences(
        _docs(spark, sf_dir), budget=PACK_BUDGET, shards=PACK_SHARDS
    )


def _q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier scheduling over deterministic synthesized candidates
    (url/host/score derived identically in both engines from orders)."""
    from graphscope_spark.functions.urls import crawl_frontier

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cand = o.select(
        F.concat(F.lit("u"), F.col("o_orderkey").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("o_custkey") % 40).cast("string")).alias("host"),
        F.col("o_totalprice").alias("score"),
    )
    return crawl_frontier(cand, host_quota=3, budget=100)


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.sampling import weighted_sample

    return weighted_sample(_docs(spark, sf_dir), k=50, weight_col="n_chars")


def _q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.text import length_quantiles

    return length_quantiles(_docs(spark, sf_dir))


def _q_hll_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global distinct-token estimate over documents via the
    md5-deterministic HLL — the oracle rebuilds the identical sketch in
    DuckDB, so this checks every register, not just 'close enough'."""
    from graphscope_spark.functions.sketch import hll_cardinality
    from graphscope_spark.functions.text import tokens

    toks = _docs(spark, sf_dir).where(
        F.length(F.trim("text")) > 0
    ).select(F.explode(tokens("text")).alias("token"))
    return hll_cardinality(toks, "token")


def _q_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.sketch import hll_cardinality

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hll_cardinality(ev, "user_id", group_cols=["event_type"])


def _q_anchor_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inbound anchor-text profile over a deterministic (dst, anchor)
    occurrence table synthesized identically in both engines from
    orders (the pandas-UDF html extraction itself is pytest-verified
    byte-identically on generated pages; this checks the profile op)."""
    from graphscope_spark.functions.ranking import anchor_profile

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w1 = F.element_at(
        F.array(*[F.lit(x) for x in ["click", "here", "link", "page", "ref"]]),
        (F.col("o_orderkey") % 5 + 1).cast("int"),
    )
    w2 = F.element_at(
        F.array(*[F.lit(x) for x in ["alpha", "beta", "gamma", "delta"]]),
        (F.col("o_custkey") % 4 + 1).cast("int"),
    )
    anchors = o.select(
        F.concat(F.lit("site"), (F.col("o_custkey") % 100).cast("string")).alias(
            "dst_url"
        ),
        F.concat(w1, F.lit(" "), w2).alias("anchor"),
    )
    return anchor_profile(anchors, topk=3)


def _q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.ranking import tf_idf

    return tf_idf(_docs(spark, sf_dir), topk=5)


_BM25_QUERY = ["spark", "hash", "window"]


def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.ranking import bm25

    return bm25(_docs(spark, sf_dir), _BM25_QUERY, topk=20)


def _q_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphscope_spark.functions.ranking import ngram_stats

    return ngram_stats(_docs(spark, sf_dir), n=2, topk=100)


def _q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication signal (Lee et al. 2022 shape): per
    doc, the count and fraction of k-token spans whose hash occurs in
    >= 2 distinct documents.  One groupBy on the span hash + one join
    back — no self-join (a boilerplate span shared by a million docs is
    one aggregate row, not 10^12 pairs)."""
    from graphscope_spark.functions.dedup import duplicate_spans

    return duplicate_spans(_docs(spark, sf_dir)).orderBy("doc_id")


def _q_host_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level quality gate: per-host mean quality_score (one skew-
    tolerant partial-agg groupBy on the host key), broadcast-joined
    back; keep = host mean >= floor."""
    from graphscope_spark.functions.corpus import host_reputation

    return host_reputation(_docs(spark, sf_dir)).orderBy("doc_id")


def _q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-architecture hashed-n-gram linear classifier as one
    Catalyst array expression — zero shuffles; md5-derived weights make
    the DuckDB oracle replay the identical model."""
    from graphscope_spark.functions.classify import quality_classifier

    return quality_classifier(_docs(spark, sf_dir)).orderBy("doc_id")


def _q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (RAG/eval-slice preparation): fixed
    token windows with overlap as one zero-shuffle array expression;
    returns per-doc chunk count + token coverage so the result stays
    small while still pinning every chunk boundary (the oracle computes
    the same digest from the exploded chunks)."""
    from graphscope_spark.functions.text import chunk_text

    ch = chunk_text(_docs(spark, sf_dir))
    return (
        ch.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").alias("sum_chunk_tokens"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.array_sort(
                        F.collect_list(
                            F.concat_ws(":", F.col("chunk_id").cast("string"), F.md5("chunk_text"))
                        )
                    ),
                )
            ).alias("chunks_digest"),
        )
        .orderBy("doc_id")
    )


def _q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-index artifact: per term, document frequency + the top-10
    'doc:tf' posting list (tf desc, doc asc).  Two shuffles total —
    (doc,term) tf, then term-keyed rank+list; skewed stopword terms are
    bounded because only the rank-filtered survivors enter the list."""
    from graphscope_spark.functions.ranking import inverted_index

    return inverted_index(_docs(spark, sf_dir)).orderBy("term")


def _q_crawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-recrawl diff between two deterministic snapshot
    views of the documents table (old: drops doc_id%10==3, mangles
    text of doc_id%7==0; new: drops doc_id%10==7): one full-outer join
    on the key comparing 32-byte fingerprints, never bodies."""
    from graphscope_spark.functions.urls import crawl_delta

    docs = _docs(spark, sf_dir)
    old = docs.where(F.col("doc_id") % 10 != 3).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" OLD")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    new = docs.where(F.col("doc_id") % 10 != 7).select("doc_id", "text")
    return crawl_delta(old, new).orderBy("doc_id")


def _q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 corpus gates composed into ONE Catalyst plan (host
    reputation AND classifier AND dup-span cap, then chunking); output
    is the per-doc chunk digest over the surviving documents — pins the
    kept-set AND every chunk boundary.  The oracle nests the three gate
    oracles as subqueries, so any drift in any gate or in the
    composition fails the hash."""
    from graphscope_spark.functions.corpus import select_and_chunk

    ch = select_and_chunk(_docs(spark, sf_dir))
    return (
        ch.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").alias("sum_chunk_tokens"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.array_sort(
                        F.collect_list(
                            F.concat_ws(":", F.col("chunk_id").cast("string"), F.md5("chunk_text"))
                        )
                    ),
                )
            ).alias("chunks_digest"),
        )
        .orderBy("doc_id")
    )


def _q_salsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALSA hub/authority on the customer->supplier graph: HITS's
    random-walk (degree-normalized) form — both vectors stay L1=1 by
    construction, so a round is exactly two shuffles (no normalization
    aggregate at all; compare _q_hits)."""
    from graphscope_spark.algorithms import salsa
    from graphscope_spark.sources.tpch_graph import order_graph

    return salsa(order_graph(spark, sf_dir), rounds=SALSA_ROUNDS).select(
        "vid", F.round("hub", 8).alias("hub"), F.round("auth", 8).alias("auth")
    )


def _q_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k supplier pairs by co-citation count (shared citing
    customer), with the outdegree frequency cap that keeps directory
    pages from manufacturing O(outdeg²) pairs at web scale."""
    from graphscope_spark.algorithms import cocitation
    from graphscope_spark.sources.tpch_graph import order_graph

    return cocitation(order_graph(spark, sf_dir), max_citing_outdeg=COCIT_CAP, top_k=COCIT_K)


def _q_bib_coupling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k order pairs by bibliographic coupling (shared cited part)
    on the order->part citation graph; indegree cap mirrors the
    co-citation guard on the cited side."""
    from graphscope_spark.algorithms import bib_coupling
    from graphscope_spark.graph import Graph

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = li.select(
        F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst")
    ).distinct()
    g = Graph.from_edges(e, directed=True, num_partitions=32)
    return bib_coupling(g, max_cited_indeg=COCIT_CAP, top_k=COCIT_K)


def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style embedding-space dedup: IVF coarse clusters, then
    in-cluster cosine balls; lower id survives."""
    from graphscope_spark.functions.similarity import semantic_dedup

    return semantic_dedup(_emb(spark, sf_dir), stride=IVF_STRIDE, tau=SEMDEDUP_TAU)


def _q_semantic_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-guarded SemDeDup (VERDICT r3 task 7): clusters above
    SEMDEDUP_CAP are sub-banded with 4x4 sign-LSH instead of all-pairs
    — at sf0.01 seven of the fourteen IVF cells exceed the cap, so the
    oracle replays BOTH the exact-small and banded-big paths."""
    from graphscope_spark.functions.similarity import semantic_dedup

    return semantic_dedup(
        _emb(spark, sf_dir),
        stride=IVF_STRIDE,
        tau=SEMDEDUP_TAU,
        max_cluster=SEMDEDUP_CAP,
        bands=SEMDEDUP_BANDS,
        planes_per_band=SEMDEDUP_PLANES,
    )


def _q_cms_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens via the md5-deterministic count-min sketch —
    the oracle rebuilds the identical d x w register matrix in DuckDB,
    so every (one-sided) estimate matches bit-for-bit."""
    from graphscope_spark.functions.sketch import cms_heavy_hitters
    from graphscope_spark.functions.text import tokens

    toks = _docs(spark, sf_dir).where(F.length(F.trim("text")) > 0).select(
        F.explode(tokens("text")).alias("token")
    )
    return cms_heavy_hitters(toks, "token", threshold=CMS_THRESHOLD, d=CMS_D, w=CMS_W)


def _q_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination with a broadcast Bloom filter of the
    benchmark shingles (constant-size however large the benchmark) —
    the 100 TB form of _q_contamination; Bloom false positives are
    md5-deterministic so both engines count identical hits."""
    from graphscope_spark.functions.sketch import bloom_contamination

    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % CONTAM_MOD == 0)
    rest = docs.where(F.col("doc_id") % CONTAM_MOD != 0)
    return bloom_contamination(rest, bench, k=BLOOM_K, m=BLOOM_M)


def _q_khop_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GNN k-hop neighbor sampling (GLE NeighborSampler
    analog) from the customer seed set — md5-ranked per-vertex choice,
    replayed exactly by the oracle."""
    from graphscope_spark.algorithms import khop_neighbor_sample
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    seeds = g.vertices.where(
        (F.col("vid") < 1000000) & (F.col("vid") % KHOP_SEED_MOD == 0)
    )
    return khop_neighbor_sample(g, seeds, fanouts=KHOP_FANOUTS)


def _q_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GNN negative edge sampling (GLE negative-sampler
    analog) from the customer seed set: md5-uniform proposals over the
    dense vid index with rejection of real out-neighbors, replayed
    exactly by the oracle."""
    from graphscope_spark.algorithms.walks import negative_sample
    from graphscope_spark.sources.tpch_graph import order_graph

    g = order_graph(spark, sf_dir)
    seeds = g.vertices.where(
        (F.col("vid") < 1000000) & (F.col("vid") % NEG_SEED_MOD == 0)
    )
    return negative_sample(g, seeds, k=NEG_K, trials=NEG_TRIALS)


def _q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (the trained coarse quantizer behind
    IVF ANN / SemDeDup): 2 assign→update rounds from the seeded init,
    final assignment checked point-for-point against the unrolled
    DuckDB replay."""
    from graphscope_spark.functions.similarity import kmeans_fit

    return kmeans_fit(_emb(spark, sf_dir), iters=KMEANS_ITERS, stride=IVF_STRIDE).select(
        "vec_id", "cluster", F.round("dist", 6).alias("dist")
    )


def _q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bigram-LM cross-entropy quality score per document."""
    from graphscope_spark.functions.classify import ngram_lm_perplexity

    return ngram_lm_perplexity(_docs(spark, sf_dir), k=LM_K).select(
        "doc_id", "n_bigrams", F.round("xent", 8).alias("xent")
    )


# ---------------------------------------------------------------------
# streaming-derived driver contracts (VERDICT r3 task 8): each replays
# k deterministic micro-batches through the REAL streaming processor
# (foreachBatch body or an actual readStream) and returns the final
# state, which a DuckDB oracle recomputes from the same tables.
# ---------------------------------------------------------------------

STRM_BATCHES = 3       # micro-batches per streaming replay
STRM_SPLIT = 31        # batch index = (src*31 + dst) % STRM_BATCHES
STRM_PR_ROUNDS = 3     # fixed warm PageRank rounds per batch (oracle unrolls all)
TREND_D, TREND_W = 4, 64   # trending CMS register matrix
TREND_THRESHOLD = 3        # heavy-hitter cutoff per hourly window (max per-window count at sf0.01 is 10)
NEARDUP_THR = 0.5          # streaming near-dup verify threshold


def _stream_tmp(prefix: str) -> str:
    import tempfile

    return tempfile.mkdtemp(prefix=prefix)


def _edge_batch(edges: DataFrame, b: int) -> DataFrame:
    return edges.where(
        F.pmod(F.col("src") * STRM_SPLIT + F.col("dst"), STRM_BATCHES) == b
    )


LR_DIMS = 32           # train_quality_lr hashed-feature dimensions (incl. bias)
LR_SEED = 17
LR_STEPS = 3           # full-batch GD steps (oracle unrolls each)
LR_RATE = 1.0


def _q_train_quality_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression trainer (full-batch GD, fixed
    steps) learning an is-English classifier over hashed bag-of-token
    features — produces the learned weight vector the fastText-style
    scoring pass (quality_classifier) broadcasts at inference."""
    from graphscope_spark.functions.classify import train_classifier

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return train_classifier(
        docs,
        label=(F.col("lang") == "en"),
        dims=LR_DIMS,
        seed=LR_SEED,
        steps=LR_STEPS,
        lr=LR_RATE,
    ).select("dim", "weight")


def _q_stream_incr_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IncrementalWCC replayed over 3 deterministic edge batches; the
    warm frontier-seeded fixpoint equals cold WCC on the full edge set
    (monotone min-label argument, streaming/incremental.py), so the
    oracle is the same unrolled min-propagation as `wcc`."""
    from graphscope_spark.sources.tpch_graph import order_graph
    from graphscope_spark.streaming.incremental import IncrementalWCC

    edges = order_graph(spark, sf_dir).edges.select("src", "dst")
    inc = IncrementalWCC(spark, _stream_tmp("gs_swcc_"))
    for b in range(STRM_BATCHES):
        inc.process_batch(_edge_batch(edges, b), b)
    return inc.current_components().select("vid", "comp")


def _q_stream_incr_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IncrementalTriangles replayed over 3 batches of the co-purchase
    graph; exact per-batch deltas sum to the cold count, so the oracle
    is the same as `triangles` (zero-count vertices filled in — the
    incremental state only stores vertices whose count ever moved)."""
    from graphscope_spark.sources.tpch_graph import copurchase_graph
    from graphscope_spark.streaming.incremental import IncrementalTriangles

    g = copurchase_graph(spark, sf_dir)
    edges = g.edges.select("src", "dst")
    inc = IncrementalTriangles(spark, _stream_tmp("gs_stri_"))
    for b in range(STRM_BATCHES):
        inc.process_batch(_edge_batch(edges, b), b)
    counts = inc.current_counts()
    return (
        g.vertices.select("vid")
        .join(counts, "vid", "left")
        .select("vid", F.coalesce("tri", F.lit(0)).cast("long").alias("tri"))
    )


def _q_stream_incr_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IncrementalPageRank in fixed-round mode (tol=None — exactly
    STRM_PR_ROUNDS warm rounds per batch) over 3 cumulative edge
    batches; the oracle unrolls the full chain: uniform init on E₀,
    then per batch renormalized warm init over the grown vertex set."""
    from graphscope_spark.sources.tpch_graph import order_graph
    from graphscope_spark.streaming.incremental import IncrementalPageRank

    edges = order_graph(spark, sf_dir).edges.select("src", "dst")
    inc = IncrementalPageRank(
        spark, _stream_tmp("gs_spr_"), alpha=ALPHA, tol=None,
        max_iter=STRM_PR_ROUNDS,
    )
    for b in range(STRM_BATCHES):
        inc.process_batch(_edge_batch(edges, b), b)
    return inc.current_ranks().select("vid", F.round("rank", 8).alias("pr"))


def _q_stream_dedup_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch streaming exact dedup through a REAL file-source
    readStream (one parquet file per micro-batch, mtimes pinned so the
    batch order is the doc_id%3 order): each batch is pre-deduped to
    its min-id row per fingerprint, so first-arrival-wins state keeps
    exactly the min-(batch, doc_id) row per fingerprint — which the
    oracle expresses as a row_number over (fp ORDER BY doc_id%3,
    doc_id)."""
    import os
    import uuid

    from pyspark.sql.window import Window

    from graphscope_spark.functions.text import fingerprint
    from graphscope_spark.streaming.dedup import dedup_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    in_dir = _stream_tmp("gs_sdedup_in_")
    w = Window.partitionBy("fp").orderBy("doc_id")
    for b in range(STRM_BATCHES):
        batch = (
            docs.where(F.pmod(F.col("doc_id"), STRM_BATCHES) == b)
            .withColumn("fp", fingerprint("text"))
            .withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select("doc_id", "text")
        )
        path = os.path.join(in_dir, f"batch_{b}")
        batch.coalesce(1).write.parquet(path)
        for f_ in os.listdir(path):  # pin file mtimes → processing order
            os.utime(os.path.join(path, f_), (1700000000 + b, 1700000000 + b))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "batch_*"))
    )
    name = "sdedup_" + uuid.uuid4().hex[:8]
    q = (
        dedup_stream(stream)
        .select("doc_id", "fp")
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(in_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).select("doc_id", "fp")


def _q_stream_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed count-min trending over a REAL events readStream
    (complete-mode aggregation → memory sink), probed for heavy-hitter
    event types.  Register placement is md5 — the oracle recomputes the
    same cells and min-over-rows estimates in SQL."""
    import os
    import uuid

    from graphscope_spark.streaming.trending import (
        trending_from_registers,
        windowed_cms_registers,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "ts", F.col("event_type").alias("token")
    )
    in_dir = _stream_tmp("gs_strend_in_")
    for b in range(STRM_BATCHES):
        events.where(F.pmod(F.xxhash64("ts"), STRM_BATCHES) == b).coalesce(
            1
        ).write.parquet(os.path.join(in_dir, f"batch_{b}"))
    stream = (
        spark.readStream.schema("ts timestamp, token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(in_dir, "batch_*"))
    )
    regs = windowed_cms_registers(
        stream, value_col="token", ts_col="ts", window="1 hour",
        watermark="768 hours", d=TREND_D, w=TREND_W,
    )
    name = "strend_" + uuid.uuid4().hex[:8]
    q = (
        regs.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(in_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    probes = events.select("token").distinct()
    return trending_from_registers(
        spark.table(name), probes, threshold=TREND_THRESHOLD,
        d=TREND_D, w=TREND_W, value_col="token",
    ).select("win_start", "token", F.col("est").cast("long").alias("est"))


def _q_stream_neardup_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IncrementalNearDup replayed over 3 doc_id%3 batches — the final
    index state is batching-independent (pairs normalized to
    least/greatest id, verdicts resolved to min dup_of on read), so
    the oracle is the whole-corpus banded-LSH + exact-Jaccard replay."""
    from graphscope_spark.streaming.neardup import IncrementalNearDup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    inc = IncrementalNearDup(
        spark, _stream_tmp("gs_snd_"), threshold=NEARDUP_THR
    )
    for b in range(STRM_BATCHES):
        inc.process_batch(
            docs.where(F.pmod(F.col("doc_id"), STRM_BATCHES) == b), b
        )
    return inc.current_dups().select(
        "doc_id", "dup_of", F.round("jaccard", 8).alias("jaccard")
    )


# ---------------------------------------------------------------------
# web-pages pipeline contracts: documents → rendered HTML → REAL
# Arrow-UDF extraction (sources/extract.py) → link graph → PageRank.
# The oracle re-renders the SAME html in SQL and replays the regex
# extraction in DuckDB — so a byte-level extraction bug on either side
# breaks the value hash (the north-rule per-row invariant, driver-
# checkable without a pages table in the driver's view set).
# ---------------------------------------------------------------------

PAGES_MAX_LINKS = 4    # per-doc out-links = doc_id % 4 + 1
PAGES_TARGET_MOD = 997 # link target id = (doc_id*31 + k*17) % 997


def _pages_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, url, html): deterministic pages rendered from the
    documents table with pure column concat (no UDF) so DuckDB can
    rebuild the identical bytes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    nl = F.col("doc_id") % PAGES_MAX_LINKS + 1
    anchor_parts = []
    for k in range(1, PAGES_MAX_LINKS + 1):
        tid = (F.col("doc_id") * 31 + k * 17) % PAGES_TARGET_MOD
        seg = F.concat(
            F.lit('<a href="https://site'),
            (tid % 97).cast("string"),
            F.lit(".example/p/"),
            tid.cast("string"),
            F.lit(f'">ref {k}</a>'),
        )
        anchor_parts.append(F.when(F.lit(k) <= nl, seg).otherwise(F.lit("")))
    html = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><p>"),
        F.col("text"),
        F.lit("</p>"),
        *anchor_parts,
        F.lit("</body></html>"),
    )
    url = F.concat(
        F.lit("https://site"),
        (F.col("doc_id") % 97).cast("string"),
        F.lit(".example/p/"),
        F.col("doc_id").cast("string"),
    )
    return docs.select("doc_id", url.alias("url"), html.alias("html"))


def _pages_anchor_sql() -> str:
    segs = []
    for k in range(1, PAGES_MAX_LINKS + 1):
        tid = f"(doc_id*31 + {k}*17) % {PAGES_TARGET_MOD}"
        segs.append(
            f"case when {k} <= doc_id % {PAGES_MAX_LINKS} + 1 then "
            f"'<a href=\"https://site' || cast(({tid}) % 97 as varchar) "
            f"|| '.example/p/' || cast({tid} as varchar) "
            f"|| '\">ref {k}</a>' else '' end"
        )
    return " || ".join(segs)


_PAGES_HTML_SQL = f"""
  pages as (
    select doc_id,
           'https://site' || cast(doc_id % 97 as varchar)
             || '.example/p/' || cast(doc_id as varchar) as url,
           '<html><head><title>doc ' || cast(doc_id as varchar)
             || '</title></head><body><p>' || text || '</p>'
             || {_pages_anchor_sql()}
             || '</body></html>' as html
    from documents
  )
"""

_PAGES_EDGES_SQL = rf"""
  with {_PAGES_HTML_SQL.strip()},
  hrefs as (
    select doc_id as src,
           unnest(regexp_extract_all(html, '<a href="([^"]+)"', 1)) as dst_url
    from pages
  ),
  pedges as (
    select distinct src,
           cast(regexp_extract(dst_url, '/p/(\d+)', 1) as bigint) as dst
    from hrefs
  )
"""


def _q_pages_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the REAL Arrow-batched extract_text/extract_links UDFs over
    the rendered html; the oracle replays the same regexes in DuckDB on
    identically-rebuilt bytes — the byte-identity invariant, driver-
    checked."""
    from graphscope_spark.sources.extract import extract_links, extract_text

    pages = _pages_html(spark, sf_dir)
    return pages.select(
        "doc_id",
        "url",
        extract_text("html").alias("etext"),
        F.size(extract_links("html")).cast("long").alias("n_links"),
    )


def _q_pages_linkgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """links_from_pages over the rendered html → (src, dst) id edges
    (urls parsed back to ids), the crawl→graph topology stage."""
    from graphscope_spark.sources.extract import links_from_pages

    pages = _pages_html(spark, sf_dir)
    edges = links_from_pages(pages.select("url", "html"))
    return edges.select(
        F.regexp_extract("src_url", r"/p/(\d+)", 1).cast("long").alias("src"),
        F.regexp_extract("dst_url", r"/p/(\d+)", 1).cast("long").alias("dst"),
    ).distinct()


def _q_pages_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round PageRank over the EXTRACTED link graph — the whole
    north-rule pipeline (html → Arrow-UDF links → edge table → ranked
    vertices) as one driver-verified query.  Link targets without
    pages of their own are dangling vertices, so the dangling pool is
    genuinely exercised."""
    from graphscope_spark.algorithms import pagerank
    from graphscope_spark.graph import Graph

    edges = _q_pages_linkgraph(spark, sf_dir)
    g = Graph.from_edges(edges, directed=True, num_partitions=32)
    return pagerank(
        g, alpha=ALPHA, max_iter=PR_ROUNDS, tol=None, sync_every=PR_ROUNDS
    ).select("vid", F.round("rank", 8).alias("pr"))


def _pages_extract_sql() -> str:
    return rf"""
      with {_PAGES_HTML_SQL.strip()}
      select doc_id, url,
             regexp_extract(html, '(?s)<title>(.*?)</title>', 1)
               || chr(10)
               || array_to_string(
                    regexp_extract_all(html, '(?s)<p>(.*?)</p>', 1), chr(10))
               as etext,
             cast(len(regexp_extract_all(html, '<a href="([^"]+)"', 1))
                  as bigint) as n_links
      from pages
    """


def _pages_linkgraph_sql() -> str:
    return _PAGES_EDGES_SQL + "\n  select src, dst from pedges"


def _pages_pagerank_sql() -> str:
    """Unrolled PR_ROUNDS NetworkX-style PageRank over the SQL-replayed
    pages edge table (same recurrence as _pagerank_sql)."""
    parts = [
        _PAGES_EDGES_SQL.rstrip(),
        "verts as materialized (select src as vid from pedges union select dst from pedges)",
        "nn as materialized (select cast(count(*) as double) as n from verts)",
        "deg as materialized (select src as vid, cast(count(*) as double) as od from pedges group by 1)",
        "dangv as materialized (select v.vid from verts v left join deg d using(vid) where d.od is null)",
        "r0 as materialized (select vid, (select 1.0/n from nn) as pr from verts)",
    ]
    for k in range(PR_ROUNDS):
        parts.append(
            f"d{k} as materialized (select coalesce(sum(pr), 0.0) as s from r{k} "
            f"where vid in (select vid from dangv))"
        )
        parts.append(
            f"""r{k + 1} as materialized (
              select v.vid,
                     (1.0 - {ALPHA})/(select n from nn)
                     + {ALPHA} * (select s from d{k})/(select n from nn)
                     + {ALPHA} * coalesce(c.s, 0.0) as pr
              from verts v left join (
                select e.dst as vid, sum(r.pr / dg.od) as s
                from pedges e
                join r{k} r on e.src = r.vid
                join deg dg on dg.vid = e.src
                group by 1
              ) c using(vid)
            )"""
        )
    return ",\n".join(parts) + f"\nselect vid, round(pr, 8) as pr from r{PR_ROUNDS}"


#: Keys added in the CURRENT round.  Never-driver-checked keys from
#: PRIOR rounds always outrank these in the driver window (VERDICT r3
#: task 1: "do NOT front-load any new round-4 ops" until the backlog
#: has rows).  Bump this list each round when adding queries.
_NEW_THIS_ROUND: tuple[str, ...] = (
    "betweenness_endpoints",
    "graphar_roundtrip",
    "graph_serde_roundtrip",
    "consolidate_columns",
    "mutable_ops",
    "pregel_sssp",
    "induced_subgraph",
    "graph_contract",
    "pagerank_resume",
)

# Keys whose physical plan changed this round (or whose driver row is
# stale for code that changed in the previous round) — the driver must
# re-verify them even though an old green row exists.  Round 5: the
# round-4 packed-adjacency rewrite (skew.py:89, pagerank.py:197,
# wcc.py, cdlp.py:50, sssp.py) changed the hot path of these eight
# driver keys, but their driver rows date from r02/r03 (VERDICT r4,
# "What's missing" #1).
_PLANS_CHANGED_THIS_ROUND: tuple[str, ...] = (
    # r4 packed-adjacency rewrite, driver rows stale (r02/r03):
    "pagerank",
    "wcc",
    "cdlp",
    "sssp",
    "wcc_log",
    "nation_pagerank",
    "ppr",
    "sssp_delta",
    # r5: packed gather extended to the remaining superstep-heavy
    # algorithms (hits.py, centrality.py, articlerank.py, lpa_u2i.py):
    "hits",
    "salsa",
    "eigenvector_centrality",
    "katz_centrality",
    "articlerank",
    "lpa_u2i",
)


def _evidence_dir():
    from pathlib import Path

    return Path(__file__).resolve().parent


def _row_green(row) -> bool:
    """A driver CORRECTNESS row counts as green only when every check
    it carries passed and no error was recorded (ADVICE r4: counting
    red rows as 'checked' buried iceberg_roundtrip behind the backlog
    for two rounds)."""
    if not isinstance(row, dict):
        return False
    if row.get("err") is not None:
        return False
    return all(
        bool(row[k])
        for k in ("rows_match", "schema_match", "hash_match")
        if k in row
    )


def _driver_rows() -> dict[str, tuple[int, bool]]:
    """key -> (latest round with a driver row, was that latest row
    green), from the committed CORRECTNESS_r*.json files."""
    import json
    import re

    latest: dict[str, tuple[int, bool]] = {}
    for p in sorted(_evidence_dir().glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            for k, row in rows.items():
                if k not in latest or rnd >= latest[k][0]:
                    latest[k] = (rnd, _row_green(row))
    return latest


def _driver_coverage() -> dict[str, int]:
    """key -> latest round with a GREEN driver CORRECTNESS row.  Keys
    whose only driver rows are red are absent (they re-rank as
    unverified)."""
    import json
    import re

    cov: dict[str, int] = {}
    for p in sorted(_evidence_dir().glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            for k, row in rows.items():
                if _row_green(row):
                    cov[k] = max(cov.get(k, 0), rnd)
    return cov


def _driver_failed() -> set[str]:
    """Keys whose LATEST driver row is red — these sort to the very
    front so a failing query is re-verified the next round, never
    buried (ADVICE r4, medium)."""
    return {k for k, (_, green) in _driver_rows().items() if not green}


def _bench_costs() -> dict[str, float]:
    """Per-query wall seconds from the LATEST committed BENCH_r*.json
    (the driver embeds bench.py's JSON line in the "tail" field)."""
    import json
    import re

    costs: dict[str, float] = {}
    for p in sorted(_evidence_dir().glob("BENCH_r*.json")):
        try:
            doc = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        tail = doc.get("tail", "") if isinstance(doc, dict) else ""
        for m in re.finditer(r'\{"metric".*', tail):
            try:
                line = json.loads(m.group(0).splitlines()[0])
            except ValueError:
                continue
            q = line.get("queries")
            if isinstance(q, dict):
                costs = {k: float(v) for k, v in q.items()}
    return costs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-window ordering is DERIVED, not hand-maintained (VERDICT
    r3 tasks 1-2): the driver's correctness gate checks the first ~50
    dict entries per round, so order is computed at call time from the
    committed evidence files:

    1. keys whose LATEST driver row is RED (a failed check must be
       re-verified next round, never buried — ADVICE r4);
    2. keys whose physical plan changed this round
       (``_PLANS_CHANGED_THIS_ROUND``) — green history, stale for the
       code that changed;
    3. never-driver-checked keys from PRIOR rounds (no green row in any
       CORRECTNESS_r*.json, not in ``_NEW_THIS_ROUND``), cheapest first
       by the latest BENCH_r*.json per-query seconds;
    4. never-checked keys added THIS round (``_NEW_THIS_ROUND``);
    5. already-green keys, oldest-checked round first.

    Ties break on key name.  This makes the ordering self-maintaining:
    adding operators next round can never re-bury an unchecked entry,
    and tests/test_entry_ordering.py pins the invariant against the
    committed files."""
    impls = _query_impls()
    cov = _driver_coverage()
    failed = _driver_failed()
    costs = _bench_costs()
    new_round = set(_NEW_THIS_ROUND)
    changed = set(_PLANS_CHANGED_THIS_ROUND)

    def rank(k: str):
        if k in failed:
            return (0, 0.0, k)
        if k in changed:
            return (1, 0.0, k)
        if k not in cov:
            if k in new_round:
                return (3, 0.0, k)
            return (2, costs.get(k, float("inf")), k)
        return (4, float(cov[k]), k)

    return {k: impls[k] for k in sorted(impls, key=rank)}


def _query_impls() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Literal registry of every query; ordering here is irrelevant —
    ``queries()`` re-sorts by driver-coverage evidence."""
    return {
        # -- newest (added after the round-3 sweep began), cheapest first -
        "domain_mix": _q_domain_mix,
        "partition_report": _q_partition_report,
        "url_filter": _q_url_filter,
        "cocitation": _q_cocitation,
        "lm_perplexity": _q_lm_perplexity,
        "kmeans_embeddings": _q_kmeans,
        "khop_sample": _q_khop_sample,
        "negative_sample": _q_negative_sample,
        "bib_coupling": _q_bib_coupling,
        "cms_tokens": _q_cms_tokens,
        "semantic_dedup": _q_semantic_dedup,
        "semantic_dedup_capped": _q_semantic_dedup_capped,
        "salsa": _q_salsa,
        "bloom_contamination": _q_bloom_contamination,
        "inverted_index": _q_inverted_index,
        "crawl_delta": _q_crawl_delta,
        "corpus_pipeline": _q_corpus_pipeline,
        "doc_chunks": _q_doc_chunks,
        "dup_spans": _q_dup_spans,
        "host_reputation": _q_host_reputation,
        "quality_classifier": _q_quality_classifier,
        # -- new this round (sketch + ranking families) ------------------
        "crawl_frontier": _q_crawl_frontier,
        "weighted_sample": _q_weighted_sample,
        "length_quantiles": _q_length_quantiles,
        "hll_tokens": _q_hll_tokens,
        "hll_users_by_type": _q_hll_users_by_type,
        "anchor_profile": _q_anchor_profile,
        "tfidf_topk": _q_tfidf_topk,
        "bm25": _q_bm25,
        "ngram_stats": _q_ngram_stats,
        # -- new this round (sampling/packing family) -------------------
        "corpus_split": _q_corpus_split,
        "quality_resample": _q_quality_resample,
        "contamination": _q_contamination,
        "pack_sequences": _q_pack_sequences,
        # -- new/changed this round: needs fresh driver verification ----
        "ngram_jaccard": _q_jaccard,
        "pie_sssp": _q_pie_sssp,
        "load_app_sssp": _q_load_app_sssp,
        "segment_dedup": _q_segment_dedup,
        # -- VERDICT-r2-named driver-coverage gaps (kept inside the
        #    50-entry window the r02 gate verified) ---------------------
        "ppr": _q_ppr,
        "mis": _q_mis,
        "ktruss": _q_ktruss,
        "msf": _q_msf,
        "dedup_near": _q_dedup_near,
        "coloring": _q_coloring,
        "dfs_preorder": _q_dfs,
        "four_clique": _q_four_clique,
        "five_clique": _q_five_clique,
        "subgraph_census": _q_subgraph_census,
        "triangle_census_directed": _q_triangle_census_directed,
        "eccentricity": _q_eccentricity,
        "scc": _q_scc,
        "apsp": _q_apsp_full,
        "random_walks": _q_random_walks,
        "node2vec": _q_node2vec,
        "apsp_sampled": _q_apsp,
        # ---- position 51+: driver-unverified only if the gate caps at
        #      50 entries; all remain green in the local replica gate ----
        "diameter_sampled": _q_diameter,
        "clustering_directed": _q_clustering_directed,
        "edge_boundary": _q_edge_boundary,
        "doc_tokens_bpe": _q_doc_tokens_bpe,
        "articulation_points": _q_articulation,
        "bcc": _q_bcc,
        "node_boundary": _q_node_boundary,
        "min_edge_cover": _q_min_edge_cover,
        "iceberg_roundtrip": _q_iceberg_roundtrip,
        "lcc_directed": _q_lcc_directed,
        "has_path": _q_has_path,
        "min_dominating_set": _q_domset,
        "densest_density": _q_densest_density,
        "bridges": _q_bridges,
        "maximal_matching": _q_mm,
        "link_prediction": _q_linkpred,
        "embedding_neardup": _q_emb_neardup,
        "kcore_size": _q_kcore_size,
        "k_center": _q_k_center,
        "fluid_communities": _q_fluid,
        "sssp_delta": _q_sssp_delta,
        "sampling_path": _q_sampling_path,
        "all_simple_paths": _q_all_simple_paths,
        "sssp_path": _q_sssp_path,
        "lpa_by_color": _q_lpa_by_color,
        "min_vertex_cover": _q_min_cover,
        "simhash_neardup": _q_simhash_neardup,
        "onion_layers": _q_onion_layers,
        "articlerank": _q_articlerank,
        "degeneracy_ordering": _q_degeneracy_ordering,
        "is_simple_path": _q_is_simple_path,
        "random_multi_bfs": _q_random_multi_bfs,
        # -- headliner (r02-green, kept in the verified window) --------
        "pagerank": _q_pagerank,
        # -- r02-green ---------------------------------------------------
        "graph_degree": _q_graph_degree,
        "wcc": _q_wcc,
        "nation_pagerank": _q_nation_pagerank,
        "wcc_log": _q_wcc_log,
        "cdlp": _q_cdlp,
        "lpa_u2i": _q_lpa_u2i,
        "triangles": _q_triangles,
        "lcc": _q_lcc,
        "bfs": _q_bfs,
        "sssp": _q_sssp,
        "degree_centrality": _q_degree_centrality,
        "hits": _q_hits,
        "kcore": _q_kcore,
        "eigenvector_centrality": _q_eigenvector,
        "katz_centrality": _q_katz,
        "closeness_centrality": _q_closeness,
        "avg_clustering": _q_avg_clustering,
        "transitivity": _q_transitivity,
        "degree_assortativity": _q_assortativity,
        "avg_degree_connectivity": _q_avg_degree_connectivity,
        "core_number": _q_core_number,
        "attr_assortativity": _q_attr_assortativity,
        "numeric_assortativity": _q_numeric_assortativity,
        "wcc_property": _q_wcc_property,
        "sssp_property": _q_sssp_property,
        "bfs_parent": _q_bfs_parent,
        "kshell": _q_kshell,
        "sssp_avg_length": _q_sssp_avg_length,
        "voterank": _q_voterank,
        "betweenness_sampled": _q_betweenness,
        # -- round 5: driver contracts for pytest-only surfaces ----------
        "betweenness_endpoints": _q_betweenness_endpoints,
        "graphar_roundtrip": _q_graphar_roundtrip,
        "graph_serde_roundtrip": _q_graph_serde_roundtrip,
        "consolidate_columns": _q_consolidate_columns,
        "mutable_ops": _q_mutable_ops,
        "pregel_sssp": _q_pregel_sssp,
        "induced_subgraph": _q_induced_subgraph,
        "graph_contract": _q_graph_contract,
        "pagerank_resume": _q_pagerank_resume,
        "louvain": _q_louvain,
        "doc_tokens": _q_doc_tokens,
        "doc_fingerprint": _q_doc_fingerprint,
        "doc_quality": _q_doc_quality,
        "doc_lang": _q_doc_lang,
        "doc_repetition": _q_doc_repetition,
        "training_corpus": _q_training_corpus,
        "url_canonical": _q_url_canonical,
        "doc_redact": _q_doc_redact,
        "dedup_exact": _q_dedup_exact,
        "minhash_signatures": _q_minhash,
        "lsh_pairs": _q_lsh_pairs,
        "simhash": _q_simhash,
        "knn_cosine": _q_knn_cosine,
        "knn_lsh": _q_knn_lsh,
        "knn_ivf": _q_knn_ivf,
        "event_counts": _q_event_counts,
        # -- web-pages pipeline contracts (html → extract → graph → PR) -
        "pages_extract": _q_pages_extract,
        "pages_linkgraph": _q_pages_linkgraph,
        "pages_pagerank": _q_pages_pagerank,
        "train_quality_lr": _q_train_quality_lr,
        # -- streaming-derived contracts (VERDICT r3 task 8) -----------
        "stream_incr_wcc": _q_stream_incr_wcc,
        "stream_incr_triangles": _q_stream_incr_triangles,
        "stream_incr_pagerank": _q_stream_incr_pagerank,
        "stream_dedup_final": _q_stream_dedup_final,
        "stream_trending": _q_stream_trending,
        "stream_neardup_final": _q_stream_neardup_final,
        "harmonic_centrality": _q_harmonic,
    }


def _doc_repetition_sql() -> str:
    """Gopher-style repetition features (text.repetition_features):
    top-bigram occurrence share + duplicate-trigram fraction."""
    return r"""
      with t as (
        select doc_id,
               case when length(trim(text)) = 0 then []::varchar[]
                    else regexp_split_to_array(trim(text), '\s+') end as tok
        from documents
      ),
      bg as (
        select doc_id,
               unnest(list_transform(range(1, len(tok)),
                      i -> tok[i] || ' ' || tok[i + 1])) as bg
        from t
      ),
      bc as (select doc_id, bg, count(*) as c from bg group by 1, 2),
      top as (
        select doc_id, cast(max(c) as double) / sum(c) as tbf
        from bc group by 1
      ),
      tri as (
        select doc_id,
               case when len(tok) < 3 then 0.0
                    else 1.0 - cast(len(list_distinct(list_transform(
                             range(1, len(tok) - 1),
                             i -> tok[i] || ' ' || tok[i + 1] || ' ' || tok[i + 2])))
                             as double) / (len(tok) - 2) end as dtf
        from t
      )
      select t.doc_id,
             round(coalesce(top.tbf, 0.0), 8) as top_bigram_frac,
             round(tri.dtf, 8) as dup_trigram_frac
      from t left join top using(doc_id) join tri using(doc_id)
    """


def _training_corpus_sql(stop_list: str) -> str:
    """functions/corpus.py training_corpus: language gate → quality gate
    → repetition gates → exact dedup (min doc_id per fingerprint among
    the gate-passing docs).  Gates compare 8-decimal-rounded features,
    mirroring the Spark side exactly."""
    from graphscope_spark.functions import specs

    return rf"""
      with t as (
        select doc_id,
               regexp_split_to_array(trim(text), '\s+') as toks,
               case when length(trim(text)) = 0 then []::varchar[]
                    else regexp_split_to_array(trim(text), '\s+') end as tok,
               cast(case when length(trim(text)) = 0 then 0
                    else len(regexp_split_to_array(trim(text), '\s+')) end
                    as bigint) as n_tokens
        from documents
      ),
      q as (
        select doc_id, n_tokens,
               round(0.4 * least(n_tokens / 50.0, 1.0)
                     + 0.3 * (len(list_distinct(toks)) / greatest(n_tokens, 1))
                     + 0.3 * least((len(list_filter(toks,
                           x -> list_contains([{stop_list}], x)))
                           / greatest(n_tokens, 1)) * 5.0, 1.0), 8) as quality_score
        from t
      ),
      tokw as (select doc_id, unnest(toks) as word from t),
      markers(cand_lang, word) as (values {_lang_markers_values()}),
      scores as (
        select doc_id, cand_lang, count(*) as hits
        from tokw join markers using(word) group by 1, 2
      ),
      picked as (
        select doc_id, cand_lang from scores
        qualify row_number() over (
          partition by doc_id order by hits desc, cand_lang asc) = 1
      ),
      lang as (
        select t.doc_id, coalesce(p.cand_lang, 'und') as pred_lang
        from t left join picked p using(doc_id)
      ),
      bg as (
        select doc_id, unnest(list_transform(range(1, len(tok)),
               i -> tok[i] || ' ' || tok[i + 1])) as bg
        from t
      ),
      bc as (select doc_id, bg, count(*) as c from bg group by 1, 2),
      top as (
        select doc_id, cast(max(c) as double) / sum(c) as tbf
        from bc group by 1
      ),
      tri as (
        select doc_id,
               case when len(tok) < 3 then 0.0
                    else 1.0 - cast(len(list_distinct(list_transform(
                             range(1, len(tok) - 1),
                             i -> tok[i] || ' ' || tok[i + 1] || ' ' || tok[i + 2])))
                             as double) / (len(tok) - 2) end as dtf
        from t
      ),
      fp as (
        select doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as f
        from documents
      ),
      passed as (
        select q.doc_id, q.n_tokens, q.quality_score
        from q
        join lang using(doc_id)
        left join top using(doc_id)
        join tri using(doc_id)
        where lang.pred_lang = '{specs.CORPUS_LANG}'
          and q.quality_score >= {specs.CORPUS_MIN_QUALITY}
          and round(coalesce(top.tbf, 0.0), 8) <= {specs.CORPUS_MAX_TOP_BIGRAM}
          and round(tri.dtf, 8) <= {specs.CORPUS_MAX_DUP_TRIGRAM}
      ),
      keep as (
        select f, min(p.doc_id) as doc_id
        from passed p join fp using(doc_id) group by f
      )
      select k.doc_id, p.n_tokens, p.quality_score
      from keep k join passed p on p.doc_id = k.doc_id
    """


def _bucket_sql(value_expr: str, seed: int) -> str:
    """DuckDB twin of sampling.hash_bucket: first 4 hex digits of
    md5(seed ':' value) as an integer in [0, 65536)."""
    h = f"md5('{seed}:' || cast({value_expr} as varchar))"
    digits = [
        f"(instr('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1)"
        for i in range(4)
    ]
    return (
        f"({digits[0]} * 4096 + {digits[1]} * 256 "
        f"+ {digits[2]} * 16 + {digits[3]})"
    )


def _corpus_split_sql() -> str:
    thr_train = int(0.8 * 65536)
    thr_val = int(0.9 * 65536)
    return f"""
      with b as (
        select doc_id, {_bucket_sql('doc_id', SPLIT_SEED)} as bkt
        from documents
      )
      select doc_id,
             case when bkt < {thr_train} then 'train'
                  when bkt < {thr_val} then 'val'
                  else 'test' end as split
      from b
    """


def _domain_mix_sql() -> str:
    # exponent written via repr so the SQL literal parses to the exact
    # double Spark's F.lit(1.0 - MIX_ALPHA) uses
    exp = repr(1.0 - MIX_ALPHA)
    return f"""
      with c as (select lang, count(*) as dcount from documents group by lang),
      m as (select min(dcount) as cmin from c),
      r as (select lang,
                   round(power(cast(cmin as double) / cast(dcount as double),
                               {exp}), 8) as domain_rate
            from c cross join m)
      select d.doc_id, d.lang, r.domain_rate
      from documents d join r using(lang)
      where {_bucket_sql('d.doc_id', MIX_SEED)}
            < cast(floor(domain_rate * 65536) as bigint)
    """


def _quality_resample_sql(stop_list: str) -> str:
    return rf"""
      with t as (
        select doc_id,
               regexp_split_to_array(trim(text), '\s+') as toks,
               cast(case when length(trim(text)) = 0 then 0
                    else len(regexp_split_to_array(trim(text), '\s+')) end
                    as bigint) as n_tokens
        from documents
      ),
      q as (
        select doc_id,
               round(0.4 * least(n_tokens / 50.0, 1.0)
                     + 0.3 * (len(list_distinct(toks)) / greatest(n_tokens, 1))
                     + 0.3 * least((len(list_filter(toks,
                           x -> list_contains([{stop_list}], x)))
                           / greatest(n_tokens, 1)) * 5.0, 1.0), 8)
                 as quality_score
        from t
      )
      select doc_id, quality_score from q
      where {_bucket_sql('doc_id', RESAMPLE_SEED)}
            < cast(floor(quality_score * 65536) as bigint)
    """


def _band_keys_sql(bands: int, planes: int) -> str:
    """DuckDB list literal of the sign-LSH band keys of vector ``v`` —
    the exact twin of similarity.banded_sign_keys (band j = sign bits
    of 1-based dims j*r+1 .. j*r+r, key 'j|bits')."""
    keys = []
    for j in range(bands):
        bits = " + ".join(
            f"(case when v[{j * planes + i + 1}] >= 0 then {2 ** i} else 0 end)"
            for i in range(planes)
        )
        keys.append(f"'{j}|' || cast(({bits}) as varchar)")
    return "[" + ", ".join(keys) + "]"


def _semantic_capped_sql() -> str:
    """Oracle for the skew-guarded SemDeDup: all-pairs inside clusters
    at/below SEMDEDUP_CAP, 4x4 sign-banded candidates inside oversized
    clusters, identical verification either way."""
    cos = (
        "list_dot_product(a.v, b.v)"
        " / (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(b.v, b.v)))"
    )
    return f"""
      with c as (select vec_id, embedding::DOUBLE[] as v from embeddings),
      cent as (select vec_id as cid, v as cv from c
               where vec_id % {IVF_STRIDE} = 0),
      assign as (
        select vec_id, v, cid as cluster from (
          select c.vec_id, c.v, cent.cid,
                 row_number() over (
                   partition by c.vec_id
                   order by list_dot_product(c.v, cent.cv)
                            / (sqrt(list_dot_product(c.v, c.v))
                               * sqrt(list_dot_product(cent.cv, cent.cv))) desc,
                            cent.cid asc) as rk
          from c cross join cent
        ) where rk = 1
      ),
      sizes as (select cluster, count(*) as cn from assign group by 1),
      small as (select a.* from assign a join sizes using(cluster)
                where cn <= {SEMDEDUP_CAP}),
      big as (select a.* from assign a join sizes using(cluster)
              where cn > {SEMDEDUP_CAP}),
      bigk as (
        select vec_id, cluster, u.bk
        from big, unnest({_band_keys_sql(SEMDEDUP_BANDS, SEMDEDUP_PLANES)})
             as u(bk)
      ),
      cand as (
        select a.vec_id as a_id, b.vec_id as b_id
        from small a join small b using(cluster)
        where a.vec_id < b.vec_id
        union
        select distinct a.vec_id as a_id, b.vec_id as b_id
        from bigk a join bigk b on a.cluster = b.cluster and a.bk = b.bk
        where a.vec_id < b.vec_id
      ),
      dups as (
        select distinct cand.b_id as dup_id
        from cand
        join assign a on a.vec_id = cand.a_id
        join assign b on b.vec_id = cand.b_id
        where {cos} >= {SEMDEDUP_TAU}
      )
      select a.vec_id, a.cluster,
             (d.dup_id is not null) as is_duplicate
      from assign a left join dups d on a.vec_id = d.dup_id
    """


def _stream_pagerank_sql() -> str:
    """Oracle for stream_incr_pagerank: unrolls the ENTIRE warm chain —
    batch 0 = STRM_PR_ROUNDS uniform-init rounds over E₀; each later
    batch b = renormalized warm init (coalesce(prev, 1/n_b) / Σ) over
    the cumulative edge set E_b, then STRM_PR_ROUNDS more rounds —
    exactly what IncrementalPageRank(tol=None) computes."""
    r_, b_ = STRM_PR_ROUNDS, STRM_BATCHES
    parts = [f"with alledges as materialized ({SQL_EDGES})"]
    prev = None
    for b in range(b_):
        parts.append(
            f"e{b} as materialized (select src, dst from alledges "
            f"where (src*{STRM_SPLIT}+dst) % {b_} <= {b})"
        )
        parts.append(
            f"v{b} as materialized (select src as vid from e{b} "
            f"union select dst from e{b})"
        )
        parts.append(
            f"n{b} as materialized (select cast(count(*) as double) as n from v{b})"
        )
        parts.append(
            f"deg{b} as materialized (select src as vid, "
            f"cast(count(*) as double) as od from e{b} group by 1)"
        )
        parts.append(
            f"dang{b} as materialized (select v.vid from v{b} v "
            f"left join deg{b} d using(vid) where d.od is null)"
        )
        if prev is None:
            parts.append(
                f"r{b}_0 as materialized (select vid, "
                f"(select 1.0/n from n{b}) as pr from v{b})"
            )
        else:
            parts.append(
                f"""seed{b} as materialized (
                  select v.vid, coalesce(p.pr, (select 1.0/n from n{b})) as pr
                  from v{b} v left join {prev} p using(vid)
                )"""
            )
            parts.append(
                f"t{b} as materialized (select sum(pr) as t from seed{b})"
            )
            parts.append(
                f"r{b}_0 as materialized (select vid, "
                f"pr/(select t from t{b}) as pr from seed{b})"
            )
        for k in range(r_):
            parts.append(
                f"d{b}_{k} as materialized (select coalesce(sum(pr), 0.0) as s "
                f"from r{b}_{k} where vid in (select vid from dang{b}))"
            )
            parts.append(
                f"""r{b}_{k + 1} as materialized (
                  select v.vid,
                         (1.0 - {ALPHA})/(select n from n{b})
                         + {ALPHA} * (select s from d{b}_{k})/(select n from n{b})
                         + {ALPHA} * coalesce(c.s, 0.0) as pr
                  from v{b} v left join (
                    select e.dst as vid, sum(r.pr / dg.od) as s
                    from e{b} e
                    join r{b}_{k} r on e.src = r.vid
                    join deg{b} dg on dg.vid = e.src
                    group by 1
                  ) c using(vid)
                )"""
            )
        prev = f"r{b}_{r_}"
    return ",\n".join(parts) + f"\nselect vid, round(pr, 8) as pr from {prev}"


def _stream_dedup_sql() -> str:
    """Oracle for stream_dedup_final: with per-batch min-id pre-dedup
    and mtime-pinned batch order, first-arrival-wins keeps exactly the
    min-(doc_id % B, doc_id) row per fingerprint."""
    return rf"""
      with f as (
        select doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as fp
        from documents
      ),
      k as (
        select doc_id, fp, row_number() over (
          partition by fp order by doc_id % {STRM_BATCHES}, doc_id) as rk
        from f
      )
      select doc_id, fp from k where rk = 1
    """


def _stream_neardup_sql() -> str:
    """Oracle for stream_neardup_final: whole-corpus banded MinHash
    candidates -> exact shingle-hash Jaccard >= threshold -> per larger
    doc the SMALLEST verified partner (+ that pair's jaccard) — the
    batching-independent fixpoint of the incremental index."""
    return f"""
      with {SQL_SHINGLES},
      sig as materialized (
        select doc_id, {_minhash_cols_sql()} from sh group by doc_id
      ),
      banded as materialized (
        select doc_id, unnest([
          concat_ws('|', '0', mh_0, mh_1),
          concat_ws('|', '1', mh_2, mh_3),
          concat_ws('|', '2', mh_4, mh_5),
          concat_ws('|', '3', mh_6, mh_7)
        ]) as band from sig
      ),
      cand as materialized (
        select distinct x.doc_id as a, y.doc_id as b
        from banded x join banded y using(band)
        where x.doc_id < y.doc_id
      ),
      sizes as materialized (select doc_id, count(*) as sz from sh group by 1),
      jac as materialized (
        select i.a, i.b, i.ni / (sa.sz + sb.sz - i.ni) as j
        from (
          select c.a, c.b, cast(count(*) as double) as ni
          from cand c
          join sh x on x.doc_id = c.a
          join sh y on y.doc_id = c.b and y.shingle = x.shingle
          group by c.a, c.b
        ) i
        join sizes sa on sa.doc_id = i.a
        join sizes sb on sb.doc_id = i.b
        where i.ni / (sa.sz + sb.sz - i.ni) >= {NEARDUP_THR}
      )
      select b as doc_id, min(a) as dup_of,
             round(arg_min(j, a), 8) as jaccard
      from jac group by b
    """


def _stream_trending_sql() -> str:
    """Oracle for stream_trending: per-hour count-min registers (md5
    cell placement replayed digit-by-digit) probed with every distinct
    event type; a token counts in a window only when ALL d of its cells
    are present there (an absent cell is a zero register)."""
    hex5 = (
        "((instr('0123456789abcdef', substr(hx, 1, 1)) - 1) * 65536"
        " + (instr('0123456789abcdef', substr(hx, 2, 1)) - 1) * 4096"
        " + (instr('0123456789abcdef', substr(hx, 3, 1)) - 1) * 256"
        " + (instr('0123456789abcdef', substr(hx, 4, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substr(hx, 5, 1)) - 1))"
    )
    rows = ", ".join(str(r) for r in range(TREND_D))
    return f"""
      with ev as (
        select date_trunc('hour', ts) as win_start,
               cast(event_type as varchar) as v
        from events where event_type is not null
      ),
      rr as (select unnest([{rows}]) as r),
      cells as (
        select ev.win_start, rr.r as row, {hex5} % {TREND_W} as col
        from ev cross join rr
        cross join lateral (
          select md5(cast(rr.r as varchar) || '|' || ev.v) as hx
        ) hh
      ),
      regs as (
        select win_start, row, col, count(*) as cnt
        from cells group by 1, 2, 3
      ),
      probes as (select distinct v from ev),
      probed as (
        select p.v, rr.r as row, {hex5} % {TREND_W} as col
        from probes p cross join rr
        cross join lateral (
          select md5(cast(rr.r as varchar) || '|' || p.v) as hx
        ) hh
      ),
      est as (
        select g.win_start, p.v as token,
               min(g.cnt) as est, count(*) as nrows
        from probed p join regs g using(row, col)
        group by 1, 2
      )
      select win_start, token, cast(est as bigint) as est
      from est
      where nrows = {TREND_D} and est >= {TREND_THRESHOLD}
    """


def _contamination_sql() -> str:
    return f"""
      with {SQL_SHINGLES.strip()},
      bench as (
        select distinct shingle from sh where doc_id % {CONTAM_MOD} = 0
      )
      select s.doc_id, count(*) as hit_shingles
      from sh s join bench b using(shingle)
      where s.doc_id % {CONTAM_MOD} <> 0
      group by 1
    """


def _pack_sequences_sql() -> str:
    return rf"""
      with t as (
        select doc_id,
               cast(doc_id % {PACK_SHARDS} as bigint) as shard,
               cast(case when length(trim(text)) = 0 then 0
                    else len(regexp_split_to_array(trim(text), '\s+')) end
                    as bigint) as n_tokens
        from documents
      )
      select doc_id, shard,
             cast(floor(coalesce(sum(n_tokens) over (
               partition by shard order by doc_id
               rows between unbounded preceding and 1 preceding), 0)
               / {PACK_BUDGET}.0) as bigint) as bin,
             n_tokens
      from t
    """


def oracle_sql() -> dict[str, str]:
    from graphscope_spark.functions import specs

    stop_list = ", ".join(f"'{w}'" for w in specs.STOPWORDS)
    from graphscope_spark.functions.sampling import hash_uniform_sql
    from graphscope_spark.functions.sketch import hll_oracle_sql
    from graphscope_spark.functions.classify import bucket_sql, weight_sql

    _k = specs.DUP_SPAN_K
    _wt = weight_sql(bucket_sql("tk", specs.QCLS_BUCKETS, specs.QCLS_SEED), specs.QCLS_SEED)

    _c, _s = specs.CHUNK_TOKENS, specs.CHUNK_TOKENS - specs.CHUNK_OVERLAP

    from graphscope_spark.functions.sketch import bloom_oracle_sql, cms_oracle_sql

    from graphscope_spark.functions.classify import ngram_lm_oracle_sql

    d = {
        "kmeans_embeddings": _kmeans_sql(),
        "khop_sample": _khop_sql(),
        "negative_sample": _negsample_sql(),
        "lm_perplexity": ngram_lm_oracle_sql(LM_K),
        "salsa": _salsa_sql(),
        "cocitation": f"""
          with edges as materialized ({SQL_EDGES}),
          d as (select src, count(*) as od from edges group by 1),
          b as (select e.src, e.dst from edges e join d using(src)
                where d.od <= {COCIT_CAP}),
          pairs as (
            select l.dst as a, r.dst as b, cast(count(*) as bigint) as common
            from b l join b r using(src)
            where l.dst < r.dst
            group by 1, 2
          )
          select a, b, common from pairs
          order by common desc, a asc, b asc limit {COCIT_K}
        """,
        "bib_coupling": f"""
          with edges as materialized (
            select distinct l_orderkey as src, l_partkey as dst from lineitem
          ),
          d as (select dst, count(*) as idg from edges group by 1),
          b as (select e.src, e.dst from edges e join d using(dst)
                where d.idg <= {COCIT_CAP}),
          pairs as (
            select l.src as a, r.src as b, cast(count(*) as bigint) as common
            from b l join b r using(dst)
            where l.src < r.src
            group by 1, 2
          )
          select a, b, common from pairs
          order by common desc, a asc, b asc limit {COCIT_K}
        """,
        "semantic_dedup_capped": _semantic_capped_sql(),
        "semantic_dedup": f"""
          with c as (select vec_id, embedding::DOUBLE[] as v from embeddings),
          cent as (select vec_id as cid, v as cv from c
                   where vec_id % {IVF_STRIDE} = 0),
          assign as (
            select vec_id, v, cid as cluster from (
              select c.vec_id, c.v, cent.cid,
                     row_number() over (
                       partition by c.vec_id
                       order by list_dot_product(c.v, cent.cv)
                                / (sqrt(list_dot_product(c.v, c.v))
                                   * sqrt(list_dot_product(cent.cv, cent.cv))) desc,
                                cent.cid asc) as rk
              from c cross join cent
            ) where rk = 1
          ),
          dups as (
            select distinct b.vec_id as dup_id
            from assign a join assign b using(cluster)
            where a.vec_id < b.vec_id
              and list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))) >= {SEMDEDUP_TAU}
          )
          select a.vec_id, a.cluster,
                 (d.dup_id is not null) as is_duplicate
          from assign a left join dups d on a.vec_id = d.dup_id
        """,
        "cms_tokens": cms_oracle_sql(
            r"""select unnest(regexp_split_to_array(trim(text), '\s+')) as token
                from documents where length(trim(text)) > 0""",
            "token",
            CMS_THRESHOLD,
            d=CMS_D,
            w=CMS_W,
        ),
        "bloom_contamination": bloom_oracle_sql(
            f"with {SQL_SHINGLES.strip()} select doc_id, shingle from sh "
            f"where doc_id % {CONTAM_MOD} <> 0",
            f"with {SQL_SHINGLES.strip()} select doc_id, shingle from sh "
            f"where doc_id % {CONTAM_MOD} = 0",
            k=BLOOM_K,
            m=BLOOM_M,
        ),
        "inverted_index": r"""
          with tok as (
            select doc_id as doc, x as term
            from (select doc_id, regexp_split_to_array(trim(text), '\s+') as t
                  from documents), unnest(t) as u(x)
          ),
          tf as (
            select term, doc, cast(count(*) as bigint) as tf
            from tok group by 1, 2
          ),
          rk as (
            select *, cast(row_number() over (
              partition by term order by tf desc, doc asc) as int) as rnk
            from tf
          )
          select term, cast(count(*) as bigint) as df,
                 coalesce(string_agg(
                   cast(doc as varchar) || ':' || cast(tf as varchar), ' '
                   order by rnk) filter (rnk <= 10), '') as postings
          from rk group by term order by term
        """,
        "crawl_delta": r"""
          with o as (
            select doc_id,
                   md5(regexp_replace(lower(trim(
                     case when doc_id % 7 = 0 then text || ' OLD' else text end
                   )), '\s+', ' ', 'g')) as fp_old
            from documents where doc_id % 10 <> 3
          ),
          n as (
            select doc_id,
                   md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as fp_new
            from documents where doc_id % 10 <> 7
          )
          select coalesce(o.doc_id, n.doc_id) as doc_id,
                 case when o.doc_id is null then 'added'
                      when n.doc_id is null then 'removed'
                      when fp_old <> fp_new then 'changed'
                      else 'unchanged' end as status
          from o full outer join n on o.doc_id = n.doc_id
          order by 1
        """,
        "doc_chunks": rf"""
          with t as (
            select doc_id, regexp_split_to_array(trim(text), '\s+') as tk
            from documents
          ),
          m as (
            select doc_id, tk, len(tk) as n,
                   1 + cast(floor((greatest(len(tk) - {_c}, 0) + {_s - 1})
                                  / {_s}) as int) as m
            from t
          ),
          ch as (
            select doc_id, cast(i as bigint) as chunk_id,
                   array_to_string(tk[i*{_s}+1 : i*{_s}+{_c}], ' ') as chunk_text,
                   cast(least({_c}, n - i*{_s}) as bigint) as nct
            from m, unnest(generate_series(0, m - 1)) as g(i)
          )
          select doc_id,
                 cast(count(*) as bigint) as n_chunks,
                 cast(sum(nct) as bigint) as sum_chunk_tokens,
                 md5(array_to_string(
                   list_sort(list(cast(chunk_id as varchar) || ':' || md5(chunk_text))),
                   '|')) as chunks_digest
          from ch group by doc_id
          order by doc_id
        """,
        "dup_spans": rf"""
          with toks as (
            select doc_id, regexp_split_to_array(trim(text), '\s+') as t
            from documents
          ),
          pos as (
            select doc_id, md5(array_to_string(t[i:i+{_k - 1}], ' ')) as span
            from toks, unnest(generate_series(1, len(t) - {_k - 1})) as g(i)
            where len(t) >= {_k}
          ),
          freq as (
            select span, 1 as isdup from pos
            group by span having count(distinct doc_id) >= {specs.DUP_SPAN_MIN_DOCS}
          ),
          per as (
            select p.doc_id, count(*) as n_spans, count(f.isdup) as n_dup
            from pos p left join freq f using(span)
            group by 1
          )
          select d.doc_id,
                 cast(coalesce(per.n_spans, 0) as bigint) as n_spans,
                 cast(coalesce(per.n_dup, 0) as bigint) as n_dup_spans,
                 round(cast(coalesce(per.n_dup, 0) as double)
                       / greatest(coalesce(per.n_spans, 0), 1), 8) as dup_frac
          from documents d left join per using(doc_id)
          order by doc_id
        """,
        "host_reputation": rf"""
          with t as (
            select doc_id, source,
                   regexp_split_to_array(trim(text), '\s+') as toks,
                   cast(case when length(trim(text)) = 0 then 0
                        else len(regexp_split_to_array(trim(text), '\s+')) end
                        as bigint) as n_tokens
            from documents
          ),
          f as (
            select doc_id, source, n_tokens,
                   greatest(n_tokens, 1) as st,
                   len(list_distinct(toks)) as nu,
                   len(list_filter(toks, x -> list_contains([{stop_list}], x))) as ns
            from t
          ),
          scored as (
            select doc_id, source,
                   0.4 * least(n_tokens / 50.0, 1.0)
                   + 0.3 * (nu / st)
                   + 0.3 * least((ns / st) * 5.0, 1.0) as q
            from f
          ),
          hosts as (
            select source, cast(count(*) as bigint) as host_docs, avg(q) as hq
            from scored group by source
          )
          select s.doc_id, s.source, h.host_docs,
                 round(h.hq, 8) as host_quality,
                 (h.hq >= {specs.HOST_MIN_QUALITY!r}) as keep
          from scored s join hosts h using(source)
          order by s.doc_id
        """,
        "quality_classifier": rf"""
          with t as (
            select doc_id, regexp_split_to_array(trim(text), '\s+') as toks
            from documents
          ),
          tok as (select doc_id, x as tk from t, unnest(toks) as u(x)),
          w as (select doc_id, {_wt} as wt from tok),
          agg as (
            select doc_id, cast(count(*) as bigint) as n_tokens,
                   round(sum(wt) / greatest(count(*), 1), 8) as mean
            from w group by doc_id
          )
          select doc_id, n_tokens,
                 round(1.0 / (1.0 + exp(-mean)), 8) as cls_score,
                 (round(1.0 / (1.0 + exp(-mean)), 8) >= {specs.QCLS_THRESHOLD!r}) as cls_keep
          from agg
          order by doc_id
        """,
        "crawl_frontier": r"""
          with c as (
            select 'u' || cast(o_orderkey as varchar) as url,
                   'h' || cast(o_custkey % 40 as varchar) as host,
                   o_totalprice as score
            from orders
          ),
          q as (
            select *, cast(row_number() over (
              partition by host order by score desc, url asc) as int) as host_rank
            from c
          )
          select url, host, score, host_rank, cast(rank as int) as rank
          from (
            select *, row_number() over (
              order by score desc, url asc) as rank
            from q where host_rank <= 3
          ) where rank <= 100
        """,
        "weighted_sample": rf"""
          with scored as (
            select doc_id, cast(n_chars as double) as weight,
                   ln({hash_uniform_sql('doc_id')})
                     / cast(n_chars as double) as es_key
            from documents where cast(n_chars as double) > 0
          )
          select doc_id, weight, round(es_key, 8) as es_key,
                 cast(rank as int) as rank
          from (
            select *, row_number() over (
              order by es_key desc, doc_id asc) as rank
            from scored
          ) where rank <= 50
        """,
        "length_quantiles": r"""
          with q as (
            select lang, quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.95]) as qs
            from documents group by lang
          )
          select lang,
                 unnest([cast(0.25 as double), cast(0.5 as double),
                         cast(0.75 as double), cast(0.95 as double)]) as p,
                 round(cast(unnest(qs) as double), 8) as value
          from q
        """,
        "hll_tokens": hll_oracle_sql(
            r"""select unnest(regexp_split_to_array(trim(text), '\s+')) as token
                from documents where length(trim(text)) > 0""",
            "token",
        ),
        "hll_users_by_type": hll_oracle_sql(
            "select event_type, user_id from events",
            "user_id",
            group_cols=["event_type"],
        ),
        "anchor_profile": r"""
          with a as (
            select 'site' || cast(o_custkey % 100 as varchar) as dst_url,
                   ['click','here','link','page','ref'][cast(o_orderkey % 5 as int) + 1]
                   || ' ' ||
                   ['alpha','beta','gamma','delta'][cast(o_custkey % 4 as int) + 1]
                     as anchor
            from orders
          ),
          tok as (
            select dst_url,
                   unnest(regexp_split_to_array(trim(anchor), '\s+')) as token
            from a where length(trim(anchor)) > 0
          ),
          c as (select dst_url, token, count(*) as cnt from tok group by 1, 2)
          select dst_url, token, cnt, cast(rank as int) as rank
          from (
            select *, row_number() over (
              partition by dst_url order by cnt desc, token asc) as rank
            from c
          ) where rank <= 3
        """,
        "tfidf_topk": r"""
          with tok as (
            select doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) as token
            from documents where length(trim(text)) > 0
          ),
          tf as (select doc_id, token, count(*) as tf from tok group by 1, 2),
          dfx as (select token, count(*) as df from tf group by 1),
          n as (select count(*) as n_docs from documents),
          scored as (
            select t.doc_id, t.token, t.tf, d.df,
                   t.tf * ln(cast(n.n_docs as double) / d.df) as tfidf_raw
            from tf t join dfx d using (token) cross join n
          )
          select doc_id, token, tf, df,
                 round(tfidf_raw, 8) as tfidf,
                 cast(rank as int) as rank
          from (
            select *, row_number() over (
              partition by doc_id order by tfidf_raw desc, token asc) as rank
            from scored
          ) where rank <= 5
        """,
        "bm25": r"""
          with q as (select unnest(['hash', 'spark', 'window']) as token),
          lens as (
            select doc_id,
                   cast(case when length(trim(text)) = 0 then 0
                        else len(regexp_split_to_array(trim(text), '\s+')) end
                        as double) as dl
            from documents
          ),
          tok as (
            select doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) as token
            from documents where length(trim(text)) > 0
          ),
          tf as (
            select t.doc_id, t.token, count(*) as tf
            from tok t join q using (token) group by 1, 2
          ),
          dfx as (select token, count(*) as df from tf group by 1),
          stats as (
            select cast(count(*) as double) as n_docs, avg(dl) as avgdl
            from lens
          ),
          scored as (
            select t.doc_id,
                   sum(
                     ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                     * (t.tf * 2.2)
                     / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
                   ) as score_raw
            from tf t
            join dfx d using (token)
            join lens l using (doc_id)
            cross join stats s
            group by t.doc_id
          )
          select doc_id, round(score_raw, 8) as score, cast(rank as int) as rank
          from (
            select *, row_number() over (
              order by score_raw desc, doc_id asc) as rank
            from scored
          ) where rank <= 20
        """,
        "ngram_stats": r"""
          with t as (
            select regexp_split_to_array(trim(text), '\s+') as toks
            from documents where length(trim(text)) > 0
          ),
          g as (
            select unnest(list_transform(
              generate_series(1, len(toks) - 1),
              i -> concat(toks[i], ' ', toks[i + 1]))) as ngram
            from t where len(toks) >= 2
          ),
          c as (select ngram, count(*) as cnt from g group by 1),
          tot as (select sum(cnt) as total from c)
          select ngram, cnt,
                 round(cast(cnt as double) / total, 8) as share,
                 cast(rank as int) as rank
          from (
            select ngram, cnt, row_number() over (
              order by cnt desc, ngram asc) as rank
            from c
          ) cross join tot
          where rank <= 100
        """,
        "corpus_split": _corpus_split_sql(),
        "quality_resample": _quality_resample_sql(stop_list),
        "domain_mix": _domain_mix_sql(),
        "partition_report": f"""
          with edges as ({SQL_EDGES}),
          verts as ({SQL_VERTS}),
          es as (
            select src % {PART_P} as part,
                   cast(count(*) as bigint) as owned_edges,
                   cast(sum(case when src % {PART_P} <> dst % {PART_P}
                            then 1 else 0 end) as bigint) as cut_edges
            from edges group by 1
          ),
          vs as (
            select vid % {PART_P} as part,
                   cast(count(*) as bigint) as vertices
            from verts group by 1
          )
          select part,
                 coalesce(vertices, 0) as vertices,
                 coalesce(owned_edges, 0) as owned_edges,
                 coalesce(cut_edges, 0) as cut_edges,
                 round(coalesce(cut_edges, 0)
                       / greatest(coalesce(owned_edges, 0), 1), 8) as cut_frac
          from vs full join es using(part)
        """,
        "url_filter": rf"""
          with u as (
            select 'http://'
                   || case when o_custkey % 13 = 0 then 'WWW.' else '' end
                   || 'Site' || cast(o_custkey % 8 as varchar) || '.example.com'
                   || case when o_orderkey % 7 = 0 then '/ads/x'
                           else '/p/' || cast(o_orderkey as varchar) end
                   || case when o_orderkey % 11 = 0 then '?utm_source=1'
                           else '' end
                   || case when o_orderkey % 17 = 0 then '/file.zip'
                           else '' end as url
            from orders
          ),
          f as (
            select url,
                   lower(regexp_extract(url,
                     '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$', 2)) as host
            from u
          ),
          r as (
            select host,
                   case
                     when host = 'site3.example.com'
                          or ends_with(host, '.site3.example.com')
                          or host = 'site5.example.com'
                          or ends_with(host, '.site5.example.com')
                       then 'host'
                     when regexp_matches(url,
                          '(?:/ads?/)|(?:[?&]utm_)|(?:\.(exe|zip|dmg)$)')
                       then 'pattern'
                     else null
                   end as block_reason
            from f
          )
          select host, block_reason, cast(count(*) as bigint) as n
          from r group by 1, 2
        """,
        "contamination": _contamination_sql(),
        "pack_sequences": _pack_sequences_sql(),
        "graph_degree": f"""
          with edges as ({SQL_EDGES}),
          verts as ({SQL_VERTS})
          select v.vid,
                 coalesce(o.c, 0) as out_deg,
                 coalesce(i.c, 0) as in_deg
          from verts v
          left join (select src as vid, count(*) as c from edges group by 1) o using(vid)
          left join (select dst as vid, count(*) as c from edges group by 1) i using(vid)
        """,
        "pagerank": _pagerank_sql(),
        "nation_pagerank": _nation_pagerank_sql(),
        "wcc": _wcc_sql(),
        "wcc_log": _wcc_sql(),
        "cdlp": _cdlp_sql(),
        "lpa_u2i": _lpa_u2i_sql(),
        "triangles": _triangles_sql(),
        "lcc": _lcc_sql(),
        "bfs": _bfs_sql(),
        "sssp": _sssp_sql(),
        "pie_sssp": _sssp_sql(),
        "load_app_sssp": _sssp_sql(),
        "degree_centrality": f"""
          with edges as ({SQL_EDGES}),
          verts as ({SQL_VERTS}),
          nn as (select cast(count(*) as double) as n from verts)
          select v.vid,
                 round((coalesce(o.c, 0) + coalesce(i.c, 0))
                       / greatest((select n from nn) - 1, 1.0), 8) as centrality
          from verts v
          left join (select src as vid, count(*) as c from edges group by 1) o using(vid)
          left join (select dst as vid, count(*) as c from edges group by 1) i using(vid)
        """,
        "hits": _hits_sql(),
        "kcore": _kcore_sql(),
        "eigenvector_centrality": _eigenvector_sql(),
        "katz_centrality": _katz_sql(),
        "closeness_centrality": _closeness_sql(),
        "avg_clustering": _avg_clustering_sql(),
        "transitivity": _transitivity_sql(),
        "degree_assortativity": _assortativity_sql(),
        "wcc_property": _wcc_property_sql(),
        "sssp_property": _sssp_property_sql(),
        "betweenness_sampled": _betweenness_sql(),
        "betweenness_endpoints": _betweenness_sql(endpoints=True),
        "graphar_roundtrip": f"""
          with edges as materialized ({SQL_EDGES})
          select v.vid,
                 coalesce(d.c, 0) as out_deg,
                 coalesce(d.s, 0) as nbr_sum
          from (select src as vid from edges union select dst from edges) v
          left join (
            select src as vid, count(*) as c,
                   cast(sum(dst) as bigint) as s
            from edges group by 1
          ) d using (vid)
        """,
        "graph_serde_roundtrip": f"""
          with edges as materialized ({SQL_EDGES})
          select v.vid,
                 coalesce(d.c, 0) as in_deg,
                 coalesce(d.s, 0) as src_sum
          from (select src as vid from edges union select dst from edges) v
          left join (
            select dst as vid, count(*) as c,
                   cast(sum(src) as bigint) as s
            from edges group by 1
          ) d using (vid)
        """,
        "consolidate_columns": """
          select c_custkey as vid,
                 cast(c_acctbal as double) as bal,
                 cast(c_custkey % 7 as double) as m7,
                 cast(2 as int) as n_props
          from customer
        """,
        "mutable_ops": """
          with base as (
            select s_suppkey as src, 100000 + s_nationkey as dst from supplier
          ),
          added as (select 999990 as src, 100000 + i as dst from range(5) t(i)),
          alle as (select * from base union all select * from added),
          kept as (
            select * from alle
            where src <> 100003 and dst <> 100003
              and not (src = 999990 and dst = 100004)
          ),
          verts as (
            select src as vid from base union select dst from base
            union select 999999 union select src from added
            union select dst from added
          )
          select v.vid,
                 coalesce(o.c, 0) as out_deg,
                 coalesce(i.c, 0) as in_deg
          from (select vid from verts where vid <> 100003) v
          left join (select src as vid, count(*) as c from kept group by 1) o
            using (vid)
          left join (select dst as vid, count(*) as c from kept group by 1) i
            using (vid)
        """,
        "pregel_sssp": _sssp_sql(),
        "pagerank_resume": _pagerank_sql(),
        "induced_subgraph": f"""
          with edges as materialized ({SQL_EDGES}),
          verts as (select src as vid from edges union select dst from edges),
          keep as (select vid from verts where vid % 2 = 0),
          kept as (select * from edges where src % 2 = 0 and dst % 2 = 0)
          select k.vid,
                 cast(coalesce(o.c, 0) as bigint) as out_deg,
                 cast(coalesce(i.c, 0) as bigint) as in_deg
          from keep k
          left join (select src as vid, count(*) as c from kept group by 1) o
            using (vid)
          left join (select dst as vid, count(*) as c from kept group by 1) i
            using (vid)
        """,
        "graph_contract": f"""
          with wedges as materialized ({SQL_WEDGES}),
          verts as (select src as vid from wedges union select dst from wedges),
          m as (
            select vid,
                   case when vid < 1000000 then vid % 97
                        else 1000000 + vid % 53 end as gid
            from verts
          )
          select ms.gid as src, md.gid as dst, cast(sum(e.w) as double) as w
          from wedges e
          join m ms on ms.vid = e.src
          join m md on md.vid = e.dst
          group by 1, 2
        """,
        "louvain": _louvain_sql(),
        "avg_degree_connectivity": _adc_sql(),
        "core_number": _core_number_sql(),
        "attr_assortativity": f"""
          with edges as materialized ({SQL_EDGES}),
          sym as materialized ({SQL_SYM}),
          attrs as materialized (
            select c_custkey as vid, c_nationkey as attr from customer
            union all
            select 1000000 + s_suppkey, s_nationkey from supplier
          ),
          pairs as materialized (
            select sa.attr as a_src, sb.attr as a_dst
            from sym s
            join attrs sa on sa.vid = s.src
            join attrs sb on sb.vid = s.dst
          ),
          m as (select cast(count(*) as double) as n from pairs),
          tr as (select count(*) / (select n from m) as t from pairs where a_src = a_dst),
          rows_ as (select a_src as k, count(*) / (select n from m) as rowsum from pairs group by 1),
          cols_ as (select a_dst as k, count(*) / (select n from m) as colsum from pairs group by 1),
          sq as (select coalesce(sum(rowsum * colsum), 0.0) as s from rows_ join cols_ using(k))
          select round(((select t from tr) - s) / (1.0 - s), 8) as attr_assortativity from sq
        """,
        "numeric_assortativity": f"""
          with edges as materialized ({SQL_EDGES}),
          sym as materialized ({SQL_SYM}),
          attrs as materialized (
            select c_custkey as vid, c_nationkey as attr from customer
            union all
            select 1000000 + s_suppkey, s_nationkey from supplier
          )
          select round(corr(cast(sa.attr as double), cast(sb.attr as double)), 8)
                 as numeric_assortativity
          from sym s
          join attrs sa on sa.vid = s.src
          join attrs sb on sb.vid = s.dst
        """,
        "bfs_parent": _bfs_parent_sql(),
        "kshell": _kshell_sql(),
        "articlerank": _articlerank_sql(),
        "degeneracy_ordering": _degeneracy_ordering_sql(),
        "onion_layers": _onion_layers_sql(),
        "kcore_size": _kcore_size_sql(),
        "coloring": _coloring_sql(),
        "lpa_by_color": _lpa_by_color_sql(),
        "min_edge_cover": _min_edge_cover_sql(),
        "k_center": _k_center_sql(),
        "fluid_communities": _fluid_sql(),
        "five_clique": _kclique_sql(5),
        "sssp_delta": _sssp_sql(),
        "sampling_path": _sampling_path_sql(),
        "random_walks": _random_walks_sql(),
        "node2vec": _node2vec_sql(),
        "is_simple_path": _is_simple_path_sql(),
        "all_simple_paths": _all_simple_paths_sql(),
        "sssp_path": _sssp_path_sql(),
        "has_path": _has_path_sql(),
        "lcc_directed": _lcc_directed_sql(),
        "random_multi_bfs": _random_multi_bfs_sql(),
        "sssp_avg_length": _sssp_avg_length_sql(),
        "voterank": _voterank_sql(),
        "msf": _msf_sql(),
        "dfs_preorder": _dfs_preorder_sql(),
        "doc_tokens": r"""
          select doc_id,
                 cast(case when length(trim(text)) = 0 then 0
                      else len(regexp_split_to_array(trim(text), '\s+')) end
                      as bigint) as n_tokens
          from documents
        """,
        "doc_fingerprint": r"""
          select doc_id,
                 md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as fp
          from documents
        """,
        "doc_quality": rf"""
          with t as (
            select doc_id,
                   regexp_split_to_array(trim(text), '\s+') as toks,
                   length(text) as nc,
                   cast(case when length(trim(text)) = 0 then 0
                        else len(regexp_split_to_array(trim(text), '\s+')) end
                        as bigint) as n_tokens
            from documents
          ),
          f as (
            select doc_id, n_tokens,
                   greatest(n_tokens, 1) as st,
                   len(list_distinct(toks)) as nu,
                   len(list_filter(toks, x -> list_contains([{stop_list}], x))) as ns
            from t
          )
          select doc_id, n_tokens,
                 round(nu / st, 8) as uniq_token_ratio,
                 round(ns / st, 8) as stopword_ratio,
                 round(0.4 * least(n_tokens / 50.0, 1.0)
                       + 0.3 * (nu / st)
                       + 0.3 * least((ns / st) * 5.0, 1.0), 8) as quality_score
          from f
        """,
        "doc_repetition": _doc_repetition_sql(),
        "url_canonical": _URL_CANONICAL_SQL,
        "doc_redact": _doc_redact_sql(),
        "training_corpus": _training_corpus_sql(stop_list),
        "doc_lang": rf"""
          with tok as (
            select doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) as word
            from documents
          ),
          markers(cand_lang, word) as (values {_lang_markers_values()}),
          scores as (
            select doc_id, cand_lang, count(*) as hits
            from tok join markers using(word)
            group by 1, 2
          ),
          picked as (
            select doc_id, cand_lang from scores
            qualify row_number() over (
              partition by doc_id order by hits desc, cand_lang asc) = 1
          )
          select d.doc_id, coalesce(p.cand_lang, 'und') as pred_lang
          from documents d left join picked p using(doc_id)
        """,
        "dedup_exact": r"""
          with fp as (
            select doc_id,
                   md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) as f
            from documents
          ),
          canon as (select f, min(doc_id) as canonical_id from fp group by 1)
          select fp.doc_id, c.canonical_id,
                 fp.doc_id != c.canonical_id as is_duplicate
          from fp join canon c using(f)
        """,
        "minhash_signatures": f"""
          with {SQL_SHINGLES}
          select doc_id,
                 {_minhash_cols_sql()}
          from sh group by doc_id
        """,
        "lsh_pairs": f"""
          with {SQL_SHINGLES},
          sig as (select doc_id, {_minhash_cols_sql()} from sh group by doc_id),
          banded as (
            select doc_id, unnest([
              concat_ws('|', '0', mh_0, mh_1),
              concat_ws('|', '1', mh_2, mh_3),
              concat_ws('|', '2', mh_4, mh_5),
              concat_ws('|', '3', mh_6, mh_7)
            ]) as band from sig
          )
          select distinct x.doc_id as a, y.doc_id as b
          from banded x join banded y using(band)
          where x.doc_id < y.doc_id
        """,
        "ngram_jaccard": f"""
          with {SQL_SHINGLES},
          sig as (select doc_id, {_minhash_cols_sql()} from sh group by doc_id),
          banded as (
            select doc_id, unnest([
              concat_ws('|', '0', mh_0, mh_1),
              concat_ws('|', '1', mh_2, mh_3),
              concat_ws('|', '2', mh_4, mh_5),
              concat_ws('|', '3', mh_6, mh_7)
            ]) as band from sig
          ),
          cand as (
            select distinct x.doc_id as a, y.doc_id as b
            from banded x join banded y using(band)
            where x.doc_id < y.doc_id
          ),
          sizes as (select doc_id, count(*) as sz from sh group by 1),
          inter as (
            select c.a, c.b, count(*) as ni
            from cand c
            join sh x on x.doc_id = c.a
            join sh y on y.doc_id = c.b and y.shingle = x.shingle
            group by 1, 2
          )
          select i.a, i.b,
                 round(i.ni / (sa.sz + sb.sz - i.ni), 8) as jaccard
          from inter i
          join sizes sa on sa.doc_id = i.a
          join sizes sb on sb.doc_id = i.b
        """,
        "simhash": _simhash_sql(),
        "knn_cosine": f"""
          with q as (select vec_id as qid, embedding::DOUBLE[] as qv
                     from embeddings where vec_id < {KNN_QUERIES}),
          c as (select vec_id as nid, embedding::DOUBLE[] as cv from embeddings),
          scored as (
            select qid as query_id, nid as neighbor_id,
                   list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) as cos
            from q join c on qid != nid
          ),
          ranked as (
            select query_id, neighbor_id, cos,
                   row_number() over (
                     partition by query_id order by cos desc, neighbor_id asc) as rk
            from scored
          )
          select query_id, neighbor_id, cast(rk as int) as rank,
                 round(cos, 6) as cosine
          from ranked where rk <= {KNN_K}
        """,
        "knn_lsh": f"""
          with e as (
            select vec_id, embedding::DOUBLE[] as v,
                   (case when embedding[1] >= 0 then 1 else 0 end)
                 + (case when embedding[2] >= 0 then 2 else 0 end)
                 + (case when embedding[3] >= 0 then 4 else 0 end)
                 + (case when embedding[4] >= 0 then 8 else 0 end) as bucket
            from embeddings
          ),
          q as (select vec_id as qid, v as qv, bucket from e where vec_id < {KNN_QUERIES}),
          scored as (
            select qid as query_id, e.vec_id as neighbor_id,
                   list_dot_product(qv, e.v)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v))) as cos
            from q join e using(bucket)
            where qid != e.vec_id
          ),
          ranked as (
            select query_id, neighbor_id, cos,
                   row_number() over (
                     partition by query_id order by cos desc, neighbor_id asc) as rk
            from scored
          )
          select query_id, neighbor_id, cast(rk as int) as rank,
                 round(cos, 6) as cosine
          from ranked where rk <= {KNN_K}
        """,
        "knn_ivf": f"""
          with c as (select vec_id, embedding::DOUBLE[] as v from embeddings),
          cent as (select vec_id as cid, v as cv from c
                   where vec_id % {IVF_STRIDE} = 0),
          ascore as (
            select c.vec_id, c.v, cid,
                   list_dot_product(v, cv)
                   / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) as ccos
            from c cross join cent
          ),
          assign as (
            select vec_id, v, cid as cluster from (
              select vec_id, v, cid,
                     row_number() over (
                       partition by vec_id order by ccos desc, cid asc) as rk
              from ascore
            ) where rk = 1
          ),
          probe as (
            select qid, qv, cid as cluster from (
              select q.vec_id as qid, q.v as qv, cent.cid,
                     row_number() over (
                       partition by q.vec_id
                       order by list_dot_product(q.v, cent.cv)
                                / (sqrt(list_dot_product(q.v, q.v))
                                   * sqrt(list_dot_product(cent.cv, cent.cv))) desc,
                                cent.cid asc) as rk
              from c q cross join cent
              where q.vec_id < {KNN_QUERIES}
            ) where rk <= {IVF_NPROBE}
          ),
          scored as (
            select p.qid as query_id, a.vec_id as neighbor_id,
                   list_dot_product(p.qv, a.v)
                   / (sqrt(list_dot_product(p.qv, p.qv))
                      * sqrt(list_dot_product(a.v, a.v))) as cos
            from probe p join assign a using(cluster)
            where p.qid != a.vec_id
          ),
          ranked as (
            select query_id, neighbor_id, cos,
                   row_number() over (
                     partition by query_id order by cos desc, neighbor_id asc) as rk
            from scored
          )
          select query_id, neighbor_id, cast(rk as int) as rank,
                 round(cos, 6) as cosine
          from ranked where rk <= {KNN_K}
        """,
        "event_counts": """
          select date_trunc('hour', ts) as win_start,
                 event_type,
                 count(*) as n_events,
                 round(sum(value), 4) as sum_value
          from events
          group by 1, 2
        """,
        "harmonic_centrality": _harmonic_sql(),
        "eccentricity": _eccentricity_sql(),
        "apsp_sampled": _apsp_sql(),
        "apsp": _apsp_full_sql(),
        "diameter_sampled": _diameter_sql(),
        "ppr": _ppr_sql(),
        "mis": _mis_sql(),
        "scc": _scc_sql(),
        "four_clique": _k4_sql(),
        "ktruss": _ktruss_sql(),
        "subgraph_census": _subgraph_census_sql(),
        "triangle_census_directed": _triangle_census_directed_sql(),
        "densest_density": _densest_sql(),
        "clustering_directed": _clustering_directed_sql(),
        "bridges": _bridges_sql(),
        "articulation_points": _articulation_sql(),
        "bcc": _bcc_sql(),
        "maximal_matching": _mm_sql(),
        "min_vertex_cover": _min_cover_sql(),
        "min_dominating_set": _domset_sql(),
        "link_prediction": _linkpred_sql(),
        "node_boundary": _node_boundary_sql(),
        "edge_boundary": _edge_boundary_sql(),
        "dedup_near": _dedup_near_sql(),
        "embedding_neardup": _emb_neardup_sql(),
        "simhash_neardup": _simhash_neardup_sql(),
        "doc_tokens_bpe": r"""
          select doc_id,
                 cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
                      as bigint) as n_bpe_tokens
          from documents
        """,
        "iceberg_roundtrip": """
          -- casts: DuckDB sum(BIGINT) yields HUGEINT which lands in
          -- pandas as float64 ("17171.0") while Spark renders int64
          -- ("17171"); the driver hashes rendered values, so the dtype
          -- alone flipped this row red in r01-r04 (VERDICT r4 #1).
          select lang, count(*) as n_docs,
                 cast(sum(doc_id) as bigint) as sum_id,
                 cast(sum(n_chars) as bigint) as sum_chars
          from documents group by lang
        """,
        "segment_dedup": """
          with toks as (
            select doc_id, string_split(text, ' ') as ts from documents
          ),
          segs as (
            select doc_id, i as seg_pos,
                   array_to_string(ts[i*5+1 : i*5+5], ' ') as seg
            from toks,
                 unnest(range(cast(ceil(len(ts)/5.0) as bigint))) as t(i)
          ),
          freq as (
            select seg, count(distinct doc_id) as df from segs group by seg
          ),
          flagged as (
            select s.doc_id, s.seg_pos, s.seg, f.df <= 1 as keep
            from segs s join freq f using (seg)
          )
          select doc_id,
                 string_agg(seg, ' ' order by seg_pos) filter (keep)
                   as clean_text,
                 cast(count(*) filter (keep) as int) as kept_segs,
                 count(*) filter (not keep) as dropped_segs
          from flagged
          group by doc_id
          having count(*) filter (keep) > 0
        """,
    }
    d["corpus_pipeline"] = rf"""
      with kept as (
        select dd.doc_id, dd.text
        from documents dd
        join ({d['host_reputation']}) h on h.doc_id = dd.doc_id and h.keep
        join ({d['quality_classifier']}) q on q.doc_id = dd.doc_id and q.cls_keep
        join ({d['dup_spans']}) s on s.doc_id = dd.doc_id and s.dup_frac <= 0.2
      ),
      t as (
        select doc_id, regexp_split_to_array(trim(text), '\s+') as tk from kept
      ),
      m as (
        select doc_id, tk, len(tk) as n,
               1 + cast(floor((greatest(len(tk) - {_c}, 0) + {_s - 1})
                              / {_s}) as int) as m
        from t
      ),
      ch as (
        select doc_id, cast(i as bigint) as chunk_id,
               array_to_string(tk[i*{_s}+1 : i*{_s}+{_c}], ' ') as chunk_text,
               cast(least({_c}, n - i*{_s}) as bigint) as nct
        from m, unnest(generate_series(0, m - 1)) as g(i)
      )
      select doc_id,
             cast(count(*) as bigint) as n_chunks,
             cast(sum(nct) as bigint) as sum_chunk_tokens,
             md5(array_to_string(
               list_sort(list(cast(chunk_id as varchar) || ':' || md5(chunk_text))),
               '|')) as chunks_digest
      from ch group by doc_id
      order by doc_id
    """
    # streaming-derived contracts: the incremental WCC/triangle
    # fixpoints equal the cold runs, so they SHARE those oracles
    from graphscope_spark.functions.classify import train_classifier_oracle_sql

    d["train_quality_lr"] = train_classifier_oracle_sql(
        "lang = 'en'", dims=LR_DIMS, seed=LR_SEED, steps=LR_STEPS, lr=LR_RATE
    )
    d["pages_extract"] = _pages_extract_sql()
    d["pages_linkgraph"] = _pages_linkgraph_sql()
    d["pages_pagerank"] = _pages_pagerank_sql()
    d["stream_incr_wcc"] = d["wcc"]
    d["stream_incr_triangles"] = d["triangles"]
    d["stream_incr_pagerank"] = _stream_pagerank_sql()
    d["stream_dedup_final"] = _stream_dedup_sql()
    d["stream_trending"] = _stream_trending_sql()
    d["stream_neardup_final"] = _stream_neardup_sql()
    return d
