"""Round-2 operators vs pure-Python oracles: multi-source distances,
harmonic/eccentricity, SCC, MIS, 4-cliques, PPR, link prediction,
boundaries."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from graphscope_spark.algorithms import (
    apsp_sampled,
    eccentricity,
    four_clique_count,
    harmonic_centrality,
    link_prediction,
    maximal_independent_set,
    multi_source_distances,
    node_boundary,
    edge_boundary,
    personalized_pagerank,
    strongly_connected_components,
)
from tests.conftest import TINY_EDGES, TINY_VERTICES
from tests import oracle


ROOTS = [0, 30, 60, 90, 120, 150]


def test_multi_source_distances_rand(spark, rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.multi_source_bfs_oracle(edges, ROOTS, directed=False)
    for lfr in (0, 4_000_000):  # distributed wide sweep AND local finisher
        got = {
            (r["root"], r["vid"]): int(r["dist"])
            for r in multi_source_distances(
                rand_graph, ROOTS, directed=False, local_finish_rows=lfr
            ).collect()
        }
        assert got == exp


def test_multi_source_local_matches_distributed(spark, rand_graph):
    """The size-gated single-task finisher is bit-equal to the
    distributed wide sweep (both compute min over forward-accumulated
    path sums), weighted and unweighted."""
    from graphscope_spark.graph import Graph

    e = rand_graph.edges.select(
        "src", "dst", (F.col("src") % 5 + 1).cast("double").alias("w")
    )
    gw = Graph.from_edges(e, rand_graph.vertices, directed=True, num_partitions=4)
    for w in (None, "w"):
        dist = {
            (r["root"], r["vid"]): r["dist"]
            for r in multi_source_distances(
                gw, ROOTS, weight=w, directed=False, local_finish_rows=0
            ).collect()
        }
        loc = {
            (r["root"], r["vid"]): r["dist"]
            for r in multi_source_distances(
                gw, ROOTS, weight=w, directed=False
            ).collect()
        }
        assert loc == dist


def test_multi_source_batching_matches(spark, rand_graph):
    """Chunked passes must agree with a single-batch pass."""
    one = {
        (r["root"], r["vid"]): r["dist"]
        for r in multi_source_distances(
            rand_graph, ROOTS, directed=False, batch=2, local_finish_rows=0
        ).collect()
    }
    full = {
        (r["root"], r["vid"]): r["dist"]
        for r in multi_source_distances(
            rand_graph, ROOTS, directed=False, local_finish_rows=0
        ).collect()
    }
    assert one == full


def test_harmonic_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.harmonic_oracle(edges, ROOTS)
    got = {r["vid"]: r["centrality"] for r in harmonic_centrality(rand_graph, ROOTS).collect()}
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, v


def test_eccentricity_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.eccentricity_oracle(edges, ROOTS)
    got = {r["vid"]: r["ecc"] for r in eccentricity(rand_graph, ROOTS).collect()}
    assert got == exp


def test_scc_tiny(tiny_graph):
    # tiny digraph: cycle 0-1-2 (0->1->2->0), 4-5-6 loop, 3 and 7 singletons
    exp = oracle.scc_oracle(TINY_EDGES)
    got = {r["vid"]: r["scc"] for r in strongly_connected_components(tiny_graph).collect()}
    # engine's vertex set = edge endpoints plus declared vertices
    for v, c in exp.items():
        assert got[v] == c, (v, got[v], c)


def test_scc_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.scc_oracle(edges)
    got = {r["vid"]: r["scc"] for r in strongly_connected_components(rand_graph).collect()}
    for v, c in exp.items():
        assert got[v] == c, (v, got[v], c)
    # distributed supersteps pinned equal to the single-task finisher
    dist = {
        r["vid"]: r["scc"]
        for r in strongly_connected_components(
            rand_graph, local_finish_rows=0
        ).collect()
    }
    assert dist == got


def test_mis_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.mis_oracle(edges, vertices)
    got = {r["vid"]: r["in_mis"] for r in maximal_independent_set(rand_graph).collect()}
    assert got == exp


def test_four_clique_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.four_clique_oracle(edges, vertices)
    got = four_clique_count(rand_graph).collect()[0]["k4"]
    assert got == exp


def test_ppr_rand(spark, rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    sources = [v for v in vertices if v % 25 == 0]
    exp = oracle.ppr_oracle(edges, vertices, sources, alpha=0.85, rounds=8)
    src_df = spark.createDataFrame([(v,) for v in sources], "vid long")
    got = {
        r["vid"]: r["rank"]
        for r in personalized_pagerank(rand_graph, src_df, max_iter=8).collect()
    }
    g = np.array([got[v] for v in sorted(vertices)])
    e = np.array([exp[v] for v in sorted(vertices)])
    assert np.allclose(g, e, atol=1e-9)


def test_linkpred_rand(rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    exp = oracle.linkpred_oracle(edges, mod=10)
    rows = link_prediction(rand_graph, a_filter=(F.col("a") % 10 == 0)).collect()
    got = {
        (r["a"], r["b"]): (r["cn"], r["jaccard"], r["adamic_adar"], r["pref_attach"])
        for r in rows
    }
    assert set(got) == set(exp)
    for k, (cn, jac, aa, pa) in exp.items():
        gcn, gjac, gaa, gpa = got[k]
        assert gcn == cn and gpa == pa
        assert abs(gjac - jac) < 1e-9 and abs(gaa - aa) < 1e-9


def test_boundaries_rand(spark, rand_graph, rand_graph_data):
    vertices, edges = rand_graph_data
    s = {v for v in vertices if v % 15 == 0}
    nbr = {}
    sym = set()
    for a, b in edges:
        if a != b:
            sym.add((a, b))
            sym.add((b, a))
    exp_nodes = {d for (a, d) in sym if a in s and d not in s}
    exp_edges = {(a, d) for (a, d) in sym if a in s and d not in s}
    s_df = spark.createDataFrame([(v,) for v in sorted(s)], "vid long")
    g_undirected = rand_graph.to_undirected()
    got_nodes = {r["vid"] for r in node_boundary(g_undirected, s_df).collect()}
    got_edges = {(r["src"], r["dst"]) for r in edge_boundary(g_undirected, s_df).collect()}
    assert got_nodes == exp_nodes
    assert got_edges == exp_edges


def test_msf_rand(spark, rand_graph_data):
    from graphscope_spark.algorithms.msf import minimum_spanning_forest
    from graphscope_spark.graph import Graph

    vertices, edges = rand_graph_data
    # deterministic pseudo-weights with deliberate ties
    wedges = [(s, d, float((s * 7 + d * 13) % 23) + 1.0) for s, d in edges]
    e = spark.createDataFrame(wedges, "src long, dst long, weight double")
    g = Graph.from_edges(e, directed=False, weight="weight")
    got = {
        (r["src"], r["dst"], r["weight"])
        for r in minimum_spanning_forest(g).collect()
    }
    exp = oracle.msf_oracle(wedges)
    assert sum(w for *_xy, w in got) == sum(w for *_xy, w in exp)
    assert got == exp


def test_ktruss_rand(spark, rand_graph, rand_graph_data):
    from graphscope_spark.algorithms.ktruss import k_truss

    vertices, edges = rand_graph_data
    for k in (3, 4):
        exp = oracle.ktruss_oracle(edges, k)
        got = {(r["src"], r["dst"]) for r in k_truss(rand_graph, k=k).collect()}
        assert got == exp, (k, len(got), len(exp))
        dist = {
            (r["src"], r["dst"])
            for r in k_truss(rand_graph, k=k, local_finish_rows=0).collect()
        }
        assert dist == exp, k


def test_clustering_directed_rand(rand_graph, rand_graph_data):
    from graphscope_spark.algorithms.clustering import clustering_directed

    vertices, edges = rand_graph_data
    exp = oracle.clustering_directed_oracle(edges, vertices)
    got = {r["vid"]: r["clustering"] for r in clustering_directed(rand_graph).collect()}
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, (v, got[v], exp[v])


def test_k_clique_generic_rand(rand_graph, rand_graph_data):
    from graphscope_spark.algorithms.kclique import k_clique_count

    vertices, edges = rand_graph_data
    for k in (3, 4, 5):
        exp = oracle.k_clique_oracle(edges, vertices, k)
        got = k_clique_count(rand_graph, k=k).collect()[0]["kc"]
        assert got == exp, k


def test_msf_distributed_matches_finisher(spark, rand_graph_data):
    # the Kruskal tail (default) and the fully-distributed Boruvka
    # rounds (local_finish_rows=0) must produce the identical forest
    from graphscope_spark.algorithms.msf import minimum_spanning_forest
    from graphscope_spark.graph import Graph

    vertices, edges = rand_graph_data
    wedges = [(s, d, float((s * 7 + d * 13) % 23) + 1.0) for s, d in edges]
    e = spark.createDataFrame(wedges, "src long, dst long, weight double")
    g = Graph.from_edges(e, directed=False, weight="weight")
    fin = {
        (r["src"], r["dst"], r["weight"])
        for r in minimum_spanning_forest(g).collect()
    }
    dist = {
        (r["src"], r["dst"], r["weight"])
        for r in minimum_spanning_forest(g, local_finish_rows=0).collect()
    }
    assert fin == dist


def test_all_pairs_digest_both_paths(spark, rand_graph):
    """all_pairs_digest (root-parallel broadcast CSR) equals the digest
    of the raw multi_source_distances pair table, on BOTH the broadcast
    path and the wide-sweep fallback (broadcast_rows=0)."""
    from graphscope_spark.algorithms import all_pairs_digest

    pairs = multi_source_distances(
        rand_graph, None, directed=False, local_finish_rows=0
    )
    exp = {
        r["vid"]: (int(r["ecc"]), int(r["sum"]), int(r["cnt"]) - 1)
        for r in pairs.groupBy(F.col("root").alias("vid"))
        .agg(
            F.max("dist").alias("ecc"),
            F.sum("dist").alias("sum"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    }
    for br in (8_000_000, 0):
        got = {
            r["vid"]: (int(r["ecc"]), int(r["sum_dist"]), int(r["reachable"]))
            for r in all_pairs_digest(
                rand_graph, directed=False, broadcast_rows=br
            ).collect()
        }
        assert got == exp
