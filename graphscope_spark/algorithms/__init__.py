from graphscope_spark.algorithms.pagerank import pagerank
from graphscope_spark.algorithms.wcc import wcc
from graphscope_spark.algorithms.cdlp import cdlp
from graphscope_spark.algorithms.triangles import triangle_count, triangles
from graphscope_spark.algorithms.lcc import lcc
from graphscope_spark.algorithms.bfs import bfs
from graphscope_spark.algorithms.sssp import sssp
from graphscope_spark.algorithms.degrees import degree_centrality
from graphscope_spark.algorithms.hits import hits, salsa
from graphscope_spark.algorithms.kcore import kcore
from graphscope_spark.algorithms.centrality import (
    closeness_centrality,
    eigenvector_centrality,
    katz_centrality,
)
from graphscope_spark.algorithms.clustering import avg_clustering, lcc_directed, transitivity
from graphscope_spark.algorithms.assortativity import (
    attribute_assortativity,
    average_degree_connectivity,
    degree_assortativity,
    numeric_assortativity,
)
from graphscope_spark.algorithms.corenum import core_number, kshell
from graphscope_spark.algorithms.traversal import (
    bfs_parent,
    sssp_average_length,
    sssp_has_path,
    sssp_path,
)
from graphscope_spark.algorithms.voterank import voterank
from graphscope_spark.algorithms.betweenness import betweenness_centrality
from graphscope_spark.algorithms.louvain import louvain
from graphscope_spark.algorithms.pagerank import personalized_pagerank
from graphscope_spark.algorithms.multisource import (
    all_pairs_digest,
    multi_source_distances,
)
from graphscope_spark.algorithms.distances import (
    apsp_sampled,
    diameter_approx,
    eccentricity,
    harmonic_centrality,
    random_multi_bfs,
)
from graphscope_spark.algorithms.boundary import edge_boundary, node_boundary
from graphscope_spark.algorithms.mis import maximal_independent_set
from graphscope_spark.algorithms.linkpred import bib_coupling, cocitation, link_prediction
from graphscope_spark.algorithms.scc import strongly_connected_components
from graphscope_spark.algorithms.kclique import four_clique_count
from graphscope_spark.algorithms.msf import minimum_spanning_forest
from graphscope_spark.algorithms.ktruss import k_truss
from graphscope_spark.algorithms.articlerank import articlerank
from graphscope_spark.algorithms.coloring import graph_coloring
from graphscope_spark.algorithms.fluid import fluid_communities
from graphscope_spark.algorithms.lpa_color import lpa_by_color
from graphscope_spark.algorithms.kcenter import k_center
from graphscope_spark.algorithms.lpa_u2i import lpa_u2i
from graphscope_spark.algorithms.paths import (
    all_simple_paths,
    dfs_preorder,
    is_simple_path,
    sampling_path,
)
from graphscope_spark.algorithms.walks import khop_neighbor_sample, node2vec_walks, random_walks
from graphscope_spark.algorithms.peeling import (
    degeneracy,
    degeneracy_ordering,
    kcore_size,
    onion_layers,
)
from graphscope_spark.algorithms.matching import (
    maximal_matching,
    min_dominating_set,
    min_edge_cover,
    min_vertex_cover,
)
from graphscope_spark.algorithms.subgraph import (
    diamond_count,
    densest_subgraph_2approx,
    directed_triangle_census,
    edge_support,
    rectangle_count,
    subgraph_census,
    tailed_triangle_count,
    three_path_count,
)

__all__ = [
    "articlerank",
    "graph_coloring",
    "fluid_communities",
    "lpa_by_color",
    "all_simple_paths",
    "dfs_preorder",
    "is_simple_path",
    "sampling_path",
    "random_walks",
    "khop_neighbor_sample",
    "node2vec_walks",
    "k_center",
    "maximal_matching",
    "min_dominating_set",
    "min_edge_cover",
    "min_vertex_cover",
    "degeneracy",
    "degeneracy_ordering",
    "kcore_size",
    "onion_layers",
    "minimum_spanning_forest",
    "k_truss",
    "rectangle_count",
    "diamond_count",
    "three_path_count",
    "tailed_triangle_count",
    "densest_subgraph_2approx",
    "directed_triangle_census",
    "subgraph_census",
    "edge_support",
    "personalized_pagerank",
    "all_pairs_digest",
    "multi_source_distances",
    "apsp_sampled",
    "diameter_approx",
    "eccentricity",
    "harmonic_centrality",
    "random_multi_bfs",
    "edge_boundary",
    "node_boundary",
    "maximal_independent_set",
    "link_prediction",
    "cocitation",
    "bib_coupling",
    "strongly_connected_components",
    "four_clique_count",
    "pagerank",
    "wcc",
    "cdlp",
    "triangles",
    "triangle_count",
    "lcc",
    "bfs",
    "sssp",
    "degree_centrality",
    "hits",
    "salsa",
    "kcore",
    "eigenvector_centrality",
    "katz_centrality",
    "closeness_centrality",
    "avg_clustering",
    "lcc_directed",
    "transitivity",
    "degree_assortativity",
    "attribute_assortativity",
    "numeric_assortativity",
    "average_degree_connectivity",
    "core_number",
    "kshell",
    "bfs_parent",
    "sssp_has_path",
    "sssp_average_length",
    "sssp_path",
    "voterank",
    "betweenness_centrality",
    "louvain",
    "lpa_u2i",
]
