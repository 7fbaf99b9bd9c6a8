"""NetworkX-compatibility facade.

Reference analog: `python/graphscope/nx/algorithms/builtin.py` — a
NetworkX-named function surface (pagerank:87, degree_centrality:174,
has_path:279, k_core:505, ...) that projects the graph and delegates to
the built-in engine apps, returning Python-native results.

Here each function delegates to the DataFrame implementation in
``graphscope_spark.algorithms`` and collects into the NetworkX-shaped
return type (dict keyed by node, scalar, set, ...).  Collecting is the
NX contract — this facade is for interactive/small-result use; pipelines
that stay distributed should call the ``algorithms`` modules directly
and keep DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark import algorithms as A
from graphscope_spark.graph import VID, Graph


def _to_dict(df: DataFrame, key: str = VID) -> dict:
    cols = [c for c in df.columns if c != key]
    if len(cols) == 1:
        return {r[key]: r[cols[0]] for r in df.collect()}
    return {r[key]: tuple(r[c] for c in cols) for r in df.collect()}


def _scalar(df: DataFrame):
    return df.collect()[0][0]


# -- ranking ----------------------------------------------------------
def pagerank(g: Graph, alpha: float = 0.85, max_iter: int = 100, tol: float = 1e-6) -> dict:
    return _to_dict(A.pagerank(g, alpha=alpha, max_iter=max_iter, tol=tol))


def hits(g: Graph, max_iter: int = 100, tol: float = 1e-8) -> tuple[dict, dict]:
    rows = A.hits(g, max_iter=max_iter, tol=tol).collect()
    return (
        {r[VID]: r["hub"] for r in rows},
        {r[VID]: r["auth"] for r in rows},
    )


def voterank(g: Graph, number_of_nodes: int) -> list:
    rows = A.voterank(g, num_seeds=number_of_nodes).collect()
    return [r[VID] for r in sorted(rows, key=lambda r: r["rank"])]


# -- centrality -------------------------------------------------------
def degree_centrality(g: Graph) -> dict:
    return _to_dict(A.degree_centrality(g))


def in_degree_centrality(g: Graph) -> dict:
    return _to_dict(A.degree_centrality(g, centrality_type="in"))


def out_degree_centrality(g: Graph) -> dict:
    return _to_dict(A.degree_centrality(g, centrality_type="out"))


def eigenvector_centrality(g: Graph, max_iter: int = 100, tol: float = 1e-6) -> dict:
    return _to_dict(A.eigenvector_centrality(g, max_iter=max_iter, tol=tol))


def katz_centrality(
    g: Graph, alpha: float = 0.1, beta: float = 1.0, max_iter: int = 100, tol: float = 1e-6
) -> dict:
    return _to_dict(A.katz_centrality(g, alpha=alpha, beta=beta, max_iter=max_iter, tol=tol))


def closeness_centrality(g: Graph) -> dict:
    return _to_dict(A.closeness_centrality(g))


def betweenness_centrality(g: Graph, normalized: bool = True) -> dict:
    return _to_dict(A.betweenness_centrality(g, normalized=normalized))


def harmonic_centrality(g: Graph) -> dict:
    return _to_dict(A.harmonic_centrality(g))


# -- clustering / cohesion -------------------------------------------
def triangles(g: Graph) -> dict:
    return _to_dict(A.triangles(g))


def clustering(g: Graph) -> dict:
    return _to_dict(A.lcc(g))


def average_clustering(g: Graph) -> float:
    return _scalar(A.avg_clustering(g))


def transitivity(g: Graph) -> float:
    return _scalar(A.transitivity(g))


def core_number(g: Graph) -> dict:
    return _to_dict(A.core_number(g))


def k_core(g: Graph, k: int) -> set:
    rows = A.kcore(g, k=k).collect()
    return {r[VID] for r in rows if r["in_core"]}


def k_shell(g: Graph, k: int) -> set:
    rows = A.kshell(g, k=k).collect()
    return {r[VID] for r in rows if r["in_shell"]}


def k_truss(g: Graph, k: int) -> list[tuple[int, int]]:
    return sorted((r["src"], r["dst"]) for r in A.k_truss(g, k=k).collect())


def maximal_independent_set(g: Graph) -> set:
    rows = A.maximal_independent_set(g).collect()
    return {r[VID] for r in rows if r["in_mis"]}


# -- components -------------------------------------------------------
def connected_components(g: Graph) -> list[set]:
    comp = _to_dict(A.wcc(g))
    groups: dict[int, set] = {}
    for v, c in comp.items():
        groups.setdefault(c, set()).add(v)
    return sorted(groups.values(), key=lambda s: (-len(s), min(s)))


def number_connected_components(g: Graph) -> int:
    return A.wcc(g).select("comp").distinct().count()


def strongly_connected_components(g: Graph) -> list[set]:
    comp = _to_dict(A.strongly_connected_components(g))
    groups: dict[int, set] = {}
    for v, c in comp.items():
        groups.setdefault(c, set()).add(v)
    return sorted(groups.values(), key=lambda s: (-len(s), min(s)))


# -- paths / traversal ------------------------------------------------
def single_source_shortest_path_length(g: Graph, source: int) -> dict:
    rows = A.bfs(g, source=source).collect()
    return {r[VID]: r["depth"] for r in rows if r["depth"] >= 0}


def shortest_path_length(g: Graph, source: int, weight: str | None = None) -> dict:
    if weight is None:
        return single_source_shortest_path_length(g, source)
    rows = A.sssp(g, source=source, weight=weight).collect()
    return {r[VID]: r["dist"] for r in rows if r["dist"] != float("inf")}


def has_path(g: Graph, source: int, target: int) -> bool:
    return bool(_scalar(A.sssp_has_path(g, source=source, target=target)))


def average_shortest_path_length(g: Graph) -> float:
    return _scalar(A.sssp_average_length(g, weight=None))


def bfs_predecessors(g: Graph, source: int) -> dict:
    rows = A.bfs_parent(g, source=source).collect()
    return {r[VID]: r["parent"] for r in rows if r["depth"] > 0}


def bfs_successors(g: Graph, source: int) -> dict:
    """parent → sorted list of children in the (deterministic min-parent)
    BFS tree (builtin.py bfs_successors analog)."""
    rows = A.bfs_parent(g, source=source).collect()
    out: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r["depth"], r[VID])):
        if r["depth"] > 0:
            out.setdefault(r["parent"], []).append(r[VID])
    return out


def bfs_edges(g: Graph, source: int) -> list:
    """Tree edges (parent, child) in discovery (depth, parent, child)
    order (builtin.py bfs_edges analog, deterministic parent choice)."""
    rows = A.bfs_parent(g, source=source).collect()
    return [
        (r["parent"], r[VID])
        for r in sorted(rows, key=lambda r: (r["depth"], r["parent"], r[VID]))
        if r["depth"] > 0
    ]


def bfs_tree(g: Graph, source: int) -> Graph:
    """The BFS tree as a directed Graph (builtin.py bfs_tree returns a
    DiGraph; here the same edge set stays a DataFrame-backed Graph)."""
    parents = A.bfs_parent(g, source=source)
    edges = parents.where(F.col("depth") > 0).select(
        F.col("parent").alias("src"), F.col(VID).alias("dst")
    )
    verts = parents.where(F.col("depth") >= 0).select(VID)
    return Graph.from_edges(
        edges, vertices=verts, directed=True, num_partitions=g.num_partitions
    )


def single_source_dijkstra_path_length(g: Graph, source: int, weight: str = "weight") -> dict:
    """builtin.py single_source_dijkstra_path_length analog — weighted
    distances from ``source`` (inf-unreachable dropped)."""
    rows = A.sssp(g, source=source, weight=weight).collect()
    return {r[VID]: r["dist"] for r in rows if r["dist"] != float("inf")}


def all_simple_edge_paths(g: Graph, source: int, target: int, cutoff: int = 5) -> list:
    """Each simple path as its edge list (builtin.py
    all_simple_edge_paths analog)."""
    rows = A.all_simple_paths(g, source=source, target=target, cutoff=cutoff).collect()
    paths = sorted([int(v) for v in r["path"].split("-")] for r in rows)
    return [list(zip(p[:-1], p[1:])) for p in paths]


def eccentricity(g: Graph) -> dict:
    return {r[VID]: r["ecc"] for r in A.eccentricity(g).collect()}


def diameter(g: Graph) -> int:
    return _scalar(A.diameter_approx(g))


# -- assortativity / mixing ------------------------------------------
def degree_assortativity_coefficient(g: Graph) -> float:
    return _scalar(A.degree_assortativity(g))


def attribute_assortativity_coefficient(g: Graph, attrs: DataFrame) -> float:
    return _scalar(A.attribute_assortativity(g, attrs))


def numeric_assortativity_coefficient(g: Graph, attrs: DataFrame) -> float:
    return _scalar(A.numeric_assortativity(g, attrs))


def average_degree_connectivity(g: Graph) -> dict:
    return {r["degree"]: r["knn"] for r in A.average_degree_connectivity(g).collect()}


# -- boundary ---------------------------------------------------------
def node_boundary(g: Graph, nbunch: list[int]) -> set:
    s = g.edges.sparkSession.createDataFrame([(int(v),) for v in nbunch], "vid long")
    return {r[VID] for r in A.node_boundary(g, s).collect()}


def edge_boundary(g: Graph, nbunch: list[int]) -> list[tuple[int, int]]:
    s = g.edges.sparkSession.createDataFrame([(int(v),) for v in nbunch], "vid long")
    return sorted((r["src"], r["dst"]) for r in A.edge_boundary(g, s).collect())


def minimum_spanning_edges(g: Graph, weight: str = "weight") -> list[tuple[int, int, float]]:
    rows = A.minimum_spanning_forest(g, weight=weight).collect()
    return sorted((r["src"], r["dst"], r["weight"]) for r in rows)


# -- link prediction --------------------------------------------------
def jaccard_coefficient(g: Graph) -> list[tuple[int, int, float]]:
    rows = A.link_prediction(g).collect()
    return sorted((r["a"], r["b"], r["jaccard"]) for r in rows)


def adamic_adar_index(g: Graph) -> list[tuple[int, int, float]]:
    rows = A.link_prediction(g).collect()
    return sorted((r["a"], r["b"], r["adamic_adar"]) for r in rows)


def preferential_attachment(g: Graph) -> list[tuple[int, int, int]]:
    rows = A.link_prediction(g).collect()
    return sorted((r["a"], r["b"], r["pref_attach"]) for r in rows)
