from graphscope_spark.algorithms.pagerank import pagerank
from graphscope_spark.algorithms.wcc import wcc
from graphscope_spark.algorithms.cdlp import cdlp
from graphscope_spark.algorithms.triangles import triangle_count, triangles
from graphscope_spark.algorithms.lcc import lcc
from graphscope_spark.algorithms.bfs import bfs
from graphscope_spark.algorithms.sssp import sssp
from graphscope_spark.algorithms.degrees import degree_centrality
from graphscope_spark.algorithms.hits import hits
from graphscope_spark.algorithms.kcore import kcore

__all__ = [
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
    "kcore",
]
