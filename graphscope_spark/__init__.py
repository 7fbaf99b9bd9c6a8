"""graphscope_spark — a PySpark-native link-graph analytics engine.

A from-scratch DataFrame-based reimplementation of the capabilities of
GraphScope's analytical engine (GAE / GRAPE, see /root/reference):
PageRank, weakly-connected components, label propagation (CDLP),
triangle counting and friends — expressed as iterative join + groupBy
supersteps over hash-partitioned edge tables, with per-iteration
checkpointing, convergence metrics, and skew-aware aggregation.

Reference semantics are cited per-module (file:line into the reference
repo).  This is NOT a port: execution is Catalyst/Tungsten DataFrame
plans, not C++/MPI fragments.
"""

from graphscope_spark.app import App, load_app, pregel_program
from graphscope_spark.graph import Graph
from graphscope_spark.session import get_spark

__all__ = ["App", "Graph", "get_spark", "load_app", "pregel_program"]
__version__ = "0.1.0"
