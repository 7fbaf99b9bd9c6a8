"""In-place mutable graph surface — the NX ``G.add_edge`` contract.

Reference analog: the dynamic fragment
(analytical_engine/core/fragment/dynamic_fragment.h:72,1505 —
ModifyVertices/ModifyEdges on a mutable CSR) behind the reference's
networkx-compatible Graph, whose users mutate in place and run
algorithms between mutations.

Spark translation: DataFrames are immutable, so MutableGraph keeps an
ordered driver-side op log (add/remove × node/edge) and FLUSHES it into
the functional Graph ops (graph.py add_vertices/add_edges/
remove_vertices/remove_edges) the first time the graph is read.
Consecutive same-kind ops coalesce into ONE union / anti-join — ten
thousand ``add_edge`` calls become a single createDataFrame + union,
not ten thousand plan nodes — and each flush ends with a lineage
barrier so a long mutate/inspect loop cannot accumulate plan depth.

This is the interactive surface; bulk pipelines should construct
Graphs from edge tables directly.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from graphscope_spark.graph import DST, SRC, VID, Graph
from graphscope_spark.superstep import stats_barrier


class MutableGraph:
    """NX-style mutable wrapper over the functional :class:`Graph`."""

    def __init__(
        self,
        spark: SparkSession,
        directed: bool = False,
        num_partitions: int = 32,
    ):
        self._spark = spark
        empty_e = spark.createDataFrame([], f"{SRC} long, {DST} long")
        empty_v = spark.createDataFrame([], f"{VID} long")
        self._g = Graph(empty_e, empty_v, directed=directed, num_partitions=num_partitions)
        self._log: list[tuple[str, list]] = []

    @classmethod
    def from_graph(cls, g: Graph) -> "MutableGraph":
        mg = cls.__new__(cls)
        mg._spark = g.edges.sparkSession
        mg._g = g
        mg._log = []
        return mg

    # -- mutation log ---------------------------------------------------
    def _push(self, kind: str, row) -> None:
        if self._log and self._log[-1][0] == kind:
            self._log[-1][1].append(row)
        else:
            self._log.append((kind, [row]))

    def add_node(self, v: int) -> None:
        self._push("add_v", (int(v),))

    def add_nodes_from(self, vs) -> None:
        for v in vs:
            self.add_node(v)

    def remove_node(self, v: int) -> None:
        self._push("del_v", (int(v),))

    def remove_nodes_from(self, vs) -> None:
        for v in vs:
            self.remove_node(v)

    def add_edge(self, u: int, v: int) -> None:
        self._push("add_e", (int(u), int(v)))

    def add_edges_from(self, es) -> None:
        for u, v in es:
            self.add_edge(u, v)

    def remove_edge(self, u: int, v: int) -> None:
        self._push("del_e", (int(u), int(v)))

    def remove_edges_from(self, es) -> None:
        for u, v in es:
            self.remove_edge(u, v)

    def _flush(self) -> None:
        if not self._log:
            return
        g = self._g
        for kind, rows in self._log:
            if kind == "add_v":
                df = self._spark.createDataFrame(rows, f"{VID} long")
                g = g.add_vertices(df)
            elif kind == "del_v":
                df = self._spark.createDataFrame(rows, f"{VID} long")
                g = g.remove_vertices(df)
            elif kind == "add_e":
                df = self._spark.createDataFrame(rows, f"{SRC} long, {DST} long")
                g = g.add_edges(df)
            else:  # del_e — undirected graphs drop both orientations
                if not g.directed:
                    rows = rows + [(v, u) for u, v in rows]
                df = self._spark.createDataFrame(rows, f"{SRC} long, {DST} long")
                g = g.remove_edges(df)
        self._log = []
        from dataclasses import replace

        self._g = replace(
            g, edges=stats_barrier(g.edges), vertices=stats_barrier(g.vertices)
        )

    # -- read surface -----------------------------------------------------
    @property
    def graph(self) -> Graph:
        """The current immutable Graph (flushes pending mutations) —
        pass this to any ``graphscope_spark.algorithms`` function."""
        self._flush()
        return self._g

    @property
    def directed(self) -> bool:
        return self._g.directed

    def number_of_nodes(self) -> int:
        return self.graph.num_vertices()

    def number_of_edges(self) -> int:
        g = self.graph
        if g.directed:
            return g.distinct_edges().count()
        from pyspark.sql import functions as F

        sym = g.symmetrized().count() // 2
        loops = g.edges.where(F.col(SRC) == F.col(DST)).select(SRC, DST).distinct().count()
        return sym + loops

    def has_node(self, v: int) -> bool:
        from pyspark.sql import functions as F

        return self.graph.vertices.where(F.col(VID) == int(v)).limit(1).count() > 0

    def has_edge(self, u: int, v: int) -> bool:
        from pyspark.sql import functions as F

        g = self.graph
        e = g.edges.where((F.col(SRC) == int(u)) & (F.col(DST) == int(v)))
        if not g.directed:
            e = e.unionByName(
                g.edges.where((F.col(SRC) == int(v)) & (F.col(DST) == int(u)))
            )
        return e.limit(1).count() > 0

    def nodes(self) -> list[int]:
        return sorted(r[VID] for r in self.graph.vertices.select(VID).collect())

    def edges(self) -> list[tuple[int, int]]:
        g = self.graph
        if g.directed:
            return sorted(
                (r[SRC], r[DST]) for r in g.distinct_edges().collect()
            )
        seen = {
            (min(r[SRC], r[DST]), max(r[SRC], r[DST]))
            for r in g.edges.select(SRC, DST).distinct().collect()
        }
        return sorted(seen)
