"""Graphs derived deterministically from the driver's TPC-H-ish tables.

These power the DuckDB-verifiable query surface in __spark_entry__.py
(FIXTURES.md §5): the SAME derivation runs as a DataFrame plan here and
as ANSI SQL in the oracle, so graph inputs match by construction.

- :func:`order_graph` — directed bipartite customer→supplier graph:
  edge (o_custkey → 1_000_000 + l_suppkey) when an order links them;
  weight = number of backing lineitems.  Vertices deduced from edge
  endpoints (reference deduce path, graph.py:565-577).
- :func:`copurchase_graph` — undirected part co-purchase graph: parts
  appearing in the same order (has real triangle structure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.superstep import stats_barrier

SUPPLIER_OFFSET = 1_000_000

# Session-scoped graph memo — the Spark analog of the reference's
# vineyard-resident fragments: a graph is LOADED ONCE per session and
# many apps run against the shared columnar store
# (docs/analytical_engine/key_concepts.rst, zero-copy fragment sharing).
# Keyed by (applicationId, sf_dir, builder, params); the edge table is
# materialized via stats_barrier so the multi-join derivation (TPC-H
# lineitem self-joins) runs once, not once per query.
_GRAPH_MEMO: dict[tuple, Graph] = {}


def _memo_graph(spark: SparkSession, sf_dir: str, key: str, build) -> Graph:
    k = (spark.sparkContext.applicationId, sf_dir, key)
    g = _GRAPH_MEMO.get(k)
    if g is None:
        g = build()
        _GRAPH_MEMO[k] = g
    return g


# Shared degree-oriented DAG memo (round 3): the clique / census /
# truss family all start from the same (degree, vid)-oriented edge
# table; materialize it once per (session, graph) and let every
# pattern query reuse it — the round-2 sweep rebuilt it per query.
_ORIENTED_MEMO: dict[tuple, DataFrame] = {}


def memo_oriented(spark: SparkSession, sf_dir: str, key: str, g: Graph) -> DataFrame:
    from graphscope_spark.algorithms.oriented import oriented_edges

    k = (spark.sparkContext.applicationId, sf_dir, f"oriented:{key}")
    eo = _ORIENTED_MEMO.get(k)
    if eo is None:
        eo = stats_barrier(oriented_edges(g))
        _ORIENTED_MEMO[k] = eo
    return eo


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def order_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, weight): customer → offset+supplier, weight = lineitem count."""
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def order_graph(spark: SparkSession, sf_dir: str, num_partitions: int = 32) -> Graph:
    return _memo_graph(
        spark,
        sf_dir,
        f"order:{num_partitions}",
        lambda: Graph.from_edges(
            stats_barrier(order_edges(spark, sf_dir)),
            directed=True,
            num_partitions=num_partitions,
            weight="weight",
        ),
    )


def thin_order_graph(
    spark: SparkSession, sf_dir: str, mod: int = 7, num_partitions: int = 32
) -> Graph:
    """UNDIRECTED order graph thinned by a deterministic modulus — the
    sparse substrate for the biconnectivity / matching family (probed
    at sf0.01, mod=7: 1576 v / 6871 e, 7 components, 82 BCCs, 75
    bridges, 55 cut vertices, BFS depth 4)."""
    def build() -> Graph:
        e = (
            order_edges(spark, sf_dir)
            .select("src", "dst")
            .where((F.col("src") + F.col("dst")) % mod == 0)
        )
        return Graph.from_edges(
            stats_barrier(e), directed=False, num_partitions=num_partitions
        )

    return _memo_graph(spark, sf_dir, f"thin_order:{mod}:{num_partitions}", build)


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst): distinct part pairs co-occurring in an order, src < dst."""
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "ok")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def copurchase_graph(spark: SparkSession, sf_dir: str, num_partitions: int = 32) -> Graph:
    return _memo_graph(
        spark,
        sf_dir,
        f"copurchase:{num_partitions}",
        lambda: Graph.from_edges(
            stats_barrier(copurchase_edges(spark, sf_dir)),
            directed=False,
            num_partitions=num_partitions,
        ),
    )


def thin_copurchase_graph(
    spark: SparkSession, sf_dir: str, mod: int = 7, num_partitions: int = 32
) -> Graph:
    """Co-purchase graph thinned by a deterministic modulus — keeps the
    graph non-bipartite (odd cycles survive) while shrinking the
    iteration count of round-heavy operators (probed at sf0.01, mod=7:
    2000 v / 16667 e, greedy coloring fixpoint in 14 rounds)."""
    def build() -> Graph:
        e = copurchase_edges(spark, sf_dir).where(
            (F.col("src") + F.col("dst")) % mod == 0
        )
        return Graph.from_edges(
            stats_barrier(e), directed=False, num_partitions=num_partitions
        )

    return _memo_graph(
        spark, sf_dir, f"thin_copurchase:{mod}:{num_partitions}", build
    )


def copurchase_directed_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst): DIRECTED part graph — edge a→b when a precedes b
    (lower line number) in some order.  Both directions can exist via
    different orders, so the graph has reciprocal pairs and directed
    cycles — the input for the directed-triangle census."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("src"),
        F.col("l_linenumber").alias("ln"),
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("dst"),
        F.col("l_linenumber").alias("ln2"),
    )
    return (
        a.join(b, "ok")
        .where((F.col("ln") < F.col("ln2")) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .distinct()
    )


def copurchase_directed_graph(
    spark: SparkSession, sf_dir: str, num_partitions: int = 32
) -> Graph:
    return _memo_graph(
        spark,
        sf_dir,
        f"copurchase_directed:{num_partitions}",
        lambda: Graph.from_edges(
            stats_barrier(copurchase_directed_edges(spark, sf_dir)),
            directed=True,
            num_partitions=num_partitions,
        ),
    )


def linenumber_edges(spark: SparkSession, sf_dir: str, mod: int = 7) -> DataFrame:
    """(src, dst): DIRECTED part graph — an edge when part a directly
    precedes part b (consecutive line numbers) in some order, thinned by
    a deterministic modulo filter so the graph has rich SCC structure
    (many non-trivial components plus singleton tails — probed at
    sf0.01: 656 SCCs, largest 389)."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("src"),
        F.col("l_linenumber").alias("ln"),
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("dst"),
        F.col("l_linenumber").alias("ln2"),
    )
    return (
        a.join(b, "ok")
        .where(
            (F.col("ln") + 1 == F.col("ln2"))
            & (F.col("src") != F.col("dst"))
            & ((F.col("src") + F.col("dst")) % mod == 0)
        )
        .select("src", "dst")
        .distinct()
    )


def linenumber_graph(spark: SparkSession, sf_dir: str, num_partitions: int = 32) -> Graph:
    return _memo_graph(
        spark,
        sf_dir,
        f"linenumber:{num_partitions}",
        lambda: Graph.from_edges(
            stats_barrier(linenumber_edges(spark, sf_dir)),
            directed=True,
            num_partitions=num_partitions,
        ),
    )
