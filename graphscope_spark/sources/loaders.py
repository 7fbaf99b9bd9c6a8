"""Unified graph/table loaders — the reference Loader surface.

Reference analog: ``graphscope.framework.loader.Loader``
(python/graphscope/framework/loader.py:94-193): one entry point that
accepts a location string (file/oss/s3/hdfs + format options), a
pandas DataFrame, or a numpy ndarray, normalized into the engine's
ingestion path.  Spark reads every listed format natively, so the
wrappers here are thin dispatch — the value is API parity plus the
vertex/edge-column conventions.

Formats by extension: .parquet, .orc, .csv, .tsv, .json (a directory
path defaults to parquet).  ``Loader`` carries the reference's
``header_row`` / ``delimiter`` options for CSV-likes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from graphscope_spark.graph import Graph


@dataclass
class Loader:
    """Location + format options (framework/loader.py:94-193)."""

    source: Any
    delimiter: str = ","
    header_row: bool = True


def load_dataframe(
    spark: SparkSession,
    source,
    schema: str | None = None,
) -> DataFrame:
    """Normalize ``source`` into a DataFrame.

    Accepts: a path string (format by extension), a :class:`Loader`,
    a pandas DataFrame, a 2-D numpy array (columns c0..cN), or a list
    of row tuples (requires ``schema``)."""
    import numpy as np
    import pandas as pd

    delimiter, header_row = ",", True
    if isinstance(source, Loader):
        delimiter, header_row = source.delimiter, source.header_row
        source = source.source
    if isinstance(source, DataFrame):
        return source
    if isinstance(source, pd.DataFrame):
        return spark.createDataFrame(source)
    if isinstance(source, np.ndarray):
        if source.ndim != 2:
            raise ValueError("numpy input must be 2-D (rows x columns)")
        pdf = pd.DataFrame(source, columns=[f"c{i}" for i in range(source.shape[1])])
        return spark.createDataFrame(pdf)
    if isinstance(source, list):
        if schema is None:
            raise ValueError("list-of-rows input requires a schema string")
        return spark.createDataFrame(source, schema)
    if not isinstance(source, str):
        raise TypeError(f"unsupported loader source type {type(source).__name__}")

    low = source.lower()
    if low.endswith(".parquet") or "." not in low.rsplit("/", 1)[-1]:
        return spark.read.parquet(source)
    if low.endswith(".orc"):
        return spark.read.orc(source)
    if low.endswith(".json") or low.endswith(".jsonl"):
        return spark.read.json(source)
    if low.endswith(".csv") or low.endswith(".tsv"):
        sep = "\t" if low.endswith(".tsv") else delimiter
        return spark.read.csv(
            source, sep=sep, header=header_row, inferSchema=True
        )
    raise ValueError(f"unrecognized format for {source!r}")


def load_graph(
    spark: SparkSession,
    edges,
    vertices=None,
    directed: bool = True,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    num_partitions: int = 32,
) -> Graph:
    """Build a Graph from any loader-accepted edge source (+ optional
    vertex source) — the ``sess.g().add_edges(Loader(...))`` path."""
    from pyspark.sql import functions as F

    e = load_dataframe(spark, edges)
    cols = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    if weight:
        cols.append(F.col(weight).alias(weight))
    v = load_dataframe(spark, vertices) if vertices is not None else None
    return Graph.from_edges(
        e.select(*cols),
        v,
        directed=directed,
        num_partitions=num_partitions,
        weight=weight,
    )
