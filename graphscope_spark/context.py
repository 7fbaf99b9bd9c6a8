"""Result contexts — the reference's query-result surface.

Reference: app runs return a Context queried through a selector
mini-language and materialized via ``to_numpy`` / ``to_dataframe`` /
``output(fd)`` (python/graphscope/framework/context.py:137-366;
DATA_SINK/OUTPUT ops, proto/types.proto:114-129).

Spark-native translation: a thin wrapper over the result DataFrame.
Selectors map to columns: ``v.id`` → vid, ``r`` → the (single) result
column, ``r.col`` → named column (vertex_property contexts).
Materialization goes through Arrow (``toPandas``); ``output`` writes
parquet/csv to any Hadoop-supported filesystem (file/hdfs/s3 —
the reference's fd schemes, context.py:237-276).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import VID


class VertexDataContext:
    """One value (or several named columns) per vertex."""

    def __init__(self, df: DataFrame, key: str = VID):
        self.df = df
        self.key = key

    def _col_for(self, selector: str) -> str:
        if selector in ("v.id", "id"):
            return self.key
        if selector == "r":
            data_cols = [c for c in self.df.columns if c != self.key]
            if len(data_cols) != 1:
                raise ValueError(
                    f"selector 'r' ambiguous over columns {data_cols}; use 'r.<col>'"
                )
            return data_cols[0]
        if selector.startswith("r."):
            name = selector[2:]
            if name not in self.df.columns:
                raise KeyError(name)
            return name
        raise ValueError(f"unknown selector {selector!r}")

    def to_dataframe(self, selectors: dict[str, str] | None = None) -> pd.DataFrame:
        """Arrow-backed pandas materialization (CONTEXT_TO_DATAFRAME)."""
        if selectors is None:
            return self.df.orderBy(self.key).toPandas()
        cols = [
            F.col(self._col_for(sel)).alias(out) for out, sel in selectors.items()
        ]
        return self.df.select(*cols).orderBy(list(selectors)[0]).toPandas()

    def to_numpy(self, selector: str = "r") -> np.ndarray:
        """CONTEXT_TO_NUMPY: one column, sorted by vertex id."""
        col = self._col_for(selector)
        pdf = self.df.select(self.key, col).orderBy(self.key).toPandas()
        return pdf[col].to_numpy()

    def output(self, path: str, format: str = "parquet", **options) -> None:
        """DATA_SINK/OUTPUT: write the context to storage."""
        writer = self.df.write.mode("overwrite").options(**options)
        if format == "parquet":
            writer.parquet(path)
        elif format == "csv":
            writer.option("header", "true").csv(path)
        elif format == "orc":
            writer.orc(path)
        else:
            raise ValueError(f"unsupported sink format {format!r}")
