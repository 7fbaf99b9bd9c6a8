"""Unified loader surface (reference framework/loader.py:94-193)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from graphscope_spark.sources.loaders import Loader, load_dataframe, load_graph

EDGES = [(0, 1), (1, 2), (2, 0), (3, 4)]


def _write(spark, tmpdir: str, fmt: str) -> str:
    df = spark.createDataFrame(EDGES, "src long, dst long")
    path = os.path.join(tmpdir, f"edges_{fmt}")
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
        return path
    if fmt == "orc":
        path += ".orc"
        df.write.mode("overwrite").orc(path)
        return path
    if fmt == "csv":
        path += ".csv"
        df.write.mode("overwrite").option("header", True).csv(path)
        return path
    if fmt == "tsv":
        path += ".tsv"
        df.write.mode("overwrite").option("header", True).option("sep", "\t").csv(path)
        return path
    path += ".json"
    df.write.mode("overwrite").json(path)
    return path


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "tsv", "json"])
def test_load_each_format(spark, tmp_path, fmt):
    path = _write(spark, str(tmp_path), fmt)
    df = load_dataframe(spark, path)
    got = sorted((int(r["src"]), int(r["dst"])) for r in df.collect())
    assert got == sorted(EDGES)


def test_load_pandas_numpy_list(spark):
    pdf = pd.DataFrame(EDGES, columns=["src", "dst"])
    assert load_dataframe(spark, pdf).count() == 4
    arr = np.array(EDGES)
    df = load_dataframe(spark, arr)
    assert df.columns == ["c0", "c1"] and df.count() == 4
    df2 = load_dataframe(spark, EDGES, schema="src long, dst long")
    assert df2.count() == 4
    with pytest.raises(ValueError, match="schema"):
        load_dataframe(spark, EDGES)
    with pytest.raises(TypeError):
        load_dataframe(spark, 42)


def test_load_graph_end_to_end(spark, tmp_path):
    from graphscope_spark.algorithms import wcc

    path = _write(spark, str(tmp_path), "csv")
    g = load_graph(spark, Loader(path), directed=False, num_partitions=4)
    comps = {r["vid"]: r["comp"] for r in wcc(g).collect()}
    assert comps == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}
