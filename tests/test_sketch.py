"""Deterministic HLL: accuracy vs exact distinct counts, grouping,
partition invariance, and a pure-Python replica of the register math
(the same construction the DuckDB oracle runs)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from graphscope_spark.functions.sketch import _EXTRA, _alpha, hll_cardinality, hll_registers


def _py_rank(hexwin: str) -> int:
    stripped = hexwin.lstrip("0")
    zeros = len(hexwin) - len(stripped)
    extra = _EXTRA.get(int(stripped[0], 16), 0) if stripped else 0
    return 4 * zeros + extra + 1


def _py_hll(values, b=10):
    m = 1 << b
    regs = {}
    for v in values:
        hx = hashlib.md5(str(v).encode()).hexdigest()
        reg = int(hx[:3], 16) % m
        rank = _py_rank(hx[3:18])
        regs[reg] = max(regs.get(reg, 0), rank)
    s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    raw = _alpha(m) * m * m / s
    v0 = m - len(regs)
    if raw <= 2.5 * m and v0 > 0:
        return m * math.log(m / v0), regs
    return raw, regs


def test_registers_match_python_replica(spark):
    vals = [f"tok{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    got = {r.reg: r.max_rank for r in hll_registers(df, "x").collect()}
    _, exp = _py_hll(vals)
    assert got == exp


def test_estimate_accuracy(spark):
    n = 20000
    df = spark.range(n).select(F.concat(F.lit("u"), F.col("id")).alias("x"))
    est = hll_cardinality(df, "x").first().estimate
    assert abs(est - n) / n < 0.05  # sigma ~ 3.3% at b=10


def test_small_range_correction(spark):
    df = spark.createDataFrame([(f"v{i}",) for i in range(30)], "x string")
    est = hll_cardinality(df, "x").first().estimate
    assert abs(est - 30) / 30 < 0.2
    exp, _ = _py_hll([f"v{i}" for i in range(30)])
    assert est == pytest.approx(round(exp, 8), abs=1e-8)


def test_grouped_and_partition_invariant(spark):
    rows = [("a", f"x{i}") for i in range(1000)] + [("b", f"x{i}") for i in range(100)]
    d1 = spark.createDataFrame(rows, "g string, x string").repartition(2)
    d8 = spark.createDataFrame(rows, "g string, x string").repartition(16)
    e1 = {r.g: (r.estimate, r.n_registers) for r in hll_cardinality(d1, "x", ["g"]).collect()}
    e8 = {r.g: (r.estimate, r.n_registers) for r in hll_cardinality(d8, "x", ["g"]).collect()}
    assert e1 == e8  # sketch is a max-merge: partitioning can't change it
    assert abs(e1["a"][0] - 1000) / 1000 < 0.1
    assert abs(e1["b"][0] - 100) / 100 < 0.15


def test_plan_no_udf(spark):
    df = spark.range(100).select(F.col("id").cast("string").alias("x"))
    plan = hll_cardinality(df, "x")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
