"""weighted_sample (A-ES) and length_quantiles: pure-Python replicas
plus statistical-bias and determinism checks."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphscope_spark.functions.sampling import weighted_sample
from graphscope_spark.functions.text import length_quantiles


def _py_uniform(v, seed=0):
    h = hashlib.md5(f"{seed}:{v}".encode()).hexdigest()
    return (int(h[:12], 16) + 0.5) / float(1 << 48)


def test_weighted_sample_matches_python_replica(spark):
    rows = [(i, float(1 + i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [(r.doc_id, r.rank) for r in weighted_sample(df, 20, "w").collect()]
    keys = sorted(
        ((math.log(_py_uniform(i)) / w, -i) for i, w in rows), reverse=True
    )[:20]
    exp = [(-k[1], r + 1) for r, k in enumerate(keys)]
    assert sorted(got) == sorted(exp)


def test_weighted_sample_bias(spark):
    # two strata, weight 10 vs 1: the heavy stratum should dominate
    rows = [(i, 10.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    picked = [r.doc_id for r in weighted_sample(df, 100, "w").collect()]
    heavy = sum(1 for d in picked if d < 500)
    assert heavy > 75  # E[heavy] ~ 91 at 10:1 weights


def test_weighted_sample_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 2.0)], "doc_id long, w double"
    )
    out = weighted_sample(df, 10, "w").collect()
    assert [r.doc_id for r in out] == [3]


def test_length_quantiles_match_numpy(spark):
    vals = [(("a" if i % 3 else "b"), float(i * i % 97)) for i in range(200)]
    df = spark.createDataFrame(vals, "lang string, n_chars double")
    got = {(r.lang, r.p): r.value for r in length_quantiles(df).collect()}
    for lang in ("a", "b"):
        xs = np.array([v for l, v in vals if l == lang])
        for p in (0.25, 0.5, 0.75, 0.95):
            exp = float(np.percentile(xs, p * 100, method="linear"))
            assert got[(lang, p)] == pytest.approx(round(exp, 8), abs=1e-8)


def test_plans(spark):
    df = spark.createDataFrame([(1, 2.0)], "doc_id long, w double")
    plan = weighted_sample(df, 5, "w")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan and "Python" not in plan


def test_crawl_frontier(spark):
    from graphscope_spark.functions.urls import crawl_frontier

    rows = (
        [(f"u{i}", "h1", float(100 - i)) for i in range(6)]
        + [(f"v{i}", "h2", 50.0) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "url string, host string, score double")
    out = crawl_frontier(df, host_quota=2, budget=3).collect()
    # h1 keeps only u0 (100) and u1 (99) under quota=2; u2 (98) is cut,
    # so the third budget slot goes to h2's v0 (50, url-asc tie-break)
    assert [(r.url, r.rank) for r in out] == [("u0", 1), ("u1", 2), ("v0", 3)]
    assert all(r.host_rank <= 2 for r in out)
    plan = crawl_frontier(df)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
