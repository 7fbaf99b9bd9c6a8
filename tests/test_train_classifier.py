"""Distributed logistic-regression trainer (classify.train_classifier):
exact parity with a pure-numpy full-batch GD replica, and a sanity
check that the learned vector actually separates the classes."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from graphscope_spark.functions.classify import (
    classifier_features,
    train_classifier,
)

DIMS, SEED, STEPS, LR = 16, 17, 3, 1.0

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", 1.0),
    (1, "spark engine shuffle partition codegen plan", 0.0),
    (2, "the lazy dog sleeps under the quick fox", 1.0),
    (3, "catalyst optimizer rule pushdown projection scan", 0.0),
    (4, "quick quick dog dog the the over over", 1.0),
    (5, "executor task stage shuffle spill memory", 0.0),
    (6, "", 0.0),
]


def _bucket(tok: str) -> int:
    h = hashlib.md5(f"{SEED}:{tok}".encode()).hexdigest()
    return int(h[:4], 16) % (DIMS - 1)


def _features(text: str) -> np.ndarray:
    x = np.zeros(DIMS)
    x[0] = 1.0
    toks = text.split()
    for t in toks:
        x[1 + _bucket(t)] += 1.0
    if toks:
        x[1:] /= len(toks)
    return x


def _replica() -> np.ndarray:
    X = np.stack([_features(t) for _, t, _ in DOCS])
    y = np.array([lbl for _, _, lbl in DOCS])
    w = np.zeros(DIMS)
    for _ in range(STEPS):
        z = np.round(X @ w, 8)
        p = 1.0 / (1.0 + np.exp(-z))
        g = np.round(X.T @ (p - y) / len(DOCS), 8)
        w = np.round(w - LR * g, 8)
    return w


def test_features_long_form(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y double")
    got = {}
    for r in classifier_features(df, dims=DIMS, seed=SEED).collect():
        got[(r["doc_id"], r["dim"])] = r["val"]
    for i, (_, text, _) in enumerate(DOCS):
        x = _features(text)
        for d in range(DIMS):
            assert got.get((i, d), 0.0) == pytest.approx(x[d], abs=1e-12), (i, d)
    # empty doc contributes only its bias row
    assert [k for k in got if k[0] == 6] == [(6, 0)]


def test_train_matches_numpy_replica(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y double")
    w = {
        r["dim"]: r["weight"]
        for r in train_classifier(
            df, label=F.col("y") == 1.0, dims=DIMS, seed=SEED,
            steps=STEPS, lr=LR,
        ).collect()
    }
    exp = _replica()
    assert set(w) == set(range(DIMS))
    for d in range(DIMS):
        assert w[d] == pytest.approx(exp[d], abs=2e-8), d


def test_learned_weights_separate_classes(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y double")
    w = {
        r["dim"]: r["weight"]
        for r in train_classifier(
            df, label=F.col("y") == 1.0, dims=DIMS, seed=SEED,
            steps=10, lr=2.0,
        ).collect()
    }
    wv = np.array([w[d] for d in range(DIMS)])

    def score(text: str) -> float:
        return float(1.0 / (1.0 + np.exp(-_features(text) @ wv)))

    pos = [score(t) for _, t, lbl in DOCS if lbl == 1.0]
    neg = [score(t) for _, t, lbl in DOCS if lbl == 0.0 and t]
    assert min(pos) > max(neg)
