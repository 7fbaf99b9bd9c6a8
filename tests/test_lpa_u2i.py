"""LPA-U2I (bipartite weighted multi-property LPA) vs pure-Python oracle."""

from __future__ import annotations

import random

import pytest

from graphscope_spark.algorithms import lpa_u2i
from tests import oracle


def _run(spark, users, edges, max_round):
    udf = spark.createDataFrame(
        [(u, p[0], p[1]) for u, p in users.items()],
        "vid long, p0 double, p1 double",
    )
    edf = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r["vid"]: [r["p0"], r["p1"]]
        for r in lpa_u2i(udf, edf, ["p0", "p1"], max_round=max_round).collect()
    }
    exp = oracle.lpa_u2i_oracle(users, edges, max_round)
    assert set(got) == set(exp)
    for u in exp:
        for p in range(2):
            assert got[u][p] == pytest.approx(exp[u][p], rel=1e-9, abs=1e-9), (u, p)


def test_lpa_u2i_small(spark):
    # seeds exercise all three i2u branches: clamped 0/1, normalised,
    # and the zero-denominator keep (user 4 has no edges).
    users = {1: [0.0, 0.4], 2: [1.0, 0.7], 3: [0.5, 1.0], 4: [0.3, 0.2]}
    edges = [
        (1, 10, 2.0),
        (1, 11, 1.0),
        (2, 10, 3.0),
        (2, 12, 1.5),
        (3, 11, 4.0),
        (3, 12, 0.5),
    ]
    for rounds in (2, 3, 5, 8):
        _run(spark, users, edges, rounds)


def test_lpa_u2i_random(spark):
    rng = random.Random(7)
    users = {u: [rng.choice([0.0, 1.0, rng.random()]), rng.random()] for u in range(30)}
    edges = []
    seen = set()
    for _ in range(200):
        u, i = rng.randrange(30), 100 + rng.randrange(20)
        if (u, i) in seen:
            continue
        seen.add((u, i))
        edges.append((u, i, float(rng.randint(1, 9))))
    _run(spark, users, edges, 7)
