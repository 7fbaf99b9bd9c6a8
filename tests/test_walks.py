"""random_walks vs a pure-Python LCG replay oracle."""

from __future__ import annotations

from collections import defaultdict

from graphscope_spark.algorithms import random_walks
from graphscope_spark.algorithms.walks import WALK_A, WALK_B, WALK_P
from tests.conftest import TINY_EDGES


def walk_oracle(edges, length, seed, starts=None):
    # mirrors Graph.distinct_edges: dedup + self-loops removed
    adj = defaultdict(list)
    for s, d in sorted(set(edges)):
        if s != d:
            adj[s].append(d)
    if starts is None:
        starts = sorted(adj)
    rows = []
    for s0 in starts:
        node = s0
        rows.append((s0, 0, s0))
        for t in range(length):
            nbrs = adj.get(node)
            if not nbrs:
                break
            idx = ((node % WALK_P) * WALK_A + t * WALK_B + seed) % WALK_P
            node = nbrs[idx % len(nbrs)]
            rows.append((s0, t + 1, node))
    return sorted(rows)


def test_random_walks_tiny(tiny_graph):
    exp = walk_oracle(TINY_EDGES, length=4, seed=7)
    got = sorted(
        tuple(r) for r in random_walks(tiny_graph, length=4, seed=7).collect()
    )
    assert got == exp


def test_random_walks_rand(rand_graph, rand_graph_data):
    _, edges = rand_graph_data
    exp = walk_oracle(edges, length=5, seed=3)
    got = sorted(
        tuple(r) for r in random_walks(rand_graph, length=5, seed=3).collect()
    )
    assert got == exp


def test_random_walks_edges_variant_matches(rand_graph, rand_graph_data):
    # the hub-safe per-edge rank-join plan replays identical walks
    _, edges = rand_graph_data
    exp = walk_oracle(edges, length=4, seed=11)
    got = sorted(
        tuple(r)
        for r in random_walks(
            rand_graph, length=4, seed=11, adjacency="edges"
        ).collect()
    )
    assert got == exp


def test_random_walks_dead_end_truncates(tiny_graph, spark):
    # vertex 3 is a dangling sink: its walk is exactly the step-0 row
    starts = spark.createDataFrame([(3,)], "start long")
    rows = [
        tuple(r)
        for r in random_walks(tiny_graph, length=3, seed=7, starts=starts).collect()
    ]
    assert rows == [(3, 0, 3)]


def n2v_oracle(edges, length, wr, wc, wf, seed, starts=None):
    adj = defaultdict(list)
    for s, d in sorted(set(edges)):
        if s != d:
            adj[s].append(d)
    nbr_sets = {k: set(v) for k, v in adj.items()}
    if starts is None:
        starts = sorted(adj)
    rows = []
    for s0 in starts:
        prev, node = None, s0
        rows.append((s0, 0, s0))
        for t in range(length):
            nbrs = adj.get(node)
            if not nbrs:
                break
            idx = ((node % WALK_P) * WALK_A + t * WALK_B + seed) % WALK_P
            if prev is None:
                nxt = nbrs[idx % len(nbrs)]
            else:
                ws = [
                    wr if x == prev
                    else wc if x in nbr_sets.get(prev, ())
                    else wf
                    for x in nbrs
                ]
                r = idx % sum(ws)
                cum = 0
                for x, w in zip(nbrs, ws):
                    cum += w
                    if cum > r:
                        nxt = x
                        break
            prev, node = node, nxt
            rows.append((s0, t + 1, node))
    return sorted(rows)


def test_node2vec_walks_tiny(tiny_graph):
    from graphscope_spark.algorithms.walks import node2vec_walks

    exp = n2v_oracle(TINY_EDGES, length=4, wr=1, wc=2, wf=1, seed=7)
    got = sorted(
        tuple(r)
        for r in node2vec_walks(tiny_graph, length=4, seed=7).collect()
    )
    assert got == exp


def test_node2vec_walks_rand(rand_graph, rand_graph_data):
    from graphscope_spark.algorithms.walks import node2vec_walks

    _, edges = rand_graph_data
    # strong return bias (p small: wr large) and exploration (wf=3)
    exp = n2v_oracle(edges, length=5, wr=4, wc=2, wf=3, seed=13)
    got = sorted(
        tuple(r)
        for r in node2vec_walks(
            rand_graph, length=5, wr=4, wc=2, wf=3, seed=13
        ).collect()
    )
    assert got == exp


def test_khop_neighbor_sample_matches_replica(spark, rand_graph, rand_graph_data):
    """md5-ranked k-hop sampler vs a pure-Python replay; fanout and
    frontier-expansion invariants."""
    import hashlib

    from graphscope_spark.algorithms import khop_neighbor_sample

    vertices, edges = rand_graph_data
    fanouts = (3, 2)
    seeds = sorted(v for v in vertices if v % 25 == 0)
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)

    exp = set()
    frontier = set(seeds)
    for layer, f in enumerate(fanouts):
        nxt = set()
        for s in sorted(frontier):
            picks = sorted(
                adj.get(s, []),
                key=lambda d: (hashlib.md5(f"{s}:{d}".encode()).hexdigest(), d),
            )[:f]
            for d in picks:
                exp.add((layer, s, d))
                nxt.add(d)
        frontier = nxt

    seed_df = spark.createDataFrame([(v,) for v in seeds], "vid long")
    got = {
        (r["layer"], r["src"], r["dst"])
        for r in khop_neighbor_sample(rand_graph, seed_df, fanouts=fanouts).collect()
    }
    assert got == exp
    # fanout bound holds per (layer, src)
    from collections import Counter

    c = Counter((l, s) for l, s, _ in got)
    for (l, _), n in c.items():
        assert n <= fanouts[l]


def test_negative_sample_matches_replica(spark, rand_graph, rand_graph_data):
    """md5-uniform rejection tape vs a pure-Python replay; no sampled
    pair may be a real edge or a self-pair."""
    import hashlib

    from graphscope_spark.algorithms.walks import negative_sample

    vertices, edges = rand_graph_data
    k, trials = 4, 24
    seeds = sorted(v for v in vertices if v % 25 == 0)
    vs = sorted(vertices)
    n = len(vs)
    eset = set(edges)

    exp = set()
    for s in seeds:
        picked: list[int] = []
        seen: set[int] = set()
        for t in range(trials):
            if len(picked) >= k:
                break
            hx = hashlib.md5(f"{s}:{t}".encode()).hexdigest()
            cand = vs[int(hx[:12], 16) % n]
            if cand == s or (s, cand) in eset or cand in seen:
                continue
            seen.add(cand)
            picked.append(cand)
        for r, neg in enumerate(picked, 1):
            exp.add((s, neg, r))

    seed_df = spark.createDataFrame([(v,) for v in seeds], "vid long")
    got = {
        (r["src"], r["neg"], r["rank"])
        for r in negative_sample(rand_graph, seed_df, k=k, trials=trials).collect()
    }
    assert got == exp
    assert all((s, v) not in eset and s != v for s, v, _ in got)
